"""Enum emission parity — EnumDeclaration + ENTRIES-linked
EnumConstantDeclaration (EnumDeclaration.java:38-47,
DeclarationHandler.java:388-410) across the C-family frontends and the Go
const-iota analogue, including constant-reference linking."""

from __future__ import annotations

from cpg_spark.fixtures_cfamily import CPP_FIXTURES, JAVA_FIXTURES
from cpg_spark.frontends.cfamily_frontend import (
    parse_cpp_document,
    parse_java_document,
)
from cpg_spark.frontends.go_frontend import parse_go_document

GO_SRC = """package state

type Phase int

const (
    Idle Phase = iota
    Busy
    Done
)

const Answer = 42

func next() Phase { return Busy }
"""


def _index(g):
    nodes = {n["node_id"]: n for n in g.nodes}
    edges = {}
    for e in g.edges:
        edges.setdefault(e["pred"], []).append(e)
    return nodes, edges


def _entries_of(nodes, edges, enum_name):
    eids = {nid for nid, n in nodes.items()
            if n["label"] == "EnumDeclaration" and n["name"] == enum_name}
    out = []
    for e in edges.get("ENTRIES", []):
        if e["subj"] in eids:
            out.append((int(e["props"]["index"]), nodes[e["obj"]]["name"]))
    return [n for _, n in sorted(out)]


def test_cpp_enum_forms():
    g = parse_cpp_document("cpp/enums/0001", 0, CPP_FIXTURES["enums"], None)
    nodes, edges = _index(g)
    assert not [n for n in g.nodes if n["label"] == "ProblemDeclaration"]
    assert _entries_of(nodes, edges, "Color") == ["RED", "GREEN", "BLUE"]
    assert _entries_of(nodes, edges, "Direction") == ["NORTH", "SOUTH"]
    assert _entries_of(nodes, edges, "Flags") == ["ON", "OFF"]
    assert _entries_of(nodes, edges, "Depth") == ["SHALLOW", "DEEP"]
    # scoped enum records its underlying type
    d = [n for n in nodes.values()
         if n["label"] == "EnumDeclaration" and n["name"] == "Direction"]
    assert d[0]["props"] == {"scoped": "true", "underlying": "int"}
    # GREEN = 5 initializer: Literal INITIALIZER + DFG into the entry
    green = {nid for nid, n in nodes.items()
             if n["label"] == "EnumConstantDeclaration"
             and n["name"] == "GREEN"}
    init = [e for e in edges["AST"]
            if e["subj"] in green and e["props"].get("field") == "INITIALIZER"]
    assert len(init) == 1 and nodes[init[0]["obj"]]["label"] == "Literal"
    assert any(e["obj"] in green for e in edges["DFG"])
    # trailing declarator `enum Flags {...} toggle;` + elaborated
    # `enum Color painted = GREEN;` mint typed VariableDeclarations
    for vname, vtype in (("toggle", "Flags"), ("painted", "Color"),
                         ("c", "Color")):
        v = [n for n in nodes.values()
             if n["label"] == "VariableDeclaration" and n["name"] == vname]
        assert len(v) == 1, vname
        tids = [e["obj"] for e in edges["EVAL_TYPE"]
                if e["subj"] == v[0]["node_id"]]
        assert [nodes[t]["name"] for t in tids] == [vtype], vname


def test_cpp_unscoped_constants_leak_and_resolve():
    """Unscoped C enum constants are visible in the enclosing scope: a
    bare `RED` reference links REFERS_TO the EnumConstantDeclaration and
    the entry's value flows DFG into the reference."""
    g = parse_cpp_document("cpp/enums/0001", 0, CPP_FIXTURES["enums"], None)
    nodes, edges = _index(g)
    red = {nid for nid, n in nodes.items()
           if n["label"] == "EnumConstantDeclaration" and n["name"] == "RED"}
    refs = [e for e in edges["REFERS_TO"] if e["obj"] in red]
    assert len(refs) == 1  # `int x = RED;` in use()
    assert nodes[refs[0]["subj"]]["label"] == "DeclaredReferenceExpression"
    assert any(e["subj"] in red for e in edges["DFG"])


def test_java_enum_in_reference_fixture():
    """The reference's compiling/MemberCallExpression.java: nested enum
    Color, entries typed as Color, and `Color.RED` resolving to the
    entry as a member access."""
    g = parse_java_document("java/MemberCallExpressionCT/0001", 0,
                            JAVA_FIXTURES["MemberCallExpressionCT"], None)
    nodes, edges = _index(g)
    assert not [n for n in g.nodes if n["label"] == "ProblemDeclaration"]
    assert _entries_of(nodes, edges, "Color") == ["RED", "GREEN", "BLUE"]
    # every entry evaluates to the enum's own type
    # (DeclarationHandler.java:400)
    ents = {nid for nid, n in nodes.items()
            if n["label"] == "EnumConstantDeclaration"}
    for nid in ents:
        tids = [e["obj"] for e in edges["EVAL_TYPE"] if e["subj"] == nid]
        assert [nodes[t]["name"] for t in tids] == ["Color"]
    # Color.RED argument resolves to the RED entry
    red = {nid for nid, n in nodes.items()
           if n["label"] == "EnumConstantDeclaration" and n["name"] == "RED"}
    assert any(e["obj"] in red for e in edges["REFERS_TO"])


def test_go_iota_enum():
    g = parse_go_document("go/state/0001", 0, GO_SRC, None)
    nodes, edges = _index(g)
    assert _entries_of(nodes, edges, "Phase") == ["Idle", "Busy", "Done"]
    # ordinals materialize as implicit Literal initializers 0,1,2
    ords = {}
    ents = {nid: n["name"] for nid, n in nodes.items()
            if n["label"] == "EnumConstantDeclaration"}
    for e in edges["AST"]:
        if e["subj"] in ents and e["props"].get("field") == "INITIALIZER":
            lit = nodes[e["obj"]]
            assert lit["label"] == "Literal" and lit["is_implicit"]
            ords[ents[e["subj"]]] = lit["name"]
    assert ords == {"Idle": "0", "Busy": "1", "Done": "2"}
    # `return Busy` resolves to the entry; plain `const Answer = 42`
    # stays an ordinary VariableDeclaration
    busy = {nid for nid in ents if ents[nid] == "Busy"}
    assert any(e["obj"] in busy for e in edges["REFERS_TO"])
    ans = [n for n in nodes.values() if n["name"] == "Answer"]
    assert [n["label"] for n in ans] == ["VariableDeclaration"]
