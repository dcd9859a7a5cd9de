"""Fixture-level parity tests for the Python frontend.

Each test re-asserts, over our emitted triples, the facts the reference's
PythonFrontendTest.kt asserts over its object graph (FIXTURES.md §2 maps
assertion -> expected triple).  Pure Python — no Spark session — so these
run in milliseconds and pin the frontend semantics exactly.
"""

from __future__ import annotations

from cpg_spark.fixtures_py import PY_FIXTURES
from cpg_spark.frontends.python_frontend import parse_python_document


def graph(name):
    g = parse_python_document(f"py/{name}/0001", 0, PY_FIXTURES[name], name)
    nodes = {n["node_id"]: n for n in g.nodes}
    return g, nodes


def find(nodes, label=None, name=None):
    out = []
    for n in nodes.values():
        if label is not None and n["label"] != label:
            continue
        if name is not None and n["name"] != name:
            continue
        out.append(n)
    return out


def edges_of(g, pred):
    return [e for e in g.edges if e["pred"] == pred]


def eval_type_name(g, nodes, node_id):
    for e in g.edges:
        if e["pred"] == "EVAL_TYPE" and e["subj"] == node_id:
            return nodes[e["obj"]]["name"]
    return None


# --------------------------------------------------------------------------
def test_literal_types():
    # PythonFrontendTest.testLiteral (PythonFrontendTest.kt:52-105)
    g, nodes = graph("literal")
    expected = {"b": "bool", "i": "int", "f": "float", "t": "str", "n": "None"}
    for var, tpe in expected.items():
        (decl,) = find(nodes, "VariableDeclaration", var)
        assert eval_type_name(g, nodes, decl["node_id"]) == tpe, var
    # literal initializers flow into the variables (VariableDeclaration.java:118)
    lit_dfg = {
        (nodes[e["subj"]]["label"], nodes[e["obj"]]["name"])
        for e in edges_of(g, "DFG")
        if nodes[e["subj"]]["label"] == "Literal"
    }
    assert {("Literal", v) for v in expected} <= lit_dfg


def test_function_fixture():
    # PythonFrontendTest.testFunctionDeclaration (PythonFrontendTest.kt:107-195)
    g, nodes = graph("function")
    (foo,) = find(nodes, "FunctionDeclaration", "foo")
    (bar,) = find(nodes, "FunctionDeclaration", "bar")

    # call bar(...) CALLS the declaration of bar
    calls = [(e["subj"], e["obj"]) for e in edges_of(g, "CALLS")]
    bar_calls = [c for c in calls if c[1] == bar["node_id"]]
    assert len(bar_calls) == 1
    call_node = nodes[bar_calls[0][0]]
    assert call_node["label"] == "CallExpression" and call_node["name"] == "bar"

    # argument edge index 1 carries NAME prop 's2' (kt:141-143)
    args = [e for e in edges_of(g, "ARGUMENTS") if e["subj"] == call_node["node_id"]]
    by_index = {e["props"]["index"]: e for e in args}
    assert by_index["1"]["props"].get("name") == "s2"

    # bar has parameters s, s2 with EVAL_TYPE str (kt:145-148)
    params = find(nodes, "ParamVariableDeclaration")
    assert {p["name"] for p in params} == {"s", "s2"}
    s_param = [p for p in params if p["name"] == "s"][0]
    assert eval_type_name(g, nodes, s_param["node_id"]) == "str"

    # print(...) is unresolved locally -> exported mention (reference infers
    # a FunctionDeclaration in CallResolver)
    assert [m for m in g.mentions if m["name"] == "print" and m["kind"] == "call"]

    # ref 's' REFERS_TO the parameter s (kt:167-171)
    refs = [
        e for e in edges_of(g, "REFERS_TO")
        if nodes[e["subj"]]["name"] == "s" and e["obj"] == s_param["node_id"]
    ]
    assert refs

    # a = 1 + 2: BinaryOperator '+', literal operands 1, 2 (kt:181-194)
    (a_decl,) = find(nodes, "VariableDeclaration", "a")
    init = [
        e for e in edges_of(g, "AST")
        if e["subj"] == a_decl["node_id"] and e["props"]["field"] == "INITIALIZER"
    ]
    op = nodes[init[0]["obj"]]
    assert op["label"] == "BinaryOperator" and op["name"] == "+"
    operand_names = sorted(
        nodes[e["obj"]]["name"]
        for e in edges_of(g, "AST")
        if e["subj"] == op["node_id"] and e["props"]["field"] in ("LHS", "RHS")
    )
    assert operand_names == ["1", "2"]

    # return statement exists and the module namespace is named 'function'
    assert find(nodes, "ReturnStatement")
    assert find(nodes, "NamespaceDeclaration", "function")


def test_if_eog_branches():
    # PythonFrontendTest.testIf: EOG BRANCH true/false
    g, nodes = graph("if")
    eog = edges_of(g, "EOG")
    branches = {e["props"].get("branch") for e in eog}
    assert "true" in branches and "false" in branches
    # the condition is the DeclaredReferenceExpression 'sel'
    br_true = [e for e in eog if e["props"].get("branch") == "true"]
    assert nodes[br_true[0]["subj"]]["name"] == "sel"


def test_simple_class_construct_and_member_call():
    # PythonFrontendTest (simple_class.py): ConstructExpression + member call
    g, nodes = graph("simple_class")
    (ctor,) = find(nodes, "ConstructExpression", "SomeClass")
    (rec,) = find(nodes, "RecordDeclaration", "SomeClass")
    assert any(
        e["pred"] == "INSTANTIATES" and e["subj"] == ctor["node_id"]
        and e["obj"] == rec["node_id"]
        for e in g.edges
    )
    # c1.someFunc() resolves to the method (type of c1 flows from the ctor)
    (method,) = find(nodes, "MethodDeclaration", "someFunc")
    mcalls = [
        e for e in edges_of(g, "CALLS")
        if e["obj"] == method["node_id"]
        and nodes[e["subj"]]["label"] == "MemberCallExpression"
    ]
    assert mcalls


def test_class_self_field_and_method_call():
    # class_self.py: self.bar(123) CALLS bar; self.somevar = i -> field + DFG
    g, nodes = graph("class_self")
    (bar,) = find(nodes, "MethodDeclaration", "bar")
    assert any(
        e["pred"] == "CALLS" and e["obj"] == bar["node_id"] for e in g.edges
    )
    (field,) = find(nodes, "FieldDeclaration", "somevar")
    # DFG: parameter i -> field somevar (via the rhs reference)
    dfg_into_field = [
        nodes[e["subj"]] for e in edges_of(g, "DFG") if e["obj"] == field["node_id"]
    ]
    assert any(n["name"] == "i" for n in dfg_into_field)


def test_reference_gaps_reproduced():
    # parity mode: the reference emits empty Expression dummies for these
    # (_expressions.py:46-139) — parity must too, not real operator nodes
    src = "x = 1\ny = not x\nz = [i for i in range(3)]\nw = lambda a: a\n"
    g = parse_python_document("py/gaps/0001", 0, src, "gaps",
                              parity_mode=True)
    labels = {n["label"] for n in g.nodes}
    assert "UnaryOperator" not in labels
    assert "LambdaExpression" not in labels
    gap_nodes = [n for n in g.nodes if n["label"] == "Expression"]
    assert len(gap_nodes) >= 3


def test_fidelity_default_models_former_gaps():
    # full fidelity (the round-5 default): the same source yields real
    # operator/lambda/comprehension nodes and ZERO empty gap dummies
    src = "x = 1\ny = not x\nz = [i for i in range(3)]\nw = lambda a: a\n"
    g = parse_python_document("py/gaps/0001", 0, src, "gaps")
    labels = {n["label"] for n in g.nodes}
    assert {"UnaryOperator", "LambdaExpression",
            "CollectionComprehension"} <= labels
    assert not [n for n in g.nodes
                if n["label"] in ("Expression", "Statement")
                and not n["name"]]


def test_parity_and_fidelity_agree_on_reference_fixtures():
    # the reference's own fixtures use (almost) no gapped construct, so
    # both modes emit bit-identical rows for them — this equivalence is
    # what keeps the P/R gates meaningful for the fidelity default.
    # issue615 is the one exception: its `for t1, t2, t3 in test:` tuple
    # target was a reference gap (unresolved refs) that fidelity upgrades
    # to declared VariableDeclarations.
    for name, src in PY_FIXTURES.items():
        if name == "issue615":
            continue
        a = parse_python_document(f"py/{name}/0001", 0, src, name)
        b = parse_python_document(f"py/{name}/0001", 0, src, name,
                                  parity_mode=True)
        assert a.nodes == b.nodes, name
        assert a.edges == b.edges, name


def test_augassign_quirk():
    # reference dead-code branch: a += 1 on a resolved var yields a '='
    # BinaryOperator (handle_assign_impl, _statements.py:467-475 never fires)
    src = "a = 1\na += 1\n"
    g = parse_python_document("py/aug/0001", 0, src, "aug")
    ops = [n for n in g.nodes if n["label"] == "BinaryOperator"]
    assert len(ops) == 1 and ops[0]["name"] == "="


def test_all_fixtures_parse_clean():
    for name in PY_FIXTURES:
        g, nodes = graph(name)
        assert not find(nodes, "ProblemDeclaration"), name
        assert len(g.nodes) > 2, name
