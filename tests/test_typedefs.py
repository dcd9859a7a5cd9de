"""TypedefTest parity (cpg-core/src/test/java/.../TypedefTest.java over
resources/typedefs/typedefs.cpp): typedef aliases resolve at parse time
through a scope-stack alias table (the reference's ScopeManager typedef
table), so every spelling of one type mints the same canonical Type node.

Covers: simple/chained typedefs, pointer/array/function-pointer
declarators, declarator lists (`typedef int int_t, *intp_t, (*fp)(int,
ulong), arr_t[10];`), the anonymous `typedef struct {...} S, *pS;` idiom,
typedef anywhere in the decl-specifier-seq (`unsigned long typedef long
int ullong;`), and member / function-local typedef scoping."""

from __future__ import annotations

import pytest

from cpg_spark.frontends.cfamily_frontend import parse_cpp_document

@pytest.fixture(scope="module")
def graph():
    from cpg_spark.fixtures_cfamily import CPP_FIXTURES

    return parse_cpp_document("cpp/typedefs/0001", 1,
                              CPP_FIXTURES["typedefs"], None)


@pytest.fixture(scope="module")
def types_of(graph):
    nodes = {n["node_id"]: n for n in graph.nodes}
    et = {}
    for e in graph.edges:
        if e["pred"] == "EVAL_TYPE":
            et[e["subj"]] = e["obj"]

    def lookup(name):
        out = []
        for n in graph.nodes:
            if n["name"] == name and n["label"] in (
                    "VariableDeclaration", "FieldDeclaration"):
                t = nodes.get(et.get(n["node_id"]))
                out.append(t["name"] if t else None)
        assert out, f"no declaration named {name}"
        return out[0]

    return lookup


def test_parses_clean(graph):
    assert not [n for n in graph.nodes
                if n["label"].startswith("Problem")]


@pytest.mark.parametrize("a,b", [
    ("l1", "l2"),            # testSingle: normal type
    ("l1", "l3"),            # testChained
    ("l1", "l4"),            # testChained
    ("longptr1", "longptr2"),  # testSingle: pointer
    ("l1ptr", "l4ptr"),      # testWithModifier: pointers
    ("l1arr", "l4arr"),      # testWithModifier: arrays
    ("arr1", "arr2"),        # testSingle: sized array
    ("uintfp1", "uintfp2"),  # testSingle: function pointer
    ("i1", "i2"),            # testMultiple: simple
    ("a1", "a2"),            # testMultiple: array
    ("intPtr1", "intPtr2"),  # testMultiple: pointer
    ("intFptr1", "intFptr2"),  # testMultiple: function pointer
    ("ps1", "ps2"),          # testStructs: anonymous struct + ptr alias
    ("someUllong1", "someUllong2"),  # testArbitraryTypedefLocation
    ("cptr1", "cptr2"),      # testMemberTypeDef: function-local typedef
    ("typeMember1", "typeMember2"),  # testMemberTypeDef: member typedef
])
def test_alias_spellings_share_one_type(types_of, a, b):
    ta, tb = types_of(a), types_of(b)
    assert ta is not None and ta == tb, (a, ta, b, tb)


def test_scoped_typedefs_do_not_leak(types_of):
    """testMemberTypeDef: the file-level `typedef long type` is shadowed
    by add_const's member typedef AND by main's local typedef — the three
    `type` spellings resolve to three different types."""
    outside = types_of("typeMemberOutside")   # long
    member = types_of("typeMember2")          # const int
    local = types_of("cptr2")                 # char*
    assert outside != member
    assert outside != local
    assert member != local


def test_typedef_declarations_emitted(graph):
    """One TypedefDeclaration node per alias (incl. the `test` alias the
    reference asserts via getCurrentTypedefs), plus the anonymous-struct
    record named after its first declarator."""
    names = sorted(n["name"] for n in graph.nodes
                   if n["label"] == "TypedefDeclaration")
    assert "test" in names
    assert {"ulong", "ulong2", "ulong3", "longp_t", "intarr", "uint_fp_t",
            "int_t", "intp_t", "fp", "arr_t", "S", "pS",
            "ullong"}.issubset(set(names))
    recs = [n["name"] for n in graph.nodes
            if n["label"] == "RecordDeclaration"]
    assert "S" in recs and "add_const" in recs


def test_alias_edges_feed_canonicalization(graph):
    """Each typedef also emits a Type->Type SUPER_TYPE alias edge — the
    input shape of the A1 alias connected-components pass."""
    nodes = {n["node_id"]: n for n in graph.nodes}
    alias_edges = [
        (nodes[e["subj"]]["name"], nodes[e["obj"]]["name"])
        for e in graph.edges
        if e["pred"] == "SUPER_TYPE"
        and nodes.get(e["subj"], {}).get("label") == "Type"
        and nodes.get(e["obj"], {}).get("label") == "Type"
    ]
    assert ("ulong", "unsigned long int") in alias_edges
    assert ("ulong2", "unsigned long int") in alias_edges  # chain resolved
