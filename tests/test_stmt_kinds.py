"""Statement/expression node kinds from the round-2 sweep:
AssertStatement, SynchronizedStatement (statements/), DeleteExpression,
ExplicitConstructorInvocation (statements/expressions/) — each pinned with
its reference AST shape instead of degrading to placeholder nodes."""

from __future__ import annotations

from cpg_spark.frontends.cfamily_frontend import (
    parse_cpp_document,
    parse_java_document,
)

JAVA_SRC = """public class A extends B {
  int x;
  public A() { super(); }
  public A(int v) { this(); assert v > 0 : "neg"; }
  public void m() { synchronized (this) { x = 1; } }
}"""

# the reference's own fixture
# (cpg-core/src/test/resources/components/ExplicitConstructorInvocationStmt.java)
ECI_SRC = """import java.util.Arrays;

class ExplicitConstructorInvocationStmt {

\tpublic ExplicitConstructorInvocationStmt(){
\t\tsuper();
\t}

\tpublic static void main(String[] args){
\t\t
\t}
}"""

CPP_SRC = """struct P { int v; };
int main() {
  P* p = new P();
  delete p;
  int* arr = new int[4];
  delete[] arr;
  return 0;
}"""


def _index(g):
    nodes = {n["node_id"]: n for n in g.nodes}
    edges = {}
    for e in g.edges:
        edges.setdefault(e["pred"], []).append(e)
    return nodes, edges


def _ast_children(nodes, edges, nid, field):
    return [nodes[e["obj"]] for e in edges["AST"]
            if e["subj"] == nid and e["props"].get("field") == field]


def test_assert_statement():
    nodes, edges = _index(parse_java_document("java/A/1", 0, JAVA_SRC, None))
    a, = [n for n in nodes.values() if n["label"] == "AssertStatement"]
    cond = _ast_children(nodes, edges, a["node_id"], "CONDITION")
    msg = _ast_children(nodes, edges, a["node_id"], "MESSAGE")
    assert [c["label"] for c in cond] == ["BinaryOperator"]
    assert [m["label"] for m in msg] == ["Literal"] and msg[0]["name"] == "neg"


def test_synchronized_statement():
    nodes, edges = _index(parse_java_document("java/A/1", 0, JAVA_SRC, None))
    s, = [n for n in nodes.values()
          if n["label"] == "SynchronizedStatement"]
    expr = _ast_children(nodes, edges, s["node_id"], "EXPRESSION")
    blk = _ast_children(nodes, edges, s["node_id"], "BLOCK_STATEMENT")
    assert [e["name"] for e in expr] == ["this"]
    assert [b["label"] for b in blk] == ["CompoundStatement"]


def test_explicit_constructor_invocation():
    nodes, edges = _index(parse_java_document("java/A/1", 0, JAVA_SRC, None))
    ecis = {n["name"]: n for n in nodes.values()
            if n["label"] == "ExplicitConstructorInvocation"}
    assert set(ecis) == {"this", "super"}
    assert ecis["this"]["props"]["containingClass"] == "A"
    assert ecis["super"]["props"]["containingClass"] == "B"
    # this() resolves through the ctor overload ladder to the no-arg A()
    tgt = [nodes[e["obj"]] for e in edges["CONSTRUCTOR"]
           if e["subj"] == ecis["this"]["node_id"]]
    assert [t["label"] for t in tgt] == ["ConstructorDeclaration"]


def test_eci_reference_fixture_parses():
    nodes, edges = _index(parse_java_document(
        "java/ExplicitConstructorInvocationStmt/1", 0, ECI_SRC, None))
    assert not [n for n in nodes.values()
                if n["label"] == "ProblemDeclaration"]
    e, = [n for n in nodes.values()
          if n["label"] == "ExplicitConstructorInvocation"]
    assert e["name"] == "super"


def test_delete_expression():
    nodes, edges = _index(parse_cpp_document("cpp/d/1", 0, CPP_SRC, None))
    dels = [n for n in nodes.values() if n["label"] == "DeleteExpression"]
    assert len(dels) == 2
    arr_forms = sorted(d["props"].get("array", "") for d in dels)
    assert arr_forms == ["", "true"]
    operands = sorted(
        nodes[e["obj"]]["name"] for e in edges["AST"]
        if nodes[e["subj"]]["label"] == "DeleteExpression"
        and e["props"].get("field") == "OPERAND")
    assert operands == ["arr", "p"]


def test_expression_list():
    """Comma sequences in for clauses -> ExpressionList with ordered
    EXPRESSIONS children (expressions/ExpressionList.java;
    cpp/ExpressionHandler.kt:604-610); the last expression's value flows
    DFG into the list."""
    src = """int main() {
  int i, j;
  for (i = 0, j = 10; i < j; i++, j--) { }
  return 0;
}"""
    nodes, edges = _index(parse_cpp_document("cpp/el/1", 0, src, None))
    els = [n for n in nodes.values() if n["label"] == "ExpressionList"]
    assert len(els) == 2  # init and post clause
    kids = {}
    for e in edges["AST"]:
        if e["props"].get("field") == "EXPRESSIONS":
            kids.setdefault(e["subj"], []).append(
                (int(e["props"]["index"]), nodes[e["obj"]]["name"]))
    shapes = sorted(tuple(n for _, n in sorted(v)) for v in kids.values())
    assert shapes == [("++", "--"), ("=", "=")]
    # last expression DFG-flows into each list
    el_ids = {n["node_id"] for n in els}
    assert sum(1 for e in edges["DFG"] if e["obj"] in el_ids) == 2


def test_array_range_expression():
    """GNU range designator [5 ... 7] -> ArrayRangeExpression with
    FLOOR/CEILING (expressions/ArrayRangeExpression.java)."""
    src = "int foo2[10] = { [3] = 1, [5 ... 7] = 2 };"
    nodes, edges = _index(parse_cpp_document("cpp/ar/1", 0, src, None))
    are, = [n for n in nodes.values()
            if n["label"] == "ArrayRangeExpression"]
    bounds = {e["props"]["field"]: nodes[e["obj"]]["name"]
              for e in edges["AST"] if e["subj"] == are["node_id"]}
    assert bounds == {"FLOOR": "5", "CEILING": "7"}


def test_uninitialized_value():
    """Java locals without an initializer carry an implicit
    UninitializedValue initializer (java/ExpressionHandler.java:258-261);
    initialized locals and C++ locals do not."""
    nodes, edges = _index(parse_java_document(
        "java/U/1", 0,
        "public class A { void f() { int x; int y = 1; } }", None))
    uvs = [n for n in nodes.values() if n["label"] == "UninitializedValue"]
    assert len(uvs) == 1 and uvs[0]["is_implicit"]
    owner, = [nodes[e["subj"]] for e in edges["AST"]
              if e["obj"] == uvs[0]["node_id"]]
    assert owner["name"] == "x"
    cn, _ = _index(parse_cpp_document("cpp/U/1", 0,
                                      "int main() { int x; return x; }",
                                      None))
    assert not [n for n in cn.values() if n["label"] == "UninitializedValue"]
