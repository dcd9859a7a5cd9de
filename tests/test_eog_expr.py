"""Expression-level EOG (flag-gated rewrite,
EvaluationOrderGraphPass.java:917-951): operand-before-operator chains,
call-argument order, short-circuit interplay — statement-level output
stays byte-identical when the flag is off."""

from __future__ import annotations

from cpg_spark.frontends.cfamily_frontend import parse_java_document
from cpg_spark.frontends.eog import expand_expression_eog


def _eog(src, expand):
    g = parse_java_document("java/X/1", 0, src, None)
    if expand:
        expand_expression_eog(g)
    ids = {n["node_id"]: n for n in g.nodes}

    def nm(x):
        n = ids[x]
        return f"{n['label']}:{n['name']}"

    return [(nm(e["subj"]), nm(e["obj"]), e["props"].get("branch"))
            for e in g.edges if e["pred"] == "EOG"], ids


SRC = """public class X {
  int f(int a, int b) {
    int c = g(a + 1, b);
    return c * 2;
  }
  int g(int x, int y) { return x; }
}"""


def test_flag_off_is_statement_level():
    off, _ = _eog(SRC, expand=False)
    on, _ = _eog(SRC, expand=True)
    assert len(on) > len(off)
    # every statement-level successor pair survives (possibly rewired),
    # and no operand chains exist without the flag
    assert not [e for e in off
                if e[0].startswith("Literal") or e[1].startswith("Literal")]


def test_call_arguments_evaluate_in_order_before_call():
    """g(a + 1, b): a -> 1 -> (+) -> b -> call  (argument index order,
    each argument's subtree complete before the next —
    handleCallExpression)."""
    edges, _ = _eog(SRC, expand=True)
    succ = {}
    for s, d, _br in edges:
        succ.setdefault(s, []).append(d)
    assert "Literal:1" in succ["DeclaredReferenceExpression:a"]
    assert "BinaryOperator:+" in succ["Literal:1"]
    assert "DeclaredReferenceExpression:b" in succ["BinaryOperator:+"]
    assert any(d.startswith("CallExpression")
               for d in succ["DeclaredReferenceExpression:b"])


def test_short_circuit_kept_exact():
    """(a > 0) && (b > 0): lhs subtree -> lhs op; lhs op branches to BOTH
    the rhs entry and the && node (exactly 2 successors, EOGTest
    testConditionShortCircuit); rhs exit converges on the && node."""
    src = """public class X {
  void f(int a, int b) {
    if (a > 0 && b > 0) { a = 1; }
  }
}"""
    edges, _ = _eog(src, expand=True)
    succ = {}
    for s, d, _br in edges:
        succ.setdefault(s, []).append(d)
    gt_succ = succ["BinaryOperator:>"]
    # two '>' nodes share the display key; the lhs one must have exactly
    # the two short-circuit successors among them
    assert "DeclaredReferenceExpression:b" in gt_succ  # rhs entry
    assert "BinaryOperator:&&" in gt_succ
    # operands still chain inside each side
    assert "Literal:0" in succ["DeclaredReferenceExpression:a"]
    assert "BinaryOperator:>" in succ["Literal:0"]
