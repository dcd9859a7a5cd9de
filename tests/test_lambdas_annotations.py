"""Round-4 grammar breadth: Java annotations (reference node model
Annotation.java/AnnotationMember.java; JavaLanguageFrontendTest.kt
testAnnotations:473-521 semantics) and C++/Java lambdas
(LambdaExpression.kt:40-56 node model: anonymous FunctionDeclaration AST
child, fn->lambda DFG, FunctionPointerType EVAL_TYPE when derivable).
The reference's CDT/JavaParser frontends degrade both to skipped tokens /
Problem nodes; we emit the reference's own node model instead."""

from __future__ import annotations

from cpg_spark import queries as Q
from cpg_spark.frontends.cfamily_frontend import (
    parse_cpp_document,
    parse_java_document,
)

SF = "/root/testdata/sf0.001"


def test_annotations_reference_fixture(spark):
    """Exactly the facts JavaLanguageFrontendTest.kt testAnnotations
    asserts: class annotation member value=2, marker field annotation
    (no members), single-member form binds implicit name 'value'."""
    rows = [tuple(r) for r in Q.q_cpg_annotations(spark, SF).collect()]
    assert rows == [
        ("FieldDeclaration", "anotherField", "AnnotatedField", "value",
         "myString"),
        ("FieldDeclaration", "field", "AnnotatedField", "", ""),
        ("RecordDeclaration", "Annotation", "AnnotationForClass", "value",
         "2"),
    ]


def test_lambdas_both_dialects(spark):
    rows = [tuple(r) for r in Q.q_cpg_lambdas(spark, SF).collect()]
    assert rows == [
        ("cpp/lambdas/0001", 5, 1, "int(*)(int)", 1),
        ("cpp/lambdas/0001", 6, 1, "int(*)(int)", 1),
        ("cpp/lambdas/0001", 7, 1, "", 1),
        ("cpp/lambdas/0001", 8, 0, "", 1),
        ("java/Lambdas/0001", 6, 1, "", 1),
        ("java/Lambdas/0001", 7, 1, "", 1),
        ("java/Lambdas/0001", 8, 1, "", 1),
        ("java/Lambdas/0001", 9, 0, "", 1),
    ]


def test_lambda_body_scope_and_eog():
    """Lambda bodies resolve enclosing locals through the scope stack
    (capture visibility) and get their own per-function EOG."""
    src = ("int main() {\n"
           "  int n = 3;\n"
           "  auto f = [&n](int x) -> int { n = n + x; return n; };\n"
           "  return f(1);\n"
           "}\n")
    g = parse_cpp_document("d", 0, src, "m")
    nodes = {r["node_id"]: r for r in g.nodes}
    lam = next(r for r in g.nodes if r["label"] == "LambdaExpression")
    fn = next(e["obj"] for e in g.edges
              if e["props"].get("field") == "FUNCTION"
              and e["subj"] == lam["node_id"])
    # the body's `n` refs REFERS_TO the enclosing local n
    n_decl = next(r["node_id"] for r in g.nodes
                  if r["label"] == "VariableDeclaration" and r["name"] == "n")
    refs_to_n = [e for e in g.edges
                 if e["pred"] == "REFERS_TO" and e["obj"] == n_decl]
    assert len(refs_to_n) >= 3  # decl-stmt read + 2 in the lambda body
    # per-function EOG rooted at the lambda's FunctionDeclaration
    eog_from_fn = [e for e in g.edges if e["pred"] == "EOG"
                   and e["subj"] == fn]
    assert eog_from_fn, "lambda function must root its own EOG"
    # no Problem nodes anywhere
    assert not [r for r in g.nodes if "Problem" in r["label"]]


def test_annotation_interleaved_with_modifiers():
    """`@A public @B void f()` — annotations interleave with modifiers
    (JLS 8.4.3) and all attach to the declaration."""
    src = ("public class C {\n"
           "  @A public @B void f(@NonNull int x) {\n"
           "  }\n"
           "}\n")
    g = parse_java_document("d", 0, src, "m")
    nodes = {r["node_id"]: r for r in g.nodes}
    owners = {}
    for e in g.edges:
        if e["props"].get("field") == "ANNOTATIONS":
            owners.setdefault(
                (nodes[e["subj"]]["label"], nodes[e["subj"]]["name"]),
                set()).add(nodes[e["obj"]]["name"])
    assert owners[("MethodDeclaration", "f")] == {"A", "B"}
    assert owners[("ParamVariableDeclaration", "x")] == {"NonNull"}


def test_java_lambda_call_resolves_in_body():
    """`() -> helper(seed)` — the call inside the lambda body resolves
    to the sibling method like any other same-document call."""
    from cpg_spark.fixtures_cfamily import JAVA_FIXTURES

    g = parse_java_document("d", 0, JAVA_FIXTURES["Lambdas"], "m")
    nodes = {r["node_id"]: r for r in g.nodes}
    helper = next(r["node_id"] for r in g.nodes
                  if r["label"] == "MethodDeclaration"
                  and r["name"] == "helper")
    calls = [e for e in g.edges
             if e["pred"] == "CALLS" and e["obj"] == helper]
    assert len(calls) == 1
