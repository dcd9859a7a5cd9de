"""Modern Java (14-17) constructs parse with zero Problem nodes:
records, sealed types, text blocks, var, switch expressions with
arrow/yield, pattern-matching instanceof with its flow-scoped binding
(JLS 14.30).  Probe-driven like the libstdc++/Go/TS robustness legs."""

from __future__ import annotations

from cpg_spark.frontends.cfamily_frontend import parse_java_document


def _probs(g):
    return [n for n in g.nodes if "Problem" in (n.get("label") or "")]


def test_modern_java_constructs_parse_clean():
    snippets = {
        "record": "record Point(int x, int y) { int sum() "
                  "{ return x + y; } }",
        "sealed": "sealed interface Shape permits Circle, Square {}\n"
                  "final class Circle implements Shape {}\n"
                  "final class Square implements Shape {}",
        "text_block": 'class T { String s = """\n  hello\n  """; }',
        "var_local": "class V { void f() { var list = new java.util."
                     "ArrayList<String>(); var n = list.size(); } }",
        "switch_expr_yield": "class S { int f(int x) { return switch (x)"
                             " { case 1, 2 -> 10; case 3 -> { int y = x"
                             " * 2; yield y; } default -> 0; }; } }",
        "instanceof_pattern": "class P { int f(Object o) { if (o"
                              " instanceof String s) { return"
                              " s.length(); } return 0; } }",
        "instanceof_pattern_guard": "class P2 { int f(Object o) { if (o"
                                    " instanceof String s &&"
                                    " s.length() > 2) return 1;"
                                    " return 0; } }",
        "method_ref_stream": "import java.util.List; class C { long"
                             " f(List<String> xs) { return xs.stream()"
                             ".filter(s -> !s.isEmpty())"
                             ".map(String::trim).count(); } }",
    }
    for name, src in snippets.items():
        g = parse_java_document(name + ".java", 0, src)
        assert not _probs(g), (name, [p["name"] for p in _probs(g)])


def test_instanceof_binding_declares_and_flows():
    g = parse_java_document("b.java", 0,
                            "class P { int f(Object o) { if (o instanceof"
                            " String s) { return s.length(); } return 0;"
                            " } }")
    binds = [n for n in g.nodes if n["label"] == "VariableDeclaration"
             and n["name"] == "s"]
    assert len(binds) == 1
    # the tested value DFG-flows into the binding
    srcs = [e["subj"] for e in g.edges
            if e["pred"] == "DFG" and e["obj"] == binds[0]["node_id"]]
    ref_o = [n["node_id"] for n in g.nodes
             if n["label"] == "DeclaredReferenceExpression"
             and n["name"] == "o"]
    assert set(srcs) & set(ref_o)
    # `s.length()` resolves: the member call's base ref REFERS_TO s
    assert any(n["label"] == "MemberCallExpression"
               and n["name"] == "length" for n in g.nodes)


def test_switch_expression_value_flow():
    """Java 14 switch EXPRESSION (JLS 15.28) — the reference predates
    the construct, so `SwitchExpression` is a documented label
    extension: each arm's value (arrow expr or yield) DFG-flows into
    the expression node."""
    g = parse_java_document(
        "S.java", 0,
        "class S { int f(int x) { return switch (x) { case 1, 2 -> 10;"
        " case 3 -> { int y = x * 2; yield y; } default -> 0; }; } }")
    assert not _probs(g)
    sw = [n for n in g.nodes if n["label"] == "SwitchExpression"]
    assert len(sw) == 1
    flows = [e for e in g.edges
             if e["pred"] == "DFG" and e["obj"] == sw[0]["node_id"]]
    assert len(flows) == 3  # 10, yield y, 0
    assert any(n["label"] == "YieldStatement" for n in g.nodes)


def test_arrow_statement_switch_no_fallthrough():
    """Arrow arms in STATEMENT switches (JLS 14.11.1) terminate with an
    implicit break — no fall-through edges between arms."""
    g = parse_java_document(
        "T.java", 0,
        "class T { void f(int x) { switch (x) { case 1, 2 -> g();"
        " default -> h(); } } void g() {} void h() {} }")
    assert not _probs(g)
    case = next(n for n in g.nodes if n["label"] == "CaseStatement")
    labels = [e for e in g.edges
              if e["pred"] == "AST" and e["subj"] == case["node_id"]
              and e["props"].get("field") == "CASE_EXPRESSION"]
    assert len(labels) == 2  # multi-label case 1, 2
    assert any(n["label"] == "BreakStatement" and n["is_implicit"]
               for n in g.nodes)


def test_java_unsigned_shift_and_explicit_type_args():
    """`>>>`/`>>>=` combine from adjacent `>>` `>`/`>=` tokens (the
    tokenizer keeps `>>` splittable for C++ template closers), and
    explicit type-argument calls erase the witness (JLS 15.12)."""
    from cpg_spark.frontends.cfamily_frontend import parse_java_document

    g = parse_java_document(
        "A.java", 0,
        "class A { int f(int x) { x >>>= 1; return x >>> 2; } }")
    assert not [n for n in g.nodes if "Problem" in (n["label"] or "")]
    ops = [n["name"] for n in g.nodes if n["label"] == "BinaryOperator"]
    assert ">>>=" in ops and ">>>" in ops
    g2 = parse_java_document(
        "B.java", 0,
        "class B { java.util.List<String> f() { return"
        " java.util.Collections.<String>emptyList(); } }")
    assert not [n for n in g2.nodes if "Problem" in (n["label"] or "")]
    assert not [n for n in g2.nodes if n["label"] == "Expression"]
    calls = [n for n in g2.nodes if n["label"] == "MemberCallExpression"]
    assert any(c["name"] == "emptyList" for c in calls)
    # triple-close generics still split fine
    g3 = parse_java_document(
        "C.java", 0,
        "class C { java.util.Map<String, java.util.List<java.util.Set<"
        "Integer>>> m; }")
    assert not [n for n in g3.nodes if "Problem" in (n["label"] or "")]
