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
