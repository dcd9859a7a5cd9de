"""JavaVsCppTest parity (cpg-core/.../enhancements/JavaVsCppTest.java over
resources/javaVsCpp/simple.{cpp,java}): the SAME program in both languages
must yield the SAME graph — the reference asserts a canonically-numbered
EOG; we assert canonical EOG isomorphism plus matching node-label and
triple-shape multisets (our EOG is statement-granular in both dialects, so
the cross-language invariant is exactly preserved)."""

from __future__ import annotations

from collections import deque

from cpg_spark.frontends.cfamily_frontend import (parse_cpp_document,
                                                  parse_java_document)

_CPP = """class Simple {

  public:
    void foo(int x) {
                        int j = 7;
                        if (x < 42) {
                          j = x;
                        }
                        printf(j);
                    }
};
"""

_JAVA = """public class Simple {


  public void foo(int x) {
    int j = 7;
    if (x < 42) {
      j = x;
    }
    printf(j);
  }
}
"""


def _canonical_eog(g):
    """BFS-numbered (label sequence, edge set) from the foo declaration —
    the reference's normalization (JavaVsCppTest.java:60-115)."""
    nodes = {n["node_id"]: n for n in g.nodes}
    adj = {}
    for e in g.edges:
        if e["pred"] == "EOG":
            adj.setdefault(e["subj"], []).append(e["obj"])
    start = next(n["node_id"] for n in g.nodes
                 if n["label"].endswith("Declaration") and n["name"] == "foo")
    order = {start: 0}
    labels = [nodes[start]["label"]]
    edges = set()
    q = deque([start])
    while q:
        u = q.popleft()
        # deterministic successor order: by (label, source line, col)
        succs = sorted(adj.get(u, []),
                       key=lambda v: (nodes[v]["label"],
                                      (nodes[v]["loc"] or {}).get("start_line") or -1,
                                      (nodes[v]["loc"] or {}).get("start_col") or -1))
        for v in succs:
            if v not in order:
                order[v] = len(order)
                labels.append(nodes[v]["label"])
                q.append(v)
            edges.add((order[u], order[v]))
    return labels, edges


def test_java_and_cpp_produce_isomorphic_eog():
    gc = parse_cpp_document("cpp/simple/0001", 0, _CPP, "simple")
    gj = parse_java_document("java/Simple/0001", 0, _JAVA, "simple")
    lc, ec = _canonical_eog(gc)
    lj, ej = _canonical_eog(gj)
    # MethodDeclaration vs FunctionDeclaration naming may differ between
    # dialect entry points; normalize the root label only
    norm = lambda ls: ["<fn>"] + ls[1:]  # noqa: E731
    assert norm(lc) == norm(lj)
    assert ec == ej


def test_java_and_cpp_same_record_shape():
    gc = parse_cpp_document("cpp/simple/0001", 0, _CPP, "simple")
    gj = parse_java_document("java/Simple/0001", 0, _JAVA, "simple")

    def shape(g):
        nodes = {n["node_id"]: n for n in g.nodes}
        preds = sorted((e["pred"], nodes[e["subj"]]["label"],
                        nodes[e["obj"]]["label"])
                       for e in g.edges if e["pred"] != "EOG")
        recs = sorted((n["label"], n["name"]) for n in g.nodes
                      if n["label"] == "RecordDeclaration")
        return preds, recs

    pc, rc = shape(gc)
    pj, rj = shape(gj)
    assert rc == rj == [("RecordDeclaration", "Simple")]
    assert pc == pj
