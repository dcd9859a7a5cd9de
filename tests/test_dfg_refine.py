"""Control-flow-sensitive DFG refinement scenarios — mirrors the
reference's dfg test resources (ControlFlowSensitiveDFGIfMerge.java,
...IfNoMerge.java, LoopDFGs.java; oracle semantics from
ControlFlowSensitiveDFGPass.java:62-517), expressed as python fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cpg_spark.operators.dfg_refine import apply_refinement, refine_dfg
from cpg_spark.operators.parse import parse_docs, split_parse_output
from cpg_spark.schemas import DOCS_SCHEMA

IF_MERGE = """\
def f(x):
    a = 1
    if x:
        a = 2
    else:
        a = 3
    print(a)
"""

IF_NO_MERGE = """\
def f(x):
    a = 1
    if x:
        a = 2
        print(a)
"""

LOOP = """\
def f(n):
    s = 0
    while n:
        print(s)
        s = 1
    print(s)
"""


def _docs(spark, src):
    return spark.createDataFrame(
        [{"doc_id": "py/refine/0001",
          "spans": [{"kind": "code/python", "text": src, "media_ref": None,
                     "offset": 0}]}],
        schema=DOCS_SCHEMA,
    )


def _facts(spark, src):
    raw = parse_docs(_docs(spark, src)).persist()
    nodes, edges, mentions, symbols = split_parse_output(raw)
    adds, removes = refine_dfg(nodes, edges)
    refined = apply_refinement(edges, adds, removes)
    named = (
        refined.filter(F.col("pred") == "DFG")
        .join(nodes.select(F.col("node_id").alias("subj"),
                           F.col("label").alias("s_label"),
                           F.col("name").alias("s_name"),
                           F.col("loc.start_line").alias("s_line")), "subj")
        .join(nodes.select(F.col("node_id").alias("obj"),
                           F.col("label").alias("o_label"),
                           F.col("name").alias("o_name"),
                           F.col("loc.start_line").alias("o_line")), "obj")
        .select("s_label", "s_name", "s_line", "o_label", "o_name", "o_line",
                "props")
        .collect()
    )
    raw.unpersist()
    return named


def test_if_merge_both_branch_defs_reach(spark):
    """print(a) after if/else that writes a in both branches: direct edges
    from BOTH branch writes, coarse decl->ref removed (IfMerge)."""
    dfg = _facts(spark, IF_MERGE)
    # the read of `a` at line 7 (print arg)
    into_read = [r for r in dfg if r["o_name"] == "a" and r["o_line"] == 7
                 and r["o_label"] == "DeclaredReferenceExpression"]
    srcs = {(r["s_label"], r["s_line"]) for r in into_read}
    assert ("DeclaredReferenceExpression", 4) in srcs  # a = 2 write-ref
    assert ("DeclaredReferenceExpression", 6) in srcs  # a = 3 write-ref
    # the initializer def (a = 1 declaration) must NOT reach the read
    assert not any(r["s_label"] == "VariableDeclaration" for r in into_read)


def test_if_no_merge_keeps_initializer_path(spark):
    """Write only in the then-branch: the read inside the branch sees only
    that write (IfNoMerge semantics)."""
    dfg = _facts(spark, IF_NO_MERGE)
    into_read = [r for r in dfg if r["o_name"] == "a" and r["o_line"] == 5]
    srcs = {(r["s_label"], r["s_line"]) for r in into_read}
    assert ("DeclaredReferenceExpression", 4) in srcs
    assert not any(r["s_label"] == "VariableDeclaration" for r in into_read)


def test_loop_back_edge_defs(spark):
    """LoopDFGs: the read inside the loop sees the initializer AND the
    loop-carried write; the read after the loop sees both too."""
    dfg = _facts(spark, LOOP)
    inside = [r for r in dfg if r["o_name"] == "s" and r["o_line"] == 4]
    srcs_inside = {(r["s_label"], r["s_line"]) for r in inside}
    # loop-carried write s = 1 (line 5) reaches the line-4 read via the
    # back edge
    assert ("DeclaredReferenceExpression", 5) in srcs_inside
    # initializer path: decl-mediated edge retained (s = 0 first iteration)
    assert ("VariableDeclaration", 2) in srcs_inside
    after = [r for r in dfg if r["o_name"] == "s" and r["o_line"] == 6]
    srcs_after = {(r["s_label"], r["s_line"]) for r in after}
    assert ("DeclaredReferenceExpression", 5) in srcs_after
    assert ("VariableDeclaration", 2) in srcs_after
