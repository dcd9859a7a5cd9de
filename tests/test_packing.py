"""Sequence packing + stratified sampling (training-data assembly).

Semantics pinned here:
* concat-then-chunk attribution — a document belongs to the context
  window its FIRST token lands in, even when it straddles the boundary;
* shard independence — packing is per-shard, so the physical plan has no
  single-partition global sort;
* deterministic sampling — identical selection on re-run and across
  partition layouts, per-stratum rates close to the requested fractions,
  unknown strata dropped.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cpg_spark.operators.packing import (pack_concat_chunks, pack_stats,
                                         stratified_sample)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_pack_boundary_attribution(spark):
    # one shard; capacity 10. docs: 6 + 6 tokens -> second doc STARTS at
    # offset 6 inside window 0 even though it spills into window 1
    rows = [(0, "a b c d e f", "en"), (8, "g h i j k l", "en"),
            (16, "m n o", "en")]
    got = {r["doc_id"]: r for r in pack_concat_chunks(
        _docs(spark, rows), capacity=10, n_shards=1).collect()}
    assert got[0]["start_offset"] == 0 and got[0]["pack_id"] == 0
    assert got[8]["start_offset"] == 6 and got[8]["pack_id"] == 0
    assert got[16]["start_offset"] == 12 and got[16]["pack_id"] == 1


def test_pack_shards_are_independent_streams(spark):
    rows = [(i, "w " * (i % 5 + 1) + "x", "en") for i in range(40)]
    packed = pack_concat_chunks(_docs(spark, rows), capacity=16, n_shards=4)
    got = packed.collect()
    assert {r["shard"] for r in got} == {0, 1, 2, 3}
    # within each shard offsets are the exclusive prefix sum in doc order
    for s in range(4):
        in_shard = sorted((r for r in got if r["shard"] == s),
                          key=lambda r: r["doc_id"])
        off = 0
        for r in in_shard:
            assert r["start_offset"] == off
            assert r["pack_id"] == off // 16
            off += r["n_tokens"]


def test_pack_no_global_sort(spark):
    rows = [(i, "a b c", "en") for i in range(100)]
    plan = (pack_concat_chunks(_docs(spark, rows), capacity=8, n_shards=8)
            ._jdf.queryExecution().executedPlan().toString())
    assert "SinglePartition" not in plan


def test_pack_stats_fill(spark):
    rows = [(0, "a b c d e f", "en"), (8, "g h i j k l", "en"),
            (16, "m n o", "en")]
    st = {(r["shard"], r["pack_id"]): r for r in pack_stats(
        pack_concat_chunks(_docs(spark, rows), capacity=10, n_shards=1),
        capacity=10).collect()}
    assert st[(0, 0)]["n_docs"] == 2 and st[(0, 0)]["sum_tokens"] == 12
    assert st[(0, 0)]["fill_permille"] == 1200  # starts-in-window tokens
    assert st[(0, 1)]["n_docs"] == 1 and st[(0, 1)]["sum_tokens"] == 3


def test_stratified_sample_deterministic_and_rated(spark):
    rows = [(i, "t", ["en", "es", "xx"][i % 3]) for i in range(3000)]
    docs = _docs(spark, rows)
    frac = {"en": 0.5, "es": 0.1}
    a = sorted(r["doc_id"] for r in
               stratified_sample(docs, frac).collect())
    b = sorted(r["doc_id"] for r in
               stratified_sample(docs.repartition(7), frac).collect())
    assert a == b  # layout-independent selection
    got = stratified_sample(docs, frac).groupBy("lang").count().collect()
    by = {r["lang"]: r["count"] for r in got}
    assert "xx" not in by  # unknown stratum dropped
    assert abs(by["en"] / 1000 - 0.5) < 0.06
    assert abs(by["es"] / 1000 - 0.1) < 0.04


def test_stratified_sample_no_shuffle(spark):
    rows = [(i, "t", "en") for i in range(100)]
    plan = (stratified_sample(_docs(spark, rows), {"en": 0.5})
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
