"""Streaming watermark + stateful operators (SURVEY §2.10; task brief's
Structured Streaming requirements): windowed arrival counts with
late-data dropping, and cross-micro-batch stateful exact dedup."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from cpg_spark.streaming.stream_ops import streaming_dedup, windowed_doc_counts


def _write_batch(spark, path, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append").parquet(path)
    time.sleep(1.1)  # distinct mtimes -> deterministic batch order


def test_streaming_dedup_across_batches(spark, tmp_path):
    src = str(tmp_path / "docs")
    schema = "doc_id string, text string"
    # batch 1: A, B distinct; batch 2: C duplicates A's text, D is new
    _write_batch(spark, src, [("A", "alpha text"), ("B", "beta text")], schema)
    _write_batch(spark, src, [("C", "alpha text"), ("D", "delta text")],
                 schema)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_dedup(stream)
        .writeStream.format("memory").queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from dedup_out").collect()
    kept = {r["keep_id"] for r in rows}
    assert kept == {"A", "B", "D"}  # C swallowed by cross-batch state
    assert len(rows) == 3


def test_windowed_counts_drop_late_rows(spark, tmp_path):
    src = str(tmp_path / "events")
    schema = "doc_id string, ts timestamp"
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)

    def at(minute, second=0):
        return t0 + dt.timedelta(minutes=minute, seconds=second)

    out = str(tmp_path / "win_out")

    def drain():
        # one availableNow run; the watermark persists in the checkpoint,
        # so the second run sees the first run's high-water mark — the
        # deterministic late-data setup (file-source batch ORDER within
        # one run is not guaranteed).  Append mode + file sink: only
        # FINALIZED windows (end < watermark) are ever written.
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            windowed_doc_counts(stream, window_dur="1 minute",
                                watermark="2 minutes")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # run 1 advances the watermark to 10:20 - 2min = 10:18
    _write_batch(spark, src,
                 [("a", at(9, 30)), ("b", at(10, 5)), ("c", at(9, 40)),
                  ("d", at(9, 50)), ("e", at(20, 0))],
                 schema)
    drain()
    # run 2: ONLY a late row — its window [10:00, 10:01) closed at
    # 10:01 < watermark 10:18, so it must be dropped
    _write_batch(spark, src, [("late", at(0, 10))], schema)
    drain()
    rows = spark.read.parquet(out).collect()
    by_win = {r["win_start"].minute: r["n_docs"] for r in rows}
    # finalized windows only: 9 and 10 closed under watermark 10:18;
    # the 10:20 driver row's window never finalizes; the late 10:00:10
    # row was dropped, so window 0 must not exist
    assert by_win.get(9) == 3      # 9:30, 9:40, 9:50
    assert by_win.get(10) == 1     # 10:05
    assert 0 not in by_win
    assert 20 not in by_win


def test_streaming_neardup_cross_batch(spark, tmp_path):
    """A near-duplicate arriving in a LATER micro-batch is flagged
    against the kept doc (cross-batch MinHash-LSH state); distinct docs
    are not flagged; the signature definition is bit-identical to the
    batch operator's."""
    from cpg_spark.streaming.stream_ops import streaming_neardup

    src = str(tmp_path / "nd_docs")
    schema = "doc_id string, text string"
    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep dark forest tonight")
    near = base + " again"   # high-overlap shingle set
    other = ("completely different words about spark structured "
             "streaming state stores and arrow batches everywhere")
    _write_batch(spark, src, [("A", base), ("X", other)], schema)
    _write_batch(spark, src, [("B", near), ("C", "unrelated short text "
                                                 "with nothing shared")],
                 schema)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_neardup(stream, num_hashes=8, band_size=2, k=3,
                          est_jaccard_pm_threshold=500)
        .writeStream.format("memory").queryName("nd_out")
        .option("checkpointLocation", str(tmp_path / "nd_ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from nd_out").collect()
    flagged = {r["doc_id"] for r in rows}
    assert "B" in flagged, rows           # later-batch near-dup dropped
    assert flagged == {"B"}               # X, C, A survive
    assert all(r["dup_of"] == "A" for r in rows if r["doc_id"] == "B")
    assert all(r["est_jaccard_pm"] >= 500 for r in rows)


def test_streaming_neardup_signature_matches_batch(spark):
    """The per-row higher-order-function signature equals the batch
    groupBy aggregation for the same text (bit-identical minhash)."""
    from cpg_spark.operators.dedup import minhash_signatures
    from cpg_spark.streaming.stream_ops import _row_minhash

    df = spark.createDataFrame(
        [("d1", "one two three four five six seven")],
        "doc_id string, text string")
    stream_sig = df.select(*_row_minhash("text", 8, 3)).collect()[0]
    batch_sig = minhash_signatures(df, num_hashes=8, k=3).collect()[0]
    for j in range(8):
        assert stream_sig[f"mh{j}"] == batch_sig[f"mh{j}"]
