"""Streaming operators for continuous ingestion (SURVEY §2.10 stretch;
task brief: "watermarks + windowed aggs for late data;
applyInPandasWithState for custom stateful operators").

Two operators over the continuously-growing docs feed:

* :func:`windowed_doc_counts` — event-time-windowed arrival metrics with
  a watermark: rows later than the allowed delay are dropped instead of
  reopening closed windows (the standard late-data contract).
* :func:`streaming_dedup` — cross-micro-batch EXACT dedup: the first
  document seen for each text hash is emitted, every later duplicate in
  ANY batch is swallowed.  State = one flag per text hash, held in
  ``applyInPandasWithState`` (Arrow-batched; the grouping key is the
  uniformly-distributed content hash, so state shards evenly across
  executors and no key is hot).  This is the streaming twin of
  ``operators/dedup.dedup_exact`` for pipelines that cannot wait for a
  batch compaction.

Both run under ``trigger(availableNow=True)`` for the batch-incremental
hybrid used across this repo, or continuously on a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_doc_counts(events: DataFrame, ts_col: str = "ts",
                        window_dur: str = "1 minute",
                        watermark: str = "2 minutes") -> DataFrame:
    """(win_start, win_end, n_docs) per event-time window; rows arriving
    later than ``watermark`` past the max seen event time are dropped."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_dur))
        .agg(F.count("*").alias("n_docs"))
        .select(F.col("window.start").alias("win_start"),
                F.col("window.end").alias("win_end"), "n_docs")
    )


def streaming_dedup(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(text_hash, keep_id): first-seen doc per distinct text across ALL
    micro-batches; duplicates (within or across batches) emit nothing."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = docs.select(F.md5(F.col(text_col)).alias("text_hash"),
                        F.col(id_col).alias("doc_id"))

    def first_seen(key, pdfs, state):
        import pandas as pd

        if state.exists:
            for _ in pdfs:  # drain: duplicates of an already-kept text
                pass
            return iter([])
        keep = None
        for pdf in pdfs:
            if keep is None and len(pdf):
                keep = str(pdf["doc_id"].iloc[0])
        state.update((True,))
        if keep is None:
            return iter([])
        return iter([pd.DataFrame({"text_hash": [key[0]],
                                   "keep_id": [keep]})])

    return keyed.groupBy("text_hash").applyInPandasWithState(
        first_seen,
        outputStructType="text_hash string, keep_id string",
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
