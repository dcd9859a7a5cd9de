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


def _row_minhash(text_col: str, num_hashes: int, k: int):
    """Per-ROW minhash signature columns — bit-identical to the batch
    operator's groupBy aggregation (dedup._minhash_aggs: min over
    shingles of md5(j || '|' || shingle); min over the raw array equals
    min over the distinct set), but expressed as higher-order functions
    so the streaming plan needs NO pre-state aggregation (a streaming
    groupBy before applyInPandasWithState would be a second stateful
    operator)."""
    from cpg_spark.operators.dedup import shingles

    arr = shingles(text_col, k)

    def hash_j(j: int):
        # NOTE: a `lambda s, j=j:` spelling would make F.transform see a
        # TWO-parameter lambda and bind the element INDEX to j
        return lambda s: F.md5(F.concat(F.lit(f"{j}|"), s))

    return [
        F.array_min(F.transform(arr, hash_j(j))).alias(f"mh{j}")
        for j in range(num_hashes)
    ]


def streaming_neardup(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", num_hashes: int = 8,
                      band_size: int = 2, k: int = 3,
                      est_jaccard_pm_threshold: int = 500,
                      bucket_cap: int = 64) -> DataFrame:
    """Cross-micro-batch MinHash-LSH near-dup detection — the streaming
    twin of :func:`cpg_spark.operators.dedup.minhash_dedup`: a near-dup
    arriving in ANY later micro-batch is flagged against the kept doc.

    Shape: each batch computes the SAME md5 minhash signature as the
    batch operator (bit-identical definition) per row, bands it exactly
    like ``lsh_candidate_pairs`` (band_hash = md5 of the band's
    components), and the stateful step keys on (band_id, band_hash) —
    the uniform LSH bucket key, so state shards evenly and no key is
    hot.  State per bucket = up to ``bucket_cap`` (doc_id, signature)
    entries (band buckets are fine-grained by construction, so real
    occupancy is tiny; the cap bounds state growth and is the documented
    accuracy trade at adversarial skew).

    Verdict: the MinHash Jaccard ESTIMATOR — the fraction of agreeing
    signature components against a stored doc — replaces the batch
    operator's exact shingle verification (state cannot hold shingle
    sets at 10^12 docs); accuracy is the standard O(1/sqrt(num_hashes))
    estimator error, tightened by raising ``num_hashes``.

    Emits one row per flagged (doc, band): (doc_id, band_id, dup_of,
    est_jaccard_pm).  A doc is a near-dup iff ANY band flags it (the
    batch LSH any-band rule); survivors emit nothing and join the
    bucket state for future batches."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    n_bands = num_hashes // band_size
    if num_hashes % band_size != 0:
        raise ValueError(
            f"num_hashes={num_hashes} not divisible by band_size="
            f"{band_size} (silent recall loss)")

    sigs = docs.select(F.col(id_col).alias("doc_id"),
                       *_row_minhash(text_col, num_hashes, k))
    entries = []
    for b in range(n_bands):
        cols = [F.col(f"mh{j}")
                for j in range(b * band_size, (b + 1) * band_size)]
        entries.append(F.struct(
            F.lit(b).alias("band_id"),
            F.md5(F.concat_ws("|", *cols)).alias("band_hash")))
    banded = sigs.select(
        "doc_id",
        F.concat_ws(";", *[F.col(f"mh{j}") for j in range(num_hashes)])
        .alias("sig"),
        F.explode(F.array(*entries)).alias("z"),
    ).select("doc_id", "sig", "z.band_id", "z.band_hash")

    thresh = est_jaccard_pm_threshold
    cap = bucket_cap

    def judge(key, pdfs, state):
        import pandas as pd

        if state.exists:
            docs_csv, sigs_csv = state.get
            kept = list(zip(docs_csv.split(","), sigs_csv.split("|")))
        else:
            kept = []
        out = []
        rows = []
        for pdf in pdfs:
            rows.extend(zip(pdf["doc_id"], pdf["sig"], pdf["band_id"]))
        # deterministic intra-batch order: smallest doc id wins the
        # bucket, the batch operator's min-id survivor convention
        rows.sort(key=lambda r: str(r[0]))
        for doc, sig, band_id in rows:
            parts = sig.split(";")
            best = None
            for kdoc, ksig in kept:
                kparts = ksig.split(";")
                agree = sum(a == b for a, b in zip(parts, kparts))
                est_pm = agree * 1000 // len(parts)
                if est_pm >= thresh and (best is None or est_pm > best[1]):
                    best = (kdoc, est_pm)
            if best is not None:
                out.append({"doc_id": str(doc),
                            "band_id": int(band_id),
                            "dup_of": best[0],
                            "est_jaccard_pm": int(best[1])})
            elif len(kept) < cap:
                kept.append((str(doc), sig))
        if kept:
            state.update((",".join(d for d, _ in kept),
                          "|".join(s for _, s in kept)))
        if not out:
            return iter([])
        return iter([pd.DataFrame(out, columns=[
            "doc_id", "band_id", "dup_of", "est_jaccard_pm"])])

    return banded.groupBy("band_id", "band_hash").applyInPandasWithState(
        judge,
        outputStructType=("doc_id string, band_id int, dup_of string, "
                          "est_jaccard_pm int"),
        stateStructType="docs string, sigs string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
