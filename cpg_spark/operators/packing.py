"""Training-data assembly operators: sequence packing + stratified sampling.

Two operators every LLM pretraining pipeline runs between "corpus" and
"batches", formulated Spark-first and oracle-checkable:

* ``pack_concat_chunks`` — GPT-style concat-then-chunk packing: documents
  are concatenated in a deterministic order and the token stream is cut
  into fixed-capacity context windows; each document is assigned the
  window its first token lands in.  Scale shape: a GLOBAL ordering would
  serialize into one partition, so the stream is sharded first
  (``shard = doc_id mod n_shards``) and each shard packs independently
  under a per-shard window — exactly how real packers run one stream per
  worker.  Everything is integer arithmetic over a cumulative-sum window,
  so a bit-identical ANSI-SQL oracle exists (SUM ... OVER).

* ``stratified_sample`` — deterministic per-stratum Bernoulli sampling:
  keep a row iff ``md5(key) mod denom < fraction[stratum] * denom``.
  Pure map-side filter (broadcast literal fraction map folded into ONE
  CASE expression): zero shuffle, so sampling a 100 TB corpus is a
  single scan with the filter pushed to the reader.  md5 keeps the
  DuckDB oracle bit-identical; re-runs and resumes select the same rows
  (unlike ``DataFrame.sample``, whose seed is partition-layout
  dependent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cpg_spark.operators.textops import token_count


def pack_concat_chunks(df: DataFrame, capacity: int = 2048,
                       n_shards: int = 8, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(doc_id, shard, n_tokens, start_offset, pack_id) per document.

    ``start_offset`` is the document's first-token position in its
    shard's concatenated stream; ``pack_id`` the capacity-sized window
    that position falls in.  A document straddling a window boundary
    belongs to the window it STARTS in (the concat-then-chunk cut slices
    the token stream, not the document list, so per-doc attribution is
    by start position).

    ``id_col`` must be integral (the deterministic shard key and the
    in-shard order).  The window is partitioned by shard — parallelism
    ``n_shards``, never a single-partition sort.  At corpus scale pick
    ``n_shards`` ≈ executor-core count or higher.
    """
    n_tok = token_count(text_col)
    shard = F.pmod(F.col(id_col).cast("long"), F.lit(n_shards)).cast("int")
    w = (Window.partitionBy("shard").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        df.select(F.col(id_col), shard.alias("shard"),
                  n_tok.alias("n_tokens"))
        .withColumn("start_offset",
                    (F.sum("n_tokens").over(w) - F.col("n_tokens"))
                    .cast("long"))
        .withColumn("pack_id",
                    F.floor(F.col("start_offset") / capacity).cast("long"))
    )


def pack_stats(packed: DataFrame, capacity: int = 2048) -> DataFrame:
    """Per-(shard, pack) fill statistics over ``pack_concat_chunks``
    output: docs per window and tokens STARTING in the window.  The
    integer fill ratio (per-mille) keeps the SQL oracle float-free."""
    return (
        packed.groupBy("shard", "pack_id")
        .agg(F.count("*").cast("long").alias("n_docs"),
             F.sum("n_tokens").cast("long").alias("sum_tokens"))
        .withColumn("fill_permille",
                    F.floor(F.col("sum_tokens") * 1000 / capacity)
                    .cast("long"))
    )


def _hash_bucket(key: Column, denom: int) -> Column:
    """First 8 md5 hex digits of the key as an integer bucket in
    [0, denom) — deterministic, engine-portable (DuckDB:
    ``CAST('0x' || substring(md5(x), 1, 8) AS BIGINT) % denom``)."""
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
    return F.pmod(h.cast("long"), F.lit(denom))


def stratified_sample(df: DataFrame, fractions: dict[str, float],
                      strata_col: str = "lang", key_col: str = "doc_id",
                      denom: int = 10_000) -> DataFrame:
    """Rows whose hash bucket falls under their stratum's fraction;
    strata absent from ``fractions`` are dropped (fraction 0).

    The fraction map is folded into one literal CASE chain — a few dozen
    strata is a dim in the truest sense, so no join at all: the filter is
    a scan-local predicate and the operator adds zero shuffles.
    """
    bucket = _hash_bucket(F.col(key_col), denom)
    thresh = F.lit(-1)
    for stratum, frac in sorted(fractions.items()):
        thresh = F.when(F.col(strata_col) == stratum,
                        F.lit(int(frac * denom))).otherwise(thresh)
    return (
        df.withColumn("_bucket", bucket)
        .filter(F.col("_bucket") < thresh)
        .withColumnRenamed("_bucket", "sample_bucket")
    )
