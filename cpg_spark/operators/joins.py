"""Join strategies for the linking stage: broadcast vs salted shuffle join.

The reference "joins" via in-heap hash maps over merged symbol tables
(``VariableUsageResolver.java:71-73``, ``CallResolver.java:67-69``); at
cluster scale the equivalent is an equi-join whose key (symbol simple name)
is heavily Zipf-skewed — ``print``, ``main``, ``self`` dominate (SURVEY.md
§7.3 "Skew").  Strategy:

* dimension side small (the common case: distinct declarations are tiny
  relative to mentions) → ``F.broadcast`` hash join — no shuffle, skew
  irrelevant;
* dimension side large → salted sort-merge join: the fact side gets a salt
  from a hash of its unique id, the dimension side is exploded ×K
  (``BASELINE north_rule`` demands explicit handling; AQE skew-join stays on
  as backstop — both are reported in stage metrics).

Key columns are passed as (fact_col, dim_col) pairs with distinct names so
no aliasing gymnastics are needed downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# dimension tables below this row count are broadcast.  Measured on this
# box (96k docs, 944k-row symbol dim, warm, best-of-2): broadcast wins at
# 8 threads (71s vs 88s) but LOSES at 32 (42.5s vs 34.4s) — the driver-side
# hash-relation build and per-task broadcast deserialization serialize at
# high parallelism, so pinning broadcast capped 8->32 scaling efficiency at
# 0.42 while the salted shuffle reaches 0.64.  A corpus-proportional symbol
# dimension must therefore shuffle; only genuinely small dims (records,
# enums, imports — thousands of rows) broadcast.  The same logic holds
# harder on a real cluster: a dim that grows with the corpus has no
# business on the driver at 10^12 docs.
BROADCAST_MAX_ROWS = 100_000


def salted_equi_join(
    facts: DataFrame,
    dims: DataFrame,
    key_pairs: list[tuple[str, str]],
    salt_src: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact side salted by ``pmod(xxhash64(salt_src),
    buckets)`` and the dim side exploded × ``buckets`` — spreads each hot
    key over ``buckets`` reducers instead of one."""
    f = facts.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(buckets)).cast("int")
    )
    d = dims.withColumn(
        "_dsalt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    cond = [F.col(fk) == F.col(dk) for fk, dk in key_pairs]
    cond.append(F.col("_salt") == F.col("_dsalt"))
    return f.join(d, cond, how).drop("_salt", "_dsalt")


def skew_report(facts: DataFrame, key: str = "name", top_k: int = 8) -> dict:
    """Per-key count histogram of the join key (SURVEY §7.3: 'verify with
    per-key count histograms in metrics').  Returns
    {key: count} for the hottest keys plus the skew ratio
    max_key_count / mean_key_count — the number that decides whether the
    salted path matters."""
    from pyspark.sql import functions as F

    # ONE aggregation job: per-key counts cached, consumed by both the
    # top-k collect and the max/mean stats (the round-1 version ran the
    # groupBy twice)
    counts = facts.groupBy(key).count().persist()
    try:
        rows = counts.orderBy(F.col("count").desc()).limit(top_k).collect()
        stats = counts.agg(
            F.max("count").alias("mx"), F.avg("count").alias("mean")
        ).first()
    finally:
        counts.unpersist()
    return {
        "hot_keys": {r[key]: r["count"] for r in rows},
        "skew_ratio": round(float(stats["mx"]) / max(float(stats["mean"]), 1e-9), 1)
        if stats["mx"] is not None else None,
    }


def linking_join(
    facts: DataFrame,
    dims: DataFrame,
    key_pairs: list[tuple[str, str]],
    salt_src: str,
    dim_rows: int | None = None,
    buckets: int = 16,
    how: str = "inner",
    force: str | None = None,
) -> tuple[DataFrame, str]:
    """Pick broadcast vs salted join; returns (joined, strategy_used)."""
    strategy = force
    if strategy is None:
        if dim_rows is None:
            dim_rows = dims.count()
        strategy = "broadcast" if dim_rows <= BROADCAST_MAX_ROWS else "salted"
    if strategy == "broadcast":
        cond = [F.col(fk) == F.col(dk) for fk, dk in key_pairs]
        return facts.join(F.broadcast(dims), cond, how), "broadcast"
    return (
        salted_equi_join(facts, dims, key_pairs, salt_src, buckets=buckets, how=how),
        "salted",
    )
