"""Similarity search over embedding columns (array<float>).

Two tiers:

* brute-force cosine top-k — exact baseline: a broadcast of the (small)
  query set against the corpus, dot products via ``F.zip_with`` +
  ``F.aggregate`` (JVM-side, no Python); rank via window.
* LSH-bucketed ANN — random-hyperplane signs (deterministic planes derived
  from md5 of the dimension index) bucket vectors; candidates = bucket
  collisions, then exact cosine on the candidates only.  This is the scale
  path: the corpus shuffles once on bucket id instead of crossing with
  every query.

Ranking outputs (query_id, neighbor_id, rank) with float comparisons
quantized to 1e-6 so an oracle in another engine agrees on order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_sim_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(query_id, neighbor_id, rank, sim_q6): exact top-k by cosine.
    ``queries`` is broadcast — the small side by contract."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    sim = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(cosine_sim_col(F.col("qv"), F.col("cv")), 6).alias("sim_q6"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_q6").desc(), F.col("neighbor_id").asc()
    )
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim_q6")
    )


def _hyperplane(dim: int, plane: int, seed: int = 42) -> list[float]:
    """Deterministic pseudo-random hyperplane from blake2b — no RNG state."""
    import hashlib
    out = []
    for d in range(dim):
        h = hashlib.blake2b(f"{seed}/{plane}/{d}".encode(), digest_size=8).digest()
        v = int.from_bytes(h, "big") / 2**64 - 0.5
        out.append(v)
    return out


def lsh_bucket_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    n_planes: int = 8, dim: int | None = None,
                    seed: int = 42) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH buckets, exact cosine within
    colliding buckets.  Recall < 1 by design; the test suite measures it
    against brute force."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = [_hyperplane(dim, p, seed) for p in range(n_planes)]

    def bucket_col(vc):
        bits = []
        for p, plane in enumerate(planes):
            arr = F.array(*[F.lit(x) for x in plane])
            s = _dot(vc, arr)
            bits.append(F.when(s >= 0, F.lit("1")).otherwise(F.lit("0")))
        return F.concat(*bits)

    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cv"),
                      bucket_col(F.col(vec_col)).alias("bucket"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"),
                       bucket_col(F.col(vec_col)).alias("bucket"))
    sim = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                F.round(cosine_sim_col(F.col("qv"), F.col("cv")), 6).alias("sim_q6"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_q6").desc(), F.col("neighbor_id").asc()
    )
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim_q6")
    )


def cosine_near_dup_pairs(corpus: DataFrame, threshold_q6: float = 0.95,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """(a, b) pairs with cosine >= threshold. Brute-force within
    LSH buckets would be the scale path; at oracle scale (<=10k vectors)
    the direct self-join is exact and cheap."""
    c = corpus.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    d = corpus.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    return (
        c.join(d, F.col("a") < F.col("b"))
        .select("a", "b",
                F.round(cosine_sim_col(F.col("va"), F.col("vb")), 6).alias("sim_q6"))
        .filter(F.col("sim_q6") >= threshold_q6)
    )
