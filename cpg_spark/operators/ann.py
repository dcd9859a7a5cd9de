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


def _plane_weight(plane, idx_col, seed: int = 42):
    """Deterministic pseudo-random hyperplane weight for (plane, dim-index),
    computed entirely JVM-side — no RNG state, no driver-side dim probe, no
    dim×planes literal arrays bloating the plan.  xxhash64 over the integer
    triple (not md5 over strings: ~7x cheaper per element — this runs
    dim × planes × tables times per corpus row).  ``plane`` may be a
    Python int or a Column of the same integer type (the hash is
    type-sensitive, so both spellings produce IntegerType inputs)."""
    plane_col = F.lit(plane) if isinstance(plane, int) else plane
    return (
        F.pmod(F.xxhash64(F.lit(seed), plane_col, idx_col),
               F.lit(2**32)).cast("double")
        / F.lit(float(2**32)) - F.lit(0.5)
    )


def _plane_sign(vec_col, plane, seed: int = 42):
    """'1'/'0' sign bit of vec · hyperplane(plane) — the random-hyperplane
    LSH primitive (sign quantized at 1e-6 like every cross-engine float)."""
    s = F.aggregate(
        F.transform(vec_col, lambda x, i: x.cast("double")
                    * _plane_weight(plane, i, seed)),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    return F.when(F.round(s, 6) >= 0, F.lit("1")).otherwise(F.lit("0"))


def _all_plane_signs(vec_col, total_planes: int, seed: int = 42):
    """array<string> of the '1'/'0' sign bits for planes
    0..total_planes-1, as ONE nested higher-order expression — the
    per-plane expression ladder made the plan O(planes) nodes, which at
    derived parameter counts (log2(N) planes x recall-solved bands)
    dominated wall time with analysis/codegen, not compute.  Bit-for-bit
    identical to mapping :func:`_plane_sign` over the range (the plane
    index enters the hash with the same integer type)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(total_planes - 1)),
        lambda p: _plane_sign(vec_col, p, seed),
    )


def lsh_bucket_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    n_planes: int = 8, dim: int | None = None,
                    seed: int = 42, n_tables: int = 2) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH buckets, exact cosine
    within colliding buckets.  Recall < 1 by design; the test suite
    measures it against brute force.

    ``n_tables`` independent hash tables (disjoint plane sets) are the
    standard recall lever at scale: a neighbor missed by one table's
    bucketing is caught by another — per-pair miss probability decays
    exponentially in tables at the cost of ``n_tables``x candidate
    volume.  ``dim`` is unused (kept for API compat) — plane weights are
    md5-derived per element index, so the corpus shuffles once per table
    on bucket id with no driver-side dimension probe."""

    # signs materialize as a column in their own projection so the
    # per-table bucket lambdas reference (not re-evaluate) them — see
    # cosine_near_dup_pairs for the measured rationale
    table_entries = F.explode(F.transform(
        F.sequence(F.lit(0), F.lit(n_tables - 1)),
        lambda t: F.struct(
            t.alias("table_id"),
            F.array_join(F.slice(F.col("_signs"), t * n_planes + 1,
                                 n_planes), "").alias("bucket")),
    ))

    def with_buckets(df, idname, vecname):
        return (
            df.select(
                F.col(id_col).alias(idname), F.col(vec_col).alias(vecname),
                _all_plane_signs(F.col(vec_col), n_tables * n_planes,
                                 seed).alias("_signs"))
            .select(idname, vecname, table_entries.alias("z"))
            .select(idname, vecname, "z.table_id", "z.bucket")
        )

    c = with_buckets(corpus, "neighbor_id", "cv")
    q = with_buckets(queries, "query_id", "qv")
    cands = (
        c.join(F.broadcast(q), ["table_id", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        # a pair colliding in several tables scores once
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    sim = cands.select(
        "query_id", "neighbor_id",
        F.round(cosine_sim_col(F.col("qv"), F.col("cv")), 6).alias("sim_q6"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_q6").desc(), F.col("neighbor_id").asc()
    )
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim_q6")
    )


def _centroid_array_col(centroids: list[list[float]]):
    """Literal array<array<double>> of centroids (tiny: C x dim)."""
    return F.array(*[
        F.array(*[F.lit(float(x)) for x in c]) for c in centroids
    ])


def _nearest_centroids_col(vec_col, centroids: list[list[float]],
                           n: int = 1):
    """Indices of the ``n`` nearest centroids (by cosine) as an array —
    pure expression over the literal centroid array, no join."""
    cents = _centroid_array_col(centroids)
    scored = F.transform(
        cents,
        lambda c, i: F.struct(
            (-cosine_sim_col(vec_col, c)).alias("negsim"),
            i.alias("cid")),
    )
    return F.slice(F.transform(F.array_sort(scored), lambda s: s["cid"]),
                   1, n)


def _centroid_table(spark, centroids: list[list[float]]) -> DataFrame:
    """Centroids as a (cid, _cvec) DataFrame for the broadcast-join
    assignment path (large C)."""
    return spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        schema="cid int, _cvec array<double>",
    )


def _nearest_via_join(df: DataFrame, key_cols: list[str], vec_col: str,
                      centroids: list[list[float]], n: int) -> DataFrame:
    """``n`` nearest centroids per row via a broadcast centroid-table
    join — the C-large assignment path (literal centroid arrays embed
    C x dim doubles into the plan; at C in the thousands analysis and
    codegen dominate, the same plan-bloat failure mode measured and
    fixed for per-band LSH signs in r3).  Returns one row per
    (input row, probe): key_cols + cid.

    Scale shape: the C-fold row expansion happens inside the join task
    and collapses map-side — ``min_by``-style partial aggregation for
    n=1 (no C-fold shuffle), per-key top-n window for small n (query
    side only, small by contract)."""
    cents = _centroid_table(df.sparkSession, centroids)
    scored = df.join(F.broadcast(cents)).select(
        *key_cols, "cid",
        cosine_sim_col(F.col(vec_col), F.col("_cvec")).alias("_sim"))
    if n == 1:
        # max of (sim, -cid): highest sim, lowest cid on ties — same
        # tie-break as the literal-array argmin (array_sort on
        # (-sim, cid)); map-side partial agg keeps the shuffle corpus-
        # linear
        return scored.groupBy(*key_cols).agg(
            F.max_by("cid", F.struct(F.col("_sim"), -F.col("cid")))
            .alias("cid"))
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("_sim").desc(), F.col("cid").asc())
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n)
        .select(*key_cols, "cid")
    )


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_centroids: int = 16, n_probe: int = 4, iters: int = 3,
             seed: int = 42, train_sample: int = 65536,
             centroid_join_threshold: int = 256) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the second scale path the
    task brief names besides LSH bucketing.

    Train: k-means centroids via a short Lloyd loop over a BOUNDED
    deterministic sample — the ``train_sample`` corpus rows with the
    smallest md5(seed|id) (reproducible across runs/resumes, no RNG
    state; the first ``n_centroids`` of the same ordering seed the
    centroids).  The sample is persisted so each Lloyd iteration scans
    only it, never the corpus: at 10^12 docs the full corpus is touched
    exactly twice — once by the sample TakeOrdered (per-partition
    partial top-k, no full shuffle) and once by the final inverted-list
    assignment.  Centroid quality from a 64k sample is statistically
    indistinguishable from full-corpus training for C in the thousands
    (standard IVF practice: FAISS trains on ~max(10k, 256*C) points).
    Assignment has two physical modes on one semantic contract:
    C <= ``centroid_join_threshold`` embeds the centroids as a literal
    array expression (no join — the right call at small C); above the
    threshold it switches to a broadcast centroid-table join with
    map-side ``max_by`` argmin (``_nearest_via_join``), because a
    C x dim literal at C in the thousands puts tens of MB into the plan
    and analysis/codegen dominate.  The update is one per-dimension
    aggregation whose C x dim result is collected to the driver (the
    only driver-side data, by design).

    Search: the corpus partitions into C inverted lists (one shuffle on
    centroid id); each query probes its ``n_probe`` nearest lists and
    scores exact cosine only there.  Expected work per query =
    n_probe/C of the corpus; recall rises with n_probe and reaches
    exact at n_probe = C."""
    use_join = n_centroids > centroid_join_threshold
    samp = (
        corpus.select(
            F.col(vec_col),
            F.md5(F.concat(F.lit(f"{seed}|"),
                           F.col(id_col).cast("string"))).alias("_ord"),
        )
        .orderBy("_ord")
        .limit(max(train_sample, n_centroids))
        .persist()
    )
    centroids = [
        [float(x) for x in r[vec_col]]
        for r in samp.orderBy("_ord").limit(n_centroids).collect()
    ]

    for _ in range(iters):
        if use_join:
            assigned = _nearest_via_join(
                samp.select(F.col(vec_col).alias("v"), "_ord"),
                ["_ord", "v"], "v", centroids, 1)
        else:
            assigned = samp.select(
                F.col(vec_col).alias("v"),
                _nearest_centroids_col(F.col(vec_col), centroids, 1)
                .getItem(0).alias("cid"),
            )
        means = (
            assigned.select("cid", F.posexplode("v").alias("pos", "x"))
            .groupBy("cid", "pos").agg(F.avg("x").alias("m"))
            .collect()
        )
        upd: dict[int, dict[int, float]] = {}
        for r in means:
            upd.setdefault(r["cid"], {})[r["pos"]] = r["m"]
        centroids = [
            [upd[ci][p] for p in range(len(centroids[0]))]
            if ci in upd else centroids[ci]
            for ci in range(len(centroids))
        ]
    samp.unpersist()

    if use_join:
        lists = _nearest_via_join(
            corpus.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("cv")),
            ["neighbor_id", "cv"], "cv", centroids, 1)
        probes = _nearest_via_join(
            queries.select(F.col(id_col).alias("query_id"),
                           F.col(vec_col).alias("qv")),
            ["query_id", "qv"], "qv", centroids, n_probe)
    else:
        lists = corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
            _nearest_centroids_col(F.col(vec_col), centroids, 1)
            .getItem(0).alias("cid"),
        )
        probes = queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
            F.explode(_nearest_centroids_col(F.col(vec_col), centroids,
                                             n_probe)).alias("cid"),
        )
    sim = (
        lists.join(F.broadcast(probes), "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .select("query_id", "neighbor_id",
                F.round(cosine_sim_col(F.col("qv"), F.col("cv")), 6)
                .alias("sim_q6"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_q6").desc(), F.col("neighbor_id").asc()
    )
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim_q6")
    )


def cosine_near_dup_clusters(corpus: DataFrame, threshold_q6: float = 0.95,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             n_bands: int | None = None,
                             band_planes: int | None = None,
                             seed: int = 42,
                             corpus_count: int | None = None) -> DataFrame:
    """(vec, cluster) for EVERY vector — the embedding-side analogue of
    :func:`cpg_spark.operators.dedup.neardup_clusters`: pairwise cosine
    near-dup detection alone cannot dedup a corpus (near-duplication is
    not transitive at the pair level), so the verified pairs feed
    large-star/small-star connected components and ``cluster`` = the min
    vector id of the component; vectors with no near-dup map to
    themselves.  Survivors = ``filter(vec == cluster)`` —
    deterministic, scan-order-free.

    Scale shape: pairs are corpus-linear (banded LSH, derived-parameter
    default), CC runs on the PAIR graph only, and the final left join
    keys on the uniform vector id."""
    from cpg_spark.operators.cc import connected_components

    pairs = cosine_near_dup_pairs(corpus, threshold_q6, id_col, vec_col,
                                  n_bands, band_planes, seed, corpus_count)
    comp = connected_components(pairs, src="a", dst="b")
    vecs = corpus.select(F.col(id_col).alias("vec")).distinct()
    return (
        vecs.join(comp.withColumnRenamed("node", "vec"), "vec", "left")
        .select("vec", F.coalesce("component", "vec").alias("cluster"))
    )


def derive_lsh_band_params(threshold: float, corpus_count: int,
                           target_recall: float = 0.999,
                           max_bands: int = 64) -> tuple[int, int]:
    """(n_bands, band_planes) for :func:`cosine_near_dup_pairs`, derived
    from the similarity threshold and the corpus size — the scale-safe
    default the docstring recall formula implies.

    ``band_planes`` starts at log2(N): random (near-orthogonal) pairs
    collide in a band with p = 0.5^band_planes, so same-bucket groups
    average N/2^band_planes ≈ 1 row and the within-bucket self-join stays
    corpus-LINEAR.  ``n_bands`` then comes from the true-pair recall
    identity  recall = 1-(1-p_band)^n_bands  with
    p_band = (1-acos(t)/pi)^band_planes, solved for ``target_recall``.
    When the threshold is low (true pairs barely more plane-aligned than
    noise) that would demand an unbounded band count, so planes step down
    until n_bands <= max_bands — trading candidate volume back for plan
    size, loudly (see the log line in the caller)."""
    import math

    t = min(max(threshold, -0.999999), 0.999999)
    p_plane = 1.0 - math.acos(t) / math.pi
    planes = max(2, math.ceil(math.log2(max(corpus_count, 2))))
    while planes > 2:
        p_band = p_plane ** planes
        if p_band >= 1.0:
            return 1, planes
        bands = math.ceil(math.log(1.0 - target_recall)
                          / math.log(1.0 - p_band))
        if bands <= max_bands:
            return bands, planes
        planes -= 1
    p_band = p_plane ** planes
    bands = (1 if p_band >= 1.0 else
             min(max_bands,
                 math.ceil(math.log(1.0 - target_recall)
                           / math.log(1.0 - p_band))))
    return bands, planes


def cosine_near_dup_pairs(corpus: DataFrame, threshold_q6: float = 0.95,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          n_bands: int | None = None,
                          band_planes: int | None = None,
                          seed: int = 42,
                          corpus_count: int | None = None,
                          target_recall: float = 0.999) -> DataFrame:
    """(a, b) pairs with cosine >= threshold via banded random-hyperplane
    LSH: each band is ``band_planes`` sign bits; candidate pairs are bucket
    collisions in ANY band (equi-join on (band_id, bucket) — a plain
    shuffle-hash join, NEVER a BroadcastNestedLoopJoin/cartesian); exact
    cosine verifies candidates only.

    Scale shape: the corpus shuffles ``n_bands`` times on a uniform bucket
    key; the quadratic blow-up is confined to same-bucket groups.  Recall
    per true pair at cosine t is 1-(1-(1-acos(t)/pi)^band_planes)^n_bands.

    By default BOTH banding knobs are DERIVED (:func:`derive_lsh_band_
    params`) from the threshold and the corpus count — band_planes ≈
    log2(N) keeps same-bucket groups O(1) rows so candidates stay
    corpus-linear at any scale, and n_bands is solved from the recall
    identity for ``target_recall``.  The expected candidate volume is
    logged at derivation time.  Pass explicit ``n_bands``/``band_planes``
    to pin a reproducible configuration (e.g. the driver-oracle setup);
    pass ``corpus_count`` when known to skip the count scan."""
    if n_bands is None or band_planes is None:
        import logging

        cnt = corpus_count if corpus_count is not None else corpus.count()
        n_bands, band_planes = derive_lsh_band_params(
            threshold_q6, cnt, target_recall)
        exp_cands = n_bands * cnt * max(cnt / float(2 ** band_planes), 1.0) / 2
        logging.getLogger(__name__).info(
            "cosine_near_dup_pairs: derived n_bands=%d band_planes=%d for "
            "threshold=%.3f corpus_count=%d target_recall=%.4f; expected "
            "random-collision candidate volume ~%.3g pairs",
            n_bands, band_planes, threshold_q6, cnt, target_recall,
            exp_cands)
    # ONE explode projection (not a union of per-band branches, which
    # would re-scan the corpus once per band on BOTH join sides).  The
    # sign bits materialize as an array column in their OWN projection
    # and the band extraction references that column: inlining the sign
    # expression into the per-band lambdas would re-evaluate all
    # planes once PER BAND (measured 5x at 40 bands — CollapseProject
    # keeps expensive expressions from being duplicated across the
    # projection boundary, so this two-step shape computes each plane
    # exactly once per row)
    withsigns = corpus.select(
        F.col(id_col).alias("doc"),
        _all_plane_signs(F.col(vec_col), n_bands * band_planes,
                         seed).alias("_signs"),
    )
    entries = F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.struct(
            b.alias("band_id"),
            F.array_join(
                F.slice(F.col("_signs"), b * band_planes + 1, band_planes),
                "").alias("bucket")),
    )
    bands = (
        withsigns.select("doc", F.explode(entries).alias("z"))
        .select("doc", "z.band_id", "z.bucket")
    )
    cands = (
        bands.alias("x")
        .join(bands.alias("y"),
              (F.col("x.band_id") == F.col("y.band_id"))
              & (F.col("x.bucket") == F.col("y.bucket"))
              & (F.col("x.doc") < F.col("y.doc")))
        .select(F.col("x.doc").alias("a"), F.col("y.doc").alias("b"))
        .distinct()
    )
    va = corpus.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    vb = corpus.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    return (
        cands.join(va, "a").join(vb, "b")
        .select("a", "b",
                F.round(cosine_sim_col(F.col("va"), F.col("vb")), 6).alias("sim_q6"))
        .filter(F.col("sim_q6") >= threshold_q6)
    )
