"""ANN similarity search: LSH recall vs the exact brute-force baseline,
multi-table recall gain, and near-dup candidate completeness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cpg_spark.operators import ann

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def _recall(approx, exact):
    hits = sum(len(approx.get(q, set()) & s) for q, s in exact.items())
    total = sum(len(s) for s in exact.values())
    return hits / max(total, 1)


def test_lsh_recall_reasonable_and_multitable_helps(emb):
    """On RANDOM embeddings the true top-k sit near cosine 0.4 (angle
    ~66°), so per-plane agreement is only ~0.63 — recall demands coarse
    buckets: with 2 planes/table P(table hit) ≈ 0.4 and 4 tables give
    ≈ 1-(0.6)^4 ≈ 0.87 expected recall.  Production near-dup thresholds
    (cosine ≥ 0.9) support many more planes; the parameters trade
    candidate volume for recall and the tables axis buys recall
    exponentially."""
    queries = emb.filter(F.col("vec_id") < 16)
    exact = _topk_sets(ann.brute_force_topk(emb, queries, k=5))
    one = _topk_sets(ann.lsh_bucket_topk(emb, queries, k=5, n_planes=2,
                                         n_tables=1))
    multi = _topk_sets(ann.lsh_bucket_topk(emb, queries, k=5, n_planes=2,
                                           n_tables=4))
    r1, r4 = _recall(one, exact), _recall(multi, exact)
    assert r4 >= r1  # more tables never hurt recall
    assert r4 >= 0.6  # ~0.87 expected; generous floor for sampling noise


def test_neardup_lsh_matches_bruteforce(emb):
    """The banded near-dup must find exactly the brute-force pair set at
    the bench threshold (recall certified by construction of the bands)."""
    sub = emb.filter(F.col("vec_id") < 200)
    lsh = {(r["a"], r["b"]) for r in
           ann.cosine_near_dup_pairs(sub, threshold_q6=0.40).collect()}
    c = sub.select(F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
    d = sub.select(F.col("vec_id").alias("b"), F.col("embedding").alias("vb"))
    brute = {
        (r["a"], r["b"]) for r in
        c.join(d, F.col("a") < F.col("b"))
        .select("a", "b", F.round(ann.cosine_sim_col(
            F.col("va"), F.col("vb")), 6).alias("s"))
        .filter(F.col("s") >= 0.40).collect()
    }
    assert lsh == brute


def test_no_nested_loop_join_in_neardup_plan(emb):
    plan = ann.cosine_near_dup_pairs(
        emb.filter(F.col("vec_id") < 100), threshold_q6=0.4
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ivf_topk_recall_and_exhaustive_exactness(emb):
    """IVF: probing more lists raises recall; probing ALL lists equals
    the exact brute-force result."""
    queries = emb.filter(F.col("vec_id") < 16)
    exact = _topk_sets(ann.brute_force_topk(emb, queries, k=5))
    few = _topk_sets(ann.ivf_topk(emb, queries, k=5, n_centroids=8,
                                  n_probe=2))
    allp = _topk_sets(ann.ivf_topk(emb, queries, k=5, n_centroids=8,
                                   n_probe=8))
    assert _recall(allp, exact) == 1.0  # exhaustive probing == exact
    assert _recall(few, exact) <= 1.0
    assert _recall(few, exact) >= 0.3  # 2/8 lists probed


def test_ivf_centroid_join_mode_matches_literal_mode(emb):
    """Above ``centroid_join_threshold`` IVF assignment switches from a
    literal C x dim centroid-array expression to a broadcast
    centroid-table join (plan bloat at production C: thousands of
    centroids x 1k+ dims embed tens of MB of literals).  Both modes are
    one semantic contract: identical rows at the same parameters, and
    the large-C plan must contain NO literal centroid array."""
    queries = emb.filter(F.col("vec_id") < 8)

    def rows(df):
        return {(r["query_id"], r["neighbor_id"], r["rank"])
                for r in df.collect()}

    lit_mode = ann.ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=3,
                            centroid_join_threshold=256)
    join_mode = ann.ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=3,
                             centroid_join_threshold=0)
    assert rows(lit_mode) == rows(join_mode)

    lit_plan = lit_mode._jdf.queryExecution().analyzed().toString()
    join_plan = join_mode._jdf.queryExecution().analyzed().toString()
    assert "array(array(" in lit_plan  # small-C keeps the literal form
    assert "array(array(" not in join_plan  # large-C mode: no literals
    # exhaustive probing stays exact through the join path too
    exact = _topk_sets(ann.brute_force_topk(emb, queries, k=5))
    allp = _topk_sets(ann.ivf_topk(emb, queries, k=5, n_centroids=8,
                                   n_probe=8, centroid_join_threshold=0))
    assert _recall(allp, exact) == 1.0


def test_cosine_neardup_clusters(emb):
    """Every vector gets a cluster; members of a verified pair share one;
    the cluster id is the component's min vector id; isolated vectors
    map to themselves (scan-order-free survivor rule)."""
    sub = emb.filter(F.col("vec_id") < 200)
    pairs = {(r["a"], r["b"]) for r in ann.cosine_near_dup_pairs(
        sub, threshold_q6=0.40, n_bands=16, band_planes=2).collect()}
    clusters = {r["vec"]: r["cluster"] for r in
                ann.cosine_near_dup_clusters(
                    sub, threshold_q6=0.40, n_bands=16,
                    band_planes=2).collect()}
    assert len(clusters) == 200
    paired = {v for p in pairs for v in p}
    for a, b in pairs:
        assert clusters[a] == clusters[b]
        assert clusters[a] <= min(a, b)
    for v, c in clusters.items():
        if v not in paired:
            assert c == v
