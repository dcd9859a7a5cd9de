"""Dedup-family operator semantics beyond the oracle-parity checks:
the stop-shingle document-frequency cap (the 100 TB guard against
quadratic hot-shingle buckets) and LSH candidate containment."""

from __future__ import annotations

from pyspark.sql import functions as F

from cpg_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_stop_shingle_cap_drops_ubiquitous_shingle(spark):
    # every doc shares the ubiquitous prefix; only 1<->2 share a rare tail
    rows = [
        ("1", "the quick brown alpha beta gamma delta"),
        ("2", "the quick brown alpha beta gamma epsilon"),
        ("3", "the quick brown zeta eta theta iota"),
        ("4", "the quick brown kappa lam mu nu"),
    ]
    uncapped = {(r["a"], r["b"])
                for r in dedup.shingle_pairs(_docs(spark, rows), k=3).collect()}
    # all pairs collide on 'the quick brown' without the cap
    assert ("1", "3") in uncapped and ("2", "4") in uncapped
    capped = dedup.shingle_pairs(_docs(spark, rows), k=3, max_df=2).collect()
    got = {(r["a"], r["b"]) for r in capped}
    # the hot shingle (df=4 > 2) no longer creates candidates; the genuine
    # near-dup pair still collides on its rare shared shingles
    assert ("1", "2") in got
    assert ("1", "3") not in got and ("2", "4") not in got
    # Jaccard is computed over the filtered sets (self-consistent)
    row = next(r for r in capped if (r["a"], r["b"]) == ("1", "2"))
    assert row["jaccard_pm"] > 0


def test_neardup_clusters_close_transitively(spark):
    """A~B and B~C must land in ONE cluster even when A~C alone would
    miss the pair threshold; pairless docs cluster as themselves; the
    survivor set (doc == cluster) keeps exactly one doc per cluster."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base + " one"),
        (2, base + " one two"),          # near-dup of 1 and of 3
        (3, base + " one two three"),    # near-dup of 2
        (9, "completely different words nothing shared here at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc"]: r["cluster"]
           for r in dedup.neardup_clusters(
               docs, num_hashes=8, band_size=2, k=3,
               jaccard_pm_threshold=500).collect()}
    assert out[1] == out[2] == out[3] == 1
    assert out[9] == 9
    survivors = sorted(d for d, c in out.items() if d == c)
    assert survivors == [1, 9]


def test_minhash_candidates_contain_true_near_dups(spark):
    rows = [
        ("1", "alpha beta gamma delta epsilon zeta eta theta"),
        ("2", "alpha beta gamma delta epsilon zeta eta iota"),
        ("3", "completely different words nothing shared here at all"),
    ]
    out = dedup.minhash_dedup(_docs(spark, rows), num_hashes=8, band_size=2,
                              k=3, jaccard_pm_threshold=300).collect()
    pairs = {(r["a"], r["b"]) for r in out}
    assert ("1", "2") in pairs
    assert all("3" not in p for p in pairs)
