"""Deduplication family for training-data pipelines.

Four tiers, all shuffle-conscious:

* exact           — hash-groupBy on md5(text): one shuffle on a uniform key.
* ngram Jaccard   — shingle explode + shingle-bucket self-join: candidate
                    pairs only materialize where shingles collide, so the
                    join never goes quadratic on the corpus.
* MinHash + LSH   — per-doc signature (min over md5(seed||shingle)), banded;
                    near-dup candidates = band-bucket join; Jaccard verify.
                    md5 keeps the SQL oracle bit-identical.
* SimHash         — 32-bit majority-vote over token hashes (bit tricks via
                    integer arithmetic); near-dups share the simhash value
                    or a band of it.
* embedding cosine— see cpg_spark.operators.ann (shares the vector kernel).

Scale note: every operator here keys its shuffle on content hashes
(uniformly distributed by construction), so no salting is needed — unlike
the name-keyed linking joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cpg_spark.operators.textops import shingles


def dedup_exact(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """One survivor (min id) per distinct text; returns
    (text_hash, keep_id, n_dups)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
    )


def shingle_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  k: int = 3, max_df: int | None = None) -> DataFrame:
    """Candidate (a, b) doc pairs sharing >=1 k-shingle, with exact n-gram
    Jaccard similarity scaled to integer permille (jaccard_pm) so the SQL
    oracle matches bit-for-bit.

    ``max_df`` is the stop-shingle guard (the scale knob): shingles whose
    document frequency exceeds it are dropped from the shingle sets before
    ANY join — without it one ubiquitous shingle ("the quick brown")
    creates a quadratic bucket at corpus scale.  Jaccard then measures
    overlap of the *informative* shingles only (both intersection and set
    sizes use the filtered sets, so the measure stays self-consistent).
    None = exact mode (the oracle-checked formulation)."""
    sh = (
        df.select(F.col(id_col).alias("doc"), F.explode(shingles(text_col, k)).alias("s"))
        .distinct()
    )
    if max_df is not None:
        hot = (
            sh.groupBy("s").agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("s")
        )
        # broadcast anti-join: the hot-shingle dim is tiny by construction
        # (shingles with df > cap are rare by Zipf), the shingle table huge
        sh = sh.join(F.broadcast(hot), "s", "left_anti")
        sh = sh.persist()
    sizes = sh.groupBy("doc").agg(F.count("*").alias("n_sh"))
    pairs = (
        sh.alias("x")
        .join(sh.alias("y"), (F.col("x.s") == F.col("y.s")) & (F.col("x.doc") < F.col("y.doc")))
        .groupBy(F.col("x.doc").alias("a"), F.col("y.doc").alias("b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        pairs.join(sizes.withColumnRenamed("doc", "a").withColumnRenamed("n_sh", "na"), "a")
        .join(sizes.withColumnRenamed("doc", "b").withColumnRenamed("n_sh", "nb"), "b")
        .select("a", "b", "inter", _jaccard_pm_col())
    )


def _minhash_aggs(num_hashes: int) -> list:
    """The shared minhash aggregation: minhash_j = min over shingles of
    md5(j || '|' || shingle) — ONE definition so the standalone signature
    operator, the LSH dedup path and the SQL oracle stay bit-identical."""
    return [
        F.min(F.md5(F.concat(F.lit(f"{j}|"), F.col("s")))).alias(f"mh{j}")
        for j in range(num_hashes)
    ]


def _jaccard_pm_col():
    """floor(inter * 1000 / union) over (inter, na, nb) — floor, not
    trunc-cast: DuckDB's double->int cast rounds, so floor is the only
    formulation both engines agree on.  Shared by shingle_pairs and
    minhash_dedup."""
    return F.floor(
        F.col("inter") * 1000 / (F.col("na") + F.col("nb") - F.col("inter"))
    ).cast("long").alias("jaccard_pm")


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", num_hashes: int = 8,
                       k: int = 3) -> DataFrame:
    """(doc, mh0..mh{n-1}) — string-min over md5 hex digests is a valid
    min-wise permutation family for dedup purposes and is reproducible in
    any engine with md5 (see :func:`_minhash_aggs`)."""
    sh = df.select(
        F.col(id_col).alias("doc"), F.explode(shingles(text_col, k)).alias("s")
    ).distinct()
    return sh.groupBy("doc").agg(*_minhash_aggs(num_hashes))


def lsh_candidate_pairs(signatures: DataFrame, num_hashes: int = 8,
                        band_size: int = 2) -> DataFrame:
    """Band the signature and bucket-join: docs sharing any band are
    candidates.  The shuffle key is (band_id, band_hash) — uniform.

    Banding is ONE explode projection over the signature frame (not a
    union of per-band branches, which would re-execute the signature
    aggregation subtree once per band — the round-1 59 s bench query)."""
    if num_hashes % band_size != 0:
        raise ValueError(
            f"num_hashes={num_hashes} is not divisible by "
            f"band_size={band_size}: the trailing "
            f"{num_hashes % band_size} hash(es) would be silently "
            "excluded from banding, reducing candidate recall")
    n_bands = num_hashes // band_size
    entries = []
    for b in range(n_bands):
        cols = [F.col(f"mh{j}") for j in range(b * band_size, (b + 1) * band_size)]
        entries.append(F.struct(
            F.lit(b).alias("band_id"),
            F.md5(F.concat_ws("|", *cols)).alias("band_hash"),
        ))
    bands = (
        signatures.select("doc", F.explode(F.array(*entries)).alias("z"))
        .select("doc", "z.band_id", "z.band_hash")
    )
    return (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band_id") == F.col("y.band_id"))
            & (F.col("x.band_hash") == F.col("y.band_hash"))
            & (F.col("x.doc") < F.col("y.doc")),
        )
        .select(F.col("x.doc").alias("a"), F.col("y.doc").alias("b"))
        .distinct()
    )


def minhash_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  num_hashes: int = 8, band_size: int = 2, k: int = 3,
                  jaccard_pm_threshold: int = 800) -> DataFrame:
    """Full MinHash-LSH near-dup detection: candidates from banding,
    verified with exact shingle Jaccard; returns (a, b, inter, jaccard_pm).

    The Jaccard verification is restricted to the candidate pairs BEFORE
    the shingle self-join — this is the whole point of LSH: the quadratic
    intersection only materializes where bands collide.

    The shingle table feeds THREE consumers (signatures, sizes, pairwise
    intersection) and the signature frame two (x/y band sides) — both are
    persisted so the explode+distinct shuffle and the 8-way min aggregation
    each run exactly once (at cluster scale these become stage-checkpoint
    tables instead)."""
    sh = (
        df.select(F.col(id_col).alias("doc"),
                  F.explode(shingles(text_col, k)).alias("s"))
        .distinct()
        .persist()
    )
    sigs = sh.groupBy("doc").agg(*_minhash_aggs(num_hashes)).persist()
    cands = lsh_candidate_pairs(sigs, num_hashes, band_size)
    sizes = sh.groupBy("doc").agg(F.count("*").alias("n_sh"))
    inter = (
        sh.withColumnRenamed("doc", "a")
        .join(cands, "a")
        .join(sh.select(F.col("doc").alias("b2"), F.col("s").alias("s2")),
              (F.col("s") == F.col("s2")) & (F.col("b") == F.col("b2")))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    verified = (
        inter
        .join(sizes.select(F.col("doc").alias("a"), F.col("n_sh").alias("na")), "a")
        .join(sizes.select(F.col("doc").alias("b"), F.col("n_sh").alias("nb")), "b")
        .select("a", "b", "inter", _jaccard_pm_col())
    )
    return verified.filter(F.col("jaccard_pm") >= jaccard_pm_threshold)


def neardup_clusters(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", num_hashes: int = 8,
                     band_size: int = 2, k: int = 3,
                     jaccard_pm_threshold: int = 500) -> DataFrame:
    """Corpus-level near-dup clustering — the output a training-data
    pipeline actually consumes: pairwise near-dup detection alone cannot
    dedup a corpus because near-duplication is not transitive at the pair
    level (A~B, B~C with A~C below threshold must still collapse to ONE
    kept doc, else B's removal decision depends on scan order).

    (doc, cluster) for EVERY document: LSH-verified pairs
    (:func:`minhash_dedup`) feed large-star/small-star connected
    components; ``cluster`` = min doc id of the component, and docs with
    no near-dup map to themselves.  The survivor corpus is
    ``filter(doc == cluster)`` — deterministic, scan-order-free.

    Scale shape: pairs are already corpus-linear (banded LSH), the CC
    loop is O(log n) rounds on the PAIR graph only (not the corpus), and
    the final left join keys on doc id — uniform."""
    from cpg_spark.operators.cc import connected_components

    pairs = minhash_dedup(df, text_col, id_col, num_hashes, band_size, k,
                          jaccard_pm_threshold)
    comp = connected_components(pairs, src="a", dst="b")
    docs = df.select(F.col(id_col).alias("doc")).distinct()
    return (
        docs.join(comp.withColumnRenamed("node", "doc"), "doc", "left")
        .select("doc", F.coalesce("component", "doc").alias("cluster"))
    )


def decontaminate(df: DataFrame, benchmark: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  bench_text_col: str = "text", n: int = 8) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    word n-gram with an evaluation set (the standard 13-gram-overlap rule
    of GPT-3 appendix C / PaLM, n configurable; the tiny-vocabulary
    testdata uses n=8).

    Returns one row per input document: (doc_id, n_hits, contaminated)
    where n_hits counts the document's DISTINCT contaminated n-grams.

    Scale shape: the benchmark side is distinct-hashed and BROADCAST —
    eval sets are bounded by construction (thousands of documents) while
    the training corpus is the 10^12-doc side, so the corpus never
    shuffles: the RAW (doc, gram-hash) stream probes the broadcast set
    first and only the (tiny) hit set is distinct-deduped — putting the
    .distinct() before the probe would shuffle every corpus n-gram, the
    exact cost this operator exists to avoid.  n_hits counts DISTINCT
    contaminated n-grams either way (dedup after an equi-probe commutes
    with it); hits aggregate per doc with map-side combine and join back
    to the corpus on the uniform doc id."""
    bgrams = (
        benchmark.select(
            F.explode(shingles(bench_text_col, n)).alias("g")
        )
        .select(F.md5("g").alias("gh"))
        .distinct()
    )
    dgrams = df.select(
        F.col(id_col).alias("doc"),
        F.explode(shingles(text_col, n)).alias("g"),
    ).select("doc", F.md5("g").alias("gh"))
    hits = (
        dgrams.join(F.broadcast(bgrams), "gh")
        .distinct()
        .groupBy("doc").agg(F.count("*").alias("n_hits"))
    )
    return (
        df.select(F.col(id_col).alias("doc"))
        .join(hits, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.when(F.coalesce("n_hits", F.lit(0)) > 0, 1).otherwise(0)
            .cast("int").alias("contaminated"),
        )
    )


def segment_dedup(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", seg_tokens: int = 10) -> DataFrame:
    """Sub-document exact dedup (the CCNet paragraph-dedup shape): split
    each document into fixed-width token segments, keep only the FIRST
    corpus-wide occurrence of each distinct segment (first = smallest
    (doc_id, seg_no), scan-order-free), and reassemble the surviving text.

    Real corpora segment on paragraph boundaries; the flat testdata has no
    newlines, so the segmenter is a fixed token window — the operator's
    joins and winner rule are identical either way.

    Returns (doc_id, n_segs, n_kept, kept_text).

    Scale shape: ONE shuffle keyed on the segment content hash (uniform by
    construction) picks winners via min(struct) — map-side combinable, no
    window over a skewed key; the keep-filter is a self-join back on the
    same hash key, and reassembly shuffles on doc id.

    Null text is treated as '' (one empty segment), matching the oracle's
    COALESCE — without it n_segs null-propagates while the coalesced
    n_kept/kept_text columns don't, breaking downstream arithmetic."""
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    n_segs = F.ceil(F.size(toks) / F.lit(seg_tokens)).cast("int")
    segs = (
        df.select(F.col(id_col).alias("doc"), toks.alias("tk"),
                  n_segs.alias("n_segs"))
        .select(
            "doc", "n_segs",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.col("n_segs") - 1),
                    lambda i: F.concat_ws(
                        " ", F.slice(F.col("tk"),
                                     (i * seg_tokens + 1).cast("int"),
                                     seg_tokens)),
                )
            ).alias("seg_no", "seg"),
        )
        .select("doc", "n_segs", "seg_no", "seg", F.md5("seg").alias("h"))
    )
    winners = segs.groupBy("h").agg(
        F.min(F.struct("doc", "seg_no")).alias("w")
    ).select("h", F.col("w.doc").alias("wdoc"), F.col("w.seg_no").alias("wseg"))
    kept = segs.join(winners, "h").filter(
        (F.col("doc") == F.col("wdoc")) & (F.col("seg_no") == F.col("wseg"))
    )
    rebuilt = kept.groupBy("doc").agg(
        F.count("*").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("seg_no", "seg"))),
                lambda x: x["seg"],
            ),
        ).alias("kept_text"),
    )
    return (
        df.select(F.col(id_col).alias("doc"), n_segs.alias("n_segs"))
        .join(rebuilt, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.col("n_segs").cast("long").alias("n_segs"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("kept_text", F.lit("")).alias("kept_text"),
        )
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 32) -> DataFrame:
    """Per-doc SimHash over tokens: bit i of the hash is the majority vote
    of bit i across md5-derived token hashes.  Integer-only formulation:
    token_hash = first 8 hex chars of md5(token) as a 32-bit int."""
    tok = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.col(text_col), " ")).alias("t"),
    )
    h = F.conv(F.substring(F.md5(F.col("t")), 1, 8), 16, 10).cast("long")
    tok = tok.select("doc", h.alias("h"))
    bit_cols = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    votes = tok.groupBy("doc").agg(*bit_cols)
    sim = None
    for i in range(bits):
        term = F.when(F.col(f"b{i}") > 0, F.lit(2 ** i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sim = term if sim is None else (sim + term)
    return votes.select("doc", sim.alias("simhash"))
