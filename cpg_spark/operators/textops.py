"""Text-analysis operators for large-scale training-data pipelines.

All pure Catalyst column expressions (JVM-side, whole-stage codegen) — no
Python UDFs.  Each function is deliberately formulated so an identical
ANSI-SQL expression exists (DuckDB oracle in ``__spark_entry__.oracle_sql``):
integer arithmetic only, ``md5`` for hashing (bit-identical across engines),
no float aggregation.

Operates on a plain text column; used on the driver's ``documents`` table
and on code spans of the CPG docs table alike.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny embedded marker lists for the language-ID heuristic: deterministic
# and replicable in SQL (real pipelines would use fasttext et al. behind the
# same column contract)
LANG_MARKERS = {
    "en": ["the", "a", "of", "and"],
    "es": ["el", "la", "de", "que"],
    "de": ["der", "die", "das", "und"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in"]


def tokens(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col)).cast("int")


def distinct_token_count(col: str | Column) -> Column:
    return F.size(F.array_distinct(tokens(col))).cast("int")


def stopword_count(col: str | Column) -> Column:
    toks = tokens(col)
    return F.size(
        F.filter(toks, lambda t: t.isin(STOPWORDS))
    ).cast("int")


# GPT-2-style pretokenizer subset (contractions, letter runs, digit runs,
# punctuation runs, each optionally space-prefixed) — expressible in BOTH
# Java regex (Spark) and RE2 (DuckDB) so the oracle is bit-identical; a
# real BPE merges within these pretokens, so this count upper-bounds and
# tracks BPE token counts for data-budget estimation
BPE_PRETOKEN_RE = (
    "'s|'t|'re|'ve|'m|'ll|'d"
    "| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"
)


def bpe_token_count(col: str | Column) -> Column:
    """Count of BPE-style pretokens (JVM-side regexp_count)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_PRETOKEN_RE)).cast("int")


def token_counts(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, ws_tokens, bpe_tokens) — whitespace and BPE-ish token
    counts per document, both pure Catalyst expressions."""
    return df.select(
        F.col(id_col),
        token_count(text_col).alias("ws_tokens"),
        bpe_token_count(text_col).alias("bpe_tokens"),
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / distinct-ratio / stopword-ratio quality scoring — the
    integer formulation keeps Spark and the SQL oracle bit-identical.
    quality_score = 1000 * distinct_tokens / tokens (floor)."""
    n_tok = token_count(text_col)
    return df.select(
        "doc_id",
        F.length(text_col).cast("int").alias("n_chars"),
        n_tok.alias("n_tokens"),
        distinct_token_count(text_col).alias("n_distinct"),
        stopword_count(text_col).alias("n_stopwords"),
        F.floor(
            distinct_token_count(text_col).cast("long") * 1000
            / F.greatest(n_tok, F.lit(1))
        ).cast("long").alias("quality_score"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram(word)-marker language ID: argmax of per-language marker hits,
    ties broken by language code order, no hits -> 'und'."""
    toks = tokens(text_col)
    scores = [
        F.size(F.filter(toks, lambda t: t.isin(ms))).alias(f"score_{lang}")
        for lang, ms in sorted(LANG_MARKERS.items())
    ]
    scored = df.select("doc_id", *scores)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for lg in langs:
        pred = pred.when(F.col(f"score_{lg}") == best, F.lit(lg))
    return scored.select(
        "doc_id", *[F.col(f"score_{lg}") for lg in langs],
        pred.alias("lang_pred"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Rolling polynomial token-hash document fingerprint:
    acc' = (acc*31 + len(token)) mod 2147483647 — exact integer arithmetic,
    same formula as the SQL oracle's list_reduce."""
    fp = F.aggregate(
        tokens(text_col),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + F.length(x).cast("long")) % 2147483647,
    )
    return df.select("doc_id", fp.alias("fingerprint"))


def repetition_features(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition metrics per document (Rae et al. 2021 §A1.1:
    repetitious documents are low-quality training data):

    * ``dup_token_pm``     — permille of tokens that are repeats of an
      earlier token (1000 * (n - n_distinct) / n).
    * ``top2_gram``/``top2_count`` — the most frequent word 2-gram
      (ties broken by gram text, deterministic).
    * ``top2_char_pm``     — permille of document characters covered by
      occurrences of that top 2-gram — the "fraction of characters in the
      most common n-gram" filter.

    Relational formulation (explode -> count -> max(struct)) instead of a
    per-row O(len^2) array scan: the shuffle keys on (doc, gram) — uniform,
    corpus-linear — and the per-doc reduce is a map-side-combinable agg,
    so the operator survives documents of any length."""
    toks = tokens(text_col)
    base = df.select(
        F.col(id_col).alias("doc"),
        F.length(text_col).cast("long").alias("n_chars"),
        token_count(text_col).cast("long").alias("n_tokens"),
        distinct_token_count(text_col).cast("long").alias("n_distinct"),
        shingles(text_col, 2).alias("g2"),
    )
    grams = base.select("doc", F.explode("g2").alias("gram"))
    counts = grams.groupBy("doc", "gram").agg(F.count("*").alias("cnt"))
    # max(struct) = highest count, ties -> lexicographically greatest gram:
    # deterministic winner with map-side partial aggregation (no window)
    top = counts.groupBy("doc").agg(
        F.max(F.struct(F.col("cnt"), F.col("gram"))).alias("t")
    ).select("doc", F.col("t.gram").alias("top2_gram"),
             F.col("t.cnt").alias("top2_count"))
    return (
        base.select("doc", "n_chars", "n_tokens", "n_distinct")
        .join(top, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            "n_tokens",
            F.floor(
                (F.col("n_tokens") - F.col("n_distinct")) * 1000
                / F.greatest(F.col("n_tokens"), F.lit(1))
            ).cast("long").alias("dup_token_pm"),
            F.coalesce("top2_gram", F.lit("")).alias("top2_gram"),
            F.coalesce("top2_count", F.lit(0)).cast("long").alias("top2_count"),
            F.floor(
                F.coalesce("top2_count", F.lit(0))
                * F.length(F.coalesce("top2_gram", F.lit(""))) * 1000
                / F.greatest(F.col("n_chars"), F.lit(1))
            ).cast("long").alias("top2_char_pm"),
        )
    )


def top_tokens(df: DataFrame, text_col: str = "text", k: int = 20) -> DataFrame:
    """Corpus-level vocabulary heavy hitters: (token, n) for the k most
    frequent tokens, ties broken by token text (deterministic).

    Scale shape: explode -> groupBy(token) is ONE shuffle on a uniform-ish
    key with map-side partial counts; the final top-k is a TakeOrdered over
    the (small) distinct-token table, not a global sort of the corpus."""
    tok = df.select(F.explode(tokens(text_col)).alias("token"))
    return (
        tok.groupBy("token").agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(k)
    )


def shingles(col: str | Column, k: int = 3) -> Column:
    """k-token shingles (ordered n-grams) as an array of strings; used by
    the MinHash / Jaccard dedup family."""
    toks = tokens(col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(-1)))
    return F.when(
        F.size(toks) >= k,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(k)]
            ),
        ),
    ).otherwise(F.array())


# PII patterns expressible identically in Java regex (Spark) and RE2
# (DuckDB) so the scrub oracle is bit-identical: no backrefs, no
# lookaround.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+\d[\d-]{7,14}\d"


def pii_scrub(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """PII redaction — the standard pre-training scrub pass (emails,
    IPv4 addresses, international-format phone numbers) as pure Catalyst
    ``regexp_replace`` chains with per-category match counts:
    (doc_id, n_emails, n_ips, n_phones, clean_text).

    Replacement tokens are the C4/Dolma-style typed placeholders
    (``<EMAIL>`` etc.) so downstream tokenization sees a stable symbol
    instead of a hole.  Order matters: emails are redacted FIRST (an
    email's domain would otherwise feed the IP/phone patterns a partial
    match surface), then IPs, then phones.

    Scale shape: a zero-shuffle scan-side projection — regex evaluation
    is whole-stage-codegen JVM work, the canonical map-only curation
    kernel.  Patterns avoid backreferences/lookaround so the identical
    expression runs on RE2 engines (the DuckDB oracle)."""
    c = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL_RE), 0))
    after_email = F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>")
    n_ips = F.size(F.regexp_extract_all(after_email, F.lit(PII_IPV4_RE), 0))
    after_ip = F.regexp_replace(after_email, PII_IPV4_RE, "<IP>")
    n_phones = F.size(F.regexp_extract_all(after_ip, F.lit(PII_PHONE_RE), 0))
    clean = F.regexp_replace(after_ip, PII_PHONE_RE, "<PHONE>")
    return df.select(
        F.col(id_col),
        n_emails.cast("int").alias("n_emails"),
        n_ips.cast("int").alias("n_ips"),
        n_phones.cast("int").alias("n_phones"),
        clean.alias("clean_text"),
    )
