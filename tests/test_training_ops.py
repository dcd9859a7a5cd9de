"""Training-data curation operators added beyond the dedup family:
Gopher-style repetition metrics, corpus vocabulary heavy hitters,
benchmark decontamination (n-gram overlap), and sub-document segment
dedup (the CCNet paragraph-dedup shape).  Hand-computed expectations;
the bit-level engine parity runs in the oracle suite
(tests/test_oracle_parity.py over the registered queries)."""

from __future__ import annotations

from cpg_spark.operators import dedup, textops


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_features_hand_computed(spark):
    rows = [
        (1, "a a b"),          # 3 tokens, 2 distinct
        (2, "x y x y x"),      # top 2-gram count 2
        (3, "solo"),           # single token: no 2-grams at all
    ]
    out = {r["doc_id"]: r
           for r in textops.repetition_features(_docs(spark, rows)).collect()}
    r1 = out[1]
    assert r1["n_tokens"] == 3
    assert r1["dup_token_pm"] == 333          # floor(1*1000/3)
    # both 2-grams have count 1; max(struct) tie-breaks to the greatest
    assert r1["top2_gram"] == "a b" and r1["top2_count"] == 1
    assert r1["top2_char_pm"] == 600          # floor(1*3*1000/5)
    r2 = out[2]
    assert r2["dup_token_pm"] == 600          # 5 tokens, 2 distinct
    assert r2["top2_count"] == 2 and r2["top2_gram"] == "y x"
    assert r2["top2_char_pm"] == 666          # floor(2*3*1000/9)
    r3 = out[3]
    assert r3["top2_gram"] == "" and r3["top2_count"] == 0
    assert r3["top2_char_pm"] == 0 and r3["dup_token_pm"] == 0


def test_top_tokens_counts_and_tie_order(spark):
    rows = [(1, "b a b c"), (2, "a b c c")]
    got = textops.top_tokens(_docs(spark, rows), k=3).collect()
    # b:3, c:3, a:2 — count desc, token asc on ties
    assert [(r["token"], r["n"]) for r in got] == [("b", 3), ("c", 3), ("a", 2)]


def test_decontaminate_flags_only_overlapping_docs(spark):
    shared = "one two three four five six seven eight"  # one 8-gram
    docs = _docs(spark, [
        (1, shared + " tail tokens here"),
        (2, "totally different words with no benchmark overlap at all yes"),
        (3, "short doc"),  # shorter than n: can never be flagged
    ])
    bench = spark.createDataFrame([(shared + " other continuation",)],
                                  "text string")
    out = {r["doc_id"]: r for r in dedup.decontaminate(docs, bench, n=8).collect()}
    assert out[1]["contaminated"] == 1 and out[1]["n_hits"] == 1
    assert out[2]["contaminated"] == 0 and out[2]["n_hits"] == 0
    assert out[3]["contaminated"] == 0


def test_segment_dedup_keeps_first_occurrence_and_reassembles(spark):
    seg = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"
    docs = _docs(spark, [
        (1, seg + " u1 u2 u3"),            # segs: [seg, 'u1 u2 u3']
        (2, seg + " v1 v2 v3"),            # first segment duplicates doc 1's
        (3, "w1 w2"),                      # unique short doc
    ])
    out = {r["doc_id"]: r
           for r in dedup.segment_dedup(docs, seg_tokens=10).collect()}
    assert out[1]["n_segs"] == 2 and out[1]["n_kept"] == 2
    assert out[1]["kept_text"] == seg + " u1 u2 u3"
    # doc 2 loses the shared first segment (doc 1 is the corpus-first
    # occurrence) but keeps its unique tail
    assert out[2]["n_segs"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["kept_text"] == "v1 v2 v3"
    assert out[3]["n_kept"] == 1 and out[3]["kept_text"] == "w1 w2"


def test_segment_dedup_within_doc_repeats_collapse(spark):
    seg = "r1 r2 r3 r4 r5 r6 r7 r8 r9 r10"
    docs = _docs(spark, [(7, seg + " " + seg)])  # same segment twice
    row = dedup.segment_dedup(docs, seg_tokens=10).collect()[0]
    assert row["n_segs"] == 2 and row["n_kept"] == 1
    assert row["kept_text"] == seg


def test_pii_scrub(spark):
    """Email/IPv4/phone redaction with typed placeholders and counts;
    email-first ordering keeps the domain from part-matching the IP
    pattern; PII-free text passes through untouched."""
    import pandas as pd

    from cpg_spark.operators.textops import pii_scrub

    df = spark.createDataFrame(pd.DataFrame([
        {"doc_id": "a",
         "text": "mail bob.smith+x@corp.example.org now"},
        {"doc_id": "b", "text": "host 192.168.1.254 and 10.0.0.1 up"},
        {"doc_id": "c", "text": "call +1-415-555-0199 today"},
        {"doc_id": "d", "text": "clean document no pii at all"},
        {"doc_id": "e",
         "text": "x@y.io at 8.8.8.8 tel +4915112345678"},
    ]))
    out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert out["a"]["n_emails"] == 1
    assert out["a"]["clean_text"] == "mail <EMAIL> now"
    assert out["b"]["n_ips"] == 2
    assert out["b"]["clean_text"] == "host <IP> and <IP> up"
    assert out["c"]["n_phones"] == 1
    assert out["c"]["clean_text"] == "call <PHONE> today"
    assert out["d"]["clean_text"] == "clean document no pii at all"
    assert (out["d"]["n_emails"], out["d"]["n_ips"],
            out["d"]["n_phones"]) == (0, 0, 0)
    assert out["e"]["clean_text"] == "<EMAIL> at <IP> tel <PHONE>"
