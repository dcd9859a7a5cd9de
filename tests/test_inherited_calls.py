"""Inherited member-call resolution through the record supertype closure
(CallResolver.java:1707-1739 ``getInvocationCandidatesFromParents`` +
overriding-candidate ranking :1089-1127; round-1 verdict Missing #1).

Covers the cross-document case the frontend-local walk cannot see: Base/Mid
declared in one document, Leaf(Mid) plus call sites in another."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cpg_spark.operators.link import link_all, link_calls
from cpg_spark.operators.parse import parse_docs, split_parse_output
from cpg_spark.queries import INHERIT_BASE_SRC, INHERIT_CHILD_SRC
from cpg_spark.schemas import DOCS_SCHEMA


@pytest.fixture(scope="module")
def parsed(spark):
    docs = spark.createDataFrame(
        [{"doc_id": "py/baselib/0001",
          "spans": [{"kind": "code/python", "text": INHERIT_BASE_SRC,
                     "media_ref": None, "offset": 0}]},
         {"doc_id": "py/childlib/0001",
          "spans": [{"kind": "code/python", "text": INHERIT_CHILD_SRC,
                     "media_ref": None, "offset": 0}]}],
        schema=DOCS_SCHEMA)
    raw = parse_docs(docs).persist()
    yield split_parse_output(raw)
    raw.unpersist()


def _resolutions(parsed, with_closure: bool):
    nodes, edges, mentions, symbols = parsed
    if with_closure:
        linked, inferred, _ = link_all(mentions, symbols,
                                       nodes=nodes, edges=edges)
    else:
        linked, inferred, _ = link_all(mentions, symbols)
    calls = linked.filter(F.col("pred") == "CALLS")
    rows = (
        calls.join(mentions.select(F.col("mention_id").alias("subj"),
                                   F.col("name").alias("site")), "subj")
        .join(symbols.select(F.col("decl_id").alias("obj"),
                             F.col("record").alias("callee_record")),
              "obj", "left")
        .select("site", "callee_record").collect()
    )
    return {r["site"]: r["callee_record"] for r in rows}


def test_inherited_call_resolves_to_ancestor(spark, parsed):
    res = _resolutions(parsed, with_closure=True)
    # run() is declared only on Base, two levels above Leaf
    assert res["run"] == "Base"


def test_nearest_override_wins(spark, parsed):
    res = _resolutions(parsed, with_closure=True)
    # shared() exists on Base AND Mid: the nearer ancestor must win
    assert res["shared"] == "Mid"


def test_unknown_method_still_inferred(spark, parsed):
    nodes, edges, mentions, symbols = parsed
    linked, inferred, _ = link_all(mentions, symbols, nodes=nodes, edges=edges)
    inf = {r["name"] for r in inferred.select("name").collect()}
    assert inf == {"mystery"}
    res = _resolutions(parsed, with_closure=True)
    assert res["mystery"] is None  # CALLS edge points at the inferred node


def test_without_closure_misresolves(spark, parsed):
    """Documents the round-1 wrong-answer class: no closure -> inherited
    calls fabricate inferred nodes for methods that exist."""
    res = _resolutions(parsed, with_closure=False)
    assert res["run"] is None and res["shared"] is None


def test_exact_record_match_outranks_inherited(spark, parsed):
    """A method defined on the record itself must win over any ancestor's
    method of the same name (depth 0 < depth k)."""
    nodes, edges, mentions, symbols = parsed
    from cpg_spark.operators.hierarchy import supertype_record_closure

    closure = supertype_record_closure(nodes, edges, with_depth=True)
    # leaf_only resolves same-doc at parse time; exercise the link path by
    # re-resolving a synthetic mention against Leaf
    # scope_path inside baselib so the same-module visibility arm applies
    m = mentions.sparkSession.createDataFrame(
        [("m1", "member_call", "shared", "Mid", "baselib.probe",
          "py/baselib/0001", 0, 0, None, None)],
        "mention_id string, kind string, name string, base_type string, "
        "scope_path string, doc_id string, n_args int, n_kwargs int, "
        "arg_ids array<string>, arg_types array<string>")
    edges_out, _, _ = link_calls(m, symbols, closure=closure)
    got = (
        edges_out.filter(F.col("pred") == "CALLS")
        .join(symbols.select(F.col("decl_id").alias("obj"),
                             F.col("record").alias("rec")), "obj")
        .select("rec").collect()
    )
    # base_type is Mid itself -> Mid.shared (exact), never Base.shared
    assert [r["rec"] for r in got] == ["Mid"]
