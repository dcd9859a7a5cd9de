"""End-to-end Spark tests: parse operator, span invariant, linking joins,
pipeline checkpoint/resume determinism."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from cpg_spark.operators.link import link_all
from cpg_spark.operators.parse import parse_docs, split_parse_output
from cpg_spark.pipeline import run_cpg_pipeline, triples
from cpg_spark.synth import (
    fixture_docs,
    generated_docs,
    validate_span_invariant,
)


@pytest.fixture(scope="module")
def parsed(spark):
    docs = fixture_docs(spark).union(generated_docs(spark, 30, n_hubs=2))
    raw = parse_docs(docs).cache()
    nodes, edges, mentions, symbols = split_parse_output(raw)
    return {
        "docs": docs, "raw": raw, "nodes": nodes.cache(),
        "edges": edges.cache(), "mentions": mentions.cache(),
        "symbols": symbols.cache(),
    }


def test_span_invariant_holds(spark, parsed):
    assert validate_span_invariant(parsed["docs"]).count() == 0


def test_span_invariant_detects_violation(spark):
    docs = spark.createDataFrame(
        [("bad", [{"kind": "text", "text": "a", "media_ref": None, "offset": 2},
                  {"kind": "text", "text": "b", "media_ref": None, "offset": 1}])],
        "doc_id string, spans array<struct<kind string, text string, "
        "media_ref string, offset int>>",
    )
    assert validate_span_invariant(docs).count() == 1


def test_parse_matches_pure_python(spark, parsed):
    """The distributed parse must emit exactly the rows the frontend emits
    standalone (determinism across partitioning)."""
    from cpg_spark.fixtures_py import PY_FIXTURES
    from cpg_spark.frontends.python_frontend import parse_python_document

    doc_id = "py/function/0001"
    expected = parse_python_document(doc_id, 1, PY_FIXTURES["function"], "function")
    got_nodes = parsed["nodes"].filter(F.col("doc_id") == doc_id).count()
    # span offset differs (interleaved docs put code at offset 1) but the
    # row COUNT is partition-invariant
    assert got_nodes == len(expected.nodes)


def test_cross_document_call_linking(spark, parsed):
    """Generated modules call util_helper_<h> defined in hub docs — the
    linking join must connect them across documents."""
    edges, inferred, stats = link_all(parsed["mentions"], parsed["symbols"])
    edges = edges.cache()
    nodes = parsed["nodes"]
    calls = (
        edges.filter(F.col("pred") == "CALLS")
        .join(nodes.select(F.col("node_id").alias("obj"),
                           F.col("name").alias("callee"),
                           F.col("doc_id").alias("callee_doc")), "obj")
        .join(nodes.select(F.col("node_id").alias("subj"),
                           F.col("doc_id").alias("caller_doc")), "subj")
    )
    cross = calls.filter(
        F.col("callee").startswith("util_helper_")
        & (F.col("caller_doc") != F.col("callee_doc"))
    )
    assert cross.count() > 0
    # every cross-doc util_helper call resolved to a hub doc declaration
    assert cross.filter(~F.col("callee_doc").startswith("py/hub")).count() == 0


def test_inferred_functions_deterministic(spark, parsed):
    _, inferred, _ = link_all(parsed["mentions"], parsed["symbols"])
    pdf = inferred.select("node_id", "name").toPandas()
    # print is unresolvable -> inferred, and all same-name/arity misses
    # collapse into one deterministic node
    assert "print" in set(pdf["name"])
    assert pdf["node_id"].is_unique


def test_salted_equals_broadcast(spark, parsed):
    e1, i1, _ = link_all(parsed["mentions"], parsed["symbols"], strategy="broadcast")
    e2, i2, _ = link_all(parsed["mentions"], parsed["symbols"], strategy="salted")
    a = {tuple(r) for r in e1.select("subj", "pred", "obj").collect()}
    b = {tuple(r) for r in e2.select("subj", "pred", "obj").collect()}
    assert a == b and len(a) > 0


def test_pipeline_checkpoint_resume(spark, tmp_path_factory):
    """Kill-and-resume: rerunning with the same run_id must skip committed
    stages and produce identical triples (content-hash id stability)."""
    wd = str(tmp_path_factory.mktemp("cpgwd"))
    docs = fixture_docs(spark)
    p1 = run_cpg_pipeline(spark, docs, wd, run_id="r1")
    t1 = {
        tuple(r)
        for r in triples(
            spark.read.parquet(p1.results[-1].outputs["edges"])
        ).collect()
    }
    # wipe the last stage to simulate a crash mid-run, then resume
    shutil.rmtree(p1.results[-1].outputs["edges"].rsplit("/", 1)[0])
    p2 = run_cpg_pipeline(spark, docs, wd, run_id="r1", resume=True)
    resumed = [r.name for r in p2.results if r.resumed]
    assert "parse" in resumed and "link" in resumed
    t2 = {
        tuple(r)
        for r in triples(
            spark.read.parquet(p2.results[-1].outputs["edges"])
        ).collect()
    }
    assert t1 == t2 and len(t1) > 100


def test_ingest_passthrough_commits_by_reference(spark, tmp_path_factory):
    """A file-backed input table must NOT be re-written by ingest: the
    stage commits by reference (pipeline.Passthrough), resume reloads from
    the recorded source URI, and the triples are identical to the
    synthesized-input run."""
    import os

    wd = str(tmp_path_factory.mktemp("cpgwd3"))
    docs_uri = os.path.join(wd, "input_docs")
    fixture_docs(spark).write.parquet(docs_uri)
    docs_scan = spark.read.parquet(docs_uri)

    p1 = run_cpg_pipeline(spark, docs_scan, wd, run_id="pt")
    ingest = p1.results[0]
    assert ingest.name == "ingest"
    # committed by reference: output URI is the input table itself and no
    # copy exists under the stage dir
    assert ingest.outputs["docs"] == docs_uri
    assert not os.path.exists(os.path.join(wd, "pt", "ingest", "docs"))
    t1 = {tuple(r) for r in triples(
        spark.read.parquet(p1.results[-1].outputs["edges"])).collect()}

    # resume must reload the passthrough source from the commit marker
    shutil.rmtree(p1.results[-1].outputs["edges"].rsplit("/", 1)[0])
    p2 = run_cpg_pipeline(spark, docs_scan, wd, run_id="pt", resume=True)
    assert p2.results[0].resumed
    t2 = {tuple(r) for r in triples(
        spark.read.parquet(p2.results[-1].outputs["edges"])).collect()}
    assert t1 == t2 and len(t1) > 100

    # an in-flight (non-scan) input still gets a real checkpoint write
    p3 = run_cpg_pipeline(spark, fixture_docs(spark), wd, run_id="pt2")
    assert os.path.exists(os.path.join(p3.results[0].outputs["docs"],
                                       "_SUCCESS"))
    t3 = {tuple(r) for r in triples(
        spark.read.parquet(p3.results[-1].outputs["edges"])).collect()}
    assert t1 == t3


def test_final_tables_unique_ids(spark, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("cpgwd2"))
    p = run_cpg_pipeline(spark, fixture_docs(spark), wd, run_id="r2")
    nodes = spark.read.parquet(p.results[-1].outputs["nodes"])
    assert nodes.count() == nodes.select("node_id").distinct().count()
    edges = spark.read.parquet(p.results[-1].outputs["edges"])
    assert edges.count() == edges.select("subj", "pred", "obj").distinct().count()


def test_dense_id_materialize(spark, tmp_path, monkeypatch):
    """CPG_SPARK_DENSE_IDS=1: output ids are dense walk-order ints
    (IdentifierPass at the output boundary — content-hash ids are 97% of
    edge bytes and incompressible), the content hash survives as
    nodes.content_id, and the triple set is isomorphic to the hash-id
    run through that mapping."""
    from pyspark.sql import functions as F

    from cpg_spark.pipeline import run_cpg_pipeline
    from cpg_spark.synth import fixture_docs

    docs = fixture_docs(spark)
    p1 = run_cpg_pipeline(spark, docs, str(tmp_path / "w1"), run_id="h",
                          resume=False)
    monkeypatch.setenv("CPG_SPARK_DENSE_IDS", "1")
    p2 = run_cpg_pipeline(spark, docs, str(tmp_path / "w2"), run_id="d",
                          resume=False)
    n1 = spark.read.parquet(p1.results[-1].outputs["nodes"])
    e1 = spark.read.parquet(p1.results[-1].outputs["edges"])
    n2 = spark.read.parquet(p2.results[-1].outputs["nodes"])
    e2 = spark.read.parquet(p2.results[-1].outputs["edges"])

    n_nodes = n2.count()
    assert n_nodes == n1.count()
    # dense: exactly 0..n-1, no gaps
    assert n2.agg(F.min("node_id"), F.max("node_id")).first() == (0, n_nodes - 1)
    assert n2.select("node_id").distinct().count() == n_nodes
    # every edge endpoint resolves to a node (no dangling hash leftovers)
    ids = n2.select("node_id")
    assert e2.join(ids.withColumnRenamed("node_id", "subj"), "subj",
                   "left_anti").count() == 0
    assert e2.join(ids.withColumnRenamed("node_id", "obj"), "obj",
                   "left_anti").count() == 0
    # isomorphic to the hash-id run: map dense ids back through content_id
    m = n2.select(F.col("node_id").alias("d"), F.col("content_id").alias("h"))
    back = (
        e2.join(m.withColumnRenamed("d", "subj").withColumnRenamed("h", "hs"),
                "subj")
        .join(m.withColumnRenamed("d", "obj").withColumnRenamed("h", "ho"),
              "obj")
        .select(F.col("hs").alias("subj"), "pred", F.col("ho").alias("obj"))
    )
    t1 = e1.select("subj", "pred", "obj")
    assert back.exceptAll(t1).isEmpty() and t1.exceptAll(back).isEmpty()
