"""Skew histogram metrics (SURVEY §7.3) + salted-vs-broadcast equality on
a Zipf-skewed mention corpus."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cpg_spark.operators.joins import skew_report
from cpg_spark.operators.parse import parse_docs, split_parse_output
from cpg_spark.pipeline import run_cpg_pipeline
from cpg_spark.synth import generated_docs


def test_skew_report_identifies_zipf_head(spark):
    raw = parse_docs(generated_docs(spark, 200, n_hubs=4)).persist()
    _, _, mentions, _ = split_parse_output(raw)
    rep = skew_report(mentions)
    assert rep["skew_ratio"] is not None and rep["skew_ratio"] >= 1.0
    # the Zipf head (print) must show up among the hot keys
    assert "print" in rep["hot_keys"]
    # hottest first
    counts = list(rep["hot_keys"].values())
    assert counts == sorted(counts, reverse=True)
    raw.unpersist()


def test_pipeline_skew_metrics_env(spark, tmp_path):
    os.environ["CPG_SPARK_SKEW_REPORT"] = "1"
    try:
        p = run_cpg_pipeline(spark, generated_docs(spark, 60, n_hubs=2),
                             str(tmp_path), run_id="skew")
        link_stats = [r.metrics for r in p.results if r.name == "link"][0]
        assert "mention_name_skew" in link_stats
        assert link_stats["mention_name_skew"]["hot_keys"]
    finally:
        del os.environ["CPG_SPARK_SKEW_REPORT"]
