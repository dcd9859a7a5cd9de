"""End-to-end P/R gate on the FINAL materialized tables: the full
checkpointed pipeline (parse -> link -> dfg_refine -> materialize) must
preserve the reference-parity CALLS / REFERS_TO facts — refinement and
canonicalization may only touch DFG/EVAL_TYPE/SUPER_TYPE shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cpg_spark.pipeline import run_cpg_pipeline
from cpg_spark.synth import fixture_docs
from tests.test_fixture_triples import (FIDELITY_EXTRA_REFERS,
                                        EXPECTED_CALLS, EXPECTED_REFERS, _pr)


@pytest.fixture(scope="module")
def final_tables(spark, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("pr_e2e"))
    p = run_cpg_pipeline(spark, fixture_docs(spark), wd, run_id="pr")
    nodes = spark.read.parquet(p.results[-1].outputs["nodes"])
    edges = spark.read.parquet(p.results[-1].outputs["edges"])
    joined = (
        edges.filter(F.col("pred").isin("CALLS", "REFERS_TO"))
        .join(nodes.select(F.col("node_id").alias("subj"),
                           F.col("label").alias("s_label"),
                           F.col("name").alias("s_name")), "subj")
        .join(nodes.select(F.col("node_id").alias("obj"),
                           F.col("label").alias("o_label"),
                           F.col("name").alias("o_name")), "obj")
        .select("doc_id", "pred", "s_label", "s_name", "o_label", "o_name")
        .distinct()
        .collect()
    )
    out: dict[str, set] = {}
    for r in joined:
        out.setdefault(r["pred"], set()).add(
            (r["doc_id"], r["s_label"], r["s_name"], r["o_label"], r["o_name"])
        )
    return out


def test_final_calls_pr(final_tables):
    p, r, extra, missing = _pr(final_tables.get("CALLS", set()),
                               EXPECTED_CALLS)
    assert p >= 0.95, f"precision {p:.3f}; spurious {sorted(extra)[:6]}"
    assert r >= 0.95, f"recall {r:.3f}; missing {sorted(missing)[:6]}"


def test_final_refers_to_pr(final_tables):
    # the e2e pipeline runs the full-fidelity default, so the documented
    # fidelity upgrades join the expected set; anything else spurious
    # still fails precision
    p, r, extra, missing = _pr(final_tables.get("REFERS_TO", set()),
                               EXPECTED_REFERS | FIDELITY_EXTRA_REFERS)
    assert p >= 0.95, f"precision {p:.3f}; spurious {sorted(extra)[:6]}"
    assert r >= 0.95, f"recall {r:.3f}; missing {sorted(missing)[:6]}"
