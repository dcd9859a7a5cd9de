"""Staged, checkpointed, resumable pipeline runner.

The reference runs a fixed ordered pass list over one mutable in-heap graph
(``TranslationManager.kt:100-108``; order contract
``TranslationConfiguration.java:445-465``).  Here each stage is a pure
function from committed tables to new tables; a stage commit = table files +
``_SUCCESS`` + lineage rows.  Resume = skip every stage whose outputs are
committed for this ``run_id`` (north_rule: "resumable from checkpoint after
any stage") — correctness of resume rests on content-hash node ids
(cpg_spark.ids), which make re-computation idempotent.

Stage graph for the flagship CPG job (SURVEY.md §7.1):

    ingest -> parse -> link -> materialize

with EOG / provisional DFG / local REFERS_TO folded into parse (per-doc,
zero shuffle) and linking joins in link (the only wide stage).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cpg_spark import sinks
from cpg_spark.operators.link import link_all
from cpg_spark.operators.parse import parse_docs, split_parse_output
from cpg_spark.synth import validate_span_invariant


@dataclass
class StageResult:
    name: str
    outputs: dict[str, str]  # table name -> uri
    wall_ms: int
    resumed: bool
    metrics: dict = field(default_factory=dict)


@dataclass
class Stage:
    name: str
    # fn(spark, ctx: dict[str, DataFrame]) -> (outputs: dict[str, DataFrame],
    #                                          metrics: dict,
    #                                          partition_by: dict[str, list])
    fn: Callable


class Pipeline:
    def __init__(self, spark: SparkSession, workdir: str, run_id: str | None = None):
        self.spark = spark
        self.workdir = workdir
        self.run_id = run_id or uuid.uuid4().hex[:12]
        self.results: list[StageResult] = []

    # ------------------------------------------------------------------
    def _lineage(self, stage: str, outputs: dict[str, str], wall_ms: int,
                 resumed: bool, metrics: dict) -> None:
        """Per-partition lineage: rows-per-partition of every output table,
        appended under the run directory (north_rule lineage requirement)."""
        rows = []
        for name, uri in outputs.items():
            try:
                per_part = (
                    sinks.read_table(self.spark, uri)
                    .groupBy(F.spark_partition_id().alias("partition_id"))
                    .count()
                    .collect()
                )
            except Exception:
                per_part = []
            for r in per_part:
                rows.append({
                    "run_id": self.run_id, "stage": f"{stage}/{name}",
                    "partition_id": int(r["partition_id"]),
                    "input_rows": None, "output_rows": int(r["count"]),
                    "wall_ms": wall_ms,
                })
        path = os.path.join(self.workdir, self.run_id, "_lineage")
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, f"{stage}.jsonl"), "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")
            fh.write(json.dumps({
                "run_id": self.run_id, "stage": stage, "partition_id": -1,
                "resumed": resumed, "wall_ms": wall_ms, "metrics": metrics,
            }) + "\n")

    # ------------------------------------------------------------------
    def run_stage(self, stage: Stage, ctx: dict[str, DataFrame],
                  resume: bool = True) -> dict[str, DataFrame]:
        t0 = time.time()
        probe = sinks.table_uri(self.workdir, self.run_id, stage.name, "_stage_done")
        if resume and sinks.is_committed(probe):
            # all outputs of this stage are committed: reload them
            stage_dir = os.path.join(self.workdir, self.run_id, stage.name)
            outputs = {
                n: os.path.join(stage_dir, n)
                for n in os.listdir(stage_dir)
                if not n.startswith("_")
            }
            dfs = {n: sinks.read_table(self.spark, u) for n, u in outputs.items()}
            self.results.append(StageResult(stage.name, outputs, 0, True))
            return dfs

        out_dfs, metrics, partition_by = stage.fn(self.spark, ctx)
        outputs = {}
        for name, df in out_dfs.items():
            uri = sinks.table_uri(self.workdir, self.run_id, stage.name, name)
            sinks.write_table(df, uri, partition_by.get(name))
            outputs[name] = uri
        # commit marker for the whole stage (atomic-enough locally; an
        # Iceberg catalog gives true atomicity on a cluster)
        self.spark.createDataFrame([(self.run_id,)], "run_id string").coalesce(
            1
        ).write.mode("overwrite").parquet(probe)
        wall_ms = int((time.time() - t0) * 1000)
        self._lineage(stage.name, outputs, wall_ms, False, metrics)
        self.results.append(StageResult(stage.name, outputs, wall_ms, False,
                                        metrics))
        # hand back re-read frames so downstream stages consume the committed
        # checkpoint (cuts lineage, enables pushdown on the parquet scan)
        return {n: sinks.read_table(self.spark, u) for n, u in outputs.items()}


# ---------------------------------------------------------------------------
# the flagship CPG stages
# ---------------------------------------------------------------------------

def _ingest(spark, ctx):
    docs = ctx["docs"]
    bad = validate_span_invariant(docs).count()
    if bad:
        raise ValueError(f"span-sequence invariant violated for {bad} docs")
    return {"docs": docs}, {"invariant_violations": bad}, {}


def _parse(spark, ctx):
    raw = parse_docs(ctx["docs"])
    return {"cpg_raw": raw}, {}, {"cpg_raw": ["row_kind"]}


def _link(spark, ctx):
    nodes, edges, mentions, symbols = split_parse_output(ctx["cpg_raw"])
    linked_edges, inferred_nodes, stats = link_all(mentions, symbols)
    return (
        {"edges_linked": linked_edges, "nodes_inferred": inferred_nodes},
        stats,
        {},
    )


def _materialize(spark, ctx):
    nodes, edges, _, _ = split_parse_output(ctx["cpg_raw"])
    all_nodes = nodes.unionByName(ctx["nodes_inferred"]).dropDuplicates(["node_id"])
    all_edges = (
        edges.unionByName(ctx["edges_linked"])
        .dropDuplicates(["subj", "pred", "obj"])
    )
    return (
        {"nodes": all_nodes, "edges": all_edges},
        {},
        # pred-partitioning keeps per-predicate scans (triple view queries)
        # pruned; doc_id bucketing is the Iceberg-side refinement on cluster
        {"edges": ["pred"]},
    )


CPG_STAGES = [
    Stage("ingest", _ingest),
    Stage("parse", _parse),
    Stage("link", _link),
    Stage("materialize", _materialize),
]


def run_cpg_pipeline(spark: SparkSession, docs: DataFrame, workdir: str,
                     run_id: str | None = None, resume: bool = True) -> Pipeline:
    p = Pipeline(spark, workdir, run_id)
    ctx: dict[str, DataFrame] = {"docs": docs}
    for stage in CPG_STAGES:
        ctx.update(p.run_stage(stage, ctx, resume=resume))
    return p


def triples(edges: DataFrame) -> DataFrame:
    """The deliverable (subj, pred, obj) projection."""
    return edges.select("subj", "pred", "obj")
