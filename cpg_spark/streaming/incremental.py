"""Incremental document ingestion via Structured Streaming.

The reference is strictly batch (SURVEY.md §2.10) — its closest notion is
the ordered pass pipeline with a cancellation flag
(``TranslationManager.kt:100-108``).  At 10^12-doc scale, though, the
docs table grows continuously; this module is the incremental-scan path:

* ``readStream`` over the docs directory (file source; on a cluster the
  same code points at an Iceberg table with incremental scan),
* the SAME ``parse_docs`` mapInPandas operator (vectorized parse is
  streaming-safe: per-batch, no state),
* ``writeStream`` appending to the cpg_raw table, checkpointed — resume
  after failure reprocesses only unfinished files,
* ``trigger(availableNow=True)`` drains the backlog and stops, which is
  the batch-incremental hybrid the north_rule's resumability asks for.

Content-hash node ids (cpg_spark.ids) make re-ingestion idempotent: the
downstream materialize dedups on node_id / (subj, pred, obj), so at-least
-once file processing still yields exactly-once graph facts.

Cross-document linking is deliberately NOT streamed: symbol tables are
corpus-global, so linking stays a periodic batch compaction over the
accumulated cpg_raw (the reference equivalently reruns whole-graph
passes).  Watermark/stateful operators are unnecessary — there is no
event time or session state in CPG construction.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cpg_spark.operators.parse import PARSE_OUT_SCHEMA, parse_docs
from cpg_spark.schemas import DOCS_SCHEMA


def incremental_parse(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Drain all new doc files through the parse operator into cpg_raw.

    Returns the finished StreamingQuery (already awaited — availableNow
    drains the backlog then stops)."""
    reader = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger or 64)
        .parquet(docs_dir)
    )
    raw = parse_docs(reader)
    q = (
        raw.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def read_cpg_raw(spark: SparkSession, out_dir: str):
    """The accumulated incremental parse output, batch-readable for the
    linking compaction."""
    return spark.read.schema(PARSE_OUT_SCHEMA).parquet(out_dir)
