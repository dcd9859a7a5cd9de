"""Distributed sequential-id assignment (IdentifierPass).

The reference's ``cpg-analysis/.../passes/IdentifierPass.kt:33-56`` walks
every translation unit in order and stamps ``node.id = lastId++`` — a dense
sequential id in deterministic AST-preorder.  A naive Spark translation is
``row_number()`` over a global ``Window.orderBy(...)``: that collapses the
whole table into ONE partition and is the canonical 100 TB scale-killer.

The scalable shape used here is the classic two-pass range-partition trick
(what ``RDD.zipWithIndex`` does, lifted to DataFrames with an explicit
total order):

1. ``repartitionByRange`` on the order key + ``sortWithinPartitions`` —
   Spark's range partitioner gives globally ordered, balanced partitions.
2. one tiny aggregation counts rows per partition (P rows to the driver,
   P = number of partitions, NOT data rows),
3. the cumulative offsets are broadcast and a ``mapInPandas`` pass stamps
   ``offset[pid] + running_count`` — narrow, order-preserving, Arrow-batched.

Total cost: one range shuffle + one count job + one narrow pass; no stage
ever sees more than one partition's rows on a single task.

The frame is persisted between the count and the stamp pass so both jobs
see the identical range split (at cluster scale this would be the stage's
Iceberg checkpoint table instead).
"""

from __future__ import annotations

import numpy as np
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def sequential_ids(
    df: DataFrame,
    order_by: list[str],
    id_col: str = "seq_id",
    start: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a dense sequential ``id_col`` (start, start+1, ...) following the
    total order given by ``order_by`` — the IdentifierPass contract
    (``IdentifierPass.kt:45-50`` ``node.id = lastId++`` in walk order)
    without a single-partition window.

    ``order_by`` must be a total order (add a tiebreaker column if not);
    ties would make the ids nondeterministic between runs.
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_by]
    parted = (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .persist()
    )
    # pass 1: rows per range partition — P result rows, not data rows
    counts = (
        parted.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    by_pid = {r["pid"]: r["count"] for r in counts}
    offsets: dict[int, int] = {}
    acc = start
    for pid in sorted(by_pid):
        offsets[pid] = acc
        acc += by_pid[pid]
    offsets_bc = spark.sparkContext.broadcast(offsets)

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(id_col, T.LongType(), False)]
    )

    # pass 2: narrow, order-preserving stamp — mapInPandas keeps the sorted
    # row order inside each partition, so a running counter is exact
    def _stamp(batches):
        nxt = offsets_bc.value.get(TaskContext.get().partitionId(), start)
        for pdf in batches:
            k = len(pdf)
            pdf[id_col] = np.arange(nxt, nxt + k, dtype="int64")
            nxt += k
            yield pdf

    out = parted.mapInPandas(_stamp, out_schema)
    # ``TaskContext.partitionId()`` is the *stage* partition id: if a
    # consumer plan fuses this mapInPandas into a union (e.g. exceptAll
    # unions both inputs into one 2P-task stage), the second branch's
    # tasks see shifted ids and would read the wrong offsets.  Baking the
    # ids NOW under a controlled single-branch job (eager localCheckpoint,
    # which also truncates lineage so the stamp can never re-execute
    # inside a fused stage) makes the result plan-independent.  On a
    # cluster this pass writes its Iceberg output table here instead —
    # IdentifierPass is a materialization pass by nature.
    out = out.localCheckpoint(eager=True)
    parted.unpersist()
    return out


def identify_nodes(nodes: DataFrame, id_col: str = "seq_id") -> DataFrame:
    """IdentifierPass over the CPG nodes table: dense ids in document order
    then source-location preorder — the deterministic analogue of the
    reference's per-TU AST walk (``IdentifierPass.kt:40-50``; TUs in
    result order, children in ``SubgraphWalker.getAstChildren`` order).

    ``node_id`` (the content hash) is the final tiebreaker so the order is
    total even for co-located synthetic nodes.
    """
    return sequential_ids(
        nodes,
        order_by=[
            "doc_id",
            "span_offset",
            "loc.start_line",
            "loc.start_col",
            "node_id",
        ],
        id_col=id_col,
    )
