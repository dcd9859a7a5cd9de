"""Unreachable-EOG marking (SURVEY.md C4).

Re-derivation of the reference's UnreachableEOGPass
(``cpg-analysis/.../passes/UnreachableEOGPass.kt:39-90``): when an
if/while condition evaluates to a constant, the losing branch's EOG
edges get ``UNREACHABLE=true``.

The constant evaluation here covers the literal-condition case the
reference's fixtures exercise (``resources/passes/unreachable/``); the
full ValueEvaluator ladder (``cpg-analysis/.../ValueEvaluator.kt:71-360``)
would slot in as a richer constant dimension — same join shape.

Spark shape: a broadcast join of EOG branch edges against the (tiny)
constant-condition dimension; the edge-property update is a
``map_concat`` column expression — no UDF, no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TRUE = ("True", "true")
_FALSE = ("False", "false")


def constant_conditions(nodes: DataFrame) -> DataFrame:
    """(cond_id, const_value) for boolean-literal condition nodes."""
    return (
        nodes.filter(F.col("label") == "Literal")
        .filter(F.col("name").isin(*_TRUE, *_FALSE))
        .select(
            F.col("node_id").alias("cond_id"),
            F.when(F.col("name").isin(*_TRUE), F.lit("true"))
            .otherwise(F.lit("false")).alias("const_value"),
        )
    )


def mark_unreachable(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Returns edges with ``props['unreachable']='true'`` on EOG branch
    edges whose branch can never be taken (branch != const value)."""
    consts = constant_conditions(nodes)
    losing = (
        F.col("pred").eqNullSafe("EOG")
        & F.col("const_value").isNotNull()
        & F.col("props").getItem("branch").isNotNull()
        & (F.col("props").getItem("branch") != F.col("const_value"))
    )
    return (
        edges.join(F.broadcast(consts),
                   edges["subj"] == consts["cond_id"], "left")
        .withColumn(
            "props",
            F.when(
                losing,
                F.map_concat("props", F.create_map(F.lit("unreachable"),
                                                   F.lit("true"))),
            ).otherwise(F.col("props")),
        )
        .drop("cond_id", "const_value")
    )
