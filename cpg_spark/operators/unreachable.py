"""Unreachable-EOG marking (SURVEY.md C4).

Re-derivation of the reference's UnreachableEOGPass
(``cpg-analysis/.../passes/UnreachableEOGPass.kt:39-90``): when an
if/while condition evaluates to a constant, the losing branch's EOG
edges get ``UNREACHABLE=true``.

The constant dimension composes BOTH sources the reference uses
(``UnreachableEOGPass.kt:39-90`` runs the ValueEvaluator on conditions):
boolean literals (the fast path) and the full constant-evaluation
fixpoint (``cpg_spark.operators.value_eval``) for *computed* constants
like ``if (x < 5)`` after ``x = 3``.

Spark shape: a broadcast join of EOG branch edges against the (tiny)
constant-condition dimension; the edge-property update is a
``map_concat`` column expression — no UDF, no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TRUE = ("True", "true")
_FALSE = ("False", "false")


def constant_conditions(nodes: DataFrame,
                        values: DataFrame | None = None) -> DataFrame:
    """(cond_id, const_value) for constant-valued condition nodes:
    boolean literals plus (when ``values`` — the evaluate_constants
    output — is given) every node the evaluator folded to a number,
    truthiness-projected (nonzero = true)."""
    lits = (
        nodes.filter(F.col("label") == "Literal")
        .filter(F.col("name").isin(*_TRUE, *_FALSE))
        .select(
            F.col("node_id").alias("cond_id"),
            F.when(F.col("name").isin(*_TRUE), F.lit("true"))
            .otherwise(F.lit("false")).alias("const_value"),
        )
    )
    if values is None:
        return lits
    evald = values.filter(F.col("value").isNotNull()).select(
        F.col("node_id").alias("cond_id"),
        F.when(F.col("value") != 0, F.lit("true"))
        .otherwise(F.lit("false")).alias("const_value"),
    )
    # one row per condition (literals are also evaluator seeds)
    return lits.unionByName(evald).dropDuplicates(["cond_id"])


def mark_unreachable(nodes: DataFrame, edges: DataFrame,
                     evaluate: bool = True) -> DataFrame:
    """Returns edges with ``props['unreachable']='true'`` on EOG branch
    edges whose branch can never be taken (branch != const value).

    ``evaluate=True`` runs the ValueEvaluator fixpoint first so computed
    constants prune branches too — the reference's exact composition;
    False keeps the literal-only fast path."""
    values = None
    if evaluate:
        from cpg_spark.operators.value_eval import evaluate_constants

        values = evaluate_constants(nodes, edges)
    consts = constant_conditions(nodes, values)
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
