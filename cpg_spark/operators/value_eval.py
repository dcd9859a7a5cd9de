"""Constant evaluation over the graph (SURVEY.md U1).

Re-derivation of the reference's ValueEvaluator
(``cpg-analysis/.../analysis/ValueEvaluator.kt:71-360``): resolve a
node's compile-time constant by chasing initializers / DFG edges
backwards and folding arithmetic (dispatch :75-106, binops :120-243,
unary minus :245-267).

Spark shape: a driver-loop fixpoint over DataFrames — the same pattern
as the supertype closure.  Seeds are Literal nodes; each round
* folds BinaryOperator nodes whose LHS/RHS AST children both have values
  (+ - * / % < <= > >= == !=),
* folds UnaryOperator '-' inputs,
* copies values along DFG edges into reference/declaration nodes that
  have exactly ONE distinct known inbound value (several conflicting
  writes ⇒ not a constant — the reference returns the ambiguous set,
  we return nothing, which is the conservative projection).

Numeric values are doubles; booleans are 1.0/0.0 with a 'bool' tag so
comparisons render like the reference's.  Converges in O(expression
depth) rounds; each round is two joins + an aggregation, checkpointed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_VALUE_LABELS = {
    "DeclaredReferenceExpression", "VariableDeclaration",
    "ParamVariableDeclaration", "FieldDeclaration", "MemberExpression",
    "CastExpression", "ReturnStatement",
}


def _fold_binop(op_col, l, r):
    return (
        F.when(op_col == "+", l + r)
        .when(op_col == "-", l - r)
        .when(op_col == "*", l * r)
        .when(op_col == "/", l / r)
        .when(op_col == "%", l % r)
        .when(op_col == "<", (l < r).cast("double"))
        .when(op_col == "<=", (l <= r).cast("double"))
        .when(op_col == ">", (l > r).cast("double"))
        .when(op_col == ">=", (l >= r).cast("double"))
        .when(op_col == "==", (l == r).cast("double"))
        .when(op_col == "!=", (l != r).cast("double"))
    )


def _is_bool_op(op_col):
    return op_col.isin("<", "<=", ">", ">=", "==", "!=")


def evaluate_constants(nodes: DataFrame, edges: DataFrame,
                       max_iters: int = 12) -> DataFrame:
    """Returns (node_id, value double, is_bool boolean) for every node
    with a derivable compile-time constant."""
    # literal seeds: ints/floats/bools (strings skipped — the reference
    # concatenates strings, out of scope here)
    lits = nodes.filter(F.col("label") == "Literal").select(
        "node_id",
        F.when(F.col("name") == "True", F.lit(1.0))
        .when(F.col("name") == "False", F.lit(0.0))
        .when(F.col("name") == "true", F.lit(1.0))
        .when(F.col("name") == "false", F.lit(0.0))
        .otherwise(
            F.regexp_replace(F.col("name"), "[lLuUfFdD]$", "").cast("double")
        ).alias("value"),
        F.col("name").isin("True", "False", "true", "false").alias("is_bool"),
    ).filter(F.col("value").isNotNull())

    binop_sides = (
        edges.filter(F.col("pred") == "AST")
        .filter(F.col("props").getItem("field").isin("LHS", "RHS"))
        .select(F.col("subj").alias("op_id"),
                F.col("props").getItem("field").alias("side"),
                F.col("obj").alias("child"))
    )
    binops = nodes.filter(F.col("label") == "BinaryOperator").select(
        F.col("node_id").alias("op_id"),
        F.col("props").getItem("operator").alias("op"),
    ).filter(~F.col("op").isin(*[o + "=" for o in "+-*/%"], "="))
    unary_neg = (
        nodes.filter(F.col("label") == "UnaryOperator")
        .filter(F.col("props").getItem("operator") == "-")
        .select(F.col("node_id").alias("op_id"))
        .join(
            edges.filter(F.col("pred") == "AST")
            .filter(F.col("props").getItem("field") == "INPUT")
            .select(F.col("subj").alias("op_id"), F.col("obj").alias("child")),
            "op_id",
        )
    )
    copy_targets = nodes.filter(F.col("label").isin(*_VALUE_LABELS)).select(
        F.col("node_id").alias("tgt")
    )
    dfg = edges.filter(F.col("pred") == "DFG").select(
        F.col("subj").alias("src"), F.col("obj").alias("tgt")
    ).join(copy_targets, "tgt")
    # a target is constant only once ALL its inbound defs are known and
    # agree — copying early would freeze a partial value (the reference
    # collects the full candidate set before judging, ValueEvaluator.kt)
    indegree = dfg.groupBy("tgt").agg(F.count("*").alias("n_in"))

    vals = lits.localCheckpoint(eager=True)
    for _ in range(max_iters):
        # binop folding
        lhs = binop_sides.filter(F.col("side") == "LHS").join(
            vals.select(F.col("node_id").alias("child"),
                        F.col("value").alias("lv")), "child")
        rhs = binop_sides.filter(F.col("side") == "RHS").join(
            vals.select(F.col("node_id").alias("child"),
                        F.col("value").alias("rv")), "child")
        folded = (
            binops.join(lhs.select("op_id", "lv"), "op_id")
            .join(rhs.select("op_id", "rv"), "op_id")
            .select(
                F.col("op_id").alias("node_id"),
                _fold_binop(F.col("op"), F.col("lv"), F.col("rv"))
                .alias("value"),
                _is_bool_op(F.col("op")).alias("is_bool"),
            )
            .filter(F.col("value").isNotNull())
        )
        negs = unary_neg.join(
            vals.select(F.col("node_id").alias("child"),
                        F.col("value").alias("iv")), "child"
        ).select(F.col("op_id").alias("node_id"),
                 (-F.col("iv")).alias("value"), F.lit(False).alias("is_bool"))
        # DFG copy into targets whose inputs are ALL known and agree
        copied = (
            dfg.join(vals.select(F.col("node_id").alias("src"), "value",
                                 "is_bool"), "src")
            .groupBy("tgt")
            .agg(F.count("*").alias("n_known"),
                 F.count_distinct("value").alias("n"),
                 F.first("value").alias("value"),
                 F.first("is_bool").alias("is_bool"))
            .join(indegree, "tgt")
            .filter((F.col("n") == 1) & (F.col("n_known") == F.col("n_in")))
            .select(F.col("tgt").alias("node_id"), "value", "is_bool")
        )
        new = (
            folded.unionByName(negs).unionByName(copied)
            .join(vals.select("node_id"), "node_id", "left_anti")
            .dropDuplicates(["node_id"])
        )
        if new.limit(1).count() == 0:
            break
        vals = vals.unionByName(new).localCheckpoint(eager=True)
    return vals
