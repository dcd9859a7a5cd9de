"""Dataflow-directed type propagation (SURVEY U-type; round-1 verdict
Missing #4).

Re-derivation of the reference's TypeListener machinery
(``HasType.java:56-65`` registerTypeListener / propagate,
``DeclaredReferenceExpression.java:140-161`` typeChanged): a node whose
type the frontend could not spell receives its type through dataflow —
assignments, references, call returns — with ``Origin=DATAFLOW``.

Spark shape: a monotone SET-propagation fixpoint — every node
accumulates all types reachable along DFG edges (no early judgment, so
a fast-arriving type cannot race a slower conflicting one), and only
nodes whose final set holds exactly one type receive a DATAFLOW type.
Declared types are never overridden — DATAFLOW only fills gaps — and a
conflicted node (e.g. a variable assigned int on one branch, str on the
other) stays untyped, the conservative projection of the reference's
multi-listener updates.

Value flowing through a FunctionDeclaration node (return statement ->
function -> call site, the DFG the frontends already emit) gives call
expressions their callee's return type — the reference's
``CallExpression.typeChanged`` behaviour.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PROP_TARGETS = (
    "DeclaredReferenceExpression", "VariableDeclaration",
    "ParamVariableDeclaration", "FieldDeclaration", "MemberExpression",
    "CallExpression", "MemberCallExpression", "ReturnStatement",
    "FunctionDeclaration", "MethodDeclaration", "CastExpression",
)


def propagate_types(nodes: DataFrame, edges: DataFrame,
                    max_iters: int = 8) -> DataFrame:
    """Returns (node_id, type_name, origin) — the frontend-declared types
    plus every DATAFLOW-derived one."""
    type_names = nodes.filter(F.col("label") == "Type").select(
        F.col("node_id").alias("obj"), F.col("name").alias("type_name"))
    declared = (
        edges.filter(F.col("pred") == "EVAL_TYPE")
        .join(type_names, "obj")
        .select(F.col("subj").alias("node_id"), "type_name")
        .dropDuplicates(["node_id", "type_name"])
    )
    # a node with MULTIPLE declared types keeps them; propagation only
    # considers nodes with no type at all
    targets = nodes.filter(F.col("label").isin(*_PROP_TARGETS)).select(
        F.col("node_id").alias("tgt"))
    dfg = edges.filter(F.col("pred") == "DFG").select(
        F.col("subj").alias("src"), F.col("obj").alias("tgt")
    ).join(targets, "tgt")

    declared_ids = declared.select("node_id").distinct()
    # accumulate (node, type) PAIRS monotonically; declared-typed nodes
    # re-emit only their declared type (they are sources, not sinks)
    pairs = declared.localCheckpoint(eager=True)
    frontier = pairs
    for _ in range(max_iters):
        step = (
            dfg.join(frontier.select(F.col("node_id").alias("src"),
                                     "type_name"), "src")
            .select(F.col("tgt").alias("node_id"), "type_name")
            # declared nodes keep their declared type: nothing flows in
            .join(declared_ids, "node_id", "left_anti")
            .join(pairs, ["node_id", "type_name"], "left_anti")
            .distinct()
            .localCheckpoint(eager=True)
        )
        if step.limit(1).count() == 0:
            break
        # both sides already materialized — lazy union keeps the lineage
        # flat (≤ max_iters checkpointed legs) without an extra job/round
        pairs = pairs.unionByName(step)
        frontier = step
    flowed = pairs.join(declared_ids, "node_id", "left_anti")
    unambiguous = (
        flowed.groupBy("node_id")
        .agg(F.count_distinct("type_name").alias("n"),
             F.first("type_name").alias("type_name"))
        .filter(F.col("n") == 1)
        .select("node_id", "type_name")
        .withColumn("origin", F.lit("DATAFLOW"))
    )
    return declared.withColumn("origin", F.lit("DECLARED")).unionByName(
        unambiguous)


def dataflow_type_edges(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """New EVAL_TYPE edge rows (props origin=DATAFLOW) for every
    propagated type, reusing the existing canonical Type-node ids."""
    types = propagate_types(nodes, edges).filter(
        F.col("origin") == "DATAFLOW")
    # Type nodes repeat per emitting span but share one content-hash id —
    # dedup so the name join cannot fan out
    tids = nodes.filter(F.col("label") == "Type").select(
        F.col("node_id").alias("tid"), F.col("name").alias("type_name")
    ).dropDuplicates(["tid", "type_name"])
    doc = nodes.select(F.col("node_id").alias("node_id"),
                       F.col("doc_id").alias("n_doc"))
    return (
        types.join(tids, "type_name")
        .join(doc, "node_id", "left")
        .select(
            F.col("node_id").alias("subj"),
            F.lit("EVAL_TYPE").alias("pred"),
            F.col("tid").alias("obj"),
            F.create_map(F.lit("origin"), F.lit("DATAFLOW")).alias("props"),
            F.col("n_doc").alias("doc_id"),
        )
    )
