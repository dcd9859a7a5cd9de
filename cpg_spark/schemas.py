"""Table schemas for the pipeline (see SURVEY.md §1.2, FIXTURES.md §1).

The node/edge tables are the Spark equivalent of the reference's OGM object
graph: one ``nodes`` table with a ``label`` column instead of ~80 Java node
classes (reference ``cpg-core/.../graph/Node.kt:48-138``), and one ``edges``
table whose ``pred`` column carries the ``@Relationship`` annotation values
the reference persists to Neo4j (e.g. ``REFERS_TO`` at
``DeclaredReferenceExpression.java:51``, ``INVOKES`` at
``CallExpression.java:59``).  PropertyEdge keys (INDEX / BRANCH / NAME /
UNREACHABLE, reference ``graph/edge/Properties.java:43-49``) become entries
in the ``props`` map column.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Input: interleaved text+media documents (BASELINE.json input_hint).
# ---------------------------------------------------------------------------
SPAN_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), True),
    ]
)

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_SCHEMA), True),
    ]
)

# ---------------------------------------------------------------------------
# Output: nodes / edges (FIXTURES.md §1 output tables).
# ---------------------------------------------------------------------------
LOC_SCHEMA = T.StructType(
    [
        T.StructField("start_line", T.IntegerType(), True),
        T.StructField("start_col", T.IntegerType(), True),
        T.StructField("end_line", T.IntegerType(), True),
        T.StructField("end_col", T.IntegerType(), True),
    ]
)

NODES_SCHEMA = T.StructType(
    [
        T.StructField("node_id", T.LongType(), False),
        T.StructField("label", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("code", T.StringType(), True),
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("span_offset", T.IntegerType(), True),
        T.StructField("loc", LOC_SCHEMA, True),
        T.StructField("is_inferred", T.BooleanType(), True),
        T.StructField("is_implicit", T.BooleanType(), True),
        T.StructField("argument_index", T.IntegerType(), True),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

EDGES_SCHEMA = T.StructType(
    [
        T.StructField("subj", T.LongType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.LongType(), False),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
        # provenance for partition pruning / lineage; dropped in the bare
        # (subj, pred, obj) triple view
        T.StructField("doc_id", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Intermediate: unresolved mentions exported by the parse stage for the
# cross-document linking joins (reference VariableUsageResolver /
# CallResolver operate on the full merged graph; we only ship mentions the
# in-UDF local scope resolution could not settle — SURVEY.md J1/J2/J3).
# ---------------------------------------------------------------------------
MENTIONS_SCHEMA = T.StructType(
    [
        T.StructField("mention_id", T.LongType(), False),  # node_id of the ref/call
        T.StructField("kind", T.StringType(), False),  # ref | call | member_call | construct
        T.StructField("name", T.StringType(), False),  # simple name
        T.StructField("base_type", T.StringType(), True),  # for member access, if known
        T.StructField("scope_path", T.StringType(), True),  # module-qualified scope
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("n_args", T.IntegerType(), True),  # call arity (positional)
        T.StructField("n_kwargs", T.IntegerType(), True),
        T.StructField("arg_ids", T.ArrayType(T.LongType()), True),  # ordered arg node ids
    ]
)

# Exported (global) symbol table: declarations that can be linked across
# documents (functions, methods, records, module-level variables, fields).
SYMBOLS_SCHEMA = T.StructType(
    [
        T.StructField("decl_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # function|method|ctor|record|var|field
        T.StructField("name", T.StringType(), False),
        T.StructField("fqn", T.StringType(), True),  # module.name or module.Class.name
        T.StructField("record", T.StringType(), True),  # owning record simple name
        T.StructField("module", T.StringType(), True),
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("n_params", T.IntegerType(), True),
        T.StructField("has_defaults", T.BooleanType(), True),
        T.StructField("is_variadic", T.BooleanType(), True),
        T.StructField("param_ids", T.ArrayType(T.LongType()), True),  # ordered param node ids
        T.StructField("param_names", T.ArrayType(T.StringType()), True),
    ]
)

# Per-stage lineage rows (north_rule: per-partition lineage + metrics).
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), True),
        T.StructField("input_rows", T.LongType(), True),
        T.StructField("output_rows", T.LongType(), True),
        T.StructField("wall_ms", T.LongType(), True),
    ]
)

# All predicates the pipeline emits (SURVEY.md §1.2 "predicates").
PREDICATES = [
    "AST",
    "EVAL_TYPE",
    "DFG",
    "EOG",
    "REFERS_TO",
    "CALLS",
    "ARGUMENTS",
    "PARAMETERS",
    "FIELDS",
    "METHODS",
    "CONSTRUCTORS",
    "SUPER_TYPE",
    "OVERRIDES",
    "RECEIVER",
]
