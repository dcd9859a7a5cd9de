"""Parse stage: interleaved docs -> CPG rows, one vectorized pass.

Spark shape of the reference frontend stage (``TranslationManager.kt
runFrontends :146-245`` + per-file parallel parse ``:247-299``): every
partition parses its documents in one Arrow batch stream via
``mapInPandas`` — per-document work (AST build, EOG, provisional DFG, local
scope resolution) never shuffles (SURVEY.md §7.0).  Frontend dispatch by
span ``kind`` replaces dispatch by file extension
(``TranslationManager.kt:373-405``).

The stage emits ONE unified row stream (``row_kind`` discriminator) so the
expensive parse runs exactly once; the four logical tables (nodes, edges,
mentions, symbols) are cheap filters over the checkpointed output with
``row_kind`` predicate pushdown.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cpg_spark.schemas import LOC_SCHEMA

PARSE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("row_kind", T.StringType(), False),  # node|edge|mention|symbol
        T.StructField("doc_id", T.StringType(), True),
        # node fields
        T.StructField("node_id", T.StringType(), True),
        T.StructField("label", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("code", T.StringType(), True),
        T.StructField("span_offset", T.IntegerType(), True),
        T.StructField("loc", LOC_SCHEMA, True),
        T.StructField("is_inferred", T.BooleanType(), True),
        T.StructField("is_implicit", T.BooleanType(), True),
        T.StructField("argument_index", T.IntegerType(), True),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
        # edge fields (props/doc_id shared)
        T.StructField("subj", T.StringType(), True),
        T.StructField("pred", T.StringType(), True),
        T.StructField("obj", T.StringType(), True),
        # mention fields (name shared)
        T.StructField("m_kind", T.StringType(), True),
        T.StructField("m_base_type", T.StringType(), True),
        T.StructField("m_scope_path", T.StringType(), True),
        T.StructField("m_n_args", T.IntegerType(), True),
        T.StructField("m_n_kwargs", T.IntegerType(), True),
        T.StructField("m_arg_ids", T.ArrayType(T.StringType()), True),
        # symbol fields (name shared)
        T.StructField("s_kind", T.StringType(), True),
        T.StructField("s_fqn", T.StringType(), True),
        T.StructField("s_record", T.StringType(), True),
        T.StructField("s_module", T.StringType(), True),
        T.StructField("s_n_params", T.IntegerType(), True),
        T.StructField("s_param_ids", T.ArrayType(T.StringType()), True),
        T.StructField("s_param_names", T.ArrayType(T.StringType()), True),
    ]
)

_COLS = [f.name for f in PARSE_OUT_SCHEMA.fields]


def _rows_for_doc(doc_id: str, spans) -> list[dict]:
    # imported lazily so the workers pick up the shipped package
    from cpg_spark.frontends import FRONTENDS

    rows: list[dict] = []
    if spans is None:
        return rows
    for span in spans:
        kind = span["kind"] if isinstance(span, dict) else span.kind
        text = span["text"] if isinstance(span, dict) else span.text
        offset = span["offset"] if isinstance(span, dict) else span.offset
        parser = FRONTENDS.get(kind)
        if parser is None or text is None:
            continue  # non-code spans pass through untouched
        g = parser(doc_id, int(offset), text)
        for n in g.nodes:
            rows.append({"row_kind": "node", **n})
        for e in g.edges:
            rows.append({"row_kind": "edge", **e})
        for m in g.mentions:
            rows.append({
                "row_kind": "mention", "doc_id": m["doc_id"],
                "node_id": m["mention_id"], "name": m["name"],
                "m_kind": m["kind"], "m_base_type": m["base_type"],
                "m_scope_path": m["scope_path"], "m_n_args": m["n_args"],
                "m_n_kwargs": m["n_kwargs"], "m_arg_ids": m["arg_ids"],
                "span_offset": int(offset),
            })
        for s in g.symbols:
            rows.append({
                "row_kind": "symbol", "doc_id": s["doc_id"],
                "node_id": s["decl_id"], "name": s["name"],
                "s_kind": s["kind"], "s_fqn": s["fqn"], "s_record": s["record"],
                "s_module": s["module"], "s_n_params": s["n_params"],
                "s_param_ids": s["param_ids"], "s_param_names": s["param_names"],
                "span_offset": int(offset),
            })
    return rows


def parse_docs(docs: DataFrame) -> DataFrame:
    """docs(doc_id, spans) -> unified parse rows (PARSE_OUT_SCHEMA)."""

    def run(batches):
        for pdf in batches:
            out: list[dict] = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                out.extend(_rows_for_doc(doc_id, spans))
            # object-dtype frame + where(): missing keys must become None
            # (not pandas NaN, which breaks Arrow struct/map conversion);
            # this path is ~2x faster than per-column comprehension
            frame = pd.DataFrame(out, columns=_COLS, dtype=object)
            yield frame.where(frame.notna(), None)

    return docs.mapInPandas(run, schema=PARSE_OUT_SCHEMA)


def split_parse_output(raw: DataFrame):
    """Four logical tables from the unified stream. ``row_kind`` filters
    push down to the parquet scan of the checkpointed stage output."""
    nodes = raw.filter(F.col("row_kind") == "node").select(
        "node_id", "label", "name", "code", "doc_id", "span_offset", "loc",
        "is_inferred", "is_implicit", "argument_index", "props")
    edges = raw.filter(F.col("row_kind") == "edge").select(
        "subj", "pred", "obj", "props", "doc_id")
    mentions = raw.filter(F.col("row_kind") == "mention").select(
        F.col("node_id").alias("mention_id"), F.col("m_kind").alias("kind"),
        "name", F.col("m_base_type").alias("base_type"),
        F.col("m_scope_path").alias("scope_path"), "doc_id",
        F.col("m_n_args").alias("n_args"), F.col("m_n_kwargs").alias("n_kwargs"),
        F.col("m_arg_ids").alias("arg_ids"))
    symbols = raw.filter(F.col("row_kind") == "symbol").select(
        F.col("node_id").alias("decl_id"), F.col("s_kind").alias("kind"),
        "name", F.col("s_fqn").alias("fqn"), F.col("s_record").alias("record"),
        F.col("s_module").alias("module"), "doc_id",
        F.col("s_n_params").alias("n_params"),
        F.col("s_param_ids").alias("param_ids"),
        F.col("s_param_names").alias("param_names"))
    return nodes, edges, mentions, symbols
