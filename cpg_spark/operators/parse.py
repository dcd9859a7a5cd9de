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

Performance-critical detail: the UDF-side schema is **all primitive
columns** — props as a JSON string, id arrays as CSV, location as four
ints.  Map/struct/array construction through pandas->Arrow is 10-30x
slower per row than strings; the typed columns (map<string,string> props,
loc struct, arrays) are rebuilt JVM-side in :func:`split_parse_output`
with ``from_json``/``split``/``struct`` — inside whole-stage codegen.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
        T.StructField("loc_sl", T.IntegerType(), True),
        T.StructField("loc_sc", T.IntegerType(), True),
        T.StructField("loc_el", T.IntegerType(), True),
        T.StructField("loc_ec", T.IntegerType(), True),
        T.StructField("is_inferred", T.BooleanType(), True),
        T.StructField("is_implicit", T.BooleanType(), True),
        T.StructField("argument_index", T.IntegerType(), True),
        T.StructField("props_json", T.StringType(), True),
        # edge fields (props_json/doc_id shared)
        T.StructField("subj", T.StringType(), True),
        T.StructField("pred", T.StringType(), True),
        T.StructField("obj", T.StringType(), True),
        # mention fields (name shared)
        T.StructField("m_kind", T.StringType(), True),
        T.StructField("m_base_type", T.StringType(), True),
        T.StructField("m_scope_path", T.StringType(), True),
        T.StructField("m_n_args", T.IntegerType(), True),
        T.StructField("m_n_kwargs", T.IntegerType(), True),
        T.StructField("m_arg_ids", T.StringType(), True),  # CSV of hex ids
        # symbol fields (name shared)
        T.StructField("s_kind", T.StringType(), True),
        T.StructField("s_fqn", T.StringType(), True),
        T.StructField("s_record", T.StringType(), True),
        T.StructField("s_module", T.StringType(), True),
        T.StructField("s_n_params", T.IntegerType(), True),
        T.StructField("s_param_ids", T.StringType(), True),   # CSV
        T.StructField("s_param_names", T.StringType(), True), # CSV
    ]
)

_COLS = [f.name for f in PARSE_OUT_SCHEMA.fields]


def _csv(ids) -> str | None:
    if not ids:
        return None
    return ",".join(ids)


def _rows_for_doc(doc_id: str, spans) -> list[dict]:
    # imported lazily so the workers pick up the shipped package
    from cpg_spark.frontends import FRONTENDS

    rows: list[dict] = []
    if spans is None:
        return rows
    # span-sequence invariant (BASELINE input_hint): offsets strictly
    # increasing in array order; enforced in-flight (zero extra jobs —
    # the former driver-side validation pass cost a full corpus scan)
    prev = None
    for span in spans:
        off = span["offset"] if isinstance(span, dict) else span.offset
        if prev is not None and off is not None and off <= prev:
            raise ValueError(
                f"span-sequence invariant violated in doc {doc_id}: "
                f"offset {off} after {prev}")
        if off is not None:
            prev = off
    for span in spans:
        kind = span["kind"] if isinstance(span, dict) else span.kind
        text = span["text"] if isinstance(span, dict) else span.text
        offset = span["offset"] if isinstance(span, dict) else span.offset
        parser = FRONTENDS.get(kind)
        if parser is None or text is None:
            continue  # non-code spans pass through untouched
        g = parser(doc_id, int(offset), text)
        for n in g.nodes:
            loc = n.get("loc")
            rows.append({
                "row_kind": "node", "doc_id": n["doc_id"],
                "node_id": n["node_id"], "label": n["label"],
                "name": n["name"], "code": n["code"],
                "span_offset": n["span_offset"],
                "loc_sl": loc["start_line"] if loc else None,
                "loc_sc": loc["start_col"] if loc else None,
                "loc_el": loc["end_line"] if loc else None,
                "loc_ec": loc["end_col"] if loc else None,
                "is_inferred": n["is_inferred"],
                "is_implicit": n["is_implicit"],
                "argument_index": n["argument_index"],
                "props_json": json.dumps(n["props"]) if n["props"] else None,
            })
        # per-doc (subj, pred, obj) dedup here makes the global edge table
        # duplicate-free by construction (doc-scoped content-hash ids can
        # only collide within one document) — materialize then skips the
        # full-corpus edge shuffle
        seen_e: set = set()
        for e in g.edges:
            key = (e["subj"], e["pred"], e["obj"])
            if key in seen_e:
                continue
            seen_e.add(key)
            rows.append({
                "row_kind": "edge", "doc_id": e["doc_id"],
                "subj": e["subj"], "pred": e["pred"], "obj": e["obj"],
                "props_json": json.dumps(e["props"]) if e["props"] else None,
            })
        for m in g.mentions:
            rows.append({
                "row_kind": "mention", "doc_id": m["doc_id"],
                "node_id": m["mention_id"], "name": m["name"],
                "m_kind": m["kind"], "m_base_type": m["base_type"],
                "m_scope_path": m["scope_path"], "m_n_args": m["n_args"],
                "m_n_kwargs": m["n_kwargs"],
                "m_arg_ids": _csv(m["arg_ids"]),
                "span_offset": int(offset),
            })
        for s in g.symbols:
            rows.append({
                "row_kind": "symbol", "doc_id": s["doc_id"],
                "node_id": s["decl_id"], "name": s["name"],
                "s_kind": s["kind"], "s_fqn": s["fqn"], "s_record": s["record"],
                "s_module": s["module"], "s_n_params": s["n_params"],
                "s_param_ids": _csv(s["param_ids"]),
                "s_param_names": _csv(s["param_names"]),
                "span_offset": int(offset),
            })
    return rows


def parse_docs(docs: DataFrame, target_partitions: int | None = None) -> DataFrame:
    """docs(doc_id, spans) -> unified parse rows (PARSE_OUT_SCHEMA).

    The docs checkpoint is small on disk, so a naive scan coalesces into
    a handful of input partitions and the (CPU-bound) parse would run on
    as few cores; an explicit doc_id-hash repartition to cluster
    parallelism restores full fan-out — the docs rows are tiny, the
    shuffle is cheap, the parse is not."""

    if target_partitions is None:
        try:
            target_partitions = docs.sparkSession.sparkContext.defaultParallelism * 2
        except Exception:
            target_partitions = None
    if target_partitions and not docs.isStreaming:
        docs = docs.repartition(target_partitions, "doc_id")

    def run(batches):
        # yield in bounded chunks: accumulating a whole 2048-doc input
        # batch (~700k row dicts) before converting turns linear parse
        # into superlinear GC churn; ~64k-row frames keep workers flat
        out: list[dict] = []
        for pdf in batches:
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                out.extend(_rows_for_doc(doc_id, spans))
                if len(out) >= 65536:
                    frame = pd.DataFrame(out, columns=_COLS, dtype=object)
                    yield frame.where(frame.notna(), None)
                    out = []
        if out:
            # object-dtype frame + where(): missing keys must become None
            # (not pandas NaN, which breaks Arrow conversion of int cols)
            frame = pd.DataFrame(out, columns=_COLS, dtype=object)
            yield frame.where(frame.notna(), None)

    return docs.mapInPandas(run, schema=PARSE_OUT_SCHEMA)


def _props_col():
    return F.coalesce(
        F.from_json(F.col("props_json"), "map<string,string>"),
        F.expr("map()"),
    ).alias("props")


def _loc_col():
    return F.when(
        F.col("loc_sl").isNotNull(),
        F.struct(
            F.col("loc_sl").alias("start_line"),
            F.col("loc_sc").alias("start_col"),
            F.col("loc_el").alias("end_line"),
            F.col("loc_ec").alias("end_col"),
        ),
    ).alias("loc")


def _split_csv(col: str):
    return F.when(F.col(col).isNotNull(), F.split(F.col(col), ","))


def split_parse_output(raw: DataFrame):
    """Four logical typed tables from the unified primitive stream.
    ``row_kind`` filters and column pruning push down to the parquet scan
    of the checkpointed stage output; map/struct/array reconstruction is
    whole-stage-codegen JVM work."""
    nodes = raw.filter(F.col("row_kind") == "node").select(
        "node_id", "label", "name", "code", "doc_id", "span_offset",
        _loc_col(), "is_inferred", "is_implicit", "argument_index",
        _props_col())
    edges = raw.filter(F.col("row_kind") == "edge").select(
        "subj", "pred", "obj", _props_col(), "doc_id")
    mentions = raw.filter(F.col("row_kind") == "mention").select(
        F.col("node_id").alias("mention_id"), F.col("m_kind").alias("kind"),
        "name", F.col("m_base_type").alias("base_type"),
        F.col("m_scope_path").alias("scope_path"), "doc_id",
        F.col("m_n_args").alias("n_args"), F.col("m_n_kwargs").alias("n_kwargs"),
        _split_csv("m_arg_ids").alias("arg_ids"))
    symbols = raw.filter(F.col("row_kind") == "symbol").select(
        F.col("node_id").alias("decl_id"), F.col("s_kind").alias("kind"),
        "name", F.col("s_fqn").alias("fqn"), F.col("s_record").alias("record"),
        F.col("s_module").alias("module"), "doc_id",
        F.col("s_n_params").alias("n_params"),
        _split_csv("s_param_ids").alias("param_ids"),
        _split_csv("s_param_names").alias("param_names"))
    return nodes, edges, mentions, symbols
