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
        # node fields (ids are signed int64 content hashes — cpg_spark.ids)
        T.StructField("node_id", T.LongType(), True),
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
        T.StructField("subj", T.LongType(), True),
        T.StructField("pred", T.StringType(), True),
        T.StructField("obj", T.LongType(), True),
        # mention fields (name shared)
        T.StructField("m_kind", T.StringType(), True),
        T.StructField("m_base_type", T.StringType(), True),
        T.StructField("m_scope_path", T.StringType(), True),
        T.StructField("m_n_args", T.IntegerType(), True),
        T.StructField("m_n_kwargs", T.IntegerType(), True),
        T.StructField("m_arg_ids", T.StringType(), True),  # CSV of int64 ids
        T.StructField("m_arg_types", T.StringType(), True),  # CSV ('' = unknown)
        # symbol fields (name shared)
        T.StructField("s_kind", T.StringType(), True),
        T.StructField("s_fqn", T.StringType(), True),
        T.StructField("s_record", T.StringType(), True),
        T.StructField("s_module", T.StringType(), True),
        T.StructField("s_n_params", T.IntegerType(), True),
        T.StructField("s_param_ids", T.StringType(), True),   # CSV
        T.StructField("s_param_names", T.StringType(), True), # CSV
        # signature detail for overload resolution (CallResolver.java:847-1014
        # subset): defaulted-parameter count, spelled parameter types,
        # variadic flag — null where a frontend does not model signatures
        T.StructField("s_n_defaults", T.IntegerType(), True),
        T.StructField("s_param_types", T.StringType(), True),  # CSV ('' = unknown)
        T.StructField("s_is_variadic", T.BooleanType(), True),
    ]
)

_COLS = [f.name for f in PARSE_OUT_SCHEMA.fields]


def _csv(ids) -> str | None:
    # elements may be int64 ids or strings (type/param-name CSVs); the
    # UDF-side schema keeps ALL list columns as one CSV string (see module
    # docstring) and split_parse_output rebuilds typed arrays JVM-side
    if not ids:
        return None
    return ",".join("" if x is None else str(x) for x in ids)


# sentinel document for relocatable parsing (pre-parse span dedup, SURVEY
# S3 / TranslationManager.kt:184-209 unity-build dedup): \x00 cannot occur
# in real doc ids or module names, so the string-level relocation below can
# never corrupt genuine content
_SENT_MOD = "\x00M"
_SENT_DOC = f"{_SENT_MOD}/{_SENT_MOD}/0000"


def _graph_rows(g, doc_id: str, offset: int) -> list[dict]:
    """PARSE_OUT_SCHEMA row dicts for one span's DocGraph (shared by the
    direct and the relocated paths)."""
    rows: list[dict] = []
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
    # per-span (subj, pred, obj) dedup: doc-scoped content-hash ids can
    # only collide within one span, so the global edge table stays
    # duplicate-free by construction and materialize skips the
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
            "m_arg_types": _csv(m.get("arg_types")),
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
            "s_n_defaults": s.get("n_defaults"),
            "s_param_types": _csv(s.get("param_types")),
            "s_is_variadic": s.get("is_variadic"),
            "span_offset": int(offset),
        })
    return rows


def _module_for_doc(doc_id: str) -> str:
    # the module-derivation rule the py/cpp/java frontends apply
    return doc_id.rsplit("/", 2)[-2] if "/" in doc_id else doc_id


def _relocated_rows(entry, doc_id: str, offset: int) -> list[dict]:
    """Re-key a sentinel-parsed row template to a real (doc_id, offset):
    location-derived ids are re-hashed through the id_log's (path, label)
    keys; sentinel module strings in names/fqns/scope paths are replaced;
    content-derived ids (types, inferred) and the pre-serialized
    props_json pass through untouched (no re-json, no row rebuild — the
    relocation must cost far less than the parse it replaces)."""
    from cpg_spark.ids import node_id as _hash_node_id

    template, id_log = entry
    module = _module_for_doc(doc_id)
    rename = {old: _hash_node_id(doc_id, offset, p, lb)
              for old, (p, lb) in id_log.items()}
    rget = rename.get
    out: list[dict] = []
    for r in template:
        r2 = dict(r)
        r2["doc_id"] = doc_id
        if r2.get("span_offset") is not None:
            r2["span_offset"] = offset
        rk = r2["row_kind"]
        if rk == "edge":
            s = r2["subj"]
            r2["subj"] = rget(s, s)
            o = r2["obj"]
            r2["obj"] = rget(o, o)
        else:
            n = r2["node_id"]
            r2["node_id"] = rget(n, n)
            if rk == "node":
                nm = r2["name"]
                if nm and _SENT_MOD in nm:
                    r2["name"] = nm.replace(_SENT_MOD, module)
            elif rk == "mention":
                sp = r2["m_scope_path"]
                if sp and _SENT_MOD in sp:
                    r2["m_scope_path"] = sp.replace(_SENT_MOD, module)
                ai = r2["m_arg_ids"]
                if ai:
                    # CSV tokens are decimal int64 ids ('' = absent)
                    r2["m_arg_ids"] = ",".join(
                        x if x == "" else str(rget(int(x), x))
                        for x in ai.split(","))
            else:  # symbol
                for fkey in ("s_fqn", "s_module"):
                    v = r2[fkey]
                    if v and _SENT_MOD in v:
                        r2[fkey] = v.replace(_SENT_MOD, module)
                pi = r2["s_param_ids"]
                if pi:
                    r2["s_param_ids"] = ",".join(
                        x if x == "" else str(rget(int(x), x))
                        for x in pi.split(","))
        out.append(r2)
    return out


class _SpanParseCache:
    """Per-partition two-sighting parse cache, keyed by (kind, sha1(text)).

    First sighting of a span parses DIRECTLY under its real (doc, offset)
    — an all-distinct corpus pays zero dedup overhead beyond the content
    shuffle (the round-2 scaling bench showed sentinel-parse+relocate on
    every miss taxed distinct corpora ~40%).  The second sighting parses
    once more under the sentinel document and caches a relocatable row
    template; every further duplicate is a cheap relocation.  With the
    span stream repartitioned on the salted content hash, duplicates
    colocate, so a span duplicated N times parses at most 2×salt-K times
    total instead of N."""

    def __init__(self, cap: int = 256, expr_eog: bool = False,
                 py_parity: bool = False):
        from collections import OrderedDict

        self._d: "OrderedDict" = OrderedDict()
        self._first: set = set()  # sha1 digests of once-seen spans
        self.cap = cap
        self.expr_eog = expr_eog
        self.py_parity = py_parity
        self.parses = 0
        self.hits = 0

    def _parse(self, parser, doc_id, offset, text):
        g = parser(doc_id, offset, text)
        self.parses += 1
        if self.expr_eog:
            # granularity applied BEFORE the relocation template is
            # built, so cached duplicates relocate expression-level
            # edges like any others (one flag value per parse_docs call
            # keeps the cache granularity-homogeneous)
            from cpg_spark.frontends.eog import expand_expression_eog

            expand_expression_eog(g)
        return g

    def rows_for(self, kind: str, text: str, doc_id: str, offset: int):
        import hashlib

        from cpg_spark.frontends import FRONTENDS

        parser = FRONTENDS.get(kind)
        if parser is None:
            return None
        if self.py_parity and kind == "code/python":
            from functools import partial

            parser = partial(parser, parity_mode=True)
        key = (kind, hashlib.sha1(text.encode("utf-8", "replace")).digest())
        ent = self._d.get(key)
        if ent is not None:
            self._d.move_to_end(key)
            self.hits += 1
            return _relocated_rows(ent, doc_id, offset)
        if key in self._first:
            # a real duplicate: build the relocatable template now
            g = self._parse(parser, _SENT_DOC, 0, text)
            ent = (_graph_rows(g, _SENT_DOC, 0), g.id_log)
            self._d[key] = ent
            if len(self._d) > self.cap:
                self._d.popitem(last=False)
            self._first.discard(key)
            return _relocated_rows(ent, doc_id, offset)
        self._first.add(key)
        g = self._parse(parser, doc_id, offset, text)
        return _graph_rows(g, doc_id, offset)


# frontends that consume preprocessor symbol maps (compdb -D defines /
# TranslationConfiguration.symbols — CXXSymbolConfigurationTest)
_SYMBOL_KINDS = {"code/cpp", "code/java"}


def _rows_for_doc(doc_id: str, spans, defines=None,
                  expr_eog: bool = False,
                  py_parity: bool = False) -> list[dict]:
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
        if defines and kind in _SYMBOL_KINDS:
            g = parser(doc_id, int(offset), text, symbols=dict(defines))
        elif py_parity and kind == "code/python":
            # reference-parity gap matrix for the P/R oracle gates
            # (python_frontend parity_mode docstring)
            g = parser(doc_id, int(offset), text, parity_mode=True)
        else:
            g = parser(doc_id, int(offset), text)
        if expr_eog:
            # expression-level EOG rewrite — the default since round 4
            # (EvaluationOrderGraphPass.java:917-951 runs at expression
            # granularity); statement-level behind expr_eog=False
            from cpg_spark.frontends.eog import expand_expression_eog

            expand_expression_eog(g)
        rows.extend(_graph_rows(g, doc_id, int(offset)))
    return rows


def parse_docs(docs: DataFrame, target_partitions: int | None = None,
               dedup_spans: bool = False, expr_eog: bool = True,
               py_parity: bool = False) -> DataFrame:
    """docs(doc_id, spans) -> unified parse rows (PARSE_OUT_SCHEMA).

    The docs checkpoint is small on disk, so a naive scan coalesces into
    a handful of input partitions and the (CPU-bound) parse would run on
    as few cores; an explicit doc_id-hash repartition to cluster
    parallelism restores full fan-out — the docs rows are tiny, the
    shuffle is cheap, the parse is not.

    ``dedup_spans=True`` (SURVEY S3, the unity-build dedup of
    TranslationManager.kt:184-209): the span stream is repartitioned on
    ``xxhash64(kind, text)`` so identical spans colocate, each distinct
    span parses ONCE under a sentinel document, and every occurrence is
    emitted by re-keying the cached graph (content-hash id relocation) —
    on duplicate-heavy corpora (vendored files, headers, boilerplate) this
    is the single biggest parse-cost lever.  Output is row-for-row
    identical to the direct path."""

    if target_partitions is None:
        try:
            target_partitions = docs.sparkSession.sparkContext.defaultParallelism * 2
        except Exception:
            target_partitions = None
    # per-doc symbol maps make identical span text parse DIFFERENTLY, so
    # the content-hash dedup cache would be wrong — bypass it
    if (dedup_spans and not docs.isStreaming
            and "defines" not in docs.columns):
        # the expr-EOG rewrite composes with relocation: granularity is
        # applied before the relocation template is built, and one flag
        # value per call keeps every cache entry homogeneous
        return _parse_docs_dedup(docs, target_partitions, expr_eog,
                                 py_parity=py_parity)
    if target_partitions and not docs.isStreaming:
        docs = docs.repartition(target_partitions, "doc_id")

    def run(batches):
        # yield in bounded chunks: accumulating a whole 2048-doc input
        # batch (~700k row dicts) before converting turns linear parse
        # into superlinear GC churn; ~64k-row frames keep workers flat
        out: list[dict] = []
        for pdf in batches:
            # optional per-doc preprocessor symbols (compdb_docs options
            # joined in as a `defines` map column); absent for plain docs
            defs = (pdf["defines"] if "defines" in pdf.columns
                    else [None] * len(pdf))
            for doc_id, spans, defines in zip(pdf["doc_id"], pdf["spans"],
                                              defs):
                out.extend(_rows_for_doc(doc_id, spans, defines,
                                         expr_eog=expr_eog,
                                         py_parity=py_parity))
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


def _parse_docs_dedup(docs: DataFrame,
                      target_partitions: int | None,
                      expr_eog: bool = False,
                      py_parity: bool = False) -> DataFrame:
    """Content-hash-partitioned span stream -> memoized parse + relocate."""
    spans = docs.select(
        "doc_id",
        F.explode(F.expr(
            "transform(spans, (s, i) -> struct("
            "s.kind as kind, s.text as text, s.offset as offset, "
            "CASE WHEN i = 0 THEN CAST(NULL AS INT) "
            "ELSE spans[i-1].offset END as prev_offset))"
        )).alias("s"),
    ).select("doc_id", "s.kind", "s.text", "s.offset", "s.prev_offset")
    if target_partitions:
        # salt the content key: a span duplicated across the whole corpus
        # would otherwise land on ONE core (the classic hot-key skew —
        # measured 4x slower than no dedup on a header-heavy corpus).
        # With salt K each distinct span parses at most K times while its
        # occurrences relocate on K cores — K bounds the redundancy, the
        # corpus size doesn't.
        k = 8
        spans = spans.repartition(
            target_partitions,
            F.xxhash64("kind", "text"),
            F.pmod(F.xxhash64("doc_id"), F.lit(k)),
        )

    def run(batches):
        cache = _SpanParseCache(expr_eog=expr_eog, py_parity=py_parity)
        out: list[dict] = []
        for pdf in batches:
            for doc_id, kind, text, offset, prev in zip(
                    pdf["doc_id"], pdf["kind"], pdf["text"], pdf["offset"],
                    pdf["prev_offset"]):
                # span-sequence invariant, enforced in-flight like the
                # direct path (adjacent-pair check survives the explode)
                if (prev is not None and offset is not None
                        and offset <= prev):
                    raise ValueError(
                        f"span-sequence invariant violated in doc {doc_id}: "
                        f"offset {offset} after {prev}")
                if text is None or offset is None:
                    continue
                rows = cache.rows_for(kind, str(text), doc_id, int(offset))
                if rows is None:
                    continue  # non-code span
                out.extend(rows)
                if len(out) >= 65536:
                    frame = pd.DataFrame(out, columns=_COLS, dtype=object)
                    yield frame.where(frame.notna(), None)
                    out = []
        if out:
            frame = pd.DataFrame(out, columns=_COLS, dtype=object)
            yield frame.where(frame.notna(), None)

    return spans.mapInPandas(run, schema=PARSE_OUT_SCHEMA)


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


def _split_csv_ids(col: str):
    """Id CSVs -> array<bigint>.  try_cast keeps '' placeholders as null
    under ANSI mode (Spark 4 default) instead of throwing."""
    return F.when(
        F.col(col).isNotNull(),
        F.expr(f"transform(split({col}, ','), x -> try_cast(x AS BIGINT))"),
    )


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
        _split_csv_ids("m_arg_ids").alias("arg_ids"),
        _split_csv("m_arg_types").alias("arg_types"))
    symbols = raw.filter(F.col("row_kind") == "symbol").select(
        F.col("node_id").alias("decl_id"), F.col("s_kind").alias("kind"),
        "name", F.col("s_fqn").alias("fqn"), F.col("s_record").alias("record"),
        F.col("s_module").alias("module"), "doc_id",
        F.col("s_n_params").alias("n_params"),
        _split_csv_ids("s_param_ids").alias("param_ids"),
        _split_csv("s_param_names").alias("param_names"),
        F.col("s_n_defaults").alias("n_defaults"),
        _split_csv("s_param_types").alias("param_types"),
        F.col("s_is_variadic").alias("is_variadic"))
    return nodes, edges, mentions, symbols
