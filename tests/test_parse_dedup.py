"""Pre-parse span dedup (SURVEY S3; TranslationManager.kt:184-209 unity
build): identical spans parse once and relocate to every occurrence, with
output row-for-row identical to the direct parse path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cpg_spark.operators.parse import (
    _SpanParseCache,
    parse_docs,
    split_parse_output,
)
from cpg_spark.schemas import DOCS_SCHEMA
from cpg_spark.synth import fixture_docs

PY_SRC = "def dup(a, b):\n    c = a + b\n    return c\n"


def _rows(df):
    return sorted(tuple("<null>" if v is None else str(v) for v in r)
                  for r in df.collect())


def test_dedup_output_identical_to_direct(spark):
    """The relocation path must be bit-identical to direct parsing for
    the whole multi-language fixture corpus."""
    docs = fixture_docs(spark, langs=("python", "go", "java", "cpp"))
    direct = _rows(parse_docs(docs))
    dedup = _rows(parse_docs(docs, dedup_spans=True))
    assert direct == dedup


def test_duplicated_span_parses_at_most_twice():
    """N occurrences of one span -> at most TWO frontend invocations
    (first sighting direct, second builds the relocatable template, the
    rest relocate); a distinct span parses exactly once with no
    sentinel/template overhead."""
    cache = _SpanParseCache()
    for i in range(6):
        rows = cache.rows_for("code/python", PY_SRC, f"py/d{i}/0001", 0)
        assert rows
    assert cache.parses == 2 and cache.hits == 4
    cache.rows_for("code/python", "x = 1\n", "py/solo/0001", 0)
    assert cache.parses == 3  # distinct span: one direct parse


def test_duplicate_spans_get_distinct_ids(spark):
    docs = spark.createDataFrame(
        [{"doc_id": f"py/dup{i}/0001",
          "spans": [{"kind": "code/python", "text": PY_SRC,
                     "media_ref": None, "offset": 0}]}
         for i in range(4)],
        schema=DOCS_SCHEMA)
    raw = parse_docs(docs, dedup_spans=True).persist()
    nodes, edges, _, symbols = split_parse_output(raw)
    fn = nodes.filter((F.col("label") == "FunctionDeclaration")
                      & (F.col("name") == "dup"))
    rows = fn.select("node_id", "doc_id").collect()
    assert len(rows) == 4
    assert len({r["node_id"] for r in rows}) == 4  # relocated, not shared
    # module-sentinel replacement reached the symbol table
    mods = {r["module"] for r in symbols.filter(F.col("name") == "dup")
            .select("module").collect()}
    assert mods == {f"dup{i}" for i in range(4)}
    raw.unpersist()


def test_invariant_enforced_in_dedup_path(spark):
    docs = spark.createDataFrame(
        [{"doc_id": "py/bad/0001",
          "spans": [
              {"kind": "code/python", "text": "a = 1\n", "media_ref": None,
               "offset": 10},
              {"kind": "code/python", "text": "b = 2\n", "media_ref": None,
               "offset": 5}]}],
        schema=DOCS_SCHEMA)
    with pytest.raises(Exception, match="span-sequence invariant"):
        parse_docs(docs, dedup_spans=True).count()
