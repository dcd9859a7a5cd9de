"""Constant evaluation vs the reference's value_evaluation/example.cpp
semantics (ValueEvaluator.kt:71-360; ValueEvaluationTest)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cpg_spark.operators.parse import parse_docs, split_parse_output
from cpg_spark.operators.value_eval import evaluate_constants
from cpg_spark.schemas import DOCS_SCHEMA

EXAMPLE_CPP = """\
int main() {
    int b = 1 + 1;
    int a = 1;
    int c = 5 - 2;
    float e = 7.0 / 2;
    int f = 2 * 5;
    int g = -c;
    bool h = 5 < 3;
    bool i = 3 > 2;
}
"""


def test_example_cpp_constants(spark):
    docs = spark.createDataFrame(
        [{"doc_id": "cpp/veval/0001",
          "spans": [{"kind": "code/cpp", "text": EXAMPLE_CPP,
                     "media_ref": None, "offset": 0}]}],
        schema=DOCS_SCHEMA,
    )
    raw = parse_docs(docs).persist()
    nodes, edges, _, _ = split_parse_output(raw)
    vals = evaluate_constants(nodes, edges)
    named = (
        vals.join(nodes.select("node_id", "label", "name"), "node_id")
        .filter(F.col("label") == "VariableDeclaration")
        .select("name", "value", "is_bool")
        .collect()
    )
    got = {r["name"]: (r["value"], r["is_bool"]) for r in named}
    assert got["b"] == (2.0, False)
    assert got["a"] == (1.0, False)
    assert got["c"] == (3.0, False)
    assert got["e"] == (3.5, False)
    assert got["f"] == (10.0, False)
    assert got["g"] == (-3.0, False)
    assert got["h"] == (0.0, True)
    assert got["i"] == (1.0, True)
    raw.unpersist()


def test_ambiguous_write_is_not_constant(spark):
    """`a = 1; a = 2;` — two conflicting defs: the declaration must NOT
    get a constant (conservative projection of the reference's ambiguous
    result set)."""
    src = "int main() {\n int a = 1;\n a = 2;\n int b = 7;\n}\n"
    docs = spark.createDataFrame(
        [{"doc_id": "cpp/veval2/0001",
          "spans": [{"kind": "code/cpp", "text": src, "media_ref": None,
                     "offset": 0}]}],
        schema=DOCS_SCHEMA,
    )
    raw = parse_docs(docs).persist()
    nodes, edges, _, _ = split_parse_output(raw)
    vals = evaluate_constants(nodes, edges)
    named = (
        vals.join(nodes.select("node_id", "label", "name"), "node_id")
        .filter(F.col("label") == "VariableDeclaration")
        .select("name", "value")
        .collect()
    )
    got = {r["name"]: r["value"] for r in named}
    assert got.get("b") == 7.0
    assert "a" not in got
    raw.unpersist()
