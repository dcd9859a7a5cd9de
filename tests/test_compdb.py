"""Compilation-database source (SURVEY S4; reference
CompilationDatabase.kt + its compile_commands.json test resources):
both JSON schema forms parse, -I/-D options extract per TU, and the
joined docs run through the normal parse stage."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from cpg_spark.sources.compdb import compdb_docs, read_compilation_database

COMPDB = [
    {  # `arguments` array form
        "directory": "/src",
        "arguments": ["clang++", "-Iinclude", "-I/usr/inc", "-DDEBUG",
                      "-DMAX=4", "-c", "main.cpp"],
        "file": "main.cpp",
    },
    {  # `command` string form + absolute file
        "directory": "/src/lib",
        "command": "gcc -I/opt/inc -DVERBOSE=0 -c /src/lib/util.c",
        "file": "/src/lib/util.c",
    },
]

SOURCES = [
    ("/src/main.cpp", "int main() { int a = 1; return a; }\n"),
    ("/src/lib/util.c", "int util(int x) { return x; }\n"),
]


@pytest.fixture(scope="module")
def compdb(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("compdb") / "compile_commands.json"
    p.write_text(json.dumps(COMPDB))
    return read_compilation_database(spark, str(p))


def test_options_extracted(compdb):
    rows = {r["file"]: r for r in compdb.collect()}
    m = rows["main.cpp"]
    assert m["include_dirs"] == ["include", "/usr/inc"]
    assert m["defines"] == {"DEBUG": "1", "MAX": "4"}
    assert m["abs_path"] == "/src/main.cpp"
    u = rows["/src/lib/util.c"]
    assert u["include_dirs"] == ["/opt/inc"]
    assert u["defines"] == {"VERBOSE": "0"}
    assert u["abs_path"] == "/src/lib/util.c"


def test_docs_join_and_parse(spark, compdb):
    from cpg_spark.operators.parse import parse_docs, split_parse_output

    sources = spark.createDataFrame(SOURCES, "path string, content string")
    docs, options = compdb_docs(compdb, sources)
    d = {r["doc_id"]: r["spans"] for r in docs.collect()}
    assert set(d) == {"/src/main.cpp", "/src/lib/util.c"}
    assert d["/src/main.cpp"][0]["kind"] == "code/cpp"
    opt = {r["doc_id"]: r for r in options.collect()}
    assert opt["/src/main.cpp"]["defines"]["MAX"] == "4"
    # the docs flow through the normal parse stage
    nodes, edges, _, _ = split_parse_output(parse_docs(docs).persist())
    fns = {r["name"] for r in
           nodes.filter(F.col("label") == "FunctionDeclaration").collect()}
    assert {"main", "util"} <= fns
