"""Compilation-database source connector (SURVEY S4).

Re-derivation of the reference's ``CompilationDatabase.kt`` (parses
``compile_commands.json``; per-file include paths and ``-D`` symbol
definitions feed the C/C++ frontend config) as a Spark source: the JSON
array becomes a DataFrame, the ``command`` / ``arguments`` forms are
normalized, ``-I``/``-D`` options are extracted per translation unit, and
a join against a (path, content) sources table yields the interleaved
docs shape the pipeline consumes plus a per-doc options dimension.

All parsing is JVM-side column work (split / filter / transform) — no
UDFs; at corpus scale the compdb is a dimension table (one row per TU)
and broadcasts into the sources join.

Subset notes vs the reference: shell-quoting in the ``command`` string is
whitespace-split (the reference uses a real shlex; quoted include paths
with spaces are rare in practice and documented unsupported); defines are
carried as metadata for the frontend config — the subset C-family parser
skips preprocessor tokens, matching how it treats in-file ``#define``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_KIND_BY_EXT = {
    "c": "code/cpp", "h": "code/cpp", "cc": "code/cpp", "cpp": "code/cpp",
    "cxx": "code/cpp", "hpp": "code/cpp", "java": "code/java",
    "go": "code/go", "py": "code/python",
}


def read_compilation_database(spark: SparkSession, path: str) -> DataFrame:
    """compile_commands.json -> (file, directory, args, include_dirs,
    defines).  Accepts both schema forms (``command`` string or
    ``arguments`` array, per the clang JSON compilation-database spec)."""
    raw = spark.read.option("multiLine", True).json(path)
    cols = set(raw.columns)
    if "arguments" in cols and "command" in cols:
        args = F.coalesce(F.col("arguments"), F.split(F.col("command"), r"\s+"))
    elif "arguments" in cols:
        args = F.col("arguments")
    else:
        args = F.split(F.col("command"), r"\s+")
    df = raw.select(
        "file", "directory", args.alias("args"),
    )
    inc = F.transform(
        F.filter(F.col("args"), lambda a: a.startswith("-I")),
        lambda a: F.substring(a, 3, 4096),
    )
    defs = F.transform(
        F.filter(F.col("args"), lambda a: a.startswith("-D")),
        lambda a: F.substring(a, 3, 4096),
    )
    return df.select(
        "file", "directory", "args",
        inc.alias("include_dirs"),
        # -DNAME=value -> map entry; bare -DNAME -> value "1" (cpp default)
        F.map_from_entries(F.transform(defs, lambda d: F.struct(
            F.get(F.split(d, "="), 0).alias("key"),
            # F.get (not getItem): bare -DNAME has no '=' element and ANSI
            # mode errors on out-of-bounds getItem
            F.coalesce(F.get(F.split(d, "="), 1), F.lit("1")).alias("value"),
        ))).alias("defines"),
        # absolute path: relative `file` entries resolve against `directory`
        F.when(F.col("file").startswith("/"), F.col("file"))
        .otherwise(F.concat_ws("/", "directory", "file")).alias("abs_path"),
    )


def compdb_docs(compdb: DataFrame, sources: DataFrame,
                path_col: str = "path", text_col: str = "content"):
    """Join the compilation database against a (path, content) sources
    table -> (docs, options): ``docs`` in the interleaved spans shape
    (doc_id = TU path, one code span, kind from the file extension) ready
    for ``parse_docs``; ``options`` the per-doc (include_dirs, defines)
    dimension the frontend config consumes.

    The compdb side is the small one (one row per TU in the build) —
    broadcast; the sources side may be the whole corpus."""
    ext = F.lower(F.element_at(F.split(F.col("abs_path"), r"\."), -1))
    kind = F.coalesce(
        *[F.when(ext == e, F.lit(k)) for e, k in _KIND_BY_EXT.items()],
        F.lit("code/cpp"),
    )
    joined = sources.join(
        F.broadcast(compdb),
        sources[path_col] == compdb["abs_path"],
    )
    docs = joined.select(
        F.col("abs_path").alias("doc_id"),
        F.array(F.struct(
            kind.alias("kind"),
            F.col(text_col).alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(0).alias("offset"),
        )).alias("spans"),
    )
    options = joined.select(
        F.col("abs_path").alias("doc_id"), "include_dirs", "defines",
    )
    return docs, options


def docs_with_defines(docs: DataFrame, options: DataFrame) -> DataFrame:
    """Attach the per-doc ``defines`` map as a docs column so
    ``parse_docs`` expands the symbols during frontend parsing
    (CXXSymbolConfigurationTest / CDT scanner-info defined symbols).
    Left join — docs without a compdb entry parse with no symbols."""
    return docs.join(options.select("doc_id", "defines"), "doc_id", "left")
