"""Real-file corpus source: turn a tree of source files on disk into the
interleaved docs shape for robustness measurement.

The round-4 problem-rate gate (VERDICT item 1) needs a corpus of REAL
programs — not the embedded fixtures the parsers were grown against — to
measure how often arbitrary code degrades to Problem/gap nodes.  The
default corpus is the reference repository's own test resources
(~230 Java/C/C++/Go/Python programs under ``src/test/resources``, the
same programs its 141 JUnit classes parse), read at query time.

Scale shape: ``spark.read.text(..., wholetext=True)`` is a distributed
file scan (one task per file group, no driver-side reads); the file list
is discovered driver-side with ``os.walk`` (cheap metadata-only pass —
the same role as the reference's ``Files.find`` discovery scan,
TranslationManager.kt:162-172).  On a real cluster the root would be an
object-store prefix and discovery a catalog/listing call.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_ROOT = "/root/reference"

_KIND_BY_EXT = {
    ".java": "code/java",
    ".cpp": "code/cpp",
    ".cc": "code/cpp",
    ".cxx": "code/cpp",
    ".c": "code/cpp",
    ".h": "code/cpp",
    ".hpp": "code/cpp",
    ".go": "code/go",
    ".py": "code/python",
}


def discover_source_files(root: str = DEFAULT_ROOT,
                          subdir_filter: str = "/resources/",
                          exts: tuple = tuple(_KIND_BY_EXT)) -> list[str]:
    """Deterministic (sorted) file list under ``root`` whose path
    contains ``subdir_filter`` and whose extension is parseable."""
    out = []
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            p = os.path.join(dirpath, fn)
            if subdir_filter not in p:
                continue
            if os.path.splitext(fn)[1] in exts:
                out.append(p)
    return sorted(out)


def real_file_docs(spark: SparkSession, root: str = DEFAULT_ROOT,
                   subdir_filter: str = "/resources/") -> DataFrame:
    """Docs table (doc_id = path relative to root, one code span per
    file) over every parseable source file under ``root`` — the
    measurement corpus for the problem-rate gate.  Raises when the root
    is missing (a silent empty corpus would fake a perfect rate)."""
    files = discover_source_files(root, subdir_filter)
    if not files:
        raise FileNotFoundError(
            f"no source files under {root} (filter {subdir_filter!r})")
    kind = F.coalesce(
        *[F.when(F.col("path").endswith(e), F.lit(k))
          for e, k in _KIND_BY_EXT.items()])
    return (
        spark.read.text(files, wholetext=True)
        .select(F.input_file_name().alias("uri"), F.col("value"))
        # input_file_name returns a file: URI; doc_id is the root-relative
        # path so goldens don't depend on the mount point
        .select(
            F.regexp_replace(
                F.regexp_replace("uri", "^file:(//)?", ""),
                "^" + root.rstrip("/") + "/", "").alias("path"),
            F.col("value"))
        .select(
            F.col("path").alias("doc_id"),
            F.array(F.struct(
                kind.alias("kind"),
                F.col("value").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )).alias("spans"),
        )
    )
