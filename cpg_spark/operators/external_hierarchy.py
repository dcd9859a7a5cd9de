"""External (JDK) type-hierarchy resolution.

Re-derivation of the reference's ``JavaExternalTypeHierarchyResolver``
(``core/passes/JavaExternalTypeHierarchyResolver.java:44-80``): for every
record supertype name that does not resolve to a source RecordDeclaration,
the reference reflectively loads the JDK class and walks
``getSuperclass()``/``getInterfaces()`` transitively, attaching the
discovered ancestry to the type.  There is no JVM classpath to reflect
over in a Python pipeline, so the equivalent knowledge ships as a small
static dimension table of the common ``java.lang``/``java.util``/
``java.io`` hierarchy (simple names — the source-level supertype
spellings our Java frontend records).

Spark shape: the dimension is a literal frame (≤ ~50 rows) with node ids
precomputed at import time; everything else is broadcast semi-joins —
no driver collect, no UDF.  Triggered JDK types materialize as
*implicit* RecordDeclarations (``is_inferred=True`` so cross-document
copies collapse at materialize, like link-stage inference) whose
record→Type ``SUPER_TYPE`` edges feed the existing
:func:`cpg_spark.operators.hierarchy.supertype_record_closure`
unchanged — ``class A extends ArrayList`` then closes over
AbstractList/AbstractCollection/List/Collection/Iterable/Object exactly
like an in-source hierarchy.  Type→Type SUPER_TYPE is deliberately NOT
used here: in this engine that edge shape means *typedef alias* and is
merged by the canonicalization CC (cpg_spark/operators/canonicalize.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cpg_spark.ids import inferred_id, type_id

# direct supertypes (superclass + interfaces), simple names — the subset
# of the JDK the reference's reflection walk most commonly surfaces in
# its own tests/corpora.  Order within a list: superclass first.
JDK_DIRECT_SUPERS: dict[str, list[str]] = {
    "Object": [],
    "Throwable": ["Object"],
    "Exception": ["Throwable"],
    "RuntimeException": ["Exception"],
    "IllegalArgumentException": ["RuntimeException"],
    "IllegalStateException": ["RuntimeException"],
    "NullPointerException": ["RuntimeException"],
    "IndexOutOfBoundsException": ["RuntimeException"],
    "UnsupportedOperationException": ["RuntimeException"],
    "IOException": ["Exception"],
    "FileNotFoundException": ["IOException"],
    "Error": ["Throwable"],
    "AssertionError": ["Error"],
    "Number": ["Object"],
    "Integer": ["Number", "Comparable"],
    "Long": ["Number", "Comparable"],
    "Double": ["Number", "Comparable"],
    "Float": ["Number", "Comparable"],
    "Short": ["Number", "Comparable"],
    "Byte": ["Number", "Comparable"],
    "Boolean": ["Object", "Comparable"],
    "Character": ["Object", "Comparable"],
    "String": ["Object", "CharSequence", "Comparable"],
    "StringBuilder": ["Object", "CharSequence"],
    "Comparable": [],
    "CharSequence": [],
    "Runnable": [],
    "Iterable": [],
    "Collection": ["Iterable"],
    "List": ["Collection"],
    "Set": ["Collection"],
    "Queue": ["Collection"],
    "Deque": ["Queue"],
    "Map": [],
    "AbstractCollection": ["Object", "Collection"],
    "AbstractList": ["AbstractCollection", "List"],
    "ArrayList": ["AbstractList", "List"],
    "LinkedList": ["AbstractList", "List", "Deque"],
    "AbstractSet": ["AbstractCollection", "Set"],
    "HashSet": ["AbstractSet", "Set"],
    "TreeSet": ["AbstractSet", "Set"],
    "AbstractMap": ["Object", "Map"],
    "HashMap": ["AbstractMap", "Map"],
    "TreeMap": ["AbstractMap", "Map"],
    "Thread": ["Object", "Runnable"],
}


def _ancestors(name: str) -> set[str]:
    out: set[str] = set()
    stack = list(JDK_DIRECT_SUPERS.get(name, ()))
    while stack:
        n = stack.pop()
        if n in out:
            continue
        out.add(n)
        stack.extend(JDK_DIRECT_SUPERS.get(n, ()))
    return out


def _rec_id(name: str) -> int:
    return inferred_id("RecordDeclaration", name, container="jdk")


# literal rows, ids precomputed at import (the table is static):
#  links:   one row per DIRECT (sub -> sup) JDK edge
#  closure: one row per TRANSITIVE (name -> ancestor) pair, used to find
#           every table entry reachable from a triggered name
_LINK_ROWS = [
    {"jdk_sub": sub, "jdk_sub_rec": _rec_id(sub),
     "jdk_sup": sup, "jdk_sup_type": type_id(sup)}
    for sub, sups in JDK_DIRECT_SUPERS.items()
    for sup in sups
]
_CLOSURE_ROWS = [
    {"jdk_name": n, "jdk_reach": a}
    for n in JDK_DIRECT_SUPERS
    for a in (_ancestors(n) | {n})
]


def _null_loc():
    return F.lit(None).cast(
        "struct<start_line:int,start_col:int,end_line:int,end_col:int>")


def external_jdk_hierarchy(nodes: DataFrame, edges: DataFrame):
    """(implicit_nodes, implicit_edges) extending record SUPER_TYPE edges
    whose target is a known JDK type with that type's full JDK ancestry.

    Trigger = a corpus record's supertype NAME that (a) resolves to no
    source RecordDeclaration anywhere (the in-source case belongs to
    TypeHierarchyResolver / supertype_record_closure) and (b) is in the
    static JDK table.  Everything reachable from a trigger materializes:
    implicit RecordDeclaration nodes, Type nodes for their supertype
    spellings, and record→Type SUPER_TYPE edges."""
    from cpg_spark.operators.hierarchy import record_super_pairs

    spark = nodes.sparkSession
    links = spark.createDataFrame(
        _LINK_ROWS,
        "jdk_sub string, jdk_sub_rec bigint, jdk_sup string, "
        "jdk_sup_type bigint")
    closure = spark.createDataFrame(_CLOSURE_ROWS,
                                    "jdk_name string, jdk_reach string")

    declared = nodes.filter(F.col("label") == "RecordDeclaration").select(
        F.col("name").alias("super_name")).distinct()
    triggers = (
        record_super_pairs(nodes, edges)
        .select("super_name").distinct()
        .join(declared, "super_name", "left_anti")
        .join(F.broadcast(closure.select(
            F.col("jdk_name").alias("super_name")).distinct()),
            "super_name", "left_semi")
        .select(F.col("super_name").alias("jdk_name"))
    )
    # every table entry reachable from a trigger (incl. the trigger) —
    # the set the reflection walk would have visited
    reach = (
        F.broadcast(triggers).join(closure, "jdk_name")
        .select(F.col("jdk_reach").alias("jdk_sub")).distinct()
    )
    out_links = links.join(F.broadcast(reach), "jdk_sub", "left_semi")

    rec_ids = spark.createDataFrame(
        [{"name": n, "nid": _rec_id(n)} for n in JDK_DIRECT_SUPERS],
        "name string, nid bigint")
    # both sides of every emitted link become implicit records — roots
    # with no supertypes of their own (Object, bare interfaces) appear
    # only on the sup side, and the closure's "supertype resolves to a
    # known record" gate must pass for them too
    rec_names = (
        out_links.select(F.col("jdk_sub").alias("name"))
        .unionByName(out_links.select(F.col("jdk_sup").alias("name")))
        .distinct()
    )
    rec_nodes = (
        rec_names.join(F.broadcast(rec_ids), "name")
        .select("name", F.col("nid").alias("node_id"))
        .select(
            "node_id", F.lit("RecordDeclaration").alias("label"), "name",
            F.lit(None).cast("string").alias("code"),
            F.lit(None).cast("string").alias("doc_id"),
            F.lit(None).cast("int").alias("span_offset"),
            _null_loc().alias("loc"),
            F.lit(True).alias("is_inferred"),
            F.lit(True).alias("is_implicit"),
            F.lit(None).cast("int").alias("argument_index"),
            F.create_map(F.lit("kind"), F.lit("class"),
                         F.lit("origin"), F.lit("jdk")).alias("props"),
        )
    )
    type_nodes = (
        out_links.select(F.col("jdk_sup").alias("name"),
                         F.col("jdk_sup_type").alias("node_id"))
        .dropDuplicates(["node_id"])
        .select(
            "node_id", F.lit("Type").alias("label"), "name",
            F.col("name").alias("code"),
            F.lit(None).cast("string").alias("doc_id"),
            F.lit(None).cast("int").alias("span_offset"),
            _null_loc().alias("loc"),
            F.lit(True).alias("is_inferred"),
            F.lit(True).alias("is_implicit"),
            F.lit(None).cast("int").alias("argument_index"),
            F.create_map().cast("map<string,string>").alias("props"),
        )
    )
    sup_edges = out_links.select(
        F.col("jdk_sub_rec").alias("subj"),
        F.lit("SUPER_TYPE").alias("pred"),
        F.col("jdk_sup_type").alias("obj"),
        F.create_map().cast("map<string,string>").alias("props"),
        F.lit(None).cast("string").alias("doc_id"),
    )
    return rec_nodes.unionByName(type_nodes), sup_edges
