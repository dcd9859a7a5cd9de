"""Goto/label compression for LLVM-IR graphs (SURVEY C5).

Re-derives ``cpg-language-llvm/.../passes/CompressLLVMPass.kt:38-160``:
basic-block labels that are the target of EXACTLY ONE GotoStatement get
their block inlined at the goto site — the goto disappears and the label's
CompoundStatement takes its place in the AST.  The reference enforces the
rewrite order IfStatement -> SwitchStatement -> other (so a case's trailing
goto stays a block boundary), and guards against inlining a block into
itself (``node !in flattenAST(targetLabel.subStatement)``).

Spark shape: the rewrite is a function-local AST surgery, so it runs as one
Arrow-batched ``applyInPandas`` cogroup keyed by ``doc_id`` (the same shape
as ``dfg_refine``) emitting a delta stream; applying the delta to the edge
table is a broadcast-sized join because gotos are a tiny fraction of nodes.
No driver loops, no collect.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DELTA_SCHEMA = T.StructType([
    T.StructField("action", T.StringType()),      # retarget | drop_node
    T.StructField("subj", T.LongType()),          # parent (retarget) / node
    T.StructField("obj", T.LongType()),           # old child (goto)
    T.StructField("new_obj", T.LongType()),       # inlined block
    T.StructField("doc_id", T.StringType()),
])


def _compress_doc(doc_id: str, labels: dict, names: dict, props: dict,
                  ast: list[dict]) -> list[dict]:
    """Pure-python kernel over one document's AST edge list."""
    children: dict[str, list[dict]] = {}
    parent_of: dict[str, tuple[str, dict]] = {}
    for e in ast:
        children.setdefault(e["subj"], []).append(e)
        parent_of[e["obj"]] = (e["subj"], e)

    def fn_root(nid: str) -> str | None:
        seen = set()
        while nid in parent_of and nid not in seen:
            seen.add(nid)
            nid = parent_of[nid][0]
            if labels.get(nid) == "FunctionDeclaration":
                return nid
        return None

    # label -> subStatement block, goto fan-in counts (function-scoped keys)
    block_of: dict[tuple, str] = {}
    for nid, lab in labels.items():
        if lab != "LabelStatement":
            continue
        fn = fn_root(nid)
        for e in children.get(nid, []):
            if e["field"] == "subStatement":
                block_of[(fn, names.get(nid))] = e["obj"]
    gotos: dict[tuple, list[str]] = {}
    for nid, lab in labels.items():
        if lab != "GotoStatement":
            continue
        key = (fn_root(nid), props.get(nid))
        gotos.setdefault(key, []).append(nid)
    single = {k: v[0] for k, v in gotos.items()
              if len(v) == 1 and k in block_of}

    def subtree(root: str) -> set:
        out, stack = set(), [root]
        while stack:
            cur = stack.pop()
            if cur in out:
                continue
            out.add(cur)
            stack.extend(e["obj"] for e in children.get(cur, []))
        return out

    # reference order: if-branch gotos, then switch-case gotos, then rest
    def rank(goto_id: str) -> int:
        parent, e = parent_of.get(goto_id, (None, None))
        if e is None:
            return 3
        if e["field"] in ("thenStatement", "elseStatement"):
            return 1
        gp = parent_of.get(parent, (None, None))[0]
        if gp is not None and labels.get(gp) == "SwitchStatement":
            return 2
        return 3

    out: list[dict] = []
    inlined: set[str] = set()
    for key, goto_id in sorted(single.items(),
                               key=lambda kv: (rank(kv[1]), kv[1])):
        block = block_of[key]
        if block in inlined:
            continue
        parent, e = parent_of.get(goto_id, (None, None))
        if parent is None:
            continue
        # cycle guard: don't inline a block into itself
        if goto_id in subtree(block) or parent in subtree(block):
            continue
        # rank 3 (plain compound) only rewrites a TRAILING goto
        # (CompressLLVMPass.kt:148-160)
        if rank(goto_id) == 3:
            sibs = children.get(parent, [])
            last = max(sibs, key=lambda s: int(s.get("index") or 0))
            if last["obj"] != goto_id:
                continue
        out.append({"action": "retarget", "subj": parent, "obj": goto_id,
                    "new_obj": block, "doc_id": doc_id})
        out.append({"action": "drop_node", "subj": goto_id, "obj": None,
                    "new_obj": None, "doc_id": doc_id})
        # the block moved out of its label: detach the old subStatement edge
        lab_parent = parent_of[block][0]
        out.append({"action": "retarget", "subj": lab_parent, "obj": block,
                    "new_obj": None, "doc_id": doc_id})
        inlined.add(block)
    return out


def compress_llvm_delta(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Delta stream for the goto compression; inputs pruned to the columns
    and labels the kernel consults (Goto/Label/If/Switch/Function + AST)."""
    n = (nodes.filter(F.col("label").isin(
            "GotoStatement", "LabelStatement", "IfStatement",
            "SwitchStatement", "FunctionDeclaration", "CompoundStatement"))
         .select("doc_id", "node_id", "label", "name",
                 F.col("props").getItem("target_label").alias("target")))
    e = (edges.filter(F.col("pred") == "AST")
         .select("doc_id", "subj", "obj",
                 F.col("props").getItem("field").alias("field"),
                 F.col("props").getItem("index").alias("index")))

    def run(key, npdf: pd.DataFrame, epdf: pd.DataFrame) -> pd.DataFrame:
        labels = dict(zip(npdf["node_id"], npdf["label"]))
        names = dict(zip(npdf["node_id"], npdf["name"]))
        props = dict(zip(npdf["node_id"], npdf["target"]))
        rows = _compress_doc(key[0], labels, names, props,
                             epdf.to_dict("records"))
        # object dtype: obj/new_obj mix int64 ids with None — default
        # inference would flip them to float64 and corrupt ids > 2^53
        frame = pd.DataFrame(rows, columns=[f.name for f in DELTA_SCHEMA.fields],
                             dtype=object)
        return frame.where(frame.notna(), None)

    return (n.groupBy("doc_id").cogroup(e.groupBy("doc_id"))
            .applyInPandas(run, schema=DELTA_SCHEMA))


def compress_llvm(nodes: DataFrame, edges: DataFrame
                  ) -> tuple[DataFrame, DataFrame]:
    """(nodes', edges') with single-entry goto chains inlined.

    The delta is tiny (bounded by goto count), so applying it is one
    broadcast anti-join + one broadcast lookup join on the edge table —
    no O(edges) shuffle beyond a single pass.
    """
    delta = compress_llvm_delta(nodes, edges).persist()
    drops = delta.filter(F.col("action") == "drop_node").select(
        F.col("subj").alias("node_id"))
    retargets = delta.filter(F.col("action") == "retarget").select(
        F.col("subj").alias("r_subj"), F.col("obj").alias("r_obj"),
        "new_obj")

    nodes2 = nodes.join(F.broadcast(drops), "node_id", "left_anti")
    e2 = (edges.join(
            F.broadcast(retargets),
            (F.col("subj") == F.col("r_subj")) & (F.col("obj") == F.col("r_obj"))
            & (F.col("pred") == F.lit("AST")),
            "left")
          .withColumn("keep", F.col("r_subj").isNull() | F.col("new_obj").isNotNull())
          .withColumn("obj", F.coalesce("new_obj", "obj"))
          .filter(F.col("keep"))
          .drop("r_subj", "r_obj", "new_obj", "keep"))
    # dangling AST/EOG edges pointing at dropped gotos
    e2 = e2.join(F.broadcast(drops.withColumnRenamed("node_id", "obj")),
                 "obj", "left_anti")
    e2 = e2.join(F.broadcast(drops.withColumnRenamed("node_id", "subj")),
                 "subj", "left_anti")
    return nodes2, e2.select(*edges.columns)
