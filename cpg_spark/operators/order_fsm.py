"""DFA order evaluation (typestate checking) over the EOG.

Re-derivation of the reference's order-analysis FSM
(``cpg-analysis/.../analysis/fsm/DFAOrderEvaluator.kt:58-394`` with
``DFA.kt:101-118`` transition semantics): a user-supplied DFA describes
the allowed call order on an object ("entity"), e.g.
``create(), init(), (start(), process()*, finish())+, reset()?`` for a
cipher; the evaluator walks every execution path of the EOG, tracking
one FSM marking per (path, base-variable), and reports

* ``wrong_order``   — a relevant call with no DFA transition from the
  current state (``actionMissingTransitionForNode``), and
* ``incomplete``    — a path terminating with the FSM in a
  non-accepting state (``actionNonAcceptingTermination``).

Reference mechanics preserved:

* branch points split the EOG path id (suffix ``0``/``1``/…) and clone
  the per-base FSM marking for each branch
  (``DFAOrderEvaluator.kt:299-345`` getNextNodes),
* loops terminate via (node, FSM-marking) snapshots
  (``getStateSnapshot``, ``:377-393``),
* ``UNREACHABLE`` EOG edges are skipped (``eliminateUnreachableCode``,
  composed here with :mod:`cpg_spark.operators.unreachable`),
* after a transition, ``ε`` edges are followed greedily
  (``DFA.kt:makeTransitionWithOp``),
* a base that already broke the order is not re-reported on the same
  path (``stopOnWrongBase`` / wrongBases, ``:144-149``).

Spark shape: the walk is function-local, so the operator is one
``applyInPandas`` grouped by ``doc_id`` — the same zero-cross-partition
pattern as the flow-sensitive DFG refinement (SURVEY §2.7 C3), with the
pruned node columns riding the same shuffle as pseudo edge rows (a
single grouped exchange, no node-side cogroup).  The DFA spec and
entity name are tiny Python literals captured by the UDF closure.

DFA spec format::

    {"start": "q1",
     "accepting": {"q3"},
     "edges": [("q1", "start", "q2"), ("q2", "finish", "q3"),
               ("q2", EPSILON, "q2x")]}
"""

from __future__ import annotations

from collections import defaultdict

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EPSILON = "ε"

_FN_LABELS = ("FunctionDeclaration", "MethodDeclaration",
              "ConstructorDeclaration")

VERDICT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("function", T.StringType(), True),
    T.StructField("base", T.StringType(), True),
    T.StructField("n_ops", T.LongType(), True),
    T.StructField("everything_ok", T.BooleanType(), True),
    T.StructField("reason", T.StringType(), True),
])


def to_dot(dfa: dict, base: str | None = None,
           state_order: list | None = None) -> str:
    """DOT rendering of a DFA spec — byte-identical to the reference's
    ``DFA.toDotString()`` (DFA.kt:76-95; FSMTest testFSMDotFile):
    start marker ``"" -> qstart``, accepting states as doublecircles,
    one labeled edge per transition (labels ``base.op`` when ``base``
    is given, matching Edge.toDotLabel)."""
    if state_order is None:
        seen = [dfa["start"]]
        for s, _, t in dfa["edges"]:
            for q in (s, t):
                if q not in seen:
                    seen.append(q)
        state_order = seen
    head = 'digraph fsm {\n\t"" [shape=point];\n'
    edges = ""
    for q in state_order:
        shape = ("doublecircle" if q in dfa["accepting"] else "circle")
        head += f"\t{q} [shape={shape}];\n"
        if q == dfa["start"]:
            edges += f'\t"" -> {q};\n'
        for s, op, t in dfa["edges"]:
            if s != q:
                continue
            label = f"{base}.{op}" if base else op
            edges += f'\t{s} -> {t} [label="{label}"];\n'
    return head + edges + "}"


def _transitions(dfa: dict) -> dict:
    trans = {}
    for src, op, dst in dfa["edges"]:
        trans[(src, op)] = dst
    return trans


def _step(trans: dict, state: str, op: str) -> str | None:
    """One DFA transition + greedy ε-following (DFA.kt:101-118)."""
    nxt = trans.get((state, op))
    if nxt is None:
        return None
    while (nxt, EPSILON) in trans:
        nxt = trans[(nxt, EPSILON)]
    return nxt


def _snapshot(node: str, base_fsm: dict) -> str:
    """Path-insensitive (node, marking) key used for loop termination
    (DFAOrderEvaluator.kt getStateSnapshot)."""
    grouped = defaultdict(set)
    for key, state in base_fsm.items():
        grouped[key.split("|", 1)[1]].add(state)
    body = ",".join(
        f"{b}({','.join(sorted(states))})" for b, states in sorted(grouped.items())
    )
    return f"{node} {body}"


def _walk_function(entry: str, succ: dict, relevant: dict, dfa: dict,
                   trans: dict, fn_nodes: set) -> tuple[dict, set]:
    """The reference worklist (DFAOrderEvaluator.kt:115-190) over one
    function's EOG.  Returns (final FSM markings keyed "path|base",
    bases that broke the order)."""
    node_paths: dict[str, set[str]] = {entry: {""}}
    base_fsm: dict[str, str] = {}
    seen: set[str] = set()
    wrong: set[str] = set()
    worklist = [entry]
    budget = 100_000  # defensive cap; the snapshot check terminates loops
    while worklist and budget:
        budget -= 1
        node = worklist.pop(0)
        seen.add(_snapshot(node, base_fsm))
        paths = node_paths.get(node)
        if paths is None:
            continue
        for path in sorted(paths):
            if node in relevant:
                base_id, _, op = relevant[node]
                key = f"{path}|{base_id}"
                # stopOnWrongBase: skip bases already broken on a
                # prefix of this path (DFAOrderEvaluator.kt:144-149)
                broken = any(
                    # base_id is an int64 node id; FSM keys are strings
                    wb.split("|", 1)[1] == str(base_id)
                    and key.startswith(wb.split("|", 1)[0])
                    for wb in wrong
                )
                if not broken:
                    state = base_fsm.get(key, dfa["start"])
                    nxt = _step(trans, state, op)
                    if nxt is None:
                        wrong.add(key)
                        base_fsm.setdefault(key, state)
                    else:
                        base_fsm[key] = nxt
            # successor expansion (getNextNodes) — edges into function
            # declaration nodes are the exit sentinel, not real flow
            raw = [(n, unr) for n, unr in succ.get(node, ())
                   if n not in fn_nodes]
            outs = [n for n, unr in raw if not unr]
            if len(outs) == 1 and len(raw) == 1:
                # plain sequential flow: always proceed
                # (DFAOrderEvaluator.kt:320-323)
                node_paths.setdefault(outs[0], set()).add(path)
                worklist.append(outs[0])
            elif len(outs) == 1:
                # a branch collapsed by unreachable elimination: the
                # snapshot check terminates loops (:324-332)
                node_paths.setdefault(outs[0], set()).add(path)
                if _snapshot(outs[0], base_fsm) not in seen:
                    worklist.append(outs[0])
            elif len(outs) > 1:
                rekeyed = {}
                for key in list(base_fsm):
                    if key.startswith(path):
                        rekeyed[key[len(path):]] = base_fsm.pop(key)
                for i in reversed(range(len(outs))):
                    if _snapshot(outs[i], base_fsm) in seen:
                        continue
                    new_path = f"{path}{i}"
                    for suffix, state in rekeyed.items():
                        base_fsm[new_path + suffix] = state
                    node_paths.setdefault(outs[i], set()).add(new_path)
                    worklist.append(outs[i])
        node_paths.pop(node, None)
    return base_fsm, wrong


def _doc_kernel(doc_id: str, npdf: pd.DataFrame, epdf: pd.DataFrame,
                dfa: dict, base_type: str,
                relevant_ops: set | None) -> list[dict]:
    trans = _transitions(dfa)
    label = dict(zip(npdf["node_id"], npdf["label"]))
    name = dict(zip(npdf["node_id"], npdf["name"]))
    node_ids = list(npdf["node_id"])

    ast_base: dict[str, str] = {}     # member call -> base expression
    refers: dict[str, str] = {}       # reference -> declaration
    eval_type: dict[str, str] = {}    # node -> type node
    methods: dict[str, set] = defaultdict(set)   # record -> method names
    succ: dict[str, list] = defaultdict(list)    # EOG adjacency
    for subj, pred, obj, props in zip(epdf["subj"], epdf["pred"],
                                      epdf["obj"], epdf["props"]):
        props = props or {}
        if pred == "EOG":
            succ[subj].append((obj, props.get("unreachable") == "true"))
        elif pred == "AST" and props.get("field") == "BASE":
            ast_base[subj] = obj
        elif pred == "REFERS_TO":
            refers[subj] = obj
        elif pred == "EVAL_TYPE":
            eval_type.setdefault(subj, obj)
        elif pred == "METHODS":
            methods[subj].add(name.get(obj, ""))

    # the entity's method set — calls outside it are ignored
    # ("not in the entity", SimpleOrder.java fixture comments)
    if relevant_ops is None:
        relevant_ops = set()
        for rec, ms in methods.items():
            if name.get(rec) == base_type:
                relevant_ops |= ms

    considered = {
        nid for nid in node_ids
        if label[nid] in ("VariableDeclaration", "FieldDeclaration",
                          "ParamVariableDeclaration")
        and name.get(nid) != "this"
        and name.get(eval_type.get(nid, ""), "") == base_type
    }
    relevant: dict[str, tuple] = {}
    for nid in node_ids:
        if label[nid] != "MemberCallExpression" or name[nid] not in relevant_ops:
            continue
        base_ref = ast_base.get(nid)
        base_decl = refers.get(base_ref, base_ref)
        if base_decl in considered:
            relevant[nid] = (base_decl, name.get(base_decl, ""), name[nid])

    fn_nodes = {nid for nid in node_ids if label[nid] in _FN_LABELS}
    rows: list[dict] = []
    for entry in sorted(fn_nodes & set(succ)):
        base_fsm, wrong = _walk_function(entry, succ, relevant, dfa,
                                         trans, fn_nodes)
        per_base: dict[str, dict] = {}
        for key, state in base_fsm.items():
            base_id = int(key.split("|", 1)[1])
            agg = per_base.setdefault(base_id, {"wrong": False,
                                                "incomplete": False})
            if state not in dfa["accepting"]:
                agg["incomplete"] = True
        for key in wrong:
            base_id = int(key.split("|", 1)[1])
            per_base.setdefault(base_id, {"incomplete": False})["wrong"] = True
        decl_name = {bid: bname for bid, bname, _ in relevant.values()}
        n_ops_by_base = defaultdict(int)
        for bid, _, _ in relevant.values():
            n_ops_by_base[bid] += 1
        for base_id, agg in sorted(per_base.items()):
            reason = ("wrong_order" if agg.get("wrong")
                      else "incomplete" if agg.get("incomplete") else "ok")
            rows.append({
                "doc_id": doc_id,
                "function": name.get(entry, ""),
                "base": decl_name.get(base_id, name.get(base_id, "")),
                "n_ops": n_ops_by_base.get(base_id, 0),
                "everything_ok": reason == "ok",
                "reason": reason,
            })
    return rows


def evaluate_order(nodes: DataFrame, edges: DataFrame, dfa: dict,
                   base_type: str, relevant_ops: set | None = None,
                   eliminate_unreachable: bool = True) -> DataFrame:
    """(doc_id, function, base, n_ops, everything_ok, reason) — one row
    per (function, considered base variable of type ``base_type``).

    ``everything_ok`` matches the reference's ``evaluateOrder`` verdict
    for that base; a function's verdict is the AND of its bases.  With
    ``eliminate_unreachable`` the UnreachableEOGPass runs first and its
    dead branches are skipped, exactly like registering the pass before
    the evaluator (SimpleDFAOrderEvaluationTest beforeAll).
    """
    if eliminate_unreachable:
        from cpg_spark.operators.unreachable import mark_unreachable

        edges = mark_unreachable(nodes, edges)
    accepting = set(dfa["accepting"])
    spec = {"start": dfa["start"], "accepting": accepting,
            "edges": [tuple(e) for e in dfa["edges"]]}

    # ONE grouped frame, not a cogroup: node rows ride along as pseudo
    # edges (pred='::NODE::', label+name in props).  A cogroup
    # would be a self-join of two frames sharing the parse output AND the
    # unreachable pass's constant dimension as ancestors — Spark's
    # ambiguous-self-join analysis rejects that; the union also halves
    # the shuffle (one grouped exchange instead of two).
    n = nodes.select(
        "doc_id",
        F.col("node_id").alias("subj"),
        F.lit("::NODE::").alias("pred"),
        # non-null placeholder (ignored by the kernel): a null here would
        # flip the whole Arrow->pandas obj column to float64 and corrupt
        # int64 ids beyond 2^53 in the REAL edge rows sharing the column
        F.col("node_id").alias("obj"),
        F.create_map(
            F.lit("name"), F.coalesce(F.col("name"), F.lit("")),
            F.lit("label"), F.col("label"),
        ).alias("props"),
    )
    e = edges.filter(
        F.col("pred").isin("EOG", "AST", "REFERS_TO", "EVAL_TYPE", "METHODS")
    ).select("doc_id", "subj", "pred", "obj", "props")

    def run(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        is_node = pdf["pred"] == "::NODE::"
        npart = pdf[is_node]
        npdf = pd.DataFrame({
            "node_id": npart["subj"],
            "label": [(p or {}).get("label", "") for p in npart["props"]],
            "name": [(p or {}).get("name", "") for p in npart["props"]],
        })
        rows = _doc_kernel(key[0], npdf, pdf[~is_node], spec, base_type,
                           relevant_ops)
        return pd.DataFrame(rows, columns=[f.name for f in VERDICT_SCHEMA.fields])

    return (
        e.unionByName(n).groupBy("doc_id").applyInPandas(run, schema=VERDICT_SCHEMA)
    )
