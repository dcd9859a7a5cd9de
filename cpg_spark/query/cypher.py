"""openCypher-subset executor over the nodes/edges DataFrames.

Re-derivation of the reference's experimental in-memory Cypher executor
(``cpg-core/.../graph/Graph.kt:58-360``): MATCH of a single pattern part
with a relationship chain (``handleRelationshipChain`` :121-167), node
label + inline property filters (``handleNodePattern`` :169-), WHERE
comparisons ``= < >`` on properties (:245-287), RETURN variable and
LIMIT (:79-100).

The Spark translation is purely declarative — each pattern node is a
filtered projection of ``nodes``, each relationship a self-join through
``edges`` filtered on ``pred`` — so Catalyst plans the chain like any
relational query (label pushdown, broadcast of small ends, AQE).

Grammar (a strict superset of what the reference's tests exercise):

    MATCH (a:Label {prop: 'lit'})-[:PRED]->(b:Label2)-[:PRED2]->(c)
    [WHERE x.prop OP literal [AND ...]]
    RETURN x [LIMIT n]

OP ∈ {=, <, >, <>, <=, >=};  properties resolve to node columns
(name, code, label, doc_id, ...) or loc fields (start_line, ...).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NODE_RE = re.compile(
    r"\(\s*(?P<var>\w+)?\s*(?::\s*(?P<label>\w+))?\s*"
    r"(?:\{(?P<props>[^}]*)\})?\s*\)"
)
_REL_RE = re.compile(r"-\s*\[\s*:?\s*(?P<pred>\w+)?\s*\]\s*->")
_WHERE_RE = re.compile(
    r"(?P<var>\w+)\.(?P<prop>\w+)\s*(?P<op>=|<>|<=|>=|<|>)\s*"
    r"(?P<val>'[^']*'|\"[^\"]*\"|-?\d+(?:\.\d+)?)"
)
# constant-vs-constant predicate (QueryTest.kt:116-171 — ``WHERE 1=1``,
# ``1='a'``, ``1<0``, ``0>1``): folded at parse time, no plan node
_WHERE_CONST_RE = re.compile(
    r"(?P<lhs>'[^']*'|\"[^\"]*\"|-?\d+(?:\.\d+)?)\s*"
    r"(?P<op>=|<>|<=|>=|<|>)\s*"
    r"(?P<rhs>'[^']*'|\"[^\"]*\"|-?\d+(?:\.\d+)?)"
)

_LOC_FIELDS = {"start_line", "start_col", "end_line", "end_col"}


class CypherError(ValueError):
    pass


def _parse(query: str):
    q = query.strip()
    m = re.match(r"(?is)^\s*MATCH\s+(?P<pattern>.+?)"
                 r"(?:\s+WHERE\s+(?P<where>.+?))?"
                 r"\s+RETURN\s+(?P<ret>\w+)"
                 r"(?:\s+LIMIT\s+(?P<limit>\d+))?\s*$", q)
    if not m:
        raise CypherError(f"unsupported cypher: {query!r}")
    pattern = m.group("pattern")
    # split pattern into node / relationship tokens
    nodes = []
    rels = []
    pos = 0
    nm = _NODE_RE.match(pattern, pos)
    if not nm:
        raise CypherError("pattern must start with a node")
    nodes.append(nm.groupdict())
    pos = nm.end()
    while pos < len(pattern):
        rm = _REL_RE.match(pattern, pos)
        if not rm:
            if pattern[pos:].strip():
                raise CypherError(f"trailing pattern: {pattern[pos:]!r}")
            break
        rels.append(rm.group("pred"))
        pos = rm.end()
        nm = _NODE_RE.match(pattern, pos)
        if not nm:
            raise CypherError("relationship must be followed by a node")
        nodes.append(nm.groupdict())
        pos = nm.end()
    wheres = []
    if m.group("where"):
        for part in re.split(r"(?i)\s+AND\s+", m.group("where")):
            part = part.strip()
            wm = _WHERE_RE.match(part)
            if wm:
                wheres.append(wm.groupdict())
                continue
            cm = _WHERE_CONST_RE.match(part)
            if not cm:
                raise CypherError(f"unsupported WHERE clause: {part!r}")
            wheres.append({"const": _eval_const(
                cm.group("lhs"), cm.group("op"), cm.group("rhs"))})
    return nodes, rels, wheres, m.group("ret"), m.group("limit")


def _eval_const(lhs: str, op: str, rhs: str) -> bool:
    """Fold a literal comparison.  The reference compares the evaluated
    AST literals (Graph.kt:245-287 handleWhere on two Literal operands);
    a cross-type compare like ``1='a'`` is simply unequal, never an
    error (QueryTest.testQueryNoResult)."""
    a, b = _literal(lhs), _literal(rhs)
    if isinstance(a, str) != isinstance(b, str):
        return op == "<>"  # differing types: only <> holds
    import operator as _op

    return {"=": _op.eq, "<>": _op.ne, "<": _op.lt,
            ">": _op.gt, "<=": _op.le, ">=": _op.ge}[op](a, b)


def _prop_col(var_prefix: str, prop: str):
    if prop in _LOC_FIELDS:
        return F.col(f"{var_prefix}loc.{prop}")
    return F.col(f"{var_prefix}{prop}")


def _literal(val: str):
    if val[0] in "'\"":
        return val[1:-1]
    return float(val) if "." in val else int(val)


def execute_cypher(query: str, nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Run the cypher subset; returns the RETURN variable's node rows."""
    pat_nodes, rels, wheres, ret, limit = _parse(query)
    vars_seen = {}
    df = None
    for i, pn in enumerate(pat_nodes):
        var = pn["var"] or f"_v{i}"
        if var in vars_seen:
            raise CypherError(f"duplicate variable {var}")
        vars_seen[var] = i
        nd = nodes
        if pn["label"]:
            nd = nd.filter(F.col("label") == pn["label"])
        if pn["props"]:
            for kv in pn["props"].split(","):
                k, v = kv.split(":", 1)
                nd = nd.filter(
                    F.col(k.strip()) == _literal(v.strip())
                )
        prefix = f"{var}__"
        nd = nd.select([F.col(c).alias(f"{prefix}{c}") for c in nd.columns])
        if df is None:
            df = nd
        else:
            pred = rels[i - 1]
            prev_var = pat_nodes[i - 1]["var"] or f"_v{i-1}"
            e = edges
            if pred:
                e = e.filter(F.col("pred") == pred)
            e = e.select(F.col("subj").alias(f"__s{i}"),
                         F.col("obj").alias(f"__o{i}"))
            df = (
                df.join(e, F.col(f"{prev_var}__node_id") == F.col(f"__s{i}"))
                .join(nd, F.col(f"__o{i}") == F.col(f"{var}__node_id"))
                .drop(f"__s{i}", f"__o{i}")
            )
    for w in wheres:
        if "const" in w:
            df = df.filter(F.lit(bool(w["const"])))
            continue
        if w["var"] not in vars_seen:
            raise CypherError(f"unknown variable {w['var']}")
        col = _prop_col(f"{w['var']}__", w["prop"])
        lit = _literal(w["val"])
        op = w["op"]
        cond = {
            "=": col == lit, "<>": col != lit, "<": col < lit,
            ">": col > lit, "<=": col <= lit, ">=": col >= lit,
        }[op]
        df = df.filter(cond)
    if ret not in vars_seen:
        raise CypherError(f"RETURN variable {ret} not bound")
    prefix = f"{ret}__"
    out = df.select(
        [F.col(c).alias(c[len(prefix):]) for c in df.columns
         if c.startswith(prefix)]
    )
    if limit:
        out = out.limit(int(limit))
    return out
