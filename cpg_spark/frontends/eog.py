"""Evaluation-Order-Graph (EOG) construction over emitted statement trees.

Language-independent analogue of the reference's EvaluationOrderGraphPass
(``cpg-core/.../passes/EvaluationOrderGraphPass.java:73-1131``): builds
ordered ``EOG`` edges with ``index`` properties (``:917-924``), ``branch``
true/false on conditional branches (``:1031-1059``) and loop back-edges
(``connectCurrentToLoopStart``, ``:890-905``).

Runs entirely inside the parse UDF (function-local, zero shuffle — SURVEY.md
C1).  Frontends hand it a lightweight *shadow tree* of dicts:

    {"kind": "plain",   "nid": ...}
    {"kind": "if",      "nid": ..., "cond": id, "then": [infos], "orelse": [infos] | None}
    {"kind": "while",   "nid": ..., "cond": id, "body": [infos]}
    {"kind": "dowhile", "nid": ..., "cond": id, "body": [infos]}
    {"kind": "foreach", "nid": ..., "body": [infos]}
    {"kind": "return",  "nid": ...}
    {"kind": "break",   "nid": ...}
    {"kind": "continue","nid": ...}
    {"kind": "compound","nid": ..., "stmts": [infos]}
    {"kind": "try",     "nid": ..., "body": [infos], "final": [infos]}
"""

from __future__ import annotations


class EogBuilder:
    def __init__(self, emitter):
        self.em = emitter
        self.index = 0
        self.loop_breaks: list[list[str]] = []
        self.loop_heads: list[str] = []

    def _edge(self, a: str, b: str, branch: str | None = None) -> None:
        props = {"index": self.index}
        if branch is not None:
            props["branch"] = branch
        self.em.edge(a, "EOG", b, props)
        self.index += 1

    def connect(self, preds: list[tuple[str, str | None]], target: str) -> None:
        for pid, branch in preds:
            self._edge(pid, target, branch)

    def _entry(self, info: dict) -> str:
        """EOG entry node of a statement — the node ``stmt`` would connect
        incoming edges to (conditions for branching forms, the statement
        node otherwise)."""
        kind = info["kind"]
        if kind in ("if", "while", "foreach", "switch"):
            return info.get("cond") or info["nid"]
        if kind == "for":
            init = info.get("init")
            if init:
                return self._entry(init)
            return info.get("cond") or info["nid"]
        return info["nid"]

    def seq(self, infos: list[dict], preds: list) -> list:
        for info in infos:
            preds = self.stmt(info, preds)
        return preds

    def stmt(self, info: dict, preds: list) -> list:
        kind = info["kind"]
        nid = info["nid"]
        if kind == "compound":
            self.connect(preds, nid)
            return self.seq(info["stmts"], [(nid, None)])
        if kind == "if":
            cond = info.get("cond") or nid
            self.connect(preds, cond)
            exits = []
            then_stmts = info.get("then") or []
            if then_stmts:
                first = then_stmts[0]
                # branch=true edge into the then-branch entry
                head = [(cond, "true")]
                exits.extend(self.seq(then_stmts, head))
            else:
                exits.append((cond, "true"))
            orelse = info.get("orelse")
            if orelse:
                exits.extend(self.seq(orelse, [(cond, "false")]))
            else:
                exits.append((cond, "false"))
            return exits
        if kind in ("while", "foreach"):
            head = info.get("cond") or nid
            self.connect(preds, head)
            self.loop_breaks.append([])
            self.loop_heads.append(head)
            body_exits = self.seq(info.get("body") or [], [(head, "true")])
            # loop back-edge (EvaluationOrderGraphPass.java:890-905)
            self.connect(body_exits, head)
            breaks = self.loop_breaks.pop()
            self.loop_heads.pop()
            return [(head, "false")] + [(b, None) for b in breaks]
        if kind == "for":
            # 3-clause for (EvaluationOrderGraphPass.java:953-1029):
            # preds -> init -> cond -(true)-> body -> post -> cond; exit on
            # cond false (plus breaks)
            init = info.get("init")
            if init:
                preds = self.stmt(init, preds)
            head = info.get("cond") or nid
            self.connect(preds, head)
            self.loop_breaks.append([])
            self.loop_heads.append(head)
            body_exits = self.seq(info.get("body") or [], [(head, "true")])
            post = info.get("post")
            if post:
                body_exits = self.stmt(post, body_exits)
            self.connect(body_exits, head)
            breaks = self.loop_breaks.pop()
            self.loop_heads.pop()
            return [(head, "false")] + [(b, None) for b in breaks]
        if kind == "dowhile":
            # body executes at least once: preds -> body -> cond; cond
            # true -> body entry (back edge), false -> exit
            # (EvaluationOrderGraphPass.java:953-976 handleDoStatement)
            head = info.get("cond") or nid
            self.connect(preds, nid)
            self.loop_breaks.append([])
            self.loop_heads.append(head)
            body = info.get("body") or []
            body_exits = self.seq(body, [(nid, None)])
            self.connect(body_exits, head)
            if body:
                self._edge(head, self._entry(body[0]), "true")
            breaks = self.loop_breaks.pop()
            self.loop_heads.pop()
            return [(head, "false")] + [(b, None) for b in breaks]
        if kind == "switch":
            # selector evaluates once, then branches to every case entry
            # (EvaluationOrderGraphPass.java handleSwitchStatement); without
            # fallthrough modelling, exits = union of case-body exits plus
            # the no-match path when no default exists
            sel = info.get("cond") or nid
            self.connect(preds, sel)
            exits = []
            has_default = False
            for case in info.get("cases") or []:
                cnid = case["nid"]
                self._edge(sel, cnid)
                exits.extend(self.seq(case.get("stmts") or [], [(cnid, None)]))
                if case.get("default"):
                    has_default = True
            if not has_default:
                exits.append((sel, "false"))
            return exits
        if kind == "return":
            self.connect(preds, nid)
            return []
        if kind == "break":
            self.connect(preds, nid)
            if self.loop_breaks:
                self.loop_breaks[-1].append(nid)
            return []
        if kind == "continue":
            self.connect(preds, nid)
            if self.loop_heads:
                self._edge(nid, self.loop_heads[-1])
            return []
        if kind == "try":
            self.connect(preds, nid)
            exits = self.seq(info.get("body") or [], [(nid, None)])
            fin = info.get("final") or []
            if fin:
                exits = self.seq(fin, exits)
            return exits
        # plain statement / expression
        self.connect(preds, nid)
        return [(nid, None)]


def build_eog(emitter, root_id: str, body_infos: list[dict]) -> None:
    """EOG rooted at a function declaration (or namespace for module-level
    code): root -> first statement -> ... (per-function, zero shuffle).

    Dangling exits (incl. false-branches of trailing conditionals) connect
    back to the root node, which doubles as the function-exit sentinel —
    the reference models this via its ExitPoints collection
    (EvaluationOrderGraphPass.java handleFunctionDeclaration)."""
    b = EogBuilder(emitter)
    exits = b.seq(body_infos, [(root_id, None)])
    for pid, branch in exits:
        if pid != root_id:
            b._edge(pid, root_id, branch)
