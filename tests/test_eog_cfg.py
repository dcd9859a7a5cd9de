"""EOGTest parity over the reference's cfg fixtures (EOGTest.java
testJavaSwitch / testJavaBreakContinue, resources cfg/Switch.java and
cfg/BreakContinue.java): break binds the innermost switch-or-loop, a
labeled break exits the statement carrying that label (switch OR loop),
continue returns to the loop condition, and C/Java case bodies fall
through to the next case label.

Pure-python over the frontend graph — no Spark session needed (EOG is
built in-UDF; SURVEY C1)."""

from __future__ import annotations

from cpg_spark.fixtures_cfamily import JAVA_FIXTURES
from cpg_spark.frontends.cfamily_frontend import parse_java_document


class _G:
    def __init__(self, fixture_name: str):
        g = parse_java_document(f"java/{fixture_name}/0001", 1,
                                JAVA_FIXTURES[fixture_name], None)
        self.nodes = {n["node_id"]: n for n in g.nodes}
        self.eog: dict[int, list[int]] = {}
        for e in g.edges:
            if e["pred"] == "EOG":
                self.eog.setdefault(e["subj"], []).append(e["obj"])

    def at_line(self, label: str, line: int, name: str | None = None):
        got = [n for n in self.nodes.values()
               if n["label"] == label
               and (n["loc"] or {}).get("start_line") == line
               and (name is None or n["name"] == name)]
        assert got, f"no {label} at line {line}"
        return got[0]

    def succ_lines(self, node) -> set[int]:
        return {(self.nodes[t]["loc"] or {}).get("start_line")
                for t in self.eog.get(node["node_id"], [])}

    def succ_ids(self, node) -> set[int]:
        return set(self.eog.get(node["node_id"], []))


def test_switch_breaks_exit_to_after_switch():
    """main(): both breaks exit the switch — EOG edge straight to the
    println AFTER the switch (line 21), never into another case."""
    g = _G("CfgSwitch")
    for brk_line in (12, 17):
        brk = g.at_line("BreakStatement", brk_line)
        assert 21 in g.succ_lines(brk), brk_line


def test_switch_selector_fans_out_to_every_case():
    """Selector exits connect to every case/default entry
    (EOGTest: 'switch root node exits connect to either case or default
    statements entries')."""
    g = _G("CfgSwitch")
    sel = g.at_line("DeclaredReferenceExpression", 8, "i")
    succs = g.succ_ids(sel)
    for line, label in ((9, "CaseStatement"), (10, "CaseStatement"),
                        (13, "CaseStatement"), (15, "CaseStatement"),
                        (18, "DefaultStatement")):
        case = g.at_line(label, line)
        assert case["node_id"] in succs, (line, label)


def test_switch_empty_case_and_body_fall_through():
    """case 0: (empty) falls through to case 1; the un-break-ed case 2
    body (i = 20) falls through to case 3."""
    g = _G("CfgSwitch")
    case0 = g.at_line("CaseStatement", 9)
    case1 = g.at_line("CaseStatement", 10)
    assert case1["node_id"] in g.succ_ids(case0)
    # exit of `i = 20` (the assignment BinaryOperator, line 14) reaches
    # the case-3 label
    case3 = g.at_line("CaseStatement", 15)
    preds = {s for s, ts in g.eog.items() if case3["node_id"] in ts}
    pred_facts = {(g.nodes[p]["label"],
                   (g.nodes[p]["loc"] or {}).get("start_line"))
                  for p in preds}
    assert ("BinaryOperator", 14) in pred_facts  # i = 20 falls through
    assert ("DeclaredReferenceExpression", 8) in pred_facts  # selector jump


def test_labeled_break_in_switch_exits_labeled_while():
    """whileswitch(): `break label` inside the switch exits the WHILE
    carrying the label — EOG edge to the println after the loop (line
    38), not the in-loop println (line 36)."""
    g = _G("CfgSwitch")
    brk = g.at_line("BreakStatement", 32, "label")
    lines = g.succ_lines(brk)
    assert 38 in lines and 36 not in lines


def test_labeled_break_in_while_exits_labeled_switch():
    """switchwhile(): `break label` inside the inner while exits the
    SWITCH carrying the label — EOG edge to the println after the switch
    (line 56), not the post-while println (line 52)."""
    g = _G("CfgSwitch")
    brk = g.at_line("BreakStatement", 49, "label")
    lines = g.succ_lines(brk)
    assert 56 in lines and 52 not in lines


def test_break_continue_loops():
    """BreakContinue.java (testJavaBreakContinue): while-continue returns
    to the while condition, while-break exits to the next statement;
    do-while continue goes to the do condition, do-while break exits."""
    g = _G("CfgBreakContinue")
    # while loop: continue (line 9) -> condition (line 8)
    cont = g.at_line("ContinueStatement", 9)
    assert 8 in g.succ_lines(cont)
    # break (line 10) -> println after the while (line 13)
    brk = g.at_line("BreakStatement", 10)
    assert 13 in g.succ_lines(brk)
    # do-while: break (line 15) -> println after the do (line 22)
    brk2 = g.at_line("BreakStatement", 15)
    assert 22 in g.succ_lines(brk2)
    # continue (line 18) -> do condition (line 21)
    cont2 = g.at_line("ContinueStatement", 18)
    assert 21 in g.succ_lines(cont2)


def _cpp(src, doc="cpp/g/0001", mod="g"):
    from cpg_spark.frontends.cfamily_frontend import parse_cpp_document

    g = parse_cpp_document(doc, 1, src, mod)
    nodes = {n["node_id"]: n for n in g.nodes}
    eog = {}
    for e in g.edges:
        if e["pred"] == "EOG":
            eog.setdefault(e["subj"], []).append(e["obj"])
    return nodes, eog


def test_goto_backward():
    """cfg/goto.cpp main(): `goto label` jumps back to the LabelStatement
    (EvaluationOrderGraphPass.java:754-762 handleGotoStatement)."""
    src = "int main(void){\n\tlabel:\n\tgoto label;\n}\n"
    nodes, eog = _cpp(src)
    goto = next(n for n in nodes.values() if n["label"] == "GotoStatement")
    lab = next(n for n in nodes.values() if n["label"] == "LabelStatement")
    assert lab["node_id"] in eog[goto["node_id"]]


def test_goto_forward_no_fallthrough():
    """A forward goto resolves after the body walk; the skipped statement
    gets NO incoming EOG (currentEOG.clear())."""
    src = ("int main(){\n  int x = 1;\n  goto end;\n  x = 2;\nend:\n"
           "  x = 3;\n}\n")
    nodes, eog = _cpp(src)
    goto = next(n for n in nodes.values() if n["label"] == "GotoStatement")
    lab = next(n for n in nodes.values() if n["label"] == "LabelStatement")
    assert lab["node_id"] in eog[goto["node_id"]]
    skipped = next(n for n in nodes.values()
                   if n["label"] == "BinaryOperator"
                   and (n["loc"] or {}).get("start_line") == 4)
    incoming = {s for s, ts in eog.items() if skipped["node_id"] in ts}
    assert not incoming


def test_fix455_eog_continues_past_function_style_declaration():
    """fix-455/main.cpp: `Test t2();` is a declaration statement and the
    EOG must continue beyond it to the function exit."""
    src = ("class Test {\npublic:\n  int call(int a) {\n    return a + 1;\n"
           "  }\n};\n\nint main() {\n  int foo = 42;\n  foo = 3;\n"
           "  Test t;\n  t.call(foo);\n\n  Test t2();\n}\n")
    nodes, eog = _cpp(src)
    main_ = next(n for n in nodes.values()
                 if n["label"] == "FunctionDeclaration" and n["name"] == "main")
    into_exit = {s for s, ts in eog.items() if main_["node_id"] in ts}
    assert into_exit, "EOG dead-ends before the function exit"


def test_goto_into_switch_label():
    """cfg/goto.cpp func(): `label: case 0:` inside a switch body is a
    legal goto target — both the forward goto (before the switch) and
    the one inside `default:` jump to it."""
    src = ("void func(int a){\n\tgoto label;\n\tswitch(a){\n"
           "\t\tlabel: case 0:\n\t\tdefault:\n\t\tgoto label;\n\t}\n}\n")
    nodes, eog = _cpp(src)
    lab = next(n for n in nodes.values() if n["label"] == "LabelStatement")
    gotos = [n for n in nodes.values() if n["label"] == "GotoStatement"]
    assert len(gotos) == 2
    for g in gotos:
        assert lab["node_id"] in eog[g["node_id"]]
    # the selector branches through the label into the case
    case = next(n for n in nodes.values() if n["label"] == "CaseStatement")
    assert case["node_id"] in eog[lab["node_id"]]


def test_condition_short_circuit():
    """EOGTest testConditionShortCircuit over the reference's
    cfg/ShortCircuit.java: for every &&/|| the lhs exit has EXACTLY two
    EOG successors — the rhs entry and the operator itself
    (EvaluationOrderGraphPass.java:551-568 shortCircuitNodes)."""
    src = (  # embedded copy of the reference fixture
        "package cfg;\n\npublic class Loops {\n\n"
        "    public static void main(String[] args) {\n"
        "        boolean containsArg = args.length > 0 && "
        "args[0].equals(\"SomeArg\");\n"
        "        boolean empty = args == null || args.length == 0;\n"
        "    }\n}\n"
    )
    g = parse_java_document("java/ShortCircuit/0001", 0, src, None)
    edges = g.edges
    eog = {}
    for e in edges:
        if e["pred"] == "EOG":
            eog.setdefault(e["subj"], []).append(e["obj"])
    bos = [n for n in g.nodes
           if n["label"] == "BinaryOperator" and n["name"] in ("&&", "||")]
    assert len(bos) == 2
    for bo in bos:
        lhs = next(e["obj"] for e in edges
                   if e["pred"] == "AST" and e["subj"] == bo["node_id"]
                   and (e["props"] or {}).get("field") == "LHS")
        rhs = next(e["obj"] for e in edges
                   if e["pred"] == "AST" and e["subj"] == bo["node_id"]
                   and (e["props"] or {}).get("field") == "RHS")
        succ = eog[lhs]
        assert len(succ) == 2 and bo["node_id"] in succ and rhs in succ
        assert bo["node_id"] in eog[rhs]
