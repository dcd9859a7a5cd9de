"""Function-template parity vs the reference's FunctionTemplateTest.java
over its own fixture programs
(``cpg-core/src/test/resources/templates/functiontemplates/``), adapted
to the subset grammar (the ``std::cout <<`` wrappers are dropped; the
calls and the template are verbatim).

Covered assertions:
* testFunctionTemplateStructure — FunctionTemplateDeclaration with
  TypeParamDeclaration (default int) + ParamVariableDeclaration N
  (default literal 5, DFG from every instantiation literal), REALIZATION.
* testInvocationWithCallTarget (inv1) — exact non-template wins.
* testInvocationWithoutCallTarget (inv2) / AutoDeduction (inv3) —
  deduced T=double, N default; call type double.
* testInvocationWithDefaults (inv4) — ``<>()`` all defaults, type int.
* testInvocationWithPartialDefaults (inv5) — ``<double>(20.5)``.
* testInvocationWithImplicitCastToOverridenTemplateParameter (inv6) —
  ``<int>(20.3)`` wraps the argument in a CastExpression(int).
* testInvocationWithImplicitCast (inv7) — template vs non-template with
  casts; deduction conflict f(1,'b') resolves non-template w/ cast;
  ``f<>(1,'b')`` stays unresolved (inferred downstream).
* testFunctionTemplateInMethod — record TEMPLATES edge.
"""

from __future__ import annotations

from cpg_spark.frontends.cfamily_frontend import parse_cpp_document

from cpg_spark.fixtures_templates import (  # noqa: F401
    INV1, INV2, INV3, INV4, INV5, INV6, INV7, METHOD_TEMPLATE)


def _graph(src, name="tpl"):
    return parse_cpp_document(f"cpp/{name}/0001", 0, src, None)


def _index(g):
    nodes = {n["node_id"]: n for n in g.nodes}
    by_pred = {}
    for e in g.edges:
        by_pred.setdefault(e["pred"], []).append(e)
    return nodes, by_pred


def _the_call(nodes, name):
    calls = [n for n in nodes.values()
             if n["label"] == "CallExpression" and n["name"] == name]
    assert len(calls) == 1
    return calls[0]


def _call_targets(nodes, by_pred, call_id):
    return [nodes[e["obj"]] for e in by_pred.get("CALLS", [])
            if e["subj"] == call_id]


def _eval_type_name(nodes, by_pred, nid):
    for e in by_pred.get("EVAL_TYPE", []):
        if e["subj"] == nid:
            return nodes[e["obj"]]["name"]
    return None


def _template_params(nodes, by_pred, call_id):
    out = []
    for e in by_pred.get("TEMPLATE_PARAMETERS", []):
        if e["subj"] == call_id:
            out.append((int(e["props"]["index"]),
                        e["props"]["instantiation"], nodes[e["obj"]]))
    return [x[1:] for x in sorted(out)]


def test_template_structure():
    g = _graph(INV2)
    nodes, by_pred = _index(g)
    tpl = [n for n in nodes.values()
           if n["label"] == "FunctionTemplateDeclaration"]
    assert len(tpl) == 1 and tpl[0]["name"] == "fixed_multiply"
    params = [nodes[e["obj"]] for e in by_pred["PARAMETERS"]
              if e["subj"] == tpl[0]["node_id"]]
    labels = sorted(p["label"] for p in params)
    assert labels == ["ParamVariableDeclaration", "TypeParamDeclaration"]
    t = next(p for p in params if p["label"] == "TypeParamDeclaration")
    n = next(p for p in params if p["label"] == "ParamVariableDeclaration")
    assert t["name"] == "T" and n["name"] == "N"
    # T's default is the int Type node (typeParamDeclaration.getDefault())
    t_default = [nodes[e["obj"]] for e in by_pred["DEFAULT"]
                 if e["subj"] == t["node_id"]]
    assert [d["name"] for d in t_default] == ["int"]
    # N's default literal 5 flows into N (N.prevDFG contains int5)
    n_dfg_in = [nodes[e["subj"]] for e in by_pred["DFG"]
                if e["obj"] == n["node_id"]]
    assert any(d["label"] == "Literal" and d["name"] == "5" for d in n_dfg_in)
    # realization is the T-typed function
    real = [nodes[e["obj"]] for e in by_pred["REALIZATION"]
            if e["subj"] == tpl[0]["node_id"]]
    assert len(real) == 1 and real[0]["label"] == "FunctionDeclaration"
    assert _eval_type_name(nodes, by_pred, real[0]["node_id"]) == "T"


def test_invocation_with_call_target():  # inv1
    g = _graph(INV1)
    nodes, by_pred = _index(g)
    call = _the_call(nodes, "fixed_multiply")
    tgts = _call_targets(nodes, by_pred, call["node_id"])
    assert len(tgts) == 1
    assert _eval_type_name(nodes, by_pred, tgts[0]["node_id"]) == "double"
    assert not _template_params(nodes, by_pred, call["node_id"])
    assert _eval_type_name(nodes, by_pred, call["node_id"]) == "double"


def _assert_template_resolution(src, want_t, t_src, call_type):
    g = _graph(src)
    nodes, by_pred = _index(g)
    call = _the_call(nodes, "fixed_multiply")
    tgts = _call_targets(nodes, by_pred, call["node_id"])
    assert len(tgts) == 1
    assert _eval_type_name(nodes, by_pred, tgts[0]["node_id"]) == "T"
    tps = _template_params(nodes, by_pred, call["node_id"])
    assert len(tps) == 2
    assert tps[0][0] == t_src
    assert tps[0][1]["label"] == "TypeExpression"
    assert tps[0][1]["name"] == want_t
    assert tps[1][0] == "DEFAULT"
    assert tps[1][1]["label"] == "Literal" and tps[1][1]["name"] == "5"
    assert _eval_type_name(nodes, by_pred, call["node_id"]) == call_type
    return nodes, by_pred, call


def test_invocation_without_call_target():  # inv2
    _assert_template_resolution(INV2, "double", "AUTO_DEDUCTION", "double")


def test_invocation_with_auto_deduction():  # inv3
    _assert_template_resolution(INV3, "double", "AUTO_DEDUCTION", "double")


def test_invocation_with_defaults():  # inv4
    _assert_template_resolution(INV4, "int", "DEFAULT", "int")


def test_invocation_with_partial_defaults():  # inv5
    _assert_template_resolution(INV5, "double", "EXPLICIT", "double")


def test_invocation_explicit_forces_cast():  # inv6
    nodes, by_pred, call = _assert_template_resolution(
        INV6, "int", "EXPLICIT", "int")
    args = [nodes[e["obj"]] for e in by_pred["ARGUMENTS"]
            if e["subj"] == call["node_id"]]
    assert len(args) == 1 and args[0]["label"] == "CastExpression"
    assert _eval_type_name(nodes, by_pred, args[0]["node_id"]) == "int"
    inner = [nodes[e["obj"]] for e in by_pred["AST"]
             if e["subj"] == args[0]["node_id"]
             and e["props"].get("field") == "EXPRESSION"]
    assert len(inner) == 1
    assert inner[0]["label"] == "Literal" and inner[0]["name"] == "20.3"


def test_invocation_with_implicit_cast():  # inv7
    g = _graph(INV7)
    nodes, by_pred = _index(g)
    # emission order == source order (call nodes carry no loc)
    calls = [n for n in g.nodes
             if n["label"] == "CallExpression" and n["name"] == "f"]
    assert len(calls) == 4
    f1, f2, f3, f4 = calls
    # the realization vs the plain overload
    real_ids = {e["obj"] for e in by_pred.get("REALIZATION", [])}
    fs = [n for n in nodes.values()
          if n["label"] == "FunctionDeclaration" and n["name"] == "f"]
    assert len(fs) == 2
    tpl_fn = next(n for n in fs if n["node_id"] in real_ids)
    nt_fn = next(n for n in fs if n["node_id"] not in real_ids)
    # f(1,2) -> non-template (exact)
    assert [t["node_id"] for t in
            _call_targets(nodes, by_pred, f1["node_id"])] == [nt_fn["node_id"]]
    # f('a','b') -> template (deduced T=char beats two casts)
    assert [t["node_id"] for t in
            _call_targets(nodes, by_pred, f2["node_id"])] == [tpl_fn["node_id"]]
    # f(1,'b') -> non-template with a materialized cast on arg 1
    assert [t["node_id"] for t in
            _call_targets(nodes, by_pred, f3["node_id"])] == [nt_fn["node_id"]]
    f3_args = sorted(((int(e["props"]["index"]), nodes[e["obj"]])
                      for e in by_pred["ARGUMENTS"]
                      if e["subj"] == f3["node_id"]))
    assert f3_args[0][1]["label"] == "Literal"
    assert f3_args[1][1]["label"] == "CastExpression"
    assert _eval_type_name(nodes, by_pred, f3_args[1][1]["node_id"]) == "int"
    # f<>(1,'b') -> no local resolution (deduction conflict under explicit
    # template syntax); survives as a mention for downstream inference
    assert not _call_targets(nodes, by_pred, f4["node_id"])
    assert any(m["mention_id"] == f4["node_id"] for m in g.mentions)


def test_function_template_in_method():
    g = _graph(METHOD_TEMPLATE)
    nodes, by_pred = _index(g)
    rec = next(n for n in nodes.values()
               if n["label"] == "RecordDeclaration" and n["name"] == "MyClass")
    tpls = [nodes[e["obj"]] for e in by_pred.get("TEMPLATES", [])
            if e["subj"] == rec["node_id"]]
    assert len(tpls) == 1
    assert tpls[0]["label"] == "FunctionTemplateDeclaration"
    params = [nodes[e["obj"]] for e in by_pred["PARAMETERS"]
              if e["subj"] == tpls[0]["node_id"]]
    assert len(params) == 2
    real = [nodes[e["obj"]] for e in by_pred["REALIZATION"]
            if e["subj"] == tpls[0]["node_id"]]
    assert len(real) == 1 and real[0]["label"] == "MethodDeclaration"


# --------------------------------------------------------------- class
# templates (ClassTemplateTest.java over classtemplates/{pair,array}.cpp)

PAIR = """
template<class Type1, class Type2>
class Pair
{
    public:
        Type1 first;
        Type2 second;
};

int main()
{
    Pair<int,int> point1;
    point1.first = 10;
    point1.second = 20;
}
"""

ARRAY = """
template<typename T, int N=10>
class Array
{
private:
\tT m_Array[N];
public:
\tint GetSize() const { return N; }
};

int main()
{
\tArray<int> array;
\tarray.GetSize();
}
"""


def test_class_template_structure():  # testClassTemplateStructure (pair.cpp)
    g = _graph(PAIR)
    nodes, by_pred = _index(g)
    tpl = next(n for n in nodes.values()
               if n["label"] == "ClassTemplateDeclaration")
    assert tpl["name"] == "Pair"
    params = [nodes[e["obj"]] for e in by_pred["PARAMETERS"]
              if e["subj"] == tpl["node_id"]]
    assert sorted(p["name"] for p in params) == ["Type1", "Type2"]
    assert all(p["label"] == "TypeParamDeclaration" for p in params)
    real = [nodes[e["obj"]] for e in by_pred["REALIZATION"]
            if e["subj"] == tpl["node_id"]]
    assert len(real) == 1
    assert real[0]["label"] == "RecordDeclaration" and real[0]["name"] == "Pair"
    # instance members resolve through the erased record
    # (point1.first -> FieldDeclaration first)
    refs = {nodes[e["subj"]]["name"]: nodes[e["obj"]]
            for e in by_pred["REFERS_TO"]
            if nodes[e["subj"]]["label"] == "MemberExpression"}
    assert refs["first"]["label"] == "FieldDeclaration"
    assert refs["second"]["label"] == "FieldDeclaration"
    # the declared variable evaluates to the template record's type
    point1 = next(n for n in nodes.values()
                  if n["label"] == "VariableDeclaration"
                  and n["name"] == "point1")
    assert _eval_type_name(nodes, by_pred, point1["node_id"]) == "Pair"


def test_class_template_value_param():  # testClassTemplateWithValueParameter
    g = _graph(ARRAY)
    nodes, by_pred = _index(g)
    tpl = next(n for n in nodes.values()
               if n["label"] == "ClassTemplateDeclaration")
    assert tpl["name"] == "Array"
    params = [nodes[e["obj"]] for e in by_pred["PARAMETERS"]
              if e["subj"] == tpl["node_id"]]
    n_param = next(p for p in params
                   if p["label"] == "ParamVariableDeclaration")
    assert n_param["name"] == "N"
    # default literal 10 flows into N
    dfg_in = [nodes[e["subj"]] for e in by_pred["DFG"]
              if e["obj"] == n_param["node_id"]]
    assert any(d["label"] == "Literal" and d["name"] == "10" for d in dfg_in)
    # array.GetSize() resolves against the template record's method
    call = next(n for n in nodes.values()
                if n["label"] == "MemberCallExpression"
                and n["name"] == "GetSize")
    tgts = _call_targets(nodes, by_pred, call["node_id"])
    assert len(tgts) == 1 and tgts[0]["label"] == "MethodDeclaration"
