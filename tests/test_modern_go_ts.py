"""Round-4 robustness: modern Go (generics, range-for, select,
type switches, tuple assignment, struct tags) and modern TS (generic
functions, generators, as/satisfies casts) parse with zero Problem
nodes and the expected graph shapes.

Reference parity notes: range loops -> ForEachStatement with VARIABLE/
ITERABLE (statements/ForEachStatement.java); select -> SwitchStatement
whose cases carry the comm statement; `x.(type)` -> CastExpression
guard; tuple `q, err := f()` -> one DeclarationStatement with a
VariableDeclaration per name, rhs DFG into each."""

from __future__ import annotations

from cpg_spark.frontends.go_frontend import parse_go_document
from cpg_spark.frontends.ts_frontend import parse_ts_document


def _probs(g):
    return [n for n in g.nodes if "Problem" in (n.get("label") or "")]


def test_go_modern_constructs_parse_clean():
    snippets = {
        "generics": "package m\nfunc Map[T any, U any](xs []T, f func(T)"
                    " U) []U {\n\tout := make([]U, 0, len(xs))\n\tfor _,"
                    " x := range xs {\n\t\tout = append(out, f(x))\n\t}\n"
                    "\treturn out\n}",
        "generic_type": "package m\ntype Pair[K any, V any] struct "
                        "{ K K; V V }\nfunc (p *Pair[K, V]) Get() V "
                        "{ return p.V }",
        "goroutine_select": "package m\nfunc f() {\n\tch := make(chan"
                            " int, 3)\n\tgo func() { ch <- 1 }()\n\t"
                            "select {\n\tcase v := <-ch:\n\t\tuse(v)\n\t"
                            "default:\n\t}\n}",
        "select_send_recv2": "package m\nfunc f(a chan int, b chan int)"
                             " {\n\tselect {\n\tcase a <- 1:\n\tcase v,"
                             " ok := <-b:\n\t\t_ = v\n\t\t_ = ok\n\t}\n}",
        "type_switch": "package m\nfunc f(x interface{}) int {\n\tswitch"
                       " v := x.(type) {\n\tcase int:\n\t\treturn v\n\t"
                       "default:\n\t\treturn 0\n\t}\n}",
        "struct_tags_embed": "package m\ntype A struct{ X int }\ntype B"
                             " struct {\n\t*A\n\tY int `json:\"y\"`\n}",
        "tuple_assign": "package m\nfunc f() {\n\ta, b := 1, 2\n\ta, b ="
                        " b, a\n\t_ = a\n\t_ = b\n}",
        "range_forms": "package m\nfunc f(xs []int, m map[string]int,"
                       " ch chan int) int {\n\ts := 0\n\tfor i := range"
                       " xs {\n\t\ts += xs[i]\n\t}\n\tfor k, v := range"
                       " m {\n\t\t_ = k\n\t\ts += v\n\t}\n\tfor range ch"
                       " {\n\t\ts++\n\t}\n\treturn s\n}",
    }
    for name, src in snippets.items():
        g = parse_go_document(name + ".go", 0, src)
        assert not _probs(g), (name, [p["name"] for p in _probs(g)])


def test_go_range_foreach_shape():
    g = parse_go_document("r.go", 0,
                          "package m\nfunc f(m map[string]int) int {\n"
                          "\ts := 0\n\tfor k, v := range m {\n\t\t_ = k"
                          "\n\t\ts += v\n\t}\n\treturn s\n}")
    fe = [n for n in g.nodes if n["label"] == "ForEachStatement"]
    assert len(fe) == 1
    var_edges = [e for e in g.edges
                 if e["pred"] == "AST" and e["subj"] == fe[0]["node_id"]
                 and e["props"].get("field") == "VARIABLE"]
    assert len(var_edges) == 2  # k and v both declare
    names = {n["name"] for n in g.nodes
             if n["node_id"] in {e["obj"] for e in var_edges}}
    assert names == {"k", "v"}
    # both loop vars resolve inside the body (no dangling refs): s += v
    # gives v a REFERS_TO through the local pass
    it_edges = [e for e in g.edges
                if e["pred"] == "AST" and e["subj"] == fe[0]["node_id"]
                and e["props"].get("field") == "ITERABLE"]
    assert len(it_edges) == 1


def test_go_tuple_short_decl_declares_both():
    g = parse_go_document("t.go", 0,
                          "package m\nfunc g() (int, int) { return 1, 2 }"
                          "\nfunc f() int {\n\tq, err := g()\n\treturn"
                          " q + err\n}")
    assert not _probs(g)
    decls = sorted(n["name"] for n in g.nodes
                   if n["label"] == "VariableDeclaration")
    assert decls == ["err", "q"]
    # the call initializer DFG-flows into BOTH names
    call = next(n for n in g.nodes if n["label"] == "CallExpression"
                and n["name"] == "g")
    targets = {e["obj"] for e in g.edges
               if e["pred"] == "DFG" and e["subj"] == call["node_id"]}
    vids = {n["node_id"] for n in g.nodes
            if n["label"] == "VariableDeclaration"}
    assert len(targets & vids) == 2


def test_go_select_is_switch_with_cases():
    g = parse_go_document("s.go", 0,
                          "package m\nfunc f(a chan int) {\n\tselect {\n"
                          "\tcase v := <-a:\n\t\t_ = v\n\tdefault:\n\t}"
                          "\n}")
    sw = [n for n in g.nodes if n["label"] == "SwitchStatement"]
    assert len(sw) == 1 and sw[0]["props"].get("select") == "true"
    labels = sorted(n["label"] for n in g.nodes
                    if n["label"] in ("CaseStatement", "DefaultStatement"))
    assert labels == ["CaseStatement", "DefaultStatement"]


def test_ts_modern_constructs_parse_clean():
    snippets = {
        "generic_fn": "function prop<T, K extends keyof T>(o: T, k: K):"
                      " T[K] { return o[k]; }",
        "generator": "function* gen() { yield 1; yield* other(); }",
        "async_generator": "async function* s() { yield await one(); }",
        "class_generator": "class C { *gen() { yield 1; } }",
        "as_const": "const t = [1, 2] as const;",
        "as_chain": "const y = getV() as any as string;",
        "satisfies": "const cfg = { port: 8080 } satisfies"
                     " Record<string, number>;",
        "nested_generic_cast": "function pick<T extends Record<string,"
                               " unknown>>(o: T): Array<keyof T> "
                               "{ return Object.keys(o) as Array<keyof"
                               " T>; }",
    }
    for name, src in snippets.items():
        g = parse_ts_document(name + ".ts", 0, src)
        assert not _probs(g), (name, [p["name"] for p in _probs(g)])


def test_ts_as_cast_shape():
    g = parse_ts_document("c.ts", 0, "const x = getV() as MyType;")
    casts = [n for n in g.nodes if n["label"] == "CastExpression"]
    assert len(casts) == 1 and casts[0]["name"] == "as"
    # the value DFG-flows into the cast (CastExpression.java:60)
    call = next(n for n in g.nodes if n["label"] == "CallExpression")
    assert any(e["pred"] == "DFG" and e["subj"] == call["node_id"]
               and e["obj"] == casts[0]["node_id"] for e in g.edges)


def test_ts_generic_classes_and_interfaces_parse_clean():
    snippets = {
        "generic_class": "class C<T> { x?: T; m<U>(v: U): U"
                         " { return v; } }",
        "generic_iface": "interface I<T extends object = {}> extends"
                         " B<T>, C { m<U>(x: U): U; }",
        "abstract": "export default abstract class C<T>"
                    " { abstract f(): T; }",
        "impl_list": "class C<T> extends B implements P, Q<T> { }",
        "declare_fn": "declare function f(x: number): void;",
        "computed_member": 'class C { ["dyn" + k]() { return 1; } }',
        "static_block": "class C { static { init(); } }",
        "new_target": "function f() { if (new.target) { } }",
        "non_null": "const v = a!.b; f(x!);",
        "for_empty_clauses": "for (;;) { break; }",
        "labeled_break": "outer: for (;;) { break outer; }",
    }
    for name, src in snippets.items():
        g = parse_ts_document(name + ".ts", 0, src)
        assert not _probs(g), (name, _probs(g))


def test_ts_switch_statement_shape():
    g = parse_ts_document("s.ts", 0,
                          'switch (x) { case 1: break; case "a": f();'
                          " break; default: g(); }")
    assert not _probs(g)
    labels = [n["label"] for n in g.nodes]
    assert labels.count("SwitchStatement") == 1
    assert labels.count("CaseStatement") == 2
    assert labels.count("DefaultStatement") == 1
    assert "CallExpression" in labels  # f()/g() still resolve as calls
    sw = next(n for n in g.nodes if n["label"] == "SwitchStatement")
    # selector DFG feeds the switch (handleSwitchStatement)
    assert any(e["pred"] == "DFG" and e["obj"] == sw["node_id"]
               for e in g.edges)


def test_ts_try_catch_finally_shape():
    g = parse_ts_document("t.ts", 0,
                          "try { f(); } catch (e) { g(e); }"
                          " finally { h(); }")
    assert not _probs(g)
    labels = [n["label"] for n in g.nodes]
    assert labels.count("TryStatement") == 1
    assert labels.count("CatchClause") == 1
    tr = next(n for n in g.nodes if n["label"] == "TryStatement")
    cat = next(n for n in g.nodes if n["label"] == "CatchClause")
    assert any(e["pred"] == "AST" and e["subj"] == tr["node_id"]
               and e["obj"] == cat["node_id"] for e in g.edges)
    # the catch binding is a scoped VariableDeclaration the body resolves
    binding = next(n for n in g.nodes
                   if n["label"] == "VariableDeclaration"
                   and n["name"] == "e")
    refs = [n for n in g.nodes
            if n["label"] == "DeclaredReferenceExpression"
            and n["name"] == "e"]
    assert refs and any(
        e["pred"] == "REFERS_TO" and e["subj"] == refs[0]["node_id"]
        and e["obj"] == binding["node_id"] for e in g.edges)


def test_ts_angle_cast_vs_jsx():
    g = parse_ts_document("c.ts", 0, "const n = <number>x;")
    casts = [n for n in g.nodes if n["label"] == "CastExpression"]
    assert len(casts) == 1 and not _probs(g)
    # JSX elements keep parsing as JSX, not casts
    g2 = parse_ts_document("c.tsx", 0,
                           'const el = <div className="x">hello</div>;')
    assert not _probs(g2)
    assert not [n for n in g2.nodes if n["label"] == "CastExpression"]


def test_go_interface_embedding_variadic_slices_switch_init():
    """Round-4 hunt: four everyday Go constructs that previously failed
    whole-file — interface embedding (SUPER_TYPE per go spec "Embedded
    interfaces"), variadic params (slice-typed), slice expressions
    (ArrayRangeExpression subscript), and switch-with-init."""
    cases = {
        "iface_embed": "package m\ntype RW interface {\n\tio.Reader\n"
                       "\tio.Writer\n\tClose() error\n}",
        "variadic": "package m\nfunc sum(xs ...int) int {\n\tt := 0\n"
                    "\tfor _, x := range xs { t += x }\n\treturn t\n}",
        "slices": "package m\nfunc f(xs []int) []int {\n\tys := "
                  "xs[1:3]\n\tys = append(ys, xs[:2]...)\n\treturn "
                  "ys[:len(ys)-1]\n}",
        "slice_full": "package m\nfunc f(xs []int) []int "
                      "{ return xs[1:2:3] }",
        "switch_init": "package m\nfunc f(x int) string {\n\tswitch y"
                       " := x * 2; {\n\tcase y > 10:\n\t\treturn \"b\""
                       "\n\tdefault:\n\t\treturn \"s\"\n\t}\n}",
        "switch_init_tag": "package m\nfunc f(x int) int {\n\tswitch"
                           " y := g(x); y {\n\tcase 1:\n\t\treturn y\n"
                           "\t}\n\treturn 0\n}",
    }
    for name, src in cases.items():
        g = parse_go_document(name + ".go", 0, src)
        assert not _probs(g), (name, _probs(g))
    g = parse_go_document("i.go", 0,
                          "package m\ntype RW interface {\n\tio.Reader\n"
                          "\tClose() error\n}")
    assert sum(1 for e in g.edges if e["pred"] == "SUPER_TYPE") == 1
    g = parse_go_document("s.go", 0,
                          "package m\nfunc f(xs []int) []int "
                          "{ return xs[1:3] }")
    rng = [n for n in g.nodes if n["label"] == "ArrayRangeExpression"]
    assert len(rng) == 1
    # floor and ceiling literals hang off the range
    kids = [e["obj"] for e in g.edges if e["pred"] == "AST"
            and e["subj"] == rng[0]["node_id"]]
    assert len(kids) == 2
    # variadic param is slice-typed
    g = parse_go_document("v.go", 0,
                          "package m\nfunc sum(xs ...int) int "
                          "{ return 0 }")
    p = next(n for n in g.nodes
             if n["label"] == "ParamVariableDeclaration")
    tids = [e["obj"] for e in g.edges
            if e["pred"] == "EVAL_TYPE" and e["subj"] == p["node_id"]]
    tnames = [n["name"] for n in g.nodes if n["node_id"] in tids]
    assert tnames and "int" in tnames[0] and "[]" in tnames[0], tnames


def test_go_func_literal_is_lambda():
    """Closures in expression position are LambdaExpressions wrapping an
    implicit FunctionDeclaration with a genuinely parsed body (was:
    TypeExpression + composite-literal garbage that broke on multiline
    bodies)."""
    src = ("package m\nfunc f() {\n\terr := fs.WalkDir(root, p, "
           "func(p string, d fs.DirEntry, err error) error {\n"
           "\t\tif err != nil {\n\t\t\treturn err\n\t\t}\n"
           "\t\treturn nil\n\t})\n\t_ = err\n}")
    g = parse_go_document("w.go", 0, src)
    assert not _probs(g)
    lam = next(n for n in g.nodes if n["label"] == "LambdaExpression")
    fn = next(n for n in g.nodes if n["label"] == "FunctionDeclaration"
              and n["name"].startswith("<func"))
    assert any(e["pred"] == "AST" and e["subj"] == lam["node_id"]
               and e["obj"] == fn["node_id"] for e in g.edges)
    # the literal's params declare into its scope and the body's `err`
    # read resolves to the param, not an outer name
    params = [n for n in g.nodes
              if n["label"] == "ParamVariableDeclaration"]
    assert {p["name"] for p in params} >= {"p", "d", "err"}
    # body genuinely parsed: an IfStatement and ReturnStatements exist
    labels = [n["label"] for n in g.nodes]
    assert "IfStatement" in labels and "ReturnStatement" in labels
    # func TYPES stay types: no lambda for a func-typed param
    g2 = parse_go_document("t.go", 0,
                           "package m\nfunc f(cb func(int) error)"
                           " { _ = cb }")
    assert not [n for n in g2.nodes
                if n["label"] == "LambdaExpression"]


def test_ts_js_idioms_from_npm_corpus():
    """Constructs the npm-codebase sweep exposed: async arrows (arg and
    bare-param), do-while, optional-chain subscripts/calls, nested
    destructuring with aliases+defaults, spread-in-object inside class
    methods, destructured for-of, keyword-safe ASI, arrow return-type
    annotations. 100 real npm lib files parse at zero problems."""
    cases = {
        "async_arrow": "p.then(async () => { const e = await f();"
                       " if (!e) { throw x } })",
        "async_bare": "xs.map(async m => { if (!m) { return } })",
        "do_while": "do {\n  n = s.indexOf(sep, l)\n} while (n !== -1)",
        "opt_chain": "const v = manifest?.bin?.[cmd]?.(n)",
        "nested_destr": "const { engines: { node: engines }, version }"
                        " = require('./package.json')",
        "destr_default": "const { a = 1, b: { c = 2 } } = o;",
        "spread_in_method": "class E { m() { o.x = {\n  ...(o.x || {}),"
                            "\n}\nif (!y) { g() } } }",
        "destr_for_of": "for (const [key, val] of Object.entries(o))"
                        " { use(key, val); }",
        "asi_var": "var\n/* c */\nx = f(require('./m'))\n;",
        "arrow_ret_type": "const g = (x: number): string => String(x);",
        "obj_method_shorthand": "const o = { greet(n) { return n },"
                                " k: 1 };",
        "regex_after_or": "const ok = (!p || /^\\.@/.test(p));",
    }
    for name, src in cases.items():
        g = parse_ts_document(name + ".ts", 0, src)
        assert not _probs(g), (name, _probs(g))
    g = parse_ts_document("d.js", 0, "do { f() } while (x)")
    assert [n for n in g.nodes if n["label"] == "DoStatement"]
    g2 = parse_ts_document("a.js", 0, "p.then(async () => { g() })")
    assert [n for n in g2.nodes if n["label"] == "LambdaExpression"]


# ---- round-5 ADVICE regressions ------------------------------------------

def _ts(src, doc="t.ts"):
    from cpg_spark.frontends.ts_frontend import parse_ts_document
    return parse_ts_document(doc, 0, src)


def test_jsx_multitoken_text_is_not_a_cast():
    # <p>hello world</p> used to satisfy _looks_like_angle_cast (only
    # toks[j+2]/toks[j+3] were checked) and emit a bogus CastExpression
    g = _ts("function C() { return <p>hello world</p>; }\n", "t.tsx")
    assert not [n for n in g.nodes if n["label"] == "CastExpression"]
    assert [n for n in g.nodes
            if n["label"] == "Expression" and n["props"].get("jsx")]
    # the single-token legacy cast form still parses as a cast
    g2 = _ts("const x = <string>someVal;\n")
    assert [n for n in g2.nodes if n["label"] == "CastExpression"]


def test_nested_destructured_param_binds_inner_name():
    # `{a: {b}}` bound the outer key `a`; the recursive collector now
    # binds the inner name and the body reference resolves
    g = _ts("function f({a: {b}}) { return b; }\n")
    params = [n for n in g.nodes if n["label"] == "ParameterDeclaration"]
    assert [p["name"] for p in params] == ["b"]
    assert any(e["pred"] == "REFERS_TO" and e["obj"] == params[0]["node_id"]
               for e in g.edges)


def test_arrow_with_generic_return_type():
    # `(x): Map<string, number> => ...` — the return-type scan now
    # tracks angle depth instead of stopping at the ','
    for src in ("const f = (x): Map<string, number> => new Map();\n",
                "const g = async (x): Map<string, number> => x;\n"):
        g = _ts(src)
        assert [n for n in g.nodes if n["label"] == "LambdaExpression"], src
