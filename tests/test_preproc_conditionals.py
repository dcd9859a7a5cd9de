"""Preprocessor conditional evaluation (#if/#ifdef/#ifndef/#elif/#else/
#endif) against the configuration symbol map (compdb -D defines +
in-source #define/#undef) — the reference reaches this via CDT's
IScannerInfo defined symbols; we drop inactive-branch tokens before
parsing (C11 6.10.1 constant-expression subset)."""

from __future__ import annotations

from cpg_spark import queries as Q
from cpg_spark.frontends.cfamily_frontend import parse_cpp_document

SRC = """
#ifdef USE_FAST
int fast_path(int x) { return x * 2; }
#else
int slow_path(int x) { return x + x; }
#endif

#if VERSION >= 2 && defined(FEATURE)
int v2_feature() { return 1; }
#elif VERSION == 1
int v1_only() { return 0; }
#else
int fallback() { return -1; }
#endif

#ifndef USE_FAST
int extra() { return 9; }
#endif
"""


def _fns(symbols):
    g = parse_cpp_document("d", 0, SRC, "m", symbols=symbols)
    return sorted(r["name"] for r in g.nodes
                  if r["label"] == "FunctionDeclaration" and r["name"])


def test_branch_selection_by_defines():
    assert _fns({"USE_FAST": "", "VERSION": "2", "FEATURE": ""}) == [
        "fast_path", "v2_feature"]
    assert _fns({"VERSION": "1"}) == ["extra", "slow_path", "v1_only"]
    assert _fns({}) == ["extra", "fallback", "slow_path"]


def test_in_source_define_undef_and_nesting():
    src = ("#define LOCAL 1\n"
           "#ifdef LOCAL\n"
           "#  ifdef MISSING\n"
           "int never() { return 0; }\n"
           "#  else\n"
           "int nested_else() { return 1; }\n"
           "#  endif\n"
           "#endif\n"
           "#undef LOCAL\n"
           "#ifdef LOCAL\n"
           "int gone() { return 0; }\n"
           "#endif\n")
    g = parse_cpp_document("d", 0, src, "m")
    fns = sorted(r["name"] for r in g.nodes
                 if r["label"] == "FunctionDeclaration" and r["name"])
    assert fns == ["nested_else"]


def test_includes_in_inactive_branch_are_dropped():
    src = ("#ifdef WIN32\n"
           "#include <windows.h>\n"
           "#else\n"
           "#include <unistd.h>\n"
           "#endif\n"
           "int main() { return 0; }\n")
    g = parse_cpp_document("d", 0, src, "m")
    incs = [r["name"] for r in g.nodes if r["label"] == "IncludeDeclaration"]
    assert incs == ["unistd.h"]


def test_compdb_driven_two_branch_golden(spark):
    rows = [tuple(r) for r in
            Q.q_cpg_preproc(spark, "/root/testdata/sf0.001").collect()]
    assert rows == [
        ("/src/fast.cpp", "always"),
        ("/src/fast.cpp", "fast_path"),
        ("/src/fast.cpp", "v2_feature"),
        ("/src/legacy.cpp", "always"),
        ("/src/legacy.cpp", "slow_path"),
        ("/src/legacy.cpp", "v1_only"),
    ]


def test_unterminated_ifdef_terminates():
    """An `#ifdef` with no `#endif` at file end (truncated/real-world
    code) must not starve the parser of its eof sentinel — previously an
    infinite loop (one pathological file would stall an executor task
    forever at corpus scale)."""
    from cpg_spark.frontends.cfamily_frontend import parse_cpp_document

    g = parse_cpp_document("t.cpp", 0,
                           "int x = 1;\n#ifdef NOPE\nint y = 2;\n")
    names = {n["name"] for n in g.nodes
             if n["label"] == "VariableDeclaration"}
    assert names == {"x"}  # y stays in the inactive branch
