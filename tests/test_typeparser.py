"""Type-string normalization (SURVEY U3) vs the reference's
TypeTests.java createFromC/createFromJava semantics."""

from __future__ import annotations

from cpg_spark.frontends.typeparser import normalize_type as n


def test_whitespace_variants_unify():
    assert n("char *p;") == n("char* p") == n("char * p") == "char*"


def test_qualifier_position_distinguishes():
    # TypeTests Test 4 vs Test 5: pointer-to-const != const-pointer
    assert n("const char *p;") == "const char*"
    assert n("char * const p;") == "char*const"
    assert n("const char *p;") != n("char * const p;")


def test_paren_declarator_binds_inner():
    # TypeTests Test 2: char (* const a)[] = const pointer to array
    assert n("char (* const a)[]") == "char[]*const"
    assert n("char *a[]") == "char*[]"  # array of pointers — different


def test_function_pointer_forms_unify():
    # TypeTests Test 1 / 1.1
    assert (n("void (*single_param)(int)")
            == n("void ((*single_param)(int))")
            == "void(*)(int)")


def test_implied_int_expansion():
    assert n("unsigned") == n("unsigned int") == "unsigned int"
    assert n("long") == n("long int") == "long int"
    assert n("unsigned long long") == n("unsigned long long int")
    assert n("signed int") == "int"
    assert n("signed char") == "signed char"  # distinct from char in C


def test_namespaces_and_generics():
    assert n("std::vector<int>") == "std.vector<int>"
    assert n("std::map< std::string , int >") == "std.map<std.string,int>"
    assert n("List<String>") == "List<String>"


def test_elaborated_and_storage_dropped():
    assert n("struct Foo *") == "Foo*"
    assert n("static const unsigned short x") == "const unsigned short int"


def test_go_forms_pass_through():
    assert n("[]int") == "[]int"
    assert n("*Worker") == "*Worker"
    assert n("map[string]int") == "map[string]int"


def test_cfamily_frontend_emits_canonical_types():
    from cpg_spark.frontends.cfamily_frontend import parse_cpp_document

    src = ("unsigned long long big = 1;\n"
           "const char *msg = \"x\";\n"
           "long int count = 2;\n")
    g = parse_cpp_document("cpp/tn/0001", 0, src, None)
    type_names = {node["name"] for node in g.nodes
                  if node["label"] == "Type"}
    assert "unsigned long long int" in type_names
    assert "const char*" in type_names
    assert "long int" in type_names
