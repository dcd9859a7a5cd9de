"""GENERICS type structure (ObjectType.java:82 @Relationship GENERICS;
TypeParser.java:838 removeGenerics): parameterized spellings become
erased-name Type nodes with indexed GENERICS edges to the argument types,
recursively — so "fields of type List<String>" is a structural query."""

from __future__ import annotations

from cpg_spark.frontends.cfamily_frontend import (
    parse_cpp_document,
    parse_java_document,
)
from cpg_spark.frontends.typeparser import erase_generics

JAVA_SRC = """import java.util.List;
import java.util.Map;

public class Box {
  List<String> names;
  List<Integer> counts;
  Map<String, List<Integer>> index;
  List<String> copy() { return names; }
}"""

PAIR_USE = """template <class T1, class T2> class Pair {
  public:
    T1 first;
};

int main() {
  Pair<int, int> point1;
  point1.first = 1;
  return 0;
}"""


def _index(g):
    nodes = {n["node_id"]: n for n in g.nodes}
    edges = {}
    for e in g.edges:
        edges.setdefault(e["pred"], []).append(e)
    return nodes, edges


def test_erase_generics():
    assert erase_generics("List<String>") == "List"
    assert erase_generics("Map<K,List<V>>[]") == "Map[]"
    assert erase_generics("int") == "int"
    assert erase_generics(None) is None


def test_generics_edges_recursive():
    nodes, edges = _index(parse_java_document("java/Box/1", 0, JAVA_SRC,
                                              None))
    types = {nid: n for nid, n in nodes.items() if n["label"] == "Type"}
    # parameterized node: erased name + spelling prop
    lst = [n for n in types.values()
           if n["props"].get("spelling") == "Map<String,List<Integer>>"]
    assert len(lst) == 1 and lst[0]["name"] == "Map"
    args = sorted(
        (int(e["props"]["index"]), types[e["obj"]]["props"].get(
            "spelling", types[e["obj"]]["name"]))
        for e in edges["GENERICS"] if e["subj"] == lst[0]["node_id"])
    assert args == [(0, "String"), (1, "List<Integer>")]
    # the nested argument decomposes again
    nested = [n for n in types.values()
              if n["props"].get("spelling") == "List<Integer>"]
    inner = [types[e["obj"]]["name"] for e in edges["GENERICS"]
             if e["subj"] == nested[0]["node_id"]]
    assert inner == ["Integer"]


def test_fields_of_type_list_string_structurally():
    """The dotted query the round-2 verdict asked for: fields whose type
    has raw name List and GENERICS[0] = String — a join, not a string
    match — finds exactly `names` (not `counts`, not `index`)."""
    nodes, edges = _index(parse_java_document("java/Box/1", 0, JAVA_SRC,
                                              None))
    types = {nid: n for nid, n in nodes.items() if n["label"] == "Type"}
    want = {
        tid for tid, t in types.items()
        if t["name"] == "List" and any(
            e["subj"] == tid and e["props"]["index"] == "0"
            and types[e["obj"]]["name"] == "String"
            for e in edges["GENERICS"])
    }
    fields = [
        nodes[e["subj"]]["name"] for e in edges["EVAL_TYPE"]
        if e["obj"] in want
        and nodes[e["subj"]]["label"] == "FieldDeclaration"
    ]
    assert fields == ["names"]


def test_template_instantiation_keeps_resolution_and_erased_name():
    """`Pair<int,int> point1;` — the declared variable's type node is
    named by the ERASED realization (reference ClassTemplateTest: the
    type IS Pair) while GENERICS carry the instantiation args, and
    member resolution through the erased record still works."""
    nodes, edges = _index(parse_cpp_document("cpp/pair/1", 0, PAIR_USE,
                                             None))
    types = {nid: n for nid, n in nodes.items() if n["label"] == "Type"}
    point1 = next(n for n in nodes.values()
                  if n["label"] == "VariableDeclaration"
                  and n["name"] == "point1")
    tids = [e["obj"] for e in edges["EVAL_TYPE"]
            if e["subj"] == point1["node_id"]]
    assert [types[t]["name"] for t in tids] == ["Pair"]
    assert types[tids[0]]["props"].get("spelling") == "Pair<int,int>"
    args = [types[e["obj"]]["name"] for e in edges["GENERICS"]
            if e["subj"] == tids[0]]
    assert args == ["int", "int"]
    # point1.first still resolves to the template record's field
    first = [e for e in edges["REFERS_TO"]
             if nodes[e["obj"]]["label"] == "FieldDeclaration"
             and nodes[e["obj"]]["name"] == "first"]
    assert first
