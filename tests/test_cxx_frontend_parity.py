"""CXXLanguageFrontendTest parity — the reference's core C++ frontend
test, ported over its own fixtures (cpg-core/src/test/resources/*):

* testCast (components/castexpr.cpp): C-style AND named casts
  (static_cast / reinterpret_cast) are CastExpressions whose castType
  rides EVAL_TYPE (CXXLanguageFrontendTest.java:208-258).
* testTypeId (typeidexpr.cpp): sizeof/typeid/alignof over a TYPE are
  TypeIdExpressions typed std::size_t / const std::type_info&
  (:173-205).
* testUnaryOperator (unaryoperator.cpp): sizeof over a declared VALUE is
  a prefix UnaryOperator; postfix/prefix ++/--, !, * dereference
  (:632-702).
* testArrays (arrays.cpp): `int x[] = {1,2,3}` initializer is an
  InitializerListExpression with 3 literal children; x[0] subscripts x
  (:260-291).
* testDesignatedInitializer (components/designatedInitializer.c):
  `.y = 0` / `[3] = 1` elements are DesignatedInitializerExpressions
  with designator lhs (field ref / literal index) and literal rhs
  (:1032-1141).
* testForEach (components/foreachstmt.cpp): range-for declares the loop
  variable and iterates the referenced vector (:105-136).
* testTryCatch (components/trystmt.cpp): three CatchClauses — named,
  unnamed, catch-all (:139-171).
"""

from __future__ import annotations

from cpg_spark.frontends.cfamily_frontend import parse_cpp_document

CASTEXPR_CPP = """
int main() {
  ExtendedClass* e = new ExtendedClass();
  BaseClass* b = (BaseClass*) e;
  b = static_cast<BaseClass*>(e);
  b = reinterpret_cast<BaseClass*>(e);
  int d = (int) 0.4f;
}
"""

TYPEIDEXPR_CPP = """
int main() {
  int i = sizeof(myClass);
  const std::type_info& typeInfo = typeid(myClass);
  int j = alignof(A);
  int k = typeof(A);
}
"""

UNARYOPERATOR_CPP = """
int main() {
  int a;

  a++;
  --a;

  int len = sizeof(a);

  bool b = !false;

  int* ptr = 0;

  b = *ptr;
}
"""

ARRAYS_CPP = """
int main() {
  int x[] = { 1, 2, 3 };

  x[0];
}
"""

DESIGNATED_C = """
struct Point
{
    int x, y, z;
};

int main()
{
    struct Point p1 = {.y = 0, .z = 1, .x = 2};
    struct Point p2 = {.x = 20};
    int foo2[10] = { [3] = 1, [5] = 2 };

    return 0;
}
"""

FOREACH_CPP = """
int main(){
  std::vector<int> ls;

  for(auto i : ls) printf("%d\\n", i);
}
"""

TRYSTMT_CPP = """
int main() {
  try {
    some_dangerous_operation();
  } catch(const std::exception& e) {
  } catch(const std::exception&) {
  } catch(...) {
  }
}
"""


def _graph(src):
    return parse_cpp_document("cpp/parity/0001", 1, src, None)


def _index(g):
    nodes = {n["node_id"]: n for n in g.nodes}
    edges = {}
    for e in g.edges:
        edges.setdefault(e["pred"], []).append(e)
    return nodes, edges


def _children(edges, nodes, nid, field=None, label=None):
    out = []
    for e in edges.get("AST", []):
        if e["subj"] != nid:
            continue
        if field and e["props"].get("field") != field:
            continue
        n = nodes[e["obj"]]
        if label and n["label"] != label:
            continue
        out.append((int(e["props"].get("index", 0)), n))
    return [n for _, n in sorted(out, key=lambda p: p[0])]


def _eval_type(edges, nodes, nid):
    for e in edges.get("EVAL_TYPE", []):
        if e["subj"] == nid:
            return nodes[e["obj"]]["name"]
    return None


def _initializer(edges, nodes, var):
    kids = _children(edges, nodes, var["node_id"], field="INITIALIZER")
    return kids[0] if kids else None


def _var(nodes, name):
    vs = [n for n in nodes.values()
          if n["label"] == "VariableDeclaration" and n["name"] == name]
    assert vs, name
    return vs[0]


def test_cast():
    nodes, edges = _index(_graph(CASTEXPR_CPP))
    casts = [n for n in nodes.values() if n["label"] == "CastExpression"]
    assert len(casts) == 4
    # b's initializer: C-style cast with castType BaseClass*
    b_init = _initializer(edges, nodes, _var(nodes, "b"))
    assert b_init["label"] == "CastExpression"
    assert _eval_type(edges, nodes, b_init["node_id"]) == "BaseClass*"
    # named casts keep the keyword as the node name
    names = sorted(c["name"] for c in casts)
    assert "static_cast" in names and "reinterpret_cast" in names
    for c in casts:
        if c["name"] in ("static_cast", "reinterpret_cast"):
            assert _eval_type(edges, nodes, c["node_id"]) == "BaseClass*"
            # the cast input flows into the cast (CastExpression.java:60)
            ins = [e for e in edges["DFG"] if e["obj"] == c["node_id"]]
            assert ins
    # d's initializer: (int) 0.4f
    d_init = _initializer(edges, nodes, _var(nodes, "d"))
    assert d_init["label"] == "CastExpression"
    assert _eval_type(edges, nodes, d_init["node_id"]) == "int"
    # e's initializer is the NewExpression wrapping the construct
    # (testObjectCreation shape)
    e_init = _initializer(edges, nodes, _var(nodes, "e"))
    assert e_init["label"] == "NewExpression"
    nested = _children(edges, nodes, e_init["node_id"], field="INITIALIZER")
    assert nested and nested[0]["label"] == "ConstructExpression"


def test_type_id():
    nodes, edges = _index(_graph(TYPEIDEXPR_CPP))
    i_init = _initializer(edges, nodes, _var(nodes, "i"))
    assert i_init["label"] == "TypeIdExpression"
    assert i_init["name"] == "sizeof"
    assert _eval_type(edges, nodes, i_init["node_id"]) == "std::size_t"
    ti_init = _initializer(edges, nodes, _var(nodes, "typeInfo"))
    assert ti_init["label"] == "TypeIdExpression"
    assert ti_init["name"] == "typeid"
    assert "type_info" in _eval_type(edges, nodes, ti_init["node_id"])
    j_init = _initializer(edges, nodes, _var(nodes, "j"))
    assert j_init["label"] == "TypeIdExpression"
    assert j_init["name"] == "alignof"
    assert _eval_type(edges, nodes, j_init["node_id"]) == "std::size_t"


def test_unary_operator():
    nodes, edges = _index(_graph(UNARYOPERATOR_CPP))
    unaries = {(n["props"].get("operator"), n["props"].get("postfix"))
               for n in nodes.values() if n["label"] == "UnaryOperator"}
    assert ("++", "true") in unaries     # a++ postfix
    assert ("--", "false") in unaries    # --a prefix
    assert ("!", "false") in unaries
    assert ("*", "false") in unaries     # *ptr dereference
    # sizeof over the declared value `a` is a UnaryOperator, NOT a
    # TypeIdExpression (testUnaryOperator vs testTypeId)
    len_init = _initializer(edges, nodes, _var(nodes, "len"))
    assert len_init["label"] == "UnaryOperator"
    assert len_init["props"].get("operator") == "sizeof"
    assert len_init["props"].get("postfix") == "false"
    inputs = _children(edges, nodes, len_init["node_id"], field="INPUT")
    assert inputs and inputs[0]["name"] == "a"
    assert not [n for n in nodes.values()
                if n["label"] == "TypeIdExpression"]


def test_arrays():
    nodes, edges = _index(_graph(ARRAYS_CPP))
    x = _var(nodes, "x")
    assert _eval_type(edges, nodes, x["node_id"]) == "int[]"
    ile = _initializer(edges, nodes, x)
    assert ile["label"] == "InitializerListExpression"
    inits = _children(edges, nodes, ile["node_id"], field="INITIALIZERS")
    assert [n["name"] for n in inits] == ["1", "2", "3"]
    # each element flows into the list (InitializerListExpression.java:81)
    for n in inits:
        assert any(e["subj"] == n["node_id"] and e["obj"] == ile["node_id"]
                   for e in edges["DFG"])
    ase = [n for n in nodes.values()
           if n["label"] == "ArraySubscriptionExpression"]
    assert len(ase) == 1
    sub = _children(edges, nodes, ase[0]["node_id"],
                    field="SUBSCRIPT_EXPRESSION")
    assert sub and sub[0]["name"] == "0"
    arr = _children(edges, nodes, ase[0]["node_id"],
                    field="ARRAY_EXPRESSION")
    assert arr and arr[0]["name"] == "x"


def test_designated_initializer():
    nodes, edges = _index(_graph(DESIGNATED_C))
    p1 = _initializer(edges, nodes, _var(nodes, "p1"))
    assert p1["label"] == "InitializerListExpression"
    dies = _children(edges, nodes, p1["node_id"], field="INITIALIZERS")
    assert [d["label"] for d in dies] == \
        ["DesignatedInitializerExpression"] * 3
    expected = [("y", "0"), ("z", "1"), ("x", "2")]
    for die, (fld, val) in zip(dies, expected):
        lhs = _children(edges, nodes, die["node_id"], field="LHS")
        rhs = _children(edges, nodes, die["node_id"], field="RHS")
        assert lhs[0]["label"] == "DeclaredReferenceExpression"
        assert lhs[0]["name"] == fld
        assert rhs[0]["label"] == "Literal" and rhs[0]["name"] == val
    p2 = _initializer(edges, nodes, _var(nodes, "p2"))
    dies2 = _children(edges, nodes, p2["node_id"], field="INITIALIZERS")
    assert len(dies2) == 1
    foo2 = _initializer(edges, nodes, _var(nodes, "foo2"))
    dies3 = _children(edges, nodes, foo2["node_id"], field="INITIALIZERS")
    assert len(dies3) == 2
    for die, (idx, val) in zip(dies3, [("3", "1"), ("5", "2")]):
        lhs = _children(edges, nodes, die["node_id"], field="LHS")
        rhs = _children(edges, nodes, die["node_id"], field="RHS")
        assert lhs[0]["label"] == "Literal" and lhs[0]["name"] == idx
        assert rhs[0]["label"] == "Literal" and rhs[0]["name"] == val


def test_foreach():
    nodes, edges = _index(_graph(FOREACH_CPP))
    fes = [n for n in nodes.values() if n["label"] == "ForEachStatement"]
    assert len(fes) == 1
    ls = _var(nodes, "ls")
    assert "vector" in (_eval_type(edges, nodes, ls["node_id"]) or "")
    # the loop declares i
    _var(nodes, "i")


OBJCREATION_CPP = """
int method();

class Integer {
private:
  int i;

public:
  Integer(int i) {
    this->i = i;
  }

  int method();

  int getI() {
    return i;
  }

};

int method() {
  return 2;
}

int main() {
  Integer i(4);
  i.getI();

  Integer j(method());

  int k = 4;

  auto l = new Integer(k);
}
"""

JAVA_ARRAYS = """
public class Arrays {

  public static void main(String[] args) {
    int[] a = new int[] {1};

    int b = a[0];
  }

}
"""


def test_object_creation():
    """testObjectCreation (CXXLanguageFrontendTest.java:951-1008): `new
    Integer(k)` is a NewExpression typed Integer* whose INITIALIZER is a
    ConstructExpression typed Integer with argument k."""
    nodes, edges = _index(_graph(OBJCREATION_CPP))
    i = _var(nodes, "i")
    i_init = _initializer(edges, nodes, i)
    assert i_init["label"] == "ConstructExpression"
    assert _eval_type(edges, nodes, i_init["node_id"]) == "Integer"
    l_init = _initializer(edges, nodes, _var(nodes, "l"))
    assert l_init["label"] == "NewExpression"
    assert _eval_type(edges, nodes, l_init["node_id"]) == "Integer*"
    ctor = _children(edges, nodes, l_init["node_id"], field="INITIALIZER")
    assert ctor and ctor[0]["label"] == "ConstructExpression"
    assert _eval_type(edges, nodes, ctor[0]["node_id"]) == "Integer"
    args = _children(edges, nodes, ctor[0]["node_id"], field="ARGUMENTS")
    assert args and args[0]["name"] == "k"
    # the construct expression flows into the new expression
    assert any(e["subj"] == ctor[0]["node_id"]
               and e["obj"] == l_init["node_id"] for e in edges["DFG"])


def test_java_arrays():
    """JavaLanguageFrontendTest testArrays (compiling/Arrays.java): the
    `new int[] {1}` initializer is an ArrayCreationExpression whose
    INITIALIZER is an InitializerListExpression with one int literal;
    a[0] subscripts a."""
    from cpg_spark.frontends.cfamily_frontend import parse_java_document

    g = parse_java_document("java/parity/0001", 1, JAVA_ARRAYS, None)
    nodes, edges = _index(g)
    a = _var(nodes, "a")
    ace = _initializer(edges, nodes, a)
    assert ace["label"] == "ArrayCreationExpression"
    ile = _children(edges, nodes, ace["node_id"], field="INITIALIZER")
    assert ile and ile[0]["label"] == "InitializerListExpression"
    inits = _children(edges, nodes, ile[0]["node_id"], field="INITIALIZERS")
    assert [n["name"] for n in inits] == ["1"]
    ase = [n for n in nodes.values()
           if n["label"] == "ArraySubscriptionExpression"]
    assert len(ase) == 1
    sub = _children(edges, nodes, ase[0]["node_id"],
                    field="SUBSCRIPT_EXPRESSION")
    assert sub and sub[0]["name"] == "0"


def test_try_catch():
    nodes, edges = _index(_graph(TRYSTMT_CPP))
    tries = [n for n in nodes.values() if n["label"] == "TryStatement"]
    assert len(tries) == 1
    catches = [n for n in nodes.values() if n["label"] == "CatchClause"]
    assert len(catches) == 3
    # named exception parameter e on the first clause
    assert [n for n in nodes.values()
            if n["label"] == "VariableDeclaration" and n["name"] == "e"]
