"""Reference function-template fixtures
(``cpg-core/src/test/resources/templates/functiontemplates/``) adapted to
the subset grammar — shared by tests/test_templates.py and the
registered ``cpg_template_calls`` query."""

from __future__ import annotations

TEMPLATE_HEADER = """
template <class T=int, int N=5>
T fixed_multiply (T val)
{
  auto x = val * N;
  return x;
}
"""

INV1 = TEMPLATE_HEADER + """
double fixed_multiply(double val) {
\treturn val*100;
}

int main() {
  fixed_multiply(10.0);
}
"""

INV2 = TEMPLATE_HEADER + """
int main() {
  fixed_multiply(10.0);
}
"""

INV3 = TEMPLATE_HEADER + """
int main() {
  fixed_multiply<>(10.3);
}
"""

# invocation4's template takes no value parameter (returns 8 * N)
INV4 = """
template <class T=int, int N=5>
T fixed_multiply ()
{
  return 8 * N;
}

int main() {
  fixed_multiply<>();
}
"""

INV5 = TEMPLATE_HEADER + """
int main() {
  fixed_multiply<double>(20.5);
}
"""

INV6 = TEMPLATE_HEADER + """
int main() {
  fixed_multiply<int>(20.3);
}
"""

INV7 = """
template<class T> void f(T x, T y) { }

void f(int w, int z) { }

int main() {
   f( 1 ,  2 );
   f('a', 'b');
   f( 1 , 'b');
   f<>( 1 , 'b');
}
"""

METHOD_TEMPLATE = """
class MyClass {
  template <class T=int, int N=5>
  T fixed_multiply (T val)
  {
    return val;
  }
};
"""



TEMPLATE_FIXTURES = {
    "inv1": INV1, "inv2": INV2, "inv3": INV3, "inv4": INV4,
    "inv5": INV5, "inv6": INV6, "inv7": INV7,
    "method": METHOD_TEMPLATE,
}
