"""Reference Python test fixture programs, embedded as test data.

These are the tiny per-language test programs the reference asserts its
graph semantics on (cpg-language-python/src/test/resources/python/*.py,
oracles in PythonFrontendTest.kt). FIXTURES.md prescribes them verbatim as
span payloads for correctness checking. They are test INPUTS, not engine
code.
"""

PY_FIXTURES = {'class_ctor': 'class Foo:\n'
               '    def __init__(self):\n'
               '        pass\n'
               '    def foobar(self):\n'
               '        pass\n'
               '\n'
               'def bar():\n'
               '    foo = Foo()\n'
               '    foo.foobar()\n',
 'class_fields': 'class Foo:\n'
                 '    x\n'
                 '    y = 123\n'
                 '    def bar(self):\n'
                 '        self.z\n'
                 '        self.baz = 456\n',
 'class_self': 'class Foo:\n'
               '    def bar(self, i: int):\n'
               '        self.somevar = i\n'
               '    def foo(self):\n'
               '        self.bar(123)\n',
 'function': 'def foo():\n'
             '    bar("some string", s2="another_string")\n'
             '\n'
             'def bar(s: str, s2: str):\n'
             '    print("bar(s) here: ", s)\n'
             '    a = 1 + 2\n'
             '    return\n',
 'if': 'def foo():\n    sel = True\n\n    if sel:\n        sel = False\n    else:\n        pass\n',
 'ifexpr': 'def foo():\n    foo = 21 if False else 42\n',
 'issue432': 'class counter:\n'
             '    pass\n'
             '\n'
             'def count(c):\n'
             '  if c.inc() < 5:\n'
             '    count(c)\n'
             '\n'
             'class c1(counter):\n'
             '  total = 0\n'
             '\n'
             '  def inc(self):\n'
             '    self.total = self.total + 1\n'
             '    return self.total\n'
             '\n'
             'count(c1())\n',
 'issue473': 'if sys.version_info.minor > 9:\n'
             '    phr = {"user_id": user_id} | content\n'
             'else:\n'
             '    z = {"user_id": user_id}\n'
             '    phr = {**z, **content}\n',
 'issue598': 'def main():\n'
             '    prepare()\n'
             '    genCpg()\n'
             '    exportToJson()\n'
             '\n'
             '    while True:\n'
             '        x = 1\n'
             '        if x == 2:\n'
             '            print(x)\n'
             '        else:\n'
             '            break\n',
 'issue615': 'test = [(1, 2, 3)]\n'
             'for t1, t2, t3 in test:\n'
             '    print("bug ... {} {} {}".format(t1, t2, t3))\n',
 'literal': 'b = True\ni = 42\nf = 1.0\n#c = 3+5j\nt = "Hello"\nn = None\n',
 'multi_level_mem_call': 'foo = bar.baz.zzz("hello")\n',
 'simple_class': 'class SomeClass:\n'
                 '    def someFunc(self):\n'
                 '        pass\n'
                 '\n'
                 'def foo():\n'
                 '    c1 = SomeClass()\n'
                 '    #c2 = SomeClass()\n'
                 '    c1.someFunc()\n',
 'vars': 'class Foo:\n'
         '    classFieldNoInitializer: int\n'
         '    classFieldWithInit = 123\n'
         '    classFieldNoInitializer = classFieldWithInit\n'
         '\n'
         '    def bar(self):\n'
         '        self.classFieldDeclaredInFunction = 456\n'
         '        self.classFieldNoInitializer = 789\n'
         '        self.classFieldWithInit = 12\n'
         '        classFieldNoInitializer = "shadowed"\n'
         '        classFieldWithInit = "shadowed"\n'
         '        classFieldDeclaredInFunction = "shadowed"\n'
         '\n'
         'foo = Foo()\n'
         'foo.classFieldNoInitializer = 345\n'
         'foo.classFieldWithInit = 678\n'}
