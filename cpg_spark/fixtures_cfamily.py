"""Reference Java / C++ test fixture programs, embedded as test data.

From cpg-core/src/test/resources (dfg/, variables/, eog/,
variables_extended/cpp/); oracles live in the reference's enhancement
tests (DFGTest.java, VariableResolverTest.java, EOGTest.java).
FIXTURES.md §4 prescribes them as span payloads.  Test INPUTS, not
engine code.
"""

JAVA_FIXTURES = {'ControlFlowSensitiveDFGIfMerge': 'public class '
                                   'ControlFlowSensitiveDFGIfMerge {\n'
                                   '  void func() {\n'
                                   '    int a = 1;\n'
                                   '    if (args.length > 3) {\n'
                                   '      a = 2;\n'
                                   '    } else {\n'
                                   '      System.out.println(a);\n'
                                   '    }\n'
                                   '\n'
                                   '    int b = a;\n'
                                   '  }\n'
                                   '\n'
                                   '}',
 'ControlFlowSensitiveDFGIfNoMerge': 'public class '
                                     'ControlFlowSensitiveDFGIfNoMerge {\n'
                                     '  void func2() {\n'
                                     '    int a = 1;\n'
                                     '    if (args.length > 3) {\n'
                                     '      a = 2;\n'
                                     '    } else {\n'
                                     '      a = 4;\n'
                                     '      int b = a;\n'
                                     '    }\n'
                                     '  }\n'
                                     '}\n',
 'ControlFlowSensitiveDFGSwitch': 'public class ControlFlowSesitiveDFGSwitch '
                                  '{\n'
                                  '  void func3() {\n'
                                  '    int swithVal = 3;\n'
                                  '    int a = 0;\n'
                                  '\n'
                                  '    switch (swithVal) {\n'
                                  '      case 1:\n'
                                  '        a = 10;\n'
                                  '        break;\n'
                                  '      case 2:\n'
                                  '        a = 11;\n'
                                  '        break;\n'
                                  '      case 3:\n'
                                  '        a = 12; // Fall through\n'
                                  '      default:\n'
                                  '        System.out.println(a);\n'
                                  '        break;\n'
                                  '    }\n'
                                  '\n'
                                  '    int b = a;\n'
                                  '  }\n'
                                  '}\n',
 'DelayedAssignmentAfterRHS': 'public class DelayedAssignmentAfterRHS {\n'
                              '\n'
                              '    public static void main(String[] args) {\n'
                              '        int a = 0;\n'
                              '        int b = 1;\n'
                              '        \n'
                              '        a = a + b;\n'
                              '    }\n'
                              '}\n',
 'EOG': 'public class EOG {\n'
        '    void fun(){\n'
        '        int a = 1;\n'
        '        int b = 2;\n'
        '        int x = 0;\n'
        '        if (a > 0) {\n'
        '            b--;\n'
        '        } else if(a < -2) {\n'
        '            b++;\n'
        '        } else {\n'
        '            x++;\n'
        '        }\n'
        '    }\n'
        '\n'
        '\n'
        '}\n',
 'Variables': 'public class Variables {\n'
              '  private int field = 42;\n'
              '\n'
              '  private int getField() {\n'
              '    return field;\n'
              '  }\n'
              '\n'
              '  private int getLocal() {\n'
              '    int local = 42;\n'
              '    return local;\n'
              '  }\n'
              '\n'
              '  private int getShadow() {\n'
              '    int field = 43;\n'
              '    return field;\n'
              '  }\n'
              '\n'
              '  private int noShadow() {\n'
              '    int field = 43;\n'
              '    return this.field;\n'
              '  }\n'
              '}'}

CPP_FIXTURES = {'compoundoperator': 'class MyClass {\n'
                     '  void somefun() {\n'
                     '      int i = 0;\n'
                     '      i += 2;\n'
                     '  }\n'
                     '};\n',
 'conditional_expression': 'int main() {\n'
                           '  int a = 0;\n'
                           '  int b = 1;\n'
                           '\n'
                           '  a = a == b ? b = 2: b = 3;\n'
                           '  a = b;\n'
                           '}',
 'local_variables': 'class Test {\n'
                    '  public:\n'
                    '  int call(int a) {\n'
                    '    return a + 1;\n'
                    '  }\n'
                    '};\n'
                    '\n'
                    '/*\n'
                    'C++ 17, the variable can be declared by providing '
                    'values through parenthesis too. The difference between\n'
                    'constructor initialization and the old normal way of '
                    'initialization is that it will always return last\n'
                    'value in the parenthesis no matter what it’s magnitude '
                    'or sign is.\n'
                    '\n'
                    'In this example, foo will be assigned the value 42.\n'
                    '*/\n'
                    'int main() {\n'
                    '  int foo = 1;\n'
                    '  foo = (1,2,3,4,42);\n'
                    '  Test t;\n'
                    '  t.call(foo);\n'
                    '}\n'
                    '\n'
                    'int testExpressionInExpressionList() {\n'
                    '  int x = 23;\n'
                    '  x = 42;\n'
                    '  int foo = 1;\n'
                    '  foo = (1,2,3,4,x);\n'
                    '  Test t;\n'
                    '  t.call(foo);\n'
                    '}',
 'scope_variables': '#include<iostream>\n'
                    '#include<string>\n'
                    '#include<cstring>\n'
                    '#include "external_class.h"\n'
                    '\n'
                    'using namespace std;\n'
                    '\n'
                    '// TODO also create a Struct and an Enum with the '
                    'variables\n'
                    '// The variables have mostly the same name to give the '
                    'VariableUsageResolver a possibly hard time and uncover '
                    'more faults.\n'
                    '\n'
                    'void printLog(string logId, string message){\n'
                    '    cout << logId << ": " << message << endl;\n'
                    '}\n'
                    '\n'
                    'class ScopeVariables{\n'
                    '    public:\n'
                    '        string varName = "instance_field";\n'
                    '        static string staticVarName;\n'
                    '\n'
                    '        int functionX();\n'
                    '\n'
                    '        void function1(){\n'
                    '            printLog("func1_impl_this_varName", '
                    'varName);\n'
                    '            printLog("func1_static_staticVarName", '
                    'staticVarName);\n'
                    '            for(string varName = "first_loop_local"; '
                    'varName.size() < 17 ; varName += " "){\n'
                    '                printLog("func1_first_loop_varName", '
                    'varName);\n'
                    '            }\n'
                    '\n'
                    '            for(string varName = "second_loop_local"; '
                    'varName.size() < 18 ; varName += " "){\n'
                    '                {\n'
                    '                    string varName = '
                    '"local_in_inner_block";\n'
                    '                    '
                    'printLog("func1_nested_block_shadowed_local_varName", '
                    'varName);\n'
                    '                }\n'
                    '                printLog("func1_second_loop_varName", '
                    'varName);\n'
                    '            }\n'
                    '        }\n'
                    '\n'
                    '        void function2(string varName){\n'
                    '            printLog("func2_param_varName", varName);\n'
                    '            printLog("func2_this_varName", '
                    'this->varName);\n'
                    '            // Initializer-Statement that is allowed in '
                    'newer C++ versions\n'
                    '            if(string varName = "if_local"; '
                    'varName.size() > 0){\n'
                    '                printLog("func2_if_varName", varName);\n'
                    '            }\n'
                    '\n'
                    '            try {\n'
                    '                throw string("exception_string");\n'
                    '            } catch (const string& varName) {\n'
                    '                printLog("func2_catch_varName", '
                    'varName);\n'
                    '            };\n'
                    '            ScopeVariables scopeVariables;\n'
                    '            printLog("func2_instance_varName", '
                    'scopeVariables.varName);\n'
                    '            printLog("func2_imp_this_varName", '
                    'varName);\n'
                    '\n'
                    '        }\n'
                    '\n'
                    '        void function3(string varName){\n'
                    '            ScopeVariables scopeVariables;\n'
                    '            printLog("func3_instance_varName", '
                    'scopeVariables.varName);\n'
                    '\n'
                    '            ExternalClass externalClass;\n'
                    '            printLog("func3_external_instance_varName", '
                    'externalClass.varName);\n'
                    '\n'
                    '        }\n'
                    '\n'
                    '        void function4(){\n'
                    '            printLog("func4_static_staticVarName", '
                    'ScopeVariables::staticVarName);\n'
                    '            printLog("func4_external_staticVarName", '
                    'ExternalClass::staticVarName);\n'
                    '            ExternalClass externalClass;\n'
                    '            printLog("func4_external_instance_varName", '
                    'externalClass.varName);\n'
                    '            '
                    'printLog("func4_second_external_staticVarName", '
                    'ExternalClass::staticVarName);\n'
                    '        }\n'
                    '\n'
                    '        void function5(){\n'
                    '            ScopeVariables first;\n'
                    '            ScopeVariables second;\n'
                    '            first.staticVarName = '
                    '"staticVarName_Of_Both";\n'
                    '\n'
                    '            '
                    'printLog("func5_staticVarName_throughInstance_first", '
                    'first.staticVarName);\n'
                    '            '
                    'printLog("func5_staticVarName_throughInstance_second", '
                    'second.staticVarName);\n'
                    '        }\n'
                    '\n'
                    '        // C++ inner classes are currently not parsed\n'
                    '        class InnerClass {\n'
                    '            public:\n'
                    '                string varName = '
                    '"inner_instance_field";\n'
                    '                static string staticVarName;\n'
                    '\n'
                    '                void function1(){\n'
                    '                    '
                    'printLog("func1_inner_imp_this_varName", varName);\n'
                    '                    InnerClass inner;\n'
                    '                    ScopeVariables scopeVariables;\n'
                    '                    '
                    'printLog("func1_inner_instance_varName", '
                    'inner.varName);\n'
                    '                    '
                    'printLog("func1_outer_instance_varName", '
                    'scopeVariables.varName);\n'
                    '                    '
                    'printLog("func1_outer_static_staticVarName", '
                    'ScopeVariables::staticVarName);\n'
                    '                    '
                    'printLog("func1_inner_static_staticVarName", '
                    'ScopeVariables::InnerClass::staticVarName); // Can i '
                    'remove the ScopeVariables:: ??\n'
                    '                // There is no speciall reference to '
                    'the outer-class like ClassName.this.varname as in Java\n'
                    '\n'
                    '                }\n'
                    '\n'
                    '\n'
                    '                void function2(string varName){\n'
                    '                    string staticVarName = '
                    '"inner_local_named_static";\n'
                    '                    InnerClass inner;\n'
                    '                    ScopeVariables scopeVariables;\n'
                    '                    '
                    'printLog("func2_inner_instance_varName_with_shadows", '
                    'inner.varName);\n'
                    '                    '
                    'printLog("func2_outer_instance_varName_with_shadows", '
                    'scopeVariables.varName);\n'
                    '                    '
                    'printLog("func2_outer_static_staticVarName_with_shadows", '
                    'ScopeVariables::staticVarName);\n'
                    '                    '
                    'printLog("func2_inner_static_staticVarName_with_shadows", '
                    'ScopeVariables::InnerClass::staticVarName); // Can i '
                    'remove the ScopeVariables:: ??\n'
                    '                // There is no speciall reference to '
                    'the outer-class like ClassName.this.varname as in Java\n'
                    '\n'
                    '                }\n'
                    '\n'
                    '        };\n'
                    '};\n'
                    'int main (int argc, char *argv[]) {\n'
                    '    string varName = "parameter";\n'
                    '    ScopeVariables scopeVariables;\n'
                    '    scopeVariables.function1();\n'
                    '    scopeVariables.function2(varName);\n'
                    '    scopeVariables.function3(varName);\n'
                    '    scopeVariables.function4();\n'
                    '    scopeVariables.function5();\n'
                    '    ScopeVariables::InnerClass innerClass;\n'
                    '    innerClass.function1();\n'
                    '    innerClass.function2(varName);\n'
                    '    printLog("main_local_varName", varName);\n'
                    '}\n'
                    '\n'
                    'string ScopeVariables::staticVarName = "static_field";\n'
                    'string ScopeVariables::InnerClass::staticVarName = '
                    '"inner_static_field";\n'
                    '\n'
                    'int ScopeVariables::functionX(){\n'
                    '    return 0;\n'
                    '}\n',
 'unaryoperator': 'class MyClass {\n'
                  '  void somefun() {\n'
                  '      int i = 0;\n'
                  '      i++;\n'
                  '  }\n'
                  '};\n'}


# Overload-resolution fixtures: cpg-core/src/test/resources/calls/
# {defaultargs,implicitcast}; oracles in CallResolverTest.java:248-460
# (testImplicitCastInvocation, testDefaultArgumentsInDeclaration,
# testDefaultArgumentsInDefinition).  Test INPUTS, not engine code.
CPP_FIXTURES.update({
    'defaultInDeclaration': (
        'void display(int = 3, char = \'*\');\n'
        '\n'
        'int main() {\n'
        '    int count = 5;\n'
        '    display();\n'
        '    display(1);\n'
        '    display(10.0);\n'
        '    display(count, \'$\');\n'
        '    return 0;\n'
        '}\n'
        '\n'
        'void display(int count, char c) {\n'
        '    for(int i = 1; i <= count; ++i)\n'
        '    {\n'
        '    }\n'
        '}\n'),
    'defaultInDefinition': (
        'void display(char c = \'*\', int count = 3) {\n'
        '    for(int i = 1; i <= count; ++i) {\n'
        '    }\n'
        '}\n'
        '\n'
        'int main() {\n'
        '    int count = 5;\n'
        '    display();\n'
        '    display(\'#\');\n'
        '    display(\'$\', count);\n'
        '    return 0;\n'
        '}\n'),
    'implicitcast': (
        'int multiply (int val)\n'
        '{\n'
        '  return val * 3;\n'
        '}\n'
        '\n'
        'int main() {\n'
        '  int x = multiply(10.0);\n'
        '  return 0;\n'
        '}\n'),
    'ambiguouscall': (
        'int ambiguous_multiply (int val)\n'
        '{\n'
        '  return val * 3;\n'
        '}\n'
        '\n'
        'int ambiguous_multiply (float val) {\n'
        '    return val * 5;\n'
        '}\n'
        '\n'
        'int main() {\n'
        '  int y = ambiguous_multiply(10.0);\n'
        '  return 0;\n'
        '}\n'),
})


# CallResolverTest fixtures: the reference's own overload/override/
# unknown-class resolution programs (cpg-core/src/test/resources/calls/).
CPP_FIXTURES.update({
    'calls': 'void functionTarget() {}\nvoid functionTarget(int param1, int param2) {}\nvoid functionTarget(int param1, const char* param2) {}\n\nclass SuperClass {\n  public:\n    void superTarget() {}\n    void superTarget(int param1, int param2) {}\n    void superTarget(int param1, const char* param2) {}\n    virtual void overridingTarget() {}\n};\n\nclass External: public SuperClass {\n  public:\n    void externalTarget() {}\n    void externalTarget(int param1, int param2) {}\n    void externalTarget(int param1, const char* param2) {}\n    void overridingTarget() override {}\n};\n\nclass Invocation {\n  public:\n    void invoke() {}\n};\n\nclass Calls: SuperClass {\n  private:\n    void innerTarget() {}\n    void innerTarget(int param1, int param2) {}\n    void innerTarget(int param1, const char* param2) {}\n  public:\n    void main() {\n      functionTarget();\n      functionTarget(1, 2);\n      functionTarget(1, "2");\n\n      innerTarget();\n      innerTarget(1, 2);\n      innerTarget(1, "2");\n      // inferred\n      innerTarget(1, 2, 3);\n\n      superTarget();\n      superTarget(1, 2);\n      superTarget(1, "2");\n      // inferred\n      superTarget(1, 2, 3);\n\n      External e;\n      e.externalTarget();\n      e.externalTarget(1, 2);\n      e.externalTarget(1, "2");\n      // inferred\n      e.externalTarget(1, 2, 3);\n\n      e.superTarget();\n      e.superTarget(1, 2);\n      e.superTarget(1, "2");\n\n      SuperClass *s = new External();\n      s->overridingTarget();\n\n      Unknown u;\n      // don\'t create inference for methods of unknown classes!\n      u.unknownTarget();\n    }\n};\n\nvoid main() {\n  // Invocation of method from function (main function not in a class)\n  Invocation i;\n  i.invoke();\n  // inferred\n  functionTarget(1, 2, 3);\n}',
})

JAVA_FIXTURES.update({
    'Calls': 'public class Calls extends SuperClass {\n\n  private void innerTarget() {}\n  private void innerTarget(int param1, int param2) {}\n  private void innerTarget(int param1, String param2) {}\n\n  public static void main(String[] args) {\n    innerTarget();\n    innerTarget(1, 2);\n    innerTarget(1, "2");\n    // inferred\n    innerTarget(1, 2, 3);\n\n    superTarget();\n    superTarget(1, 2);\n    superTarget(1, "2");\n    // inferred\n    superTarget(1, 2, 3);\n\n    External e = new External();\n    e.externalTarget();\n    e.externalTarget(1, 2);\n    e.externalTarget(1, "2");\n    // inferred\n    e.externalTarget(1, 2, 3);\n\n    e.superTarget();\n    e.superTarget(1, 2);\n    e.superTarget(1, "2");\n\n    SuperClass s = new External();\n    s.overridingTarget();\n\n    Unknown u = new Unknown();\n    // don\'t create inference for methods of unknown classes!\n    u.unknownTarget();\n  }\n}',
    'External': 'public class External extends SuperClass {\n\n  public void externalTarget() {}\n  public void externalTarget(int param1, int param2) {}\n  public void externalTarget(int param1, String param2) {}\n\n  @Override\n  public void overridingTarget() {}\n}',
    'SuperClass': 'public class SuperClass {\n  public void superTarget() {}\n  public void superTarget(int param1, int param2) {}\n  public void superTarget(int param1, String param2) {}\n\n  public void overridingTarget() {}\n}',
})


# Remaining CallResolverTest fixtures: partial defaults, method
# defaults, and declaration-order-independent scoped resolution
# (defaultargs/partialDefaults.cpp, defaultargs/defaultInMethod.cpp,
# cxxprioresolution/{defined,undefined}.cpp).
CPP_FIXTURES.update({
    'partialDefaults': '#include <iostream>\nusing namespace std;\n\n// defining the default arguments\nvoid add(int a, int b, int c=3, int d = 4) {\n    for(int i = 1; i <= count; ++i) {\n        cout << c;\n    }\n    cout << endl;\n}\n\nint main() {\n    // Unresolved\n    add();\n\n    // OK a=1, b=2, c=3, d=4\n    add(1,2);\n\n    // OK a=1, b=2, c=5,d=6\n    add(1,2,5,6);\n\n    return 0;\n}',
    'defaultInMethod': '#include <iostream>\nusing namespace std;\n\nclass DemoClass {\n  private:\n  int calc(int a, int b=5) {\n    return a+b;\n  }\n  public:\n    void doSmth(int x=1, int y=2) {\n      cout << calc(x)+y << "\\n";\n    }\n};\n\nint main() {\n  DemoClass demoClass;\n  demoClass.doSmth();\n  return 0;\n}',
    'prio_defined': 'void g(int a) {}\n\nint main() {\n    g(3);\n}',
    'prio_undefined': 'int main() {\n    f(3);\n}\n\nvoid f(int a) {\n}',
})


# ConstructorsTest fixtures (cpg-core/src/test/resources/constructors/).
CPP_FIXTURES.update({
    'constructors': 'class A {\npublic:\n    A() {}\n    A(int x) {}\n    A(int x, int y) {}\n};\n\nint main() {\n   A a1;\n   A a2(5);\n   A a3(5,6);\n   A a4 = A();\n   A a5 = A(5);\n   A a6 = A(5, 6);\n   A* a7 = new A;\n   A* a8 = new A();\n   A* a9 = new A(5);\n   A* a10 = new A(5, 6);\n   return 0;\n}',
})
JAVA_FIXTURES.update({
    'Constructors': 'public class Constructors {\n  public Constructors() {}\n  public Constructors(int x) {}\n  public Constructors(int x, int y) {}\n\n  public int main() {\n    Constructors a1 = new Constructors();\n    Constructors a2 = new Constructors(5);\n    Constructors a3 = new Constructors(5, 6);\n    Constructors a4;\n  }\n}',
})


# SuperCallTest fixtures (cpg-core/src/test/resources/superCalls/).
JAVA_FIXTURES.update({
    'SubClass': 'public class SubClass extends SuperClass implements Interface1, Interface2 {\n  public int field;\n  @Override\n  public void target() {\n    super.target();  // SuperClass.target()\n    Interface1.super.target();  // Interface1.target()\n    Interface2.super.target();  // Interface2.target()\n  }\n\n  public int getField() {\n    return field;\n  }\n\n  public int getSuperField() {\n    return super.field;  // SuperClass.field\n  }\n\n  private class Inner {\n    public void inner() {\n      SubClass.super.target();  // SuperClass.target()\n    }\n  }\n}',
    'SC_SuperClass': 'public class SuperClass {\n  public int field;\n  public void target() {}\n}',
    'Interface1': 'public interface Interface1 {\n  default void target() {}\n}',
    'Interface2': 'public interface Interface2 {\n  default void target() {}\n}',
})


# DFGTest loop fixtures (cpg-core/src/test/resources/dfg/LoopDFGs.java).
JAVA_FIXTURES.update({
    'LoopDFGs': 'public class LoopDFGs {\n\n    public void looping(int param){\n        int a = 0;\n        while(param % 6 == 5){\n            if(param > 7){\n                a = 1;\n            }else{\n                System.out.println(a); // Should have a dfg path from 0,1,2 but not 3\n                a = 2;\n            }\n        }\n        a = 3;\n    }\n\n    public void labeledBreakContinue(int param){\n        int a = 0;\n        lab1: while(param < 5){\n            while(param > 6) {\n                if (param > 7) {\n                    a = 1;\n                    continue lab1;\n                } else {\n                    System.out.println(a); // Should have a dfg path from 0, 1, 3\n                    a = 2;\n                    break lab1;\n                }\n                a = 4;\n            }\n            System.out.println(a); // Should have a dfg path from 0, 1, 3\n            a = 3;\n        }\n        System.out.println(a); // Should have a dfg path from 0,1,2,3\n    }\n}\n',
})


# EOGTest cfg fixtures (cpg-core/src/test/resources/cfg/).
JAVA_FIXTURES.update({
    'CfgSwitch': 'package de.fraunhofer.aisec.cpgtest;\n\npublic class Switch {\n\n  public static void main(String[] args) {\n    int i = 5;\n    System.out.println();\n    switch (i) {\n      case 0:\n      case 1:\n        i = 10;\n        break;\n      case 2:\n        i = 20;\n      case 3:\n        i *= 2;\n        break;\n      default:\n        i = 4;\n    }\n    System.out.println();\n  }\n\n  public void whileswitch(int i) {\n    System.out.println();\n    label:\n    while (i < 10) {\n      switch (i) {\n        case 0:\n          i += 2;\n        case 9:\n          break label;\n        default:\n          i++;\n      }\n      System.out.println();\n    }\n    System.out.println();\n  }\n\n  public void switchwhile(int i) {\n    System.out.println();\n    label:\n    switch (i) {\n      case 0:\n        i += 2;\n      case 1:\n        while (true) {\n          if (i > 5) break label;\n          i++;\n        }\n        System.out.println();\n      default:\n        i++;\n    }\n    System.out.println();\n  }\n}\n',
    'CfgBreakContinue': 'package cfg;\n\npublic class BreakContinue {\n\n  public static void main(String[] args) {\n    int i = 10;\n    System.out.println();\n    while (i > 0) {\n      if (i < 8) continue;\n      else if (i > 9) break;\n      i--;\n    }\n    System.out.println();\n    do {\n      if (i > 9) break;\n      if (i < 5) {\n        i += 2;\n        continue;\n      }\n      i++;\n    } while (i < 10);\n    System.out.println();\n  }\n}\n',
})


# TypedefTest fixture (cpg-core/src/test/resources/typedefs/).
CPP_FIXTURES.update({
    'typedefs': '// simple typedef\ntypedef unsigned long ulong;\n\n// chained typedef\ntypedef ulong ulong2;\ntypedef ulong2 ulong3;\n\n// the following objects have the same type\nunsigned long l1;\nulong l2;\nulong2 l3;\nulong3 l4;\n\nunsigned long *l1ptr;\nulong *l2ptr;\nulong2 *l3ptr;\nulong3 *l4ptr;\n\nunsigned long l1arr[];\nulong l2arr[];\nulong2 l3arr[];\nulong3 l4arr[];\n\n// special cases\ntypedef long *longp_t;\ntypedef int intarr[20];\ntypedef unsigned int (*uint_fp_t)(long, long);\n\nlong *longptr1;\nlongp_t longptr2;\n\nint arr1[20];\nintarr arr2;\n\nunsigned int (*uintfp1)(long, long);\nuint_fp_t uintfp2;\n\n// more complicated typedef\ntypedef int int_t, *intp_t, (*fp)(int, ulong), arr_t[10];\n\nint i1;\nint_t i2;\n\n// the following two objects have the same type\nint a1[10];\narr_t a2;\n\n// int pointers\nint *intPtr1;\nintp_t intPtr2;\n\n// int function ptr\nint fun(int i, ulong u) {\n  return 0;\n}\n\nint (*intFptr1)(int, unsigned long);\nfp intFptr2;\n\n// common C idiom to avoid having to write "struct S"\ntypedef struct {int a; int b;} S, *pS;\n\n// struct pointers\nS *ps1;\npS ps2;\n\n// typedef can be used anywhere in the decl-specifier-seq\nunsigned long typedef long int ullong;\n// more conventionally spelled "typedef unsigned long long int ullong;"\nunsigned long long int someUllong1;\nullong someUllong2;\n\n// std::add_const, like many other metafunctions, use member typedefs\ntypedef long type;\ntype typeMemberOutside;\n\n// sample typedef with tabs\ntypedef uint8\t\ttest;\n\nstruct add_const {\n    typedef const int type;\n    const int typeMember1;\n    type typeMember2;\n};\n\n\nint main() {\n  typedef char *type;\n  char *cptr1;\n  type cptr2;\n}\n',
})


# InferenceTest fixtures (cpg-core/src/test/resources/inference/).
CPP_FIXTURES.update({
    'inference_record': 'int main() {\n    T node;\n    node.value = 42;\n    node.next = &node;\n}\n',
    'inference_record_ptr': 'int main() {\n    T* node = new T();\n    node->value = 42;\n    node->next = node;\n\n    node->dump();\n}\n',
})


# Enum fixtures: the reference's own enum-bearing test program
# (cpg-core/src/test/resources/compiling/MemberCallExpression.java — the
# only enum in its resources; nested `enum Color` + `c.foo(Color.RED)`),
# plus a C++ program covering the unscoped / scoped(`enum class`) /
# trailing-declarator / elaborated-specifier forms that
# EnumDeclaration.java:38-47 models.
JAVA_FIXTURES.update({
    'MemberCallExpressionCT': 'public class CT {\n\n\tpublic static final int CONSTANT = 3;\n\n\tenum Color\n\t{\n\t\tRED, GREEN, BLUE;\n\t}\n\n\tpublic static void main(String[] args){\n\t\tCT c = new CT();\n\n\t\t// Enum as argument\n\t\tc.foo(Color.RED);\n\n\t\t// Field as argument\n\t\tc.bar(CT.CONSTANT);\n\n\t\t// Constant as argument\n\t\tc.bar(3);\n\n\t\t// Expression as argument\n\t\tc.bar(2+1);\n\n\t\t// MethodCallExpression as argument\n\t\tc.bar(c.red());\n\t}\n\n\tprivate void bar(int constant) {\n\t}\n\n\tprivate void foo(Color red) {\n\t}\n\n\tprivate int red() {\n\t\treturn 0;\n\t}\n}\n',
})
CPP_FIXTURES.update({
    'enums': 'enum Color { RED, GREEN = 5, BLUE };\n\nenum class Direction : int { NORTH, SOUTH };\n\nenum Flags { ON, OFF } toggle;\n\nenum Color painted = GREEN;\n\nint use() {\n  int x = RED;\n  enum Color c = BLUE;\n  Direction d = Direction::NORTH;\n  return x;\n}\n\nstruct Palette {\n  enum Depth { SHALLOW, DEEP };\n  int bits;\n};\n',
})


# Annotation fixture: the reference's own Annotation.java test resource
# (cpg-core/src/test/resources/Annotation.java, asserted by
# JavaLanguageFrontendTest.kt testAnnotations:473-521).
JAVA_FIXTURES.update({
    'Annotation': '@AnnotationForClass(value = 2)\npublic class Annotation {\n\n  @AnnotatedField\n  private int field = 1;\n\n  @AnnotatedField("myString")\n  private int anotherField = 2;\n}\n',
})


# Lambda fixtures (round 4): the reference's CDT/JavaParser frontends
# have no lambda handler (LambdaExpression exists only in its TS
# frontend, LambdaExpression.kt:40-56 defines the node model) — these
# are original programs exercising every syntactic form both dialects
# support, so the problem-rate gate sees zero degrades on lambda-heavy
# real-world code.
JAVA_FIXTURES.update({
    'Lambdas': 'import java.util.function.Function;\n\npublic class Lambdas {\n\n  public int compose(int seed) {\n    Function<Integer, Integer> inc = x -> x + 1;\n    Function<Integer, Integer> dbl = (y) -> y * 2;\n    Function<Integer, Integer> blk = (int z) -> { return z - 3; };\n    Runnable r = () -> helper(seed);\n    r.run();\n    return inc.apply(dbl.apply(blk.apply(seed)));\n  }\n\n  private void helper(int v) {\n  }\n}\n',
})
CPP_FIXTURES.update({
    'lambdas': 'int helper(int v) { return v; }\n\nint main() {\n  int n = 3;\n  auto byval = [n](int x) -> int { return x + n; };\n  auto byref = [&n](int y) -> int { n = n + y; return n; };\n  auto noret = [](int z) { return helper(z); };\n  auto nop = [] { return 0; };\n  int a = byval(1);\n  int b = byref(2);\n  return a + b;\n}\n',
})
