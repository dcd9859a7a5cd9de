"""Reference order-analysis fixtures (cpg-analysis
``src/test/resources/analyses/ordering/{SimpleOrder,ComplexOrder}.java``)
adapted to the subset grammar, plus the DFAs their test classes build
(``SimpleDFAOrderEvaluationTest.kt:58-66``,
``ComplexDFAOrderEvaluationTest.kt:59-74``).  Shared by
tests/test_order_fsm.py and the registered ``cpg_order_eval`` query."""

from __future__ import annotations

from cpg_spark.operators.order_fsm import EPSILON

# reference SimpleOrder.java (resources/analyses/ordering/), minus the
# unused import; the DOES-NOT-COMPILE fixture parses under the subset
# grammar unchanged
SIMPLE_ORDER = """
public class SimpleOrder {
    char[] cipher;
    int key;
    int iv;
    char[] buf;

    void ok() {
        Botan p4 = new Botan(2);
        p4.start(iv);
        p4.finish(buf);
    }

    void ok2() {
        Botan p4 = new Botan(2);
        p4.start(iv);
        p4.foo();
        p4.finish(buf);
    }

    void ok3() {
        Botan p4 = new Botan(2);
        int x = URandomKt.nextUInt();
        if (x < 5) {
            p4.start(iv);
        } else {
            p4.start(iv);
        }
        p4.foo();
        p4.finish(buf);
    }

    void nok1() {
        Botan p = new Botan(1);
        p.set_key(key);
        p.start(iv);
        p.finish(buf);
        p.foo();
        p.set_key(key);
    }

    void nok2() {
        Botan p2 = new Botan(2);
        p2.start(iv);
    }

    void nok3() {
        Botan p3 = new Botan(2);
        if (URandomKt.nextUInt() < 4) {
            p3.start(iv);
        }
        p3.finish(buf);
    }

    void nok4() {
        Botan p4 = new Botan(2);
        if (true) {
            p4.start(iv);
            p4.finish(buf);
        }
        p4.start(iv);
        p4.finish(buf);
    }
}

public class Botan {
    public Botan(int i) {}
    public void create() {}
    public void finish(char[] b) {}
    public void init() {}
    public void process() {}
    public void reset() {}
    public void start(int i) {}
    public void set_key(int i) {}
}
"""

# reference ComplexOrder.java — allowed:
# cm.create(), cm.init(), (cm.start(), cm.process()*, cm.finish())+,
# cm.reset()?
COMPLEX_ORDER = """
public class ComplexOrder {
    void ok_minimal1() {
        Botan2 p1 = new Botan2(1);
        p1.create();
        p1.init();
        p1.start();
        p1.finish();
    }

    void ok_minimal2() {
        Botan2 p1 = new Botan2(1);
        p1.create();
        p1.init();
        p1.start();
        p1.process();
        p1.finish();
    }

    void ok_minimal3() {
        Botan2 p1 = new Botan2(1);
        p1.create();
        p1.init();
        p1.start();
        p1.process();
        p1.finish();
        p1.reset();
    }

    void ok2() {
        Botan2 p2 = new Botan2(1);
        p2.create();
        p2.init();
        p2.start();
        p2.process();
        p2.process();
        p2.process();
        p2.process();
        p2.finish();
    }

    void ok3() {
        Botan2 p3 = new Botan2(1);
        p3.create();
        p3.init();
        p3.start();
        p3.process();
        p3.finish();
        p3.start();
        p3.process();
        p3.finish();
    }

    void ok4() {
        Botan2 p3 = new Botan2(1);
        p3.create();
        p3.init();
        p3.start();
        p3.process();
        p3.finish();
        p3.start();
        p3.process();
        p3.finish();
        p3.reset();
    }

    void nok1() {
        Botan2 p5 = new Botan2(1);
        p5.init();
        p5.start();
        p5.process();
        p5.finish();
    }

    void nok2() {
        Botan2 p6 = new Botan2(1);
        p6.create();
        p6.init();
        if (false) {
            p6.start();
            p6.process();
            p6.finish();
        }
        p6.reset();
    }

    void nok3() {
        Botan2 p6 = new Botan2(1);
        while (true) {
            p6.create();
            p6.init();
            p6.start();
            p6.process();
            p6.finish();
        }
        p6.reset();
    }

    void nokWhile() {
        Botan2 p7 = new Botan2(1);
        p7.create();
        p7.init();
        while (URandomKt.nextUInt() > 5) {
            p7.start();
            p7.process();
            p7.finish();
        }
        p7.reset();
    }

    void okWhile() {
        Botan2 p8 = new Botan2(1);
        p8.create();
        p8.init();
        p8.start();
        p8.process();
        p8.finish();
        while (true) {
            p8.start();
            p8.process();
            p8.finish();
        }
        p8.reset();
    }

    void okWhile2() {
        Botan2 p7 = new Botan2(1);
        p7.create();
        p7.init();
        while (true) {
            p7.start();
            p7.process();
            p7.finish();
        }
        p7.reset();
    }

    void okDoWhile() {
        Botan2 p6 = new Botan2(1);
        p6.create();
        p6.init();
        do {
            p6.start();
            p6.process();
            p6.finish();
        } while (URandomKt.nextUInt() > 5);
        p6.reset();
    }
}

public class Botan2 {
    public void create() {}
    public void finish() {}
    public void init() {}
    public void process() {}
    public void reset() {}
    public void start() {}
}
"""

# allowed: cm.start(), cm.finish()  (SimpleDFAOrderEvaluationTest)
SIMPLE_DFA = {
    "start": "q1",
    "accepting": {"q3"},
    "edges": [("q1", "start", "q2"), ("q2", "finish", "q3")],
}

# ComplexDFAOrderEvaluationTest's 7-state automaton with the ε-edge
COMPLEX_DFA = {
    "start": "q1",
    "accepting": {"q6", "q7"},
    "edges": [
        ("q1", "create", "q2"),
        ("q2", "init", "q3"),
        ("q3", "start", "q4"),
        ("q4", EPSILON, "q5"),
        ("q5", "process", "q5"),
        ("q5", "finish", "q6"),
        ("q6", "start", "q4"),
        ("q6", "reset", "q7"),
    ],
}

