"""Liveness guard: no frontend may loop forever on malformed input.

At 100 TB corpus scale a single pathological file that hangs a parser
stalls an executor task until the stage times out — strictly worse than
a ProblemDeclaration.  Round-4 found one real instance (an unterminated
`#ifdef` dropped the EOF sentinel with the inactive branch and starved
the C-family parser's loop terminator); this test fuzzes every
tokenizer-based frontend with deterministic truncations and structural-
character insertions under an alarm.
"""

from __future__ import annotations

import random
import signal

import pytest

from cpg_spark.frontends import FRONTENDS

SEED_SOURCES = {
    "code/cpp": (
        "#include <vector>\n#define INIT(c) {if ((c)) delete (c);}\n"
        "namespace svc {\ntemplate <typename T> class C {\n public:\n"
        "  explicit C(size_t n) : n_(n) {}\n"
        "  int get(const T& k) const { return n_; }\n"
        "  T& operator[](int i) { return d_[i]; }\n private:\n"
        "  size_t n_; T d_[4];\n};\n}\n"
        "int main() { for (const auto& x : xs) { use(x); } return 0; }\n"
        "#ifdef GUARD\nint guarded = 1;\n#endif\n"
    ),
    "code/java": (
        "package p;\nimport java.util.*;\n"
        "public class A<T extends Comparable<T>> {\n"
        "  private final Map<String, List<T>> m = new HashMap<>();\n"
        "  public <U> U pick(List<U> xs) { return xs.get(0); }\n"
        "  int f(int x) { x >>>= 1; return x >>> 2; }\n"
        "  void g() { try (var r = open()) { r.run(); }"
        " catch (Exception e) { } }\n}\n"
    ),
    "code/go": (
        "package m\n\nimport (\n\t\"fmt\"\n)\n\n"
        "type RW interface {\n\tio.Reader\n\tEncode(s string)"
        " (out string, err error)\n}\n\n"
        "func f(xs ...int) []int {\n\tg := func(p string) error {\n"
        "\t\tif p == \"\" {\n\t\t\treturn nil\n\t\t}\n\t\treturn"
        " errors.New(p)\n\t}\n\t_ = g\n\treturn xs[1:2]\n}\n"
    ),
    "code/typescript": (
        "import { X } from './x';\n"
        "export declare class P<T> {\n  #private;\n"
        "  constructor(a: string[], { nocase }: Opts);\n}\n"
        "const f = async (x: number): Promise<number> => x << 2;\n"
        "do { n = s.indexOf('.', n + 1) } while (n !== -1)\n"
        "for (const [k, v] of Object.entries(o)) { p.then(async"
        " () => { if (!k) { throw v } }) }\n"
    ),
    "code/powershell": (
        "[CmdletBinding()]\nparam([Parameter(Mandatory=$true)]"
        "[string]$Path)\n"
        "function global:Go ([switch]$N) {\n"
        "  foreach ($i in 1..3) {\n    switch -Regex ($Path) {\n"
        "      '^/tmp' { Write-Verbose \"p $i\" }\n"
        "      default { $env:X = $Path }\n    }\n  }\n}\n"
    ),
}

CHARS = "{}()<>[]\"#;:,.*&|!?=~%$@\\'`\n"


class _Hang(Exception):
    pass


def _alarm(sig, frame):
    raise _Hang()


def _fuzz(kind: str, src: str):
    fe = FRONTENDS[kind]
    rng = random.Random(1234)
    trials = []
    n = len(src)
    trials += [src[: n * k // 12] for k in range(1, 12)]  # truncations
    for _ in range(30):  # structural insertions
        a = rng.randrange(0, n)
        ins = "".join(rng.choice(CHARS)
                      for _ in range(rng.randrange(1, 5)))
        trials.append(src[:a] + ins + src[a:])
    for _ in range(15):  # deletions
        a = rng.randrange(0, max(1, n - 30))
        trials.append(src[:a] + src[a + rng.randrange(1, 25):])
    old = signal.signal(signal.SIGALRM, _alarm)
    try:
        for i, s in enumerate(trials):
            signal.alarm(15)
            try:
                fe("fuzz", 0, s, "m")
            except _Hang:
                pytest.fail(f"{kind} hung on trial {i}")
            except Exception:
                pass  # errors are fine; only hangs are failures
            finally:
                signal.alarm(0)
    finally:
        signal.signal(signal.SIGALRM, old)


@pytest.mark.parametrize("kind", sorted(SEED_SOURCES))
def test_frontend_terminates_on_malformed_input(kind):
    _fuzz(kind, SEED_SOURCES[kind])
