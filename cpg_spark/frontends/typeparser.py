"""C/C++/Java type-string normalization (SURVEY U3).

Subset re-derivation of the reference's TypeParser
(``cpg-core/.../graph/types/TypeParser.java`` ~1,000 LoC; semantics
pinned by ``TypeTests.java`` createFromC/createFromJava): a spelled
declarator normalizes to ONE canonical string, so every alias spelling
mints the same content-hash Type-node id (``cpg_spark.ids.type_id``):

* whitespace variants: ``char *p`` == ``char* p`` == ``char * p``
* storage specifiers dropped (static/extern/register/auto/typedef),
  elaborated keywords dropped (struct/class/enum/union/typename),
  trailing declarator names and ``;`` dropped
* qualifier position preserved (the reference distinguishes
  pointer-to-const from const-pointer): ``const char*`` != ``char*const``
* implied int expanded so ``unsigned`` == ``unsigned int`` and
  ``long`` == ``long int``; ``signed`` dropped except ``signed char``
  (distinct from ``char`` in C)
* arrays stay arrays (the reference keeps PointerOrigin.ARRAY distinct
  from POINTER), and parenthesized declarators bind inner-first:
  ``char (*a)[]`` -> ``char[]*`` (pointer to array) vs
  ``char *a[]`` -> ``char*[]`` (array of pointers)
* function pointers: ``void (*f)(int)`` == ``void ((*f)(int))`` ->
  ``void(*)(int)``
* template/generic arguments normalized recursively;
  ``::`` namespace separators become ``.`` (the reference's name
  hierarchy form)
"""

from __future__ import annotations

import re

_QUALIFIERS = {"const", "volatile", "restrict", "_Atomic", "mutable",
               "final"}
_STORAGE = {"static", "extern", "register", "auto", "typedef", "public",
            "private", "protected", "abstract"}
_ELABORATED = {"struct", "class", "enum", "union", "typename"}
_SIGN = {"signed", "unsigned"}
_LENGTH = {"short", "long"}
_PRIMS = {"int", "char", "float", "double", "bool", "boolean", "void",
          "wchar_t", "byte", "size_t"}

_TOKEN = re.compile(r"::|[A-Za-z_][A-Za-z0-9_]*|\[[^\]]*\]|[*&()<>,]|\S")


def erase_generics(name: str | None) -> str | None:
    """Drop the top-level generic arguments from a normalized spelling:
    ``List<String>`` -> ``List``, ``Map<K,V>[]`` -> ``Map[]`` — the
    reference's ``TypeParser.removeGenerics`` (``TypeParser.java:838``):
    a parameterized ObjectType keeps the ERASED name; the arguments live
    on GENERICS edges."""
    if name is None or "<" not in name:
        return name
    lt = name.find("<")
    gt = name.rfind(">")
    if gt <= lt:
        return name
    return (name[:lt] + name[gt + 1:]).strip()


def _split_generics(inner: str) -> list[str]:
    """Split template args on TOP-LEVEL commas only."""
    parts, depth, cur = [], 0, []
    for ch in inner:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


_FNPTR = re.compile(
    r"^\s*(?P<ret>[^()]+?)\s*\(\s*\(?\s*\*\s*(?:const\s+)?"
    r"(?:[A-Za-z_][A-Za-z0-9_]*)?\s*\)?\s*\)\s*\(\s*(?P<params>[^()]*)\)\s*\)?\s*;?\s*$"
)


def normalize_type(spelled: str | None) -> str | None:
    """Canonical form of a spelled C/C++/Java type (None passes through).
    Go spellings (``[]int``, ``*T``, ``map[...]``) are left untouched —
    Go's own syntax is already canonical per the Go frontend."""
    if spelled is None:
        return None
    s = spelled.strip().rstrip(";").strip()
    if not s:
        return s
    if s.startswith(("[]", "*", "map[", "chan ", "func(")):
        return s  # Go forms pass through

    m = _FNPTR.match(s)
    if m:
        ret = normalize_type(m.group("ret")) or ""
        params = [normalize_type(p) for p in _split_generics(m.group("params"))
                  if p.strip()]
        return f"{ret}(*)({','.join(p for p in params if p)})"

    # split off top-level generics before tokenizing
    generics = ""
    lt = s.find("<")
    if lt != -1 and s.rfind(">") > lt:
        gt = s.rfind(">")
        args = [normalize_type(a) for a in _split_generics(s[lt + 1:gt])]
        generics = "<" + ",".join(a for a in args if a) + ">"
        s = s[:lt] + " " + s[gt + 1:]

    pre_quals: list[str] = []      # qualifiers of the base type
    sign: str | None = None
    lengths: list[str] = []
    base_parts: list[str] = []
    # declarator ops: parenthesized groups bind INNER (apply last)
    plain_ops: list[str] = []
    group_ops: list[str] = []
    post_ops: list[str] = []
    in_group = False
    seen_group = False

    def ops() -> list[str]:
        return group_ops if in_group else (
            post_ops if seen_group else plain_ops)

    for t in _TOKEN.findall(s):
        if t in _STORAGE or t in _ELABORATED:
            continue
        if t in _QUALIFIERS:
            dst = ops()
            if dst and dst[-1].startswith("*"):
                dst[-1] += t  # pointer-level qualifier: char*const
            else:
                pre_quals.append(t)
        elif t in _SIGN:
            sign = t
        elif t in _LENGTH:
            lengths.append(t)
        elif t in ("::", "."):
            # both spellings qualify the next segment — parse_type
            # already canonicalizes C++ `::` to `.`, and Java names
            # arrive dotted; without this, `std.vector` would drop
            # `vector` as a declarator name
            if base_parts:
                base_parts.append(".")
        elif t == "*":
            ops().append("*")
        elif t == "&":
            ops().append("&")
        elif t.startswith("["):
            ops().append(f"[{t[1:-1].strip()}]")
        elif t == "(":
            in_group = True
            seen_group = True
        elif t == ")":
            in_group = False
        elif t == ",":
            continue
        elif re.match(r"[A-Za-z_]", t):
            if not base_parts or base_parts[-1] == ".":
                base_parts.append(t)
            # else: a second identifier = the declarator name -> dropped

    # canonical base with implied-int expansion
    first = base_parts[0] if base_parts else None
    if lengths or sign or (first in _PRIMS and len(base_parts) == 1):
        prim = first if first in _PRIMS else "int"
        if lengths:
            prim = " ".join(lengths + [prim])
        if sign == "unsigned":
            prim = f"unsigned {prim}"
        elif sign == "signed" and prim == "char":
            prim = "signed char"
        base = prim
    else:
        base = "".join(base_parts)
    quals = " ".join(sorted(set(pre_quals)))
    head = (f"{quals} {base}" if quals else base) + generics
    # parenthesized declarator ops are the OUTERMOST constructors:
    # suffixes outside the parens apply first (inner), group ops last
    return head + "".join(plain_ops + post_ops + group_ops)
