"""Pipeline operators: parse, linking joins, closure, canonicalization,
dedup, text analysis, similarity — each module documents the reference
operator it re-derives (SURVEY.md §2 row ids in docstrings)."""
