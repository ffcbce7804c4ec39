"""Analyzed-text scalar functions (SURVEY.md §2.7 F9/F10).

The one genuinely custom scalar surface in the reference is the ES
`match` query with Operator.AND (publisher/.../PublisherMapperImpl.java:143)
and its `<em>` highlight (:199-201,213-218). Re-expressed as pure Catalyst
expression compositions — no UDF, stays inside whole-stage codegen, so the
filter can still be evaluated JVM-side across 100 TB without Python.
"""

from __future__ import annotations

import re
from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

_TOKEN_SPLIT = r"\s+"


def tokenize(col: Column) -> Column:
    """Whitespace analyzer: lowercase + split, empty tokens removed.

    Mirrors ES's simple whitespace analysis closely enough for the
    reference's sku_name matching; swap for a locale analyzer per-language.
    """
    return F.filter(F.split(F.lower(col), _TOKEN_SPLIT), lambda t: t != F.lit(""))


def text_match(col: Column, query: str) -> Column:
    """ES match-with-AND semantics: every analyzed token of *query* must
    appear as a token of *col* (PublisherMapperImpl.java:143,191).

    Compiles to `array_contains(split(...)) AND ...` — codegen-friendly,
    pushdown-compatible (the split is evaluated once per row post-scan).
    """
    tokens = [t for t in query.lower().split() if t]
    if not tokens:
        return F.lit(True)
    toks = tokenize(col)
    return reduce(lambda a, b: a & b, [F.array_contains(toks, t) for t in tokens])


def highlight(col: Column, query: str, tag: str = "em") -> Column:
    """Wrap each whole-word occurrence of any query token in <em>..</em>
    (PublisherMapperImpl.java:199-201,213-218: overwrite field with
    highlighted fragment). Case-insensitive, original casing preserved.
    """
    tokens = sorted({t for t in query.lower().split() if t}, key=len, reverse=True)
    if not tokens:
        return col
    alt = "|".join(re.escape(t) for t in tokens)
    pattern = rf"(?i)\b({alt})\b"
    return F.regexp_replace(col, pattern, f"<{tag}>$1</{tag}>")


def match_and_highlight_sql(text_expr: str, query: str) -> tuple[str, str]:
    """DuckDB-oracle twins of text_match/highlight, for parity tests.

    Returns (where_clause, highlight_select_expr). RE2 (DuckDB) has no
    lookaround, so both sides stick to \\b word boundaries.
    """
    tokens = [t for t in query.lower().split() if t]
    where = " AND ".join(
        f"list_contains(list_filter(string_split_regex(lower({text_expr}), '\\s+'), x -> x <> ''), '{t}')"
        for t in tokens
    ) or "TRUE"
    alt = "|".join(re.escape(t) for t in sorted(set(tokens), key=len, reverse=True))
    hl = rf"regexp_replace({text_expr}, '(?i)\b({alt})\b', '<em>\1</em>', 'g')"
    return where, hl
