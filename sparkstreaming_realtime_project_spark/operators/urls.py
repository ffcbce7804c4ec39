"""URL canonicalization + per-domain corpus governance.

Web-scale training corpora key almost everything on URLs: exact URL
dedup runs BEFORE content dedup (same page fetched twice via tracking
variants), and per-registered-domain document caps keep one mega-site
from dominating the mix (the RefinedWeb/C4-style corpus governance
step). Both stages are pure string-expression + one hash-shuffle-on-key
plans — codegen-side, no UDFs, linear at 100 TB.

The testdata carries no URL column, so the catalog entries DERIVE a
deterministic synthetic URL from doc_id on BOTH engines (same trick as
the CJK sku corpus): the derivation exercises every canonicalization
rule — scheme/case/www variance, tracking params, fragments, trailing
slashes — and guarantees a known dup population.

Each transform ships as a (Column-expression, DuckDB-SQL) twin pair so
the oracle replays the exact pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (java_or_shared_pattern, replacement) applied IN ORDER after lower():
# the same patterns are valid RE2 (DuckDB) and Java regex — anchored, no
# lookaround, no backrefs. Order matters: fragment before query strip
# (a fragment can trail the query), scheme before www.
_CANON_STEPS = [
    (r"#.*$", ""),            # drop fragment
    (r"\?utm_[^#]*$", ""),    # drop tracking-only query (utm_*)
    (r"^https?://", ""),      # scheme-insensitive identity
    (r"^www\.", ""),          # host alias
    (r"/+$", ""),             # trailing-slash alias (any run of them —
                              # a single-slash strip isn't idempotent
                              # on '//', caught by the property sweep)
]


def canonical_url(url: Column) -> Column:
    """Canonical identity of a URL: lowercase, fragment-free,
    tracking-param-free, scheme-less, www-less, no trailing slash.
    Non-tracking query params (?page=2) are PRESERVED — they address
    different content."""
    out = F.lower(url)
    for pat, rep in _CANON_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return out


def canonical_url_sql(expr: str) -> str:
    out = f"lower({expr})"
    for pat, rep in _CANON_STEPS:
        out = f"regexp_replace({out}, '{pat}', '{rep}')"
    return out


# registered domain = last two host labels (the synthetic hosts carry
# no public-suffix multi-label TLDs; a production run swaps this regex
# for a public-suffix-list lookup table broadcast-joined on host)
def registered_domain(canon: Column) -> Column:
    host = F.regexp_extract(canon, r"^([^/?]+)", 1)
    return F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)


def registered_domain_sql(canon_expr: str) -> str:
    host = f"regexp_extract({canon_expr}, '^([^/?]+)', 1)"
    return f"regexp_extract({host}, '([^.]+\\.[^.]+)$', 1)"


# deterministic synthetic URL from a BIGINT id — shared derivation for
# the catalog entries (see module docstring)
_HOSTS = [
    "www.Example.COM",
    "example.com",
    "blog.example.com",
    "News-Site.org",
    "www.news-site.org",
    "cdn.assets.net",
]


def synth_url(doc_id: Column) -> Column:
    scheme = F.when(doc_id % 2 == 0, F.lit("https://")).otherwise(
        F.lit("http://")
    )
    host = F.element_at(
        F.array(*[F.lit(h) for h in _HOSTS]), (doc_id % 6 + 1).cast("int")
    )
    path = F.concat(
        F.lit("/p/"), F.floor(doc_id / F.lit(3.0)).cast("string")
    )
    slash = F.when(doc_id % 5 == 0, F.lit("/")).otherwise(F.lit(""))
    query = (
        F.when(doc_id % 3 == 0, F.lit("?utm_source=feed"))
        .when(doc_id % 9 == 4, F.lit("?page=2"))
        .otherwise(F.lit(""))
    )
    frag = F.when(
        doc_id % 4 == 0, F.concat(F.lit("#s"), (doc_id % 3).cast("string"))
    ).otherwise(F.lit(""))
    return F.concat(scheme, host, path, slash, query, frag)


def synth_url_sql(id_expr: str) -> str:
    hosts = ", ".join(f"'{h}'" for h in _HOSTS)
    return (
        f"(CASE WHEN {id_expr} % 2 = 0 THEN 'https://' ELSE 'http://' END"
        f" || [{hosts}][CAST({id_expr} % 6 AS INT) + 1]"
        f" || '/p/' || CAST(CAST(floor({id_expr} / 3.0) AS BIGINT)"
        f"               AS VARCHAR)"
        f" || CASE WHEN {id_expr} % 5 = 0 THEN '/' ELSE '' END"
        f" || CASE WHEN {id_expr} % 3 = 0 THEN '?utm_source=feed'"
        f"         WHEN {id_expr} % 9 = 4 THEN '?page=2' ELSE '' END"
        f" || CASE WHEN {id_expr} % 4 = 0 THEN '#s' ||"
        f"           CAST({id_expr} % 3 AS VARCHAR) ELSE '' END)"
    )
