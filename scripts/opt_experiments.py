"""Round-13 optimization experiments: candidate rewrites of the three
bench heavyweights, each timed bench-style (median of 5, plan rebuilt,
cache cleared) AND checked row-identical against the current
implementation before it is allowed into the library.

Usage: python scripts/opt_experiments.py [exp ...]   (default: all)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sparkstreaming_realtime_project_spark.operators import dedup as dd
from sparkstreaming_realtime_project_spark.session import get_spark
from sparkstreaming_realtime_project_spark.sources.batch import load_table

SF_DIR = "/root/testdata/sf0.1"


def rows_key(df):
    return sorted(tuple(r) for r in df.collect())


def bench_style(spark, label, build, n=5):
    runs = []
    for i in range(n + 1):
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        if i:
            runs.append(dt)
        spark.catalog.clearCache()
    med = sorted(runs)[len(runs) // 2]
    print(f"  {label:52s} {med:6.3f}s  ({' '.join(f'{r:.2f}' for r in runs)})")
    return med


# --- suffix variants -------------------------------------------------------

def suffix_current(docs):
    return dd.suffix_span_pairs(docs, "text", "doc_id", k=8, min_len=16,
                                max_df=64, materialize=True)


def suffix_nomat(docs):
    return dd.suffix_span_pairs(docs, "text", "doc_id", k=8, min_len=16,
                                max_df=64, materialize=False)


def suffix_window_cap(docs, materialize=False, k=8, min_len=16, max_df=64):
    grams = dd.suffix_anchors(docs, "text", "doc_id", k)
    if materialize:
        grams = grams.persist()
    wg = Window.partitionBy("g")
    anchors = (
        grams.withColumn("__df", F.count(F.lit(1)).over(wg))
        .filter(F.col("__df") <= max_df)
        .drop("__df")
    )
    a, b = anchors.alias("a"), anchors.alias("b")
    matches = a.join(
        b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.pos").alias("pa"),
        F.col("b.pos").alias("pb"),
        (F.col("a.pos") - F.col("b.pos")).alias("diag"),
    )
    out = dd.suffix_runs_to_spans(matches, k, min_len, ["doc_a", "doc_b"])
    return out.withColumn("span_len", F.col("span_len").cast("long"))


# --- ngram variants --------------------------------------------------------

def ngram_current(docs):
    return dd.ngram_jaccard_dedup_pairs(docs, "text", "doc_id", n=3,
                                        threshold=0.8, max_df=50)


def _ngram_window_prefix(shingled, threshold, max_df):
    ex = shingled.select(
        "id", F.size("shingles").alias("ln"), F.explode("shingles").alias("g")
    )
    wg = Window.partitionBy("g")
    wid = Window.partitionBy("id").orderBy("df", "g")
    prefix = (
        ex.withColumn("df", F.count(F.lit(1)).over(wg))
        .withColumn("rk", F.row_number().over(wid))
        .filter(
            (
                F.col("rk")
                <= F.col("ln")
                - F.ceil(F.col("ln") * F.lit(threshold) - F.lit(1e-9))
                + 1
            )
            & (F.col("df") <= max_df)
        )
        .select("id", "ln", "g")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    tl = F.lit(threshold)
    len_ok = (
        F.col("a.ln") >= F.ceil(F.col("b.ln") * tl - F.lit(1e-9))
    ) & (F.col("b.ln") >= F.ceil(F.col("a.ln") * tl - F.lit(1e-9)))
    return (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.id") < F.col("b.id"))
            & len_ok,
        )
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .distinct()
    )


def ngram_window(docs, materialize=True, lazy=False, threshold=0.8, max_df=50):
    shingled = dd.with_shingles(docs, "text", "doc_id", 3, materialize=False)
    if materialize:
        shingled = shingled.persist()
        if not lazy:
            shingled.count()
    cands = _ngram_window_prefix(shingled, threshold, max_df)
    pairs = dd.jaccard_pairs(shingled, threshold, candidates=cands).persist()
    pairs.count()
    shingled.unpersist()
    return pairs


def ngram_lazy(docs):
    """Current topology, but shingled persist is lazy (no count job)."""
    shingled = dd.with_shingles(docs, "text", "doc_id", 3, materialize=False).persist()
    pairs = dd.jaccard_pairs(shingled, 0.8, max_df=50).persist()
    pairs.count()
    shingled.unpersist()
    return pairs


# --- minhash variants ------------------------------------------------------

def minhash_current(docs):
    return dd.minhash_dedup_pairs(docs, "text", "doc_id", n=3, k=16, bands=4,
                                  threshold=0.8, max_bucket=50)


def minhash_window(docs, lazy=True, k=16, bands=4, threshold=0.8, max_bucket=50):
    shingled = dd.with_shingles(docs, "text", "doc_id", 3, materialize=False)
    sig = dd.minhash_signature(shingled, k).persist()
    if not lazy:
        sig.count()
    banded = dd.band_keys(sig, k, bands)
    wb = Window.partitionBy("band", "key")
    kept = (
        banded.withColumn("__sz", F.count(F.lit(1)).over(wb))
        .filter(F.col("__sz") <= max_bucket)
        .drop("__sz")
    )
    a, b2 = kept.alias("a"), kept.alias("b")
    cands = (
        a.join(
            b2,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .distinct()
    )
    pairs = dd.jaccard_pairs(
        sig.select("id", "shingles"), threshold, candidates=cands
    ).persist()
    pairs.count()
    sig.unpersist()
    return pairs


def minhash_lazy(docs):
    """Current topology, sig persist lazy."""
    shingled = dd.with_shingles(docs, "text", "doc_id", 3, materialize=False)
    sig = dd.minhash_signature(shingled, 16).persist()
    cands = dd.lsh_candidate_pairs(sig, 16, 4, max_bucket=50)
    pairs = dd.jaccard_pairs(
        sig.select("id", "shingles"), 0.8, candidates=cands
    ).persist()
    pairs.count()
    sig.unpersist()
    return pairs


# --- r14 ngram variants -----------------------------------------------------
#
# The r13 "window-df prefix" variant lost (2.9-3.5 s vs 2.48) because the
# prefix pipeline was LAZY: the candidate self-join builds it twice (the r13
# after-plan shows the full explode -> df -> rank chain duplicated per side —
# AQE does not reuse exchanges across InMemoryRelation-rooted subtrees). The
# r14 variants persist the PREFIX once, which also lets the shingle cache
# fill lazily inside the same single-subtree job (no racing broadcast
# builds -> the standalone with_shingles count job disappears).


def _prefix_window(shingled, threshold, max_df):
    """Single-read PPJoin prefix: df as a count window over g (no
    aggregate+join-back), df-prefilter BEFORE the rank window (rank-
    invariant: ranks count only (df,g)-smaller rows, all of which have
    df <= this row's df <= max_df)."""
    t_sql = f"CAST({threshold!r} AS DOUBLE)"
    return (
        shingled.selectExpr(
            "id", "size(shingles) AS ln", "explode(shingles) AS g"
        )
        .selectExpr("*", "count(1) OVER (PARTITION BY g) AS df")
        .filter(f"df <= {max_df}")
        .selectExpr(
            "*", "row_number() OVER (PARTITION BY id ORDER BY df, g) AS rk"
        )
        .filter(f"rk <= ln - ceil(ln * {t_sql} - 1e-9) + 1")
        .select("id", "ln", "g")
    )


def _prefix_agg(shingled, threshold, max_df):
    """Prefix with the CURRENT df computation (aggregate + join back),
    for isolating window-df vs prefix-caching effects."""
    t_sql = f"CAST({threshold!r} AS DOUBLE)"
    ex = shingled.selectExpr(
        "id", "size(shingles) AS ln", "explode(shingles) AS g"
    )
    dftab = ex.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    return (
        ex.join(dftab, "g")
        .selectExpr(
            "*", "row_number() OVER (PARTITION BY id ORDER BY df, g) AS rk"
        )
        .filter(f"rk <= ln - ceil(ln * {t_sql} - 1e-9) + 1 AND df <= {max_df}")
        .select("id", "ln", "g")
    )


def _cands_from_prefix(prefix, threshold):
    t_sql = f"CAST({threshold!r} AS DOUBLE)"
    a, b = prefix.alias("a"), prefix.alias("b")
    return (
        a.join(
            b,
            F.expr(
                "a.g = b.g AND a.id < b.id"
                f" AND a.ln >= ceil(b.ln * {t_sql} - 1e-9)"
                f" AND b.ln >= ceil(a.ln * {t_sql} - 1e-9)"
            ),
        )
        .selectExpr("a.id AS doc_a", "b.id AS doc_b")
        .distinct()
    )


def ngram_prefix_cached(docs, dfmode="window", eager_shingles=False,
                        threshold=0.8, max_df=50):
    shingled = dd.with_shingles(docs, "text", "doc_id", 3,
                                materialize=eager_shingles)
    if not eager_shingles:
        shingled = shingled.persist()
    mk = _prefix_window if dfmode == "window" else _prefix_agg
    prefix = mk(shingled, threshold, max_df).persist()
    prefix.count()  # one job fills shingle + prefix caches, one subtree
    cands = _cands_from_prefix(prefix, threshold)
    pairs = dd.jaccard_pairs(shingled, threshold, candidates=cands).persist()
    pairs.count()
    prefix.unpersist()
    shingled.unpersist()
    return pairs


def ngram_window_lazy_all(docs, threshold=0.8, max_df=50):
    """window-df prefix, nothing persisted but shingles (lazy): the r13
    loser shape, re-measured with the df-prefilter."""
    shingled = dd.with_shingles(docs, "text", "doc_id", 3,
                                materialize=False).persist()
    cands = _cands_from_prefix(_prefix_window(shingled, threshold, max_df),
                               threshold)
    pairs = dd.jaccard_pairs(shingled, threshold, candidates=cands).persist()
    pairs.count()
    shingled.unpersist()
    return pairs


# --- r14 suffix tail variants -----------------------------------------------


def runs_to_spans_fold(matches, k, min_len, pair_cols):
    """Gaps-and-islands as ONE aggregate fold: collect each (pair, diag)
    group's sorted (pa, pb) anchors and fold them into maximal spans with
    a single higher-order aggregate() — replaces Sort + lag-Window +
    sum-Window + min/max HashAggregate above the same exchange."""
    acc0 = (
        "named_struct('spans', CAST(array() AS "
        "ARRAY<STRUCT<s:INT,e:INT,bmin:INT,bmax:INT>>), "
        "'s', ps[0].pa, 'e', ps[0].pa, 'bmin', ps[0].pb, 'bmax', ps[0].pb)"
    )
    step = (
        f"(acc, x) -> IF(x.pa > acc.e + {k}, "
        "named_struct('spans', acc.spans || array(named_struct('s', acc.s, "
        "'e', acc.e, 'bmin', acc.bmin, 'bmax', acc.bmax)), "
        "'s', x.pa, 'e', x.pa, 'bmin', x.pb, 'bmax', x.pb), "
        "named_struct('spans', acc.spans, 's', acc.s, 'e', x.pa, "
        "'bmin', least(acc.bmin, x.pb), 'bmax', greatest(acc.bmax, x.pb)))"
    )
    fin = (
        "acc -> acc.spans || array(named_struct('s', acc.s, 'e', acc.e, "
        "'bmin', acc.bmin, 'bmax', acc.bmax))"
    )
    grouped = (
        matches.groupBy(*pair_cols, "diag")
        .agg(F.expr("sort_array(collect_list(struct(pa, pb)))").alias("ps"))
        .selectExpr(
            *pair_cols,
            "diag",
            f"aggregate(slice(ps, 2, size(ps) - 1), {acc0}, {step}, {fin})"
            " AS spans",
        )
    )
    return (
        grouped.selectExpr(*pair_cols, "diag", "inline(spans)")
        .selectExpr(
            *pair_cols,
            "s AS a_start",
            f"e + {k - 1} AS a_end",
            "bmin AS b_start",
            f"bmax + {k - 1} AS b_end",
            f"e - s + {k} AS span_len",
        )
        .filter(f"span_len >= {min_len}")
    )


def suffix_fold(docs, k=8, min_len=16, max_df=64):
    grams = dd.suffix_anchors(docs, "text", "doc_id", k)
    anchors = dd._capped_by_count(grams, ["g"], max_df)
    a, b = anchors.alias("a"), anchors.alias("b")
    matches = a.join(
        b, F.expr("a.g = b.g AND a.doc_id < b.doc_id")
    ).selectExpr(
        "a.doc_id AS doc_a", "b.doc_id AS doc_b",
        "a.pos AS pa", "b.pos AS pb", "a.pos - b.pos AS diag",
    )
    out = runs_to_spans_fold(matches, k, min_len, ["doc_a", "doc_b"])
    return out.selectExpr(
        "doc_a", "doc_b", "a_start", "a_end", "b_start", "b_end",
        "CAST(span_len AS INT) AS span_len",
    )


# --- r14 minhash variants ---------------------------------------------------


def minhash_banded_cached(docs, k=16, bands=4, threshold=0.8, max_bucket=50):
    """r14: persist the capped band table once. The sig cache under the
    band chain breaks AQE exchange reuse (scripts/reuse_probe.py), so
    the r13 shape executed the explode+exchange+window-cap chain twice
    (one side as a 9 MiB broadcast build). Caching the 20k-row capped
    band table makes the self-join read it twice for free, and its fill
    job also fills the sig cache (single subtree - no race)."""
    shingled = dd.with_shingles(docs, "text", "doc_id", 3, materialize=False)
    sig = dd.minhash_signature(shingled, k).persist()
    banded = dd._capped_by_count(
        dd.band_keys(sig, k, bands), ["band", "key"], max_bucket
    ).persist()
    banded.count()
    a, b2 = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(b2, F.expr("a.band = b.band AND a.key = b.key AND a.id < b.id"))
        .selectExpr("a.id AS doc_a", "b.id AS doc_b")
        .distinct()
    )
    pairs = dd.jaccard_pairs(
        sig.select("id", "shingles"), threshold, candidates=cands
    ).persist()
    pairs.count()
    banded.unpersist()
    sig.unpersist()
    return pairs


EXPERIMENTS = {
    "suffix": [
        ("suffix current (mat=True)", suffix_current),
        ("suffix mat=False", suffix_nomat),
        ("suffix window-cap mat=False", lambda d: suffix_window_cap(d, False)),
        ("suffix window-cap mat=True", lambda d: suffix_window_cap(d, True)),
    ],
    "ngram": [
        ("ngram current (eager shingle cache)", ngram_current),
        ("ngram lazy shingle cache", ngram_lazy),
        ("ngram window-df prefix (eager)", lambda d: ngram_window(d, True, False)),
        ("ngram window-df prefix (lazy)", lambda d: ngram_window(d, True, True)),
        ("ngram window-df prefix (no cache)", lambda d: ngram_window(d, False)),
    ],
    "ngram14": [
        ("ngram current (r13 shape)", ngram_current),
        ("ngram prefix-cached window-df lazy-shingles",
         lambda d: ngram_prefix_cached(d, "window", False)),
        ("ngram prefix-cached agg-df lazy-shingles",
         lambda d: ngram_prefix_cached(d, "agg", False)),
        ("ngram prefix-cached window-df eager-shingles",
         lambda d: ngram_prefix_cached(d, "window", True)),
        ("ngram window-df all-lazy (r13 loser recheck)",
         ngram_window_lazy_all),
    ],
    "suffix14": [
        ("suffix current (r13 shape)", suffix_nomat),
        ("suffix fold tail", suffix_fold),
    ],
    "minhash14": [
        ("minhash current (r13 shape)", minhash_current),
        ("minhash banded-cached", minhash_banded_cached),
    ],
    "minhash": [
        ("minhash current (eager sig cache)", minhash_current),
        ("minhash lazy sig cache", minhash_lazy),
        ("minhash window bucket-cap (lazy)", lambda d: minhash_window(d, True)),
        ("minhash window bucket-cap (eager)", lambda d: minhash_window(d, False)),
    ],
}


def main() -> None:
    which = sys.argv[1:] or list(EXPERIMENTS)
    spark = get_spark(app_name="opt-experiments")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")
    for group in which:
        print(f"== {group} ==")
        variants = EXPERIMENTS[group]
        ref_rows = None
        for label, build in variants:
            df = build(docs)
            key = rows_key(df)
            if ref_rows is None:
                ref_rows = key
                eq = "REF "
            else:
                eq = "SAME" if key == ref_rows else "DIFF !!!"
            spark.catalog.clearCache()
            print(f"  [{eq}] rows={len(key)}")
            bench_style(spark, label, lambda b=build: b(docs))


if __name__ == "__main__":
    main()
