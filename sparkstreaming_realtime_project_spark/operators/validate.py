"""Data-quality expectations: declarative constraint checking as ONE
aggregate pass (the deequ / Delta-expectations pattern, north-star
extension).

A pipeline feeding a 100 TB training run needs its inputs validated the
same way its outputs are deduplicated — declaratively, in one scan, with
a machine-readable report. ``expectations_report`` takes named violation
predicates and produces one row per check from a single aggregate over
the (optionally pre-joined) frame: no per-check scan, no driver-side
loop over rows, and referential checks fold in as just another predicate
on a left-joined frame instead of a separate anti-join pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expectations_report(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """One row per check: (check_name, n_violations, n_rows, pass_rate).

    ``checks`` maps a check name to its VIOLATION predicate (true = the
    row fails the expectation). All checks evaluate in a single
    aggregate — conditional sums share the one scan — and the wide
    one-row result is exploded into the per-check report via an inline
    array of structs (a plan-local transpose, no shuffle beyond the
    aggregate's own).

    Referential integrity: left-join the reference table first and pass
    ``F.col("ref_key").isNull()`` as the predicate — the join IS the
    check, and it rides the same scan as every other expectation.
    """
    if not checks:
        raise ValueError("expectations_report: no checks given")
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(F.when(cond, 1).otherwise(0)).alias(f"__v_{name}")
        for name, cond in checks.items()
    ]
    wide = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("check_name"),
                F.col(f"__v_{name}").cast("long").alias("n_violations"),
            )
            for name in checks
        ]
    )
    return (
        wide.select(F.col("__n").alias("n_rows"), F.explode(entries).alias("e"))
        .select(
            F.col("e.check_name").alias("check_name"),
            F.col("e.n_violations").alias("n_violations"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.round(
                1.0 - F.col("e.n_violations") / F.col("n_rows"), 6
            ).alias("pass_rate"),
        )
        .orderBy("check_name")
    )


def bin_entries(
    numeric: dict[str, tuple[Column, float]] | None,
    categorical: dict[str, Column] | None,
) -> list[Column]:
    """(feature, bin) struct expressions for the PSI binning — numeric
    features bin by ``floor(col / width)`` (fixed-width, deterministic),
    categorical by value. Shared by the batch `drift_report` and the
    streaming drift guard so both sides of a batch-twin comparison bin
    identically.

    Bins are tagged injectively — value bins as ``"v" + str(value)``,
    null as ``"n"`` — because ``groupBy`` groups nulls together but a
    JOIN key does not (null-unsafe equality): without the tag the
    guard's ref/cur full-outer join would split one null bin into two
    eps-scored rows and inflate PSI relative to the batch twin, and a
    bare string sentinel would silently merge genuine nulls with a
    categorical value that happens to equal the sentinel. The tag keeps
    per-feature bin COUNTS identical to untagged grouping, so PSI (and
    the oracle twin, which groups raw values) is unchanged."""
    numeric = numeric or {}
    categorical = categorical or {}
    if not numeric and not categorical:
        raise ValueError("drift: no features given")

    def tagged(bin_expr):
        return F.when(bin_expr.isNull(), F.lit("n")).otherwise(
            F.concat(F.lit("v"), bin_expr)
        )

    return [
        F.struct(
            F.lit(name).alias("feature"),
            tagged(F.floor(col / F.lit(width)).cast("string")).alias("bin"),
        )
        for name, (col, width) in sorted(numeric.items())
    ] + [
        F.struct(
            F.lit(name).alias("feature"),
            tagged(col.cast("string")).alias("bin"),
        )
        for name, col in sorted(categorical.items())
    ]


def psi_from_counts(counts: DataFrame, eps: float = 1e-6) -> DataFrame:
    """Per-feature PSI from a (feature, bin, n_ref_bin, n_cur_bin)
    frame — the bins-sized second stage shared by `drift_report` and the
    streaming guard. Decimal-accumulated sum (partition-order-free)."""
    totals = counts.groupBy("feature").agg(
        F.sum("n_ref_bin").cast("long").alias("n_ref"),
        F.sum("n_cur_bin").cast("long").alias("n_cur"),
    )
    e = F.lit(eps)
    pr = F.when(F.col("n_ref_bin") == 0, e).otherwise(
        F.col("n_ref_bin") / F.col("n_ref")
    )
    pc = F.when(F.col("n_cur_bin") == 0, e).otherwise(
        F.col("n_cur_bin") / F.col("n_cur")
    )
    term = ((pr - pc) * F.log(pr / pc)).cast("decimal(18,12)")
    return (
        counts.join(F.broadcast(totals), "feature")
        .select("feature", "n_ref", "n_cur", term.alias("t"))
        .groupBy("feature", "n_ref", "n_cur")
        .agg(F.round(F.sum("t").cast("double"), 4).alias("psi"))
        .select("feature", "psi", "n_ref", "n_cur")
        .orderBy("feature")
    )


def drift_report(
    df: DataFrame,
    current: Column,
    numeric: dict[str, tuple[Column, float]] | None = None,
    categorical: dict[str, Column] | None = None,
    eps: float = 1e-6,
) -> DataFrame:
    """Population-stability-index (PSI) drift report between a REFERENCE
    slice (``current`` false) and a CURRENT slice (``current`` true) of
    one frame — the standard corpus-snapshot drift check a training-data
    pipeline runs before every ingestion batch (PSI < 0.1 stable,
    0.1-0.25 moderate shift, > 0.25 investigate).

    ``numeric`` maps feature name -> (column, bin_width): values bin by
    ``floor(col / width)`` — FIXED-width bins, not quantiles, so the
    binning is deterministic, engine-portable, and comparable across
    runs (quantile bins move with the data, which hides drift).
    ``categorical`` maps feature name -> column; each distinct value is
    its own bin.

    Shape: every feature rides ONE scan — per row, an inline array of
    (feature, bin) structs is exploded and counted by
    (feature, bin, side) with map-side partials; per-feature totals and
    the PSI sum are second-stage aggregates over the BIN-COUNT frame
    (bins-sized, not corpus-sized). Zero-count bins substitute ``eps``
    for the missing proportion (the PSI convention making the score
    finite when a bin exists on one side only).

    Returns (feature, psi, n_ref, n_cur) — one row per feature.
    """
    entries = bin_entries(numeric, categorical)
    pairs = df.select(
        current.cast("boolean").alias("__cur"), F.explode(F.array(*entries)).alias("fb")
    )
    counts = pairs.groupBy(
        F.col("fb.feature").alias("feature"), F.col("fb.bin").alias("bin")
    ).agg(
        F.sum(F.when(F.col("__cur"), 0).otherwise(1)).alias("n_ref_bin"),
        F.sum(F.when(F.col("__cur"), 1).otherwise(0)).alias("n_cur_bin"),
    )
    # Per-bin terms are doubles, but the per-feature SUM accumulates
    # through DECIMAL(18,12): double addition is partition-order
    # dependent (±1 ulp can flip the round(4) boundary); decimal
    # addition is exact, so the score replays bit-identically on any
    # engine/partitioning (the same convention the money aggregates use).
    return psi_from_counts(counts, eps)


def k_anonymity_report(
    df: DataFrame, quasi_cols: list, k: int = 5
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination (Sweeney):
    every row should be indistinguishable from at least k-1 others on
    the quasi-identifier columns; equivalence classes smaller than k
    are re-identification risks — the release gate a training-data
    pipeline runs BEFORE shipping user-derived records, the structural
    complement of the pattern-based PII scrub (which removes literal
    identifiers; this catches combinations of innocuous columns that
    are jointly identifying).

    ``quasi_cols``: column names or Column expressions (banded
    continuous values — floor(balance/1000) — belong here, passed as
    expressions; raw continuous columns make every row its own class
    and the report trivially all-risk). Returns one row per
    equivalence class: (quasi values..., n, at_risk) — a single
    groupBy, aggregate-state-sized output, sorted consumption left to
    the caller."""
    cols = [F.col(c) if isinstance(c, str) else c for c in quasi_cols]
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "*",
            (F.col("n") < k).cast("int").alias("at_risk"),
        )
    )


def l_diversity_report(
    df: DataFrame, quasi_cols: list, sensitive_col: str, l: int = 3
) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al., ICDE 2006): the
    k-anonymity follow-up — a class can be large (k-safe) yet leak the
    sensitive attribute anyway when every member SHARES it (homogeneity
    attack: "all 12 people in this class bought the same thing").
    Requires >= l distinct sensitive values per quasi-identifier
    equivalence class.

    Same single-groupBy shape as k_anonymity_report — one hash
    aggregate with count + count(distinct sensitive), class-sized
    output; run both audits before releasing user-derived records
    (k catches small classes, l catches uniform ones)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in quasi_cols]
    return (
        df.groupBy(*cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(sensitive_col).alias("n_sensitive"),
        )
        .select(
            "*",
            (F.col("n_sensitive") < l).cast("int").alias("at_risk"),
        )
    )


def t_closeness_report(
    df: DataFrame,
    quasi_cols: list,
    sensitive_col: str,
    t_num: int = 1,
    t_den: int = 5,
    decimals: int = 6,
) -> DataFrame:
    """t-closeness audit (Li/Li/Venkatasubramanian, ICDE 2007) — the
    third rung of the privacy ladder after k-anonymity (class size) and
    l-diversity (distinct sensitive values): a class can be k-large AND
    l-diverse yet still leak when its sensitive-value DISTRIBUTION
    deviates from the table's (skew attack: "90% of this class bought
    X" vs 20% globally). For a categorical sensitive attribute under
    the equal-distance ground metric, the Earth Mover's Distance
    reduces to total variation: EMD = 1/2 * sum_v |p_class(v) -
    p_global(v)|, summed over the GLOBAL value domain (values a class
    misses contribute their full global mass).

    Exactness by construction (the linkage_em discipline — design the
    float hazard out): each term's numerator is the INTEGER
    |cnt_v * N - cnt_gv * n| accumulated in DECIMAL(38,0) (exact,
    order-free, overflow-free at any scale), divided once by 2*n*N at
    the end; the threshold test multiplies through by the rational
    t = t_num/t_den and compares INTEGERS, so at_risk never depends on
    float rounding even when EMD sits exactly on t.

    Shape: two keyed aggregates over the data (class sizes,
    class x value counts), one value-domain-sized global distribution
    broadcast, one class x |V| join — output is class-sized. Returns
    (quasi..., n, emd, at_risk)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in quasi_cols]
    base = df.select(
        *cols, F.col(sensitive_col).alias("_s")
    )
    qnames = base.columns[:-1]
    cls = base.groupBy(*qnames).agg(F.count(F.lit(1)).alias("_n"))
    cv = base.groupBy(*qnames, "_s").agg(F.count(F.lit(1)).alias("_cnt"))
    gv = base.groupBy("_s").agg(F.count(F.lit(1)).alias("_cnt_g"))
    tot = base.agg(F.count(F.lit(1)).alias("_tot"))
    dec = "decimal(38,0)"
    full = (
        cls.crossJoin(F.broadcast(gv))
        .crossJoin(F.broadcast(tot))
        .join(cv, [*qnames, "_s"], "left")
    )
    num_v = F.abs(
        F.coalesce(F.col("_cnt"), F.lit(0)).cast(dec) * F.col("_tot").cast(dec)
        - F.col("_cnt_g").cast(dec) * F.col("_n").cast(dec)
    )
    per_cls = full.groupBy(*qnames, "_n", "_tot").agg(
        F.sum(num_v).alias("_num")
    )
    den = (
        F.lit(2).cast(dec) * F.col("_n").cast(dec) * F.col("_tot").cast(dec)
    )
    scale = float(10**decimals)
    emd = (
        F.floor(
            F.col("_num").cast("double") / den.cast("double") * F.lit(scale)
            + F.lit(0.5)
        )
        / F.lit(scale)
    )
    at_risk = (
        F.col("_num") * F.lit(t_den).cast(dec) > den * F.lit(t_num).cast(dec)
    )
    return per_cls.select(
        *qnames,
        F.col("_n").cast("long").alias("n"),
        emd.alias("emd"),
        at_risk.cast("int").alias("at_risk"),
    )


def benford_report(
    df: DataFrame,
    value_col: str,
    decimals: int = 6,
) -> DataFrame:
    """Benford first-significant-digit audit (Newcomb 1881 / Benford
    1938; Nigrini's fraud-screening form): naturally occurring,
    multiplicatively spread amounts put digit d first with probability
    log10(1 + 1/d) — fabricated, capped, or unit-mangled columns don't.
    The classic cheap screen over money columns before training on or
    aggregating them.

    Determinism by construction: the first digit comes from INTEGER
    math — floor(value) is exact on both engines and integer-to-string
    is canonical, so no log10(value) ever runs on DATA (an engine's
    libm vs StrictMath 1-ulp disagreement near a power of ten would
    flip a discrete digit); the Benford expectations are nine compiled
    CONSTANTS. Rows with value < 1 are excluded (their first
    significant digit needs the fractional expansion — out of scope for
    the money-column screen, stated not hidden).

    One hash aggregate; output is ALWAYS 9 rows: (digit, n, share,
    expected_share, abs_dev) — observed counts are left-joined onto a
    1..9 digit spine so a digit with ZERO occurrences still appears
    with n=0 (and abs_dev = expected_share). An absent digit is the
    strongest signal this screen exists to surface; dropping its row
    would hide exactly the worst case."""
    import math

    digit = F.substring(
        F.floor(F.col(value_col)).cast("long").cast("string"), 1, 1
    )
    observed = (
        df.filter(F.col(value_col) >= 1)
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spine = df.sparkSession.range(1, 10).select(
        F.col("id").cast("string").alias("digit")
    )
    counts = spine.join(observed, "digit", "left").select(
        "digit", F.coalesce(F.col("n"), F.lit(0)).alias("n")
    )
    tot = counts.agg(F.sum("n").alias("_tot"))
    scale = float(10**decimals)

    def _r(col):
        return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)

    expected = F.lit(None).cast("double")
    for d in range(9, 0, -1):
        expected = F.when(
            F.col("digit") == str(d), F.lit(math.log10(1.0 + 1.0 / d))
        ).otherwise(expected)
    share = F.col("n").cast("double") / F.col("_tot").cast("double")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.col("n").cast("long").alias("n"),
            _r(share).alias("share"),
            _r(expected).alias("expected_share"),
            _r(F.abs(share - expected)).alias("abs_dev"),
        )
    )


def referential_integrity_report(
    edges: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Foreign-key orphan audit over declared (name, child, child_key,
    parent, parent_key) edges: one row per edge with (edge, n_child,
    n_null_keys, n_orphan_rows, n_orphan_keys).

    The dedicated anti-join form of the referential check (the
    expectations_report docstring's left-join trick covers ad-hoc
    predicates; this one reports orphan KEY cardinality too, which the
    predicate form can't see). Per edge: one distinct projection of the
    parent key, one LEFT ANTI hash join keyed on it (broadcast when the
    parent is small — AQE decides), two aggregates. NULL child keys are
    counted separately, not as orphans (SQL FK semantics: NULL
    references nothing).

    A healthy warehouse reports zeros; at 100 TB the orphan-rate trend
    after every ingest is the earliest upstream-drop signal."""
    outs = []
    for name, child, ck, parent, pk in edges:
        keys = parent.select(F.col(pk).alias("__pk")).distinct()
        base = child.select(F.col(ck).alias("__ck"))
        orphans = base.filter(F.col("__ck").isNotNull()).join(
            keys, F.col("__ck") == F.col("__pk"), "left_anti"
        )
        stats = base.agg(
            F.count(F.lit(1)).alias("n_child"),
            F.count(F.when(F.col("__ck").isNull(), 1)).alias("n_null_keys"),
        )
        ostats = orphans.agg(
            F.count(F.lit(1)).alias("n_orphan_rows"),
            F.count_distinct("__ck").alias("n_orphan_keys"),
        )
        outs.append(
            stats.join(F.broadcast(ostats), F.lit(True), "left").select(
                F.lit(name).alias("edge"),
                F.col("n_child").cast("long").alias("n_child"),
                F.col("n_null_keys").cast("long").alias("n_null_keys"),
                F.col("n_orphan_rows").cast("long").alias("n_orphan_rows"),
                F.col("n_orphan_keys").cast("long").alias("n_orphan_keys"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def functional_dependency_report(
    fds: list[tuple[str, DataFrame, list[str], str]],
) -> DataFrame:
    """Functional-dependency audit over declared (name, frame,
    lhs_cols, rhs_col) rules: does LHS determine RHS? One row per rule:
    (fd, n_keys, n_violating_keys, max_distinct_rhs).

    A violated FD that the schema assumes (user -> country, order ->
    status) is silent data corruption that joins then FAN OUT on; the
    audit is one hash aggregate per rule (groupBy LHS, count_distinct
    RHS) plus a rule-sized second aggregate — no joins, no windows."""
    outs = []
    for name, df, lhs, rhs in fds:
        per_key = df.groupBy(*lhs).agg(
            F.count_distinct(F.col(rhs)).alias("__nd")
        )
        outs.append(
            per_key.agg(
                F.lit(name).alias("fd"),
                F.count(F.lit(1)).cast("long").alias("n_keys"),
                F.count(F.when(F.col("__nd") > 1, 1))
                .cast("long")
                .alias("n_violating_keys"),
                F.max("__nd").cast("long").alias("max_distinct_rhs"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def pk_candidate_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Primary-key candidate profile: for each candidate column, one
    row (column, n_rows, n_distinct, n_null, is_unique) — is_unique
    holds when every non-null value is distinct and no nulls exist.

    ONE aggregate computes every candidate's stats in a single scan
    (count_distinct per column shares the pass); the wide one-row
    result transposes to per-column rows via an inline array of structs
    — the same plan-local explode expectations_report uses, no second
    shuffle."""
    agg = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.count_distinct(F.col(c)).alias(f"__d_{c}") for c in cols],
        *[
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__z_{c}")
            for c in cols
        ],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").cast("long").alias("n_rows"),
                F.col(f"__d_{c}").cast("long").alias("n_distinct"),
                F.col(f"__z_{c}").cast("long").alias("n_null"),
                (
                    (F.col(f"__d_{c}") == F.col("__n"))
                    & (F.col(f"__z_{c}") == 0)
                )
                .cast("int")
                .alias("is_unique"),
            )
            for c in cols
        ]
    )
    return agg.select(F.explode(rows).alias("r")).select("r.*")
