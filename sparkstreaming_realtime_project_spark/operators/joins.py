"""Temporal / range / skew join operators the reference lacks.

SURVEY §2.4 closes with "Absent — no sort-merge/nested-loop/theta/range/
as-of/semi/anti joins anywhere; available for free in Spark if needed".
Semi/anti are catalog one-liners (j_semi_anti); the three families that
are NOT free — a naive Spark translation produces a nested-loop or a
skew-stalled plan — live here, each expressed as a composition of
shuffles Catalyst can reason about:

- ``asof_join``: union + per-key running ``last(ignorenulls)`` window —
  ONE hash shuffle on the key, no range predicate, no BNLJ ever.
- ``interval_overlap_join``: bucketize both interval sets to a shared
  grid, equi-join on (keys…, bucket), post-filter the exact predicate,
  and emit each pair exactly once WITHOUT a distinct (the pair is kept
  only in the bucket where the later interval starts).
- ``salted_join``: explicit key-salting for skewed equi-joins where a
  replicated small side beats AQE's post-hoc skew split.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType
from pyspark.sql.window import Window

__all__ = [
    "BloomModel",
    "asof_join",
    "asof_join_directional",
    "asof_join_nearest",
    "bloom_model",
    "interval_overlap_join",
    "salted_join",
]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    strict: bool = False,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the single right row
    with the greatest ``right_ts`` <= ``left_ts`` (``<`` when
    ``strict=True``) within the same ``on`` key — the classic as-of /
    point-in-time-correct join (kdb+ ``aj``, DuckDB ``ASOF JOIN``,
    pandas ``merge_asof``). Left rows with no prior right row keep NULLs
    (left-outer semantics).

    Plan shape (the scale argument): a range-predicate join in Spark
    degenerates to BroadcastNestedLoop/Cartesian. Instead both inputs are
    tagged and UNIONed, then one window per key sorted by
    (ts, side, tiebreak) computes a running ``last(value, ignorenulls)``
    over UNBOUNDED PRECEDING..CURRENT ROW — an O(1)-state running frame,
    ONE exchange on ``on``, never a pair blow-up. 100 TB behavior is the
    cost of a single repartition of left+right, same as any groupBy.

    Ties: at equal timestamps the right row IS visible unless ``strict``;
    among equal-``right_ts`` right rows the winner is the greatest
    ``tiebreak`` (required for a deterministic result when version rows
    can share a timestamp).

    All value columns travel in ONE struct (NULL struct on left rows, a
    non-null struct on every right row), so a single
    ``last(ignorenulls)`` picks the matched ROW atomically — per-column
    folds would let a NULL member fall through to an OLDER right row's
    value, silently mixing rows.
    """
    tiebreak = tiebreak or []
    lcols = left.columns
    vtype = StructType(
        [StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    # Side marker doubles as the equal-ts visibility switch: the window
    # sort is (ts, __side, tiebreak), so side 0 sorts before side 1 at
    # the same ts. Inclusive => right first (0); strict => left first.
    l_side, r_side = (0, 1) if strict else (1, 0)

    ltag = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("__ts"),
        F.lit(l_side).alias("__side"),
        F.lit(None).cast(vtype).alias("__vrow"),
        *[F.lit(None).cast(right.schema[t].dataType).alias(f"__tb_{t}") for t in tiebreak],
    )
    rtag = right.filter(F.col(right_ts).isNotNull()).select(
        *[F.col(k) for k in on],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on],
        F.col(right_ts).alias("__ts"),
        F.lit(r_side).alias("__side"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__vrow"),
        *[F.col(t).alias(f"__tb_{t}") for t in tiebreak],
    ).select(*ltag.columns)  # align union order

    w = (
        Window.partitionBy(*on)
        .orderBy(
            F.col("__ts").asc_nulls_first(),
            F.col("__side").asc(),
            *[F.col(f"__tb_{t}").asc_nulls_first() for t in tiebreak],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    row = F.last(F.col("__vrow"), ignorenulls=True).over(w)
    out = ltag.unionByName(rtag).select(
        *[F.col(c) for c in lcols],
        F.col("__side"),
        *[row[c].alias(c) for c in value_cols],
    )
    return out.filter(F.col("__side") == l_side).drop("__side")


def asof_join_directional(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    direction: str = "backward",
    tolerance: float | int | None = None,
    strict: bool = False,
    tiebreak: list[str] | None = None,
    match_ts: str | None = None,
) -> DataFrame:
    """``asof_join`` with a ``direction`` knob (pandas ``merge_asof``
    parity): ``backward`` attaches the greatest ``right_ts`` <=
    ``left_ts`` (identical semantics to :func:`asof_join`), ``forward``
    the smallest ``right_ts`` >= ``left_ts``. ``tolerance`` (same units
    as the — numeric — ts columns) nulls the attachment when the match
    is further than that; ``match_ts`` optionally exposes the matched
    right timestamp as a column.

    Same plan as asof_join — tag, UNION, ONE window per key over a
    running ``last(ignorenulls)`` frame — with the window sorted
    DESCENDING for forward (a forward as-of is a backward as-of on the
    reversed timeline). Never a range-predicate join, so never a
    BroadcastNestedLoop/Cartesian pair blow-up; cost is one exchange of
    left+right on ``on`` at any scale.

    Ties: at equal timestamps the right row is visible unless
    ``strict``; among right rows sharing a timestamp the winner is the
    greatest ``tiebreak`` in BOTH directions (deterministic output —
    document, don't inherit, engine row order).

    The matched timestamp and every value column travel in ONE struct
    through a single ``last(ignorenulls)`` — per-column folds would let
    a NULL value member fall through to a right row OTHER than the
    matched one (outside the tolerance, even), silently mixing rows."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    forward = direction == "forward"
    tiebreak = tiebreak or []
    lcols = left.columns
    vtype = StructType(
        [StructField("__mts", right.schema[right_ts].dataType)]
        + [StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    l_side, r_side = (0, 1) if strict else (1, 0)

    ltag = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("__ts"),
        F.lit(l_side).alias("__side"),
        F.lit(None).cast(vtype).alias("__vrow"),
        *[F.lit(None).cast(right.schema[t].dataType).alias(f"__tb_{t}") for t in tiebreak],
    )
    rtag = right.filter(F.col(right_ts).isNotNull()).select(
        *[F.col(k) for k in on],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on],
        F.col(right_ts).alias("__ts"),
        F.lit(r_side).alias("__side"),
        F.struct(
            F.col(right_ts).alias("__mts"),
            *[F.col(c) for c in value_cols],
        ).alias("__vrow"),
        *[F.col(t).alias(f"__tb_{t}") for t in tiebreak],
    ).select(*ltag.columns)

    ts_order = F.col("__ts").desc_nulls_first() if forward else F.col("__ts").asc_nulls_first()
    w = (
        Window.partitionBy(*on)
        .orderBy(
            ts_order,
            F.col("__side").asc(),
            *[F.col(f"__tb_{t}").asc_nulls_first() for t in tiebreak],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    row = F.last(F.col("__vrow"), ignorenulls=True).over(w)
    mts = row["__mts"]
    delta = (mts - F.col("__ts")) if forward else (F.col("__ts") - mts)
    ok = mts.isNotNull() if tolerance is None else (delta <= F.lit(tolerance))
    out = ltag.unionByName(rtag).select(
        *[F.col(c) for c in lcols],
        F.col("__side"),
        *([F.when(ok, mts).alias(match_ts)] if match_ts else []),
        *[F.when(ok, row[c]).alias(c) for c in value_cols],
    )
    return out.filter(F.col("__side") == l_side).drop("__side")


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance: float | int | None = None,
    tiebreak: list[str] | None = None,
    match_ts: str | None = None,
) -> DataFrame:
    """Nearest-direction as-of: per left row, the right row with the
    smallest |right_ts - left_ts| within the key, exact ties going to
    the BACKWARD (earlier) match — two directional passes joined on the
    caller's unique ``left_key`` (two windows, not a range join; the
    explicit key keeps the recombination deterministic — a generated id
    could be re-derived differently in each branch).

    ``tolerance`` bounds both directions; rows with no match inside it
    keep NULLs (left-outer semantics, like pandas merge_asof
    direction='nearest')."""
    b = asof_join_directional(
        left, right, on, left_ts, right_ts, value_cols,
        direction="backward", tolerance=tolerance, tiebreak=tiebreak,
        match_ts="__b_mts",
    ).select(
        left_key,
        F.col("__b_mts"),
        *[F.col(c).alias(f"__b_{c}") for c in value_cols],
    )
    f = asof_join_directional(
        left, right, on, left_ts, right_ts, value_cols,
        direction="forward", tolerance=tolerance, tiebreak=tiebreak,
        match_ts="__f_mts",
    ).select(
        left_key,
        F.col("__f_mts"),
        *[F.col(c).alias(f"__f_{c}") for c in value_cols],
    )
    lts = F.col("__lts")
    use_b = F.col("__b_mts").isNotNull() & (
        F.col("__f_mts").isNull()
        | ((lts - F.col("__b_mts")) <= (F.col("__f_mts") - lts))
    )
    out = (
        left.withColumn("__lts", F.col(left_ts))
        .join(b, left_key, "left")
        .join(f, left_key, "left")
    )
    picked = out.select(
        *[F.col(c) for c in left.columns],
        *(
            [F.when(use_b, F.col("__b_mts")).otherwise(F.col("__f_mts")).alias(match_ts)]
            if match_ts
            else []
        ),
        *[
            F.when(use_b, F.col(f"__b_{c}")).otherwise(F.col(f"__f_{c}")).alias(c)
            for c in value_cols
        ],
    )
    return picked


def interval_overlap_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    probe_start: str,
    probe_end: str,
    build_start: str,
    build_end: str,
    bucket_width: int,
    probe_prefix: str = "p_",
    build_prefix: str = "b_",
) -> DataFrame:
    """All (probe, build) interval pairs sharing the ``on`` keys whose
    [start, end] ranges (inclusive, numeric — e.g. epoch days/seconds)
    overlap. The interval/range join Spark's optimizer turns into a
    nested loop when written as a theta-join.

    Plan shape: each interval explodes into the grid buckets it covers
    (``sequence(start div w, end div w)`` — fan-out (len/w)+1, bounded
    and chosen by the caller), the two sides EQUI-join on
    (keys…, bucket), and the exact overlap predicate filters the bucket
    collisions. A pair overlapping k shared buckets would surface k
    times; instead of a distinct (second shuffle) each pair is emitted
    only in the bucket where the LATER of the two intervals starts —
    exactly one bucket, zero duplicates, dedup for free.

    At 100 TB the knobs are ``bucket_width`` (≈ median interval length
    keeps fan-out ~2 and bucket occupancy uniform) and the usual salting
    if one (key, bucket) cell is hot.
    """
    w = int(bucket_width)

    def buckets(df: DataFrame, start: str, end: str, prefix: str) -> DataFrame:
        renamed = df.select(
            *[F.col(k) for k in on],
            *[
                F.col(c).alias(f"{prefix}{c}")
                for c in df.columns
                if c not in on
            ],
        )
        lo = F.floor(F.col(f"{prefix}{start}") / w)
        hi = F.floor(F.col(f"{prefix}{end}") / w)
        return renamed.withColumn("__bucket", F.explode(F.sequence(lo, hi)))

    p = buckets(probe, probe_start, probe_end, probe_prefix)
    b = buckets(build, build_start, build_end, build_prefix)
    ps, pe = F.col(f"{probe_prefix}{probe_start}"), F.col(f"{probe_prefix}{probe_end}")
    bs, be = F.col(f"{build_prefix}{build_start}"), F.col(f"{build_prefix}{build_end}")
    pair_bucket = F.floor(F.greatest(ps, bs) / w)  # later start => unique bucket
    return (
        p.join(b, on=on + ["__bucket"], how="inner")
        .filter((ps <= be) & (bs <= pe) & (F.col("__bucket") == pair_bucket))
        .drop("__bucket")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: spread each hot key of ``left`` across
    ``salt`` sub-keys and replicate every ``right`` row ``salt`` times so
    all copies still meet. Result is EXACTLY the plain join (the salt
    column never leaves the operator); only task balance changes.

    When to reach for it at scale: one key holding >> 1/shuffle-partitions
    of the rows pins the whole stage on one task. AQE's skew-join split
    handles the SORT-MERGE case after the fact; explicit salting also
    covers aggregate-then-join pipelines and keeps the choice visible in
    the plan. Cost: right side is duplicated ``salt``× — use with a
    small-to-medium build side (if it's small enough to broadcast,
    broadcast instead and skew stops mattering entirely).

    ``how`` is restricted to inner/left joins (right/full would need the
    mirrored construction): the replicated side must be the build side.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left' only")
    if salt < 1:
        raise ValueError("salt must be >= 1")
    # Deterministic but uniform: hash every left column so two identical
    # rows land on the same sub-key (keeps the operator a pure function).
    lsalted = left.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(salt))
    )
    replicate = F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    rsalted = right.withColumn("__salt", replicate)
    return lsalted.join(rsalted, on=on + ["__salt"], how=how).drop("__salt")


def bloom_bitmap(
    keys: DataFrame, key_col: str, m_bits: int = 1 << 13, k_hashes: int = 5
) -> list[int]:
    """Build an ``m_bits`` bloom filter over the key set, returned as
    ``m_bits/64`` little-endian 64-bit words (a driver-side model, like
    IVF centroids: the filter is dim-table-sized metadata, never data).

    Built with one Spark aggregation: each key projects its k bit
    positions (``pmod(xxhash64(key, seed_j), m)``), positions fold into
    (word, mask) pairs, and ``bit_or`` merges masks per word — at most
    m/64 rows cross to the driver regardless of key count. Size
    ``m_bits ~ 10 x n_keys`` for ~1% false positives (k=5 near-optimal
    at that ratio).
    """
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(key_col), F.lit(j)), F.lit(m_bits))
                    for j in range(k_hashes)
                ]
            )
        ).alias("pos")
    )
    words = (
        pos.select(
            (F.col("pos") / 64).cast("long").alias("word"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), F.pmod(F.col("pos"), 64).cast("int")
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    arr = [0] * (m_bits // 64)
    for r in words:
        arr[int(r["word"])] = int(r["bits"])
    return arr


def bloom_might_contain(
    key: Column, bitmap: list[int], m_bits: int, k_hashes: int = 5
) -> Column:
    """Membership predicate against a bloom_bitmap: true iff all k bits
    are set. Pure JVM-side expression (array literal + bit math) — stays
    inside whole-stage codegen, evaluated during the SCAN, before any
    shuffle."""
    arr = F.array(*[F.lit(w).cast("long") for w in bitmap])
    checks = []
    for j in range(k_hashes):
        p = F.pmod(F.xxhash64(key, F.lit(j)), F.lit(m_bits))
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), F.pmod(p, 64).cast("int")
        )
        checks.append(word.bitwiseAND(mask) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


class BloomModel(NamedTuple):
    """A bloom filter plus the parameters it was BUILT with, carried as
    one value so membership checks can never probe with a mismatched
    m_bits/k_hashes (a silent mismatch reads absent bits and returns
    false — false NEGATIVES from a structure whose whole contract is
    one-sided error)."""

    words: list[int]
    m_bits: int
    k_hashes: int

    def might_contain(self, key: Column) -> Column:
        return bloom_might_contain(key, self.words, self.m_bits, self.k_hashes)


def bloom_model(
    keys: DataFrame, key_col: str, m_bits: int = 1 << 13, k_hashes: int = 5
) -> BloomModel:
    """bloom_bitmap + its build parameters as one self-consistent model
    (pass THIS to consumers, not the raw word list)."""
    return BloomModel(bloom_bitmap(keys, key_col, m_bits, k_hashes), m_bits, k_hashes)


def bloom_semi_join(
    fact: DataFrame,
    dim_keys: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 1 << 13,
    k_hashes: int = 5,
) -> DataFrame:
    """Semi-join ``fact`` to ``dim_keys`` with a bloom-filter scan prune:
    the filter (built once, driver-side, dim-sized) eliminates ~all
    non-matching fact rows DURING the scan, so the exact left-semi join
    that follows shuffles only survivors (true matches + ~1% false
    positives) instead of the full fact table. The final semi join makes
    the result exact — bloom false positives cost only bytes, never
    correctness.

    This is the explicit, engine-portable form of what DPP / runtime
    bloom filters (spark.sql.optimizer.runtime.bloomFilter.enabled) do
    opportunistically: at 100 TB the win is shuffling ~selectivity of
    the fact table rather than all of it. Keep the dim side semi-join
    broadcast-able when small; Catalyst picks BroadcastHashJoin on the
    survivor join automatically under the thresholds.

    EAGER at construction: building the bitmap runs one Spark
    aggregation over dim_keys immediately (the model-build pattern of
    ivf_centroids — the filter is dim-table-sized metadata and must be
    literals to evaluate during the scan), and the dim side is read
    again by the exact semi join. Plan-only consumers pay that one
    dim-sized job too.
    """
    bits = bloom_bitmap(dim_keys, dim_key, m_bits, k_hashes)
    pruned = fact.filter(
        bloom_might_contain(F.col(fact_key), bits, m_bits, k_hashes)
    )
    return pruned.join(
        dim_keys.withColumnRenamed(dim_key, fact_key).select(fact_key).distinct(),
        on=fact_key,
        how="left_semi",
    )
