"""Data-layout operators: multi-dimensional clustering for scan pruning.

At 100 TB the cheapest query is the one that never reads the file:
parquet/Delta readers skip row groups whose column min/max ranges miss
the predicate. Sorting by ONE column gives that column tight ranges and
leaves every other column's ranges full-width; interleaving the bits of
k columns (a Z-order / Morton curve) gives ALL k columns
locality-preserving ranges, so files pruned by x-predicates AND
y-predicates both stay skippable. This is what `OPTIMIZE ... ZORDER BY`
does in lakehouse engines, expressed here as plain columnar math +
repartitionByRange so it works on any sink.

Determinism: cell assignment is pure integer arithmetic on the column's
[min, max] range — exact on any engine, no float boundaries — which is
what lets the DuckDB oracle replay the key bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "zorder_cell", "zorder_key", "cluster_by_zorder", "compaction_plan",
]


def zorder_cell(col: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Map an integer column with range [mn, mx] onto a 2^bits grid cell:
    ``floor((x - mn) * 2^bits / (mx - mn + 1))`` — monotone, and the +1
    keeps the maximum inside cell 2^bits - 1. Exactness: numerator and
    span are integers well under 2^52, the true quotient is a rational
    with denominator ``span``, so the correctly-rounded double quotient
    is never within 1/span of the wrong side of an integer — floor() is
    engine-exact (same argument DuckDB's ``//`` replays with pure
    integer division)."""
    span = (mx - mn + F.lit(1)).cast("bigint")
    return F.floor(
        (col.cast("bigint") - mn.cast("bigint")) * F.lit(1 << bits) / span
    ).cast("bigint")


def _interleave(cells: list[Column], bits: int) -> Column:
    """Morton interleave: bit i of cell j lands at position i*k + j.
    Pure shift/and/sum expressions on bigint — whole-stage codegen, no
    UDF, no narrowing cast (cells can exceed 32 bits)."""
    k = len(cells)
    out = F.lit(0).cast("bigint")
    for j, c in enumerate(cells):
        for i in range(bits):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1).cast("bigint"))
            out = out + bit * F.lit(1 << (i * k + j))
    return out


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 8, key_name: str = "zkey"
) -> DataFrame:
    """Attach grid cells + the interleaved Z-order key for ``cols``
    (integer-valued columns; timestamps should be pre-projected to epoch
    seconds/days by the caller).

    Two passes: one tiny global min/max aggregate (k columns -> 1 row,
    broadcast back as a literal-free cross join), then one narrow
    projection computing cells and the Morton key. Nothing shuffles
    except the 1-row bounds frame; the expensive step — actually
    clustering the data — is the caller's repartitionByRange on the key
    (cluster_by_zorder), costing exactly one range shuffle, the same
    price as any global sort."""
    if not cols or len(cols) * bits > 62:
        raise ValueError("need 1+ columns and len(cols)*bits <= 62")
    # range caveat: zorder_cell's numerator (x - mn) * 2^bits must fit
    # int64 — with bits <= 31 any int32-ranged column is safe; for
    # full-range int64 columns pre-scale to a coarser unit first
    bounds = df.agg(
        *[F.min(F.col(c).cast("bigint")).alias(f"__mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("bigint")).alias(f"__mx_{c}") for c in cols],
    )
    joined = df.crossJoin(F.broadcast(bounds))
    cells = [
        zorder_cell(F.col(c), F.col(f"__mn_{c}"), F.col(f"__mx_{c}"), bits)
        for c in cols
    ]
    out = joined.select(
        *[F.col(c) for c in df.columns],
        *[cell.alias(f"cell_{c}") for c, cell in zip(cols, cells)],
    )
    return out.withColumn(
        key_name, _interleave([F.col(f"cell_{c}") for c in cols], bits)
    )


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    n_partitions: int,
    bits: int = 8,
) -> DataFrame:
    """Physically cluster ``df`` for multi-column scan pruning: compute
    the Z-order key, range-partition on it (contiguous key ranges per
    output file), sort within partitions, drop the helper columns.
    Write the result with any parquet/Delta sink and every ``cols``
    predicate prunes row groups."""
    keyed = zorder_key(df, cols, bits)
    helper = [f"cell_{c}" for c in cols] + ["zkey"]
    return (
        keyed.repartitionByRange(n_partitions, F.col("zkey"))
        .sortWithinPartitions("zkey")
        .drop(*helper)
    )


def compaction_plan(
    files: DataFrame,
    size_col: str,
    key_cols: list[str],
    target_bytes: int,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Assign input files/partitions to ~``target_bytes`` output
    compaction groups — the small-files fix: a 100 TB table ingested in
    micro-batches accretes millions of KB-scale files whose per-file
    open/footer cost dominates scans; OPTIMIZE/compaction bin-packs them
    into target-sized outputs.

    Assignment is the deterministic cumulative-sum banding: order files
    by (size DESC, key) — a total order, so the plan replays identically
    on any engine — and give each file group
    ``floor(cumsum_before / target)``. Every group lands within one file
    of the target (files bigger than the target get their own group, as
    they should — they're already compact). Greedy first-fit would pack
    marginally tighter but is inherently sequential; the banding is one
    window over the FILE LIST (metadata-sized — at 100 TB the file list
    is millions of rows, not data), shuffle-free beyond its sort.

    ``partition_cols`` scopes the banding to the table's physical
    partitions (date=..., etc.): compaction groups must never span
    partitions of a partitioned table (rewriting a group would touch
    two partition dirs), and partitioning the window also removes the
    planner's one serial stage — an un-partitioned window is a
    single-task sort+cumsum over the whole file list, fine at thousands
    of rows but the lone non-parallel step at millions. With the
    default (unpartitioned) the output is bit-identical to the previous
    global form; with partitions, ``group_id`` restarts per partition,
    so the compaction key is (*partition_cols, group_id).

    Returns partition cols + input key cols + (group_id,
    group_bytes_before) — feed the compaction key to a
    repartition/OPTIMIZE job as the output-file key."""
    pcols = list(partition_cols or [])
    w = (
        Window.partitionBy(*[F.col(c) for c in pcols])
        .orderBy(F.col(size_col).desc(), *[F.col(c) for c in key_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    return files.select(
        *pcols,
        *key_cols,
        F.col(size_col),
        F.floor(before / F.lit(target_bytes)).cast("long").alias("group_id"),
        before.cast("long").alias("group_bytes_before"),
    )
