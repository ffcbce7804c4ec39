"""Local replica of the driver's DuckDB-oracle comparison: for each catalog
entry, run the Spark plan and the oracle SQL on the same parquet tables and
compare row count, column names, and order-insensitive values.

DRIVER-FAITHFUL CANON (hard-won in round 5): the driver canonicalizes BOTH
sides through pandas before hashing, which is dtype-sensitive in two ways a
naive Python-value compare is not:

1. DuckDB ``sum()`` over integers returns HUGEINT, which pandas widens to
   **float64**, while the Spark twin's ``LongType`` lands as **int64** —
   identical values, different hash (4 of the 5 r5 driver reds). So this
   replica compares the NUMERIC KIND (int vs float) strictly; oracle SQL
   must ``CAST(sum(...) AS BIGINT)`` integer sums.
2. A list/array-typed output column is **unsortable** in the driver's
   pandas row sort (``TypeError: unhashable type: 'list'`` — the 5th r5
   red). So this replica rejects any entry whose output contains
   list/ndarray/dict cells, on EITHER side.

Integer width (int32 vs int64) is normalized — both str/hash identically
once scalarized — but int-vs-float is a mismatch.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math
import os

import duckdb
import numpy as np
import pandas as pd

from sparkstreaming_realtime_project_spark.schemas import TESTDATA_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


_UNSORTABLE = (list, tuple, dict, set, np.ndarray)


def _canon_cell(v):
    """Canonical (kind, value) tag for one pandas cell.

    Kind distinguishes int from float (driver hash does, via pandas
    dtypes) but not integer width; floats collapse representation noise
    at 9 decimals — every catalog entry rounds outputs to <=6."""
    if v is None or v is pd.NaT:
        # NaT must be checked BEFORE the datetime branch: NaTType
        # subclasses datetime.datetime, so the isinstance check below
        # would canonicalize it as ('t', 'NaT') instead of unifying it
        # with None/NaN like every other null representation.
        return ("null",)
    if isinstance(v, _UNSORTABLE):
        raise TypeError(f"unsortable cell type {type(v).__name__}")
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return ("null",)
        return ("f", round(f, 9))
    if isinstance(v, decimal.Decimal):
        # Spark DecimalType reaches pandas as object-of-Decimal while
        # DuckDB DECIMAL lands as float64 — the driver hashes those
        # differently, so a distinct kind here makes the divergence
        # visible locally (entries must cast decimals out to double).
        return ("dec", str(v))
    if isinstance(v, pd.Timestamp):
        return ("t", v.isoformat())
    if isinstance(v, _dt.datetime):
        return ("t", pd.Timestamp(v).isoformat())
    if isinstance(v, _dt.date):
        return ("d", v.isoformat())
    if isinstance(v, (bytes, bytearray)):
        return ("y", bytes(v))
    return ("s", str(v))


def _canon_frame(df: pd.DataFrame):
    """Sorted column names + sorted canonical row tuples (or raise
    TypeError on list-typed cells, like the driver's row sort does)."""
    cols = sorted(df.columns)
    df = df.reindex(cols, axis=1)
    rows = [
        tuple(_canon_cell(v) for v in rec)
        for rec in df.itertuples(index=False, name=None)
    ]
    rows.sort()
    return cols, rows


def spark_to_pandas(spark_df) -> pd.DataFrame:
    """Spark -> pandas the way the driver does (dtype-faithful: LongType
    -> int64, DoubleType -> float64, arrays -> object-of-list)."""
    return spark_df.toPandas()


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    s_pdf = spark_to_pandas(spark_df)
    d_pdf = con.sql(sql).df()
    try:
        sc, sr = _canon_frame(s_pdf)
    except TypeError as e:
        return False, f"spark side not driver-canonicalizable: {e}"
    try:
        dc, dr = _canon_frame(d_pdf)
    except TypeError as e:
        return False, f"oracle side not driver-canonicalizable: {e}"
    if sc != dc:
        return False, f"columns differ: spark={sc} duckdb={dc}"
    if len(sr) != len(dr):
        return False, f"row count differs: spark={len(sr)} duckdb={len(dr)}"
    for i, (a, b) in enumerate(zip(sr, dr)):
        if a != b:
            return False, f"first diff at sorted row {i}: spark={a!r} duckdb={b!r}"
    return True, "ok"
