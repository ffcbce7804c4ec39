"""Survival analysis: the Kaplan-Meier product-limit estimator over
right-censored durations — distributed, with no single-task global
window and no order-dependent float summation.

The retention/churn question ("what fraction of customers have NOT
reordered within t days, accounting for customers we simply haven't
observed long enough") is a survival question, and the KM estimator is
its standard nonparametric answer. The reference engine has nothing in
this family; it extends the repo's analytics north-star set
(stickiness, churn risk, cohort LTV).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .distributed import prefix_sums

__all__ = ["kaplan_meier"]


def kaplan_meier(
    durations: DataFrame,
    duration_col: str = "dur",
    event_col: str = "event",
    out_round: int = 6,
) -> DataFrame:
    """Kaplan-Meier survival curve from (duration, event) rows, where
    ``event`` is 1 for an observed event and 0 for right-censored:

        S(t) = prod over event times t_j <= t of (1 - d_j / n_j)

    with d_j = events at t_j and n_j = subjects at risk (duration >=
    t_j). Returns one row per EVENT time: (t, n_risk, d_events,
    survival), ordered semantics only (no materialized sort).

    Execution shape (the 100 TB argument): one groupBy(duration)
    collapses the data to at most |distinct durations| rows; both
    running quantities (the at-risk countdown and the log-survival
    accumulation) ride the two-pass range-partitioned ``prefix_sums``
    primitive — never a single-task global window, even though the
    aggregated frame is usually small (durations can be continuous).

    Determinism (the product trap and its fix): S(t) is a cumulative
    PRODUCT of libm-free rationals — but computing it as exp(sum(ln))
    naively is doubly nondeterministic (libm ln drift + float sum
    order). Each factor's ln is pinned to a scaled BIGINT
    (floor(ln*1e9 + 0.5), exact for negatives too), the running sum is
    an exact integer prefix sum, and one final exp per row sees the
    identical integer on both engines. A time where the factor hits 0
    (everyone at risk dies: d_j = n_j) would send ln to -inf; those and
    all later times report survival = 0 exactly, via an integer
    zero-flag that rides the same prefix sum.
    """
    g = durations.groupBy(F.col(duration_col).alias("t")).agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.col(event_col)).alias("d"),
    )
    # pass 1: at-risk countdown — n_risk(t) = N - (cum count of shorter
    # durations). N via the house 1-row scalar broadcast.
    n_tot = g.groupBy().agg(F.sum("c").alias("n_tot"))
    cum = prefix_sums(g, ["t"], ["c"]).crossJoin(F.broadcast(n_tot))
    cum = cum.withColumn(
        "n_risk", F.col("n_tot") - (F.col("c_cum") - F.col("c"))
    )
    # pass 2: log-survival accumulation over the same order
    frac = F.col("d").cast("double") / F.col("n_risk").cast("double")
    lnsc = F.when(
        F.col("d") == 0, F.lit(0)
    ).when(
        F.col("d") < F.col("n_risk"),
        F.floor(F.log(F.lit(1.0) - frac) * F.lit(1e9) + F.lit(0.5)),
    ).otherwise(F.lit(0)).cast("long")
    zf = F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0).cast("long")
    staged = cum.select("t", "c", "d", "n_risk", lnsc.alias("lnsc"),
                        zf.alias("zf"))
    acc = prefix_sums(staged, ["t"], ["lnsc", "zf"])
    surv = F.when(F.col("zf_cum") > 0, F.lit(0.0)).otherwise(
        F.exp(F.col("lnsc_cum").cast("double") / F.lit(1e9))
    )
    return acc.filter(F.col("d") > 0).select(
        F.col("t"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("d_events"),
        F.round(surv, out_round).alias("survival"),
    )
