"""Record linkage: blocked pair generation + Fellegi-Sunter-style
agreement scoring.

Deduplication (operators/dedup.py) asks "are these two TEXTS the same
content?"; record linkage asks "are these two STRUCTURED records the
same entity?" — the match decision is a sum of per-field agreement /
disagreement weights (Fellegi & Sunter, JASA 1969) over pairs drawn
from blocks, never from the cross product. The downstream is shared:
matched pairs feed the same connected-components clustering the text
dedup path uses (operators/dedup.py connected_components), turning
pairwise matches into entity ids.

Scale contract: pair generation is an EQUI-join on the block key —
the fanout is sum(block_size^2), governed entirely by the blocking
choice, and the plan must never contain a cartesian/theta join. For
skewed blocks the standard escalations apply unchanged: tighter
composite block keys, multi-pass blocking (union of two cheap keys
beats one loose key), or the sorted-neighborhood pass
(operators/dedup.py sorted_neighborhood_pairs) whose window bounds
pair fanout by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def linkage_pairs(
    df: DataFrame,
    id_col: str,
    block_cols: list[str],
    features: list[tuple[str, Column, int, int]],
    threshold: int,
) -> DataFrame:
    """Score within-block record pairs by summed agreement weights and
    keep matches: (id_a, id_b, score, <feature agreement flags...>).

    ``features``: (name, pairwise predicate over a_<col>/b_<col>
    columns, agree_weight, disagree_weight) — weights are INTEGERS
    (scaled log-likelihood ratios), so scores are exact on any engine;
    in the full Fellegi-Sunter treatment the weights are
    ln(m/u)-derived from labeled or EM-estimated match rates, which
    only changes the constants, not this plan. The predicate sees the
    pair frame's ``a_*``/``b_*`` columns.

    One equi-join on the block key with ``id a < id b`` riding along
    (each unordered pair once, never self-pairs), one projection for
    the score — two shuffles total (block join + nothing else; the
    threshold filter is pushed into the join's projection)."""
    sides = {}
    for side in ("a", "b"):
        sides[side] = df.select(
            *[F.col(c).alias(f"_bk_{side}_{c}") for c in block_cols],
            *[
                F.col(c).alias(f"{side}_{c}")
                for c in df.columns
                if c not in block_cols
            ],
            *[F.col(c).alias(f"{side}_{c}") for c in block_cols],
        )
    cond = F.col(f"a_{id_col}") < F.col(f"b_{id_col}")
    for c in block_cols:
        cond = cond & (F.col(f"_bk_a_{c}") == F.col(f"_bk_b_{c}"))
    pairs = sides["a"].join(sides["b"], cond)
    # Missing comparisons (predicate evaluates to NULL — e.g. equality on
    # a null field) follow the Fellegi-Sunter convention: weight 0, flag
    # NULL. The three-way when keeps the score and the emitted flag
    # consistent (1 <-> +w_agree, 0 <-> -w_disagree, NULL <-> 0).
    score = F.lit(0)
    flags = []
    for name, pred, w_agree, w_disagree in features:
        agree = pred.cast("int")
        score = score + (
            F.when(pred, F.lit(w_agree))
            .when(~pred, F.lit(-w_disagree))
            .otherwise(F.lit(0))
        )
        flags.append(agree.alias(f"agree_{name}"))
    return (
        pairs.select(
            F.col(f"a_{id_col}").alias("id_a"),
            F.col(f"b_{id_col}").alias("id_b"),
            score.cast("int").alias("score"),
            *flags,
        )
        .filter(F.col("score") >= threshold)
    )
