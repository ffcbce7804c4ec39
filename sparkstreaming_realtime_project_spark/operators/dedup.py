"""Deduplication operators (north-star extension, BASELINE.json; SURVEY §4.4).

Five strategies, all shuffle-bounded for 100 TB:

- exact          : hash-groupBy on a content fingerprint. One shuffle on
                   md5(text) — uniform keys, no skew.
- n-gram Jaccard : shingle explode + self-join on shingle. Exact but the
                   join fans out on frequent shingles; keep for
                   verification / small-to-medium corpora.
- MinHash + LSH  : k seeded min-hashes -> b bands -> join on band key.
                   The shuffle is on band buckets (bounded fan-out), and
                   only candidate pairs pay the exact-Jaccard verify.
                   This is the 100 TB path.
- SimHash        : 16-bit signature from per-token hash bits, computed
                   with a single ``aggregate`` over the token array —
                   completely narrow (no shuffle) until the bucket join.
- embedding cosine: see similarity.py; near-dup = pairs over a cosine
                   threshold.

All hashing is md5-hex (functions/hashing.py) so a DuckDB oracle can
replay the exact pipeline; swap ``xxhash64`` in production for ~3x hash
throughput (same topology).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def tokens_expr(text_col: str | Column) -> Column:
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != F.lit(""))


def word_shingles(text_col: str | Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles; a doc with < n tokens contributes its
    whole token string as the single shingle."""
    t = tokens_expr(text_col)
    full = F.array(F.concat_ws(" ", t))
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(t, i, n)),
        )
    )
    return F.when(F.size(t) >= n, grams).otherwise(full)


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: one row per distinct content, keeper = min id.

    GroupBy on the md5 fingerprint, not the raw text: shuffle keys are
    32-byte uniform hashes instead of document bodies (100 TB: shuffle
    volume ~ O(rows), not O(corpus bytes))."""
    return (
        df.select(F.md5(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def with_shingles(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, materialize: bool = False
) -> DataFrame:
    """Project (id, shingles). ``materialize=True`` truncates lineage with
    an eager localCheckpoint: the shingle array is consumed 3x downstream
    (signature, candidate sides a/b, verify) and re-tokenizing the corpus
    each time dominates runtime. At cluster scale use persist(DISK) or a
    staged table instead of localCheckpoint (which doesn't survive
    executor loss)."""
    out = df.select(
        F.col(id_col).alias("id"), word_shingles(text_col, n).alias("shingles")
    )
    if materialize:
        # corpus tables often arrive as one file -> one partition; spread
        # before the hash-heavy downstream or it runs on a single core.
        out = out.repartition(df.sparkSession.sparkContext.defaultParallelism)
        out = out.localCheckpoint(eager=True)
    return out


def jaccard_pairs(
    shingled: DataFrame, threshold: float = 0.8, candidates: DataFrame | None = None
) -> DataFrame:
    """Exact n-gram Jaccard over either all sharing-a-shingle pairs or a
    precomputed candidate set (from LSH). Returns (doc_a, doc_b, jaccard).
    """
    if candidates is None:
        ex = shingled.select("id", F.explode("shingles").alias("g"))
        a, b = ex.alias("a"), ex.alias("b")
        candidates = (
            a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
            .distinct()
        )
    sa = shingled.select(F.col("id").alias("doc_a"), F.col("shingles").alias("sha"))
    sb = shingled.select(F.col("id").alias("doc_b"), F.col("shingles").alias("shb"))
    inter = F.size(F.array_intersect("sha", "shb"))
    union = F.size("sha") + F.size("shb") - inter
    return (
        candidates.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.round(inter * F.lit(1.0) / union, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signature(shingled: DataFrame, k: int = 16) -> DataFrame:
    """k MinHash components h0..h{k-1}: min over shingles of md5('j:'||s).

    Computed with ``array_min(transform(...))`` per row — narrow, no
    explode, no shuffle. Hex-string min == numeric min of the 128-bit
    hash (fixed-width lowercase hex sorts identically)."""
    sig = shingled
    for j in range(k):
        sig = sig.withColumn(
            f"h{j}",
            F.array_min(
                F.transform("shingles", lambda s, j=j: F.md5(F.concat(F.lit(f"{j}:"), s)))
            ),
        )
    return sig


def lsh_candidate_pairs(
    signatures: DataFrame, k: int = 16, bands: int = 4
) -> DataFrame:
    """Band the signature and self-join on (band_idx, band_key).

    Shuffle is on band-key buckets: identical docs collide, unrelated docs
    spread uniformly (md5). At 100 TB add a bucket-size cap (drop buckets
    with > N members as degenerate) — not needed on the test corpus."""
    r = k // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat(*[F.col(f"h{b * r + i}") for i in range(r)])).alias("key"),
            )
            for b in range(bands)
        ]
    )
    banded = signatures.select(
        "id", F.explode(band_structs).alias("bk")
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b2 = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b2,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.8,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle -> signature -> band
    join -> exact-Jaccard verify on candidates only."""
    shingled = with_shingles(df, text_col, id_col, n, materialize=True)
    cands = lsh_candidate_pairs(minhash_signature(shingled, k), k, bands)
    return jaccard_pairs(shingled, threshold, candidates=cands)


def simhash_expr(text_col: str | Column, bits: int = 16) -> Column:
    """SimHash signature as a bitstring, one ``aggregate`` per bit over the
    token array (no explode/shuffle). Bit j uses the top bit of hex digit
    j of each token's md5: portable to any engine with md5+substr."""
    t = tokens_expr(text_col)

    def bit(j: int) -> Column:
        def step(acc: Column, tok: Column) -> Column:
            hexval = (
                F.position(F.substring(F.md5(tok), j + 1, 1), F.lit(_HEX)) - 1
            )
            return acc + F.when(hexval >= 8, 1).otherwise(-1)

        s = F.aggregate(t, F.lit(0), step)
        return F.when(s > 0, F.lit("1")).otherwise(F.lit("0"))

    return F.concat(*[bit(j) for j in range(bits)])


def simhash_near_pairs(
    df: DataFrame, text_col: str, id_col: str, bits: int = 16, max_hamming: int = 2
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance. Joins on signature
    halves (pigeonhole: hamming<=2 over 2 halves => one half equal), then
    verifies full hamming — the standard scale trick."""
    sig = df.select(
        F.col(id_col).alias("id"), simhash_expr(text_col, bits).alias("sig")
    )
    half = bits // 2
    halves = sig.select(
        "id",
        "sig",
        F.substring("sig", 1, half).alias("hl"),
        F.substring("sig", half + 1, half).alias("hr"),
    )
    a, b = halves.alias("a"), halves.alias("b")
    cand = a.join(
        b,
        ((F.col("a.hl") == F.col("b.hl")) | (F.col("a.hr") == F.col("b.hr")))
        & (F.col("a.id") < F.col("b.id")),
    )
    cand = cand.withColumn(
        "hamming",
        F.expr(
            "aggregate(sequence(1, {b}), 0, (acc, i) -> acc + "
            "IF(substring(a.sig, i, 1) = substring(b.sig, i, 1), 0, 1))".format(b=bits)
        ),
    )
    return (
        cand.filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            "hamming",
        )
        .distinct()
    )
