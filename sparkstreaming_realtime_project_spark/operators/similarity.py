"""Similarity search over embedding columns (north-star extension).

Two tiers:

- brute-force top-k: broadcast the (small) query set against all
  candidates; cosine evaluated as JVM higher-order functions over
  array<double> — no Python, no UDF. Cost O(|Q| x N): the baseline and
  the verifier for the bucketed path.
- sign-LSH / IVF-style bucketed top-k: partition vectors into buckets by
  the sign pattern of a few projections, probe only the query's bucket.
  At 100 TB the bucket column is a partition key: a query touches one
  bucket's files instead of the full corpus. Hyperplanes are pluggable;
  the default uses axis-aligned dims so an external SQL oracle can
  replay it exactly (random hyperplanes = pass explicit coefficient
  lists).

All arithmetic is double, accumulated left-to-right (aggregate with 0.0
init), which is bit-identical to DuckDB's list_reduce over DOUBLE[] —
that's what lets the oracle hash-match float outputs after round(4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns."""
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def as_double_vec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def knn_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query row.

    ``queries`` is expected small (it's broadcast); candidates stream
    through executors partition-local — the only shuffle is the final
    per-query top-k, bounded at |Q| x k rows by the window."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_vec(vec_col).alias("qv")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), as_double_vec(vec_col).alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 4).alias("sim"))
    )


def sign_bucket(vec: Column, dims: tuple[int, ...] = (1, 2, 3)) -> Column:
    """Sign-pattern bucket id: '101' = dims 1,3 non-negative, dim 2
    negative (1-based element_at). Axis-aligned hyperplane LSH."""
    bits = [
        F.when(F.element_at(vec, d) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for d in dims
    ]
    return F.concat(*bits)


def probe_buckets(bucket: Column, n_bits: int, radius: int = 1) -> Column:
    """Array of bucket ids to probe: the home bucket plus, for radius 1,
    every bucket one bit-flip away. The standard multi-probe LSH recall
    knob: a query near a hyperplane finds neighbors that fell on the
    other side, at the cost of probing n_bits extra buckets (still
    independent of corpus size N)."""
    if radius not in (0, 1):
        raise ValueError("probe radius 0 or 1 supported")
    out = [bucket]
    if radius == 1:
        for i in range(1, n_bits + 1):
            c = F.substring(bucket, i, 1)
            flipped = F.when(c == "1", F.lit("0")).otherwise(F.lit("1"))
            out.append(
                F.concat(
                    F.substring(bucket, 1, i - 1),
                    flipped,
                    F.substring(bucket, i + 1, n_bits - i),
                )
            )
    return F.array(*out)


def knn_bucketed(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: tuple[int, ...] = (1, 2, 3),
    probe_radius: int = 0,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign-LSH
    bucket(s). Join key = bucket, so the pair fan-out is ~N/2^bits per
    probed bucket instead of N. ``probe_radius=1`` multi-probes all
    one-bit-flip buckets (the recall knob: each candidate lives in
    exactly one bucket, so probing more buckets only adds candidates,
    never duplicates)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double_vec(vec_col).alias("qv"),
    ).withColumn("bucket", sign_bucket(F.col("qv"), dims))
    if probe_radius:
        q = q.withColumn(
            "bucket",
            F.explode(probe_buckets(F.col("bucket"), len(dims), probe_radius)),
        )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        as_double_vec(vec_col).alias("cv"),
    ).withColumn("bucket", sign_bucket(F.col("cv"), dims))
    scored = (
        c.join(F.broadcast(q), ["bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "bucket", "neighbor_id", "rank", F.round("sim", 4).alias("sim")
        )
    )


def ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_decimals: int | None = 6,
) -> list[list[float]]:
    """Deterministic k-means-lite centroids for IVF partitioning.

    Seeding is the first n_centroids vectors by id (reproducible — no
    RNG); each Lloyd iteration assigns every vector to its nearest
    centroid (centroids enter the plan as LITERALS, so assignment is a
    pure projection — no join, no shuffle of the vectors) and recomputes
    per-centroid dimension-wise means via posexplode -> groupBy(cid, pos)
    — ONE aggregate regardless of dimensionality. (A per-dimension
    ``avg(element_at(v, i))`` expression list works at d=8 but is
    thousands of aggregate expressions at real embedding dims — codegen/
    plan-size blowup; the exploded aggregate's plan is O(1) in d.) Only
    the k x d centroid matrix ever reaches the driver: that is the MODEL,
    not the data — the per-iteration data pass stays fully distributed.

    ``round_decimals`` quantizes each new centroid (default 1e-6): means
    are float sums whose addend ORDER depends on partitioning, so
    unquantized centroids can differ in final ulps between runs/engines
    and flip boundary assignments — quantized, the model is reproducible
    bit-for-bit anywhere (what lets a SQL oracle replay the training)."""
    e = embeddings.select(as_double_vec(vec_col).alias("v"), F.col(id_col).alias("id"))
    dim = len(e.select("v").first()["v"])
    cents = [
        list(r["v"]) for r in e.orderBy("id").limit(n_centroids).collect()
    ]
    for _ in range(iters):
        assigned = e.withColumn("cid", _nearest_centroid(F.col("v"), cents))
        means = (
            assigned.select("cid", F.posexplode("v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in means:
            by_cid.setdefault(r["cid"], {})[r["pos"]] = (
                round(r["m"], round_decimals) if round_decimals is not None else r["m"]
            )
        # empty centroids keep their previous position (standard Lloyd)
        cents = [
            [by_cid[c][p] for p in range(dim)] if c in by_cid else cents[c]
            for c in range(n_centroids)
        ]
    return cents


def _nearest_centroid(vec: Column, centroids: list[list[float]]) -> Column:
    """Index of the max-cosine centroid, as a literal-folded expression:
    k similarity evaluations per row inside codegen, no join."""
    best_idx, best_sim = F.lit(0), cosine(vec, F.array(*[F.lit(x) for x in centroids[0]]))
    for i, c in enumerate(centroids[1:], start=1):
        sim = cosine(vec, F.array(*[F.lit(x) for x in c]))
        better = sim > best_sim
        best_idx = F.when(better, F.lit(i)).otherwise(best_idx)
        best_sim = F.when(better, sim).otherwise(best_sim)
    return best_idx


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 3,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: vectors are pre-assigned to their nearest
    centroid's inverted list (``cid`` — at rest this is the partition
    key, so a probe reads n_probe lists instead of the corpus); each
    query probes its ``n_probe`` nearest centroids and ranks candidates
    by exact cosine. n_probe is the recall knob, mirroring multi-probe
    LSH."""
    n_cent = len(centroids)
    if not 1 <= n_probe <= n_cent:
        raise ValueError("n_probe must be in [1, n_centroids]")
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), as_double_vec(vec_col).alias("cv")
    ).withColumn("cid", _nearest_centroid(F.col("cv"), centroids))
    # rank ALL centroids per query, keep the top n_probe
    sims = F.array(
        *[
            F.struct(
                (-cosine(F.col("qv"), F.array(*[F.lit(x) for x in cent]))).alias("neg"),
                F.lit(i).alias("cid"),
            )
            for i, cent in enumerate(centroids)
        ]
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"), as_double_vec(vec_col).alias("qv")
        )
        .withColumn("probe", F.slice(F.array_sort(sims), 1, n_probe))
        .select("query_id", "qv", F.explode("probe.cid").alias("cid"))
    )
    scored = (
        c.join(F.broadcast(q), "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cid", "neighbor_id", "rank", F.round("sim", 4).alias("sim"))
    )


def cosine_near_pairs_bucketed(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: tuple[int, ...] = (1, 2, 3),
) -> DataFrame:
    """Embedding near-dup, sign-LSH bucketed — the 100 TB default.

    Candidate pairs come from a self-join on the sign-pattern bucket (an
    equi-join key, so the shuffle is on buckets and fan-out is bounded by
    bucket size, ~N/2^bits each for centered data), then the exact cosine
    threshold verifies candidates — LSH-then-verify, mirroring the
    MinHash dedup topology. The bit count (len(dims)) must SCALE with the
    corpus: bucket fan-out is (N/2^bits)^2 per bucket, so size
    len(dims) ~ log2(N) to hold bucket size roughly constant (3 bits fit
    the oracle corpus; a 100 TB corpus wants ~20+ hyperplanes). Recall
    loss: a pair straddling a hyperplane (opposite sign in any chosen
    dim) is missed; more/rotated hyperplanes or multi-probe are the
    recall knobs. Brute-force cosine_near_pairs is the
    verification/recall-measurement path, not the default."""
    e = embeddings.select(
        F.col(id_col).alias("id"), as_double_vec(vec_col).alias("v")
    ).withColumn("bucket", sign_bucket(F.col("v"), dims))
    a = e.select(
        F.col("id").alias("vec_a"), F.col("v").alias("va"), "bucket"
    )
    b = e.select(
        F.col("id").alias("vec_b"), F.col("v").alias("vb"), "bucket"
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("sim", F.round(cosine(F.col("va"), F.col("vb")), 4))
        .filter(F.col("sim") >= threshold)
        .select("vec_a", "vec_b", "sim")
    )


def cosine_near_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup: all pairs with cosine >= threshold.

    O(N^2) as written — the exact baseline, kept for verification and
    recall measurement of cosine_near_pairs_bucketed (the scale default)."""
    a = embeddings.select(
        F.col(id_col).alias("vec_a"), as_double_vec(vec_col).alias("va")
    )
    b = embeddings.select(
        F.col(id_col).alias("vec_b"), as_double_vec(vec_col).alias("vb")
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("sim", F.round(cosine(F.col("va"), F.col("vb")), 4))
        .filter(F.col("sim") >= threshold)
        .select("vec_a", "vec_b", "sim")
    )
