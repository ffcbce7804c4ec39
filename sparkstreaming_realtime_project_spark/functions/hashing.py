"""Engine-portable hashing for dedup/fingerprint operators.

Spark's ``hash``/``xxhash64`` and DuckDB's ``hash`` use different seeds and
algorithms, so cross-engine oracles can't use them. md5 hex is identical
everywhere, and hex strings compare lexicographically the same in both
engines — so ``min(md5(...))`` is a portable MinHash. Slightly slower than
xxhash64 but still JVM-side, codegen'd, and shuffle-free per row; at
cluster scale swap in xxhash64 when the oracle constraint goes away
(operators accept a ``hash_fn`` hook for that).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hex(col: Column) -> Column:
    return F.md5(col.cast("string"))


def seeded_md5(col: Column, seed: int) -> Column:
    """Deterministic family of hash functions h_seed(x) = md5(seed:x)."""
    return F.md5(F.concat(F.lit(f"{seed}:"), col.cast("string")))


def stable_min_shingle_hash(shingles: Column, seed: int) -> Column:
    """MinHash component: min over shingles of seeded md5 (as hex string).

    ``array_min`` on hex strings == numeric min of the 128-bit hash value
    because fixed-width lowercase hex sorts identically to the integer.
    """
    return F.array_min(F.transform(shingles, lambda s: seeded_md5(s, seed)))
