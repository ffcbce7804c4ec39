from .text import (
    highlight,
    text_match,
    tokenize,
)
from .dates import (
    derive_dt_hr,
    epoch_ms_to_ts,
    age_years,
)
from .hashing import (
    md5_hex,
    stable_min_shingle_hash,
)

__all__ = [
    "highlight",
    "text_match",
    "tokenize",
    "derive_dt_hr",
    "epoch_ms_to_ts",
    "age_years",
    "md5_hex",
    "stable_min_shingle_hash",
]
