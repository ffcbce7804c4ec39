"""Text analysis operators (north-star extension): language-ID heuristic,
quality scoring, token counting, document fingerprinting.

Everything is built-in-expression only (no UDF): token arrays via split,
per-doc statistics via ``aggregate``/``size`` over the array — narrow
plans that run at scan speed on any corpus size. Each has an exact SQL
twin for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import tokens_expr, word_shingles

# Marker stopwords per language for the n-gram-free heuristic. Priority
# order breaks ties deterministically (en > de > fr > es > zh).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "of", "and", "a", "to", "in"),
    "de": ("der", "die", "das", "und", "nicht"),
    "fr": ("le", "les", "et", "des", "une"),
    "es": ("el", "los", "y", "una", "que"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in")

# BPE-ish pre-tokenization: letter runs, digit runs, single other glyphs.
BPE_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def _count_in(tokens: Column, words: tuple[str, ...]) -> Column:
    wordset = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(wordset, t)))


def token_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Token counting + quality scoring in one narrow pass.

    quality = min(1, n_tokens/100) * (1 - stopword_ratio): length-normed
    and penalizing stopword-heavy boilerplate — a deliberately simple,
    deterministic stand-in for a trained quality model.
    """
    t = tokens_expr(text_col)
    n_tok = F.size(t)
    sum_len = F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
    n_stop = _count_in(t, STOPWORDS)
    stop_ratio = n_stop * F.lit(1.0) / n_tok
    quality = F.least(F.lit(1.0), n_tok / F.lit(100.0)) * (F.lit(1.0) - stop_ratio)
    n_bpe = F.size(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_PATTERN), 0))
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        F.round(sum_len * F.lit(1.0) / n_tok, 4).alias("avg_token_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(quality, 4).alias("quality_score"),
    )


def lang_guess(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Marker-stopword language ID (n-gram heuristic family). Scores each
    language's marker hits over the token list; argmax with fixed
    priority. Pure expressions -> same cost as a projection."""
    t = tokens_expr(text_col)
    scores = {lang: _count_in(t, words) for lang, words in LANG_MARKERS.items()}
    s_en, s_de, s_fr, s_es = scores["en"], scores["de"], scores["fr"], scores["es"]
    guess = (
        F.when((s_en >= s_de) & (s_en >= s_fr) & (s_en >= s_es) & (s_en > 0), "en")
        .when((s_de >= s_fr) & (s_de >= s_es) & (s_de > 0), "de")
        .when((s_fr >= s_es) & (s_fr > 0), "fr")
        .when(s_es > 0, "es")
        .otherwise("unk")
    )
    return df.select(
        F.col(id_col),
        s_en.alias("score_en"),
        s_de.alias("score_de"),
        s_fr.alias("score_fr"),
        s_es.alias("score_es"),
        guess.alias("lang_guess"),
    )


def fingerprint(df: DataFrame, text_col: str, id_col: str, n: int = 4) -> DataFrame:
    """Document fingerprint: content hash (exact identity) + min-shingle
    hash (rolling-hash family, stable under small appends). The
    min-over-window of hashed n-grams is winnowing with window = whole
    doc — one selected hash per document."""
    sh = word_shingles(text_col, n)
    min_sh = F.array_min(F.transform(sh, lambda s: F.md5(s)))
    return df.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("content_hash"),
        min_sh.alias("shingle_fp"),
    )
