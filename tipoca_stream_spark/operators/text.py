"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All pure Catalyst column expressions over the ``documents`` table — per-row
map work, embarrassingly parallel at any scale. Deterministic by
construction so the DuckDB oracle reproduces every value exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A small function-word inventory per language for the n-gram/stopword
# language-ID heuristic. Real corpora would use character n-gram profiles;
# the classifier shape (score per language → argmax) is the same.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "la", "los", "y", "es"],
}

STOPWORDS = ["the", "a", "of", "and", "is", "in", "to"]

# BPE-ish tokenization: runs of letters, runs of digits, or single
# non-alphanumeric glyphs — the shape GPT-style pre-tokenizers use.
BPE_TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def _words(text: Column) -> Column:
    return F.split(text, " ")


def token_counts(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count."""
    text = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.size(_words(text)).cast("long").alias("n_ws_tokens"),
        # idx=0 → whole match (Spark defaults to capture group 1)
        F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_TOKEN_RE), F.lit(0))).cast("long").alias("n_bpe_tokens"),
    )


def _count_in(words: Column, vocab: list[str]) -> Column:
    return F.size(F.filter(words, lambda w: w.isin(vocab))).cast("long")


def quality_scores(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Length / distinctness / stopword-ratio quality features. All ratios
    are single double divisions of exact ints → deterministic."""
    words = _words(F.col(text_col))
    n = F.size(words).cast("long")
    n_distinct = F.size(F.array_distinct(words)).cast("long")
    n_stop = _count_in(words, STOPWORDS)
    total_chars = F.length(F.col(text_col)).cast("long")
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        (n_distinct.cast("double") / n).alias("distinct_ratio"),
        (n_stop.cast("double") / n).alias("stopword_ratio"),
        ((total_chars - (n - 1)).cast("double") / n).alias("mean_token_len"),
    )


def langid(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Marker-word language ID: score per language, argmax with a
    deterministic tie-break (language order as listed, 'und' when all 0)."""
    words = _words(F.lower(F.col(text_col)))
    scores = {lang: _count_in(words, markers) for lang, markers in LANG_MARKERS.items()}
    best = F.lit("und")
    best_score = F.lit(0).cast("long")
    for lang, score in LANG_MARKERS.items():  # first-listed wins ties
        s = scores[lang]
        cond = s > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, s).otherwise(best_score)
    return df.select(
        F.col(id_col),
        *[scores[lang].alias(f"score_{lang}") for lang in LANG_MARKERS],
        best.alias("lang_guess"),
    )


def fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Key-collision fingerprint (OpenRefine-style): md5 of the sorted
    distinct word set — robust to word order and repetition."""
    words = _words(F.lower(F.col(text_col)))
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(words)))
    return df.select(F.col(id_col), F.md5(canon).alias("fingerprint"))


ROLLING_BASE = 31
ROLLING_MOD = 1_000_000_007


def rolling_hash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Polynomial (Rabin-Karp) rolling hash over the character stream:
    ``h = (h*31 + code(c)) mod 1e9+7`` — a deterministic content hash whose
    fold form also yields substring hashes for chunk-level dedup. Pure
    ``aggregate`` fold, JVM-side; intermediate values stay < 2^35 so ANSI
    overflow checking never trips."""
    chars = F.filter(F.split(F.col(text_col), ""), lambda c: c != "")
    h = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: F.pmod(acc * ROLLING_BASE + F.ascii(c), F.lit(ROLLING_MOD)),
    )
    return df.select(F.col(id_col), h.alias("rolling_hash"))
