"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.  All built-in column expressions (codegen'd);
designed to run as one projection pass over a 100 TB documents table."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword profiles for the n-gram/stopword heuristic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "nicht", "ist", "ich", "zu", "mit"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "pour"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "es", "por"],
}

_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def words(text: Column) -> Column:
    return F.filter(F.split(text, r"\s+"), lambda x: x != F.lit(""))


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(words(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish proxy: alpha runs + digit runs + punctuation singletons
    (regexp_extract_all — one pass, JVM-side)."""
    return F.size(F.regexp_extract_all(text, F.lit(_TOKEN_RE), 0))


def stopword_counts(text: Column) -> dict[str, Column]:
    ws = words(F.lower(text))
    return {lang: F.size(F.filter(ws, lambda x: x.isin(*sw)))
            for lang, sw in STOPWORDS.items()}


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-profile language ID: argmax language by stopword hits,
    'unknown' when nothing matches."""
    counts = stopword_counts(F.col(text_col))
    pairs = F.array(*[
        F.struct(c.alias("hits"), F.lit(lang).alias("lang"))
        for lang, c in counts.items()])
    best = F.array_max(pairs)
    return df.withColumn(
        "lang_guess",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("unknown")))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + a
    composite score (filter-threshold ready).

    The score conditions are evaluated in exact integer arithmetic
    (``5*n_punct <= n_chars`` instead of ``punct_ratio <= 0.2`` etc.), so
    ``quality_score_pct`` is an integer that is bit-identical across
    engines; the float ratio columns are convenience outputs only.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tok = token_count(t)
    n_punct = F.length(F.regexp_replace(t, r"[^!?.,;:]", ""))
    n_stop = stopword_counts(t)["en"]
    score_pct = (
        F.when((n_tok >= 10) & (n_tok <= 100_000), F.lit(40)).otherwise(0)
        # 3 <= mean word length <= 12  ⇔  3*n_tok <= n_chars <= 12*n_tok
        + F.when((n_chars >= 3 * n_tok) & (n_chars <= 12 * n_tok),
                 F.lit(20)).otherwise(0)
        # punct_ratio <= 0.2  ⇔  5*n_punct <= n_chars
        + F.when(5 * n_punct <= n_chars, F.lit(20)).otherwise(0)
        # stop_ratio >= 0.02  ⇔  50*n_stop >= n_tok
        + F.when(50 * n_stop >= n_tok, F.lit(20)).otherwise(0))
    return (df.withColumn("n_chars", n_chars)
            .withColumn("n_tokens", n_tok)
            .withColumn("n_punct", n_punct)
            .withColumn("n_stopwords", n_stop)
            .withColumn("punct_ratio",
                        n_punct / F.greatest(n_chars, F.lit(1)))
            .withColumn("stopword_ratio",
                        n_stop / F.greatest(n_tok, F.lit(1)))
            .withColumn("quality_score_pct", score_pct.cast("int")))


def rolling_fingerprint(df: DataFrame, text_col: str = "text",
                        window: int = 64, hash_fn=None) -> DataFrame:
    """Document fingerprint: xxhash64 (or ``hash_fn``) over the normalized
    head window — the cheap pre-cluster key for near-dup pipelines (a
    rolling-hash shingle generalization lives in pipeline.dedup.shingles)."""
    norm = F.regexp_replace(F.lower(F.substring(F.col(text_col), 1, window)),
                            r"[^a-z0-9]", "")
    return df.withColumn(
        "fingerprint", F.xxhash64(norm) if hash_fn is None else hash_fn(norm))
