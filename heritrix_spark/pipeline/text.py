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
    composite score in [0, 1] (filter-threshold ready)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tok = token_count(t)
    n_punct = F.length(F.regexp_replace(t, r"[^!?.,;:]", ""))
    n_stop = stopword_counts(t)["en"]
    mean_word = (n_chars / F.greatest(n_tok, F.lit(1)))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_tok, F.lit(1))
    score = (
        F.when((n_tok >= 10) & (n_tok <= 100_000), F.lit(0.4))
        .otherwise(F.lit(0.0))
        + F.when((mean_word >= 3) & (mean_word <= 12), F.lit(0.2))
        .otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.2, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(stop_ratio >= 0.02, F.lit(0.2)).otherwise(F.lit(0.0)))
    return (df.withColumn("n_chars", n_chars)
            .withColumn("n_tokens", n_tok)
            .withColumn("punct_ratio", punct_ratio)
            .withColumn("stopword_ratio", stop_ratio)
            .withColumn("quality_score", score))


def rolling_fingerprint(df: DataFrame, text_col: str = "text",
                        window: int = 64) -> DataFrame:
    """Document fingerprint: xxhash64 over the normalized head window —
    the cheap pre-cluster key for near-dup pipelines (a rolling-hash
    shingle generalization lives in pipeline.dedup.shingles)."""
    norm = F.regexp_replace(F.lower(F.substring(F.col(text_col), 1, window)),
                            r"[^a-z0-9]", "")
    return df.withColumn("fingerprint", F.xxhash64(norm))
