"""Text analysis: token counting, quality scoring, language ID,
document fingerprinting — all native Column expressions (no Python
in the hot path), each with a DuckDB-renderable twin formula.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.functions.hashing import md5_long

# tiny stopword lists per language (deterministic heuristic language-ID;
# on real corpora these would be the top-N function words per language)
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to"],
    "de": ["der", "die", "und", "das", "ein"],
    "es": ["el", "la", "los", "de", "una"],
    "fr": ["le", "la", "les", "des", "une"],
    "zh": ["的", "是", "了", "在", "我"],
}
LANGS = sorted(STOPWORDS)

# whitespace tokens + a BPE-ish word/punct regex (same RE semantics in
# Spark's Java regex and DuckDB's RE2 for this simple class)
BPE_TOKEN_RE = "[a-z0-9]+|[^a-z0-9 ]"


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(text, " "))


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: alnum runs + individual punctuation."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = F.split(text, " ")
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS[lang])))
    return hits / F.size(toks)


def quality_score(text: Column) -> Column:
    """Reference-style composite quality heuristic: long-enough,
    reasonable mean word length, some stopwords. Bounded [0, 3]."""
    toks = F.split(text, " ")
    n = F.size(toks)
    mean_len = F.length(text) / n
    return (
        F.when(n >= 20, F.lit(1.0)).otherwise(n / F.lit(20.0))
        + F.when((mean_len >= 3) & (mean_len <= 10), F.lit(1.0)).otherwise(F.lit(0.0))
        + stopword_ratio(text) * 5
    )


def langid_scores(text: Column) -> list[Column]:
    """Per-language stopword-hit counts (n-gram heuristic stand-in)."""
    toks = F.split(text, " ")
    return [
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS[lang]))).alias(f"s_{lang}")
        for lang in LANGS
    ]


def langid_predict(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Predict language = argmax stopword hits (ties -> first lang
    alphabetically, i.e. deterministic)."""
    scored = df.select("*", *langid_scores(F.col(text_col)))
    best = F.greatest(*[F.col(f"s_{lang}") for lang in LANGS])
    pred = F.coalesce(
        *[
            F.when(F.col(f"s_{lang}") == best, F.lit(lang))
            for lang in LANGS
        ]
    )
    return scored.withColumn("pred_lang", pred).drop(
        *[f"s_{lang}" for lang in LANGS]
    )


def fingerprint(text: Column, n_keep: int = 8) -> Column:
    """Winnowing-style document fingerprint: the n_keep smallest
    shingle hashes, '|'-joined — stable under small edits."""
    toks = F.split(text, " ")
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - 3, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, 3), " "),
    )
    hashes = F.array_sort(
        F.array_distinct(F.transform(sh, lambda s: md5_long(s)))
    )
    return F.array_join(
        F.transform(F.slice(hashes, 1, n_keep), lambda h: h.cast("string")), "|"
    )
