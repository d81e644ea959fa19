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


def dsir_weights(
    docs: DataFrame, target_lang: str = "en", n_buckets: int = 256
) -> DataFrame:
    """DSIR importance-resampling weights (Xie et al. 2023,
    arXiv:2302.03169): score every document by the average
    log-likelihood ratio of its tokens under a TARGET distribution
    vs the RAW corpus distribution, with tokens reduced to
    ``n_buckets`` hashed unigram features (md5 % n_buckets — the
    cross-engine-deterministic stand-in for DSIR's hashed n-grams)
    and +1/(T+B) Laplace smoothing on both sides.

    Documents whose token mix looks like the target (here: the
    ``target_lang`` subcorpus) get weight > 0 and are upsampled by a
    downstream curation pass; off-target documents get < 0.

    Scale shape: the entire model state is TWO ``n_buckets``-row
    aggregate tables (map-side-combined counts) broadcast back onto
    the token stream, plus two 1-row totals — no per-token state, no
    shuffle larger than the bucket dictionary, so the corpus is
    scanned exactly twice regardless of size.

    -> (doc_id, lang, n_tokens, dsir_weight[round 6]).
    """
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.col("text"), " ")).alias("token"),
    ).withColumn("bucket", md5_long(F.col("token")) % n_buckets)
    raw = toks.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt_r"))
    tgt = (
        toks.where(F.col("lang") == target_lang)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt_t"))
    )
    totals = toks.agg(
        F.count(F.lit(1)).cast("double").alias("t_r"),
        F.sum((F.col("lang") == target_lang).cast("long"))
        .cast("double")
        .alias("t_t"),
    )
    table = (
        raw.join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("cnt_t"), F.lit(0)) + F.lit(1.0))
                    / (F.col("t_t") + F.lit(float(n_buckets)))
                )
                - F.log(
                    (F.col("cnt_r") + F.lit(1.0))
                    / (F.col("t_r") + F.lit(float(n_buckets)))
                )
            ).alias("lr"),
        )
    )
    return (
        toks.join(F.broadcast(table), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.round(F.avg("lr"), 6).alias("dsir_weight"),
        )
    )


def char_entropy_profile(
    docs: DataFrame, low_threshold: float = 4.0
) -> DataFrame:
    """Per-document character-level Shannon entropy (bits/char) — the
    classic cheap junk gate: keyboard mashing, repeated-character
    padding, and template boilerplate all sit well below natural
    text's ~4 bits/char, while base64/binary junk sits above ~5.

    Computed from the per-(doc, char) histogram: one explode + one
    map-side-combined count, then -sum(p*log2 p) per doc — no window,
    no Python. The explode is the same linear-in-corpus cost as
    tokenization; state per doc is its alphabet (<= a few hundred
    rows), so the agg partials stay tiny at any scale.

    -> (doc_id, n_chars, char_entropy[round 6], is_low_entropy).
    """
    freq = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), "")).alias("c")
        )
        .groupBy("doc_id", "c")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    n = freq.groupBy("doc_id").agg(F.sum("cnt").alias("n"))
    p = F.col("cnt") / F.col("n")
    return (
        freq.join(n, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("int").alias("n_chars"),
            F.round(
                -F.sum(p * F.log(p) / F.log(F.lit(2.0))), 6
            ).alias("char_entropy"),
        )
        .withColumn(
            "is_low_entropy", F.col("char_entropy") < low_threshold
        )
    )


def quality_logit_milli(text: Column) -> Column:
    """fastText-style hashed-feature linear quality classifier, the
    shape of the CCNet / GPT-3 "looks like reference text" filter:
    every whitespace token is hashed into a weight bucket and the
    document logit is the SUM of its token weights. With no
    pretrained weights shippable here, the weight table is the
    deterministic hash itself — w(tok) = md5_long(tok) % 2001 - 1000,
    an integer in [-1000, 1000] (milli-units, so the whole
    computation stays in exact int64 and is bit-identical across
    engines; the caller divides by n_tokens for the mean logit and
    thresholds for the keep decision). Swapping in real learned
    weights is a broadcast-join against a (bucket, weight) table —
    the hashing, the per-token map, and the aggregate are the
    production plan.

    Scale: evaluates entirely inside the scan projection via
    ``F.aggregate`` over the token array — zero shuffle, zero UDF,
    whole-stage codegen end to end. A 100 TB corpus scores in one
    map-only pass.
    """
    return F.aggregate(
        F.split(text, " "),
        F.lit(0).cast("long"),
        lambda acc, t: acc + (md5_long(t) % 2001 - 1000),
    )
