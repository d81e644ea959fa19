"""Round-4f additions: span-level exact-substring dedup interval
union, the hashed linear quality gate's exact-integer contract, and
the fertility aggregate — the closed-form edges the oracle sweep
doesn't pin (overlap merging, within-doc repetition, short docs,
int64 exactness)."""

from __future__ import annotations

from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.functions.hashing import md5_long
from multiomics_biocypher_kg_spark.functions import textstats as ts
from multiomics_biocypher_kg_spark.operators import dedup as dd


def _span_rows(spark, rows, **kw):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in dd.span_dedup(docs, **kw).collect()}


def test_span_dedup_exact_copy_full_coverage(spark):
    """Two identical 10-token docs: every stride-1 window (3 of them
    at span 8) is shared, and the interval union covers all 10
    tokens — NOT 3 * 8 = 24."""
    out = _span_rows(
        spark,
        [(1, "a b c d e f g h i j"), (2, "a b c d e f g h i j"),
         (3, "z y x w v u t s r q")],
    )
    assert out[1]["n_dup_spans"] == 3
    assert out[1]["dup_tokens"] == 10 and out[1]["dup_frac"] == 1.0
    assert out[2]["dup_tokens"] == 10
    assert out[3]["n_dup_spans"] == 0 and out[3]["dup_frac"] == 0.0


def test_span_dedup_partial_quote_islands(spark):
    """A doc quoting an 8-token span from another, surrounded by
    unique text, covers exactly those 8 tokens; two disjoint quotes
    form two islands whose coverage adds."""
    quote = "q0 q1 q2 q3 q4 q5 q6 q7"
    quote2 = "p0 p1 p2 p3 p4 p5 p6 p7"
    out = _span_rows(
        spark,
        [
            (1, f"{quote} filler fill2 {quote2}"),
            (2, f"u0 u1 u2 {quote} u3 u4 u5"),
            (3, f"v0 v1 {quote2} v2 v3 v4 v5"),
        ],
    )
    # doc1 has both quotes duplicated: 8 + 8 tokens in two islands
    assert out[1]["dup_tokens"] == 16 and out[1]["n_dup_spans"] == 2
    assert out[2]["dup_tokens"] == 8
    assert out[3]["dup_tokens"] == 8


def test_span_dedup_within_doc_repetition_not_counted(spark):
    """countDistinct(doc) semantics: a doc repeating its own 8-gram
    twice scores zero — intra-doc loops belong to the repetition
    gates, not the cross-doc dedup pass."""
    rep = "r0 r1 r2 r3 r4 r5 r6 r7"
    out = _span_rows(spark, [(1, f"{rep} mid {rep}"), (2, "a b c")])
    assert out[1]["dup_tokens"] == 0
    # doc shorter than the span window reports zeros, still present
    assert out[2]["n_tokens"] == 3 and out[2]["dup_frac"] == 0.0


def test_span_dedup_overlapping_partial_copy_merges(spark):
    """Adjacent overlapping duplicated windows merge into one island:
    a shared 9-token run yields 2 windows but 9 covered tokens."""
    run = "s0 s1 s2 s3 s4 s5 s6 s7 s8"  # 9 tokens -> 2 windows of 8
    out = _span_rows(
        spark, [(1, f"{run} a1 a2"), (2, f"b1 b2 {run}")]
    )
    assert out[1]["n_dup_spans"] == 2 and out[1]["dup_tokens"] == 9
    assert out[2]["dup_tokens"] == 9


def test_quality_logit_exact_int_and_scan_only_plan(spark):
    """The logit is the exact int64 sum of per-token hashed weights;
    the plan is scan-only (no Exchange — the whole classifier lives
    in the projection)."""
    docs = spark.createDataFrame([(1, "alpha beta")], "doc_id long, text string")
    out = docs.select(ts.quality_logit_milli(F.col("text")).alias("l"))
    expect = docs.select(
        (
            (md5_long(F.lit("alpha")) % 2001 - 1000)
            + (md5_long(F.lit("beta")) % 2001 - 1000)
        ).alias("l")
    )
    assert out.collect() == expect.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_fertility_identity(spark):
    """fertility * n_words == n_bpe_tokens and bytes_per_token *
    n_bpe_tokens == n_bytes (exact, because the ratios divide the
    same int64 sums the row carries)."""
    from multiomics_biocypher_kg_spark.registry import QUERIES
    from tests.conftest import SF_TINY

    rows = QUERIES["text_tokenizer_fertility"](spark, SF_TINY).collect()
    assert rows
    for r in rows:
        assert abs(r["fertility"] * r["n_words"] - r["n_bpe_tokens"]) < 1e-6
        assert (
            abs(r["bytes_per_token"] * r["n_bpe_tokens"] - r["n_bytes"]) < 1e-6
        )
        assert r["n_bpe_tokens"] >= r["n_words"]  # subwords refine words
