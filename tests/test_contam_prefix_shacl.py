"""Round-4g additions: prefix-filter exact set-similarity join
(no-false-negative guarantee vs brute force), GPT-3-style 13-gram
contamination, and the SHACL conformance report — the closed-form
edges the oracle sweep doesn't pin (candidate-volume reduction,
quote placement, constructed violations)."""

from __future__ import annotations

from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.operators import dedup as dd
from multiomics_biocypher_kg_spark.operators.materialize import shacl_report


def _items(spark, rows):
    """rows: (id, 'a b c ...') token sets -> distinct (id, tok)."""
    docs = spark.createDataFrame(rows, "id long, text string")
    return docs.select(
        "id", F.explode(F.split("text", " ")).alias("tok")
    ).distinct()


def test_prefix_filter_matches_bruteforce(spark):
    """Prefix filtering returns EXACTLY the brute-force result set —
    the no-false-negative theorem, checked value-for-value on sets
    engineered so some qualifying pairs share only mid-frequency
    elements."""
    rows = [
        (1, "a b c d e f g h i j"),
        (2, "a b c d e f g h i k"),   # J = 9/11 with 1
        (3, "a b c d e f g h i j"),   # exact dup of 1
        (4, "z y x w v u t s r q"),
        (5, "a b c z"),               # low-J overlap with 1
    ]
    items = _items(spark, rows)
    got = {
        (r["id_a"], r["id_b"]): r
        for r in dd.prefix_filter_pairs(items, 0.8).collect()
    }
    sh = items.select("id", F.col("tok").alias("shingle"))
    want = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dd.jaccard_pairs(sh, 0.8).collect()
    }
    assert set(got) == set(want) == {(1, 2), (1, 3), (2, 3)}
    for k, r in got.items():
        assert abs(r["jaccard"] - want[k]) < 1e-9
    assert got[(1, 3)]["jaccard"] == 1.0
    assert got[(1, 3)]["inter"] == 10 and got[(1, 3)]["sz_a"] == 10


def test_prefix_filter_prunes_candidates(spark):
    """The prefix join generates strictly fewer candidate pairs than
    the all-shared-element join when sets share only common
    elements below threshold."""
    # 'c' is shared by everyone (frequency 4 -> never in a prefix of
    # the high-sz sets); rare elements differ, so no pair qualifies
    rows = [
        (1, "c a1 a2 a3 a4 a5 a6 a7 a8 a9"),
        (2, "c b1 b2 b3 b4 b5 b6 b7 b8 b9"),
        (3, "c d1 d2 d3 d4 d5 d6 d7 d8 d9"),
        (4, "c e1 e2 e3 e4 e5 e6 e7 e8 e9"),
    ]
    items = _items(spark, rows)
    assert dd.prefix_filter_pairs(items, 0.8).count() == 0


def test_ngram_contamination_quote_detection(spark):
    """An eval doc quoting a verbatim 13-token train passage is
    contaminated; interval of grams matches the quote length; clean
    and too-short docs report zeros."""
    quote = " ".join(f"q{i}" for i in range(15))  # 15 tokens -> 3 grams
    train = spark.createDataFrame(
        [(100, f"intro words {quote} outro"), (101, "unrelated train text")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [
            (1, f"e0 e1 {quote} e2 e3"),     # quotes all 15 tokens
            (2, " ".join(f"u{i}" for i in range(20))),  # clean, 8 grams
            (3, "short doc"),                # < 13 tokens
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dd.ngram_contamination(train, ev).collect()}
    assert out[1]["is_contaminated"] and out[1]["n_contaminated"] == 3
    assert out[2]["n_grams"] == 8 and not out[2]["is_contaminated"]
    assert out[2]["contam_frac"] == 0.0
    assert out[3]["n_grams"] == 0 and out[3]["contam_frac"] == 0.0


def test_shacl_report_constructed_violations(spark):
    """Every shape trips on a constructed triple table with known
    violation counts; conforming shapes report zero."""
    triples = spark.createDataFrame(
        [
            ("https://a.example/1", "mentions", "kw:alpha"),
            ("https://a.example/1", "mentions", "kw:beta"),
            ("https://b.example/2", "mentions", "kw:alpha"),
            ("ftp://bad/3", "mentions", "kw:alpha"),       # domain violation
            ("https://c.example/4", "mentions", "NotACurie"),  # range violation
            ("kw:x", "same_as_canonical", "kw:x"),         # self-loop
            ("kw:y", "same_as_canonical", "kw:canon1"),
            ("kw:y", "same_as_canonical", "kw:canon2"),    # card > 1
        ],
        "subj string, pred string, obj string",
    )
    rep = {r["constraint_id"]: r for r in shacl_report(triples).collect()}
    assert len(rep) == 5
    assert rep["mentions_domain_url"]["n_checked"] == 5
    assert rep["mentions_domain_url"]["n_violations"] == 1
    assert rep["mentions_range_curie"]["n_violations"] == 1
    assert rep["sameas_irreflexive"]["n_checked"] == 3
    assert rep["sameas_irreflexive"]["n_violations"] == 1
    # nodes: kw:x (1 canonical), kw:y (2 canonicals -> violation)
    assert rep["sameas_max_card_1"]["n_checked"] == 2
    assert rep["sameas_max_card_1"]["n_violations"] == 1
    # objs: kw:alpha (3 subj, 2 distinct urls + ftp = 3 distinct), kw:beta (1),
    # NotACurie (1) -> 2 under-supported of 3
    assert rep["mentions_min_support_2"]["n_checked"] == 3
    assert rep["mentions_min_support_2"]["n_violations"] == 2
    assert rep["mentions_min_support_2"]["violation_frac"] == round(2 / 3, 6)


def test_shacl_report_empty_pred_groups(spark):
    """A triple table with no same_as rows still emits all 5 report
    rows with zero counts (agg-on-empty contract)."""
    triples = spark.createDataFrame(
        [("https://a.example/1", "mentions", "kw:alpha")],
        "subj string, pred string, obj string",
    )
    rep = {r["constraint_id"]: r for r in shacl_report(triples).collect()}
    assert len(rep) == 5
    assert rep["sameas_max_card_1"]["n_checked"] == 0
    assert rep["sameas_max_card_1"]["violation_frac"] == 0.0
