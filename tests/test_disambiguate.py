"""operators.disambiguate unit tests: context beats prior, prior
breaks context ties, id breaks full ties, normalized-token candidate
generation, and conflict quarantine."""

from __future__ import annotations

from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.operators.disambiguate import (
    ambiguous_candidates,
    disambiguate,
)
from multiomics_biocypher_kg_spark.operators.graphstats import comention_pairs
from multiomics_biocypher_kg_spark.sources.vocab import VOCAB_SCHEMA

LINK_SCHEMA = "doc_id long, pos int, token string, entity_id string, resolution_method string"


def _vocab(spark, rows):
    return spark.createDataFrame(rows, VOCAB_SCHEMA)


def _links(spark, rows):
    return spark.createDataFrame(rows, LINK_SCHEMA)


VOCAB = [
    ("amb", "keyword", 2, "ent:A", "kw"),
    ("amb", "keyword", 2, "ent:B", "kw"),
    ("alpha", "keyword", 1, "ent:ALPHA", "kw"),
    ("beta", "keyword", 1, "ent:B", "kw"),
]


def test_context_beats_prior(spark):
    """ent:B co-occurs with this doc's resolved entity (via doc 2);
    ent:A has the higher corpus prior but no context — B wins."""
    links = _links(
        spark,
        [
            # doc 1: the ambiguous mention + resolved ALPHA context
            (1, 0, "amb", None, "ambiguous"),
            (1, 1, "alpha", "ent:ALPHA", "tier1_exact"),
            # doc 2: B co-occurs with ALPHA  -> context evidence for B
            (2, 0, "beta", "ent:B", "tier1_exact"),
            (2, 1, "alpha", "ent:ALPHA", "tier1_exact"),
            # docs 3-5: A mentioned alone -> big prior, zero context
            (3, 0, "aaa", "ent:A", "tier1_exact"),
            (4, 0, "aaa", "ent:A", "tier1_exact"),
            (5, 0, "aaa", "ent:A", "tier1_exact"),
        ],
    )
    out = disambiguate(links, _vocab(spark, VOCAB), comention_pairs(links)).collect()
    assert len(out) == 1
    row = out[0]
    assert row["entity_id"] == "ent:B"
    assert row["context_score"] == 1 and row["n_candidates"] == 2
    assert row["prior_score"] == 1  # B's prior, not A's 3


def test_prior_breaks_context_tie(spark):
    links = _links(
        spark,
        [
            (1, 0, "amb", None, "ambiguous"),
            (2, 0, "aaa", "ent:A", "tier1_exact"),
            (2, 1, "aaa2", "ent:A", "tier1_exact"),
        ],
    )
    out = disambiguate(links, _vocab(spark, VOCAB), comention_pairs(links)).collect()
    assert out[0]["entity_id"] == "ent:A"
    assert out[0]["context_score"] == 0 and out[0]["prior_score"] == 2


def test_id_breaks_full_tie(spark):
    links = _links(spark, [(1, 0, "amb", None, "ambiguous")])
    out = disambiguate(links, _vocab(spark, VOCAB), comention_pairs(links)).collect()
    assert out[0]["entity_id"] == "ent:A"
    assert out[0]["context_score"] == 0 and out[0]["prior_score"] == 0


def test_candidates_match_normalized_token(spark):
    """Footnote-artifact token 'amb*' normalizes to 'amb' and still
    generates both tier-2 candidates."""
    links = _links(spark, [(1, 0, "amb*", None, "ambiguous")])
    cands = ambiguous_candidates(links, _vocab(spark, VOCAB))
    assert sorted(r["entity_id"] for r in cands.collect()) == ["ent:A", "ent:B"]


def test_conflict_rows_stay_quarantined(spark):
    links = _links(
        spark,
        [
            (1, 0, "the", None, "conflict"),
            (1, 1, "amb", None, "ambiguous"),
        ],
    )
    out = disambiguate(links, _vocab(spark, VOCAB), comention_pairs(links))
    assert [r["token"] for r in out.collect()] == ["amb"]


def test_plan_has_no_cartesian(spark):
    links = _links(spark, [(1, 0, "amb", None, "ambiguous")])
    df = disambiguate(links, _vocab(spark, VOCAB), comention_pairs(links))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
