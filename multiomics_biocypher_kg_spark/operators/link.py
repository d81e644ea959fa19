"""Stage 3 — link: tiered entity-resolution cascade.

Re-expresses the reference's resolve_row
(/root/reference/multiomics_kg/utils/gene_id_utils.py:478-622) —
tier-1 exact -> case-insensitive -> heuristic normalization ->
tier-2 singleton, first hit wins, conflicts quarantined — as a
single pass of four BROADCAST hash joins over the mention stream
plus one CASE expression. No shuffle of the big side, no Python.

Resolution methods (priority order, one per mention):
    tier1_exact | conflict | case_insensitive | heuristic |
    tier2_singleton | ambiguous | unmatched

A 'conflict' means the matched surface maps to >=2 tier-1 entities
(GeneIdGraph conflict semantics, gene_id_graph.py:139-151):
entity_id is NULL and the mention is quarantined, not dropped —
the histogram (A17) still counts it.

Scale: each lookup table is the grouped-distinct vocab (tiny, <<
broadcast threshold). The mention stream is never shuffled here —
the whole stage is map-side. At 10^12 docs this stage is bound by
scan + codegen only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

METHODS = [
    "tier1_exact",
    "conflict",
    "case_insensitive",
    "heuristic",
    "tier2_singleton",
    "ambiguous",
    "unmatched",
]


def heuristic_normalize(c):
    """Strip footnote artifacts + trailing version: 'PMM0001*' ->
    'PMM0001', 'AAV95689.1' -> 'AAV95689'
    (expand_list/_heuristic_candidates, gene_id_utils.py:327-357,459-475)."""
    return F.regexp_replace(F.regexp_replace(c, r"[*+]+$", ""), r"\.\d+$", "")


def expand_candidates(
    df: DataFrame, value_col: str = "raw_value", id_type_col: str = "id_type"
) -> DataFrame:
    """J4/J5 candidate generation feeding the link cascade: each raw
    cell expands to ordered typed candidates (resolve_row's
    _candidate_values, gene_id_utils.py:525-539 — defline columns use
    typed extraction, everything else expand_list + heuristics).

    -> input columns + (cand_rank starting at 1, token, token_id_type).
    Rows whose cell yields no candidates are dropped (reference:
    empty candidate list is a resolution no-op).

    Scale: pure per-row explode (no shuffle); downstream link() joins
    stay broadcast. Resolution keeps the FIRST resolving candidate
    per row via cand_rank ordering.
    """
    from multiomics_biocypher_kg_spark.functions.candidates import (
        candidate_tokens_col,
    )

    toks = candidate_tokens_col(F.col(value_col), F.col(id_type_col))
    keep = df.columns
    return df.select(
        *keep, F.posexplode(toks).alias("pos", "cand")
    ).select(
        *keep,
        (F.col("pos") + 1).alias("cand_rank"),
        F.col("cand.token").alias("token"),
        F.col("cand.id_type").alias("token_id_type"),
    )


def _lookup(vocab: DataFrame, tier: int, lowered: bool) -> DataFrame:
    """surface -> (entity of the single mapping, #distinct entities)."""
    key = F.lower("surface") if lowered else F.col("surface")
    return (
        vocab.where((F.col("tier") == tier) & ~F.col("surface").contains(" "))
        .groupBy(key.alias("k"))
        .agg(
            F.min("entity_id").alias("e"),
            F.countDistinct("entity_id").alias("n"),
        )
    )


def link(mentions: DataFrame, vocab: DataFrame) -> DataFrame:
    """mentions(..., token) -> links(..., entity_id, resolution_method)."""
    t1 = _lookup(vocab, 1, lowered=False)
    t1ci = _lookup(vocab, 1, lowered=True)
    t2 = _lookup(vocab, 2, lowered=False)

    m = mentions.withColumn("norm_token", heuristic_normalize(F.col("token")))
    j = (
        m.join(
            F.broadcast(t1.select(F.col("k").alias("x1"), F.col("e").alias("e1"), F.col("n").alias("n1"))),
            m.token == F.col("x1"),
            "left",
        )
        .join(
            F.broadcast(t1ci.select(F.col("k").alias("x2"), F.col("e").alias("e2"), F.col("n").alias("n2"))),
            F.lower(m.token) == F.col("x2"),
            "left",
        )
        .join(
            F.broadcast(t1.select(F.col("k").alias("x3"), F.col("e").alias("e3"), F.col("n").alias("n3"))),
            F.col("norm_token") == F.col("x3"),
            "left",
        )
        .join(
            F.broadcast(t2.select(F.col("k").alias("x4"), F.col("e").alias("e4"), F.col("n").alias("n4"))),
            m.token == F.col("x4"),
            "left",
        )
        .join(
            F.broadcast(t2.select(F.col("k").alias("x5"), F.col("e").alias("e5"), F.col("n").alias("n5"))),
            F.col("norm_token") == F.col("x5"),
            "left",
        )
    )
    method = (
        F.when(F.col("n1") == 1, F.lit("tier1_exact"))
        .when(F.col("n1") > 1, F.lit("conflict"))
        .when(F.col("n2") == 1, F.lit("case_insensitive"))
        .when(F.col("n2") > 1, F.lit("conflict"))
        .when(F.col("n3") == 1, F.lit("heuristic"))
        .when(F.col("n3") > 1, F.lit("conflict"))
        .when(F.col("n4") == 1, F.lit("tier2_singleton"))
        .when(F.col("n4") > 1, F.lit("ambiguous"))
        .when(F.col("n5") == 1, F.lit("heuristic"))
        .when(F.col("n5") > 1, F.lit("ambiguous"))
        .otherwise(F.lit("unmatched"))
    )
    entity = (
        F.when(F.col("n1") == 1, F.col("e1"))
        .when(F.col("n1") > 1, F.lit(None))
        .when(F.col("n2") == 1, F.col("e2"))
        .when(F.col("n2") > 1, F.lit(None))
        .when(F.col("n3") == 1, F.col("e3"))
        .when(F.col("n3") > 1, F.lit(None))
        .when(F.col("n4") == 1, F.col("e4"))
        .when(F.col("n4") > 1, F.lit(None))
        .when(F.col("n5") == 1, F.col("e5"))
        .otherwise(F.lit(None))
    )
    keep = [c for c in mentions.columns]
    return j.select(
        *keep,
        entity.alias("entity_id"),
        method.alias("resolution_method"),
    )


def resolution_histogram(links: DataFrame) -> DataFrame:
    """A17 diagnostics: per-method mention counts + resolved share
    (resolve_paper_ids.py:517-549,662-706)."""
    return (
        links.groupBy("resolution_method")
        .agg(F.count(F.lit(1)).alias("n_mentions"))
        .withColumn(
            "resolved",
            F.when(
                F.col("resolution_method").isin(
                    "tier1_exact", "case_insensitive", "heuristic", "tier2_singleton"
                ),
                F.lit("true"),
            ).otherwise(F.lit("false")),
        )
    )
