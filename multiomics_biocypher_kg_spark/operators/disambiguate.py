"""Candidate entity-link scoring: context + popularity disambiguation
of AMBIGUOUS mentions.

The tier cascade (operators.link, differential-tested against the
reference's resolve_row, gene_id_utils.py:478-622) leaves two kinds
of unresolved mention: 'conflict' (two tier-1 anchors claim the same
surface — a gazetteer data-quality fault, quarantined exactly like
the reference does) and 'ambiguous' (a tier-2 surface legitimately
shared by several entities). This pass scores the ambiguous ones —
the "candidate entity-link scoring" stage of a web-scale KG build:

1. candidate generation — every tier-2 vocab entity whose surface
   matches the token exactly or after footnote normalization (the
   same two tier-2 probes the cascade ran when it flagged the
   mention ambiguous);
2. context score — sum over the document's RESOLVED entities of the
   corpus-wide co-mention document count with the candidate (second
   -order evidence: pick the sense that co-occurs with what this
   page is about);
3. popularity prior — the candidate's corpus-wide resolved mention
   count (the classic commonness baseline, used as the tie-break);
4. deterministic argmax per mention: (context DESC, prior DESC,
   entity_id ASC).

Design for 100 TB: ambiguous mentions are a small fraction of the
token stream, and candidates come from the same broadcast vocab the
cascade used — no new shuffle on the corpus side. The expensive
inputs are two reusable aggregates: the co-mention count table
(entity x entity, keyed by pair) and the mention-count prior (keyed
by entity). Scoring joins candidates x doc-resolved-entities by
doc_id, then the pair lookup by (lo, hi) — sort-merge joins on
aggregate tables, never a pass over raw pages. The final argmax is a
max_by over a struct, one shuffle keyed by mention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.operators.link import heuristic_normalize


def ambiguous_candidates(links: DataFrame, vocab: DataFrame) -> DataFrame:
    """Mentions flagged 'ambiguous' x their tier-2 candidate set.

    Matches the cascade's two tier-2 probes: exact surface and
    normalized-token surface. One row per (doc_id, pos, entity_id).
    """
    amb = links.where(F.col("resolution_method") == "ambiguous").select(
        "doc_id", "pos", "token", heuristic_normalize(F.col("token")).alias("norm_token")
    )
    t2 = (
        vocab.where((F.col("tier") == 2) & ~F.col("surface").contains(" "))
        .select(F.col("surface").alias("k"), "entity_id")
        .distinct()
    )
    exact = amb.join(F.broadcast(t2), F.col("token") == F.col("k"))
    norm = amb.join(F.broadcast(t2), F.col("norm_token") == F.col("k"))
    return (
        exact.unionByName(norm)
        .select("doc_id", "pos", "token", "entity_id")
        .distinct()
    )


def comention_doc_counts(pairs: DataFrame) -> DataFrame:
    """(doc_id, subj, obj) pair stream -> corpus co-mention document
    counts keyed (lo, hi) with lo < hi."""
    return pairs.groupBy(
        F.col("subj").alias("lo"), F.col("obj").alias("hi")
    ).agg(F.countDistinct("doc_id").alias("co_docs"))


def disambiguate(
    links: DataFrame, vocab: DataFrame, pairs: DataFrame
) -> DataFrame:
    """Resolve ambiguous mentions by (context, prior, id) argmax.

    links — cascade output; vocab — the gazetteer; pairs — per-doc
    co-mention pairs (operators.graphstats.comention_pairs).
    Returns one row per ambiguous mention: the winning entity with
    its scores and candidate-set size.
    """
    # links feeds three consumers (candidates, priors, doc contexts)
    # and its upstream is all-broadcast (no reusable exchange) —
    # materialize once; the stage-table of the curation DAG on a
    # real cluster.
    links = links.localCheckpoint(eager=False)
    cands = ambiguous_candidates(links, vocab)

    resolved = links.where(F.col("entity_id").isNotNull()).select(
        "doc_id", "entity_id"
    )
    prior = resolved.groupBy("entity_id").agg(
        F.count("*").alias("prior_score")
    )
    doc_ents = resolved.distinct().withColumnRenamed("entity_id", "ctx_entity")
    co = comention_doc_counts(pairs)

    # candidate x this doc's resolved entities -> pair-keyed co lookup
    ctx_pairs = cands.join(doc_ents, "doc_id").where(
        F.col("entity_id") != F.col("ctx_entity")
    )
    ctx_scored = (
        ctx_pairs.join(
            co,
            (F.least("entity_id", "ctx_entity") == co["lo"])
            & (F.greatest("entity_id", "ctx_entity") == co["hi"]),
            "left",
        )
        .groupBy("doc_id", "pos", "token", "entity_id")
        .agg(F.sum(F.coalesce("co_docs", F.lit(0))).alias("context_score"))
    )
    scored = (
        cands.join(ctx_scored, ["doc_id", "pos", "token", "entity_id"], "left")
        .join(prior, "entity_id", "left")
        .select(
            "doc_id",
            "pos",
            "token",
            "entity_id",
            F.coalesce("context_score", F.lit(0)).cast("long").alias("context_score"),
            F.coalesce("prior_score", F.lit(0)).cast("long").alias("prior_score"),
        )
    )
    # deterministic argmax: context DESC, prior DESC, entity_id ASC.
    # max_by over a struct orders lexicographically, so invert the id
    # rank: pick max (context, prior, neg_rank) where neg_rank orders
    # ids descending — instead use min_by on (-context, -prior, id).
    return (
        scored.groupBy("doc_id", "pos", "token")
        .agg(
            F.min_by(
                F.struct("entity_id", "context_score", "prior_score"),
                F.struct(
                    (-F.col("context_score")).alias("nc"),
                    (-F.col("prior_score")).alias("np"),
                    F.col("entity_id").alias("id"),
                ),
            ).alias("win"),
            F.count("*").alias("n_candidates"),
        )
        .select(
            "doc_id",
            "pos",
            "token",
            F.col("win.entity_id").alias("entity_id"),
            F.col("win.context_score").alias("context_score"),
            F.col("win.prior_score").alias("prior_score"),
            "n_candidates",
        )
    )
