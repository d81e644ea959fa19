"""Query registry: every implemented operator as (Spark fn, DuckDB oracle).

This is the driver-facing coverage surface (SURVEY.md §2): each
entry pairs a Spark DataFrame program with an ANSI-SQL oracle that
DuckDB runs over the same parquet tables. Column names/types are
aligned on both sides; floating-point aggregates are rounded
identically so the order-insensitive value-hash matches.

Sections:
  KG pipeline     kg_*      (extract/mention/link/canonicalize/
                             materialize/enrich over the synthesized
                             page corpus — the north-rule pipeline)
  Ontology        onto_*    (closure / levels / subtree rollups)
  Relational      rel_*     (the reference's aggregate/window/join
                             operator inventory over TPC-H-ish data)
  Dedup & text    dedup_*, text_*
  Similarity      ann_*, knn_*
  Events          ev_*      (sessionize, as-of, range join, replicate agg)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.operators.canonicalize import connected_components
from multiomics_biocypher_kg_spark.operators.extract import extract
from multiomics_biocypher_kg_spark.operators.link import link, resolution_histogram
from multiomics_biocypher_kg_spark.operators.mention import mentions_tokens
from multiomics_biocypher_kg_spark.operators.materialize import (
    sameas_triples,
    triples_from_links,
    with_edge_id,
)
from multiomics_biocypher_kg_spark.operators.canonicalize import canonical_mapping
from multiomics_biocypher_kg_spark.operators.enrich import (
    entity_rollups,
    rank_percentile_bucket,
)
from multiomics_biocypher_kg_spark.plans.pipeline import sameas_from_documents
from multiomics_biocypher_kg_spark.sources.pages import pages_from_documents
from multiomics_biocypher_kg_spark.sources.vocab import vocab_df, vocab_values_sql

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# Shared oracle SQL fragments (one source of truth for the synthetic shapes)
# --------------------------------------------------------------------------

# url formula must match sources.pages.pages_from_documents
URL_SQL = (
    "('https://' || CASE WHEN doc_id % 10 < 3 THEN 'hot.example.com' "
    "ELSE 'h' || CAST(doc_id % 50 AS VARCHAR) || '.example.org' END "
    "|| '/doc/' || lpad(CAST(doc_id AS VARCHAR), 6, '0'))"
)

# tokenization with 0-based positions (mirrors posexplode(split(text,' ')))
TOKENS_SQL = f"""
  SELECT doc_id, {URL_SQL} AS url, lang,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
         unnest(string_split(text, ' ')) AS token
  FROM documents
"""

VOCAB_SQL = vocab_values_sql()

# the tiered resolution cascade (mirror of operators.link.link)
LINKS_SQL = f"""
WITH vocab AS (SELECT * FROM {VOCAB_SQL}),
toks AS ({TOKENS_SQL}),
t1 AS (SELECT surface AS k, min(entity_id) AS e, count(DISTINCT entity_id) AS n
       FROM vocab WHERE tier = 1 AND surface NOT LIKE '% %' GROUP BY surface),
t1ci AS (SELECT lower(surface) AS k, min(entity_id) AS e, count(DISTINCT entity_id) AS n
         FROM vocab WHERE tier = 1 AND surface NOT LIKE '% %' GROUP BY lower(surface)),
t2 AS (SELECT surface AS k, min(entity_id) AS e, count(DISTINCT entity_id) AS n
       FROM vocab WHERE tier = 2 AND surface NOT LIKE '% %' GROUP BY surface),
norm AS (SELECT *, regexp_replace(regexp_replace(token, '[*+]+$', ''), '\\.\\d+$', '') AS norm_token
         FROM toks),
detected AS (
  SELECT n.* FROM norm n
  WHERE lower(n.token) IN (SELECT lower(surface) FROM vocab WHERE surface NOT LIKE '% %')
     OR lower(n.norm_token) IN (SELECT lower(surface) FROM vocab WHERE surface NOT LIKE '% %')
),
joined AS (
  SELECT d.doc_id, d.url, d.lang, d.pos, d.token,
         a1.e AS e1, a1.n AS n1, a2.e AS e2, a2.n AS n2,
         a3.e AS e3, a3.n AS n3, a4.e AS e4, a4.n AS n4,
         a5.e AS e5, a5.n AS n5
  FROM detected d
  LEFT JOIN t1   a1 ON d.token = a1.k
  LEFT JOIN t1ci a2 ON lower(d.token) = a2.k
  LEFT JOIN t1   a3 ON d.norm_token = a3.k
  LEFT JOIN t2   a4 ON d.token = a4.k
  LEFT JOIN t2   a5 ON d.norm_token = a5.k
)
SELECT doc_id, url, lang, pos, token,
  CASE WHEN n1 = 1 THEN e1
       WHEN n1 > 1 THEN NULL
       WHEN n2 = 1 THEN e2
       WHEN n2 > 1 THEN NULL
       WHEN n3 = 1 THEN e3
       WHEN n3 > 1 THEN NULL
       WHEN n4 = 1 THEN e4
       WHEN n4 > 1 THEN NULL
       WHEN n5 = 1 THEN e5
       ELSE NULL END AS entity_id,
  CASE WHEN n1 = 1 THEN 'tier1_exact'
       WHEN n1 > 1 THEN 'conflict'
       WHEN n2 = 1 THEN 'case_insensitive'
       WHEN n2 > 1 THEN 'conflict'
       WHEN n3 = 1 THEN 'heuristic'
       WHEN n3 > 1 THEN 'conflict'
       WHEN n4 = 1 THEN 'tier2_singleton'
       WHEN n4 > 1 THEN 'ambiguous'
       WHEN n5 = 1 THEN 'heuristic'
       WHEN n5 > 1 THEN 'ambiguous'
       ELSE 'unmatched' END AS resolution_method
FROM joined
"""

# same-as evidence (mirror of plans.pipeline.sameas_from_documents)
SAMEAS_SQL = """
  SELECT format('ent:{:06d}', doc_id) AS id_a,
         format('ent:{:06d}', doc_id - doc_id % 5) AS id_b
  FROM documents WHERE doc_id % 5 <> 0
  UNION ALL
  SELECT format('ent:{:06d}', doc_id), format('ent:{:06d}', doc_id + 1)
  FROM documents WHERE doc_id % 10 = 4
"""

# connected components over the same-as graph (min-label, recursive CTE)
COMPONENTS_SQL = f"""
WITH RECURSIVE raw AS ({SAMEAS_SQL}),
und AS (
  SELECT id_a AS a, id_b AS b FROM raw
  UNION
  SELECT id_b, id_a FROM raw
),
reach(node, lbl) AS (
  SELECT a, a FROM und
  UNION
  SELECT u.a, r.lbl FROM und u JOIN reach r ON u.b = r.node
)
SELECT node, min(lbl) AS component FROM reach GROUP BY node
"""


def _pipeline(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    pages = pages_from_documents(spark, sf_dir)
    vocab = vocab_df(spark)
    docs = extract(pages)
    links = link(mentions_tokens(docs, vocab), vocab)
    return {"pages": pages, "docs": docs, "links": links}


# --------------------------------------------------------------------------
# KG pipeline queries
# --------------------------------------------------------------------------


@register(
    "kg_extract",
    oracle=f"SELECT doc_id, {URL_SQL} AS url, text FROM documents",
)
def kg_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage 1 end-to-end: synthesize html, extract, return text.

    The oracle is the original text column — this IS the
    byte-identical-per-url invariant as a correctness gate."""
    p = _pipeline(spark, sf_dir)
    return p["docs"].select("doc_id", "url", "text")


@register(
    "kg_mentions",
    oracle=f"""
    WITH toks AS ({TOKENS_SQL})
    SELECT doc_id, pos, token FROM toks
    WHERE lower(token) IN
      (SELECT lower(surface) FROM {VOCAB_SQL} WHERE surface NOT LIKE '% %')
    """,
)
def kg_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _pipeline(spark, sf_dir)
    m = mentions_tokens(p["docs"], vocab_df(spark))
    return m.select("doc_id", "pos", "token")


@register(
    "kg_links",
    oracle=f"SELECT doc_id, pos, token, entity_id, resolution_method FROM ({LINKS_SQL})",
)
def kg_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _pipeline(spark, sf_dir)
    return p["links"].select("doc_id", "pos", "token", "entity_id", "resolution_method")


@register(
    "kg_link_histogram",
    oracle=f"""
    SELECT resolution_method, count(*) AS n_mentions,
      CASE WHEN resolution_method IN
        ('tier1_exact','case_insensitive','heuristic','tier2_singleton')
      THEN 'true' ELSE 'false' END AS resolved
    FROM ({LINKS_SQL}) GROUP BY resolution_method
    """,
)
def kg_link_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _pipeline(spark, sf_dir)
    return resolution_histogram(p["links"])


@register("kg_components", oracle=COMPONENTS_SQL)
def kg_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    sameas = sameas_from_documents(spark, sf_dir)
    return connected_components(sameas, src="id_a", dst="id_b")


@register(
    "kg_triples",
    oracle=f"""
    WITH links AS ({LINKS_SQL}),
    mention_triples AS (
      SELECT DISTINCT url AS subj, 'mentions' AS pred, entity_id AS obj
      FROM links WHERE entity_id IS NOT NULL
    ),
    comp AS ({COMPONENTS_SQL}),
    same_triples AS (
      SELECT node AS subj, 'same_as_canonical' AS pred, component AS obj
      FROM comp WHERE node <> component
    ),
    allt AS (SELECT * FROM mention_triples UNION ALL SELECT * FROM same_triples)
    SELECT subj, pred, obj, subj || '|' || pred || '|' || obj AS edge_id FROM allt
    """,
)
def kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage 5: the materialized (subj, pred, obj) triple table."""
    p = _pipeline(spark, sf_dir)
    mention_triples = triples_from_links(p["links"], subj_col="url")
    mapping = canonical_mapping(sameas_from_documents(spark, sf_dir))
    return with_edge_id(mention_triples.unionByName(sameas_triples(mapping)))


@register(
    "kg_entity_rollup",
    oracle=f"""
    SELECT entity_id, count(*) AS mention_count,
           count(DISTINCT url) AS doc_count,
           string_agg(DISTINCT lang, '|' ORDER BY lang) AS langs
    FROM ({LINKS_SQL}) WHERE entity_id IS NOT NULL GROUP BY entity_id
    """,
)
def kg_entity_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _pipeline(spark, sf_dir)
    return entity_rollups(p["links"])


@register(
    "kg_entity_rank",
    oracle=f"""
    WITH rollup AS (
      SELECT entity_id, count(*) AS mention_count, count(DISTINCT url) AS doc_count
      FROM ({LINKS_SQL}) WHERE entity_id IS NOT NULL GROUP BY entity_id
    ),
    grouped AS (
      SELECT *, string_split(entity_id, ':')[1] AS vocab_group FROM rollup
    ),
    ranked AS (
      SELECT *,
        row_number() OVER (PARTITION BY vocab_group
                           ORDER BY mention_count DESC, entity_id ASC) AS rank_by_metric,
        count(*) OVER (PARTITION BY vocab_group) AS n
      FROM grouped
    )
    SELECT entity_id, vocab_group, mention_count, doc_count, rank_by_metric,
      CASE WHEN n = 1 THEN 100.0
           ELSE round(100.0 * (n - rank_by_metric) / (n - 1), 6) END AS metric_percentile,
      CASE WHEN (CASE WHEN n = 1 THEN 100.0 ELSE round(100.0 * (n - rank_by_metric) / (n - 1), 6) END) >= 90 THEN 'top_decile'
           WHEN (CASE WHEN n = 1 THEN 100.0 ELSE round(100.0 * (n - rank_by_metric) / (n - 1), 6) END) >= 75 THEN 'top_quartile'
           WHEN (CASE WHEN n = 1 THEN 100.0 ELSE round(100.0 * (n - rank_by_metric) / (n - 1), 6) END) >= 25 THEN 'mid'
           ELSE 'low' END AS metric_bucket
    FROM ranked
    """,
)
def kg_entity_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 semantics (rank / percentile / bucket) over entity rollups."""
    p = _pipeline(spark, sf_dir)
    rollups = entity_rollups(p["links"]).drop("langs")
    ranked = rank_percentile_bucket(
        rollups.withColumn("vocab_group", F.split("entity_id", ":")[0]),
        ["vocab_group"],
        "mention_count",
        "entity_id",
    )
    return ranked.select(
        "entity_id",
        "vocab_group",
        "mention_count",
        "doc_count",
        "rank_by_metric",
        "metric_percentile",
        "metric_bucket",
    )
