"""Dedup, text-analysis, similarity-search, and multimodal query
families (the training-data pipeline operators: SURVEY.md S2.12).

Split out of registry.py in round 4 — a pure move, oracles verbatim.
The dedup corpus/shingle SQL constants defined here are shared with
registry_web (containment / curation queries reuse the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.operators.canonicalize import connected_components
from multiomics_biocypher_kg_spark.oracle_fragments import (  # noqa: F401
    DEDUP_CORPUS_SQL,
    JACCARD_SQL,
    MINHASH_PAIRS_CTES,
    SHINGLES_SQL,
)
from multiomics_biocypher_kg_spark.registry import register
from multiomics_biocypher_kg_spark.sources.pages import pages_from_documents

# --------------------------------------------------------------------------
# Dedup & text-analysis section (training-data pipeline operators)
# over documents + deterministic synthetic near/exact duplicates.
# --------------------------------------------------------------------------

from multiomics_biocypher_kg_spark.functions.hashing import (  # noqa: E402
    MINHASH_COEFFS,
    R as MH_R,
    ROWS_PER_BAND,
    md5_long,
    md5_long_sql,
    minhash_coeffs_sql,
)
from multiomics_biocypher_kg_spark.operators import dedup as dd  # noqa: E402
from multiomics_biocypher_kg_spark.functions import textstats as ts  # noqa: E402




def _dedup_corpus(
    spark: SparkSession, sf_dir: str, rebalance: bool = True
) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    # rebalance the under-split seed scan before the shingle blowup
    # (same rationale as sources.pages.pages_from_documents: the
    # exchange moves the small seed table; shingling then uses every
    # core; a real many-file corpus skips this branch entirely).
    # Consumers whose FIRST operation is itself a shuffle (the
    # content-hash groupBy in exact dedup) pass rebalance=False: the
    # extra exchange there is pure cost — their own shuffle already
    # redistributes, and the map side is a cheap hash projection.
    par = spark.sparkContext.defaultParallelism
    if rebalance and docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par, "doc_id")
    toks = F.split(F.col("text"), " ")
    near = docs.where(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.array_join(F.filter(toks, lambda t, i: i % 10 != 9), " ").alias("text"),
    )
    exact = docs.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"), "text"
    )
    return docs.unionByName(near).unionByName(exact)


@register(
    "dedup_exact",
    oracle=f"""
    SELECT md5(text) AS text_md5, min(doc_id) AS canonical_id,
      count(*) AS n_dups,
      string_agg(CAST(doc_id AS VARCHAR), '|' ORDER BY CAST(doc_id AS VARCHAR)) AS member_ids
    FROM ({DEDUP_CORPUS_SQL}) GROUP BY md5(text) HAVING count(*) > 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: content-hash groupBy (one shuffle, map-side combine).

    rebalance=False: the groupBy's own hash exchange is the only
    shuffle this plan needs (r3 bench regression unwound)."""
    return dd.exact_duplicates(_dedup_corpus(spark, sf_dir, rebalance=False))


@register(
    "dedup_ngram_jaccard",
    oracle=f"SELECT id_a, id_b, jaccard FROM ({JACCARD_SQL}) WHERE jaccard >= 0.5",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram shingle Jaccard >= 0.5 via shared-shingle join (the
    exact verifier; LSH below is the discovery path at scale)."""
    corpus = _dedup_corpus(spark, sf_dir)
    return dd.jaccard_pairs(dd.shingles(corpus), 0.5)





@register(
    "dedup_minhash_lsh",
    oracle=f"WITH {MINHASH_PAIRS_CTES} SELECT id_a, id_b, jaccard FROM pairs",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash (16 hashes) + LSH (8 bands x 2 rows) candidate pairs,
    verified with exact Jaccard >= 0.5 — the scale path: linear
    signature cost, bucket-join discovery, exact verify on the
    (tiny) candidate set only."""
    return dd.minhash_neardup_pairs(_dedup_corpus(spark, sf_dir), 0.5)


@register(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {MINHASH_PAIRS_CTES},
    und AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(node, lbl) AS (
      SELECT a, a FROM und
      UNION
      SELECT u.a, r.lbl FROM und u JOIN reach r ON u.b = r.node
    ),
    comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node)
    SELECT node AS doc_id, component AS canonical_id,
      CAST(count(*) OVER (PARTITION BY component) AS BIGINT) AS cluster_size
    FROM comp
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full dedup deliverable: near-dup PAIRS (MinHash-LSH
    discovery + exact verify) chain into connected components so
    transitively-linked documents collapse to ONE canonical id (min
    doc id) with cluster sizes — what a curation job actually writes
    back. Composes the two scale paths end-to-end: banded candidate
    generation + pointer-jump CC."""
    from multiomics_biocypher_kg_spark.operators.canonicalize import (
        connected_components,
    )
    from pyspark.sql import Window

    pairs = dd.minhash_neardup_pairs(_dedup_corpus(spark, sf_dir), 0.5)
    comp = connected_components(pairs, src="id_a", dst="id_b")
    w = Window.partitionBy("component")
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("canonical_id"),
        F.count(F.lit(1)).over(w).alias("cluster_size"),
    )


@register(
    "dedup_simhash",
    oracle=f"""
    WITH corpus AS ({DEDUP_CORPUS_SQL}),
    toks AS (
      SELECT doc_id AS id, unnest(string_split(text, ' ')) AS token FROM corpus
    ),
    tok_w AS (
      SELECT id, token, count(*) AS w, {md5_long_sql('token')} AS h
      FROM toks GROUP BY id, token
    ),
    per_bit AS (
      SELECT id, b.bit AS bit,
        sum(CASE WHEN (h >> b.bit) & 1 = 1 THEN w ELSE -w END) AS s
      FROM tok_w CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS bit) b
      GROUP BY id, b.bit
    ),
    hashes AS (
      SELECT id, CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT)
        AS simhash
      FROM per_bit GROUP BY id
    )
    SELECT a.id AS id_a, b.id AS id_b,
      CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM hashes a JOIN hashes b ON a.id < b.id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-60 near-dup pairs (hamming <= 3) via 4x15-bit band
    bucketing (recall 1.0 by pigeonhole for hamming<=3, so the
    all-pairs DuckDB oracle matches exactly). The plan is equi-join
    only — no CartesianProduct (asserted in tests/test_plans.py)."""
    corpus = _dedup_corpus(spark, sf_dir)
    hashes = dd.simhash64(corpus)
    return dd.simhash_banded_pairs(hashes, 3).select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )


@register(
    "text_stats",
    oracle="""
    SELECT doc_id,
      CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
      CAST(len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]')) AS INTEGER) AS n_bpe_tokens,
      CAST(length(text) AS INTEGER) AS n_chars,
      round(CAST(len(list_filter(string_split(text, ' '),
            t -> t IN ('the','a','and','of','to'))) AS DOUBLE)
            / len(string_split(text, ' ')), 6) AS stopword_ratio,
      round(
        (CASE WHEN len(string_split(text,' ')) >= 20 THEN 1.0
              ELSE len(string_split(text,' ')) / 20.0 END)
        + (CASE WHEN length(text)::DOUBLE / len(string_split(text,' ')) BETWEEN 3 AND 10
                THEN 1.0 ELSE 0.0 END)
        + (CAST(len(list_filter(string_split(text, ' '),
             t -> t IN ('the','a','and','of','to'))) AS DOUBLE)
             / len(string_split(text, ' '))) * 5, 6) AS quality_score
    FROM documents
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish regex), stopword ratio,
    composite quality score — all native expressions."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = F.col("text")
    return docs.select(
        "doc_id",
        ts.token_count(t).alias("n_tokens"),
        ts.bpe_token_count(t).alias("n_bpe_tokens"),
        F.length(t).alias("n_chars"),
        F.round(ts.stopword_ratio(t), 6).alias("stopword_ratio"),
        F.round(ts.quality_score(t), 6).alias("quality_score"),
    )


@register(
    "text_langid",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
        len(list_filter(string_split(text,' '), t -> t IN ('der','die','und','das','ein'))) AS s_de,
        len(list_filter(string_split(text,' '), t -> t IN ('the','a','and','of','to'))) AS s_en,
        len(list_filter(string_split(text,' '), t -> t IN ('el','la','los','de','una'))) AS s_es,
        len(list_filter(string_split(text,' '), t -> t IN ('le','la','les','des','une'))) AS s_fr,
        len(list_filter(string_split(text,' '), t -> t IN ('的','是','了','在','我'))) AS s_zh
      FROM documents
    )
    SELECT doc_id, lang,
      CASE WHEN s_de = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'de'
           WHEN s_en = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'en'
           WHEN s_es = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'es'
           WHEN s_fr = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'fr'
           ELSE 'zh' END AS pred_lang
    FROM scored
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID (stopword-hit argmax, deterministic
    alphabetical tie-break). On this synthetic corpus every doc uses
    the same token universe, so the value is in the plumbing; unit
    tests exercise real multilingual discrimination."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    return ts.langid_predict(docs).select("doc_id", "lang", "pred_lang")


@register(
    "text_curation",
    oracle=f"""
    WITH corpus AS ({DEDUP_CORPUS_SQL}),
    stats AS (
      SELECT doc_id, text,
        CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        round(
          (CASE WHEN len(string_split(text,' ')) >= 20 THEN 1.0
                ELSE len(string_split(text,' ')) / 20.0 END)
          + (CASE WHEN length(text)::DOUBLE / len(string_split(text,' ')) BETWEEN 3 AND 10
                  THEN 1.0 ELSE 0.0 END)
          + (CAST(len(list_filter(string_split(text, ' '),
               t -> t IN ('the','a','and','of','to'))) AS DOUBLE)
               / len(string_split(text, ' '))) * 5, 6) AS quality_score
      FROM corpus
    ),
    kept AS (
      SELECT * FROM stats WHERE n_tokens >= 10 AND quality_score >= 1.5
    ),
    canon AS (
      SELECT md5(text) AS text_md5, min(doc_id) AS doc_id,
        CAST(count(*) AS BIGINT) AS n_copies
      FROM kept GROUP BY md5(text)
    )
    SELECT c.doc_id, s.n_tokens, s.quality_score, c.n_copies
    FROM canon c JOIN stats s ON c.doc_id = s.doc_id
    """,
)
def text_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data curation pass: quality gate
    (length + chars/token + stopword-density score) -> exact dedup
    keeping the lowest-id canonical doc with its duplicate count —
    one quality scan + one content-hash shuffle over the corpus,
    the minimal shape of a real corpus-curation job."""
    corpus = _dedup_corpus(spark, sf_dir)
    t = F.col("text")
    stats = corpus.select(
        "doc_id",
        "text",
        ts.token_count(t).alias("n_tokens"),
        F.round(ts.quality_score(t), 6).alias("quality_score"),
    )
    kept = stats.where((F.col("n_tokens") >= 10) & (F.col("quality_score") >= 1.5))
    canon = kept.groupBy(F.md5("text").alias("text_md5")).agg(
        F.min("doc_id").alias("doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    return canon.join(stats.drop("text"), "doc_id").select(
        "doc_id", "n_tokens", "quality_score", "n_copies"
    )


@register(
    "text_fingerprint",
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT doc_id,
        arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM documents) d,
           LATERAL (SELECT unnest(generate_series(1, len(d.arr) - 2)) AS i) t
    ),
    hashed AS (SELECT DISTINCT doc_id, {md5_long_sql('shingle')} AS h FROM sh),
    ranked AS (
      SELECT doc_id, h, row_number() OVER (PARTITION BY doc_id ORDER BY h) AS rn
      FROM hashed
    )
    SELECT doc_id, string_agg(CAST(h AS VARCHAR), '|' ORDER BY h) AS fingerprint
    FROM ranked WHERE rn <= 8 GROUP BY doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style fingerprint: 8 smallest distinct shingle
    hashes per document (rolling-hash document signature)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select("doc_id", ts.fingerprint(F.col("text")).alias("fingerprint"))


# --------------------------------------------------------------------------
# Similarity search section (embeddings)
# --------------------------------------------------------------------------

# exact double-precision pair cosine in SQL (element-wise, explicit
# double cast — list_dot_product on FLOAT[] accumulates in float32
# and would NOT match Spark's double math)
def _pair_cosine_sql(query_filter: str) -> str:
    return f"""
    exploded AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    norms AS (
      SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM exploded GROUP BY vec_id
    ),
    dots AS (
      SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id, sum(q.x * b.x) AS dot
      FROM exploded q JOIN exploded b ON q.dim = b.dim AND q.vec_id <> b.vec_id
      WHERE {query_filter}
      GROUP BY q.vec_id, b.vec_id
    ),
    cos AS (
      SELECT d.query_id, d.neighbor_id,
        round(d.dot / (nq.nrm * nb.nrm), 6) AS cosine
      FROM dots d
      JOIN norms nq ON d.query_id = nq.vec_id
      JOIN norms nb ON d.neighbor_id = nb.vec_id
    )
    """


@register(
    "ann_bruteforce_topk",
    oracle=f"""
    WITH {_pair_cosine_sql("q.vec_id < 10")},
    ranked AS (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
      FROM cos
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
    """,
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for the first 10 vectors —
    the ANN correctness baseline (broadcast queries, single corpus
    scan, native zip_with/aggregate dot products)."""
    from multiomics_biocypher_kg_spark.operators.simsearch import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 10).select("vec_id")
    return cosine_topk(emb, query_ids=q, k=5)


@register(
    "knn_classify",
    oracle=f"""
    WITH {_pair_cosine_sql("q.vec_id < 100")},
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM cos
    ),
    votes AS (
      SELECT r.query_id, e.label AS nb_label, count(*) AS votes
      FROM ranked r JOIN embeddings e ON r.neighbor_id = e.vec_id
      WHERE r.rank <= 5 GROUP BY r.query_id, e.label
    ),
    pred AS (
      SELECT query_id, nb_label AS pred_label,
        row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, nb_label ASC) AS rn
      FROM votes
    )
    SELECT p.query_id, p.pred_label, e.label AS true_label
    FROM pred p JOIN embeddings e ON p.query_id = e.vec_id WHERE p.rn = 1
    """,
)
def knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-NN majority-vote classification for the first 100 vectors
    (votes desc, label asc tie-break)."""
    from multiomics_biocypher_kg_spark.operators import simsearch as ss

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    topk = ss.cosine_topk(
        emb, query_ids=emb.where(F.col("vec_id") < 100).select("vec_id"), k=5
    )
    labeled = topk.join(
        emb.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nb_label")),
        "neighbor_id",
    )
    votes = labeled.groupBy("query_id", "nb_label").agg(
        F.count(F.lit(1)).alias("votes")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("nb_label").asc()
    )
    pred = (
        votes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("query_id", F.col("nb_label").alias("pred_label"))
    )
    return pred.join(
        emb.select(F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")),
        "query_id",
    )


@register(
    "ann_centroids",
    oracle="""
    WITH exploded AS (
      SELECT label, generate_subscripts(embedding, 1) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    per_dim AS (SELECT label, dim, avg(x) AS m FROM exploded GROUP BY label, dim)
    SELECT p.label, round(sqrt(sum(m * m)), 6) AS centroid_norm, c.n_vectors
    FROM per_dim p
    JOIN (SELECT label, count(*) AS n_vectors FROM embeddings GROUP BY label) c
      ON p.label = c.label
    GROUP BY p.label, c.n_vectors
    """,
)
def ann_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid norms (posexplode + two-level agg)."""
    from multiomics_biocypher_kg_spark.operators.simsearch import label_centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return label_centroids(emb).select("label", "n_vectors", "centroid_norm")


# sign-LSH candidate generation rendered in SQL — the EXACT DuckDB
# mirror of simsearch._plane_sign / lsh_bucket (dim is 1-based in
# generate_subscripts, hence dim - 1). Requires `exploded` from
# _pair_cosine_sql in the same WITH chain.
def _lsh_cands_sql(n_tables: int, n_planes: int) -> str:
    return f"""
    lsh_proj AS (
      SELECT e.vec_id, t.t, p.p,
        sum(e.x * CASE WHEN (((t.t * 131 + p.p) * 2654435761
                              + (e.dim - 1) * 40503) % 97) % 2 = 0
                  THEN 1.0 ELSE -1.0 END) AS proj
      FROM exploded e
      CROSS JOIN (SELECT unnest(generate_series(0, {n_tables - 1})) AS t) t
      CROSS JOIN (SELECT unnest(generate_series(0, {n_planes - 1})) AS p) p
      GROUP BY e.vec_id, t.t, p.p
    ),
    lsh_buckets AS (
      SELECT vec_id, t,
        sum(CASE WHEN proj > 0 THEN (1::BIGINT << p) ELSE 0::BIGINT END) AS b
      FROM lsh_proj GROUP BY vec_id, t
    ),
    lsh_cands AS (
      SELECT DISTINCT a.vec_id AS id_a, b2.vec_id AS id_b
      FROM lsh_buckets a
      JOIN lsh_buckets b2 ON a.t = b2.t AND a.b = b2.b AND a.vec_id < b2.vec_id
    )
    """


# Deterministic fixed-init Lloyd k-means rendered in SQL: the EXACT
# DuckDB mirror of simsearch.ivf_index / ivf_topk. Seeds = the
# n_lists lowest-id vectors; each iteration = nearest-centroid
# assignment (ties -> smallest list id, matching array_position of
# array_min) followed by per-dim means, with empty lists keeping the
# previous centroid (the `coalesce` — mirrors ivf_index's
# `if i in new else cents[i]`). Iterations are unrolled as CTE pairs
# (the _lsh_cands_sql rendering trick).
from multiomics_biocypher_kg_spark.oracle_fragments import (  # noqa: E402
    _lloyd_assign_sql,
    _lloyd_prefix_parts,
)


def _ivf_topk_sql(n_lists: int, n_probe: int, iters: int, k: int) -> str:
    parts = _lloyd_prefix_parts(n_lists, iters)
    parts.append(f"""
    probes AS (
      SELECT vec_id AS query_id, list_id FROM (
        SELECT vec_id, list_id,
          row_number() OVER (PARTITION BY vec_id
                             ORDER BY d ASC, list_id ASC) AS rn
        FROM afinal_d) WHERE rn <= {n_probe}
    ),
    cands AS (
      SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
      FROM probes p JOIN afinal a ON p.list_id = a.list_id
      WHERE a.vec_id <> p.query_id
    ),
    cdots AS (
      SELECT c.query_id, c.neighbor_id, sum(q.x * b.x) AS dot
      FROM cands c
      JOIN exploded q ON q.vec_id = c.query_id
      JOIN exploded b ON b.vec_id = c.neighbor_id AND b.dim = q.dim
      GROUP BY c.query_id, c.neighbor_id
    ),
    ccos AS (
      SELECT d.query_id, d.neighbor_id,
        round(d.dot / (nq.nrm * nb.nrm), 6) AS cosine
      FROM cdots d
      JOIN norms nq ON d.query_id = nq.vec_id
      JOIN norms nb ON d.neighbor_id = nb.vec_id
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
      FROM ccos) WHERE rank <= {k}""")
    return "WITH " + ",".join(parts)


def _semdedup_sql(n_lists: int, iters: int, threshold: float) -> str:
    """SemDeDup oracle: the shared Lloyd chain + within-cluster
    pairwise cosine + the keep-lowest-id rule."""
    parts = _lloyd_prefix_parts(n_lists, iters)
    parts.append(f"""
    sd_pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM afinal a JOIN afinal b
        ON a.list_id = b.list_id AND a.vec_id < b.vec_id
    ),
    sd_dots AS (
      SELECT p.id_a, p.id_b, sum(qa.x * qb.x) AS dot
      FROM sd_pairs p
      JOIN exploded qa ON qa.vec_id = p.id_a
      JOIN exploded qb ON qb.vec_id = p.id_b AND qb.dim = qa.dim
      GROUP BY p.id_a, p.id_b
    ),
    sd_cos AS (
      SELECT d.id_a, d.id_b, d.dot / (na.nrm * nb.nrm) AS cosine
      FROM sd_dots d
      JOIN norms na ON d.id_a = na.vec_id
      JOIN norms nb ON d.id_b = nb.vec_id
    ),
    sd_dups AS (
      SELECT id_b AS vec_id, max(cosine) AS mx
      FROM sd_cos WHERE cosine >= {threshold} GROUP BY id_b
    )
    SELECT a.vec_id, CAST(a.list_id AS INTEGER) AS list_id,
      (d.vec_id IS NOT NULL) AS is_dup, round(d.mx, 6) AS max_cos_prior
    FROM afinal a LEFT JOIN sd_dups d ON a.vec_id = d.vec_id""")
    return "WITH " + ",".join(parts)


@register("text_semdedup", oracle=_semdedup_sql(n_lists=8, iters=2, threshold=0.35))
def text_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic deduplication, SemDeDup-style (Abbas et al. 2023):
    deterministic fixed-init k-means clusters (the ivf_index Lloyd
    chain, oracle-shared with ann_ivf_topk) bound the pairwise cosine
    comparison WITHIN clusters, and a vector is dropped iff a
    lower-id cluster-mate is >= 0.35 cosine — keep-lowest-id, the
    same greedy convention as the MinHash/SimHash family. The scale
    property is the point: the quadratic term is per-cluster, so
    bucketing the corpus by list_id makes the pair join co-located
    and the cross-cluster comparison count exactly zero."""
    from multiomics_biocypher_kg_spark.operators.simsearch import semdedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return semdedup(emb, threshold=0.35, n_lists=8, iters=2)


@register("ann_ivf_topk", oracle=_ivf_topk_sql(n_lists=8, n_probe=3, iters=2, k=5))
# exactness-vs-bruteforce, determinism, and the n_probe=n_lists degenerate
# case are pinned in tests/test_dedup_simsearch.py
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (the brief's 'IVF variant as the scale path'):
    deterministic k-means inverted lists (fixed lowest-id init, fixed
    Lloyd iterations — no RNG), n_probe nearest lists per query,
    exact cosine re-rank on probed candidates only. At scale the
    corpus is bucketed by list_id so a query touches
    n_probe/n_lists of the data."""
    from multiomics_biocypher_kg_spark.operators.simsearch import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ivf_topk(emb, k=5, n_lists=8, n_probe=3)


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH {_pair_cosine_sql("q.vec_id < b.vec_id")},
    {_lsh_cands_sql(8, 4)}
    SELECT c.query_id AS id_a, c.neighbor_id AS id_b, c.cosine
    FROM cos c JOIN lsh_cands l ON c.query_id = l.id_a AND c.neighbor_id = l.id_b
    WHERE c.cosine >= 0.35
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs (cosine >= 0.35) via sign-LSH
    candidate discovery (8 tables x 4 planes) + exact cosine verify
    on candidates only — mirrors the MinHash-LSH pattern; the oracle
    renders the identical hyperplane formula in SQL, so the LSH
    bucketing itself is correctness-gated. Equi-join plan, no
    CartesianProduct (asserted in tests/test_plans.py); recall vs
    brute force is measured in tests/test_dedup_simsearch.py."""
    from multiomics_biocypher_kg_spark.operators.simsearch import (
        embedding_neardup_pairs,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_neardup_pairs(emb, 0.35, n_tables=8, n_planes=4)


# --------------------------------------------------------------------------
# Multimodal section: binary payload plumbing + batch decode
# --------------------------------------------------------------------------


@register(
    "mm_frame_sample",
    oracle="""
    WITH vids AS (
      SELECT doc_id, text, strlen(text) AS L FROM documents WHERE doc_id % 3 = 2
    ),
    frames AS (
      SELECT doc_id, i AS frame_idx,
        substr(text, ((i * L) // 4) + 1,
               (((i + 1) * L) // 4) - ((i * L) // 4)) AS frame_text
      FROM vids, (SELECT unnest(generate_series(0, 3)) AS i) f
    )
    SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx, frame_text,
      CAST(strlen(frame_text) AS INTEGER) AS n_bytes
    FROM frames
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame sampling end-to-end: binary video payloads ->
    mapInPandas one-row-per-frame slicing (the ffmpeg-keyframe slot);
    the oracle recomputes the deterministic byte boundaries in SQL,
    so the many-rows-out Arrow batch contract is correctness-gated."""
    from multiomics_biocypher_kg_spark.operators.multimodal import (
        attach_payloads,
        sample_frames,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    frames = sample_frames(attach_payloads(docs), n_frames=4)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.decode("frame", "utf-8").alias("frame_text"),
        "n_bytes",
    )


@register(
    "mm_decode_features",
    oracle="""
    WITH chars AS (
      SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents
    ),
    freq AS (
      SELECT doc_id, ascii(c) AS byte, count(*) AS cnt FROM chars GROUP BY doc_id, ascii(c)
    ),
    mode AS (
      SELECT doc_id, min(byte) AS byte_mode FROM freq f1
      WHERE cnt = (SELECT max(cnt) FROM freq f2 WHERE f2.doc_id = f1.doc_id)
      GROUP BY doc_id
    ),
    mean AS (
      SELECT doc_id, round(avg(ascii(c)), 6) AS byte_mean,
             CAST(count(*) AS INTEGER) AS n_bytes
      FROM chars GROUP BY doc_id
    )
    SELECT m.doc_id,
      CASE m.doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      m.n_bytes, m.byte_mean, CAST(mo.byte_mode AS INTEGER) AS byte_mode
    FROM mean m JOIN mode mo ON m.doc_id = mo.doc_id
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: synthesize binary payloads +
    typed metadata, run the mapInPandas batch 'decoder' (stubbed
    byte-statistics codec — the real image/audio codec slots into
    the same contract), return per-asset features. The oracle
    recomputes the byte statistics in SQL, so the Arrow batch path
    itself is correctness-gated."""
    from multiomics_biocypher_kg_spark.operators.multimodal import (
        attach_payloads,
        decode_features,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = decode_features(attach_payloads(docs))
    return feats.select(
        "doc_id",
        "kind",
        "n_bytes",
        F.round("byte_mean", 6).alias("byte_mean"),
        F.col("byte_mode").cast("int").alias("byte_mode"),
    )


@register(
    "mm_decode_real",
    oracle="""
    WITH b AS (
      SELECT doc_id, text, length(text) AS L FROM documents
    ),
    img AS (
      SELECT doc_id, sum(ord(substr(text, ((i - 1) % L) + 1, 1))) AS s
      FROM b, LATERAL (SELECT unnest(generate_series(1, 192)) AS i) t
      WHERE doc_id % 2 = 0 GROUP BY doc_id
    ),
    aud AS (
      SELECT doc_id,
        sum(abs((ord(substr(text, ((i - 1) % L) + 1, 1)) - 128) * 256)) AS s
      FROM b, LATERAL (SELECT unnest(generate_series(1, 256)) AS i) t
      WHERE doc_id % 2 = 1 GROUP BY doc_id
    )
    SELECT doc_id, 'image' AS kind,
      CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
      CAST(NULL AS INTEGER) AS sample_rate, CAST(192 AS BIGINT) AS n_units,
      round(CAST(s AS DOUBLE) / 192, 6) AS mean_value
    FROM img
    UNION ALL
    SELECT doc_id, 'audio',
      CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
      CAST(8000 AS INTEGER), CAST(256 AS BIGINT),
      round(CAST(s AS DOUBLE) / 256, 6)
    FROM aud
    """,
)
def mm_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL multimodal decode end-to-end: synthesize genuine binary
    P6 PPM images / PCM-16 WAV audio from the corpus (valid files —
    any external viewer opens them), then parse them back through
    the mapInPandas Arrow contract with actual format decoders
    (PPM header+pixel-plane parse; stdlib wave for RIFF/WAV). The
    oracle recomputes the decoded pixel/sample statistics from the
    source text in SQL, so a header-math or byte-order bug in the
    decoder is a hash mismatch, not a silent skew. This retires the
    codec stub for these two formats; compressed codecs remain the
    declared NotImplementedError slot."""
    from multiomics_biocypher_kg_spark.operators.multimodal import (
        attach_real_payloads,
        decode_real_features,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = decode_real_features(attach_real_payloads(docs))
    return feats.select(
        "doc_id",
        "kind",
        "width",
        "height",
        "sample_rate",
        "n_units",
        F.round("mean_value", 6).alias("mean_value"),
    )

@register(
    "dedup_incremental_lsh",
    oracle=f"""
    WITH sh AS ({SHINGLES_SQL}),
    hashed AS (SELECT id, {md5_long_sql('shingle')} % {MH_R} AS x FROM sh),
    sigs AS (
      SELECT id, h.i AS i, min((h.a * x + h.b) % {MH_R}) AS mh
      FROM hashed CROSS JOIN {minhash_coeffs_sql()} h
      GROUP BY id, h.i
    ),
    banded AS (
      SELECT id, i // {ROWS_PER_BAND} AS band,
        string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS sig
      FROM sigs GROUP BY id, i // {ROWS_PER_BAND}
    ),
    cands AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM banded a JOIN banded b ON a.band = b.band AND a.sig = b.sig
      WHERE a.id < 1000000 AND b.id >= 1000000
    ),
    verified AS (SELECT * FROM ({JACCARD_SQL}) WHERE jaccard >= 0.5)
    SELECT c.id_a, c.id_b, v.jaccard
    FROM cands c JOIN verified v ON c.id_a = v.id_a AND c.id_b = v.id_b
    """,
)
def dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL dedup: the synthetic recrawl batch (ids >= 10^6 —
    the near/exact dup synthesis plays the role of today's crawl)
    deduped against the existing corpus (ids < 10^6) through the
    cross band-bucket join (operators.dedup.incremental_neardup_
    pairs). The base side is touched only via its signature/shingle
    index — never a base x base comparison — which is how a 10^12-doc
    corpus absorbs a daily batch: signatures are the persisted
    segment (text_minhash_doc_signature), batch work is linear in
    the batch. The oracle replays the identical band math with the
    base/batch split predicate."""
    corpus = _dedup_corpus(spark, sf_dir)
    base = corpus.where(F.col("doc_id") < 1000000)
    batch = corpus.where(F.col("doc_id") >= 1000000)
    return dd.incremental_neardup_pairs(base, batch, 0.5)


# Re-apply the driver-window order after this module's registrations:
# if this module is imported FIRST, registry's own bottom-of-file
# ordering pass runs before these queries exist. Idempotent.
from multiomics_biocypher_kg_spark.registry import (  # noqa: E402
    _apply_driver_window_order,
)

_apply_driver_window_order()


# --------------------------------------------------------------------------
# Round-4b curation additions: DSIR importance weights, char entropy
# --------------------------------------------------------------------------

_DSIR_BUCKETS = 256
_DSIR_TARGET = "en"


@register(
    "text_dsir_weights",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
        {md5_long_sql("unnest(string_split(text, ' '))")} % {_DSIR_BUCKETS}
          AS bucket
      FROM documents
    ),
    raw AS (SELECT bucket, count(*) AS cnt_r FROM toks GROUP BY bucket),
    tgt AS (SELECT bucket, count(*) AS cnt_t FROM toks
            WHERE lang = '{_DSIR_TARGET}' GROUP BY bucket),
    tot AS (
      SELECT CAST(count(*) AS DOUBLE) AS t_r,
        CAST(sum(CASE WHEN lang = '{_DSIR_TARGET}' THEN 1 ELSE 0 END)
             AS DOUBLE) AS t_t
      FROM toks
    ),
    tab AS (
      SELECT r.bucket,
        ln((coalesce(t.cnt_t, 0) + 1.0) / (tot.t_t + {_DSIR_BUCKETS}.0))
        - ln((r.cnt_r + 1.0) / (tot.t_r + {_DSIR_BUCKETS}.0)) AS lr
      FROM raw r LEFT JOIN tgt t ON r.bucket = t.bucket CROSS JOIN tot
    )
    SELECT k.doc_id, k.lang, CAST(count(*) AS INTEGER) AS n_tokens,
      round(avg(tab.lr), 6) AS dsir_weight
    FROM toks k JOIN tab ON k.bucket = tab.bucket
    GROUP BY k.doc_id, k.lang
    """,
)
def text_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data-selection weights (Xie et al. 2023): per-doc average
    log-likelihood ratio of hashed unigram buckets under the target
    (English subcorpus) vs raw distribution, Laplace-smoothed — the
    importance-resampling score used to select pretraining data that
    matches a target domain. Model state is two 256-row bucket tables
    + two scalars, broadcast onto the token stream (functions.
    textstats.dsir_weights): two corpus scans total, map-side-combined
    counts, no token-level shuffle wider than the bucket dictionary."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return ts.dsir_weights(
        docs, target_lang=_DSIR_TARGET, n_buckets=_DSIR_BUCKETS
    )


@register(
    "text_char_entropy",
    oracle="""
    WITH chars AS (
      SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents
    ),
    freq AS (
      SELECT doc_id, c, count(*) AS cnt FROM chars GROUP BY doc_id, c
    ),
    n AS (SELECT doc_id, sum(cnt) AS n FROM freq GROUP BY doc_id)
    SELECT f.doc_id, CAST(sum(cnt) AS INTEGER) AS n_chars,
      round(-sum((cnt / n.n) * ln(cnt / n.n) / ln(2)), 6) AS char_entropy,
      (round(-sum((cnt / n.n) * ln(cnt / n.n) / ln(2)), 6) < 4.0)
        AS is_low_entropy
    FROM freq f JOIN n ON f.doc_id = n.doc_id
    GROUP BY f.doc_id, n.n
    """,
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-entropy junk gate (functions.textstats.
    char_entropy_profile): Shannon bits/char from the per-(doc, char)
    histogram — repeated-char padding and template boilerplate score
    low, base64/binary junk scores high; natural text sits ~4. On
    this corpus the 4.0 threshold flags the low-entropy ~10% tail.
    One explode + two map-side-combined aggs; per-doc state is its
    alphabet, so partials stay tiny at any corpus size."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return ts.char_entropy_profile(docs, low_threshold=4.0)


def _pq_sql(m: int, k: int, sub_d: int) -> str:
    """Product-quantization oracle: per subspace, the same
    fixed-init Lloyd chain as _lloyd_prefix_parts but restricted to
    the subspace's dim range (1 refine iteration), then code + sq
    reconstruction error per vector."""

    def assign(s: int, cent: str, out: str) -> str:
        return f"""
    {out}_d AS (
      SELECT e.vec_id, c.list_id, sum((e.x - c.c) * (e.x - c.c)) AS d
      FROM pq{s}_ex e JOIN {cent} c ON e.dim = c.dim
      GROUP BY e.vec_id, c.list_id
    ),
    {out} AS (
      SELECT vec_id, list_id FROM (
        SELECT vec_id, list_id,
          row_number() OVER (PARTITION BY vec_id
                             ORDER BY d ASC, list_id ASC) AS rn
        FROM {out}_d) WHERE rn = 1
    )"""

    parts = [
        """
    exploded AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    seeds AS (
      SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER)
               AS list_id
      FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT %d)
    )""" % k
    ]
    selects = []
    for s in range(m):
        lo = s * sub_d
        parts.append(f"""
    pq{s}_ex AS (
      SELECT vec_id, dim, x FROM exploded
      WHERE dim > {lo} AND dim <= {lo + sub_d}
    ),
    pq{s}_cent0 AS (
      SELECT se.list_id, e.dim, e.x AS c
      FROM seeds se JOIN pq{s}_ex e ON se.vec_id = e.vec_id
    )""")
        parts.append(assign(s, f"pq{s}_cent0", f"pq{s}_a1"))
        parts.append(f"""
    pq{s}_m1 AS (
      SELECT a.list_id, e.dim, avg(e.x) AS c
      FROM pq{s}_a1 a JOIN pq{s}_ex e ON a.vec_id = e.vec_id
      GROUP BY a.list_id, e.dim
    ),
    pq{s}_cent1 AS (
      SELECT c0.list_id, c0.dim, coalesce(mm.c, c0.c) AS c
      FROM pq{s}_cent0 c0
      LEFT JOIN pq{s}_m1 mm ON c0.list_id = mm.list_id AND c0.dim = mm.dim
    )""")
        parts.append(assign(s, f"pq{s}_cent1", f"pq{s}_af"))
        selects.append(
            f"SELECT a.vec_id, {s} AS subspace, "
            f"CAST(a.list_id AS INTEGER) AS code, round(d.d, 6) AS sq_err "
            f"FROM pq{s}_af a JOIN pq{s}_af_d d "
            f"ON a.vec_id = d.vec_id AND a.list_id = d.list_id"
        )
    return "WITH " + ",".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


@register("emb_pq_codes", oracle=_pq_sql(m=4, k=8, sub_d=16))
def emb_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (operators.simsearch.pq_codes): 4
    subspaces x 8-entry codebooks learned per subspace with the same
    deterministic fixed-init Lloyd as the IVF index — the IVF-PQ
    compressed representation (4x3-bit codes replace 64 doubles for
    in-RAM distance tables at billion-vector scale). Codebook fits
    run on slice() projections (no full-vector shuffle), codebooks
    are driver-bounded literals, encoding is map-only. The oracle
    re-derives every per-subspace Lloyd step, so codes AND
    reconstruction errors are value-gated."""
    from multiomics_biocypher_kg_spark.operators.simsearch import pq_codes

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return pq_codes(emb, m=4, k=8, iters=1)


# --------------------------------------------------------------------------
# Round-4e curation additions: canonical selection + line-level dedup
# --------------------------------------------------------------------------


@register(
    "dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE {MINHASH_PAIRS_CTES},
    und AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(node, lbl) AS (
      SELECT a, a FROM und
      UNION
      SELECT u.a, r.lbl FROM und u JOIN reach r ON u.b = r.node
    ),
    comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node),
    quality AS (
      SELECT doc_id AS node,
        CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
      FROM ({DEDUP_CORPUS_SQL})
    ),
    m AS (SELECT c.node, c.component, q.n_tokens
          FROM comp c JOIN quality q ON c.node = q.node)
    SELECT component AS cluster_id,
      (list(node ORDER BY n_tokens DESC, node))[1] AS kept_doc_id,
      max(n_tokens) AS kept_n_tokens,
      CAST(count(*) AS BIGINT) AS n_members,
      CAST(count(*) - 1 AS BIGINT) AS n_dropped
    FROM m GROUP BY component
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical selection on top of the LSH + CC dedup chain: each
    near-dup cluster keeps its longest member (ties -> smallest id).
    See :func:`operators.dedup.keep_best_per_cluster` for the scale
    contract (argmax as max(struct), no window/sort)."""
    corpus = _dedup_corpus(spark, sf_dir)
    pairs = dd.minhash_neardup_pairs(corpus, 0.5)
    return dd.keep_best_per_cluster(pairs, corpus)


@register(
    "text_line_dedup",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS arr,
        len(string_split(text, ' ')) AS n
      FROM ({DEDUP_CORPUS_SQL})
    ),
    lines AS (
      SELECT doc_id, CAST(i AS INTEGER) AS line_idx,
        array_to_string(arr[i * 8 + 1 : i * 8 + 8], ' ') AS line
      FROM t, LATERAL (
        SELECT unnest(generate_series(
          0, CAST(ceil(CAST(n AS DOUBLE) / 8) AS BIGINT) - 1)) AS i
      ) s
    ),
    freq AS (
      SELECT md5(line) AS h, count(DISTINCT doc_id) AS line_df
      FROM lines GROUP BY md5(line)
    ),
    j AS (SELECT l.*, f.line_df FROM lines l JOIN freq f ON md5(l.line) = f.h)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
      CAST(sum(CASE WHEN line_df > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
      md5(coalesce(array_to_string(
        list(line ORDER BY line_idx) FILTER (WHERE line_df <= 2), ' '
      ), '')) AS kept_md5
    FROM j GROUP BY doc_id
    """,
)
def text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style line-level boilerplate removal over the dedup
    corpus (8-token segments stand in for newline-delimited lines;
    exact-dup docs keep their lines at doc-freq 2, docs with BOTH an
    exact and a near copy cross the >2 threshold on their aligned
    head lines and lose them). See :func:`operators.dedup.line_dedup`."""
    return dd.line_dedup(_dedup_corpus(spark, sf_dir))


_SPAN = 8  # span window length (tokens); stride 1


@register(
    "text_span_dedup",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS arr,
        len(string_split(text, ' ')) AS n
      FROM ({DEDUP_CORPUS_SQL})
    ),
    spans AS (
      SELECT doc_id, CAST(i AS BIGINT) AS start_idx,
        md5(array_to_string(arr[i + 1 : i + {_SPAN}], ' ')) AS h
      FROM t, LATERAL (
        SELECT unnest(generate_series(0, n - {_SPAN})) AS i
      ) s
    ),
    freq AS (
      SELECT h, count(DISTINCT doc_id) AS span_df FROM spans GROUP BY h
    ),
    dup AS (
      SELECT sp.doc_id, sp.start_idx, sp.start_idx + {_SPAN} - 1 AS end_idx
      FROM spans sp JOIN freq f ON sp.h = f.h WHERE f.span_df >= 2
    ),
    isl AS (
      SELECT doc_id, start_idx, end_idx,
        CASE WHEN start_idx > coalesce(max(end_idx) OVER (
          PARTITION BY doc_id ORDER BY start_idx
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
        THEN 1 ELSE 0 END AS new_island
      FROM dup
    ),
    isl2 AS (
      SELECT *, sum(new_island) OVER (
        PARTITION BY doc_id ORDER BY start_idx
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM isl
    ),
    cov AS (
      SELECT doc_id, island,
        max(end_idx) - min(start_idx) + 1 AS covered,
        count(*) AS spans
      FROM isl2 GROUP BY doc_id, island
    ),
    per AS (
      SELECT doc_id, sum(covered) AS dup_tokens, sum(spans) AS n_dup_spans
      FROM cov GROUP BY doc_id
    )
    SELECT t.doc_id, CAST(t.n AS BIGINT) AS n_tokens,
      CAST(coalesce(p.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
      CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
      CAST(coalesce(p.dup_tokens, 0) AS DOUBLE) / t.n AS dup_frac
    FROM t LEFT JOIN per p ON t.doc_id = p.doc_id
    """,
)
def text_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr span dedup (Lee et al. 2022) over the dedup
    corpus: stride-1 8-token windows, duplicated when shared by >= 2
    distinct docs, per-doc coverage as the exact interval union of
    overlapping duplicated windows. Exact copies land at dup_frac
    1.0; the every-10th-token-dropped near copies land in a partial
    band (only the windows that fit between two deletions survive in
    both) — the gradient document-level dedup can't see. See
    :func:`operators.dedup.span_dedup` for the scale contract."""
    return dd.span_dedup(_dedup_corpus(spark, sf_dir), span_tokens=_SPAN)


@register(
    "text_quality_classifier",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        CAST(list_sum(list_transform(string_split(text, ' '),
          t -> {md5_long_sql('t')} % 2001 - 1000)) AS BIGINT) AS logit_milli
      FROM documents
    )
    SELECT doc_id, n_tokens, logit_milli,
      CAST(logit_milli AS DOUBLE) / n_tokens AS mean_logit_milli,
      (CAST(logit_milli AS DOUBLE) / n_tokens > 25.0) AS keep
    FROM s
    """,
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-feature linear quality filter (the fastText-style
    CCNet / GPT-3 "looks like reference text" gate): per-token hashed
    weights summed in exact int64 milli-units, mean-logit threshold
    for the keep decision. Runs entirely in the scan projection —
    zero shuffle, zero UDF (see
    :func:`functions.textstats.quality_logit_milli`); production
    weights would arrive as a broadcast (bucket, weight) dim join
    with the identical plan shape."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    n = F.size(F.split("text", " ")).cast("long")
    logit = ts.quality_logit_milli(F.col("text"))
    mean = logit.cast("double") / n
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        logit.alias("logit_milli"),
        mean.alias("mean_logit_milli"),
        (mean > 25.0).alias("keep"),
    )


@register(
    "text_tokenizer_fertility",
    oracle="""
    SELECT lang,
      CAST(count(*) AS BIGINT) AS n_docs,
      CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_words,
      CAST(sum(len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]')))
        AS BIGINT) AS n_bpe_tokens,
      CAST(sum(strlen(text)) AS BIGINT) AS n_bytes,
      CAST(sum(len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]')))
        AS DOUBLE) / sum(len(string_split(text, ' '))) AS fertility,
      CAST(sum(strlen(text)) AS DOUBLE)
        / sum(len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]')))
        AS bytes_per_token
    FROM documents GROUP BY lang
    """,
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit per language: subword-tokens-per-word
    (the multilingual-pipeline metric that decides per-language token
    budgets) and bytes-per-token (compression rate), from one
    map-side-combined aggregate over the corpus — the whitespace and
    BPE-ish counters both evaluate in the scan projection
    (functions/textstats.py BPE_TOKEN_RE), so a 100 TB corpus costs
    one scan plus a languages-sized (tiny) shuffle."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("lang", "text")
    words = ts.token_count(F.col("text")).cast("long")
    bpe = ts.bpe_token_count(F.col("text")).cast("long")
    per = docs.select("lang", words.alias("w"), bpe.alias("b"),
                      F.octet_length("text").cast("long").alias("y"))
    agg = per.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("w").cast("long").alias("n_words"),
        F.sum("b").cast("long").alias("n_bpe_tokens"),
        F.sum("y").cast("long").alias("n_bytes"),
    )
    return agg.select(
        "lang", "n_docs", "n_words", "n_bpe_tokens", "n_bytes",
        (F.col("n_bpe_tokens").cast("double") / F.col("n_words")).alias("fertility"),
        (F.col("n_bytes").cast("double") / F.col("n_bpe_tokens")).alias(
            "bytes_per_token"
        ),
    )


@register(
    "dedup_prefix_filter",
    oracle=f"""
    SELECT * FROM (
      WITH sh AS ({SHINGLES_SQL}),
      sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
      inter AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
        GROUP BY a.id, b.id
      )
      SELECT i.id_a, i.id_b, CAST(i.inter AS BIGINT) AS inter,
        CAST(sa.sz AS BIGINT) AS sz_a, CAST(sb.sz AS BIGINT) AS sz_b,
        round(CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter), 6)
          AS jaccard
      FROM inter i
      JOIN sizes sa ON i.id_a = sa.id
      JOIN sizes sb ON i.id_b = sb.id
    ) WHERE jaccard >= 0.8
    """,
)
def dedup_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shingle-set Jaccard >= 0.8 join via PREFIX FILTERING
    (AllPairs/PPJoin) — the deterministic exact counterpart to the
    MinHash-LSH candidate scheme: rarest-first global element order,
    candidates only from each set's length-derived prefix, exact
    verify. The ORACLE is the brute-force all-pairs join — prefix
    filtering must reproduce it identically (its no-false-negative
    guarantee, value-checked). See
    :func:`operators.dedup.prefix_filter_pairs` for the scale
    contract."""
    sh = dd.shingles(_dedup_corpus(spark, sf_dir))
    return dd.prefix_filter_pairs(
        sh.select(F.col("id"), F.col("shingle").alias("tok")), 0.8
    )


@register(
    "emb_hamming_topk",
    oracle="""
    WITH bits AS (
      SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
             unnest(embedding) AS x
      FROM embeddings
    ),
    codes AS (
      SELECT vec_id,
        CAST(coalesce(sum(CASE WHEN d < 32 AND x > 0
          THEN (1::BIGINT << CAST(d AS INTEGER)) END), 0) AS BIGINT) AS w0,
        CAST(coalesce(sum(CASE WHEN d >= 32 AND x > 0
          THEN (1::BIGINT << CAST(d - 32 AS INTEGER)) END), 0) AS BIGINT) AS w1
      FROM bits GROUP BY vec_id
    ),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        CAST(bit_count(xor(q.w0, c.w0))
           + bit_count(xor(q.w1, c.w1)) AS INTEGER) AS hamming
      FROM codes q JOIN codes c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < 10
    ),
    ranked AS (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        ORDER BY hamming ASC, neighbor_id ASC) AS INTEGER) AS rank
      FROM pairs
    )
    SELECT query_id, neighbor_id, hamming, rank
    FROM ranked WHERE rank <= 5
    """,
)
def emb_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 Hamming neighbors over packed sign codes for the first
    10 vectors — the binary-code cheap pass of a code-then-rerank
    retrieval stack (sign binarization in the scan projection packs
    64 floats into two 32-bit words; distance = xor + popcount in
    whole-stage codegen). The oracle packs the identical words via
    a disjoint-bit SUM (sum == bitwise-or when each term owns one
    bit) and re-ranks with the same hamming-asc / id-asc tiebreak."""
    from multiomics_biocypher_kg_spark.operators.simsearch import hamming_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 10).select("vec_id")
    return hamming_topk(emb, query_ids=q, k=5, dim=64)


@register(
    "emb_hamming_neardup",
    oracle="""
    WITH bits AS (
      SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
             unnest(embedding) AS x
      FROM embeddings
    ),
    codes AS (
      SELECT vec_id,
        CAST(coalesce(sum(CASE WHEN d < 32 AND x > 0
          THEN (1::BIGINT << CAST(d AS INTEGER)) END), 0) AS BIGINT) AS w0,
        CAST(coalesce(sum(CASE WHEN d >= 32 AND x > 0
          THEN (1::BIGINT << CAST(d - 32 AS INTEGER)) END), 0) AS BIGINT) AS w1
      FROM bits GROUP BY vec_id
    ),
    bands AS (
      SELECT vec_id, t.k AS band_idx,
        (CASE WHEN t.k < 8 THEN w0 >> CAST(4 * t.k AS INTEGER)
              ELSE w1 >> CAST(4 * (t.k - 8) AS INTEGER) END) & 15 AS band_val
      FROM codes CROSS JOIN range(0, 16) t(k)
    ),
    cands AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       AND a.vec_id < b.vec_id
    )
    SELECT c.id_a, c.id_b,
      CAST(bit_count(xor(ca.w0, cb.w0))
         + bit_count(xor(ca.w1, cb.w1)) AS INTEGER) AS hamming
    FROM cands c
    JOIN codes ca ON c.id_a = ca.vec_id
    JOIN codes cb ON c.id_b = cb.vec_id
    WHERE bit_count(xor(ca.w0, cb.w0)) + bit_count(xor(ca.w1, cb.w1)) <= 15
    """,
)
def emb_hamming_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All embedding pairs within Hamming distance 15 over packed
    sign codes, via pigeonhole-exact band bucketing (16 bands x 4
    bits: a pair differing in <= 15 of 64 bits must agree exactly on
    >= one band) — the candidates-first SCALE PATH the brute-force
    emb_hamming_topk contract points to, and the binary-code sibling
    of dedup_simhash's text-hash banding. Candidates come from a
    band equi-join (never all-pairs), the exact popcount verify
    touches candidates only."""
    from multiomics_biocypher_kg_spark.operators.simsearch import (
        hamming_band_pairs,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return hamming_band_pairs(emb, threshold=15, dim=64, band_bits=4)


# --------------------------------------------------------------------------
# B-cubed clustering evaluation vs the provenance gold
# --------------------------------------------------------------------------


@register(
    "dedup_bcubed_eval",
    oracle=f"""
    WITH RECURSIVE {MINHASH_PAIRS_CTES},
    und AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(node, lbl) AS (
      SELECT a, a FROM und
      UNION
      SELECT u.a, r.lbl FROM und u JOIN reach r ON u.b = r.node
    ),
    comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node),
    items AS (SELECT doc_id FROM (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000,
    array_to_string(
      list_where(string_split(text, ' '),
                 list_transform(generate_series(1, len(string_split(text, ' '))),
                                i -> (i - 1) % 10 <> 9)), ' ')
  FROM documents WHERE doc_id % 4 = 0
  UNION ALL
  SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 5 = 0
)),
    assigned AS (
      SELECT i.doc_id,
        coalesce(c.component, i.doc_id) AS pred,
        i.doc_id % 1000000 AS gold
      FROM items i LEFT JOIN comp c ON i.doc_id = c.node
    ),
    cells AS (
      SELECT pred, gold, count(*) AS n_pg FROM assigned GROUP BY pred, gold
    ),
    pn AS (SELECT pred, sum(n_pg) AS n_p FROM cells GROUP BY pred),
    gn AS (SELECT gold, sum(n_pg) AS n_g FROM cells GROUP BY gold),
    tot AS (SELECT CAST(sum(n_pg) AS DOUBLE) AS n FROM cells),
    sums AS (
      SELECT
        sum(CAST(c.n_pg AS DOUBLE) * c.n_pg / p.n_p) AS sp,
        sum(CAST(c.n_pg AS DOUBLE) * c.n_pg / g.n_g) AS sr
      FROM cells c JOIN pn p ON c.pred = p.pred JOIN gn g ON c.gold = g.gold
    )
    SELECT CAST(tot.n AS BIGINT) AS n_items,
      CAST((SELECT count(*) FROM pn) AS BIGINT) AS n_pred_clusters,
      CAST((SELECT count(*) FROM gn) AS BIGINT) AS n_gold_clusters,
      round(s.sp / tot.n, 6) AS bcubed_precision,
      round(s.sr / tot.n, 6) AS bcubed_recall,
      round(2.0 * (s.sp / tot.n) * (s.sr / tot.n)
            / (s.sp / tot.n + s.sr / tot.n), 6) AS bcubed_f1
    FROM sums s CROSS JOIN tot
    """,
)
def dedup_bcubed_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-cubed evaluation of the dedup CLUSTERS against the
    provenance gold — the standard entity-resolution clustering
    metric (Bagga & Baldwin; Amigó et al. 2009 show it is the only
    common clustering measure satisfying all four formal
    constraints). dedup_eval_pr scores PAIRS; B³ scores the
    delivered PARTITION, per item: precision = the fraction of an
    item's predicted cluster sharing its gold cluster, recall =
    the fraction of its gold cluster it was clustered with —
    so one wrong giant merge is punished in proportion to its size
    (pair-F1 lets it hide). Gold: every corpus id collapses to its
    base document (id % 1e6 — the twin construction's provenance);
    items in no near-dup pair are singleton predicted clusters.

    Scale shape: the per-item averages collapse to CELL sums
    (sum over (pred, gold) cells of n_pg²/n_p and n_pg²/n_g — the
    standard O(cells) B³ identity, never per-item state): one
    left join onto the CC labels, three keyed dictionary aggs, a
    1-row report. Exact integers until the final divisions."""
    from multiomics_biocypher_kg_spark.operators.canonicalize import (
        connected_components,
    )

    corpus = _dedup_corpus(spark, sf_dir)
    pairs = dd.minhash_neardup_pairs(corpus, 0.5)
    comp = connected_components(pairs, src="id_a", dst="id_b")
    assigned = (
        corpus.select("doc_id")
        .join(comp, corpus["doc_id"] == comp["node"], "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("pred"),
            (F.col("doc_id") % 1000000).alias("gold"),
        )
    )
    cells = assigned.groupBy("pred", "gold").agg(
        F.count(F.lit(1)).alias("n_pg")
    ).localCheckpoint(eager=False)  # three consumers
    pn = cells.groupBy("pred").agg(F.sum("n_pg").alias("n_p"))
    gn = cells.groupBy("gold").agg(F.sum("n_pg").alias("n_g"))
    tot = cells.agg(F.sum("n_pg").cast("double").alias("n"))
    npd = F.col("n_pg").cast("double")
    sums = (
        cells.join(pn, "pred")
        .join(gn, "gold")
        .agg(
            F.sum(npd * F.col("n_pg") / F.col("n_p")).alias("sp"),
            F.sum(npd * F.col("n_pg") / F.col("n_g")).alias("sr"),
        )
    )
    counts = pn.agg(F.count(F.lit(1)).alias("n_pred")).crossJoin(
        gn.agg(F.count(F.lit(1)).alias("n_gold"))
    )
    bp = F.col("sp") / F.col("n")
    br = F.col("sr") / F.col("n")
    return (
        sums.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(counts))
        .select(
            F.col("n").cast("long").alias("n_items"),
            F.col("n_pred").cast("long").alias("n_pred_clusters"),
            F.col("n_gold").cast("long").alias("n_gold_clusters"),
            F.round(bp, 6).alias("bcubed_precision"),
            F.round(br, 6).alias("bcubed_recall"),
            F.round(2.0 * bp * br / (bp + br), 6).alias("bcubed_f1"),
        )
    )


# --------------------------------------------------------------------------
# Exact-dedup storage-savings report
# --------------------------------------------------------------------------


@register(
    "dedup_savings_report",
    oracle=f"""
    WITH corpus AS ({DEDUP_CORPUS_SQL}),
    langd AS (SELECT doc_id AS base_id, lang FROM documents),
    sized AS (
      SELECT c.doc_id, length(c.text) AS n_bytes, md5(c.text) AS h, l.lang
      FROM corpus c JOIN langd l ON c.doc_id % 1000000 = l.base_id
    ),
    groups AS (
      SELECT lang, h, count(*) AS n, CAST(any_value(n_bytes) AS BIGINT)
        AS bytes_each
      FROM sized GROUP BY lang, h
    )
    SELECT lang,
      CAST(count(*) AS BIGINT) AS n_groups,
      CAST(sum(n) AS BIGINT) AS n_rows,
      CAST(sum(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT) AS n_dup_rows,
      CAST(sum(n * bytes_each) AS BIGINT) AS bytes_total,
      CAST(sum(CASE WHEN n > 1 THEN (n - 1) * bytes_each ELSE 0 END)
           AS BIGINT) AS bytes_saved,
      round(CAST(sum(CASE WHEN n > 1 THEN (n - 1) * bytes_each ELSE 0 END)
                 AS DOUBLE) / sum(n * bytes_each), 6) AS savings_pct
    FROM groups GROUP BY lang
    """,
)
def dedup_savings_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup STORAGE-SAVINGS report per language: for every
    content-hash group, all rows beyond the canonical one are pure
    storage/compute waste — this query prices that waste in bytes
    and as a fraction of the language's corpus, per language because
    that is how curation budgets are allocated (a 30% dup rate in
    one language's crawl is a seed-list problem, not a global one).
    The business-case twin of dedup_exact: same grouping, but the
    deliverable is the COST REPORT a pipeline owner shows to justify
    running the dedup at all. Identical text has identical length,
    so bytes_each is any_value over the group — exact by
    construction.

    Scale shape: text length and content hash compute in the scan
    projection; lang rides a keyed join to the base-document
    dictionary; ONE (lang, hash) map-side-combined agg, then the
    lang-dictionary rollup. No windows, no sorts."""
    corpus = _dedup_corpus(spark, sf_dir, rebalance=False)
    langd = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").alias("base_id"), "lang"
    )
    sized = corpus.select(
        "doc_id",
        F.length("text").alias("n_bytes"),
        F.md5("text").alias("h"),
        (F.col("doc_id") % 1000000).alias("base_id"),
    ).join(F.broadcast(langd), "base_id")
    groups = sized.groupBy("lang", "h").agg(
        F.count(F.lit(1)).alias("n"),
        F.any_value("n_bytes").cast("long").alias("bytes_each"),
    )
    dup_rows = F.sum(F.when(F.col("n") > 1, F.col("n") - 1).otherwise(0))
    dup_bytes = F.sum(
        F.when(F.col("n") > 1, (F.col("n") - 1) * F.col("bytes_each")).otherwise(0)
    )
    return groups.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("n").cast("long").alias("n_rows"),
        dup_rows.cast("long").alias("n_dup_rows"),
        F.sum(F.col("n") * F.col("bytes_each")).cast("long").alias("bytes_total"),
        dup_bytes.cast("long").alias("bytes_saved"),
        F.round(
            dup_bytes.cast("double")
            / F.sum(F.col("n") * F.col("bytes_each")),
            6,
        ).alias("savings_pct"),
    )


# --------------------------------------------------------------------------
# Quantization retrieval-impact eval (int8 top-k overlap vs float)
# --------------------------------------------------------------------------


def _quant_recall_sql() -> str:
    def rank_pipe(src: str, tag: str) -> str:
        return f"""
    norms_{tag} AS (
      SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM {src} GROUP BY vec_id
    ),
    dots_{tag} AS (
      SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id, sum(q.x * b.x) AS dot
      FROM {src} q JOIN {src} b ON q.dim = b.dim AND q.vec_id <> b.vec_id
      WHERE q.vec_id < 10
      GROUP BY q.vec_id, b.vec_id
    ),
    cos_{tag} AS (
      SELECT d.query_id, d.neighbor_id,
        round(d.dot / (nq.nrm * nb.nrm), 6) AS cosine
      FROM dots_{tag} d
      JOIN norms_{tag} nq ON d.query_id = nq.vec_id
      JOIN norms_{tag} nb ON d.neighbor_id = nb.vec_id
    ),
    top_{tag} AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM cos_{tag}
      ) r WHERE rank <= 5
    )"""

    return f"""
    WITH expl AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
        CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    sc AS (SELECT vec_id, max(abs(x)) / 127 AS s FROM expl GROUP BY vec_id),
    deq AS (
      SELECT e.vec_id, e.dim,
        CASE WHEN sc.s = 0 THEN e.x
          ELSE floor(e.x / sc.s + 0.5) * sc.s END AS x
      FROM expl e JOIN sc ON e.vec_id = sc.vec_id
    ),
    {rank_pipe('expl', 'f')},
    {rank_pipe('deq', 'q')},
    ov AS (
      SELECT f.query_id, count(*) AS n_overlap
      FROM top_f f JOIN top_q q
        ON f.query_id = q.query_id AND f.neighbor_id = q.neighbor_id
      GROUP BY f.query_id
    ),
    qs AS (SELECT DISTINCT query_id FROM top_f)
    SELECT qs.query_id, CAST(coalesce(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
      round(CAST(coalesce(ov.n_overlap, 0) AS DOUBLE) / 5, 6) AS recall_at_5
    FROM qs LEFT JOIN ov ON qs.query_id = ov.query_id
    """


@register("emb_quantization_recall", oracle=_quant_recall_sql())
def emb_quantization_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval impact of int8 quantization: per probe query, the
    overlap between the exact-float top-5 cosine neighbors and the
    top-5 computed over quantize-dequantize int8 vectors (the
    emb_quantize_int8 scheme: per-vector symmetric scale, IEEE-exact
    floor(x/s + 0.5)) — the metric that actually decides whether the
    4x index shrink ships. emb_quantize_int8 pins RECONSTRUCTION
    error, but reconstruction error is not retrieval error: ranking
    only breaks where quantization noise crosses a neighbor GAP, so
    a corpus with tight gaps can lose recall at tiny max_abs_err and
    a spread corpus loses none at large err. Same probe convention
    and rounded-cosine/neighbor-asc tiebreak as ann_bruteforce_topk.

    Scale shape: dequantization is a pure array expression in the
    scan projection (scale = one array_max, no second pass); both
    top-5 sides are the bruteforce probe plan (broadcast-bounded
    query side x corpus, the knn budget); the overlap is a keyed
    join of two <= 5-row-per-query sets."""
    from multiomics_biocypher_kg_spark.operators.simsearch import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    s = F.array_max(F.transform(e, F.abs)) / 127
    deq_arr = F.when(s == 0, e).otherwise(
        F.transform(e, lambda x: F.floor(x.cast("double") / s + 0.5) * s)
    )
    deq = emb.select(
        "vec_id", deq_arr.cast("array<float>").alias("embedding")
    )
    q = emb.where(F.col("vec_id") < 10).select("vec_id")
    top_f = cosine_topk(emb, query_ids=q, k=5).select("query_id", "neighbor_id")
    top_q = cosine_topk(deq, query_ids=q, k=5).select(
        F.col("query_id").alias("q2"), F.col("neighbor_id").alias("n2")
    )
    ov = top_f.join(
        top_q,
        (top_f["query_id"] == top_q["q2"]) & (top_f["neighbor_id"] == top_q["n2"]),
    ).groupBy("query_id").agg(F.count(F.lit(1)).alias("n_overlap"))
    qs = top_f.select("query_id").distinct()
    return qs.join(ov, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long").alias("n_overlap"),
        F.round(
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("double") / 5, 6
        ).alias("recall_at_5"),
    )


# --------------------------------------------------------------------------
# Edit-distance verification of LSH candidates + reciprocal-rank
# fusion of heterogeneous retrievers
# --------------------------------------------------------------------------

_EDIT_PREFIX = 400  # chars; bounds the O(len^2) DP per pair


@register(
    "dedup_edit_verify",
    oracle=f"""
    WITH {MINHASH_PAIRS_CTES},
    corpus AS ({DEDUP_CORPUS_SQL}),
    pref AS (
      SELECT doc_id AS id, substr(text, 1, {_EDIT_PREFIX}) AS pref
      FROM corpus
    ),
    lev_verified AS (
      SELECT c.id_a, c.id_b,
        CAST(levenshtein(a.pref, b.pref) AS INTEGER) AS lev_distance,
        greatest(length(a.pref), length(b.pref)) AS max_len
      FROM cands c
      JOIN pref a ON c.id_a = a.id
      JOIN pref b ON c.id_b = b.id
    )
    SELECT id_a, id_b, lev_distance,
      round(CASE WHEN max_len = 0 THEN 1.0
            ELSE 1.0 - CAST(lev_distance AS DOUBLE) / max_len END, 6)
        AS edit_sim,
      (CASE WHEN max_len = 0 THEN 1.0
       ELSE 1.0 - CAST(lev_distance AS DOUBLE) / max_len END) >= 0.8
        AS is_dup
    FROM lev_verified
    """,
)
def dedup_edit_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level edit-distance verification of the MinHash-LSH
    candidate pairs: normalized Levenshtein similarity
    1 - lev/max(len) over the first {p} chars, is_dup at >= 0.8 —
    the ORDER-SENSITIVE verifier beside the shingle-set Jaccard
    (Jaccard is bag-of-shingles: it cannot tell a reordered
    paraphrase from a near-identical prefix edit; edit distance
    can), and the standard second opinion a dedup pipeline runs
    before destructive collapse. The {p}-char prefix bound is the
    scale contract: Levenshtein is O(len_a x len_b) DP per pair, so
    the cost per candidate is capped at {p}^2 char-ops regardless of
    document length (prefix-truncated edit similarity is itself the
    common production choice — near-dups of web pages almost always
    share their head).

    Scale shape: candidates come from the banded signature equi-join
    (never all-pairs; the same two-corpus-scan budget as
    dedup_minhash_lsh), the prefix table is built by a semi-join to
    candidate ids only, and the quadratic DP runs on candidate PAIRS
    only — both checkpointed intermediates are candidate-sized.
    Levenshtein is exact integer DP (unit costs) in both engines;
    the only float is the final normalized similarity."""
    corpus = _dedup_corpus(spark, sf_dir)
    raw = dd.shingles(corpus, distinct=False)
    cands = dd.lsh_candidate_pairs(dd.minhash_signatures(raw)).localCheckpoint()
    cand_ids = (
        cands.select(F.explode(F.array("id_a", "id_b")).alias("doc_id"))
        .distinct()
    )
    pref = (
        corpus.join(cand_ids, "doc_id", "leftsemi")
        .select(
            F.col("doc_id").alias("id"),
            F.substring("text", 1, _EDIT_PREFIX).alias("pref"),
        )
        .localCheckpoint()
    )
    verified = (
        cands.join(
            pref.select(F.col("id").alias("id_a"), F.col("pref").alias("pref_a")),
            "id_a",
        )
        .join(
            pref.select(F.col("id").alias("id_b"), F.col("pref").alias("pref_b")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.levenshtein("pref_a", "pref_b").cast("int").alias("lev_distance"),
            F.greatest(F.length("pref_a"), F.length("pref_b")).alias("max_len"),
        )
    )
    sim = F.when(F.col("max_len") == 0, F.lit(1.0)).otherwise(
        1.0 - F.col("lev_distance").cast("double") / F.col("max_len")
    )
    return verified.select(
        "id_a",
        "id_b",
        "lev_distance",
        F.round(sim, 6).alias("edit_sim"),
        (sim >= 0.8).alias("is_dup"),
    )


dedup_edit_verify.__doc__ = dedup_edit_verify.__doc__.format(p=_EDIT_PREFIX)


_RRF_K = 60  # the standard RRF damping constant (Cormack et al. 2009)
_RRF_ARM_K = 20  # per-arm candidate depth
_RRF_TOP = 10  # fused neighbors kept per query


@register(
    "emb_rrf_fusion",
    oracle=f"""
    WITH {_pair_cosine_sql('q.vec_id < 10')},
    cos_ranked AS (
      SELECT query_id, neighbor_id,
        CAST(row_number() OVER (PARTITION BY query_id
          ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
      FROM cos
    ),
    cos_top AS (SELECT * FROM cos_ranked WHERE rank <= {_RRF_ARM_K}),
    bits AS (
      SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
             unnest(embedding) AS x
      FROM embeddings
    ),
    codes AS (
      SELECT vec_id,
        CAST(coalesce(sum(CASE WHEN d < 32 AND x > 0
          THEN (1::BIGINT << CAST(d AS INTEGER)) END), 0) AS BIGINT) AS w0,
        CAST(coalesce(sum(CASE WHEN d >= 32 AND x > 0
          THEN (1::BIGINT << CAST(d - 32 AS INTEGER)) END), 0) AS BIGINT) AS w1
      FROM bits GROUP BY vec_id
    ),
    ham_pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        bit_count(xor(q.w0, c.w0)) + bit_count(xor(q.w1, c.w1)) AS hamming
      FROM codes q JOIN codes c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < 10
    ),
    ham_ranked AS (
      SELECT query_id, neighbor_id,
        CAST(row_number() OVER (PARTITION BY query_id
          ORDER BY hamming ASC, neighbor_id ASC) AS INTEGER) AS rank
      FROM ham_pairs
    ),
    ham_top AS (SELECT * FROM ham_ranked WHERE rank <= {_RRF_ARM_K}),
    fused AS (
      SELECT coalesce(c.query_id, h.query_id) AS query_id,
        coalesce(c.neighbor_id, h.neighbor_id) AS neighbor_id,
        CAST(coalesce(c.rank, -1) AS INTEGER) AS rank_cosine,
        CAST(coalesce(h.rank, -1) AS INTEGER) AS rank_hamming,
        (CASE WHEN c.rank IS NULL THEN 0.0
              ELSE 1.0 / ({_RRF_K} + c.rank) END)
        + (CASE WHEN h.rank IS NULL THEN 0.0
                ELSE 1.0 / ({_RRF_K} + h.rank) END) AS rrf
      FROM cos_top c
      FULL OUTER JOIN ham_top h
        ON c.query_id = h.query_id AND c.neighbor_id = h.neighbor_id
    ),
    final_ranked AS (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        ORDER BY round(rrf, 6) DESC, neighbor_id ASC) AS INTEGER)
        AS fused_rank
      FROM fused
    )
    SELECT query_id, neighbor_id, rank_cosine, rank_hamming,
      round(rrf, 6) AS rrf, fused_rank
    FROM final_ranked WHERE fused_rank <= {_RRF_TOP}
    """,
)
def emb_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR 2009) of two
    HETEROGENEOUS retrievers over the same queries: the exact float
    cosine top-{a} and the binarized sign-code Hamming top-{a} —
    rrf = sum over arms of 1/({k} + rank), top-{t} fused neighbors
    per query. RRF is THE standard hybrid-retrieval combiner (score
    scales never compare across arms — cosine in [-1,1] vs integer
    Hamming — but ranks always do), and fusing the cheap binary
    arm with the exact arm is the code-then-rerank stack's quality
    probe: a neighbor high in BOTH lists is robust to quantization.
    A neighbor missing from one arm's top-{a} contributes only its
    other term (rank sentinel -1 in the output).

    Ties in rrf are exact in real arithmetic (permuted rank pairs),
    so the fused order ranks by the ROUNDED score with neighbor-id
    tiebreak — the repo's adamic-adar-regime convention. Scale
    shape: both arms are the bounded broadcast-query probe plan
    (corpus scanned once per arm, queries broadcast, per-query
    top-{a} via partitioned window over <= corpus rows); the fusion
    itself joins two {a}-rows-per-query tables — dictionary-sized
    at any corpus size."""
    from multiomics_biocypher_kg_spark.operators.simsearch import (
        cosine_topk,
        hamming_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 10).select("vec_id")
    cos = cosine_topk(emb, query_ids=q, k=_RRF_ARM_K).select(
        "query_id", "neighbor_id", F.col("rank").alias("rank_c")
    )
    ham = hamming_topk(emb, query_ids=q, k=_RRF_ARM_K, dim=64).select(
        "query_id", "neighbor_id", F.col("rank").alias("rank_h")
    )
    fused = cos.join(ham, ["query_id", "neighbor_id"], "full_outer").select(
        "query_id",
        "neighbor_id",
        F.coalesce(F.col("rank_c"), F.lit(-1)).cast("int").alias("rank_cosine"),
        F.coalesce(F.col("rank_h"), F.lit(-1)).cast("int").alias("rank_hamming"),
        (
            F.when(F.col("rank_c").isNull(), F.lit(0.0)).otherwise(
                1.0 / (F.lit(_RRF_K) + F.col("rank_c"))
            )
            + F.when(F.col("rank_h").isNull(), F.lit(0.0)).otherwise(
                1.0 / (F.lit(_RRF_K) + F.col("rank_h"))
            )
        ).alias("rrf"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("rrf"), 6).desc(), F.col("neighbor_id").asc()
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w).cast("int"))
        .where(F.col("fused_rank") <= _RRF_TOP)
        .select(
            "query_id",
            "neighbor_id",
            "rank_cosine",
            "rank_hamming",
            F.round("rrf", 6).alias("rrf"),
            "fused_rank",
        )
    )


emb_rrf_fusion.__doc__ = emb_rrf_fusion.__doc__.format(
    a=_RRF_ARM_K, k=_RRF_K, t=_RRF_TOP
)


# --------------------------------------------------------------------------
# MMR diversified re-ranking (unrolled greedy selection)
# --------------------------------------------------------------------------

_MMR_LAMBDA = 0.7
_MMR_CANDS = 20
_MMR_K = 5
_MMR_NQ = 5  # queries: vec_id < 5


def _mmr_sql() -> str:
    parts = [
        f"""cand0 AS (
      SELECT query_id, neighbor_id, cosine AS rel,
        row_number() OVER (PARTITION BY query_id
          ORDER BY cosine DESC, neighbor_id ASC) AS rk
      FROM cos
    )""",
        f"ctop AS (SELECT * FROM cand0 WHERE rk <= {_MMR_CANDS})",
        """pairs0 AS (
      SELECT a.query_id, a.neighbor_id AS id_a, b.neighbor_id AS id_b
      FROM ctop a JOIN ctop b ON a.query_id = b.query_id
        AND a.neighbor_id <> b.neighbor_id
    )""",
        """psim AS MATERIALIZED (
      SELECT p.query_id, p.id_a, p.id_b,
        round(sum(x.x * y.x) / (nx.nrm * ny.nrm), 6) AS sim
      FROM pairs0 p
      JOIN exploded x ON x.vec_id = p.id_a
      JOIN exploded y ON y.vec_id = p.id_b AND y.dim = x.dim
      JOIN norms nx ON nx.vec_id = p.id_a
      JOIN norms ny ON ny.vec_id = p.id_b
      GROUP BY p.query_id, p.id_a, p.id_b, nx.nrm, ny.nrm
    )""",
        """keyed_rel AS (
      SELECT *, CAST(round(rel * 1000000, 0) AS BIGINT) AS rel6
      FROM ctop
    )""",
        """selall1 AS MATERIALIZED (
      SELECT query_id, neighbor_id, 1 AS sel_rank, rel,
        7 * rel6 AS mmr_score_e7
      FROM keyed_rel WHERE rk = 1
    )""",
    ]
    for r in range(2, _MMR_K + 1):
        parts.append(
            f"""mx{r} AS (
      SELECT c.query_id, c.neighbor_id, c.rel, c.rel6,
        max(CAST(round(p.sim * 1000000, 0) AS BIGINT)) AS maxsim6
      FROM keyed_rel c
      LEFT JOIN selall{r - 1} s0 ON c.query_id = s0.query_id
        AND c.neighbor_id = s0.neighbor_id
      JOIN psim p ON p.query_id = c.query_id AND p.id_a = c.neighbor_id
      JOIN selall{r - 1} s ON s.query_id = p.query_id
        AND s.neighbor_id = p.id_b
      WHERE s0.neighbor_id IS NULL
      GROUP BY c.query_id, c.neighbor_id, c.rel, c.rel6
    )""",
        )
        parts.append(
            f"""selall{r} AS MATERIALIZED (
      SELECT * FROM selall{r - 1}
      UNION ALL
      SELECT query_id, neighbor_id, {r} AS sel_rank, rel,
        7 * rel6 - 3 * maxsim6 AS mmr_score_e7
      FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY 7 * rel6 - 3 * maxsim6 DESC,
          neighbor_id ASC) AS rn
        FROM mx{r}
      ) WHERE rn = 1
    )""",
        )
    return (
        f"""
    WITH {_pair_cosine_sql(f'q.vec_id < {_MMR_NQ}')},
    """
        + ",\n    ".join(parts)
        + f"""
    SELECT query_id, neighbor_id, CAST(sel_rank AS INTEGER) AS sel_rank,
      rel, CAST(mmr_score_e7 AS BIGINT) AS mmr_score_e7
    FROM selall{_MMR_K}"""
    )


@register("emb_mmr_rerank", oracle=_mmr_sql())
def emb_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance re-ranking (Carbonell & Goldstein
    1998): from each query's top-{c} cosine candidates, greedily
    select {k} results maximizing lambda*rel(d) -
    (1-lambda)*max_sim(d, selected) (lambda={lam}) — THE standard
    diversification step between retrieval and a RAG context window
    (top-k by similarity alone packs near-duplicate passages; MMR
    buys coverage with a bounded relevance cost). Sits on the same
    probe protocol as ann_bruteforce_topk / emb_rrf_fusion.

    Greedy selection is inherently sequential; the scale discipline
    is that each of the {k} unrolled rounds runs ONLY on
    candidate-sized tables: the {c}x{c} pairwise-sim table per
    query is computed once (candidates-first — never corpus
    pairs), each round is a keyed join + a window PARTITIONED by
    query, and every selected-set iterate is checkpointed. The MMR
    arithmetic is EXACT INTEGER: 6dp cosines are lifted to micro
    units (round(x*1e6) — recovers the integer both engines store)
    and lambda=0.7 becomes score_e7 = 7*rel6 - 3*maxsim6, an int64
    with no rounding boundary anywhere (a float 0.7*rel lands
    exactly on the 7th-digit half systematically — the DistMult
    exact-int contract applied to selection); argmax by integer
    score + id tiebreak; the output emits score_e7 itself."""
    from multiomics_biocypher_kg_spark.operators.simsearch import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < _MMR_NQ).select("vec_id")
    ctop = (
        cosine_topk(emb, query_ids=q, k=_MMR_CANDS)
        .select("query_id", "neighbor_id", F.col("cosine").alias("rel"), "rank")
        .localCheckpoint()
    )
    cand_ids = ctop.select(F.col("neighbor_id").alias("vec_id")).distinct()
    cvec = emb.join(cand_ids, "vec_id", "leftsemi").select(
        F.col("vec_id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    from multiomics_biocypher_kg_spark.operators.simsearch import _dot, _norm

    a = ctop.select("query_id", F.col("neighbor_id").alias("id_a"))
    b = ctop.select("query_id", F.col("neighbor_id").alias("id_b"))
    pairs0 = a.join(b, "query_id").where(F.col("id_a") != F.col("id_b"))
    psim = (
        pairs0.join(
            cvec.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va")),
            "id_a",
        )
        .join(
            cvec.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb")),
            "id_b",
        )
        .select(
            "query_id",
            "id_a",
            "id_b",
            F.round(
                _dot(F.col("va"), F.col("vb"))
                / (_norm(F.col("va")) * _norm(F.col("vb"))),
                6,
            ).alias("sim"),
        )
        .localCheckpoint()
    )
    keyed = ctop.withColumn(
        "rel6", F.round(F.col("rel") * 1000000, 0).cast("long")
    )
    sel = (
        keyed.where(F.col("rank") == 1)
        .select(
            "query_id",
            "neighbor_id",
            F.lit(1).alias("sel_rank"),
            "rel",
            (7 * F.col("rel6")).alias("mmr_score_e7"),
        )
        .localCheckpoint()
    )
    from pyspark.sql import Window

    for r in range(2, _MMR_K + 1):
        remaining = keyed.join(
            sel.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"], "left_anti"
        )
        psim_r = psim.select(
            F.col("query_id").alias("pq"), "id_a", "id_b", "sim"
        )
        sel_r = sel.select(
            F.col("query_id").alias("sq"), F.col("neighbor_id").alias("sid")
        )
        mx = (
            remaining.join(
                psim_r,
                (F.col("pq") == F.col("query_id"))
                & (F.col("id_a") == F.col("neighbor_id")),
            )
            .join(
                sel_r,
                (F.col("sq") == F.col("query_id"))
                & (F.col("sid") == F.col("id_b")),
            )
            .groupBy("query_id", "neighbor_id", "rel", "rel6")
            .agg(
                F.max(F.round(F.col("sim") * 1000000, 0).cast("long")).alias(
                    "maxsim6"
                )
            )
        )
        score = 7 * F.col("rel6") - 3 * F.col("maxsim6")
        w = Window.partitionBy("query_id").orderBy(
            score.desc(), F.col("neighbor_id").asc()
        )
        pick = (
            mx.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(
                "query_id",
                "neighbor_id",
                F.lit(r).alias("sel_rank"),
                "rel",
                score.alias("mmr_score_e7"),
            )
        )
        sel = sel.unionByName(pick).localCheckpoint()
    return sel.select(
        "query_id",
        "neighbor_id",
        F.col("sel_rank").cast("int").alias("sel_rank"),
        "rel",
        F.col("mmr_score_e7").cast("long").alias("mmr_score_e7"),
    )


emb_mmr_rerank.__doc__ = emb_mmr_rerank.__doc__.format(
    c=_MMR_CANDS, k=_MMR_K, lam=_MMR_LAMBDA
)


@register(
    "mm_resize_real",
    oracle="""
    WITH b AS (
      SELECT doc_id, text, length(text) AS L FROM documents
      WHERE doc_id % 2 = 0
    ),
    kept AS (
      SELECT doc_id, ch.ch AS ch,
        ord(substr(text,
          ((((2 * r.r) * 8 + (2 * c.c)) * 3 + ch.ch) % L) + 1, 1)) AS v
      FROM b
      CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS r) r
      CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS c) c
      CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS ch) ch
    ),
    agg AS (
      SELECT doc_id,
        CAST(count(*) AS BIGINT) AS n_units,
        sum(v) AS s,
        sum(CASE WHEN ch = 0 THEN v END) AS sr,
        sum(CASE WHEN ch = 1 THEN v END) AS sg,
        sum(CASE WHEN ch = 2 THEN v END) AS sb
      FROM kept GROUP BY doc_id
    )
    SELECT doc_id, CAST(8 AS INTEGER) AS in_width,
      CAST(8 AS INTEGER) AS in_height,
      CAST(4 AS INTEGER) AS out_width, CAST(4 AS INTEGER) AS out_height,
      n_units,
      round(CAST(s AS DOUBLE) / n_units, 6) AS mean_value,
      round(CAST(sr AS DOUBLE) / 16, 6) AS mean_r,
      round(CAST(sg AS DOUBLE) / 16, 6) AS mean_g,
      round(CAST(sb AS DOUBLE) / 16, 6) AS mean_b
    FROM agg
    """,
)
def mm_resize_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize end-to-end: the synthesized binary P6 PPMs
    (mm_decode_real's valid files) go through the mapInPandas
    nearest-neighbor downscale (8x8 -> 4x4, top-left representative
    per 2x2 block), which re-emits a VALID resized PPM payload plus
    per-channel statistics of the resized plane — the thumbnail /
    fixed-resolution-preprocessing step a multimodal training
    pipeline runs between decode and feature extraction. The oracle
    recomputes the kept-pixel statistics straight from the source
    text via the pixel index arithmetic (((2r)*8 + 2c)*3 + ch cycled
    over the text bytes), so a stride, offset, or channel-order bug
    in the real slicing is a hash mismatch — the same
    decode-verified discipline as mm_decode_real, now covering a
    TRANSFORM, not just a parse.

    Scale shape: one mapInPandas pass over the image partition
    (Arrow batches, init-once contract); per-image work is O(out
    pixels); everything else is scan projection. Rounding happens
    engine-side (both engines share the HALF_UP rule)."""
    from multiomics_biocypher_kg_spark.operators.multimodal import (
        attach_real_payloads,
        resize_real_images,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = attach_real_payloads(docs).where(F.col("kind") == "image")
    feats = resize_real_images(media, factor=2)
    return feats.select(
        "doc_id",
        "in_width",
        "in_height",
        "out_width",
        "out_height",
        "n_units",
        F.round("mean_value", 6).alias("mean_value"),
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


# --------------------------------------------------------------------------
# Contrastive triplet mining (anchor, positive, hash negative)
# --------------------------------------------------------------------------


@register(
    "emb_triplet_mine",
    oracle=f"""
    WITH {MINHASH_PAIRS_CTES},
    ndocs AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    trip AS (
      SELECT p.id_a AS anchor_id, p.id_b AS positive_id, p.jaccard,
        {md5_long_sql("CAST(p.id_a AS VARCHAR) || '|' || CAST(p.id_b AS VARCHAR) || '#neg'")}
          % (SELECT n FROM ndocs) AS negative_id
      FROM pairs p
    )
    SELECT t.anchor_id, t.positive_id, CAST(t.negative_id AS BIGINT)
        AS negative_id,
      t.jaccard,
      (t.negative_id = t.anchor_id % 1000000
       OR t.negative_id = t.positive_id % 1000000
       OR EXISTS (
         SELECT 1 FROM pairs q
         WHERE (q.id_a = least(t.anchor_id, t.negative_id)
                AND q.id_b = greatest(t.anchor_id, t.negative_id))
            OR (q.id_a = least(t.positive_id, t.negative_id)
                AND q.id_b = greatest(t.positive_id, t.negative_id))
       )) AS neg_is_suspect
    FROM trip t
    """,
)
def emb_triplet_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive TRIPLET mining for embedding training (the
    SimCSE/sentence-transformers data shape): every verified
    near-duplicate pair becomes (anchor, positive), and the negative
    is a hash-drawn corpus document — the in-batch-negatives recipe
    made deterministic and resumable. The column that matters
    operationally is `neg_is_suspect`: a random negative can
    accidentally be the anchor's own duplicate (the FALSE NEGATIVE
    that poisons a contrastive loss), so each draw is checked
    against the identity classes (modulo the synthetic-id offset)
    and the verified near-dup pair set — flagged, not silently
    shipped; the training job drops or redraws flagged rows.

    Scale shape: positives ride the existing two-scan MinHash-LSH
    candidates-first path; the negative draw is one hash in the
    projection against the 1-row corpus-count dim; the suspect check
    is a left join of the (tiny) triplet table back onto the (tiny)
    verified-pair table — no new corpus pass anywhere."""
    corpus = _dedup_corpus(spark, sf_dir)
    pairs = dd.minhash_neardup_pairs(corpus, 0.5).localCheckpoint()
    ndocs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    trip = pairs.crossJoin(F.broadcast(ndocs)).select(
        F.col("id_a").alias("anchor_id"),
        F.col("id_b").alias("positive_id"),
        "jaccard",
        (
            md5_long(
                F.concat(
                    F.col("id_a").cast("string"),
                    F.lit("|"),
                    F.col("id_b").cast("string"),
                    F.lit("#neg"),
                )
            )
            % F.col("n")
        ).alias("negative_id"),
    )
    pk = pairs.select(
        F.col("id_a").alias("pa"), F.col("id_b").alias("pb")
    ).localCheckpoint()
    an = (F.least(F.col("anchor_id"), F.col("negative_id")),
          F.greatest(F.col("anchor_id"), F.col("negative_id")))
    pn = (F.least(F.col("positive_id"), F.col("negative_id")),
          F.greatest(F.col("positive_id"), F.col("negative_id")))
    with_an = trip.join(
        F.broadcast(pk.select(F.col("pa").alias("an_a"), F.col("pb").alias("an_b"))),
        (an[0] == F.col("an_a")) & (an[1] == F.col("an_b")),
        "left",
    )
    with_pn = with_an.join(
        F.broadcast(pk.select(F.col("pa").alias("pn_a"), F.col("pb").alias("pn_b"))),
        (pn[0] == F.col("pn_a")) & (pn[1] == F.col("pn_b")),
        "left",
    )
    suspect = (
        (F.col("negative_id") == F.col("anchor_id") % 1000000)
        | (F.col("negative_id") == F.col("positive_id") % 1000000)
        | F.col("an_a").isNotNull()
        | F.col("pn_a").isNotNull()
    )
    return with_pn.select(
        "anchor_id",
        "positive_id",
        F.col("negative_id").cast("long").alias("negative_id"),
        "jaccard",
        suspect.alias("neg_is_suspect"),
    )
