"""Round-4 mining batch: Fellegi–Sunter record-linkage scoring,
winnowing (MOSS) fingerprint pairs, SimRank structural similarity,
RAKE corpus keywords, per-label embedding outliers, and the exact
bounded-h neighborhood function.

These extend the curation stack along the axes the earlier batches
opened: probabilistic entity resolution on top of the boolean
blocking profile (kg_blocking_keys), LOCAL-overlap dedup on top of
whole-document MinHash (a copied paragraph in an otherwise-unrelated
page), link-structure similarity beyond common-neighbor counting
(Adamic–Adar -> SimRank's recursive definition), corpus keyword
mining for KG predicate/vocabulary bootstrap, the mislabeled-example
audit over embedding space, and the exact small-graph complement of
the HLL neighborhood sketches.

All six are oracle-paired. Registered after the round-4
driver-window freeze — INTENTIONALLY deferred to the round-5 window,
local-sweep-verified this round (the registry.py NOTE lists them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.functions.hashing import md5_long, md5_long_sql
from multiomics_biocypher_kg_spark.functions.textstats import STOPWORDS
from multiomics_biocypher_kg_spark.oracle_fragments import (
    DEDUP_CORPUS_SQL,
    TOKENS_SQL,
)
from multiomics_biocypher_kg_spark.registry import register
from multiomics_biocypher_kg_spark.registry_web import _HOST_GRAPH_SQL
from multiomics_biocypher_kg_spark.sources.pages import pages_from_documents


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _host_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from multiomics_biocypher_kg_spark.operators.linkgraph import (
        host_graph,
        href_edges,
    )

    return host_graph(href_edges(pages_from_documents(spark, sf_dir))).select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )


# ---------------------------------------------------------------------------
# Fellegi–Sunter record-linkage scoring
# ---------------------------------------------------------------------------

_FS_M = 0.9
_FS_FIELDS = ("lang", "source", "char_bucket")


def _fs_oracle_sql() -> str:
    us = ", ".join(
        f"""u_{f} AS (
      SELECT sum(c * c) / (sum(c) * sum(c)) AS u FROM
        (SELECT CAST(count(*) AS DOUBLE) AS c FROM d GROUP BY {f})
    )"""
        for f in _FS_FIELDS
    )
    weights = " + ".join(
        f"CASE WHEN a.{f} = b.{f} THEN log2({_FS_M} / u_{f}.u) "
        f"ELSE log2({1.0 - _FS_M} / (1 - u_{f}.u)) END"
        for f in _FS_FIELDS
    )
    agrees = ", ".join(
        f"CAST(CASE WHEN a.{f} = b.{f} THEN 1 ELSE 0 END AS INTEGER) AS agree_{f}"
        for f in _FS_FIELDS
    )
    return f"""
    WITH t AS (SELECT doc_id, lang, source,
        CAST(floor(n_chars / 50.0) AS BIGINT) AS char_bucket,
        string_split(text, ' ') AS arr FROM documents),
    d AS (SELECT doc_id, lang, source, char_bucket,
        arr[1] || '|' || CAST(CAST(floor(len(arr) / 8.0) AS BIGINT) AS VARCHAR)
          AS block_key FROM t),
    {us},
    scored AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, {agrees},
        ({weights}) AS raw
      FROM d a JOIN d b ON a.block_key = b.block_key AND a.doc_id < b.doc_id
      CROSS JOIN u_lang CROSS JOIN u_source CROSS JOIN u_char_bucket
    )
    SELECT doc_a, doc_b, agree_lang, agree_source, agree_char_bucket,
      round(raw, 6) AS score,
      CAST(CASE WHEN raw >= 0 THEN 1 ELSE 0 END AS INTEGER) AS is_match
    FROM scored
    """


@register("kg_fellegi_sunter", oracle=_fs_oracle_sql())
def kg_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter probabilistic record linkage over blocked
    candidate pairs (operators.mining.fellegi_sunter_pairs): per-field
    log-likelihood agreement weights with data-estimated
    u-probabilities (chance agreement = sum of squared value
    frequencies — one vocabulary-sized aggregate per field, broadcast
    into the scorer) and fixed m = 0.9 priors. Candidates come only
    from the block-key self-equi-join (the kg_blocking_keys profile
    bounds its cost); no all-pairs stage. The reference's analog is
    the exact-key resolve_row cascade (multiomics_kg/utils.py) — FS
    scoring is its dirty-data generalization."""
    from multiomics_biocypher_kg_spark.operators.mining import (
        fellegi_sunter_pairs,
    )

    arr = F.split("text", " ")
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        "lang",
        "source",
        F.floor(F.col("n_chars") / 50.0).cast("long").alias("char_bucket"),
        F.concat(
            F.element_at(arr, 1),
            F.lit("|"),
            F.floor(F.size(arr) / 8.0).cast("long").cast("string"),
        ).alias("block_key"),
    )
    return fellegi_sunter_pairs(docs, fields=_FS_FIELDS, m=_FS_M)


# ---------------------------------------------------------------------------
# Winnowing (MOSS) fingerprint pairs
# ---------------------------------------------------------------------------

_WIN_K = 3
_WIN_W = 4
_WIN_MAX_DF = 50
_WIN_MIN_SHARED = 2


def _winnowing_oracle_sql() -> str:
    gram = md5_long_sql("token || ' ' || t1 || ' ' || t2")
    return f"""
    WITH corpus AS ({DEDUP_CORPUS_SQL}),
    toks AS (SELECT doc_id,
        CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INTEGER) AS pos,
        unnest(string_split(text, ' ')) AS token
      FROM corpus),
    led AS (SELECT doc_id, pos, token,
        lead(token, 1) OVER w AS t1, lead(token, 2) OVER w AS t2
      FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
    grams AS (SELECT doc_id, pos, {gram} AS h
      FROM led WHERE t2 IS NOT NULL),
    winmin AS (SELECT doc_id,
        min(h) OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN {_WIN_W - 1} PRECEDING AND CURRENT ROW) AS fp,
        row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
      FROM grams),
    fps AS (SELECT DISTINCT doc_id, fp FROM winmin WHERE rn >= {_WIN_W}),
    rare AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= {_WIN_MAX_DF}),
    keep AS (SELECT f.doc_id, f.fp FROM fps f JOIN rare USING (fp))
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
    FROM keep a JOIN keep b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING count(*) >= {_WIN_MIN_SHARED}
    """


@register("dedup_winnowing", oracle=_winnowing_oracle_sql())
def dedup_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint near-dup pairs (operators.mining): the
    MOSS local fingerprinting guarantee (any shared run of
    >= w+k-1 tokens is caught) on the shared dedup corpus — the
    LOCAL-overlap complement to whole-document MinHash
    (dedup_minhash_lsh). Two per-doc window passes select the
    fingerprints; the pair stage is a fingerprint equi-join with a
    document-frequency cap dropping boilerplate fingerprints first
    (the same hot-key guard as the co-mention fanout cap)."""
    from multiomics_biocypher_kg_spark.operators.mining import (
        winnowing_fingerprints,
        winnowing_pairs,
    )
    from multiomics_biocypher_kg_spark.registry_dedup_text import _dedup_corpus

    fps = winnowing_fingerprints(
        _dedup_corpus(spark, sf_dir), k=_WIN_K, w=_WIN_W
    )
    return winnowing_pairs(fps, min_shared=_WIN_MIN_SHARED, max_df=_WIN_MAX_DF)


# ---------------------------------------------------------------------------
# SimRank over the host graph
# ---------------------------------------------------------------------------

_SR_C = 0.8
_SR_ITERS = 2


def _simrank_oracle_sql() -> str:
    return f"""
    WITH hg AS MATERIALIZED (
      SELECT src_host AS src, dst_host AS dst FROM ({_HOST_GRAPH_SQL})),
    e AS MATERIALIZED (SELECT DISTINCT src, dst FROM hg),
    indeg AS MATERIALIZED (SELECT dst, count(*) AS n_in FROM e GROUP BY dst),
    common AS MATERIALIZED (
      SELECT x.dst AS a, y.dst AS b, count(*) AS n_common
      FROM e x JOIN e y ON x.src = y.src AND x.dst < y.dst
      GROUP BY 1, 2),
    s1 AS MATERIALIZED (
      SELECT c.a, c.b,
        {_SR_C} * c.n_common / (ia.n_in * ib.n_in) AS sim
      FROM common c
      JOIN indeg ia ON c.a = ia.dst JOIN indeg ib ON c.b = ib.dst),
    prior AS (SELECT a, b, sim FROM s1
              UNION ALL SELECT b, a, sim FROM s1),
    contrib AS MATERIALIZED (
      SELECT ea.dst AS a, eb.dst AS b, sum(p.sim) AS contrib
      FROM prior p
      JOIN e ea ON p.a = ea.src JOIN e eb ON p.b = eb.src
      WHERE ea.dst < eb.dst GROUP BY 1, 2),
    s2 AS (
      SELECT coalesce(co.a, cm.a) AS a, coalesce(co.b, cm.b) AS b,
        {_SR_C} * (coalesce(co.contrib, 0) + coalesce(cm.n_common, 0))
          / (ia.n_in * ib.n_in) AS sim
      FROM contrib co FULL OUTER JOIN common cm
        ON co.a = cm.a AND co.b = cm.b
      JOIN indeg ia ON coalesce(co.a, cm.a) = ia.dst
      JOIN indeg ib ON coalesce(co.b, cm.b) = ib.dst)
    SELECT a AS node_a, b AS node_b, round(sim, 6) AS sim
    FROM s2 WHERE sim > 0
    """


@register("web_simrank", oracle=_simrank_oracle_sql())
def web_simrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimRank structural similarity over the host link graph
    (operators.graphstats.simrank, 2 iterations, C = 0.8): two hosts
    are similar when similar hosts link to them — the recursive
    upgrade to Adamic–Adar's one-hop common-neighbor counting, used
    for mirror detection and crawl-seed diversification. Pair state
    stays sparse (only pairs with connected in-neighborhoods); runs
    on the HOST graph by design — page-level structural similarity
    at 10^12 docs is the MinHash family's job."""
    from multiomics_biocypher_kg_spark.operators.graphstats import simrank

    return simrank(_host_edges(spark, sf_dir), iters=_SR_ITERS, c=_SR_C)


# ---------------------------------------------------------------------------
# RAKE corpus keywords
# ---------------------------------------------------------------------------

_RAKE_TOP = 20
_RAKE_STOPS = STOPWORDS["en"]


def _rake_oracle_sql() -> str:
    stops = ", ".join(f"'{s}'" for s in _RAKE_STOPS)
    return f"""
    WITH toks AS (SELECT doc_id, pos, lower(token) AS tok FROM ({TOKENS_SQL})),
    content AS (SELECT * FROM toks
      WHERE regexp_matches(tok, '^[a-z]+$') AND tok NOT IN ({stops})),
    words AS (SELECT doc_id, pos, tok,
        pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
      FROM content),
    phr AS (SELECT doc_id, isl,
        string_agg(tok, ' ' ORDER BY pos) AS phrase, count(*) AS plen
      FROM words GROUP BY 1, 2),
    occ AS (SELECT w.doc_id, w.isl, w.tok, p.plen
      FROM words w JOIN phr p USING (doc_id, isl)),
    wstat AS (SELECT tok, count(*) AS freq, sum(plen) AS deg
      FROM occ GROUP BY tok),
    pscore AS (SELECT o.doc_id, o.isl,
        sum(CAST(ws.deg AS DOUBLE) / ws.freq) AS score
      FROM occ o JOIN wstat ws USING (tok) GROUP BY 1, 2),
    ps AS (SELECT p.phrase, s.score
      FROM pscore s JOIN phr p USING (doc_id, isl)),
    agg AS (SELECT phrase, count(*) AS n_occurrences,
        round(max(score), 6) AS score FROM ps GROUP BY phrase)
    SELECT phrase, n_occurrences, score FROM agg
    ORDER BY score DESC, phrase LIMIT {_RAKE_TOP}
    """


@register("text_rake_keywords", oracle=_rake_oracle_sql())
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE corpus keywords (operators.mining.rake_keywords): phrases
    split at stopword/non-word boundaries (gaps-and-islands over the
    per-doc position window), word score = degree/frequency from one
    vocabulary-sized aggregate, phrase score = sum of member scores,
    top-20 via TakeOrderedAndProject. Ordered by the ROUNDED score:
    RAKE scores are sums of shared rational deg/freq terms, so 6dp
    ties are exact ties in real arithmetic and the unrounded float
    carries summation-order ulp noise (the adamic-adar tie regime,
    not the tf-idf one)."""
    from multiomics_biocypher_kg_spark.operators.mining import rake_keywords

    return rake_keywords(_docs(spark, sf_dir), list(_RAKE_STOPS), top_n=_RAKE_TOP)


# ---------------------------------------------------------------------------
# Per-label embedding outliers
# ---------------------------------------------------------------------------


def _outlier_oracle_sql() -> str:
    return """
    WITH ex AS (SELECT vec_id, label,
        CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS dim,
        CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings),
    cent AS (SELECT label, dim, avg(x) AS m FROM ex GROUP BY 1, 2),
    d AS (SELECT e.vec_id, e.label,
        sqrt(sum((e.x - c.m) * (e.x - c.m))) AS dist
      FROM ex e JOIN cent c USING (label, dim) GROUP BY 1, 2),
    st AS (SELECT label, avg(dist) AS mu, stddev_samp(dist) AS sd
      FROM d GROUP BY label)
    SELECT d.vec_id, d.label, round(d.dist, 6) AS dist,
      CAST(CASE WHEN d.dist > st.mu + 2 * st.sd THEN 1 ELSE 0 END
        AS INTEGER) AS is_outlier
    FROM d JOIN st USING (label)
    """


@register("emb_label_outliers", oracle=_outlier_oracle_sql())
def emb_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding outliers (operators.simsearch.label_outliers):
    distance to the label centroid, flagged beyond mean + 2 sigma
    within the label — the mislabeled-example / embedding-drift audit
    before a fine-tune batch ships. Centroids are a |labels| x dim
    aggregate broadcast back onto the exploded stream; per-label
    stats are a second tiny broadcast. Zero Python, two corpus
    passes."""
    from multiomics_biocypher_kg_spark.operators.simsearch import label_outliers

    return label_outliers(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"), z=2.0
    )


# ---------------------------------------------------------------------------
# Exact bounded-h neighborhood function
# ---------------------------------------------------------------------------

_HOP_H = 3


def _hop_oracle_sql(max_h: int = _HOP_H) -> str:
    parts = [
        f"hg AS MATERIALIZED (SELECT src_host AS src, dst_host AS dst FROM ({_HOST_GRAPH_SQL}))",
        "e AS MATERIALIZED (SELECT DISTINCT src, dst FROM hg WHERE src <> dst)",
        "r1 AS MATERIALIZED (SELECT src, dst FROM e)",
    ]
    for h in range(2, max_h + 1):
        parts.append(
            f"""r{h} AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
          SELECT src, dst FROM r{h - 1}
          UNION ALL
          SELECT r.src, e.dst FROM r{h - 1} r JOIN e ON r.dst = e.src
          WHERE r.src <> e.dst))"""
        )
    joins = " ".join(
        f"JOIN (SELECT src, count(*) AS n{h} FROM r{h} GROUP BY src) c{h} USING (src)"
        for h in range(2, max_h + 1)
    )
    cols = ", ".join(f"n{h}" for h in range(1, max_h + 1))
    return (
        "WITH " + ",\n".join(parts)
        + f"""
    SELECT src AS node, {cols}
    FROM (SELECT src, count(*) AS n1 FROM r1 GROUP BY src) c1 {joins}"""
    )


@register("web_hop_neighborhood", oracle=_hop_oracle_sql())
def web_hop_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact bounded-h neighborhood function |N_<=h(v)|, h = 1..3,
    over the host graph (operators.graphstats.hop_neighborhoods):
    iterated distinct frontier joins, self excluded — the crawl-
    frontier capacity / influence-radius profile per host. Exact
    counting is the bounded-graph complement of the HLL sketches
    (text_hll_host_cardinality): at page scale the same question is
    HyperANF, probabilistic by necessity. Nodes with no out-edges
    have an empty neighborhood and are omitted (both engines)."""
    from multiomics_biocypher_kg_spark.operators.graphstats import (
        hop_neighborhoods,
    )

    return hop_neighborhoods(_host_edges(spark, sf_dir), max_h=_HOP_H)


# ---------------------------------------------------------------------------
# HyperANF-style probabilistic neighborhood function
# ---------------------------------------------------------------------------

_ANF_K = 16
_ANF_R = 1_000_003
_ANF_H = 3


def _hyperanf_oracle_sql(max_h: int = _ANF_H, k: int = _ANF_K) -> str:
    self_hash = md5_long_sql("node || '#anf' || CAST(r AS VARCHAR)")
    parts = [
        f"hg AS MATERIALIZED (SELECT src_host AS src, dst_host AS dst FROM ({_HOST_GRAPH_SQL}))",
        "e AS MATERIALIZED (SELECT DISTINCT src, dst FROM hg)",
        (
            "nodes AS MATERIALIZED (SELECT DISTINCT node FROM "
            "(SELECT src AS node FROM e UNION ALL SELECT dst FROM e))"
        ),
        (
            f"m0 AS MATERIALIZED (SELECT node, r, {self_hash} % {_ANF_R} AS m "
            f"FROM nodes CROSS JOIN (SELECT unnest(generate_series(0, {k - 1})) AS r))"
        ),
        "ens AS MATERIALIZED (SELECT src, dst FROM e WHERE src <> dst)",
        "r1 AS MATERIALIZED (SELECT src, dst FROM ens)",
    ]
    for h in range(1, max_h + 1):
        parts.append(
            f"""m{h} AS MATERIALIZED (SELECT node, r, min(m) AS m FROM (
          SELECT node, r, m FROM m{h - 1}
          UNION ALL
          SELECT e.src AS node, s.r, s.m FROM e JOIN m{h - 1} s ON e.dst = s.node
        ) GROUP BY node, r)"""
        )
        if h >= 2:
            parts.append(
                f"""r{h} AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
          SELECT src, dst FROM r{h - 1}
          UNION ALL
          SELECT r.src, e.dst FROM r{h - 1} r JOIN ens e ON r.dst = e.src
          WHERE r.src <> e.dst))"""
            )
    legs = []
    for h in range(1, max_h + 1):
        est = f"{float(k - 1)} * {_ANF_R} / greatest(s.s, 1) - 1"
        legs.append(
            f"""SELECT s.node, CAST({h} AS INTEGER) AS h,
        CAST(1 + coalesce(c.n, 0) AS BIGINT) AS n_exact,
        round({est}, 6) AS n_est,
        round(abs(({est}) - (1 + coalesce(c.n, 0))) / (1 + coalesce(c.n, 0)), 6)
          AS rel_err
      FROM (SELECT node, sum(m) AS s FROM m{h} GROUP BY node) s
      LEFT JOIN (SELECT src, count(*) AS n FROM r{h} GROUP BY src) c
        ON s.node = c.src"""
        )
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(legs)


@register("web_hyperanf", oracle=_hyperanf_oracle_sql())
def web_hyperanf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperANF-style neighborhood-function sketch over the host graph
    (operators.graphstats.hyperanf_estimates): K = 16 min-of-hash
    registers per node advanced by one keyed join + one min-groupBy
    per radius — state K longs per node, reach-sets never
    materialized. This IS the 10^12-node path the exact
    web_hop_neighborhood contract points to (Boldi-Rosa-Vigna,
    WWW'11); min() combines map-side, so each radius is one shuffle
    of the K x |V| register table. The exact ball size rides along
    on the bounded host graph so the estimator error is pinned per
    (node, radius), the text_hll_host_cardinality discipline."""
    from multiomics_biocypher_kg_spark.operators.graphstats import (
        hyperanf_estimates,
    )

    return hyperanf_estimates(
        _host_edges(spark, sf_dir), max_h=_ANF_H, k_trials=_ANF_K, modulus=_ANF_R
    )


# ---------------------------------------------------------------------------
# k-anonymity / l-diversity audit
# ---------------------------------------------------------------------------

_KANON_K = 5
_KANON_L = 2


@register(
    "data_k_anonymity",
    oracle=f"""
    WITH cls AS (
      SELECT source, CAST(floor(n_chars / 100.0) AS BIGINT) AS char_bucket,
        count(*) AS class_size, count(DISTINCT lang) AS n_sensitive
      FROM documents GROUP BY 1, 2
    )
    SELECT source, char_bucket, class_size, n_sensitive,
      CAST(CASE WHEN class_size >= {_KANON_K} THEN 1 ELSE 0 END AS INTEGER)
        AS k_anonymous,
      CAST(CASE WHEN n_sensitive >= {_KANON_L} THEN 1 ELSE 0 END AS INTEGER)
        AS l_diverse
    FROM cls
    """,
)
def data_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit over the release
    quasi-identifiers (source, length bucket) with language as the
    sensitive attribute stand-in — the privacy gate that complements
    the PII regex scrub (text_pii_scrub removes identifiers; this
    measures whether the remaining metadata still isolates
    individuals into classes smaller than k, Sweeney's re-
    identification model). One groupBy over scan-projected keys,
    count + count(DISTINCT) sharing the shuffle under partial
    aggregation; the class table is dictionary-sized. Flags are per
    equivalence class: k_anonymous (size >= {_KANON_K}), l_diverse
    (>= {_KANON_L} sensitive values)."""
    docs = _docs(spark, sf_dir).select(
        "source",
        F.floor(F.col("n_chars") / 100.0).cast("long").alias("char_bucket"),
        "lang",
    )
    cls = docs.groupBy("source", "char_bucket").agg(
        F.count(F.lit(1)).alias("class_size"),
        F.countDistinct("lang").alias("n_sensitive"),
    )
    return cls.select(
        "source",
        "char_bucket",
        "class_size",
        "n_sensitive",
        (F.col("class_size") >= _KANON_K).cast("int").alias("k_anonymous"),
        (F.col("n_sensitive") >= _KANON_L).cast("int").alias("l_diverse"),
    )


# ---------------------------------------------------------------------------
# Leakage-safe (cluster-consistent) train/val/test split
# ---------------------------------------------------------------------------


def _split_by_cluster_oracle_sql() -> str:
    from multiomics_biocypher_kg_spark.oracle_fragments import (
        MINHASH_PAIRS_CTES,
    )

    canon_hash = md5_long_sql("CAST(canonical AS VARCHAR) || '#split'")
    return f"""
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
    alldocs AS (SELECT doc_id FROM ({DEDUP_CORPUS_SQL})),
    canon AS (
      SELECT d.doc_id, coalesce(m.component, d.doc_id) AS canonical
      FROM alldocs d LEFT JOIN comp m ON d.doc_id = m.node
    ),
    splits AS (
      SELECT doc_id, canonical,
        CASE WHEN {canon_hash} % 100 < 90 THEN 'train'
             WHEN {canon_hash} % 100 < 95 THEN 'val'
             ELSE 'test' END AS split
      FROM canon
    ),
    leak AS (
      SELECT count(*) AS n FROM pairs p
      JOIN splits a ON p.id_a = a.doc_id
      JOIN splits b ON p.id_b = b.doc_id
      WHERE a.split <> b.split
    ),
    tot AS (SELECT count(*) AS n_all FROM splits)
    SELECT split, count(*) AS n_docs,
      count(DISTINCT canonical) AS n_clusters,
      round(CAST(count(*) AS DOUBLE) / tot.n_all, 6) AS frac,
      CAST(leak.n AS BIGINT) AS n_leaking_pairs
    FROM splits CROSS JOIN tot CROSS JOIN leak
    GROUP BY split, tot.n_all, leak.n
    """


@register("data_split_by_cluster", oracle=_split_by_cluster_oracle_sql())
def data_split_by_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-SAFE train/val/test split: the split hash keys on the
    near-dup CLUSTER representative (MinHash-LSH pairs -> pointer-jump
    CC -> min doc id), not the document — every member of a near-dup
    cluster lands in the same split by construction, closing the
    exact hole data_split_leakage audits (a train/test near-dup pair
    IS leaked benchmark data; this op makes such pairs impossible).
    Singletons key on their own id, so the assignment stays stable as
    the corpus grows. The n_leaking_pairs column re-verifies the
    zero-leakage guarantee value-gated through both engines (must be
    0 on every row). Costs: the dedup pipeline the curation job
    already runs + one dictionary-sized component join + one groupBy."""
    from multiomics_biocypher_kg_spark.operators import dedup as dd
    from multiomics_biocypher_kg_spark.operators.canonicalize import (
        connected_components,
    )
    from multiomics_biocypher_kg_spark.registry_dedup_text import _dedup_corpus

    corpus = _dedup_corpus(spark, sf_dir)
    pairs = dd.minhash_neardup_pairs(corpus, 0.5).select("id_a", "id_b")
    comp = connected_components(pairs, src="id_a", dst="id_b").select(
        F.col("node").alias("doc_id"), "component"
    )
    canon = corpus.select("doc_id").join(comp, "doc_id", "left").select(
        "doc_id", F.coalesce("component", "doc_id").alias("canonical")
    )
    h = (
        md5_long(F.concat(F.col("canonical").cast("string"), F.lit("#split")))
        % 100
    )
    splits = canon.select(
        "doc_id",
        "canonical",
        F.when(h < 90, F.lit("train"))
        .when(h < 95, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    leak = (
        pairs.join(
            splits.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa")),
            "id_a",
        )
        .join(
            splits.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb")),
            "id_b",
        )
        .where(F.col("sa") != F.col("sb"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = splits.agg(F.count(F.lit(1)).alias("n_all"))
    return (
        splits.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("canonical").alias("n_clusters"),
        )
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(leak))
        .select(
            "split",
            "n_docs",
            "n_clusters",
            F.round(F.col("n_docs").cast("double") / F.col("n_all"), 6).alias(
                "frac"
            ),
            F.col("n").cast("long").alias("n_leaking_pairs"),
        )
    )


# ---------------------------------------------------------------------------
# Weisfeiler–Leman structural roles over the host graph
# ---------------------------------------------------------------------------

_WL_ITERS = 2


def _wl_oracle_sql(iters: int = _WL_ITERS) -> str:
    parts = [
        f"hg AS MATERIALIZED (SELECT src_host AS src, dst_host AS dst FROM ({_HOST_GRAPH_SQL}))",
        "e AS MATERIALIZED (SELECT DISTINCT src, dst FROM hg)",
        (
            "nodes AS MATERIALIZED (SELECT DISTINCT node FROM "
            "(SELECT src AS node FROM e UNION ALL SELECT dst FROM e))"
        ),
        "c0 AS MATERIALIZED (SELECT node, 'x' AS color FROM nodes)",
    ]
    for k in range(1, iters + 1):
        p = f"c{k - 1}"
        parts += [
            (
                f"inn{k} AS MATERIALIZED (SELECT e.dst AS node, "
                f"string_agg(c.color, ',' ORDER BY c.color) AS in_sig "
                f"FROM e JOIN {p} c ON e.src = c.node GROUP BY e.dst)"
            ),
            (
                f"outn{k} AS MATERIALIZED (SELECT e.src AS node, "
                f"string_agg(c.color, ',' ORDER BY c.color) AS out_sig "
                f"FROM e JOIN {p} c ON e.dst = c.node GROUP BY e.src)"
            ),
            (
                f"c{k} AS MATERIALIZED (SELECT c.node, "
                f"substr(md5(c.color || '|i:' || coalesce(i.in_sig, '') "
                f"|| '|o:' || coalesce(o.out_sig, '')), 1, 8) AS color "
                f"FROM {p} c LEFT JOIN inn{k} i ON c.node = i.node "
                f"LEFT JOIN outn{k} o ON c.node = o.node)"
            ),
        ]
    return (
        "WITH " + ",\n".join(parts)
        + f"""
    SELECT node, color AS role,
      CAST(count(*) OVER (PARTITION BY color) AS BIGINT) AS role_size
    FROM c{iters}"""
    )


@register("web_wl_roles", oracle=_wl_oracle_sql())
def web_wl_roles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-WL color-refinement structural roles over the host graph
    (operators.graphstats.wl_roles, 2 rounds): nodes sharing a color
    after k rounds are 1-WL-indistinguishable in their k-hop rooted
    structure — template/mirror link farms collapse into one role
    while organic hosts spread out (the structural complement to
    content-based web_mirror_hosts and the community/k-core spam
    signals). Per round: two neighbor-color joins + two degree-
    bounded collect_list aggs + a hash projection; state is one
    8-hex color per node. The sorted-multiset signature uses
    byte-lexicographic ordering of hex strings — identical in both
    engines."""
    from multiomics_biocypher_kg_spark.operators.graphstats import wl_roles

    return wl_roles(_host_edges(spark, sf_dir), iters=_WL_ITERS)
