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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.functions.hashing import md5_long, md5_long_sql
from multiomics_biocypher_kg_spark.functions.textstats import STOPWORDS
from multiomics_biocypher_kg_spark.oracle_fragments import (
    DEDUP_CORPUS_SQL,
    TOKENS_SQL,
)
from multiomics_biocypher_kg_spark.registry import register
from multiomics_biocypher_kg_spark.registry_web import _HOST_GRAPH_SQL
from multiomics_biocypher_kg_spark.operators.linkgraph import host_graph, href_edges
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
    # two consumers (the CC pass and the leakage audit join): truncate
    # once so the shingle->minhash->band LSH pipeline runs a single time.
    pairs = (
        dd.minhash_neardup_pairs(corpus, 0.5)
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)
    )
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


# ---------------------------------------------------------------------------
# Random-projection (JL) distortion audit
# ---------------------------------------------------------------------------

_JL_OUT_DIM = 16
_JL_SAMPLE_MOD = 10


def _jl_oracle_sql() -> str:
    sign = (
        "(1 - 2 * ("
        + md5_long_sql("'jl|' || CAST(i AS VARCHAR) || '|' || CAST(j AS VARCHAR)")
        + " % 2))"
    )
    return f"""
    WITH sampled AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings WHERE vec_id % {_JL_SAMPLE_MOD} = 0
    ),
    ex AS (SELECT vec_id,
        CAST(generate_subscripts(e, 1) - 1 AS INTEGER) AS i, unnest(e) AS x
      FROM sampled),
    proj AS (
      SELECT vec_id, j, sum(x * {sign}) / sqrt({_JL_OUT_DIM}.0) AS y
      FROM ex CROSS JOIN
        (SELECT unnest(generate_series(0, {_JL_OUT_DIM - 1})) AS j)
      GROUP BY vec_id, j
    ),
    d_orig AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        sqrt(sum((a.x - b.x) * (a.x - b.x))) AS d_orig
      FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < b.vec_id
      GROUP BY 1, 2
    ),
    d_proj AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        sqrt(sum((a.y - b.y) * (a.y - b.y))) AS d_proj
      FROM proj a JOIN proj b ON a.j = b.j AND a.vec_id < b.vec_id
      GROUP BY 1, 2
    )
    SELECT vec_a, vec_b, round(d_orig, 6) AS d_orig,
      round(d_proj, 6) AS d_proj,
      round(d_proj / d_orig, 6) AS distortion
    FROM d_orig JOIN d_proj USING (vec_a, vec_b)
    """


@register("emb_random_projection", oracle=_jl_oracle_sql())
def emb_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss sign-matrix projection (64 -> 16 dims)
    with the empirical distortion audit on a deterministic hash
    sample (operators.simsearch.random_projection /
    jl_distortion_pairs): the projection matrix is a pure MD5-sign
    EXPRESSION (never materialized), the projection one keyed sum
    over the exploded stream, and the audit's all-pairs stage runs on
    the SAMPLE only — the calibration a 10^9-vector pipeline runs
    once to pick out_dim before replacing 4x-wider vectors
    everywhere downstream."""
    from multiomics_biocypher_kg_spark.operators.simsearch import (
        jl_distortion_pairs,
    )

    return jl_distortion_pairs(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
        out_dim=_JL_OUT_DIM,
        sample_mod=_JL_SAMPLE_MOD,
    )


# ---------------------------------------------------------------------------
# UNIMAX-style epoch-capped data-mixing allocation
# ---------------------------------------------------------------------------

_MIX_ALPHA = 0.3
_MIX_EPOCH_CAP = 2.5
_MIX_BUDGET_X = 2.0  # token budget = 2x the corpus (multi-epoch run)


def _mixing_oracle_sql() -> str:
    return f"""
    WITH per_lang AS (
      SELECT lang, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ),
    tot AS (SELECT sum(n_tokens) AS t FROM per_lang),
    raw AS (
      SELECT p.lang, p.n_tokens,
        pow(p.n_tokens / tot.t, {_MIX_ALPHA}) AS w_raw,
        {_MIX_BUDGET_X} * tot.t AS budget
      FROM per_lang p CROSS JOIN tot
    ),
    wt AS (SELECT sum(w_raw) AS s FROM raw),
    a0 AS (
      SELECT lang, n_tokens, budget, w_raw / wt.s AS w,
        budget * w_raw / wt.s AS alloc0,
        {_MIX_EPOCH_CAP} * n_tokens AS cap
      FROM raw CROSS JOIN wt
    ),
    agg1 AS (
      SELECT sum(CASE WHEN alloc0 > cap THEN alloc0 - cap ELSE 0 END) AS surplus,
        sum(CASE WHEN alloc0 > cap THEN 0 ELSE w END) AS w_un
      FROM a0
    ),
    a1 AS (
      SELECT a0.*,
        CASE WHEN alloc0 > cap THEN cap
             ELSE alloc0 + coalesce(surplus * w / nullif(w_un, 0), 0) END
          AS alloc1
      FROM a0 CROSS JOIN agg1
    ),
    fin AS (
      SELECT lang, n_tokens, w, budget, least(alloc1, cap) AS alloc_final,
        CAST(CASE WHEN alloc1 >= cap THEN 1 ELSE 0 END AS INTEGER) AS capped
      FROM a1
    ),
    fill AS (SELECT sum(alloc_final) AS used FROM fin)
    SELECT lang, n_tokens, round(w, 6) AS sample_weight,
      round(alloc_final, 2) AS alloc_tokens,
      round(alloc_final / n_tokens, 6) AS epochs, capped,
      round(fill.used / budget, 6) AS budget_fill
    FROM fin CROSS JOIN fill
    """


@register("data_mixing_epochs", oracle=_mixing_oracle_sql())
def data_mixing_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNIMAX-style epoch-capped data-mixing allocation: temperature
    weights (the data_lang_sampling_weights rule, alpha = 0.3) turn a
    fixed token budget (2x the corpus) into per-language allocations;
    any language whose allocation exceeds the epoch cap (2.5 epochs of
    its unique tokens — the repetition ceiling after which marginal
    value collapses) is clamped and its surplus redistributed over
    the uncapped languages proportionally to their weights (ONE
    redistribution round unrolled; residual second-order overflow is
    clipped and shows up as budget_fill < 1). All state is
    language-dictionary-sized: one map-side-combined groupBy over the
    corpus, then broadcast 1-row aggregates. Output: (lang, n_tokens,
    sample_weight, alloc_tokens, epochs, capped, budget_fill)."""
    docs = _docs(spark, sf_dir)
    per_lang = docs.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens")
    )
    tot = per_lang.agg(F.sum("n_tokens").alias("t"))
    raw = per_lang.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_tokens",
        F.pow(F.col("n_tokens") / F.col("t"), F.lit(_MIX_ALPHA)).alias("w_raw"),
        (F.lit(_MIX_BUDGET_X) * F.col("t")).alias("budget"),
    )
    wt = raw.agg(F.sum("w_raw").alias("s"))
    a0 = raw.crossJoin(F.broadcast(wt)).select(
        "lang",
        "n_tokens",
        "budget",
        (F.col("w_raw") / F.col("s")).alias("w"),
        (F.col("budget") * F.col("w_raw") / F.col("s")).alias("alloc0"),
        (F.lit(_MIX_EPOCH_CAP) * F.col("n_tokens")).alias("cap"),
    )
    over = F.col("alloc0") > F.col("cap")
    agg1 = a0.agg(
        F.sum(F.when(over, F.col("alloc0") - F.col("cap")).otherwise(0.0)).alias(
            "surplus"
        ),
        F.sum(F.when(over, 0.0).otherwise(F.col("w"))).alias("w_un"),
    )
    a1 = a0.crossJoin(F.broadcast(agg1)).select(
        "lang",
        "n_tokens",
        "w",
        "budget",
        "cap",
        F.when(over, F.col("cap"))
        .otherwise(
            F.col("alloc0")
            + F.coalesce(
                F.col("surplus") * F.col("w") / F.nullif(F.col("w_un"), F.lit(0.0)),
                F.lit(0.0),
            )
        )
        .alias("alloc1"),
    )
    fin = a1.select(
        "lang",
        "n_tokens",
        "w",
        "budget",
        F.least("alloc1", "cap").alias("alloc_final"),
        (F.col("alloc1") >= F.col("cap")).cast("int").alias("capped"),
    )
    fill = fin.agg(F.sum("alloc_final").alias("used"))
    return fin.crossJoin(F.broadcast(fill)).select(
        "lang",
        "n_tokens",
        F.round("w", 6).alias("sample_weight"),
        F.round("alloc_final", 2).alias("alloc_tokens"),
        F.round(F.col("alloc_final") / F.col("n_tokens"), 6).alias("epochs"),
        "capped",
        F.round(F.col("used") / F.col("budget"), 6).alias("budget_fill"),
    )


# ---------------------------------------------------------------------------
# Predicate schema inference over the heterogeneous edge union
# ---------------------------------------------------------------------------


def _node_type_sql(col: str) -> str:
    return (
        f"CASE WHEN {col} LIKE 'https://%' THEN 'page' "
        f"WHEN {col} LIKE '%:%' THEN split_part({col}, ':', 1) "
        f"ELSE 'host' END"
    )


def _schema_infer_oracle_sql() -> str:
    from multiomics_biocypher_kg_spark.hetero import hetero_edges_ctes

    return f"""
    WITH {hetero_edges_ctes()},
    typed AS (
      SELECT pred, {_node_type_sql('subj')} AS stype,
        {_node_type_sql('obj')} AS otype
      FROM edges
    ),
    dom AS (SELECT pred, stype, count(*) AS n FROM typed GROUP BY 1, 2),
    rng AS (SELECT pred, otype, count(*) AS n FROM typed GROUP BY 1, 2),
    tot AS (SELECT pred, count(*) AS n_edges FROM typed GROUP BY pred),
    topd AS (
      SELECT pred, stype, n,
        row_number() OVER (PARTITION BY pred ORDER BY n DESC, stype) AS rk,
        count(*) OVER (PARTITION BY pred) AS n_types
      FROM dom
    ),
    topr AS (
      SELECT pred, otype, n,
        row_number() OVER (PARTITION BY pred ORDER BY n DESC, otype) AS rk,
        count(*) OVER (PARTITION BY pred) AS n_types
      FROM rng
    )
    SELECT t.pred, t.n_edges,
      d.stype AS domain_type,
      round(CAST(d.n AS DOUBLE) / t.n_edges, 6) AS domain_support,
      CAST(d.n_types AS BIGINT) AS n_domain_types,
      r.otype AS range_type,
      round(CAST(r.n AS DOUBLE) / t.n_edges, 6) AS range_support,
      CAST(r.n_types AS BIGINT) AS n_range_types
    FROM tot t
    JOIN topd d ON t.pred = d.pred AND d.rk = 1
    JOIN topr r ON t.pred = r.pred AND r.rk = 1
    """


@register("kg_schema_inference", oracle=_schema_infer_oracle_sql())
def kg_schema_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate domain/range inference over the heterogeneous edge
    union: per predicate, the modal subject/object node type with
    support fractions and type cardinalities — the signal that
    RECONSTRUCTS what the reference's schema_config.yaml DECLARES
    (source/target labels per edge type; cf. /root/reference/config/
    schema_config.yaml) when the schema must be inferred from emitted
    edges instead. Node types come from the id shape in the scan
    projection (page / host / curie prefix); the profile is two
    predicate-dictionary-sized aggregates + rank-1 windows over them.
    Complements kg_predicate_stats (functionality ratios) and the
    SHACL conformance report (which CHECKS a declared schema — this
    op produces the candidate declaration)."""
    from multiomics_biocypher_kg_spark.hetero import hetero_edges_df

    edges = hetero_edges_df(spark, sf_dir)

    def ntype(c):
        return (
            F.when(F.col(c).startswith("https://"), F.lit("page"))
            .when(
                F.col(c).contains(":"),
                F.element_at(F.split(F.col(c), ":"), 1),
            )
            .otherwise(F.lit("host"))
        )

    typed = edges.select(
        "pred", ntype("subj").alias("stype"), ntype("obj").alias("otype")
    )
    dom = typed.groupBy("pred", "stype").agg(F.count(F.lit(1)).alias("n"))
    rng = typed.groupBy("pred", "otype").agg(F.count(F.lit(1)).alias("n"))
    tot = typed.groupBy("pred").agg(F.count(F.lit(1)).alias("n_edges"))
    wd = Window.partitionBy("pred").orderBy(F.desc("n"), "stype")
    wr = Window.partitionBy("pred").orderBy(F.desc("n"), "otype")
    cd = Window.partitionBy("pred")
    topd = dom.select(
        "pred",
        "stype",
        "n",
        F.row_number().over(wd).alias("rk"),
        F.count(F.lit(1)).over(cd).alias("n_types"),
    ).where(F.col("rk") == 1)
    topr = rng.select(
        "pred",
        "otype",
        "n",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(cd).alias("n_types"),
    ).where(F.col("rk") == 1)
    return (
        tot.join(topd, "pred")
        .join(
            topr.select(
                "pred",
                F.col("otype").alias("range_type"),
                F.col("n").alias("rn"),
                F.col("n_types").alias("n_range_types"),
            ),
            "pred",
        )
        .select(
            "pred",
            "n_edges",
            F.col("stype").alias("domain_type"),
            F.round(F.col("n").cast("double") / F.col("n_edges"), 6).alias(
                "domain_support"
            ),
            F.col("n_types").cast("long").alias("n_domain_types"),
            "range_type",
            F.round(F.col("rn").cast("double") / F.col("n_edges"), 6).alias(
                "range_support"
            ),
            F.col("n_range_types").cast("long").alias("n_range_types"),
        )
    )


# ---------------------------------------------------------------------------
# Content change-rate estimation (Cho & Garcia-Molina recrawl model)
# ---------------------------------------------------------------------------

_CHG_PERIOD = 3  # content mutates every 3rd snapshot (synthesis)
_CHG_DT = 125.0  # seconds between consecutive snapshots of a url


def _change_rate_oracle_sql() -> str:
    from multiomics_biocypher_kg_spark.oracle_fragments import _SNAPS_SQL

    return f"""
    WITH snaps AS ({_SNAPS_SQL}),
    n AS (SELECT count(*) AS n_docs FROM documents),
    seqd AS (
      SELECT s.url, s.doc_id // 125 AS seq,
        (s.fam + 125 * {_CHG_PERIOD} * ((s.doc_id // 125) // {_CHG_PERIOD}))
          % n.n_docs AS cont_doc
      FROM snaps s CROSS JOIN n
    ),
    hashed AS (
      SELECT q.url, q.seq, md5(d.text) AS h
      FROM seqd q JOIN documents d ON q.cont_doc = d.doc_id
    ),
    lagged AS (
      SELECT url, seq, h,
        lag(h) OVER (PARTITION BY url ORDER BY seq) AS prev_h
      FROM hashed
    ),
    per_url AS (
      SELECT url, count(*) AS n_snapshots,
        CAST(sum(CASE WHEN prev_h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_pairs,
        CAST(sum(CASE WHEN prev_h IS NOT NULL AND h <> prev_h
          THEN 1 ELSE 0 END) AS BIGINT) AS n_changed
      FROM lagged GROUP BY url
    )
    SELECT url, n_snapshots, n_pairs, n_changed,
      round(CAST(n_changed AS DOUBLE) / n_pairs, 6) AS change_frac,
      CASE WHEN n_changed < n_pairs THEN
        round(-ln(1 - CAST(n_changed AS DOUBLE) / n_pairs) / {_CHG_DT}, 6)
      ELSE NULL END AS lambda_per_sec
    FROM per_url WHERE n_pairs > 0
    """


@register("web_change_rate", oracle=_change_rate_oracle_sql())
def web_change_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-url content change-rate estimation from the snapshot
    history — the Cho & Garcia-Molina (2003) Poisson recrawl model:
    the fraction of changed consecutive-snapshot pairs at a known
    revisit interval gives the change intensity
    lambda = -ln(1 - X/n) / dt, the number a crawl scheduler turns
    into per-url revisit frequencies (freshness-optimal scheduling).
    Complements web_crawl_schedule (staleness x authority ranking)
    with the MEASURED change model. Change detection is one
    content-hash lag window PARTITIONED by url (bounded history per
    url — never a global sort); the synthesis mutates content every
    {_CHG_PERIOD}rd snapshot so the estimator path (including the
    all-changed NULL guard) is exercised, value-gated cross-engine."""
    from multiomics_biocypher_kg_spark.registry_scale_ops import _fam_host_col

    docs = _docs(spark, sf_dir)
    n_docs = docs.count()
    fam = F.col("doc_id") % 125
    seq = (F.col("doc_id") / 125).cast("long")
    snaps = docs.select(
        F.concat(
            F.lit("https://"),
            _fam_host_col(),
            F.lit("/doc/"),
            F.lpad(fam.cast("string"), 6, "0"),
        ).alias("url"),
        seq.alias("seq"),
        (
            (fam + 125 * _CHG_PERIOD * F.floor(seq / _CHG_PERIOD).cast("long"))
            % n_docs
        ).alias("cont_doc"),
    )
    hashed = snaps.join(
        docs.select(F.col("doc_id").alias("cont_doc"), F.md5("text").alias("h")),
        "cont_doc",
    )
    byU = Window.partitionBy("url").orderBy("seq")
    lagged = hashed.select(
        "url", "seq", "h", F.lag("h").over(byU).alias("prev_h")
    )
    per_url = lagged.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_snapshots"),
        F.sum(F.col("prev_h").isNotNull().cast("int")).cast("long").alias("n_pairs"),
        F.sum(
            (F.col("prev_h").isNotNull() & (F.col("h") != F.col("prev_h"))).cast(
                "int"
            )
        )
        .cast("long")
        .alias("n_changed"),
    )
    frac = F.col("n_changed").cast("double") / F.col("n_pairs")
    return per_url.where(F.col("n_pairs") > 0).select(
        "url",
        "n_snapshots",
        "n_pairs",
        "n_changed",
        F.round(frac, 6).alias("change_frac"),
        F.when(
            F.col("n_changed") < F.col("n_pairs"),
            F.round(-F.log(F.lit(1.0) - frac) / _CHG_DT, 6),
        ).alias("lambda_per_sec"),
    )


# ---------------------------------------------------------------------------
# TextRank keywords (PageRank over the word co-occurrence graph)
# ---------------------------------------------------------------------------

_TR_ITERS = 3
_TR_DAMPING = 0.85
_TR_TOP = 20


def _textrank_edges_sql() -> str:
    stops = ", ".join(f"'{s}'" for s in _RAKE_STOPS)
    return f"""
    SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM (
      WITH toks AS (SELECT doc_id, pos, lower(token) AS tok FROM ({TOKENS_SQL})),
      content AS (SELECT doc_id, pos, tok FROM toks
        WHERE regexp_matches(tok, '^[a-z]+$') AND tok NOT IN ({stops})),
      seqd AS (SELECT doc_id, tok,
          row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS r
        FROM content),
      prs AS (
        SELECT a.tok AS t1, b.tok AS t2
        FROM seqd a JOIN seqd b
          ON a.doc_id = b.doc_id AND b.r - a.r IN (1, 2)
        WHERE a.tok <> b.tok
      )
      SELECT t1 AS src, t2 AS dst FROM prs
      UNION ALL
      SELECT t2, t1 FROM prs
    ) GROUP BY src, dst
    """


def _textrank_oracle_sql() -> str:
    from multiomics_biocypher_kg_spark.registry_web import _pagerank_oracle_sql

    pr = _pagerank_oracle_sql(
        _TR_ITERS, _TR_DAMPING, edges_sql=_textrank_edges_sql(), out_col="word"
    )
    return f"""
    WITH pr AS ({pr}),
    top AS (SELECT word, pagerank AS score FROM pr
            ORDER BY pagerank DESC, word LIMIT {_TR_TOP})
    SELECT word, score,
      CAST(row_number() OVER (ORDER BY score DESC, word) AS INTEGER) AS rn
    FROM top
    """


@register("text_textrank_keywords", oracle=_textrank_oracle_sql())
def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keywords (Mihalcea & Tarau 2004): PageRank over the
    word co-occurrence graph (content words within 2 positions of
    the filtered stream, symmetric, weighted by co-occurrence count)
    — the graph-centrality complement to RAKE's degree/frequency
    scores. The co-occurrence edges come from a position-offset
    self-join WITHIN each doc (fan-out <= 2 per token — never a
    per-doc cross join); the rank loop is the checkpointed
    operators.linkgraph.pagerank over the word-dictionary-sized
    graph; top-20 by the ROUNDED rank (PageRank over a symmetric
    count-weighted graph yields exact rational ties — the
    adamic-adar ordering regime)."""
    from multiomics_biocypher_kg_spark.operators.linkgraph import pagerank

    toks = _docs(spark, sf_dir).select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "raw"),
    ).select("doc_id", "pos", F.lower("raw").alias("tok"))
    content = toks.where(
        F.col("tok").rlike("^[a-z]+$") & ~F.col("tok").isin(list(_RAKE_STOPS))
    )
    byD = Window.partitionBy("doc_id").orderBy("pos")
    seqd = content.select("doc_id", "tok", F.row_number().over(byD).alias("r"))
    a = seqd.select("doc_id", F.col("tok").alias("t1"), F.col("r").alias("ra"))
    b = seqd.select("doc_id", F.col("tok").alias("t2"), F.col("r").alias("rb"))
    prs = (
        a.join(b, "doc_id")
        .where(
            (F.col("rb") - F.col("ra")).isin(1, 2)
            & (F.col("t1") != F.col("t2"))
        )
        .select("t1", "t2")
    )
    edges = (
        prs.select(F.col("t1").alias("src"), F.col("t2").alias("dst"))
        .union(prs.select(F.col("t2").alias("src"), F.col("t1").alias("dst")))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )
    pr = pagerank(edges, iters=_TR_ITERS, damping=_TR_DAMPING)
    score = F.round("rank", 6)
    top = pr.orderBy(score.desc(), "node").limit(_TR_TOP)
    w = Window.orderBy(F.desc("score"), "word")
    return (
        top.select(F.col("node").alias("word"), score.alias("score"))
        .select("word", "score", F.row_number().over(w).cast("int").alias("rn"))
    )


# ---------------------------------------------------------------------------
# AMS (Alon-Matias-Szegedy) F2 / self-join-size sketch
# ---------------------------------------------------------------------------

_AMS_TRIALS = 32


def _ams_oracle_sql() -> str:
    trials = ", ".join(
        "sum(1 - 2 * ("
        + md5_long_sql(f"CAST(l_partkey AS VARCHAR) || '#ams{j}'")
        + f" % 2)) AS s{j}"
        for j in range(_AMS_TRIALS)
    )
    est = "(" + " + ".join(
        f"CAST(s{j} AS DOUBLE) * s{j}" for j in range(_AMS_TRIALS)
    ) + f") / {_AMS_TRIALS}.0"
    return f"""
    WITH sk AS (SELECT {trials} FROM lineitem),
    ex AS (
      SELECT CAST(sum(c * c) AS BIGINT) AS exact_f2 FROM
        (SELECT count(*) AS c FROM lineitem GROUP BY l_partkey)
    )
    SELECT ex.exact_f2, round({est}, 2) AS est_f2,
      round(abs(({est}) - ex.exact_f2) / ex.exact_f2, 6) AS rel_err
    FROM sk CROSS JOIN ex
    """


@register("rel_ams_f2", oracle=_ams_oracle_sql())
def rel_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS sketch of the second frequency moment F2 = sum_k c_k^2 of
    lineitem.l_partkey — the SELF-JOIN SIZE, the quantity a
    cost-based planner needs before committing to a key-equi-join on
    a possibly-skewed column (Alon, Matias & Szegedy 1996). Each of
    the {_AMS_TRIALS} trials is one +/-1-signed SUM over the stream
    (map-side combined, constant state — completing the sketch trio
    beside count-min heavy hitters and the HLL cardinality sketch);
    est = mean of squared trial sums, unbiased for F2. The exact F2
    rides along (one groupBy at test scale) so the estimator error
    is pinned — at 10^12 rows the exact side is the thing you can
    no longer afford, and the sketch is 32 longs."""
    from multiomics_biocypher_kg_spark.functions.hashing import md5_long

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_partkey")
    trials = [
        F.sum(
            1
            - 2
            * (
                md5_long(
                    F.concat(F.col("l_partkey").cast("string"), F.lit(f"#ams{j}"))
                )
                % 2
            )
        ).alias(f"s{j}")
        for j in range(_AMS_TRIALS)
    ]
    sk = li.agg(*trials)
    est = None
    for j in range(_AMS_TRIALS):
        term = F.col(f"s{j}").cast("double") * F.col(f"s{j}")
        est = term if est is None else est + term
    est = est / float(_AMS_TRIALS)
    ex = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).cast("long").alias("exact_f2"))
    )
    return sk.crossJoin(F.broadcast(ex)).select(
        "exact_f2",
        F.round(est, 2).alias("est_f2"),
        F.round(F.abs(est - F.col("exact_f2")) / F.col("exact_f2"), 6).alias(
            "rel_err"
        ),
    )


# ---------------------------------------------------------------------------
# Dunning G² co-occurrence significance
# ---------------------------------------------------------------------------

_G2_CRIT = 6.634897  # chi-squared, 1 dof, alpha = 0.01


def _gtest_oracle_sql() -> str:
    from multiomics_biocypher_kg_spark.oracle_fragments import (
        COMENTION_PAIRS_SQL,
    )

    def term(o: str, row: str, col: str) -> str:
        return (
            f"CASE WHEN {o} > 0 THEN {o} * ln({o} / (({row}) * ({col}) / nn)) "
            f"ELSE 0 END"
        )

    o11, o12 = "CAST(k11 AS DOUBLE)", "CAST(ka - k11 AS DOUBLE)"
    o21, o22 = "CAST(kb - k11 AS DOUBLE)", "CAST(nn - ka - kb + k11 AS DOUBLE)"
    ra, rb = f"{o11} + {o12}", f"{o21} + {o22}"
    ca, cb = f"{o11} + {o21}", f"{o12} + {o22}"
    g2 = (
        f"2 * ({term(o11, ra, ca)} + {term(o12, ra, cb)} + "
        f"{term(o21, rb, ca)} + {term(o22, rb, cb)})"
    )
    return f"""
    WITH pairs AS ({COMENTION_PAIRS_SQL}),
    de AS (
      SELECT doc_id, subj AS entity_id FROM pairs
      UNION ALL
      SELECT doc_id, obj FROM pairs
    ),
    marg AS (
      SELECT entity_id, count(DISTINCT doc_id) AS k_ent
      FROM de GROUP BY entity_id
    ),
    tot AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS nn FROM pairs),
    pc AS (
      SELECT subj, obj, count(DISTINCT doc_id) AS k11
      FROM pairs GROUP BY subj, obj
    ),
    j AS (
      SELECT pc.subj, pc.obj, pc.k11, ms.k_ent AS ka, mo.k_ent AS kb, tot.nn
      FROM pc
      JOIN marg ms ON pc.subj = ms.entity_id
      JOIN marg mo ON pc.obj = mo.entity_id
      CROSS JOIN tot
    )
    SELECT subj, obj, k11 AS n_docs_pair, ka AS n_docs_subj, kb AS n_docs_obj,
      round({g2}, 6) AS g2,
      CAST(CASE WHEN ({g2}) > {_G2_CRIT} THEN 1 ELSE 0 END AS INTEGER)
        AS significant
    FROM j
    """


@register("kg_gtest_edges", oracle=_gtest_oracle_sql())
def kg_gtest_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning log-likelihood-ratio (G²) significance for co-mention
    edges (operators.graphstats.gtest_edges) — the hypothesis-test
    complement to kg_pmi_edges: PMI measures association STRENGTH and
    explodes on rare pairs; G² measures EVIDENCE (grows with support),
    which is what KG edge admission thresholds on (Dunning 1993,
    the collocation-statistics standard). Same shuffle shape as PMI —
    pair counts + entity marginals + one broadcast total; the 2x2
    contingency and the significance flag (chi-squared 1-dof at 1%)
    are scan-side arithmetic."""
    from multiomics_biocypher_kg_spark.operators.graphstats import (
        comention_pairs,
        gtest_edges,
    )
    from multiomics_biocypher_kg_spark.registry import _pipeline

    p = _pipeline(spark, sf_dir)
    return gtest_edges(comention_pairs(p["links"]))


# ---------------------------------------------------------------------------
# Dedup threshold-yield curve
# ---------------------------------------------------------------------------

_CURVE_THRESHOLDS = (0.5, 0.6, 0.7, 0.8, 0.9)


def _threshold_curve_oracle_sql() -> str:
    from multiomics_biocypher_kg_spark.oracle_fragments import (
        MINHASH_PAIRS_CTES,
    )

    ts = ", ".join(f"({t})" for t in _CURVE_THRESHOLDS)
    return f"""
    WITH {MINHASH_PAIRS_CTES},
    th(threshold) AS (VALUES {ts}),
    hits AS (
      SELECT th.threshold, p.id_a, p.id_b
      FROM th JOIN pairs p ON p.jaccard >= th.threshold
    )
    SELECT th.threshold,
      CAST(coalesce(c.n_pairs, 0) AS BIGINT) AS n_pairs,
      CAST(coalesce(c.n_docs, 0) AS BIGINT) AS n_docs_affected
    FROM th LEFT JOIN (
      SELECT threshold, CAST(count(*) / 2 AS BIGINT) AS n_pairs,
        count(DISTINCT id) AS n_docs
      FROM (
        SELECT threshold, id_a AS id FROM hits
        UNION ALL
        SELECT threshold, id_b FROM hits
      ) GROUP BY threshold
    ) c ON th.threshold = c.threshold
    """


@register("dedup_threshold_curve", oracle=_threshold_curve_oracle_sql())
def dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup yield as a function of the Jaccard threshold: for each
    candidate threshold, how many verified near-dup pairs and how
    many documents a dedup pass at that threshold would touch — the
    threshold-selection curve an operator reads BEFORE committing a
    production threshold (the knob trades recall against false
    merges). Computed from the ONE already-verified MinHash pair
    table (the dedup_minhash_lsh plan): a 5-row threshold dimension
    broadcast against it, one conditional aggregate — the corpus is
    never rescanned per threshold."""
    from multiomics_biocypher_kg_spark.operators import dedup as dd
    from multiomics_biocypher_kg_spark.registry_dedup_text import _dedup_corpus

    pairs = dd.minhash_neardup_pairs(_dedup_corpus(spark, sf_dir), 0.5)
    th = spark.range(1).select(
        F.explode(F.array(*[F.lit(t) for t in _CURVE_THRESHOLDS])).alias(
            "threshold"
        )
    )
    hits = F.broadcast(th).join(
        pairs, F.col("jaccard") >= F.col("threshold"), "left"
    )
    ids = hits.select("threshold", F.col("id_a").alias("id"), "id_b").unionByName(
        hits.select("threshold", F.col("id_b").alias("id"), F.col("id_a").alias("id_b"))
    )
    return (
        ids.groupBy("threshold")
        .agg(
            (F.count("id_b") / 2).cast("long").alias("n_pairs"),
            F.countDistinct("id").alias("n_docs_affected"),
        )
    )


# ---------------------------------------------------------------------------
# Degree assortativity of the host graph
# ---------------------------------------------------------------------------


def _assortativity_oracle_sql() -> str:
    return f"""
    WITH hg AS (SELECT src_host AS src, dst_host AS dst FROM ({_HOST_GRAPH_SQL})),
    e AS (SELECT DISTINCT src, dst FROM hg),
    deg AS (
      SELECT node, count(*) AS d FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e
      ) GROUP BY node
    ),
    xy AS (
      SELECT CAST(ds.d AS DOUBLE) AS x, CAST(dd.d AS DOUBLE) AS y
      FROM e JOIN deg ds ON e.src = ds.node JOIN deg dd ON e.dst = dd.node
    ),
    m AS (
      SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
        sum(x * x) AS sxx, sum(y * y) AS syy
      FROM xy
    )
    SELECT CAST(n AS BIGINT) AS n_edges,
      round((n * sxy - sx * sy) /
        (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
        AS assortativity
    FROM m
    """


@register("web_assortativity", oracle=_assortativity_oracle_sql())
def web_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the host link graph (Newman 2002):
    the Pearson correlation of endpoint total degrees over edges —
    negative = hub-and-spoke (organic web), near +1 = hubs linking
    hubs (the link-exchange / farm signature, a corpus-level spam
    prior beside TrustRank). One degree aggregate joined onto the
    edge list + one 1-row moment aggregate; all sums map-side
    combined, nothing collected."""
    e = _host_edges(spark, sf_dir).distinct()
    deg = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    xy = (
        e.join(deg.select(F.col("node").alias("src"), F.col("d").alias("x")), "src")
        .join(deg.select(F.col("node").alias("dst"), F.col("d").alias("y")), "dst")
        .select(F.col("x").cast("double").alias("x"), F.col("y").cast("double").alias("y"))
    )
    m = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    r = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select(
        F.col("n").cast("long").alias("n_edges"),
        F.round(r, 6).alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# Transitive reduction of the ontology DAG
# ---------------------------------------------------------------------------

# DAG synthesis: the tree (child -> child // 4) plus redundant
# grandparent shortcuts (child -> child // 16 for every 3rd node) —
# the shortcuts are implied by transitivity BY CONSTRUCTION, so the
# reduction must flag exactly them.
_DAG_EDGES_SQL = """
  SELECT format('n{:04d}', doc_id) AS src,
         format('n{:04d}', doc_id // 4) AS dst
  FROM documents WHERE doc_id > 0
  UNION ALL
  SELECT format('n{:04d}', doc_id), format('n{:04d}', doc_id // 16)
  FROM documents WHERE doc_id >= 16 AND doc_id % 3 = 0
"""


def _transitive_reduction_oracle_sql() -> str:
    return f"""
    WITH RECURSIVE e AS (SELECT DISTINCT src, dst FROM ({_DAG_EDGES_SQL})),
    clos(node, ancestor) AS (
      SELECT src, dst FROM e
      UNION
      SELECT c.node, e.dst FROM clos c JOIN e ON c.ancestor = e.src
    )
    SELECT e.src, e.dst,
      CAST(CASE WHEN EXISTS (
        SELECT 1 FROM e mid JOIN clos c
          ON mid.src = e.src AND c.node = mid.dst AND c.ancestor = e.dst
        WHERE mid.dst <> e.dst
      ) THEN 1 ELSE 0 END AS INTEGER) AS redundant
    FROM e
    """


@register("kg_transitive_reduction", oracle=_transitive_reduction_oracle_sql())
def kg_transitive_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive reduction of an ontology DAG: an edge (a, b) is
    redundant iff some other out-neighbor c of a already reaches b —
    the cleanup pass a KG build runs after merging ontology sources
    that ship both direct and inferred is_a edges (the reference's
    ontology adapters emit curated hierarchies; merged hierarchies
    accumulate shortcuts). Computed as one closure (the onto_closure
    ancestors_closure operator, bounded depth) + one edge x edge
    keyed join + an EXISTS semi-join — no per-edge path search. The
    synthesis plants grandparent shortcuts, so the expected flag set
    is known by construction and value-gated."""
    from multiomics_biocypher_kg_spark.operators.enrich import ancestors_closure

    docs = _docs(spark, sf_dir).select("doc_id")
    tree = docs.where(F.col("doc_id") > 0).select(
        F.format_string("n%04d", F.col("doc_id")).alias("src"),
        F.format_string("n%04d", F.floor(F.col("doc_id") / 4).cast("int")).alias(
            "dst"
        ),
    )
    shortcuts = docs.where(
        (F.col("doc_id") >= 16) & (F.col("doc_id") % 3 == 0)
    ).select(
        F.format_string("n%04d", F.col("doc_id")).alias("src"),
        F.format_string("n%04d", F.floor(F.col("doc_id") / 16).cast("int")).alias(
            "dst"
        ),
    )
    e = tree.unionByName(shortcuts).distinct()
    clos = ancestors_closure(
        e.select(F.col("src").alias("child"), F.col("dst").alias("parent")),
        max_depth=10,
    ).select(F.col("node"), F.col("ancestor"))
    # mid-hop: (a, c) edge whose head c reaches b
    mid = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    via = mid.join(
        clos.select(F.col("node").alias("c"), F.col("ancestor").alias("b")), "c"
    ).where(F.col("c") != F.col("b")).select("a", "b").distinct()
    return (
        e.join(
            via.select(
                F.col("a").alias("src"), F.col("b").alias("dst"), F.lit(1).alias("r")
            ),
            ["src", "dst"],
            "left",
        )
        .select("src", "dst", F.coalesce("r", F.lit(0)).cast("int").alias("redundant"))
    )


# ---------------------------------------------------------------------------
# Hub-removal robustness (percolation) of the host graph
# ---------------------------------------------------------------------------

_PERC_K = 5


def _percolation_oracle_sql() -> str:
    def cc(edges_cte: str, tag: str) -> str:
        return f"""und{tag} AS (
      SELECT src AS a, dst AS b FROM {edges_cte} WHERE src <> dst
      UNION
      SELECT dst, src FROM {edges_cte} WHERE src <> dst
    ),
    reach{tag}(node, lbl) AS (
      SELECT a, a FROM und{tag}
      UNION
      SELECT u.a, r.lbl FROM und{tag} u JOIN reach{tag} r ON u.b = r.node
    ),
    comp{tag} AS (
      SELECT node, min(lbl) AS component FROM reach{tag} GROUP BY node
    ),
    big{tag} AS (
      SELECT max(n) AS largest FROM
        (SELECT count(*) AS n FROM comp{tag} GROUP BY component)
    )"""

    return f"""
    WITH RECURSIVE hg AS (SELECT src_host AS src, dst_host AS dst
        FROM ({_HOST_GRAPH_SQL})),
    e AS (SELECT DISTINCT src, dst FROM hg),
    deg AS (
      SELECT node, count(*) AS d FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e
      ) GROUP BY node
    ),
    hubs AS (SELECT node FROM deg ORDER BY d DESC, node LIMIT {_PERC_K}),
    e2 AS (
      SELECT src, dst FROM e
      WHERE src NOT IN (SELECT node FROM hubs)
        AND dst NOT IN (SELECT node FROM hubs)
    ),
    nodes AS (SELECT count(DISTINCT node) AS n_hosts FROM deg),
    {cc('e', '_f')},
    {cc('e2', '_a')}
    SELECT nodes.n_hosts, CAST({_PERC_K} AS INTEGER) AS n_hubs_removed,
      CAST(big_f.largest AS BIGINT) AS largest_cc_full,
      CAST(coalesce(big_a.largest, 0) AS BIGINT) AS largest_cc_after,
      round(CAST(coalesce(big_a.largest, 0) AS DOUBLE) / big_f.largest, 6)
        AS frac_retained
    FROM nodes CROSS JOIN big_f CROSS JOIN big_a
    """


@register("web_percolation_robustness", oracle=_percolation_oracle_sql())
def web_percolation_robustness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Targeted-attack robustness of the host graph (percolation
    under hub removal, Albert-Jeong-Barabasi 2000): largest connected
    component before and after deleting the top-{_PERC_K} hosts by
    total degree — how much of the crawl graph's connectivity routes
    through its hubs (a scale-free graph shatters; a mesh survives).
    Two pointer-jump CC runs (the kg_components discipline) on the
    full and hub-filtered edge sets + one degree top-k
    (TakeOrderedAndProject); the hub set broadcasts into the filter."""
    from multiomics_biocypher_kg_spark.operators.canonicalize import (
        connected_components,
    )

    e = _host_edges(spark, sf_dir).where(F.col("src") != F.col("dst")).distinct()
    e = e.localCheckpoint(eager=True)  # consumed by degree + 2 CC runs
    deg = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    hubs = deg.orderBy(F.desc("d"), "node").limit(_PERC_K).select("node")
    e2 = e.join(
        hubs.select(F.col("node").alias("src")), "src", "left_anti"
    ).join(hubs.select(F.col("node").alias("dst")), "dst", "left_anti")

    def largest(edges):
        comp = connected_components(edges, src="src", dst="dst")
        return comp.groupBy("component").agg(F.count(F.lit(1)).alias("n")).agg(
            F.max("n").alias("largest")
        )

    n_hosts = deg.agg(F.countDistinct("node").alias("n_hosts"))
    big_f = largest(e).select(F.col("largest").alias("largest_cc_full"))
    big_a = largest(e2).select(F.col("largest").alias("largest_cc_after"))
    return (
        n_hosts.crossJoin(F.broadcast(big_f))
        .crossJoin(F.broadcast(big_a))
        .select(
            "n_hosts",
            F.lit(_PERC_K).cast("int").alias("n_hubs_removed"),
            F.col("largest_cc_full").cast("long").alias("largest_cc_full"),
            F.coalesce("largest_cc_after", F.lit(0))
            .cast("long")
            .alias("largest_cc_after"),
            F.round(
                F.coalesce("largest_cc_after", F.lit(0)).cast("double")
                / F.col("largest_cc_full"),
                6,
            ).alias("frac_retained"),
        )
    )


# ---------------------------------------------------------------------------
# Readability scores (Flesch / Flesch-Kincaid)
# ---------------------------------------------------------------------------


def _readability_oracle_sql() -> str:
    return """
    WITH t AS (
      SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS DOUBLE) AS w,
        CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS DOUBLE) AS s,
        CAST(greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
          AS DOUBLE) AS syl
      FROM documents
    )
    SELECT doc_id, CAST(w AS BIGINT) AS n_words, CAST(s AS BIGINT) AS n_sentences,
      CAST(syl AS BIGINT) AS n_syllables,
      round(206.835 - 1.015 * (w / s) - 84.6 * (syl / w), 6) AS flesch_ease,
      round(0.39 * (w / s) + 11.8 * (syl / w) - 15.59, 6) AS fk_grade
    FROM t
    """


@register("text_readability", oracle=_readability_oracle_sql())
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease + Flesch-Kincaid grade per document — the
    classic readability gates a curation pipeline adds beside the
    length/stopword quality score (audience-level filtering and
    curriculum bucketing). Syllables are approximated by vowel-group
    runs and sentences by terminal-punctuation runs — both regexp
    counts in the SCAN PROJECTION (identical RE2/Java semantics on
    these classes); the whole operator is shuffle-free."""
    t = _docs(spark, sf_dir).select(
        "doc_id",
        F.size(F.split("text", " ")).cast("double").alias("w"),
        F.greatest(
            F.size(F.regexp_extract_all("text", F.lit("([.!?]+)"), F.lit(1))),
            F.lit(1),
        )
        .cast("double")
        .alias("s"),
        F.greatest(
            F.size(
                F.regexp_extract_all(F.lower("text"), F.lit("([aeiouy]+)"), F.lit(1))
            ),
            F.lit(1),
        )
        .cast("double")
        .alias("syl"),
    )
    return t.select(
        "doc_id",
        F.col("w").cast("long").alias("n_words"),
        F.col("s").cast("long").alias("n_sentences"),
        F.col("syl").cast("long").alias("n_syllables"),
        F.round(
            206.835 - 1.015 * (F.col("w") / F.col("s")) - 84.6 * (F.col("syl") / F.col("w")),
            6,
        ).alias("flesch_ease"),
        F.round(
            0.39 * (F.col("w") / F.col("s")) + 11.8 * (F.col("syl") / F.col("w")) - 15.59,
            6,
        ).alias("fk_grade"),
    )


# ---------------------------------------------------------------------------
# Harmonic centrality from sampled sources (Eppstein-Wang)
# ---------------------------------------------------------------------------

_HC_ROUNDS = 6
_HC_SRC_MOD = 5


def _harmonic_oracle_sql() -> str:
    src_pred = md5_long_sql("node") + f" % {_HC_SRC_MOD} = 0"
    parts = [
        (
            f"hg AS MATERIALIZED (SELECT src_host AS src, dst_host AS dst "
            f"FROM ({_HOST_GRAPH_SQL}))"
        ),
        (
            "nodes AS MATERIALIZED (SELECT DISTINCT node FROM "
            "(SELECT src AS node FROM hg UNION ALL SELECT dst FROM hg))"
        ),
        f"srcs AS MATERIALIZED (SELECT node AS s FROM nodes WHERE {src_pred})",
        "sc AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS ns FROM srcs)",
        "nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        "d0 AS MATERIALIZED (SELECT s, s AS node, 0 AS dist FROM srcs)",
    ]
    for i in range(_HC_ROUNDS):
        parts.append(
            f"d{i + 1} AS MATERIALIZED (SELECT s, node, min(dist) AS dist FROM ("
            f"SELECT s, node, dist FROM d{i} "
            f"UNION ALL SELECT d.s, hg.dst AS node, d.dist + 1 AS dist "
            f"FROM d{i} d JOIN hg ON hg.src = d.node) u GROUP BY s, node)"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"""
    SELECT node AS host,
      CAST(count(CASE WHEN dist > 0 THEN 1 END) AS INTEGER) AS n_reached,
      round((nn.n - 1) / sc.ns *
        coalesce(sum(CASE WHEN dist > 0 THEN 1.0 / dist END), 0.0), 6)
        AS harmonic_centrality
    FROM d{_HC_ROUNDS} CROSS JOIN nn CROSS JOIN sc
    GROUP BY node, nn.n, sc.ns"""
    )


@register("web_harmonic_centrality", oracle=_harmonic_oracle_sql())
def web_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host harmonic centrality estimated from a deterministic
    source sample (Eppstein & Wang 2001 / Boldi & Vigna "Axioms for
    Centrality"): hc(v) = (n-1)/|S| * sum over sampled sources s of
    1 / d(s, v), distances from a BATCHED multi-source BFS — the
    state is ONE sparse (source, node, dist) table advanced by one
    frontier equi-join + one all-integer min-groupBy per round for
    ALL sources at once (the ppr_batch discipline applied to
    distances instead of mass). Harmonic centrality is the
    closeness variant that stays well-defined on disconnected
    graphs (unreached pairs contribute 0, not infinity), which is
    why it is the crawl-frontier authority signal of choice next to
    PageRank; web_hyperanf estimates ball SIZES per radius, this
    ranks nodes by inverse-distance REACH. Fixed {h}-round horizon
    (the BFS-family contract; the web's effective diameter), sources
    = the md5 % {m} == 0 hosts (the Eppstein-Wang uniform sample —
    |S| = O(log n / eps^2) bounds the state at 10^12 nodes); nodes
    outside every source's horizon are excluded by contract. The
    (n-1)/|S| rescale uses two broadcast 1-row aggregates; the only
    float math is the final reciprocal sum, round(6)-gated.
    """
    from multiomics_biocypher_kg_spark.operators.linkgraph import (
        host_graph,
        href_edges,
    )

    hg = host_graph(href_edges(pages_from_documents(spark, sf_dir))).select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    nodes = (
        hg.select(F.col("src").alias("node"))
        .union(hg.select("dst"))
        .distinct()
    )
    srcs = nodes.where(md5_long(F.col("node")) % _HC_SRC_MOD == 0).select(
        F.col("node").alias("s")
    )
    nn = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    sc = srcs.agg(F.count(F.lit(1)).cast("double").alias("ns"))
    from multiomics_biocypher_kg_spark.operators.linkgraph import (
        multi_source_distances,
    )

    state = multi_source_distances(hg, srcs, rounds=_HC_ROUNDS)
    raw = state.groupBy("node").agg(
        F.count(F.when(F.col("dist") > 0, 1)).cast("int").alias("n_reached"),
        F.coalesce(
            F.sum(F.when(F.col("dist") > 0, F.lit(1.0) / F.col("dist"))),
            F.lit(0.0),
        ).alias("raw"),
    )
    return (
        raw.crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(sc))
        .select(
            F.col("node").alias("host"),
            "n_reached",
            F.round(
                (F.col("n") - 1) / F.col("ns") * F.col("raw"), 6
            ).alias("harmonic_centrality"),
        )
    )


web_harmonic_centrality.__doc__ = web_harmonic_centrality.__doc__.format(
    h=_HC_ROUNDS, m=_HC_SRC_MOD
)


# ---------------------------------------------------------------------------
# Per-label centroid drift between embedding batches
# ---------------------------------------------------------------------------


@register(
    "emb_drift_monitor",
    oracle="""
    WITH ex AS (SELECT vec_id, label, vec_id % 2 AS batch,
        CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS dim,
        CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings),
    cnt AS (SELECT label, vec_id % 2 AS batch, count(*) AS n
      FROM embeddings GROUP BY 1, 2),
    cent AS (SELECT label, batch, dim, avg(x) AS m FROM ex GROUP BY 1, 2, 3),
    paired AS (
      SELECT o.label, o.dim, o.m AS m0, n.m AS m1
      FROM cent o JOIN cent n ON o.label = n.label AND o.dim = n.dim
      WHERE o.batch = 0 AND n.batch = 1
    ),
    d AS (
      SELECT label,
        sqrt(sum((m0 - m1) * (m0 - m1))) AS l2,
        sum(m0 * m1) / (sqrt(sum(m0 * m0)) * sqrt(sum(m1 * m1))) AS cos
      FROM paired GROUP BY label
    )
    SELECT d.label, c0.n AS n_old, c1.n AS n_new,
      round(d.l2, 6) AS l2_drift, round(d.cos, 6) AS cos_sim
    FROM d
    JOIN cnt c0 ON c0.label = d.label AND c0.batch = 0
    JOIN cnt c1 ON c1.label = d.label AND c1.batch = 1
    """,
)
def emb_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift monitor: per-label centroid shift
    between two ingestion batches (deterministic vec_id parity split
    stands in for yesterday/today) — L2 distance and cosine of the
    old/new centroids plus batch sizes. This is the production gate
    on re-embedding / encoder upgrades: emb_label_outliers flags bad
    POINTS within one batch, the drift monitor flags a moved
    DISTRIBUTION between batches (retrain the ANN index / recalibrate
    thresholds when cos_sim drops). Scale shape: centroids are one
    map-side-combined (label, batch, dim) agg over the exploded
    stream — |labels| x 2 x dim rows regardless of corpus size; the
    old/new pairing and the final metrics touch only that dictionary.
    Zero Python, one corpus pass plus one count pass.
    """
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ex = emb.select(
        "label",
        (F.col("vec_id") % 2).alias("batch"),
        F.posexplode("embedding").alias("dim", "xf"),
    ).select("label", "batch", "dim", F.col("xf").cast("double").alias("x"))
    cnt = emb.groupBy("label", (F.col("vec_id") % 2).alias("batch")).agg(
        F.count(F.lit(1)).alias("n")
    )
    cent = ex.groupBy("label", "batch", "dim").agg(F.avg("x").alias("m"))
    old = cent.where(F.col("batch") == 0).select(
        "label", "dim", F.col("m").alias("m0")
    )
    new = cent.where(F.col("batch") == 1).select(
        "label", "dim", F.col("m").alias("m1")
    )
    d = (
        old.join(new, ["label", "dim"])
        .groupBy("label")
        .agg(
            F.sqrt(F.sum((F.col("m0") - F.col("m1")) * (F.col("m0") - F.col("m1")))).alias("l2"),
            (
                F.sum(F.col("m0") * F.col("m1"))
                / (
                    F.sqrt(F.sum(F.col("m0") * F.col("m0")))
                    * F.sqrt(F.sum(F.col("m1") * F.col("m1")))
                )
            ).alias("cos"),
        )
    )
    c0 = cnt.where(F.col("batch") == 0).select("label", F.col("n").alias("n_old"))
    c1 = cnt.where(F.col("batch") == 1).select("label", F.col("n").alias("n_new"))
    return (
        d.join(c0, "label")
        .join(c1, "label")
        .select(
            "label",
            "n_old",
            "n_new",
            F.round("l2", 6).alias("l2_drift"),
            F.round("cos", 6).alias("cos_sim"),
        )
    )


# ---------------------------------------------------------------------------
# Top principal component via fixed-iteration power method
# ---------------------------------------------------------------------------

_POW_ITERS = 3


def _power_oracle_sql(iters: int = _POW_ITERS) -> str:
    parts = [
        """ex AS (SELECT vec_id,
        CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS dim,
        CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings)""",
        "mu AS (SELECT dim, avg(x) AS m FROM ex GROUP BY dim)",
        "nn AS (SELECT CAST(count(DISTINCT vec_id) AS DOUBLE) AS n FROM ex)",
        """cx AS MATERIALIZED (SELECT e.vec_id, e.dim, e.x - m.m AS x
      FROM ex e JOIN mu m ON e.dim = m.dim)""",
        "v0 AS (SELECT dim, 1.0 AS v FROM mu)",
    ]
    for k in range(1, iters + 1):
        parts += [
            (
                f"s{k} AS MATERIALIZED (SELECT c.vec_id, sum(c.x * v.v) AS s "
                f"FROM cx c JOIN v{k - 1} v ON c.dim = v.dim GROUP BY c.vec_id)"
            ),
            (
                f"w{k} AS MATERIALIZED (SELECT c.dim, sum(c.x * s.s) / t.n AS w "
                f"FROM cx c JOIN s{k} s ON c.vec_id = s.vec_id "
                f"CROSS JOIN nn t GROUP BY c.dim, t.n)"
            ),
            f"z{k} AS (SELECT sqrt(sum(w * w)) AS z FROM w{k})",
            (
                f"v{k} AS (SELECT dim, w / z AS v FROM w{k} CROSS JOIN z{k})"
            ),
        ]
    return (
        "WITH " + ",\n".join(parts)
        + f"""
    SELECT v.dim, round(v.v, 6) AS loading, round(z.z, 6) AS eigval
    FROM v{iters} v CROSS JOIN z{iters} z"""
    )


@register("emb_power_iteration", oracle=_power_oracle_sql())
def emb_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the (centered) embedding cloud via
    {k} fixed power-method iterations — the anisotropy audit every
    embedding pipeline runs (a dominant PC with a large eigenvalue
    means cosine similarities are inflated by a common direction;
    the all-but-the-top-ABTT fix needs exactly this vector). The
    distributed shape is the Krylov one — the d x d covariance is
    NEVER materialized: each iteration is two keyed aggregates,
    s_i = <x_i, v> (corpus join against the broadcast d-row vector)
    then w = sum_i x_i * s_i / n (dim-keyed sum), plus one 1-row norm
    scalar — O(nnz) work and d-sized driver-free state per round,
    deterministic all-ones init (sign-stable, no RNG). eigval is the
    converged Rayleigh estimate ||C v||. Mirrors the JL-audit's
    regime (emb_random_projection): float noise is summation-order
    ulps, gated by round(6).
    """
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "xf")
    ).select("vec_id", "dim", F.col("xf").cast("double").alias("x"))
    mu = ex.groupBy("dim").agg(F.avg("x").alias("m"))
    nn = ex.agg(F.countDistinct("vec_id").cast("double").alias("n"))
    cx = (
        ex.join(F.broadcast(mu), "dim")
        .select("vec_id", "dim", (F.col("x") - F.col("m")).alias("x"))
        .localCheckpoint()  # loop invariant: truncate lineage once
    )
    v = mu.select("dim", F.lit(1.0).alias("v"))
    z = None
    for _ in range(_POW_ITERS):
        s = (
            cx.join(F.broadcast(v), "dim")
            .groupBy("vec_id")
            .agg(F.sum(F.col("x") * F.col("v")).alias("s"))
        )
        w = (
            cx.join(s, "vec_id")
            .crossJoin(F.broadcast(nn))
            .groupBy("dim")
            .agg((F.sum(F.col("x") * F.col("s")) / F.first("n")).alias("w"))
        )
        z = w.agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("z"))
        v = w.crossJoin(F.broadcast(z)).select(
            "dim", (F.col("w") / F.col("z")).alias("v")
        )
    return v.crossJoin(F.broadcast(z)).select(
        "dim",
        F.round("v", 6).alias("loading"),
        F.round("z", 6).alias("eigval"),
    )


emb_power_iteration.__doc__ = emb_power_iteration.__doc__.format(k=_POW_ITERS)


# ---------------------------------------------------------------------------
# Hearst-pattern hypernym extraction (KG construction from web text)
# ---------------------------------------------------------------------------

_HEARST_A = r"(\w+) such as (\w+(?:, \w+)* and \w+)"
_HEARST_B = r"(\w+(?:, \w+)*) and other (\w+)"
_HYPO_SPLIT = ", | and "

# Deterministic Hearst-bearing page synthesis (the harness half, like
# kg_temporal_conflicts' claims / kg_warc_scan's records): docs with
# >= 7 tokens get a "X such as A, B and C" sentence (2 or 3 hyponyms
# by parity, skipped entirely for doc_id % 3 == 2) and even docs also
# get an "A, B and other X" sentence, appended AFTER the full raw
# text so the extractor must scan past pattern-free noise.
_HEARST_PAGES_SQL = """
  SELECT doc_id,
    text || CASE WHEN len(string_split(text, ' ')) >= 7 THEN
      CASE WHEN doc_id % 3 <> 2 THEN
        '. ' || string_split(text, ' ')[1] || ' such as ' ||
        CASE WHEN doc_id % 2 = 0 THEN
          string_split(text, ' ')[2] || ', ' || string_split(text, ' ')[3]
          || ' and ' || string_split(text, ' ')[4]
        ELSE string_split(text, ' ')[2] || ' and ' || string_split(text, ' ')[3]
        END || '.'
      ELSE '' END ||
      CASE WHEN doc_id % 2 = 0 THEN
        ' ' || string_split(text, ' ')[5] || ', ' || string_split(text, ' ')[6]
        || ' and other ' || string_split(text, ' ')[7] || '.'
      ELSE '' END
    ELSE '' END AS page
  FROM documents
"""


@register(
    "kg_hearst_patterns",
    oracle=f"""
    WITH pages AS ({_HEARST_PAGES_SQL}),
    a AS (
      SELECT doc_id, 'such_as' AS pattern,
        unnest(regexp_extract_all(page, '{_HEARST_A}', 1)) AS hypernym,
        unnest(regexp_extract_all(page, '{_HEARST_A}', 2)) AS hypo_list
      FROM pages
    ),
    b AS (
      SELECT doc_id, 'and_other' AS pattern,
        unnest(regexp_extract_all(page, '{_HEARST_B}', 2)) AS hypernym,
        unnest(regexp_extract_all(page, '{_HEARST_B}', 1)) AS hypo_list
      FROM pages
    ),
    u AS (
      SELECT doc_id, pattern, hypernym,
        unnest(string_split_regex(hypo_list, '{_HYPO_SPLIT}')) AS hyponym
      FROM (SELECT * FROM a UNION ALL SELECT * FROM b) ab
    )
    SELECT pattern, hypernym, hyponym,
      count(*) AS n_mentions, count(DISTINCT doc_id) AS n_docs
    FROM u GROUP BY 1, 2, 3
    """,
)
def kg_hearst_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hearst-pattern hypernym mining — the classic is-a extractor
    for KG construction from raw web text (Hearst 1992; the lexico-
    syntactic ancestor of the reference's ontology is-a edges, which
    it imports pre-built from OBO — here they are MINED from text).
    Two surface patterns: "X such as A, B and C" and "A, B and other
    X", each yielding (hypernym X, hyponym) candidate edges with
    corpus support counts (n_docs is the confidence denominator
    taxonomy induction thresholds on). Extraction is a native
    regexp_extract_all in the scan projection (whole-stage codegen,
    zero Python), fanout bounded by matches-per-doc, then ONE
    map-side-combined (pattern, hyper, hypo) agg — a 10^12-doc
    corpus runs this at scan speed plus a dictionary-sized shuffle.
    The page synthesis half is the deterministic test harness
    (claims-table discipline); the extractor never sees the formula.
    """
    docs = _docs(spark, sf_dir)
    tk = F.split(F.col("text"), " ")

    def t(i: int):
        return F.element_at(tk, i)

    sent_a = F.when(
        F.col("doc_id") % 3 != 2,
        F.concat(
            F.lit(". "), t(1), F.lit(" such as "),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(t(2), F.lit(", "), t(3), F.lit(" and "), t(4)),
            ).otherwise(F.concat(t(2), F.lit(" and "), t(3))),
            F.lit("."),
        ),
    ).otherwise(F.lit(""))
    sent_b = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(
            F.lit(" "), t(5), F.lit(", "), t(6),
            F.lit(" and other "), t(7), F.lit("."),
        ),
    ).otherwise(F.lit(""))
    pages = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.size(tk) >= 7, F.concat(sent_a, sent_b)).otherwise(
                F.lit("")
            ),
        ).alias("page"),
    )

    def matches(pat: str, hyper_grp: int, list_grp: int, label: str) -> DataFrame:
        z = F.arrays_zip(
            F.regexp_extract_all(F.col("page"), F.lit(pat), hyper_grp).alias(
                "hyper"
            ),
            F.regexp_extract_all(F.col("page"), F.lit(pat), list_grp).alias(
                "lst"
            ),
        )
        return (
            pages.select("doc_id", F.explode(z).alias("m"))
            .select(
                "doc_id",
                F.lit(label).alias("pattern"),
                F.col("m.hyper").alias("hypernym"),
                F.explode(F.split(F.col("m.lst"), _HYPO_SPLIT)).alias(
                    "hyponym"
                ),
            )
        )

    u = matches(_HEARST_A, 1, 2, "such_as").unionByName(
        matches(_HEARST_B, 2, 1, "and_other")
    )
    return u.groupBy("pattern", "hypernym", "hyponym").agg(
        F.count(F.lit(1)).alias("n_mentions"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# Broder bowtie decomposition of the host link graph
# ---------------------------------------------------------------------------

_BOWTIE_ROUNDS = 8


def _bowtie_sql(rounds: int = _BOWTIE_ROUNDS) -> str:
    parts = [
        f"hg AS (SELECT src_host, dst_host FROM ({_HOST_GRAPH_SQL}))",
        "nodes AS (SELECT DISTINCT src_host AS node FROM hg "
        "UNION SELECT DISTINCT dst_host FROM hg)",
        "piv AS (SELECT src_host AS node FROM hg GROUP BY src_host "
        "ORDER BY count(*) DESC, src_host LIMIT 1)",
        "f0 AS (SELECT node, 0 AS dist FROM piv)",
        "b0 AS (SELECT node, 0 AS dist FROM piv)",
    ]
    for i in range(rounds):
        parts.append(
            f"f{i + 1} AS (SELECT node, min(dist) AS dist FROM ("
            f"SELECT node, dist FROM f{i} UNION ALL "
            f"SELECT hg.dst_host AS node, d.dist + 1 AS dist "
            f"FROM f{i} d JOIN hg ON hg.src_host = d.node) GROUP BY node)"
        )
        parts.append(
            f"b{i + 1} AS (SELECT node, min(dist) AS dist FROM ("
            f"SELECT node, dist FROM b{i} UNION ALL "
            f"SELECT hg.src_host AS node, d.dist + 1 AS dist "
            f"FROM b{i} d JOIN hg ON hg.dst_host = d.node) GROUP BY node)"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"""
    SELECT n.node AS host,
      CAST(coalesce(f.dist, -1) AS INTEGER) AS fwd_dist,
      CAST(coalesce(b.dist, -1) AS INTEGER) AS bwd_dist,
      CASE WHEN f.node IS NOT NULL AND b.node IS NOT NULL THEN 'CORE'
           WHEN b.node IS NOT NULL THEN 'IN'
           WHEN f.node IS NOT NULL THEN 'OUT'
           ELSE 'OTHER' END AS region
    FROM nodes n
    LEFT JOIN f{rounds} f ON n.node = f.node
    LEFT JOIN b{rounds} b ON n.node = b.node"""
    )


@register("web_bowtie_structure", oracle=_bowtie_sql())
def web_bowtie_structure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broder bowtie decomposition (Broder et al. 2000) of the host
    link graph: forward + backward BFS reachability from a
    deterministic pivot (max out-degree host, min-host tiebreak)
    classifies every host as CORE (the pivot's SCC: reachable both
    ways), IN (reaches the core), OUT (reached from the core), or
    OTHER (tendrils/disconnected) — the macro-structure audit every
    web-crawl corpus gets before link-based quality propagation
    (TrustRank/spam-mass seeds must sit in CORE/IN to cover OUT).
    Same fixed-horizon integer-BFS discipline as web_seed_distance:
    {rounds} relaxation rounds (hosts farther than the horizon are
    OTHER by contract), each round one frontier equi-join + an
    all-integer min groupBy; the pivot is a 1-row
    TakeOrderedAndProject broadcast, never a global sort. Distances
    use -1 sentinels so the output stays null-free cross-engine.
    """
    hg = (
        host_graph(href_edges(pages_from_documents(spark, sf_dir)))
        .select("src_host", "dst_host")
        # loop invariant: the host-graph derivation (page synthesis +
        # canonicalization regexps) must enter the 16 BFS rounds as a
        # LEAF, not be re-planned into every round's subtree
        .localCheckpoint()
    )
    piv = (
        hg.groupBy("src_host")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "src_host")
        .limit(1)
        .select(F.col("src_host").alias("node"))
    )
    nodes = (
        hg.select(F.col("src_host").alias("node"))
        .union(hg.select("dst_host"))
        .distinct()
    )

    def bfs(src_col: str, dst_col: str) -> DataFrame:
        d = piv.select("node", F.lit(0).alias("dist"))
        for _ in range(_BOWTIE_ROUNDS):
            step = d.join(hg, d["node"] == hg[src_col]).select(
                F.col(dst_col).alias("node"), (F.col("dist") + 1).alias("dist")
            )
            d = d.union(step).groupBy("node").agg(F.min("dist").alias("dist"))
        return d

    fwd = bfs("src_host", "dst_host").withColumnRenamed("dist", "fd")
    bwd = bfs("dst_host", "src_host").withColumnRenamed("dist", "bd")
    return (
        nodes.join(fwd, "node", "left")
        .join(bwd, "node", "left")
        .select(
            F.col("node").alias("host"),
            F.coalesce("fd", F.lit(-1)).cast("int").alias("fwd_dist"),
            F.coalesce("bd", F.lit(-1)).cast("int").alias("bwd_dist"),
            F.when(
                F.col("fd").isNotNull() & F.col("bd").isNotNull(), "CORE"
            )
            .when(F.col("bd").isNotNull(), "IN")
            .when(F.col("fd").isNotNull(), "OUT")
            .otherwise("OTHER")
            .alias("region"),
        )
    )


web_bowtie_structure.__doc__ = web_bowtie_structure.__doc__.format(
    rounds=_BOWTIE_ROUNDS
)


# ---------------------------------------------------------------------------
# Differentially-private histogram release (Laplace mechanism)
# ---------------------------------------------------------------------------

_DP_EPSILON = 1.0
_DP_SEED_TAG = "#dp0"


@register(
    "data_dp_histogram",
    oracle=f"""
    WITH cells AS (
      SELECT lang, source, count(*) AS n
      FROM documents GROUP BY lang, source
    ),
    noised AS (
      SELECT lang, source, n,
        (CAST({md5_long_sql("lang || '|' || source || '" + _DP_SEED_TAG + "'")}
              % 999999 AS DOUBLE) + 1) / 1000000.0 AS u
      FROM cells
    )
    SELECT lang, source, CAST(n AS BIGINT) AS n_docs,
      {_DP_EPSILON} AS epsilon,
      round(CASE WHEN u >= 0.5 THEN -ln(1 - 2 * (u - 0.5)) / {_DP_EPSILON}
            ELSE ln(1 - 2 * (0.5 - u)) / {_DP_EPSILON} END, 6) AS noise,
      round(n + CASE WHEN u >= 0.5 THEN -ln(1 - 2 * (u - 0.5)) / {_DP_EPSILON}
            ELSE ln(1 - 2 * (0.5 - u)) / {_DP_EPSILON} END, 6) AS dp_count
    FROM noised
    """,
)
def data_dp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private corpus-composition release: per
    (lang, source) document counts with Laplace(1/epsilon) noise —
    the mechanism (Dwork et al., TCC 2006) that lets a curator
    publish WHAT IS IN THE TRAINING MIX (the histogram every data
    card reports) without any single document's presence being
    inferable: each document changes exactly one cell by 1, so
    sensitivity is 1 and per-cell Laplace(1/eps) gives eps-DP for
    the whole histogram under parallel composition.

    The noise is DETERMINISTIC here — inverse-CDF transform
    (-sgn(U) * ln(1 - 2|U|) / eps) of a hash-uniform seeded by the
    cell key, the repo's standard replayable-randomness convention
    (same as data_split_assign's hash folds and text_reservoir's
    hash priorities): the oracle can re-derive every draw, resumed
    stages release identical noise (re-drawing on retry would leak
    via averaging), and swapping in a true RNG changes one column
    expression. The hash-uniform is mapped to [1e-6, 0.999999] so
    1 - 2|U| >= 2e-6 — no ln(0) at the support edge. n_docs is kept
    beside dp_count for the oracle/eval contract; a production
    release drops it and keeps only the noised column.

    Scale: one map-side-combined count over the corpus; the noise is
    a scan projection over the CELL dictionary (|langs| x |sources|
    rows) — nothing downstream of the agg ever touches the raw
    corpus, so the release costs one aggregation at any scale."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cells = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    u = (
        (
            md5_long(F.concat("lang", F.lit("|"), "source", F.lit(_DP_SEED_TAG)))
            % 999999
        ).cast("double")
        + 1
    ) / 1000000.0
    noise = F.when(
        u >= 0.5, -F.log(1 - 2 * (u - 0.5)) / _DP_EPSILON
    ).otherwise(F.log(1 - 2 * (0.5 - u)) / _DP_EPSILON)
    return cells.select(
        "lang",
        "source",
        F.col("n").cast("long").alias("n_docs"),
        F.lit(_DP_EPSILON).alias("epsilon"),
        F.round(noise, 6).alias("noise"),
        F.round(F.col("n") + noise, 6).alias("dp_count"),
    )


# ---------------------------------------------------------------------------
# Minimum spanning backbone of the weighted host graph (Boruvka)
# ---------------------------------------------------------------------------

_MST_ROUNDS = 8  # ceil(log2(51 hosts)) = 6, +2 slack
_MST_SQ = 6  # closure squarings: paths up to 2^6 = 64 > 50 edges


def _mst_oracle() -> str:
    """Cut-property oracle: an edge is in the (unique, under the
    total key order) minimum spanning forest iff its key equals the
    minimax-bottleneck distance between its endpoints — computed by
    min-max semiring closure (squaring, the onto_closure discipline)
    over the string edge keys. The oracle thus verifies Boruvka's
    OUTPUT through an independent characterization instead of
    replaying the algorithm."""
    parts = [
        f"hg AS (SELECT src_host, dst_host, n_links FROM ({_HOST_GRAPH_SQL}))",
        """und AS (
      SELECT least(src_host, dst_host) AS a,
        greatest(src_host, dst_host) AS b,
        greatest(1, 6 - least(5, CAST(sum(n_links) AS INTEGER))) AS w
      FROM hg WHERE src_host <> dst_host GROUP BY 1, 2
    )""",
        """keyed AS (
      SELECT a, b, w, CAST(w AS VARCHAR) || '|' || a || '|' || b AS k
      FROM und
    )""",
        """d0 AS (
      SELECT a AS u, b AS v, k FROM keyed
      UNION ALL SELECT b, a, k FROM keyed
      UNION ALL SELECT node, node, '' FROM
        (SELECT a AS node FROM keyed UNION SELECT b FROM keyed)
    )""",
    ]
    for i in range(_MST_SQ):
        parts.append(
            f"""d{i + 1} AS MATERIALIZED (
      SELECT x.u, y.v, min(greatest(x.k, y.k)) AS k
      FROM d{i} x JOIN d{i} y ON x.v = y.u
      GROUP BY x.u, y.v
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT k.a AS host_a, k.b AS host_b, CAST(k.w AS INTEGER) AS w
    FROM keyed k
    JOIN d{_MST_SQ} d ON d.u = k.a AND d.v = k.b AND d.k = k.k"""
    )


@register("web_mst_backbone", oracle=_mst_oracle())
def web_mst_backbone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum spanning backbone of the weighted host link graph via
    distributed Boruvka — the cheapest edge set keeping every
    connected host reachable, under the same traversal cost as
    web_weighted_sssp (cost 1..5 falls with link multiplicity, so
    the backbone prefers strongly-linked host pairs). The operations
    use: the minimal crawl/replication backbone, and the skeleton
    single-linkage clustering of the host graph (cutting the k-1
    heaviest MSF edges yields the k single-linkage clusters).

    Ties are impossible by construction: the edge key
    '<w>|<a>|<b>' is a strict total order, making the forest UNIQUE
    — which is what lets the oracle verify through the CUT PROPERTY
    (edge in MSF <=> its key equals the min-max bottleneck distance
    between its endpoints, computed by minimax closure squaring —
    the onto_closure discipline) rather than replaying Boruvka.
    Algorithm and oracle share no structure; agreement IS the
    theorem.

    Scale shape (operators/linkgraph.boruvka_mst): per round, two
    keyed label joins + a min-out-edge window PARTITIONED by
    component + pointer-jump CC contraction; ceil(log2(V)) rounds,
    every invariant checkpointed. The corpus is touched once (the
    host-graph agg); everything after runs on the host dictionary.
    All-integer weights, string keys — nothing floats."""
    from multiomics_biocypher_kg_spark.operators.linkgraph import boruvka_mst

    hg = host_graph(href_edges(pages_from_documents(spark, sf_dir)))
    und = (
        hg.where(F.col("src_host") != F.col("dst_host"))
        .select(
            F.least("src_host", "dst_host").alias("a"),
            F.greatest("src_host", "dst_host").alias("b"),
            "n_links",
        )
        .groupBy("a", "b")
        .agg(F.sum("n_links").alias("n"))
        .select(
            "a",
            "b",
            F.greatest(
                F.lit(1), F.lit(6) - F.least(F.lit(5), F.col("n").cast("int"))
            ).alias("w"),
        )
    )
    keyed = und.select(
        "a",
        "b",
        "w",
        F.concat(
            F.col("w").cast("string"), F.lit("|"), F.col("a"), F.lit("|"), F.col("b")
        ).alias("key"),
    ).localCheckpoint()
    mst = boruvka_mst(keyed.select("a", "b", "key"), rounds=_MST_ROUNDS)
    return mst.join(F.broadcast(keyed), ["a", "b", "key"]).select(
        F.col("a").alias("host_a"),
        F.col("b").alias("host_b"),
        F.col("w").cast("int").alias("w"),
    )


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov test over document lengths
# ---------------------------------------------------------------------------

_KS_COEF = 1.358  # alpha = 0.05 two-sample coefficient
_KS_LANG = "en"


@register(
    "text_ks_lengths",
    oracle=f"""
    WITH lens AS (
      SELECT len(string_split(text, ' ')) AS n, (lang = '{_KS_LANG}') AS in_a
      FROM documents
    ),
    counts AS (
      SELECT n,
        sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS ca,
        sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS cb
      FROM lens GROUP BY n
    ),
    tot AS (
      SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
      FROM counts
    ),
    cum AS (
      SELECT n,
        sum(ca) OVER (ORDER BY n ROWS BETWEEN UNBOUNDED PRECEDING
          AND CURRENT ROW) AS cum_a,
        sum(cb) OVER (ORDER BY n ROWS BETWEEN UNBOUNDED PRECEDING
          AND CURRENT ROW) AS cum_b
      FROM counts
    ),
    diffs AS (
      SELECT n,
        abs(CAST(cum_a AS DOUBLE) / na - CAST(cum_b AS DOUBLE) / nb) AS d
      FROM cum CROSS JOIN tot
    ),
    best AS (
      SELECT *, row_number() OVER (ORDER BY round(d, 6) DESC, n ASC) AS rk
      FROM diffs
    )
    SELECT t.na AS n_a, t.nb AS n_b,
      round(b.d, 6) AS ks_stat,
      CAST(b.n AS INTEGER) AS ks_at_value,
      round({_KS_COEF} * sqrt(CAST(t.na + t.nb AS DOUBLE) / (t.na * t.nb)), 6)
        AS critical_005,
      b.d > {_KS_COEF} * sqrt(CAST(t.na + t.nb AS DOUBLE) / (t.na * t.nb))
        AS reject
    FROM best b CROSS JOIN tot t WHERE b.rk = 1
    """,
)
def text_ks_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test: is the token-length
    distribution of '{lang}' documents drawn from the same
    distribution as the rest of the corpus? D = max over values of
    |ECDF_A - ECDF_B|, rejected at alpha=0.05 when D exceeds
    {coef} * sqrt((n_a+n_b)/(n_a*n_b)) — the distribution-free test
    a curation pipeline runs before pooling sources/languages into
    one length-bucketed sampler (mean/variance checks miss shape
    differences; KS is sensitive to the whole CDF). Complements the
    parametric monitors (CUSUM on means, MAD on outliers) with an
    exact nonparametric two-sample answer.

    Scale shape: corpus-sized work is ONE map-side-combined count
    agg keyed by token-length value; the ECDF cumulative windows run
    over the VALUE DICTIONARY (distinct lengths — bounded by the
    max document length, thousands of rows at any corpus size, the
    ev_changepoint daily-table defense), and the argmax is
    rank-by-ROUNDED-D with smallest-value tiebreak. ECDF ratios are
    exact integer cumulative counts over fixed denominators — the
    only floats are two divisions and one sqrt (IEEE-exact in both
    engines)."""
    docs = _docs(spark, sf_dir)
    lens = docs.select(
        F.size(F.split("text", " ")).alias("n"),
        (F.col("lang") == _KS_LANG).alias("in_a"),
    )
    counts = (
        lens.groupBy("n")
        .agg(
            F.sum(F.when(F.col("in_a"), 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("in_a"), 0).otherwise(1)).alias("cb"),
        )
        # value-dictionary-sized; checkpointed so totals + ECDF
        # windows don't each re-inline the corpus scan
        .localCheckpoint()
    )
    tot = counts.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
    )
    w = Window.orderBy("n").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = counts.select(
        "n",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    diffs = cum.crossJoin(F.broadcast(tot)).select(
        "n",
        "na",
        "nb",
        F.abs(
            F.col("cum_a").cast("double") / F.col("na")
            - F.col("cum_b").cast("double") / F.col("nb")
        ).alias("d"),
    )
    rk = F.row_number().over(
        Window.orderBy(F.round(F.col("d"), 6).desc(), F.col("n").asc())
    )
    crit = F.lit(_KS_COEF) * F.sqrt(
        (F.col("na") + F.col("nb")).cast("double") / (F.col("na") * F.col("nb"))
    )
    return (
        diffs.withColumn("rk", rk)
        .where(F.col("rk") == 1)
        .select(
            F.col("na").alias("n_a"),
            F.col("nb").alias("n_b"),
            F.round("d", 6).alias("ks_stat"),
            F.col("n").cast("int").alias("ks_at_value"),
            F.round(crit, 6).alias("critical_005"),
            (F.col("d") > crit).alias("reject"),
        )
    )


text_ks_lengths.__doc__ = text_ks_lengths.__doc__.format(
    lang=_KS_LANG, coef=_KS_COEF
)


# ---------------------------------------------------------------------------
# Kendall tau-b rank correlation over host-graph degrees
# ---------------------------------------------------------------------------


@register(
    "web_rank_correlation",
    oracle=f"""
    WITH hg AS (SELECT src_host, dst_host, n_links
                FROM ({_HOST_GRAPH_SQL}) WHERE src_host <> dst_host),
    outd AS (
      SELECT src_host AS host, count(DISTINCT dst_host) AS x FROM hg GROUP BY 1
    ),
    ind AS (
      SELECT dst_host AS host, count(DISTINCT src_host) AS y FROM hg GROUP BY 1
    ),
    m AS (
      SELECT coalesce(o.host, i.host) AS host,
        CAST(coalesce(o.x, 0) AS BIGINT) AS x,
        CAST(coalesce(i.y, 0) AS BIGINT) AS y
      FROM outd o FULL OUTER JOIN ind i ON o.host = i.host
    ),
    pairs AS (
      SELECT
        CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END AS conc,
        CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END AS disc,
        CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tie_x,
        CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS tie_y
      FROM m a JOIN m b ON a.host < b.host
    ),
    agg AS (
      SELECT CAST((SELECT count(*) FROM m) AS BIGINT) AS n_hosts,
        CAST(count(*) AS BIGINT) AS n_pairs,
        CAST(sum(conc) AS BIGINT) AS concordant,
        CAST(sum(disc) AS BIGINT) AS discordant,
        CAST(sum(tie_x) AS BIGINT) AS ties_x,
        CAST(sum(tie_y) AS BIGINT) AS ties_y
      FROM pairs
    )
    SELECT n_hosts, n_pairs, concordant, discordant, ties_x, ties_y,
      round(CAST(concordant - discordant AS DOUBLE)
            / sqrt(CAST(n_pairs - ties_x AS DOUBLE)
                   * CAST(n_pairs - ties_y AS DOUBLE)), 6) AS tau_b
    FROM agg
    """,
)
def web_rank_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation between each host's
    out-degree and in-degree (distinct neighbors, self-loops
    excluded) — "are the hubs also the authorities?" asked with the
    rank-correlation machinery the repo's monitor family lacked:
    tau-b is distribution-free, robust to the heavy-tailed degree
    distributions where Pearson is meaningless, and tie-corrected
    (degree ties are pervasive on small integer scales) —
    tau_b = (C - D) / sqrt((n0 - Tx)(n0 - Ty)). The same operator
    shape correlates ANY two per-entity metrics (PageRank vs
    in-degree, quality vs length) — degrees keep the fixture
    all-integer so every count is exact and the only floats are one
    division and one sqrt.

    Scale shape: degree metrics are two map-side-combined aggs over
    the host-graph dictionary; the pair enumeration is the
    host-DICTIONARY self-join (V^2/2 pairs over the bounded host
    table — the exact-small-graph complement the repo's sketch
    family (hyperanf, simrank) exists to avoid at web scale; the
    contract pins this operator to dictionary-sized entity sets, and
    the O(n log n) merge-sort tau exists when V grows). Output is
    one row of integer counts + tau_b."""
    hg = host_graph(href_edges(pages_from_documents(spark, sf_dir))).where(
        F.col("src_host") != F.col("dst_host")
    )
    outd = hg.groupBy(F.col("src_host").alias("host")).agg(
        F.countDistinct("dst_host").alias("x")
    )
    ind = hg.groupBy(F.col("dst_host").alias("host")).agg(
        F.countDistinct("src_host").alias("y")
    )
    m = (
        outd.join(ind, "host", "full_outer")
        .select(
            "host",
            F.coalesce(F.col("x"), F.lit(0)).cast("long").alias("x"),
            F.coalesce(F.col("y"), F.lit(0)).cast("long").alias("y"),
        )
        # host-dictionary sized; checkpointed: consumed by both the
        # count and both sides of the pair self-join
        .localCheckpoint()
    )
    a = m.select(F.col("host").alias("ha"), F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = m.select(F.col("host").alias("hb"), F.col("x").alias("xb"), F.col("y").alias("yb"))
    prod = (F.col("xa") - F.col("xb")) * (F.col("ya") - F.col("yb"))
    pairs = a.join(b, F.col("ha") < F.col("hb")).select(
        F.when(prod > 0, 1).otherwise(0).alias("conc"),
        F.when(prod < 0, 1).otherwise(0).alias("disc"),
        F.when(F.col("xa") == F.col("xb"), 1).otherwise(0).alias("tie_x"),
        F.when(F.col("ya") == F.col("yb"), 1).otherwise(0).alias("tie_y"),
    )
    n_hosts = m.count()  # dictionary-sized driver constant
    agg = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("conc").cast("long").alias("concordant"),
        F.sum("disc").cast("long").alias("discordant"),
        F.sum("tie_x").cast("long").alias("ties_x"),
        F.sum("tie_y").cast("long").alias("ties_y"),
    )
    tau = (F.col("concordant") - F.col("discordant")).cast("double") / F.sqrt(
        (F.col("n_pairs") - F.col("ties_x")).cast("double")
        * (F.col("n_pairs") - F.col("ties_y")).cast("double")
    )
    return agg.select(
        F.lit(n_hosts).cast("long").alias("n_hosts"),
        "n_pairs",
        "concordant",
        "discordant",
        "ties_x",
        "ties_y",
        F.round(tau, 6).alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# Dataset card (the one-row corpus summary a release ships)
# ---------------------------------------------------------------------------

from multiomics_biocypher_kg_spark.functions import textstats as _ts  # noqa: E402

_CARD_BAND = 50  # |mean milli-logit| >= 50 => high/low (the shared scheme)


@register(
    "data_dataset_card",
    oracle=f"""
    WITH proj AS (
      SELECT lang, source,
        len(string_split(text, ' ')) AS n_tokens,
        length(text) AS n_chars,
        md5(text) AS h,
        CASE WHEN list_sum(list_transform(string_split(text, ' '),
               t -> {md5_long_sql('t')} % 2001 - 1000))
             >= {_CARD_BAND} * len(string_split(text, ' '))
          THEN 1 ELSE 0 END AS is_high
      FROM documents
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
        CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        quantile_cont(n_tokens, 0.5) AS median_tokens,
        CAST(count(DISTINCT h) AS BIGINT) AS n_unique_texts,
        CAST(sum(n_chars) AS BIGINT) AS total_chars,
        CAST(sum(is_high) AS BIGINT) AS n_high
      FROM proj
    ),
    top AS (
      SELECT lang AS top_lang, count(*) AS top_n
      FROM proj GROUP BY lang
      ORDER BY count(*) DESC, lang ASC LIMIT 1
    )
    SELECT a.n_docs, a.n_langs, a.n_sources, t.top_lang,
      round(CAST(t.top_n AS DOUBLE) / a.n_docs, 6) AS top_lang_share,
      a.total_tokens,
      round(CAST(a.total_tokens AS DOUBLE) / a.n_docs, 6) AS mean_tokens,
      round(a.median_tokens, 6) AS median_tokens,
      round(1.0 - CAST(a.n_unique_texts AS DOUBLE) / a.n_docs, 6)
        AS dup_rate,
      round(CAST(a.n_high AS DOUBLE) / a.n_docs, 6) AS pct_quality_high,
      round(CAST(a.total_chars AS DOUBLE) / a.n_docs, 6) AS mean_chars
    FROM agg a CROSS JOIN top t
    """,
)
def data_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DATASET CARD composition table — the one-row summary
    every corpus release publishes (Datasheets for Datasets, Gebru
    et al. 2021): size, language spread and the dominant language's
    share, token totals and central tendency (mean + EXACT median,
    the percentile() <-> quantile_cont convention), the exact-hash
    duplication rate, the high-quality-band share (the shared
    milli-logit banding scheme), and mean bytes — the numbers a
    consumer reads before the first query, and the numbers the DP
    histogram (data_dp_histogram) releases privately when the
    corpus is sensitive. Composes what the repo measures piecemeal
    (text_stats, dedup_savings_report, curation gates) into the
    artifact a release actually ships.

    Scale shape: TWO corpus scans — one wide projection feeding a
    single aggregation (conditional counts, exact distincts, exact
    percentile), and the language-mode scan (dictionary agg + a
    1-row TakeOrdered) — everything after is 1-row arithmetic; no
    windows over the corpus, no joins beyond the 1-row cross."""
    docs = _docs(spark, sf_dir)
    n = _ts.token_count(F.col("text"))
    s = _ts.quality_logit_milli(F.col("text"))
    proj = docs.select(
        "lang",
        "source",
        n.alias("n_tokens"),
        F.length("text").alias("n_chars"),
        F.md5("text").alias("h"),
        F.when(s >= _CARD_BAND * n, 1).otherwise(0).alias("is_high"),
    )
    agg = proj.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.percentile("n_tokens", 0.5).alias("median_tokens"),
        F.countDistinct("h").cast("long").alias("n_unique_texts"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum("is_high").cast("long").alias("n_high"),
    )
    top = (
        proj.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("top_n"))
        .orderBy(F.col("top_n").desc(), F.col("lang").asc())
        .limit(1)
        .select(F.col("lang").alias("top_lang"), "top_n")
    )
    return agg.crossJoin(F.broadcast(top)).select(
        "n_docs",
        "n_langs",
        "n_sources",
        "top_lang",
        F.round(F.col("top_n").cast("double") / F.col("n_docs"), 6).alias(
            "top_lang_share"
        ),
        "total_tokens",
        F.round(
            F.col("total_tokens").cast("double") / F.col("n_docs"), 6
        ).alias("mean_tokens"),
        F.round("median_tokens", 6).alias("median_tokens"),
        F.round(
            1.0 - F.col("n_unique_texts").cast("double") / F.col("n_docs"), 6
        ).alias("dup_rate"),
        F.round(F.col("n_high").cast("double") / F.col("n_docs"), 6).alias(
            "pct_quality_high"
        ),
        F.round(
            F.col("total_chars").cast("double") / F.col("n_docs"), 6
        ).alias("mean_chars"),
    )


# ---------------------------------------------------------------------------
# Effective diameter from the neighborhood function
# ---------------------------------------------------------------------------


def _eff_diam_case(n0: str, n1: str, n2: str, n3: str, target: str) -> str:
    return f"""CASE
        WHEN {n1} >= {target}
          THEN 0.0 + ({target} - {n0}) / ({n1} - {n0})
        WHEN {n2} >= {target}
          THEN 1.0 + ({target} - {n1}) / ({n2} - {n1})
        ELSE 2.0 + ({target} - {n2}) / ({n3} - {n2}) END"""


@register(
    "web_effective_diameter",
    oracle=f"""
    WITH anf AS ({_hyperanf_oracle_sql()}),
    nh AS (
      SELECT
        CAST(count(*) FILTER (h = 1) AS BIGINT) AS n_nodes,
        CAST(sum(n_exact) FILTER (h = 1) AS BIGINT) AS n1,
        CAST(sum(n_exact) FILTER (h = 2) AS BIGINT) AS n2,
        CAST(sum(n_exact) FILTER (h = 3) AS BIGINT) AS n3,
        list_reduce(list(CAST(n_est AS DOUBLE) ORDER BY node)
                    FILTER (h = 1), (x, y) -> x + y) AS e1,
        list_reduce(list(CAST(n_est AS DOUBLE) ORDER BY node)
                    FILTER (h = 2), (x, y) -> x + y) AS e2,
        list_reduce(list(CAST(n_est AS DOUBLE) ORDER BY node)
                    FILTER (h = 3), (x, y) -> x + y) AS e3
      FROM anf
    )
    SELECT n_nodes, n1 AS n1_exact, n2 AS n2_exact, n3 AS n3_exact,
      round({_eff_diam_case('CAST(n_nodes AS DOUBLE)',
                            'CAST(n1 AS DOUBLE)', 'CAST(n2 AS DOUBLE)',
                            'CAST(n3 AS DOUBLE)',
                            '0.9 * CAST(n3 AS DOUBLE)')}, 6)
        AS eff_diameter_exact,
      round({_eff_diam_case('CAST(n_nodes AS DOUBLE)', 'e1', 'e2', 'e3',
                            '0.9 * e3')}, 6) AS eff_diameter_est
    FROM nh
    """,
)
def web_effective_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 90% EFFECTIVE DIAMETER (Leskovec et al. 2005; the number
    'four degrees of separation' reports): the interpolated radius h
    at which the neighborhood function N(h) = sum over nodes of
    |B(v, h)| reaches 90% of its horizon value — computed TWICE,
    from the exact ball sizes and from the HyperANF sketch estimate
    (web_hyperanf's per-node rows), so the query doubles as the
    eval of whether the sketch answers the macroscopic question it
    exists for (at 10^12 nodes only the sketch column survives —
    the declared contract). Linear interpolation between the
    bracketing radii, N(0) = |V|.

    Scale shape: everything downstream of the (already keyed-agg)
    HyperANF rows is a 3-row-per-h reduction; the sketch-side sums
    fold in sorted-node order (the ev_markov_stationary discipline —
    an unordered float sum of per-node estimates would be the one
    cross-engine leak in an otherwise exact pipeline)."""
    from multiomics_biocypher_kg_spark.operators.graphstats import (
        hyperanf_estimates,
    )

    anf = hyperanf_estimates(
        _host_edges(spark, sf_dir), max_h=_ANF_H, k_trials=_ANF_K,
        modulus=_ANF_R,
    ).localCheckpoint()

    def fold_est(h):
        return F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("h") == h,
                        F.struct(F.col("node").alias("o"),
                                 F.col("n_est").alias("v")),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        )

    nh = anf.agg(
        F.sum(F.when(F.col("h") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_nodes"),
        F.sum(F.when(F.col("h") == 1, F.col("n_exact")))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("h") == 2, F.col("n_exact")))
        .cast("long")
        .alias("n2"),
        F.sum(F.when(F.col("h") == 3, F.col("n_exact")))
        .cast("long")
        .alias("n3"),
        fold_est(1).alias("e1"),
        fold_est(2).alias("e2"),
        fold_est(3).alias("e3"),
    )

    def diam(n0, n1, n2, n3, target):
        return (
            F.when(n1 >= target, 0.0 + (target - n0) / (n1 - n0))
            .when(n2 >= target, 1.0 + (target - n1) / (n2 - n1))
            .otherwise(2.0 + (target - n2) / (n3 - n2))
        )

    n0 = F.col("n_nodes").cast("double")
    ne = [F.col(c).cast("double") for c in ("n1", "n2", "n3")]
    ee = [F.col(c) for c in ("e1", "e2", "e3")]
    return nh.select(
        "n_nodes",
        F.col("n1").alias("n1_exact"),
        F.col("n2").alias("n2_exact"),
        F.col("n3").alias("n3_exact"),
        F.round(diam(n0, ne[0], ne[1], ne[2], 0.9 * ne[2]), 6).alias(
            "eff_diameter_exact"
        ),
        F.round(diam(n0, ee[0], ee[1], ee[2], 0.9 * ee[2]), 6).alias(
            "eff_diameter_est"
        ),
    )
