"""Round-4 post-freeze batch 2: KG-embedding scoring, IVF-PQ ADC
search, RDF export/reification, path composition, seed-distance BFS,
and two corpus-statistics gates (Zipf fit, CCNet-style perplexity
buckets).

These extend the KG-construction surface the reference's BioCypher
ETL implies but never distributes (reference analogs cited per
operator): once triples are materialized at 10^12-document scale,
the next pipeline stages are embedding-based triple plausibility
(TransE), compressed-vector search over entity embeddings (IVF-PQ),
serialization to an interchange format (N-Triples; the reference's
analog is its Neo4j admin-import CSV emit, create_knowledge_graph.py),
and link-distance curation over the crawl's host graph.

Registered AFTER the round-4 driver-window freeze (the first-50
slots are exactly filled by the 43 never-driver-checked round-4
queries + the 7 reimplemented veterans — see registry.py). Every
query here is oracle-paired and runs in the local sf0.001 sweep
(tests/test_queries_oracle.py) this round; rotate all of them to the
top of _DRIVER_WINDOW_FIRST in round 5 alongside the batch-1
post-freeze list in registry_web/registry_scale_ops.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.functions.hashing import (
    md5_long,
    md5_long_sql,
)
from multiomics_biocypher_kg_spark.oracle_fragments import TRIPLES_SQL
from multiomics_biocypher_kg_spark.registry import _pipeline, register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from multiomics_biocypher_kg_spark.registry import kg_triples

    return kg_triples(spark, sf_dir)


# ---------------------------------------------------------------------------
# IVF-PQ ANN with asymmetric distance computation (ADC)
# ---------------------------------------------------------------------------

_PQ_M = 4
_PQ_K = 8
_PQ_SUB_D = 16
_IVF_LISTS = 8
_IVF_PROBE = 3
_IVF_ITERS = 2
_ADC_TOPK = 5


def _pq_sub_assign_sql(s: int, cent: str, out: str) -> str:
    """One nearest-codeword assignment CTE pair restricted to
    subspace ``s`` (squared-L2 argmin, ties -> smallest code)."""
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


def _ivfpq_adc_sql() -> str:
    """DuckDB mirror of simsearch.ivfpq_topk: the coarse Lloyd chain
    (shared _lloyd_prefix_parts — ends at afinal/afinal_d), one
    fixed-init Lloyd refine per PQ subspace (the _pq_sql chain), then
    ADC: probe the n_probe nearest lists and approximate each
    candidate's distance as the left-associative sum of the query's
    per-subspace LUT entries at the candidate's codes. ``pq{s}_af_d``
    — every vector's distance to every final codeword — IS the
    per-query lookup table, so the oracle value-gates codes, LUTs,
    and the ADC ranking in one statement."""
    from multiomics_biocypher_kg_spark.oracle_fragments import (
        _lloyd_prefix_parts,
    )

    parts = _lloyd_prefix_parts(_IVF_LISTS, _IVF_ITERS)
    for s in range(_PQ_M):
        lo = s * _PQ_SUB_D
        parts.append(f"""
    pq{s}_ex AS (
      SELECT vec_id, dim, x FROM exploded
      WHERE dim > {lo} AND dim <= {lo + _PQ_SUB_D}
    ),
    pq{s}_cent0 AS (
      SELECT se.list_id, e.dim, e.x AS c
      FROM seeds se JOIN pq{s}_ex e ON se.vec_id = e.vec_id
    )""")
        parts.append(_pq_sub_assign_sql(s, f"pq{s}_cent0", f"pq{s}_a1"))
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
        parts.append(_pq_sub_assign_sql(s, f"pq{s}_cent1", f"pq{s}_af"))
    code_joins = "\n".join(
        f"      JOIN pq{s}_af c{s} ON c{s}.vec_id = c.neighbor_id\n"
        f"      JOIN pq{s}_af_d d{s} ON d{s}.vec_id = c.query_id"
        f" AND d{s}.list_id = c{s}.list_id"
        for s in range(_PQ_M)
    )
    approx = " + ".join(f"d{s}.d" for s in range(_PQ_M))
    parts.append(f"""
    probes AS (
      SELECT vec_id AS query_id, list_id FROM (
        SELECT vec_id, list_id,
          row_number() OVER (PARTITION BY vec_id
                             ORDER BY d ASC, list_id ASC) AS rn
        FROM afinal_d) WHERE rn <= {_IVF_PROBE}
    ),
    cands AS (
      SELECT p.query_id, a.vec_id AS neighbor_id
      FROM probes p JOIN afinal a ON p.list_id = a.list_id
      WHERE a.vec_id <> p.query_id
    ),
    adc AS (
      SELECT c.query_id, c.neighbor_id, {approx} AS approx
      FROM cands c
{code_joins}
    )
    SELECT query_id, neighbor_id,
      round(approx, 6) AS approx_sq_dist, rank
    FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        ORDER BY approx ASC, neighbor_id ASC) AS INTEGER) AS rank
      FROM adc) WHERE rank <= {_ADC_TOPK}""")
    return "WITH " + ",".join(parts)


@register("emb_ivfpq_adc", oracle=_ivfpq_adc_sql())
def emb_ivfpq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ search with asymmetric distance computation
    (operators.simsearch.ivfpq_topk) — the composition of the
    existing IVF coarse index (ann_ivf_topk) and PQ codebooks
    (emb_pq_codes) into the billion-vector ANN architecture: raw
    vectors never shuffle; the database side is (id, list_id, m
    3-bit codes), codebooks are literal expressions, and approx
    distance is a per-query LUT sum. One equi-join on list_id is the
    only shuffle before the per-query top-k window."""
    from multiomics_biocypher_kg_spark.operators.simsearch import ivfpq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ivfpq_topk(
        emb,
        k=_ADC_TOPK,
        n_lists=_IVF_LISTS,
        n_probe=_IVF_PROBE,
        coarse_iters=_IVF_ITERS,
        m=_PQ_M,
        pq_k=_PQ_K,
        pq_iters=1,
    )


# ---------------------------------------------------------------------------
# TransE triple plausibility scoring (hash-derived embeddings)
# ---------------------------------------------------------------------------

_TE_DIM = 8
_TE_MOD = 1000


def _emb_dim_sql(name_expr: str, tag: str, j: int) -> str:
    h = md5_long_sql(f"{name_expr} || '#{tag}{j}'")
    return f"(CAST({h} % {_TE_MOD} AS DOUBLE) / {_TE_MOD}.0 - 0.5)"


def _emb_dim_col(col, tag: str, j: int):
    h = md5_long(F.concat(col, F.lit(f"#{tag}{j}")))
    return (h % _TE_MOD).cast("double") / _TE_MOD - F.lit(0.5)


def _transe_sql() -> str:
    def sq_sum(t_tag: str, t_expr: str) -> str:
        terms = [
            f"(({_emb_dim_sql('subj', 'e', j)} + {_emb_dim_sql('pred', 'r', j)}"
            f" - {_emb_dim_sql(t_expr, t_tag, j)})"
            f" * ({_emb_dim_sql('subj', 'e', j)} + {_emb_dim_sql('pred', 'r', j)}"
            f" - {_emb_dim_sql(t_expr, t_tag, j)}))"
            for j in range(_TE_DIM)
        ]
        return "(" + " + ".join(terms) + ")"

    return f"""
    WITH t AS ({TRIPLES_SQL}),
    scored AS (
      SELECT subj, pred, obj,
        -sqrt({sq_sum('e', 'obj')}) AS pos_raw,
        -sqrt({sq_sum('n', 'obj')}) AS neg_raw
      FROM t
    )
    SELECT subj, pred, obj,
      round(pos_raw, 6) AS transe_score,
      round(neg_raw, 6) AS neg_score,
      round(pos_raw - neg_raw, 6) AS margin,
      (pos_raw - neg_raw) > 0 AS plausible
    FROM scored
    """


@register("kg_transe_score", oracle=_transe_sql())
def kg_transe_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TransE triple plausibility (Bordes et al., NIPS 2013): score
    -||h + r - t||_2 per materialized triple, against a corrupted-
    tail negative (tail embedding re-derived under a different hash
    tag — deterministic negative sampling, same convention as
    kg_negative_samples). Embeddings are DERIVED per dim from md5 of
    the node/relation name, so the whole scorer is a pure map-side
    expression chain — no parameter table, no shuffle, and (unlike a
    trained-model join) the oracle can re-derive every component.
    Swapping in trained vectors changes the embedding source to a
    broadcast dictionary join; the scoring expression — the fixed-
    order add chain both engines mirror — is unchanged. At 10^12
    triples this is the shape of scoring: embeddings resolved in the
    scan projection, one pass, no aggregation."""
    trip = _triples(spark, sf_dir).select("subj", "pred", "obj")

    def sq_sum(col_tag: str):
        terms = [
            (
                _emb_dim_col(F.col("subj"), "e", j)
                + _emb_dim_col(F.col("pred"), "r", j)
                - _emb_dim_col(F.col("obj"), col_tag, j)
            )
            for j in range(_TE_DIM)
        ]
        return reduce(lambda a, b: a + b, [t * t for t in terms])

    pos = -F.sqrt(sq_sum("e"))
    neg = -F.sqrt(sq_sum("n"))
    return trip.select(
        "subj",
        "pred",
        "obj",
        F.round(pos, 6).alias("transe_score"),
        F.round(neg, 6).alias("neg_score"),
        F.round(pos - neg, 6).alias("margin"),
        ((pos - neg) > 0).alias("plausible"),
    )


# ---------------------------------------------------------------------------
# 2-hop path composition over the heterogeneous KG edge union
# ---------------------------------------------------------------------------


def _path_2hop_sql() -> str:
    from multiomics_biocypher_kg_spark.hetero import hetero_edges_ctes

    return f"""
    WITH {hetero_edges_ctes()}
    SELECT t1.subj, t1.pred || '>' || t2.pred AS pred_path,
      t2.obj AS obj, CAST(count(DISTINCT t1.obj) AS BIGINT) AS n_mid
    FROM edges t1 JOIN edges t2 ON t1.obj = t2.subj
    GROUP BY t1.subj, t1.pred || '>' || t2.pred, t2.obj
    """


@register("kg_path_2hop", oracle=_path_2hop_sql())
def kg_path_2hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate-composed 2-hop paths over the HETEROGENEOUS edge
    union — materialized triples (mentions / same_as_canonical) plus
    the web-locality edges (host -hosts-> page, host -links_to->
    host) — the relation-composition primitive KG completion and
    rule mining start from (reference analog: the post-import
    Cypher's multi-hop MATCH patterns, scripts/post-import.cypher).
    The mention/same-as id spaces are deliberately disjoint in this
    corpus, so composition happens ACROSS edge types
    (links_to>links_to, links_to>hosts, hosts>mentions) — the
    typed-path shape Biolink association chains take. The self-join
    is one equi-join on the shared node id — co-partitioned when the
    edge table is bucketed by subj/obj (SCALE.md) — and the composed
    edge count is one groupBy. Hub nodes fan out quadratically
    across the join; at 100 TB the same AQE-skew / salt discipline
    as kg_host_rollup_salted applies on the join key."""
    from multiomics_biocypher_kg_spark.hetero import hetero_edges_df

    edges = hetero_edges_df(spark, sf_dir)
    t1 = edges.select(
        F.col("subj"), F.col("pred").alias("p1"), F.col("obj").alias("mid")
    )
    t2 = edges.select(
        F.col("subj").alias("mid"), F.col("pred").alias("p2"), F.col("obj")
    )
    return (
        t1.join(t2, "mid")
        .groupBy(
            "subj",
            F.concat("p1", F.lit(">"), "p2").alias("pred_path"),
            "obj",
        )
        .agg(F.countDistinct("mid").alias("n_mid"))
    )


# ---------------------------------------------------------------------------
# N-Triples export + statement reification (RDF interchange surface)
# ---------------------------------------------------------------------------

_NT_ENT_PREFIX = "http://kg.example.org/entity/"
_NT_PROP_PREFIX = "http://kg.example.org/prop/"
_NT_SHARDS = 16


def _iri_sql(x: str) -> str:
    return (
        f"CASE WHEN {x} LIKE 'https://%' THEN {x} "
        f"ELSE '{_NT_ENT_PREFIX}' || replace({x}, ':', '%3A') END"
    )


def _iri_col(c):
    return F.when(c.startswith("https://"), c).otherwise(
        F.concat(F.lit(_NT_ENT_PREFIX), F.replace(c, F.lit(":"), F.lit("%3A")))
    )


@register(
    "kg_nt_export",
    oracle=f"""
    WITH t AS ({TRIPLES_SQL}),
    lines AS (
      SELECT edge_id,
        '<' || {_iri_sql('subj')} || '> <{_NT_PROP_PREFIX}' || pred
          || '> <' || {_iri_sql('obj')} || '> .' AS nt_line
      FROM t
    )
    SELECT edge_id, nt_line,
      CAST({md5_long_sql('nt_line')} % {_NT_SHARDS} AS INTEGER) AS shard
    FROM lines
    """,
)
def kg_nt_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-Triples serialization of the materialized triple table —
    the RDF interchange sink (reference analog: the Neo4j
    admin-import CSV emit in create_knowledge_graph.py — same role,
    W3C format). IRIs: page subjects are already https urls; entity
    ids percent-encode the CURIE colon under a fixed entity
    namespace. Shard assignment is a content-hash mod — the
    write-side partitioning column (partitionBy('shard')) that keeps
    output files balanced regardless of subject skew, exactly the
    curation_shards discipline. Pure map: serialization and shard
    live in the scan projection; at 10^12 triples the only cost is
    the write."""
    t = _triples(spark, sf_dir)
    line = F.concat(
        F.lit("<"),
        _iri_col(F.col("subj")),
        F.lit("> <" + _NT_PROP_PREFIX),
        F.col("pred"),
        F.lit("> <"),
        _iri_col(F.col("obj")),
        F.lit("> ."),
    )
    return t.select(
        "edge_id",
        line.alias("nt_line"),
        (md5_long(line) % _NT_SHARDS).cast("int").alias("shard"),
    )


@register(
    "kg_reify_statements",
    oracle=f"""
    WITH t AS ({TRIPLES_SQL}),
    s AS (
      SELECT 'stmt:' || substr(md5(edge_id), 1, 12) AS stmt_id,
        subj, pred, obj
      FROM t
    )
    SELECT stmt_id, 'rdf:subject' AS role, subj AS value FROM s
    UNION ALL
    SELECT stmt_id, 'rdf:predicate', pred FROM s
    UNION ALL
    SELECT stmt_id, 'rdf:object', obj FROM s
    """,
)
def kg_reify_statements(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RDF statement reification: each (subj, pred, obj) becomes a
    statement node (deterministic content-hash id) with
    rdf:subject/predicate/object role edges — the provenance-ready
    modeling the reference's evidence-bearing edges imply (its edge
    property dicts carry per-statement metadata; reification is the
    RDF-native equivalent). Map-only 3x explode via a literal
    role/value array — no shuffle; qualifier edges (timestamps,
    sources) attach to stmt_id downstream exactly like
    kg_triple_temporal's evidence rows."""
    t = _triples(spark, sf_dir)
    stmt = F.concat(F.lit("stmt:"), F.substring(F.md5("edge_id"), 1, 12))
    pairs = F.array(
        F.struct(F.lit("rdf:subject").alias("role"), F.col("subj").alias("value")),
        F.struct(F.lit("rdf:predicate").alias("role"), F.col("pred").alias("value")),
        F.struct(F.lit("rdf:object").alias("role"), F.col("obj").alias("value")),
    )
    return t.select(stmt.alias("stmt_id"), F.explode(pairs).alias("rv")).select(
        "stmt_id", F.col("rv.role").alias("role"), F.col("rv.value").alias("value")
    )


# ---------------------------------------------------------------------------
# Seed-distance BFS over the host link graph
# ---------------------------------------------------------------------------

_BFS_ROUNDS = 6


def _seed_distance_sql() -> str:
    from multiomics_biocypher_kg_spark.registry_web import _HOST_GRAPH_SQL

    seed_pred = md5_long_sql("node") + " % 3 = 0"
    parts = [
        f"hg AS ({_HOST_GRAPH_SQL})",
        "nodes AS (SELECT DISTINCT src_host AS node FROM hg "
        "UNION SELECT DISTINCT dst_host FROM hg)",
        f"d0 AS (SELECT node, 0 AS dist FROM nodes WHERE {seed_pred})",
    ]
    for i in range(_BFS_ROUNDS):
        parts.append(f"""
    d{i + 1} AS (
      SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM d{i}
        UNION ALL
        SELECT hg.dst_host AS node, d.dist + 1 AS dist
        FROM d{i} d JOIN hg ON hg.src_host = d.node
      ) GROUP BY node
    )""")
    return (
        "WITH "
        + ",".join(parts)
        + f"""
    SELECT d.node AS host, CAST(d.dist AS INTEGER) AS dist,
      ({seed_pred.replace('node', 'd.node')}) AS is_seed
    FROM d{_BFS_ROUNDS} d"""
    )


@register("web_seed_distance", oracle=_seed_distance_sql())
def web_seed_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed BFS hop distance from the md5-selected seed hosts
    (same seed convention as web_trustrank) over the host link graph
    — the crawl-frontier curation signal ("how many link hops from a
    trusted seed") that complements TrustRank's mass propagation
    with an interpretable integer. Fixed horizon of {rounds}
    relaxation rounds (hosts farther than the horizon are excluded
    by contract, like the fixed-iteration PageRank family); each
    round is one frontier equi-join + a min groupBy, all integers —
    no float drift, no convergence probe. At web scale the frontier
    join broadcasts while the frontier is small and the horizon
    bounds total rounds regardless of graph size."""
    from multiomics_biocypher_kg_spark.operators.linkgraph import (
        host_graph,
        href_edges,
    )
    from multiomics_biocypher_kg_spark.sources.pages import pages_from_documents

    hg = host_graph(href_edges(pages_from_documents(spark, sf_dir))).select(
        "src_host", "dst_host"
    )
    nodes = (
        hg.select(F.col("src_host").alias("node"))
        .union(hg.select("dst_host"))
        .distinct()
    )
    is_seed = md5_long(F.col("node")) % 3 == 0
    d = nodes.where(is_seed).select("node", F.lit(0).alias("dist"))
    for _ in range(_BFS_ROUNDS):
        step = d.join(hg, d["node"] == hg["src_host"]).select(
            F.col("dst_host").alias("node"), (F.col("dist") + 1).alias("dist")
        )
        d = d.union(step).groupBy("node").agg(F.min("dist").alias("dist"))
    return d.select(
        F.col("node").alias("host"),
        F.col("dist").cast("int").alias("dist"),
        (md5_long(F.col("node")) % 3 == 0).alias("is_seed"),
    )


web_seed_distance.__doc__ = web_seed_distance.__doc__.format(rounds=_BFS_ROUNDS)


# ---------------------------------------------------------------------------
# Zipf-law fit per language (frequency-histogram regression)
# ---------------------------------------------------------------------------

_ZIPF_MIN_FREQ = 2


@register(
    "text_zipf_fit",
    oracle=f"""
    WITH toks AS (
      SELECT lang, lower(unnest(string_split(text, ' '))) AS token
      FROM documents
    ),
    tf AS (SELECT lang, token, count(*) AS f FROM toks GROUP BY lang, token),
    hist AS (
      SELECT lang, f, CAST(count(*) AS DOUBLE) AS n_terms
      FROM tf WHERE f >= {_ZIPF_MIN_FREQ} GROUP BY lang, f
    ),
    ranked AS (
      SELECT lang, f, n_terms,
        coalesce(sum(n_terms) OVER (PARTITION BY lang ORDER BY f DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS rank_before
      FROM hist
    ),
    pts AS (
      SELECT lang, n_terms AS w,
        ln(rank_before + (n_terms + 1) / 2.0) AS x,
        ln(CAST(f AS DOUBLE)) AS y
      FROM ranked
    ),
    agg AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_freq_bins,
        CAST(sum(w) AS BIGINT) AS n_terms,
        sum(w) AS sw, sum(w * x) AS swx, sum(w * y) AS swy,
        sum(w * x * x) AS swxx, sum(w * x * y) AS swxy
      FROM pts GROUP BY lang
    )
    SELECT lang, n_terms, n_freq_bins,
      round((swxy - swx * swy / sw) / (swxx - swx * swx / sw), 6)
        AS zipf_slope,
      round((swy - (swxy - swx * swy / sw) / (swxx - swx * swx / sw) * swx)
        / sw, 6) AS zipf_intercept
    FROM agg
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit per language: weighted least-squares slope of
    log(freq) on log(rank) — the corpus-health diagnostic (natural
    language sits near slope -1; scraped boilerplate and generated
    spam deviate). The scale trick: regression points are the
    FREQUENCY HISTOGRAM (lang, freq, n_terms) — Zipf itself bounds
    distinct frequency values at roughly sqrt(total tokens), so the
    cumulative-rank window runs over thousands of rows per language,
    never the vocabulary (the text_vocabulary lesson from round 3's
    VERDICT applied at design time). Ties share their block's
    average rank (midpoint), the standard treatment. Everything else
    is two map-side-combined aggs."""
    toks = _docs(spark, sf_dir).select(
        "lang", F.explode(F.split(F.lower("text"), " ")).alias("token")
    )
    tf = toks.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("f"))
    hist = (
        tf.where(F.col("f") >= _ZIPF_MIN_FREQ)
        .groupBy("lang", "f")
        .agg(F.count(F.lit(1)).cast("double").alias("n_terms"))
    )
    w_cum = (
        Window.partitionBy("lang")
        .orderBy(F.col("f").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pts = hist.select(
        "lang",
        F.col("n_terms").alias("w"),
        F.log(
            F.coalesce(F.sum("n_terms").over(w_cum), F.lit(0.0))
            + (F.col("n_terms") + 1) / 2.0
        ).alias("x"),
        F.log(F.col("f").cast("double")).alias("y"),
    )
    agg = pts.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_freq_bins"),
        F.sum("w").cast("long").alias("n_terms"),
        F.sum("w").alias("sw"),
        F.sum(F.col("w") * F.col("x")).alias("swx"),
        F.sum(F.col("w") * F.col("y")).alias("swy"),
        F.sum(F.col("w") * F.col("x") * F.col("x")).alias("swxx"),
        F.sum(F.col("w") * F.col("x") * F.col("y")).alias("swxy"),
    )
    slope = (F.col("swxy") - F.col("swx") * F.col("swy") / F.col("sw")) / (
        F.col("swxx") - F.col("swx") * F.col("swx") / F.col("sw")
    )
    return agg.select(
        "lang",
        "n_terms",
        "n_freq_bins",
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("swy") - slope * F.col("swx")) / F.col("sw"), 6).alias(
            "zipf_intercept"
        ),
    )


# ---------------------------------------------------------------------------
# Entity salience per document (position + frequency)
# ---------------------------------------------------------------------------


def _salience_oracle() -> str:
    from multiomics_biocypher_kg_spark.oracle_fragments import LINKS_SQL

    return f"""
    WITH links AS ({LINKS_SQL}),
    m AS (
      SELECT doc_id, entity_id, count(*) AS n_mentions,
        min(pos) AS first_pos
      FROM links WHERE entity_id IS NOT NULL
      GROUP BY doc_id, entity_id
    ),
    ntok AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    s AS (
      SELECT m.doc_id, m.entity_id,
        CAST(m.n_mentions AS BIGINT) AS n_mentions,
        CAST(m.first_pos AS INTEGER) AS first_pos,
        CAST(n.n_tokens AS INTEGER) AS n_tokens,
        ln(1 + m.n_mentions)
          * (1 - CAST(m.first_pos AS DOUBLE) / n.n_tokens) AS sal
      FROM m JOIN ntok n ON m.doc_id = n.doc_id
    )
    SELECT doc_id, entity_id, n_mentions, first_pos, n_tokens,
      round(sal, 6) AS salience,
      CAST(row_number() OVER (PARTITION BY doc_id
        ORDER BY sal DESC, entity_id ASC) AS INTEGER) AS salience_rank
    FROM s
    """


@register("kg_entity_salience", oracle=_salience_oracle())
def kg_entity_salience(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document entity salience: earlier first mention and more
    repetitions -> higher score (ln(1+count) * (1 - first_pos/len))
    — the aboutness signal entity-centric corpus curation ranks
    documents by (reference analog: the mention-count edge
    properties its adapters emit). One groupBy over the resolved
    mention stream, a co-keyed join against per-doc token counts,
    and a PER-DOCUMENT window (bounded by entities-per-doc, never
    corpus-global). The score components are bit-identical across
    engines (integer-derived doubles, fixed-order ops), so ranking
    on the unrounded score is deterministic."""
    p = _pipeline(spark, sf_dir)
    m = (
        p["links"]
        .where(F.col("entity_id").isNotNull())
        .groupBy("doc_id", "entity_id")
        .agg(
            F.count(F.lit(1)).alias("n_mentions"),
            F.min("pos").alias("first_pos"),
        )
    )
    ntok = p["docs"].select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    sal = F.log(1 + F.col("n_mentions")) * (
        1 - F.col("first_pos").cast("double") / F.col("n_tokens")
    )
    s = m.join(ntok, "doc_id").withColumn("sal", sal)
    w = Window.partitionBy("doc_id").orderBy(
        F.col("sal").desc(), F.col("entity_id").asc()
    )
    return s.select(
        "doc_id",
        "entity_id",
        F.col("n_mentions").cast("long").alias("n_mentions"),
        F.col("first_pos").cast("int").alias("first_pos"),
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.round("sal", 6).alias("salience"),
        F.row_number().over(w).alias("salience_rank"),
    )


# ---------------------------------------------------------------------------
# CCNet-style perplexity buckets (histogram-derived per-lang terciles)
# ---------------------------------------------------------------------------

_PPL_BIN_SCALE = 64


@register(
    "text_ccnet_buckets",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lower(unnest(string_split(text, ' '))) AS token
      FROM documents
    ),
    model AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
    st AS (
      SELECT CAST(count(*) AS DOUBLE) AS t,
             CAST(count(DISTINCT token) AS DOUBLE) AS v
      FROM toks
    ),
    scored AS (
      SELECT tk.doc_id, -log2((m.c + 1) / (st.t + st.v)) AS bits
      FROM toks tk JOIN model m ON tk.token = m.token CROSS JOIN st
    ),
    perdoc AS (
      SELECT s.doc_id, d.lang, count(*) AS n_tokens,
        round(avg(s.bits), 6) AS bpt
      FROM scored s JOIN documents d ON s.doc_id = d.doc_id
      GROUP BY s.doc_id, d.lang
    ),
    binned AS (
      SELECT doc_id, lang, n_tokens, bpt,
        CAST(floor(bpt * {_PPL_BIN_SCALE}) AS INTEGER) AS ppl_bin
      FROM perdoc
    ),
    hist AS (
      SELECT lang, ppl_bin, count(*) AS n FROM binned GROUP BY lang, ppl_bin
    ),
    cum AS (
      SELECT lang, ppl_bin,
        sum(n) OVER (PARTITION BY lang ORDER BY ppl_bin ASC) AS cum,
        sum(n) OVER (PARTITION BY lang) AS total
      FROM hist
    ),
    bounds AS (
      SELECT lang,
        min(CASE WHEN cum >= total / 3.0 THEN ppl_bin END) AS b1,
        min(CASE WHEN cum >= 2.0 * total / 3.0 THEN ppl_bin END) AS b2
      FROM cum GROUP BY lang
    )
    SELECT b.doc_id, b.lang, CAST(b.n_tokens AS BIGINT) AS n_tokens,
      b.bpt AS bits_per_token, b.ppl_bin,
      CASE WHEN b.ppl_bin <= bo.b1 THEN 'head'
           WHEN b.ppl_bin <= bo.b2 THEN 'middle'
           ELSE 'tail' END AS bucket
    FROM binned b JOIN bounds bo ON b.lang = bo.lang
    """,
)
def text_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al., LREC 2020):
    per-language head/middle/tail terciles of the unigram-LM
    bits-per-token score (text_unigram_perplexity's model) — the
    quality-stratification step that decides which web text enters
    pretraining. The tercile boundaries come from a fixed-width
    HISTOGRAM of the rounded score (bin = floor(bits*{scale}),
    integer state, bounded bins per language) with a cumulative
    window over the bin dictionary — never a per-document rank sort
    (the data_budget_select histogram-threshold pattern; at 10^12
    docs the per-lang window sorts thousands of bins, not billions
    of documents). Boundary comparisons are integer-vs-integer, so
    bucket assignment is engine-exact. Binning on the ROUNDED score
    keeps the floor stable: x64 is exact (power of two) and rounded
    values sit >= 6.4e-5 away from the next integer boundary."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token")
    )
    model = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    st = toks.agg(
        F.count(F.lit(1)).cast("double").alias("t"),
        F.countDistinct("token").cast("double").alias("v"),
    )
    scored = (
        toks.join(model, "token")
        .crossJoin(F.broadcast(st))
        .select(
            "doc_id",
            (-F.log2((F.col("c") + 1) / (F.col("t") + F.col("v")))).alias("bits"),
        )
    )
    perdoc = (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("bits"), 6).alias("bpt"),
        )
        .join(docs.select("doc_id", "lang"), "doc_id")
    )
    binned = perdoc.withColumn(
        "ppl_bin", F.floor(F.col("bpt") * _PPL_BIN_SCALE).cast("int")
    )
    hist = binned.groupBy("lang", "ppl_bin").agg(F.count(F.lit(1)).alias("n"))
    w_cum = Window.partitionBy("lang").orderBy(F.col("ppl_bin").asc())
    w_tot = Window.partitionBy("lang")
    cum = hist.select(
        "lang",
        "ppl_bin",
        F.sum("n").over(w_cum).alias("cum"),
        F.sum("n").over(w_tot).alias("total"),
    )
    bounds = cum.groupBy("lang").agg(
        F.min(
            F.when(F.col("cum") >= F.col("total") / 3.0, F.col("ppl_bin"))
        ).alias("b1"),
        F.min(
            F.when(F.col("cum") >= 2.0 * F.col("total") / 3.0, F.col("ppl_bin"))
        ).alias("b2"),
    )
    return binned.join(F.broadcast(bounds), "lang").select(
        "doc_id",
        "lang",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("bpt").alias("bits_per_token"),
        "ppl_bin",
        F.when(F.col("ppl_bin") <= F.col("b1"), "head")
        .when(F.col("ppl_bin") <= F.col("b2"), "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


text_ccnet_buckets.__doc__ = text_ccnet_buckets.__doc__.format(
    scale=_PPL_BIN_SCALE
)


# ---------------------------------------------------------------------------
# Neo4j admin-import CSV export (the reference's actual output format)
# ---------------------------------------------------------------------------

_N4J_SHARDS = 4
_N4J_HEADERS = [
    ("Page-header.csv", ":ID,n_mentions:long,:LABEL"),
    ("Entity-header.csv", ":ID,n_pages:long,:LABEL"),
    ("MENTIONS-header.csv", ":START_ID,:END_ID,:TYPE"),
    ("SAME_AS_CANONICAL-header.csv", ":START_ID,:END_ID,:TYPE"),
]
_N4J_CALL = (
    "neo4j-admin database import full"
    ' --delimiter="," --array-delimiter="|"'
    ' --nodes="Page-header.csv,Page-part.*"'
    ' --nodes="Entity-header.csv,Entity-part.*"'
    ' --relationships="MENTIONS-header.csv,MENTIONS-part.*"'
    ' --relationships="SAME_AS_CANONICAL-header.csv,SAME_AS_CANONICAL-part.*"'
    " neo4j"
)


def _csvq(c):
    """RFC-4180 quote a string field (always-quote keeps the mirror
    trivially identical: `"` doubles, field wrapped in quotes)."""
    return F.concat(F.lit('"'), F.regexp_replace(c, '"', '""'), F.lit('"'))


def _n4j_file(label: str, id_col) -> F.Column:
    return F.concat(
        F.lit(f"{label}-part"),
        F.lpad(
            F.pmod(md5_long(id_col), F.lit(_N4J_SHARDS)).cast("string"), 3, "0"
        ),
        F.lit(".csv"),
    )


def _neo4j_export_sql() -> str:
    def q(expr: str) -> str:
        return f"""'"' || replace({expr}, '"', '""') || '"'"""

    def fn(label: str, id_expr: str) -> str:
        return (
            f"'{label}-part' || lpad(CAST({md5_long_sql(id_expr)} % {_N4J_SHARDS}"
            f" AS VARCHAR), 3, '0') || '.csv'"
        )

    literals = " UNION ALL ".join(
        f"SELECT '{f}' AS csv_file, '{ln}' AS line"
        for f, ln in _N4J_HEADERS + [("neo4j-admin-import-call.sh", _N4J_CALL)]
    )
    return f"""
    WITH t AS ({TRIPLES_SQL}),
    m AS (SELECT subj AS url, obj AS ent FROM t WHERE pred = 'mentions'),
    sa AS (SELECT subj, obj FROM t WHERE pred = 'same_as_canonical'),
    pages AS (SELECT url, count(*) AS n FROM m GROUP BY url),
    eids AS (
      SELECT ent AS id FROM m
      UNION SELECT subj FROM sa
      UNION SELECT obj FROM sa
    ),
    ep AS (SELECT ent AS id, count(*) AS n FROM m GROUP BY ent),
    enodes AS (
      SELECT e.id, COALESCE(ep.n, 0) AS n
      FROM eids e LEFT JOIN ep ON e.id = ep.id
    )
    SELECT {fn("Page", "url")} AS csv_file,
      {q("url")} || ',' || CAST(n AS VARCHAR) || ',"Page"' AS line
    FROM pages
    UNION ALL
    SELECT {fn("Entity", "id")} AS csv_file,
      {q("id")} || ',' || CAST(n AS VARCHAR) || ',"Entity"' AS line
    FROM enodes
    UNION ALL
    SELECT {fn("MENTIONS", "url")} AS csv_file,
      {q("url")} || ',' || {q("ent")} || ',"MENTIONS"' AS line
    FROM m
    UNION ALL
    SELECT {fn("SAME_AS_CANONICAL", "subj")} AS csv_file,
      {q("subj")} || ',' || {q("obj")} || ',"SAME_AS_CANONICAL"' AS line
    FROM sa
    UNION ALL {literals}
    """


@register("kg_neo4j_export", oracle=_neo4j_export_sql())
def kg_neo4j_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BioCypher-shaped Neo4j admin-import CSV emit — the reference's
    ACTUAL output surface (create_knowledge_graph.py:59 bc.write_nodes
    -> per-label header + part CSVs; scripts/import.sh runs the
    generated neo4j-admin-import-call). -> (csv_file, line): one row
    per CSV line, plus the four header files and the import-call
    script line.

    Per-label layout (BioCypher's convention): `<Label>-header.csv`
    declares `:ID,prop:type,:LABEL` (nodes) / `:START_ID,:END_ID,
    :TYPE` (edges); data rows live in hash-sharded `<Label>-partNNN`
    files. Sharding is pmod(md5, {shards}) on the node/start id — at
    100 TB each part file is an independent write task (the real sink
    is partitionBy(csv_file) text write), no global order, no
    single-writer bottleneck, and neo4j-admin consumes parts in any
    order. Fields are always-quoted RFC-4180 (quote doubling), so
    arbitrary page text/urls can't break the CSV.

    Everything is scan -> two map-side-combined aggs (page fanout,
    entity fanout) -> format projections; the only joins are the
    entity-id union (dedup) and a left join of two entity-keyed
    aggregates."""
    t = _triples(spark, sf_dir)
    m = t.where(F.col("pred") == "mentions").select(
        F.col("subj").alias("url"), F.col("obj").alias("ent")
    )
    sa = t.where(F.col("pred") == "same_as_canonical").select("subj", "obj")
    pages = m.groupBy("url").agg(F.count(F.lit(1)).alias("n"))
    eids = (
        m.select(F.col("ent").alias("id"))
        .unionByName(sa.select(F.col("subj").alias("id")))
        .unionByName(sa.select(F.col("obj").alias("id")))
        .distinct()
    )
    ep = m.groupBy(F.col("ent").alias("id")).agg(F.count(F.lit(1)).alias("n"))
    enodes = eids.join(ep, "id", "left").select(
        "id", F.coalesce(F.col("n"), F.lit(0)).alias("n")
    )
    page_rows = pages.select(
        _n4j_file("Page", F.col("url")).alias("csv_file"),
        F.concat(
            _csvq(F.col("url")),
            F.lit(","),
            F.col("n").cast("string"),
            F.lit(',"Page"'),
        ).alias("line"),
    )
    ent_rows = enodes.select(
        _n4j_file("Entity", F.col("id")).alias("csv_file"),
        F.concat(
            _csvq(F.col("id")),
            F.lit(","),
            F.col("n").cast("string"),
            F.lit(',"Entity"'),
        ).alias("line"),
    )
    m_rows = m.select(
        _n4j_file("MENTIONS", F.col("url")).alias("csv_file"),
        F.concat(
            _csvq(F.col("url")),
            F.lit(","),
            _csvq(F.col("ent")),
            F.lit(',"MENTIONS"'),
        ).alias("line"),
    )
    sa_rows = sa.select(
        _n4j_file("SAME_AS_CANONICAL", F.col("subj")).alias("csv_file"),
        F.concat(
            _csvq(F.col("subj")),
            F.lit(","),
            _csvq(F.col("obj")),
            F.lit(',"SAME_AS_CANONICAL"'),
        ).alias("line"),
    )
    literals = spark.createDataFrame(
        _N4J_HEADERS + [("neo4j-admin-import-call.sh", _N4J_CALL)],
        "csv_file string, line string",
    )
    return (
        page_rows.unionByName(ent_rows)
        .unionByName(m_rows)
        .unionByName(sa_rows)
        .unionByName(literals)
    )


kg_neo4j_export.__doc__ = kg_neo4j_export.__doc__.format(shards=_N4J_SHARDS)


# ---------------------------------------------------------------------------
# Filtered link-prediction ranking evaluation (MRR / Hits@k)
# ---------------------------------------------------------------------------

_MRR_SAMPLE_MOD = 3


def _mrr_eval_sql() -> str:
    a_cols = ",\n        ".join(
        f"({_emb_dim_sql('subj', 'e', j)} + {_emb_dim_sql('pred', 'r', j)})"
        f" AS a{j}"
        for j in range(_TE_DIM)
    )
    c_cols = ",\n        ".join(
        f"{_emb_dim_sql('cand', 'e', j)} AS c{j}" for j in range(_TE_DIM)
    )
    d2 = " + ".join(
        f"((a{j} - c{j}) * (a{j} - c{j}))" for j in range(_TE_DIM)
    )
    samp = md5_long_sql("subj || '|' || pred || '|' || obj")
    return f"""
    WITH t AS ({TRIPLES_SQL}),
    test AS (
      SELECT subj, pred, obj,
        {a_cols}
      FROM t WHERE {samp} % {_MRR_SAMPLE_MOD} = 0
    ),
    cands AS (
      SELECT pred, cand,
        {c_cols}
      FROM (SELECT DISTINCT pred, obj AS cand FROM t)
    ),
    scored AS (
      SELECT te.subj, te.pred, te.obj, c.cand, ({d2}) AS d2
      FROM test te
      JOIN cands c ON te.pred = c.pred
      LEFT JOIN t k
        ON k.subj = te.subj AND k.pred = te.pred AND k.obj = c.cand
      WHERE c.cand = te.obj OR k.subj IS NULL
    ),
    with_true AS (
      SELECT *, max(CASE WHEN cand = obj THEN d2 END)
          OVER (PARTITION BY subj, pred, obj) AS d2_true
      FROM scored
    ),
    ranks AS (
      SELECT subj, pred, obj,
        1 + sum(CASE WHEN d2 < d2_true
                       OR (d2 = d2_true AND cand < obj) THEN 1 ELSE 0 END)
          AS rank
      FROM with_true
      GROUP BY subj, pred, obj
    )
    SELECT pred, CAST(count(*) AS BIGINT) AS n_test,
      round(avg(1.0 / rank), 6) AS mrr,
      round(avg(CASE WHEN rank <= 1 THEN 1.0 ELSE 0.0 END), 6) AS hits_at_1,
      round(avg(CASE WHEN rank <= 3 THEN 1.0 ELSE 0.0 END), 6) AS hits_at_3,
      round(avg(CASE WHEN rank <= 10 THEN 1.0 ELSE 0.0 END), 6)
        AS hits_at_10,
      round(avg(CAST(rank AS DOUBLE)), 6) AS mean_rank
    FROM ranks GROUP BY pred
    """


@register("kg_mrr_eval", oracle=_mrr_eval_sql())
def kg_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered link-prediction ranking evaluation (the standard KG-
    embedding benchmark protocol, Bordes et al. 2013): for a
    deterministic ~1/3 sample of triples (h, r, t), rank the true
    tail t against every candidate tail of relation r under the
    TransE score -||h + r - c||^2, EXCLUDING candidates that form
    another known triple (the "filtered" setting), and report
    per-relation MRR, Hits@1/3/10 and mean rank — the acceptance
    gate a trained-embedding deployment is judged by (here over the
    same hash-derived embeddings as kg_transe_score, so both engines
    re-derive every score).

    Scale shape: the candidate table is the per-relation TAIL
    DICTIONARY (distinct (pred, obj) — entity-vocabulary-sized, not
    corpus-sized), broadcast into an equi-join on pred; h+r
    components are precomputed per test row and candidate embeddings
    per dictionary row, so the fan-out join does pure arithmetic
    (zero hashing inside the join). The known-triple filter is one
    shuffle join on (subj, pred, cand); the true-tail score is a
    window over the PER-TRIPLE candidate group (bounded by the
    dictionary fan-out), and the rank is a conditional count — no
    global sort anywhere. Eval sets at 100 TB are samples by
    construction (the md5 mod), so the fan-out is |test| x |tails|,
    controlled by the sample modulus. Squared distance (monotonic in
    the TransE norm) keeps the comparison exact: both engines build
    the identical fixed-order float expression, so rank comparisons
    cannot diverge by a ulp. If the tail dictionary outgrows the
    broadcast threshold (10^8-entity KGs), the identical plan runs
    as a shuffle join on pred — salt the handful of relation keys
    (the kg_host_rollup_salted discipline) since pred is maximally
    skewed by construction."""
    trip = _triples(spark, sf_dir).select("subj", "pred", "obj")
    samp = (
        md5_long(F.concat_ws("|", "subj", "pred", "obj"))
        % _MRR_SAMPLE_MOD
        == 0
    )
    test = trip.where(samp)
    for j in range(_TE_DIM):
        test = test.withColumn(
            f"a{j}",
            _emb_dim_col(F.col("subj"), "e", j)
            + _emb_dim_col(F.col("pred"), "r", j),
        )
    cands = trip.select("pred", F.col("obj").alias("cand")).distinct()
    for j in range(_TE_DIM):
        cands = cands.withColumn(f"c{j}", _emb_dim_col(F.col("cand"), "e", j))
    known = trip.select(
        "subj", "pred", F.col("obj").alias("cand"), F.lit(1).alias("known")
    )
    d2 = reduce(
        lambda a, b: a + b,
        [
            (F.col(f"a{j}") - F.col(f"c{j}"))
            * (F.col(f"a{j}") - F.col(f"c{j}"))
            for j in range(_TE_DIM)
        ],
    )
    scored = (
        test.join(F.broadcast(cands), "pred")
        .join(known, ["subj", "pred", "cand"], "left")
        .where((F.col("cand") == F.col("obj")) | F.col("known").isNull())
        .select("subj", "pred", "obj", "cand", d2.alias("d2"))
    )
    wt = Window.partitionBy("subj", "pred", "obj")
    ranked = scored.withColumn(
        "d2_true",
        F.max(F.when(F.col("cand") == F.col("obj"), F.col("d2"))).over(wt),
    )
    better = (F.col("d2") < F.col("d2_true")) | (
        (F.col("d2") == F.col("d2_true")) & (F.col("cand") < F.col("obj"))
    )
    ranks = ranked.groupBy("subj", "pred", "obj").agg(
        (1 + F.sum(F.when(better, 1).otherwise(0))).alias("rank")
    )
    return ranks.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.round(F.avg(F.lit(1.0) / F.col("rank")), 6).alias("mrr"),
        F.round(F.avg((F.col("rank") <= 1).cast("double")), 6).alias(
            "hits_at_1"
        ),
        F.round(F.avg((F.col("rank") <= 3).cast("double")), 6).alias(
            "hits_at_3"
        ),
        F.round(F.avg((F.col("rank") <= 10).cast("double")), 6).alias(
            "hits_at_10"
        ),
        F.round(F.avg(F.col("rank").cast("double")), 6).alias("mean_rank"),
    )


# ---------------------------------------------------------------------------
# ANN recall calibration: IVF top-k vs exact brute-force gold
# ---------------------------------------------------------------------------

_RECALL_K = 5
_RECALL_MOD = 10


def _ann_recall_sql() -> str:
    from multiomics_biocypher_kg_spark.oracle_fragments import (
        _lloyd_prefix_parts,
    )

    parts = _lloyd_prefix_parts(_IVF_LISTS, _IVF_ITERS)
    parts.append(f"""
    probes AS (
      SELECT vec_id AS query_id, list_id FROM (
        SELECT vec_id, list_id,
          row_number() OVER (PARTITION BY vec_id
                             ORDER BY d ASC, list_id ASC) AS rn
        FROM afinal_d) WHERE rn <= {_IVF_PROBE}
    ),
    cands AS (
      SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
      FROM probes p JOIN afinal a ON p.list_id = a.list_id
      WHERE a.vec_id <> p.query_id AND p.query_id % {_RECALL_MOD} = 0
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
    ),
    ivf_k AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM ccos) WHERE rank <= {_RECALL_K}
    ),
    g_dots AS (
      SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
        sum(q.x * b.x) AS dot
      FROM exploded q JOIN exploded b
        ON q.dim = b.dim AND q.vec_id <> b.vec_id
      WHERE q.vec_id % {_RECALL_MOD} = 0
      GROUP BY q.vec_id, b.vec_id
    ),
    g_cos AS (
      SELECT d.query_id, d.neighbor_id,
        round(d.dot / (nq.nrm * nb.nrm), 6) AS cosine
      FROM g_dots d
      JOIN norms nq ON d.query_id = nq.vec_id
      JOIN norms nb ON d.neighbor_id = nb.vec_id
    ),
    gold AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM g_cos) WHERE rank <= {_RECALL_K}
    )
    SELECT g.query_id, CAST(count(*) AS BIGINT) AS n_gold,
      CAST(count(i.neighbor_id) AS BIGINT) AS n_hit,
      round(CAST(count(i.neighbor_id) AS DOUBLE) / count(*), 6) AS recall
    FROM gold g LEFT JOIN ivf_k i
      ON g.query_id = i.query_id AND g.neighbor_id = i.neighbor_id
    GROUP BY g.query_id""")
    return "WITH " + ",".join(parts)


@register("ann_recall_eval", oracle=_ann_recall_sql())
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index calibration: recall@k of the production IVF path
    (ann_ivf_topk's exact configuration) against exact brute-force
    gold, per query, on a deterministic 1/10 query sample — the
    measurement that chooses n_probe/n_lists before a 10^9-vector
    deployment (FAISS's recall-QPS curve, computed engine-side).
    The gold side is exact top-k over the SAMPLED queries only
    (broadcast query side, one corpus scan — the cosine_topk
    contract); the IVF side is the same ivf_topk plan the production
    query uses, filtered to the sample before ranking work happens.
    Scoring is two hash joins on the (query, neighbor) pair key —
    nothing rescans the corpus. Both engines rank by the identically
    rounded cosine with id tiebreak, so the boundary of the top-k
    set cannot diverge."""
    from multiomics_biocypher_kg_spark.operators.simsearch import (
        cosine_topk,
        ivf_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qids = emb.select("vec_id").where(F.col("vec_id") % _RECALL_MOD == 0)
    gold = cosine_topk(emb, query_ids=qids, k=_RECALL_K).select(
        "query_id", "neighbor_id"
    )
    ivf = (
        ivf_topk(
            emb,
            k=_RECALL_K,
            n_lists=_IVF_LISTS,
            n_probe=_IVF_PROBE,
            iters=_IVF_ITERS,
        )
        .where(F.col("query_id") % _RECALL_MOD == 0)
        .select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    )
    return (
        gold.join(ivf, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gold"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("n_hit"),
            F.round(
                F.sum(F.coalesce("hit", F.lit(0)))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("recall"),
        )
    )


# ---------------------------------------------------------------------------
# node2vec second-order biased transition table
# ---------------------------------------------------------------------------

_N2V_P = 4.0
_N2V_Q = 0.25
_N2V_CAP = 8


def _node2vec_oracle_sql() -> str:
    from multiomics_biocypher_kg_spark.registry_web import _COMENTION_EDGES_SQL

    rp = repr(1.0 / _N2V_P)
    rq = repr(1.0 / _N2V_Q)
    return f"""
    WITH hg AS MATERIALIZED ({_COMENTION_EDGES_SQL}),
    capped AS MATERIALIZED (
      SELECT src, dst, w FROM (
        SELECT src, dst, w,
          row_number() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rk
        FROM hg
      ) r WHERE rk <= {_N2V_CAP}
    ),
    e AS MATERIALIZED (SELECT DISTINCT src, dst FROM hg),
    wedge AS MATERIALIZED (
      SELECT a.src AS prev_node, a.dst AS cur_node, b.dst AS next_node,
        b.w AS w
      FROM capped a JOIN capped b ON a.dst = b.src
    ),
    biased AS MATERIALIZED (
      SELECT wg.prev_node, wg.cur_node, wg.next_node,
        CASE WHEN wg.next_node = wg.prev_node THEN {rp}
             WHEN e.src IS NOT NULL THEN 1.0
             ELSE {rq} END AS alpha,
        wg.w
      FROM wedge wg LEFT JOIN e
        ON e.src = wg.prev_node AND e.dst = wg.next_node
    )
    SELECT prev_node, cur_node, next_node, alpha,
      round(w * alpha / sum(w * alpha)
        OVER (PARTITION BY prev_node, cur_node), 6) AS prob
    FROM biased
    """


@register("kg_node2vec_transitions", oracle=_node2vec_oracle_sql())
def kg_node2vec_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """node2vec second-order biased transition table (Grover &
    Leskovec, KDD 2016) over the symmetrized co-mention entity
    graph: for a walk at cur having arrived from prev, the
    probability of stepping to next is proportional to
    w(cur, next) * alpha, with alpha = 1/p = {rp} for the return
    step (next == prev), 1.0 when (prev, next) is itself an edge
    (BFS-ish stay-local move), and 1/q = {rq} otherwise (DFS-ish
    outward move). This is the preprocessing table the node2vec
    walk sampler consumes — the second-order complement to the
    first-order DeepWalk corpus (web_random_walks) and the skip-gram
    pair extraction (kg_skipgram_pairs). Adjacency is degree-capped
    to the top-{cap} neighbors by (weight, id) BEFORE the wedge
    join — the standard node2vec preprocessing that bounds the
    transition table at |V| * cap^2 rows regardless of hub degree
    (an uncapped wedge join explodes as sum(deg_in * deg_out) on
    hot entities); the per-node top-k window sorts only one node's
    adjacency per task (two-phase salted bottom-k, as in
    text_kmv_cardinality, is the hub-adjacency escape hatch at
    10^12 docs). The alpha gate tests edge existence against the
    FULL edge set (a keyed left join), so capping biases only the
    candidate fan-out, never the topology test. Weights are
    integer-valued doubles: the cap's (w DESC, id) order and the
    three exact alpha constants are deterministic cross-engine;
    the only inexact float is the final per-(prev, cur)
    normalization, round(6)-gated.
    """
    from multiomics_biocypher_kg_spark.operators.graphstats import comention_pairs

    p = _pipeline(spark, sf_dir)
    counts = (
        comention_pairs(p["links"])
        .groupBy("subj", "obj")
        .agg(F.countDistinct("doc_id").alias("n"))
    )
    edges = counts.select(
        F.col("subj").alias("src"),
        F.col("obj").alias("dst"),
        F.col("n").cast("double").alias("w"),
    ).unionByName(
        counts.select(
            F.col("obj").alias("src"),
            F.col("subj").alias("dst"),
            F.col("n").cast("double").alias("w"),
        )
    )
    from multiomics_biocypher_kg_spark.operators.graphstats import (
        node2vec_transitions,
    )

    return node2vec_transitions(edges, p=_N2V_P, q=_N2V_Q, cap=_N2V_CAP)


kg_node2vec_transitions.__doc__ = kg_node2vec_transitions.__doc__.format(
    rp=1.0 / _N2V_P, rq=1.0 / _N2V_Q, cap=_N2V_CAP
)


# ---------------------------------------------------------------------------
# Weighted single-source shortest paths (min-plus Bellman-Ford) over
# the host link graph
# ---------------------------------------------------------------------------

_SSSP_ROUNDS = 6

# integer edge cost: heavily-linked host pairs are "cheap" to
# traverse (authority flows), sparse links are expensive — cost
# 1..5, all-integer so min-plus relaxation has zero float drift
_SSSP_COST_SQL = "greatest(1, 6 - least(5, CAST(n_links AS INTEGER)))"


def _weighted_sssp_sql() -> str:
    from multiomics_biocypher_kg_spark.registry_web import _HOST_GRAPH_SQL

    seed_pred = md5_long_sql("node") + " % 3 = 0"
    parts = [
        f"hg AS (SELECT src_host, dst_host, {_SSSP_COST_SQL} AS w "
        f"FROM ({_HOST_GRAPH_SQL}))",
        "nodes AS (SELECT DISTINCT src_host AS node FROM hg "
        "UNION SELECT DISTINCT dst_host FROM hg)",
        f"d0 AS (SELECT node, 0 AS cost FROM nodes WHERE {seed_pred})",
    ]
    for i in range(_SSSP_ROUNDS):
        parts.append(f"""
    d{i + 1} AS MATERIALIZED (
      SELECT node, min(cost) AS cost FROM (
        SELECT node, cost FROM d{i}
        UNION ALL
        SELECT hg.dst_host AS node, d.cost + hg.w AS cost
        FROM d{i} d JOIN hg ON hg.src_host = d.node
      ) GROUP BY node
    )""")
    return (
        "WITH "
        + ",".join(parts)
        + f"""
    SELECT d.node AS host, CAST(d.cost AS INTEGER) AS cost,
      ({seed_pred.replace('node', 'd.node')}) AS is_seed
    FROM d{_SSSP_ROUNDS} d"""
    )


@register("web_weighted_sssp", oracle=_weighted_sssp_sql())
def web_weighted_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted shortest-path cost from the md5-selected seed hosts
    (same seed convention as web_seed_distance / web_trustrank) over
    the host link graph — the WEIGHTED upgrade of the BFS hop
    distance: edge cost 1..5 falls with link multiplicity
    (greatest(1, 6 - least(5, n_links))), so the metric reads "how
    cheaply does trust/authority reach this host", the signal a
    crawl-frontier prioritizer actually wants (two weak hops can
    cost more than four strong ones).

    Bounded Bellman-Ford: {rounds} min-plus relaxation rounds, each
    ONE frontier equi-join + an all-integer min groupBy (map-side
    combinable). Hosts whose cheapest path needs more than {rounds}
    edge relaxations are excluded by contract — the fixed-horizon
    discipline of the whole iterative family. The weighted edge
    table (the loop invariant) is localCheckpoint()ed ONCE and the
    frontier's lineage truncated per round; untruncated, round i's
    plan embeds 2^i copies of the d0 subtree (the union references
    the previous state twice). All-integer costs: no float drift,
    no tolerance in the oracle comparison — DuckDB unrolls the
    identical {rounds} rounds as MATERIALIZED CTEs."""
    from multiomics_biocypher_kg_spark.operators.linkgraph import (
        host_graph,
        href_edges,
    )
    from multiomics_biocypher_kg_spark.sources.pages import pages_from_documents

    hg = (
        host_graph(href_edges(pages_from_documents(spark, sf_dir)))
        .select(
            "src_host",
            "dst_host",
            F.greatest(
                F.lit(1),
                F.lit(6) - F.least(F.lit(5), F.col("n_links").cast("int")),
            ).alias("w"),
        )
        .localCheckpoint(eager=False)
    )
    nodes = (
        hg.select(F.col("src_host").alias("node"))
        .union(hg.select("dst_host"))
        .distinct()
    )
    is_seed = md5_long(F.col("node")) % 3 == 0
    d = nodes.where(is_seed).select("node", F.lit(0).alias("cost"))
    for i in range(_SSSP_ROUNDS):
        step = d.join(hg, d["node"] == hg["src_host"]).select(
            F.col("dst_host").alias("node"),
            (F.col("cost") + F.col("w")).alias("cost"),
        )
        d = d.union(step).groupBy("node").agg(F.min("cost").alias("cost"))
        if i + 1 < _SSSP_ROUNDS:
            d = d.localCheckpoint(eager=True)
    return d.select(
        F.col("node").alias("host"),
        F.col("cost").cast("int").alias("cost"),
        (md5_long(F.col("node")) % 3 == 0).alias("is_seed"),
    )


web_weighted_sssp.__doc__ = web_weighted_sssp.__doc__.format(rounds=_SSSP_ROUNDS)


# ---------------------------------------------------------------------------
# DistMult triple plausibility (bilinear-diagonal scorer)
# ---------------------------------------------------------------------------

# integer embedding component: md5-derived in [-500, 500) — the same
# distribution as _emb_dim_sql but UNSCALED, so a triple's bilinear
# score sum_j e_j*r_j*t_j is an EXACT int64 (the float form is this
# integer / 1e9; emitting the integer sidesteps the round(6)
# half-way boundary that rational-valued scores hit ~1/1000 rows)


def _emb_dim_int_sql(name_expr: str, tag: str, j: int) -> str:
    h = md5_long_sql(f"{name_expr} || '#{tag}{j}'")
    return f"({h} % {_TE_MOD} - 500)"


def _emb_dim_int_col(col, tag: str, j: int):
    h = md5_long(F.concat(col, F.lit(f"#{tag}{j}")))
    return h % _TE_MOD - 500


def _distmult_sql() -> str:
    def dot(t_tag: str, t_expr: str) -> str:
        terms = [
            f"({_emb_dim_int_sql('subj', 'e', j)} * {_emb_dim_int_sql('pred', 'r', j)}"
            f" * {_emb_dim_int_sql(t_expr, t_tag, j)})"
            for j in range(_TE_DIM)
        ]
        return "(" + " + ".join(terms) + ")"

    return f"""
    WITH t AS ({TRIPLES_SQL}),
    scored AS (
      SELECT subj, pred, obj,
        CAST({dot('e', 'obj')} AS BIGINT) AS pos_e9,
        CAST({dot('n', 'obj')} AS BIGINT) AS neg_e9
      FROM t
    )
    SELECT subj, pred, obj,
      pos_e9 AS distmult_score_e9,
      neg_e9 AS neg_score_e9,
      pos_e9 - neg_e9 AS margin_e9,
      (pos_e9 - neg_e9) > 0 AS plausible
    FROM scored
    """


@register("kg_distmult_score", oracle=_distmult_sql())
def kg_distmult_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DistMult triple plausibility (Yang et al., ICLR 2015): the
    bilinear-diagonal scorer sum_j h_j * r_j * t_j beside
    kg_transe_score's translational one — the two standard shallow
    KG-embedding decoders, same deterministic hash-derived
    embeddings, same corrupted-tail negative convention, so a
    consumer can compare decoder families on identical vectors.
    DistMult is symmetric in (h, t) by construction — the classic
    failure on antisymmetric relations — which is exactly why having
    BOTH scorers registered matters for model selection.

    Scores are emitted as EXACT int64 numerators (the float score
    x 1e9): with components k/1000 the bilinear form is a rational
    with denominator 1e9, and a round(6) of such values lands on an
    exact decimal half-way boundary for ~1 row in 1000 — where
    engine rounding paths (BigDecimal-exact vs multiply-then-round)
    legitimately disagree. Integer emission removes the float from
    the contract entirely; consumers divide by 1e9 for display.

    Same 10^12-triple shape as TransE: embeddings resolved per dim
    in the scan projection (no parameter table, no shuffle, no
    aggregation), a fixed-order multiply-add chain both engines
    mirror term for term — all int64, overflow-safe (|score| <
    8 * 500^3 = 1e9)."""
    trip = _triples(spark, sf_dir).select("subj", "pred", "obj")

    def dot(col_tag: str):
        terms = [
            _emb_dim_int_col(F.col("subj"), "e", j)
            * _emb_dim_int_col(F.col("pred"), "r", j)
            * _emb_dim_int_col(F.col("obj"), col_tag, j)
            for j in range(_TE_DIM)
        ]
        return reduce(lambda a, b: a + b, terms)

    pos = dot("e").cast("long")
    neg = dot("n").cast("long")
    return trip.select(
        "subj",
        "pred",
        "obj",
        pos.alias("distmult_score_e9"),
        neg.alias("neg_score_e9"),
        (pos - neg).alias("margin_e9"),
        ((pos - neg) > 0).alias("plausible"),
    )


# ---------------------------------------------------------------------------
# ComplEx triple plausibility (complex bilinear scorer)
# ---------------------------------------------------------------------------

# complex embeddings: per dim j, entity e has re/im components hashed
# with tags cr/ci, the relation with sr/si, the corrupted tail with
# xr/xi — same [-500, 500) integer distribution as DistMult, so the
# real part of <h, r, conj(t)> is an EXACT int64 (|score| <
# 8 dims * 4 terms * 500^3 = 4e9)


def _complex_sql() -> str:
    def score(re_tag: str, im_tag: str) -> str:
        terms = []
        for j in range(_TE_DIM):
            hr = _emb_dim_int_sql("subj", "cr", j)
            hi = _emb_dim_int_sql("subj", "ci", j)
            rr = _emb_dim_int_sql("pred", "sr", j)
            ri = _emb_dim_int_sql("pred", "si", j)
            tr = _emb_dim_int_sql("obj", re_tag, j)
            ti = _emb_dim_int_sql("obj", im_tag, j)
            terms.append(
                f"({hr} * {rr} * {tr} + {hi} * {rr} * {ti}"
                f" + {hr} * {ri} * {ti} - {hi} * {ri} * {tr})"
            )
        return "(" + " + ".join(terms) + ")"

    return f"""
    WITH t AS ({TRIPLES_SQL}),
    scored AS (
      SELECT subj, pred, obj,
        CAST({score('cr', 'ci')} AS BIGINT) AS pos_e9,
        CAST({score('xr', 'xi')} AS BIGINT) AS neg_e9
      FROM t
    )
    SELECT subj, pred, obj,
      pos_e9 AS complex_score_e9,
      neg_e9 AS neg_score_e9,
      pos_e9 - neg_e9 AS margin_e9,
      (pos_e9 - neg_e9) > 0 AS plausible
    FROM scored
    """


@register("kg_complex_score", oracle=_complex_sql())
def kg_complex_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ComplEx triple plausibility (Trouillon et al., ICML 2016):
    Re(<h, r, conj(t)>) over complex-valued embeddings — the third
    standard shallow KG-embedding decoder beside kg_transe_score
    (translational) and kg_distmult_score (bilinear-diagonal).
    ComplEx exists precisely because DistMult cannot represent
    antisymmetric relations (its score is symmetric in (h, t) by
    construction); the imaginary parts make score(h, r, t) !=
    score(t, r, h), so the trio spans the decoder families a model
    selection actually compares. Same deterministic hash-derived
    embeddings (entity re/im from tags cr/ci so subject and object
    positions share one entity embedding), same corrupted-tail
    negative convention (independent hash family xr/xi).

    The real part expands per dim to
    hr*rr*tr + hi*rr*ti + hr*ri*ti - hi*ri*tr; with integer
    components in [-500, 500) the sum is an EXACT int64 numerator
    (the float score x 1e9, |score| < 4e9) — the kg_distmult_score
    contract that removes cross-engine float rounding entirely.
    Same 10^12-triple shape: all embeddings resolved per dim in the
    scan projection (no parameter table, no shuffle), a fixed-order
    multiply-add chain both engines mirror term for term."""
    trip = _triples(spark, sf_dir).select("subj", "pred", "obj")

    def score(re_tag: str, im_tag: str):
        terms = []
        for j in range(_TE_DIM):
            hr = _emb_dim_int_col(F.col("subj"), "cr", j)
            hi = _emb_dim_int_col(F.col("subj"), "ci", j)
            rr = _emb_dim_int_col(F.col("pred"), "sr", j)
            ri = _emb_dim_int_col(F.col("pred"), "si", j)
            tr = _emb_dim_int_col(F.col("obj"), re_tag, j)
            ti = _emb_dim_int_col(F.col("obj"), im_tag, j)
            terms.append(hr * rr * tr + hi * rr * ti + hr * ri * ti - hi * ri * tr)
        return reduce(lambda a, b: a + b, terms)

    pos = score("cr", "ci").cast("long")
    neg = score("xr", "xi").cast("long")
    return trip.select(
        "subj",
        "pred",
        "obj",
        pos.alias("complex_score_e9"),
        neg.alias("neg_score_e9"),
        (pos - neg).alias("margin_e9"),
        ((pos - neg) > 0).alias("plausible"),
    )


# ---------------------------------------------------------------------------
# Predicate symmetry audit (data-driven OWL-characteristic profiling)
# ---------------------------------------------------------------------------


@register(
    "kg_symmetry_audit",
    oracle=f"""
    WITH t AS ({TRIPLES_SQL}),
    d AS (SELECT DISTINCT subj, pred, obj FROM t),
    flagged AS (
      SELECT d.subj, d.pred, d.obj,
        (d.subj = d.obj) AS is_self,
        (r.subj IS NOT NULL) AS has_rev
      FROM d
      LEFT JOIN (SELECT DISTINCT subj, pred, obj FROM t) r
        ON r.pred = d.pred AND r.subj = d.obj AND r.obj = d.subj
    ),
    agg AS (
      SELECT pred,
        CAST(count(*) AS BIGINT) AS n_edges,
        CAST(sum(CASE WHEN is_self THEN 1 ELSE 0 END) AS BIGINT) AS n_self_loops,
        CAST(sum(CASE WHEN NOT is_self AND has_rev THEN 1 ELSE 0 END)
             AS BIGINT) AS n_symmetric
      FROM flagged GROUP BY pred
    )
    SELECT pred, n_edges, n_self_loops, n_symmetric,
      CASE WHEN n_edges - n_self_loops = 0 THEN 1.0
        ELSE round(CAST(n_symmetric AS DOUBLE)
                   / (n_edges - n_self_loops), 6) END AS symmetry_ratio,
      CASE
        WHEN n_edges - n_self_loops = 0 THEN 'symmetric'
        WHEN n_symmetric = n_edges - n_self_loops THEN 'symmetric'
        WHEN n_symmetric = 0 THEN 'antisymmetric'
        ELSE 'mixed' END AS characteristic
    FROM agg
    """,
)
def kg_symmetry_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven predicate symmetry profiling over the triple
    table: for every predicate, how many non-self edges have their
    reverse asserted, and the resulting OWL-style characteristic
    ('symmetric' / 'antisymmetric' / 'mixed'). The relation-side
    complement to kg_schema_inference (which profiles domain/range
    types): sameAs-grade predicates SHOULD be symmetric — a 'mixed'
    verdict on one is a canonicalization bug — while containment/
    mention predicates should be antisymmetric, and the audit also
    tells the embedding layer which decoder fits (DistMult is exactly
    right for symmetric relations, ComplEx/TransE for directional
    ones — this query selects between the three registered scorers
    with data instead of doctrine).

    Scale shape: one distinct over the triple table, one keyed
    self-join on the swapped key (pred, obj, subj) — shuffles on the
    triple key, no pair enumeration beyond asserted edges — and one
    map-side-combined per-predicate agg; output is
    predicate-dictionary-sized. Ratios derive from exact integer
    counts in one fixed-order expression."""
    t = _triples(spark, sf_dir).select("subj", "pred", "obj").distinct()
    t = t.localCheckpoint(eager=False)  # two consumers: probe + reverse side
    rv = t.select(
        F.col("pred").alias("pred"),
        F.col("obj").alias("r_subj"),
        F.col("subj").alias("r_obj"),
        F.lit(1).alias("rev_marker"),
    )
    flagged = t.join(
        rv,
        (t["pred"] == rv["pred"])
        & (t["subj"] == rv["r_subj"])
        & (t["obj"] == rv["r_obj"]),
        "left",
    ).select(
        t["pred"].alias("pred"),
        (t["subj"] == t["obj"]).alias("is_self"),
        F.col("rev_marker").isNotNull().alias("has_rev"),
    )
    agg = flagged.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum(F.when(F.col("is_self"), 1).otherwise(0))
        .cast("long")
        .alias("n_self_loops"),
        F.sum(F.when(~F.col("is_self") & F.col("has_rev"), 1).otherwise(0))
        .cast("long")
        .alias("n_symmetric"),
    )
    non_self = F.col("n_edges") - F.col("n_self_loops")
    return agg.select(
        "pred",
        "n_edges",
        "n_self_loops",
        "n_symmetric",
        F.when(non_self == 0, F.lit(1.0))
        .otherwise(F.round(F.col("n_symmetric").cast("double") / non_self, 6))
        .alias("symmetry_ratio"),
        F.when(non_self == 0, F.lit("symmetric"))
        .when(F.col("n_symmetric") == non_self, F.lit("symmetric"))
        .when(F.col("n_symmetric") == 0, F.lit("antisymmetric"))
        .otherwise(F.lit("mixed"))
        .alias("characteristic"),
    )


# ---------------------------------------------------------------------------
# Predicate cardinality profile (OWL functionality audit)
# ---------------------------------------------------------------------------


@register(
    "kg_cardinality_profile",
    oracle=f"""
    WITH t AS ({TRIPLES_SQL}),
    d AS (SELECT DISTINCT subj, pred, obj FROM t),
    so AS (SELECT pred, subj, count(*) AS c FROM d GROUP BY 1, 2),
    oo AS (SELECT pred, obj, count(*) AS c FROM d GROUP BY 1, 2),
    s AS (
      SELECT pred, CAST(sum(c) AS BIGINT) AS n_triples,
        CAST(count(*) AS BIGINT) AS n_subjects,
        CAST(max(c) AS BIGINT) AS max_out
      FROM so GROUP BY pred
    ),
    o AS (
      SELECT pred, CAST(count(*) AS BIGINT) AS n_objects,
        CAST(max(c) AS BIGINT) AS max_in
      FROM oo GROUP BY pred
    )
    SELECT s.pred, s.n_triples, s.n_subjects, o.n_objects,
      round(CAST(s.n_triples AS DOUBLE) / s.n_subjects, 6) AS avg_out,
      s.max_out,
      round(CAST(s.n_triples AS DOUBLE) / o.n_objects, 6) AS avg_in,
      o.max_in,
      s.max_out = 1 AS is_functional,
      o.max_in = 1 AS is_inverse_functional
    FROM s JOIN o ON s.pred = o.pred
    """,
)
def kg_cardinality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-predicate cardinality profile: fan-out (objects per
    subject) and fan-in (subjects per object) statistics plus the
    OWL-style FunctionalProperty / InverseFunctionalProperty
    verdicts (max fan-out / fan-in of exactly 1). The second leg of
    the data-driven schema audit beside kg_symmetry_audit (symmetry
    says DIRECTION semantics; cardinality says MULTIPLICITY): a
    predicate that profiles inverse-functional is a candidate
    ENTITY KEY for record linkage (two subjects sharing its object
    are the same thing — the Fellegi-Sunter blocking insight), and a
    functional predicate asserting two different objects for one
    subject is exactly what kg_temporal_conflicts hunts. Also the
    negative-sampling guide: corrupting the tail of a functional
    predicate is guaranteed to produce a true negative.

    Scale shape: one distinct, then two map-side-combined keyed aggs
    ((pred, subj) and (pred, obj) — each shuffles once on its key),
    each collapsed to a predicate-dictionary row; the final join is
    dictionary x dictionary. No windows, no sorts, nothing
    corpus-sized past the first agg."""
    d = _triples(spark, sf_dir).select("subj", "pred", "obj").distinct()
    d = d.localCheckpoint(eager=False)  # two consumers: fan-out + fan-in
    so = d.groupBy("pred", "subj").agg(F.count(F.lit(1)).alias("c"))
    oo = d.groupBy("pred", "obj").agg(F.count(F.lit(1)).alias("c"))
    s = so.groupBy("pred").agg(
        F.sum("c").cast("long").alias("n_triples"),
        F.count(F.lit(1)).cast("long").alias("n_subjects"),
        F.max("c").cast("long").alias("max_out"),
    )
    o = oo.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_objects"),
        F.max("c").cast("long").alias("max_in"),
    )
    return s.join(o, "pred").select(
        "pred",
        "n_triples",
        "n_subjects",
        "n_objects",
        F.round(F.col("n_triples").cast("double") / F.col("n_subjects"), 6).alias(
            "avg_out"
        ),
        "max_out",
        F.round(F.col("n_triples").cast("double") / F.col("n_objects"), 6).alias(
            "avg_in"
        ),
        "max_in",
        (F.col("max_out") == 1).alias("is_functional"),
        (F.col("max_in") == 1).alias("is_inverse_functional"),
    )


# ---------------------------------------------------------------------------
# Per-dimension embedding variance profile (diagonal whitening audit)
# ---------------------------------------------------------------------------


@register(
    "emb_dim_variance",
    oracle="""
    WITH exploded AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
        CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    mom AS (
      SELECT dim, count(*) AS n, sum(x) AS s1, sum(x * x) AS s2
      FROM exploded GROUP BY dim
    ),
    v AS (
      SELECT CAST(dim AS INTEGER) AS dim,
        s1 / n AS mean,
        (s2 - s1 * s1 / n) / (n - 1) AS variance
      FROM mom
    ),
    tot AS (SELECT sum(variance) AS tv, count(*) AS d FROM v)
    SELECT v.dim, round(v.mean, 6) AS mean,
      round(v.variance, 6) AS variance,
      round(v.variance / tot.tv, 6) AS var_share,
      v.variance / tot.tv > 2.0 / tot.d AS is_dominant
    FROM v CROSS JOIN tot
    """,
)
def emb_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/variance profile of the embedding corpus
    plus each dimension's share of total variance — the DIAGONAL
    whitening audit beside emb_power_iteration's top principal
    component (the PC says whether anisotropy exists off-axis; this
    says which coordinates carry it on-axis, i.e. exactly what
    mean-centering + per-dim scaling — the cheap whitening every
    retrieval stack applies first — would fix). Dimensions flagged
    is_dominant (share > 2/d) are the rogue coordinates that
    dominate L2 distances and should be rescaled before ANN
    indexing; a large nonzero mean vector is the "common direction"
    all-but-the-top removes.

    Scale shape: one corpus scan exploded to (dim, x), ONE
    map-side-combined per-dim moment agg (d groups regardless of
    corpus size), variance from the sums in a fixed-order expression
    (the ev_burst_detect discipline — no variance_samp, whose merge
    order is engine-internal); the d-row profile joins a broadcast
    1-row total. Output is d rows at any corpus size."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    exploded = emb.select(
        (F.posexplode("embedding"))
    ).select((F.col("pos") + 1).alias("dim"), F.col("col").cast("double").alias("x"))
    mom = exploded.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
    )
    v = mom.select(
        F.col("dim").cast("int").alias("dim"),
        (F.col("s1") / F.col("n")).alias("mean"),
        ((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)).alias(
            "variance"
        ),
    )
    v = v.localCheckpoint(eager=False)  # two consumers: total + final
    tot = v.agg(F.sum("variance").alias("tv"), F.count(F.lit(1)).alias("d"))
    return v.crossJoin(F.broadcast(tot)).select(
        "dim",
        F.round("mean", 6).alias("mean"),
        F.round("variance", 6).alias("variance"),
        F.round(F.col("variance") / F.col("tv"), 6).alias("var_share"),
        (F.col("variance") / F.col("tv") > 2.0 / F.col("d")).alias("is_dominant"),
    )


# ---------------------------------------------------------------------------
# Centroid-based simplified silhouette (label-separation eval)
# ---------------------------------------------------------------------------


@register(
    "emb_silhouette",
    oracle="""
    WITH exploded AS (
      SELECT vec_id, label, generate_subscripts(embedding, 1) AS dim,
        CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    cent AS (
      SELECT label AS c_label, dim, avg(x) AS cx
      FROM exploded GROUP BY label, dim
    ),
    dist AS (
      SELECT e.vec_id, e.label, c.c_label,
        sqrt(sum((e.x - c.cx) * (e.x - c.cx))) AS d
      FROM exploded e JOIN cent c ON e.dim = c.dim
      GROUP BY e.vec_id, e.label, c.c_label
    ),
    ab AS (
      SELECT vec_id, label,
        max(CASE WHEN label = c_label THEN d END) AS a,
        min(CASE WHEN label <> c_label THEN d END) AS b
      FROM dist GROUP BY vec_id, label
    ),
    s AS (
      SELECT vec_id, label, a, b,
        (b - a) / greatest(a, b) AS s
      FROM ab
    )
    SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
      round(avg(a), 6) AS mean_intra,
      round(avg(b), 6) AS mean_nearest_other,
      round(avg(s), 6) AS mean_silhouette
    FROM s GROUP BY label
    """,
)
def emb_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label simplified silhouette over the embedding corpus:
    for every vector, a = distance to its OWN label centroid, b =
    distance to the nearest OTHER centroid, s = (b-a)/max(a,b) —
    the clustering-quality eval at label grain (classic silhouette
    is O(n²) pairwise; the centroid form is the scale-native
    standard and what sklearn users actually reach for first).
    Completes the embedding-eval shelf: emb_label_outliers flags
    individual mislabeled points, emb_drift_monitor watches
    centroids move, this scores whether the label structure is
    separable AT ALL (mean_silhouette near 0 says the labels do not
    live in this embedding — retrain before building the ANN index).

    Scale shape: centroids are ONE per-(label, dim) avg over the
    exploded corpus — a label x d dictionary, broadcast back; every
    vector computes distances to ALL |labels| centroids in one keyed
    join + per-(vec, label) sum (corpus x |labels| rows, the
    knn-classify budget); a/b collapse via conditional min/max in
    one agg; the report is |labels| rows."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "label", "embedding"
    )
    exploded = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding"),
    ).select(
        "vec_id",
        "label",
        (F.col("pos") + 1).alias("dim"),
        F.col("col").cast("double").alias("x"),
    ).localCheckpoint(eager=False)  # two consumers: centroids + distances
    cent = exploded.groupBy(F.col("label").alias("c_label"), "dim").agg(
        F.avg("x").alias("cx")
    )
    dist = (
        exploded.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "label", "c_label")
        .agg(F.sqrt(F.sum((F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx")))).alias("d"))
    )
    ab = dist.groupBy("vec_id", "label").agg(
        F.max(F.when(F.col("label") == F.col("c_label"), F.col("d"))).alias("a"),
        F.min(F.when(F.col("label") != F.col("c_label"), F.col("d"))).alias("b"),
    )
    s = (F.col("b") - F.col("a")) / F.greatest("a", "b")
    return ab.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.round(F.avg("a"), 6).alias("mean_intra"),
        F.round(F.avg("b"), 6).alias("mean_nearest_other"),
        F.round(F.avg(s), 6).alias("mean_silhouette"),
    )


# ---------------------------------------------------------------------------
# Property completeness profile (coverage per type bucket x predicate)
# ---------------------------------------------------------------------------

_COMPLETENESS_BUCKETS = 8


@register(
    "kg_completeness_profile",
    oracle=f"""
    WITH t AS ({TRIPLES_SQL}),
    ents AS (SELECT DISTINCT subj AS entity FROM t),
    typed AS (
      SELECT entity,
        'c' || CAST({md5_long_sql("entity")} % {_COMPLETENESS_BUCKETS}
               AS VARCHAR) AS cls
      FROM ents
    ),
    cls_n AS (SELECT cls, count(*) AS n_entities FROM typed GROUP BY cls),
    preds AS (SELECT DISTINCT pred FROM t),
    has_p AS (
      SELECT DISTINCT ty.cls, t.pred, t.subj
      FROM t JOIN typed ty ON t.subj = ty.entity
    ),
    cov AS (
      SELECT cls, pred, count(*) AS n_with FROM has_p GROUP BY cls, pred
    )
    SELECT c.cls, p.pred,
      CAST(c.n_entities AS BIGINT) AS n_entities,
      CAST(coalesce(v.n_with, 0) AS BIGINT) AS n_with_pred,
      round(CAST(coalesce(v.n_with, 0) AS DOUBLE) / c.n_entities, 6)
        AS coverage
    FROM cls_n c CROSS JOIN preds p
    LEFT JOIN cov v ON v.cls = c.cls AND v.pred = p.pred
    """,
)
def kg_completeness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Property completeness profile: for every (type bucket,
    predicate) cell, the fraction of that type's entities carrying
    at least one edge of that predicate — the KG-quality measure the
    Linked-Data completeness literature standardizes (a class whose
    instances mostly LACK an expected property is an extraction gap,
    not a fact about the world), and the denominator-aware
    complement to kg_cardinality_profile (cardinality profiles the
    edges that exist; completeness profiles the entities that have
    NONE). Entities bucket into {b} deterministic md5 type buckets
    (the stand-in for a curated type dictionary — swapping in
    kg_type_inference's classes changes the join key, not the plan);
    the full bucket x predicate grid is emitted, zeros included —
    the zero cells ARE the findings.

    Scale shape: one distinct over triples, the entity dictionary
    types in its scan projection (hashing, no lookup table); a
    distinct (cls, pred, subj) semi-set + one keyed count; the final
    grid is a {b} x |preds| dictionary cross join with a broadcast
    left join of the coverage counts."""
    t = _triples(spark, sf_dir).select("subj", "pred").localCheckpoint(
        eager=False
    )  # two consumers: entity dictionary + coverage set
    cls_of = F.concat(
        F.lit("c"),
        (md5_long(F.col("entity")) % _COMPLETENESS_BUCKETS).cast("string"),
    )
    typed = (
        t.select(F.col("subj").alias("entity"))
        .distinct()
        .select("entity", cls_of.alias("cls"))
    )
    cls_n = typed.groupBy("cls").agg(F.count(F.lit(1)).alias("n_entities"))
    preds = t.select("pred").distinct()
    has_p = (
        t.join(typed, t["subj"] == typed["entity"])
        .select("cls", "pred", "subj")
        .distinct()
    )
    cov = has_p.groupBy("cls", "pred").agg(F.count(F.lit(1)).alias("n_with"))
    return (
        cls_n.crossJoin(preds)
        .join(F.broadcast(cov), ["cls", "pred"], "left")
        .select(
            "cls",
            "pred",
            F.col("n_entities").cast("long").alias("n_entities"),
            F.coalesce(F.col("n_with"), F.lit(0)).cast("long").alias(
                "n_with_pred"
            ),
            F.round(
                F.coalesce(F.col("n_with"), F.lit(0)).cast("double")
                / F.col("n_entities"),
                6,
            ).alias("coverage"),
        )
    )


kg_completeness_profile.__doc__ = kg_completeness_profile.__doc__.format(
    b=_COMPLETENESS_BUCKETS
)


# ---------------------------------------------------------------------------
# Decoder-agreement audit (Pearson between the three scorers)
# ---------------------------------------------------------------------------


def _decoder_scores_sql() -> str:
    def transe_sq() -> str:
        terms = [
            f"(({_emb_dim_int_sql('subj', 'e', j)} + {_emb_dim_int_sql('pred', 'r', j)}"
            f" - {_emb_dim_int_sql('obj', 'e', j)})"
            f" * ({_emb_dim_int_sql('subj', 'e', j)} + {_emb_dim_int_sql('pred', 'r', j)}"
            f" - {_emb_dim_int_sql('obj', 'e', j)}))"
            for j in range(_TE_DIM)
        ]
        return "-(" + " + ".join(terms) + ")"

    def distmult() -> str:
        terms = [
            f"({_emb_dim_int_sql('subj', 'e', j)} * {_emb_dim_int_sql('pred', 'r', j)}"
            f" * {_emb_dim_int_sql('obj', 'e', j)})"
            for j in range(_TE_DIM)
        ]
        return "(" + " + ".join(terms) + ")"

    def complex_re() -> str:
        terms = []
        for j in range(_TE_DIM):
            hr = _emb_dim_int_sql("subj", "cr", j)
            hi = _emb_dim_int_sql("subj", "ci", j)
            rr = _emb_dim_int_sql("pred", "sr", j)
            ri = _emb_dim_int_sql("pred", "si", j)
            tr = _emb_dim_int_sql("obj", "cr", j)
            ti = _emb_dim_int_sql("obj", "ci", j)
            terms.append(
                f"({hr} * {rr} * {tr} + {hi} * {rr} * {ti}"
                f" + {hr} * {ri} * {ti} - {hi} * {ri} * {tr})"
            )
        return "(" + " + ".join(terms) + ")"

    return (
        f"SELECT CAST({transe_sq()} AS HUGEINT) AS t, "
        f"CAST({distmult()} AS HUGEINT) AS d, "
        f"CAST({complex_re()} AS HUGEINT) AS c FROM tt"
    )


@register(
    "kg_decoder_agreement",
    oracle=f"""
    WITH tt AS ({TRIPLES_SQL}),
    s AS ({_decoder_scores_sql()}),
    mom AS (
      SELECT count(*) AS n,
        sum(t) AS st, sum(d) AS sd, sum(c) AS sc,
        sum(t * t) AS stt, sum(d * d) AS sdd, sum(c * c) AS scc,
        sum(t * d) AS std, sum(t * c) AS stc, sum(d * c) AS sdc
      FROM s
    ),
    legs AS (
      SELECT 'transe~distmult' AS pair, n, st AS si, sd AS sj,
        stt AS sii, sdd AS sjj, std AS sij FROM mom
      UNION ALL
      SELECT 'transe~complex', n, st, sc, stt, scc, stc FROM mom
      UNION ALL
      SELECT 'distmult~complex', n, sd, sc, sdd, scc, sdc FROM mom
    )
    SELECT pair, CAST(n AS BIGINT) AS n_triples,
      round(
        (CAST(n AS DOUBLE) * sij - CAST(si AS DOUBLE) * sj)
        / sqrt((CAST(n AS DOUBLE) * sii - CAST(si AS DOUBLE) * si)
               * (CAST(n AS DOUBLE) * sjj - CAST(sj AS DOUBLE) * sj)), 6)
        AS pearson_r
    FROM legs
    """,
)
def kg_decoder_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson agreement between the three registered
    KG-embedding decoders' positive-score vectors over ALL triples —
    the model-selection readout that ties the scorer trio together
    (high agreement says the decoders would admit the same edges and
    the cheapest one suffices; low agreement localizes where the
    geometry matters — exactly the relations kg_symmetry_audit
    profiles). The TransE leg enters as the NEGATED SQUARED distance
    (a monotone transform of the TransE score that stays integer;
    documented in the column contract), DistMult and ComplEx as
    their exact int64 bilinear forms — so every moment (sums,
    squares, cross products) is EXACT wide-integer arithmetic
    (DECIMAL(38,0) here, HUGEINT in the oracle; products reach
    ~1.6e19 per row, far past int64) and the three correlations are
    fixed-order float expressions over identical exact integers.

    Scale shape: one scan-projection pass computes all three scores
    (the kg_distmult_score plan — hashing, no parameter table), ONE
    map-side-combined global moment agg (10 numbers at any corpus
    size), three report rows projected from it."""
    trip = _triples(spark, sf_dir).select("subj", "pred", "obj")

    def terms_sum(parts):
        return reduce(lambda a, b: a + b, parts)

    t_sq = -terms_sum(
        [
            (
                lambda e: e * e
            )(
                _emb_dim_int_col(F.col("subj"), "e", j)
                + _emb_dim_int_col(F.col("pred"), "r", j)
                - _emb_dim_int_col(F.col("obj"), "e", j)
            )
            for j in range(_TE_DIM)
        ]
    )
    dm = terms_sum(
        [
            _emb_dim_int_col(F.col("subj"), "e", j)
            * _emb_dim_int_col(F.col("pred"), "r", j)
            * _emb_dim_int_col(F.col("obj"), "e", j)
            for j in range(_TE_DIM)
        ]
    )
    cx_parts = []
    for j in range(_TE_DIM):
        hr = _emb_dim_int_col(F.col("subj"), "cr", j)
        hi = _emb_dim_int_col(F.col("subj"), "ci", j)
        rr = _emb_dim_int_col(F.col("pred"), "sr", j)
        ri = _emb_dim_int_col(F.col("pred"), "si", j)
        tr = _emb_dim_int_col(F.col("obj"), "cr", j)
        ti = _emb_dim_int_col(F.col("obj"), "ci", j)
        cx_parts.append(hr * rr * tr + hi * rr * ti + hr * ri * ti - hi * ri * tr)
    cx = terms_sum(cx_parts)

    dec = lambda col: col.cast("decimal(12,0)")  # noqa: E731
    s = trip.select(
        dec(t_sq).alias("t"), dec(dm).alias("d"), dec(cx).alias("c")
    )
    mom = s.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("st"), F.sum("d").alias("sd"), F.sum("c").alias("sc"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
        F.sum(F.col("c") * F.col("c")).alias("scc"),
        F.sum(F.col("t") * F.col("d")).alias("std"),
        F.sum(F.col("t") * F.col("c")).alias("stc"),
        F.sum(F.col("d") * F.col("c")).alias("sdc"),
    ).localCheckpoint(eager=False)  # three report legs

    def leg(name, si, sj, sii, sjj, sij):
        nd = F.col("n").cast("double")
        num = nd * F.col(sij).cast("double") - F.col(si).cast("double") * F.col(
            sj
        ).cast("double")
        den = F.sqrt(
            (nd * F.col(sii).cast("double") - F.col(si).cast("double") * F.col(si).cast("double"))
            * (nd * F.col(sjj).cast("double") - F.col(sj).cast("double") * F.col(sj).cast("double"))
        )
        return mom.select(
            F.lit(name).alias("pair"),
            F.col("n").cast("long").alias("n_triples"),
            F.round(num / den, 6).alias("pearson_r"),
        )

    return (
        leg("transe~distmult", "st", "sd", "stt", "sdd", "std")
        .union(leg("transe~complex", "st", "sc", "stt", "scc", "stc"))
        .union(leg("distmult~complex", "sd", "sc", "sdd", "scc", "sdc"))
    )


# ---------------------------------------------------------------------------
# Inverse-predicate discovery (OWL inverseOf mining)
# ---------------------------------------------------------------------------


@register(
    "kg_inverse_discovery",
    oracle=f"""
    WITH t AS ({TRIPLES_SQL}),
    d AS (SELECT DISTINCT subj, pred, obj FROM t WHERE subj <> obj),
    pn AS (SELECT pred, count(*) AS n FROM d GROUP BY pred),
    ov AS (
      SELECT a.pred AS pred_a, b.pred AS pred_b, count(*) AS n_overlap
      FROM d a JOIN d b ON a.subj = b.obj AND a.obj = b.subj
      GROUP BY a.pred, b.pred
    )
    SELECT pa.pred AS pred_a, pb.pred AS pred_b,
      CAST(pa.n AS BIGINT) AS n_a,
      CAST(coalesce(o.n_overlap, 0) AS BIGINT) AS n_overlap,
      round(CAST(coalesce(o.n_overlap, 0) AS DOUBLE) / pa.n, 6)
        AS inverse_ratio,
      coalesce(o.n_overlap, 0) >= 10
        AND CAST(coalesce(o.n_overlap, 0) AS DOUBLE) / pa.n >= 0.95
        AS is_inverse_candidate
    FROM pn pa CROSS JOIN pn pb
    LEFT JOIN ov o ON o.pred_a = pa.pred AND o.pred_b = pb.pred
    """,
)
def kg_inverse_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OWL inverseOf mining over the triple table: for every ordered
    predicate pair (p, q), the fraction of p's non-self edges whose
    REVERSED pair is asserted under q — the cross-predicate
    generalization of kg_symmetry_audit (whose verdicts are exactly
    this table's diagonal): a (p, q) cell near 1.0 with support says
    q is p's inverse (parent_of/child_of, cites/cited_by), which a
    KG normalizer uses to fold redundant inverse edges into one
    canonical direction — halving edge storage and making the
    cardinality profile's fan-in/fan-out verdicts coherent. The full
    p x q grid is emitted, zeros included (an EXPECTED inverse pair
    scoring 0 is an extraction bug).

    Scale shape: one distinct, one keyed self-join on the swapped
    (subj, obj) key — shuffles on the node-pair key, only asserted
    reversals produce rows — one (pred_a, pred_b) agg; the grid is a
    predicate-dictionary cross join with the overlap counts
    broadcast-left-joined."""
    d = (
        _triples(spark, sf_dir)
        .select("subj", "pred", "obj")
        .where(F.col("subj") != F.col("obj"))
        .distinct()
        .localCheckpoint(eager=False)  # three consumers below
    )
    pn = d.groupBy("pred").agg(F.count(F.lit(1)).alias("n"))
    b = d.select(
        F.col("pred").alias("pred_b"),
        F.col("obj").alias("b_subj"),
        F.col("subj").alias("b_obj"),
    )
    ov = (
        d.join(b, (d["subj"] == b["b_subj"]) & (d["obj"] == b["b_obj"]))
        .groupBy(F.col("pred").alias("pred_a"), "pred_b")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    grid = pn.select(F.col("pred").alias("pred_a"), F.col("n").alias("n_a")).crossJoin(
        F.broadcast(pn.select(F.col("pred").alias("pred_b")))
    )
    ratio = F.coalesce(F.col("n_overlap"), F.lit(0)).cast("double") / F.col("n_a")
    return grid.join(F.broadcast(ov), ["pred_a", "pred_b"], "left").select(
        "pred_a",
        "pred_b",
        F.col("n_a").cast("long").alias("n_a"),
        F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long").alias("n_overlap"),
        F.round(ratio, 6).alias("inverse_ratio"),
        (
            (F.coalesce(F.col("n_overlap"), F.lit(0)) >= 10) & (ratio >= 0.95)
        ).alias("is_inverse_candidate"),
    )


# ---------------------------------------------------------------------------
# RotatE triple plausibility (complex-rotation translational scorer)
# ---------------------------------------------------------------------------

# RotatE (Sun et al., ICLR 2019) models a relation as a rotation in
# complex space: t ~ h o r.  Entities REUSE the ComplEx complex
# embedding (tags cr/ci — one shared entity parameter table, three
# decoders), the relation rotation gets its own family (qr/qi), and
# the corrupted tail reuses the shared negative family (xr/xi).  The
# trained model constrains |r_j| = 1; with hash-derived INTEGER
# components the rotation is unnormalized, so the tail is scaled by
# the component modulus (500) to keep h o r and t on the same scale
# — the decoder family (rotation + translational distance, hence
# able to model symmetry, antisymmetry, inversion AND composition,
# which none of TransE/DistMult/ComplEx span alone) is what the
# contract pins, not the trained weights.

_ROTATE_TSCALE = 500


def _rotate_sql() -> str:
    def dist2(re_tag: str, im_tag: str) -> str:
        terms = []
        for j in range(_TE_DIM):
            hr = _emb_dim_int_sql("subj", "cr", j)
            hi = _emb_dim_int_sql("subj", "ci", j)
            rr = _emb_dim_int_sql("pred", "qr", j)
            ri = _emb_dim_int_sql("pred", "qi", j)
            tr = _emb_dim_int_sql("obj", re_tag, j)
            ti = _emb_dim_int_sql("obj", im_tag, j)
            dre = f"({hr} * {rr} - {hi} * {ri} - {_ROTATE_TSCALE} * {tr})"
            dim = f"({hr} * {ri} + {hi} * {rr} - {_ROTATE_TSCALE} * {ti})"
            terms.append(f"({dre} * {dre} + {dim} * {dim})")
        return "(" + " + ".join(terms) + ")"

    return f"""
    WITH t AS ({TRIPLES_SQL}),
    scored AS (
      SELECT subj, pred, obj,
        CAST({dist2('cr', 'ci')} AS BIGINT) AS pos_d2,
        CAST({dist2('xr', 'xi')} AS BIGINT) AS neg_d2
      FROM t
    )
    SELECT subj, pred, obj,
      pos_d2 AS rotate_dist2,
      neg_d2 AS neg_dist2,
      neg_d2 - pos_d2 AS margin_d2,
      (neg_d2 - pos_d2) > 0 AS plausible
    FROM scored
    """


@register("kg_rotate_score", oracle=_rotate_sql())
def kg_rotate_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RotatE triple plausibility (Sun et al., ICLR 2019): squared
    complex-rotation translational distance |h o r - t|^2 per
    materialized triple, against the shared corrupted-tail negative
    — the FOURTH standard shallow decoder beside kg_transe_score,
    kg_distmult_score and kg_complex_score, and the one that closes
    the relation-pattern matrix: rotation composes (r1 o r2 is a
    rotation), inverts (conjugate), and represents both symmetric
    (r = +/-1) and antisymmetric relations, so a decoder comparison
    over this trio-plus-one spans every pattern class the KG
    literature tests (reference analog: the typed Biolink predicates
    its schema_config.yaml declares include symmetric pairs and
    inverse pairs — kg_inverse_discovery finds them data-side).

    Entities REUSE the ComplEx complex embedding (hash tags cr/ci),
    so subject and object positions — and both decoders — share one
    entity parameter table; the relation rotation is its own family
    (qr/qi), the negative the shared xr/xi. Per dim the residual is
    (hr*rr - hi*ri - 500*tr, hr*ri + hi*rr - 500*ti) — integer
    components in [-500, 500) make the summed squared modulus an
    EXACT int64 (< 1e13), the same no-float contract as DistMult/
    ComplEx: emitting the integer sidesteps cross-engine rounding
    entirely. Same 10^12-triple shape: embeddings resolved per dim
    in the scan projection, no parameter table, no shuffle, a
    fixed-order multiply-add chain both engines mirror term for
    term."""
    trip = _triples(spark, sf_dir).select("subj", "pred", "obj")

    def dist2(re_tag: str, im_tag: str):
        terms = []
        for j in range(_TE_DIM):
            hr = _emb_dim_int_col(F.col("subj"), "cr", j)
            hi = _emb_dim_int_col(F.col("subj"), "ci", j)
            rr = _emb_dim_int_col(F.col("pred"), "qr", j)
            ri = _emb_dim_int_col(F.col("pred"), "qi", j)
            tr = _emb_dim_int_col(F.col("obj"), re_tag, j)
            ti = _emb_dim_int_col(F.col("obj"), im_tag, j)
            dre = hr * rr - hi * ri - F.lit(_ROTATE_TSCALE) * tr
            dim = hr * ri + hi * rr - F.lit(_ROTATE_TSCALE) * ti
            terms.append(dre * dre + dim * dim)
        return reduce(lambda a, b: a + b, terms)

    pos = dist2("cr", "ci").cast("long")
    neg = dist2("xr", "xi").cast("long")
    return trip.select(
        "subj",
        "pred",
        "obj",
        pos.alias("rotate_dist2"),
        neg.alias("neg_dist2"),
        (neg - pos).alias("margin_d2"),
        ((neg - pos) > 0).alias("plausible"),
    )


# ---------------------------------------------------------------------------
# Incremental connected components (delta maintenance vs full oracle)
# ---------------------------------------------------------------------------

# The same-as evidence splits 75/25 by edge hash into the BASE graph
# (yesterday's canonicalization) and the DELTA batch (today's new
# evidence).


def _inc_components_sql() -> str:
    from multiomics_biocypher_kg_spark.functions.hashing import md5_long_sql
    from multiomics_biocypher_kg_spark.oracle_fragments import SAMEAS_SQL

    h = md5_long_sql("id_a || '|' || id_b || '#inc'")
    return f"""
    WITH RECURSIVE raw AS ({SAMEAS_SQL}),
    und AS (
      SELECT id_a AS a, id_b AS b FROM raw
      UNION
      SELECT id_b, id_a FROM raw
    ),
    base AS (
      SELECT id_a, id_b FROM raw WHERE NOT ({h} % 4 = 0)
    ),
    bund AS (
      SELECT id_a AS a, id_b AS b FROM base
      UNION
      SELECT id_b, id_a FROM base
      UNION
      SELECT id_a, id_a FROM raw
      UNION
      SELECT id_b, id_b FROM raw
    ),
    breach(node, lbl) AS (
      SELECT a, a FROM bund
      UNION
      SELECT u.a, r.lbl FROM bund u JOIN breach r ON u.b = r.node
    ),
    bcomp AS (SELECT node, min(lbl) AS base_component
              FROM breach GROUP BY node),
    reach(node, lbl) AS (
      SELECT a, a FROM und
      UNION
      SELECT u.a, r.lbl FROM und u JOIN reach r ON u.b = r.node
    ),
    comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node)
    SELECT c.node, c.component, b.base_component,
      c.component <> b.base_component AS changed
    FROM comp c JOIN bcomp b ON c.node = b.node
    """


@register("kg_components_incremental", oracle=_inc_components_sql())
def kg_components_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL canonicalization maintenance: given yesterday's
    component labels (the base same-as graph, a deterministic 75%
    hash split of the evidence) and today's DELTA batch (the other
    25%), recompute labels by running pointer-jump CC over the STAR
    GRAPH of the old labels (one node -> label edge per node) plus
    ONLY the delta edges — never re-touching the base edge set. This
    is the nightly-canonicalization shape the north rule's MERGE
    checkpoints feed: the base graph at 10^12 scale is too large to
    re-scan per batch, but the label table is one row per node and
    the star graph is label-equivalent to it, so CC(star U delta) ==
    CC(base U delta) exactly — including component ids, because
    labels are min member nodes and every member appears in the star
    graph. The ORACLE proves it by doing what the operator avoids: a
    FULL recursive-CTE recompute over base U delta, plus the
    base-only recompute for the `changed` flag. Agreement is the
    correctness-of-incremental-maintenance theorem, checked value
    for value.

    Scale shape: the base CC runs once (amortized across batches);
    the per-batch cost is pointer-jump CC over |V| star edges +
    |delta|, which converges in ~2 rounds because the star side is
    already flat — vs log-diameter rounds over the full graph.
    `changed` marks nodes whose canonical id the delta moved — the
    rows a MERGE INTO actually has to rewrite."""
    from multiomics_biocypher_kg_spark.functions.hashing import md5_long
    from multiomics_biocypher_kg_spark.operators.canonicalize import (
        connected_components,
    )
    from multiomics_biocypher_kg_spark.plans.pipeline import (
        sameas_from_documents,
    )

    sameas = sameas_from_documents(spark, sf_dir).localCheckpoint(eager=False)
    is_delta = (
        md5_long(
            F.concat(F.col("id_a"), F.lit("|"), F.col("id_b"), F.lit("#inc"))
        )
        % 4
        == 0
    )
    base = sameas.where(~is_delta)
    delta = sameas.where(is_delta)
    # every node must carry a base label even if isolated in the
    # base graph: seed the base CC with self-loops over ALL nodes
    all_nodes = (
        sameas.select(F.col("id_a").alias("node"))
        .union(sameas.select("id_b"))
        .distinct()
    )
    base_edges = base.select("id_a", "id_b").unionByName(
        all_nodes.select(
            F.col("node").alias("id_a"), F.col("node").alias("id_b")
        )
    )
    bcomp = connected_components(base_edges, src="id_a", dst="id_b").select(
        "node", F.col("component").alias("base_component")
    )
    bcomp = bcomp.localCheckpoint()  # yesterday's label table
    star = bcomp.select(
        F.col("node").alias("id_a"), F.col("base_component").alias("id_b")
    )
    final = connected_components(
        star.unionByName(delta.select("id_a", "id_b")), src="id_a", dst="id_b"
    )
    return final.join(bcomp, "node").select(
        "node",
        "component",
        "base_component",
        (F.col("component") != F.col("base_component")).alias("changed"),
    )


# ---------------------------------------------------------------------------
# ColBERT-style late-interaction MaxSim retrieval
# ---------------------------------------------------------------------------

_CB_DIM = 8
_CB_QTOKENS = 6
_CB_NQ = 5
_CB_TOP = 10


def _cb_comp_sql(tok_expr: str, j: int) -> str:
    from multiomics_biocypher_kg_spark.functions.hashing import md5_long_sql

    suffix = " || '#tv" + str(j) + "'"
    return f"({md5_long_sql(tok_expr + suffix)} % 256 - 128)"


def _cb_dot_sql() -> str:
    terms = [
        f"{_cb_comp_sql('q.qtok', j)} * {_cb_comp_sql('t.token', j)}"
        for j in range(_CB_DIM)
    ]
    return "(" + " + ".join(terms) + ")"


@register(
    "emb_colbert_maxsim",
    oracle=f"""
    WITH qtoks AS (
      SELECT doc_id AS query_id,
        generate_subscripts(string_split(text, ' ')[1:{_CB_QTOKENS}], 1)
          AS qpos,
        unnest(string_split(text, ' ')[1:{_CB_QTOKENS}]) AS qtok
      FROM documents WHERE doc_id < {_CB_NQ}
    ),
    dtoks AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    dots AS (
      SELECT q.query_id, q.qpos, t.doc_id,
        max({_cb_dot_sql()}) AS best
      FROM qtoks q CROSS JOIN dtoks t
      GROUP BY q.query_id, q.qpos, t.doc_id
    ),
    scored AS (
      SELECT query_id, doc_id, CAST(sum(best) AS BIGINT) AS maxsim
      FROM dots GROUP BY query_id, doc_id
    ),
    ranked AS (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        ORDER BY maxsim DESC, doc_id ASC) AS INTEGER) AS rank
      FROM scored
    )
    SELECT query_id, doc_id, maxsim, rank
    FROM ranked WHERE rank <= {_CB_TOP}
    """,
)
def emb_colbert_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATE-INTERACTION retrieval (ColBERT, Khattab & Zaharia,
    SIGIR 2020): instead of one vector per document, every TOKEN
    carries a vector, and the query-document score is
    MaxSim — sum over query tokens of the max dot product against
    any document token — which preserves term-level matching that
    single-vector pooling destroys (the reason ColBERT-style
    retrievers beat bi-encoders on precise queries). Queries are
    the first {nq} docs' first {qt} tokens; token vectors are the
    hash-derived int8 components of the decoder family (dim {d}),
    so every dot product, max, and sum is EXACT int64 — the
    DistMult no-float contract applied to a retrieval paradigm.

    Scale shape: the {nq}x{qt}-row query-token table BROADCASTS
    against the DISTINCT (doc, token) stream (max over a multiset
    == max over the set, so the distinct pass also dedups work) —
    the cosine_topk broadcast-probe convention; the MaxSim
    reduction is two keyed aggs (per-(query-token, doc) max, then
    per-(query, doc) sum — both map-side combinable); top-{k} per
    query via a window partitioned by query. At index scale the
    candidate generation step (an impact-index or ANN first pass)
    slots in front; the fixture scores the full corpus because it
    is the oracle-checkable exact form."""
    from multiomics_biocypher_kg_spark.functions.hashing import md5_long

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    qtoks = docs.where(F.col("doc_id") < _CB_NQ).select(
        F.col("doc_id").alias("query_id"),
        F.posexplode(F.slice(F.split("text", " "), 1, _CB_QTOKENS)).alias(
            "qpos", "qtok"
        ),
    )
    dtoks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).distinct()

    def comp(col, j):
        return md5_long(F.concat(col, F.lit(f"#tv{j}"))) % 256 - 128

    dot = sum(
        comp(F.col("qtok"), j) * comp(F.col("token"), j)
        for j in range(_CB_DIM)
    )
    dots = (
        dtoks.crossJoin(F.broadcast(qtoks))
        # keyed by query-token POSITION: a repeated query token
        # contributes once per OCCURRENCE (true MaxSim semantics)
        .groupBy("query_id", "qpos", "doc_id")
        .agg(F.max(dot).alias("best"))
    )
    scored = dots.groupBy("query_id", "doc_id").agg(
        F.sum("best").cast("long").alias("maxsim")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("maxsim").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= _CB_TOP)
        .select("query_id", "doc_id", "maxsim", "rank")
    )


emb_colbert_maxsim.__doc__ = emb_colbert_maxsim.__doc__.format(
    nq=_CB_NQ, qt=_CB_QTOKENS, d=_CB_DIM, k=_CB_TOP
)
