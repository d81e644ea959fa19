"""Round-4 pretraining-data operators: iterative BPE merge training,
margin-based bitext mining, point-in-time KG snapshots, extraction
quality via text-density, skip-gram pair generation over the walk
corpus, AMIE-style rule mining, truth discovery over conflicting
source claims, and a dedup P/R evaluation against provenance gold.

These close the remaining gaps between "curated web corpus" and
"tokenizer + embedding training inputs": the tokenizer's merge
table (the one genuinely sequential loop in the stack, expressed as
K dictionary-sized rounds, never a corpus re-scan), the
cross-lingual pair miner (CCMatrix-style margin scoring), the
as-of view any reproducible training snapshot needs, the
density gate that catches extraction failures before they poison
the corpus, and the (center, context) pair stream word2vec-family
trainers consume.

All operators are oracle-paired; randomness-free by construction
(deterministic walks, data-derived thresholds). Registered through
the shared registry so the oracle sweep, driver window, and bench
see them with zero extra wiring. Registered after the round-4
driver-window freeze — INTENTIONALLY deferred to the round-5
window, local-sweep-verified this round (the registry.py NOTE
lists them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.oracle_fragments import HTML_SQL, URL_SQL
from multiomics_biocypher_kg_spark.registry import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# BPE merge training (iterative, dictionary-sized state)
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 4

# Segmentations are encoded as '(sym1)(sym2)...': each symbol is
# wrapped in parens (chars outside the [a-z] word alphabet), so a
# literal replace of '(p1)(p2)' -> '(p1p2)' applies a merge with
# exact BPE semantics — boundary-anchored (the pattern can only
# match where p1 is a COMPLETE symbol: '(b)(c)' never matches
# inside '(ab)(c)') and left-to-right greedy with correct
# consecutive-merge behavior ('(a)(a)(a)(a)' -> '(aa)(aa)', not
# '(aa)(a)(a)': replace scans from after each replacement, and no
# delimiter byte is shared between adjacent matches).


def _bpe_train_parts(rounds: int = _BPE_ROUNDS) -> str:
    """The merge-training CTE chain alone (shared by the trainer
    oracle and the apply oracle, which consumes w{rounds})."""
    parts = [
        r"""w0 AS MATERIALIZED (
      SELECT word, count(*) AS n,
        regexp_replace(word, '(.)', '(\1)', 'g') AS seg
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE regexp_matches(word, '^[a-z]{2,}$')
      GROUP BY word
    )"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""p{r} AS MATERIALIZED (
      SELECT pair, sum(n) AS freq FROM (
        SELECT n, unnest(list_transform(generate_series(1, len(syms) - 1),
          i -> syms[i] || '|' || syms[i + 1])) AS pair
        FROM (SELECT n, string_split(trim(seg, '()'), ')(') AS syms
              FROM w{r - 1} WHERE len(trim(seg, '()')) > 0)
        WHERE len(syms) >= 2
      ) GROUP BY pair
    )"""
        )
        parts.append(
            f"""b{r} AS MATERIALIZED (
      SELECT {r} AS merge_rank, string_split(pair, '|')[1] AS left_sym,
        string_split(pair, '|')[2] AS right_sym,
        CAST(freq AS BIGINT) AS freq
      FROM p{r} ORDER BY freq DESC, pair ASC LIMIT 1
    )"""
        )
        parts.append(
            f"""w{r} AS MATERIALIZED (
      SELECT word, n, replace(seg,
        '(' || (SELECT left_sym FROM b{r}) || ')('
            || (SELECT right_sym FROM b{r}) || ')',
        '(' || (SELECT left_sym FROM b{r})
            || (SELECT right_sym FROM b{r}) || ')') AS seg
      FROM w{r - 1}
    )"""
        )
    return ",\n    ".join(parts)


def _bpe_train_sql(rounds: int = _BPE_ROUNDS) -> str:
    """Unrolled merge-training CTEs (DuckDB twin of text_bpe_train).
    Each w{r} is MATERIALIZED: referenced by both p{r+1} and w{r+1},
    and chained re-inlining would cost O(2^rounds) expansions."""
    final = "\n    UNION ALL ".join(
        f"SELECT CAST(merge_rank AS BIGINT) AS merge_rank, left_sym, "
        f"right_sym, left_sym || right_sym AS merged, freq FROM b{r}"
        for r in range(1, rounds + 1)
    )
    return _bpe_train_parts(rounds) + "\n    " + final


@register("text_bpe_train", oracle=f"WITH {_bpe_train_sql(_BPE_ROUNDS)}")
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer merge training, the real iterative loop (the
    text_bpe_pretokenize query is its round-0 statistics): K rounds
    of (pair-frequency aggregation over the word dictionary ->
    argmax -> apply merge to every segmentation). The corpus token
    stream is touched ONCE (the word count); every round after that
    runs over the DISTINCT-word dictionary (10^6-ish rows at any
    corpus size, vs 10^14 corpus tokens), each round one map-side-
    combinable agg plus one narrow column rewrite — the only
    driver-side state is the argmax row per round, which IS the
    trainer's output (the merge table is driver state in every real
    BPE trainer). Deterministic tiebreak: max freq, then
    lexicographically least pair."""
    wc = (
        _docs(spark, sf_dir)
        .select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word").rlike("^[a-z]{2,}$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("seg", F.regexp_replace("word", "(.)", "($1)"))
        # the corpus token stream must be scanned ONCE: each round's
        # argmax is an action, and without truncation round r would
        # replay the explode+groupBy from parquet r times. Checkpoint
        # the word dictionary eagerly here and after every rewrite so
        # each round costs exactly one dictionary pass.
        .localCheckpoint(eager=True)
    )
    merges = []
    for r in range(1, _BPE_ROUNDS + 1):
        pairs = (
            wc.select(
                "n",
                F.split(F.expr("trim(BOTH '()' FROM seg)"), r"\)\(").alias(
                    "syms"
                ),
            )
            .where(F.size("syms") >= 2)
            .select(
                "n",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> concat(element_at(syms, i), '|', "
                        "element_at(syms, i + 1)))"
                    )
                ).alias("pair"),
            )
            .groupBy("pair")
            .agg(F.sum("n").alias("freq"))
        )
        best = pairs.orderBy(F.desc("freq"), F.asc("pair")).first()
        left, right = best["pair"].split("|")
        merges.append((r, left, right, left + right, int(best["freq"])))
        if r < _BPE_ROUNDS:
            # no consumer after the final merge — skip the last
            # rewrite+checkpoint (one full dictionary-rewrite job,
            # ~1 of N rounds of pure waste)
            wc = wc.withColumn(
                "seg",
                F.expr(
                    f"replace(seg, '({left})({right})', '({left}{right})')"
                ),
            ).localCheckpoint(eager=True)  # dictionary-sized; keeps round
            # r+1's argmax lineage one rewrite deep instead of r deep.
    return spark.createDataFrame(
        merges,
        "merge_rank long, left_sym string, right_sym string, "
        "merged string, freq long",
    )


# ---------------------------------------------------------------------------
# Margin-based bitext mining (CCMatrix-style)
# ---------------------------------------------------------------------------

_BITEXT_K = 4
_BITEXT_MARGIN = 1.02

_BITEXT_PAIRS_SQL = f"""
  v AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
    FROM embeddings
  ),
  pr AS (
    SELECT a.vec_id AS src_id, b.vec_id AS dst_id,
      list_dot_product(a.e, b.e) /
        (sqrt(list_dot_product(a.e, a.e)) *
         sqrt(list_dot_product(b.e, b.e))) AS cos
    FROM v a JOIN v b
      ON a.vec_id % 2 = 0 AND b.vec_id % 2 = 1
  ),
  rk AS (
    SELECT *,
      row_number() OVER (PARTITION BY src_id ORDER BY cos DESC, dst_id ASC)
        AS rk_src,
      row_number() OVER (PARTITION BY dst_id ORDER BY cos DESC, src_id ASC)
        AS rk_dst
    FROM pr
  ),
  den AS (
    SELECT *,
      avg(CASE WHEN rk_src <= {_BITEXT_K} THEN cos END)
        OVER (PARTITION BY src_id) AS d_src,
      avg(CASE WHEN rk_dst <= {_BITEXT_K} THEN cos END)
        OVER (PARTITION BY dst_id) AS d_dst
    FROM rk
  ),
  mg AS (
    SELECT src_id, dst_id, cos,
      cos / ((d_src + d_dst) / 2) AS margin
    FROM den
  )
"""


@register(
    "data_bitext_mine",
    oracle=f"""
    WITH {_BITEXT_PAIRS_SQL}
    SELECT src_id, dst_id, round(cos, 6) AS cos,
      round(margin, 6) AS margin,
      CAST(CASE WHEN margin >= {_BITEXT_MARGIN} THEN 1 ELSE 0 END
        AS INTEGER) AS accepted
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY src_id ORDER BY margin DESC, dst_id ASC) AS rn
      FROM mg
    ) WHERE rn = 1
    """,
)
def data_bitext_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining (the CCMatrix/LASER recipe): for
    each source-side embedding, the best target-side match scored by
    cosine DIVIDED by the mean of both sides' top-k neighborhoods —
    the margin criterion that suppresses hubness where raw cosine
    thresholds fail. Sides here are the deterministic vec_id parity
    split; every window is PARTITIONED by one endpoint (per-vector
    neighbor lists), never global. The registered query scores the
    full bipartite graph — correct and fine at eval scale; the 100 TB
    path feeds the same margin/rank pipeline from the sign-LSH or
    IVF candidate generators (operators.simsearch) instead of the
    cross join, which plan tests already pin as candidates-first."""
    v = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    )
    from multiomics_biocypher_kg_spark.operators.simsearch import _dot

    a = v.where(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("src_id"), F.col("e").alias("ea")
    )
    b = v.where(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("dst_id"), F.col("e").alias("eb")
    )
    cos = _dot(F.col("ea"), F.col("eb")) / (
        F.sqrt(_dot(F.col("ea"), F.col("ea")))
        * F.sqrt(_dot(F.col("eb"), F.col("eb")))
    )
    pr = a.join(b).select("src_id", "dst_id", cos.alias("cos"))
    rk_src = F.row_number().over(
        Window.partitionBy("src_id").orderBy(F.desc("cos"), F.asc("dst_id"))
    )
    rk_dst = F.row_number().over(
        Window.partitionBy("dst_id").orderBy(F.desc("cos"), F.asc("src_id"))
    )
    rk = pr.withColumn("rk_src", rk_src).withColumn("rk_dst", rk_dst)
    d_src = F.avg(
        F.when(F.col("rk_src") <= _BITEXT_K, F.col("cos"))
    ).over(Window.partitionBy("src_id"))
    d_dst = F.avg(
        F.when(F.col("rk_dst") <= _BITEXT_K, F.col("cos"))
    ).over(Window.partitionBy("dst_id"))
    mg = rk.select(
        "src_id",
        "dst_id",
        "cos",
        (F.col("cos") / ((d_src + d_dst) / 2)).alias("margin"),
    )
    rn = F.row_number().over(
        Window.partitionBy("src_id").orderBy(F.desc("margin"), F.asc("dst_id"))
    )
    return (
        mg.withColumn("rn", rn)
        .where(F.col("rn") == 1)
        .select(
            "src_id",
            "dst_id",
            F.round("cos", 6).alias("cos"),
            F.round("margin", 6).alias("margin"),
            (F.col("margin") >= _BITEXT_MARGIN)
            .cast("int")
            .alias("accepted"),
        )
    )


# ---------------------------------------------------------------------------
# Point-in-time KG snapshot (as-of over the SCD-2 version table)
# ---------------------------------------------------------------------------

# version table twin (the web_scd2_history oracle's CTE chain,
# shared shape: snapshots of the 125 family urls, versions cut on
# content change)
_VERS_SQL = """
  s AS (
    SELECT 'https://' || CASE WHEN doc_id % 125 % 10 < 3
        THEN 'hot.example.com'
        ELSE 'h' || CAST(doc_id % 125 % 50 AS VARCHAR) || '.example.org' END
      || '/doc/' || lpad(CAST(doc_id % 125 AS VARCHAR), 6, '0') AS url,
      1767225600 + doc_id AS ts_epoch, doc_id, md5(text) AS content_md5
    FROM documents
  ),
  seq AS (
    SELECT *, lag(content_md5)
      OVER (PARTITION BY url ORDER BY ts_epoch, doc_id) AS prev
    FROM s
  ),
  vers AS (
    SELECT url, ts_epoch, doc_id, content_md5,
      row_number() OVER (PARTITION BY url ORDER BY ts_epoch, doc_id)
        AS version_no
    FROM seq WHERE prev IS NULL OR prev <> content_md5
  ),
  iv AS (
    SELECT url, content_md5, version_no,
      CAST(ts_epoch AS BIGINT) AS valid_from,
      CAST(lead(ts_epoch)
        OVER (PARTITION BY url ORDER BY ts_epoch, doc_id) AS BIGINT)
        AS valid_to
    FROM vers
  ),
  tt AS (SELECT 1767225600 + max(doc_id) // 2 AS t FROM documents)
"""


@register(
    "kg_snapshot_asof",
    oracle=f"""
    WITH {_VERS_SQL}
    SELECT iv.url, iv.content_md5,
      CAST(iv.version_no AS BIGINT) AS version_no,
      iv.valid_from, CAST(tt.t AS BIGINT) AS asof_ts
    FROM iv, tt
    WHERE iv.valid_from <= tt.t
      AND (iv.valid_to IS NULL OR iv.valid_to > tt.t)
    """,
)
def kg_snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time KG snapshot: the version of every page valid at
    time T, reconstructed from the SCD-2 content history with one
    range predicate — the time-travel read a reproducible training
    run pins its corpus to (Iceberg snapshot-id semantics, expressed
    over the MERGE-maintained version table so it works on any
    warehouse). T is data-derived (midpoint of the snapshot id
    range), so the query exercises a non-trivial as-of selection at
    every scale factor. version_no is a PER-URL window (page history
    is bounded), never a global sort."""
    from multiomics_biocypher_kg_spark.registry_scale_ops import (
        web_scd2_history,
    )

    max_id = _docs(spark, sf_dir).agg(F.max("doc_id")).first()[0]
    t = 1767225600 + max_id // 2
    hist = web_scd2_history(spark, sf_dir)
    w = Window.partitionBy("url").orderBy("valid_from")
    return (
        hist.withColumn("version_no", F.row_number().over(w).cast("long"))
        .where(
            (F.col("valid_from") <= t)
            & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
        )
        .select(
            "url",
            "content_md5",
            "version_no",
            "valid_from",
            F.lit(t).cast("long").alias("asof_ts"),
        )
    )


# ---------------------------------------------------------------------------
# Extraction quality via text density
# ---------------------------------------------------------------------------

_DENSITY_LOW = 0.25


@register(
    "web_main_density",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, {URL_SQL} AS url, lang, text, {HTML_SQL} AS html
      FROM documents
    )
    SELECT doc_id, url, lang,
      CAST(octet_length(encode(html)) AS BIGINT) AS html_bytes,
      CAST(length(text) AS BIGINT) AS text_chars,
      round(CAST(length(text) AS DOUBLE) / octet_length(encode(html)), 6)
        AS density,
      CAST(length(html) - length(replace(html, '<', '')) AS BIGINT)
        AS n_tag_opens,
      CAST(CASE WHEN CAST(length(text) AS DOUBLE)
          / octet_length(encode(html)) < {_DENSITY_LOW}
        THEN 1 ELSE 0 END AS INTEGER) AS low_density
    FROM h
    """,
)
def web_main_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extraction-quality gate: per page, extracted-text chars over
    raw html bytes (text density), tag-open count, and a low-density
    flag — the boilerplate/extraction-failure signal curation
    pipelines threshold before admitting a page (Trafilatura-style
    density heuristics). The Spark side computes EVERYTHING from the
    html bytes through the real extraction path
    (functions.text.extract_text_native), while the oracle derives
    the same numbers analytically from the synthesis formula + the
    source text — so the gate doubles as a second byte-identical
    extraction check. All expressions live in the scan projection
    (whole-stage codegen, no shuffle at all)."""
    from multiomics_biocypher_kg_spark.functions.text import (
        extract_text_native,
    )
    from multiomics_biocypher_kg_spark.sources.pages import (
        pages_from_documents,
    )

    pages = pages_from_documents(spark, sf_dir)
    hs = F.col("html").cast("string")
    extracted = extract_text_native(F.col("html"))
    density = F.length(extracted).cast("double") / F.octet_length("html")
    return pages.select(
        "doc_id",
        "url",
        "lang",
        F.octet_length("html").cast("long").alias("html_bytes"),
        F.length(extracted).cast("long").alias("text_chars"),
        F.round(density, 6).alias("density"),
        (F.length(hs) - F.length(F.replace(hs, F.lit("<"), F.lit(""))))
        .cast("long")
        .alias("n_tag_opens"),
        (density < _DENSITY_LOW).cast("int").alias("low_density"),
    )


# ---------------------------------------------------------------------------
# Skip-gram pairs over the walk corpus
# ---------------------------------------------------------------------------

_SKIPGRAM_WINDOW = 2


def _skipgram_sql() -> str:
    from multiomics_biocypher_kg_spark.registry_web import (
        _HOST_GRAPH_SQL,
        _walks_sql,
    )

    return f"""
    WITH hg AS MATERIALIZED ({_HOST_GRAPH_SQL}),
    {_walks_sql(4).rsplit("SELECT", 1)[0]}
    SELECT start_host, walk FROM (
      SELECT start AS start_host, path AS walk FROM w4
    )
    """


@register(
    "kg_skipgram_pairs",
    oracle=f"""
    WITH walks AS MATERIALIZED ({_skipgram_sql()}),
    t AS (
      SELECT start_host,
        generate_subscripts(string_split(walk, '>'), 1) AS i,
        unnest(string_split(walk, '>')) AS tok
      FROM walks
    )
    SELECT a.tok AS center, b.tok AS context,
      CAST(count(*) AS BIGINT) AS n
    FROM t a JOIN t b
      ON a.start_host = b.start_host
      AND abs(a.i - b.i) <= {_SKIPGRAM_WINDOW} AND a.i <> b.i
    GROUP BY a.tok, b.tok
    """,
)
def kg_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(center, context) skip-gram pair counts (window ±2) over the
    deterministic DeepWalk corpus — the exact input stream word2vec/
    node2vec embedding trainers consume from a walk export. Pairs
    come from a positional self-join WITHIN each walk (equi-join on
    the walk id, so at corpus scale it shuffles by walk — bounded
    fan-out: a length-L walk emits <= 2wL pairs), then one
    map-side-combinable count. Reuses web_random_walks' derandomized
    walk generator, so the whole chain graph -> walks -> training
    pairs is value-gated cross-engine."""
    from multiomics_biocypher_kg_spark.operators.linkgraph import (
        deterministic_walks,
        host_graph,
        href_edges,
    )
    from multiomics_biocypher_kg_spark.sources.pages import (
        pages_from_documents,
    )

    pages = pages_from_documents(spark, sf_dir)
    hg = host_graph(href_edges(pages)).where(
        F.col("src_host") != F.col("dst_host")
    )
    edges = hg.select(
        F.least("src_host", "dst_host").alias("a"),
        F.greatest("src_host", "dst_host").alias("b"),
    ).distinct()
    walks = deterministic_walks(edges, n_steps=4)
    toks = walks.select(
        "start_host",
        F.posexplode(F.split("walk", ">")).alias("i", "tok"),
    )
    a = toks.select("start_host", F.col("i").alias("ia"), F.col("tok").alias("center"))
    b = toks.select("start_host", F.col("i").alias("ib"), F.col("tok").alias("context"))
    return (
        a.join(b, "start_host")
        .where(
            (F.abs(F.col("ia") - F.col("ib")) <= _SKIPGRAM_WINDOW)
            & (F.col("ia") != F.col("ib"))
        )
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# AMIE-style rule mining over the heterogeneous edge union
# ---------------------------------------------------------------------------

_RULE_MIN_SUP = 5


def _rule_mining_sql() -> str:
    from multiomics_biocypher_kg_spark.hetero import hetero_edges_ctes

    return f"""
    WITH {hetero_edges_ctes()},
    e AS MATERIALIZED (SELECT DISTINCT subj, pred, obj FROM edges),
    body AS MATERIALIZED (
      SELECT DISTINCT e1.pred AS p1, e2.pred AS p2,
        e1.subj AS x, e2.obj AS z
      FROM e e1 JOIN e e2 ON e1.obj = e2.subj
    ),
    bstats AS (SELECT p1, p2, count(*) AS body_size FROM body GROUP BY p1, p2),
    hstats AS (SELECT pred AS p3, count(*) AS head_size FROM e GROUP BY pred),
    sup AS (
      SELECT b.p1, b.p2, h.pred AS p3, count(*) AS support
      FROM body b JOIN e h ON b.x = h.subj AND b.z = h.obj
      GROUP BY b.p1, b.p2, h.pred
    )
    SELECT s.p1, s.p2, s.p3, CAST(s.support AS BIGINT) AS support,
      CAST(bs.body_size AS BIGINT) AS body_size,
      CAST(hs.head_size AS BIGINT) AS head_size,
      round(CAST(s.support AS DOUBLE) / bs.body_size, 6) AS confidence,
      round(CAST(s.support AS DOUBLE) / hs.head_size, 6) AS head_coverage
    FROM sup s
    JOIN bstats bs ON s.p1 = bs.p1 AND s.p2 = bs.p2
    JOIN hstats hs ON s.p3 = hs.p3
    WHERE s.support >= {_RULE_MIN_SUP}
    """


@register("kg_rule_mining", oracle=_rule_mining_sql())
def kg_rule_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMIE-style horn-rule mining: for every predicate triple
    (p1, p2, p3), score the rule p1(x,y) AND p2(y,z) => p3(x,z) with
    support (distinct (x,z) pairs satisfying body AND head), standard
    confidence (support / body size) and head coverage (support /
    head size) — the KG-completion quality signals rule-based link
    predictors (AMIE, AnyBURL) rank by. One composition equi-join on
    the shared node (the kg_path_2hop shape — co-partitioned under
    subj/obj bucketing, AQE-skew discipline for hub nodes), one
    (x,z)-keyed head join, and three map-side-combinable aggs; no
    rule enumeration loop, every (p1,p2,p3) combination scored in
    the same plan. min-support prunes the long tail exactly like
    AMIE's support threshold."""
    from multiomics_biocypher_kg_spark.hetero import hetero_edges_df

    e = hetero_edges_df(spark, sf_dir).distinct()
    e1 = e.select(
        F.col("pred").alias("p1"), F.col("subj").alias("x"),
        F.col("obj").alias("y"),
    )
    e2 = e.select(
        F.col("pred").alias("p2"), F.col("subj").alias("y2"),
        F.col("obj").alias("z"),
    )
    body = (
        e1.join(e2, F.col("y") == F.col("y2"))
        .select("p1", "p2", "x", "z")
        .distinct()
    )
    bstats = body.groupBy("p1", "p2").agg(
        F.count(F.lit(1)).alias("body_size")
    )
    hstats = e.groupBy(F.col("pred").alias("p3")).agg(
        F.count(F.lit(1)).alias("head_size")
    )
    head = e.select(
        F.col("pred").alias("p3"), F.col("subj").alias("x"),
        F.col("obj").alias("z"),
    )
    sup = (
        body.join(head, ["x", "z"])
        .groupBy("p1", "p2", "p3")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= _RULE_MIN_SUP)
    )
    return (
        sup.join(bstats, ["p1", "p2"])
        .join(F.broadcast(hstats), "p3")
        .select(
            "p1", "p2", "p3",
            F.col("support").cast("long").alias("support"),
            F.col("body_size").cast("long").alias("body_size"),
            F.col("head_size").cast("long").alias("head_size"),
            F.round(
                F.col("support").cast("double") / F.col("body_size"), 6
            ).alias("confidence"),
            F.round(
                F.col("support").cast("double") / F.col("head_size"), 6
            ).alias("head_coverage"),
        )
    )


# ---------------------------------------------------------------------------
# Truth discovery (source-reliability fixed point over conflicting claims)
# ---------------------------------------------------------------------------

_TRUTH_SQL = """
  links AS MATERIALIZED ({links}),
  claims AS MATERIALIZED (
    SELECT DISTINCT d.source, l.entity_id, l.lang AS value
    FROM links l JOIN documents d ON l.doc_id = d.doc_id
    WHERE l.entity_id IS NOT NULL
  ),
  s1 AS (
    SELECT entity_id, value, CAST(count(*) AS DOUBLE) AS score1
    FROM claims GROUP BY entity_id, value
  ),
  n1 AS (
    SELECT entity_id, value,
      score1 / sum(score1) OVER (PARTITION BY entity_id) AS norm1
    FROM s1
  ),
  trust AS (
    SELECT c.source, avg(n.norm1) AS trust1
    FROM claims c JOIN n1 n
      ON c.entity_id = n.entity_id AND c.value = n.value
    GROUP BY c.source
  ),
  s2 AS (
    SELECT c.entity_id, c.value, round(sum(t.trust1), 6) AS score,
      CAST(count(*) AS BIGINT) AS n_sources
    FROM claims c JOIN trust t ON c.source = t.source
    GROUP BY c.entity_id, c.value
  ),
  ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY entity_id ORDER BY score DESC, value ASC) AS rn,
      CAST(count(*) OVER (PARTITION BY entity_id) AS BIGINT) AS n_values
    FROM s2
  )
  SELECT entity_id, value AS best_value, score, n_sources, n_values
  FROM ranked WHERE rn = 1
"""


def _truth_oracle() -> str:
    from multiomics_biocypher_kg_spark.oracle_fragments import LINKS_SQL

    return "WITH " + _TRUTH_SQL.format(links=LINKS_SQL)


@register("kg_truth_discovery", oracle=_truth_oracle())
def kg_truth_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truth discovery over conflicting source claims (TruthFinder/
    Sums-style, one unrolled fixed-point iteration): sources claim a
    property value for each entity (here: the language an entity is
    written about in, claimed by each document source); claim scores
    are entity-normalized vote sums, source trust is the mean score
    of the claims it makes, and final claim scores are trust-weighted
    votes — the canonicalization-stage arbiter when multiple feeds
    disagree about an entity property. Every agg is keyed by source
    or (entity, value) — dictionary-sized state, map-side combined;
    the normalizing window partitions by ENTITY (bounded by per-
    entity value fanout). Winners rank on the ROUNDED score so the
    cross-engine float ulp cannot flip a tie; ties break to the
    lexicographically least value."""
    from multiomics_biocypher_kg_spark.registry import _pipeline

    links = _pipeline(spark, sf_dir)["links"]
    docs = _docs(spark, sf_dir).select("doc_id", "source")
    claims = (
        links.where(F.col("entity_id").isNotNull())
        .join(F.broadcast(docs), "doc_id")
        .select("source", "entity_id", F.col("lang").alias("value"))
        .distinct()
        # three consumers (vote agg, trust join, trust-weighted
        # re-vote): truncate once so the link->doc derivation runs a
        # single time instead of being re-inlined per consumer.
        .localCheckpoint(eager=False)
    )
    s1 = claims.groupBy("entity_id", "value").agg(
        F.count(F.lit(1)).cast("double").alias("score1")
    )
    n1 = s1.select(
        "entity_id",
        "value",
        (
            F.col("score1")
            / F.sum("score1").over(Window.partitionBy("entity_id"))
        ).alias("norm1"),
    )
    trust = (
        claims.join(n1, ["entity_id", "value"])
        .groupBy("source")
        .agg(F.avg("norm1").alias("trust1"))
    )
    s2 = (
        claims.join(F.broadcast(trust), "source")
        .groupBy("entity_id", "value")
        .agg(
            F.round(F.sum("trust1"), 6).alias("score"),
            F.count(F.lit(1)).cast("long").alias("n_sources"),
        )
    )
    w = Window.partitionBy("entity_id")
    rn = F.row_number().over(
        w.orderBy(F.desc("score"), F.asc("value"))
    )
    return (
        s2.withColumn("rn", rn)
        .withColumn("n_values", F.count(F.lit(1)).over(w).cast("long"))
        .where(F.col("rn") == 1)
        .select(
            "entity_id",
            F.col("value").alias("best_value"),
            "score",
            "n_sources",
            "n_values",
        )
    )


# ---------------------------------------------------------------------------
# Dedup-quality evaluation against the synthetic provenance gold
# ---------------------------------------------------------------------------


def _dedup_eval_oracle() -> str:
    from multiomics_biocypher_kg_spark.oracle_fragments import (
        MINHASH_PAIRS_CTES,
    )

    return f"""
    WITH {MINHASH_PAIRS_CTES},
    gold AS (
      SELECT doc_id AS id_a, doc_id + 2000000 AS id_b, 'exact' AS kind
      FROM documents WHERE doc_id % 5 = 0
      UNION ALL
      SELECT doc_id, doc_id + 1000000, 'near'
      FROM documents WHERE doc_id % 4 = 0
      UNION ALL
      SELECT doc_id + 1000000, doc_id + 2000000, 'cross'
      FROM documents WHERE doc_id % 20 = 0
    ),
    hits AS (
      SELECT g.kind, count(*) AS tp
      FROM gold g JOIN pairs p ON g.id_a = p.id_a AND g.id_b = p.id_b
      GROUP BY g.kind
    ),
    perkind AS (
      SELECT g.kind, CAST(count(*) AS BIGINT) AS n_gold,
        CAST(NULL AS BIGINT) AS n_pred,
        CAST(coalesce(any_value(h.tp), 0) AS BIGINT) AS tp,
        CAST(NULL AS DOUBLE) AS "precision",
        round(CAST(coalesce(any_value(h.tp), 0) AS DOUBLE) / count(*), 6)
          AS recall,
        CAST(NULL AS DOUBLE) AS f1
      FROM gold g LEFT JOIN hits h ON g.kind = h.kind
      GROUP BY g.kind
    ),
    tot AS (
      SELECT CAST((SELECT count(*) FROM gold) AS BIGINT) AS n_gold,
        CAST((SELECT count(*) FROM pairs) AS BIGINT) AS n_pred,
        CAST((SELECT count(*) FROM gold g JOIN pairs p
              ON g.id_a = p.id_a AND g.id_b = p.id_b) AS BIGINT) AS tp
    ),
    overall AS (
      SELECT 'all' AS kind, n_gold, n_pred, tp,
        round(CAST(tp AS DOUBLE) / n_pred, 6) AS "precision",
        round(CAST(tp AS DOUBLE) / n_gold, 6) AS recall,
        round(2.0 * tp / (n_pred + n_gold), 6) AS f1
      FROM tot
    )
    SELECT * FROM perkind UNION ALL SELECT * FROM overall
    """


@register("dedup_eval_pr", oracle=_dedup_eval_oracle())
def dedup_eval_pr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-pipeline quality evaluation against labeled truth: the
    synthetic dedup corpus carries PROVENANCE gold (exact twins at
    +2e6 for every 5th doc, token-dropped near-twins at +1e6 for
    every 4th, and the near/exact cross pairs where both exist), so
    the MinHash-LSH detector's precision/recall/F1 are measurable
    exactly — per pair kind (recall: exact must be 1.0, near shows
    the threshold/banding loss) and overall. This is the calibration
    harness a production dedup threshold is chosen with; at corpus
    scale the gold set is a labeled sample and the same two hash
    joins score it (gold join pred on the pair key — no scan of
    anything but the detector's own output). F1 uses the
    2TP/(P+G) identity so no intermediate ratio feeds another
    ratio."""
    from multiomics_biocypher_kg_spark.operators import dedup as dd
    from multiomics_biocypher_kg_spark.registry_dedup_text import (
        _dedup_corpus,
    )

    pred = dd.minhash_neardup_pairs(
        _dedup_corpus(spark, sf_dir), 0.5
    ).select("id_a", "id_b").localCheckpoint()
    ids = _docs(spark, sf_dir).select("doc_id")
    gold = (
        ids.where(F.col("doc_id") % 5 == 0)
        .select(
            F.col("doc_id").alias("id_a"),
            (F.col("doc_id") + 2000000).alias("id_b"),
            F.lit("exact").alias("kind"),
        )
        .unionByName(
            ids.where(F.col("doc_id") % 4 == 0).select(
                F.col("doc_id").alias("id_a"),
                (F.col("doc_id") + 1000000).alias("id_b"),
                F.lit("near").alias("kind"),
            )
        )
        .unionByName(
            ids.where(F.col("doc_id") % 20 == 0).select(
                (F.col("doc_id") + 1000000).alias("id_a"),
                (F.col("doc_id") + 2000000).alias("id_b"),
                F.lit("cross").alias("kind"),
            )
        )
    )
    marked = gold.join(
        pred.withColumn("hit", F.lit(1)), ["id_a", "id_b"], "left"
    )
    perkind = marked.groupBy("kind").agg(
        F.count(F.lit(1)).cast("long").alias("n_gold"),
        F.lit(None).cast("long").alias("n_pred"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("tp"),
        F.lit(None).cast("double").alias("precision"),
        F.round(
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("recall"),
        F.lit(None).cast("double").alias("f1"),
    )
    n_pred = pred.count()
    overall = marked.agg(
        F.lit("all").alias("kind"),
        F.count(F.lit(1)).cast("long").alias("n_gold"),
        F.lit(n_pred).cast("long").alias("n_pred"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("tp"),
        F.round(
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            / F.lit(float(n_pred)),
            6,
        ).alias("precision"),
        F.round(
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("recall"),
        F.round(
            2.0
            * F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            / (F.lit(float(n_pred)) + F.count(F.lit(1))),
            6,
        ).alias("f1"),
    )
    return perkind.unionByName(overall)


# ---------------------------------------------------------------------------
# Classifier-evaluation harnesses: histogram ROC-AUC, confusion /
# macro-F1, and multi-rater Fleiss' kappa
# ---------------------------------------------------------------------------

# Shared exact-integer score plumbing: S = per-doc summed milli-logit
# (functions.textstats.quality_logit_milli — int64 in both engines),
# n = whitespace token count. Every label below is a comparison of
# S against hash-noise times n, so gold/pred/rating synthesis stays
# in exact int64 end to end — no float enters until the final
# metric divisions (then round(6)).

from multiomics_biocypher_kg_spark.functions.hashing import (  # noqa: E402
    md5_long,
    md5_long_sql,
)
from multiomics_biocypher_kg_spark.functions import textstats as _ts  # noqa: E402

_S_SQL = (
    "list_sum(list_transform(string_split(text, ' '), "
    f"t -> {md5_long_sql('t')} % 2001 - 1000))"
)
_N_SQL = "len(string_split(text, ' '))"
_AUC_BINS = 1000  # mean milli-logit clamps into [-1000, 1000]
_BAND_MILLI = 50  # |mean logit| >= 50 milli => high / low band


def _noise_sql(salt: str, width: int) -> str:
    """Deterministic per-doc jitter in [-width, width] (int)."""
    m = 2 * width + 1
    h = md5_long_sql(f"'{salt}#' || CAST(doc_id AS VARCHAR)")
    return f"({h} % {m} - {width})"


def _noise_col(salt: str, width: int):
    m = 2 * width + 1
    h = md5_long(F.concat(F.lit(f"{salt}#"), F.col("doc_id").cast("string")))
    return h % m - width


def _band_sql(x: str, n: str) -> str:
    """3-way band of a summed milli-logit x vs per-token thresholds
    (+-_BAND_MILLI * n) — all-integer comparisons."""
    return (
        f"CASE WHEN {x} >= {_BAND_MILLI} * {n} THEN 'high' "
        f"WHEN {x} < -{_BAND_MILLI} * {n} THEN 'low' ELSE 'mid' END"
    )


def _band_col(x, n):
    return (
        F.when(x >= _BAND_MILLI * n, "high")
        .when(x < -_BAND_MILLI * n, "low")
        .otherwise("mid")
    )


_AUC_NOISE = 100  # gold = sign(S/n + U[-100,100]) — labels correlate
#                   with the score but flip near the boundary, so the
#                   ROC curve is informative (AUC strictly in (0.5, 1))


@register(
    "text_quality_auc",
    oracle=f"""
    WITH s AS (
      SELECT
        greatest(-{_AUC_BINS}, least({_AUC_BINS},
          CAST(floor(CAST({_S_SQL} AS DOUBLE) / {_N_SQL}) AS INTEGER)))
          AS bin,
        CASE WHEN {_S_SQL} + {_noise_sql('auc', _AUC_NOISE)} * {_N_SQL} > 0
          THEN 1 ELSE 0 END AS gold
      FROM documents
    ),
    h AS (
      SELECT bin, sum(gold) AS p, sum(1 - gold) AS neg
      FROM s GROUP BY bin
    ),
    w AS (
      SELECT p, neg,
        coalesce(sum(neg) OVER (ORDER BY bin
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
      FROM h
    )
    SELECT
      CAST(sum(p) AS BIGINT) AS n_pos,
      CAST(sum(neg) AS BIGINT) AS n_neg,
      CAST(count(*) AS BIGINT) AS n_bins,
      round(CAST(sum(p * (2 * below + neg)) AS DOUBLE)
        / (2.0 * sum(p) * sum(neg)), 6) AS auc,
      round(CAST(sum(p * (2 * below + neg)) AS DOUBLE)
        / (1.0 * sum(p) * sum(neg)) - 1.0, 6) AS gini
    FROM w
    """,
)
def text_quality_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram ROC-AUC of the hashed-logit quality classifier
    (functions.textstats.quality_logit_milli) against deterministic
    gold labels — the eval harness every learned curation filter is
    tuned with. Gold is the sign of the score plus +-{w} milli of
    per-doc hash jitter (computed as the all-integer test
    S + noise*n > 0), so labels agree with the score away from the
    boundary and flip near it — a real, non-degenerate ROC curve.

    The naive AUC plan — rank every document by score — is a global
    corpus sort. This is the HISTOGRAM plan (the data_budget_select
    discipline): scores clamp into {b2}+1 integer mean-milli-logit
    bins in the scan projection, ONE map-side-combined agg builds
    the per-bin (pos, neg) histogram, and the Mann-Whitney pair
    count runs as a cumulative window over the HISTOGRAM (<= {b2}+1
    rows at any corpus size; tied bins contribute half-pairs via
    the 2*below+neg integer numerator, exact until the single final
    division). Bin width = 1 milli-logit is the published-pipeline
    resolution tradeoff, stated rather than hidden."""
    docs = _docs(spark, sf_dir)
    n = _ts.token_count(F.col("text"))
    s_sum = _ts.quality_logit_milli(F.col("text"))
    s = docs.select(
        F.greatest(
            F.lit(-_AUC_BINS),
            F.least(
                F.lit(_AUC_BINS),
                F.floor(s_sum.cast("double") / n).cast("int"),
            ),
        ).alias("bin"),
        F.when(
            s_sum + _noise_col("auc", _AUC_NOISE) * n > 0, 1
        ).otherwise(0).alias("gold"),
    )
    h = s.groupBy("bin").agg(
        F.sum("gold").alias("p"),
        F.sum(F.lit(1) - F.col("gold")).alias("neg"),
    )
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, -1
    )
    hh = h.select(
        "p", "neg",
        F.coalesce(F.sum("neg").over(w), F.lit(0)).alias("below"),
    )
    num = F.sum(F.col("p") * (2 * F.col("below") + F.col("neg")))
    return hh.agg(
        F.sum("p").cast("long").alias("n_pos"),
        F.sum("neg").cast("long").alias("n_neg"),
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.round(
            num.cast("double") / (2.0 * F.sum("p") * F.sum("neg")), 6
        ).alias("auc"),
        F.round(
            num.cast("double") / (1.0 * F.sum("p") * F.sum("neg")) - 1.0, 6
        ).alias("gini"),
    )


text_quality_auc.__doc__ = text_quality_auc.__doc__.format(
    w=_AUC_NOISE, b2=2 * _AUC_BINS
)


@register(
    "text_quality_confusion",
    oracle=f"""
    WITH s AS (
      SELECT
        {_band_sql(f"({_S_SQL} + {_noise_sql('gold', _AUC_NOISE)} * {_N_SQL})", _N_SQL)}
          AS gold,
        {_band_sql(_S_SQL, _N_SQL)} AS pred
      FROM documents
    ),
    cells AS (SELECT gold, pred, count(*) AS n FROM s GROUP BY 1, 2),
    cls AS (SELECT unnest(['low', 'mid', 'high']) AS class),
    per AS (
      SELECT c.class,
        coalesce((SELECT sum(n) FROM cells WHERE gold = c.class), 0)
          AS n_gold,
        coalesce((SELECT sum(n) FROM cells WHERE pred = c.class), 0)
          AS n_pred,
        coalesce((SELECT sum(n) FROM cells
                  WHERE gold = c.class AND pred = c.class), 0) AS tp
      FROM cls c
    ),
    scored AS (
      SELECT class, n_gold, n_pred, tp,
        CASE WHEN n_pred > 0 THEN CAST(tp AS DOUBLE) / n_pred
             ELSE 0.0 END AS prec_raw,
        CASE WHEN n_gold > 0 THEN CAST(tp AS DOUBLE) / n_gold
             ELSE 0.0 END AS rec_raw,
        CASE WHEN n_pred + n_gold > 0
             THEN 2.0 * tp / (n_pred + n_gold) ELSE 0.0 END AS f1_raw
      FROM per
    )
    SELECT class, CAST(n_gold AS BIGINT) AS n_gold,
      CAST(n_pred AS BIGINT) AS n_pred, CAST(tp AS BIGINT) AS tp,
      round(prec_raw, 6) AS "precision", round(rec_raw, 6) AS recall,
      round(f1_raw, 6) AS f1
    FROM scored
    UNION ALL
    SELECT 'macro', CAST(sum(n_gold) AS BIGINT),
      CAST(sum(n_pred) AS BIGINT), CAST(sum(tp) AS BIGINT),
      round(sum(prec_raw) / 3.0, 6), round(sum(rec_raw) / 3.0, 6),
      round(sum(f1_raw) / 3.0, 6)
    FROM scored
    """,
)
def text_quality_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion-matrix / macro-F1 report for the 3-band quality
    classifier: pred is the hashed-logit band (high / mid / low at
    +-{t} mean milli-logit), gold is the same band after +-{w} milli
    of per-doc hash jitter (all-integer synthesis, the
    text_quality_auc discipline) — the per-class complement of the
    threshold-free AUC view. One corpus scan computes both labels in
    the projection; everything downstream is the 9-cell confusion
    matrix: per-class TP / predicted / gold masses come from three
    dictionary-sized aggs over the cells (never a corpus re-scan),
    and macro-F1 averages the per-class F1s — the class-imbalance-
    robust metric curation-filter papers report. F1 uses the exact
    2TP/(P+G) identity; classes are enumerated literally so the
    report shape is fixed even when a band is empty."""
    docs = _docs(spark, sf_dir)
    n = _ts.token_count(F.col("text"))
    s_sum = _ts.quality_logit_milli(F.col("text"))
    s = docs.select(
        _band_col(
            s_sum + _noise_col("gold", _AUC_NOISE) * n, n
        ).alias("gold"),
        _band_col(s_sum, n).alias("pred"),
    )
    cells = s.groupBy("gold", "pred").agg(F.count(F.lit(1)).alias("n"))
    cells = cells.localCheckpoint(eager=False)  # 9 rows, 3 consumers
    cls = spark.createDataFrame(
        [("low",), ("mid",), ("high",)], "class string"
    )
    g = cells.groupBy(F.col("gold").alias("class")).agg(
        F.sum("n").alias("n_gold")
    )
    p = cells.groupBy(F.col("pred").alias("class")).agg(
        F.sum("n").alias("n_pred")
    )
    t = (
        cells.where(F.col("gold") == F.col("pred"))
        .groupBy(F.col("gold").alias("class"))
        .agg(F.sum("n").alias("tp"))
    )
    per = (
        cls.join(g, "class", "left")
        .join(p, "class", "left")
        .join(t, "class", "left")
        .select(
            "class",
            F.coalesce("n_gold", F.lit(0)).alias("n_gold"),
            F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
            F.coalesce("tp", F.lit(0)).alias("tp"),
        )
    )
    prec = F.when(
        F.col("n_pred") > 0, F.col("tp").cast("double") / F.col("n_pred")
    ).otherwise(0.0)
    rec = F.when(
        F.col("n_gold") > 0, F.col("tp").cast("double") / F.col("n_gold")
    ).otherwise(0.0)
    f1 = F.when(
        F.col("n_pred") + F.col("n_gold") > 0,
        2.0 * F.col("tp") / (F.col("n_pred") + F.col("n_gold")),
    ).otherwise(0.0)
    scored = per.select(
        "class", "n_gold", "n_pred", "tp",
        prec.alias("prec_raw"), rec.alias("rec_raw"), f1.alias("f1_raw")
    ).localCheckpoint(eager=False)  # 3 rows, 2 consumers
    rows = scored.select(
        "class",
        F.col("n_gold").cast("long").alias("n_gold"),
        F.col("n_pred").cast("long").alias("n_pred"),
        F.col("tp").cast("long").alias("tp"),
        F.round("prec_raw", 6).alias("precision"),
        F.round("rec_raw", 6).alias("recall"),
        F.round("f1_raw", 6).alias("f1"),
    )
    macro = scored.agg(
        F.lit("macro").alias("class"),
        F.sum("n_gold").cast("long").alias("n_gold"),
        F.sum("n_pred").cast("long").alias("n_pred"),
        F.sum("tp").cast("long").alias("tp"),
        F.round(F.sum("prec_raw") / 3.0, 6).alias("precision"),
        F.round(F.sum("rec_raw") / 3.0, 6).alias("recall"),
        F.round(F.sum("f1_raw") / 3.0, 6).alias("f1"),
    )
    return rows.unionByName(macro)


text_quality_confusion.__doc__ = text_quality_confusion.__doc__.format(
    t=_BAND_MILLI, w=_AUC_NOISE
)


_KAPPA_RATERS = 3
_KAPPA_JITTER = 50  # each rater sees the score +-50 milli before banding


def _kappa_rating_sql(r: int) -> str:
    return _band_sql(
        f"({_S_SQL} + {_noise_sql(f'rater{r}', _KAPPA_JITTER)} * {_N_SQL})",
        _N_SQL,
    )


@register(
    "data_fleiss_kappa",
    oracle=f"""
    WITH long AS (
      SELECT doc_id, unnest([{", ".join(_kappa_rating_sql(r) for r in range(_KAPPA_RATERS))}]) AS cat
      FROM documents
    ),
    nij AS (SELECT doc_id, cat, count(*) AS n FROM long GROUP BY 1, 2),
    percat AS (
      SELECT cat, sum(n) AS c, sum(n * n) AS q FROM nij GROUP BY cat
    ),
    tot AS (
      SELECT CAST(sum(c) // {_KAPPA_RATERS} AS BIGINT) AS n_items,
        CAST(sum(q) AS BIGINT) AS sum_q,
        CAST(sum(c * c) AS BIGINT) AS sum_c2,
        CAST(count(*) AS BIGINT) AS n_categories
      FROM percat
    ),
    raw AS (
      SELECT n_items, n_categories,
        CAST(sum_q - {_KAPPA_RATERS} * n_items AS DOUBLE)
          / ({_KAPPA_RATERS * (_KAPPA_RATERS - 1)}.0 * n_items) AS p_bar,
        CAST(sum_c2 AS DOUBLE)
          / ({_KAPPA_RATERS * _KAPPA_RATERS}.0 * n_items * n_items) AS p_e
      FROM tot
    )
    SELECT n_items, CAST({_KAPPA_RATERS} AS BIGINT) AS n_raters,
      n_categories,
      round(p_bar, 6) AS p_bar, round(p_e, 6) AS p_e,
      round(CASE WHEN p_e >= 1.0 THEN 1.0
            ELSE (p_bar - p_e) / (1.0 - p_e) END, 6) AS kappa
    FROM raw
    """,
)
def data_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa over {r} simulated raters labeling every
    document into the 3-band quality scheme — the inter-annotator
    agreement gate a labeling pipeline runs before trusting human
    (or LLM-judge) quality labels. Each rater's label is the shared
    band of the doc score plus that rater's +-{j} milli hash jitter
    (all-integer synthesis), so agreement is substantial but
    imperfect — kappa lands strictly inside (0, 1).

    Scale shape: ONE corpus scan emits the {r} ratings in the
    projection (explode fanout = {r}), one map-side-combined
    (doc, category) count agg is the only corpus-sized shuffle, and
    the whole kappa arithmetic — P_i sums, category marginals, P_e —
    collapses into a per-CATEGORY aggregate (sum n, sum n^2, sum
    c^2), a table with at most 3 rows at any corpus size. Exact
    int64 until the two final divisions."""
    docs = _docs(spark, sf_dir)
    n = _ts.token_count(F.col("text"))
    s_sum = _ts.quality_logit_milli(F.col("text"))
    ratings = F.array(
        *[
            _band_col(
                s_sum + _noise_col(f"rater{r}", _KAPPA_JITTER) * n, n
            )
            for r in range(_KAPPA_RATERS)
        ]
    )
    long = docs.select("doc_id", F.explode(ratings).alias("cat"))
    nij = long.groupBy("doc_id", "cat").agg(F.count(F.lit(1)).alias("n"))
    percat = nij.groupBy("cat").agg(
        F.sum("n").alias("c"), F.sum(F.col("n") * F.col("n")).alias("q")
    )
    R = _KAPPA_RATERS
    tot = percat.agg(
        (F.sum("c") / R).cast("long").alias("n_items"),
        F.sum("q").cast("long").alias("sum_q"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sum_c2"),
        F.count(F.lit(1)).cast("long").alias("n_categories"),
    )
    p_bar = (F.col("sum_q") - R * F.col("n_items")).cast("double") / (
        F.lit(float(R * (R - 1))) * F.col("n_items")
    )
    p_e = F.col("sum_c2").cast("double") / (
        F.lit(float(R * R)) * F.col("n_items") * F.col("n_items")
    )
    raw = tot.select(
        "n_items", "n_categories",
        p_bar.alias("p_bar"), p_e.alias("p_e"),
    )
    return raw.select(
        "n_items",
        F.lit(R).cast("long").alias("n_raters"),
        "n_categories",
        F.round("p_bar", 6).alias("p_bar"),
        F.round("p_e", 6).alias("p_e"),
        F.round(
            F.when(F.col("p_e") >= 1.0, F.lit(1.0)).otherwise(
                (F.col("p_bar") - F.col("p_e")) / (1.0 - F.col("p_e"))
            ),
            6,
        ).alias("kappa"),
    )


data_fleiss_kappa.__doc__ = data_fleiss_kappa.__doc__.format(
    r=_KAPPA_RATERS, j=_KAPPA_JITTER
)


# ---------------------------------------------------------------------------
# Trained multinomial Naive Bayes language ID (holdout-evaluated)
# ---------------------------------------------------------------------------


# Deterministic language-signal synthesis (the harness half, the
# kg_hearst_patterns claims-table discipline): the synthetic corpus's
# lang label is INDEPENDENT of its token stream (all docs draw the
# same vocabulary), so a real trained classifier could only learn the
# prior. Each page therefore gets 1 + doc_id%3 copies of its own
# language marker token ('m'||lang), and every 4th doc also gets ONE
# confuser marker of a hash-picked language — the learner must beat
# that noise. The classifier never sees the formula.
_NB_LANG_LIST = ["en", "de", "fr", "es", "zh"]
_NB_LANGS = "['en', 'de', 'fr', 'es', 'zh']"
_NB_PAGE_SQL = f"""
  SELECT doc_id, lang,
    text || repeat(' qqm' || lang, CAST(1 + doc_id % 3 AS INT))
         || CASE WHEN doc_id % 4 = 0
            THEN ' qqm' || {_NB_LANGS}[CAST(doc_id % 5 AS INT) + 1]
            ELSE '' END AS text
  FROM documents
"""


def _nb_augmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _NB_PAGE_SQL: deterministic marker injection,
    pure Column expressions inside the scan projection (no shuffle,
    no UDF). The 'qqm' prefix guarantees markers never collide with
    a real corpus token at any SF."""
    lang_arr = F.array(*[F.lit(x) for x in _NB_LANG_LIST])
    return _docs(spark, sf_dir).select(
        "doc_id",
        "lang",
        F.concat(
            F.col("text"),
            F.repeat(
                F.concat(F.lit(" qqm"), F.col("lang")),
                (F.lit(1) + F.col("doc_id") % 3).cast("int"),
            ),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.concat(
                    F.lit(" qqm"),
                    F.element_at(
                        lang_arr, (F.col("doc_id") % 5).cast("int") + 1
                    ),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )


_NB_SCORE_CTES = f"""aug AS ({_NB_PAGE_SQL}),
    train AS (
      SELECT lang, unnest(string_split(text, ' ')) AS token
      FROM aug WHERE doc_id % 5 <> 0
    ),
    counts AS (SELECT lang, token, count(*) AS n FROM train GROUP BY 1, 2),
    totals AS (SELECT lang, sum(n) AS t FROM counts GROUP BY lang),
    vocab AS (SELECT count(DISTINCT token) AS v FROM train),
    priors AS (
      SELECT lang, count(*) AS d FROM documents
      WHERE doc_id % 5 <> 0 GROUP BY lang
    ),
    dtot AS (SELECT sum(d) AS dd FROM priors),
    test AS (
      SELECT doc_id, lang AS gold, unnest(string_split(text, ' ')) AS token
      FROM aug WHERE doc_id % 5 = 0
    ),
    tc AS (
      SELECT doc_id, gold, token, count(*) AS c FROM test GROUP BY 1, 2, 3
    ),
    doclen AS (SELECT doc_id, sum(c) AS nl FROM tc GROUP BY doc_id),
    hits AS (
      SELECT t.doc_id, cnt.lang, sum(t.c * ln(cnt.n + 1)) AS hit
      FROM tc t JOIN counts cnt ON t.token = cnt.token
      GROUP BY 1, 2
    ),
    grid AS (
      SELECT d.doc_id, d.gold, p.lang, p.d
      FROM (SELECT DISTINCT doc_id, gold FROM tc) d CROSS JOIN priors p
    ),
    scores AS (
      SELECT g.doc_id, g.gold, g.lang,
        coalesce(h.hit, 0.0)
        - dl.nl * ln(tt.t + (SELECT v FROM vocab))
        + ln(CAST(g.d AS DOUBLE) / (SELECT dd FROM dtot)) AS score
      FROM grid g
      LEFT JOIN hits h ON g.doc_id = h.doc_id AND g.lang = h.lang
      JOIN doclen dl ON g.doc_id = dl.doc_id
      JOIN totals tt ON g.lang = tt.lang
    )"""


def _nb_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained-NB log-likelihood scores per (held-out doc,
    candidate lang) — the shared pipeline behind text_nb_langid's
    accuracy report and data_uncertainty_sample's margin ranking
    (SQL twin: _NB_SCORE_CTES). Returns (doc_id, gold, lang,
    score)."""
    docs = _nb_augmented(spark, sf_dir)
    train = docs.where(F.col("doc_id") % 5 != 0)
    test = docs.where(F.col("doc_id") % 5 == 0)
    ttoks = train.select(
        "lang", F.explode(F.split("text", " ")).alias("token")
    )
    counts = ttoks.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("n"))
    counts = counts.localCheckpoint(eager=False)  # model table, 3 consumers
    totals = counts.groupBy("lang").agg(F.sum("n").alias("t"))
    vocab = counts.select("token").distinct().agg(
        F.count(F.lit(1)).alias("v")
    )
    priors = train.groupBy("lang").agg(F.count(F.lit(1)).alias("d"))
    priors = priors.crossJoin(
        F.broadcast(priors.agg(F.sum("d").alias("dd")))
    )
    tc = (
        test.select(
            "doc_id",
            F.col("lang").alias("gold"),
            F.explode(F.split("text", " ")).alias("token"),
        )
        .groupBy("doc_id", "gold", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    ).localCheckpoint(eager=False)  # 2 consumers: doclen + hits
    doclen = tc.groupBy("doc_id").agg(F.sum("c").alias("nl"))
    hits = (
        tc.join(counts, "token")
        .groupBy("doc_id", "lang")
        .agg(F.sum(F.col("c") * F.log(F.col("n") + 1)).alias("hit"))
    )
    grid = tc.select("doc_id", "gold").distinct().crossJoin(
        F.broadcast(priors)
    )
    lang_const = (
        totals.crossJoin(F.broadcast(vocab))
        .select("lang", (F.log(F.col("t") + F.col("v"))).alias("ln_tv"))
    )
    scores = (
        grid.join(hits, ["doc_id", "lang"], "left")
        .join(doclen, "doc_id")
        .join(F.broadcast(lang_const), "lang")
        .select(
            "doc_id", "gold", "lang",
            (
                F.coalesce("hit", F.lit(0.0))
                - F.col("nl") * F.col("ln_tv")
                + F.log(F.col("d").cast("double") / F.col("dd"))
            ).alias("score"),
        )
    )
    return scores


@register(
    "text_nb_langid",
    oracle=f"""
    WITH {_NB_SCORE_CTES},
    pred AS (
      SELECT doc_id, gold, lang AS pred FROM (
        SELECT *, row_number() OVER (
          PARTITION BY doc_id ORDER BY round(score, 6) DESC, lang) AS rn
        FROM scores) WHERE rn = 1
    ),
    per AS (
      SELECT gold AS lang, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(CASE WHEN pred = gold THEN 1 ELSE 0 END) AS BIGINT)
          AS n_correct
      FROM pred GROUP BY gold
    )
    SELECT lang, n_docs, n_correct,
      round(CAST(n_correct AS DOUBLE) / n_docs, 6) AS accuracy
    FROM per
    UNION ALL
    SELECT 'all', CAST(sum(n_docs) AS BIGINT),
      CAST(sum(n_correct) AS BIGINT),
      round(CAST(sum(n_correct) AS DOUBLE) / sum(n_docs), 6)
    FROM per
    """,
)
def text_nb_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINED multinomial Naive Bayes language ID with a
    leakage-safe holdout — the learned upgrade of the stopword
    heuristic text_langid ships (functions/textstats.py): add-1-
    smoothed per-language token likelihoods are TRAINED on the
    doc_id%5!=0 split against the corpus's real lang labels and
    evaluated on the held-out %5==0 split (the data_split_assign
    discipline — never resubstitution). The smoothing identity
    score = sum_t c_t*ln(n_tl+1) - N_doc*ln(T_l+V) + ln(D_l/D)
    makes unseen tokens contribute exactly 0 to the hit sum, so the
    scorer is a LEFT join against observed (token, lang) rows only
    — no token x lang grid ever materializes.

    Scale: the model is a dictionary-sized (token, lang, count)
    table built by one map-side-combined agg over the train split;
    scoring is one equi-join keyed by token (dictionary vs test
    tokens), one (doc, lang) agg, and the argmax window partitioned
    by doc — per-partition sorts of |langs| rows, never global.
    Argmax orders by round(score, 6) then lang (the rounded-score
    tie discipline — cross-engine FP-sum jitter cannot flip it)."""
    scores = _nb_scores(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy(
        F.desc(F.round("score", 6)), F.asc("lang")
    )
    pred = (
        scores.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "gold", F.col("lang").alias("pred"))
    )
    # per-language rows AND the grand-total 'all' row in ONE agg:
    # rollup(gold) emits each language group plus the NULL total —
    # no union, no second pass over the predictions
    return pred.rollup("gold").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((F.col("pred") == F.col("gold")).cast("int"))
        .cast("long")
        .alias("n_correct"),
    ).select(
        F.coalesce(F.col("gold"), F.lit("all")).alias("lang"),
        "n_docs",
        "n_correct",
        F.round(F.col("n_correct").cast("double") / F.col("n_docs"), 6)
        .alias("accuracy"),
    )


# ---------------------------------------------------------------------------
# Ranking eval (NDCG@k) and calibration eval (ECE / MCE / Brier)
# ---------------------------------------------------------------------------

_NDCG_K = 10


@register(
    "text_ndcg_eval",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
        CAST({_S_SQL} AS DOUBLE) / {_N_SQL} AS score,
        CASE
          WHEN {_S_SQL} + {_noise_sql('gold', _AUC_NOISE)} * {_N_SQL}
               >= {_BAND_MILLI} * {_N_SQL} THEN 2
          WHEN {_S_SQL} + {_noise_sql('gold', _AUC_NOISE)} * {_N_SQL}
               < -{_BAND_MILLI} * {_N_SQL} THEN 0
          ELSE 1 END AS rel
      FROM documents
    ),
    top AS (
      SELECT rel, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
      FROM s
    ),
    dcg AS (
      SELECT sum((CASE rel WHEN 2 THEN 3.0 WHEN 1 THEN 1.0 ELSE 0.0 END)
                 / log2(r + 1)) AS dcg
      FROM top WHERE r <= {_NDCG_K}
    ),
    counts AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(CASE WHEN rel = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel2,
        CAST(sum(CASE WHEN rel = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel1
      FROM s
    ),
    ideal AS (
      SELECT sum((CASE WHEN r <= n_rel2 THEN 3.0
                       WHEN r <= n_rel2 + n_rel1 THEN 1.0
                       ELSE 0.0 END) / log2(r + 1)) AS idcg
      FROM range(1, {_NDCG_K} + 1) t(r) CROSS JOIN counts
    )
    SELECT CAST({_NDCG_K} AS INTEGER) AS k, n_docs, n_rel2, n_rel1,
      round(dcg, 6) AS dcg, round(idcg, 6) AS idcg,
      round(dcg / idcg, 6) AS ndcg
    FROM dcg CROSS JOIN counts CROSS JOIN ideal
    """,
)
def text_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@{k} of the hashed-logit quality ranking against graded
    gold relevance (the 3-band gold of text_quality_confusion mapped
    to gains 3/1/0) — the ranking-eval every learned quality scorer
    is compared with before it reorders a training corpus.

    Scale shape: the naive plan sorts the corpus by score; this one
    never does. DCG@k needs only the k system-best docs — ONE
    ``orderBy().limit(k)`` = TakeOrderedAndProject (per-partition
    top-k, then a k-row merge on the driver side of the exchange);
    the window that assigns ranks runs over exactly k surviving
    rows. IDCG needs only the gold-relevance HISTOGRAM (how many
    rel-2, how many rel-1 — one map-side-combined agg), because the
    ideal ordering of a 3-level gold is fully described by two
    counts: rel at ideal rank r is 2 while r <= n2, 1 while
    r <= n2+n1. Two corpus scans total (top-k + histogram), both of
    a 3-column projection; everything downstream is <= k rows."""
    docs = _docs(spark, sf_dir)
    n = _ts.token_count(F.col("text"))
    s_sum = _ts.quality_logit_milli(F.col("text"))
    gold = s_sum + _noise_col("gold", _AUC_NOISE) * n
    rel = (
        F.when(gold >= _BAND_MILLI * n, 2)
        .when(gold < -_BAND_MILLI * n, 0)
        .otherwise(1)
    )
    s = docs.select(
        "doc_id",
        (s_sum.cast("double") / n).alias("score"),
        rel.alias("rel"),
    )
    top = s.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(_NDCG_K)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    gain = (
        F.when(F.col("rel") == 2, 3.0)
        .when(F.col("rel") == 1, 1.0)
        .otherwise(0.0)
    )
    dcg = top.select(
        F.row_number().over(w).alias("r"), gain.alias("g")
    ).agg(F.sum(F.col("g") / F.log2(F.col("r") + 1)).alias("dcg"))
    counts = s.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("rel") == 2, 1).otherwise(0))
        .cast("long")
        .alias("n_rel2"),
        F.sum(F.when(F.col("rel") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_rel1"),
    )
    ideal = (
        counts.select(
            "n_docs", "n_rel2", "n_rel1",
            F.explode(F.sequence(F.lit(1), F.lit(_NDCG_K))).alias("r"),
        )
        .groupBy("n_docs", "n_rel2", "n_rel1")
        .agg(
            F.sum(
                (
                    F.when(F.col("r") <= F.col("n_rel2"), 3.0)
                    .when(
                        F.col("r") <= F.col("n_rel2") + F.col("n_rel1"), 1.0
                    )
                    .otherwise(0.0)
                )
                / F.log2(F.col("r") + 1)
            ).alias("idcg")
        )
    )
    return dcg.crossJoin(ideal).select(
        F.lit(_NDCG_K).cast("int").alias("k"),
        "n_docs", "n_rel2", "n_rel1",
        F.round("dcg", 6).alias("dcg"),
        F.round("idcg", 6).alias("idcg"),
        F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg"),
    )


text_ndcg_eval.__doc__ = text_ndcg_eval.__doc__.format(k=_NDCG_K)


@register(
    "text_quality_ece",
    oracle=f"""
    WITH s AS (
      SELECT
        greatest(-{_AUC_BINS}, least({_AUC_BINS},
          CAST(floor(CAST({_S_SQL} AS DOUBLE) / {_N_SQL}) AS INTEGER)))
          AS bin,
        CASE WHEN {_S_SQL} + {_noise_sql('auc', _AUC_NOISE)} * {_N_SQL} > 0
          THEN 1 ELSE 0 END AS gold
      FROM documents
    ),
    h AS (
      SELECT bin, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(gold) AS BIGINT) AS pos
      FROM s GROUP BY bin
    ),
    r AS (
      SELECT n, pos,
        1.0 / (1.0 + exp(-CAST(bin AS DOUBLE) / 1000.0)) AS conf,
        CAST(pos AS DOUBLE) / n AS acc
      FROM h
    )
    SELECT CAST(count(*) AS BIGINT) AS n_bins,
      CAST(sum(n) AS BIGINT) AS n_docs,
      round(sum(n * abs(acc - conf)) / sum(n), 6) AS ece,
      round(max(abs(acc - conf)), 6) AS mce,
      round(sum(pos * (1.0 - conf) * (1.0 - conf)
              + (n - pos) * conf * conf) / sum(n), 6) AS brier
    FROM r
    """,
)
def text_quality_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected / maximum calibration error + binned Brier score of
    the quality classifier — the calibration twin of
    text_quality_auc (identical bins, identical gold): AUC says the
    scores RANK well, ECE says whether their logistic probabilities
    can be TRUSTED as probabilities (the question a
    threshold-picking curation gate actually asks).

    Same histogram discipline as the AUC: scores clamp into integer
    mean-milli-logit bins in the scan projection, ONE map-side-
    combined agg builds the (n, pos) histogram, and every metric is
    computed over the histogram (<= 2001 rows at any corpus size) —
    per-bin confidence is the logistic of the bin's milli-logit
    (the model's own probability for that bin, one exp per BIN, not
    per doc), accuracy is the bin's empirical positive rate, ECE the
    count-weighted |acc - conf|, MCE the max, Brier the
    histogram-exact sum pos*(1-conf)^2 + neg*conf^2."""
    docs = _docs(spark, sf_dir)
    n = _ts.token_count(F.col("text"))
    s_sum = _ts.quality_logit_milli(F.col("text"))
    s = docs.select(
        F.greatest(
            F.lit(-_AUC_BINS),
            F.least(
                F.lit(_AUC_BINS),
                F.floor(s_sum.cast("double") / n).cast("int"),
            ),
        ).alias("bin"),
        F.when(
            s_sum + _noise_col("auc", _AUC_NOISE) * n > 0, 1
        ).otherwise(0).alias("gold"),
    )
    h = s.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("gold").cast("long").alias("pos"),
    )
    conf = 1.0 / (1.0 + F.exp(-F.col("bin").cast("double") / 1000.0))
    acc = F.col("pos").cast("double") / F.col("n")
    r = h.select("n", "pos", conf.alias("conf"), acc.alias("acc"))
    gap = F.abs(F.col("acc") - F.col("conf"))
    return r.agg(
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.sum("n").cast("long").alias("n_docs"),
        F.round(F.sum(F.col("n") * gap) / F.sum("n"), 6).alias("ece"),
        F.round(F.max(gap), 6).alias("mce"),
        F.round(
            F.sum(
                F.col("pos") * (1.0 - F.col("conf")) * (1.0 - F.col("conf"))
                + (F.col("n") - F.col("pos")) * F.col("conf") * F.col("conf")
            )
            / F.sum("n"),
            6,
        ).alias("brier"),
    )


# ---------------------------------------------------------------------------
# Split-conformal prediction gate (distribution-free coverage)
# ---------------------------------------------------------------------------

_CONF_ALPHA_PCT = 10  # target miscoverage 10% -> >=90% coverage


@register(
    "data_conformal_gate",
    oracle=f"""
    WITH s AS (
      SELECT
        CASE WHEN doc_id % 5 = 0 THEN 'cal' ELSE 'test' END AS split,
        greatest(-{_AUC_BINS}, least({_AUC_BINS},
          CAST(floor(CAST({_S_SQL} AS DOUBLE) / {_N_SQL}) AS INTEGER)))
          AS bin,
        CASE WHEN {_S_SQL} + {_noise_sql('auc', _AUC_NOISE)} * {_N_SQL} > 0
          THEN 1 ELSE 0 END AS gold
      FROM documents
    ),
    h AS (
      SELECT split, bin, gold, CAST(count(*) AS BIGINT) AS n
      FROM s GROUP BY 1, 2, 3
    ),
    conf AS (
      SELECT split, bin, gold, n,
        1.0 / (1.0 + exp(-CAST(bin AS DOUBLE) / 1000.0)) AS p1
      FROM h
    ),
    cal AS (
      -- nonconformity ranked by its INTEGER sigmoid argument m:
      -- nc = 1-sigmoid(bin) for gold=1 is exactly sigmoid(-bin), so
      -- every nc is sigmoid(m) with m = (gold=1 ? -bin : bin) and
      -- ordering/threshold tests on m are ordering/tests on nc in
      -- EXACT arithmetic. Comparing the floats directly diverged
      -- cross-engine at sf0.1: JVM Math.exp and libm exp differ by
      -- 1 ulp, which flips `<=` when a test nc ties a cal nc from
      -- the mirrored bin.
      SELECT bin, gold, n,
        CASE WHEN gold = 1 THEN -bin ELSE bin END AS m
      FROM h WHERE split = 'cal'
    ),
    tot AS (SELECT sum(n) AS n_cal FROM cal),
    cum AS (
      SELECT m,
        sum(n) OVER (ORDER BY m ASC, bin ASC, gold ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
        t.n_cal,
        CAST(ceil((t.n_cal + 1) * (100 - {_CONF_ALPHA_PCT}) / 100.0)
          AS BIGINT) AS k
      FROM cal CROSS JOIN tot t
    ),
    q AS (
      SELECT min(m) FILTER (cum_n >= k) AS qm,
        any_value(n_cal) AS n_cal
      FROM cum
    ),
    test AS (
      -- qm NULL (k past the calibration mass) = include everything,
      -- matching the old coalesce(qhat, 1.0); the sentinel exceeds
      -- the bin cap so it can never collide with a real m
      SELECT c.bin, c.gold, c.n,
        (-c.bin) <= coalesce(q.qm, {_AUC_BINS} + 1) AS in1,
        c.bin <= coalesce(q.qm, {_AUC_BINS} + 1) AS in0
      FROM h c CROSS JOIN q WHERE c.split = 'test'
    )
    SELECT
      (SELECT CAST(n_cal AS BIGINT) FROM q) AS n_cal,
      CAST(sum(n) AS BIGINT) AS n_test,
      round({_CONF_ALPHA_PCT} / 100.0, 6) AS alpha,
      round((SELECT CASE WHEN qm IS NULL THEN 1.0
        ELSE 1.0 / (1.0 + exp(-CAST(qm AS DOUBLE) / 1000.0)) END
        FROM q), 6) AS qhat,
      round(sum(n * CASE WHEN (gold = 1 AND in1) OR (gold = 0 AND in0)
                    THEN 1 ELSE 0 END) * 1.0 / sum(n), 6) AS coverage,
      round(sum(n * (CAST(in1 AS INTEGER) + CAST(in0 AS INTEGER)))
            * 1.0 / sum(n), 6) AS avg_set_size
    FROM test
    """,
)
def data_conformal_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction for the quality classifier — the
    distribution-free coverage guarantee that turns "a score" into
    "a prediction SET that contains the true label >= 90% of the
    time, no matter how miscalibrated the model is" (Vovk; the
    modern eval complement to ECE: ECE measures calibration,
    conformal REPAIRS it). Calibration split doc_id%5==0,
    nonconformity = 1 - p(true class), qhat = the
    ceil((n+1)*0.9)-th smallest calibration score, test-split
    prediction set = every class whose nonconformity <= qhat.

    Scale shape: the AUC/ECE histogram discipline end-to-end — ONE
    corpus scan groups (split, bin, gold) into a <= 2x2002-row
    histogram, so the order statistic that defines qhat is a
    cumulative window over the HISTOGRAM (constant-bounded rows at
    any corpus size — the kth-smallest over 10^12 raw docs becomes a
    4004-row walk because nonconformity only takes one value per
    (bin, gold) cell), and test coverage is one weighted agg over
    the same histogram. No per-doc sort, no second scan, one exp per
    bin. The >= 1-alpha coverage guarantee itself is pinned in
    pytest against an independent per-doc Python mirror."""
    docs = _docs(spark, sf_dir)
    n = _ts.token_count(F.col("text"))
    s_sum = _ts.quality_logit_milli(F.col("text"))
    s = docs.select(
        F.when(F.col("doc_id") % 5 == 0, "cal").otherwise("test").alias("split"),
        F.greatest(
            F.lit(-_AUC_BINS),
            F.least(
                F.lit(_AUC_BINS),
                F.floor(s_sum.cast("double") / n).cast("int"),
            ),
        ).alias("bin"),
        F.when(
            s_sum + _noise_col("auc", _AUC_NOISE) * n > 0, 1
        ).otherwise(0).alias("gold"),
    )
    # the histogram is the shared stage of three consumers (cal
    # order statistic, qhat's embedded lineage, test coverage) —
    # checkpoint it once so the corpus is scanned once, not three
    # times; <= 2x2002 rows at any corpus size
    h = (
        s.groupBy("split", "bin", "gold")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=False)
    )
    # nonconformity ranked by its INTEGER sigmoid argument m: nc =
    # 1-sigmoid(bin) for gold=1 is exactly sigmoid(-bin), so every nc
    # is sigmoid(m) with m = (gold=1 ? -bin : bin), and because
    # sigmoid is strictly increasing, ordering and threshold tests on
    # m ARE the nc ordering/tests in exact arithmetic. The float form
    # diverged cross-engine at sf0.1: JVM Math.exp and libm exp are
    # each <=1 ulp accurate but differ, flipping `<=` when a test nc
    # ties a cal nc from the mirrored bin.
    cal = h.where(F.col("split") == "cal").select(
        "bin", "gold", "n",
        F.when(F.col("gold") == 1, -F.col("bin"))
        .otherwise(F.col("bin"))
        .alias("m"),
    )
    tot = cal.agg(F.sum("n").alias("n_cal"))
    w = Window.orderBy(
        F.col("m").asc(), F.col("bin").asc(), F.col("gold").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # the unpartitioned window is over the HISTOGRAM (<= 4004 rows
    # at any corpus size), not the corpus — the dictionary-window
    # contract of the AUC family
    cum = cal.crossJoin(F.broadcast(tot)).select(
        "m", "n_cal",
        F.sum("n").over(w).alias("cum_n"),
        F.ceil((F.col("n_cal") + 1) * (100 - _CONF_ALPHA_PCT) / 100.0)
        .cast("long")
        .alias("k"),
    )
    # qm NULL (k past the calibration mass) = include everything; the
    # sentinel exceeds the bin cap so it never collides with a real m
    q = cum.agg(
        F.coalesce(
            F.min(F.when(F.col("cum_n") >= F.col("k"), F.col("m"))),
            F.lit(_AUC_BINS + 1),
        ).alias("qm"),
        F.first("n_cal").alias("n_cal"),
    )
    qhat_report = F.when(F.col("qm") > _AUC_BINS, F.lit(1.0)).otherwise(
        1.0 / (1.0 + F.exp(-F.col("qm").cast("double") / 1000.0))
    )
    test = (
        h.where(F.col("split") == "test")
        .crossJoin(F.broadcast(q))
        .select(
            "gold", "n", "n_cal",
            qhat_report.alias("qhat"),
            ((-F.col("bin")) <= F.col("qm")).alias("in1"),
            (F.col("bin") <= F.col("qm")).alias("in0"),
        )
    )
    covered = F.when(
        ((F.col("gold") == 1) & F.col("in1"))
        | ((F.col("gold") == 0) & F.col("in0")),
        1,
    ).otherwise(0)
    return test.agg(
        F.first("n_cal").alias("n_cal"),
        F.sum("n").cast("long").alias("n_test"),
        F.round(F.lit(_CONF_ALPHA_PCT / 100.0), 6).alias("alpha"),
        F.round(F.first("qhat"), 6).alias("qhat"),
        F.round(
            F.sum(F.col("n") * covered) * 1.0 / F.sum("n"), 6
        ).alias("coverage"),
        F.round(
            F.sum(
                F.col("n")
                * (F.col("in1").cast("int") + F.col("in0").cast("int"))
            )
            * 1.0
            / F.sum("n"),
            6,
        ).alias("avg_set_size"),
    )


# ---------------------------------------------------------------------------
# Deterministic Poisson-bootstrap confidence interval
# ---------------------------------------------------------------------------

_BOOT_B = 20
# quantized Poisson(1) pmf on h%1000: P(0)=.368, P(1)=.368, P(2)=.184,
# P(3)=.061, P(4+)=.019 — mean 0.999, the online/streaming bootstrap
# weight scheme (per-doc weights independent of corpus size, so the
# resample never materializes)
_BOOT_W_SQL = (
    "CASE WHEN m < 368 THEN 0 WHEN m < 736 THEN 1 WHEN m < 920 THEN 2 "
    "WHEN m < 981 THEN 3 ELSE 4 END"
)


@register(
    "data_bootstrap_ci",
    oracle=f"""
    WITH c AS (
      SELECT doc_id,
        CASE WHEN (CASE WHEN {_S_SQL} > 0 THEN 1 ELSE 0 END) =
                  (CASE WHEN {_S_SQL} + {_noise_sql('auc', _AUC_NOISE)}
                        * {_N_SQL} > 0 THEN 1 ELSE 0 END)
          THEN 1 ELSE 0 END AS correct
      FROM documents
    ),
    point AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(correct) AS DOUBLE) / count(*) AS acc
      FROM c
    ),
    rep AS (
      SELECT t.b, c.correct,
        {md5_long_sql("CAST(c.doc_id AS VARCHAR) || '#boot' || CAST(t.b AS VARCHAR)")}
          % 1000 AS m
      FROM c CROSS JOIN range(0, {_BOOT_B}) t(b)
    ),
    accs AS (
      SELECT b,
        CAST(sum(({_BOOT_W_SQL}) * correct) AS DOUBLE)
          / sum({_BOOT_W_SQL}) AS acc_b
      FROM rep GROUP BY b
    ),
    ranked AS (
      SELECT acc_b, row_number() OVER (ORDER BY acc_b ASC, b ASC) AS r
      FROM accs
    ),
    stats AS (
      SELECT count(*) AS nb, sum(acc_b) AS s1, sum(acc_b * acc_b) AS s2
      FROM accs
    )
    SELECT p.n_docs, CAST({_BOOT_B} AS INTEGER) AS n_boot,
      round(p.acc, 6) AS acc,
      round((SELECT acc_b FROM ranked WHERE r = 1), 6) AS ci_lo,
      round((SELECT acc_b FROM ranked WHERE r = {_BOOT_B - 1}), 6) AS ci_hi,
      round(sqrt((s2 - s1 * s1 / nb) / (nb - 1)), 6) AS boot_se
    FROM point p CROSS JOIN stats
    """,
)
def data_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson-bootstrap 90% confidence interval for
    the quality classifier's accuracy — the uncertainty estimate a
    curation dashboard should publish next to every point metric
    (an accuracy of 0.88 means something different at n=400 and
    n=4x10^9). Classical bootstrap resamples the corpus B times —
    impossible at scale; the ONLINE (Poisson) bootstrap replaces
    each resample with per-row integer weights w ~ Poisson(1)
    (quantized here onto a hash so both engines derive identical
    weights), so all {b} replicates compute in ONE pass: the scan
    projection fans each row out x{b} with its (replicate, weight)
    pair, one map-side-combined groupBy(b) produces the {b}-row
    replicate table, and the CI is exact order statistics over those
    {b} rows (rank 1 / rank {b1} = the 5th/95th percentile bounds).

    Corpus-sized work: two scans of a 2-column projection (point
    estimate + replicate pass; the x{b} fanout happens in the
    projection, never a shuffle of {b} corpora). Everything
    downstream is {b} rows. boot_se uses the fixed-order integer-
    moment formula of the burst/CUSUM family."""
    docs = _docs(spark, sf_dir)
    n = _ts.token_count(F.col("text"))
    s_sum = _ts.quality_logit_milli(F.col("text"))
    pred = F.when(s_sum > 0, 1).otherwise(0)
    gold = F.when(
        s_sum + _noise_col("auc", _AUC_NOISE) * n > 0, 1
    ).otherwise(0)
    c = docs.select(
        "doc_id", F.when(pred == gold, 1).otherwise(0).alias("correct")
    )
    point = c.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.sum("correct").cast("double") / F.count(F.lit(1))).alias("acc"),
    )
    rep = c.select(
        "correct",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
        "doc_id",
    ).select(
        "b",
        "correct",
        (
            md5_long(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit("#boot"),
                    F.col("b").cast("string"),
                )
            )
            % 1000
        ).alias("m"),
    )
    w = (
        F.when(F.col("m") < 368, 0)
        .when(F.col("m") < 736, 1)
        .when(F.col("m") < 920, 2)
        .when(F.col("m") < 981, 3)
        .otherwise(4)
    )
    # the B-row replicate table has THREE consumers (lo, hi, stats)
    # — checkpoint it once so the corpus replicate pass runs once
    accs = (
        rep.groupBy("b")
        .agg(
            (
                F.sum(w * F.col("correct")).cast("double") / F.sum(w)
            ).alias("acc_b")
        )
        .localCheckpoint(eager=False)
    )
    rw = Window.orderBy(F.col("acc_b").asc(), F.col("b").asc())
    # the unpartitioned window is over the B-row replicate table
    ranked = accs.select("acc_b", F.row_number().over(rw).alias("r"))
    lo = ranked.where(F.col("r") == 1).select(F.col("acc_b").alias("ci_lo"))
    hi = ranked.where(F.col("r") == _BOOT_B - 1).select(
        F.col("acc_b").alias("ci_hi")
    )
    stats = accs.agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum("acc_b").alias("s1"),
        F.sum(F.col("acc_b") * F.col("acc_b")).alias("s2"),
    )
    return (
        point.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .crossJoin(F.broadcast(stats))
        .select(
            "n_docs",
            F.lit(_BOOT_B).cast("int").alias("n_boot"),
            F.round("acc", 6).alias("acc"),
            F.round("ci_lo", 6).alias("ci_lo"),
            F.round("ci_hi", 6).alias("ci_hi"),
            F.round(
                F.sqrt(
                    (F.col("s2") - F.col("s1") * F.col("s1") / F.col("nb"))
                    / (F.col("nb") - 1)
                ),
                6,
            ).alias("boot_se"),
        )
    )


data_bootstrap_ci.__doc__ = data_bootstrap_ci.__doc__.format(
    b=_BOOT_B, b1=_BOOT_B - 1
)


# ---------------------------------------------------------------------------
# Heaps'-law vocabulary growth fit (the Zipf complement)
# ---------------------------------------------------------------------------

_HEAPS_BATCHES = 8


@register(
    "text_heaps_fit",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id % {_HEAPS_BATCHES} AS b,
        unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    per_batch AS (
      SELECT b, CAST(count(*) AS BIGINT) AS n_tok FROM toks GROUP BY b
    ),
    first_seen AS (
      SELECT min(b) AS b, tok FROM toks GROUP BY tok
    ),
    new_vocab AS (
      SELECT b, CAST(count(*) AS BIGINT) AS n_new FROM first_seen GROUP BY b
    ),
    cum AS (
      SELECT p.b,
        sum(p.n_tok) OVER (ORDER BY p.b
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens,
        sum(coalesce(v.n_new, 0)) OVER (ORDER BY p.b
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_vocab
      FROM per_batch p LEFT JOIN new_vocab v ON p.b = v.b
    ),
    pts AS (
      SELECT CAST(b AS INTEGER) AS b,
        CAST(cum_tokens AS BIGINT) AS cum_tokens,
        CAST(cum_vocab AS BIGINT) AS cum_vocab,
        ln(CAST(cum_tokens AS DOUBLE)) AS x,
        ln(CAST(cum_vocab AS DOUBLE)) AS y
      FROM cum
    ),
    fit AS (
      SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        sum(x * x) AS sxx, sum(x * y) AS sxy
      FROM pts
    )
    SELECT CAST(n AS INTEGER) AS n_batches,
      (SELECT cum_tokens FROM pts WHERE b = {_HEAPS_BATCHES - 1})
        AS total_tokens,
      (SELECT cum_vocab FROM pts WHERE b = {_HEAPS_BATCHES - 1})
        AS total_vocab,
      round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS beta,
      round(exp((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n), 6)
        AS k
    FROM fit
    """,
)
def text_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit V(N) = K * N^beta of vocabulary growth across
    {nb} crawl batches — the companion to text_zipf_fit (Zipf says
    how the EXISTING vocabulary is used; Heaps says how fast NEW
    vocabulary keeps arriving, i.e. what a tokenizer/vocab budget
    must absorb as the corpus scales 100x: beta ~ 0.5 means 10x data
    = ~3x vocab).

    Scale shape: cumulative vocabulary is NOT a per-batch distinct
    over growing prefixes (that replays the corpus {nb} times) — a
    token's FIRST-SEEN batch is one min() agg over the token
    dictionary, so cumulative vocab = a running sum over the {nb}-row
    first-seen histogram. One token-stream scan feeds both keyed
    aggs; the windows and the closed-form log-log OLS run over {nb}
    points. All-integer until the ln()s of the fit."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        (F.col("doc_id") % _HEAPS_BATCHES).alias("b"),
        F.explode(F.split(F.col("text"), " ")).alias("tok"),
    ).localCheckpoint(eager=False)
    per_batch = toks.groupBy("b").agg(
        F.count(F.lit(1)).cast("long").alias("n_tok")
    )
    new_vocab = (
        toks.groupBy("tok")
        .agg(F.min("b").alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_new"))
    )
    w = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # the unpartitioned windows run over the 8-row batch table
    cum = (
        per_batch.join(new_vocab, "b", "left")
        .select(
            "b",
            F.sum("n_tok").over(w).alias("cum_tokens"),
            F.sum(F.coalesce(F.col("n_new"), F.lit(0)))
            .over(w)
            .alias("cum_vocab"),
        )
        .localCheckpoint(eager=False)
    )
    pts = cum.select(
        F.col("b").cast("int").alias("b"),
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
        F.col("cum_vocab").cast("long").alias("cum_vocab"),
        F.log(F.col("cum_tokens").cast("double")).alias("x"),
        F.log(F.col("cum_vocab").cast("double")).alias("y"),
    )
    fit = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    last = pts.where(F.col("b") == _HEAPS_BATCHES - 1).select(
        "cum_tokens", "cum_vocab"
    )
    beta = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return fit.crossJoin(F.broadcast(last)).select(
        F.col("n").cast("int").alias("n_batches"),
        F.col("cum_tokens").alias("total_tokens"),
        F.col("cum_vocab").alias("total_vocab"),
        F.round(beta, 6).alias("beta"),
        F.round(
            F.exp((F.col("sy") - beta * F.col("sx")) / F.col("n")), 6
        ).alias("k"),
    )


text_heaps_fit.__doc__ = text_heaps_fit.__doc__.format(nb=_HEAPS_BATCHES)


# ---------------------------------------------------------------------------
# Mojibake / encoding-damage gate
# ---------------------------------------------------------------------------

# deterministic marker augmentation (the text_nb_langid convention):
# docs with md5(doc_id) % 7 == 0 get a damaged suffix containing one
# specimen of each damage class — UTF-8-as-Latin-1 mojibake ('Ã©',
# 'â€œ'), the U+FFFD replacement char, and a C0 control byte — so the
# detector is exercised end-to-end on a corpus that is otherwise
# clean ASCII. Real pipelines run the same projection on raw text.
_MOJI_SUFFIX = " Ã©â€œ\x07�"
_CTRL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f]"


def _mojibake_sql() -> str:
    from multiomics_biocypher_kg_spark.functions.hashing import md5_long_sql

    h = md5_long_sql("CAST(doc_id AS VARCHAR)")
    return f"""
    WITH aug AS (
      SELECT doc_id,
        CASE WHEN {h} % 7 = 0
          THEN text || ' ' || chr(195) || chr(169) || chr(226) || chr(8364)
               || chr(339) || chr(7) || chr(65533)
          ELSE text END AS s
      FROM documents
    ),
    counted AS (
      SELECT doc_id, length(s) AS n_chars,
        length(s) - length(replace(s, chr(65533), '')) AS n_replacement,
        (length(s) - length(replace(s, chr(195), '')))
          + (length(s) - length(replace(s, chr(226) || chr(8364), ''))) // 2
          AS n_mojibake,
        length(s) - length(regexp_replace(s,
          '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]', '', 'g')) AS n_control
      FROM aug
    )
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
      CAST(n_replacement AS BIGINT) AS n_replacement,
      CAST(n_mojibake AS BIGINT) AS n_mojibake,
      CAST(n_control AS BIGINT) AS n_control,
      round(1000.0 * (n_replacement + n_mojibake + n_control)
            / greatest(n_chars, 1), 6) AS damage_per_kchar,
      (n_replacement + n_mojibake + n_control) > 0 AS is_damaged
    FROM counted
    """


@register("text_mojibake_gate", oracle=_mojibake_sql())
def text_mojibake_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-damage gate: per document, counts of the three
    classes of text corruption a web-crawl pipeline must filter
    before pretraining — U+FFFD replacement characters (a decoder
    already gave up), UTF-8-read-as-Latin-1 mojibake signatures
    ('Ã' lead bytes and the 'â€' smart-quote prefix — the two
    highest-precision markers of double-encoding damage), and C0
    control characters (binary junk in a text field) — plus the
    per-kilochar damage rate and the gate flag. Complements the
    statistical quality gates (perplexity, char entropy): those
    score FLUENCY, this catches mechanical corruption fluent text
    can still carry.

    The synthetic corpus is clean ASCII, so a deterministic
    md5-selected ~1/7 of documents get a damaged suffix carrying one
    specimen of each class (identically on both engines — the
    text_nb_langid marker-augmentation convention), proving the
    detection path end-to-end; on real data the projection runs on
    the raw text unchanged.

    Scale shape: pure scan projection — every count is a
    length-difference over replace()/regexp_replace() (no explode,
    no UDF, whole-stage codegen); no shuffle anywhere. The regexes
    and literals are shared constants with byte-identical semantics
    in Spark (Java regex) and DuckDB (RE2): plain char classes and
    literal substrings only."""
    from multiomics_biocypher_kg_spark.functions.hashing import md5_long

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    s = F.when(
        md5_long(F.col("doc_id").cast("string")) % 7 == 0,
        F.concat(F.col("text"), F.lit(_MOJI_SUFFIX)),
    ).otherwise(F.col("text"))
    aug = docs.select("doc_id", s.alias("s"))
    ln = F.length("s")
    n_repl = ln - F.length(F.replace(F.col("s"), F.lit("�")))
    n_moji = (ln - F.length(F.replace(F.col("s"), F.lit("Ã")))) + (
        (ln - F.length(F.replace(F.col("s"), F.lit("â€")))) / 2
    ).cast("long")
    n_ctrl = ln - F.length(F.regexp_replace("s", _CTRL_RE, ""))
    total = n_repl + n_moji + n_ctrl
    return aug.select(
        "doc_id",
        ln.cast("long").alias("n_chars"),
        n_repl.cast("long").alias("n_replacement"),
        n_moji.cast("long").alias("n_mojibake"),
        n_ctrl.cast("long").alias("n_control"),
        F.round(
            1000.0 * total / F.greatest(ln, F.lit(1)), 6
        ).alias("damage_per_kchar"),
        (total > 0).alias("is_damaged"),
    )


# ---------------------------------------------------------------------------
# Per-host domain-shift audit: KL(host LM || corpus LM)
# ---------------------------------------------------------------------------

_DOMAIN_HOST_SQL = (
    "CASE WHEN doc_id % 10 < 3 THEN 'hot.example.com' "
    "ELSE 'h' || CAST(doc_id % 50 AS VARCHAR) || '.example.org' END"
)


@register(
    "text_domain_kld",
    oracle=f"""
    WITH toks AS (
      SELECT {_DOMAIN_HOST_SQL} AS host,
        lower(unnest(string_split(text, ' '))) AS token
      FROM documents
    ),
    ht AS (SELECT host, token, count(*) AS c FROM toks GROUP BY 1, 2),
    hostn AS (SELECT host, sum(c) AS th FROM ht GROUP BY host),
    ct AS (SELECT token, sum(c) AS cc FROM ht GROUP BY token),
    tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM ht),
    terms AS (
      SELECT ht.host,
        (CAST(ht.c AS DOUBLE) / hostn.th)
          * log2((CAST(ht.c AS DOUBLE) / hostn.th)
                 / (CAST(ct.cc AS DOUBLE) / tot.t)) AS term,
        ht.c
      FROM ht
      JOIN hostn ON ht.host = hostn.host
      JOIN ct ON ht.token = ct.token
      CROSS JOIN tot
    )
    SELECT host, CAST(sum(c) AS BIGINT) AS n_tokens,
      CAST(count(*) AS BIGINT) AS vocab,
      round(sum(term), 6) AS kld_bits
    FROM terms GROUP BY host
    """,
)
def text_domain_kld(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host domain-shift audit: KL(P_host || P_corpus) in bits
    over unigram language models — "how far does this host's word
    distribution sit from the corpus average", the signal behind
    domain-weighted mixing (a host with tiny KLD adds nothing a
    generic sample lacks; a huge-KLD host is either valuable
    specialist content or template spam — web_boilerplate_shingles
    disambiguates). The sparse-safe direction: every host token
    appears in the corpus by construction, so KL(P||Q) sums ONLY
    over the host's own vocabulary — no smoothing, no host x
    corpus-vocab blowup (the reason this is KL and not the symmetric
    JSD, whose second term ranges over the full corpus vocabulary
    for every host).

    Scale shape: host is derived in the scan projection (the
    pages_from_documents url formula, SQL twin _DOMAIN_HOST_SQL);
    one map-side-combined (host, token) count feeds ALL THREE
    aggregates (host totals, corpus token dictionary, corpus total)
    — the token stream is exploded once; scoring is a dictionary
    join + one per-host sum (host-vocabulary-sized groups). Same
    float-sum discipline as text_unigram_perplexity: round(6) on the
    final per-group sum."""
    from multiomics_biocypher_kg_spark.sources.pages import HOT_HOST

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    host = F.when(F.col("doc_id") % 10 < 3, F.lit(HOT_HOST)).otherwise(
        F.concat(
            F.lit("h"), (F.col("doc_id") % 50).cast("string"), F.lit(".example.org")
        )
    )
    toks = docs.select(
        host.alias("host"),
        F.explode(F.split(F.lower("text"), " ")).alias("token"),
    )
    ht = toks.groupBy("host", "token").agg(F.count(F.lit(1)).alias("c"))
    ht = ht.localCheckpoint(eager=False)  # three consumers below
    hostn = ht.groupBy("host").agg(F.sum("c").alias("th"))
    ct = ht.groupBy("token").agg(F.sum("c").alias("cc"))
    tot = ht.agg(F.sum("c").cast("double").alias("t"))
    p = F.col("c").cast("double") / F.col("th")
    q = F.col("cc").cast("double") / F.col("t")
    terms = (
        ht.join(F.broadcast(hostn), "host")
        .join(ct, "token")
        .crossJoin(F.broadcast(tot))
        .select("host", "c", (p * F.log2(p / q)).alias("term"))
    )
    return terms.groupBy("host").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.round(F.sum("term"), 6).alias("kld_bits"),
    )


# ---------------------------------------------------------------------------
# N-gram novelty curve (first-seen trigram fraction per document)
# ---------------------------------------------------------------------------


@register(
    "text_ngram_novelty",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS arr,
        len(string_split(text, ' ')) AS n
      FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id,
        arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2] AS gram
      FROM t, LATERAL (
        SELECT unnest(generate_series(1, n - 2)) AS i
      ) s
      WHERE n >= 3
    ),
    first_seen AS (SELECT gram, min(doc_id) AS first_doc FROM grams GROUP BY gram)
    SELECT g.doc_id,
      CAST(count(*) AS BIGINT) AS n_grams,
      CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT)
        AS n_novel,
      round(CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
                 AS DOUBLE) / count(*), 6) AS novelty_ratio
    FROM grams g JOIN first_seen f ON g.gram = f.gram
    GROUP BY g.doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document trigram novelty: the fraction of a document's
    distinct word trigrams whose FIRST corpus occurrence (by doc_id
    ingestion order) is in this document — the dataset-freshness
    curve behind dedup-aware data valuation (a doc whose trigrams
    are all old contributes near-zero new sequence signal even if it
    is not a literal near-dup; Lee et al. 2022's memorization
    argument at the marginal-document grain). The corpus-level trend
    of this ratio over ingestion order is the diminishing-returns
    curve a crawl-budget owner actually reads.

    Scale shape: trigrams materialize as a native array transform in
    the scan projection (no window over the token stream), distinct
    per doc; first-seen is ONE min() agg over the gram dictionary
    (the text_heaps_fit discipline — never a per-prefix replay);
    scoring is a dictionary join + per-doc agg. Docs with < 3 tokens
    have no trigrams and no row, by contract."""
    docs = _docs(spark, sf_dir).select("doc_id", F.split("text", " ").alias("arr"))
    n = F.size("arr")
    gram_arr = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), n - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("arr"), i),
                F.element_at(F.col("arr"), i + 1),
                F.element_at(F.col("arr"), i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = (
        docs.select("doc_id", F.explode(gram_arr).alias("gram"))
        .distinct()
        .localCheckpoint(eager=False)  # two consumers: first-seen + scoring
    )
    first = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    ).cast("long")
    return (
        grams.join(first, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            novel.alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.round(
                F.col("n_novel").cast("double") / F.col("n_grams"), 6
            ).alias("novelty_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# BPE tokenizer application (the learned merges scoring the corpus)
# ---------------------------------------------------------------------------


@register(
    "text_bpe_apply",
    oracle=f"""
    WITH {{parts}},
    sym AS MATERIALIZED (
      SELECT word, len(string_split(trim(seg, '()'), ')(')) AS n_sym
      FROM w{_BPE_ROUNDS}
    ),
    dw AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    scored AS (
      SELECT d.doc_id, s.n_sym, len(d.word) AS n_chars
      FROM dw d JOIN sym s ON d.word = s.word
    )
    SELECT doc_id,
      CAST(count(*) AS BIGINT) AS n_alpha_words,
      CAST(sum(n_sym) AS BIGINT) AS n_tokens_bpe,
      CAST(sum(n_chars) AS BIGINT) AS n_chars,
      round(CAST(sum(n_sym) AS DOUBLE) / count(*), 6) AS fertility,
      round(CAST(sum(n_chars) AS DOUBLE) / sum(n_sym), 6) AS compression
    FROM scored GROUP BY doc_id
    """.format(parts=_bpe_train_parts(_BPE_ROUNDS)),
)
def text_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLICATION: the merges text_bpe_train learns
    are applied back to every document and scored — per doc, the
    BPE token count over its alphabetic words, tokens-per-word
    fertility, and chars-per-token compression. Training tells you
    the merge table; THIS is the number a data pipeline actually
    bills by (token budgets, packing, cost estimates are all
    downstream of tokens-per-doc), and the fertility distribution is
    the per-language tokenizer-equity audit at corpus grain
    (text_tokenizer_fertility's model-based sibling — same metric,
    REAL learned tokenizer).

    Scale shape: the trainer's discipline carries over — merges
    train on the DISTINCT-word dictionary (corpus token stream
    touched once), the final segmentation lives on that dictionary,
    and application is ONE keyed join of the exploded corpus against
    the vocabulary-sized (word, n_sym) table + a per-doc agg. The
    K-row merge table is the only driver state (it IS the tokenizer
    model, exactly as in text_bpe_train). Docs with no [a-z]{{2,}}
    words have no row by contract."""
    wc = (
        _docs(spark, sf_dir)
        .select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word").rlike("^[a-z]{2,}$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("seg", F.regexp_replace("word", "(.)", "($1)"))
    )
    for r in range(1, _BPE_ROUNDS + 1):
        pairs = (
            wc.select(
                "n",
                F.split(F.expr("trim(BOTH '()' FROM seg)"), r"\)\(").alias("syms"),
            )
            .where(F.size("syms") >= 2)
            .select(
                "n",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> concat(element_at(syms, i), '|', "
                        "element_at(syms, i + 1)))"
                    )
                ).alias("pair"),
            )
            .groupBy("pair")
            .agg(F.sum("n").alias("freq"))
        )
        best = pairs.orderBy(F.desc("freq"), F.asc("pair")).first()
        left, right = best["pair"].split("|")
        wc = wc.withColumn(
            "seg",
            F.expr(f"replace(seg, '({left})({right})', '({left}{right})')"),
        )
    sym = wc.select(
        "word",
        F.size(F.split(F.expr("trim(BOTH '()' FROM seg)"), r"\)\(")).alias("n_sym"),
    )
    dw = _docs(spark, sf_dir).select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    scored = dw.join(sym, "word").select(
        "doc_id", "n_sym", F.length("word").alias("n_chars")
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_alpha_words"),
        F.sum("n_sym").cast("long").alias("n_tokens_bpe"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.round(
            F.sum("n_sym").cast("double") / F.count(F.lit(1)), 6
        ).alias("fertility"),
        F.round(
            F.sum("n_chars").cast("double") / F.sum("n_sym"), 6
        ).alias("compression"),
    )


# ---------------------------------------------------------------------------
# Blocking-stage recall against the dedup provenance gold
# ---------------------------------------------------------------------------


@register(
    "data_blocking_recall",
    oracle="""
    WITH corpus AS (
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
    ),
    keys AS (
      SELECT doc_id,
        string_split(text, ' ')[1] || '|'
          || CAST(CAST(floor(len(string_split(text, ' ')) / 8.0) AS BIGINT)
                  AS VARCHAR) AS block_key
      FROM corpus
    ),
    gold AS (
      SELECT doc_id AS id_a, doc_id + 2000000 AS id_b, 'exact' AS kind
      FROM documents WHERE doc_id % 5 = 0
      UNION ALL
      SELECT doc_id, doc_id + 1000000, 'near'
      FROM documents WHERE doc_id % 4 = 0
      UNION ALL
      SELECT doc_id + 1000000, doc_id + 2000000, 'cross'
      FROM documents WHERE doc_id % 20 = 0
    ),
    joined AS (
      SELECT g.kind,
        CASE WHEN ka.block_key = kb.block_key THEN 1 ELSE 0 END AS hit
      FROM gold g
      JOIN keys ka ON g.id_a = ka.doc_id
      JOIN keys kb ON g.id_b = kb.doc_id
    ),
    perkind AS (
      SELECT kind, CAST(count(*) AS BIGINT) AS n_gold,
        CAST(sum(hit) AS BIGINT) AS n_coblocked,
        round(CAST(sum(hit) AS DOUBLE) / count(*), 6) AS recall
      FROM joined GROUP BY kind
    )
    SELECT * FROM perkind
    UNION ALL
    SELECT 'all', CAST(count(*) AS BIGINT), CAST(sum(hit) AS BIGINT),
      round(CAST(sum(hit) AS DOUBLE) / count(*), 6)
    FROM joined
    """,
)
def data_blocking_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-stage RECALL against the dedup provenance gold: the
    fraction of known duplicate pairs whose two members land in the
    same block under the kg_blocking_keys key (first token + length
    octile) — the metric that decides whether a blocking scheme is
    safe, because a pair split across blocks is unrecoverable no
    matter how good the matcher is (dedup_eval_pr scores the MATCHER
    end-to-end; this isolates the candidate-generation stage, the
    standard ER evaluation decomposition). Exact twins share text
    and always co-block (recall 1.0 is the sanity anchor); the
    token-dropped near twins keep their first token but shrink ~10%,
    so their recall measures exactly the length-bucket boundary
    sensitivity the octile choice trades.

    Scale shape: keys compute in the corpus scan projection; gold
    pairs derive from the same id arithmetic as dedup_eval_pr; the
    evaluation is two keyed joins of the bounded gold set against
    the key dictionary + one rollup — never corpus x corpus."""
    from multiomics_biocypher_kg_spark.registry_dedup_text import _dedup_corpus

    corpus = _dedup_corpus(spark, sf_dir, rebalance=False)
    arr = F.split("text", " ")
    keys = corpus.select(
        "doc_id",
        F.concat(
            F.element_at(arr, 1),
            F.lit("|"),
            F.floor(F.size(arr) / 8.0).cast("long").cast("string"),
        ).alias("block_key"),
    ).localCheckpoint(eager=False)  # joined twice (both pair sides)
    base = _docs(spark, sf_dir).select("doc_id")
    gold = (
        base.where(F.col("doc_id") % 5 == 0)
        .select(
            F.col("doc_id").alias("id_a"),
            (F.col("doc_id") + 2000000).alias("id_b"),
            F.lit("exact").alias("kind"),
        )
        .union(
            base.where(F.col("doc_id") % 4 == 0).select(
                "doc_id",
                (F.col("doc_id") + 1000000).alias("id_b"),
                F.lit("near"),
            )
        )
        .union(
            base.where(F.col("doc_id") % 20 == 0).select(
                (F.col("doc_id") + 1000000).alias("id_a"),
                (F.col("doc_id") + 2000000).alias("id_b"),
                F.lit("cross"),
            )
        )
    )
    ka = keys.select(F.col("doc_id").alias("id_a"), F.col("block_key").alias("ka"))
    kb = keys.select(F.col("doc_id").alias("id_b"), F.col("block_key").alias("kb"))
    joined = (
        gold.join(ka, "id_a")
        .join(kb, "id_b")
        .select(
            "kind",
            F.when(F.col("ka") == F.col("kb"), 1).otherwise(0).alias("hit"),
        )
        .localCheckpoint(eager=False)  # per-kind + overall legs
    )
    perkind = joined.groupBy("kind").agg(
        F.count(F.lit(1)).cast("long").alias("n_gold"),
        F.sum("hit").cast("long").alias("n_coblocked"),
        F.round(F.sum("hit").cast("double") / F.count(F.lit(1)), 6).alias(
            "recall"
        ),
    )
    overall = joined.agg(
        F.lit("all").alias("kind"),
        F.count(F.lit(1)).cast("long").alias("n_gold"),
        F.sum("hit").cast("long").alias("n_coblocked"),
        F.round(F.sum("hit").cast("double") / F.count(F.lit(1)), 6).alias(
            "recall"
        ),
    )
    return perkind.union(overall)


# ---------------------------------------------------------------------------
# Standardized type-token ratio (lexical diversity gate)
# ---------------------------------------------------------------------------

_TTR_WINDOW = 50


@register(
    "text_ttr",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS arr,
        len(string_split(text, ' ')) AS n
      FROM documents
    ),
    w AS (
      SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
        arr[1 : least(n, {_TTR_WINDOW})] AS win
      FROM t WHERE n > 0
    ),
    scored AS (
      SELECT doc_id, n_tokens,
        CAST(len(win) AS BIGINT) AS window_tokens,
        CAST(len(list_distinct(win)) AS BIGINT) AS window_types
      FROM w
    )
    SELECT doc_id, n_tokens, window_tokens, window_types,
      round(CAST(window_types AS DOUBLE) / window_tokens, 6) AS sttr,
      CAST(window_types AS DOUBLE) / window_tokens < 0.4 AS is_repetitive
    FROM scored
    """,
)
def text_ttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized type-token ratio: distinct tokens over the first
    {w} tokens of each document — the lexical-diversity gate
    (raw TTR falls with length by Heaps' law, so comparing documents
    requires a FIXED window; the standardized form is the comparable
    one). Low STTR catches keyword-stuffing and template spam that
    passes length and perplexity gates (a page repeating 12 words
    can still be "fluent" under a unigram LM trained on pages like
    it); the complement to text_repetition's n-gram form — TTR is
    order-blind, the repetition gates are order-sensitive, spam
    usually fails both.

    Scale shape: pure scan projection — array slice +
    array_distinct + sizes, zero shuffles, whole-stage codegen;
    per-doc output. Empty documents have no row by contract."""
    docs = _docs(spark, sf_dir).select("doc_id", F.split("text", " ").alias("arr"))
    n = F.size("arr")
    win = F.slice(F.col("arr"), 1, _TTR_WINDOW)
    scored = docs.where(n > 0).select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.size(win).cast("long").alias("window_tokens"),
        F.size(F.array_distinct(win)).cast("long").alias("window_types"),
    )
    sttr = F.col("window_types").cast("double") / F.col("window_tokens")
    return scored.select(
        "doc_id",
        "n_tokens",
        "window_tokens",
        "window_types",
        F.round(sttr, 6).alias("sttr"),
        (sttr < 0.4).alias("is_repetitive"),
    )


text_ttr.__doc__ = text_ttr.__doc__.format(w=_TTR_WINDOW)



# ---------------------------------------------------------------------------
# Dawid-Skene label aggregation (one-step EM over unequal raters)
# ---------------------------------------------------------------------------

# Five simulated raters with DIFFERENT noise widths (rater 0 is the
# careful annotator, rater 4 the sloppiest) — the fixture where
# majority vote is beatable: an accuracy-weighted aggregator should
# overrule a noisy majority when the careful raters dissent. Same
# all-integer synthesis as data_fleiss_kappa (band of S + jitter*n),
# distinct salts so the two fixtures stay independent. Widths picked
# so the one-EM-step relabel beats majority vote against the
# noise-free gold band by a pytest-assertable margin at both test
# SFs (measured: 0.794 -> 0.862 at sf0.001, 0.786 -> 0.824 at
# sf0.01).
_DS_WIDTHS = [20, 60, 120, 160, 200]
_DS_R = len(_DS_WIDTHS)
_DS_CATS = ["high", "low", "mid"]


def _ds_obs_sql(r: int) -> str:
    return _band_sql(
        f"({_S_SQL} + {_noise_sql(f'ds{r}', _DS_WIDTHS[r])} * {_N_SQL})",
        _N_SQL,
    )


def _ds_mv_case(col: str = "obs") -> str:
    """Majority vote with lexicographic-asc category tiebreak
    ('high' < 'low' < 'mid'), over the c_high/c_low/c_mid counts."""
    return (
        "CASE WHEN c_high >= c_low AND c_high >= c_mid THEN 'high' "
        "WHEN c_low >= c_mid THEN 'low' ELSE 'mid' END"
    )


def _ds_ctes() -> str:
    """Shared CTE chain: per-doc observed labels -> majority-vote
    init -> per-rater confusion counts vs the init labels -> add-1-
    smoothed confusion probabilities and class priors (the M-step)
    -> wide lookup tables for the E-step re-scoring."""
    obs_cols = ",\n        ".join(
        f"{_ds_obs_sql(r)} AS obs{r}" for r in range(_DS_R)
    )
    cnts = ",\n          ".join(
        "("
        + " + ".join(
            f"CASE WHEN obs{r} = '{c}' THEN 1 ELSE 0 END"
            for r in range(_DS_R)
        )
        + f") AS c_{c}"
        for c in _DS_CATS
    )
    long_union = "\n      UNION ALL ".join(
        f"SELECT mv_label, {r} AS rater, obs{r} AS obs FROM mv"
        for r in range(_DS_R)
    )
    gw_cols = ",\n        ".join(
        f"max(CASE WHEN true_cat = '{c}' THEN p END) AS g_{c}"
        for c in _DS_CATS
    )
    pw_cols = ",\n        ".join(
        f"max(CASE WHEN true_cat = '{c}' THEN pi END) AS pi_{c}"
        for c in _DS_CATS
    )
    return f"""
    obs AS (
      SELECT doc_id,
        {obs_cols}
      FROM documents
    ),
    mv AS (
      SELECT *, {_ds_mv_case()} AS mv_label
      FROM (
        SELECT *,
          {cnts}
        FROM obs
      )
    ),
    long AS (
      {long_union}
    ),
    conf AS (
      SELECT rater, mv_label AS true_cat, obs, count(*) AS n
      FROM long GROUP BY 1, 2, 3
    ),
    cats AS (SELECT unnest(['high', 'low', 'mid']) AS cat),
    n_true AS (
      SELECT c.cat AS true_cat, CAST(coalesce(sum(f.n), 0) AS BIGINT) AS n_t
      FROM cats c LEFT JOIN (SELECT * FROM conf WHERE rater = 0) f
        ON f.true_cat = c.cat
      GROUP BY c.cat
    ),
    ntot AS (SELECT CAST(sum(n_t) AS BIGINT) AS n_docs FROM n_true),
    grid AS (
      SELECT r.rater, t.true_cat, o.cat AS obs,
        CAST(coalesce(f.n, 0) AS BIGINT) AS n, nt.n_t,
        (CAST(coalesce(f.n, 0) AS DOUBLE) + 1)
          / (CAST(nt.n_t AS DOUBLE) + 3) AS p
      FROM (SELECT unnest(generate_series(0, {_DS_R - 1})) AS rater) r
      CROSS JOIN (SELECT cat AS true_cat FROM cats) t
      CROSS JOIN cats o
      JOIN n_true nt ON nt.true_cat = t.true_cat
      LEFT JOIN conf f ON f.rater = r.rater AND f.true_cat = t.true_cat
        AND f.obs = o.cat
    ),
    priors AS (
      SELECT true_cat,
        (CAST(n_t AS DOUBLE) + 1) / (CAST(n_docs AS DOUBLE) + 3) AS pi
      FROM n_true CROSS JOIN ntot
    ),
    gw AS (
      SELECT rater, obs,
        {gw_cols}
      FROM grid GROUP BY rater, obs
    ),
    pw AS (
      SELECT {pw_cols}
      FROM priors
    )"""


def _ds_score_sql(c: str) -> str:
    """Left-assoc product pi_c * prod_r g{r}_c — the pinned IEEE
    multiply order both engines mirror."""
    expr = f"pw.pi_{c}"
    for r in range(_DS_R):
        expr = f"({expr} * g{r}.g_{c})"
    return expr


_DS_SCORED_SQL = f"""
    scored AS (
      SELECT m.doc_id, m.mv_label,
        {_ds_score_sql('high')} AS s_high,
        {_ds_score_sql('low')} AS s_low,
        {_ds_score_sql('mid')} AS s_mid
      FROM mv m
      CROSS JOIN pw
      {' '.join(f'JOIN gw g{r} ON g{r}.rater = {r} AND g{r}.obs = m.obs{r}' for r in range(_DS_R))}
    )
"""


@register(
    "data_dawid_skene",
    oracle=f"""
    WITH {_ds_ctes()},
    {_DS_SCORED_SQL},
    labeled AS (
      SELECT *, CASE
        WHEN s_high >= s_low AND s_high >= s_mid THEN 'high'
        WHEN s_low >= s_mid THEN 'low' ELSE 'mid' END AS ds_label
      FROM scored
    )
    SELECT doc_id, mv_label, ds_label, ds_label <> mv_label AS changed,
      round(CASE WHEN ds_label = 'high' THEN s_high
                 WHEN ds_label = 'low' THEN s_low ELSE s_mid END
            / ((s_high + s_low) + s_mid), 6) AS ds_posterior
    FROM labeled
    """,
)
def data_dawid_skene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dawid-Skene label aggregation (Dawid & Skene 1979; the
    crowd/weak-supervision standard), one hard-EM step from the
    majority-vote init: estimate each rater's 3x3 confusion matrix
    and the class priors against the init labels (add-1 smoothed),
    then re-label every item by the maximum-likelihood class under
    the naive-Bayes rater model — pi_c * prod_r P(obs_r | true=c).
    This is what majority vote cannot do: the five simulated raters
    have noise widths {w}, so a careful-rater dissent can overrule
    a sloppy majority once the confusion matrices are learned
    (measured on the fixture: accuracy vs the noise-free gold band
    rises 0.794 -> 0.862 at sf0.001, 0.786 -> 0.824 at sf0.01;
    pytest-asserted). The LLM-data use: aggregating noisy quality
    judgments (human or LLM-judge) into training labels with
    per-judge reliability — the step between text_quality_confusion
    (one judge vs gold) and shipping labels nobody hand-checked.

    Scale shape: the M-step is ONE map-side-combined count over the
    {r}-per-doc rating stream — 45 groups at any corpus size; priors
    fall out of the rater-0 marginal (no extra corpus pass). The
    E-step joins the corpus against the per-rater 9-row lookups
    (broadcast) plus the 1-row prior (broadcast nested loop, the
    NB-langid dim convention) — 2 corpus scans total, no corpus
    shuffle beyond the count agg. All likelihoods are products of
    smoothed count ratios in a pinned left-assoc multiply order:
    IEEE-exact doubles, bit-identical cross-engine, round(6) only
    at the posterior output."""
    mv = _ds_mv_frame(spark, sf_dir)
    gw, pw = _ds_model_frames(spark, mv)

    scored = mv.crossJoin(F.broadcast(pw))
    for r in range(_DS_R):
        scored = scored.join(
            F.broadcast(
                gw.where(F.col("rater") == r).select(
                    F.col("obs").alias(f"obs{r}"),
                    *[F.col(f"g_{c}").alias(f"g{r}_{c}") for c in _DS_CATS],
                )
            ),
            f"obs{r}",
        )

    def _score(c: str):
        expr = F.col(f"pi_{c}")
        for r in range(_DS_R):
            expr = expr * F.col(f"g{r}_{c}")
        return expr

    s_high, s_low, s_mid = _score("high"), _score("low"), _score("mid")
    ds_label = (
        F.when((s_high >= s_low) & (s_high >= s_mid), "high")
        .when(s_low >= s_mid, "low")
        .otherwise("mid")
    )
    labeled = scored.select(
        "doc_id",
        "mv_label",
        ds_label.alias("ds_label"),
        s_high.alias("s_high"),
        s_low.alias("s_low"),
        s_mid.alias("s_mid"),
    )
    best = (
        F.when(F.col("ds_label") == "high", F.col("s_high"))
        .when(F.col("ds_label") == "low", F.col("s_low"))
        .otherwise(F.col("s_mid"))
    )
    return labeled.select(
        "doc_id",
        "mv_label",
        "ds_label",
        (F.col("ds_label") != F.col("mv_label")).alias("changed"),
        F.round(
            best / ((F.col("s_high") + F.col("s_low")) + F.col("s_mid")), 6
        ).alias("ds_posterior"),
    )


data_dawid_skene.__doc__ = data_dawid_skene.__doc__.format(
    w=_DS_WIDTHS, r=_DS_R
)


def _ds_mv_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc observed rater labels + majority-vote init label —
    pure scan projection (Spark twin of the obs/mv CTEs)."""
    docs = _docs(spark, sf_dir)
    n = _ts.token_count(F.col("text"))
    s = _ts.quality_logit_milli(F.col("text"))
    obs_cols = [
        _band_col(s + _noise_col(f"ds{r}", w) * n, n).alias(f"obs{r}")
        for r, w in enumerate(_DS_WIDTHS)
    ]
    obs = docs.select("doc_id", *obs_cols)

    def _cnt(cat: str):
        return sum((F.col(f"obs{r}") == cat).cast("int") for r in range(_DS_R))

    return obs.withColumn(
        "mv_label",
        F.when(
            (_cnt("high") >= _cnt("low")) & (_cnt("high") >= _cnt("mid")),
            "high",
        )
        .when(_cnt("low") >= _cnt("mid"), "low")
        .otherwise("mid"),
    )


def _ds_model_frames(spark: SparkSession, mv: DataFrame):
    """M-step twins of the conf/n_true/grid/gw/pw CTEs: (gw, pw) —
    the 45-cell smoothed confusion lookup (wide per rater x obs) and
    the 1-row smoothed priors."""
    long = mv.select(
        "mv_label",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("rater"), F.col(f"obs{r}").alias("obs")
                    )
                    for r in range(_DS_R)
                ]
            )
        ).alias("ro"),
    ).select(
        "mv_label", F.col("ro.rater").alias("rater"), F.col("ro.obs").alias("obs")
    )
    conf = (
        long.groupBy("rater", F.col("mv_label").alias("true_cat"), "obs")
        .agg(F.count(F.lit(1)).alias("n"))
        # <= 45 rows; checkpointed so the three dictionary consumers
        # (n_true, grid, acc/gw) don't each re-inline the corpus scan
        .localCheckpoint()
    )

    cat_arr = F.array(*[F.lit(c) for c in _DS_CATS])
    cats = spark.range(1).select(F.explode(cat_arr).alias("cat"))
    n_true = (
        cats.join(
            F.broadcast(conf.where(F.col("rater") == 0)).select(
                F.col("true_cat").alias("cat"), "n"
            ),
            "cat",
            "left",
        )
        .groupBy(F.col("cat").alias("true_cat"))
        .agg(F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_t"))
    )
    ntot = n_true.agg(F.sum("n_t").cast("long").alias("n_docs"))
    raters = spark.range(_DS_R).select(F.col("id").cast("int").alias("rater"))
    grid = _ds_grid_frame(raters, cats, n_true, conf)
    gw = grid.groupBy("rater", "obs").agg(
        *[
            F.max(F.when(F.col("true_cat") == c, F.col("p"))).alias(f"g_{c}")
            for c in _DS_CATS
        ]
    )
    pw = (
        n_true.crossJoin(ntot)
        .select(
            "true_cat",
            (
                (F.col("n_t").cast("double") + 1)
                / (F.col("n_docs").cast("double") + 3)
            ).alias("pi"),
        )
        .agg(
            *[
                F.max(F.when(F.col("true_cat") == c, F.col("pi"))).alias(
                    f"pi_{c}"
                )
                for c in _DS_CATS
            ]
        )
    )
    return gw, pw


def _ds_grid_frame(
    raters: DataFrame, cats: DataFrame, n_true: DataFrame, conf: DataFrame
) -> DataFrame:
    """The full rater x true x obs grid with add-1-smoothed
    P(obs | true) — missing cells materialized with n=0 so smoothing
    covers never-observed combinations."""
    return (
        raters.crossJoin(n_true)
        .crossJoin(cats.select(F.col("cat").alias("obs")))
        .join(F.broadcast(conf), ["rater", "true_cat", "obs"], "left")
        .select(
            "rater",
            "true_cat",
            "obs",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
            "n_t",
            (
                (F.coalesce(F.col("n"), F.lit(0)).cast("double") + 1)
                / (F.col("n_t").cast("double") + 3)
            ).alias("p"),
        )
    )


@register(
    "data_rater_quality",
    oracle=f"""
    WITH {_ds_ctes()},
    acc AS (
      SELECT rater,
        CAST(sum(CASE WHEN true_cat = obs THEN n ELSE 0 END) AS DOUBLE)
          / (SELECT n_docs FROM ntot) AS rater_accuracy
      FROM grid GROUP BY rater
    )
    SELECT g.rater, g.true_cat AS true_label, g.obs AS obs_label,
      g.n AS n, round(g.p, 6) AS p_obs_given_true,
      round(a.rater_accuracy, 6) AS rater_accuracy
    FROM grid g JOIN acc a ON g.rater = a.rater
    """,
)
def data_rater_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The annotator-audit companion to data_dawid_skene: each
    rater's estimated 3x3 confusion matrix (add-1-smoothed
    P(obs | true), counts vs the majority-vote reference labels) and
    diagonal agreement rate — the per-judge reliability report a
    labeling pipeline reviews before weighting or dropping an
    annotator. On the fixture the widths {w} separate the careful
    raters from the sloppy tail (est. accuracy of rater r exceeds
    rater r+2 at both test SFs, pytest-asserted; ADJACENT raters can
    swap — the estimate is vs the MV reference, not vs gold, which
    is exactly the caveat a real audit carries).

    Scale shape: identical to the DS M-step — one map-side-combined
    45-group count over the rating stream, then pure dictionary
    arithmetic; the output is 45 rows at any corpus size."""
    mv = _ds_mv_frame(spark, sf_dir)
    long = mv.select(
        "mv_label",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("rater"), F.col(f"obs{r}").alias("obs")
                    )
                    for r in range(_DS_R)
                ]
            )
        ).alias("ro"),
    ).select(
        "mv_label", F.col("ro.rater").alias("rater"), F.col("ro.obs").alias("obs")
    )
    conf = (
        long.groupBy("rater", F.col("mv_label").alias("true_cat"), "obs")
        .agg(F.count(F.lit(1)).alias("n"))
        # <= 45 rows; checkpointed so the three dictionary consumers
        # (n_true, grid, acc/gw) don't each re-inline the corpus scan
        .localCheckpoint()
    )
    cat_arr = F.array(*[F.lit(c) for c in _DS_CATS])
    cats = spark.range(1).select(F.explode(cat_arr).alias("cat"))
    n_true = (
        cats.join(
            F.broadcast(conf.where(F.col("rater") == 0)).select(
                F.col("true_cat").alias("cat"), "n"
            ),
            "cat",
            "left",
        )
        .groupBy(F.col("cat").alias("true_cat"))
        .agg(F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_t"))
    )
    ntot = n_true.agg(F.sum("n_t").cast("long").alias("n_docs"))
    raters = spark.range(_DS_R).select(F.col("id").cast("int").alias("rater"))
    grid = _ds_grid_frame(raters, cats, n_true, conf)
    acc = (
        grid.groupBy("rater")
        .agg(
            F.sum(
                F.when(F.col("true_cat") == F.col("obs"), F.col("n")).otherwise(
                    F.lit(0)
                )
            )
            .cast("double")
            .alias("diag")
        )
        .crossJoin(F.broadcast(ntot))
        .select(
            "rater",
            (F.col("diag") / F.col("n_docs").cast("double")).alias(
                "rater_accuracy"
            ),
        )
    )
    return grid.join(F.broadcast(acc), "rater").select(
        "rater",
        F.col("true_cat").alias("true_label"),
        F.col("obs").alias("obs_label"),
        "n",
        F.round("p", 6).alias("p_obs_given_true"),
        F.round("rater_accuracy", 6).alias("rater_accuracy"),
    )


data_rater_quality.__doc__ = data_rater_quality.__doc__.format(w=_DS_WIDTHS)


# ---------------------------------------------------------------------------
# Uncertainty sampling (margin-based active learning)
# ---------------------------------------------------------------------------

_UNC_K = 20


@register(
    "data_uncertainty_sample",
    oracle=f"""
    WITH {_NB_SCORE_CTES},
    ranked AS (
      SELECT doc_id, gold, lang, round(score, 6) AS rscore,
        row_number() OVER (
          PARTITION BY doc_id ORDER BY round(score, 6) DESC, lang) AS rn
      FROM scores
    ),
    margins AS (
      SELECT r1.doc_id, r1.gold, r1.lang AS pred,
        r1.rscore - r2.rscore AS margin
      FROM ranked r1 JOIN ranked r2
        ON r1.doc_id = r2.doc_id AND r2.rn = 2
      WHERE r1.rn = 1
    ),
    top AS (SELECT * FROM margins ORDER BY margin ASC, doc_id ASC
            LIMIT {_UNC_K})
    SELECT CAST(row_number() OVER (ORDER BY margin ASC, doc_id ASC)
                AS BIGINT) AS sample_rank,
      doc_id, gold, pred, round(margin, 6) AS margin
    FROM top
    """,
)
def data_uncertainty_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based uncertainty sampling (Lewis & Gale 1994; the
    active-learning default): the {k} held-out documents where the
    trained NB classifier is LEAST sure — smallest margin between
    the top-2 per-doc log-likelihoods — are the ones to send for
    labeling next. This closes the repo's labeling loop:
    data_uncertainty_sample picks the batch, the Fleiss-kappa /
    Dawid-Skene pair aggregates the raters' answers, and
    data_rater_quality audits the raters — the human-in-the-loop
    cycle every classifier-curated corpus runs. Margins are
    differences of ROUNDED scores (the text_nb_langid argmax
    discipline: cross-engine FP-sum jitter in the ln-sum scores
    cannot flip a rounded comparison), ordered margin-asc with
    doc-id tiebreak.

    Scale shape: identical to text_nb_langid through the scores
    stage (dictionary-sized model, token-keyed scoring join, per-doc
    windows over |langs| rows); the rank-1/rank-2 self-join runs on
    the per-doc ranked table (2 rows per doc survive the filter) and
    the final top-{k} is orderBy().limit() — TakeOrderedAndProject,
    never a global sort."""
    scores = _nb_scores(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy(
        F.desc(F.round("score", 6)), F.asc("lang")
    )
    ranked = scores.select(
        "doc_id",
        "gold",
        "lang",
        F.round("score", 6).alias("rscore"),
        F.row_number().over(w).alias("rn"),
    ).where(F.col("rn") <= 2)
    r1 = ranked.where(F.col("rn") == 1).select(
        "doc_id", "gold", F.col("lang").alias("pred"), F.col("rscore").alias("s1")
    )
    r2 = ranked.where(F.col("rn") == 2).select(
        "doc_id", F.col("rscore").alias("s2")
    )
    margins = r1.join(r2, "doc_id").select(
        "doc_id", "gold", "pred", (F.col("s1") - F.col("s2")).alias("margin")
    )
    top = margins.orderBy(F.col("margin").asc(), F.col("doc_id").asc()).limit(
        _UNC_K
    )
    rk = F.row_number().over(
        Window.orderBy(F.col("margin").asc(), F.col("doc_id").asc())
    )
    return top.select(
        rk.cast("long").alias("sample_rank"),
        "doc_id",
        "gold",
        "pred",
        F.round("margin", 6).alias("margin"),
    )


data_uncertainty_sample.__doc__ = data_uncertainty_sample.__doc__.format(
    k=_UNC_K
)


# ---------------------------------------------------------------------------
# Platt scaling (logistic calibration, unrolled Newton)
# ---------------------------------------------------------------------------

_PLATT_ITERS = 4

# per-doc (score, label): score = mean milli-logit / 1000 (in ~[-1,1]),
# label = the text_quality_auc gold (sign of the jittered score) —
# correlated but noisy, so the calibrated slope is finite.
_PLATT_BASE_SQL = f"""
      SELECT CAST({_S_SQL} AS DOUBLE) / {_N_SQL} / 1000.0 AS s,
        CASE WHEN {_S_SQL} + {_noise_sql('gold', _AUC_NOISE)} * {_N_SQL} >= 0
          THEN 1.0 ELSE 0.0 END AS y
      FROM documents
"""


def _platt_sql() -> str:
    parts = [f"base AS MATERIALIZED ({_PLATT_BASE_SQL})",
             "p0 AS (SELECT 1.0 AS a, 0.0 AS b)"]
    for i in range(1, _PLATT_ITERS + 1):
        parts.append(
            f"""g{i} AS (
      SELECT p.a, p.b,
        sum((1.0 / (1.0 + exp(-(p.a * s + p.b))) - y) * s) AS ga,
        sum(1.0 / (1.0 + exp(-(p.a * s + p.b))) - y) AS gb,
        sum((1.0 / (1.0 + exp(-(p.a * s + p.b))))
            * (1.0 - 1.0 / (1.0 + exp(-(p.a * s + p.b)))) * s * s) AS haa,
        sum((1.0 / (1.0 + exp(-(p.a * s + p.b))))
            * (1.0 - 1.0 / (1.0 + exp(-(p.a * s + p.b)))) * s) AS hab,
        sum((1.0 / (1.0 + exp(-(p.a * s + p.b))))
            * (1.0 - 1.0 / (1.0 + exp(-(p.a * s + p.b))))) AS hbb
      FROM base CROSS JOIN p{i - 1} p GROUP BY p.a, p.b
    )""")
        parts.append(
            f"""p{i} AS (
      SELECT
        round(a - (hbb * ga - hab * gb) / (haa * hbb - hab * hab), 6) AS a,
        round(b - (haa * gb - hab * ga) / (haa * hbb - hab * hab), 6) AS b
      FROM g{i}
    )""")
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f""",
    nll AS (
      SELECT
        CAST(count(*) AS BIGINT) AS n_docs,
        sum(ln(1.0 + exp(-(2.0 * y - 1.0) * (1.0 * s + 0.0)))) AS nll_u,
        sum(ln(1.0 + exp(-(2.0 * y - 1.0) * (p.a * s + p.b)))) AS nll_c
      FROM base CROSS JOIN p{_PLATT_ITERS} p
      GROUP BY p.a, p.b
    )
    SELECT n.n_docs, p.a, p.b,
      round(n.nll_u / n.n_docs, 6) AS nll_uncalibrated,
      round(n.nll_c / n.n_docs, 6) AS nll_calibrated,
      n.nll_c < n.nll_u AS improved
    FROM nll n CROSS JOIN p{_PLATT_ITERS} p"""
    )


@register("text_platt_scaling", oracle=_platt_sql())
def text_platt_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Platt scaling (Platt 1999): fit p = sigmoid(a*s + b) to the
    gold quality labels by {it} unrolled Newton-Raphson steps from
    (a, b) = (1, 0) — the CALIBRATION FIX the diagnostic family
    (text_quality_ece reports the miscalibration; this repairs it)
    applies before a classifier score is used as a sampling weight
    or a threshold: after Platt, "p = 0.8" means 80% — pytest and
    the `improved` column assert the mean log-loss strictly drops
    vs the uncalibrated sigmoid.

    The iterative-fit discipline: each Newton step is ONE
    map-side-combined aggregation over the corpus (five sufficient
    sums: gradient and 2x2 Hessian entries), the update is a 1-row
    projection, and the parameters are ROUNDED to 6dp per iteration
    — the pagerank-family convention that pins the iterate against
    cross-engine float-sum jitter. The 2x2 solve is written in one
    pinned expression order (closed-form inverse, shared
    determinant). {it} steps from a sane init converge to ~1e-6 on
    a 1-D logistic — more steps only churn the 6th decimal.
    Corpus cost: {it}+1 scans ({it} Newton sums + the final NLL
    report); the per-doc (s, y) projection is all-integer until the
    final divisions."""
    docs = _docs(spark, sf_dir)
    n = _ts.token_count(F.col("text"))
    s_sum = _ts.quality_logit_milli(F.col("text"))
    base = docs.select(
        (s_sum.cast("double") / n / 1000.0).alias("s"),
        F.when(
            s_sum + _noise_col("gold", _AUC_NOISE) * n >= 0, F.lit(1.0)
        )
        .otherwise(F.lit(0.0))
        .alias("y"),
    )
    params = spark.range(1).select(
        F.lit(1.0).alias("a"), F.lit(0.0).alias("b")
    )
    for _ in range(_PLATT_ITERS):
        j = base.crossJoin(F.broadcast(params))
        p = 1.0 / (1.0 + F.exp(-(F.col("a") * F.col("s") + F.col("b"))))
        w = p * (1.0 - p)
        g = j.groupBy("a", "b").agg(
            F.sum((p - F.col("y")) * F.col("s")).alias("ga"),
            F.sum(p - F.col("y")).alias("gb"),
            F.sum(w * F.col("s") * F.col("s")).alias("haa"),
            F.sum(w * F.col("s")).alias("hab"),
            F.sum(w).alias("hbb"),
        )
        det = F.col("haa") * F.col("hbb") - F.col("hab") * F.col("hab")
        params = g.select(
            F.round(
                F.col("a")
                - (F.col("hbb") * F.col("ga") - F.col("hab") * F.col("gb")) / det,
                6,
            ).alias("a"),
            F.round(
                F.col("b")
                - (F.col("haa") * F.col("gb") - F.col("hab") * F.col("ga")) / det,
                6,
            ).alias("b"),
        ).localCheckpoint()
    j = base.crossJoin(F.broadcast(params))
    t = (2.0 * F.col("y") - 1.0)
    nll = j.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.log(1.0 + F.exp(-t * (1.0 * F.col("s") + 0.0)))).alias("nll_u"),
        F.sum(
            F.log(1.0 + F.exp(-t * (F.col("a") * F.col("s") + F.col("b"))))
        ).alias("nll_c"),
    )
    return nll.select(
        "n_docs",
        "a",
        "b",
        F.round(F.col("nll_u") / F.col("n_docs"), 6).alias("nll_uncalibrated"),
        F.round(F.col("nll_c") / F.col("n_docs"), 6).alias("nll_calibrated"),
        (F.col("nll_c") < F.col("nll_u")).alias("improved"),
    )


text_platt_scaling.__doc__ = text_platt_scaling.__doc__.format(
    it=_PLATT_ITERS
)


# ---------------------------------------------------------------------------
# T5-style span-corruption plan + fill-in-the-middle transform
# ---------------------------------------------------------------------------

_SPAN_START_MOD = 20  # ~5% start rate x mean span 3 => ~15% masked
_SPAN_MAX_LOOKBACK = 3  # max span length 4 => a start <=3 back can cover


def _span_start_sql() -> str:
    return (
        md5_long_sql("CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR)"
                     " || '#spanstart'")
        + f" % {_SPAN_START_MOD} = 0"
    )


def _span_len_sql() -> str:
    return (
        "2 + "
        + md5_long_sql(
            "CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR)"
            " || '#spanlen'"
        )
        + " % 3"
    )


@register(
    "text_span_corruption",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
        CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INTEGER)
          AS pos,
        unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    flagged AS (
      SELECT doc_id, pos,
        CASE WHEN {_span_start_sql()} THEN 1 ELSE 0 END AS is_start,
        {_span_len_sql()} AS span_len
      FROM toks
    ),
    masked AS (
      SELECT doc_id, pos FROM (
        SELECT doc_id, pos,
          {" OR ".join(
            f"(coalesce(lag(is_start, {k}) OVER w, 0) = 1"
            f" AND coalesce(lag(span_len, {k}) OVER w, 0) > {k})"
            for k in range(_SPAN_MAX_LOOKBACK + 1)
          )} AS m
        FROM flagged
        WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
      ) WHERE m
    ),
    runs AS (
      SELECT doc_id, pos,
        pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      FROM masked
    ),
    spans AS (
      SELECT doc_id, min(pos) AS span_start, max(pos) AS span_end,
        CAST(count(*) AS BIGINT) AS n_masked
      FROM runs GROUP BY doc_id, grp
    )
    SELECT doc_id,
      CAST(row_number() OVER (PARTITION BY doc_id ORDER BY span_start)
           AS INTEGER) AS sentinel_id,
      span_start, span_end, n_masked
    FROM spans
    """,
)
def text_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption PLAN (Raffel et al. 2020): the
    deterministic mask schedule a seq2seq pretraining job applies —
    hash-selected span starts (1-in-{m} positions; expected mask
    rate ~15% at mean span 3), hash-drawn span lengths 2-4,
    OVERLAPPING spans merged into maximal masked runs, and sentinel
    ids numbered per doc in order (the <extra_id_N> sequence). The
    replayable-randomness contract matters doubly here: a resumed
    epoch must mask the SAME spans (or targets and inputs desync),
    and the oracle re-derives every draw.

    Scale shape: no join anywhere — a span start <= {lb} positions
    back covers position p iff its drawn length exceeds the offset,
    so `masked` is a fixed OR over {lb}+1 lag windows PARTITIONED by
    doc; runs collapse via the pos - row_number grouping idiom
    (also per-doc windows); output is one row per span. All hashing
    in the scan projection."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "token"),
    )
    start_h = md5_long(
        F.concat(
            F.col("doc_id").cast("string"),
            F.lit(":"),
            F.col("pos").cast("string"),
            F.lit("#spanstart"),
        )
    )
    len_h = md5_long(
        F.concat(
            F.col("doc_id").cast("string"),
            F.lit(":"),
            F.col("pos").cast("string"),
            F.lit("#spanlen"),
        )
    )
    flagged = toks.select(
        "doc_id",
        "pos",
        F.when(start_h % _SPAN_START_MOD == 0, 1).otherwise(0).alias(
            "is_start"
        ),
        (2 + len_h % 3).alias("span_len"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    m = None
    for k in range(_SPAN_MAX_LOOKBACK + 1):
        term = (
            F.coalesce(F.lag("is_start", k).over(w), F.lit(0)) == 1
        ) & (F.coalesce(F.lag("span_len", k).over(w), F.lit(0)) > k)
        m = term if m is None else (m | term)
    masked = flagged.withColumn("m", m).where(F.col("m")).select(
        "doc_id", "pos"
    )
    grp = F.col("pos") - F.row_number().over(w)
    runs = masked.withColumn("grp", grp)
    spans = runs.groupBy("doc_id", "grp").agg(
        F.min("pos").alias("span_start"),
        F.max("pos").alias("span_end"),
        F.count(F.lit(1)).cast("long").alias("n_masked"),
    )
    sid = F.row_number().over(
        Window.partitionBy("doc_id").orderBy("span_start")
    )
    return spans.select(
        "doc_id",
        sid.cast("int").alias("sentinel_id"),
        "span_start",
        "span_end",
        "n_masked",
    )


text_span_corruption.__doc__ = text_span_corruption.__doc__.format(
    m=_SPAN_START_MOD, lb=_SPAN_MAX_LOOKBACK
)


@register(
    "text_fim_transform",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS arr,
        len(string_split(text, ' ')) AS n
      FROM documents
      WHERE len(string_split(text, ' ')) >= 3
    ),
    cuts AS (
      SELECT doc_id, arr, n,
        1 + {md5_long_sql("CAST(doc_id AS VARCHAR) || '#fim1'")} % (n - 2)
          AS c1
      FROM base
    ),
    cuts2 AS (
      SELECT *, c1 + 1
        + {md5_long_sql("CAST(doc_id AS VARCHAR) || '#fim2'")} % (n - c1 - 1)
        AS c2
      FROM cuts
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
      CAST(c1 AS BIGINT) AS cut1, CAST(c2 AS BIGINT) AS cut2,
      CAST(c2 - c1 AS BIGINT) AS middle_len,
      md5('<PRE> ' || array_to_string(arr[1:c1], ' ')
          || ' <SUF> ' || array_to_string(arr[c2 + 1:n], ' ')
          || ' <MID> ' || array_to_string(arr[c1 + 1:c2], ' '))
        AS fim_md5
    FROM cuts2
    """,
)
def text_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle transform (Bavarian et al. 2022, the
    OpenAI FIM recipe): split each document at two hash-drawn token
    cuts into (prefix, middle, suffix) and re-serialize in PSM order
    — '<PRE> prefix <SUF> suffix <MID> middle' — the data transform
    that teaches a causal LM to infill. Cuts guarantee all three
    segments non-empty (c1 in [1, n-2], c2 in [c1+1, n-1]); docs
    under 3 tokens are out of frame by contract. The transformed
    text is emitted as its md5 (the byte-identical-extraction
    discipline: the hash pins every byte of the reordering without
    shipping the full string through the compare).

    Scale shape: pure scan projection — split, two hash draws, three
    array slices, one concat, one md5; ZERO shuffles (plan-asserted
    no Exchange). Replayable: a resumed epoch re-derives identical
    cuts."""
    docs = _docs(spark, sf_dir)
    arr = F.split("text", " ")
    base = docs.select("doc_id", arr.alias("arr"), F.size(arr).alias("n")).where(
        F.col("n") >= 3
    )
    h1 = md5_long(F.concat(F.col("doc_id").cast("string"), F.lit("#fim1")))
    h2 = md5_long(F.concat(F.col("doc_id").cast("string"), F.lit("#fim2")))
    cuts = base.withColumn("c1", 1 + h1 % (F.col("n") - 2))
    cuts = cuts.withColumn(
        "c2", F.col("c1") + 1 + h2 % (F.col("n") - F.col("c1") - 1)
    )
    prefix = F.array_join(F.slice("arr", F.lit(1), F.col("c1")), " ")
    middle = F.array_join(
        F.slice("arr", F.col("c1") + 1, F.col("c2") - F.col("c1")), " "
    )
    suffix = F.array_join(
        F.slice("arr", F.col("c2") + 1, F.col("n") - F.col("c2")), " "
    )
    psm = F.concat(
        F.lit("<PRE> "), prefix, F.lit(" <SUF> "), suffix,
        F.lit(" <MID> "), middle,
    )
    return cuts.select(
        "doc_id",
        F.col("n").cast("long").alias("n_tokens"),
        F.col("c1").cast("long").alias("cut1"),
        F.col("c2").cast("long").alias("cut2"),
        (F.col("c2") - F.col("c1")).cast("long").alias("middle_len"),
        F.md5(psm).alias("fim_md5"),
    )


# ---------------------------------------------------------------------------
# Population-stability-index drift between corpus halves
# ---------------------------------------------------------------------------

_PSI_BINS = 10  # fixed-width bins over the mean milli-logit [-1000, 1000]


@register(
    "data_psi_drift",
    oracle=f"""
    WITH scored AS (
      SELECT least({_PSI_BINS - 1},
        ({_S_SQL} + 1000 * {_N_SQL}) // (200 * {_N_SQL})) AS bin,
        {md5_long_sql("CAST(doc_id AS VARCHAR) || '#psi'")} % 2 = 0 AS in_a
      FROM documents
    ),
    cells AS (
      SELECT bin,
        sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS ca,
        sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS cb
      FROM scored GROUP BY bin
    ),
    grid AS (
      SELECT b.bin, CAST(coalesce(c.ca, 0) AS BIGINT) AS n_a,
        CAST(coalesce(c.cb, 0) AS BIGINT) AS n_b
      FROM (SELECT unnest(generate_series(0, {_PSI_BINS - 1})) AS bin) b
      LEFT JOIN cells c ON b.bin = c.bin
    ),
    tot AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb FROM grid),
    probs AS (
      SELECT g.bin, g.n_a, g.n_b,
        (CAST(g.n_a AS DOUBLE) + 0.5) / (t.ta + {_PSI_BINS * 0.5}) AS p,
        (CAST(g.n_b AS DOUBLE) + 0.5) / (t.tb + {_PSI_BINS * 0.5}) AS q
      FROM grid g CROSS JOIN tot t
    ),
    contribs AS (
      SELECT bin, n_a, n_b, p, q, (p - q) * ln(p / q) AS contrib
      FROM probs
    )
    SELECT CAST(bin AS INTEGER) AS bin, n_a, n_b,
      round(p, 6) AS p, round(q, 6) AS q,
      round(contrib, 6) AS psi_contrib,
      round(sum(contrib) OVER (), 6) AS psi_total,
      sum(contrib) OVER () < 0.1 AS stable
    FROM contribs
    """,
)
def data_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two hash halves of the
    corpus over the quality-score distribution — the model-
    monitoring drift metric (PSI < 0.1 stable, 0.1-0.25 watch,
    > 0.25 act) every scoring pipeline tracks between a reference
    window and production. Here the halves are a hash A/A split, so
    the pytest contract is CALIBRATION: PSI must land well under the
    0.1 action threshold — the same harness pointed at two real
    crawl snapshots is the drift monitor. Complements
    ev_cusum_drift (sequential, mean-level) and text_domain_kld
    (token distribution) with the score-HISTOGRAM form the risk/ML
    monitoring world standardizes on.

    Scale shape: binning is all-integer in the scan projection —
    bin = (S + 1000n) // (200n) (integer division, no float
    boundary), {b} fixed-width bins over the mean milli-logit; ONE
    map-side-combined (bin, half) count agg is the only corpus
    shuffle; the grid join, smoothing (+0.5/bin), and the PSI sum
    run over the {b}-row bin dictionary. Both engines share the
    identical smoothed-ratio expression; ln over pinned ratios."""
    docs = _docs(spark, sf_dir)
    n = _ts.token_count(F.col("text"))
    s = _ts.quality_logit_milli(F.col("text"))
    bin_col = F.least(
        F.lit(_PSI_BINS - 1),
        F.expr(
            "(s_sum + 1000 * n_tok) div (200 * n_tok)"
        ),
    )
    scored = docs.select(
        s.alias("s_sum"), n.alias("n_tok"),
        (md5_long(F.concat(F.col("doc_id").cast("string"), F.lit("#psi"))) % 2 == 0).alias("in_a"),
    ).select(bin_col.alias("bin"), "in_a")
    cells = scored.groupBy("bin").agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("in_a"), 0).otherwise(1)).alias("cb"),
    )
    bins = spark.range(_PSI_BINS).select(F.col("id").alias("bin"))
    grid = (
        bins.join(F.broadcast(cells), "bin", "left")
        .select(
            "bin",
            F.coalesce(F.col("ca"), F.lit(0)).cast("long").alias("n_a"),
            F.coalesce(F.col("cb"), F.lit(0)).cast("long").alias("n_b"),
        )
        .localCheckpoint()  # bin dictionary; feeds totals + probs
    )
    tot = grid.agg(F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb"))
    half = _PSI_BINS * 0.5
    p = (F.col("n_a").cast("double") + 0.5) / (F.col("ta") + half)
    q = (F.col("n_b").cast("double") + 0.5) / (F.col("tb") + half)
    contribs = grid.crossJoin(F.broadcast(tot)).select(
        "bin", "n_a", "n_b", p.alias("p"), q.alias("q"),
        ((p - q) * F.log(p / q)).alias("contrib"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy()
    psi = F.sum("contrib").over(w)
    return contribs.select(
        F.col("bin").cast("int").alias("bin"),
        "n_a",
        "n_b",
        F.round("p", 6).alias("p"),
        F.round("q", 6).alias("q"),
        F.round("contrib", 6).alias("psi_contrib"),
        F.round(psi, 6).alias("psi_total"),
        (psi < 0.1).alias("stable"),
    )


# ---------------------------------------------------------------------------
# Term burstiness (Church-Gale) over the vocabulary
# ---------------------------------------------------------------------------

_BURST_TOP = 50


@register(
    "text_term_burstiness",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    stats AS (
      SELECT token, CAST(count(*) AS BIGINT) AS cf,
        CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM toks GROUP BY token
    ),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    scored AS (
      SELECT s.token, s.cf, s.df,
        CAST(s.cf AS DOUBLE) / s.df AS burstiness,
        nd.n * (1.0 - exp(-(CAST(s.cf AS DOUBLE) / nd.n))) AS expected_df
      FROM stats s CROSS JOIN nd
    ),
    top AS (
      SELECT * FROM scored
      ORDER BY round(burstiness, 6) DESC, token ASC LIMIT {_BURST_TOP}
    )
    SELECT token, cf, df, round(burstiness, 6) AS burstiness,
      round(expected_df, 6) AS expected_df,
      df < 0.8 * expected_df AS is_bursty
    FROM top
    """,
)
def text_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness (Church & Gale 1995): cf/df — how many times
    a term repeats within the documents it touches — against the
    Poisson-expected document frequency N(1 - exp(-cf/N)). Terms
    whose observed df falls well below the Poisson prediction are
    BURSTY (topical: they pile into few documents — names, topic
    words, boilerplate runs) rather than functional (spread evenly
    — stopwords); the signal keyword extraction, stopword induction,
    and repetition-spam triage all key on, and the term-level
    complement to text_ttr (doc-level) and text_repetition
    (n-gram-level). Top-{k} by burstiness with the rounded-score /
    token tiebreak.

    Scale shape: ONE map-side-combined (token, cf, df) agg over the
    token stream; the Poisson comparison is a projection against
    the 1-row corpus-count dim; top-{k} = orderBy().limit() —
    TakeOrderedAndProject over the vocabulary, never a global
    vocabulary sort window (the round-3 VERDICT antipattern)."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    stats = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("cf"),
        F.countDistinct("doc_id").cast("long").alias("df"),
    )
    nd = docs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    burst = F.col("cf").cast("double") / F.col("df")
    expected = F.col("n") * (
        1.0 - F.exp(-(F.col("cf").cast("double") / F.col("n")))
    )
    scored = stats.crossJoin(F.broadcast(nd)).select(
        "token",
        "cf",
        "df",
        burst.alias("burstiness"),
        expected.alias("expected_df"),
    )
    top = scored.orderBy(
        F.round(F.col("burstiness"), 6).desc(), F.col("token").asc()
    ).limit(_BURST_TOP)
    return top.select(
        "token",
        "cf",
        "df",
        F.round("burstiness", 6).alias("burstiness"),
        F.round("expected_df", 6).alias("expected_df"),
        (F.col("df") < 0.8 * F.col("expected_df")).alias("is_bursty"),
    )


text_term_burstiness.__doc__ = text_term_burstiness.__doc__.format(
    k=_BURST_TOP
)


# ---------------------------------------------------------------------------
# Slice finder (worst-performing evaluation slices)
# ---------------------------------------------------------------------------

_SLICE_LEN = 100  # tokens; short vs long band boundary


@register(
    "data_slice_finder",
    oracle=f"""
    WITH {_NB_SCORE_CTES},
    pred AS (
      SELECT doc_id, gold, lang AS pred FROM (
        SELECT *, row_number() OVER (
          PARTITION BY doc_id ORDER BY round(score, 6) DESC, lang) AS rn
        FROM scores) WHERE rn = 1
    ),
    banded AS (
      SELECT p.doc_id, p.gold, p.pred,
        CASE WHEN len(string_split(d.text, ' ')) < {_SLICE_LEN}
          THEN 'short' ELSE 'long' END AS len_band
      FROM pred p JOIN documents d ON p.doc_id = d.doc_id
    ),
    overall AS (
      SELECT CAST(count(*) AS BIGINT) AS n_all,
        CAST(sum(CASE WHEN pred = gold THEN 1 ELSE 0 END) AS BIGINT)
          AS c_all
      FROM banded
    ),
    slices AS (
      SELECT gold AS lang, len_band,
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CASE WHEN pred = gold THEN 1 ELSE 0 END) AS BIGINT)
          AS n_correct
      FROM banded GROUP BY 1, 2
    )
    SELECT s.lang, s.len_band, s.n, s.n_correct,
      round(CAST(s.n_correct AS DOUBLE) / s.n, 6) AS accuracy,
      round(CAST(o.c_all AS DOUBLE) / o.n_all, 6) AS overall_accuracy,
      round((CAST(s.n_correct AS DOUBLE) / s.n
             - CAST(o.c_all AS DOUBLE) / o.n_all)
            / sqrt((CAST(o.c_all AS DOUBLE) / o.n_all)
                   * (1.0 - CAST(o.c_all AS DOUBLE) / o.n_all) / s.n), 6)
        AS z_score,
      (CAST(s.n_correct AS DOUBLE) / s.n
       - CAST(o.c_all AS DOUBLE) / o.n_all)
      / sqrt((CAST(o.c_all AS DOUBLE) / o.n_all)
             * (1.0 - CAST(o.c_all AS DOUBLE) / o.n_all) / s.n) < -1.96
        AS underperforms
    FROM slices s CROSS JOIN overall o
    """,
)
def data_slice_finder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SliceFinder-lite (Chung et al., ICDE 2019 shape): per
    evaluation SLICE — (gold language x length band) — the trained
    NB classifier's accuracy, the overall accuracy, and a one-sample
    z-score of the slice against the overall rate; slices with
    z < -1.96 are flagged as UNDERPERFORMING. The aggregate-accuracy
    number text_nb_langid reports hides exactly this: a model can be
    90% overall and 50% on short Chinese docs, and the slice report
    is what decides targeted data collection (with
    data_uncertainty_sample picking the specific documents).

    Scale shape: rides the shared _nb_scores pipeline to per-doc
    predictions (dictionary model, token-keyed join, per-doc
    windows); banding is one keyed join back to the doc table; the
    slice and overall aggregates are two map-side-combined counts;
    the z arithmetic is per-slice projection against the 1-row
    overall dim."""
    scores = _nb_scores(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy(
        F.desc(F.round("score", 6)), F.asc("lang")
    )
    pred = (
        scores.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "gold", F.col("lang").alias("pred"))
    )
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.when(F.size(F.split("text", " ")) < _SLICE_LEN, "short")
        .otherwise("long")
        .alias("len_band"),
    )
    banded = pred.join(docs, "doc_id").localCheckpoint()
    overall = banded.agg(
        F.count(F.lit(1)).cast("long").alias("n_all"),
        F.sum((F.col("pred") == F.col("gold")).cast("int"))
        .cast("long")
        .alias("c_all"),
    )
    slices = banded.groupBy(
        F.col("gold").alias("lang"), "len_band"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("pred") == F.col("gold")).cast("int"))
        .cast("long")
        .alias("n_correct"),
    )
    acc_all = F.col("c_all").cast("double") / F.col("n_all")
    acc_s = F.col("n_correct").cast("double") / F.col("n")
    z = (acc_s - acc_all) / F.sqrt(acc_all * (1.0 - acc_all) / F.col("n"))
    return slices.crossJoin(F.broadcast(overall)).select(
        "lang",
        "len_band",
        "n",
        "n_correct",
        F.round(acc_s, 6).alias("accuracy"),
        F.round(acc_all, 6).alias("overall_accuracy"),
        F.round(z, 6).alias("z_score"),
        (z < -1.96).alias("underperforms"),
    )


# ---------------------------------------------------------------------------
# Code-vs-prose gate (with planted code docs)
# ---------------------------------------------------------------------------

# Deterministic code plant (the NB marker-injection convention):
# every doc_id % 11 == 7 page gets a code-looking tail, so the gate
# has true positives to find and the pytest contract is exact.
_CODE_TAIL = " def f ( x ) : return { x } ; import sys // x == y != z"
_CODE_KEYWORDS = "('def', 'return', 'import', 'function', 'var')"
_CODE_SYMBOL_RE = "[{}();=<>:/]"


@register(
    "text_code_gate",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
        text || CASE WHEN doc_id % 11 = 7 THEN '{_CODE_TAIL}' ELSE '' END
          AS t
      FROM documents
    ),
    feat AS (
      SELECT doc_id,
        CAST(length(t) AS BIGINT) AS n_chars,
        CAST(length(t) - length(regexp_replace(t, '{_CODE_SYMBOL_RE}', '',
          'g')) AS BIGINT) AS symbol_chars,
        CAST(len(list_filter(string_split(t, ' '),
          x -> x IN {_CODE_KEYWORDS})) AS BIGINT) AS kw_hits
      FROM aug
    )
    SELECT doc_id, n_chars, symbol_chars,
      round(CAST(symbol_chars AS DOUBLE) / n_chars, 6) AS symbol_ratio,
      kw_hits,
      (kw_hits >= 2 OR CAST(symbol_chars AS DOUBLE) / n_chars > 0.02)
        AS is_code
    FROM feat
    """,
)
def text_code_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose gate — the router every mixed crawl needs
    before language-specific curation (prose gates like repetition/
    perplexity MIS-SCORE code, and code deduplication wants
    different shingling): per doc, the structural-symbol character
    ratio and programming-keyword hits, flagged is_code at
    kw_hits >= 2 OR symbol_ratio > 2%. The fixture plants a
    code-looking tail on every doc_id %% 11 == 7 page (the NB
    marker-injection convention) so the gate has exact true
    positives — pytest asserts the flag set IS the planted set, zero
    false positives on the prose remainder.

    Scale shape: pure scan projection — one regexp_replace length
    diff (native, whole-stage codegen) and one token filter count;
    ZERO shuffles (plan-asserted no Exchange); per-doc output."""
    docs = _docs(spark, sf_dir)
    t = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 11 == 7, F.lit(_CODE_TAIL)).otherwise(
            F.lit("")
        ),
    )
    kws = ["def", "return", "import", "function", "var"]
    feat = docs.select(
        "doc_id",
        F.length(t).cast("long").alias("n_chars"),
        (
            F.length(t)
            - F.length(F.regexp_replace(t, _CODE_SYMBOL_RE, ""))
        )
        .cast("long")
        .alias("symbol_chars"),
        F.size(
            F.filter(
                F.split(t, " "),
                lambda x: x.isin(*kws),
            )
        )
        .cast("long")
        .alias("kw_hits"),
    )
    ratio = F.col("symbol_chars").cast("double") / F.col("n_chars")
    return feat.select(
        "doc_id",
        "n_chars",
        "symbol_chars",
        F.round(ratio, 6).alias("symbol_ratio"),
        "kw_hits",
        ((F.col("kw_hits") >= 2) | (ratio > 0.02)).alias("is_code"),
    )
