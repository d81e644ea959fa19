"""Round-4 pretraining-data operators: iterative BPE merge training,
margin-based bitext mining, point-in-time KG snapshots, extraction
quality via text-density, and skip-gram pair generation over the
walk corpus.

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


def _bpe_train_sql(rounds: int = _BPE_ROUNDS) -> str:
    """Unrolled merge-training CTEs (DuckDB twin of text_bpe_train).
    Each w{r} is MATERIALIZED: referenced by both p{r+1} and w{r+1},
    and chained re-inlining would cost O(2^rounds) expansions."""
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
    final = "\n    UNION ALL ".join(
        f"SELECT CAST(merge_rank AS BIGINT) AS merge_rank, left_sym, "
        f"right_sym, left_sym || right_sym AS merged, freq FROM b{r}"
        for r in range(1, rounds + 1)
    )
    return ",\n    ".join(parts) + "\n    " + final


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
        wc = wc.withColumn(
            "seg",
            F.expr(
                f"replace(seg, '({left})({right})', '({left}{right})')"
            ),
        )
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
