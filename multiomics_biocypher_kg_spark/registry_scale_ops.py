"""Round-4 scale operators: deterministic cardinality sketches,
corpus sampling, Bloom-filter revisit gating, host boilerplate
detection, BPE pair statistics, histogram quantile sketching,
incremental crawl merging, minhash signature export, and ER
blocking-key profiling.

These are the curation-pipeline primitives a 100 TB corpus build
needs beyond the dedup/ANN families: everywhere an exact global
answer would need an unbounded sort/collect, the operator here uses
a bounded-state sketch or a fixed-cardinality histogram whose
per-partition partials combine map-side. All randomness is replaced
by cross-engine-deterministic MD5 hashing (functions.hashing), so
every operator is oracle-paired — the sketch math itself is verified
value-for-value against DuckDB, not just row counts.

Registered through the shared registry (registry.register) so the
driver window, the oracle sweep (tests/test_queries_oracle.py), and
bench all see them with zero extra wiring.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.functions.hashing import (
    R as MH_R,
    md5_long,
    md5_long_sql,
    minhash_coeffs_sql,
)
from multiomics_biocypher_kg_spark.oracle_fragments import (
    MINHASH_PAIRS_CTES,
    VOCAB_SQL,
    _SNAPS_SQL,
)
from multiomics_biocypher_kg_spark.registry import _pipeline, register

# ---------------------------------------------------------------------------
# shared synthesis fragments (snapshot-family host, as in web_snapshot_diff)
# ---------------------------------------------------------------------------

_FAM_HOST_SQL = (
    "CASE WHEN doc_id % 125 % 10 < 3 THEN 'hot.example.com' "
    "ELSE 'h' || CAST(doc_id % 125 % 50 AS VARCHAR) || '.example.org' END"
)


def _fam_host_col():
    fam = F.col("doc_id") % 125
    return F.when(fam % 10 < 3, F.lit("hot.example.com")).otherwise(
        F.concat(F.lit("h"), (fam % 50).cast("string"), F.lit(".example.org"))
    )


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# Deterministic distinct-count sketch per host (HLL-family)
# ---------------------------------------------------------------------------

_CARD_TRIALS = 32

_CARD_MINS_SQL = ", ".join(
    "min(" + md5_long_sql("text || '#c%d'" % k) + " %% %d) AS m%d" % (MH_R, k)
    for k in range(_CARD_TRIALS)
)
_CARD_SUM_SQL = " + ".join("m%d" % k for k in range(_CARD_TRIALS))
# sum of K independent minimums of n uniforms ~ Gamma(K, 1/(n+1)), so
# (K-1)/sum is the UNBIASED estimator of n+1 (the KMV/Beyer et al.
# correction applied to the independent-mins sketch)
_CARD_EST_SQL = (
    f"{_CARD_TRIALS - 1}.0 * {MH_R} / greatest({_CARD_SUM_SQL}, 1) - 1"
)


@register(
    "text_hll_host_cardinality",
    oracle=f"""
    WITH hosts AS (
      SELECT {_FAM_HOST_SQL} AS host, text FROM documents
    ),
    mins AS (
      SELECT host, count(DISTINCT text) AS n_exact, {_CARD_MINS_SQL}
      FROM hosts GROUP BY host
    )
    SELECT host, n_exact,
      round({_CARD_EST_SQL}, 6) AS n_est,
      round(abs({_CARD_EST_SQL} - n_exact) / n_exact, 6) AS rel_err
    FROM mins
    """,
)
def text_hll_host_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host distinct-content estimate via a deterministic
    HLL-family sketch: 32 independent minimum-of-hash trials, with
    the unbiased (K-1)/sum-of-mins estimator (sum of K mins of n
    uniforms ~ Gamma(K, 1/(n+1)) — the KMV correction), hashes from
    salted MD5 so both engines compute bit-identical registers. The
    sketch state is 32 longs per host regardless of
    corpus size, min() combines map-side, and no distinct-set is
    ever materialized — exactly what per-host cardinality monitoring
    runs at 10^12 docs, where count(DISTINCT) per hot host is its
    own shuffle. n_exact rides along (cheap at test scale) so the
    oracle gates BOTH values and rel_err is an honest, pinned
    accuracy figure."""
    base = _docs(spark, sf_dir).select(_fam_host_col().alias("host"), "text")
    mins = [
        F.min(
            md5_long(F.concat(F.col("text"), F.lit(f"#c{k}"))) % MH_R
        ).alias(f"m{k}")
        for k in range(_CARD_TRIALS)
    ]
    g = base.groupBy("host").agg(
        F.countDistinct("text").alias("n_exact"), *mins
    )
    s = reduce(lambda a, b: a + b, [F.col(f"m{k}") for k in range(_CARD_TRIALS)])
    est = F.lit(float(_CARD_TRIALS - 1)) * MH_R / F.greatest(s, F.lit(1)) - 1
    return g.select(
        "host",
        "n_exact",
        F.round(est, 6).alias("n_est"),
        F.round(F.abs(est - F.col("n_exact")) / F.col("n_exact"), 6).alias(
            "rel_err"
        ),
    )


# ---------------------------------------------------------------------------
# Deterministic sampling (reservoir-equivalent + stratified)
# ---------------------------------------------------------------------------

_SAMPLE_K = 100


@register(
    "text_reservoir_sample",
    oracle=f"""
    WITH pri AS (
      SELECT doc_id,
        {md5_long_sql("CAST(doc_id AS VARCHAR) || '#sample'")} AS priority
      FROM documents
    ),
    top AS (SELECT * FROM pri ORDER BY priority, doc_id LIMIT {_SAMPLE_K})
    SELECT CAST(row_number() OVER (ORDER BY priority, doc_id) AS BIGINT)
      AS sample_rank, doc_id, priority
    FROM top
    """,
)
def text_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform k-sample of the corpus, reservoir-equivalent but
    deterministic and distributed: priority = MD5(doc_id), keep the
    k smallest. orderBy().limit(k) plans as TakeOrderedAndProject —
    per-partition k-heaps merged on the driver, never a global sort
    — which IS the distributed reservoir: same marginal membership
    probability as Vitter's algorithm, plus reproducibility across
    runs/engines and mergeability across splits. The rank window
    runs over the k survivors only."""
    from pyspark.sql import Window

    pri = _docs(spark, sf_dir).select(
        "doc_id",
        md5_long(
            F.concat(F.col("doc_id").cast("string"), F.lit("#sample"))
        ).alias("priority"),
    )
    top = pri.orderBy("priority", "doc_id").limit(_SAMPLE_K)
    w = Window.orderBy("priority", "doc_id")
    return top.select(
        F.row_number().over(w).cast("long").alias("sample_rank"),
        "doc_id",
        "priority",
    )


_STRAT_FRAC = 0.1


@register(
    "text_stratified_sample",
    oracle=f"""
    WITH pri AS (
      SELECT lang, doc_id,
        {md5_long_sql("CAST(doc_id AS VARCHAR) || '#strat'")} AS priority,
        count(*) OVER (PARTITION BY lang) AS lang_count
      FROM documents
    ),
    ranked AS (
      SELECT lang, doc_id, priority, lang_count,
        row_number() OVER (PARTITION BY lang ORDER BY priority, doc_id) AS rn
      FROM pri
    )
    SELECT lang, doc_id, CAST(rn AS BIGINT) AS sample_rank,
      CAST(lang_count AS BIGINT) AS lang_count
    FROM ranked WHERE rn <= ceil({_STRAT_FRAC} * lang_count)
    """,
)
def text_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportional stratified sample: ceil(10%) of each language,
    deterministic hash priority. The rank window partitions by the
    stratum (lang), so each window partition is one language's docs
    — the natural distribution key; no global ordering exists
    anywhere in the plan. The training-mix construction primitive:
    per-source/per-language quotas are this exact shape."""
    from pyspark.sql import Window

    pri = _docs(spark, sf_dir).select(
        "lang",
        "doc_id",
        md5_long(
            F.concat(F.col("doc_id").cast("string"), F.lit("#strat"))
        ).alias("priority"),
        F.count(F.lit(1))
        .over(Window.partitionBy("lang"))
        .alias("lang_count"),
    )
    w = Window.partitionBy("lang").orderBy("priority", "doc_id")
    return (
        pri.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= F.ceil(F.lit(_STRAT_FRAC) * F.col("lang_count")))
        .select(
            "lang",
            "doc_id",
            F.col("rn").cast("long").alias("sample_rank"),
            F.col("lang_count").cast("long").alias("lang_count"),
        )
    )


# ---------------------------------------------------------------------------
# Host boilerplate detection (template/chrome shingles)
# ---------------------------------------------------------------------------

_SHINGLES_HOST_SQL = f"""
  SELECT DISTINCT doc_id, {_FAM_HOST_SQL} AS host,
    arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2] AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM documents) d,
       LATERAL (SELECT unnest(generate_series(1, len(d.arr) - 2)) AS i) t
"""


@register(
    "web_boilerplate_shingles",
    oracle=f"""
    WITH sh AS ({_SHINGLES_HOST_SQL}),
    host_docs AS (
      SELECT {_FAM_HOST_SQL} AS host, count(*) AS n_docs
      FROM documents GROUP BY 1
    ),
    boiler AS (
      SELECT b.host, b.shingle
      FROM (SELECT host, shingle, count(*) AS df_h FROM sh GROUP BY 1, 2) b
      JOIN host_docs hd ON b.host = hd.host
      WHERE b.df_h >= 2 AND 5 * b.df_h >= hd.n_docs
    )
    SELECT s.doc_id, s.host, count(*) AS n_shingles,
      CAST(sum(CASE WHEN bl.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_boiler,
      round(CAST(sum(CASE WHEN bl.shingle IS NOT NULL THEN 1 ELSE 0 END)
        AS DOUBLE) / count(*), 6) AS boiler_frac
    FROM sh s LEFT JOIN boiler bl
      ON s.host = bl.host AND s.shingle = bl.shingle
    GROUP BY s.doc_id, s.host
    """,
)
def web_boilerplate_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-template boilerplate detection (the CCNet/trafilatura
    signal): a shingle occurring in >= 2 docs AND >= 20% of a host's
    pages is site chrome, not content; each doc is scored by the
    fraction of its shingles that are host-boilerplate. Two aggs
    over one shingle stream (host-shingle df, then the per-doc
    rollup after a join against the small high-df boiler set) — no
    doc-x-doc comparison anywhere, so cost is linear in corpus
    shingles at any scale. High boiler_frac docs are the templated /
    mirrored pages a curation pass down-weights before dedup even
    runs."""
    docs = _docs(spark, sf_dir)
    host = _fam_host_col()
    arr = F.split("text", " ")
    base = docs.select("doc_id", host.alias("host"), arr.alias("arr"))
    n = F.size("arr")
    sh = (
        base.where(n >= 3)
        .select(
            "doc_id",
            "host",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(arr) - 2), "
                    "i -> concat(arr[i-1], ' ', arr[i], ' ', arr[i+1]))"
                )
            ).alias("shingle"),
        )
        .distinct()
    )
    host_docs = docs.select(host.alias("host")).groupBy("host").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    boiler = (
        sh.groupBy("host", "shingle")
        .agg(F.count(F.lit(1)).alias("df_h"))
        .join(F.broadcast(host_docs), "host")
        .where((F.col("df_h") >= 2) & (5 * F.col("df_h") >= F.col("n_docs")))
        .select(
            F.col("host").alias("b_host"), F.col("shingle").alias("b_shingle")
        )
    )
    marked = sh.join(
        boiler,
        (F.col("host") == F.col("b_host"))
        & (F.col("shingle") == F.col("b_shingle")),
        "left",
    ).select(
        "doc_id",
        "host",
        F.when(F.col("b_shingle").isNotNull(), 1).otherwise(0).alias("is_b"),
    )
    return marked.groupBy("doc_id", "host").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum("is_b").cast("long").alias("n_boiler"),
        F.round(F.sum("is_b") / F.count(F.lit(1)), 6).alias("boiler_frac"),
    )


# ---------------------------------------------------------------------------
# Bloom-filter revisit gate (crawl frontier membership)
# ---------------------------------------------------------------------------

_BLOOM_M = 256  # bit-array size — small on purpose so the FP path is exercised
_BLOOM_J = 3  # hash functions


@register(
    "web_bloom_revisit",
    oracle=f"""
    WITH snaps AS ({_SNAPS_SQL}),
    all_urls AS (SELECT DISTINCT url FROM snaps),
    seen AS (SELECT DISTINCT url FROM snaps WHERE doc_id % 10 = 0),
    js AS (SELECT unnest(generate_series(0, {_BLOOM_J - 1})) AS j),
    bits AS (
      SELECT DISTINCT
        {md5_long_sql("url || '#b' || CAST(j AS VARCHAR)")} % {_BLOOM_M} AS pos
      FROM seen CROSS JOIN js
    ),
    probe AS (
      SELECT url,
        {md5_long_sql("url || '#b' || CAST(j AS VARCHAR)")} % {_BLOOM_M} AS pos
      FROM all_urls CROSS JOIN js
    ),
    hits AS (
      SELECT url, count(*) AS nhit FROM probe p JOIN bits b ON p.pos = b.pos
      GROUP BY url
    )
    SELECT u.url,
      CAST(CASE WHEN s.url IS NOT NULL THEN 1 ELSE 0 END AS INTEGER)
        AS truly_seen,
      CAST(CASE WHEN coalesce(h.nhit, 0) = {_BLOOM_J} THEN 1 ELSE 0 END
        AS INTEGER) AS maybe_seen
    FROM all_urls u
    LEFT JOIN seen s ON u.url = s.url
    LEFT JOIN hits h ON u.url = h.url
    """,
)
def web_bloom_revisit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter crawl-frontier gate: the set of already-crawled
    urls is summarized as a {_BLOOM_M}-bit filter ({_BLOOM_J} MD5-salted
    hash positions per url, bit-set = distinct positions — bounded by
    m rows however many urls were seen), and every candidate url is
    probed against the broadcast bit-set: all {_BLOOM_J} bits present
    => 'maybe seen', skip the fetch. m is deliberately tiny here so
    false positives OCCUR and the oracle pins them value-for-value —
    the truly_seen column is the ground truth the FP rate reads off.
    At 10^12 urls the filter is the only state small enough to
    broadcast to every fetcher; the same plan scales by raising m."""
    docs = _docs(spark, sf_dir).select("doc_id")
    fam = F.col("doc_id") % 125
    host = _fam_host_col()
    url = F.concat(
        F.lit("https://"), host, F.lit("/doc/"), F.lpad(fam.cast("string"), 6, "0")
    )
    snaps = docs.select("doc_id", url.alias("url"))
    all_urls = snaps.select("url").distinct()
    seen = snaps.where(F.col("doc_id") % 10 == 0).select("url").distinct()

    def positions(df):
        pos = F.array(
            *[
                md5_long(F.concat(F.col("url"), F.lit(f"#b{j}"))) % _BLOOM_M
                for j in range(_BLOOM_J)
            ]
        )
        return df.select("url", F.explode(pos).alias("pos"))

    bits = positions(seen).select("pos").distinct()
    hits = (
        positions(all_urls)
        .join(F.broadcast(bits), "pos")
        .groupBy("url")
        .agg(F.count(F.lit(1)).alias("nhit"))
    )
    return (
        all_urls.join(
            F.broadcast(seen.withColumn("s_seen", F.lit(1))), "url", "left"
        )
        .join(F.broadcast(hits), "url", "left")
        .select(
            "url",
            F.when(F.col("s_seen").isNotNull(), 1)
            .otherwise(0)
            .cast("int")
            .alias("truly_seen"),
            F.when(F.coalesce(F.col("nhit"), F.lit(0)) == _BLOOM_J, 1)
            .otherwise(0)
            .cast("int")
            .alias("maybe_seen"),
        )
    )


# ---------------------------------------------------------------------------
# BPE pair statistics (tokenizer-training precursor)
# ---------------------------------------------------------------------------

_BPE_TOP = 32


@register(
    "text_bpe_pretokenize",
    oracle=f"""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ),
    wc AS (SELECT word, count(*) AS n FROM words GROUP BY word),
    pairs AS (
      SELECT substr(word, i, 2) AS pair, sum(n) AS freq_h
      FROM wc, LATERAL (SELECT unnest(generate_series(1, length(word) - 1)) AS i) t
      GROUP BY substr(word, i, 2)
    ),
    top AS (
      SELECT pair, CAST(freq_h AS BIGINT) AS freq FROM pairs
      ORDER BY freq_h DESC, pair ASC LIMIT {_BPE_TOP}
    )
    SELECT CAST(row_number() OVER (ORDER BY freq DESC, pair ASC) AS BIGINT)
      AS rank, pair, freq
    FROM top
    """,
)
def text_bpe_pretokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first iteration of BPE tokenizer training: pretokenize to
    words (whitespace — the corpus's pretoken boundary), count each
    DISTINCT word once, then weight its adjacent character pairs by
    the word frequency. Top merge candidates come back via
    distributed TakeOrderedAndProject. The two-level shape (word
    dictionary first, pairs from the dictionary) is what makes BPE
    training feasible at corpus scale — pair counting touches the
    vocabulary (10^6-ish), never the corpus token stream (10^14)."""
    from pyspark.sql import Window

    words = _docs(spark, sf_dir).select(
        F.explode(F.split("text", " ")).alias("word")
    )
    wc = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    pairs = (
        wc.where(F.length("word") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(word) - 1), "
                    "i -> substring(word, i, 2))"
                )
            ).alias("pair"),
            "n",
        )
        .groupBy("pair")
        .agg(F.sum("n").alias("freq_h"))
    )
    top = (
        pairs.orderBy(F.desc("freq_h"), F.asc("pair"))
        .limit(_BPE_TOP)
        .select("pair", F.col("freq_h").cast("long").alias("freq"))
    )
    w = Window.orderBy(F.desc("freq"), F.asc("pair"))
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"), "pair", "freq"
    )


# ---------------------------------------------------------------------------
# KG degree distribution
# ---------------------------------------------------------------------------


def _degree_distribution_sql() -> str:
    from multiomics_biocypher_kg_spark.hetero import hetero_edges_ctes

    return f"""
    WITH {hetero_edges_ctes()},
    und AS (
      SELECT subj AS node, obj AS nb FROM edges
      UNION
      SELECT obj AS node, subj AS nb FROM edges
    ),
    deg AS (SELECT node, count(*) AS degree FROM und GROUP BY node),
    tot AS (SELECT count(*) AS n FROM deg)
    SELECT CAST(degree AS BIGINT) AS degree, count(*) AS n_entities,
      round(CAST(count(*) AS DOUBLE) / tot.n, 6) AS frac
    FROM deg CROSS JOIN tot GROUP BY degree, tot.n
    """


@register("kg_degree_distribution", oracle=_degree_distribution_sql())
def kg_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the heterogeneous KG (mention, same-as,
    hosts, links_to edges — hetero.hetero_edges_df) — the first
    KG-quality diagnostic after materialization (hub detection, the
    skew signal that decides salting). Undirected degree = distinct
    neighbors over both edge directions; the histogram groups by
    degree (a dictionary of tens of values however big the graph),
    with the node-count total as a broadcast 1-row aggregate —
    nothing here is proportional to graph size except the two
    map-side-combined aggs. (Originally computed over the co-mention
    graph, which this synthetic corpus makes complete — every entity
    at the same degree, a one-row histogram that gated nothing; the
    heterogeneous union has real variance at every scale.)"""
    from multiomics_biocypher_kg_spark.hetero import hetero_edges_df

    edges = hetero_edges_df(spark, sf_dir).select("subj", "obj")
    nbrs = edges.unionByName(
        edges.select(F.col("obj").alias("subj"), F.col("subj").alias("obj"))
    ).distinct()
    deg = nbrs.groupBy(F.col("subj").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    tot = deg.select(F.count(F.lit(1)).alias("n"))
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_entities"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("degree").cast("long").alias("degree"),
            "n_entities",
            F.round(F.col("n_entities").cast("double") / F.col("n"), 6).alias(
                "frac"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Histogram quantile sketch
# ---------------------------------------------------------------------------

_QSK_BINS = 64
_QSK_QS = [0.25, 0.5, 0.75, 0.9, 0.99]


@register(
    "text_quantile_sketch",
    oracle=f"""
    WITH x AS (SELECT len(string_split(text, ' ')) AS x FROM documents),
    st AS (SELECT min(x) AS mn, max(x) AS mx, count(*) AS n FROM x),
    binned AS (
      SELECT CAST(floor(CAST((x - mn) AS DOUBLE) * {_QSK_BINS}
        / (mx - mn + 1)) AS BIGINT) AS bin
      FROM x CROSS JOIN st
    ),
    bins AS (SELECT bin, count(*) AS cnt FROM binned GROUP BY bin),
    cum AS (SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum FROM bins),
    qs AS (
      SELECT unnest(CAST([{", ".join(str(q) for q in _QSK_QS)}] AS DOUBLE[])) AS q
    ),
    est AS (
      SELECT q, min(bin) AS bin
      FROM qs CROSS JOIN st JOIN cum ON cum.cum >= ceil(q * st.n)
      GROUP BY q
    )
    SELECT e.q, CAST(e.bin AS BIGINT) AS bin,
      round(st.mn + e.bin * CAST((st.mx - st.mn + 1) AS DOUBLE)
        / {_QSK_BINS}, 6) AS est_value
    FROM est e CROSS JOIN st
    """,
)
def text_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution quantiles from a FIXED-width histogram sketch
    (doc token counts): one min/max/count pass, one {_QSK_BINS}-bin
    count agg (map-side combined — the sketch state is {_QSK_BINS}
    longs regardless of corpus size), then quantile lookups against
    the bounded cumulative table. The exact-percentile alternative
    is a global sort; this is the shape percentile monitoring
    actually ships at 10^12 rows (t-digest/KLL are refinements of
    exactly this bounded-state idea — this histogram variant is
    deterministic, hence oracle-able value-for-value). Estimates
    resolve to the bin lower bound; error <= one bin width, pinned
    by test."""
    from pyspark.sql import Window

    x = _docs(spark, sf_dir).select(F.size(F.split("text", " ")).alias("x"))
    st = x.agg(
        F.min("x").alias("mn"), F.max("x").alias("mx"), F.count(F.lit(1)).alias("n")
    )
    binned = x.crossJoin(F.broadcast(st)).select(
        F.floor(
            (F.col("x") - F.col("mn")).cast("double")
            * _QSK_BINS
            / (F.col("mx") - F.col("mn") + 1)
        ).alias("bin")
    )
    bins = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("cnt"))
    # bounded window: <= _QSK_BINS rows by construction
    cum = bins.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.orderBy("bin").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    qs = spark.createDataFrame([(q,) for q in _QSK_QS], "q double")
    est = (
        qs.crossJoin(F.broadcast(st))
        .join(
            F.broadcast(cum),
            F.col("cum") >= F.ceil(F.col("q") * F.col("n")),
        )
        .groupBy("q")
        .agg(F.min("bin").alias("bin"))
    )
    return est.crossJoin(F.broadcast(st)).select(
        "q",
        F.col("bin").cast("long").alias("bin"),
        F.round(
            F.col("mn")
            + F.col("bin") * (F.col("mx") - F.col("mn") + 1).cast("double")
            / _QSK_BINS,
            6,
        ).alias("est_value"),
    )


# ---------------------------------------------------------------------------
# Incremental crawl merge (MERGE INTO as a query)
# ---------------------------------------------------------------------------


@register(
    "web_incremental_crawl_merge",
    oracle=f"""
    WITH current AS (
      SELECT url, max(doc_id) AS cur_id FROM ({_SNAPS_SQL})
      WHERE doc_id % 3 <> 2 GROUP BY url
    ),
    batch AS (
      -- the new crawl goes DEEPER: its url family is doc_id % 150,
      -- so families 125-149 are urls the current table has never
      -- seen (the insert path), while 0-124 overlap (update/keep)
      SELECT
        'https://' || CASE WHEN doc_id % 150 % 10 < 3 THEN 'hot.example.com'
             ELSE 'h' || CAST(doc_id % 150 % 50 AS VARCHAR) || '.example.org' END
        || '/doc/' || lpad(CAST(doc_id % 150 AS VARCHAR), 6, '0') AS url,
        max(doc_id) AS bat_id
      FROM documents WHERE doc_id % 3 = 2 GROUP BY 1
    ),
    merged AS (
      SELECT coalesce(c.url, b.url) AS url, c.cur_id, b.bat_id
      FROM current c FULL OUTER JOIN batch b ON c.url = b.url
    )
    SELECT url,
      CAST(greatest(coalesce(cur_id, -1), coalesce(bat_id, -1)) AS BIGINT)
        AS final_doc_id,
      CAST(1767225600 + greatest(coalesce(cur_id, -1), coalesce(bat_id, -1))
        AS BIGINT) AS final_ts,
      CASE WHEN cur_id IS NULL THEN 'insert'
           WHEN bat_id IS NULL OR bat_id < cur_id THEN 'keep'
           ELSE 'update' END AS action
    FROM merged
    """,
)
def web_incremental_crawl_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental crawl upsert — the MERGE INTO semantics of the
    resumable snapshot table expressed as a query: the existing
    per-url latest table full-outer-joins the new crawl batch's
    per-url latest; newer batch captures 'update', unseen urls
    'insert', everything else 'keep'. Both sides pre-aggregate to
    one row per url BEFORE the join (max is map-side combined), so
    the join is url-keyed latest-vs-latest, never snapshot-x-
    snapshot. Timestamps are derived from doc_id (strictly
    monotone), so recency ties are impossible and the merge is
    deterministic — the property the MERGE statement twin in
    operators.materialize relies on for idempotent replay."""
    docs = _docs(spark, sf_dir).select("doc_id")

    def url_for(fam):
        host = F.when(fam % 10 < 3, F.lit("hot.example.com")).otherwise(
            F.concat(F.lit("h"), (fam % 50).cast("string"), F.lit(".example.org"))
        )
        return F.concat(
            F.lit("https://"),
            host,
            F.lit("/doc/"),
            F.lpad(fam.cast("string"), 6, "0"),
        )

    current = (
        docs.where(F.col("doc_id") % 3 != 2)
        .select(url_for(F.col("doc_id") % 125).alias("url"), "doc_id")
        .groupBy("url")
        .agg(F.max("doc_id").alias("cur_id"))
    )
    # the new crawl goes deeper: url family doc_id % 150, so families
    # 125-149 exercise the insert path at every scale factor
    batch = (
        docs.where(F.col("doc_id") % 3 == 2)
        .select(url_for(F.col("doc_id") % 150).alias("url"), "doc_id")
        .groupBy("url")
        .agg(F.max("doc_id").alias("bat_id"))
    )
    merged = current.join(batch, "url", "full_outer")
    final_id = F.greatest(
        F.coalesce(F.col("cur_id"), F.lit(-1)),
        F.coalesce(F.col("bat_id"), F.lit(-1)),
    )
    return merged.select(
        "url",
        final_id.cast("long").alias("final_doc_id"),
        (F.lit(1767225600) + final_id).cast("long").alias("final_ts"),
        F.when(F.col("cur_id").isNull(), F.lit("insert"))
        .when(
            F.col("bat_id").isNull() | (F.col("bat_id") < F.col("cur_id")),
            F.lit("keep"),
        )
        .otherwise(F.lit("update"))
        .alias("action"),
    )


# ---------------------------------------------------------------------------
# MinHash signature export (reusable dedup index segment)
# ---------------------------------------------------------------------------


@register(
    "text_minhash_doc_signature",
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT doc_id AS id,
        arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2] AS shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM documents) d,
           LATERAL (SELECT unnest(generate_series(1, len(d.arr) - 2)) AS i) t
    ),
    hashed AS (SELECT id, {md5_long_sql("shingle")} % {MH_R} AS x FROM sh),
    sigs AS (
      SELECT id, h.i AS i, min((h.a * x + h.b) % {MH_R}) AS mh
      FROM hashed CROSS JOIN {minhash_coeffs_sql()} h
      GROUP BY id, h.i
    )
    SELECT id AS doc_id,
      string_agg(CAST(mh AS VARCHAR), '|' ORDER BY i) AS sig
    FROM sigs GROUP BY id
    """,
)
def text_minhash_doc_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc MinHash signature EXPORT: the 16-hash signature
    serialized per document — the persisted index segment that lets
    tomorrow's crawl batch near-dup against today's corpus without
    re-shingling it (signatures union+min-combine across corpus
    versions, the mergeability MinHash is chosen for). One wide agg
    over the shingle stream (operators.dedup.minhash_signatures —
    the same plan the LSH path uses internally), zero extra
    shuffles for the serialization."""
    from multiomics_biocypher_kg_spark.operators import dedup as dd

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    sigs = dd.minhash_signatures(dd.shingles(docs))
    n = len(
        [c for c in sigs.columns if c.startswith("mh")]
    )
    return sigs.select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            "|", *[F.col(f"mh{i}").cast("string") for i in range(n)]
        ).alias("sig"),
    )


# ---------------------------------------------------------------------------
# ER blocking-key profile
# ---------------------------------------------------------------------------

_BLOCK_PAIR_CAP = 1000


@register(
    "kg_blocking_keys",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
    keys AS (
      SELECT doc_id,
        arr[1] || '|' || CAST(CAST(floor(len(arr) / 8.0) AS BIGINT) AS VARCHAR)
          AS block_key
      FROM t
    )
    SELECT block_key, count(*) AS n_docs,
      CAST(count(*) * (count(*) - 1) / 2 AS BIGINT) AS n_pairs,
      CAST(CASE WHEN count(*) * (count(*) - 1) / 2 > {_BLOCK_PAIR_CAP}
        THEN 1 ELSE 0 END AS INTEGER) AS oversized
    FROM keys GROUP BY block_key
    """,
)
def kg_blocking_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution blocking profile: every record gets a cheap
    composite block key (leading token + length bucket); candidate
    pairs are only generated WITHIN a block, so the match cost is
    sum over blocks of n*(n-1)/2 instead of corpus². This query is
    the pre-flight report that makes blocking safe to run: per-block
    record and pair counts plus the oversized flag (the block a
    skew-aware matcher splits further or salts — same discipline as
    the co-mention fanout cap). One groupBy on the key; the key
    itself is computed in the scan projection."""
    arr = F.split("text", " ")
    keys = _docs(spark, sf_dir).select(
        F.concat(
            F.element_at(arr, 1),
            F.lit("|"),
            F.floor(F.size(arr) / 8.0).cast("long").cast("string"),
        ).alias("block_key")
    )
    g = keys.groupBy("block_key").agg(F.count(F.lit(1)).alias("n_docs"))
    n_pairs = (F.col("n_docs") * (F.col("n_docs") - 1) / 2).cast("long")
    return g.select(
        "block_key",
        "n_docs",
        n_pairs.alias("n_pairs"),
        F.when(n_pairs > _BLOCK_PAIR_CAP, 1).otherwise(0).cast("int").alias(
            "oversized"
        ),
    )


# ---------------------------------------------------------------------------
# Unigram-LM perplexity scoring (model-based quality gate)
# ---------------------------------------------------------------------------


@register(
    "text_unigram_perplexity",
    oracle="""
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
    )
    SELECT doc_id, count(*) AS n_tokens,
      round(avg(bits), 6) AS bits_per_token
    FROM scored GROUP BY doc_id
    """,
)
def text_unigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality gate: per-doc bits-per-token under an
    add-one-smoothed unigram language model trained on the corpus
    itself — the perplexity-filtering signal (CCNet-style) that
    separates fluent text from gibberish/boilerplate. Two passes:
    the model is one map-side-combined token count (a dictionary,
    not the corpus), then each token scores via a dictionary join
    and one per-doc avg. Corpus totals stay broadcast 1-row
    aggregates. At 10^12 docs the model table is the only state and
    it is vocabulary-sized; swapping in an externally-trained
    KenLM-style model changes the join source, not the plan."""
    toks = _docs(spark, sf_dir).select(
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
            (-F.log2((F.col("c") + 1) / (F.col("t") + F.col("v")))).alias(
                "bits"
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("bits"), 6).alias("bits_per_token"),
    )


# ---------------------------------------------------------------------------
# Context-window chunking + token-budget sequence packing
# ---------------------------------------------------------------------------

_CHUNK_K = 32
_CHUNK_STRIDE = 24


@register(
    "text_chunk_windows",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS arr,
        len(string_split(text, ' ')) AS n
      FROM documents
    ),
    chunks AS (
      SELECT doc_id, i AS chunk_idx,
        arr[i * {_CHUNK_STRIDE} + 1 : i * {_CHUNK_STRIDE} + {_CHUNK_K}] AS ch
      FROM t, LATERAL (
        SELECT unnest(generate_series(
          0, CAST(ceil(CAST(greatest(n - {_CHUNK_K}, 0) AS DOUBLE)
                       / {_CHUNK_STRIDE}) AS BIGINT))) AS i
      ) s
    )
    SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
      CAST(len(ch) AS INTEGER) AS n_chunk_tokens,
      md5(array_to_string(ch, ' ')) AS chunk_md5
    FROM chunks
    """,
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (the training-example splitter):
    overlapping 32-token windows at stride 24
    per document, entirely with native array expressions — sequence
    + transform + slice in the scan projection, zero Python, zero
    shuffles (the explode is narrow). Every token is covered, ends
    included (last window may be short). chunk_md5 pins the chunk
    CONTENT cross-engine without hauling the text through the
    compare."""
    arr = F.split("text", " ")
    t = _docs(spark, sf_dir).select(
        "doc_id", arr.alias("arr"), F.size(arr).alias("n")
    )
    n_last = F.ceil(
        F.greatest(F.col("n") - _CHUNK_K, F.lit(0)).cast("double")
        / _CHUNK_STRIDE
    ).cast("long")
    chunks = t.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0).cast("long"), n_last),
                lambda i: F.struct(
                    i.cast("int").alias("chunk_idx"),
                    F.slice(
                        F.col("arr"), (i * _CHUNK_STRIDE + 1).cast("int"), _CHUNK_K
                    ).alias("ch"),
                ),
            )
        ).alias("c"),
    )
    return chunks.select(
        "doc_id",
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.size("c.ch").alias("n_chunk_tokens"),
        F.md5(F.array_join("c.ch", " ")).alias("chunk_md5"),
    )


_PACK_BUDGET = 256
_PACK_SHARDS = 16


@register(
    "text_pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
        {md5_long_sql("CAST(doc_id AS VARCHAR) || '#pack'")} AS pri,
        {md5_long_sql("CAST(doc_id AS VARCHAR) || '#pack'")} % {_PACK_SHARDS}
          AS shard,
        len(string_split(text, ' ')) AS n
      FROM documents
    ),
    packed AS (
      SELECT shard, n,
        sum(n) OVER (PARTITION BY shard ORDER BY pri, doc_id
                     ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    ),
    assigned AS (
      SELECT shard,
        shard * 1000000 + CAST(floor(CAST(cum - n AS DOUBLE)
          / {_PACK_BUDGET}) AS BIGINT) AS seq_id,
        n
      FROM packed
    )
    SELECT seq_id, count(*) AS n_docs,
      CAST(sum(n) AS BIGINT) AS total_tokens,
      round(CAST(sum(n) AS DOUBLE) / {_PACK_BUDGET}, 6) AS fill_ratio
    FROM assigned GROUP BY seq_id
    """,
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — assembling fixed-token-budget training
    sequences from variable-length docs. Distributed first-fit: docs
    hash into 16 shards (packing is embarrassingly
    parallel across shards; each shard's running token total is a
    window PARTITIONED by shard — never a global cumsum, which is
    the single-task trap), ordered by hash priority for mixing, and
    each doc joins the sequence where its running total STARTS
    (quota first-fit: a sequence may overflow its budget by at most
    one doc — the standard pack-then-truncate contract; tight
    packing needs doc-level splitting, which text_chunk_windows
    provides upstream). Output is the per-sequence manifest the
    dataloader consumes."""
    from pyspark.sql import Window

    pri = md5_long(F.concat(F.col("doc_id").cast("string"), F.lit("#pack")))
    t = _docs(spark, sf_dir).select(
        "doc_id",
        pri.alias("pri"),
        (pri % _PACK_SHARDS).alias("shard"),
        F.size(F.split("text", " ")).alias("n"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("pri", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    assigned = t.withColumn("cum", F.sum("n").over(w)).select(
        (
            F.col("shard") * 1000000
            + F.floor(
                (F.col("cum") - F.col("n")).cast("double") / _PACK_BUDGET
            ).cast("long")
        ).alias("seq_id"),
        "n",
    )
    return assigned.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n").cast("long").alias("total_tokens"),
        F.round(F.sum("n").cast("double") / _PACK_BUDGET, 6).alias(
            "fill_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# Deterministic dataset splits + leakage audit + embedding quantization
# ---------------------------------------------------------------------------

_SPLIT_SQL = (
    "CASE WHEN " + md5_long_sql("CAST(doc_id AS VARCHAR) || '#split'")
    + " % 100 < 90 THEN 'train' WHEN "
    + md5_long_sql("CAST(doc_id AS VARCHAR) || '#split'")
    + " % 100 < 95 THEN 'val' ELSE 'test' END"
)


def _split_col():
    h = md5_long(F.concat(F.col("doc_id").cast("string"), F.lit("#split"))) % 100
    return (
        F.when(h < 90, F.lit("train"))
        .when(h < 95, F.lit("val"))
        .otherwise(F.lit("test"))
    )


@register(
    "data_split_assign",
    oracle=f"""
    WITH s AS (
      SELECT {_SPLIT_SQL} AS split,
        len(string_split(text, ' ')) AS n
      FROM documents
    ),
    tot AS (SELECT count(*) AS n_all FROM s)
    SELECT split, count(*) AS n_docs,
      CAST(sum(n) AS BIGINT) AS total_tokens,
      round(CAST(count(*) AS DOUBLE) / tot.n_all, 6) AS frac
    FROM s CROSS JOIN tot GROUP BY split, tot.n_all
    """,
)
def data_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (90/5/5) by content-
    stable hash — the split is a pure scan projection: reproducible
    across runs, engines, and corpus repartitions, no RNG, no state.
    A doc's split NEVER changes when the corpus grows (hash of its
    own id), which is what makes eval sets stable across crawl
    versions. Output is the split manifest (counts, token totals,
    achieved fractions)."""
    s = _docs(spark, sf_dir).select(
        _split_col().alias("split"),
        F.size(F.split("text", " ")).alias("n"),
    )
    tot = s.agg(F.count(F.lit(1)).alias("n_all"))
    return (
        s.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").cast("long").alias("total_tokens"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "split",
            "n_docs",
            "total_tokens",
            F.round(F.col("n_docs").cast("double") / F.col("n_all"), 6).alias(
                "frac"
            ),
        )
    )


@register(
    "data_split_leakage",
    oracle=f"""
    WITH {MINHASH_PAIRS_CTES},
    splits AS (
      SELECT doc_id, {_SPLIT_SQL} AS split
      FROM (SELECT doc_id FROM documents
            UNION ALL SELECT doc_id + 1000000 FROM documents WHERE doc_id % 4 = 0
            UNION ALL SELECT doc_id + 2000000 FROM documents WHERE doc_id % 5 = 0)
    )
    SELECT least(sa.split, sb.split) AS split_a,
      greatest(sa.split, sb.split) AS split_b,
      count(*) AS n_pairs,
      CAST(sum(CASE WHEN sa.split <> sb.split THEN 1 ELSE 0 END) AS BIGINT)
        AS n_leaking
    FROM pairs p
    JOIN splits sa ON p.id_a = sa.doc_id
    JOIN splits sb ON p.id_b = sb.doc_id
    GROUP BY 1, 2
    """,
)
def data_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-contamination audit: near-dup pairs (MinHash-LSH candidates
    verified at Jaccard >= 0.5 over the recrawl-synthesis corpus —
    the candidates-first path, never the quadratic co-shingle join) bucketed by
    the splits of their two sides — a train/test near-dup pair IS
    leaked benchmark data. The pair set is minhash_neardup_pairs
    (the same plan dedup_minhash_lsh ships); the split is the same pure hash
    projection as data_split_assign, so the audit composes from
    already-persisted artifacts (dedup pairs + split manifest) with
    two dictionary joins — no new corpus pass at 100 TB."""
    corpus = _dedup_corpus_scale(spark, sf_dir)
    from multiomics_biocypher_kg_spark.operators import dedup as dd

    pairs = dd.minhash_neardup_pairs(corpus, 0.5).select("id_a", "id_b")
    splits = corpus.select("doc_id", _split_col().alias("split"))
    sa = splits.select(
        F.col("doc_id").alias("id_a"), F.col("split").alias("split_l")
    )
    sb = splits.select(
        F.col("doc_id").alias("id_b"), F.col("split").alias("split_r")
    )
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .groupBy(
            F.least("split_l", "split_r").alias("split_a"),
            F.greatest("split_l", "split_r").alias("split_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(
                F.when(F.col("split_l") != F.col("split_r"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_leaking"),
        )
    )


def _dedup_corpus_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    from multiomics_biocypher_kg_spark.registry_dedup_text import _dedup_corpus

    return _dedup_corpus(spark, sf_dir)


@register(
    "emb_quantize_int8",
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    scaled AS (
      SELECT vec_id, e,
        list_max(list_transform(e, x -> abs(x))) / 127 AS scale
      FROM v
    )
    SELECT vec_id, CAST(len(e) AS INTEGER) AS n_dims,
      round(scale, 6) AS scale,
      round(list_max(list_transform(e,
        x -> abs(x - floor(x / scale + 0.5) * scale))), 6) AS max_abs_err
    FROM scaled
    """,
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization of the embedding column — the
    index-size/bandwidth lever every billion-vector ANN deployment
    pulls (4x smaller, SIMD-friendly dot products). Per-vector
    symmetric scale = max|x|/127, quantize-dequantize round-trip
    error reported per vector; all pure array expressions in the
    scan projection (transform/aggregate — zero Python, zero
    shuffles). The quantizer is floor(x/s + 0.5) — half-up toward
    +inf — because floor is IEEE-exact in both engines while
    engine round() on doubles diverges at representation boundaries
    (Spark's BigDecimal shortest-string path). The oracle recomputes
    the identical arithmetic, so
    scale choice AND reconstruction error are value-gated, bounding
    the quantization noise the ANN recall tests tolerate."""
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    # the raw scale keeps its own name: aliasing the ROUNDED value
    # back to "scale" in the same select would let resolution bind
    # the error expression to the rounded column (observed — a 2e-6
    # cross-engine skew), so raw and display columns never share a name
    v = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", e.alias("e"))
        .withColumn(
            "s_raw",
            F.array_max(F.transform(F.col("e"), F.abs)) / 127,
        )
    )
    err = F.array_max(
        F.transform(
            F.col("e"),
            lambda x: F.abs(
                x - F.floor(x / F.col("s_raw") + 0.5) * F.col("s_raw")
            ),
        )
    )
    return v.select(
        "vec_id",
        F.size("e").alias("n_dims"),
        F.round("s_raw", 6).alias("scale"),
        F.round(err, 6).alias("max_abs_err"),
    )


# ---------------------------------------------------------------------------
# Fuzzy vocabulary match (typo-tolerant gazetteer linking)
# ---------------------------------------------------------------------------

_FUZZY_MAX_DIST = 2


@register(
    "kg_fuzzy_vocab_match",
    oracle=f"""
    WITH toks AS (
      SELECT DISTINCT lower(unnest(string_split(text, ' '))) AS token
      FROM documents
    ),
    vocab AS (
      SELECT DISTINCT lower(surface) AS surface FROM {VOCAB_SQL}
      WHERE surface NOT LIKE '% %'
    ),
    scored AS (
      SELECT t.token, v.surface, levenshtein(t.token, v.surface) AS dist
      FROM toks t JOIN vocab v
        ON abs(length(t.token) - length(v.surface)) <= {_FUZZY_MAX_DIST}
      WHERE length(t.token) >= 3
        AND levenshtein(t.token, v.surface) <= {_FUZZY_MAX_DIST}
    )
    SELECT token,
      CAST(min(dist) AS BIGINT) AS best_dist,
      min(CASE WHEN dist = bd THEN surface END) AS best_surface,
      count(*) AS n_candidates
    FROM (SELECT *, min(dist) OVER (PARTITION BY token) AS bd FROM scored)
    GROUP BY token
    """,
)
def kg_fuzzy_vocab_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-tolerant gazetteer linking: every distinct corpus token
    (len >= 3) matched against the vocabulary within Levenshtein
    distance 2 — the recovery pass for OCR/typo surface forms the
    exact cascade misses. The vocab side is a BROADCAST dim
    (gazetteers are dictionary-sized), the length-difference
    pre-filter prunes the candidate product before the edit-distance
    evaluates, and the corpus side is the distinct TOKEN dictionary,
    not the token stream — so cost is |token dict| x |length-
    compatible vocab|, independent of corpus size. Deterministic
    best match: min distance, ties to the lexicographically first
    surface."""
    from multiomics_biocypher_kg_spark.sources.vocab import vocab_df
    from pyspark.sql import Window

    toks = (
        _docs(spark, sf_dir)
        .select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .where(F.length("token") >= 3)
        .distinct()
    )
    vocab = (
        vocab_df(spark)
        .where(~F.col("surface").contains(" "))
        .select(F.lower("surface").alias("surface"))
        .distinct()
    )
    scored = (
        toks.join(
            F.broadcast(vocab),
            F.abs(F.length("token") - F.length("surface")) <= _FUZZY_MAX_DIST,
        )
        .withColumn("dist", F.levenshtein("token", "surface"))
        .where(F.col("dist") <= _FUZZY_MAX_DIST)
    )
    bd = F.min("dist").over(Window.partitionBy("token"))
    return (
        scored.withColumn("bd", bd)
        .groupBy("token")
        .agg(
            F.min("dist").cast("long").alias("best_dist"),
            F.min(
                F.when(F.col("dist") == F.col("bd"), F.col("surface"))
            ).alias("best_surface"),
            F.count(F.lit(1)).alias("n_candidates"),
        )
    )


# ---------------------------------------------------------------------------
# SCD-2 content history over crawl snapshots
# ---------------------------------------------------------------------------


@register(
    "web_scd2_history",
    oracle=f"""
    WITH s AS (
      SELECT sn.url, sn.ts_epoch, sn.doc_id, md5(d.text) AS content_md5
      FROM ({_SNAPS_SQL}) sn JOIN documents d ON sn.doc_id = d.doc_id
    ),
    seq AS (
      SELECT *, lag(content_md5)
        OVER (PARTITION BY url ORDER BY ts_epoch, doc_id) AS prev
      FROM s
    ),
    vers AS (
      SELECT url, ts_epoch, doc_id, content_md5 FROM seq
      WHERE prev IS NULL OR prev <> content_md5
    )
    SELECT url, content_md5,
      CAST(ts_epoch AS BIGINT) AS valid_from,
      CAST(lead(ts_epoch)
        OVER (PARTITION BY url ORDER BY ts_epoch, doc_id) AS BIGINT)
        AS valid_to,
      CAST(CASE WHEN lead(ts_epoch)
        OVER (PARTITION BY url ORDER BY ts_epoch, doc_id) IS NULL
        THEN 1 ELSE 0 END AS INTEGER) AS is_current
    FROM vers
    """,
)
def web_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) content history per url:
    consecutive snapshots with identical content collapse into one
    version row carrying a [valid_from, valid_to) interval, the open
    interval marking the current version — the warehouse-standard
    point-in-time shape that lets any downstream query ask "what did
    this page say at time T" with one range predicate. Two windows,
    both PARTITIONED by url (per-page history is small at any corpus
    size — the snapshot-diff argument), content compared by hash so
    version detection never re-reads page bytes twice."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    fam = F.col("doc_id") % 125
    url = F.concat(
        F.lit("https://"),
        _fam_host_col(),
        F.lit("/doc/"),
        F.lpad(fam.cast("string"), 6, "0"),
    )
    s = docs.select(
        url.alias("url"),
        (F.lit(1767225600) + F.col("doc_id")).cast("long").alias("ts_epoch"),
        "doc_id",
        F.md5("text").alias("content_md5"),
    )
    w = Window.partitionBy("url").orderBy("ts_epoch", "doc_id")
    vers = s.withColumn("prev", F.lag("content_md5").over(w)).where(
        F.col("prev").isNull() | (F.col("prev") != F.col("content_md5"))
    )
    w2 = Window.partitionBy("url").orderBy("ts_epoch", "doc_id")
    nxt = F.lead("ts_epoch").over(w2)
    return vers.select(
        "url",
        "content_md5",
        F.col("ts_epoch").cast("long").alias("valid_from"),
        nxt.cast("long").alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).cast("int").alias("is_current"),
    )


# If this module is imported FIRST (registry's own bottom import then
# sees it half-initialized), registry applies its window order before
# these registrations exist — re-apply here so the final ordering is
# identical either way. Idempotent.
from multiomics_biocypher_kg_spark.registry import (  # noqa: E402
    _apply_driver_window_order,
)

_apply_driver_window_order()


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters (bounded-state frequency estimation)
# ---------------------------------------------------------------------------

_CMS_D = 4      # hash rows
_CMS_W = 512    # buckets per row
_CMS_TOPK = 20

_CMS_ROWS_SQL = " UNION ALL ".join(
    f"SELECT token, c, {r} AS r, "
    + md5_long_sql(f"token || '#cms{r}'")
    + f" % {_CMS_W} AS bucket FROM counts"
    for r in range(_CMS_D)
)


@register(
    "text_heavy_hitters_cms",
    oracle=f"""
    WITH toks AS (
      SELECT lower(unnest(string_split(text, ' '))) AS token FROM documents
    ),
    counts AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
    hashed AS ({_CMS_ROWS_SQL}),
    cms AS (SELECT r, bucket, sum(c) AS cell FROM hashed GROUP BY r, bucket),
    est AS (
      SELECT h.token, min(h.c) AS exact_count, min(m.cell) AS cms_estimate
      FROM hashed h JOIN cms m ON h.r = m.r AND h.bucket = m.bucket
      GROUP BY h.token
    )
    SELECT token, CAST(exact_count AS BIGINT) AS exact_count,
      CAST(cms_estimate AS BIGINT) AS cms_estimate,
      CAST(cms_estimate - exact_count AS BIGINT) AS overestimate
    FROM est
    ORDER BY exact_count DESC, token LIMIT {_CMS_TOPK}
    """,
)
def text_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via a count-min sketch (d={d} rows x w={w}
    buckets, deterministic MD5 row hashes), validated against exact
    counts: for the top-{k} tokens by true frequency, report the CMS
    estimate and its (always non-negative) overestimate. The sketch
    is the bounded-state path a 10^12-token stream needs — d*w
    counters combine map-side regardless of vocabulary size, and
    the estimate for any probe key is min over rows of its cell.
    Here the per-token exact counts both feed the sketch cells
    (sum of colliding token counts == sum of colliding occurrences)
    and serve as ground truth, so the sketch math itself is
    oracle-pinned value-for-value, not just sampled. Top-k ordered
    by the exact count (unrounded), token tiebreak."""
    toks = _docs(spark, sf_dir).select(
        F.explode(F.split(F.lower("text"), " ")).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    hashed = counts.select(
        "token",
        "c",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        (
                            md5_long(
                                F.concat(F.col("token"), F.lit(f"#cms{r}"))
                            )
                            % _CMS_W
                        ).alias("bucket"),
                    )
                    for r in range(_CMS_D)
                ]
            )
        ).alias("rb"),
    ).select("token", "c", "rb.r", "rb.bucket")
    cms = hashed.groupBy("r", "bucket").agg(F.sum("c").alias("cell"))
    est = (
        hashed.join(cms, ["r", "bucket"])
        .groupBy("token")
        .agg(
            F.min("c").alias("exact_count"),
            F.min("cell").alias("cms_estimate"),
        )
    )
    return (
        est.orderBy(F.col("exact_count").desc(), "token")
        .limit(_CMS_TOPK)
        .select(
            "token",
            F.col("exact_count").cast("bigint").alias("exact_count"),
            F.col("cms_estimate").cast("bigint").alias("cms_estimate"),
            (F.col("cms_estimate") - F.col("exact_count"))
            .cast("bigint")
            .alias("overestimate"),
        )
    )


text_heavy_hitters_cms.__doc__ = text_heavy_hitters_cms.__doc__.format(
    d=_CMS_D, w=_CMS_W, k=_CMS_TOPK
)


# ---------------------------------------------------------------------------
# Interpolated bigram-LM perplexity (sequence-aware quality gate)
# ---------------------------------------------------------------------------

_BG_LAMBDA = 0.7


@register(
    "text_bigram_perplexity",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS arr,
        len(string_split(text, ' ')) AS n
      FROM documents
    ),
    toks AS (
      SELECT doc_id, arr[i] AS token
      FROM t, LATERAL (SELECT unnest(generate_series(1, n)) AS i) s
    ),
    bg AS (
      SELECT doc_id, arr[i] AS w1, arr[i + 1] AS w2
      FROM t, LATERAL (SELECT unnest(generate_series(1, n - 1)) AS i) s
    ),
    bgm AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
    pref AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
    uni AS (SELECT token, count(*) AS c2 FROM toks GROUP BY token),
    st AS (
      SELECT CAST(count(*) AS DOUBLE) AS t,
             CAST(count(DISTINCT token) AS DOUBLE) AS v
      FROM toks
    ),
    scored AS (
      SELECT g.doc_id,
        -log2({_BG_LAMBDA} * m.c12 / p.c1
              + {1 - _BG_LAMBDA} * (u.c2 + 1) / (st.t + st.v)) AS bits
      FROM bg g
      JOIN bgm m ON g.w1 = m.w1 AND g.w2 = m.w2
      JOIN pref p ON g.w1 = p.w1
      JOIN uni u ON g.w2 = u.token
      CROSS JOIN st
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      round(avg(bits), 6) AS bits_per_bigram
    FROM scored GROUP BY doc_id
    """,
)
def text_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-aware quality gate: per-doc bits-per-bigram under a
    Jelinek-Mercer-interpolated bigram LM trained on the corpus
    itself — p(w2|w1) = {lam} * c(w1,w2)/c(w1) + {one_m_lam} *
    add-one-unigram(w2). The unigram gate (text_unigram_perplexity)
    cannot see scrambled word order; this one can. Model state is
    two dictionary-sized tables (bigram counts, unigram counts),
    each one map-side-combined agg; the prefix table and the 1-row
    totals ROLL UP from those dictionaries rather than re-scanning
    the corpus, so only the two primary dictionaries and the scoring
    probe touch the corpus, and all four model tables build as
    concurrent broadcast futures. Scoring is three broadcast
    dictionary joins, then one per-doc avg — never a self-join.
    Docs with fewer than two tokens have no bigrams and drop out,
    same as the oracle's empty generate_series."""
    arr = F.split(F.lower("text"), " ")
    t = _docs(spark, sf_dir).select(
        "doc_id", arr.alias("arr"), F.size(arr).alias("n")
    )
    toks = t.select("doc_id", F.explode("arr").alias("token"))
    bg = t.where(F.col("n") >= 2).select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(F.col("arr"), 1, F.col("n") - 1),
                F.slice(F.col("arr"), 2, F.col("n") - 1),
                lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    # model-table derivation chain: pref rolls up from the bigram
    # DICTIONARY (c1 = sum of c12 over w2) and the totals row from
    # the unigram dictionary (t = sum c2, v = n rows) — identical
    # values, but three corpus scans become ZERO extra ones (the
    # former shape re-scanned + re-exploded the corpus for each).
    # the bigram STREAM materializes once and feeds both the model
    # build and the scoring probe (one zip_with explode instead of
    # two; interleaved A/B at sf1.0: 4.44 s -> 3.77 s best-of-4).
    # The dictionary tables stay UN-checkpointed: they build as
    # concurrent broadcast futures at action time, and eager
    # checkpoints THERE serialized them (A/B: 8.1 s vs 5.7 s).
    bg = bg.localCheckpoint(eager=True)
    bgm = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    pref = bgm.groupBy("w1").agg(F.sum("c12").alias("c1"))
    uni = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c2"))
        .withColumnRenamed("token", "w2")
    )
    st = uni.agg(
        F.sum("c2").cast("double").alias("t"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    p = (
        F.lit(_BG_LAMBDA) * F.col("c12") / F.col("c1")
        + F.lit(1 - _BG_LAMBDA)
        * (F.col("c2") + 1)
        / (F.col("t") + F.col("v"))
    )
    scored = (
        bg.join(bgm, ["w1", "w2"])
        .join(pref, "w1")
        .join(uni, "w2")
        .crossJoin(F.broadcast(st))
        .select("doc_id", (-F.log2(p)).alias("bits"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.round(F.avg("bits"), 6).alias("bits_per_bigram"),
    )


text_bigram_perplexity.__doc__ = text_bigram_perplexity.__doc__.format(
    lam=_BG_LAMBDA, one_m_lam=round(1 - _BG_LAMBDA, 1)
)


# --------------------------------------------------------------------------
# Registered AFTER the round-4 driver-window freeze (see the twin
# comment in registry_web) — local oracle sweep this round, rotate
# into _DRIVER_WINDOW_FIRST in round 5.
# --------------------------------------------------------------------------


@register(
    "data_lang_sampling_weights",
    oracle="""
    WITH per_lang AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ),
    tot AS (SELECT sum(n_tokens) AS t FROM per_lang),
    raw AS (
      SELECT p.lang, p.n_docs, p.n_tokens,
        p.n_tokens / tot.t AS p_nat,
        pow(p.n_tokens / tot.t, 0.3) AS w_raw
      FROM per_lang p CROSS JOIN tot
    ),
    wt AS (SELECT sum(w_raw) AS s FROM raw)
    SELECT lang, n_docs, n_tokens,
      round(p_nat, 6) AS p_natural,
      round(w_raw / wt.s, 6) AS sample_weight,
      round((w_raw / wt.s) / p_nat, 6) AS upsample_factor
    FROM raw CROSS JOIN wt
    """,
)
def data_lang_sampling_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based multilingual sampling weights (the mT5 /
    UNIMAX data-mixing rule): per-language token mass p_l is
    re-weighted to p_l^alpha (alpha=0.3) and renormalized, so
    low-resource languages are upsampled for training without
    swamping the mix — the knob every multilingual pretraining run
    sets. Output: (lang, n_docs, n_tokens, p_natural, sample_weight,
    upsample_factor).

    Scale contract: one map-side-combined groupBy over the corpus
    (token counting is size(split()) in the scan projection — no
    token explode, no Python); both normalizers are 1-row broadcast
    aggregates crossJoined back onto the language-cardinality table.
    State never exceeds n_languages rows."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per_lang = docs.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens"),
    )
    tot = per_lang.agg(F.sum("n_tokens").alias("t"))
    raw = per_lang.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens") / F.col("t")).alias("p_nat"),
        F.pow(F.col("n_tokens") / F.col("t"), F.lit(0.3)).alias("w_raw"),
    )
    wt = raw.agg(F.sum("w_raw").alias("s"))
    return raw.crossJoin(F.broadcast(wt)).select(
        "lang",
        "n_docs",
        "n_tokens",
        F.round("p_nat", 6).alias("p_natural"),
        F.round(F.col("w_raw") / F.col("s"), 6).alias("sample_weight"),
        F.round((F.col("w_raw") / F.col("s")) / F.col("p_nat"), 6).alias(
            "upsample_factor"
        ),
    )


_CONTAM_N = 13  # GPT-3 appendix-C operating point


@register(
    "data_contamination",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, text, {_SPLIT_SQL} AS split,
        string_split(text, ' ') AS arr,
        len(string_split(text, ' ')) AS n
      FROM documents
    ),
    eval_grams AS (
      SELECT DISTINCT doc_id,
        md5(array_to_string(arr[i + 1 : i + {_CONTAM_N}], ' ')) AS h
      FROM s, LATERAL (
        SELECT unnest(generate_series(0, n - {_CONTAM_N})) AS i
      ) g
      WHERE split <> 'train'
    ),
    train_h AS (
      SELECT DISTINCT
        md5(array_to_string(arr[i + 1 : i + {_CONTAM_N}], ' ')) AS h
      FROM s, LATERAL (
        SELECT unnest(generate_series(0, n - {_CONTAM_N})) AS i
      ) g
      WHERE split = 'train'
    ),
    per AS (
      SELECT doc_id, count(*) AS n_grams FROM eval_grams GROUP BY doc_id
    ),
    hits AS (
      SELECT e.doc_id, count(*) AS n_contaminated
      FROM eval_grams e JOIN train_h t ON e.h = t.h
      GROUP BY e.doc_id
    )
    SELECT s.doc_id,
      CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
      CAST(coalesce(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
      CASE WHEN coalesce(p.n_grams, 0) > 0
        THEN CAST(coalesce(h.n_contaminated, 0) AS DOUBLE) / p.n_grams
        ELSE 0.0 END AS contam_frac,
      coalesce(h.n_contaminated, 0) > 0 AS is_contaminated
    FROM s LEFT JOIN per p ON s.doc_id = p.doc_id
    LEFT JOIN hits h ON s.doc_id = h.doc_id
    WHERE s.split <> 'train'
    """,
)
def data_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3-style benchmark decontamination over the deterministic
    90/5/5 split: an eval (val/test) document is contaminated when
    any of its 13-token stride-1 windows appears verbatim anywhere
    in the train split. Complements ``data_split_leakage`` (MinHash
    NEAR-dup across splits) with the exact-substring rule the
    published decontamination pipelines actually apply. Eval gram
    set is broadcast; the train corpus is a one-pass map-side gram
    stream probed against it — no train-side shuffle (see
    :func:`operators.dedup.ngram_contamination`)."""
    from multiomics_biocypher_kg_spark.operators import dedup as dd

    docs = _docs(spark, sf_dir).select(
        "doc_id", "text", _split_col().alias("split")
    )
    return dd.ngram_contamination(
        docs.where(F.col("split") == "train"),
        docs.where(F.col("split") != "train"),
        ngram=_CONTAM_N,
    )


@register(
    "emb_matryoshka_eval",
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    p AS (
      SELECT a.e AS ea, b.e AS eb
      FROM v a JOIN v b ON b.vec_id = a.vec_id + 1
    ),
    k AS (SELECT unnest([64, 32, 16]) AS trunc_dim),
    x AS (
      SELECT trunc_dim,
        list_dot_product(ea[1:trunc_dim], eb[1:trunc_dim]) /
          (sqrt(list_dot_product(ea[1:trunc_dim], ea[1:trunc_dim])) *
           sqrt(list_dot_product(eb[1:trunc_dim], eb[1:trunc_dim]))) AS ck,
        list_dot_product(ea, eb) /
          (sqrt(list_dot_product(ea, ea)) *
           sqrt(list_dot_product(eb, eb))) AS cf,
        sqrt(list_dot_product(ea[1:trunc_dim], ea[1:trunc_dim])) /
          sqrt(list_dot_product(ea, ea)) AS nf
      FROM p CROSS JOIN k
    )
    SELECT trunc_dim, CAST(count(*) AS BIGINT) AS n_pairs,
      round(avg(ck), 6) AS avg_cos,
      round(avg(abs(ck - cf)), 6) AS avg_abs_delta,
      round(avg(nf), 6) AS avg_norm_frac
    FROM x GROUP BY trunc_dim
    """,
)
def emb_matryoshka_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation audit over the embedding table: cosine
    preservation and retained-norm fraction at d, d/2, d/4 prefixes
    (the MRL serving decision — can the ANN index answer from
    truncated prefixes?). Deterministic adjacent-id pair chain, all
    metrics as array expressions in the join projection, three-row
    result. See :func:`operators.simsearch.matryoshka_eval`."""
    from multiomics_biocypher_kg_spark.operators.simsearch import (
        matryoshka_eval,
    )

    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return matryoshka_eval(vecs, dims=(64, 32, 16))


_N_EPOCH_SHARDS = 8


@register(
    "data_epoch_order",
    oracle=f"""
    WITH e AS (
      SELECT doc_id, unnest([0, 1]) AS epoch FROM documents
    ),
    h AS (
      SELECT doc_id, epoch,
        {md5_long_sql("CAST(doc_id AS VARCHAR) || '#ep' || CAST(epoch AS VARCHAR)")} AS h
      FROM e
    ),
    p AS (
      SELECT doc_id, epoch, h % {_N_EPOCH_SHARDS} AS shard,
        row_number() OVER (
          PARTITION BY epoch, h % {_N_EPOCH_SHARDS} ORDER BY h, doc_id
        ) - 1 AS pos
      FROM h
    )
    SELECT epoch, shard,
      CAST(count(*) AS BIGINT) AS n_docs,
      CAST(sum(pos) AS BIGINT) AS sum_pos,
      CAST(sum(pos * ({md5_long_sql("CAST(doc_id AS VARCHAR)")} % 997))
        AS BIGINT) AS order_checksum
    FROM p GROUP BY epoch, shard
    """,
)
def data_epoch_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch dataloader ordering: each epoch gets
    its own hash-derived permutation (seed = epoch in the hash
    preimage — no RNG, reproducible across runs/engines/restarts),
    docs are hash-assigned to shards and positioned 0..m-1 within
    (epoch, shard). ``sum_pos`` must equal m(m-1)/2 (permutation
    proof, pytest-asserted) and ``order_checksum`` value-gates the
    ORDER itself, not just membership.

    Scale: shard count scales with the corpus (a shard is an output
    file, ~1 GB by construction), so the per-(epoch, shard) position
    window sorts one file's worth of ids per task — never a global
    sort. Assignment and both checksums are scan projections +
    map-side-combined aggs."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir).select("doc_id")
    e = docs.select(
        "doc_id", F.explode(F.array(F.lit(0), F.lit(1))).alias("epoch")
    )
    h = md5_long(
        F.concat(
            F.col("doc_id").cast("string"),
            F.lit("#ep"),
            F.col("epoch").cast("string"),
        )
    )
    withh = e.select("doc_id", "epoch", h.alias("h"))
    shard = F.pmod(F.col("h"), F.lit(_N_EPOCH_SHARDS))
    w = Window.partitionBy("epoch", "shard").orderBy("h", "doc_id")
    p = withh.select(
        "doc_id", "epoch", shard.alias("shard"), F.col("h")
    ).withColumn("pos", F.row_number().over(w) - 1)
    chk = F.pmod(md5_long(F.col("doc_id").cast("string")), F.lit(997))
    return p.groupBy("epoch", "shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("pos").cast("long").alias("sum_pos"),
        F.sum(F.col("pos") * chk).cast("long").alias("order_checksum"),
    )


# ---------------------------------------------------------------------------
# Bottom-k (KMV) order-statistic sketch over per-host token vocabulary
# ---------------------------------------------------------------------------

_KMV_K = 64
_KMV_SALTS = 16
# md5_long yields 60-bit positive hashes; normalize into (0, 1]
_KMV_SPACE = float(1 << 60)


@register(
    "text_kmv_cardinality",
    oracle=f"""
    WITH toks AS (
      SELECT DISTINCT {_FAM_HOST_SQL} AS host,
        arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2] AS token
      FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM documents) d,
      LATERAL (SELECT unnest(generate_series(1, len(d.arr) - 2)) AS i) t
    ),
    hashed AS (
      SELECT host, token, {md5_long_sql("token")} AS u FROM toks
    ),
    ranked AS (
      SELECT host, u,
        row_number() OVER (PARTITION BY host ORDER BY u, token) AS rk
      FROM hashed
    ),
    agg AS (
      SELECT host, count(*) AS n_exact,
        max(CASE WHEN rk = {_KMV_K} THEN u END) AS kth_hash
      FROM ranked GROUP BY host
    )
    SELECT host, n_exact, {_KMV_K} AS sketch_k, kth_hash,
      round(CASE WHEN kth_hash IS NULL THEN CAST(n_exact AS DOUBLE)
        ELSE ({_KMV_K} - 1) / ((CAST(kth_hash AS DOUBLE) + 1.0) / {_KMV_SPACE!r})
        END, 6) AS est_distinct,
      round(abs(CASE WHEN kth_hash IS NULL THEN CAST(n_exact AS DOUBLE)
        ELSE ({_KMV_K} - 1) / ((CAST(kth_hash AS DOUBLE) + 1.0) / {_KMV_SPACE!r})
        END - n_exact) / n_exact, 6) AS rel_err
    FROM agg
    """,
)
def text_kmv_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host 3-gram-shingle vocabulary cardinality via a bottom-k
    (KMV)
    order-statistic sketch (Bar-Yossef et al. 2002 / Beyer et al.
    SIGMOD 2007): keep the k smallest hash values per host; the
    unbiased estimate is (k-1)/u_(k) with u_(k) the k-th smallest
    hash normalized into (0,1]. Complements text_hll_host_cardinality
    (k independent min-trials, Gamma-sum estimator over doc CONTENT):
    KMV is the MERGEABLE variant — bottom-k of a union is the
    bottom-k of the concatenated partial sketches — which the Spark
    plan demonstrates structurally: hashes first reduce to a bottom-k
    PARTIAL per (host, salt-bucket) — each a bounded k-row sketch, the
    map-side state of a sketch UDAF — and the k-th order statistic is
    then taken over the merged {salts}*k candidate rows per host, so
    no window ever sorts a full per-host vocabulary in one task. The
    oracle computes the single-pass rank directly (bottom-k of a
    partition union is identical by the merge property — the identity
    under test). Hosts with < k distinct tokens fall back to the
    exact count (the standard not-yet-full sketch convention);
    n_exact rides along so rel_err is a pinned accuracy figure.
    """
    from pyspark.sql import Window

    from multiomics_biocypher_kg_spark.operators.dedup import shingles

    toks = shingles(
        _docs(spark, sf_dir).select(_fam_host_col().alias("host"), "text"),
        id_col="host",
        text_col="text",
        distinct=True,
    ).select(F.col("id").alias("host"), F.col("shingle").alias("token"))
    hashed = toks.select(
        "host", "token", md5_long(F.col("token")).alias("u")
    )
    # phase 1: bounded bottom-k partial sketch per (host, salt bucket)
    salt = F.pmod(md5_long(F.concat(F.col("token"), F.lit("#kmv"))), F.lit(_KMV_SALTS))
    wp = Window.partitionBy("host", "salt").orderBy("u", "token")
    partial = (
        hashed.withColumn("salt", salt)
        .withColumn("rk", F.row_number().over(wp))
        .where(F.col("rk") <= _KMV_K)
    )
    # exact count per host (map-side-combined; the accuracy yardstick)
    exact = hashed.groupBy("host").agg(F.count(F.lit(1)).alias("n_exact"))
    # phase 2: merge partials — k-th order statistic over <= salts*k rows
    wm = Window.partitionBy("host").orderBy("u", "token")
    merged = (
        partial.select("host", "u", "token")
        .withColumn("mrk", F.row_number().over(wm))
        .groupBy("host")
        .agg(F.max(F.when(F.col("mrk") == _KMV_K, F.col("u"))).alias("kth_hash"))
    )
    est = F.when(
        F.col("kth_hash").isNull(), F.col("n_exact").cast("double")
    ).otherwise(
        F.lit(float(_KMV_K - 1))
        / ((F.col("kth_hash").cast("double") + 1.0) / F.lit(_KMV_SPACE))
    )
    return exact.join(merged, "host").select(
        "host",
        "n_exact",
        F.lit(_KMV_K).cast("int").alias("sketch_k"),
        "kth_hash",
        F.round(est, 6).alias("est_distinct"),
        F.round(F.abs(est - F.col("n_exact")) / F.col("n_exact"), 6).alias(
            "rel_err"
        ),
    )


text_kmv_cardinality.__doc__ = text_kmv_cardinality.__doc__.format(
    salts=_KMV_SALTS
)


# ---------------------------------------------------------------------------
# Interpolated Kneser-Ney bigram perplexity (the KenLM/CCNet estimator)
# ---------------------------------------------------------------------------

_KN_D = 0.75


@register(
    "text_kn_perplexity",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS arr,
        len(string_split(text, ' ')) AS n
      FROM documents
    ),
    bg AS (
      SELECT doc_id, arr[i] AS w1, arr[i + 1] AS w2
      FROM t, LATERAL (SELECT unnest(generate_series(1, n - 1)) AS i) s
    ),
    bgm AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
    pref AS (
      SELECT w1, sum(c12) AS c1, count(*) AS n1f FROM bgm GROUP BY w1
    ),
    cont AS (SELECT w2, count(*) AS nc FROM bgm GROUP BY w2),
    ty AS (SELECT CAST(count(*) AS DOUBLE) AS nt FROM bgm),
    scored AS (
      SELECT g.doc_id,
        -log2(greatest(m.c12 - {_KN_D}, 0.0) / p.c1
              + ({_KN_D} * p.n1f / p.c1) * (c.nc / ty.nt)) AS bits
      FROM bg g
      JOIN bgm m ON g.w1 = m.w1 AND g.w2 = m.w2
      JOIN pref p ON g.w1 = p.w1
      JOIN cont c ON g.w2 = c.w2
      CROSS JOIN ty
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      round(avg(bits), 6) AS kn_bits_per_bigram
    FROM scored GROUP BY doc_id
    """,
)
def text_kn_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc bits-per-bigram under an interpolated Kneser-Ney
    bigram LM (Chen & Goodman 1999, absolute discount D={D}) — the
    estimator KenLM implements and CCNet-style quality filtering
    scores with:

        p(w2|w1) = max(c(w1,w2) - D, 0) / c(w1)
                   + (D * N1+(w1,.) / c(w1)) * N1+(.,w2) / N1+(.,.)

    The backoff weight is exactly the discount mass removed, and the
    lower-order term is the CONTINUATION probability — the fraction
    of distinct bigram TYPES ending in w2, not its token frequency —
    which fixes the "Francisco problem" the Jelinek-Mercer gate
    (text_bigram_perplexity) inherits from its unigram backoff: a
    word frequent only in one collocation stops inflating unseen-
    context scores. Scoring the training corpus itself keeps every
    c(w1,w2) >= 1 > D, so no zero-probability path exists and the
    smoothing arithmetic is oracle-pinned value-for-value.

    100 TB: ALL model state derives from the single bigram-TYPE
    table (one map-side-combined agg over the exploded corpus);
    prefix totals, forward continuation counts N1+(w1,.), backward
    continuation counts N1+(.,w2) and the type total are three
    dictionary-sized aggs + one broadcast scalar over that table.
    Scoring is three dictionary joins and one per-doc avg; the
    corpus is scanned once for bigrams and never self-joined. The
    scoring expression is a fixed arithmetic tree over integer
    counts, so Spark and DuckDB agree bit-for-bit before the final
    round(6)-after-avg.
    """
    arr = F.split(F.lower("text"), " ")
    t = _docs(spark, sf_dir).select(
        "doc_id", arr.alias("arr"), F.size(arr).alias("n")
    )
    bg = t.where(F.col("n") >= 2).select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(F.col("arr"), 1, F.col("n") - 1),
                F.slice(F.col("arr"), 2, F.col("n") - 1),
                lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    bgm = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    pref = bgm.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n1f")
    )
    cont = bgm.groupBy("w2").agg(F.count(F.lit(1)).alias("nc"))
    ty = bgm.agg(F.count(F.lit(1)).cast("double").alias("nt"))
    p = F.greatest(F.col("c12") - F.lit(_KN_D), F.lit(0.0)) / F.col("c1") + (
        F.lit(_KN_D) * F.col("n1f") / F.col("c1")
    ) * (F.col("nc") / F.col("nt"))
    scored = (
        bg.join(bgm, ["w1", "w2"])
        .join(pref, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(ty))
        .select("doc_id", (-F.log2(p)).alias("bits"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.round(F.avg("bits"), 6).alias("kn_bits_per_bigram"),
    )


text_kn_perplexity.__doc__ = text_kn_perplexity.__doc__.format(D=_KN_D)


# ---------------------------------------------------------------------------
# Rendezvous (HRW) resharding: minimal-disruption shard rebalancing
# ---------------------------------------------------------------------------

_HRW_N = 8  # shard count before the scale-up


@register(
    "data_rendezvous_shards",
    oracle=f"""
    WITH cand AS (
      SELECT d.doc_id, s.s,
        {md5_long_sql("CAST(d.doc_id AS VARCHAR) || '#' || CAST(s.s AS VARCHAR)")} AS h
      FROM documents d,
      LATERAL (SELECT unnest(generate_series(0, {_HRW_N - 1})) AS s) s
    ),
    before AS (
      SELECT doc_id, arg_max(s, h) AS shard_before, max(h) AS max_h
      FROM cand GROUP BY doc_id
    )
    SELECT b.doc_id,
      CAST(b.shard_before AS INTEGER) AS shard_before,
      CAST(CASE WHEN nh.h8 > b.max_h THEN {_HRW_N}
           ELSE b.shard_before END AS INTEGER) AS shard_after,
      nh.h8 > b.max_h AS moved
    FROM before b,
    LATERAL (SELECT {md5_long_sql(
        f"CAST(b.doc_id AS VARCHAR) || '#' || CAST({_HRW_N} AS VARCHAR)"
    )} AS h8) nh
    """,
)
def data_rendezvous_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous / highest-random-weight sharding (Thaler &
    Ravishankar 1998) and its defining rebalance property: each doc
    goes to the shard with the highest hash(doc, shard) "weight",
    so growing {n} -> {n1} shards moves EXACTLY the docs the new
    shard wins — expected 1/{n1} of the corpus — and every moved doc
    moves TO the new shard (shard_after == {n}), never between old
    shards. Hash-mod sharding (curation_shards) reshuffles ~all keys
    on any count change; HRW is what incremental 10^12-doc pipelines
    reshard with (consistent hashing's simpler cousin — no ring
    state, pure computation). Because the candidate set is the
    bounded SHARD COUNT — not data — the argmax needs no explode, no
    aggregate, and no shuffle: all {n} weights are struct elements of
    one array column reduced by array_max inside a single
    whole-stage-codegen Project, so the entire reshard plan is a
    narrow map over the corpus (plan guard asserts zero Exchange).
    Then shard_after = (h_new > max_old) ? {n} : before — the
    minimal-move property IS the formula, and the oracle recomputes
    it with arg_max/max over the identical md5 weights. All
    integer/boolean output.
    """
    weights = F.array(*[
        F.struct(
            md5_long(
                F.concat_ws(
                    "#", F.col("doc_id").cast("string"), F.lit(str(s))
                )
            ).alias("h"),
            F.lit(s).alias("s"),
        )
        for s in range(_HRW_N)
    ])
    before = _docs(spark, sf_dir).select(
        "doc_id", F.array_max(weights).alias("m")
    ).select(
        "doc_id",
        F.col("m.s").cast("int").alias("shard_before"),
        F.col("m.h").alias("max_h"),
    )
    h_new = md5_long(
        F.concat_ws("#", F.col("doc_id").cast("string"), F.lit(str(_HRW_N)))
    )
    return before.select(
        "doc_id",
        "shard_before",
        F.when(h_new > F.col("max_h"), F.lit(_HRW_N))
        .otherwise(F.col("shard_before"))
        .cast("int")
        .alias("shard_after"),
        (h_new > F.col("max_h")).alias("moved"),
    )


data_rendezvous_shards.__doc__ = data_rendezvous_shards.__doc__.format(
    n=_HRW_N, n1=_HRW_N + 1
)


# ---------------------------------------------------------------------------
# Manifest pruning audit: hash vs range clustering -> predicate file-skipping
# ---------------------------------------------------------------------------

_PRUNE_SHARDS = 16
_PRUNE_THRESH = 420  # predicate: n_chars >= 420 (~top quartile)


@register(
    "data_manifest_pruning",
    oracle=f"""
    WITH stats AS (
      SELECT min(n_chars) AS lo, max(n_chars) AS hi FROM documents
    ),
    sharded AS (
      SELECT d.n_chars,
        {md5_long_sql("CAST(d.doc_id AS VARCHAR)")} % {_PRUNE_SHARDS} AS hash_shard,
        CAST(floor((d.n_chars - s.lo) * {_PRUNE_SHARDS}.0
                   / (s.hi - s.lo + 1)) AS BIGINT) AS range_shard
      FROM documents d CROSS JOIN stats s
    ),
    layouts AS (
      SELECT 'hash' AS layout, hash_shard AS shard, n_chars FROM sharded
      UNION ALL
      SELECT 'range' AS layout, range_shard AS shard, n_chars FROM sharded
    )
    SELECT layout, CAST(shard AS INTEGER) AS shard,
      count(*) AS n_docs,
      min(n_chars) AS min_v, max(n_chars) AS max_v,
      max(n_chars) < {_PRUNE_THRESH} AS skippable
    FROM layouts GROUP BY layout, shard
    """,
)
def data_manifest_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-manifest-style scan-pruning audit: per-shard min/max
    column stats under two physical layouts — hash-clustered (shard =
    md5(doc_id) % {n}) vs range-clustered on the predicate column
    (shard = floor((v - lo) * {n} / span), the two-pass range
    partitioner: one global min/max agg broadcast as a 1-row scalar,
    then a narrow map) — and whether each shard is skippable for the
    predicate ``n_chars >= {t}`` (skippable iff shard max < {t},
    exactly the min/max file-skipping every manifest-backed format
    does; reference analog: the resolved-file probe discipline,
    `plans/lineage.py`). The audit quantifies the 100 TB decision a
    table's sort order IS: under hash layout every shard spans the
    full value range (0 skippable — every query scans everything);
    under range layout the same predicate prunes ~3/4 of shards
    without reading a row. One union + one map-side-combined groupBy;
    no window, no join wider than the broadcast scalar.
    """
    docs = _docs(spark, sf_dir).select("doc_id", "n_chars")
    stats = docs.agg(
        F.min("n_chars").alias("lo"), F.max("n_chars").alias("hi")
    )
    sharded = docs.crossJoin(F.broadcast(stats)).select(
        "n_chars",
        (md5_long(F.col("doc_id").cast("string")) % _PRUNE_SHARDS).alias(
            "hash_shard"
        ),
        F.floor(
            (F.col("n_chars") - F.col("lo"))
            * float(_PRUNE_SHARDS)
            / (F.col("hi") - F.col("lo") + 1)
        ).alias("range_shard"),
    )
    both = sharded.select(
        F.lit("hash").alias("layout"),
        F.col("hash_shard").alias("shard"),
        "n_chars",
    ).unionAll(
        sharded.select(
            F.lit("range").alias("layout"),
            F.col("range_shard").alias("shard"),
            "n_chars",
        )
    )
    return both.groupBy("layout", F.col("shard").cast("int").alias("shard")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("min_v"),
        F.max("n_chars").alias("max_v"),
        (F.max("n_chars") < _PRUNE_THRESH).alias("skippable"),
    )


data_manifest_pruning.__doc__ = data_manifest_pruning.__doc__.format(
    n=_PRUNE_SHARDS, t=_PRUNE_THRESH
)


# ---------------------------------------------------------------------------
# Skew audit: per-key load profile -> data-derived salt-factor recommendation
# ---------------------------------------------------------------------------

_SKEW_PARTS = 32  # target parallelism the salt recommendation is sized for


@register(
    "data_skew_audit",
    oracle=f"""
    WITH hosts AS (
      SELECT CASE WHEN (doc_id % 125) % 10 < 3 THEN 'hot.example.com'
        ELSE 'h' || CAST((doc_id % 125) % 50 AS VARCHAR) || '.example.org'
        END AS host
      FROM documents
    ),
    per_key AS (SELECT host, count(*) AS n_docs FROM hosts GROUP BY host),
    tot AS (SELECT sum(n_docs) AS total FROM per_key)
    SELECT p.host, p.n_docs,
      round(CAST(p.n_docs AS DOUBLE) / t.total, 6) AS share,
      CAST(ceil(p.n_docs * {_SKEW_PARTS}.0 / t.total) AS INTEGER) AS salt_factor,
      p.n_docs * {_SKEW_PARTS} > t.total AS is_skewed
    FROM per_key p CROSS JOIN tot t
    """,
)
def data_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The measurement that precedes salted aggregation
    (kg_host_rollup_salted applies a salt; this derives WHAT salt):
    per-key load share and the minimal salt factor that levels the
    key across {p}-way parallelism — salt = ceil(n_key * {p} /
    total), i.e. how many partition-sized chunks the key occupies,
    with is_skewed = (key > one partition's fair share). On the
    synthetic host family 'hot.example.com' carries ~30% of docs →
    salt ~10; every other host fits one partition → salt 1. The
    profile is one map-side-combined groupBy over a key the scan
    projection computes (dictionary-sized output) + one broadcast
    1-row total — the cost model: a skew audit must be strictly
    cheaper than the shuffle it tunes. AQE's runtime skew-split
    handles joins; groupBy salting still needs this number chosen
    from data (SCALE.md 'skew' row).
    """
    fam = F.col("doc_id") % 125
    host = F.when(fam % 10 < 3, F.lit("hot.example.com")).otherwise(
        F.concat(F.lit("h"), (fam % 50).cast("string"), F.lit(".example.org"))
    )
    per_key = (
        _docs(spark, sf_dir)
        .select(host.alias("host"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    tot = per_key.agg(F.sum("n_docs").alias("total"))
    return per_key.crossJoin(F.broadcast(tot)).select(
        "host",
        "n_docs",
        F.round(F.col("n_docs").cast("double") / F.col("total"), 6).alias("share"),
        F.ceil(F.col("n_docs") * float(_SKEW_PARTS) / F.col("total"))
        .cast("int")
        .alias("salt_factor"),
        (F.col("n_docs") * _SKEW_PARTS > F.col("total")).alias("is_skewed"),
    )


data_skew_audit.__doc__ = data_skew_audit.__doc__.format(p=_SKEW_PARTS)


# ---------------------------------------------------------------------------
# Temporal consistency: overlapping claim intervals for functional predicates
# ---------------------------------------------------------------------------

_CONF_BAND = 128  # time band width; max claim span is 20 + 6*10 = 80 < band

_CLAIMS_SQL = """
  SELECT doc_id AS claim_id,
         'e' || CAST(doc_id % 40 AS VARCHAR) AS subj,
         's' || CAST(doc_id % 5 AS VARCHAR) AS source,
         'v' || CAST(doc_id % 3 AS VARCHAR) AS obj,
         (doc_id * 17) % 400 AS vfrom,
         (doc_id * 17) % 400 + 20 + (doc_id % 7) * 10 AS vto
  FROM documents
"""


@register(
    "kg_temporal_conflicts",
    oracle=f"""
    WITH claims AS ({_CLAIMS_SQL})
    SELECT a.subj, a.claim_id AS claim_a, b.claim_id AS claim_b,
      a.source AS src_a, b.source AS src_b,
      a.obj AS obj_a, b.obj AS obj_b,
      CAST(greatest(a.vfrom, b.vfrom) AS BIGINT) AS overlap_from,
      CAST(least(a.vto, b.vto) AS BIGINT) AS overlap_to
    FROM claims a JOIN claims b
      ON a.subj = b.subj AND a.claim_id < b.claim_id
    WHERE a.vfrom <= b.vto AND b.vfrom <= a.vto AND a.obj <> b.obj
    """,
)
def kg_temporal_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal-KG consistency audit: for a FUNCTIONAL predicate
    (kg_predicate_stats decides which), two claims about the same
    subject whose validity intervals overlap while asserting
    different objects are a contradiction — the temporal complement
    of the static SHACL conformance report (kg_shacl_check validates
    shapes at one instant; this validates the timeline, the check
    SCD-style edge maintenance and truth discovery depend on). The
    oracle states the naive interval self-join; the plan executes it
    as a BANDED equi-join (the kg_window_comention discipline):
    claims explode to their covered floor(t/{band}) time bands
    (claim spans are < {band}, so <= 2 bands each), join on
    (subj, band), and each qualifying pair survives exactly once via
    the canonical band == floor(overlap_from/{band}) filter — fanout
    is bounded by per-(subject, band) claim density, never
    claims-per-subject squared across all time. All integer/string
    output, no float gate.
    """
    docs = _docs(spark, sf_dir).select("doc_id")
    claims = docs.select(
        F.col("doc_id").alias("claim_id"),
        F.concat(F.lit("e"), (F.col("doc_id") % 40).cast("string")).alias("subj"),
        F.concat(F.lit("s"), (F.col("doc_id") % 5).cast("string")).alias("source"),
        F.concat(F.lit("v"), (F.col("doc_id") % 3).cast("string")).alias("obj"),
        ((F.col("doc_id") * 17) % 400).alias("vfrom"),
        ((F.col("doc_id") * 17) % 400 + 20 + (F.col("doc_id") % 7) * 10).alias(
            "vto"
        ),
    )

    def banded(side: str):
        return claims.select(
            *[F.col(c).alias(f"{c}_{side}") for c in claims.columns if c != "subj"],
            "subj",
            F.explode(
                F.sequence(
                    F.floor(F.col("vfrom") / _CONF_BAND),
                    F.floor(F.col("vto") / _CONF_BAND),
                )
            ).alias("band"),
        )

    a, b = banded("a"), banded("b")
    return (
        a.join(b, ["subj", "band"])
        .where(
            (F.col("claim_id_a") < F.col("claim_id_b"))
            & (F.col("vfrom_a") <= F.col("vto_b"))
            & (F.col("vfrom_b") <= F.col("vto_a"))
            & (F.col("obj_a") != F.col("obj_b"))
            & (
                F.col("band")
                == F.floor(
                    F.greatest(F.col("vfrom_a"), F.col("vfrom_b")) / _CONF_BAND
                )
            )
        )
        .select(
            "subj",
            F.col("claim_id_a").alias("claim_a"),
            F.col("claim_id_b").alias("claim_b"),
            F.col("source_a").alias("src_a"),
            F.col("source_b").alias("src_b"),
            F.col("obj_a"),
            F.col("obj_b"),
            F.greatest(F.col("vfrom_a"), F.col("vfrom_b"))
            .cast("long")
            .alias("overlap_from"),
            F.least(F.col("vto_a"), F.col("vto_b")).cast("long").alias("overlap_to"),
        )
    )


kg_temporal_conflicts.__doc__ = kg_temporal_conflicts.__doc__.format(
    band=_CONF_BAND
)


# ---------------------------------------------------------------------------
# Z-order (Morton-curve) layout audit — the sort-order decision for
# multi-dimensional scan pruning, quantified
# ---------------------------------------------------------------------------

_Z_BITS = 4  # 16 buckets per dimension, 8-bit z-values, 16 shards
_Z_BOX = (4, 7)  # the quartile x quartile probe box on both dims


def _z_bucket_sql(col: str, mx: str) -> str:
    return (
        f"CAST(least({(1 << _Z_BITS) - 1}, "
        f"floor({col} * {1 << _Z_BITS}.0 / ({mx} + 1))) AS INTEGER)"
    )


def _z_interleave_sql(b1: str, b2: str) -> str:
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({b1} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({b2} >> {i}) & 1) << {2 * i})")
    return "(" + " + ".join(terms) + ")"


@register(
    "data_zorder_layout",
    oracle=f"""
    WITH m AS (
      SELECT max(l_partkey) AS mp, max(l_suppkey) AS ms FROM lineitem
    ),
    b AS (
      SELECT {_z_bucket_sql('l_partkey', 'm.mp')} AS b1,
             {_z_bucket_sql('l_suppkey', 'm.ms')} AS b2
      FROM lineitem CROSS JOIN m
    ),
    rows_ AS (
      SELECT b1, b2,
        CASE WHEN b1 BETWEEN {_Z_BOX[0]} AND {_Z_BOX[1]}
              AND b2 BETWEEN {_Z_BOX[0]} AND {_Z_BOX[1]}
          THEN 1 ELSE 0 END AS in_box,
        {_z_interleave_sql('b1', 'b2')} >> {_Z_BITS} AS z_shard
      FROM b
    ),
    assigned AS (
      SELECT 'zorder' AS layout, z_shard AS shard, b1, b2, in_box FROM rows_
      UNION ALL
      SELECT 'range-dim1', b1, b1, b2, in_box FROM rows_
    ),
    shards AS (
      SELECT layout, shard, count(*) AS n, sum(in_box) AS n_match,
        min(b1) AS min1, max(b1) AS max1, min(b2) AS min2, max(b2) AS max2
      FROM assigned GROUP BY 1, 2
    )
    SELECT layout,
      CAST(count(*) AS BIGINT) AS n_shards,
      CAST(sum(CASE WHEN min1 <= {_Z_BOX[1]} AND max1 >= {_Z_BOX[0]}
                 AND min2 <= {_Z_BOX[1]} AND max2 >= {_Z_BOX[0]}
               THEN 1 ELSE 0 END) AS BIGINT) AS shards_scanned,
      CAST(sum(CASE WHEN min1 <= {_Z_BOX[1]} AND max1 >= {_Z_BOX[0]}
                 AND min2 <= {_Z_BOX[1]} AND max2 >= {_Z_BOX[0]}
               THEN n ELSE 0 END) AS BIGINT) AS rows_scanned,
      CAST(sum(n_match) AS BIGINT) AS rows_matching,
      round(CAST(sum(CASE WHEN min1 <= {_Z_BOX[1]} AND max1 >= {_Z_BOX[0]}
                      AND min2 <= {_Z_BOX[1]} AND max2 >= {_Z_BOX[0]}
                    THEN n ELSE 0 END) AS DOUBLE) / sum(n), 6)
        AS scan_fraction
    FROM shards GROUP BY layout
    """,
)
def data_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) vs single-dimension range layout,
    quantified by min/max scan pruning for a 2-d box predicate —
    THE data-layout decision for multi-dimensional workloads
    (Delta/Iceberg OPTIMIZE ZORDER BY): interleaving the bucket bits
    of both dims gives every shard a tight bounding box in BOTH
    dimensions, so a quartile x quartile probe prunes to ~1/16 of
    shards where the dim1-range layout still scans 1/4 (it can prune
    on dim1 only). The sibling audit to data_manifest_pruning, which
    quantified hash vs range clustering on ONE dimension.

    Scale shape: ONE audit scan of a 2-column projection — both
    layouts' shard assignments are emitted per row in the projection
    (a 2x explode, never a per-layout pass or any sort; a real
    OPTIMIZE would shuffle on the computed key, the AUDIT never
    needs to), one map-side-combined (layout, shard) agg builds the
    min/max stats table (32 rows at any corpus size), and the
    pruning arithmetic runs over that. The only other pass is the
    2-column max-stats agg feeding the bucket scale — which a real
    deployment reads from parquet footer min/max metadata for free.
    All-integer buckets (floor of a <2^53 product), all-integer bit
    interleave."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey"
    )
    m = li.agg(
        F.max("l_partkey").alias("mp"), F.max("l_suppkey").alias("ms")
    )
    cap = (1 << _Z_BITS) - 1

    def bucket(col, mx):
        return F.least(
            F.lit(cap),
            F.floor(col * (1 << _Z_BITS) / (mx + 1)),
        ).cast("int")

    b = li.crossJoin(F.broadcast(m)).select(
        bucket(F.col("l_partkey"), F.col("mp")).alias("b1"),
        bucket(F.col("l_suppkey"), F.col("ms")).alias("b2"),
    )
    z = None
    for i in range(_Z_BITS):
        t1 = F.shiftleft(
            F.shiftright(F.col("b1"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        t2 = F.shiftleft(
            F.shiftright(F.col("b2"), i).bitwiseAND(F.lit(1)), 2 * i
        )
        z = t1 + t2 if z is None else z + t1 + t2
    lo, hi = _Z_BOX
    in_box = F.when(
        F.col("b1").between(lo, hi) & F.col("b2").between(lo, hi), 1
    ).otherwise(0)
    rows = b.select(
        "b1", "b2", in_box.alias("in_box"),
        F.shiftright(z, _Z_BITS).alias("z_shard"),
    )
    assigned = rows.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.col("z_shard").alias("shard"),
                ),
                F.struct(
                    F.lit("range-dim1").alias("layout"),
                    F.col("b1").alias("shard"),
                ),
            )
        ).alias("ls"),
        "b1", "b2", "in_box",
    ).select(
        F.col("ls.layout").alias("layout"),
        F.col("ls.shard").alias("shard"),
        "b1", "b2", "in_box",
    )
    shards = assigned.groupBy("layout", "shard").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("in_box").alias("n_match"),
        F.min("b1").alias("min1"), F.max("b1").alias("max1"),
        F.min("b2").alias("min2"), F.max("b2").alias("max2"),
    )
    hit = (
        (F.col("min1") <= hi) & (F.col("max1") >= lo)
        & (F.col("min2") <= hi) & (F.col("max2") >= lo)
    )
    return shards.groupBy("layout").agg(
        F.count(F.lit(1)).cast("long").alias("n_shards"),
        F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("shards_scanned"),
        F.sum(F.when(hit, F.col("n")).otherwise(0))
        .cast("long")
        .alias("rows_scanned"),
        F.sum("n_match").cast("long").alias("rows_matching"),
        F.round(
            F.sum(F.when(hit, F.col("n")).otherwise(0)).cast("double")
            / F.sum("n"),
            6,
        ).alias("scan_fraction"),
    )


# ---------------------------------------------------------------------------
# Exact equi-depth range-partition planning (balanced split points)
# ---------------------------------------------------------------------------

_RANGE_BUCKETS = 8


def _split_points_sql() -> str:
    qs = ", ".join(
        f"quantile_cont(k, {i}.0 / {_RANGE_BUCKETS}) AS q{i}"
        for i in range(1, _RANGE_BUCKETS)
    )
    edges = ["CAST('-Infinity' AS DOUBLE)"] + [
        f"q{i}" for i in range(1, _RANGE_BUCKETS)
    ] + ["CAST('Infinity' AS DOUBLE)"]
    cases = " ".join(
        f"WHEN k >= {edges[i]} AND k < {edges[i + 1]} THEN {i}"
        for i in range(_RANGE_BUCKETS)
    )
    return f"""
    WITH keyed AS (
      SELECT {md5_long_sql("CAST(l_orderkey AS VARCHAR) || '#' || CAST(l_linenumber AS VARCHAR)")}
        AS k
      FROM lineitem
    ),
    th AS (SELECT {qs} FROM keyed),
    assigned AS (
      SELECT CASE {cases} END AS bucket, k
      FROM keyed CROSS JOIN th
    ),
    counts AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
        CAST(min(k) AS BIGINT) AS min_key, CAST(max(k) AS BIGINT) AS max_key
      FROM assigned GROUP BY bucket
    ),
    tot AS (SELECT sum(n_rows) AS n, count(*) AS nb FROM counts)
    SELECT CAST(bucket AS INTEGER) AS bucket, n_rows, min_key, max_key,
      round(CAST(n_rows AS DOUBLE) * nb / n, 6) AS balance_ratio
    FROM counts CROSS JOIN tot
    """


@register("data_range_split_points", oracle=_split_points_sql())
def data_range_split_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-depth range-partition planning: {b}-quantile split
    points over a hashed sort key, then the per-bucket row counts
    and balance ratios that PROVE the layout is balanced — the exact
    version of what Spark's RangePartitioner estimates by sampling,
    and the boundary table a bucketed/range-sorted table write needs
    up front (data_skew_audit says WHEN the current layout is bad;
    this computes the replacement boundaries).

    Scale shape: the key materializes in the scan projection; the
    {bm1} thresholds are ONE exact-percentile pass (quantile_cont /
    percentile parity, the rel_percentile_stats discipline)
    broadcast back as a 1-row dim; bucket assignment is a CASE chain
    in the projection and the audit is one map-side-combined keyed
    agg — the corpus is never sorted (the point: you get the sorted
    layout's boundaries WITHOUT paying a global sort to discover
    them). balance_ratio = n_rows * n_buckets / total, ~1.0
    everywhere by construction of equi-depth boundaries."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber"
    )
    keyed = li.select(
        md5_long(
            F.concat(
                F.col("l_orderkey").cast("string"),
                F.lit("#"),
                F.col("l_linenumber").cast("string"),
            )
        ).alias("k")
    )
    th = keyed.agg(
        *[
            F.percentile("k", i / _RANGE_BUCKETS).alias(f"q{i}")
            for i in range(1, _RANGE_BUCKETS)
        ]
    )
    edges = (
        [F.lit(float("-inf"))]
        + [F.col(f"q{i}") for i in range(1, _RANGE_BUCKETS)]
        + [F.lit(float("inf"))]
    )
    bucket = None
    for i in range(_RANGE_BUCKETS):
        cond = (F.col("k") >= edges[i]) & (F.col("k") < edges[i + 1])
        bucket = (
            F.when(cond, i) if bucket is None else bucket.when(cond, i)
        )
    assigned = keyed.crossJoin(F.broadcast(th)).select(
        bucket.alias("bucket"), "k"
    )
    # the 8-row bucket table has two consumers (totals + the final
    # join) — checkpoint it so the assignment pass runs once
    counts = (
        assigned.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("k").cast("long").alias("min_key"),
            F.max("k").cast("long").alias("max_key"),
        )
        .localCheckpoint(eager=False)
    )
    tot = counts.agg(
        F.sum("n_rows").alias("n"), F.count(F.lit(1)).alias("nb")
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        F.col("bucket").cast("int").alias("bucket"),
        "n_rows", "min_key", "max_key",
        F.round(
            F.col("n_rows").cast("double") * F.col("nb") / F.col("n"), 6
        ).alias("balance_ratio"),
    )


data_range_split_points.__doc__ = data_range_split_points.__doc__.format(
    b=_RANGE_BUCKETS, bm1=_RANGE_BUCKETS - 1
)


# ---------------------------------------------------------------------------
# Greedy k-center coreset selection (Gonzalez farthest-point)
# ---------------------------------------------------------------------------

_KC_ROUNDS = 4  # greedy selections after the seed -> 5 centers total


def _kcenter_sql() -> str:
    parts = [
        (
            "exploded AS MATERIALIZED ("
            "SELECT vec_id, generate_subscripts(embedding, 1) AS dim, "
            "CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings)"
        ),
        (
            "c0 AS MATERIALIZED (SELECT vec_id, 0 AS sel_round, "
            "0.0 AS radius FROM embeddings ORDER BY vec_id ASC LIMIT 1)"
        ),
    ]
    for r in range(1, _KC_ROUNDS + 1):
        parts += [
            (
                f"d{r} AS MATERIALIZED (SELECT e.vec_id, c.vec_id AS c_id, "
                f"sum((e.x - ce.x) * (e.x - ce.x)) AS d2 "
                f"FROM exploded e CROSS JOIN c{r - 1} c "
                f"JOIN exploded ce ON ce.vec_id = c.vec_id AND ce.dim = e.dim "
                f"GROUP BY e.vec_id, c.vec_id)"
            ),
            (
                f"m{r} AS MATERIALIZED (SELECT vec_id, min(round(d2, 6)) "
                f"AS mind FROM d{r} GROUP BY vec_id)"
            ),
            (
                f"s{r} AS MATERIALIZED (SELECT vec_id, {r} AS sel_round, "
                f"mind AS radius FROM m{r} "
                f"ORDER BY mind DESC, vec_id ASC LIMIT 1)"
            ),
            (
                f"c{r} AS MATERIALIZED (SELECT * FROM c{r - 1} "
                f"UNION ALL SELECT * FROM s{r})"
            ),
        ]
    return (
        "WITH " + ",\n".join(parts)
        + f"""
    SELECT CAST(sel_round AS INTEGER) AS sel_round, vec_id,
      round(radius, 6) AS radius
    FROM c{_KC_ROUNDS}"""
    )


@register("data_kcenter_coreset", oracle=_kcenter_sql())
def data_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez farthest-point,
    the 2-approximation): seed with the min-id vector, then {r}
    rounds of "select the point farthest from every center chosen so
    far" — the diversity-maximizing data-pruning primitive (a
    k-center coreset covers the embedding space with the fewest
    points, the opposite failure mode of random sampling, which
    oversamples dense clusters and misses the tails a robust model
    needs). Output: each center with its selection round and RADIUS
    (the max-min squared L2 distance at the moment it was chosen) —
    the radii trace is non-increasing and upper-bounds the final
    coverage radius, so it doubles as the "how many centers do I
    need" elbow curve.

    Scale shape: greedy k-center is inherently K sequential passes —
    each round is ONE corpus scan: the corpus cross-joins the
    BROADCAST <= {k}-row center table (never corpus x corpus),
    min-distance is a map-side-combined agg grouped by (vec_id,
    embedding), and the argmax is a 1-row global agg via
    max(struct(mind, -vec_id, ...)) so the new center's embedding
    rides along in the struct (no second scan to fetch it). The
    center table is localCheckpoint()ed per round (the iterative
    family's lineage-truncation rule). Distances are rounded to 6
    BEFORE the min/argmax, and ties break on vec_id — the
    adamic-adar regime: selection is pinned cross-engine even when
    two points are equidistant."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    seed = emb.orderBy(F.col("vec_id").asc()).limit(1)
    centers = seed.select(
        F.lit(0).alias("sel_round"),
        "vec_id",
        F.lit(0.0).alias("radius"),
        F.col("embedding").alias("c_emb"),
    ).localCheckpoint(eager=True)

    d2 = F.aggregate(
        F.zip_with(
            "embedding",
            "c_emb",
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    for r in range(1, _KC_ROUNDS + 1):
        mind = (
            emb.crossJoin(F.broadcast(centers.select("c_emb")))
            .select("vec_id", "embedding", F.round(d2, 6).alias("d2"))
            .groupBy("vec_id", "embedding")
            .agg(F.min("d2").alias("mind"))
        )
        sel = mind.agg(
            F.max(
                F.struct(
                    F.col("mind"),
                    (-F.col("vec_id")).alias("nid"),
                    F.col("vec_id").alias("vid"),
                    F.col("embedding").alias("emb"),
                )
            ).alias("m")
        ).select(
            F.lit(r).alias("sel_round"),
            F.col("m.vid").alias("vec_id"),
            F.col("m.mind").alias("radius"),
            F.col("m.emb").alias("c_emb"),
        )
        centers = centers.union(sel).localCheckpoint(eager=True)
    return centers.select(
        F.col("sel_round").cast("int").alias("sel_round"),
        "vec_id",
        F.round("radius", 6).alias("radius"),
    )


data_kcenter_coreset.__doc__ = data_kcenter_coreset.__doc__.format(
    r=_KC_ROUNDS, k=_KC_ROUNDS + 1
)


# ---------------------------------------------------------------------------
# Sample-representativeness audit (hash vs systematic sampler)
# ---------------------------------------------------------------------------

_SAMPLE_MOD = 20


def _sample_bias_sql() -> str:
    h = md5_long_sql("CAST(doc_id AS VARCHAR)")
    return f"""
    WITH per_lang AS (
      SELECT lang, count(*) AS n_full,
        sum(CASE WHEN {h} % {_SAMPLE_MOD} = 0 THEN 1 ELSE 0 END) AS n_hash,
        sum(CASE WHEN doc_id % {_SAMPLE_MOD} = 0 THEN 1 ELSE 0 END) AS n_sys
      FROM documents GROUP BY lang
    ),
    tot AS (
      SELECT sum(n_full) AS t_full, sum(n_hash) AS t_hash, sum(n_sys) AS t_sys
      FROM per_lang
    ),
    legs AS (
      SELECT 'hash' AS sampler, lang, n_full, n_hash AS n_sample,
        CAST(t_hash AS DOUBLE) / t_full AS p
      FROM per_lang CROSS JOIN tot
      UNION ALL
      SELECT 'systematic', lang, n_full, n_sys,
        CAST(t_sys AS DOUBLE) / t_full
      FROM per_lang CROSS JOIN tot
    )
    SELECT sampler, lang, CAST(n_full AS BIGINT) AS n_full,
      CAST(n_sample AS BIGINT) AS n_sample,
      round(n_full * p, 6) AS expected,
      round((n_sample - n_full * p) / sqrt(n_full * p * (1 - p)), 6)
        AS residual_z,
      abs((n_sample - n_full * p) / sqrt(n_full * p * (1 - p))) > 3.0
        AS is_biased
    FROM legs
    """


@register("data_sample_bias_audit", oracle=_sample_bias_sql())
def data_sample_bias_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-representativeness audit: per language stratum, the
    observed-vs-expected count and binomial standardized residual
    for TWO 1/{m} samplers side by side — md5-hash selection (the
    repo's sampling convention) and naive systematic doc_id % {m}
    selection. Hash sampling is uniform w.r.t. any attribute not
    derived from the hash, so its residuals certify the sample a
    downstream eval/debug workflow trusts; systematic selection
    aliases with any id-periodic attribute (ingestion batches,
    round-robin shards, this corpus's lang assignment) — the audit
    is the check that catches it BEFORE a biased 1% sample poisons
    an eval. |z| > 3 flags a stratum.

    Scale shape: ONE corpus scan with two conditional sums per
    stratum (map-side combined, stratum-dictionary output); totals
    are a 1-row broadcast; both samplers' report rows project from
    the same dictionary (union of two projections, no second pass).
    z derives from exact integer counts in one fixed-order float
    expression."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    )
    in_hash = (
        md5_long(F.col("doc_id").cast("string")) % _SAMPLE_MOD == 0
    ).cast("long")
    in_sys = (F.col("doc_id") % _SAMPLE_MOD == 0).cast("long")
    per_lang = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_full"),
        F.sum(in_hash).alias("n_hash"),
        F.sum(in_sys).alias("n_sys"),
    ).localCheckpoint(eager=False)  # two consumers: totals + report
    tot = per_lang.agg(
        F.sum("n_full").alias("t_full"),
        F.sum("n_hash").alias("t_hash"),
        F.sum("n_sys").alias("t_sys"),
    )
    wide = per_lang.crossJoin(F.broadcast(tot))

    def leg(name: str, n_col: str, t_col: str) -> DataFrame:
        p = F.col(t_col).cast("double") / F.col("t_full")
        z = (F.col(n_col) - F.col("n_full") * p) / F.sqrt(
            F.col("n_full") * p * (1 - p)
        )
        return wide.select(
            F.lit(name).alias("sampler"),
            "lang",
            F.col("n_full").cast("long").alias("n_full"),
            F.col(n_col).cast("long").alias("n_sample"),
            F.round(F.col("n_full") * p, 6).alias("expected"),
            F.round(z, 6).alias("residual_z"),
            (F.abs(z) > 3.0).alias("is_biased"),
        )

    return leg("hash", "n_hash", "t_hash").union(
        leg("systematic", "n_sys", "t_sys")
    )


data_sample_bias_audit.__doc__ = data_sample_bias_audit.__doc__.format(
    m=_SAMPLE_MOD
)


# ---------------------------------------------------------------------------
# Dataloader shuffle-quality audit (adjacent same-host clustering)
# ---------------------------------------------------------------------------


def _shuffle_quality_sql() -> str:
    h = md5_long_sql("CAST(doc_id AS VARCHAR) || '#ep' || CAST(epoch AS VARCHAR)")
    host = (
        "CASE WHEN doc_id % 10 < 3 THEN 'hot.example.com' "
        "ELSE 'h' || CAST(doc_id % 50 AS VARCHAR) || '.example.org' END"
    )
    return f"""
    WITH e AS (
      SELECT doc_id, {host} AS host, unnest([0, 1]) AS epoch FROM documents
    ),
    keyed AS (
      SELECT doc_id, host, epoch, {h} AS h,
        {h} % {_N_EPOCH_SHARDS} AS shard
      FROM e
    ),
    lagged AS (
      SELECT epoch, shard, host,
        lag(host) OVER (PARTITION BY epoch, shard ORDER BY h, doc_id)
          AS prev_host
      FROM keyed
    ),
    obs AS (
      SELECT epoch, shard, count(*) AS n_docs,
        sum(CASE WHEN host = prev_host THEN 1 ELSE 0 END) AS n_same
      FROM lagged GROUP BY epoch, shard
    ),
    hd AS (
      SELECT epoch, shard, host, count(*) AS m FROM keyed GROUP BY 1, 2, 3
    ),
    exp AS (
      SELECT epoch, shard,
        CAST(sum(m * (m - 1)) AS DOUBLE) / sum(m) AS expected
      FROM hd GROUP BY epoch, shard
    )
    SELECT o.epoch, CAST(o.shard AS INTEGER) AS shard,
      CAST(o.n_docs AS BIGINT) AS n_docs,
      CAST(o.n_same AS BIGINT) AS n_same_host_adjacent,
      round(x.expected, 6) AS expected,
      CASE WHEN x.expected = 0 THEN 0.0
        ELSE round(o.n_same / x.expected, 6) END AS lift
    FROM obs o JOIN exp x ON o.epoch = x.epoch AND o.shard = x.shard
    """


@register("data_shuffle_quality", oracle=_shuffle_quality_sql())
def data_shuffle_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataloader shuffle-quality audit over data_epoch_order's OWN
    permutation (same hash, same shards, same (h, doc_id) order):
    within every (epoch, shard), the count of ADJACENT training
    examples sharing a host, against the closed-form expectation
    under a uniform random permutation (sum_h m_h(m_h-1)/m — the
    birthday count for adjacency). Gradient noise assumptions break
    when correlated documents arrive back-to-back; lift >> 1 says
    the "shuffle" clusters sources and the epoch ordering needs a
    better hash, lift ~ 1 certifies it (hash permutations should sit
    at 1 up to sampling noise — the pytest pins a planted
    sorted-by-host order flagging high).

    Scale shape: the permutation is audited per (epoch, shard) — the
    position window sorts one output file's worth of ids per task,
    exactly like data_epoch_order itself (never a global sort);
    observed counts are one lag comparison in that window; the
    expectation is one (epoch, shard, host) dictionary agg. Exact
    integers until the final division."""
    from pyspark.sql import Window

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    host = F.when(F.col("doc_id") % 10 < 3, F.lit("hot.example.com")).otherwise(
        F.concat(
            F.lit("h"), (F.col("doc_id") % 50).cast("string"), F.lit(".example.org")
        )
    )
    e = docs.select(
        "doc_id",
        host.alias("host"),
        F.explode(F.array(F.lit(0), F.lit(1))).alias("epoch"),
    )
    h = md5_long(
        F.concat(
            F.col("doc_id").cast("string"),
            F.lit("#ep"),
            F.col("epoch").cast("string"),
        )
    )
    keyed = e.select(
        "doc_id", "host", "epoch", h.alias("h"),
        F.pmod(h, F.lit(_N_EPOCH_SHARDS)).alias("shard"),
    ).localCheckpoint(eager=False)  # two consumers: adjacency + expectation
    w = Window.partitionBy("epoch", "shard").orderBy("h", "doc_id")
    obs = (
        keyed.select(
            "epoch", "shard", "host", F.lag("host").over(w).alias("prev_host")
        )
        .groupBy("epoch", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("host") == F.col("prev_host"), 1).otherwise(0)
            ).alias("n_same"),
        )
    )
    exp = (
        keyed.groupBy("epoch", "shard", "host")
        .agg(F.count(F.lit(1)).alias("m"))
        .groupBy("epoch", "shard")
        .agg(
            (
                F.sum(F.col("m") * (F.col("m") - 1)).cast("double") / F.sum("m")
            ).alias("expected")
        )
    )
    return obs.join(exp, ["epoch", "shard"]).select(
        "epoch",
        F.col("shard").cast("int").alias("shard"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_same").cast("long").alias("n_same_host_adjacent"),
        F.round("expected", 6).alias("expected"),
        F.when(F.col("expected") == 0, F.lit(0.0))
        .otherwise(F.round(F.col("n_same") / F.col("expected"), 6))
        .alias("lift"),
    )


# ---------------------------------------------------------------------------
# Column-statistics profile (Deequ-style table profiler)
# ---------------------------------------------------------------------------

_PROFILE_COLS = [
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax",
]


def _profile_sql() -> str:
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            f"count({c}) AS nn_{c}",
            f"count(DISTINCT {c}) AS nd_{c}",
            f"CAST(min({c}) AS DOUBLE) AS mn_{c}",
            f"CAST(max({c}) AS DOUBLE) AS mx_{c}",
            f"sum(CAST({c} AS DECIMAL(18,4))) AS sm_{c}",
        ]
    legs = "\n      UNION ALL ".join(
        f"SELECT '{c}' AS column_name, CAST(n AS BIGINT) AS n_rows, "
        f"CAST(n - nn_{c} AS BIGINT) AS n_null, "
        f"CAST(nd_{c} AS BIGINT) AS n_distinct, "
        f"round(mn_{c}, 6) AS min_value, round(mx_{c}, 6) AS max_value, "
        f"round(CAST(sm_{c} AS DOUBLE) / nn_{c}, 6) AS mean_value FROM m"
        for c in _PROFILE_COLS
    )
    return f"""
    WITH m AS (
      SELECT count(*) AS n, {", ".join(aggs)}
      FROM lineitem
    )
    {legs}
    """


@register("data_profile_columns", oracle=_profile_sql())
def data_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ/Great-Expectations-style COLUMN PROFILE of the fact
    table: per numeric column, row/null/distinct counts, min, max,
    and mean — the one-pass statistics sheet a data contract is
    written against, and the discovery step data_quality_checks
    presupposes (you cannot assert a range until a profile told you
    the range). Means are EXACT: every column sums through
    DECIMAL(18,4) (the rel_pricing_summary discipline — shuffle
    order cannot perturb a decimal sum), and the division to double
    happens once per column at the end.

    Scale shape: ONE corpus scan computes all {n} columns' counters
    in a single map-side-combined aggregate (count-distincts expand
    to the standard Spark multi-distinct plan); the profile rows are
    projections from that 1-row aggregate — a {n}-row report at any
    corpus size."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.min(c).cast("double").alias(f"mn_{c}"),
            F.max(c).cast("double").alias(f"mx_{c}"),
            F.sum(F.col(c).cast("decimal(18,4)")).alias(f"sm_{c}"),
        ]
    m = li.agg(*aggs).localCheckpoint(eager=False)  # one leg per column

    def leg(c: str) -> DataFrame:
        return m.select(
            F.lit(c).alias("column_name"),
            F.col("n").cast("long").alias("n_rows"),
            (F.col("n") - F.col(f"nn_{c}")).cast("long").alias("n_null"),
            F.col(f"nd_{c}").cast("long").alias("n_distinct"),
            F.round(F.col(f"mn_{c}"), 6).alias("min_value"),
            F.round(F.col(f"mx_{c}"), 6).alias("max_value"),
            F.round(
                F.col(f"sm_{c}").cast("double") / F.col(f"nn_{c}"), 6
            ).alias("mean_value"),
        )

    out = leg(_PROFILE_COLS[0])
    for c in _PROFILE_COLS[1:]:
        out = out.union(leg(c))
    return out


data_profile_columns.__doc__ = data_profile_columns.__doc__.format(
    n=len(_PROFILE_COLS)
)


# ---------------------------------------------------------------------------
# Right-to-be-forgotten deletion-impact report
# ---------------------------------------------------------------------------

_FORGET_MOD = 50


def _deletion_impact_sql() -> str:
    def forget(key: str) -> str:
        return f"{md5_long_sql(f'CAST({key} AS VARCHAR)')} % {_FORGET_MOD} = 0"

    return f"""
    WITH cust AS (
      SELECT CAST(count(*) AS BIGINT) AS n_total,
        CAST(sum(CASE WHEN {forget('c_custkey')} THEN 1 ELSE 0 END)
             AS BIGINT) AS n_affected
      FROM customer
    ),
    ords AS (
      SELECT CAST(count(*) AS BIGINT) AS n_total,
        CAST(sum(CASE WHEN {forget('o_custkey')} THEN 1 ELSE 0 END)
             AS BIGINT) AS n_affected
      FROM orders
    ),
    aff_orders AS (
      SELECT o_orderkey FROM orders WHERE {forget('o_custkey')}
    ),
    li AS (
      SELECT CAST(count(*) AS BIGINT) AS n_total,
        CAST(sum(CASE WHEN a.o_orderkey IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_affected
      FROM lineitem l LEFT JOIN aff_orders a ON l.l_orderkey = a.o_orderkey
    ),
    ev AS (
      SELECT CAST(count(*) AS BIGINT) AS n_total,
        CAST(sum(CASE WHEN {forget('user_id')} THEN 1 ELSE 0 END)
             AS BIGINT) AS n_affected
      FROM events
    ),
    legs AS (
      SELECT 'customer' AS table_name, 0 AS hop, * FROM cust
      UNION ALL SELECT 'orders', 1, * FROM ords
      UNION ALL SELECT 'lineitem', 2, * FROM li
      UNION ALL SELECT 'events', 0, * FROM ev
    )
    SELECT table_name, CAST(hop AS INTEGER) AS hop, n_total, n_affected,
      round(CAST(n_affected AS DOUBLE) / n_total, 6) AS affected_pct
    FROM legs
    """


@register("data_deletion_impact", oracle=_deletion_impact_sql())
def data_deletion_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten DELETION-IMPACT report: given a
    deterministic forget-set (subject keys with md5 % {m} == 0 — in
    production, the erasure-request list), the rows each warehouse
    table would lose, with the referential CASCADE made explicit —
    customers (hop 0) pull their orders (hop 1, the FK), orders pull
    their line items (hop 2, the fact rows with NO subject key of
    their own, reachable only through the join), and the event
    stream deletes by its own subject key. This is the sizing step
    every GDPR/CCPA erasure pipeline runs before the MERGE/DELETE
    (operators.materialize) executes, and the lineitem leg is the
    reason a compliance sweep cannot be a per-table WHERE: the
    affected rows are defined by a JOIN.

    Scale shape: hop-0 legs are pure scan aggregates (the forget
    predicate is hashing in the projection); the hop-2 leg is one
    keyed LEFT semi-style join against the affected-orders key set
    (shuffles on the order key; broadcastable when the forget
    fraction is small); the report is 4 rows."""
    def forget(col):
        return md5_long(col.cast("string")) % _FORGET_MOD == 0

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum(F.when(forget(F.col("c_custkey")), 1).otherwise(0))
        .cast("long")
        .alias("n_affected"),
    )
    orders_df = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    ).localCheckpoint(eager=False)  # counts + affected key set
    ords = orders_df.agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum(F.when(forget(F.col("o_custkey")), 1).otherwise(0))
        .cast("long")
        .alias("n_affected"),
    )
    aff = orders_df.where(forget(F.col("o_custkey"))).select("o_orderkey")
    li_df = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey")
    li = (
        li_df.join(
            aff.withColumnRenamed("o_orderkey", "l_orderkey").withColumn(
                "hit", F.lit(1)
            ),
            "l_orderkey",
            "left",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_total"),
            F.sum(F.when(F.col("hit").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_affected"),
        )
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum(F.when(forget(F.col("user_id")), 1).otherwise(0))
        .cast("long")
        .alias("n_affected"),
    )

    def leg(df, name, hop):
        return df.select(
            F.lit(name).alias("table_name"),
            F.lit(hop).cast("int").alias("hop"),
            "n_total",
            "n_affected",
            F.round(
                F.col("n_affected").cast("double") / F.col("n_total"), 6
            ).alias("affected_pct"),
        )

    return (
        leg(cust, "customer", 0)
        .union(leg(ords, "orders", 1))
        .union(leg(li, "lineitem", 2))
        .union(leg(ev, "events", 0))
    )


data_deletion_impact.__doc__ = data_deletion_impact.__doc__.format(m=_FORGET_MOD)


# ---------------------------------------------------------------------------
# Weighted reservoir sampling (Efraimidis-Spirakis A-ES keys)
# ---------------------------------------------------------------------------

_WSAMPLE_K = 20


@register(
    "text_weighted_reservoir",
    oracle=f"""
    WITH pri AS (
      SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
        ln((CAST({md5_long_sql("CAST(doc_id AS VARCHAR) || '#wsample'")}
             % 999999 AS DOUBLE) + 1) / 1000000.0)
          / len(string_split(text, ' ')) AS lnkey
      FROM documents
      WHERE len(string_split(text, ' ')) > 0
    ),
    top AS (SELECT * FROM pri ORDER BY lnkey DESC, doc_id LIMIT {_WSAMPLE_K})
    SELECT CAST(row_number() OVER (ORDER BY lnkey DESC, doc_id) AS BIGINT)
      AS sample_rank, doc_id, w, round(lnkey, 6) AS lnkey
    FROM top
    """,
)
def text_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHT-proportional sample without replacement (Efraimidis &
    Spirakis 2006, algorithm A-ES): each doc gets key u^(1/w) for a
    per-doc uniform u and weight w = token count; the top-{k} keys
    are a sample where inclusion probability is proportional to
    weight — i.e. sampling DOCUMENTS such that TOKENS are sampled
    (approximately) uniformly, the right frame for token-budget
    estimates (a 10k-token page should influence a corpus statistic
    250x more than a 40-token stub; text_reservoir_sample's uniform
    frame underweights it). Ranking by ln(u)/w (monotone in
    u^(1/w)) keeps the arithmetic to one ln and one division.

    Same replayable-randomness contract as the uniform reservoir:
    u is the md5 hash-uniform, so the sample is identical on replay
    / resume and the oracle re-derives every key. Scale shape:
    keys are a pure scan projection; top-{k} is orderBy().limit()
    — TakeOrderedAndProject, per-partition heaps + a {k}-row driver
    merge, never a global sort (plan-asserted); zero-token docs are
    out of frame (weight 0 = never sampled) by contract."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = F.size(F.split("text", " "))
    u = (
        (
            md5_long(F.concat(F.col("doc_id").cast("string"), F.lit("#wsample")))
            % 999999
        ).cast("double")
        + 1
    ) / 1000000.0
    pri = docs.where(w > 0).select(
        "doc_id",
        w.cast("long").alias("w"),
        (F.log(u) / w).alias("lnkey"),
    )
    top = pri.orderBy(F.col("lnkey").desc(), F.col("doc_id").asc()).limit(
        _WSAMPLE_K
    )
    from pyspark.sql import Window

    rk = F.row_number().over(
        Window.orderBy(F.col("lnkey").desc(), F.col("doc_id").asc())
    )
    return top.select(
        rk.cast("long").alias("sample_rank"),
        "doc_id",
        "w",
        F.round("lnkey", 6).alias("lnkey"),
    )


text_weighted_reservoir.__doc__ = text_weighted_reservoir.__doc__.format(
    k=_WSAMPLE_K
)


# ---------------------------------------------------------------------------
# KMV bottom-k sketch Jaccard between host vocabularies
# ---------------------------------------------------------------------------

_KMVJ_K = 8


@register(
    "web_kmv_host_jaccard",
    oracle=f"""
    WITH ht AS (
      SELECT DISTINCT {_FAM_HOST_SQL} AS host,
        {md5_long_sql("unnest(string_split(text, ' '))")} AS h
      FROM documents
    ),
    sk AS (
      SELECT host, list(h ORDER BY h)[1:{_KMVJ_K}] AS sketch,
        count(*) AS n_exact
      FROM (
        SELECT host, h, row_number() OVER (PARTITION BY host ORDER BY h)
          AS rk
        FROM ht
      ) ranked
      GROUP BY host
    ),
    pairs AS (
      SELECT a.host AS host_a, b.host AS host_b,
        a.sketch AS ska, b.sketch AS skb
      FROM sk a JOIN sk b ON a.host < b.host
    ),
    est AS (
      SELECT host_a, host_b,
        least({_KMVJ_K},
              len(list_distinct(list_concat(ska, skb)))) AS n_union_k,
        len(list_intersect(
          list_sort(list_distinct(list_concat(ska, skb)))[1:{_KMVJ_K}],
          list_intersect(ska, skb))) AS matches
      FROM pairs
    ),
    exact AS (
      SELECT a.host AS host_a, b.host AS host_b, count(*) AS inter
      FROM ht a JOIN ht b ON a.h = b.h AND a.host < b.host
      GROUP BY 1, 2
    ),
    sizes AS (SELECT host, count(*) AS sz FROM ht GROUP BY host)
    SELECT e.host_a, e.host_b,
      CAST(e.matches AS BIGINT) AS matches,
      CAST(e.n_union_k AS BIGINT) AS n_union_k,
      round(CAST(e.matches AS DOUBLE) / e.n_union_k, 6) AS est_jaccard,
      round(CAST(coalesce(x.inter, 0) AS DOUBLE)
            / (sa.sz + sb.sz - coalesce(x.inter, 0)), 6) AS exact_jaccard,
      round(abs(CAST(e.matches AS DOUBLE) / e.n_union_k
            - CAST(coalesce(x.inter, 0) AS DOUBLE)
              / (sa.sz + sb.sz - coalesce(x.inter, 0))), 6) AS abs_err
    FROM est e
    LEFT JOIN exact x ON e.host_a = x.host_a AND e.host_b = x.host_b
    JOIN sizes sa ON e.host_a = sa.host
    JOIN sizes sb ON e.host_b = sb.host
    """,
)
def web_kmv_host_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary Jaccard between every host pair from {k}-value KMV
    (bottom-k) sketches — the set-RESEMBLANCE estimator that rides
    the same bottom-k sketch text_kmv_cardinality keeps for sizes
    (Beyer et al., SIGMOD 2007): J_est = |U_k ∩ A_k ∩ B_k| / |U_k|,
    where U_k is the k smallest of the sketch union — because the k
    smallest hashes of A ∪ B are a uniform sample of the union, the
    fraction also present in both sketches estimates the Jaccard.
    The operational question it answers at crawl scale: WHICH host
    pairs publish near-identical vocabularies (mirror candidates,
    syndication networks) without ever joining the vocabularies —
    per-host state is k int64s regardless of vocabulary size. The
    EXACT Jaccard rides along as the eval column (computable here
    because the fixture's host count is bounded; at 10^8 hosts only
    the sketch column survives — the declared contract).

    Scale shape: sketches = one distinct (host, token-hash) pass +
    a bottom-k window PARTITIONED by host; the pair stage joins
    {k}-int arrays over the HOST dictionary; every estimator input
    is an exact integer (hash values, intersection counts) — the
    only floats are the final ratios."""
    docs = _docs(spark, sf_dir)
    ht = (
        docs.select(
            _fam_host_col().alias("host"),
            F.explode(F.split("text", " ")).alias("token"),
        )
        .select("host", md5_long(F.col("token")).alias("h"))
        .distinct()
        .localCheckpoint()  # consumed by sketches, exact-inter, sizes
    )
    from pyspark.sql import Window

    rk = F.row_number().over(Window.partitionBy("host").orderBy("h"))
    sk = (
        ht.withColumn("rk", rk)
        .where(F.col("rk") <= _KMVJ_K)
        .groupBy("host")
        .agg(F.sort_array(F.collect_list("h")).alias("sketch"))
        .localCheckpoint()
    )
    pairs = (
        sk.select(F.col("host").alias("host_a"), F.col("sketch").alias("ska"))
        .join(
            sk.select(F.col("host").alias("host_b"), F.col("sketch").alias("skb")),
            F.col("host_a") < F.col("host_b"),
        )
    )
    union_all = F.array_union(F.col("ska"), F.col("skb"))
    n_union_k = F.least(F.lit(_KMVJ_K), F.size(F.array_distinct(union_all)))
    u_k = F.slice(F.array_sort(F.array_distinct(union_all)), 1, _KMVJ_K)
    matches = F.size(
        F.array_intersect(u_k, F.array_intersect(F.col("ska"), F.col("skb")))
    )
    est = pairs.select(
        "host_a",
        "host_b",
        matches.cast("long").alias("matches"),
        n_union_k.cast("long").alias("n_union_k"),
    )
    exact = (
        ht.select(F.col("host").alias("host_a"), "h")
        .join(ht.select(F.col("host").alias("host_b"), "h"), "h")
        .where(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sizes = ht.groupBy("host").agg(F.count(F.lit(1)).alias("sz"))
    est_j = F.col("matches").cast("double") / F.col("n_union_k")
    inter = F.coalesce(F.col("inter"), F.lit(0))
    exact_j = inter.cast("double") / (F.col("sa") + F.col("sb") - inter)
    return (
        est.join(exact, ["host_a", "host_b"], "left")
        .join(
            F.broadcast(sizes.select(F.col("host").alias("host_a"), F.col("sz").alias("sa"))),
            "host_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("host").alias("host_b"), F.col("sz").alias("sb"))),
            "host_b",
        )
        .select(
            "host_a",
            "host_b",
            "matches",
            "n_union_k",
            F.round(est_j, 6).alias("est_jaccard"),
            F.round(exact_j, 6).alias("exact_jaccard"),
            F.round(F.abs(est_j - exact_j), 6).alias("abs_err"),
        )
    )


# ---------------------------------------------------------------------------
# SCD-2 point-in-time join (temporal dimension lookup)
# ---------------------------------------------------------------------------

_SCD2_VERSIONS_SQL = f"""
    s AS (
      SELECT sn.url, sn.ts_epoch, sn.doc_id, md5(d.text) AS content_md5
      FROM ({_SNAPS_SQL}) sn JOIN documents d ON sn.doc_id = d.doc_id
    ),
    seq AS (
      SELECT *, lag(content_md5)
        OVER (PARTITION BY url ORDER BY ts_epoch, doc_id) AS prev
      FROM s
    ),
    vers AS (
      SELECT url, ts_epoch, doc_id, content_md5 FROM seq
      WHERE prev IS NULL OR prev <> content_md5
    ),
    dim AS (
      SELECT url, content_md5,
        CAST(ts_epoch AS BIGINT) AS valid_from,
        CAST(lead(ts_epoch)
          OVER (PARTITION BY url ORDER BY ts_epoch, doc_id) AS BIGINT)
          AS valid_to
      FROM vers
    )
"""


@register(
    "rel_scd2_pointintime",
    oracle=f"""
    WITH {_SCD2_VERSIONS_SQL},
    facts AS (
      SELECT event_id,
        'https://' || CASE WHEN event_id % 125 % 10 < 3
             THEN 'hot.example.com'
             ELSE 'h' || CAST(event_id % 125 % 50 AS VARCHAR)
                  || '.example.org' END
          || '/doc/' || lpad(CAST(event_id % 125 AS VARCHAR), 6, '0') AS url,
        1767225600 + (event_id % 500) AS t
      FROM events
    )
    SELECT f.event_id, f.url, CAST(f.t AS BIGINT) AS t,
      d.content_md5, CAST(d.valid_from AS BIGINT) AS valid_from,
      d.valid_to IS NULL AS is_current_version
    FROM facts f
    JOIN dim d ON f.url = d.url
      AND d.valid_from <= f.t
      AND (d.valid_to IS NULL OR f.t < d.valid_to)
    """,
)
def rel_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCD-2 CONSUMPTION pattern: a point-in-time join of a fact
    stream onto the versioned dimension web_scd2_history builds —
    each fact (here: an event mapped onto the crawl's url timeline)
    picks the ONE version whose [valid_from, valid_to) interval
    contains its timestamp, the open current version matching
    everything after its valid_from. This is what the history table
    exists FOR ("what did the page say when the user saw it"), and
    the join shape — equi-join on the natural key PLUS a range
    predicate on the validity interval — is the warehouse-standard
    temporal lookup; facts predating a url's first version
    correctly match nothing (inner-join contract).

    Scale shape: the dimension is versions-per-key small (the SCD-2
    point: one row per CHANGE, not per snapshot) and BROADCASTS;
    the range predicate then filters the per-key version fan-in —
    never a time-range shuffle join of two fact-sized tables. The
    history build itself is the web_scd2_history plan (two per-url
    windows)."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    fam = F.col("doc_id") % 125
    url = F.concat(
        F.lit("https://"),
        _fam_host_col(),
        F.lit("/doc/"),
        F.lpad(fam.cast("string"), 6, "0"),
    )
    s = docs.select(
        url.alias("url"),
        (F.lit(1767225600) + F.col("doc_id")).cast("long").alias("ts_epoch"),
        "doc_id",
        F.md5("text").alias("content_md5"),
    )
    w = Window.partitionBy("url").orderBy("ts_epoch", "doc_id")
    vers = s.withColumn("prev", F.lag("content_md5").over(w)).where(
        F.col("prev").isNull() | (F.col("prev") != F.col("content_md5"))
    )
    dim = vers.select(
        "url",
        "content_md5",
        F.col("ts_epoch").cast("long").alias("valid_from"),
        F.lead("ts_epoch").over(w).cast("long").alias("valid_to"),
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    efam = F.col("event_id") % 125
    ehost = F.when(efam % 10 < 3, F.lit("hot.example.com")).otherwise(
        F.concat(F.lit("h"), (efam % 50).cast("string"), F.lit(".example.org"))
    )
    facts = ev.select(
        "event_id",
        F.concat(
            F.lit("https://"), ehost, F.lit("/doc/"),
            F.lpad(efam.cast("string"), 6, "0"),
        ).alias("url"),
        (F.lit(1767225600) + (F.col("event_id") % 500)).cast("long").alias("t"),
    )
    j = facts.join(
        F.broadcast(dim),
        (facts["url"] == dim["url"])
        & (dim["valid_from"] <= facts["t"])
        & (dim["valid_to"].isNull() | (facts["t"] < dim["valid_to"])),
    )
    return j.select(
        "event_id",
        facts["url"].alias("url"),
        "t",
        "content_md5",
        "valid_from",
        F.col("valid_to").isNull().alias("is_current_version"),
    )
