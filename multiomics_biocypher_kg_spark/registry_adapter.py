"""Reference-adapter query families: omics DE transform, declarative
multi-source merge, CURIE normalization, annotation quality — the
reference's core adapter semantics re-expressed as DataFrame
transforms (SURVEY.md S2.2, S2.8).

Split out of registry.py in round 4 — a pure move, oracles verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.registry import _read, register

# --------------------------------------------------------------------------
# Reference-adapter section: the omics DE transform, declarative merge,
# CURIE normalization — the reference's core adapter semantics,
# oracle-checked end to end.
# --------------------------------------------------------------------------

OMICS_SYNTH_SQL = """
  SELECT
    CASE WHEN event_id % 17 = 0 THEN '' ELSE 'g' || CAST(event_id % 500 AS VARCHAR) END AS Synonym,
    CASE WHEN event_id % 13 = 0 THEN 'NA'
         WHEN event_id % 19 = 0 THEN 'Infinity'
         ELSE CAST(event_id % 41 - 20 AS VARCHAR) || '.' || CAST(event_id % 10 AS VARCHAR)
              || CASE WHEN event_id % 7 = 0 THEN '*' ELSE '' END
    END AS log2fc,
    CASE WHEN event_id % 11 = 0 THEN NULL
         ELSE '0.0' || CAST(event_id % 100 AS VARCHAR) END AS qValue
  FROM events
"""


def _omics_synth(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _read(spark, sf_dir, "events")
    fc_core = F.concat(
        (F.col("event_id") % 41 - 20).cast("string"),
        F.lit("."),
        (F.col("event_id") % 10).cast("string"),
        F.when(F.col("event_id") % 7 == 0, F.lit("*")).otherwise(F.lit("")),
    )
    return ev.select(
        F.when(F.col("event_id") % 17 == 0, F.lit(""))
        .otherwise(F.concat(F.lit("g"), (F.col("event_id") % 500).cast("string")))
        .alias("Synonym"),
        F.when(F.col("event_id") % 13 == 0, F.lit("NA"))
        .when(F.col("event_id") % 19 == 0, F.lit("Infinity"))
        .otherwise(fc_core)
        .alias("log2fc"),
        F.when(F.col("event_id") % 11 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("0.0"), (F.col("event_id") % 100).cast("string")))
        .alias("qValue"),
    )


@register(
    "omics_timepoint_hours",
    oracle="""
    WITH synth AS (
      SELECT event_id, user_id,
        CASE event_id % 12
          WHEN 0 THEN '4h'
          WHEN 1 THEN '0.5h'
          WHEN 2 THEN '-12h'
          WHEN 3 THEN 'day 18'
          WHEN 4 THEN 'Day 2'
          WHEN 5 THEN '50h (P added)'
          WHEN 6 THEN '0.5h post-inoculation'
          WHEN 7 THEN '1h extended darkness (36h)'
          WHEN 8 THEN 'R (rescue: nutrient stress)'
          WHEN 9 THEN 'days 60+89'
          WHEN 10 THEN ''
          ELSE CAST(event_id % 9 AS VARCHAR) || 'h'
        END AS label
      FROM events
    ),
    parsed AS (
      SELECT event_id, user_id, label,
        CASE
          WHEN label IS NULL OR trim(label) = '' THEN NULL
          WHEN lower(trim(label)) LIKE 'days %' AND contains(trim(label), '+') THEN NULL
          WHEN trim(label) LIKE 'R %' OR trim(label) = 'R' THEN NULL
          WHEN contains(trim(label), 'extended darkness') AND contains(trim(label), '(') THEN
            CASE WHEN regexp_extract(trim(label), '\\((\\d+(?:\\.\\d+)?)h\\)', 1) <> ''
                 THEN CAST(regexp_extract(trim(label), '\\((\\d+(?:\\.\\d+)?)h\\)', 1) AS DOUBLE) END
          WHEN lower(trim(label)) LIKE 'day %' THEN
            CASE WHEN regexp_extract(trim(label), '^[Dd]ay\\s+(\\d+(?:\\.\\d+)?)', 1) <> ''
                 THEN CAST(regexp_extract(trim(label), '^[Dd]ay\\s+(\\d+(?:\\.\\d+)?)', 1) AS DOUBLE) * 24 END
          ELSE
            CASE WHEN regexp_extract(trim(label), '^(-?\\d+(?:\\.\\d+)?)\\s*h', 1) <> ''
                 THEN CAST(regexp_extract(trim(label), '^(-?\\d+(?:\\.\\d+)?)\\s*h', 1) AS DOUBLE) END
        END AS time_point_hours
      FROM synth
    )
    SELECT event_id AS analysis_id, user_id AS experiment_id, label,
      time_point_hours,
      CAST(row_number() OVER (
        PARTITION BY user_id
        ORDER BY coalesce(time_point_hours, 'infinity'::DOUBLE), event_id
      ) AS INTEGER) AS time_point_order
    FROM parsed
    """,
)
def omics_timepoint_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 + W7 (paperconfig_utils.py:185-213, omics_adapter.py:446-475):
    parse every reference timepoint-label shape to hours, then assign
    per-experiment time_point_order by (hours NULLS LAST, id). Labels
    synthesized to cover all branches incl. the unparseable ones."""
    from multiomics_biocypher_kg_spark.functions.omics import assign_time_point_order

    ev = _read(spark, sf_dir, "events")
    m = F.col("event_id") % 12
    label = (
        F.when(m == 0, F.lit("4h"))
        .when(m == 1, F.lit("0.5h"))
        .when(m == 2, F.lit("-12h"))
        .when(m == 3, F.lit("day 18"))
        .when(m == 4, F.lit("Day 2"))
        .when(m == 5, F.lit("50h (P added)"))
        .when(m == 6, F.lit("0.5h post-inoculation"))
        .when(m == 7, F.lit("1h extended darkness (36h)"))
        .when(m == 8, F.lit("R (rescue: nutrient stress)"))
        .when(m == 9, F.lit("days 60+89"))
        .when(m == 10, F.lit(""))
        .otherwise(F.concat((F.col("event_id") % 9).cast("string"), F.lit("h")))
    )
    synth = ev.select(
        F.col("event_id").alias("analysis_id"),
        F.col("user_id").alias("experiment_id"),
        label.alias("label"),
    )
    return assign_time_point_order(synth, label_col="label").select(
        "analysis_id",
        "experiment_id",
        "label",
        "time_point_hours",
        "time_point_order",
    )


@register(
    "omics_replicate_wide",
    oracle="""
    WITH synth AS (
      SELECT event_id AS k,
        CASE event_id % 7 WHEN 0 THEN 'NA' WHEN 1 THEN 'ND'
          ELSE CAST(event_id % 23 AS VARCHAR) END AS rep1,
        CASE event_id % 5 WHEN 0 THEN '' WHEN 1 THEN 'bad!'
          ELSE CAST(event_id % 19 AS VARCHAR) || '.5' END AS rep2,
        CASE event_id % 3 WHEN 0 THEN 'NA' WHEN 1 THEN '0'
          ELSE CAST(event_id % 11 AS VARCHAR) END AS rep3
      FROM events
    ),
    long AS (
      SELECT k, 1 AS rep_idx, trim(coalesce(rep1, '')) AS s FROM synth
      UNION ALL SELECT k, 2, trim(coalesce(rep2, '')) FROM synth
      UNION ALL SELECT k, 3, trim(coalesce(rep3, '')) FROM synth
    ),
    parsed AS (
      SELECT k, rep_idx,
        CASE WHEN s IN ('', 'NA') THEN NULL
             WHEN s IN ('ND', 'nd') THEN 0.0
             ELSE TRY_CAST(s AS DOUBLE) END AS v
      FROM long
    ),
    ok AS (SELECT * FROM parsed WHERE v IS NOT NULL AND NOT isnan(v)),
    agg AS (
      SELECT k,
        CAST(count(*) AS INTEGER) AS n_replicates,
        CAST(sum(CASE WHEN v <> 0.0 THEN 1 ELSE 0 END) AS INTEGER) AS n_non_zero,
        round(avg(v), 6) AS mean,
        round(CASE WHEN count(*) >= 2 THEN stddev_samp(v) ELSE 0.0 END, 6) AS sd,
        string_agg(CAST(v AS VARCHAR), '|' ORDER BY rep_idx) AS replicate_values
      FROM ok GROUP BY k
    )
    SELECT s.k AS row_id,
      coalesce(n_replicates, 0) AS n_replicates,
      coalesce(n_non_zero, 0) AS n_non_zero,
      coalesce(mean, 0.0) AS mean,
      coalesce(sd, 0.0) AS sd,
      coalesce(replicate_values, '') AS replicate_values,
      CASE WHEN coalesce(n_non_zero, 0) = 0 THEN 'not_detected'
           WHEN n_non_zero = n_replicates THEN 'detected'
           ELSE 'sporadic' END AS detection_status
    FROM (SELECT DISTINCT k FROM synth) s LEFT JOIN agg USING (k)
    """,
)
def omics_replicate_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 wide form (_aggregate_replicates,
    metabolite_assay_adapter.py:106-148): wide replicate columns with
    missing/'ND'-null/unparseable cells -> mean, sample sd, counts,
    ordered replicate list, detection status; all-missing keys keep
    the reference's zero-row defaults."""
    from multiomics_biocypher_kg_spark.functions.omics import (
        aggregate_replicates_wide,
    )

    ev = _read(spark, sf_dir, "events")
    e = F.col("event_id")
    synth = ev.select(
        e.alias("row_id"),
        F.when(e % 7 == 0, F.lit("NA"))
        .when(e % 7 == 1, F.lit("ND"))
        .otherwise((e % 23).cast("string"))
        .alias("rep1"),
        F.when(e % 5 == 0, F.lit(""))
        .when(e % 5 == 1, F.lit("bad!"))
        .otherwise(F.concat((e % 19).cast("string"), F.lit(".5")))
        .alias("rep2"),
        F.when(e % 3 == 0, F.lit("NA"))
        .when(e % 3 == 1, F.lit("0"))
        .otherwise((e % 11).cast("string"))
        .alias("rep3"),
    )
    out = aggregate_replicates_wide(
        synth,
        key_cols=["row_id"],
        replicate_cols=["rep1", "rep2", "rep3"],
        null_values=["ND", "nd"],
        missing_values=["", "NA"],
    )
    return out.select(
        "row_id",
        "n_replicates",
        "n_non_zero",
        "mean",
        "sd",
        F.array_join(
            F.transform(F.col("replicate_values"), lambda v: v.cast("string")), "|"
        ).alias("replicate_values"),
        "detection_status",
    )


ANNOT_BUCKETS = [
    "go", "kegg", "pfam", "ec", "reaction", "transporter", "cazy", "role_edge"
]


@register(
    "onto_annotation_quality",
    oracle="""
    WITH genes AS (
      SELECT DISTINCT 'g' || CAST(p_partkey % 300 AS VARCHAR) AS gene,
        (p_partkey % 300) % 4 = 0 AS has_role
      FROM part
    ),
    edges AS (
      SELECT 'g' || CAST(user_id AS VARCHAR) AS gene,
        CASE event_id % 11
          WHEN 0 THEN 'go' WHEN 1 THEN 'kegg' WHEN 2 THEN 'pfam'
          WHEN 3 THEN 'ec' WHEN 4 THEN 'reaction' WHEN 5 THEN 'transporter'
          WHEN 6 THEN 'cazy' WHEN 7 THEN 'role_edge'
          ELSE 'catch_all' END AS bucket
      FROM events WHERE event_id % 97 < 8
    ),
    flags AS (
      SELECT gene,
        max(CASE WHEN bucket = 'go' THEN 1 ELSE 0 END) AS has_go,
        max(CASE WHEN bucket = 'kegg' THEN 1 ELSE 0 END) AS has_kegg,
        max(CASE WHEN bucket = 'pfam' THEN 1 ELSE 0 END) AS has_pfam,
        max(CASE WHEN bucket = 'ec' THEN 1 ELSE 0 END) AS has_ec,
        max(CASE WHEN bucket = 'reaction' THEN 1 ELSE 0 END) AS has_reaction,
        max(CASE WHEN bucket = 'transporter' THEN 1 ELSE 0 END) AS has_transporter,
        max(CASE WHEN bucket = 'cazy' THEN 1 ELSE 0 END) AS has_cazy,
        max(CASE WHEN bucket = 'role_edge' THEN 1 ELSE 0 END) AS has_role_edge,
        1 AS has_any_edge
      FROM edges GROUP BY gene
    ),
    scored AS (
      SELECT g.gene,
        coalesce(f.has_go, 0) + coalesce(f.has_kegg, 0) + coalesce(f.has_pfam, 0)
          + coalesce(f.has_ec, 0) + coalesce(f.has_reaction, 0)
          + coalesce(f.has_transporter, 0) + coalesce(f.has_cazy, 0)
          + coalesce(f.has_role_edge, 0)
          + CASE WHEN g.has_role THEN 1 ELSE 0 END AS informative_count,
        coalesce(f.has_any_edge, 0) = 1 AS has_any_edge
      FROM genes g LEFT JOIN flags f USING (gene)
    )
    SELECT gene, CAST(informative_count AS INTEGER) AS informative_count,
      CASE WHEN informative_count >= 2 THEN 'informative_multi'
           WHEN informative_count = 1 THEN 'informative_single'
           WHEN has_any_edge THEN 'catch_all_only'
           ELSE 'no_evidence' END AS annotation_state,
      CAST(CASE WHEN informative_count >= 2 THEN 3
           WHEN informative_count = 1 THEN 2
           WHEN has_any_edge THEN 1
           ELSE 0 END AS INTEGER) AS annotation_quality
    FROM scored
    """,
)
def onto_annotation_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J13 (post-import.cypher:572-613): per-gene source-bucket
    existence flags (the Cypher EXISTS semi-joins) as ONE groupBy
    with max(when) per bucket — never 8 separate semi-join passes —
    feeding informative_count -> annotation_state / quality."""
    part = _read(spark, sf_dir, "part")
    ev = _read(spark, sf_dir, "events")
    genes = part.select(
        F.concat(F.lit("g"), (F.col("p_partkey") % 300).cast("string")).alias("gene"),
        ((F.col("p_partkey") % 300) % 4 == 0).alias("has_role"),
    ).distinct()
    b = F.col("event_id") % 11
    bucket = (
        F.when(b == 0, F.lit("go"))
        .when(b == 1, F.lit("kegg"))
        .when(b == 2, F.lit("pfam"))
        .when(b == 3, F.lit("ec"))
        .when(b == 4, F.lit("reaction"))
        .when(b == 5, F.lit("transporter"))
        .when(b == 6, F.lit("cazy"))
        .when(b == 7, F.lit("role_edge"))
        .otherwise(F.lit("catch_all"))
    )
    edges = ev.where(F.col("event_id") % 97 < 8).select(
        F.concat(F.lit("g"), F.col("user_id").cast("string")).alias("gene"),
        bucket.alias("bucket"),
    )
    flags = edges.groupBy("gene").agg(
        *[
            F.max(F.when(F.col("bucket") == bk, 1).otherwise(0)).alias(f"has_{bk}")
            for bk in ANNOT_BUCKETS
        ],
        F.lit(1).alias("has_any_edge"),
    )
    scored = genes.join(flags, "gene", "left").select(
        "gene",
        (
            sum(
                [F.coalesce(F.col(f"has_{bk}"), F.lit(0)) for bk in ANNOT_BUCKETS],
                F.lit(0),
            )
            + F.when(F.col("has_role"), 1).otherwise(0)
        ).alias("informative_count"),
        (F.coalesce(F.col("has_any_edge"), F.lit(0)) == 1).alias("has_any_edge"),
    )
    return scored.select(
        "gene",
        F.col("informative_count").cast("int").alias("informative_count"),
        F.when(F.col("informative_count") >= 2, F.lit("informative_multi"))
        .when(F.col("informative_count") == 1, F.lit("informative_single"))
        .when(F.col("has_any_edge"), F.lit("catch_all_only"))
        .otherwise(F.lit("no_evidence"))
        .alias("annotation_state"),
        F.when(F.col("informative_count") >= 2, F.lit(3))
        .when(F.col("informative_count") == 1, F.lit(2))
        .when(F.col("has_any_edge"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("annotation_quality"),
    )


@register(
    "omics_expression_status",
    oracle="""
    SELECT event_id,
      CASE WHEN event_id % 3 = 0 THEN 'significant' ELSE 'not significant' END
        AS significant,
      CASE WHEN event_id % 2 = 0 THEN 'up' ELSE 'down' END AS expression_direction,
      CASE WHEN event_id % 3 = 0 AND event_id % 2 = 0 THEN 'significant_up'
           WHEN event_id % 3 = 0 AND event_id % 2 <> 0 THEN 'significant_down'
           ELSE 'not_significant' END AS expression_status
    FROM events
    """,
)
def omics_expression_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 (post-import.cypher:207-212): expression_status composition
    from (significant, expression_direction)."""
    ev = _read(spark, sf_dir, "events")
    sig = F.when(F.col("event_id") % 3 == 0, F.lit("significant")).otherwise(
        F.lit("not significant")
    )
    direction = F.when(F.col("event_id") % 2 == 0, F.lit("up")).otherwise(
        F.lit("down")
    )
    df = ev.select(
        "event_id", sig.alias("significant"), direction.alias("expression_direction")
    )
    status = (
        F.when(
            (F.col("significant") == "significant")
            & (F.col("expression_direction") == "up"),
            F.lit("significant_up"),
        )
        .when(
            (F.col("significant") == "significant")
            & (F.col("expression_direction") == "down"),
            F.lit("significant_down"),
        )
        .otherwise(F.lit("not_significant"))
    )
    return df.withColumn("expression_status", status)


@register(
    "rel_dm_search_text",
    oracle="""
    WITH dms AS (
      SELECT 'p' || CAST(user_id AS VARCHAR) AS pub,
        'metric_' || CAST(event_id % 13 AS VARCHAR) AS name,
        'type_' || CAST(event_id % 5 AS VARCHAR) AS metric_type,
        CASE WHEN event_id % 4 = 0 THEN NULL
             ELSE 'desc' || CAST(event_id % 6 AS VARCHAR) END AS field_description
      FROM events
    )
    SELECT pub,
      trim(
        coalesce(string_agg(DISTINCT name, ' ' ORDER BY name), '') || ' '
        || replace(coalesce(string_agg(DISTINCT metric_type, ' ' ORDER BY metric_type), ''), '_', ' ')
        || ' '
        || coalesce(string_agg(DISTINCT field_description, ' ' ORDER BY field_description), '')
      ) AS derived_metric_search_text
    FROM dms GROUP BY pub
    """,
)
def rel_dm_search_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17 (post-import.cypher:429-442,514-526): per-publication
    derived-metric fulltext aggregation — distinct names + metric
    types (underscore -> space) + field descriptions, null descs
    skipped; token order pinned sorted (the reference's collect order
    is engine-arbitrary)."""
    ev = _read(spark, sf_dir, "events")
    dms = ev.select(
        F.concat(F.lit("p"), F.col("user_id").cast("string")).alias("pub"),
        F.concat(F.lit("metric_"), (F.col("event_id") % 13).cast("string")).alias(
            "name"
        ),
        F.concat(F.lit("type_"), (F.col("event_id") % 5).cast("string")).alias(
            "metric_type"
        ),
        F.when(
            F.col("event_id") % 4 != 0,
            F.concat(F.lit("desc"), (F.col("event_id") % 6).cast("string")),
        ).alias("field_description"),
    )
    agg = dms.groupBy("pub").agg(
        F.array_join(F.array_sort(F.collect_set("name")), " ").alias("names"),
        F.regexp_replace(
            F.array_join(F.array_sort(F.collect_set("metric_type")), " "), "_", " "
        ).alias("types"),
        F.array_join(F.array_sort(F.collect_set("field_description")), " ").alias(
            "descs"
        ),
    )
    return agg.select(
        "pub",
        F.trim(
            F.concat(
                F.col("names"), F.lit(" "), F.col("types"), F.lit(" "), F.col("descs")
            )
        ).alias("derived_metric_search_text"),
    )


@register(
    "onto_level_kind",
    oracle="""
    SELECT p_partkey AS row_id, id,
      CAST(len(string_split(id, '.')) - 1 AS INTEGER) AS level,
      ['tc_class','tc_subclass','tc_family','tc_subfamily','tc_specificity']
        [len(string_split(id, '.'))] AS level_kind
    FROM (
      SELECT p_partkey,
        array_to_string(list_slice(['1','A','12','3','1'], 1, p_partkey % 5 + 1), '.')
          AS id
      FROM part
    )
    """,
)
def onto_level_kind(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F19 (tcdb_adapter.py:163-165, brite_adapter.py:171-173):
    level = path depth from the dotted id, level_kind = depth-indexed
    enum — pure arithmetic on split()."""
    part = _read(spark, sf_dir, "part")
    segs = F.array(F.lit("1"), F.lit("A"), F.lit("12"), F.lit("3"), F.lit("1"))
    tc_id = F.array_join(F.slice(segs, 1, F.col("p_partkey") % 5 + 1), ".")
    kinds = F.array(
        F.lit("tc_class"),
        F.lit("tc_subclass"),
        F.lit("tc_family"),
        F.lit("tc_subfamily"),
        F.lit("tc_specificity"),
    )
    df = part.select(F.col("p_partkey").alias("row_id"), tc_id.alias("id"))
    depth = F.size(F.split(F.col("id"), r"\.")) - 1
    return df.select(
        "row_id",
        "id",
        depth.cast("int").alias("level"),
        F.element_at(kinds, depth + 1).alias("level_kind"),
    )


@register(
    "omics_de_transform",
    oracle=f"""
    WITH synth AS ({OMICS_SYNTH_SQL}),
    mapped AS (
      SELECT Synonym AS raw_id, log2fc AS raw_fc, qValue AS raw_p FROM synth
      WHERE Synonym IS NOT NULL AND trim(Synonym) <> ''
    ),
    parsed AS (
      SELECT raw_id,
        regexp_matches(trim(raw_fc), '^\\*|\\*$') AS has_asterisk,
        TRY_CAST(trim(regexp_replace(trim(raw_fc), '^\\*+|\\*+$', ''))
                 AS DOUBLE) AS fc_num
      FROM mapped
    ),
    fin AS (
      SELECT * FROM parsed WHERE fc_num IS NOT NULL AND isfinite(fc_num)
    )
    SELECT 'a1' AS analysis_id, 'e1' AS experiment_id, raw_id,
      fc_num AS log2_fold_change,
      CASE WHEN has_asterisk THEN 0.05 ELSE 1.0 END AS adjusted_p_value,
      CASE WHEN has_asterisk THEN 'significant'
           ELSE 'not significant' END AS significant,
      CASE WHEN fc_num > 0 THEN 'up' ELSE 'down' END AS expression_direction
    FROM fin
    """,
)
def omics_de_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's core adapter (OmicsAdapter) end-to-end over a
    synthesized supp table: config-driven mapping (P1), id filter
    (P3), non-finite filter (P4), asterisk parse (F6), significance
    cascade (P5), direction (F7) — via functions.omics."""
    from multiomics_biocypher_kg_spark.functions.omics import (
        AnalysisConfig,
        transform_analysis,
    )

    cfg = AnalysisConfig(
        analysis_id="a1",
        experiment_id="e1",
        name_col="Synonym",
        logfc_col="log2fc",
        adjusted_p_value_col="qValue",
        pvalue_asterisk_in_logfc=True,
    )
    out = transform_analysis(_omics_synth(spark, sf_dir), cfg)
    return out.select(
        "analysis_id",
        "experiment_id",
        "raw_id",
        "log2_fold_change",
        "adjusted_p_value",
        "significant",
        "expression_direction",
    )


@register(
    "merge_multi_source",
    oracle="""
    WITH cust AS (
      SELECT c_nationkey AS k, min(c_name) AS sample_customer,
             string_agg(DISTINCT c_mktsegment, '|' ORDER BY c_mktsegment) AS segs,
             count(*) AS n_cust
      FROM customer GROUP BY c_nationkey
    ),
    supp AS (
      SELECT s_nationkey AS k, min(s_name) AS sample_supplier, count(*) AS n_supp
      FROM supplier GROUP BY s_nationkey
    )
    SELECT n.n_nationkey, n.n_name,
      coalesce(c.sample_customer, s.sample_supplier) AS representative,
      coalesce(c.segs, '') AS segments,
      coalesce(CAST(c.n_cust AS BIGINT), CAST(s.n_supp AS BIGINT)) AS member_count,
      concat_ws(' :: ', n.n_name, c.sample_customer, s.sample_supplier) AS summary
    FROM nation n LEFT JOIN cust c ON n.n_nationkey = c.k
    LEFT JOIN supp s ON n.n_nationkey = s.k
    """,
)
def merge_multi_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: declarative config-driven multi-source merge (anchor +
    two sources, single/passthrough/integer/concat rules) via
    operators.merge_rules, over TPC-H dims."""
    from multiomics_biocypher_kg_spark.operators.merge_rules import (
        FieldRule,
        SourceSpec,
        merge_sources,
    )

    nation = _read(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust = (
        _read(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("n_nationkey"))
        .agg(
            F.min("c_name").alias("sample_customer"),
            F.array_join(F.array_sort(F.collect_set("c_mktsegment")), "|").alias(
                "segs"
            ),
            F.count(F.lit(1)).alias("n_cust"),
        )
    )
    supp = (
        _read(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("n_nationkey"))
        .agg(F.min("s_name").alias("sample_supplier"), F.count(F.lit(1)).alias("n_supp"))
    )
    merged = merge_sources(
        nation,
        [
            SourceSpec("cust", cust, "n_nationkey"),
            SourceSpec("supp", supp, "n_nationkey"),
        ],
        [
            FieldRule(
                "representative",
                "single",
                ["cust.sample_customer", "supp.sample_supplier"],
            ),
            FieldRule("segments", "passthrough", ["cust.segs"]),
            FieldRule("member_count", "integer", ["cust.n_cust", "supp.n_supp"]),
            FieldRule(
                "summary",
                "concat",
                ["anchor.n_name", "cust.sample_customer", "supp.sample_supplier"],
            ),
        ],
    )
    return merged.select(
        "n_nationkey",
        "n_name",
        "representative",
        F.coalesce("segments", F.lit("")).alias("segments"),
        "member_count",
        "summary",
    )


@register(
    "curie_normalize",
    oracle="""
    WITH synth AS (
      SELECT doc_id,
        CASE doc_id % 4
          WHEN 0 THEN 'GO:' || CAST(doc_id AS VARCHAR)
          WHEN 1 THEN 'NCBIGene:' || CAST(doc_id AS VARCHAR)
          WHEN 2 THEN 'UniProtKB:' || CAST(doc_id AS VARCHAR)
          ELSE 'My Weird DB:' || CAST(doc_id AS VARCHAR)
        END AS curie,
        'a|b''c ' || CAST(doc_id AS VARCHAR) AS dirty
      FROM documents
    )
    SELECT doc_id,
      (CASE string_split(curie, ':')[1]
        WHEN 'GO' THEN 'go'
        WHEN 'NCBIGene' THEN 'ncbigene'
        WHEN 'UniProtKB' THEN 'uniprot'
        ELSE replace(lower(string_split(curie, ':')[1]), ' ', '_')
      END) || ':' || string_split(curie, ':')[2] AS curie_norm,
      replace(replace(dirty, '|', ','), '''', '^') AS cleaned
    FROM synth
    """,
)
def curie_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2: CURIE prefix normalization (the reference's 3M-call
    hot spot as pure native expressions) + clean_text translate."""
    from multiomics_biocypher_kg_spark.functions.curie import (
        clean_text,
        normalize_curie_col,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    d = F.col("doc_id").cast("string")
    synth = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.lit("GO:"), d))
        .when(F.col("doc_id") % 4 == 1, F.concat(F.lit("NCBIGene:"), d))
        .when(F.col("doc_id") % 4 == 2, F.concat(F.lit("UniProtKB:"), d))
        .otherwise(F.concat(F.lit("My Weird DB:"), d))
        .alias("curie"),
        F.concat(F.lit("a|b'c "), d).alias("dirty"),
    )
    return synth.select(
        "doc_id",
        normalize_curie_col(F.col("curie")).alias("curie_norm"),
        clean_text(F.col("dirty")).alias("cleaned"),
    )

# Re-apply the driver-window order after this module's registrations:
# if this module is imported FIRST, registry's own bottom-of-file
# ordering pass runs before these queries exist. Idempotent.
from multiomics_biocypher_kg_spark.registry import (  # noqa: E402
    _apply_driver_window_order,
)

_apply_driver_window_order()
