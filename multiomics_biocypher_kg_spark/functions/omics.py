"""The reference's omics differential-expression transform, whole.

Re-expresses the core of OmicsAdapter
(/root/reference/multiomics_kg/adapters/omics_adapter.py) as one
config-driven DataFrame program:

- P1  config-driven column mapping (name_col / logfc_col /
      adjusted_p_value_col, :696-723)
- P3  null/empty id filter with skip counting (:744-751)
- P4  non-finite numeric filter (:759-787)
- F6  asterisk-significance parsing ('1.1*' -> 1.1 + significant,
      :770-787)
- F4  linear -> log2 fold-change conversion (<=0 -> null, :76-92)
- P5  the significance cascade: prefiltered -> asterisk ->
      (|fc| >= fc_thr AND p <= p_thr) -> unknown (:595-632)
- F7  expression_direction (:828-830)
- W7  time_point_order assignment per experiment (:446-475)
- A15 is_time_course = countDistinct(timepoint) > 1 (:356-372)
- F20 deterministic edge ids (:843)

The AnalysisConfig mirrors one paperconfig analysis block
(data/.../paperconfig.yaml:110-201 shape, FIXTURES.md B1).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class AnalysisConfig:
    analysis_id: str
    experiment_id: str
    name_col: str
    logfc_col: str
    adjusted_p_value_col: str | None = None
    fold_change_type: str = "log2"  # 'log2' | 'linear'
    prefiltered: bool = False
    pvalue_asterisk_in_logfc: bool = False
    fold_change_threshold: float | None = 1.0
    pvalue_threshold: float | None = 0.05
    time_point: str | None = None
    time_point_hours: float | None = None
    growth_phase: str | None = None
    # P6 (omics_adapter.py:823-825): emit only significant rows
    significant_only: bool = False
    # P7 (omics_adapter.py:198-200,738): test-mode row cap per analysis
    test_mode_limit: int | None = None


def transform_analysis(df: DataFrame, cfg: AnalysisConfig) -> DataFrame:
    """One supp-table analysis -> typed expression rows.

    -> (analysis_id, experiment_id, raw_id, log2_fold_change,
        adjusted_p_value, significant, expression_direction,
        time_point, time_point_hours, growth_phase)
    """
    if cfg.name_col not in df.columns or cfg.logfc_col not in df.columns:
        # P2 missing-column guard: driver-side, skip the table
        raise ValueError(
            f"{cfg.analysis_id}: missing column "
            f"{cfg.name_col if cfg.name_col not in df.columns else cfg.logfc_col}"
        )
    p_col = (
        F.col(cfg.adjusted_p_value_col).cast("string")
        if cfg.adjusted_p_value_col and cfg.adjusted_p_value_col in df.columns
        else F.lit(None).cast("string")
    )
    mapped = df.select(
        F.col(cfg.name_col).cast("string").alias("raw_id"),
        F.col(cfg.logfc_col).cast("string").alias("raw_fc"),
        p_col.alias("raw_p"),
    )
    # P3: null/empty ids out
    mapped = mapped.where(
        F.col("raw_id").isNotNull() & (F.trim(F.col("raw_id")) != "")
    )
    # F6: asterisk parse (only when configured, like the reference).
    # The reference accepts leading OR trailing markers ('* 1.1',
    # '1.1 *', '1.1*' — omics_adapter.py fc_str.startswith/endswith)
    # and strips stars from both ends in every mode.
    has_ast = (
        F.trim(F.col("raw_fc")).rlike(r"^\*|\*$")
        if cfg.pvalue_asterisk_in_logfc
        else F.lit(False)
    )
    fc_num = F.expr(
        r"try_cast(trim(regexp_replace(trim(raw_fc), '^\\*+|\\*+$', '')) AS double)"
    )
    # non-finite p-values are treated as absent (reference keeps pval
    # None unless math.isfinite)
    p_raw = F.expr("try_cast(raw_p AS double)")
    p_num = F.when(
        p_raw.isNotNull()
        & ~F.isnan(p_raw)
        & ~p_raw.isin(float("inf"), float("-inf")),
        p_raw,
    )
    parsed = mapped.select(
        "raw_id",
        has_ast.alias("has_asterisk"),
        fc_num.alias("fc_num"),
        p_num.alias("p_num"),
    )
    # P4: non-finite out (NaN / +-inf survive try_cast)
    parsed = parsed.where(
        F.col("fc_num").isNotNull()
        & ~F.isnan("fc_num")
        & ~F.col("fc_num").isin(float("inf"), float("-inf"))
    )
    # F4: linear -> log2 (non-positive -> dropped with a warning count
    # in the reference; here: null then filtered)
    log2fc = (
        F.when(F.col("fc_num") > 0, F.log2("fc_num"))
        if cfg.fold_change_type == "linear"
        else F.col("fc_num")
    )
    conv = parsed.withColumn("log2_fold_change", log2fc).where(
        F.col("log2_fold_change").isNotNull()
    )
    # P5: significance cascade, pinned EXACTLY to _check_significance
    # (omics_adapter.py:595-632):
    #   1. prefiltered -> 'significant' for every row
    #   2. pvalue_asterisk_in_logfc configured -> asterisk alone
    #      decides ('significant' / 'not significant'), NO threshold
    #      fall-through
    #   3. both thresholds None -> 'unknown'
    #   4. AND of only the checks whose threshold AND value are both
    #      present (a missing value skips its check, never falsifies)
    if cfg.prefiltered:
        significant = F.lit("significant")
    elif cfg.pvalue_asterisk_in_logfc:
        significant = F.when(
            F.col("has_asterisk"), F.lit("significant")
        ).otherwise(F.lit("not significant"))
    elif cfg.fold_change_threshold is None and cfg.pvalue_threshold is None:
        significant = F.lit("unknown")
    else:
        sig = F.lit(True)
        if cfg.fold_change_threshold is not None:
            # the reference thresholds the RAW parsed value (fc_float,
            # pre-log2-conversion — omics_adapter.py passes fc_float,
            # not `converted`, to _check_significance); identical for
            # log2-typed tables, different for linear ones
            sig = sig & (
                F.col("fc_num").isNull()
                | (F.abs(F.col("fc_num")) >= cfg.fold_change_threshold)
            )
        if cfg.pvalue_threshold is not None:
            sig = sig & (
                F.col("p_num").isNull() | (F.col("p_num") <= cfg.pvalue_threshold)
            )
        significant = F.when(sig, F.lit("significant")).otherwise(
            F.lit("not significant")
        )
    # asterisk mode stores a placeholder p-value: the threshold when
    # marked, 1.0 otherwise (omics_adapter.py 'use threshold as
    # placeholder'); other modes store the finite parsed p
    if cfg.pvalue_asterisk_in_logfc:
        p_out = F.when(
            F.col("has_asterisk"),
            F.lit(float(cfg.pvalue_threshold or 0.05)),
        ).otherwise(F.lit(1.0))
    else:
        p_out = F.col("p_num")
    out = conv.select(
        F.lit(cfg.analysis_id).alias("analysis_id"),
        F.lit(cfg.experiment_id).alias("experiment_id"),
        "raw_id",
        "log2_fold_change",
        p_out.alias("adjusted_p_value"),
        significant.alias("significant"),
        # F7: direction
        F.when(F.col("log2_fold_change") > 0, F.lit("up"))
        .otherwise(F.lit("down"))
        .alias("expression_direction"),
        F.lit(cfg.time_point).alias("time_point"),
        F.lit(cfg.time_point_hours).cast("double").alias("time_point_hours"),
        F.lit(cfg.growth_phase).alias("growth_phase"),
    )
    if cfg.significant_only:  # P6 — only 'not significant' rows are
        # dropped; 'unknown' survives (omics_adapter.py:823-825 skips
        # exactly `significant == 'not significant'`)
        out = out.where(F.col("significant") != "not significant")
    if cfg.test_mode_limit:  # P7
        out = out.limit(cfg.test_mode_limit)
    return out


def parse_timepoint_hours(c):
    """F3 (paperconfig_utils.py:185-213): timepoint label -> hours.

    '4h'/'0.5h'/'-12h' -> as-is; 'day 18'/'Day 2' -> *24;
    '50h (P added)'/'0.5h post-inoculation' -> leading hours;
    '1h extended darkness (36h)' -> the absolute (36h) capture;
    'R (rescue: ...)'/'days 60+89'/empty -> null.
    Pure nested when/regexp_extract — stays in codegen.
    """
    tp = F.trim(c)
    low = F.lower(tp)
    ext = F.regexp_extract(tp, r"\((\d+(?:\.\d+)?)h\)", 1)
    day = F.regexp_extract(tp, r"^[Dd]ay\s+(\d+(?:\.\d+)?)", 1)
    hrs = F.regexp_extract(tp, r"^(-?\d+(?:\.\d+)?)\s*h", 1)
    null = F.lit(None).cast("double")
    return (
        F.when(c.isNull() | (tp == ""), null)
        .when(low.startswith("days ") & tp.contains("+"), null)
        .when(tp.startswith("R ") | (tp == "R"), null)
        .when(
            tp.contains("extended darkness") & tp.contains("("),
            F.when(ext != "", ext.cast("double")).otherwise(null),
        )
        .when(
            low.startswith("day "),
            F.when(day != "", day.cast("double") * 24).otherwise(null),
        )
        .otherwise(F.when(hrs != "", hrs.cast("double")).otherwise(null))
    )


def assign_time_point_order(analyses_meta: DataFrame, label_col: str | None = None) -> DataFrame:
    """W7 (omics_adapter.py:446-475): per experiment, order analyses
    by (hours NULLS LAST, analysis_id), enumerate from 1.

    With ``label_col``, hours are parsed from the raw timepoint label
    via :func:`parse_timepoint_hours` (F3) first — the reference's
    normalize-then-order path."""
    if label_col is not None:
        analyses_meta = analyses_meta.withColumn(
            "time_point_hours", parse_timepoint_hours(F.col(label_col))
        )
    w = Window.partitionBy("experiment_id").orderBy(
        F.coalesce(F.col("time_point_hours"), F.lit(float("inf"))).asc(),
        F.col("analysis_id").asc(),
    )
    return analyses_meta.withColumn("time_point_order", F.row_number().over(w))


def aggregate_replicates_wide(
    df: DataFrame,
    key_cols: list[str],
    replicate_cols: list[str],
    null_values: list[str] = ("ND", "nd"),
    missing_values: list[str] = ("", "NA"),
    drop_undetected: bool = False,
) -> DataFrame:
    """A11 wide form (_aggregate_replicates,
    metabolite_assay_adapter.py:106-148): wide replicate columns ->
    (mean, sd, n_replicates, n_non_zero, replicate_values,
    detection_status).

    Cell rules (pinned to the reference): missing_values (and
    unparseable cells) are EXCLUDED; null_values parse as 0.0
    (not-detected but counted); everything else coerces to float.
    n==0 -> (0.0, 0.0, 0, 0, [], 'not_detected'); sd is 0.0 below 2
    replicates; detected iff every replicate is non-zero, sporadic
    when mixed. ``drop_undetected`` (P10) removes not_detected rows
    from the output, the reference's config switch.

    Plan: unpivot via a literal array explode (no stack string, no
    shuffle) then ONE groupBy over the keys — map-side combined.
    Rows whose every cell is missing stay present with defaults.
    """
    reps = F.array(
        *[
            F.struct(
                F.lit(i).alias("rep_idx"),
                F.trim(F.coalesce(F.col(c).cast("string"), F.lit(""))).alias("s"),
            )
            for i, c in enumerate(replicate_cols)
        ]
    )
    long = df.select(*key_cols, F.explode(reps).alias("r")).select(
        *key_cols, F.col("r.rep_idx").alias("rep_idx"), F.col("r.s").alias("s")
    )
    null_arr = [str(v) for v in null_values]
    miss_arr = [str(v) for v in missing_values]
    parsed = long.withColumn(
        "v",
        F.when(F.col("s").isin(miss_arr), F.lit(None).cast("double"))
        .when(F.col("s").isin(null_arr), F.lit(0.0))
        .otherwise(F.expr("try_cast(s AS double)")),
    ).where(F.col("v").isNotNull() & ~F.isnan("v"))
    agg = parsed.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("int").alias("n_replicates"),
        F.sum(F.when(F.col("v") != 0.0, 1).otherwise(0)).cast("int").alias("n_non_zero"),
        F.round(F.avg("v"), 6).alias("mean"),
        F.round(
            F.when(F.count(F.lit(1)) >= 2, F.stddev_samp("v")).otherwise(F.lit(0.0)),
            6,
        ).alias("sd"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("rep_idx", "v"))),
            lambda st: st["v"],
        ).alias("replicate_values"),
    )
    detection = (
        F.when(F.col("n_non_zero") == 0, F.lit("not_detected"))
        .when(F.col("n_non_zero") == F.col("n_replicates"), F.lit("detected"))
        .otherwise(F.lit("sporadic"))
    )
    agg = agg.withColumn("detection_status", detection)
    # keep all-missing keys with the reference's zero-row defaults
    keys = df.select(*key_cols).distinct()
    out = (
        keys.join(agg, key_cols, "left")
        .select(
            *key_cols,
            F.coalesce("n_replicates", F.lit(0)).alias("n_replicates"),
            F.coalesce("n_non_zero", F.lit(0)).alias("n_non_zero"),
            F.coalesce("mean", F.lit(0.0)).alias("mean"),
            F.coalesce("sd", F.lit(0.0)).alias("sd"),
            F.coalesce(
                "replicate_values", F.array().cast("array<double>")
            ).alias("replicate_values"),
            F.coalesce("detection_status", F.lit("not_detected")).alias(
                "detection_status"
            ),
        )
    )
    if drop_undetected:
        out = out.where(F.col("detection_status") != "not_detected")
    return out


def fc_range_check(
    rows: DataFrame,
    analysis_col: str = "analysis_id",
    fc_col: str = "log2_fold_change",
    type_col: str = "fold_change_type",
    scope_col: str | None = None,
) -> DataFrame:
    """F5 (_validate_fc_range, omics_adapter.py:95-133): per-analysis
    fold-change range sanity — the reference's logger.warning
    heuristics materialized as data:

    - 'linear_negative_fc': declared linear but negative values exist
      (invalid — probably log2),
    - 'log2_maybe_linear': declared log2 (or undeclared) but every
      value > 1.0 (probably linear), unless table_scope is
      'significant_only' (upregulated-only tables are exempt),
    - 'ok' otherwise.

    -> (analysis, fold_change_type, n, n_negative, fc_min, fc_max,
        fc_range_warning). One groupBy — map-side combined.
    """
    group = [analysis_col, type_col] + ([scope_col] if scope_col else [])
    agg = rows.groupBy(*group).agg(
        F.count(fc_col).alias("n"),
        F.sum(F.when(F.col(fc_col) < 0, 1).otherwise(0))
        .cast("long")
        .alias("n_negative"),
        F.round(F.min(fc_col), 6).alias("fc_min"),
        F.round(F.max(fc_col), 6).alias("fc_max"),
    )
    fc_type = F.coalesce(F.col(type_col), F.lit("log2"))
    scope = F.col(scope_col) if scope_col else F.lit(None).cast("string")
    warning = (
        F.when(
            (fc_type == "linear") & (F.col("n_negative") > 0),
            F.lit("linear_negative_fc"),
        )
        .when(
            (fc_type == "log2")
            & (F.col("n_negative") == 0)
            & (F.col("fc_min") > 1.0)
            & ~scope.eqNullSafe("significant_only"),
            F.lit("log2_maybe_linear"),
        )
        .otherwise(F.lit("ok"))
    )
    return agg.withColumn("fc_range_warning", warning)


def is_time_course(analyses_meta: DataFrame) -> DataFrame:
    """A15 (omics_adapter.py:356-372): string-enum boolean per
    experiment ('true'|'false', reference convention)."""
    return analyses_meta.groupBy("experiment_id").agg(
        F.when(F.countDistinct("time_point") > 1, F.lit("true"))
        .otherwise(F.lit("false"))
        .alias("is_time_course")
    )


def expression_edges(rows: DataFrame, pub_id: str) -> DataFrame:
    """F20 edge emission: deterministic ids
    f'{pub}_{analysis}_{gene}' (omics_adapter.py:843-850)."""
    return rows.select(
        F.concat_ws(
            "_", F.lit(pub_id), F.col("analysis_id"), F.col("raw_id")
        ).alias("edge_id"),
        F.lit(pub_id).alias("subj"),
        F.lit("changes_expression_of").alias("pred"),
        F.col("raw_id").alias("obj"),
        F.struct(
            "log2_fold_change",
            "adjusted_p_value",
            "significant",
            "expression_direction",
            "time_point",
            "time_point_hours",
            "growth_phase",
        ).alias("props"),
    )


# ── P9: table-type dispatch (omics_adapter.py:524-527,
#    paperconfig_utils.py:80-115) ──────────────────────────────────


def id_translation_table(df: DataFrame, from_col: str, to_col: str) -> DataFrame:
    """'id_translation' tables: distinct (from_id, to_id) pairs,
    blanks dropped on both sides."""
    f, t = F.trim(F.col(from_col)), F.trim(F.col(to_col))
    return (
        df.select(f.alias("from_id"), t.alias("to_id"))
        .where((F.col("from_id") != "") & (F.col("to_id") != ""))
        .where(F.col("from_id").isNotNull() & F.col("to_id").isNotNull())
        .distinct()
    )


def gene_clusters_table(df: DataFrame, cluster_col: str, members_col: str) -> DataFrame:
    """'gene_clusters' tables: multi-valued member cells explode to
    (cluster_id, gene_id) membership rows."""
    members = F.filter(
        F.transform(
            F.split(F.col(members_col), r"[,;\s]+"), lambda m: F.trim(m)
        ),
        lambda m: m != "",
    )
    return df.select(
        F.col(cluster_col).alias("cluster_id"), F.explode(members).alias("gene_id")
    )


def transform_table(df: DataFrame, table_type: str, **kwargs) -> DataFrame:
    """P9: route a supp table to its per-type pipeline — the
    reference's adapter dispatch, with the same hard error on an
    unknown type. kwargs are forwarded (cfg=AnalysisConfig for 'csv',
    column names for the others)."""
    transforms = {
        "csv": lambda d, cfg: transform_analysis(d, cfg),
        "derived_metrics_table": lambda d, cfg: transform_analysis(d, cfg),
        "metabolite_assays_table": aggregate_replicates_wide,
        "id_translation": id_translation_table,
        "gene_clusters": gene_clusters_table,
    }
    if table_type not in transforms:
        raise ValueError(
            f"unknown table_type {table_type!r}; expected one of "
            f"{sorted(transforms)}"
        )
    return transforms[table_type](df, **kwargs)
