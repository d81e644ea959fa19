"""The reference OMICSAdapter re-expressed as paperconfig-driven
Spark transforms.

Reference: /root/reference/multiomics_kg/adapters/omics_adapter.py.
One paperconfig YAML (driver-side config, S14) drives:

- ``paperconfig_nodes``     -> publication + experiment node tuples
  (get_nodes, omics_adapter.py:320-390): config-cardinality, so the
  node stream is built driver-side exactly like the reference and
  parallelized as a tiny dimension DataFrame.
- ``paperconfig_edges``     -> has_experiment / tests_coculture_with
  structural edges (get_edges, omics_adapter.py:478-516) + one
  distributed ``transform_analysis`` pipeline per statistical
  analysis for changes_expression_of edges
  (_load_and_create_edges, omics_adapter.py:660-850), unioned.

CURIE normalization is identity-on-valid-prefix (doi/ncbigene/
ncbitaxon/insdc.gcf are canonical bioregistry prefixes whose curies
normalize to themselves), matching functions/curie.py.

Parity is scored (triple P/R >= 0.95 plus per-edge property
equality) against the reference adapter itself in
tests/test_adapter_triple_pr.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from multiomics_biocypher_kg_spark.functions.omics import (
    AnalysisConfig,
    parse_timepoint_hours,
    transform_analysis,
)

# BioCypher-safe cleanup (curie_utils.py clean_text): '|' -> ',',
# "'" -> '^' — single-pass translate on both engines.
_CLEAN_TABLE = str.maketrans({"|": ",", "'": "^"})

# pandas default NA sentinels (pd.read_csv keep_default_na=True):
# the reference reads supp tables with plain pd.read_csv, so a gene
# cell holding any of these becomes NaN and the row is skipped
# (omics_adapter.py 'if pd.isna(gene_id)').
_PANDAS_NA_TOKENS = [
    "",
    "#N/A",
    "#N/A N/A",
    "#NA",
    "-1.#IND",
    "-1.#QNAN",
    "-NaN",
    "-nan",
    "1.#IND",
    "1.#QNAN",
    "<NA>",
    "N/A",
    "NA",
    "NULL",
    "NaN",
    "None",
    "n/a",
    "nan",
    "null",
]


def clean_text(value):
    """clean_text (curie_utils.py:44-53): strings and lists of
    strings get the translate; everything else passes through."""
    if isinstance(value, str):
        return value.translate(_CLEAN_TABLE)
    if isinstance(value, list):
        return [
            v.translate(_CLEAN_TABLE) if isinstance(v, str) else v for v in value
        ]
    return value


def publication_id(cfg: dict) -> str:
    """get_publication_id (omics_adapter.py:879-899) for the
    skip_pdf_extraction/config-doi path: config doi override wins,
    then pubmed_id, then papername, then 'unknown'."""
    pub = cfg.get("publication", {}) or {}
    doi = pub.get("doi")
    if isinstance(doi, str) and doi.strip():
        return doi.strip()
    return str(pub.get("pubmed_id") or pub.get("papername") or "unknown")


def _prefixed(prefix: str, identifier: str) -> str:
    """add_prefix_to_id (omics_adapter.py:902-911) with the identity
    normalizer: '{prefix}:{id}'."""
    return f"{prefix}:{identifier}"


def _iter_analyses(cfg: dict):
    """(table_key, table_data, analysis) over ALL supplementary
    tables — time_point_order and is_time_course count analyses of
    every table type, not just csv (omics_adapter.py:522-556)."""
    supp = (cfg.get("publication", {}) or {}).get(
        "supplementary_materials", {}
    ) or {}
    if not isinstance(supp, dict):
        return
    for table_key, table_data in supp.items():
        if not isinstance(table_data, dict):
            continue
        analyses = table_data.get("statistical_analyses", [])
        if not isinstance(analyses, list):
            continue
        for sa in analyses:
            if isinstance(sa, dict):
                yield table_key, table_data, sa


_NODE_SCHEMA = T.StructType(
    [
        T.StructField("node_id", T.StringType()),
        T.StructField("label", T.StringType()),
        T.StructField(
            "props", T.MapType(T.StringType(), T.StringType(), True)
        ),
    ]
)

_DEFAULT_PROPS = {
    "source": "OMICS Adapter",
    "licence": "CC BY 4.0",
    "version": "2026-01-01",
}


def _stringify_props(d: dict) -> dict:
    out = {}
    for k, v in d.items():
        if v is None:
            continue
        if isinstance(v, list):
            out[k] = "|".join(str(x) for x in v)
        else:
            out[k] = str(v)
    return out


def paperconfig_nodes(spark: SparkSession, cfg: dict) -> DataFrame:
    """Publication + experiment nodes (get_nodes / get_publication_
    nodes, omics_adapter.py:290-390) as a tiny dimension DataFrame
    (node_id, label, props map<string,string>; None props omitted,
    list props pipe-joined)."""
    pub = cfg.get("publication", {}) or {}
    pub_id_raw = publication_id(cfg)
    rows = []
    if pub:
        pub_props = {
            "title": clean_text(pub.get("papername", "")),
            "doi": pub.get("doi"),
            **_DEFAULT_PROPS,
        }
        rows.append(
            (_prefixed("doi", pub_id_raw), "publication", _stringify_props(pub_props))
        )
    experiments = pub.get("experiments", {}) or {}
    for exp_key, exp in experiments.items():
        if not isinstance(exp, dict):
            continue
        timepoints = {
            sa.get("timepoint")
            for _, _, sa in _iter_analyses(cfg)
            if sa.get("experiment") == exp_key and sa.get("timepoint")
        }
        tt = exp.get("treatment_type", [])
        bf = exp.get("background_factors", [])
        props = {
            "name": clean_text(exp.get("name", "")),
            "organism_name": clean_text(exp.get("organism", "")),
            "compartment": clean_text(exp.get("compartment", "whole_cell")),
            "treatment_type": clean_text(tt if isinstance(tt, list) else [tt] if tt else []),
            "treatment": clean_text(exp.get("treatment_condition", "")),
            "control": clean_text(exp.get("control_condition", "")),
            "experimental_context": clean_text(exp.get("experimental_context", "")),
            "omics_type": clean_text(exp.get("omics_type", "")),
            "statistical_test": clean_text(exp.get("test_type", "")),
            "is_time_course": "true" if len(timepoints) > 1 else "false",
            "medium": clean_text(exp.get("medium", "")),
            "temperature": clean_text(exp.get("temperature", "")),
            "light_condition": clean_text(exp.get("light_condition", "")),
            "light_intensity": clean_text(exp.get("light_intensity", "")),
            "table_scope": clean_text(exp.get("table_scope", "")),
            "table_scope_detail": clean_text(exp.get("table_scope_detail", "")),
            "background_factors": clean_text(bf if isinstance(bf, list) else [bf] if bf else []),
        }
        partner = exp.get("treatment_organism", "")
        if partner:
            props["coculture_partner"] = clean_text(partner)
        rows.append((f"{pub_id_raw}_{exp_key}", "experiment", _stringify_props(props)))
    return spark.createDataFrame(rows, _NODE_SCHEMA)


_EDGE_COLS = [
    "edge_id",
    "src",
    "tgt",
    "label",
    "log2_fold_change",
    "adjusted_p_value",
    "significant",
    "expression_direction",
    "time_point",
    "time_point_order",
    "time_point_hours",
    "growth_phase",
]


def _structural_edges(spark: SparkSession, cfg: dict) -> DataFrame:
    """has_experiment + tests_coculture_with
    (omics_adapter.py:478-516)."""
    pub_id_raw = publication_id(cfg)
    pub_id = _prefixed("doi", pub_id_raw)
    experiments = (cfg.get("publication", {}) or {}).get("experiments", {}) or {}
    rows = []
    for exp_key, exp in experiments.items():
        if not isinstance(exp, dict):
            continue
        experiment_id = f"{pub_id_raw}_{exp_key}"
        rows.append(
            (f"{pub_id_raw}_has_exp_{exp_key}", pub_id, experiment_id, "has_experiment")
        )
        if exp.get("treatment_organism"):
            acc = exp.get("treatment_assembly_accession")
            taxid = exp.get("treatment_taxid")
            organism_id = (
                _prefixed("insdc.gcf", acc)
                if acc
                else _prefixed("ncbitaxon", str(taxid))
                if taxid
                else None
            )
            if organism_id:
                rows.append(
                    (
                        f"{pub_id_raw}_coculture_{exp_key}",
                        experiment_id,
                        organism_id,
                        "tests_coculture_with",
                    )
                )
    df = spark.createDataFrame(
        rows, "edge_id string, src string, tgt string, label string"
    )
    return df.select(
        "edge_id",
        "src",
        "tgt",
        "label",
        F.lit(None).cast("double").alias("log2_fold_change"),
        F.lit(None).cast("double").alias("adjusted_p_value"),
        F.lit(None).cast("string").alias("significant"),
        F.lit(None).cast("string").alias("expression_direction"),
        F.lit(None).cast("string").alias("time_point"),
        F.lit(None).cast("int").alias("time_point_order"),
        F.lit(None).cast("double").alias("time_point_hours"),
        F.lit(None).cast("string").alias("growth_phase"),
    )


def _tp_orders(spark: SparkSession, cfg: dict) -> dict[str, int]:
    """analysis_id -> time_point_order (omics_adapter.py:559-586):
    per experiment, analyses sorted by (timepoint_hours — explicit or
    parsed from the label via F3 — NULLS LAST, analysis id),
    enumerated from 1. Computed with the same Spark window as W7 over
    the config-cardinality analysis list."""
    from pyspark.sql import Window

    meta = [
        (
            str(sa.get("id", "")),
            str(sa.get("experiment", "")),
            sa.get("timepoint"),
            float(sa["timepoint_hours"])
            if sa.get("timepoint_hours") is not None
            else None,
        )
        for _, _, sa in _iter_analyses(cfg)
        if sa.get("experiment")
    ]
    if not meta:
        return {}
    df = spark.createDataFrame(
        meta,
        "analysis_id string, exp_key string, timepoint string, hours double",
    )
    hours = F.coalesce(F.col("hours"), parse_timepoint_hours(F.col("timepoint")))
    w = Window.partitionBy("exp_key").orderBy(
        F.coalesce(hours, F.lit(float("inf"))).asc(), F.col("analysis_id").asc()
    )
    out = df.select(
        "analysis_id", F.row_number().over(w).alias("tp_order")
    ).collect()
    return {r.analysis_id: r.tp_order for r in out}


def _tp_hours(spark: SparkSession, cfg: dict) -> dict[str, float | None]:
    """analysis_id -> timepoint_hours for every analysis whose config
    gives a timepoint label but no explicit hours — resolved through
    the SAME Column fn (F3 parse_timepoint_hours) in ONE tiny
    DataFrame pass over the config-cardinality analysis list, not one
    Spark job per analysis (the `_tp_orders` shape)."""
    meta = [
        (str(sa.get("id", "")), str(sa["timepoint"]))
        for _, _, sa in _iter_analyses(cfg)
        if sa.get("timepoint_hours") is None and sa.get("timepoint") is not None
    ]
    if not meta:
        return {}
    df = spark.createDataFrame(meta, "analysis_id string, timepoint string")
    out = df.select(
        "analysis_id", parse_timepoint_hours(F.col("timepoint")).alias("h")
    ).collect()
    return {r.analysis_id: r.h for r in out}


# cleaned gene id: pandas-NA sentinel -> null, then the reference's
# strip().strip('*').strip() chain, then empty -> null
def _clean_gene_id(c):
    t = F.trim(c)
    t = F.when(t.isin(_PANDAS_NA_TOKENS), F.lit(None)).otherwise(t)
    t = F.trim(F.regexp_replace(t, r"^\*+|\*+$", ""))
    return F.when(t == "", F.lit(None)).otherwise(t)


def paperconfig_expression_edges(
    spark: SparkSession, cfg: dict, read_csv=None
) -> DataFrame:
    """changes_expression_of edges from every csv-typed supp table
    (omics_adapter.py:517-850): per analysis, a config-driven
    ``transform_analysis`` pipeline (P1-P7/F4/F6/F7 — the hot path,
    fully distributed), gene ids cleaned and prefixed, deterministic
    edge ids '{pub}_{analysis}_{ncbigene:gene}' (F20).

    ``read_csv(spark, filename, sep, skiprows)`` defaults to a plain
    all-string header read; injectable for resolved-stage reads.
    """
    pub_id_raw = publication_id(cfg)
    experiments = (cfg.get("publication", {}) or {}).get("experiments", {}) or {}
    orders = _tp_orders(spark, cfg)
    parsed_hours = _tp_hours(spark, cfg)

    if read_csv is None:

        def read_csv(spark, filename, sep, skiprows):
            from multiomics_biocypher_kg_spark.sources.readers import (
                csv_with_dialect,
            )

            return csv_with_dialect(spark, filename, sep=sep, skiprows=skiprows)

    parts = []
    for _, table_data, sa in _iter_analyses(cfg):
        if table_data.get("type", "csv") != "csv":
            continue
        filename = table_data.get("filename")
        exp_key = sa.get("experiment")
        if not filename or not exp_key or exp_key not in experiments:
            continue
        analysis_id = str(sa.get("id", ""))
        timepoint = sa.get("timepoint")
        hours = sa.get("timepoint_hours")
        if hours is None and timepoint is not None:
            # parsed once for ALL analyses by _tp_hours (one job
            # regardless of analysis count), same Column fn as W7
            hours = parsed_hours.get(analysis_id)
        acfg = AnalysisConfig(
            analysis_id=analysis_id,
            experiment_id=f"{pub_id_raw}_{exp_key}",
            name_col=sa.get("name_col"),
            logfc_col=sa.get("logfc_col"),
            adjusted_p_value_col=sa.get("adjusted_p_value_col"),
            fold_change_type=sa.get("fold_change_type") or "log2",
            prefiltered=bool(sa.get("prefiltered")),
            pvalue_asterisk_in_logfc=bool(sa.get("pvalue_asterisk_in_logfc")),
            fold_change_threshold=sa.get("logfc_threshold") or 1.0,
            pvalue_threshold=sa.get("pvalue_threshold") or 0.05,
            time_point=timepoint,
            time_point_hours=float(hours) if hours is not None else None,
            growth_phase=sa.get("growth_phase"),
        )
        df = read_csv(
            spark,
            filename,
            sa.get("sep", table_data.get("sep", ",")),
            sa.get("skip_rows", table_data.get("skip_rows", 0)),
        )
        cleaned = df.withColumn(acfg.name_col, _clean_gene_id(F.col(acfg.name_col)))
        rows = transform_analysis(cleaned, acfg)
        gene = F.concat(F.lit("ncbigene:"), F.col("raw_id"))
        parts.append(
            rows.select(
                F.concat_ws(
                    "_", F.lit(pub_id_raw), F.lit(analysis_id), gene
                ).alias("edge_id"),
                F.col("experiment_id").alias("src"),
                gene.alias("tgt"),
                F.lit("changes_expression_of").alias("label"),
                "log2_fold_change",
                "adjusted_p_value",
                "significant",
                F.when(
                    F.col("log2_fold_change").isNotNull(),
                    F.col("expression_direction"),
                ).alias("expression_direction"),
                F.translate(F.lit(timepoint).cast("string"), "|'", ",^").alias(
                    "time_point"
                ),
                F.lit(orders.get(analysis_id, 1)).cast("int").alias(
                    "time_point_order"
                ),
                F.lit(acfg.time_point_hours).cast("double").alias(
                    "time_point_hours"
                ),
                F.translate(
                    F.lit(sa.get("growth_phase")).cast("string"), "|'", ",^"
                ).alias("growth_phase"),
            )
        )
    if not parts:
        return _structural_edges(spark, cfg).limit(0)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def paperconfig_edges(spark: SparkSession, cfg: dict, read_csv=None) -> DataFrame:
    """All edges the reference adapter emits for one paperconfig."""
    return _structural_edges(spark, cfg).unionByName(
        paperconfig_expression_edges(spark, cfg, read_csv=read_csv)
    )


def paperconfig_nodes_multi(spark: SparkSession, cfgs: list[dict]) -> DataFrame:
    """MultiOMICSAdapter concat (omics_adapter.py:941-974), node
    stream: one unionByName across papers; node ids are
    doi-namespaced so cross-paper unions cannot collide."""
    dfs = [paperconfig_nodes(spark, c) for c in cfgs]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def paperconfig_edges_multi(
    spark: SparkSession, cfgs: list[dict], read_csv=None
) -> DataFrame:
    """MultiOMICSAdapter concat, edge stream: edge ids are
    '{pub}_{analysis}_{gene}' (F20), publication-prefixed, so the
    union is collision-free by construction."""
    dfs = [paperconfig_edges(spark, c, read_csv=read_csv) for c in cfgs]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out
