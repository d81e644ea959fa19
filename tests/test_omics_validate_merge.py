"""Reference-parity tests for the omics transform, hard-error
validation contracts, declarative merge rules, and CURIE handling —
mirrors the reference's own unit-test strategy (SURVEY.md §5.1:
synthetic fixtures, exact emitted tuples)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.functions.curie import (
    clean_text,
    make_curie,
    normalize_curie_col,
    normalize_prefix,
)
from multiomics_biocypher_kg_spark.functions.omics import (
    AnalysisConfig,
    assign_time_point_order,
    expression_edges,
    is_time_course,
    transform_analysis,
)
from multiomics_biocypher_kg_spark.functions.validate import (
    ValidationError,
    enforce_categories,
    map_boolean_tokens,
    parse_embedded_stats,
)
from multiomics_biocypher_kg_spark.operators.merge_rules import (
    FieldRule,
    SourceSpec,
    merge_sources,
)

DE_ROWS = [
    # Synonym, log2fc, qValue  (FIXTURES.md B2 shape)
    ("PMM0001", "2.5", "0.01"),     # significant
    ("PMM0002", "0.5", "0.01"),     # |fc| < thr
    ("PMM0003", "-3.0", "0.2"),     # p > thr
    ("PMM0004", "1.1*", "0.5"),     # asterisk wins
    ("PMM0005", "2.0", None),       # p missing -> unknown
    ("", "2.0", "0.01"),            # blank id -> dropped
    ("PMM0006", "NA", "0.01"),      # unparseable fc -> dropped
    ("PMM0007", "inf", "0.01"),     # non-finite -> dropped
]


def _de(spark):
    return spark.createDataFrame(
        DE_ROWS, "Synonym string, log2fc string, qValue string"
    )


def test_omics_transform_cascade_asterisk_mode(spark):
    """pvalue_asterisk_in_logfc: the asterisk ALONE decides — rows
    without one are 'not significant', no threshold fall-through
    (_check_significance, omics_adapter.py:617-618)."""
    cfg = AnalysisConfig(
        analysis_id="a1",
        experiment_id="e1",
        name_col="Synonym",
        logfc_col="log2fc",
        adjusted_p_value_col="qValue",
        pvalue_asterisk_in_logfc=True,
    )
    rows = {r.raw_id: r for r in transform_analysis(_de(spark), cfg).collect()}
    assert set(rows) == {"PMM0001", "PMM0002", "PMM0003", "PMM0004", "PMM0005"}
    assert rows["PMM0001"].significant == "not significant"  # no asterisk
    assert rows["PMM0001"].expression_direction == "up"
    assert rows["PMM0003"].expression_direction == "down"
    assert rows["PMM0004"].significant == "significant"  # F6 asterisk
    assert rows["PMM0004"].log2_fold_change == 1.1
    assert rows["PMM0005"].significant == "not significant"


def test_omics_transform_cascade_threshold_mode(spark):
    """Threshold mode: AND of the checks whose threshold and value
    are both present — a null p-value SKIPS the p check rather than
    yielding 'unknown' (omics_adapter.py:620-632)."""
    cfg = AnalysisConfig(
        analysis_id="a1",
        experiment_id="e1",
        name_col="Synonym",
        logfc_col="log2fc",
        adjusted_p_value_col="qValue",
    )
    rows = {r.raw_id: r for r in transform_analysis(_de(spark), cfg).collect()}
    assert rows["PMM0001"].significant == "significant"
    assert rows["PMM0002"].significant == "not significant"  # |fc| < thr
    assert rows["PMM0003"].significant == "not significant"  # p > thr
    assert rows["PMM0004"].significant == "not significant"  # p 0.5 > thr
    assert rows["PMM0005"].significant == "significant"  # p missing: fc alone


def test_omics_transform_cascade_no_thresholds_unknown(spark):
    cfg = AnalysisConfig(
        analysis_id="a1",
        experiment_id="e1",
        name_col="Synonym",
        logfc_col="log2fc",
        adjusted_p_value_col="qValue",
        fold_change_threshold=None,
        pvalue_threshold=None,
    )
    rows = {r.raw_id: r for r in transform_analysis(_de(spark), cfg).collect()}
    assert {r.significant for r in rows.values()} == {"unknown"}


def test_significant_only_and_test_mode_limit(spark):
    """P6/P7: config-driven significant-only filter + test-mode cap."""
    cfg = AnalysisConfig(
        analysis_id="a1",
        experiment_id="e1",
        name_col="Synonym",
        logfc_col="log2fc",
        adjusted_p_value_col="qValue",
        significant_only=True,
    )
    rows = transform_analysis(_de(spark), cfg).collect()
    assert {r.significant for r in rows} == {"significant"}
    assert {r.raw_id for r in rows} == {"PMM0001", "PMM0005"}
    capped = AnalysisConfig(
        analysis_id="a1",
        experiment_id="e1",
        name_col="Synonym",
        logfc_col="log2fc",
        test_mode_limit=2,
    )
    assert transform_analysis(_de(spark), capped).count() == 2


def test_replicate_wide_drop_undetected(spark):
    """P10: the drop_undetected config removes not_detected rows."""
    from multiomics_biocypher_kg_spark.functions.omics import (
        aggregate_replicates_wide,
    )

    df = spark.createDataFrame(
        [("m1", "1.0", "2.0"), ("m2", "0", "ND"), ("m3", "NA", "")],
        "metabolite string, r1 string, r2 string",
    )
    kept = aggregate_replicates_wide(
        df, ["metabolite"], ["r1", "r2"], drop_undetected=True
    )
    assert {r.metabolite for r in kept.collect()} == {"m1"}
    full = aggregate_replicates_wide(df, ["metabolite"], ["r1", "r2"])
    statuses = {r.metabolite: r.detection_status for r in full.collect()}
    assert statuses == {
        "m1": "detected",
        "m2": "not_detected",
        "m3": "not_detected",
    }


def test_table_type_dispatch(spark):
    """P9: per-type routing with hard error on unknown types."""
    import pytest
    from multiomics_biocypher_kg_spark.functions.omics import transform_table

    clusters = spark.createDataFrame(
        [("c1", "g1, g2; g3"), ("c2", "g4")], "cluster string, members string"
    )
    out = transform_table(
        clusters, "gene_clusters", cluster_col="cluster", members_col="members"
    )
    assert {(r.cluster_id, r.gene_id) for r in out.collect()} == {
        ("c1", "g1"), ("c1", "g2"), ("c1", "g3"), ("c2", "g4"),
    }
    ids = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("", "y"), ("b", None)], "f string, t string"
    )
    tr = transform_table(ids, "id_translation", from_col="f", to_col="t")
    assert {(r.from_id, r.to_id) for r in tr.collect()} == {("a", "x")}
    with pytest.raises(ValueError, match="unknown table_type"):
        transform_table(ids, "nope")


def test_parse_timepoint_hours_reference_examples(spark):
    """F3: every example from parse_timepoint_hours' docstring
    (paperconfig_utils.py:185-213)."""
    from multiomics_biocypher_kg_spark.functions.omics import parse_timepoint_hours
    from pyspark.sql import functions as F

    cases = [
        ("4h", 4.0),
        ("0.5h", 0.5),
        ("-12h", -12.0),
        ("day 18", 432.0),
        ("Day 2", 48.0),
        ("50h (P added)", 50.0),
        ("0.5h post-inoculation", 0.5),
        ("1h extended darkness (36h)", 36.0),
        ("R (rescue: ...)", None),
        ("R", None),
        ("days 60+89", None),
        ("", None),
        (None, None),
        ("no numbers", None),
    ]
    df = spark.createDataFrame([(i, c[0]) for i, c in enumerate(cases)], "i int, tp string")
    out = {r.i: r.h for r in df.select("i", parse_timepoint_hours(F.col("tp")).alias("h")).collect()}
    for i, (label, want) in enumerate(cases):
        assert out[i] == want, (label, out[i], want)


def test_omics_linear_conversion_and_prefiltered(spark):
    df = spark.createDataFrame(
        [("g1", "4.0", "0.9"), ("g2", "-2.0", "0.9"), ("g3", "0", "0.9")],
        "Synonym string, fc string, p string",
    )
    cfg = AnalysisConfig(
        analysis_id="a2",
        experiment_id="e1",
        name_col="Synonym",
        logfc_col="fc",
        adjusted_p_value_col="p",
        fold_change_type="linear",
        prefiltered=True,
    )
    rows = {r.raw_id: r for r in transform_analysis(df, cfg).collect()}
    # linear 4.0 -> log2 = 2.0; non-positive dropped (F4)
    assert set(rows) == {"g1"}
    assert math.isclose(rows["g1"].log2_fold_change, 2.0)
    assert rows["g1"].significant == "significant"  # prefiltered wins


def test_omics_missing_column_guard(spark):
    cfg = AnalysisConfig(
        analysis_id="a3", experiment_id="e1", name_col="nope", logfc_col="log2fc"
    )
    with pytest.raises(ValueError, match="missing column"):
        transform_analysis(_de(spark), cfg)


def test_time_point_order_and_time_course(spark):
    meta = spark.createDataFrame(
        [
            ("a1", "e1", "4h", 4.0),
            ("a2", "e1", "late", None),  # null hours sorts last (W7)
            ("a3", "e1", "1h", 1.0),
            ("b1", "e2", "t0", 0.0),
        ],
        "analysis_id string, experiment_id string, time_point string, time_point_hours double",
    )
    order = {
        r.analysis_id: r.time_point_order
        for r in assign_time_point_order(meta).collect()
    }
    assert order == {"a3": 1, "a1": 2, "a2": 3, "b1": 1}
    tc = {r.experiment_id: r.is_time_course for r in is_time_course(meta).collect()}
    assert tc == {"e1": "true", "e2": "false"}


def test_expression_edges_deterministic_ids(spark):
    cfg = AnalysisConfig(
        analysis_id="a1",
        experiment_id="e1",
        name_col="Synonym",
        logfc_col="log2fc",
        adjusted_p_value_col="qValue",
        pvalue_asterisk_in_logfc=True,
    )
    edges = expression_edges(transform_analysis(_de(spark), cfg), "doi:10.1/x")
    e = {r.obj: r for r in edges.collect()}
    assert e["PMM0001"].edge_id == "doi:10.1/x_a1_PMM0001"
    # asterisk mode: only the asterisked row is significant
    assert e["PMM0004"].props.significant == "significant"
    assert e["PMM0001"].props.significant == "not significant"


def test_boolean_tokens_hard_error(spark):
    ok = spark.createDataFrame(
        [("yes",), ("no",), ("",), (None,), ("nd",)], "v string"
    )
    out = map_boolean_tokens(ok, "v", ["yes"], ["no"], skip_tokens=["nd"])
    vals = [r.v_bool for r in out.collect()]
    assert vals.count("true") == 1 and vals.count("false") == 1
    bad = spark.createDataFrame([("yes",), ("maybe",)], "v string")
    with pytest.raises(ValidationError, match="unknown boolean token"):
        map_boolean_tokens(bad, "v", ["yes"], ["no"])


def test_categories_hard_error(spark):
    ok = spark.createDataFrame([("red",), (None,)], "c string")
    enforce_categories(ok, "c", ["red", "blue"])  # no raise
    bad = spark.createDataFrame([("red",), ("green",)], "c string")
    with pytest.raises(ValidationError, match="out-of-vocabulary"):
        enforce_categories(bad, "c", ["red", "blue"])


def test_embedded_stats_parse(spark):
    """Pinned to parse_embedded_mean_sd_n: the WHOLE cell must match
    the '(sd), n=N' grammar; 'nd' -> (0,0,0); 'NA' sd -> 0.0."""
    df = spark.createDataFrame(
        [
            ("0.00054 (8.8e-05), n=2",),
            ("1.5",),
            ("bad",),
            ("ND",),
            ("0.3 (NA), n=1",),
        ],
        "cell string",
    )
    rows = {r.cell: r for r in parse_embedded_stats(df, "cell").collect()}
    r0 = rows["0.00054 (8.8e-05), n=2"]
    assert math.isclose(r0.cell_mean, 0.00054)
    assert math.isclose(r0.cell_sd, 8.8e-05)
    assert r0.cell_n == 2
    # bare number: reference returns None (full-grammar match required)
    r1 = rows["1.5"]
    assert r1.cell_mean is None and r1.cell_sd is None and r1.cell_n is None
    assert rows["bad"].cell_mean is None
    rnd = rows["ND"]
    assert (rnd.cell_mean, rnd.cell_sd, rnd.cell_n) == (0.0, 0.0, 0)
    rna = rows["0.3 (NA), n=1"]
    assert (rna.cell_mean, rna.cell_sd, rna.cell_n) == (0.3, 0.0, 1)


def test_merge_rules(spark):
    anchor = spark.createDataFrame(
        [("g1",), ("g2",), ("g3",)], "locus_tag string"
    )
    eggnog = spark.createDataFrame(
        [("g1", "dnaA", ["GO:1", "GO:2"], "7"), ("g2", None, ["GO:2"], None)],
        "locus_tag string, gene_name string, go array<string>, ev string",
    )
    uniprot = spark.createDataFrame(
        [(["g1", "g9"], "DnaA protein", ["GO:3"]), (["g3"], "thing", None)],
        "refseq_ids array<string>, product string, go array<string>",
    )
    merged = merge_sources(
        anchor,
        [
            SourceSpec("egg", eggnog, "locus_tag"),
            SourceSpec("uni", uniprot, "locus_tag", pivot_explode="refseq_ids"),
        ],
        [
            FieldRule("gene_name", "single", ["egg.gene_name", "uni.product"]),
            FieldRule("go_terms", "union", ["egg.go", "uni.go"]),
            FieldRule("evalue", "float", ["egg.ev"]),
            FieldRule("summary", "concat", ["egg.gene_name", "uni.product"]),
        ],
    )
    m = {r.locus_tag: r for r in merged.collect()}
    assert m["g1"].gene_name == "dnaA"  # priority: eggnog first
    assert m["g1"].go_terms == ["GO:1", "GO:2", "GO:3"]  # union, sorted
    assert m["g1"].evalue == 7.0
    assert m["g1"].summary == "dnaA :: DnaA protein"
    assert m["g2"].gene_name is None and m["g2"].go_terms == ["GO:2"]
    assert m["g3"].gene_name == "thing"  # J9 pivot re-key found it
    assert m["g3"].go_terms == []


def test_curie_and_clean_text(spark):
    assert normalize_prefix("NCBIGene") == "ncbigene"
    assert normalize_prefix("My Weird DB") == "my_weird_db"
    df = spark.createDataFrame([("PMM0001",)], "x string")
    assert df.select(make_curie("NCBIGene", F.col("x")).alias("c")).collect()[0].c == "ncbigene:PMM0001"
    df2 = spark.createDataFrame([("GO:0005737",), ("foo bar:1",)], "c string")
    got = [r.n for r in df2.select(normalize_curie_col(F.col("c")).alias("n")).collect()]
    assert got == ["go:0005737", "foo_bar:1"]
    df3 = spark.createDataFrame([("a|b'c",)], "t string")
    assert df3.select(clean_text(F.col("t")).alias("o")).collect()[0].o == "a,b^c"


def test_omics_transform_reference_edge_semantics(spark):
    """Round-3 parity pins (all mirroring omics_adapter.py exactly):
    leading asterisks count and are stripped; asterisk mode stores a
    placeholder adjusted_p_value (threshold / 1.0); non-finite
    p-values are treated as absent; linear tables threshold the RAW
    fold change, not its log2; significant_only keeps 'unknown'."""
    df = spark.createDataFrame(
        [
            ("G1", "* 1.3", "0.9"),   # leading asterisk -> significant
            ("G2", "1.3 *", None),    # trailing with space
            ("G3", "1.3", "inf"),     # non-finite p
        ],
        "Synonym string, log2fc string, qValue string",
    )
    ast = AnalysisConfig(
        analysis_id="a1",
        experiment_id="e1",
        name_col="Synonym",
        logfc_col="log2fc",
        adjusted_p_value_col="qValue",
        pvalue_asterisk_in_logfc=True,
    )
    rows = {r.raw_id: r for r in transform_analysis(df, ast).collect()}
    assert rows["G1"].significant == "significant"
    assert rows["G1"].log2_fold_change == 1.3
    assert rows["G1"].adjusted_p_value == 0.05  # placeholder, not 0.9
    assert rows["G2"].significant == "significant"
    assert rows["G3"].significant == "not significant"
    assert rows["G3"].adjusted_p_value == 1.0

    # non-finite p skips the p check in threshold mode
    thr = AnalysisConfig(
        analysis_id="a1",
        experiment_id="e1",
        name_col="Synonym",
        logfc_col="log2fc",
        adjusted_p_value_col="qValue",
    )
    df2 = spark.createDataFrame(
        [("G4", "2.0", "inf"), ("G5", "2.0", "0.5")],
        "Synonym string, log2fc string, qValue string",
    )
    rows2 = {r.raw_id: r for r in transform_analysis(df2, thr).collect()}
    assert rows2["G4"].significant == "significant"  # p treated absent
    assert rows2["G4"].adjusted_p_value is None
    assert rows2["G5"].significant == "not significant"

    # linear: |raw fc| >= 1.0 decides, log2_fold_change is emitted
    lin = AnalysisConfig(
        analysis_id="a1",
        experiment_id="e1",
        name_col="Synonym",
        logfc_col="log2fc",
        fold_change_type="linear",
    )
    df3 = spark.createDataFrame(
        [("G6", "1.5", None), ("G7", "0.4", None), ("G8", "-2.0", None)],
        "Synonym string, log2fc string, qValue string",
    )
    rows3 = {r.raw_id: r for r in transform_analysis(df3, lin).collect()}
    assert set(rows3) == {"G6", "G7"}  # non-positive linear fc dropped
    import math

    assert abs(rows3["G6"].log2_fold_change - math.log2(1.5)) < 1e-12
    assert rows3["G6"].significant == "significant"   # |1.5| >= 1.0 raw
    # raw 0.4 < 1.0 -> not significant even though |log2(0.4)|=1.32 >= 1
    assert rows3["G7"].significant == "not significant"

    # significant_only keeps 'unknown' rows (reference drops only
    # 'not significant')
    unk = AnalysisConfig(
        analysis_id="a1",
        experiment_id="e1",
        name_col="Synonym",
        logfc_col="log2fc",
        fold_change_threshold=None,
        pvalue_threshold=None,
        significant_only=True,
    )
    rows4 = transform_analysis(df3, unk).collect()
    assert {r.significant for r in rows4} == {"unknown"}
