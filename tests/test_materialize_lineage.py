"""MERGE-with-accretion semantics (G7/U5): the incremental
merge_into(accrete=...) fold equals the one-shot accrete_evidence
batch form, re-runs are idempotent, and non-accrete columns
overwrite on match (post-import.cypher:1052-1094)."""

from __future__ import annotations

from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.operators.materialize import (
    accrete_evidence,
    merge_into,
)


def _arm(spark, source, pairs, extra=None):
    rows = [
        (s, o, [source]) + ((extra.get((s, o), 0),) if extra is not None else ())
        for s, o in pairs
    ]
    schema = "subj string, obj string, evidence_sources array<string>" + (
        ", assay_count int" if extra is not None else ""
    )
    return spark.createDataFrame(rows, schema)


def _read_map(spark, path):
    return {
        (r.subj, r.obj): list(r.evidence_sources)
        for r in spark.read.parquet(path).collect()
    }


def test_merge_fold_equals_oneshot_accretion(spark, tmp_path):
    target = str(tmp_path / "edges")
    arms = [
        ("metabolism", [("o1", "m1"), ("o1", "m2")]),
        ("transport", [("o1", "m1"), ("o2", "m1")]),
        ("measured", [("o1", "m1"), ("o1", "m2"), ("o2", "m1"), ("o3", "m3")]),
    ]
    for source, pairs in arms:
        merge_into(
            spark,
            target,
            _arm(spark, source, pairs),
            keys=["subj", "obj"],
            accrete=["evidence_sources"],
        )
    folded = _read_map(spark, target)
    oneshot = {
        (r.subj, r.obj): list(r.evidence_sources)
        for r in accrete_evidence(
            [
                (
                    source,
                    spark.createDataFrame(pairs, "subj string, obj string"),
                )
                for source, pairs in arms
            ],
            keys=["subj", "obj"],
        ).collect()
    }
    assert folded == oneshot
    assert folded[("o1", "m1")] == ["metabolism", "transport", "measured"]
    assert folded[("o3", "m3")] == ["measured"]


def test_merge_accretion_rerun_idempotent(spark, tmp_path):
    target = str(tmp_path / "edges")
    arm = _arm(spark, "metabolism", [("o1", "m1")])
    merge_into(spark, target, arm, ["subj", "obj"], accrete=["evidence_sources"])
    merge_into(spark, target, arm, ["subj", "obj"], accrete=["evidence_sources"])
    assert _read_map(spark, target) == {("o1", "m1"): ["metabolism"]}


def test_merge_into_sql_stmt_renders_catalog_twin():
    """The real MERGE INTO statement (Iceberg/Delta path) stays in
    lockstep with the parquet emulation's semantics: null-safe key
    match, array_union accretion, overwrite otherwise, INSERT *."""
    from multiomics_biocypher_kg_spark.operators.materialize import (
        merge_into_sql_stmt,
    )

    stmt = merge_into_sql_stmt(
        "kg.edges",
        "updates",
        keys=["subj", "obj"],
        value_cols=["evidence_sources", "assay_count"],
        accrete=["evidence_sources"],
    )
    assert stmt == (
        "MERGE INTO kg.edges t USING updates u "
        "ON t.`subj` <=> u.`subj` AND t.`obj` <=> u.`obj` "
        "WHEN MATCHED THEN UPDATE SET "
        "t.`evidence_sources` = array_union(coalesce(t.`evidence_sources`, array()), "
        "coalesce(u.`evidence_sources`, array())), "
        "t.`assay_count` = u.`assay_count` "
        "WHEN NOT MATCHED THEN INSERT *"
    )


def test_merge_overwrites_non_accrete_columns(spark, tmp_path):
    """Mirrors the measurement arm: evidence_sources accretes, the
    measured_* scalar props are SET (overwritten) with fresh values."""
    target = str(tmp_path / "edges")
    merge_into(
        spark,
        target,
        _arm(spark, "metabolism", [("o1", "m1")], extra={("o1", "m1"): 0}),
        ["subj", "obj"],
        accrete=["evidence_sources"],
    )
    merge_into(
        spark,
        target,
        _arm(spark, "measured", [("o1", "m1"), ("o2", "m2")], extra={("o1", "m1"): 5, ("o2", "m2"): 2}),
        ["subj", "obj"],
        accrete=["evidence_sources"],
    )
    rows = {(r.subj, r.obj): r for r in spark.read.parquet(target).collect()}
    assert list(rows[("o1", "m1")].evidence_sources) == ["metabolism", "measured"]
    assert rows[("o1", "m1")].assay_count == 5  # overwritten on match
    assert list(rows[("o2", "m2")].evidence_sources) == ["measured"]
    assert rows[("o2", "m2")].assay_count == 2
