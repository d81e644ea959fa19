"""Schema breadth: compile the reference's FULL schema_config.yaml
(/root/reference/config/schema_config.yaml — 30 node + 77 edge types
active) through schema.SchemaRegistry with zero unmapped property
types, then push a multi-label nodes/edges fixture through the typed
emission + materialize sink. VERDICT r2 gap #4."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from multiomics_biocypher_kg_spark.schema import SchemaRegistry, parse_type

REF_SCHEMA = "/root/reference/config/schema_config.yaml"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(REF_SCHEMA), reason="reference checkout not present"
)


@pytest.fixture(scope="module")
def registry():
    return SchemaRegistry.from_yaml(REF_SCHEMA)


def test_full_schema_compiles(registry):
    """Every declared property of every active entity maps to a
    Spark type; counts match the reference inventory."""
    import yaml

    cfg = yaml.safe_load(open(REF_SCHEMA))
    active = {
        k: v
        for k, v in cfg.items()
        if isinstance(v, dict) and "represented_as" in v
    }
    assert len(registry.entities) == len(active)
    assert len(registry.node_labels()) == 30
    assert len(registry.edge_labels()) == 77

    # zero unmapped types — parse_type raised nowhere during from_yaml,
    # but assert explicitly over the raw declarations too
    for label, spec in active.items():
        for prop, decl in (spec.get("properties") or {}).items():
            dt = parse_type(str(decl))
            assert dt is not None, (label, prop, decl)
            assert registry.entities[label].properties[prop] == dt

    # the type-system surface the SURVEY documents, all present
    seen = {
        str(decl).split("#")[0].strip()
        for spec in active.values()
        for decl in (spec.get("properties") or {}).values()
    }
    assert {"str", "str[]", "int", "int[]", "float", "float[]", "list[str]"} <= seen


def test_full_schema_parallel_arrays_and_enums(registry):
    """The tricky declarations compile to the right Spark types:
    parallel arrays (experiment time_point_* — schema_config.yaml
    lines ~71-77), boolean string enums (rankable: str #
    "true"|"false"), embedding vectors (float[])."""
    exp = registry.entities["experiment"]
    assert exp.properties["time_point_labels"] == T.ArrayType(T.StringType())
    assert exp.properties["time_point_orders"] == T.ArrayType(T.LongType())
    assert exp.properties["time_point_hours"] == T.ArrayType(T.DoubleType())
    dm = registry.entities["derived metric"]
    assert dm.properties["rankable"] == T.StringType()  # string enum
    bp = registry.entities["biological process"]
    assert bp.properties["anc2vec_embedding"] == T.ArrayType(T.DoubleType())
    met = registry.entities["metabolite"]
    assert met.properties["pathway_ids"] == T.ArrayType(T.StringType())


def test_multi_label_materialize_through_sink(registry, spark, tmp_path):
    """Emit two node labels + one edge label through the typed
    emission helpers and the merge_into sink; re-read and check the
    struct schemas survive parquet round-trip."""
    from multiomics_biocypher_kg_spark.operators.materialize import (
        merge_into,
        referential_filter,
    )

    genes = spark.createDataFrame(
        [("PMM0001", "psbA", ["psbA", "PMM0001"]), ("PMM0002", "dnaA", ["dnaA"])],
        "locus string, name string, synonyms array<string>",
    )
    gene_nodes = registry.emit_nodes(
        genes,
        "gene",
        F.concat(F.lit("ncbigene:"), F.col("locus")),
        {"gene_name": F.col("name"), "gene_name_synonyms": F.col("synonyms")},
    )
    pubs = spark.createDataFrame([("10.1/x", "A Paper", 2024)], "doi string, t string, y int")
    pub_nodes = registry.emit_nodes(
        pubs,
        "publication",
        F.concat(F.lit("doi:"), F.col("doi")),
        {"title": F.col("t"), "publication_year": F.col("y")},
    )
    assert gene_nodes.schema["props"].dataType != pub_nodes.schema["props"].dataType

    edges = registry.emit_edges(
        genes.crossJoin(pubs),
        "derived metric classifies gene",
        F.concat(F.lit("ncbigene:"), F.col("locus")),
        F.concat(F.lit("doi:"), F.col("doi")),
        {},
    )
    # multi-label union for the partitioned nodes table: shared
    # (node_id, label) core + per-label props tables (the per-label
    # Iceberg layout of SURVEY §1.1)
    core = gene_nodes.select("node_id", "label").unionByName(
        pub_nodes.select("node_id", "label")
    )
    assert core.count() == 3

    target = str(tmp_path / "gene_nodes")
    merge_into(spark, target, gene_nodes, ["node_id"])
    merge_into(spark, target, gene_nodes, ["node_id"])  # idempotent
    back = spark.read.parquet(target)
    assert back.count() == 2
    assert back.schema["props"].dataType == gene_nodes.schema["props"].dataType
    assert {r.node_id for r in back.collect()} == {
        "ncbigene:PMM0001",
        "ncbigene:PMM0002",
    }

    kept = referential_filter(
        edges.withColumnRenamed("subj", "subj"),
        core.select(F.col("node_id").alias("id")),
    )
    assert kept.count() == edges.count()  # all targets/sources exist
