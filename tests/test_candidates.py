"""Candidate-ID generation (J4/J5) — fixtures mirror the reference's
expand_list / defline-extraction docstring examples
(gene_id_utils.py:327-357,394-456,459-475)."""

from __future__ import annotations

from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.functions import candidates as cg
from multiomics_biocypher_kg_spark.operators.link import expand_candidates, link
from multiomics_biocypher_kg_spark.sources.vocab import vocab_df


def _eval(spark, col, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r.out for r in df.select(col(F.col("v")).alias("out")).collect()]


def test_expand_list_reference_examples(spark):
    out = _eval(
        spark,
        cg.expand_list,
        [
            "PMM0001",
            "PMM0001, PMM0002",
            "dnaA; dnaN",
            "PMED4_00651 (PMM0063)",
            "",
            "nan",
        ],
    )
    assert out[0] == ["PMM0001"]
    assert out[1] == ["PMM0001, PMM0002", "PMM0001", "PMM0002"]
    assert out[2] == ["dnaA; dnaN", "dnaA", "dnaN"]
    assert out[3] == ["PMED4_00651 (PMM0063)", "PMED4_00651", "PMM0063"]
    assert out[4] == [] and out[5] == []


def test_heuristic_variants_reference_examples(spark):
    out = _eval(
        spark,
        cg.heuristic_variants,
        ["PMM0001*", "AAV95689", "AAV95689.1", "PMM0001"],
    )
    assert out[0] == ["PMM0001"]  # footnote strip
    assert out[1] == ["AAV95689.1"]  # version candidate add
    assert out[2] == []  # already versioned
    assert out[3] == []  # too few digits for the accession pattern


def test_ncbi_defline_tokens(spark):
    out = _eval(
        spark,
        cg.ncbi_defline_tokens,
        [
            "gi|33860650|ref|NP_892211.1| serine protease",
            "gi|1|ref|NP_1.1| x; gi|2|gb|CAE18549.1| possible serine protease",
            "no defline here",
        ],
    )
    assert [(t.token, t.id_type) for t in out[0]] == [
        ("NP_892211.1", "protein_id_refseq")
    ]
    assert [t.token for t in out[1]] == ["NP_1.1", "CAE18549.1"]
    assert out[2] == []


def test_uniprot_defline_tokens(spark):
    out = _eval(
        spark,
        cg.uniprot_defline_tokens,
        ["sp|Q31L36|RF1_SYNE7", "tr|E0IXR1|E0IXR1_ECOLW Sucrose permease"],
    )
    assert [(t.token, t.id_type) for t in out[0]] == [
        ("Q31L36", "uniprot_accession"),
        ("RF1_SYNE7", "uniprot_entry_name"),
    ]
    assert [t.token for t in out[1]] == ["E0IXR1", "E0IXR1_ECOLW"]


def test_uniprot_annotation_tokens(spark):
    out = _eval(
        spark,
        cg.uniprot_annotation_tokens,
        ["Q31DF2_PROM9 Possible porin GN=somA", "plain product description", ""],
    )
    assert [(t.token, t.id_type) for t in out[0]] == [
        ("Q31DF2_PROM9", "uniprot_entry_name"),
        ("somA", "gene_name"),
    ]
    assert out[1] == []  # lowercase leading token: no entry match, no GN=
    assert out[2] == []


def test_uniprot_annotation_gn_word_boundary(spark):
    """\\bGN= (gene_id_utils.py _UNIPROT_ANNOT_GN_RE): 'AGN=x' /
    'LOGN=y' must NOT emit a gene_name token."""
    out = _eval(
        spark,
        cg.uniprot_annotation_tokens,
        [
            "RL33_PROM9 product AGN=x more",
            "RL33_PROM9 product LOGN=y",
            "RL33_PROM9 product GN=real",
        ],
    )
    assert [(t.token, t.id_type) for t in out[0]] == [
        ("RL33_PROM9", "uniprot_entry_name")
    ]
    assert [(t.token, t.id_type) for t in out[1]] == [
        ("RL33_PROM9", "uniprot_entry_name")
    ]
    assert ("real", "gene_name") in [(t.token, t.id_type) for t in out[2]]


def test_uniprot_entry_candidates_suffix_strip(spark):
    """F12: 'DNAA_PROM0' -> [DNAA_PROM0, DNAA] (gene_id_graph.py:70-86)."""
    out = _eval(
        spark,
        cg.uniprot_entry_candidates,
        ["DNAA_PROM0", "DNAA", "_PROM0", "", "nan"],
    )
    assert [(t.token, t.id_type) for t in out[0]] == [
        ("DNAA_PROM0", "uniprot_entry_name"),
        ("DNAA", "uniprot_entry_name"),
    ]
    assert [t.token for t in out[1]] == ["DNAA"]  # no '_' to strip
    assert [t.token for t in out[2]] == ["_PROM0"]  # idx 0: no strip
    assert out[3] == [] and out[4] == []


def test_formula_elements(spark):
    from multiomics_biocypher_kg_spark.functions.chem import formula_elements

    out = _eval(
        spark,
        formula_elements,
        ["C6H12O6", "H2O", "(CH3)2SO", "CuSO4.5H2O", "garbage!", "", None],
    )
    assert out[0] == ["C", "H", "O"]
    assert out[1] == ["H", "O"]
    assert out[2] == ["C", "H", "O", "S"]
    assert out[3] == ["Cu", "H", "O", "S"]
    assert out[4] == [] and out[5] == [] and out[6] == []


def test_expand_candidates_feeds_link_first_hit_wins(spark):
    """Integration: a messy multi-valued cell resolves via its FIRST
    resolving candidate (cand_rank order), matching resolve_row's
    first-hit-wins contract."""
    cells = spark.createDataFrame(
        [
            (1, "PMM0001, zzz", "other"),
            (2, "zzz (dnaA)", "other"),
            (3, "gi|1|ref|NP_892211.1| serine protease", "ncbi_protein_defline"),
        ],
        "row_id long, raw_value string, id_type string",
    )
    extra = [
        ("PMM0001", "gene", 1, "ncbigene:PMM0001", "test"),
        ("dnaA", "gene", 1, "ncbigene:PMM0001", "test"),
        ("NP_892211.1", "protein", 1, "refseq:NP_892211.1", "test"),
    ]
    vocab = vocab_df(spark, extra_rows=extra)
    cands = expand_candidates(cells)
    linked = link(cands, vocab)
    resolved = (
        linked.where(F.col("entity_id").isNotNull())
        .groupBy("row_id")
        .agg(F.min_by("entity_id", "cand_rank").alias("entity_id"))
    )
    out = {r.row_id: r.entity_id for r in resolved.collect()}
    assert out == {
        1: "ncbigene:PMM0001",
        2: "ncbigene:PMM0001",
        3: "refseq:NP_892211.1",
    }
    # candidate order: the raw value always ranks 1
    first = {
        r.row_id: r.token
        for r in cands.where(F.col("cand_rank") == 1).collect()
    }
    assert first[1] == "PMM0001, zzz"
    assert first[2] == "zzz (dnaA)"
    assert first[3] == "NP_892211.1"
