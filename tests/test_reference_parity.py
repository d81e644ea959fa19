"""Differential parity: our row-level resolver (operators.link.
resolve_rows) vs the REFERENCE'S OWN resolve_row implementation
(/root/reference/multiomics_kg/utils/gene_id_utils.py), imported and
executed directly on the same mapping + the same messy rows.

This is the strongest available P/R evidence: the reference code
itself is the oracle, over both curated edge cases and a
deterministic fuzz sweep. Skipped when the reference checkout is
absent (the repo stands alone without it)."""

from __future__ import annotations

import os
import sys

import pytest

from multiomics_biocypher_kg_spark.operators.link import resolve_rows
from multiomics_biocypher_kg_spark.sources.vocab import VOCAB_SCHEMA

from tests.ref_pin import REF, reference_status

_REF_SKIP = reference_status()
pytestmark = pytest.mark.skipif(
    _REF_SKIP is not None, reason=_REF_SKIP or "reference pinned"
)

# the shared mapping: tier-1 specific lookups (a dict in the
# reference, so unambiguous by construction), locus tags, tier-2
# multi lookups (singletons resolve, >1 is ambiguous)
SPECIFIC = {
    "PMM0001": "PMM0001",
    "dnaA": "PMM0001",
    "AAV95689.1": "PMM0042",
    "GeneX": "PMM0010",
    "NP_892211.1": "PMM0099",
    "RL33_PROM9": "PMM0033",
}
LOCUS_TAGS = {"PMM0001", "PMM0042", "PMM0010", "PMM0077", "PMM0099", "PMM0033"}
MULTI = {
    "psbA": ["PMM0020"],
    "rbcL": ["PMM0030", "PMM0031"],
    "ftsZ": ["PMM0060"],
    # all-lowercase surface: its lowered form IS an exact key, so the
    # reference's CI index skips it (_build_ci_indexes) — 'LOWER2'
    # must stay unresolved on both sides
    "lower2": ["PMM0070"],
}

SURFACE_POOL = [
    "PMM0001", "dnaA", "GeneX", "psbA", "rbcL", "zzz", "PMM0077",
    "AAV95689", "lower2",
]


def _mapping_data():
    sys.path.insert(0, REF)
    from multiomics_kg.utils.gene_id_utils import MappingData

    return MappingData(
        specific_lookup=dict(SPECIFIC),
        multi_lookup={k: list(v) for k, v in MULTI.items()},
        locus_tags=set(LOCUS_TAGS),
    )


def _vocab_rows():
    rows = [(s, "gene", 1, lt, "map") for s, lt in SPECIFIC.items()]
    rows += [(lt, "gene", 1, lt, "map") for lt in LOCUS_TAGS]
    rows += [(s, "gene", 2, lt, "map") for s, targets in MULTI.items() for lt in targets]
    return rows


def _fuzz_cells():
    """Deterministic messy-cell sweep: every pool surface dressed
    with footnotes / case flips / list and paren composites."""
    cells = []
    for i, s in enumerate(SURFACE_POOL):
        cells += [
            s,
            s + "*",
            s + "++",
            s.lower(),
            s.upper(),
            f"{s}, zzz",
            f"zzz; {s}",
            f"unknown ({s})",
            f"{s} {SURFACE_POOL[(i + 1) % len(SURFACE_POOL)]}",
        ]
    cells += ["", "nan", "zzz", "ZZZ*", "PSBA", "FTSZ", "aav95689", "LOWER2", "Lower2"]
    return cells


METHOD_CLASS = {
    "tier1": "tier1_exact",
    "locus_tag": "tier1_exact",
    "tier1_ci": "tier1_ci",
    "locus_tag_ci": "tier1_ci",
    "heuristic": "heuristic",
    "multi": "tier2_singleton",
    "multi_ci": "tier2_ci",
}


def _reference_resolve(cells):
    sys.path.insert(0, REF)
    from multiomics_kg.utils.gene_id_utils import resolve_row

    md = _mapping_data()
    out = {}
    for i, val in enumerate(cells):
        lt, method = resolve_row({"gene": val}, "gene", [], md)
        out[i] = (lt, method.split(":")[0])
    return out


def test_resolver_matches_reference_implementation(spark):
    cells = _fuzz_cells()
    expected = _reference_resolve(cells)

    cells_df = spark.createDataFrame(
        [(i, v, "other") for i, v in enumerate(cells)],
        "row_id long, raw_value string, id_type string",
    )
    vocab = spark.createDataFrame(_vocab_rows(), VOCAB_SCHEMA)
    got = {
        r.row_id: (r.entity_id, r.resolution_method)
        for r in resolve_rows(cells_df, vocab).collect()
    }
    mism = []
    for i, val in enumerate(cells):
        ref_lt, ref_m = expected[i]
        our_lt, our_m = got[i]
        if ref_lt != our_lt:
            mism.append((val, "entity", ref_lt, our_lt, ref_m, our_m))
            continue
        if ref_lt is not None:
            want_m = METHOD_CLASS.get(ref_m)
            if want_m is not None and want_m != our_m:
                mism.append((val, "method", ref_m, our_m))
    assert not mism, mism[:10]
    # sanity: the sweep exercises every resolution class
    assert {m for _, m in got.values()} >= {
        "tier1_exact", "tier1_ci", "heuristic", "tier2_singleton", "unresolved"
    }


def test_resolver_matches_reference_on_deflines(spark):
    sys.path.insert(0, REF)
    from multiomics_kg.utils.gene_id_utils import resolve_row

    md = _mapping_data()
    cases = [
        ("gi|33860650|ref|NP_892211.1| serine protease", "ncbi_protein_defline"),
        ("sp|Q31L36|RL33_PROM9 ribosomal protein", "uniprot_defline"),
        ("RL33_PROM9 some product GN=dnaA", "uniprot_annotation_string"),
        ("no defline at all", "ncbi_protein_defline"),
        # resolve_row has NO special case for uniprot_entry_name (the
        # _ORGANISM strip belongs to the GeneIdGraph resolver): plain
        # expand_list candidates only -> unresolved on both sides even
        # though the stripped form 'dnaA' would hit tier 1
        ("dnaA_PROM0", "uniprot_entry_name"),
    ]
    expected = []
    for val, idt in cases:
        lt, method = resolve_row(
            {"name": None, "col": val},
            "name",
            [{"column": "col", "id_type": idt}],
            md,
        )
        expected.append(lt)

    cells_df = spark.createDataFrame(
        [(i, v, t) for i, (v, t) in enumerate(cases)],
        "row_id long, raw_value string, id_type string",
    )
    vocab = spark.createDataFrame(_vocab_rows(), VOCAB_SCHEMA)
    got = {r.row_id: r.entity_id for r in resolve_rows(cells_df, vocab).collect()}
    assert [got[i] for i in range(len(cases))] == expected
    assert expected[0] == "PMM0099" and expected[3] is None and expected[4] is None


def test_resolver_null_passthrough_column(spark):
    """A NULL in a preserved column must not break row re-association
    (null-safe join)."""
    cells = spark.createDataFrame(
        [(1, None, "PMM0001", "other"), (2, "note", "zzz", "other")],
        "row_id long, note string, raw_value string, id_type string",
    )
    vocab = spark.createDataFrame(_vocab_rows(), VOCAB_SCHEMA)
    got = {r.row_id: (r.entity_id, r.note) for r in resolve_rows(cells, vocab).collect()}
    assert got[1] == ("PMM0001", None)
    assert got[2] == (None, "note")
