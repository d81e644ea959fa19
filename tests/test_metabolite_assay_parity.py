"""Differential parity vs the reference MetaboliteAssayAdapter's
aggregation core (A11/A12) — the second reference-adapter oracle
(after resolve_row in test_reference_parity.py and the OMICSAdapter
triple P/R in test_adapter_triple_pr.py).

Imports the reference's OWN `_aggregate_replicates` /
`parse_embedded_mean_sd_n` / `_compute_embedded`
(/root/reference/multiomics_kg/adapters/metabolite_assay_adapter.py
— dependency-light, no shims needed) and sweeps a deterministic
corpus of messy replicate cells through both implementations.

Skips when /root/reference is absent.
"""

from __future__ import annotations

import math
import os
import sys

import pytest

from tests.ref_pin import REF as REFERENCE, reference_status

_REF_SKIP = reference_status()
pytestmark = pytest.mark.skipif(
    _REF_SKIP is not None, reason=_REF_SKIP or "reference pinned"
)


@pytest.fixture(scope="module")
def ref():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from multiomics_kg.adapters import metabolite_assay_adapter as m

    return m


# deterministic messy-cell vocabulary: numerics, null markers,
# missing markers, junk, signs, exponents, zeros
_CELLS = [
    "0.5",
    "1",
    "-2.25",
    "1e-3",
    "2.5E+2",
    "+0.75",
    "0",
    "0.0",
    "nd",
    "ND",
    "n.d.",
    "NA",
    "N/A",
    "",
    None,
    "junk",
    "12,5",
    " 3.5 ",
    # NOT fuzzed: "inf" — float('inf') enters the reference's parsed
    # list and statistics.stdev then raises AttributeError on py3.11;
    # a crash input has no differential to mirror
]


def _cell(i: int, j: int) -> str | None:
    return _CELLS[(i * 7 + j * 13) % len(_CELLS)]


NULLS = {"nd", "ND", "n.d.", "NA", "N/A"}
MISSING = {""}


def test_aggregate_replicates_differential(spark, ref):
    """300 synthetic rows x 4 replicate cells through the reference's
    row-level _aggregate_replicates AND the Spark
    aggregate_replicates_wide — every output field must agree."""
    from multiomics_biocypher_kg_spark.functions.omics import (
        aggregate_replicates_wide,
    )

    rows = [
        (i, _cell(i, 0), _cell(i, 1), _cell(i, 2), _cell(i, 3))
        for i in range(300)
    ]
    # reference side (row-at-a-time)
    want = {}
    for i, *cells in rows:
        mean, sd, n, nnz, vals, det = ref._aggregate_replicates(
            cells, NULLS, MISSING
        )
        want[i] = (round(mean, 6), round(sd, 6), n, nnz, vals, det)

    df = spark.createDataFrame(
        rows, "row_id int, r1 string, r2 string, r3 string, r4 string"
    )
    got = aggregate_replicates_wide(
        df,
        key_cols=["row_id"],
        replicate_cols=["r1", "r2", "r3", "r4"],
        null_values=sorted(NULLS),
        missing_values=sorted(MISSING),
    ).collect()
    assert len(got) == 300
    for r in got:
        w_mean, w_sd, w_n, w_nnz, w_vals, w_det = want[r.row_id]
        assert r.n_replicates == w_n, (r.row_id, r, want[r.row_id])
        assert r.n_non_zero == w_nnz, (r.row_id, r, want[r.row_id])
        assert math.isclose(r.mean, w_mean, abs_tol=1e-6), (r.row_id, r.mean, w_mean)
        assert math.isclose(r.sd, w_sd, abs_tol=1e-6), (r.row_id, r.sd, w_sd)
        assert r.detection_status == w_det, (r.row_id, r, want[r.row_id])
        assert [round(v, 9) for v in r.replicate_values] == [
            round(v, 9) for v in w_vals
        ], (r.row_id, r.replicate_values, w_vals)


_EMBEDDED_CELLS = [
    "0.00054 (8.8e-05), n=2",
    "1.5 (0.2), n=3",
    "-2e-3 ( NA ), n=1",
    "0.3(0.1),n=4",
    "  7.5  ( 0.5 ) ,  n = 2  ",
    "nd",
    "ND",
    "n.d.",
    "N.D.",
    "",
    None,
    "1.5",
    "bad",
    "1.5 (0.2)",
    "(0.2), n=3",
    "1.5 (0.2), n=x",
    "0 (0), n=0",
]


def test_parse_embedded_differential(spark, ref):
    """Every embedded-cell variant parses identically in the
    reference's parse_embedded_mean_sd_n and the Spark
    parse_embedded_stats expression."""
    from multiomics_biocypher_kg_spark.functions.validate import (
        parse_embedded_stats,
    )

    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(_EMBEDDED_CELLS)], "i int, cell string"
    )
    got = {r.i: r for r in parse_embedded_stats(df, "cell").collect()}
    for i, c in enumerate(_EMBEDDED_CELLS):
        want = ref.parse_embedded_mean_sd_n(c)
        g = got[i]
        if want is None:
            assert g.cell_mean is None and g.cell_sd is None and g.cell_n is None, (c, g)
        else:
            w_mean, w_sd, w_n = want
            assert g.cell_mean is not None and math.isclose(
                g.cell_mean, w_mean, abs_tol=1e-12
            ), (c, g.cell_mean, w_mean)
            assert math.isclose(g.cell_sd, w_sd, abs_tol=1e-12), (c, g.cell_sd, w_sd)
            assert g.cell_n == w_n, (c, g.cell_n, w_n)


def test_compute_embedded_detection_differential(ref):
    """_compute_embedded's detection composition (n from
    total_replicates, n_non_zero from the parsed n=N) — mirrored as
    a pure function check across the (total, n) grid."""

    def mirror(cell, total):
        # the Spark-side composition: parse, then the same CASE chain
        parsed = ref.parse_embedded_mean_sd_n(cell)  # parser parity proven above
        if parsed is None:
            return (0.0, 0.0, 0, 0, [], "not_detected")
        mean, sd, n_nz = parsed
        n_rep = int(total) if total and total > 0 else n_nz
        if n_rep == 0 or n_nz == 0:
            det = "not_detected"
        elif n_nz >= n_rep:
            det = "detected"
        else:
            det = "sporadic"
        return (mean, sd, n_rep, n_nz, [], det)

    for cell in _EMBEDDED_CELLS:
        for total in (0, 1, 2, 3, None):
            assert ref._compute_embedded(cell, total) == mirror(cell, total), (
                cell,
                total,
            )


_BOOL_TOKENS = dict(
    true_tokens=["yes", "Y", "1", "true"],
    false_tokens=["no", "N", "0", "false"],
    skip_tokens=["nd", "-"],
)
_BOOL_CELLS = ["yes", "Y", "1", "true", "no", "N", "0", "false", "nd", "-",
               " yes ", "", None, "  "]


def test_boolean_token_mapping_differential(spark, ref):
    """F9 differential: the reference observations_adapter's
    _parse_boolean_cell vs the Spark map_boolean_tokens, across every
    token class and blank policy — including the hard-error contract
    on unknown tokens and invalid policies (both sides raise)."""
    sys.path.insert(0, REFERENCE) if REFERENCE not in sys.path else None
    from multiomics_kg.adapters.observations_adapter import _parse_boolean_cell

    from multiomics_biocypher_kg_spark.functions.validate import (
        ValidationError,
        map_boolean_tokens,
    )

    for policy in ("skip", "true", "false"):
        want = [
            _parse_boolean_cell(c, blank_policy=policy, **_BOOL_TOKENS)
            for c in _BOOL_CELLS
        ]
        df = spark.createDataFrame(
            [(i, c) for i, c in enumerate(_BOOL_CELLS)], "i int, cell string"
        )
        got = {
            r.i: r.cell_bool
            for r in map_boolean_tokens(
                df, "cell", blank_policy=policy, **_BOOL_TOKENS
            ).collect()
        }
        for i, c in enumerate(_BOOL_CELLS):
            assert got[i] == want[i], (policy, c, got[i], want[i])

    # unknown token: both sides hard-error
    with pytest.raises(ValueError, match="Unexpected boolean token"):
        _parse_boolean_cell("maybe", blank_policy="skip", **_BOOL_TOKENS)
    bad = spark.createDataFrame([("maybe",)], "cell string")
    with pytest.raises(ValidationError, match="unknown boolean token"):
        map_boolean_tokens(bad, "cell", blank_policy="skip", **_BOOL_TOKENS)

    # invalid blank_policy: both sides raise
    with pytest.raises(ValueError, match="Invalid blank_policy"):
        _parse_boolean_cell("", blank_policy="bogus", **_BOOL_TOKENS)
    with pytest.raises(ValidationError, match="Invalid blank_policy"):
        map_boolean_tokens(bad, "cell", blank_policy="bogus", **_BOOL_TOKENS)
