"""Adapter-level triple P/R vs the reference OMICSAdapter — the
BASELINE.json headline metric ("emitted triples match the reference
adapters' output with P/R >= 0.95").

The reference adapter (/root/reference/multiomics_kg/adapters/
omics_adapter.py) runs IN-PROCESS on a shared synthetic paperconfig
fixture (the tests/test_omics_adapter.py pattern) with stub modules
for its environment-only deps (biocypher logging, langchain LLM
plumbing — never invoked on skip_pdf_extraction fixtures, and
bioregistry's normalize_curie, stubbed as identity: doi/ncbigene/
ncbitaxon/insdc.gcf are canonical bioregistry prefixes whose CURIEs
normalize to themselves). The Spark pipeline
(operators/omics_paperconfig.py) runs on the SAME fixture; we score

  precision = |S ∩ R| / |S|,  recall = |S ∩ R| / |R|

over the triple sets {(src, label, tgt)} ∪ {(node_id, 'node',
label)} and assert both >= 0.95 (they should be 1.0), then compare
every changes_expression_of edge property value (floats to 1e-9).

Skips when /root/reference is absent (CI-portable), like
tests/test_reference_parity.py.
"""

from __future__ import annotations

import logging
import math
import os
import sys
import types

import pytest
import yaml

from tests.ref_pin import REF as REFERENCE, reference_status

_REF_SKIP = reference_status()
pytestmark = pytest.mark.skipif(
    _REF_SKIP is not None, reason=_REF_SKIP or "reference pinned"
)


def _install_shims():
    """Stub the reference's environment-only imports (LLM/BioCypher
    plumbing unused on skip_pdf_extraction fixtures)."""

    class _Chainable:
        def __or__(self, other):
            return self

        def __ror__(self, other):
            return self

        def __call__(self, *a, **k):
            return self

        @classmethod
        def from_messages(cls, *a, **k):
            return cls()

    def _module(name: str, **attrs) -> None:
        if name in sys.modules:
            return
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m

    _module("bioregistry", normalize_curie=lambda c: c)
    logger = logging.getLogger("biocypher-shim")
    _module("biocypher", _logger=types.SimpleNamespace(logger=logger))
    _module("biocypher._logger", logger=logger)
    _module(
        "langchain.chat_models", init_chat_model=lambda *a, **k: _Chainable()
    )
    _module("langchain", chat_models=sys.modules["langchain.chat_models"])
    _module("langchain_core.prompts", ChatPromptTemplate=_Chainable)
    _module("langchain_core.output_parsers", JsonOutputParser=_Chainable)
    _module("langchain_core")


@pytest.fixture(scope="module")
def reference_adapter_cls():
    _install_shims()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from multiomics_kg.adapters.omics_adapter import OMICSAdapter

    return OMICSAdapter


def _fixture_paperconfig(tmp_path) -> str:
    """A paperconfig exercising every expression-edge path: plain
    log2 thresholds, asterisk significance (leading + trailing),
    linear conversion with a non-positive skip, prefiltered mode,
    messy gene ids (blank / NA / '*' / padded), unparseable and
    non-finite values, timepoint ordering (explicit hours, parsed
    labels, unparseable -> NULLS LAST), growth_phase, coculture."""
    de1 = tmp_path / "de1.csv"
    de1.write_text(
        "gene,log2fc,padj\n"
        "PMM0001,2.5,0.01\n"
        "PMM0002,0.5,0.01\n"
        "PMM0003,-3.0,0.2\n"
        " PMM0004* ,1.7,0.003\n"
        ",2.0,0.01\n"
        "NA,2.0,0.01\n"
        "*,2.0,0.01\n"
        "PMM0005,oops,0.01\n"
        "PMM0006,inf,0.01\n"
        "PMM0007,2.0,bad_p\n"
    )
    de2 = tmp_path / "de2.csv"
    de2.write_text(
        "id,fc\n"
        "PMM0010,* 1.3\n"
        "PMM0011,1.2 *\n"
        "PMM0012,0.8\n"
    )
    de3 = tmp_path / "de3.csv"
    de3.write_text(
        "locus,ratio\n"
        "PMM0020,4.0\n"
        "PMM0021,0.5\n"
        "PMM0022,-1.5\n"
        "PMM0023,0\n"
    )
    cfg = {
        "publication": {
            "papername": "Parity Fixture 2026",
            "doi": "10.9999/parity-fixture",
            "skip_pdf_extraction": True,
            "experiments": {
                "exp_main": {
                    "name": "Main time course",
                    "organism": "Prochlorococcus MED4",
                    "treatment_condition": "high light",
                    "control_condition": "low light",
                    "omics_type": "RNASEQ",
                    "test_type": "DESeq2",
                    "treatment_type": ["light"],
                },
                "exp_co": {
                    "name": "Coculture pulse",
                    "organism": "Prochlorococcus MED4",
                    "treatment_condition": "coculture",
                    "control_condition": "axenic",
                    "omics_type": "PROTEOMICS",
                    "test_type": "t-test",
                    "treatment_type": ["biotic"],
                    "treatment_organism": "Alteromonas macleodii",
                    "treatment_taxid": 28108,
                },
            },
            "supplementary_materials": {
                "tbl_main": {
                    "type": "csv",
                    "filename": str(de1),
                    "statistical_analyses": [
                        {
                            "id": "DE_t4",
                            "experiment": "exp_main",
                            "timepoint": "4h",
                            "growth_phase": "exponential",
                            "name_col": "gene",
                            "logfc_col": "log2fc",
                            "adjusted_p_value_col": "padj",
                        },
                        {
                            "id": "DE_t24",
                            "experiment": "exp_main",
                            "timepoint": "day 1",
                            "timepoint_hours": 24,
                            "name_col": "gene",
                            "logfc_col": "log2fc",
                            "adjusted_p_value_col": "padj",
                            "pvalue_threshold": 0.02,
                            "logfc_threshold": 2.0,
                        },
                        {
                            "id": "DE_rescue",
                            "experiment": "exp_main",
                            "timepoint": "R (rescue: +N)",
                            "name_col": "gene",
                            "logfc_col": "log2fc",
                            "prefiltered": True,
                        },
                    ],
                },
                "tbl_ast": {
                    "type": "csv",
                    "filename": str(de2),
                    "statistical_analyses": [
                        {
                            "id": "AST_1",
                            "experiment": "exp_co",
                            "timepoint": "30m",
                            "name_col": "id",
                            "logfc_col": "fc",
                            "pvalue_asterisk_in_logfc": True,
                        }
                    ],
                },
                "tbl_lin": {
                    "type": "csv",
                    "filename": str(de3),
                    "statistical_analyses": [
                        {
                            "id": "LIN_1",
                            "experiment": "exp_co",
                            "timepoint_hours": 2.5,
                            "name_col": "locus",
                            "logfc_col": "ratio",
                            "fold_change_type": "linear",
                        }
                    ],
                },
                "tbl_ignored": {
                    "type": "derived_metrics_table",
                    "filename": str(de1),
                    "statistical_analyses": [
                        {
                            "id": "DM_1",
                            "experiment": "exp_main",
                            "timepoint": "2h",
                            "name_col": "gene",
                            "logfc_col": "log2fc",
                        }
                    ],
                },
            },
        }
    }
    path = tmp_path / "paperconfig.yaml"
    path.write_text(yaml.dump(cfg))
    return str(path)


def _reference_output(adapter_cls, config_file):
    adapter = adapter_cls(config_file=config_file)
    nodes = adapter.get_nodes()
    edges = adapter.get_edges()
    return nodes, edges


def _triples(nodes, edges):
    t = {(nid, "node", label) for nid, label, _ in nodes}
    t |= {(src, label, tgt) for _, src, tgt, label, _ in edges}
    return t


def test_omics_adapter_triple_pr(spark, tmp_path, reference_adapter_cls):
    from multiomics_biocypher_kg_spark.operators.omics_paperconfig import (
        paperconfig_edges,
        paperconfig_nodes,
    )

    config_file = _fixture_paperconfig(tmp_path)
    ref_nodes, ref_edges = _reference_output(reference_adapter_cls, config_file)
    assert ref_nodes and ref_edges  # the fixture exercises the adapter

    cfg = yaml.safe_load(open(config_file))
    s_nodes = paperconfig_nodes(spark, cfg).collect()
    s_edges = paperconfig_edges(spark, cfg).collect()

    R = _triples(ref_nodes, ref_edges)
    S = {(r.node_id, "node", r.label) for r in s_nodes}
    S |= {(r.src, r.label, r.tgt) for r in s_edges}

    inter = S & R
    precision = len(inter) / len(S)
    recall = len(inter) / len(R)
    print(
        f"\nADAPTER_TRIPLE_PR precision={precision:.4f} recall={recall:.4f} "
        f"spark={len(S)} reference={len(R)}"
    )
    assert precision >= 0.95, (sorted(S - R)[:10], precision)
    assert recall >= 0.95, (sorted(R - S)[:10], recall)

    # ── property-level parity on every expression edge ──
    ref_by_id = {e[0]: e for e in ref_edges if e[3] == "changes_expression_of"}
    spark_expr = [r for r in s_edges if r.label == "changes_expression_of"]
    assert len(spark_expr) == len(ref_by_id)
    float_keys = {"log2_fold_change", "adjusted_p_value", "time_point_hours"}
    checked = 0
    for r in spark_expr:
        _, src, tgt, _, ref_props = ref_by_id[r.edge_id]
        assert src == r.src and tgt == r.tgt
        for key in (
            "log2_fold_change",
            "adjusted_p_value",
            "significant",
            "expression_direction",
            "time_point",
            "time_point_order",
            "time_point_hours",
            "growth_phase",
        ):
            got = getattr(r, key)
            want = ref_props.get(key)  # absent prop == null column
            if key in float_keys and got is not None and want is not None:
                assert math.isclose(got, float(want), rel_tol=0, abs_tol=1e-9), (
                    r.edge_id,
                    key,
                    got,
                    want,
                )
            else:
                assert got == want, (r.edge_id, key, got, want)
            checked += 1
    assert checked >= 8 * len(spark_expr)

    # node property spot-parity: experiment is_time_course et al.
    ref_exp = {n[0]: n[2] for n in ref_nodes if n[1] == "experiment"}
    for r in s_nodes:
        if r.label != "experiment":
            continue
        want = ref_exp[r.node_id]
        assert r.props["is_time_course"] == want["is_time_course"]
        assert r.props["organism_name"] == want["organism_name"]
        assert r.props["omics_type"] == want["omics_type"]
        assert r.props["treatment_type"] == "|".join(want["treatment_type"])


def test_omics_adapter_pr_on_reference_fixture(spark, reference_adapter_cls):
    """Same scoring on the reference's OWN shared synthetic fixture
    (tests/fixtures/non_de/synthetic_paperconfig.yaml — nodes +
    has_experiment only: its single table is a derived_metrics_table,
    which the omics adapter's expression path skips)."""
    from multiomics_biocypher_kg_spark.operators.omics_paperconfig import (
        paperconfig_edges,
        paperconfig_nodes,
    )

    fixture = os.path.join(
        REFERENCE, "tests/fixtures/non_de/synthetic_paperconfig.yaml"
    )
    ref_nodes, ref_edges = _reference_output(reference_adapter_cls, fixture)
    cfg = yaml.safe_load(open(fixture))
    S = {(r.node_id, "node", r.label) for r in paperconfig_nodes(spark, cfg).collect()}
    S |= {
        (r.src, r.label, r.tgt)
        for r in paperconfig_edges(spark, cfg).collect()
    }
    R = _triples(ref_nodes, ref_edges)
    assert R, "reference fixture emitted nothing"
    inter = S & R
    assert len(inter) / len(S) >= 0.95, sorted(S - R)[:10]
    assert len(inter) / len(R) >= 0.95, sorted(R - S)[:10]


def test_multi_paperconfig_union(spark, tmp_path, reference_adapter_cls):
    """Multi-paper concat (MultiOMICSAdapter semantics): the union of
    two papers' streams equals the concatenation of their single-
    paper runs, and edge/node ids stay collision-free because every
    id is publication-namespaced."""
    from multiomics_biocypher_kg_spark.operators.omics_paperconfig import (
        paperconfig_edges,
        paperconfig_edges_multi,
        paperconfig_nodes_multi,
    )

    cfg1 = yaml.safe_load(open(_fixture_paperconfig(tmp_path)))
    fixture2 = os.path.join(
        REFERENCE, "tests/fixtures/non_de/synthetic_paperconfig.yaml"
    )
    cfg2 = yaml.safe_load(open(fixture2))

    singles = [
        tuple(r) for c in (cfg1, cfg2) for r in paperconfig_edges(spark, c).collect()
    ]
    multi = [tuple(r) for r in paperconfig_edges_multi(spark, [cfg1, cfg2]).collect()]
    assert sorted(map(str, multi)) == sorted(map(str, singles))
    edge_ids = [m[0] for m in multi]
    assert len(edge_ids) == len(set(edge_ids))  # publication-namespaced

    nodes = paperconfig_nodes_multi(spark, [cfg1, cfg2]).collect()
    node_ids = [n.node_id for n in nodes]
    assert len(node_ids) == len(set(node_ids))
    assert {n.label for n in nodes} == {"publication", "experiment"}
