"""Every registered query vs its DuckDB oracle at sf0.001 (the local
mirror of the driver's CORRECTNESS gate; the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from multiomics_biocypher_kg_spark import registry
from tests.conftest import SF_TINY
from tests.oracle_utils import compare_query

NAMES = sorted(registry.ORACLES.keys())


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, name):
    compare_query(spark, name, SF_TINY, registry.QUERIES, registry.ORACLES)


def test_all_queries_have_callable():
    for name in registry.QUERIES:
        assert callable(registry.QUERIES[name])
