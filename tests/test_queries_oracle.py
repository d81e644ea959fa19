"""Every registered query vs its DuckDB oracle at sf0.001 (the local
mirror of the driver's CORRECTNESS gate; the driver runs sf0.01).

The parametrized sweep is marked ``sweep`` (see pytest.ini): it is the
long pole of the suite (~20+ min for the full registry), so iteration
runs deselect it with ``-m "not sweep"`` while the default ``pytest``
invocation (the driver's gate) still includes it.

For CI-style parallel full runs the sweep shards by query name:
``SWEEP_SHARD=i/n python -m pytest tests/test_queries_oracle.py -q``
runs only the i-th of n equal slices (0-based), so n processes cover
the whole registry disjointly, e.g.::

    for i in 0 1 2 3; do SWEEP_SHARD=$i/4 python -m pytest \
        tests/test_queries_oracle.py -q & done; wait
"""

from __future__ import annotations

import os

import pytest

from multiomics_biocypher_kg_spark import registry
from tests.conftest import SF_TINY
from tests.oracle_utils import compare_query

NAMES = sorted(registry.ORACLES.keys())

_shard = os.environ.get("SWEEP_SHARD")
if _shard:
    _i, _n = (int(x) for x in _shard.split("/"))
    if not (0 <= _i < _n):
        raise ValueError(f"SWEEP_SHARD={_shard!r}: need 0 <= i < n")
    NAMES = [name for k, name in enumerate(NAMES) if k % _n == _i]


@pytest.mark.sweep
@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, name):
    compare_query(spark, name, SF_TINY, registry.QUERIES, registry.ORACLES)


def test_all_queries_have_callable():
    for name in registry.QUERIES:
        assert callable(registry.QUERIES[name])
