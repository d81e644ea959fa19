"""Contract test for the 90% effective diameter: a pure-Python BFS
replay pins the exact neighborhood function and the interpolation;
the sketch-side estimate must land within the bracketing radii."""

from __future__ import annotations

from collections import defaultdict

import duckdb

from tests.conftest import SF_TINY


def test_effective_diameter_matches_bfs_replay(spark):
    from multiomics_biocypher_kg_spark.registry import QUERIES
    from multiomics_biocypher_kg_spark.registry_web import _HOST_GRAPH_SQL

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_TINY}/documents.parquet'"
    )
    edges = con.sql(
        f"SELECT DISTINCT src_host, dst_host FROM ({_HOST_GRAPH_SQL})"
    ).fetchall()
    adj = defaultdict(set)
    nodes = set()
    for s, d in edges:
        nodes.add(s)
        nodes.add(d)
        if s != d:
            adj[s].add(d)
    nh = {0: len(nodes)}
    balls = {v: {v} for v in nodes}
    frontier = {v: {v} for v in nodes}
    for h in (1, 2, 3):
        total = 0
        for v in nodes:
            new = set()
            for u in frontier[v]:
                new |= adj[u]
            new -= balls[v]
            balls[v] |= new
            frontier[v] = new
            total += len(balls[v])
        nh[h] = total

    target = 0.9 * nh[3]
    for h in (1, 2, 3):
        if nh[h] >= target:
            d_exact = (h - 1) + (target - nh[h - 1]) / (nh[h] - nh[h - 1])
            break

    r = QUERIES["web_effective_diameter"](spark, SF_TINY).collect()
    assert len(r) == 1
    r = r[0]
    assert r["n_nodes"] == len(nodes)
    assert (r["n1_exact"], r["n2_exact"], r["n3_exact"]) == (
        nh[1],
        nh[2],
        nh[3],
    )
    assert abs(r["eff_diameter_exact"] - round(d_exact, 6)) < 1e-9
    # the sketch answers the same macroscopic question: within the
    # horizon and in the same ballpark as the exact readout
    assert 0.0 < r["eff_diameter_est"] <= 3.0
    assert abs(r["eff_diameter_est"] - r["eff_diameter_exact"]) < 1.0
