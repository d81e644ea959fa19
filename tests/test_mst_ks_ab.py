"""Contract tests for the Boruvka MST backbone (vs a pure-Python
Kruskal mirror — algorithm-independent agreement), the two-sample KS
test (vs an exact ECDF replay), and the A/B harness (vs a Python
replay + the A/A no-effect contract)."""

from __future__ import annotations

import hashlib
import math

import duckdb

from tests.conftest import SF_TINY


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _und_edges():
    """The undirected weighted host edges, via the shared host-graph
    SQL fragment (same construction as the query + oracle)."""
    from multiomics_biocypher_kg_spark.registry_web import _HOST_GRAPH_SQL

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_TINY}/documents.parquet'"
    )
    return con.sql(
        f"""
        SELECT least(src_host, dst_host) AS a,
          greatest(src_host, dst_host) AS b,
          greatest(1, 6 - least(5, CAST(sum(n_links) AS INTEGER))) AS w
        FROM ({_HOST_GRAPH_SQL})
        WHERE src_host <> dst_host GROUP BY 1, 2
        """
    ).fetchall()


def test_mst_matches_python_kruskal(spark):
    """Kruskal with union-find over the identical total edge order
    must produce the identical edge set — a third, independent
    algorithm beside Spark's Boruvka and the oracle's minimax
    closure."""
    from multiomics_biocypher_kg_spark.registry import QUERIES

    edges = _und_edges()
    order = sorted((f"{w}|{a}|{b}", a, b, w) for a, b, w in edges)
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    expected = set()
    for _, a, b, w in order:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            expected.add((a, b, w))

    rows = QUERIES["web_mst_backbone"](spark, SF_TINY).collect()
    got = {(r["host_a"], r["host_b"], r["w"]) for r in rows}
    assert got == expected
    # spanning-forest size: V - #components
    nodes = {a for a, _, _ in edges} | {b for _, b, _ in edges}
    roots = {find(n) for n in nodes}
    assert len(got) == len(nodes) - len(roots)


def test_ks_lengths_matches_python_ecdf(spark):
    from multiomics_biocypher_kg_spark.registry import QUERIES

    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT len(string_split(text, ' ')), lang = 'en'
        FROM '{SF_TINY}/documents.parquet'"""
    ).fetchall()
    a = sorted(n for n, in_a in rows if in_a)
    b = sorted(n for n, in_a in rows if not in_a)
    na, nb = len(a), len(b)
    values = sorted(set(a) | set(b))
    best = None
    for v in values:
        fa = sum(x <= v for x in a) / na
        fb = sum(x <= v for x in b) / nb
        d = abs(fa - fb)
        key = (-round(d, 6), v)
        if best is None or key < best[0]:
            best = (key, v, d)
    _, v_star, d_star = best
    crit = 1.358 * math.sqrt((na + nb) / (na * nb))

    r = QUERIES["text_ks_lengths"](spark, SF_TINY).collect()
    assert len(r) == 1
    r = r[0]
    assert r["n_a"] == na and r["n_b"] == nb
    assert r["ks_at_value"] == v_star
    assert abs(r["ks_stat"] - round(d_star, 6)) < 1e-9
    assert abs(r["critical_005"] - round(crit, 6)) < 1e-9
    assert r["reject"] == (d_star > crit)
    assert 0.0 <= r["ks_stat"] <= 1.0


def test_ab_test_matches_python_and_aa_contract(spark):
    from multiomics_biocypher_kg_spark.registry import QUERIES

    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT event_id, event_type = 'purchase'
        FROM '{SF_TINY}/events.parquet'"""
    ).fetchall()
    n = {"a": 0, "b": 0}
    conv = {"a": 0, "b": 0}
    for eid, purchased in rows:
        arm = "a" if _md5_long(f"{eid}#ab0") % 2 == 0 else "b"
        n[arm] += 1
        conv[arm] += bool(purchased)
    p_a, p_b = conv["a"] / n["a"], conv["b"] / n["b"]
    p_pool = (conv["a"] + conv["b"]) / (n["a"] + n["b"])
    z = (p_a - p_b) / math.sqrt(
        p_pool * (1 - p_pool) * (1 / n["a"] + 1 / n["b"])
    )

    def wilson(p, m, sign):
        c = p + 1.96**2 / (2 * m)
        half = 1.96 * math.sqrt(p * (1 - p) / m + 1.96**2 / (4 * m * m))
        return (c + sign * half) / (1 + 1.96**2 / m)

    r = QUERIES["ev_ab_test"](spark, SF_TINY).collect()
    assert len(r) == 1
    r = r[0]
    assert r["n_a"] == n["a"] and r["n_b"] == n["b"]
    assert r["conv_a"] == conv["a"] and r["conv_b"] == conv["b"]
    assert abs(r["rate_a"] - round(p_a, 6)) < 1e-9
    assert abs(r["z_score"] - round(z, 6)) < 1e-6
    assert abs(r["wilson_lo_a"] - round(wilson(p_a, n["a"], -1), 6)) < 1e-6
    assert abs(r["wilson_hi_b"] - round(wilson(p_b, n["b"], 1), 6)) < 1e-6
    # A/A contract: hash assignment is independent of behavior
    assert not r["significant"]
    assert abs(r["z_score"]) < 1.96
    # Wilson intervals contain their point estimate
    assert r["wilson_lo_a"] <= r["rate_a"] <= r["wilson_hi_a"]
    assert r["wilson_lo_b"] <= r["rate_b"] <= r["wilson_hi_b"]
