"""Contract tests for the Q2-shape min-cost supplier (Python argmin
replay), the DAG diamond audit (path-count replay + tree-has-none
control), and Markov removal-effect attribution (full Python chain
replay + the attribution axioms)."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import duckdb

from tests.conftest import SF_TINY


def test_min_cost_supplier_matches_argmin_replay(spark):
    from multiomics_biocypher_kg_spark.registry import QUERIES

    con = duckdb.connect()
    supply = con.sql(
        f"""SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity)
        FROM '{SF_TINY}/lineitem.parquet' WHERE l_quantity > 0
        GROUP BY 1, 2"""
    ).fetchall()
    eu = {
        s: (nm, nn)
        for s, nm, nn in con.sql(
            f"""SELECT s.s_suppkey, s.s_name, n.n_name
            FROM '{SF_TINY}/supplier.parquet' s
            JOIN '{SF_TINY}/nation.parquet' n ON s.s_nationkey = n.n_nationkey
            JOIN '{SF_TINY}/region.parquet' r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'EUROPE'"""
        ).fetchall()
    }
    parts = dict(
        con.sql(
            f"""SELECT p_partkey, p_size FROM '{SF_TINY}/part.parquet'
            WHERE p_type = 'ECONOMY'"""
        ).fetchall()
    )
    best: dict[int, tuple] = {}
    for pk, sk, u in supply:
        if sk not in eu or pk not in parts:
            continue
        key = (round(u, 6), sk)
        if pk not in best or key < best[pk][0]:
            best[pk] = (key, sk, u)
    top = sorted(
        ((round(u, 6), pk, sk) for pk, (_, sk, u) in best.items())
    )[:20]
    expected = {(pk, sk, c) for c, pk, sk in top}

    rows = QUERIES["rel_min_cost_supplier"](spark, SF_TINY).collect()
    assert len(rows) == min(20, len(best))
    for r in rows:
        assert (r["p_partkey"], r["s_suppkey"], r["unit_cost"]) in expected
        assert (r["s_name"], r["n_name"]) == eu[r["s_suppkey"]]
        assert r["p_size"] == parts[r["p_partkey"]]


def test_diamond_audit_matches_path_counts_and_tree_control(spark):
    from multiomics_biocypher_kg_spark.registry import QUERIES

    con = duckdb.connect()
    ids = [
        r[0]
        for r in con.sql(
            f"SELECT doc_id FROM '{SF_TINY}/documents.parquet' WHERE doc_id > 0"
        ).fetchall()
    ]
    edges = set()
    for d in ids:
        edges.add((f"n{d:04d}", f"n{d // 4:04d}"))
        if d % 3 == 2 and d // 5 != d // 4:
            edges.add((f"n{d:04d}", f"n{d // 5:04d}"))
    parents = defaultdict(set)
    for c, p in edges:
        parents[c].add(p)
    expected = {}
    for node in parents:
        mids = Counter()
        for m in parents[node]:
            for g in parents.get(m, ()):
                mids[(node, g)] += 0  # ensure key exists per (node,g)
        byg = defaultdict(set)
        for m in parents[node]:
            for g in parents.get(m, ()):
                byg[g].add(m)
        for g, ms in byg.items():
            if len(ms) >= 2:
                expected[(node, g)] = (
                    len(ms),
                    len(ms) * (len(ms) - 1) // 2,
                )
    rows = QUERIES["onto_diamond_audit"](spark, SF_TINY).collect()
    got = {
        (r["node"], r["grand_ancestor"]): (r["n_paths"], r["n_diamonds"])
        for r in rows
    }
    assert got == expected
    assert len(got) > 0
    # control: without the secondary parents (the pure tree), every
    # node reaches its grandparent by exactly one path — no diamonds
    tree_parents = {f"n{d:04d}": {f"n{d // 4:04d}"} for d in ids}
    for node, ps in tree_parents.items():
        byg = defaultdict(set)
        for m in ps:
            for g in tree_parents.get(m, ()):
                byg[g].add(m)
        assert all(len(ms) < 2 for ms in byg.values())


def _attr_python(events):
    CH = ["click", "error", "signup", "view"]
    byu = defaultdict(list)
    for uid, ts, eid, et in events:
        byu[uid].append((ts, eid, et))
    trans = Counter()
    for uid, rows in byu.items():
        rows.sort()
        journeys = []
        cur = []
        for _, _, et in rows:
            cur.append(et)
            if et == "purchase":
                journeys.append(cur)
                cur = []
        if cur:
            journeys.append(cur)
        for j in journeys:
            first = "CONV" if j[0] == "purchase" else j[0]
            trans[("START", first)] += 1
            for a, b in zip(j, j[1:]):
                if a == "purchase":
                    continue
                trans[(a, "CONV" if b == "purchase" else b)] += 1
            if j[-1] != "purchase":
                trans[(j[-1], "NULL")] += 1
    tot = Counter()
    for (f, t), n in trans.items():
        tot[f] += n
    P = {(f, t): n / tot[f] for (f, t), n in trans.items()}
    states = sorted(tot)

    def absorb(removed):
        p = {s: 0.0 for s in states}
        for _ in range(12):
            nxt = {}
            for s in states:
                acc = 0.0
                for t in sorted({tt for (f, tt) in P if f == s}):
                    if t == "CONV":
                        v = 1.0
                    elif t == "NULL" or t == removed:
                        v = 0.0
                    else:
                        v = p.get(t, 0.0)
                    acc = acc + P[(s, t)] * v
                nxt[s] = acc
            p = nxt
        return p["START"]

    base = absorb(None)
    out = {}
    for ch in CH:
        w = absorb(ch)
        out[ch] = (base, w, 1.0 - w / base)
    tot_re = sum(v[2] for v in out.values())
    return {ch: (b, w, re, re / tot_re) for ch, (b, w, re) in out.items()}


def test_markov_attribution_matches_python_chain(spark):
    from multiomics_biocypher_kg_spark.registry import QUERIES
    from multiomics_biocypher_kg_spark.registry_relational import (
        _ATTR_CHANNELS,
    )

    con = duckdb.connect()
    events = con.sql(
        f"""SELECT user_id, ts, event_id, event_type
        FROM '{SF_TINY}/events.parquet'"""
    ).fetchall()
    # the pinned channel literal matches the data
    assert sorted({e[3] for e in events} - {"purchase"}) == sorted(
        _ATTR_CHANNELS
    )
    expected = _attr_python(events)
    rows = QUERIES["ev_markov_attribution"](spark, SF_TINY).collect()
    assert {r["channel"] for r in rows} == set(expected)
    share_sum = 0.0
    for r in rows:
        b, w, re, share = expected[r["channel"]]
        assert abs(r["p_conv_base"] - round(b, 6)) < 1e-9
        assert abs(r["p_conv_without"] - round(w, 6)) < 1e-9
        assert abs(r["removal_effect"] - round(re, 6)) < 1e-9
        assert abs(r["attribution_share"] - round(share, 6)) < 1e-6
        # removing a channel can only hurt conversion
        assert 0.0 <= r["p_conv_without"] <= r["p_conv_base"]
        share_sum += r["attribution_share"]
    assert abs(share_sum - 1.0) < 1e-4
