"""Contract tests for incremental connected components (union-find
mirror over base+delta, the incremental==full theorem), exponential
goodness-of-fit (Python ECDF/CDF replay), and the dataset card
(exact recount)."""

from __future__ import annotations

import hashlib
import math
import statistics
from collections import Counter

import duckdb

from tests.conftest import SF_TINY


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _sameas_edges():
    con = duckdb.connect()
    ids = [
        r[0]
        for r in con.sql(
            f"SELECT doc_id FROM '{SF_TINY}/documents.parquet'"
        ).fetchall()
    ]
    edges = []
    for d in ids:
        a, b = f"ent:{d:06d}", f"ent:{d - d % 5:06d}"
        if d % 5 != 0:
            edges.append((a, b))
        if d % 10 == 4:
            edges.append((a, f"ent:{d + 1:06d}"))
    return [(a, b) for a, b in edges if a != b]


def _cc(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def test_incremental_cc_equals_full_recompute(spark):
    from multiomics_biocypher_kg_spark.registry import QUERIES

    edges = _sameas_edges()
    nodes = {a for a, _ in edges} | {b for _, b in edges}
    delta = [
        (a, b) for a, b in edges if _md5_long(f"{a}|{b}#inc") % 4 == 0
    ]
    base = [e for e in edges if e not in delta or delta.count(e) == 0]
    base = [
        (a, b) for a, b in edges if _md5_long(f"{a}|{b}#inc") % 4 != 0
    ]
    full = _cc(edges, nodes)
    base_lbl = _cc(base, nodes)
    # the theorem the operator relies on: CC(star(base labels) U
    # delta) == CC(base U delta), including component ids
    star = [(n, lbl) for n, lbl in base_lbl.items() if n != lbl]
    inc = _cc(star + delta, nodes)
    assert inc == full

    rows = QUERIES["kg_components_incremental"](spark, SF_TINY).collect()
    assert len(rows) == len(nodes)
    changed = 0
    for r in rows:
        assert r["component"] == full[r["node"]]
        assert r["base_component"] == base_lbl[r["node"]]
        assert r["changed"] == (full[r["node"]] != base_lbl[r["node"]])
        changed += r["changed"]
    assert changed > 0  # the delta genuinely merged something


def test_exponential_gof_matches_python(spark):
    from multiomics_biocypher_kg_spark.registry import QUERIES

    con = duckdb.connect()
    evs = con.sql(
        f"""SELECT event_type, epoch(ts), event_id
        FROM '{SF_TINY}/events.parquet' ORDER BY event_type, 2, 3"""
    ).fetchall()
    by_type: dict[str, list] = {}
    for et, t, _ in evs:
        by_type.setdefault(et, []).append(t)
    expected = {}
    for et, ts in by_type.items():
        gaps = [
            int(b) - int(a) for a, b in zip(ts, ts[1:]) if int(b) - int(a) > 0
        ]
        n = len(gaps)
        lam = n / sum(gaps)
        vals = sorted(set(gaps))
        cnt = Counter(gaps)
        best = None
        cum = 0
        for v in vals:
            lo = cum / n
            cum += cnt[v]
            hi = cum / n
            cdf = 1.0 - math.exp(-lam * v)
            d = max(abs(hi - cdf), abs(lo - cdf))
            key = (-round(d, 6), v)
            if best is None or key < best[0]:
                best = (key, v, d)
        _, v_star, d_star = best
        crit = 1.094 / math.sqrt(n)
        expected[et] = (n, sum(gaps) / n, d_star, v_star, crit)

    rows = QUERIES["ev_exponential_gof"](spark, SF_TINY).collect()
    assert {r["event_type"] for r in rows} == set(expected)
    for r in rows:
        n, mean, d, v, crit = expected[r["event_type"]]
        assert r["n_gaps"] == n
        assert abs(r["mean_gap_sec"] - round(mean, 6)) < 1e-9
        assert abs(r["ks_stat"] - round(d, 6)) < 1e-9
        assert r["ks_at_gap"] == v
        assert abs(r["critical_005"] - round(crit, 6)) < 1e-9
        assert r["reject_exponential"] == (d > crit)


def test_dataset_card_exact_recount(spark):
    from multiomics_biocypher_kg_spark.registry import QUERIES

    con = duckdb.connect()
    docs = con.sql(
        f"SELECT lang, source, text FROM '{SF_TINY}/documents.parquet'"
    ).fetchall()
    n_docs = len(docs)
    langs = Counter(l for l, _, _ in docs)
    toks = [len(t.split(" ")) for _, _, t in docs]
    highs = 0
    for _, _, t in docs:
        tk = t.split(" ")
        s = sum(_md5_long(x) % 2001 - 1000 for x in tk)
        highs += s >= 50 * len(tk)
    top_lang, top_n = sorted(langs.items(), key=lambda kv: (-kv[1], kv[0]))[0]

    r = QUERIES["data_dataset_card"](spark, SF_TINY).collect()
    assert len(r) == 1
    r = r[0]
    assert r["n_docs"] == n_docs
    assert r["n_langs"] == len(langs)
    assert r["top_lang"] == top_lang
    assert abs(r["top_lang_share"] - round(top_n / n_docs, 6)) < 1e-9
    assert r["total_tokens"] == sum(toks)
    assert abs(r["mean_tokens"] - round(sum(toks) / n_docs, 6)) < 1e-9
    assert abs(r["median_tokens"] - round(statistics.median(toks), 6)) < 1e-9
    uniq = len({t for _, _, t in docs})
    assert abs(r["dup_rate"] - round(1 - uniq / n_docs, 6)) < 1e-9
    assert abs(r["pct_quality_high"] - round(highs / n_docs, 6)) < 1e-9
    assert 0.0 <= r["pct_quality_high"] <= 1.0
