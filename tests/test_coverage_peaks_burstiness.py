"""Contract tests for interval-union coverage (sequential merge
replay + union < naive-sum contract), peak detection (neighborhood
replay), and term burstiness (Church-Gale replay + ordering
contract)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from tests.conftest import SF_TINY

_W = 1800


def test_interval_coverage_matches_merge_replay(spark):
    from multiomics_biocypher_kg_spark.registry import QUERIES

    con = duckdb.connect()
    evs = con.sql(
        f"""SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT)
        FROM '{SF_TINY}/events.parquet'"""
    ).fetchall()
    byu = defaultdict(list)
    for uid, t in evs:
        byu[uid].append((t, t + _W))
    expected = {}
    for uid, ivs in byu.items():
        ivs.sort()
        islands = []
        for s, e in ivs:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        covered = sum(e - s for s, e in islands)
        span = islands[-1][1] - islands[0][0]
        expected[uid] = (
            len(islands),
            covered,
            islands[0][0],
            islands[-1][1],
            round(covered / span, 6),
        )

    rows = QUERIES["ev_interval_coverage"](spark, SF_TINY).collect()
    assert len(rows) == len(expected)
    n_strict = 0
    for r in rows:
        ni, cov, fs, le, ratio = expected[r["user_id"]]
        assert r["n_islands"] == ni
        assert r["covered_sec"] == cov
        assert r["first_start"] == fs and r["last_end"] == le
        assert abs(r["coverage_ratio"] - ratio) < 1e-9
        # the union never exceeds the naive per-event sum ...
        assert r["covered_sec"] <= len(byu[r["user_id"]]) * _W
        n_strict += r["covered_sec"] < len(byu[r["user_id"]]) * _W
        assert 0.0 < r["coverage_ratio"] <= 1.0
    # ... and genuinely merges overlaps for most users (a user with
    # zero overlapping intervals is possible, equality then holds)
    assert n_strict > len(rows) // 2


def test_peak_detect_matches_neighborhood_replay(spark):
    from multiomics_biocypher_kg_spark.registry import QUERIES

    con = duckdb.connect()
    daily = con.sql(
        f"""SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d'),
        count(*) FROM '{SF_TINY}/events.parquet' GROUP BY 1, 2"""
    ).fetchall()
    series = defaultdict(list)
    for et, d, c in daily:
        series[et].append((d, c))
    expected = {}
    for et, pts in series.items():
        pts.sort()
        cs = [c for _, c in pts]
        n = len(cs)
        for i in range(1, n - 1):
            nbrs = [
                cs[j]
                for j in range(max(0, i - 3), min(n, i + 4))
                if j != i
            ]
            if cs[i] > cs[i - 1] and cs[i] > cs[i + 1] and cs[i] >= max(nbrs):
                expected[(et, pts[i][0])] = (cs[i], cs[i] - min(nbrs))

    rows = QUERIES["ev_peak_detect"](spark, SF_TINY).collect()
    got = {
        (r["event_type"], r["day"]): (r["n_events"], r["prominence"])
        for r in rows
    }
    assert got == expected
    assert len(got) > 0


def test_term_burstiness_matches_church_gale_replay(spark):
    from multiomics_biocypher_kg_spark.registry import QUERIES

    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, text FROM '{SF_TINY}/documents.parquet'"
    ).fetchall()
    cf, dfc = Counter(), Counter()
    for doc_id, text in docs:
        toks = text.split(" ")
        for t in toks:
            cf[t] += 1
        for t in set(toks):
            dfc[t] += 1
    N = len(docs)
    scored = sorted(
        (
            (-round(cf[t] / dfc[t], 6), t, cf[t], dfc[t])
            for t in cf
        )
    )[:50]
    rows = QUERIES["text_term_burstiness"](spark, SF_TINY).collect()
    assert len(rows) == min(50, len(cf))
    got = {r["token"]: r for r in rows}
    assert set(got) == {t for _, t, _, _ in scored}
    for negb, t, c, d in scored:
        r = got[t]
        assert r["cf"] == c and r["df"] == d
        assert abs(r["burstiness"] - (-negb)) < 1e-9
        exp_df = N * (1.0 - math.exp(-c / N))
        assert abs(r["expected_df"] - round(exp_df, 6)) < 1e-9
        assert r["is_bursty"] == (d < 0.8 * exp_df)
    # functional terms repeat within docs: burstiness >= 1 always
    assert all(r["burstiness"] >= 1.0 for r in rows)
