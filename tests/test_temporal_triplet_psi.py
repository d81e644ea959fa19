"""Contract tests for the temporal-integrity audit (exact Python
recount + designed-violation contract), contrastive triplet mining
(draw replay + suspect-flag logic), and PSI drift (binned replay +
the A/A-stability contract)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import duckdb

from tests.conftest import SF_TINY


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_temporal_integrity_matches_recount(spark):
    from multiomics_biocypher_kg_spark.registry import QUERIES

    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT o.o_orderpriority,
        date_diff('day', o.o_orderdate, l.l_shipdate)
        FROM '{SF_TINY}/lineitem.parquet' l
        JOIN '{SF_TINY}/orders.parquet' o ON l.l_orderkey = o.o_orderkey"""
    ).fetchall()
    per: dict[str, list] = {}
    for pri, lag in rows:
        per.setdefault(pri, []).append(lag)
    got = {r["order_priority"]: r for r in
           QUERIES["rel_temporal_integrity"](spark, SF_TINY).collect()}
    assert set(got) == set(per) | {"all"}
    tot_n = tot_v = 0
    worst = 10**9
    for pri, lags in per.items():
        r = got[pri]
        v = sum(x < 0 for x in lags)
        assert r["n_lines"] == len(lags)
        assert r["n_violations"] == v
        assert abs(r["violation_rate"] - round(v / len(lags), 6)) < 1e-9
        assert r["worst_days_early"] == min(lags)
        tot_n += len(lags)
        tot_v += v
        worst = min(worst, min(lags))
    r = got["all"]
    assert r["n_lines"] == tot_n and r["n_violations"] == tot_v
    assert r["worst_days_early"] == worst
    # the synthetic feed genuinely violates the timeline
    assert tot_v > 0 and worst < 0


def test_triplet_mine_draw_and_suspect_logic(spark):
    from multiomics_biocypher_kg_spark.registry import QUERIES

    con = duckdb.connect()
    n_docs = con.sql(
        f"SELECT count(*) FROM '{SF_TINY}/documents.parquet'"
    ).fetchone()[0]
    trips = QUERIES["emb_triplet_mine"](spark, SF_TINY).collect()
    assert trips
    pair_set = {(r["anchor_id"], r["positive_id"]) for r in trips}
    for r in trips:
        h = _md5_long(f"{r['anchor_id']}|{r['positive_id']}#neg")
        assert r["negative_id"] == h % n_docs
        an = tuple(sorted((r["anchor_id"], r["negative_id"])))
        pn = tuple(sorted((r["positive_id"], r["negative_id"])))
        suspect = (
            r["negative_id"] == r["anchor_id"] % 1000000
            or r["negative_id"] == r["positive_id"] % 1000000
            or an in pair_set
            or pn in pair_set
        )
        assert r["neg_is_suspect"] == suspect
        assert 0 <= r["negative_id"] < n_docs
        assert r["jaccard"] >= 0.5


def test_psi_drift_matches_binned_replay_and_aa_stable(spark):
    from multiomics_biocypher_kg_spark.registry import QUERIES

    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, text FROM '{SF_TINY}/documents.parquet'"
    ).fetchall()
    ca, cb = Counter(), Counter()
    for doc_id, text in docs:
        toks = text.split(" ")
        n = len(toks)
        s = sum(_md5_long(t) % 2001 - 1000 for t in toks)
        b = min(9, (s + 1000 * n) // (200 * n))
        if _md5_long(f"{doc_id}#psi") % 2 == 0:
            ca[b] += 1
        else:
            cb[b] += 1
    ta, tb = sum(ca.values()), sum(cb.values())
    psi = 0.0
    expected = {}
    for b in range(10):
        p = (ca[b] + 0.5) / (ta + 5.0)
        q = (cb[b] + 0.5) / (tb + 5.0)
        c = (p - q) * math.log(p / q)
        psi += c
        expected[b] = (ca[b], cb[b], p, q, c)

    rows = QUERIES["data_psi_drift"](spark, SF_TINY).collect()
    assert len(rows) == 10
    for r in rows:
        na, nb, p, q, c = expected[r["bin"]]
        assert r["n_a"] == na and r["n_b"] == nb
        assert abs(r["p"] - round(p, 6)) < 1e-9
        assert abs(r["q"] - round(q, 6)) < 1e-9
        assert abs(r["psi_contrib"] - round(c, 6)) < 1e-9
        assert abs(r["psi_total"] - round(psi, 6)) < 1e-6
        # A/A calibration: hash halves are exchangeable
        assert r["stable"] and r["psi_total"] < 0.1
