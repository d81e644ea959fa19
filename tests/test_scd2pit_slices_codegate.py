"""Contract tests for the SCD-2 point-in-time join (interval replay
+ at-most-one-version contract), the slice finder (recount + z
arithmetic), and the code gate (exact planted-set contract)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import duckdb

from tests.conftest import SF_TINY


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_scd2_pointintime_matches_interval_replay(spark):
    from multiomics_biocypher_kg_spark.registry import QUERIES

    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, text FROM '{SF_TINY}/documents.parquet' ORDER BY 1"
    ).fetchall()

    def url_of(k):
        fam = k % 125
        host = (
            "hot.example.com"
            if fam % 10 < 3
            else f"h{fam % 50}.example.org"
        )
        return f"https://{host}/doc/{fam:06d}"

    # build the SCD2 dimension exactly as web_scd2_history does
    snaps = defaultdict(list)
    for d, text in docs:
        snaps[url_of(d)].append((1767225600 + d, d, _md5(text)))
    dim = defaultdict(list)
    for url, rows in snaps.items():
        rows.sort()
        prev = None
        vers = []
        for ts, d, h in rows:
            if h != prev:
                vers.append([ts, None, h])
                prev = h
        for i in range(len(vers) - 1):
            vers[i][1] = vers[i + 1][0]
        dim[url] = vers

    events = con.sql(
        f"SELECT event_id FROM '{SF_TINY}/events.parquet'"
    ).fetchall()
    expected = {}
    for (eid,) in events:
        url = url_of(eid)
        t = 1767225600 + (eid % 500)
        hits = [
            (vf, vt, h)
            for vf, vt, h in dim.get(url, [])
            if vf <= t and (vt is None or t < vt)
        ]
        assert len(hits) <= 1  # intervals partition the timeline
        if hits:
            vf, vt, h = hits[0]
            expected[eid] = (url, t, h, vf, vt is None)

    rows = QUERIES["rel_scd2_pointintime"](spark, SF_TINY).collect()
    assert len(rows) == len(expected)
    for r in rows:
        url, t, h, vf, cur = expected[r["event_id"]]
        assert (r["url"], r["t"], r["content_md5"]) == (url, t, h)
        assert r["valid_from"] == vf
        assert r["is_current_version"] == cur


def test_slice_finder_recount_and_z(spark):
    import math

    from multiomics_biocypher_kg_spark.registry import QUERIES

    rows = QUERIES["data_slice_finder"](spark, SF_TINY).collect()
    assert rows
    n_all = sum(r["n"] for r in rows)
    c_all = sum(r["n_correct"] for r in rows)
    acc_all = c_all / n_all
    for r in rows:
        assert abs(r["overall_accuracy"] - round(acc_all, 6)) < 1e-9
        acc = r["n_correct"] / r["n"]
        assert abs(r["accuracy"] - round(acc, 6)) < 1e-9
        z = (acc - acc_all) / math.sqrt(acc_all * (1 - acc_all) / r["n"])
        assert abs(r["z_score"] - round(z, 6)) < 1e-6
        assert r["underperforms"] == (z < -1.96)
    # slices partition the held-out set (doc_id % 5 == 0)
    con = duckdb.connect()
    n_test = con.sql(
        f"""SELECT count(*) FROM '{SF_TINY}/documents.parquet'
        WHERE doc_id % 5 = 0"""
    ).fetchone()[0]
    assert n_all == n_test


def test_code_gate_flags_exactly_the_planted_set(spark):
    from multiomics_biocypher_kg_spark.registry import QUERIES

    con = duckdb.connect()
    texts = dict(
        con.sql(
            f"SELECT doc_id, text FROM '{SF_TINY}/documents.parquet'"
        ).fetchall()
    )
    rows = QUERIES["text_code_gate"](spark, SF_TINY).collect()
    assert len(rows) == len(texts)
    tail = " def f ( x ) : return { x } ; import sys // x == y != z"
    kws = {"def", "return", "import", "function", "var"}
    syms = set("{}();=<>:/")
    for r in rows:
        t = texts[r["doc_id"]] + (tail if r["doc_id"] % 11 == 7 else "")
        sc = sum(c in syms for c in t)
        kh = sum(tok in kws for tok in t.split(" "))
        assert r["n_chars"] == len(t)
        assert r["symbol_chars"] == sc
        assert r["kw_hits"] == kh
        assert abs(r["symbol_ratio"] - round(sc / len(t), 6)) < 1e-9
        assert r["is_code"] == (kh >= 2 or sc / len(t) > 0.02)
    flagged = {r["doc_id"] for r in rows if r["is_code"]}
    assert flagged == {d for d in texts if d % 11 == 7}
