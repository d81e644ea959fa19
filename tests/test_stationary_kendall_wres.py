"""Contract tests for the Markov stationary distribution (vs a
numpy-free Python power-iteration mirror + the fixed-point
contract), Kendall tau-b (vs an O(n^2) Python mirror + bounds), and
the weighted reservoir (vs an exact key replay + the
weight-proportionality contract)."""

from __future__ import annotations

import hashlib
import math

import duckdb

from tests.conftest import SF_TINY


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_markov_stationary_matches_python_power_iteration(spark):
    from multiomics_biocypher_kg_spark.registry import QUERIES

    con = duckdb.connect()
    trans = con.sql(
        f"""
        WITH seq AS (
          SELECT event_type,
            lag(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS prev_type
          FROM '{SF_TINY}/events.parquet'
        )
        SELECT prev_type, event_type, count(*) FROM seq
        WHERE prev_type IS NOT NULL GROUP BY 1, 2
        """
    ).fetchall()
    tot = {}
    for s, _, n in trans:
        tot[s] = tot.get(s, 0) + n
    P = {(s, c): n / tot[s] for s, c, n in trans}
    states = sorted(tot)
    pi = {s: 1.0 / len(states) for s in states}
    for _ in range(8):
        nxt = {}
        for c in states:
            acc = 0.0
            for s in states:  # sorted-state fold, the pinned order
                if (s, c) in P:
                    acc = acc + pi[s] * P[(s, c)]
            nxt[c] = acc
        pi = nxt
    emp = dict(
        con.sql(
            f"""SELECT event_type, count(*) FROM
            '{SF_TINY}/events.parquet' GROUP BY 1"""
        ).fetchall()
    )
    n_ev = sum(emp.values())

    rows = QUERIES["ev_markov_stationary"](spark, SF_TINY).collect()
    assert {r["event_type"] for r in rows} == set(states)
    for r in rows:
        assert abs(r["stationary_p"] - round(pi[r["event_type"]], 6)) < 1e-9
        share = emp[r["event_type"]] / n_ev
        assert abs(r["empirical_share"] - round(share, 6)) < 1e-9
        assert abs(r["delta"] - round(pi[r["event_type"]] - share, 6)) < 1e-9
    # a probability vector: sums to ~1 after 8 iterations of a
    # stochastic matrix over source states
    assert abs(sum(r["stationary_p"] for r in rows) - 1.0) < 1e-3


def test_kendall_tau_matches_python_mirror(spark):
    from multiomics_biocypher_kg_spark.registry import QUERIES
    from multiomics_biocypher_kg_spark.registry_web import _HOST_GRAPH_SQL

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_TINY}/documents.parquet'"
    )
    hg = con.sql(
        f"""SELECT src_host, dst_host FROM ({_HOST_GRAPH_SQL})
        WHERE src_host <> dst_host"""
    ).fetchall()
    outd, ind = {}, {}
    for s, d in hg:
        outd.setdefault(s, set()).add(d)
        ind.setdefault(d, set()).add(s)
    hosts = sorted(set(outd) | set(ind))
    x = {h: len(outd.get(h, ())) for h in hosts}
    y = {h: len(ind.get(h, ())) for h in hosts}
    conc = disc = tx = ty = 0
    for i, a in enumerate(hosts):
        for b in hosts[i + 1 :]:
            p = (x[a] - x[b]) * (y[a] - y[b])
            conc += p > 0
            disc += p < 0
            tx += x[a] == x[b]
            ty += y[a] == y[b]
    n0 = len(hosts) * (len(hosts) - 1) // 2
    tau = (conc - disc) / math.sqrt((n0 - tx) * (n0 - ty))

    r = QUERIES["web_rank_correlation"](spark, SF_TINY).collect()
    assert len(r) == 1
    r = r[0]
    assert r["n_hosts"] == len(hosts)
    assert r["n_pairs"] == n0
    assert r["concordant"] == conc and r["discordant"] == disc
    assert r["ties_x"] == tx and r["ties_y"] == ty
    assert abs(r["tau_b"] - round(tau, 6)) < 1e-9
    assert -1.0 <= r["tau_b"] <= 1.0


def test_weighted_reservoir_matches_key_replay(spark):
    from multiomics_biocypher_kg_spark.registry import QUERIES

    con = duckdb.connect()
    docs = con.sql(
        f"""SELECT doc_id, len(string_split(text, ' '))
        FROM '{SF_TINY}/documents.parquet'
        WHERE len(string_split(text, ' ')) > 0"""
    ).fetchall()
    keyed = []
    for doc_id, w in docs:
        u = (_md5_long(f"{doc_id}#wsample") % 999999 + 1) / 1e6
        keyed.append((-(math.log(u) / w), doc_id, w))
    keyed.sort()
    expected = [
        (rank + 1, doc_id, w, round(-negk, 6))
        for rank, (negk, doc_id, w) in enumerate(keyed[:20])
    ]

    rows = QUERIES["text_weighted_reservoir"](spark, SF_TINY).collect()
    got = sorted(
        (r["sample_rank"], r["doc_id"], r["w"], r["lnkey"]) for r in rows
    )
    assert got == expected
    # weight-proportionality: the token-weighted sample's mean doc
    # length exceeds the corpus mean (long docs are over-sampled
    # relative to the uniform frame)
    corpus_mean = sum(w for _, w in docs) / len(docs)
    sample_mean = sum(r["w"] for r in rows) / len(rows)
    assert sample_mean > corpus_mean
