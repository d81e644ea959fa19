"""Contract test for late-interaction MaxSim retrieval: a pure-
Python token-vector replay pins every score exactly (int64
contract), plus the self-retrieval sanity (a query's own document
contains every query token, so it scores the per-token maximum)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import duckdb

from tests.conftest import SF_TINY

_DIM = 8


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _vec(tok: str):
    return [_md5_long(f"{tok}#tv{j}") % 256 - 128 for j in range(_DIM)]


def test_colbert_maxsim_matches_python_replay(spark):
    from multiomics_biocypher_kg_spark.registry import QUERIES

    con = duckdb.connect()
    docs = dict(
        con.sql(
            f"SELECT doc_id, text FROM '{SF_TINY}/documents.parquet'"
        ).fetchall()
    )
    doc_tokens = {d: set(t.split(" ")) for d, t in docs.items()}
    vcache: dict[str, list] = {}

    def v(tok):
        if tok not in vcache:
            vcache[tok] = _vec(tok)
        return vcache[tok]

    expected = {}
    for q in range(5):
        qtoks = docs[q].split(" ")[:6]
        scores = {}
        for d, toks in doc_tokens.items():
            s = 0
            for qt in qtoks:
                qv = v(qt)
                s += max(
                    sum(a * b for a, b in zip(qv, v(t))) for t in toks
                )
            scores[d] = s
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        for rank, (d, s) in enumerate(top, 1):
            expected[(q, d)] = (s, rank)

    rows = QUERIES["emb_colbert_maxsim"](spark, SF_TINY).collect()
    assert len(rows) == len(expected) == 50
    for r in rows:
        s, rank = expected[(r["query_id"], r["doc_id"])]
        assert r["maxsim"] == s
        assert r["rank"] == rank
    # self-retrieval sanity: the query's own doc contains every
    # query token, so its MaxSim is the sum of per-token self-max
    # terms — it must appear in its own top-10 on this small corpus
    by_q = defaultdict(set)
    for (q, d) in expected:
        by_q[q].add(d)
    assert sum(q in by_q[q] for q in range(5)) >= 3
