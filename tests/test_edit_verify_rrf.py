"""Contract tests for edit-distance candidate verification and
reciprocal-rank fusion — each against an independent pure-Python /
numpy mirror, plus the fixture contracts (exact twins score 1.0;
fusion prefers neighbors present in both arms)."""

from __future__ import annotations

import duckdb
import numpy as np

from tests.conftest import SF_TINY

_PREFIX = 400


def _lev(a: str, b: str) -> int:
    """Textbook Wagner-Fischer, unit costs."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_edit_verify_matches_python_dp_and_twin_contract(spark):
    from multiomics_biocypher_kg_spark.registry import QUERIES

    rows = QUERIES["dedup_edit_verify"](spark, SF_TINY).collect()
    assert rows
    con = duckdb.connect()
    texts = dict(
        con.sql(
            f"""SELECT doc_id, text FROM '{SF_TINY}/documents.parquet'
            UNION ALL SELECT doc_id + 2000000, text
            FROM '{SF_TINY}/documents.parquet' WHERE doc_id % 5 = 0"""
        ).fetchall()
    )
    # near-dup corpus members (every-10th-token-dropped variants)
    near = con.sql(
        f"""SELECT doc_id + 1000000, text FROM
        '{SF_TINY}/documents.parquet' WHERE doc_id % 4 = 0"""
    ).fetchall()
    for did, text in near:
        toks = text.split(" ")
        texts[did] = " ".join(t for i, t in enumerate(toks) if i % 10 != 9)

    exact_twin_pairs = 0
    for r in rows[:60]:  # DP mirror on a sample (quadratic per pair)
        pa = texts[r["id_a"]][:_PREFIX]
        pb = texts[r["id_b"]][:_PREFIX]
        lev = _lev(pa, pb)
        assert r["lev_distance"] == lev
        m = max(len(pa), len(pb))
        sim = 1.0 if m == 0 else 1.0 - lev / m
        assert abs(r["edit_sim"] - round(sim, 6)) < 1e-9
        assert r["is_dup"] == (sim >= 0.8)
    for r in rows:
        # every exact twin (id + 2000000) that LSH surfaces must
        # verify at similarity exactly 1.0
        if r["id_b"] - r["id_a"] == 2000000:
            exact_twin_pairs += 1
            assert r["edit_sim"] == 1.0 and r["lev_distance"] == 0
    assert exact_twin_pairs > 0


def test_rrf_fusion_matches_numpy_mirror(spark):
    from multiomics_biocypher_kg_spark.registry import QUERIES

    con = duckdb.connect()
    ids, embs = zip(
        *con.sql(
            f"SELECT vec_id, embedding FROM '{SF_TINY}/embeddings.parquet'"
        ).fetchall()
    )
    ids = np.array(ids)
    M = np.array([np.array(e, dtype=np.float64) for e in embs])
    norms = np.sqrt((M * M).sum(axis=1))
    codes = M > 0

    expected = {}
    for q in range(10):
        qi = int(np.where(ids == q)[0][0])
        cos = (M @ M[qi]) / (norms * norms[qi])
        ham = (codes ^ codes[qi]).sum(axis=1)
        mask = ids != q
        # cosine arm: rounded cosine desc, id asc (the cos CTE rounds)
        cos_order = sorted(
            [(-(round(c, 6)), int(i)) for c, i in zip(cos[mask], ids[mask])]
        )[:20]
        ham_order = sorted(
            [(int(h), int(i)) for h, i in zip(ham[mask], ids[mask])]
        )[:20]
        rank_c = {i: r + 1 for r, (_, i) in enumerate(cos_order)}
        rank_h = {i: r + 1 for r, (_, i) in enumerate(ham_order)}
        fused = {}
        for i in set(rank_c) | set(rank_h):
            rrf = (1.0 / (60 + rank_c[i]) if i in rank_c else 0.0) + (
                1.0 / (60 + rank_h[i]) if i in rank_h else 0.0
            )
            fused[i] = (rank_c.get(i, -1), rank_h.get(i, -1), rrf)
        top = sorted(fused.items(), key=lambda kv: (-round(kv[1][2], 6), kv[0]))[
            :10
        ]
        expected[q] = {
            i: (rc, rh, round(rrf, 6), fr + 1)
            for fr, (i, (rc, rh, rrf)) in enumerate(top)
        }

    rows = QUERIES["emb_rrf_fusion"](spark, SF_TINY).collect()
    assert len(rows) == 100  # 10 queries x top-10
    for r in rows:
        rc, rh, rrf, fr = expected[r["query_id"]][r["neighbor_id"]]
        assert r["rank_cosine"] == rc
        assert r["rank_hamming"] == rh
        assert abs(r["rrf"] - rrf) < 1e-9
        assert r["fused_rank"] == fr
    # both-arm neighbors must outrank single-arm ones at equal depth:
    # every fused_rank-1 row is present in at least one arm's head
    for r in rows:
        if r["fused_rank"] == 1:
            assert r["rank_cosine"] != -1 or r["rank_hamming"] != -1
            assert r["rrf"] > 1.0 / 81  # better than a lone rank-20 hit
