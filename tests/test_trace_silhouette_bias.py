"""Contract tests for the PageRank convergence trace, the
centroid silhouette, and the sample-bias audit."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from tests.conftest import SF_TINY


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_pagerank_trace_matches_python_replay_and_decays(spark):
    """Replay the exact 5-iteration weighted PageRank in pure Python
    and pin every (iter, l1, max) row; the L1 delta must shrink
    monotonically (the geometric-decay certification the fixed
    horizon rests on)."""
    from multiomics_biocypher_kg_spark.operators.linkgraph import (
        host_graph,
        href_edges,
    )
    from multiomics_biocypher_kg_spark.registry import QUERIES
    from multiomics_biocypher_kg_spark.registry_web import (
        _PR_DAMPING,
        _PR_ITERS,
    )
    from multiomics_biocypher_kg_spark.sources.pages import (
        pages_from_documents,
    )

    g = host_graph(href_edges(pages_from_documents(spark, SF_TINY))).collect()
    edges = [(r["src_host"], r["dst_host"], float(r["n_links"])) for r in g]
    out_w = defaultdict(float)
    for s, _, w in edges:
        out_w[s] += w
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    has_out = {s for s, _, _ in edges}
    rank = {v: 1.0 / n for v in nodes}
    expect = []
    for it in range(1, _PR_ITERS + 1):
        dang = sum(r for v, r in rank.items() if v not in has_out)
        contrib = defaultdict(float)
        for s, d, w in edges:
            contrib[d] += (w / out_w[s]) * rank[s]
        new = {
            v: (1 - _PR_DAMPING) / n
            + _PR_DAMPING * (contrib.get(v, 0.0) + dang / n)
            for v in nodes
        }
        deltas = [abs(new[v] - rank[v]) for v in nodes]
        expect.append((it, sum(deltas), max(deltas)))
        rank = new

    got = sorted(
        (r["iter"], r["l1_delta"], r["max_delta"])
        for r in QUERIES["web_pagerank_delta_trace"](spark, SF_TINY).collect()
    )
    assert len(got) == _PR_ITERS
    for (gi, gl, gm), (ei, el, em) in zip(got, expect):
        assert gi == ei
        assert abs(gl - el) < 1e-5
        assert abs(gm - em) < 1e-5
    l1s = [l for _, l, _ in got]
    assert all(a > b for a, b in zip(l1s, l1s[1:]))


def test_silhouette_matches_numpy_mirror(spark):
    """Per-label a/b/silhouette means must equal a numpy centroid
    replay; silhouettes live in [-1, 1]."""
    import numpy as np

    from multiomics_biocypher_kg_spark.registry import QUERIES

    rows = spark.read.parquet(f"{SF_TINY}/embeddings.parquet").collect()
    by_label = defaultdict(list)
    for r in rows:
        by_label[r["label"]].append([float(x) for x in r["embedding"]])
    cents = {l: np.mean(np.array(vs), axis=0) for l, vs in by_label.items()}
    stats = defaultdict(lambda: [0, 0.0, 0.0, 0.0])  # n, sa, sb, ss
    for l, vs in by_label.items():
        for v in vs:
            v = np.array(v)
            a = float(np.sqrt(((v - cents[l]) ** 2).sum()))
            b = min(
                float(np.sqrt(((v - c) ** 2).sum()))
                for m, c in cents.items()
                if m != l
            )
            s = (b - a) / max(a, b)
            st = stats[l]
            st[0] += 1
            st[1] += a
            st[2] += b
            st[3] += s
    got = {r["label"]: r for r in QUERIES["emb_silhouette"](spark, SF_TINY).collect()}
    assert set(got) == set(stats)
    for l, (n, sa, sb, ss) in stats.items():
        r = got[l]
        assert r["n_vecs"] == n
        assert abs(r["mean_intra"] - sa / n) < 1e-4
        assert abs(r["mean_nearest_other"] - sb / n) < 1e-4
        assert abs(r["mean_silhouette"] - ss / n) < 1e-4
        assert -1.0 <= r["mean_silhouette"] <= 1.0


def test_sample_bias_audit_mirror_and_planted_aliasing(spark):
    """Counts and residuals must equal a Python recount; a planted
    corpus whose lang IS a function of doc_id % 20 flags the
    systematic sampler and clears the hash sampler."""
    import math
    import tempfile

    from multiomics_biocypher_kg_spark.registry import QUERIES

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet").select(
        "doc_id", "lang"
    ).collect()
    full = defaultdict(int)
    hsh = defaultdict(int)
    sys_ = defaultdict(int)
    for r in docs:
        full[r["lang"]] += 1
        if _md5_long(str(r["doc_id"])) % 20 == 0:
            hsh[r["lang"]] += 1
        if r["doc_id"] % 20 == 0:
            sys_[r["lang"]] += 1
    t_full = sum(full.values())
    got = {
        (r["sampler"], r["lang"]): r
        for r in QUERIES["data_sample_bias_audit"](spark, SF_TINY).collect()
    }
    assert len(got) == 2 * len(full)
    for sampler, counts in (("hash", hsh), ("systematic", sys_)):
        p = sum(counts.values()) / t_full
        for lang, nf in full.items():
            r = got[(sampler, lang)]
            ns = counts[lang]
            z = (ns - nf * p) / math.sqrt(nf * p * (1 - p))
            assert r["n_full"] == nf and r["n_sample"] == ns
            assert abs(r["expected"] - nf * p) < 1e-5
            assert abs(r["residual_z"] - z) < 1e-5
            assert r["is_biased"] == (abs(z) > 3.0)

    # planted: lang = 'aliased' exactly on doc_id % 20 == 0, else 'rest'
    rows = [
        (i, "x", "aliased" if i % 20 == 0 else "rest") for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(f"{td}/documents.parquet")
        planted = {
            (r["sampler"], r["lang"]): r
            for r in QUERIES["data_sample_bias_audit"](spark, td).collect()
        }
    # the systematic 1/20 sampler captures EVERY 'aliased' doc
    assert planted[("systematic", "aliased")]["is_biased"]
    assert not planted[("hash", "aliased")]["is_biased"]
