"""Contract tests for greedy k-center coreset selection, MAD-robust
volume anomalies, and the per-host domain-KLD audit — each against an
independent pure-Python mirror or planted fixture."""

from __future__ import annotations

import math
from collections import defaultdict

from tests.conftest import SF_TINY


def test_kcenter_matches_python_greedy(spark):
    """Replay the exact greedy schedule (round-6 distances, min-id
    tiebreak) in pure Python and pin every (round, center, radius)
    row; radii must be non-increasing and centers distinct."""
    from multiomics_biocypher_kg_spark.registry import QUERIES
    from multiomics_biocypher_kg_spark.registry_scale_ops import _KC_ROUNDS

    emb = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in spark.read.parquet(f"{SF_TINY}/embeddings.parquet").collect()
    }
    seed = min(emb)
    centers = [(0, seed, 0.0)]
    for rnd in range(1, _KC_ROUNDS + 1):
        best = None
        for vid, v in emb.items():
            mind = min(
                round(sum((a - b) * (a - b) for a, b in zip(v, emb[c])), 6)
                for _, c, _ in centers
            )
            if best is None or (mind, -vid) > (best[0], -best[1]):
                best = (mind, vid)
        centers.append((rnd, best[1], best[0]))

    got = sorted(
        (r["sel_round"], r["vec_id"], r["radius"])
        for r in QUERIES["data_kcenter_coreset"](spark, SF_TINY).collect()
    )
    assert len(got) == _KC_ROUNDS + 1
    for (gr, gv, grad), (er, ev, erad) in zip(got, centers):
        assert (gr, gv) == (er, ev), (got, centers)
        assert abs(grad - erad) < 1e-9
    radii = [r for _, _, r in got[1:]]
    assert all(a >= b for a, b in zip(radii, radii[1:]))
    assert len({v for _, v, _ in got}) == _KC_ROUNDS + 1


def test_anomaly_mad_mirror_and_planted_spike(spark):
    """Per-day robust z must equal a numpy-percentile Python replay;
    a planted spike over a naturally-varying series is flagged while
    ordinary days are not, and a constant series (MAD = 0) is never
    flagged by contract."""
    import datetime as dt
    import tempfile

    import numpy as np

    from multiomics_biocypher_kg_spark.registry import QUERIES

    ev = spark.read.parquet(f"{SF_TINY}/events.parquet").select(
        "event_type", "ts"
    ).collect()
    daily = defaultdict(int)
    for r in ev:
        daily[(r["event_type"], r["ts"].strftime("%Y-%m-%d"))] += 1
    per_type = defaultdict(dict)
    for (t, d), c in daily.items():
        per_type[t][d] = c
    got = QUERIES["ev_anomaly_mad"](spark, SF_TINY).collect()
    assert len(got) == len(daily)
    for r in got:
        cs = np.array(sorted(per_type[r["event_type"]].values()), dtype=float)
        med = float(np.percentile(cs, 50))
        mad = float(np.percentile(np.abs(cs - med), 50))
        c = per_type[r["event_type"]][r["day"]]
        assert r["n_events"] == c
        assert abs(r["med"] - round(med, 6)) < 1e-9
        assert abs(r["mad"] - round(mad, 6)) < 1e-9
        if mad == 0:
            assert r["robust_z"] == 0.0 and not r["is_anomaly"]
        else:
            z = 0.6745 * (c - med) / mad
            assert abs(r["robust_z"] - z) < 1e-5
            assert r["is_anomaly"] == (abs(z) > 3.5)

    base = dt.datetime(2024, 5, 1)
    counts_spiky = [4, 5, 4, 6, 5, 4, 5, 6, 5, 4, 40]
    rows, eid = [], 0
    for d, n in enumerate(counts_spiky):
        for _ in range(n):
            rows.append((eid, base + dt.timedelta(days=d), 1, "spiky", 0.0, "{}"))
            eid += 1
    for d in range(11):  # constant series: MAD = 0, never flagged
        for _ in range(7):
            rows.append((eid, base + dt.timedelta(days=d), 2, "flat", 0.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(f"{td}/events.parquet")
        planted = {
            (r["event_type"], r["day"]): r
            for r in QUERIES["ev_anomaly_mad"](spark, td).collect()
        }
    spike_day = (base + dt.timedelta(days=10)).strftime("%Y-%m-%d")
    assert planted[("spiky", spike_day)]["is_anomaly"]
    n_flagged = sum(1 for (t, _), r in planted.items() if t == "spiky" and r["is_anomaly"])
    assert n_flagged == 1
    assert not any(r["is_anomaly"] for (t, _), r in planted.items() if t == "flat")


def test_domain_kld_matches_python_mirror(spark):
    """Per-host KLD must equal a pure-Python unigram-LM replay and
    be non-negative (Gibbs' inequality)."""
    from multiomics_biocypher_kg_spark.registry import QUERIES

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    ht = defaultdict(lambda: defaultdict(int))
    for r in docs:
        host = (
            "hot.example.com"
            if r["doc_id"] % 10 < 3
            else f"h{r['doc_id'] % 50}.example.org"
        )
        for tok in r["text"].lower().split(" "):
            ht[host][tok] += 1
    corpus = defaultdict(int)
    for h in ht:
        for t, c in ht[h].items():
            corpus[t] += c
    total = sum(corpus.values())
    got = {r["host"]: r for r in QUERIES["text_domain_kld"](spark, SF_TINY).collect()}
    assert set(got) == set(ht)
    for h, toks in ht.items():
        th = sum(toks.values())
        kld = sum(
            (c / th) * math.log2((c / th) / (corpus[t] / total))
            for t, c in toks.items()
        )
        r = got[h]
        assert r["n_tokens"] == th
        assert r["vocab"] == len(toks)
        assert abs(r["kld_bits"] - kld) < 1e-5
        assert r["kld_bits"] > -1e-9
