"""Contract tests for decoder agreement, user behavioral entropy,
and the dataloader shuffle-quality audit."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from tests.conftest import SF_TINY


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _dim(name: str, tag: str, j: int) -> int:
    return _h(f"{name}#{tag}{j}") % 1000 - 500


def test_decoder_agreement_matches_numpy_pearson(spark):
    """The three pairwise correlations must equal numpy corrcoef
    over exact integer scores recomputed from md5 first principles,
    and no pair may correlate perfectly (the decoders genuinely
    disagree somewhere)."""
    import numpy as np

    from multiomics_biocypher_kg_spark.registry import QUERIES

    trips = (
        QUERIES["kg_triples"](spark, SF_TINY)
        .select("subj", "pred", "obj")
        .collect()
    )
    t_v, d_v, c_v = [], [], []
    for r in trips:
        s, p, o = r["subj"], r["pred"], r["obj"]
        t = -sum(
            (_dim(s, "e", j) + _dim(p, "r", j) - _dim(o, "e", j)) ** 2
            for j in range(8)
        )
        d = sum(
            _dim(s, "e", j) * _dim(p, "r", j) * _dim(o, "e", j) for j in range(8)
        )
        c = sum(
            _dim(s, "cr", j) * _dim(p, "sr", j) * _dim(o, "cr", j)
            + _dim(s, "ci", j) * _dim(p, "sr", j) * _dim(o, "ci", j)
            + _dim(s, "cr", j) * _dim(p, "si", j) * _dim(o, "ci", j)
            - _dim(s, "ci", j) * _dim(p, "si", j) * _dim(o, "cr", j)
            for j in range(8)
        )
        t_v.append(t)
        d_v.append(d)
        c_v.append(c)
    arr = {
        "transe~distmult": (t_v, d_v),
        "transe~complex": (t_v, c_v),
        "distmult~complex": (d_v, c_v),
    }
    got = {
        r["pair"]: r
        for r in QUERIES["kg_decoder_agreement"](spark, SF_TINY).collect()
    }
    assert set(got) == set(arr)
    for pair, (x, y) in arr.items():
        expect = float(np.corrcoef(np.array(x, float), np.array(y, float))[0, 1])
        r = got[pair]
        assert r["n_triples"] == len(trips)
        assert abs(r["pearson_r"] - expect) < 1e-5
        assert abs(r["pearson_r"]) < 0.999


def test_user_entropy_mirror_and_planted_bot(spark):
    """Entropy values must equal a Python replay; a planted
    single-endpoint 25-event client flags low-diversity, a diverse
    25-event user does not."""
    import datetime as dt
    import tempfile

    from multiomics_biocypher_kg_spark.registry import QUERIES

    ev = spark.read.parquet(f"{SF_TINY}/events.parquet").select(
        "user_id", "event_type"
    ).collect()
    per = defaultdict(lambda: defaultdict(int))
    for r in ev:
        per[r["user_id"]][r["event_type"]] += 1
    got = {r["user_id"]: r for r in QUERIES["ev_user_entropy"](spark, SF_TINY).collect()}
    assert set(got) == set(per)
    for u, types in per.items():
        n = sum(types.values())
        h = -sum((c / n) * math.log2(c / n) for c in types.values())
        r = got[u]
        assert r["n_events"] == n
        assert r["n_types"] == len(types)
        assert abs(r["entropy_bits"] - h) < 1e-5
        if len(types) == 1:
            assert r["norm_entropy"] == 0.0
        else:
            assert abs(r["norm_entropy"] - h / math.log2(len(types))) < 1e-5
            assert 0.0 <= r["norm_entropy"] <= 1.0 + 1e-9

    base = dt.datetime(2024, 2, 1)
    rows = [
        *[(i, base + dt.timedelta(minutes=i), 1, "ping", 0.0, "{}")
          for i in range(25)],
        *[(100 + i, base + dt.timedelta(minutes=i), 2,
           ["view", "click", "buy", "search", "scroll"][i % 5], 0.0, "{}")
          for i in range(25)],
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(f"{td}/events.parquet")
        planted = {
            r["user_id"]: r for r in QUERIES["ev_user_entropy"](spark, td).collect()
        }
    assert planted[1]["is_low_diversity"] and planted[1]["norm_entropy"] == 0.0
    assert not planted[2]["is_low_diversity"]
    assert planted[2]["norm_entropy"] > 0.9


def test_shuffle_quality_matches_python_replay(spark):
    """Observed adjacency and expectation must equal a pure-Python
    replay of the exact epoch permutation; the hash permutation's
    corpus-wide lift sits near 1 (no systematic clustering)."""
    from multiomics_biocypher_kg_spark.registry import QUERIES
    from multiomics_biocypher_kg_spark.registry_scale_ops import _N_EPOCH_SHARDS

    docs = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_TINY}/documents.parquet")
        .select("doc_id")
        .collect()
    ]

    def host(d):
        return "hot.example.com" if d % 10 < 3 else f"h{d % 50}.example.org"

    groups = defaultdict(list)
    for d in docs:
        for ep in (0, 1):
            hh = _h(f"{d}#ep{ep}")
            groups[(ep, hh % _N_EPOCH_SHARDS)].append((hh, d))
    expect = {}
    for key, members in groups.items():
        members.sort()
        hosts = [host(d) for _, d in members]
        n_same = sum(1 for a, b in zip(hosts, hosts[1:]) if a == b)
        m = defaultdict(int)
        for x in hosts:
            m[x] += 1
        exp = sum(v * (v - 1) for v in m.values()) / len(hosts)
        expect[key] = (len(hosts), n_same, exp)
    got = {
        (r["epoch"], r["shard"]): r
        for r in QUERIES["data_shuffle_quality"](spark, SF_TINY).collect()
    }
    assert set(got) == set(expect)
    tot_same = tot_exp = 0.0
    for key, (n, ns, exp) in expect.items():
        r = got[key]
        assert r["n_docs"] == n
        assert r["n_same_host_adjacent"] == ns
        assert abs(r["expected"] - exp) < 1e-5
        tot_same += ns
        tot_exp += exp
    assert 0.5 < tot_same / tot_exp < 2.0
