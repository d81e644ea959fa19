"""Contract tests for the ComplEx scorer, Wu-Palmer similarity, and
the EWMA daily-volume forecast — each checked against an independent
pure-Python mirror, not just the DuckDB oracle."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from tests.conftest import SF_TINY


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_complex_scores_match_md5_mirror_and_antisymmetry(spark):
    """kg_complex_score must equal a pure-Python recomputation of the
    exact int64 Re(<h, r, conj(t)>) from md5 first principles, and —
    unlike DistMult — swapping subject and object must CHANGE the
    score for at least some triples (the antisymmetry ComplEx exists
    to provide)."""
    from multiomics_biocypher_kg_spark.registry import QUERIES

    def dim(name: str, tag: str, j: int) -> int:
        return _h(f"{name}#{tag}{j}") % 1000 - 500

    def score(subj: str, pred: str, obj: str, re_tag: str, im_tag: str) -> int:
        s = 0
        for j in range(8):
            hr, hi = dim(subj, "cr", j), dim(subj, "ci", j)
            rr, ri = dim(pred, "sr", j), dim(pred, "si", j)
            tr, ti = dim(obj, re_tag, j), dim(obj, im_tag, j)
            s += hr * rr * tr + hi * rr * ti + hr * ri * ti - hi * ri * tr
        return s

    rows = QUERIES["kg_complex_score"](spark, SF_TINY).limit(40).collect()
    assert rows
    n_asym = 0
    for r in rows:
        pos = score(r["subj"], r["pred"], r["obj"], "cr", "ci")
        neg = score(r["subj"], r["pred"], r["obj"], "xr", "xi")
        assert r["complex_score_e9"] == pos
        assert r["neg_score_e9"] == neg
        assert r["margin_e9"] == pos - neg
        assert r["plausible"] == (pos - neg > 0)
        if r["subj"] != r["obj"]:
            swapped = score(r["obj"], r["pred"], r["subj"], "cr", "ci")
            if swapped != pos:
                n_asym += 1
    # the imaginary parts make the decoder direction-sensitive
    assert n_asym > 0


def test_wupalmer_matches_python_tree_mirror(spark):
    """Recompute quad-tree depths and the deepest common ancestor in
    pure Python and pin node, depths, and similarity for every probe
    pair; wup must sit strictly inside (0, 1) for distinct nodes."""
    from multiomics_biocypher_kg_spark.registry import QUERIES
    from multiomics_biocypher_kg_spark.registry_ontology import _WUP_PAIR_MOD

    max_id = (
        spark.read.parquet(f"{SF_TINY}/documents.parquet")
        .agg({"doc_id": "max"})
        .collect()[0][0]
    )

    def ancs(x):  # root path including self
        out = [x]
        while x > 0:
            x //= 4
            out.append(x)
        return out

    exp = {}
    for m in range(max_id + 1):
        if m % _WUP_PAIR_MOD == 1 and m > 0 and m + 2 <= max_id:
            pa, pb = ancs(m), ancs(m + 2)
            common = set(pa) & set(pb)
            lca = max(common, key=lambda c: (len(ancs(c)), f"n{c:04d}"))
            da, db, dl = len(pa), len(pb), len(ancs(lca))
            exp[(f"n{m:04d}", f"n{m + 2:04d}")] = (
                f"n{lca:04d}",
                dl,
                da,
                db,
                round(2.0 * dl / (da + db), 6),
            )

    got = {
        (r["node_a"], r["node_b"]): (
            r["lca"],
            r["d_lca"],
            r["d_a"],
            r["d_b"],
            r["wup"],
        )
        for r in QUERIES["onto_wupalmer_similarity"](spark, SF_TINY).collect()
    }
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][:4] == exp[k][:4], (k, got[k], exp[k])
        assert abs(got[k][4] - exp[k][4]) < 1e-9
        # b = a + 2 can never be on a's root path, so the LCA is a
        # strict ancestor of both and the similarity strictly inside
        assert 0.0 < got[k][4] < 1.0


def test_ewma_forecast_mirror_and_planted_series(spark):
    """Forecast/residual values must equal a per-type Python replay
    on the real events; a planted constant series forecasts itself
    exactly (residual 0, no anomaly) and a planted spike day is
    flagged."""
    import datetime as dt
    import tempfile

    from multiomics_biocypher_kg_spark.registry import QUERIES
    from multiomics_biocypher_kg_spark.registry_relational import (
        _EWMA_TAPS,
        _EWMA_W,
    )

    ev = spark.read.parquet(f"{SF_TINY}/events.parquet").select(
        "event_type", "ts"
    ).collect()
    daily = defaultdict(int)
    for r in ev:
        daily[(r["event_type"], r["ts"].strftime("%Y-%m-%d"))] += 1
    series = defaultdict(list)
    for (t, day), c in sorted(daily.items()):
        series[t].append((day, c))
    expect = {}
    for t, pts in series.items():
        for i, (day, c) in enumerate(pts):
            if i == 0:
                continue
            num = den = 0.0
            for j in range(_EWMA_TAPS):
                if i - 1 - j >= 0:
                    num += _EWMA_W[j] * float(pts[i - 1 - j][1])
                    den += _EWMA_W[j]
            fc = num / den
            expect[(t, day)] = (c, fc, (c - fc) / fc)
    got = QUERIES["ev_ewma_forecast"](spark, SF_TINY).collect()
    assert len(got) == len(expect)
    for r in got:
        c, fc, resid = expect[(r["event_type"], r["day"])]
        assert r["n_events"] == c
        assert abs(r["forecast"] - fc) < 1e-5
        assert abs(r["resid_ratio"] - resid) < 1e-5
        assert r["is_anomaly"] == (abs(resid) > 0.5)

    base = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for d in range(12):
        # constant series: 4 events/day; spike series: 4 except day 10
        for _ in range(4):
            rows.append((eid, base + dt.timedelta(days=d), 1, "steady", 0.0, "{}"))
            eid += 1
        n = 40 if d == 10 else 4
        for _ in range(n):
            rows.append((eid, base + dt.timedelta(days=d), 2, "spiky", 0.0, "{}"))
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
            for r in QUERIES["ev_ewma_forecast"](spark, td).collect()
        }
    for (t, day), r in planted.items():
        if t == "steady":
            assert r["forecast"] == 4.0
            assert r["resid_ratio"] == 0.0
            assert not r["is_anomaly"]
    spike_day = (base + dt.timedelta(days=10)).strftime("%Y-%m-%d")
    assert planted[("spiky", spike_day)]["is_anomaly"]
    # the day after the spike, the EWMA has partially absorbed it —
    # forecast rises above the steady 4.0
    after = (base + dt.timedelta(days=11)).strftime("%Y-%m-%d")
    assert planted[("spiky", after)]["forecast"] > 4.0
