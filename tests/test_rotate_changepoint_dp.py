"""Contract tests for the round-4 batch M: RotatE triple scoring,
offline change-point localization, and the DP histogram release —
each checked against an independent pure-Python mirror, not just the
DuckDB oracle."""

from __future__ import annotations

import hashlib
import math

import duckdb

from tests.conftest import SF_TINY

_TE_DIM = 8
_TE_MOD = 1000


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _comp(name: str, tag: str, j: int) -> int:
    return _md5_long(f"{name}#{tag}{j}") % _TE_MOD - 500


def _rotate_dist2(subj: str, pred: str, obj: str, re_tag: str, im_tag: str) -> int:
    tot = 0
    for j in range(_TE_DIM):
        hr, hi = _comp(subj, "cr", j), _comp(subj, "ci", j)
        rr, ri = _comp(pred, "qr", j), _comp(pred, "qi", j)
        tr, ti = _comp(obj, re_tag, j), _comp(obj, im_tag, j)
        dre = hr * rr - hi * ri - 500 * tr
        dim = hr * ri + hi * rr - 500 * ti
        tot += dre * dre + dim * dim
    return tot


def test_rotate_score_matches_python_mirror(spark):
    """Exact-int64 contract: recompute |h o r - t|^2 per dim in pure
    Python for a sample of rows and pin both distances, the margin
    arithmetic, and the plausible flag."""
    from multiomics_biocypher_kg_spark.registry import QUERIES

    rows = QUERIES["kg_rotate_score"](spark, SF_TINY).limit(200).collect()
    assert rows
    for r in rows:
        pos = _rotate_dist2(r["subj"], r["pred"], r["obj"], "cr", "ci")
        neg = _rotate_dist2(r["subj"], r["pred"], r["obj"], "xr", "xi")
        assert r["rotate_dist2"] == pos
        assert r["neg_dist2"] == neg
        assert r["margin_d2"] == neg - pos
        assert r["plausible"] == (neg - pos > 0)
        # int64 headroom: the docstring's < 1e13 bound must hold
        assert 0 <= pos < 10**13 and 0 <= neg < 10**13


def test_rotate_shares_complex_entity_embedding(spark):
    """RotatE's positive tail uses the SAME entity tags (cr/ci) as
    ComplEx — one entity parameter table across decoders — so a
    self-loop triple (subj == obj) must score h o r against h
    itself, which the Python mirror only reproduces if the tag
    convention matches."""
    d2 = _rotate_dist2("e1", "p", "e1", "cr", "ci")
    # h o r - 500h per dim: zero only if r == (500, 0) exactly
    assert d2 > 0


def test_changepoint_matches_bruteforce(spark):
    """Brute-force every split of every per-type daily series in
    Python (exact SSE arithmetic via integer moments) and pin the
    chosen split day, both segment means, and the reduction."""
    from multiomics_biocypher_kg_spark.registry import QUERIES

    con = duckdb.connect()
    daily = con.sql(
        f"""SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') d,
        count(*) c FROM '{SF_TINY}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"""
    ).fetchall()
    series: dict[str, list[tuple[str, int]]] = {}
    for et, d, c in daily:
        series.setdefault(et, []).append((d, c))

    expected = {}
    for et, pts in series.items():
        n = len(pts)
        if n < 4:
            continue
        xs = [c for _, c in pts]
        s1, s2 = sum(xs), sum(x * x for x in xs)
        sse_t = s2 - s1 * s1 / n
        best = None
        for k in range(1, n):
            c1 = sum(xs[:k])
            c2 = sum(x * x for x in xs[:k])
            sse_l = c2 - c1 * c1 / k
            r1, r2 = s1 - c1, s2 - c2
            sse_r = r2 - r1 * r1 / (n - k)
            red = (sse_t - sse_l) - sse_r
            key = (-round(red, 6), pts[k - 1][0])
            if best is None or key < best[0]:
                best = (key, pts[k - 1][0], k, c1, red)
        _, day, k, c1, red = best
        expected[et] = (
            day,
            n,
            round(c1 / k, 6),
            round((s1 - c1) / (n - k), 6),
            round(red, 6),
        )

    rows = QUERIES["ev_changepoint"](spark, SF_TINY).collect()
    assert {r["event_type"] for r in rows} == set(expected)
    for r in rows:
        day, n, mb, ma, red = expected[r["event_type"]]
        assert r["split_day"] == day
        assert r["n_days"] == n
        assert abs(r["mean_before"] - mb) < 1e-9
        assert abs(r["mean_after"] - ma) < 1e-9
        assert abs(r["sse_reduction"] - red) < 1e-6
        assert r["direction"] == (
            "up" if ma > mb else ("down" if ma < mb else "flat")
        )


def test_dp_histogram_matches_python_laplace(spark):
    """Recompute the seeded Laplace draw per cell (inverse-CDF of
    the md5-uniform) and pin noise and dp_count; check the release
    covers every (lang, source) cell exactly once and the noise is
    centred (deterministic draws, but the empirical mean of ~100
    Laplace(1) draws must be well inside +/-1)."""
    from multiomics_biocypher_kg_spark.registry import QUERIES

    rows = QUERIES["data_dp_histogram"](spark, SF_TINY).collect()
    con = duckdb.connect()
    truth = dict(
        ((lang, src), n)
        for lang, src, n in con.sql(
            f"""SELECT lang, source, count(*) FROM
            '{SF_TINY}/documents.parquet' GROUP BY 1, 2"""
        ).fetchall()
    )
    assert {(r["lang"], r["source"]) for r in rows} == set(truth)
    noises = []
    for r in rows:
        u = (_md5_long(f"{r['lang']}|{r['source']}#dp0") % 999999 + 1) / 1e6
        if u >= 0.5:
            noise = -math.log(1 - 2 * (u - 0.5))
        else:
            noise = math.log(1 - 2 * (0.5 - u))
        assert abs(r["noise"] - round(noise, 6)) < 1e-9
        assert abs(r["dp_count"] - round(truth[(r["lang"], r["source"])] + noise, 6)) < 1e-9
        assert r["n_docs"] == truth[(r["lang"], r["source"])]
        assert r["epsilon"] == 1.0
        noises.append(noise)
    assert abs(sum(noises) / len(noises)) < 1.0
