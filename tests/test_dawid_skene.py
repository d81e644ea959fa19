"""Contract tests for the Dawid-Skene pair: a pure-Python EM mirror
pins every output row, and the fixture guarantees the two claims the
docstrings make — the one-step relabel beats majority vote against
the noise-free gold band, and the estimated rater quality separates
careful raters from the sloppy tail."""

from __future__ import annotations

import collections
import hashlib

import duckdb

from tests.conftest import SF_TINY

_WIDTHS = [20, 60, 120, 160, 200]
_CATS = ["high", "low", "mid"]


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _band(x: int, n: int) -> str:
    return "high" if x >= 50 * n else ("low" if x < -50 * n else "mid")


def _load_docs():
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text FROM '{SF_TINY}/documents.parquet'"
    ).fetchall()
    docs = []
    for doc_id, text in rows:
        toks = text.split(" ")
        n = len(toks)
        s = sum(_md5_long(t) % 2001 - 1000 for t in toks)
        gold = _band(s, n)
        obs = [
            _band(
                s
                + (_md5_long(f"ds{r}#{doc_id}") % (2 * w + 1) - w) * n,
                n,
            )
            for r, w in enumerate(_WIDTHS)
        ]
        docs.append((doc_id, gold, obs))
    return docs


def _mv(obs):
    c = {cat: sum(o == cat for o in obs) for cat in _CATS}
    if c["high"] >= c["low"] and c["high"] >= c["mid"]:
        return "high"
    return "low" if c["low"] >= c["mid"] else "mid"


def _fit(docs):
    """One hard-EM step from the MV init: returns (per-doc DS rows,
    confusion counts, n_true)."""
    conf = collections.Counter()
    ntrue = collections.Counter()
    mv_labels = {d: _mv(o) for d, _, o in docs}
    for doc_id, _, obs in docs:
        y = mv_labels[doc_id]
        ntrue[y] += 1
        for r, o in enumerate(obs):
            conf[(r, y, o)] += 1
    n_docs = len(docs)

    def p(r, c, o):
        return (conf[(r, c, o)] + 1) / (ntrue[c] + 3)

    def pi(c):
        return (ntrue[c] + 1) / (n_docs + 3)

    out = {}
    for doc_id, _, obs in docs:
        s = {}
        for c in _CATS:
            v = pi(c)
            for r, o in enumerate(obs):
                v = v * p(r, c, o)
            s[c] = v
        if s["high"] >= s["low"] and s["high"] >= s["mid"]:
            lab = "high"
        elif s["low"] >= s["mid"]:
            lab = "low"
        else:
            lab = "mid"
        post = s[lab] / ((s["high"] + s["low"]) + s["mid"])
        out[doc_id] = (mv_labels[doc_id], lab, round(post, 6))
    return out, conf, ntrue


def test_dawid_skene_matches_python_mirror(spark):
    from multiomics_biocypher_kg_spark.registry import QUERIES

    docs = _load_docs()
    expected, _, _ = _fit(docs)
    rows = QUERIES["data_dawid_skene"](spark, SF_TINY).collect()
    assert len(rows) == len(expected)
    for r in rows:
        mv_label, ds_label, post = expected[r["doc_id"]]
        assert r["mv_label"] == mv_label
        assert r["ds_label"] == ds_label
        assert r["changed"] == (ds_label != mv_label)
        assert abs(r["ds_posterior"] - post) < 1e-9


def test_dawid_skene_beats_majority_vote_vs_gold(spark):
    """The headline claim: accuracy against the NOISE-FREE gold band
    improves from MV to the DS relabel, and some labels change."""
    from multiomics_biocypher_kg_spark.registry import QUERIES

    docs = _load_docs()
    gold = {d: g for d, g, _ in docs}
    rows = QUERIES["data_dawid_skene"](spark, SF_TINY).collect()
    n = len(rows)
    mv_acc = sum(r["mv_label"] == gold[r["doc_id"]] for r in rows) / n
    ds_acc = sum(r["ds_label"] == gold[r["doc_id"]] for r in rows) / n
    assert ds_acc > mv_acc + 0.02, (ds_acc, mv_acc)
    assert sum(r["changed"] for r in rows) > 0
    # posteriors are valid probabilities above the uniform prior
    assert all(1 / 3 <= r["ds_posterior"] <= 1.0 for r in rows)


def test_rater_quality_matches_mirror_and_orders_raters(spark):
    from multiomics_biocypher_kg_spark.registry import QUERIES

    docs = _load_docs()
    _, conf, ntrue = _fit(docs)
    n_docs = len(docs)
    rows = QUERIES["data_rater_quality"](spark, SF_TINY).collect()
    assert len(rows) == len(_WIDTHS) * 9  # full grid, zero cells included
    est_acc = {}
    for r in rows:
        key = (r["rater"], r["true_label"], r["obs_label"])
        n = conf[key]
        assert r["n"] == n
        p = (n + 1) / (ntrue[r["true_label"]] + 3)
        assert abs(r["p_obs_given_true"] - round(p, 6)) < 1e-9
        diag = sum(conf[(r["rater"], c, c)] for c in _CATS)
        assert abs(r["rater_accuracy"] - round(diag / n_docs, 6)) < 1e-9
        est_acc[r["rater"]] = r["rater_accuracy"]
    # careful raters separate from the sloppy tail (adjacent raters
    # may swap — the estimate is vs the MV reference, not gold)
    for r in range(len(_WIDTHS) - 2):
        assert est_acc[r] > est_acc[r + 2], est_acc
