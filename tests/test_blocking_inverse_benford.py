"""Contract tests for blocking recall, inverse-predicate discovery,
and the Benford first-digit audit."""

from __future__ import annotations

import math
from collections import defaultdict

from tests.conftest import SF_TINY


def test_blocking_recall_matches_python_replay(spark):
    """Recall per kind must equal a pure-Python replay of the
    corpus-twin construction and blocking key; exact twins always
    co-block (recall 1.0)."""
    from multiomics_biocypher_kg_spark.registry import QUERIES

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_TINY}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    corpus = dict(docs)
    for d, t in docs.items():
        if d % 4 == 0:
            toks = t.split(" ")
            corpus[d + 1000000] = " ".join(
                x for i, x in enumerate(toks) if i % 10 != 9
            )
        if d % 5 == 0:
            corpus[d + 2000000] = t

    def key(t):
        toks = t.split(" ")
        return f"{toks[0]}|{len(toks) // 8}"

    keys = {d: key(t) for d, t in corpus.items()}
    gold = []
    for d in docs:
        if d % 5 == 0:
            gold.append((d, d + 2000000, "exact"))
        if d % 4 == 0:
            gold.append((d, d + 1000000, "near"))
        if d % 20 == 0:
            gold.append((d + 1000000, d + 2000000, "cross"))
    per = defaultdict(lambda: [0, 0])
    for a, b, k in gold:
        per[k][0] += 1
        per["all"][0] += 1
        if keys[a] == keys[b]:
            per[k][1] += 1
            per["all"][1] += 1
    got = {r["kind"]: r for r in QUERIES["data_blocking_recall"](spark, SF_TINY).collect()}
    assert set(got) == set(per)
    for k, (n, hit) in per.items():
        r = got[k]
        assert r["n_gold"] == n
        assert r["n_coblocked"] == hit
        assert abs(r["recall"] - round(hit / n, 6)) < 1.1e-6
    assert got["exact"]["recall"] == 1.0


def test_inverse_discovery_matches_python_mirror(spark):
    """The full predicate-pair grid must equal a Python recount; the
    diagonal agrees with kg_symmetry_audit's counts."""
    from multiomics_biocypher_kg_spark.registry import QUERIES

    trip = {
        (r["subj"], r["pred"], r["obj"])
        for r in QUERIES["kg_triples"](spark, SF_TINY)
        .select("subj", "pred", "obj")
        .collect()
        if r["subj"] != r["obj"]
    }
    pn = defaultdict(int)
    for s, p, o in trip:
        pn[p] += 1
    ov = defaultdict(int)
    for s, p, o in trip:
        for q in pn:
            if (o, q, s) in trip:
                ov[(p, q)] += 1
    got = {
        (r["pred_a"], r["pred_b"]): r
        for r in QUERIES["kg_inverse_discovery"](spark, SF_TINY).collect()
    }
    assert set(got) == {(a, b) for a in pn for b in pn}
    for (a, b), r in got.items():
        n_ov = ov.get((a, b), 0)
        assert r["n_a"] == pn[a]
        assert r["n_overlap"] == n_ov
        assert abs(r["inverse_ratio"] - n_ov / pn[a]) < 1.1e-6
        assert r["is_inverse_candidate"] == (n_ov >= 10 and n_ov / pn[a] >= 0.95)
    sym = {
        r["pred"]: r
        for r in QUERIES["kg_symmetry_audit"](spark, SF_TINY).collect()
    }
    for p in pn:
        assert got[(p, p)]["n_overlap"] == sym[p]["n_symmetric"]


def test_benford_audit_matches_python_recount(spark):
    """Digit counts must equal a Python recount of integer-cents
    leading digits; shares sum to 1 per type; the Benford constants
    are the canonical log10(1 + 1/d)."""
    from multiomics_biocypher_kg_spark.registry import QUERIES

    ev = spark.read.parquet(f"{SF_TINY}/events.parquet").select(
        "event_type", "value"
    ).collect()
    obs = defaultdict(lambda: defaultdict(int))
    for r in ev:
        if r["value"] > 0:
            cents = int(round(r["value"] * 100))
            obs[r["event_type"]][int(str(cents)[0])] += 1
    got = {
        (r["event_type"], r["digit"]): r
        for r in QUERIES["ev_benford_audit"](spark, SF_TINY).collect()
    }
    assert set(got) == {(t, d) for t in obs for d in range(1, 10)}
    for t, digits in obs.items():
        n = sum(digits.values())
        share_sum = 0.0
        for d in range(1, 10):
            r = got[(t, d)]
            c = digits.get(d, 0)
            bshare = math.log10(1 + 1 / d)
            assert r["n_obs"] == c
            assert abs(r["obs_share"] - c / n) < 1.1e-6
            assert abs(r["benford_share"] - bshare) < 1.1e-6
            assert abs(r["expected"] - n * bshare) < 1e-4
            assert r["chi2_contrib"] >= 0
            share_sum += r["obs_share"]
        assert abs(share_sum - 1.0) < 1e-4
