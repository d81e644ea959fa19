"""Contract tests for batch R: one-pass permutation test + BH FDR
(vs a Python replay + the A/A calibration contract), functional-
dependency discovery (vs exact Python distinct counts + the designed
truth pattern), and NB-margin uncertainty sampling (vs the
first-principles NB mirror)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import duckdb

from tests.conftest import SF_TINY

_PERM_K = 64


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_permutation_fdr_matches_python_replay(spark):
    from multiomics_biocypher_kg_spark.registry import QUERIES

    con = duckdb.connect()
    events = con.sql(
        f"""SELECT event_id, event_type,
        CAST(floor(value * 100) AS BIGINT)
        FROM '{SF_TINY}/events.parquet'"""
    ).fetchall()
    by_type: dict[str, list] = {}
    for eid, et, cents in events:
        by_type.setdefault(et, []).append((eid, cents))

    def diff(rows, salt):
        n1 = s1 = n = s = 0
        for eid, cents in rows:
            n += 1
            s += cents
            if _md5_long(f"{eid}#{salt}") % 2 == 1:
                n1 += 1
                s1 += cents
        return s1 / n1 - (s - s1) / (n - n1)

    pvals = {}
    for et, rows in by_type.items():
        obs = diff(rows, "permobs")
        exceed = sum(
            abs(diff(rows, f"perm{k}")) >= abs(obs) for k in range(_PERM_K)
        )
        pvals[et] = ((1.0 + exceed) / (_PERM_K + 1), obs, len(rows))

    m = len(pvals)
    order = sorted(pvals.items(), key=lambda kv: (kv[1][0], kv[0]))
    qs = {}
    running = 1.0
    for r in range(m, 0, -1):
        et, (p, _, _) = order[r - 1]
        running = min(running, p * m / r)
        qs[et] = min(1.0, running)

    got = QUERIES["ev_permutation_fdr"](spark, SF_TINY).collect()
    assert len(got) == m
    for r in got:
        p, obs, n = pvals[r["event_type"]]
        assert r["n_events"] == n
        assert abs(r["obs_diff"] - round(obs, 6)) < 1e-9
        assert abs(r["p_value"] - round(p, 6)) < 1e-9
        assert abs(r["q_value"] - round(qs[r["event_type"]], 6)) < 1e-9
        assert r["reject"] == (qs[r["event_type"]] <= 0.1)
    # A/A calibration: hash arms are independent of value, so the
    # FDR-controlled family should (with overwhelming probability)
    # reject nothing
    assert sum(r["reject"] for r in got) == 0


def test_fd_discovery_matches_python_and_truth_pattern(spark):
    from multiomics_biocypher_kg_spark.registry import QUERIES
    from multiomics_biocypher_kg_spark.registry_relational import _FD_CANDS

    con = duckdb.connect()
    rows = QUERIES["rel_fd_discovery"](spark, SF_TINY).collect()
    assert len(rows) == len(_FD_CANDS)
    by_fd = {r["fd"]: r for r in rows}
    for table, lhs, rhs in _FD_CANDS:
        data = con.sql(
            f"""SELECT {', '.join(lhs)}, {rhs}
            FROM '{SF_TINY}/{table}.parquet'"""
        ).fetchall()
        n_lhs = len({t[:-1] for t in data})
        n_pairs = len(set(data))
        r = by_fd[f"{table}: {','.join(lhs)} -> {rhs}"]
        assert r["n_lhs"] == n_lhs and r["n_pairs"] == n_pairs
        assert r["holds"] == (n_lhs == n_pairs)
        assert abs(
            r["violation_ratio"] - round((n_pairs - n_lhs) / n_pairs, 6)
        ) < 1e-9
    # designed truth pattern: the key FDs hold, the refutables fail
    assert by_fd["nation: n_nationkey -> n_regionkey"]["holds"]
    assert by_fd["orders: o_orderkey -> o_orderstatus"]["holds"]
    assert by_fd["part: p_partkey -> p_brand"]["holds"]
    assert not by_fd["nation: n_regionkey -> n_nationkey"]["holds"]
    assert not by_fd["lineitem: l_orderkey -> l_returnflag"]["holds"]
    # the "assumed PK" that is NOT a key in this feed
    assert not by_fd["lineitem: l_orderkey,l_linenumber -> l_partkey"]["holds"]


def test_uncertainty_sample_matches_nb_mirror(spark):
    """Recompute the NB margins from first principles (the
    test_nb_langid mirror) and pin the selected batch: rank-1 minus
    rank-2 ROUNDED scores, bottom-20 margin-asc."""
    from multiomics_biocypher_kg_spark.registry import QUERIES

    LANGS = ["en", "de", "fr", "es", "zh"]
    rows = (
        spark.read.parquet(f"{SF_TINY}/documents.parquet")
        .select("doc_id", "lang", "text")
        .collect()
    )
    aug = {}
    for r in rows:
        t = r["text"] + f" qqm{r['lang']}" * (1 + r["doc_id"] % 3)
        if r["doc_id"] % 4 == 0:
            t += " qqm" + LANGS[r["doc_id"] % 5]
        aug[r["doc_id"]] = (r["lang"], t)
    counts: Counter = Counter()
    totals: Counter = Counter()
    priors: Counter = Counter()
    vocab = set()
    for doc_id, (lang, t) in aug.items():
        if doc_id % 5 == 0:
            continue
        priors[lang] += 1
        for tok in t.split(" "):
            counts[(lang, tok)] += 1
            totals[lang] += 1
            vocab.add(tok)
    V, D = len(vocab), sum(priors.values())
    margins = []
    for doc_id, (gold, t) in aug.items():
        if doc_id % 5 != 0:
            continue
        toks = Counter(t.split(" "))
        nl = sum(toks.values())
        scored = []
        for lang in sorted(priors):
            hit = sum(
                c * math.log(counts[(lang, tok)] + 1)
                for tok, c in toks.items()
                if (lang, tok) in counts
            )
            score = (
                hit
                - nl * math.log(totals[lang] + V)
                + math.log(priors[lang] / D)
            )
            scored.append((-round(score, 6), lang))
        scored.sort()
        margin = scored[1][0] - scored[0][0]  # rounded rank1 - rank2
        margins.append((margin, doc_id, gold, scored[0][1]))
    margins.sort()
    expected = [
        (rank + 1, doc_id, gold, pred, round(margin, 6))
        for rank, (margin, doc_id, gold, pred) in enumerate(margins[:20])
    ]

    got = [
        (r["sample_rank"], r["doc_id"], r["gold"], r["pred"], r["margin"])
        for r in QUERIES["data_uncertainty_sample"](spark, SF_TINY).collect()
    ]
    assert sorted(got) == expected
    # margins are nonnegative and the batch is genuinely uncertain:
    # strictly smaller than the corpus-median margin
    all_margins = sorted(m for m, _, _, _ in margins)
    med = all_margins[len(all_margins) // 2]
    assert all(0.0 <= m <= med for _, _, _, _, m in got)
