"""Contract tests for BPE application, daily-volume autocorrelation,
and the KG completeness profile."""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

from tests.conftest import SF_TINY


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_bpe_apply_matches_python_tokenizer_replay(spark):
    """Train the same 4 merges in pure Python (max freq, lex-least
    tiebreak), apply them to every word, and pin per-doc token
    counts, fertility, and compression; fertility must sit in
    [1, word length] and compression >= 1."""
    from multiomics_biocypher_kg_spark.registry import QUERIES
    from multiomics_biocypher_kg_spark.registry_pretrain import _BPE_ROUNDS

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    wc = defaultdict(int)
    for r in docs:
        for w in r["text"].split(" "):
            if re.fullmatch(r"[a-z]{2,}", w):
                wc[w] += 1
    segs = {w: list(w) for w in wc}
    for _ in range(_BPE_ROUNDS):
        freq = defaultdict(int)
        for w, syms in segs.items():
            for a, b in zip(syms, syms[1:]):
                freq[f"{a}|{b}"] += wc[w]
        best = max(freq.items(), key=lambda kv: (kv[1], [-ord(c) for c in kv[0]]))
        # tiebreak: max freq then lexicographically LEAST pair
        best_pair = min(
            (p for p, f in freq.items() if f == best[1])
        )
        la, rb = best_pair.split("|")
        for w, syms in segs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == la and syms[i + 1] == rb:
                    out.append(la + rb)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[w] = out
    n_sym = {w: len(s) for w, s in segs.items()}

    expect = {}
    for r in docs:
        toks = [w for w in r["text"].split(" ") if w in n_sym]
        if not toks:
            continue
        t_bpe = sum(n_sym[w] for w in toks)
        t_chars = sum(len(w) for w in toks)
        expect[r["doc_id"]] = (len(toks), t_bpe, t_chars)
    got = {r["doc_id"]: r for r in QUERIES["text_bpe_apply"](spark, SF_TINY).collect()}
    assert set(got) == set(expect)
    for did, (nw, tb, tc) in expect.items():
        r = got[did]
        assert r["n_alpha_words"] == nw
        assert r["n_tokens_bpe"] == tb
        assert r["n_chars"] == tc
        assert abs(r["fertility"] - round(tb / nw, 6)) < 1e-9
        assert abs(r["compression"] - round(tc / tb, 6)) < 1e-9
        assert 1.0 <= r["fertility"]
        assert r["compression"] >= 1.0


def test_autocorrelation_mirror_and_planted_period(spark):
    """Per-(type, lag) ACF must equal numpy corrcoef over the lag
    pairs; a planted period-2 series shows acf(2) ~ 1 and
    acf(1) < 0."""
    import datetime as dt
    import tempfile

    import numpy as np

    from multiomics_biocypher_kg_spark.registry import QUERIES
    from multiomics_biocypher_kg_spark.registry_relational import _ACF_MAX_LAG

    ev = spark.read.parquet(f"{SF_TINY}/events.parquet").select(
        "event_type", "ts"
    ).collect()
    daily = defaultdict(int)
    for r in ev:
        daily[(r["event_type"], r["ts"].strftime("%Y-%m-%d"))] += 1
    series = defaultdict(list)
    for (t, d), c in sorted(daily.items()):
        series[t].append(c)
    got = {
        (r["event_type"], r["lag"]): r
        for r in QUERIES["ev_autocorrelation"](spark, SF_TINY).collect()
    }
    n_rows = 0
    for t, cs in series.items():
        for k in range(1, _ACF_MAX_LAG + 1):
            if len(cs) <= k:
                continue
            n_rows += 1
            x = np.array(cs[k:], dtype=float)
            y = np.array(cs[:-k], dtype=float)
            r = got[(t, k)]
            assert r["n_pairs"] == len(x)
            if x.std() == 0 or y.std() == 0:
                assert r["acf"] == 0.0
            else:
                assert abs(r["acf"] - np.corrcoef(x, y)[0, 1]) < 1e-5
    assert len(got) == n_rows

    base = dt.datetime(2024, 7, 1)
    rows, eid = [], 0
    for d in range(20):
        for _ in range(10 if d % 2 == 0 else 2):
            rows.append((eid, base + dt.timedelta(days=d), 1, "period2", 0.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(f"{td}/events.parquet")
        planted = {
            r["lag"]: r["acf"]
            for r in QUERIES["ev_autocorrelation"](spark, td).collect()
        }
    assert planted[2] > 0.99
    assert planted[1] < -0.9


def test_completeness_profile_matches_python_mirror(spark):
    """Grid coverage must equal a Python recount; the grid is
    complete (every bucket x predicate cell, zeros included)."""
    from multiomics_biocypher_kg_spark.registry import QUERIES
    from multiomics_biocypher_kg_spark.registry_kg_embed import (
        _COMPLETENESS_BUCKETS,
    )

    trip = QUERIES["kg_triples"](spark, SF_TINY).select("subj", "pred").collect()
    ents = {r["subj"] for r in trip}
    cls = {e: f"c{_md5_long(e) % _COMPLETENESS_BUCKETS}" for e in ents}
    cls_n = defaultdict(int)
    for e in ents:
        cls_n[cls[e]] += 1
    preds = {r["pred"] for r in trip}
    with_p = defaultdict(set)
    for r in trip:
        with_p[(cls[r["subj"]], r["pred"])].add(r["subj"])
    got = {
        (r["cls"], r["pred"]): r
        for r in QUERIES["kg_completeness_profile"](spark, SF_TINY).collect()
    }
    assert set(got) == {(c, p) for c in cls_n for p in preds}
    for (c, p), r in got.items():
        nw = len(with_p.get((c, p), set()))
        assert r["n_entities"] == cls_n[c]
        assert r["n_with_pred"] == nw
        # engines round half-up, Python rounds half-even (61/128 hits
        # the boundary exactly) — compare unrounded with 1e-6 tol
        assert abs(r["coverage"] - nw / cls_n[c]) < 1.1e-6
        assert 0.0 <= r["coverage"] <= 1.0
