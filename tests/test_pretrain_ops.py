"""Tests for the registry_pretrain batch beyond the oracle sweep
(which value-gates all five queries at sf0.001 automatically):
html-synthesis SQL-twin byte parity, BPE merge-semantics unit
checks, and physical-plan guards for the 100 TB shapes."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.oracle_fragments import HTML_SQL
from multiomics_biocypher_kg_spark.registry import QUERIES
from multiomics_biocypher_kg_spark.sources.pages import pages_from_documents
from tests.conftest import SF_TINY


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_html_sql_twin_byte_identical(spark):
    """The DuckDB HTML_SQL fragment reproduces the Spark page
    synthesizer byte-for-byte on every page (md5 over the html
    bytes) — any html-bytes-based oracle is exactly as trustworthy
    as the synthesis parity itself."""
    got = {
        r["doc_id"]: r["h"]
        for r in pages_from_documents(spark, SF_TINY)
        .select("doc_id", F.md5(F.col("html")).alias("h"))
        .collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_TINY}/documents.parquet'"
    )
    want = dict(
        con.execute(
            f"SELECT doc_id, md5({HTML_SQL}) FROM documents"
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_bpe_merge_replace_semantics(spark):
    """The '(sym)'-wrapped replace implements exact BPE merge
    application: boundary-anchored (no match inside a larger
    symbol) and left-to-right greedy with consecutive merges."""
    rows = spark.createDataFrame(
        [("(a)(a)(a)(a)",), ("(ab)(c)",), ("(b)(c)(b)(c)",)], "seg string"
    )
    out = [
        r["m"]
        for r in rows.select(
            F.expr("replace(seg, '(b)(c)', '(bc)')").alias("m")
        ).collect()
    ]
    assert out == ["(a)(a)(a)(a)", "(ab)(c)", "(bc)(bc)"]
    out2 = [
        r["m"]
        for r in rows.select(
            F.expr("replace(seg, '(a)(a)', '(aa)')").alias("m")
        ).collect()
    ]
    assert out2[0] == "(aa)(aa)"  # consecutive merges, no delimiter sharing


def test_bpe_train_monotone_and_consistent(spark):
    """Merge freqs are non-increasing across rounds ONLY within equal
    pair-structures is not guaranteed in general BPE, but the first
    merge must be the global best pair: its freq bounds every later
    round's freq from above."""
    df = QUERIES["text_bpe_train"](spark, SF_TINY).collect()
    assert len(df) == 4
    by_rank = sorted(df, key=lambda r: r["merge_rank"])
    assert all(r["merged"] == r["left_sym"] + r["right_sym"] for r in by_rank)
    assert by_rank[0]["freq"] == max(r["freq"] for r in by_rank)


def test_main_density_plan_is_scan_projection_only(spark):
    """web_main_density must be a pure scan projection — the gate
    runs inside the extraction scan at any corpus size. The ONLY
    permitted exchange is the pages_from_documents seed-scan
    rebalance (REPARTITION_BY_NUM, a no-op on real multi-split
    corpora); the query itself must introduce no shuffle."""
    plan = _plan(QUERIES["web_main_density"](spark, SF_TINY))
    for line in plan.splitlines():
        if "Exchange" in line and "ReusedExchange" not in line:
            assert "REPARTITION" in line, line
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_skipgram_no_cartesian(spark):
    """kg_skipgram_pairs joins positions WITHIN a walk (equi-join on
    the walk id) — never a cartesian across walks."""
    plan = _plan(QUERIES["kg_skipgram_pairs"](spark, SF_TINY))
    assert "CartesianProduct" not in plan


def test_bitext_windows_partitioned(spark):
    """Every window in data_bitext_mine is partitioned by an
    endpoint id — no global (unpartitioned) sort of the pair table.
    The physical plan therefore contains hashpartitioning exchanges
    but no SinglePartition window exchange."""
    plan = _plan(QUERIES["data_bitext_mine"](spark, SF_TINY))
    assert "Window" in plan
    assert "Exchange SinglePartition" not in plan


def test_snapshot_asof_rows_subset_of_history(spark):
    """Every as-of row must be a version row whose interval contains
    T, exactly one per url with any version at or before T."""
    from multiomics_biocypher_kg_spark.registry_scale_ops import (
        web_scd2_history,
    )

    asof = QUERIES["kg_snapshot_asof"](spark, SF_TINY).collect()
    t = asof[0]["asof_ts"]
    hist = web_scd2_history(spark, SF_TINY).collect()
    urls_with_version = {
        h["url"] for h in hist if h["valid_from"] <= t
    }
    assert {r["url"] for r in asof} == urls_with_version
    assert len({r["url"] for r in asof}) == len(asof)  # one row per url
    hkey = {(h["url"], h["content_md5"]) for h in hist}
    assert all((r["url"], r["content_md5"]) in hkey for r in asof)


def test_rule_mining_metric_identities(spark):
    """confidence = support/body_size, head_coverage =
    support/head_size, support <= min(body_size, head_size), and the
    hosts∘mentions => (nothing) style sanity: every emitted rule
    meets the min-support bar."""
    rows = QUERIES["kg_rule_mining"](spark, SF_TINY).collect()
    assert rows, "at least one rule must clear min support"
    for r in rows:
        assert r["support"] >= 5
        assert r["support"] <= r["body_size"]
        assert r["support"] <= r["head_size"]
        assert abs(r["confidence"] - round(r["support"] / r["body_size"], 6)) < 1e-9
        assert (
            abs(r["head_coverage"] - round(r["support"] / r["head_size"], 6))
            < 1e-9
        )


def test_truth_discovery_winner_properties(spark):
    """One winner per entity; its trust-weighted score is positive;
    n_values counts the entity's distinct claimed values and the
    winner's supporter count never exceeds the claim pool."""
    rows = QUERIES["kg_truth_discovery"](spark, SF_TINY).collect()
    assert rows
    ents = [r["entity_id"] for r in rows]
    assert len(ents) == len(set(ents))
    for r in rows:
        assert r["score"] > 0
        assert r["n_values"] >= 1
        assert r["n_sources"] >= 1


def test_dedup_eval_exact_recall_is_one(spark):
    """Exact twins share every shingle, so MinHash-LSH recall on the
    'exact' kind must be 1.0 — if it is not, the detector (not the
    eval) broke; the overall row's tp must reconcile with the
    per-kind rows."""
    rows = {r["kind"]: r for r in QUERIES["dedup_eval_pr"](spark, SF_TINY).collect()}
    assert rows["exact"]["recall"] == 1.0
    assert rows["all"]["tp"] == sum(
        rows[k]["tp"] for k in ("exact", "near", "cross")
    )
    assert 0.0 <= rows["all"]["precision"] <= 1.0


def test_burst_zscores_match_python_moments(spark):
    """z-scores re-derived in Python from the daily counts (integer
    moments, same formula) must match to the rounding; is_burst is
    exactly the z >= 2 predicate."""
    rows = QUERIES["ev_burst_detect"](spark, SF_TINY).collect()
    assert rows
    from collections import defaultdict

    per_type = defaultdict(list)
    for r in rows:
        per_type[r["event_type"]].append(r)
    for t, rs in per_type.items():
        n = len(rs)
        s1 = sum(r["n_events"] for r in rs)
        s2 = sum(r["n_events"] ** 2 for r in rs)
        var_num = float(s2) - float(s1) * s1 / n
        for r in rs:
            if n < 2 or var_num <= 0:
                expect = 0.0
            else:
                expect = round(
                    (r["n_events"] - float(s1) / n)
                    / ((var_num / (n - 1)) ** 0.5),
                    6,
                )
            assert abs(r["z_score"] - expect) < 1e-9, (t, r)
            assert r["is_burst"] == (r["z_score"] >= 2.0)


def test_window_comention_equals_naive_range_join(spark):
    """The banded equi-join must reproduce the naive quadratic
    range self-join exactly (pair set, event counts, doc counts)."""
    from multiomics_biocypher_kg_spark.registry import _pipeline

    got = {
        (r["subj"], r["obj"]): (r["n_events"], r["n_docs"])
        for r in QUERIES["kg_window_comention"](spark, SF_TINY).collect()
    }
    links = (
        _pipeline(spark, SF_TINY)["links"]
        .where(F.col("entity_id").isNotNull())
        .select("doc_id", "pos", "entity_id")
        .distinct()
        .collect()
    )
    from collections import defaultdict

    by_doc = defaultdict(list)
    for r in links:
        by_doc[r["doc_id"]].append((r["pos"], r["entity_id"]))
    events = defaultdict(int)
    docs = defaultdict(set)
    for doc_id, ms in by_doc.items():
        for i, (pa, ea) in enumerate(ms):
            for pb, eb in ms:
                if ea < eb and abs(pa - pb) <= 8:
                    events[(ea, eb)] += 1
                    docs[(ea, eb)].add(doc_id)
    expect = {k: (v, len(docs[k])) for k, v in events.items()}
    assert got == expect


def test_retention_cohort_identities(spark):
    """Offset 0 is always retention 1.0 (the cohort IS the day-0
    active set); retention in (0,1]; n_active <= cohort_size; every
    (cohort, offset) cell unique; cohort sizes partition the user
    base."""
    rows = QUERIES["ev_retention_cohorts"](spark, SF_TINY).collect()
    assert rows
    cells = {(r["cohort_day"], r["day_offset"]) for r in rows}
    assert len(cells) == len(rows)
    zero = [r for r in rows if r["day_offset"] == 0]
    assert zero and all(r["retention"] == 1.0 for r in zero)
    for r in rows:
        assert 0 < r["n_active"] <= r["cohort_size"]
        assert r["day_offset"] >= 0
    ev = spark.read.parquet(f"{SF_TINY}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["cohort_size"] for r in zero) == n_users


def test_nb_langid_matches_python_mirror(spark):
    """text_nb_langid's trained-NB holdout report must pin against a
    pure-Python mirror built from first principles: the same marker
    augmentation, add-1-smoothed per-language token likelihoods
    trained on the doc_id%5!=0 split, and argmax by (round(score,6),
    lang) on the held-out docs — per-language rows AND the overall
    row. Also asserts the classifier genuinely beats the majority
    prior (i.e. it LEARNED, not just memorized class frequencies)."""
    import math
    from collections import Counter, defaultdict

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
    counts = Counter()
    totals = Counter()
    priors = Counter()
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
    per = defaultdict(lambda: [0, 0])
    for doc_id, (gold, t) in aug.items():
        if doc_id % 5 != 0:
            continue
        toks = Counter(t.split(" "))
        nl = sum(toks.values())
        best = None
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
            key = (-round(score, 6), lang)
            if best is None or key < best[0]:
                best = (key, lang)
        per[gold][0] += 1
        per[gold][1] += 1 if best[1] == gold else 0
    expect = {
        lang: (n, c, round(c / n, 6)) for lang, (n, c) in per.items()
    }
    tn = sum(n for n, _ in per.values())
    tc = sum(c for _, c in per.values())
    expect["all"] = (tn, tc, round(tc / tn, 6))
    got = {
        r["lang"]: (r["n_docs"], r["n_correct"], r["accuracy"])
        for r in QUERIES["text_nb_langid"](spark, SF_TINY).collect()
    }
    assert got == expect
    majority = max(per.values(), key=lambda v: v[0])[0] / tn
    assert got["all"][2] > majority + 0.2  # learned, not the prior
