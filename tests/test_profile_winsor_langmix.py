"""Contract tests for the column profiler, winsorized value stats,
and host-language consistency."""

from __future__ import annotations

from collections import defaultdict

from tests.conftest import SF_TINY


def test_profile_columns_matches_pandas_mirror(spark):
    """Every profiled column's counts, min/max, and exact-decimal
    mean must match a pandas recount."""
    from multiomics_biocypher_kg_spark.registry import QUERIES
    from multiomics_biocypher_kg_spark.registry_scale_ops import _PROFILE_COLS

    pdf = spark.read.parquet(f"{SF_TINY}/lineitem.parquet").toPandas()
    got = {
        r["column_name"]: r
        for r in QUERIES["data_profile_columns"](spark, SF_TINY).collect()
    }
    assert set(got) == set(_PROFILE_COLS)
    for c in _PROFILE_COLS:
        s = pdf[c]
        r = got[c]
        assert r["n_rows"] == len(pdf)
        assert r["n_null"] == int(s.isna().sum())
        assert r["n_distinct"] == s.nunique()
        assert abs(r["min_value"] - float(s.min())) < 1e-9
        assert abs(r["max_value"] - float(s.max())) < 1e-9
        assert abs(r["mean_value"] - float(s.mean())) < 1e-5


def test_winsorized_stats_mirror_and_influence_bound(spark):
    """Winsorized means must equal a numpy replay; winsorizing pulls
    the mean toward the middle whenever anything was clamped, and
    n_clamped is ~10% of rows (the 5%+5% tails)."""
    import numpy as np

    from multiomics_biocypher_kg_spark.registry import QUERIES

    ev = spark.read.parquet(f"{SF_TINY}/events.parquet").select(
        "event_type", "value"
    ).collect()
    per = defaultdict(list)
    for r in ev:
        per[r["event_type"]].append(float(r["value"]))
    got = {r["event_type"]: r for r in QUERIES["ev_winsorized_stats"](spark, SF_TINY).collect()}
    assert set(got) == set(per)
    for t, vs in per.items():
        a = np.array(vs)
        p05 = float(np.percentile(a, 5))
        p95 = float(np.percentile(a, 95))
        w = np.clip(a, p05, p95)
        r = got[t]
        assert r["n_events"] == len(vs)
        assert abs(r["mean_raw"] - a.mean()) < 1e-5
        assert abs(r["p05"] - p05) < 1e-5
        assert abs(r["p95"] - p95) < 1e-5
        assert abs(r["mean_winsorized"] - w.mean()) < 1e-5
        assert r["n_clamped"] == int(((a < p05) | (a > p95)).sum())
        if r["n_clamped"]:
            assert 0 < r["n_clamped"] <= 0.11 * len(vs) + 2


def test_lang_consistency_mirror_and_outlier_semantics(spark):
    """Majority language, purity, and outlier flags must equal a
    Python recount; outlier fraction per host equals 1 - purity."""
    from multiomics_biocypher_kg_spark.registry import QUERIES

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet").select(
        "doc_id", "lang"
    ).collect()
    hl = defaultdict(lambda: defaultdict(int))
    for r in docs:
        h = (
            "hot.example.com"
            if r["doc_id"] % 10 < 3
            else f"h{r['doc_id'] % 50}.example.org"
        )
        hl[h][r["lang"]] += 1
    major = {
        h: min(langs.items(), key=lambda kv: (-kv[1], kv[0]))
        for h, langs in hl.items()
    }
    got = {r["doc_id"]: r for r in QUERIES["web_lang_consistency"](spark, SF_TINY).collect()}
    assert len(got) == len(docs)
    outliers = defaultdict(int)
    for r in docs:
        h = (
            "hot.example.com"
            if r["doc_id"] % 10 < 3
            else f"h{r['doc_id'] % 50}.example.org"
        )
        g = got[r["doc_id"]]
        ml, mc = major[h]
        n = sum(hl[h].values())
        assert g["host"] == h
        assert g["major_lang"] == ml
        assert abs(g["host_purity"] - round(mc / n, 6)) < 1.1e-6
        assert g["is_outlier"] == (r["lang"] != ml)
        if g["is_outlier"]:
            outliers[h] += 1
    for h, langs in hl.items():
        n = sum(langs.values())
        _, mc = major[h]
        assert outliers[h] == n - mc
