"""Contract tests for traffic concentration, the Q16-shape supplier
counts, and the standardized type-token ratio."""

from __future__ import annotations

from collections import defaultdict

from tests.conftest import SF_TINY


def test_concentration_matches_numpy_mirror(spark):
    """Shares must equal a numpy percentile replay; the top-1% share
    never exceeds the top-10% share."""
    import numpy as np

    from multiomics_biocypher_kg_spark.registry import QUERIES

    ev = spark.read.parquet(f"{SF_TINY}/events.parquet").select("user_id").collect()
    per = defaultdict(int)
    for r in ev:
        per[r["user_id"]] += 1
    c = np.array(sorted(per.values()), dtype=float)
    p90 = float(np.percentile(c, 90))
    p99 = float(np.percentile(c, 99))
    n_events = int(c.sum())
    r = QUERIES["ev_concentration"](spark, SF_TINY).collect()[0]
    assert r["n_users"] == len(per)
    assert r["n_events"] == n_events
    assert r["n_users_above_p90"] == int((c > p90).sum())
    assert r["n_users_above_p99"] == int((c > p99).sum())
    assert abs(r["share_above_p90"] - c[c > p90].sum() / n_events) < 1e-5
    assert abs(r["share_above_p99"] - c[c > p99].sum() / n_events) < 1e-5
    assert r["share_above_p99"] <= r["share_above_p90"] + 1e-9


def test_supplier_part_counts_matches_python_mirror(spark):
    """Top-20 rows must equal a Python replay of the anti-join +
    distinct-supplier count, in order."""
    from multiomics_biocypher_kg_spark.registry import QUERIES

    bad = {
        r["s_suppkey"]
        for r in spark.read.parquet(f"{SF_TINY}/supplier.parquet").collect()
        if r["s_acctbal"] < 0
    }
    part = {
        r["p_partkey"]: (r["p_brand"], r["p_type"], int(r["p_size"]))
        for r in spark.read.parquet(f"{SF_TINY}/part.parquet").collect()
    }
    fam = defaultdict(set)
    for r in spark.read.parquet(f"{SF_TINY}/lineitem.parquet").select(
        "l_partkey", "l_suppkey"
    ).collect():
        if r["l_suppkey"] not in bad:
            fam[part[r["l_partkey"]]].add(r["l_suppkey"])
    top = sorted(
        ((k, len(v)) for k, v in fam.items()),
        key=lambda kv: (-kv[1], kv[0][0], kv[0][1], kv[0][2]),
    )[:20]
    got = QUERIES["rel_supplier_part_counts"](spark, SF_TINY).collect()
    assert len(got) == min(20, len(top))
    for g, ((brand, typ, size), cnt) in zip(got, top):
        assert (g["brand"], g["type"], g["size"], g["supplier_cnt"]) == (
            brand,
            typ,
            size,
            cnt,
        )


def test_ttr_matches_python_and_flags_planted_spam(spark):
    """STTR must equal a Python replay over the 50-token window; a
    planted 12-word template spam doc flags repetitive, a diverse
    doc does not."""
    import tempfile

    from multiomics_biocypher_kg_spark.registry import QUERIES

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    got = {r["doc_id"]: r for r in QUERIES["text_ttr"](spark, SF_TINY).collect()}
    n_checked = 0
    for r in docs:
        toks = r["text"].split(" ")
        if not toks:
            continue
        win = toks[:50]
        g = got[r["doc_id"]]
        assert g["n_tokens"] == len(toks)
        assert g["window_tokens"] == len(win)
        assert g["window_types"] == len(set(win))
        assert abs(g["sttr"] - round(len(set(win)) / len(win), 6)) < 1.1e-6
        n_checked += 1
    assert n_checked == len(got)

    spam = " ".join((["buy", "cheap", "pills", "now"] * 20)[:60])
    diverse = " ".join(f"w{i}" for i in range(60))
    df = spark.createDataFrame(
        [(1, spam), (2, diverse)], "doc_id long, text string"
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(f"{td}/documents.parquet")
        planted = {r["doc_id"]: r for r in QUERIES["text_ttr"](spark, td).collect()}
    assert planted[1]["is_repetitive"] and planted[1]["window_types"] == 4
    assert not planted[2]["is_repetitive"] and planted[2]["sttr"] == 1.0
