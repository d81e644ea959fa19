"""Contract tests for B-cubed dedup evaluation, the dedup savings
report, and the quantization retrieval-impact eval."""

from __future__ import annotations

from collections import defaultdict

from tests.conftest import SF_TINY


def test_bcubed_matches_python_union_find(spark):
    """B³ values must equal a pure-Python union-find + per-item
    average over the same pairs and gold; both sit in (0, 1]."""
    from multiomics_biocypher_kg_spark.registry import QUERIES
    from multiomics_biocypher_kg_spark.registry_dedup_text import _dedup_corpus

    items = [r["doc_id"] for r in _dedup_corpus(spark, SF_TINY).select("doc_id").collect()]
    pairs = [
        (r["id_a"], r["id_b"])
        for r in QUERIES["dedup_minhash_lsh"](spark, SF_TINY).collect()
    ]
    parent = {i: i for i in items}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    pred = {i: find(i) for i in items}
    gold = {i: i % 1000000 for i in items}
    pc = defaultdict(int)
    gc = defaultdict(int)
    cell = defaultdict(int)
    for i in items:
        pc[pred[i]] += 1
        gc[gold[i]] += 1
        cell[(pred[i], gold[i])] += 1
    n = len(items)
    bp = sum(c * c / pc[p] for (p, g), c in cell.items()) / n
    br = sum(c * c / gc[g] for (p, g), c in cell.items()) / n
    r = QUERIES["dedup_bcubed_eval"](spark, SF_TINY).collect()[0]
    assert r["n_items"] == n
    assert r["n_pred_clusters"] == len(pc)
    assert r["n_gold_clusters"] == len(gc)
    assert abs(r["bcubed_precision"] - bp) < 1e-5
    assert abs(r["bcubed_recall"] - br) < 1e-5
    assert abs(r["bcubed_f1"] - 2 * bp * br / (bp + br)) < 1e-5
    assert 0 < bp <= 1 and 0 < br <= 1


def test_savings_report_matches_python_recount(spark):
    """Per-lang byte savings must equal a Python recount; exact
    twins drive savings (identical text), near twins do not."""
    from multiomics_biocypher_kg_spark.registry import QUERIES

    docs = {
        r["doc_id"]: (r["text"], r["lang"])
        for r in spark.read.parquet(f"{SF_TINY}/documents.parquet").collect()
    }
    corpus = {}
    for d, (t, lang) in docs.items():
        corpus[d] = (t, lang)
        if d % 4 == 0:
            toks = t.split(" ")
            corpus[d + 1000000] = (
                " ".join(x for i, x in enumerate(toks) if i % 10 != 9),
                lang,
            )
        if d % 5 == 0:
            corpus[d + 2000000] = (t, lang)
    groups = defaultdict(list)
    for d, (t, lang) in corpus.items():
        groups[(lang, t)].append(d)
    per_lang = defaultdict(lambda: [0, 0, 0, 0, 0])
    for (lang, t), members in groups.items():
        st = per_lang[lang]
        st[0] += 1
        st[1] += len(members)
        st[2] += len(members) - 1 if len(members) > 1 else 0
        st[3] += len(members) * len(t)
        st[4] += (len(members) - 1) * len(t) if len(members) > 1 else 0
    got = {r["lang"]: r for r in QUERIES["dedup_savings_report"](spark, SF_TINY).collect()}
    assert set(got) == set(per_lang)
    total_saved = 0
    for lang, (ng, nr, nd, bt, bs) in per_lang.items():
        r = got[lang]
        assert r["n_groups"] == ng
        assert r["n_rows"] == nr
        assert r["n_dup_rows"] == nd
        assert r["bytes_total"] == bt
        assert r["bytes_saved"] == bs
        assert abs(r["savings_pct"] - bs / bt) < 1.1e-6
        total_saved += bs
    assert total_saved > 0  # the exact twins guarantee real savings


def test_quantization_recall_matches_numpy_mirror(spark):
    """Per-query overlap must equal a numpy replay with the same
    rounded-cosine / neighbor-asc tiebreaks; mean recall stays well
    above chance."""
    import numpy as np

    from multiomics_biocypher_kg_spark.registry import QUERIES

    rows = spark.read.parquet(f"{SF_TINY}/embeddings.parquet").collect()
    ids = [r["vec_id"] for r in rows]
    V = np.array([[float(x) for x in r["embedding"]] for r in rows])

    def top5(M):
        norm = np.sqrt((M * M).sum(axis=1))
        out = {}
        for qi, q in enumerate(ids):
            if q >= 10:
                continue
            cos = (M @ M[qi]) / (norm * norm[qi])
            cand = sorted(
                (
                    (round(float(cos[j]), 6), ids[j])
                    for j in range(len(ids))
                    if ids[j] != q
                ),
                key=lambda kv: (-kv[0], kv[1]),
            )[:5]
            out[q] = {nid for _, nid in cand}
        return out

    s = np.abs(V).max(axis=1, keepdims=True) / 127
    deq = np.where(s == 0, V, np.floor(V / np.where(s == 0, 1, s) + 0.5) * s)
    tf, tq = top5(V), top5(deq)
    got = {r["query_id"]: r for r in QUERIES["emb_quantization_recall"](spark, SF_TINY).collect()}
    assert set(got) == set(tf)
    recalls = []
    for q in tf:
        ov = len(tf[q] & tq[q])
        assert got[q]["n_overlap"] == ov
        assert abs(got[q]["recall_at_5"] - ov / 5) < 1.1e-6
        recalls.append(ov / 5)
    assert sum(recalls) / len(recalls) > 0.5
