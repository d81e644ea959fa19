"""Contract tests for trigram novelty, the predicate cardinality
profile, and the per-dimension embedding variance audit."""

from __future__ import annotations

from collections import defaultdict

from tests.conftest import SF_TINY


def test_ngram_novelty_matches_python_mirror(spark):
    """Per-doc novel-trigram counts must equal a pure-Python replay;
    the earliest document is 100% novel and the novel counts sum to
    the gram-dictionary size."""
    from multiomics_biocypher_kg_spark.registry import QUERIES

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    per_doc = {}
    for r in docs:
        toks = r["text"].split(" ")
        if len(toks) >= 3:
            per_doc[r["doc_id"]] = {
                " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            }
    first = {}
    for did in sorted(per_doc):
        for g in per_doc[did]:
            first.setdefault(g, did)
    got = {r["doc_id"]: r for r in QUERIES["text_ngram_novelty"](spark, SF_TINY).collect()}
    assert set(got) == set(per_doc)
    total_novel = 0
    for did, grams in per_doc.items():
        novel = sum(1 for g in grams if first[g] == did)
        r = got[did]
        assert r["n_grams"] == len(grams)
        assert r["n_novel"] == novel
        assert abs(r["novelty_ratio"] - round(novel / len(grams), 6)) < 1e-9
        total_novel += novel
    assert total_novel == len(first)
    assert got[min(per_doc)]["novelty_ratio"] == 1.0


def test_cardinality_profile_matches_python_mirror(spark):
    """Fan-out/fan-in stats and functionality verdicts must equal a
    Python recount over the collected distinct triples."""
    from multiomics_biocypher_kg_spark.registry import QUERIES

    trip = {
        (r["subj"], r["pred"], r["obj"])
        for r in QUERIES["kg_triples"](spark, SF_TINY)
        .select("subj", "pred", "obj")
        .collect()
    }
    out_c = defaultdict(lambda: defaultdict(int))
    in_c = defaultdict(lambda: defaultdict(int))
    for s, p, o in trip:
        out_c[p][s] += 1
        in_c[p][o] += 1
    got = {
        r["pred"]: r
        for r in QUERIES["kg_cardinality_profile"](spark, SF_TINY).collect()
    }
    assert set(got) == set(out_c)
    for p in out_c:
        n = sum(out_c[p].values())
        r = got[p]
        assert r["n_triples"] == n
        assert r["n_subjects"] == len(out_c[p])
        assert r["n_objects"] == len(in_c[p])
        assert r["max_out"] == max(out_c[p].values())
        assert r["max_in"] == max(in_c[p].values())
        assert abs(r["avg_out"] - round(n / len(out_c[p]), 6)) < 1e-9
        assert abs(r["avg_in"] - round(n / len(in_c[p]), 6)) < 1e-9
        assert r["is_functional"] == (max(out_c[p].values()) == 1)
        assert r["is_inverse_functional"] == (max(in_c[p].values()) == 1)


def test_dim_variance_matches_numpy_mirror(spark):
    """Per-dim mean/variance must equal numpy (ddof=1); shares sum
    to 1 and the dominance flag follows the 2/d rule."""
    import numpy as np

    from multiomics_biocypher_kg_spark.registry import QUERIES

    vecs = np.array(
        [
            [float(x) for x in r["embedding"]]
            for r in spark.read.parquet(f"{SF_TINY}/embeddings.parquet").collect()
        ]
    )
    means = vecs.mean(axis=0)
    vars_ = vecs.var(axis=0, ddof=1)
    tv = vars_.sum()
    d = vecs.shape[1]
    got = {r["dim"]: r for r in QUERIES["emb_dim_variance"](spark, SF_TINY).collect()}
    assert set(got) == set(range(1, d + 1))
    for j in range(d):
        r = got[j + 1]
        assert abs(r["mean"] - means[j]) < 1e-5
        assert abs(r["variance"] - vars_[j]) < 1e-5
        assert abs(r["var_share"] - vars_[j] / tv) < 1e-5
        assert r["is_dominant"] == bool(vars_[j] / tv > 2.0 / d)
    assert abs(sum(r["var_share"] for r in got.values()) - 1.0) < 1e-4
