"""Round-4 final batch: gaps-and-islands validity intervals, the
bottom-k (KMV) sketch's merge identity, and spam mass semantics on a
known link farm."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import Window
from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.functions.hashing import md5_long
from multiomics_biocypher_kg_spark.operators.graphstats import (
    validity_intervals,
)

EPOCH0 = 1767225600


def _pages(spark, offsets):
    rows = [
        (i, datetime.fromtimestamp(EPOCH0 + off, tz=timezone.utc))
        for i, off in enumerate(offsets)
    ]
    return spark.createDataFrame(rows, "doc_id long, warc_ts timestamp")


def test_validity_intervals_islands(spark):
    """Observations at +0,1,2 | +10,11 | +20 with gap 4 coalesce into
    exactly three intervals with the right spans and counts — the
    assert/retract/re-assert history temporal_edges collapses."""
    offs = [0, 1, 2, 10, 11, 20]
    pairs = spark.createDataFrame(
        [(i, "ent:a", "ent:b") for i in range(len(offs))],
        "doc_id long, subj string, obj string",
    )
    got = sorted(
        validity_intervals(pairs, _pages(spark, offs), gap_sec=4).collect(),
        key=lambda r: r["interval_seq"],
    )
    assert [
        (r["interval_seq"], r["valid_from_ts"] - EPOCH0,
         r["valid_to_ts"] - EPOCH0, r["n_obs"])
        for r in got
    ] == [(1, 0, 2, 3), (2, 10, 11, 2), (3, 20, 20, 1)]
    assert all(r["pred"] == "co_mentioned_with" for r in got)


def test_validity_intervals_boundary_and_dedup(spark):
    """A gap EXACTLY equal to gap_sec does not split (strictly-greater
    break rule), and duplicate observations of the same triple at the
    same timestamp count once."""
    offs = [0, 4, 4, 20]
    pairs = spark.createDataFrame(
        [(i, "ent:a", "ent:b") for i in range(len(offs))]
        + [(1, "ent:a", "ent:b")],  # duplicate observation, same doc
        "doc_id long, subj string, obj string",
    )
    got = sorted(
        validity_intervals(pairs, _pages(spark, offs), gap_sec=4).collect(),
        key=lambda r: r["interval_seq"],
    )
    # docs 1 and 2 share ts +4 -> one obs; +0 to +4 stays one island
    assert [
        (r["interval_seq"], r["valid_from_ts"] - EPOCH0,
         r["valid_to_ts"] - EPOCH0, r["n_obs"])
        for r in got
    ] == [(1, 0, 4, 2), (2, 20, 20, 1)]


def test_kmv_two_phase_merge_identity(spark):
    """The identity the text_kmv_cardinality plan relies on: the k-th
    smallest hash over per-salt-bucket bottom-k PARTIAL sketches
    equals the k-th smallest over the raw stream (bottom-k of a union
    is the bottom-k of concatenated partials)."""
    k, salts = 16, 4
    items = spark.createDataFrame(
        [(f"tok{i}",) for i in range(500)], "token string"
    ).select("token", md5_long(F.col("token")).alias("u"))
    # single-phase k-th order statistic
    single = (
        items.withColumn(
            "rk", F.row_number().over(Window.orderBy("u", "token"))
        )
        .where(F.col("rk") == k)
        .collect()[0]["u"]
    )
    # two-phase: bottom-k per salt bucket, then k-th over the merge
    salt = F.pmod(md5_long(F.concat(F.col("token"), F.lit("#kmv"))), F.lit(salts))
    wp = Window.partitionBy("salt").orderBy("u", "token")
    partial = (
        items.withColumn("salt", salt)
        .withColumn("rk", F.row_number().over(wp))
        .where(F.col("rk") <= k)
    )
    merged = (
        partial.withColumn(
            "mrk", F.row_number().over(Window.orderBy("u", "token"))
        )
        .where(F.col("mrk") == k)
        .collect()[0]["u"]
    )
    assert merged == single


def test_spam_mass_flags_farm_not_seed(spark):
    """A farm of pages linking only to a spam target inflates its
    PageRank but gives it no trust inflow, so its spam mass is high;
    the trusted seed keeps spam mass low. Thresholding must not flag
    the seed."""
    from multiomics_biocypher_kg_spark.operators.linkgraph import (
        pagerank,
        trustrank,
    )

    edges = [("seed", "good", 1.0), ("good", "seed", 1.0)]
    edges += [(f"farm{i}", "spamtgt", 1.0) for i in range(8)]
    edges += [("spamtgt", f"farm{i}", 1.0) for i in range(8)]
    hg = spark.createDataFrame(edges, "src string, dst string, weight double")
    nodes = (
        hg.select(F.col("src").alias("node"))
        .union(hg.select(F.col("dst").alias("node")))
        .distinct()
    )
    seeds = nodes.where(F.col("node") == "seed")
    pr = {r["node"]: r["rank"] for r in pagerank(hg, iters=5, damping=0.85).collect()}
    tr = {
        r["node"]: r["rank"]
        for r in trustrank(hg, seeds, iters=5, damping=0.85).collect()
    }
    sm = {n: (pr[n] - tr[n]) / pr[n] for n in pr}
    assert sm["spamtgt"] >= 0.5
    assert sm["seed"] < 0.5
    assert all(sm[f"farm{i}"] >= 0.5 for i in range(8))


def test_final_ops_plans(spark):
    """kg_validity_intervals and text_kmv_cardinality window
    PARTITIONED (hash exchange, no rangepartitioning global sort);
    web_spam_mass joins two host-dictionary aggregates with no
    cartesian."""
    from multiomics_biocypher_kg_spark.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    for q in ("kg_validity_intervals", "text_kmv_cardinality"):
        plan = (
            QUERIES[q](spark, sf)._jdf.queryExecution().executedPlan().toString()
        )
        assert "rangepartitioning" not in plan, q
        assert "CartesianProduct" not in plan, q
    plan = (
        QUERIES["web_spam_mass"](spark, sf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# Batched personalized PageRank
# ---------------------------------------------------------------------------


def _barbell(spark):
    """Two triangles joined by one bridge edge (a2 - b0)."""
    und = [
        ("a0", "a1"), ("a1", "a2"), ("a0", "a2"),
        ("b0", "b1"), ("b1", "b2"), ("b0", "b2"),
        ("a2", "b0"),
    ]
    edges = [(s, d, 1.0) for s, d in und] + [(d, s, 1.0) for s, d in und]
    return spark.createDataFrame(
        edges, "src string, dst string, weight double"
    )


def test_ppr_batch_equals_per_seed_runs(spark):
    """The property the batched shape relies on: advancing all seeds
    in ONE loop is exactly the union of independent single-seed
    runs — seed vectors never interact."""
    from multiomics_biocypher_kg_spark.operators.linkgraph import ppr_batch

    hg = _barbell(spark)
    both = spark.createDataFrame([("a0",), ("b2",)], "seed string")
    batched = {
        (r["seed"], r["node"]): round(r["rank"], 12)
        for r in ppr_batch(hg, both, iters=4).collect()
    }
    solo = {}
    for s in ("a0", "b2"):
        one = spark.createDataFrame([(s,)], "seed string")
        for r in ppr_batch(hg, one, iters=4).collect():
            solo[(r["seed"], r["node"])] = round(r["rank"], 12)
    assert batched == solo


def test_ppr_mass_conservation_and_locality(spark):
    """Every seed vector stays a probability distribution (restart +
    dangling mass re-enter at the seed), and a seed's own clique
    outranks the far clique across the bridge."""
    from multiomics_biocypher_kg_spark.operators.linkgraph import ppr_batch

    hg = _barbell(spark)
    seeds = spark.createDataFrame([("a0",), ("b2",)], "seed string")
    rows = ppr_batch(hg, seeds, iters=5).collect()
    mass = {}
    ranks = {}
    for r in rows:
        mass[r["seed"]] = mass.get(r["seed"], 0.0) + r["rank"]
        ranks[(r["seed"], r["node"])] = r["rank"]
    assert all(abs(m - 1.0) < 1e-12 for m in mass.values()), mass
    # locality: from a0, both triangle-mates beat every b-node
    for near in ("a1", "a2"):
        for far in ("b0", "b1", "b2"):
            assert ranks[("a0", near)] > ranks[("a0", far)]


def test_ppr_dangling_seed_keeps_mass(spark):
    """A seed with no out-edges returns all its mass to itself every
    round: rank(s, s) == 1 and no other state rows appear."""
    from multiomics_biocypher_kg_spark.operators.linkgraph import ppr_batch

    hg = spark.createDataFrame(
        [("x", "sink", 1.0)], "src string, dst string, weight double"
    )
    seeds = spark.createDataFrame([("sink",)], "seed string")
    rows = ppr_batch(hg, seeds, iters=3).collect()
    assert len(rows) == 1
    assert rows[0]["node"] == "sink" and abs(rows[0]["rank"] - 1.0) < 1e-12


# ---------------------------------------------------------------------------
# Kneser-Ney bigram LM
# ---------------------------------------------------------------------------


def test_kn_distribution_normalizes(spark):
    """Interpolated KN's defining invariant: for every observed
    prefix w1, p(.|w1) sums to exactly 1 over the continuation
    vocabulary — the discount mass removed equals the backoff weight
    handed to the continuation distribution."""
    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (1, "the dog sat on the log"),
            (2, "a cat and a dog"),
        ],
        "doc_id long, text string",
    )
    bg = []
    for _, text in docs.collect():
        toks = text.split(" ")
        bg += list(zip(toks, toks[1:]))
    from collections import Counter

    D = 0.75
    c12 = Counter(bg)
    c1 = Counter(w1 for w1, _ in bg)
    n1f = Counter(w1 for w1, _ in c12)  # distinct continuations of w1
    nc = Counter(w2 for _, w2 in c12)  # distinct histories of w2
    nt = float(len(c12))
    cont_vocab = set(nc)
    for w1 in c1:
        total = sum(
            max(c12.get((w1, w2), 0) - D, 0.0) / c1[w1]
            + (D * n1f[w1] / c1[w1]) * (nc[w2] / nt)
            for w2 in cont_vocab
        )
        assert abs(total - 1.0) < 1e-12, (w1, total)


def test_kn_operator_matches_hand_formula(spark, tmp_path):
    """text_kn_perplexity on a micro corpus equals the hand-rolled
    KN math to 6 decimals, and the continuation term demonstrably
    diverges from token frequency (the Francisco property)."""
    import math
    from collections import Counter

    import pandas as pd

    from multiomics_biocypher_kg_spark.registry import QUERIES

    rows = [
        (0, "san francisco is in california"),
        (1, "san francisco fog rolls in"),
        (2, "the report is due in march"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    for extra in ["lang", "host"]:
        pdf[extra] = "en" if extra == "lang" else "h"
    sf = str(tmp_path)
    pdf.to_parquet(f"{sf}/documents.parquet")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["kn_bits_per_bigram"])
        for r in QUERIES["text_kn_perplexity"](spark, sf).collect()
    }
    bg_by_doc = {}
    for doc_id, text in rows:
        toks = text.lower().split(" ")
        bg_by_doc[doc_id] = list(zip(toks, toks[1:]))
    allbg = [p for v in bg_by_doc.values() for p in v]
    D = 0.75
    c12, c1 = Counter(allbg), Counter(w1 for w1, _ in allbg)
    types = set(allbg)
    n1f = Counter(w1 for w1, _ in types)
    nc = Counter(w2 for _, w2 in types)
    nt = float(len(types))
    # "francisco" always follows "san": token count 2, but only ONE
    # distinct history -> continuation count 1 (the KN correction)
    assert sum(1 for _, w2 in allbg if w2 == "francisco") == 2
    assert nc["francisco"] == 1
    for doc_id, pairs in bg_by_doc.items():
        bits = [
            -math.log2(
                max(c12[p] - D, 0.0) / c1[p[0]]
                + (D * n1f[p[0]] / c1[p[0]]) * (nc[p[1]] / nt)
            )
            for p in pairs
        ]
        exp = round(sum(bits) / len(bits), 6)
        assert got[doc_id] == (len(pairs), exp), (doc_id, got[doc_id], exp)


# ---------------------------------------------------------------------------
# Batched multi-source BFS / harmonic centrality
# ---------------------------------------------------------------------------


def test_multi_source_distances_chain_and_horizon(spark):
    """Exact hop distances on a directed chain, per source; pairs
    beyond the fixed horizon get NO row (sparse by contract), and
    the min-relaxation picks the shorter of two paths."""
    from multiomics_biocypher_kg_spark.operators.linkgraph import (
        multi_source_distances,
    )

    # chain a->b->c->d->e plus shortcut a->d
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("a", "d")],
        "src string, dst string",
    )
    srcs = spark.createDataFrame([("a",), ("c",)], "s string")
    got = {
        (r["s"], r["node"]): r["dist"]
        for r in multi_source_distances(edges, srcs, rounds=2).collect()
    }
    assert got == {
        ("a", "a"): 0, ("a", "b"): 1, ("a", "c"): 2,
        ("a", "d"): 1,  # shortcut beats the 3-hop chain
        ("a", "e"): 2,  # via the shortcut, inside the horizon
        ("c", "c"): 0, ("c", "d"): 1, ("c", "e"): 2,
    }


# ---------------------------------------------------------------------------
# node2vec transitions
# ---------------------------------------------------------------------------


def test_node2vec_alpha_classes_and_normalization(spark):
    """On a triangle (t, v, x) plus pendant y attached to v, the walk
    t->v sees all three alpha classes: return (t, 1/p), common
    neighbor (x, 1.0), outward (y, 1/q) — and the transition
    probabilities normalize to 1 per (prev, cur)."""
    from collections import defaultdict

    from multiomics_biocypher_kg_spark.operators.graphstats import (
        node2vec_transitions,
    )

    und = [("t", "v"), ("v", "x"), ("x", "t"), ("v", "y")]
    edges = spark.createDataFrame(
        [(s, d, 1.0) for s, d in und] + [(d, s, 1.0) for s, d in und],
        "src string, dst string, w double",
    )
    rows = node2vec_transitions(edges, p=4.0, q=0.25, cap=8).collect()
    tv = {
        r["next_node"]: (r["alpha"], r["prob"])
        for r in rows
        if r["prev_node"] == "t" and r["cur_node"] == "v"
    }
    assert tv["t"][0] == 0.25  # return step: 1/p
    assert tv["x"][0] == 1.0  # (t, x) is an edge
    assert tv["y"][0] == 4.0  # 1/q: y is 2 hops from t
    # unit weights: probs proportional to alpha
    tot = 0.25 + 1.0 + 4.0
    assert tv["t"][1] == round(0.25 / tot, 6)
    assert tv["y"][1] == round(4.0 / tot, 6)
    sums = defaultdict(float)
    for r in rows:
        sums[(r["prev_node"], r["cur_node"])] += r["prob"]
    assert all(abs(s - 1.0) < 1e-5 for s in sums.values()), sums


def test_node2vec_cap_bounds_fanout_not_topology(spark):
    """With cap=2, a hub's wedge fan-out is bounded by its top-2
    neighbors, but the alpha edge-existence test still sees the FULL
    edge set: a capped-away edge (prev, next) must still classify as
    alpha = 1.0, not 1/q."""
    from multiomics_biocypher_kg_spark.operators.graphstats import (
        node2vec_transitions,
    )

    # hub h with neighbors n1..n4 (weights 4,3,2,1), all undirected;
    # plus edge n1 - n3 (weight 1): from prev=n1 at cur=h, n3 is cut
    # by cap=2? no — top-2 of h is {n1, n2}; n3 appears only via the
    # full-set alpha test on wedges that DO survive.
    und = [
        ("h", "n1", 4.0), ("h", "n2", 3.0), ("h", "n3", 2.0),
        ("h", "n4", 1.0), ("n1", "n2", 1.0),
    ]
    edges = spark.createDataFrame(
        [(s, d, w) for s, d, w in und] + [(d, s, w) for s, d, w in und],
        "src string, dst string, w double",
    )
    rows = node2vec_transitions(edges, p=4.0, q=0.25, cap=2).collect()
    from_h = {
        (r["prev_node"], r["next_node"]): r["alpha"]
        for r in rows
        if r["cur_node"] == "h"
    }
    # fan-out from h capped to its top-2 neighbors {n1, n2}
    assert {nxt for _, nxt in from_h} == {"n1", "n2"}
    # (n3, h) wedge survives only if n3's own cap includes h (it
    # does: h is n3's only neighbor); its step to n2 is 2 hops in
    # the full graph -> 1/q, while n1->h->n2 closes a real triangle
    # via the UNCAPPED edge set -> alpha 1.0
    assert from_h[("n3", "n2")] == 4.0
    assert from_h[("n1", "n2")] == 1.0


# ---------------------------------------------------------------------------
# BM25 + positional phrase search
# ---------------------------------------------------------------------------


def _docs_fixture(spark, tmp_path, rows):
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf["lang"] = "en"
    pdf["source"] = "src0"
    pdf["n_chars"] = pdf["text"].str.len()
    pdf.to_parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_bm25_saturation_and_length_normalization(spark, tmp_path):
    """The two properties BM25 has and TF-IDF lacks: (a) tf
    saturation — 10x the term count must NOT give 10x the score;
    (b) length normalization — the same tf in a longer document
    scores lower. Verified against the registry query on a corpus
    engineered so the probe band contains the test term."""
    import math

    from multiomics_biocypher_kg_spark.registry import QUERIES

    # 11 filler terms f0..f10 appear in every doc (df ranks 1..11 by
    # term tiebreak); 'probe' appears in docs 0-2 only -> its df (3)
    # puts it... simpler: make probe share the band by construction:
    # exactly 10 distinct terms have higher df.
    filler = " ".join(f"f{i:02d}" for i in range(5))
    # padding reuses an in-every-doc filler (df rank 1-5, OUTSIDE the
    # rank-6..10 band) so doc 2's extra length adds no band matches
    rows = [
        (0, filler + " probe"),                        # tf=1, short
        (1, filler + " probe" + " probe" * 9),         # tf=10, longer
        (2, filler + " probe" + " f00" * 9),           # tf=1, longer
        (3, filler),
    ]
    sf = _docs_fixture(spark, tmp_path, rows)
    got = {
        r["doc_id"]: r["bm25"]
        for r in QUERIES["text_bm25"](spark, sf).collect()
    }
    # probe has df 3; fillers df 4 -> df ranks: f00..f04 (1-5), then
    # probe+pad band (6..) — probe is inside the rank-6..10 window.
    # (a) saturation: doc1 has 10x doc0's tf but < 4x its per-term
    # contribution is impossible to isolate through the shared
    # filler terms, so compare against the hand formula instead.
    toks = {i: t.split(" ") for i, t in [(r[0], r[1]) for r in rows]}
    dls = {i: len(t) for i, t in toks.items()}
    avgdl = sum(dls.values()) / len(dls)
    n = float(len(rows))
    import collections

    dfc = collections.Counter()
    for t in toks.values():
        dfc.update(set(t))
    ranked = sorted(dfc.items(), key=lambda kv: (-kv[1], kv[0]))
    band = {t for t, _ in ranked[5:10]}
    assert "probe" in band  # the probe term sits in the query band
    k1, b = 1.2, 0.75
    exp = {}
    for i, t in toks.items():
        s = 0.0
        for term in band:
            tf = t.count(term)
            if not tf:
                continue
            idf = math.log(1.0 + (n - dfc[term] + 0.5) / (dfc[term] + 0.5))
            s += idf * (tf * (k1 + 1)) / (
                tf + k1 * (1 - b + b * dls[i] / avgdl)
            )
        if s:
            exp[i] = round(s, 6)
    assert got == exp
    # (a) saturation: 10x the tf at equal length must give FAR less
    # than 10x the score (here docs 1 and 2 have identical length)
    assert got[2] < got[1] < 10 * got[2]
    # (b) length normalization: same tf=1, longer doc scores lower
    assert got[2] < got[0]


def test_phrase_search_adjacency_not_proximity(spark, tmp_path):
    """The positional join must match EXACT adjacency only: a doc
    containing all three phrase words in order but non-adjacent
    contributes nothing; overlapping occurrences each count."""
    from multiomics_biocypher_kg_spark.registry import QUERIES

    # make 'x y z' the top trigram (appears 3x); doc 2 has the words
    # scattered; doc 3 has overlapping 'x y x y z' -> one occurrence
    # of x y z at pos 3.
    rows = [
        (0, "x y z a b"),
        (1, "c x y z d x y z"),
        (2, "x a y b z"),
        (3, "x y x y z"),
    ]
    sf = _docs_fixture(spark, tmp_path, rows)
    got = {
        r["doc_id"]: (r["phrase"], r["n_occurrences"], r["first_pos"])
        for r in QUERIES["text_phrase_search"](spark, sf).collect()
    }
    assert got == {
        0: ("x y z", 1, 1),
        1: ("x y z", 2, 2),
        3: ("x y z", 1, 3),
    }


def test_rendezvous_shards_minimal_move_property(spark, tmp_path):
    """HRW's defining guarantee, checked against a full Python
    mirror of the md5 weights: growing 8 -> 9 shards moves ONLY the
    docs the new shard wins (shard_after == 8 for every moved doc,
    shard_before preserved for every other), and the moved fraction
    is ~1/9 of the corpus — hash-mod sharding would move ~8/9."""
    import hashlib

    from multiomics_biocypher_kg_spark.registry import QUERIES
    from multiomics_biocypher_kg_spark.registry_scale_ops import _HRW_N

    rows = [(i, "t") for i in range(180)]
    sf = _docs_fixture(spark, tmp_path, rows)

    def h(doc_id, s):
        return int(
            hashlib.md5(f"{doc_id}#{s}".encode()).hexdigest()[:15], 16
        )

    exp = {}
    for i, _ in rows:
        weights = {s: h(i, s) for s in range(_HRW_N)}
        before = max(weights, key=lambda s: (weights[s], s))
        moved = h(i, _HRW_N) > weights[before]
        exp[i] = (before, _HRW_N if moved else before, moved)

    got = {
        r["doc_id"]: (r["shard_before"], r["shard_after"], r["moved"])
        for r in QUERIES["data_rendezvous_shards"](spark, sf).collect()
    }
    assert got == exp
    n_moved = sum(1 for _, _, m in got.values() if m)
    # expected 180/9 = 20; allow wide hash scatter but rule out both
    # zero-move (broken new-shard hash) and mass-move (hash-mod)
    assert 5 <= n_moved <= 45
    assert all(a == _HRW_N for _, a, m in got.values() if m)
    assert all(b == a for b, a, m in got.values() if not m)


def test_query_likelihood_smoothing_scores_absent_docs(spark, tmp_path):
    """Dirichlet QL's defining property vs BM25: a document with
    ZERO band-term occurrences still gets a (worse) finite score
    from the collection model. Verified against the hand formula
    -sum log2((tf + mu*ctf/|C|)/(dl + mu)) over the rank-6..10 df
    band, and orderings: more matching terms -> fewer bits."""
    import collections
    import math

    from multiomics_biocypher_kg_spark.registry import QUERIES
    from multiomics_biocypher_kg_spark.registry_web import _QL_MU

    filler = " ".join(f"f{i:02d}" for i in range(5))
    rows = [
        (0, filler + " apple banana cherry"),
        (1, filler + " apple banana date egg"),
        (2, filler + " apple cherry date"),
        (3, filler),  # no band terms: pure collection-model cost
    ]
    sf = _docs_fixture(spark, tmp_path, rows)

    toks = {i: t.split(" ") for i, t in rows}
    dfc = collections.Counter()
    for t in toks.values():
        dfc.update(set(t))
    ranked = sorted(dfc.items(), key=lambda kv: (-kv[1], kv[0]))
    band = [t for t, _ in ranked[5:10]]
    assert band == ["apple", "banana", "cherry", "date", "egg"]
    ct = sum(len(t) for t in toks.values())
    ctf = collections.Counter()
    for t in toks.values():
        ctf.update(t)
    exp = {}
    for i, t in toks.items():
        bits, present = 0.0, 0
        for term in band:
            tf = t.count(term)
            present += 1 if tf else 0
            bits -= math.log2(
                (tf + _QL_MU * ctf[term] / ct) / (len(t) + _QL_MU)
            )
        exp[i] = (present, round(bits, 6))

    got = {
        r["doc_id"]: (r["n_terms_present"], r["ql_bits"])
        for r in QUERIES["text_query_likelihood"](spark, sf).collect()
    }
    assert got == exp
    assert got[3][0] == 0 and got[3][1] > 0  # smoothed, not dropped
    # doc 3 (0 matches) pays more bits than doc 1 (4 matches)
    assert got[3][1] > got[1][1]


def test_manifest_pruning_range_layout_prunes_hash_does_not(spark):
    """The audit's point: shards partition the corpus under BOTH
    layouts, range shards cover disjoint value intervals (monotone
    assignment), skippable is exactly max_v < threshold, and range
    clustering yields strictly more skippable shards than hash."""
    from multiomics_biocypher_kg_spark.registry import QUERIES
    from multiomics_biocypher_kg_spark.registry_scale_ops import (
        _PRUNE_THRESH,
    )

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["data_manifest_pruning"](spark, sf).collect()
    n_docs_total = spark.read.parquet(f"{sf}/documents.parquet").count()
    by_layout = {}
    for r in rows:
        by_layout.setdefault(r["layout"], []).append(r)
    for layout, shards in by_layout.items():
        assert sum(r["n_docs"] for r in shards) == n_docs_total
        for r in shards:
            assert r["skippable"] == (r["max_v"] < _PRUNE_THRESH)
    rng = sorted(by_layout["range"], key=lambda r: r["shard"])
    for a, b in zip(rng, rng[1:]):
        assert a["max_v"] <= b["min_v"]  # disjoint value intervals
    skip = {
        layout: sum(1 for r in shards if r["skippable"])
        for layout, shards in by_layout.items()
    }
    assert skip["range"] > skip["hash"]
    assert skip["range"] >= len(rng) // 2  # most of the table pruned


def test_skew_audit_flags_hot_host_and_sizes_salt(spark):
    """On the synthetic host family the hot host carries ~30% of
    docs: it must be the one skewed key, with salt_factor =
    ceil(n * 32 / total) ~ 10; every cold host fits a partition
    (salt 1); counts partition the corpus."""
    import math

    from multiomics_biocypher_kg_spark.registry import QUERIES
    from multiomics_biocypher_kg_spark.registry_scale_ops import _SKEW_PARTS

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["data_skew_audit"](spark, sf).collect()
    total = sum(r["n_docs"] for r in rows)
    assert total == spark.read.parquet(f"{sf}/documents.parquet").count()
    hot = [r for r in rows if r["is_skewed"]]
    assert [r["host"] for r in hot] == ["hot.example.com"]
    assert 0.25 < hot[0]["share"] < 0.35
    assert hot[0]["salt_factor"] == math.ceil(
        hot[0]["n_docs"] * _SKEW_PARTS / total
    )
    assert all(
        r["salt_factor"] == 1 for r in rows if r["host"] != "hot.example.com"
    )


def test_rm3_expansion_matches_python_mirror(spark, tmp_path):
    """Full hand mirror of the relevance model on a corpus small
    enough that the feedback set is the whole corpus: per-doc QL
    bits -> p(q|d) -> normalized p(w|R), band terms excluded, top
    terms by rounded weight. Also pins the two RM3 contracts: no
    query term in the expansion, and weights form a sub-distribution
    (sum <= 1 up to the excluded-query mass)."""
    import collections
    import math

    from multiomics_biocypher_kg_spark.registry import QUERIES
    from multiomics_biocypher_kg_spark.registry_web import (
        _QL_MU,
        _RM3_TERMS,
    )

    filler = " ".join(f"f{i:02d}" for i in range(5))
    rows = [
        (0, filler + " apple banana cherry kiwi kiwi"),
        (1, filler + " apple banana date egg plum"),
        (2, filler + " apple cherry date mango"),
        (3, filler + " pear pear pear"),
    ]
    sf = _docs_fixture(spark, tmp_path, rows)

    toks = {i: t.split(" ") for i, t in rows}
    dfc = collections.Counter()
    for t in toks.values():
        dfc.update(set(t))
    ranked = sorted(dfc.items(), key=lambda kv: (-kv[1], kv[0]))
    band = [t for t, _ in ranked[5:10]]
    ct = sum(len(t) for t in toks.values())
    ctf = collections.Counter()
    for t in toks.values():
        ctf.update(t)

    def p_td(term, doc):
        return (toks[doc].count(term) + _QL_MU * ctf[term] / ct) / (
            len(toks[doc]) + _QL_MU
        )

    p_q = {
        i: math.prod(p_td(term, i) for term in band) for i in toks
    }  # 2^-bits == product of the five p(t|d)
    contrib = collections.defaultdict(float)
    n_top = collections.Counter()
    for i in toks:  # 4 docs < _RM3_DOCS: feedback set = whole corpus
        for term in set(toks[i]):
            if term in band:
                continue
            contrib[term] += p_td(term, i) * p_q[i]
            n_top[term] += 1
    z = sum(contrib.values())
    rm = sorted(
        ((round(w / z, 9), t) for t, w in contrib.items()),
        key=lambda x: (-x[0], x[1]),
    )[:_RM3_TERMS]
    exp = {t: (round(w9, 6), n_top[t]) for w9, t in rm}

    got = {
        r["term"]: (r["rm_weight"], r["n_top_docs"])
        for r in QUERIES["text_rm3_expansion"](spark, sf).collect()
    }
    assert set(got) == set(exp)
    for t in exp:
        assert abs(got[t][0] - exp[t][0]) < 2e-6, (t, got[t], exp[t])
        assert got[t][1] == exp[t][1]
    assert not set(band) & set(got)  # query terms never expand
    assert 0 < sum(w for w, _ in got.values()) <= 1.0 + 1e-9
