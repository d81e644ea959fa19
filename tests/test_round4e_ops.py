"""Round-4e curation operators: closed-form contracts the oracle
sweep doesn't pin — keep-best tie rules, line-dedup threshold
boundaries, mirror-pair structure, CMS overestimate bounds, bigram
model identities."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.operators import dedup as dd
from multiomics_biocypher_kg_spark.registry import QUERIES
from tests.conftest import SF_TINY


def test_keep_best_longest_then_min_id(spark):
    """Within a cluster the longest doc wins; equal lengths fall
    back to the smallest id. Singletons never appear."""
    docs = spark.createDataFrame(
        [
            (1, "a b c"),          # cluster {1,2,3}: 2 is longest
            (2, "a b c d e"),
            (3, "a b"),
            (10, "x y z"),         # cluster {10, 11}: tie -> min id 10
            (11, "p q r"),
            (99, "lonely"),        # singleton: not in pairs, absent
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    out = {
        r["cluster_id"]: r
        for r in dd.keep_best_per_cluster(pairs, docs).collect()
    }
    assert set(out) == {1, 10}
    assert out[1]["kept_doc_id"] == 2
    assert out[1]["kept_n_tokens"] == 5
    assert out[1]["n_members"] == 3 and out[1]["n_dropped"] == 2
    assert out[10]["kept_doc_id"] == 10  # tie at 3 tokens -> min id
    assert out[10]["n_dropped"] == 1


def test_line_dedup_threshold_boundary_and_md5(spark):
    """A line in exactly max_doc_freq docs survives; one more doc
    kills it everywhere. kept_md5 is the md5 of the surviving lines
    joined in document order."""
    boiler = "n0 n1 n2 n3"  # 4-token line, shared
    docs = spark.createDataFrame(
        [
            (1, boiler + " u1 u2 u3 u4"),
            (2, boiler + " v1 v2 v3 v4"),
            (3, boiler + " w1 w2 w3 w4"),
            (4, "k0 k1 k2 k3 u1 u2 u3 u4"),  # head line only in 2 docs
            (5, "k0 k1 k2 k3 z1 z2 z3 z4"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dd.line_dedup(docs, line_tokens=4, max_doc_freq=2).collect()
    }
    # boiler appears in docs 1-3 (df=3 > 2): dropped there
    for d in (1, 2, 3):
        assert out[d]["n_lines"] == 2 and out[d]["n_dropped"] == 1
    # "u1 u2 u3 u4" is in docs 1 and 4 (df=2): kept
    assert out[4]["n_dropped"] == 0
    assert (
        out[1]["kept_md5"]
        == hashlib.md5(b"u1 u2 u3 u4").hexdigest()
    )
    assert (
        out[4]["kept_md5"]
        == hashlib.md5(b"k0 k1 k2 k3 u1 u2 u3 u4").hexdigest()
    )


def test_mirror_hosts_pairs_are_base_vs_mirror(spark):
    """Every reported pair is (host, mirror-host); jaccard is
    consistent with the reported set sizes and there is at least
    one pair at each synthetic coverage class that clears 0.2."""
    rows = QUERIES["web_mirror_hosts"](spark, SF_TINY).collect()
    assert rows
    for r in rows:
        assert r["host_b"] == "mirror-" + r["host_a"]
        expect = r["n_shared"] / (r["n_a"] + r["n_b"] - r["n_shared"])
        assert abs(r["jaccard"] - expect) < 1e-6
        assert 0.2 <= r["jaccard"] <= 1.0
        # the mirror carries a subset of the base host's content
        assert r["n_shared"] == r["n_b"] <= r["n_a"]


def test_cms_estimate_never_underestimates(spark):
    """CMS guarantees est >= exact for every key; the top token's
    exact count matches a direct count, and the error respects the
    coarse bound sum(all counts)/w per row."""
    rows = QUERIES["text_heavy_hitters_cms"](spark, SF_TINY).collect()
    assert len(rows) == 20
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    toks = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("token")
    )
    total = toks.count()
    top = (
        toks.groupBy("token")
        .count()
        .orderBy(F.col("count").desc(), "token")
        .first()
    )
    assert rows[0]["token"] == top["token"]
    assert rows[0]["exact_count"] == top["count"]
    for r in rows:
        assert r["overestimate"] >= 0
        assert r["cms_estimate"] == r["exact_count"] + r["overestimate"]
        # worst-case single-row collision mass is bounded by the
        # whole stream landing in one of w=512 buckets x d rows
        assert r["overestimate"] <= total


def test_bigram_perplexity_counts_and_positivity(spark):
    """n_bigrams == n_tokens - 1 for every doc with >= 2 tokens, and
    interpolated probabilities are proper (< 1 => bits > 0)."""
    out = {
        r["doc_id"]: r
        for r in QUERIES["text_bigram_perplexity"](spark, SF_TINY).collect()
    }
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet").select(
        "doc_id", F.size(F.split(F.lower("text"), " ")).alias("n")
    )
    for r in docs.collect():
        if r["n"] >= 2:
            assert out[r["doc_id"]]["n_bigrams"] == r["n"] - 1
    assert all(r["bits_per_bigram"] > 0 for r in out.values())


def test_line_dedup_matches_python_mirror_on_random_corpus(spark):
    """Seeded random corpus with engineered duplicate lines: the
    Spark plan agrees with a straight-Python mirror of the CCNet
    semantics on every (n_lines, n_dropped, kept_md5) triple —
    segmentation edges (short tails, doc length % line_tokens == 0)
    included."""
    import random

    rng = random.Random(20260817)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    for d in range(60):
        n = rng.randint(1, 37)
        toks = [vocab[rng.randrange(40)] for _ in range(n)]
        if d % 7 == 0:
            toks[:4] = ["b0", "b1", "b2", "b3"]  # 9 docs share a head line
        docs.append((d, " ".join(toks)))

    L, K = 4, 2

    def segs(text):
        t = text.split(" ")
        return [
            " ".join(t[i : i + L]) for i in range(0, len(t), L)
        ]

    df_count: dict[str, set] = {}
    for d, text in docs:
        for line in segs(text):
            df_count.setdefault(line, set()).add(d)
    expect = {}
    for d, text in docs:
        lines = segs(text)
        kept = [ln for ln in lines if len(df_count[ln]) <= K]
        dropped = sum(1 for ln in lines if len(df_count[ln]) > K)
        expect[d] = (
            len(lines),
            dropped,
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )

    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_lines"], r["n_dropped"], r["kept_md5"])
        for r in dd.line_dedup(sdf, line_tokens=L, max_doc_freq=K).collect()
    }
    assert got == expect
    # the engineered boilerplate line really crossed the threshold
    assert len(df_count["b0 b1 b2 b3"]) > K
