"""Round-4 scale operators: statistical contracts the oracle can't
express — sketch accuracy bounds, sampling determinism/coverage,
Bloom false-positive behavior, quantile-sketch error bounds."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.registry import QUERIES
from tests.conftest import SF_TINY

SF_SMALL = "/root/testdata/sf0.01"


def test_cardinality_sketch_accuracy_on_large_host(spark):
    """The unbiased (K-1)/sum estimator with K=32 trials has relative
    stddev ~1/sqrt(K-2) ~ 18%. Pin that the BIG host (the only one
    where the asymptotics apply) lands within 3 sigma, and that the
    estimate is positive everywhere."""
    rows = QUERIES["text_hll_host_cardinality"](spark, SF_SMALL).collect()
    by_host = {r["host"]: r for r in rows}
    hot = by_host["hot.example.com"]
    assert hot["n_exact"] >= 100  # 30% of the corpus lands here
    assert hot["rel_err"] <= 3 / math.sqrt(30)
    assert all(r["n_est"] > 0 for r in rows)


def test_reservoir_sample_deterministic_and_uniformish(spark):
    """Same sample across runs (hash priorities, no RNG); ranks are
    1..k dense; membership is hash-uniform — the k docs are spread
    over the id space, not a prefix."""
    a = QUERIES["text_reservoir_sample"](spark, SF_SMALL).collect()
    b = QUERIES["text_reservoir_sample"](spark, SF_SMALL).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert sorted(r["sample_rank"] for r in a) == list(range(1, len(a) + 1))
    ids = sorted(r["doc_id"] for r in a)
    assert len(a) == 100
    assert ids[0] < 50 and ids[-1] > 450  # spans the id range


def test_stratified_sample_hits_per_stratum_quota(spark):
    """Each language contributes exactly ceil(10% of its count)."""
    out = QUERIES["text_stratified_sample"](spark, SF_SMALL)
    got = {
        r["lang"]: (r["n"], r["lc"])
        for r in out.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.max("lang_count").alias("lc"))
        .collect()
    }
    truth = {
        r["lang"]: r["c"]
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert set(got) == set(truth)
    for lang, (n, lc) in got.items():
        assert lc == truth[lang]
        assert n == math.ceil(0.1 * truth[lang])


def test_bloom_revisit_no_false_negatives(spark):
    """Bloom's one-sided guarantee: every truly-seen url is
    maybe_seen (no false negative, ever); with the deliberately tiny
    m=256 filter the corpus produces at least one false positive, so
    the FP path is exercised, and FPs stay a small minority."""
    rows = QUERIES["web_bloom_revisit"](spark, SF_SMALL).collect()
    assert all(r["maybe_seen"] == 1 for r in rows if r["truly_seen"] == 1)
    fps = [r for r in rows if r["maybe_seen"] == 1 and r["truly_seen"] == 0]
    unseen = [r for r in rows if r["truly_seen"] == 0]
    assert len(fps) >= 1
    assert len(fps) <= 0.2 * len(unseen)


def test_quantile_sketch_within_one_bin_of_exact(spark):
    """Histogram quantile estimates are the bin lower bound — pin
    |estimate - exact nearest-rank quantile| <= one bin width."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    xs = sorted(
        r["x"] for r in docs.select(F.size(F.split("text", " ")).alias("x")).collect()
    )
    n = len(xs)
    width = (xs[-1] - xs[0] + 1) / 64
    for r in QUERIES["text_quantile_sketch"](spark, SF_SMALL).collect():
        exact = xs[max(0, math.ceil(r["q"] * n) - 1)]
        assert abs(r["est_value"] - exact) <= width + 1e-9, (r["q"], exact, r)


def test_crawl_merge_actions_partition_the_url_space(spark):
    """insert/update/keep are exhaustive and mutually exclusive, and
    the merged id is always the newest on its url."""
    rows = QUERIES["web_incremental_crawl_merge"](spark, SF_SMALL).collect()
    assert {r["action"] for r in rows} == {"insert", "update", "keep"}
    assert len({r["url"] for r in rows}) == len(rows)
    for r in rows:
        assert r["final_ts"] == 1767225600 + r["final_doc_id"]


def test_minhash_signature_export_matches_lsh_internals(spark):
    """The exported signature equals the wide-agg signature the LSH
    path computes internally — one source of truth for the index."""
    from multiomics_biocypher_kg_spark.operators import dedup as dd

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet").select(
        "doc_id", "text"
    )
    sigs = dd.minhash_signatures(dd.shingles(docs))
    internal = {
        r["id"]: "|".join(str(r[f"mh{i}"]) for i in range(16))
        for r in sigs.collect()
    }
    exported = {
        r["doc_id"]: r["sig"]
        for r in QUERIES["text_minhash_doc_signature"](spark, SF_TINY).collect()
    }
    assert exported == internal


def test_incremental_dedup_never_compares_batch_to_batch(spark):
    """Cross-corpus LSH: every returned pair is (base, batch) —
    base-base and batch-batch pairs are structurally impossible —
    and the recall on the synthetic exact-dup batch is total."""
    rows = QUERIES["dedup_incremental_lsh"](spark, SF_TINY).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["id_a"] < 1000000 <= r["id_b"], (r["id_a"], r["id_b"])
    docs = {
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_TINY}/documents.parquet")
        .select("doc_id")
        .collect()
    }
    exact = {(d, d + 2000000) for d in docs if d % 5 == 0}
    found = {(r["id_a"], r["id_b"]) for r in rows}
    assert exact <= found  # identical signatures: LSH recall 1.0


def test_unigram_perplexity_orders_fluency(spark):
    """In-model docs score below the corpus-wide uniform bound
    (log2(V) bits); the score is deterministic across runs."""
    import math

    rows = QUERIES["text_unigram_perplexity"](spark, SF_SMALL).collect()
    toks = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("t"))
    )
    v = toks.distinct().count()
    assert all(0 < r["bits_per_token"] < math.log2(v) + 1 for r in rows)
    again = QUERIES["text_unigram_perplexity"](spark, SF_SMALL).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_blocking_keys_bound_candidate_pairs(spark):
    """Sum of within-block pairs is far below the all-pairs count —
    the whole point of blocking — and the pair formula is exact."""
    rows = QUERIES["kg_blocking_keys"](spark, SF_SMALL).collect()
    n_docs = sum(r["n_docs"] for r in rows)
    blocked_pairs = sum(r["n_pairs"] for r in rows)
    assert n_docs == 500
    assert blocked_pairs < 0.25 * n_docs * (n_docs - 1) / 2
    for r in rows:
        assert r["n_pairs"] == r["n_docs"] * (r["n_docs"] - 1) // 2
        assert r["oversized"] == (1 if r["n_pairs"] > 1000 else 0)


def test_warc_writer_reader_roundtrip_hostile_bodies(tmp_path):
    """The WARC parser is framing-exact: bodies containing the
    record marker, CRLFs, or binary bytes round-trip byte-identically
    because the reader consumes Content-Length bytes, never splits
    on markers."""
    from multiomics_biocypher_kg_spark.sources.warc import (
        parse_warc_file,
        write_warc_files,
    )

    recs = [
        ("https://a/1", "2026-01-01T00:00:00Z", b"WARC/1.0\r\n\r\nfake"),
        ("https://a/2", "2026-01-01T00:00:01Z", bytes(range(256))),
        ("https://a/3", "2026-01-01T00:00:02Z", b""),
    ]
    paths = write_warc_files(recs, str(tmp_path / "w"), n_files=1)
    got = list(parse_warc_file(paths[0]))
    assert got == recs


def test_warc_datasource_partitions_per_file(spark, tmp_path):
    """spark.read.format('warc'): one InputPartition per archive
    file, all records surfaced with their headers and bodies."""
    from multiomics_biocypher_kg_spark.sources.warc import (
        register_warc_source,
        write_warc_files,
    )

    recs = [
        (f"https://h/{i}", "2026-01-01T00:00:00Z", f"body {i}".encode())
        for i in range(10)
    ]
    write_warc_files(recs, str(tmp_path / "w"), n_files=3)
    register_warc_source(spark)
    df = spark.read.format("warc").option("path", str(tmp_path / "w")).load()
    assert df.rdd.getNumPartitions() == 3
    rows = {(r.url, bytes(r.content)) for r in df.collect()}
    assert rows == {(u, b) for u, _, b in recs}


def test_chunk_windows_cover_every_token(spark):
    """Chunks tile each doc: first chunk starts at token 1, strides
    are 24, every token appears in >= 1 chunk, all full chunks are
    exactly 32 tokens and only the last may be short."""
    rows = QUERIES["text_chunk_windows"](spark, SF_TINY).collect()
    docs = {
        r["doc_id"]: r["n"]
        for r in spark.read.parquet(f"{SF_TINY}/documents.parquet")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(docs)
    for did, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        n = docs[did]
        assert chunks[0]["chunk_idx"] == 0
        last_start = chunks[-1]["chunk_idx"] * 24
        assert last_start + chunks[-1]["n_chunk_tokens"] == n  # ends covered
        for c in chunks[:-1]:
            assert c["n_chunk_tokens"] == 32


def test_pack_sequences_respect_quota_contract(spark):
    """First-fit-by-quota: total tokens per sequence lands in
    (budget - max_doc, budget + max_doc); every doc is packed
    exactly once; sequences are deterministic across runs."""
    rows = QUERIES["text_pack_sequences"](spark, SF_SMALL).collect()
    docs = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select(F.size(F.split("text", " ")).alias("n"))
        .collect()
    )
    n_docs, total = len(docs), sum(r["n"] for r in docs)
    max_doc = max(r["n"] for r in docs)
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert sum(r["total_tokens"] for r in rows) == total
    # every non-terminal sequence of a shard starts at its quota
    # boundary, so it holds > budget - max_doc tokens; terminal
    # sequences may be near-empty, so bound only the upper side and
    # the AGGREGATE fill (shards = 16 terminal sequences at most)
    for r in rows:
        assert r["total_tokens"] < 256 + max_doc
    assert total / sum(1 for _ in rows) > 256 - max_doc - 256 * 16 / len(rows)
    again = QUERIES["text_pack_sequences"](spark, SF_SMALL).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_split_assign_is_stable_and_exhaustive(spark):
    """Hash split: fractions near 90/5/5, all docs assigned, and the
    assignment of any given doc never changes across runs."""
    rows = {r["split"]: r for r in QUERIES["data_split_assign"](spark, SF_SMALL).collect()}
    assert set(rows) == {"train", "val", "test"}
    assert sum(r["n_docs"] for r in rows.values()) == 500
    assert 0.8 < rows["train"]["frac"] < 0.97
    again = {r["split"]: r["n_docs"] for r in QUERIES["data_split_assign"](spark, SF_SMALL).collect()}
    assert again == {k: v["n_docs"] for k, v in rows.items()}


def test_split_leakage_detects_cross_split_neardups(spark):
    """The recrawl synthesis guarantees near-dup pairs whose two
    sides hash into different splits — the audit must surface them
    (n_leaking > 0 in at least one cross bucket), and same-split
    buckets must report zero leaking."""
    rows = QUERIES["data_split_leakage"](spark, SF_SMALL).collect()
    cross = [r for r in rows if r["split_a"] != r["split_b"]]
    assert sum(r["n_leaking"] for r in cross) > 0
    for r in rows:
        if r["split_a"] == r["split_b"]:
            assert r["n_leaking"] == 0
        else:
            assert r["n_leaking"] == r["n_pairs"]


def test_quantization_error_bounded_by_half_step(spark):
    """int8 round-trip error is at most scale/2 (+1 ulp); scale is
    positive for every non-zero vector."""
    for r in QUERIES["emb_quantize_int8"](spark, SF_SMALL).collect():
        assert r["scale"] > 0
        assert r["max_abs_err"] <= r["scale"] / 2 + 1e-6, r


def test_fuzzy_vocab_match_recovers_typos(spark):
    """Exact vocabulary tokens score distance 0 to themselves; the
    deterministic tie rule picks the lexicographically first surface
    among equal-distance candidates."""
    rows = {r["token"]: r for r in QUERIES["kg_fuzzy_vocab_match"](spark, SF_TINY).collect()}
    assert len(rows) > 0
    exact = [r for r in rows.values() if r["best_dist"] == 0]
    assert exact, "vocabulary tokens occur in the corpus"
    for r in exact:
        assert r["best_surface"] == r["token"]
    assert all(r["best_dist"] <= 2 for r in rows.values())


def test_redirect_chains_resolve_to_terminals(spark):
    """Every resolved destination is a NON-redirecting url; multi-hop
    chains report their true hop count (fams 1->2->3->4 gives a
    3-hop resolution for fam 1)."""
    rows = QUERIES["web_redirect_chains"](spark, SF_SMALL).collect()
    finals = {r["url"]: r for r in rows}
    assert rows
    srcs = set(finals)
    for r in rows:
        assert r["final_url"] not in srcs  # terminal
        assert 1 <= r["n_hops"] <= 3
    three = [r for r in rows if r["n_hops"] == 3]
    assert three, "the fam%9 in (1,2,3) synthesis makes 3-hop chains"


def test_scd2_intervals_tile_and_close(spark):
    """Per url: exactly one open (current) version; intervals are
    disjoint and ordered (each valid_to equals the next valid_from);
    consecutive identical content never splits a version."""
    rows = QUERIES["web_scd2_history"](spark, SF_SMALL).collect()
    by_url = {}
    for r in rows:
        by_url.setdefault(r["url"], []).append(r)
    assert by_url
    for url, vs in by_url.items():
        vs.sort(key=lambda r: r["valid_from"])
        assert sum(1 for r in vs if r["is_current"] == 1) == 1
        assert vs[-1]["is_current"] == 1 and vs[-1]["valid_to"] is None
        for a, b in zip(vs, vs[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["content_md5"] != b["content_md5"]


def test_hits_scores_are_distributions_and_rank_hub_host(spark):
    """Hub and authority vectors are L1-normalized distributions;
    the hot host (30% of pages link OUT from it) tops the hub
    ranking; determinism across runs."""
    rows = QUERIES["web_hits"](spark, SF_SMALL).collect()
    assert abs(sum(r["hub"] for r in rows) - 1.0) < 1e-3
    assert abs(sum(r["authority"] for r in rows) - 1.0) < 1e-3
    top_hub = max(rows, key=lambda r: r["hub"])
    assert top_hub["host"] == "hot.example.com"
    again = QUERIES["web_hits"](spark, SF_SMALL).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_zorder_layout_matches_python_mirror_and_wins(spark):
    """data_zorder_layout must equal a pure-Python bucket/interleave/
    min-max mirror, and demonstrate the point of z-ordering: the
    Morton layout scans strictly fewer rows than the dim1-range
    layout for the 2-d box, while both report the identical true
    match count."""
    from multiomics_biocypher_kg_spark.registry import QUERIES
    from tests.conftest import SF_TINY

    rows = (
        spark.read.parquet(f"{SF_TINY}/lineitem.parquet")
        .select("l_partkey", "l_suppkey")
        .collect()
    )
    mp = max(r["l_partkey"] for r in rows)
    ms = max(r["l_suppkey"] for r in rows)

    def interleave(b1: int, b2: int) -> int:
        z = 0
        for i in range(4):
            z += ((b1 >> i) & 1) << (2 * i + 1)
            z += ((b2 >> i) & 1) << (2 * i)
        return z

    import collections
    shards: dict = collections.defaultdict(
        lambda: {"n": 0, "match": 0, "min1": 99, "max1": -1, "min2": 99, "max2": -1}
    )
    for r in rows:
        b1 = min(15, (r["l_partkey"] * 16) // (mp + 1))
        b2 = min(15, (r["l_suppkey"] * 16) // (ms + 1))
        in_box = int(4 <= b1 <= 7 and 4 <= b2 <= 7)
        for layout, shard in (
            ("zorder", interleave(b1, b2) >> 4),
            ("range-dim1", b1),
        ):
            s = shards[(layout, shard)]
            s["n"] += 1
            s["match"] += in_box
            s["min1"] = min(s["min1"], b1); s["max1"] = max(s["max1"], b1)
            s["min2"] = min(s["min2"], b2); s["max2"] = max(s["max2"], b2)
    expect = {}
    for layout in ("zorder", "range-dim1"):
        mine = {k[1]: v for k, v in shards.items() if k[0] == layout}
        hit = {
            sh: v for sh, v in mine.items()
            if v["min1"] <= 7 and v["max1"] >= 4
            and v["min2"] <= 7 and v["max2"] >= 4
        }
        expect[layout] = (
            len(mine),
            len(hit),
            sum(v["n"] for v in hit.values()),
            sum(v["match"] for v in mine.values()),
        )
    got = {
        r["layout"]: (r["n_shards"], r["shards_scanned"],
                      r["rows_scanned"], r["rows_matching"])
        for r in QUERIES["data_zorder_layout"](spark, SF_TINY).collect()
    }
    assert got == expect
    assert got["zorder"][2] < got["range-dim1"][2]
    assert got["zorder"][3] == got["range-dim1"][3]
    # no false pruning: every matching row sits in a scanned shard
    for layout in got:
        assert got[layout][2] >= got[layout][3]


def test_quality_checks_pass_on_clean_warehouse_and_match_recount(spark):
    """All six declarative checks pass on the synthetic warehouse,
    and every counter equals an independent Python recount (sets for
    FK membership, len vs distinct for uniqueness)."""
    from multiomics_biocypher_kg_spark.registry import QUERIES
    from tests.conftest import SF_TINY

    li = spark.read.parquet(f"{SF_TINY}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    ).collect()
    orders = spark.read.parquet(f"{SF_TINY}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    ).collect()
    cust = {
        r["c_custkey"]
        for r in spark.read.parquet(f"{SF_TINY}/customer.parquet")
        .select("c_custkey").collect()
    }
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    okeys = [r["o_orderkey"] for r in orders]
    expect = {
        "lineitem.l_quantity in [1,50]": (
            len(li),
            sum(1 for r in li
                if r["l_quantity"] is None or not 1 <= r["l_quantity"] <= 50),
        ),
        "lineitem.l_orderkey fk orders": (
            len(li),
            sum(1 for r in li if r["l_orderkey"] not in set(okeys)),
        ),
        "orders.o_custkey fk customer": (
            len(orders),
            sum(1 for r in orders if r["o_custkey"] not in cust),
        ),
        "orders.o_orderkey unique": (len(okeys), len(okeys) - len(set(okeys))),
        "documents.text not null/empty": (
            len(docs),
            sum(1 for r in docs if not r["text"]),
        ),
        "documents.doc_id unique": (
            len(docs),
            len(docs) - len({r["doc_id"] for r in docs}),
        ),
    }
    got = QUERIES["data_quality_checks"](spark, SF_TINY).collect()
    assert len(got) == 6
    for r in got:
        n, v = expect[r["check_name"]]
        assert (r["n_rows"], r["n_violations"]) == (n, v), r
        assert r["passed"] == (v == 0)
        assert r["passed"]  # clean synthetic warehouse
