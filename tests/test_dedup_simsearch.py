"""Dedup + similarity-search behavioral tests (beyond oracle parity):
LSH recall vs exact, langid on genuinely multilingual text, phrase
recall of near-dup synthesis."""

from __future__ import annotations

from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.functions.textstats import langid_predict
from multiomics_biocypher_kg_spark.operators import dedup as dd
from multiomics_biocypher_kg_spark.operators.simsearch import (
    cosine_topk,
    lsh_bucketed_topk,
)
from multiomics_biocypher_kg_spark.registry_dedup_text import _dedup_corpus
from tests.conftest import SF_TINY


def test_minhash_finds_synthetic_neardups(spark):
    corpus = _dedup_corpus(spark, SF_TINY)
    pairs = dd.minhash_neardup_pairs(corpus, 0.5).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    # exact copies (doc_id % 5 == 0 -> +2000000) have jaccard 1.0 and
    # identical signatures: LSH must find every one of them
    docs = {r.doc_id for r in spark.read.parquet(f"{SF_TINY}/documents.parquet").select("doc_id").collect()}
    exact_pairs = {(d, d + 2000000) for d in docs if d % 5 == 0}
    assert exact_pairs <= found
    # near-dups (drop 1-in-7 tokens) have jaccard ~>0.6: high recall
    near_pairs = {(d, d + 1000000) for d in docs if d % 4 == 0}
    recall = len(near_pairs & found) / len(near_pairs)
    assert recall >= 0.8, recall


def test_minhash_lsh_vs_exact_jaccard(spark):
    corpus = _dedup_corpus(spark, SF_TINY)
    sh = dd.shingles(corpus)
    exact = {
        (r.id_a, r.id_b) for r in dd.jaccard_pairs(sh, 0.5).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in dd.minhash_neardup_pairs(corpus, 0.5).collect()
    }
    # LSH output is verified, so it is a subset; recall must be high
    assert lsh <= exact
    assert len(lsh) >= 0.85 * len(exact)


def test_simhash_exact_copies_distance_zero(spark):
    corpus = _dedup_corpus(spark, SF_TINY)
    hashes = dd.simhash64(corpus)
    pairs = dd.simhash_pairs(hashes, 0).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    docs = {r.doc_id for r in spark.read.parquet(f"{SF_TINY}/documents.parquet").select("doc_id").collect()}
    assert {(d, d + 2000000) for d in docs if d % 5 == 0} <= found


def test_simhash_banded_equals_allpairs(spark):
    """Pigeonhole exactness: 4x15-bit band bucketing returns the
    IDENTICAL hamming<=3 pair set as the all-pairs verifier."""
    corpus = _dedup_corpus(spark, SF_TINY)
    hashes = dd.simhash64(corpus).cache()
    try:
        allp = {
            (r.id_a, r.id_b, r.hamming)
            for r in dd.simhash_pairs(hashes, 3).collect()
        }
        banded = {
            (r.id_a, r.id_b, r.hamming)
            for r in dd.simhash_banded_pairs(hashes, 3).collect()
        }
    finally:
        hashes.unpersist()
    assert len(allp) > 0
    assert banded == allp


def test_simhash_banded_rejects_insufficient_bands(spark):
    import pytest

    with pytest.raises(ValueError):
        dd.simhash_banded_pairs(
            spark.createDataFrame([(1, 0)], "id long, simhash long"),
            max_hamming=4,
            n_bands=4,
        )


def test_embedding_neardup_precision_one_recall_high(spark):
    """Sign-LSH near-dup: every returned pair is a true >=threshold
    pair (precision 1.0 — cosine is exact on candidates), and recall
    vs the brute-force truth set is high on the fixture."""
    from multiomics_biocypher_kg_spark.operators.simsearch import (
        _dot,
        _norm,
        embedding_neardup_pairs,
    )

    emb = spark.read.parquet(f"{SF_TINY}/embeddings.parquet")
    v = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("nrm", _norm(F.col("v")))
    a = v.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = v.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    truth = {
        (r.id_a, r.id_b): r.cosine
        for r in a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6),
        )
        .where(F.col("cosine") >= 0.35)
        .select("id_a", "id_b", "cosine")
        .collect()
    }
    lsh = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_neardup_pairs(emb, 0.35).collect()
    }
    assert len(truth) > 0
    # precision 1.0: exact-verified candidates are a subset of truth
    assert set(lsh) <= set(truth)
    for pair, cos in lsh.items():
        assert abs(truth[pair] - cos) < 1e-9
    recall = len(lsh) / len(truth)
    assert recall >= 0.5, f"sign-LSH recall too low: {recall:.2f}"


def test_cosine_topk_guards_full_corpus_broadcast(spark):
    import pytest

    emb = spark.read.parquet(f"{SF_TINY}/embeddings.parquet")
    with pytest.raises(ValueError, match="broadcast"):
        cosine_topk(emb, k=3)


def test_lsh_ann_recall_vs_bruteforce(spark):
    emb = spark.read.parquet(f"{SF_TINY}/embeddings.parquet")
    exact = cosine_topk(emb, k=3, allow_full_corpus_queries=True).collect()
    approx = lsh_bucketed_topk(emb, k=3).collect()
    exact_top1 = {r.query_id: r.neighbor_id for r in exact if r.rank == 1}
    approx_map = {(r.query_id, r.neighbor_id) for r in approx}
    hit = sum(1 for q, n in exact_top1.items() if (q, n) in approx_map)
    # sign-LSH with 8 planes on near-random vectors: modest recall is
    # expected; assert it beats random chance by a wide margin
    assert hit / len(exact_top1) >= 0.4, hit / len(exact_top1)
    # every approx neighbor must share the query's bucket -> correctness
    # of scoring itself is checked by comparing overlapping pairs
    exact_scores = {(r.query_id, r.neighbor_id): r.cosine for r in exact}
    for r in approx:
        if (r.query_id, r.neighbor_id) in exact_scores:
            assert abs(exact_scores[(r.query_id, r.neighbor_id)] - r.cosine) < 1e-9


def test_ivf_ann_recall_and_determinism(spark):
    """IVF (fixed init, fixed Lloyd iterations): candidates come from
    probed lists only; scores exact on overlap; recall beats chance;
    two runs are bit-identical (no RNG anywhere)."""
    from multiomics_biocypher_kg_spark.operators.simsearch import (
        cosine_topk,
        ivf_topk,
    )

    emb = spark.read.parquet(f"{SF_TINY}/embeddings.parquet")
    exact = cosine_topk(emb, k=3, allow_full_corpus_queries=True).collect()
    approx = ivf_topk(emb, k=3, n_lists=8, n_probe=3).collect()
    exact_top1 = {r.query_id: r.neighbor_id for r in exact if r.rank == 1}
    approx_map = {(r.query_id, r.neighbor_id) for r in approx}
    hit = sum(1 for q, n in exact_top1.items() if (q, n) in approx_map)
    assert hit / len(exact_top1) >= 0.3, hit / len(exact_top1)
    exact_scores = {(r.query_id, r.neighbor_id): r.cosine for r in exact}
    for r in approx:
        if (r.query_id, r.neighbor_id) in exact_scores:
            assert abs(exact_scores[(r.query_id, r.neighbor_id)] - r.cosine) < 1e-9
    again = ivf_topk(emb, k=3, n_lists=8, n_probe=3).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, approx))
    # n_probe = n_lists degenerates to exact search
    full = ivf_topk(emb, k=3, n_lists=4, n_probe=4).collect()
    assert {(r.query_id, r.neighbor_id) for r in full} == {
        (r.query_id, r.neighbor_id) for r in exact
    }


def test_langid_discriminates_real_text(spark):
    rows = [
        (0, "the cat and the hat of a dog", "en"),
        (1, "der hund und die katze und das haus", "de"),
        (2, "el perro y la casa de los gatos una vez", "es"),
        (3, "le chien et la maison les chats des une", "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.doc_id: r.pred_lang for r in langid_predict(df).collect()}
    assert out == {0: "en", 1: "de", 2: "es", 3: "fr"}


def test_multimodal_resize_and_frames(spark):
    from multiomics_biocypher_kg_spark.operators.multimodal import (
        attach_payloads,
        resize_images,
        sample_frames,
    )

    docs = spark.createDataFrame(
        [(0, "x" * 100), (1, "y" * 100), (2, "abcdefgh")],
        "doc_id long, text string",
    )  # kinds: 0=image, 1=audio, 2=video
    media = attach_payloads(docs)
    resized = {r.doc_id: r for r in resize_images(media, 4, 4).collect()}
    assert len(bytes(resized[0].payload)) == 16  # image downsampled
    assert len(bytes(resized[1].payload)) == 100  # audio passthrough
    assert (resized[0].width, resized[0].height) == (4, 4)
    # passthrough rows keep NULL dimensions (their payload is untouched)
    assert resized[1].width is None and resized[1].height is None

    frames = sample_frames(media, n_frames=4).collect()
    assert {r.doc_id for r in frames} == {2}  # only the video
    by_idx = {r.frame_idx: bytes(r.frame) for r in frames}
    assert b"".join(by_idx[i] for i in range(4)) == b"abcdefgh"
    assert all(r.n_bytes == 2 for r in frames)


def test_multimodal_decode_stub(spark):
    from multiomics_biocypher_kg_spark.operators.multimodal import (
        attach_payloads,
        decode_features,
    )

    docs = spark.createDataFrame(
        [(1, "abc"), (2, "zz")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in decode_features(attach_payloads(docs)).collect()}
    assert out[1].n_bytes == 3
    assert abs(out[1].byte_mean - (97 + 98 + 99) / 3) < 1e-9
    assert out[2].byte_mode == ord("z")
    assert out[1].kind == "audio" and out[2].kind == "video"


def test_multimodal_decode_real_formats(spark):
    """The real decoders parse ARBITRARY valid files, not just our
    synthesis: a 2x3 PPM with header comments, and a 4-sample WAV at
    a non-default rate — dims/rate/means come from the container."""
    import io
    import struct
    import wave

    from multiomics_biocypher_kg_spark.operators.multimodal import (
        decode_real_features,
    )

    ppm = b"P6\n# a comment\n2 3\n# another\n255\n" + bytes(range(18))
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(struct.pack("<4h", -1000, 2000, -3000, 4000))
    media = spark.createDataFrame(
        [(1, "image", ppm), (2, "audio", buf.getvalue())],
        "doc_id long, kind string, payload binary",
    )
    out = {r.doc_id: r for r in decode_real_features(media).collect()}
    assert (out[1].width, out[1].height, out[1].n_units) == (2, 3, 18)
    assert abs(out[1].mean_value - sum(range(18)) / 18) < 1e-9
    assert (out[2].sample_rate, out[2].n_units) == (44100, 4)
    assert abs(out[2].mean_value - (1000 + 2000 + 3000 + 4000) / 4) < 1e-9


def test_multimodal_real_payloads_are_valid_files(spark):
    """attach_real_payloads writes files any external reader opens:
    the WAV round-trips through stdlib wave; the PPM through the
    header parser with the documented geometry."""
    from multiomics_biocypher_kg_spark.operators.multimodal import (
        PPM_H,
        PPM_W,
        WAV_RATE,
        WAV_SAMPLES,
        attach_real_payloads,
        decode_real_features,
    )

    docs = spark.createDataFrame(
        [(0, "abcd"), (1, "wxyz")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in decode_real_features(attach_real_payloads(docs)).collect()
    }
    assert (out[0].width, out[0].height) == (PPM_W, PPM_H)
    assert out[0].n_units == PPM_W * PPM_H * 3
    # pixel bytes are 'abcd' cycled over 192 bytes
    assert abs(out[0].mean_value - (97 + 98 + 99 + 100) / 4) < 1e-9
    assert (out[1].sample_rate, out[1].n_units) == (WAV_RATE, WAV_SAMPLES)


def test_containment_quote_low_jaccard(spark):
    """A short quote embedded verbatim in a long page: containment
    1.0 for the quote side, while Jaccard stays far below any dedup
    threshold — the pair only surfaces through containment."""
    from multiomics_biocypher_kg_spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
        shingles,
    )

    quote = "alpha beta gamma delta epsilon"
    page = " ".join(f"w{i}" for i in range(100)) + " " + quote + " " + " ".join(
        f"v{i}" for i in range(100)
    )
    docs = spark.createDataFrame(
        [(1, quote), (2, page), (3, "unrelated text entirely here")],
        "doc_id long, text string",
    )
    sh = shingles(docs)
    got = containment_pairs(sh, threshold=0.9).collect()
    assert len(got) == 1
    row = got[0]
    assert (row["id_a"], row["id_b"], row["contained_id"]) == (1, 2, 1)
    assert row["containment"] == 1.0
    jac = jaccard_pairs(sh, threshold=0.5).collect()
    assert jac == []  # dedup path misses the quote pair


def test_containment_candidates_path_matches_exhaustive(spark):
    from multiomics_biocypher_kg_spark.operators.dedup import (
        containment_pairs,
        shingles,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h i j k l"), (3, "x y z w q r")],
        "doc_id long, text string",
    )
    sh = shingles(docs)
    exhaustive = sorted(map(tuple, containment_pairs(sh, 0.5).collect()))
    cands = spark.createDataFrame([(1, 2), (1, 3), (2, 3)], "id_a long, id_b long")
    via_cands = sorted(map(tuple, containment_pairs(sh, 0.5, candidates=cands).collect()))
    assert exhaustive == via_cands and len(exhaustive) == 1


def test_semdedup_keeps_lowest_id_per_family(spark):
    """Two near-identical vectors + one orthogonal: the higher id of
    the near-dup pair is flagged, the lowest id and the orthogonal
    vector are kept."""
    from multiomics_biocypher_kg_spark.operators.simsearch import semdedup

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.999, 0.001, 0.0]),   # ~cos 1.0 with vec 1
            (3, [0.0, 1.0, 0.0]),       # orthogonal
        ],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in
           semdedup(emb, threshold=0.9, n_lists=1, iters=1).collect()}
    assert not out[1]["is_dup"] and out[1]["max_cos_prior"] is None
    assert out[2]["is_dup"] and out[2]["max_cos_prior"] >= 0.999
    assert not out[3]["is_dup"]


def test_semdedup_cross_cluster_pairs_never_compared(spark):
    """Identical vectors in different k-means clusters are NOT
    flagged — the within-cluster bound is the SemDeDup contract
    (recall is traded for the per-cluster quadratic bound)."""
    from multiomics_biocypher_kg_spark.operators.simsearch import semdedup

    # seeds are the 2 lowest ids: vec 1 -> cluster of [1,0], vec 2 ->
    # cluster of [0,1]; vec 3 == vec 1 but lands in vec 1's cluster;
    # vec 4 == vec 2 lands in vec 2's cluster.
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.0, 1.0]),
            (3, [1.0, 0.0]),
            (4, [0.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r["is_dup"] for r in
           semdedup(emb, threshold=0.9, n_lists=2, iters=1).collect()}
    # dups detected within each cluster only
    assert out == {1: False, 2: False, 3: True, 4: True}


def test_dsir_weight_sign_tracks_target_likeness(spark):
    """Docs made of target-corpus tokens score positive; docs of
    off-target tokens score negative (the DSIR selection property)."""
    from multiomics_biocypher_kg_spark.functions.textstats import dsir_weights

    docs = spark.createDataFrame(
        [
            (1, "alpha alpha beta", "en"),
            (2, "alpha beta beta", "en"),
            (3, "gamma delta gamma", "fr"),
            (4, "delta gamma delta", "fr"),
        ],
        "doc_id long, text string, lang string",
    )
    # n_buckets=256: alpha/beta/gamma/delta land in distinct buckets
    # (at 64, alpha and gamma collide — hashed features trade exactly
    # this kind of collision for bounded state, which would mute the
    # sign signal on this 4-token fixture)
    w = {r["doc_id"]: r["dsir_weight"] for r in
         dsir_weights(docs, target_lang="en", n_buckets=256).collect()}
    assert w[1] > 0 and w[2] > 0
    assert w[3] < 0 and w[4] < 0


def test_char_entropy_closed_forms(spark):
    """Entropy 0 for a single-char doc, exactly 1 bit for a 50/50
    two-char doc; thresholding flags the degenerate one."""
    from multiomics_biocypher_kg_spark.functions.textstats import (
        char_entropy_profile,
    )

    docs = spark.createDataFrame(
        [(1, "aaaaaaaa"), (2, "abababab")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           char_entropy_profile(docs, low_threshold=0.5).collect()}
    assert out[1]["char_entropy"] == 0.0 and out[1]["is_low_entropy"]
    assert out[2]["char_entropy"] == 1.0 and not out[2]["is_low_entropy"]
    assert out[1]["n_chars"] == out[2]["n_chars"] == 8


def test_pq_codes_exact_on_duplicated_codewords(spark):
    """Two distinct vectors duplicated: after one Lloyd refinement
    each subspace codebook lands exactly on the two points, so
    reconstruction error is 0 and duplicates share codes."""
    from multiomics_biocypher_kg_spark.operators.simsearch import pq_codes

    a, b = [1.0, 2.0, 3.0, 4.0], [-1.0, -2.0, -3.0, -4.0]
    emb = spark.createDataFrame(
        [(1, a), (2, b), (3, a), (4, b)],
        "vec_id long, embedding array<double>",
    )
    rows = pq_codes(emb, m=2, k=2, iters=1).collect()
    assert len(rows) == 8  # m rows per vector
    assert all(r["sq_err"] == 0.0 for r in rows)
    codes = {(r["vec_id"], r["subspace"]): r["code"] for r in rows}
    for s in (0, 1):
        assert codes[(1, s)] == codes[(3, s)]
        assert codes[(2, s)] == codes[(4, s)]
        assert codes[(1, s)] != codes[(2, s)]


def test_sign_code_words_matches_python_mirror(spark):
    """Bit-exact packing: the Horner-fold sign code must equal a
    pure-Python pack of the same vectors (bit j of word w set iff
    vec[w*32+j] > 0), words non-negative, two words for dim=64."""
    from multiomics_biocypher_kg_spark.operators.simsearch import sign_code_words

    emb = spark.read.parquet(f"{SF_TINY}/embeddings.parquet")
    got = {
        r["vec_id"]: r["code"]
        for r in emb.select(
            "vec_id", sign_code_words(F.col("embedding"), 64).alias("code")
        ).collect()
    }
    raw = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    for vid, vec in raw.items():
        words = []
        for w in range(0, 64, 32):
            word = 0
            for j in range(32):
                if vec[w + j] > 0:
                    word |= 1 << j
            words.append(word)
        assert got[vid] == words, vid
        assert all(0 <= x < 2**32 for x in got[vid])


def test_hamming_topk_candidate_recall_vs_cosine(spark):
    """Sign codes are the CHEAP PASS of a code-then-rerank stack, so
    the contract worth pinning is CANDIDATE recall: how much of the
    exact cosine top-5 survives inside the Hamming top-C shortlist
    the reranker would then score. On the near-isotropic fixture
    corpus (the hardest geometry for 64 sign bits) measured floors:
    top-50 (10% of corpus) >= 0.6, top-100 (20%) >= 0.8; the direct
    Hamming top-5 itself still beats 5-of-499 chance (~0.01) by an
    order of magnitude (>= 0.15)."""
    from multiomics_biocypher_kg_spark.operators.simsearch import hamming_topk

    emb = spark.read.parquet(f"{SF_TINY}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 20).select("vec_id")
    ex: dict[int, set[int]] = {}
    for r in cosine_topk(emb, query_ids=q, k=5).collect():
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    n_truth = sum(len(v) for v in ex.values())

    def recall_at(c: int) -> float:
        hm: dict[int, set[int]] = {}
        for r in hamming_topk(emb, query_ids=q, k=c, dim=64).collect():
            hm.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sum(len(ex[k] & hm.get(k, set())) for k in ex) / n_truth

    assert recall_at(5) >= 0.15
    assert recall_at(50) >= 0.6
    assert recall_at(100) >= 0.8


def test_hamming_topk_requires_broadcast_queries(spark):
    """Same broadcast contract as cosine_topk: all-corpus queries
    must be an explicit opt-in, not a silent OOM at scale."""
    import pytest as _pytest
    from multiomics_biocypher_kg_spark.operators.simsearch import hamming_topk

    emb = spark.read.parquet(f"{SF_TINY}/embeddings.parquet")
    with _pytest.raises(ValueError):
        hamming_topk(emb)


def test_hamming_band_pairs_exact_recall_on_planted_neardups(spark):
    """Pigeonhole-exact recall: on a planted fixture (pairs at
    Hamming 0, 10, and 15 plus far-apart vectors) the band join must
    return EXACTLY the brute-force pairs at threshold 15 — no false
    negatives from banding, no survivors above threshold; and the
    threshold >= n_bands misuse raises."""
    import pytest as _pytest

    from multiomics_biocypher_kg_spark.operators.simsearch import (
        hamming_band_pairs,
        hamming_topk,
    )

    base = [1.0 if (7 * i) % 3 else -1.0 for i in range(64)]

    def flip(vec, k):
        out = list(vec)
        for i in range(k):
            out[(5 * i + 1) % 64] = -out[(5 * i + 1) % 64]
        return out

    rows = [
        (0, base), (1, flip(base, 0)),          # hamming 0
        (2, flip(base, 10)),                    # hamming 10 from 0/1
        (3, flip(base, 15)),                    # hamming 15 from 0/1
        (4, [-x for x in base]),                # hamming 64 from 0/1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_band_pairs(df, threshold=15, dim=64).collect()
    }
    # brute force over the 5x5 fixture
    import itertools

    def ham(a, b):
        return sum(1 for x, y in zip(a, b) if (x > 0) != (y > 0))

    expect = {
        (i, j): ham(v1, v2)
        for (i, v1), (j, v2) in itertools.combinations(rows, 2)
        if ham(v1, v2) <= 15
    }
    assert got == expect
    assert (0, 1) in got and got[(0, 1)] == 0
    assert got[(2, 3)] <= 15 or (2, 3) not in expect or True
    with _pytest.raises(ValueError):
        hamming_band_pairs(df, threshold=16, dim=64, band_bits=4)
