"""Deduplication suite for large-scale training-data pipelines.

Exact (hash groupBy), n-gram Jaccard (shared-shingle join),
MinHash+LSH (shingle -> minhash -> band -> bucket join), SimHash
(hamming pairs), and embedding-cosine near-dup.

Scale design (the point of each variant):

- exact: one shuffle keyed by content hash; map-side combine makes
  hot duplicates cheap.
- ngram-jaccard: exact but quadratic in the bucket — the VERIFIER,
  run on candidate pairs only at scale.
- minhash-LSH: the scale path. Signature cost is linear; the only
  shuffle is the band-bucket groupBy; candidate pairs are then
  verified with true Jaccard. Band/row choice (8 bands x 2 rows)
  targets ~0.9 recall at Jaccard 0.5.
- simhash: 60-bit fingerprints; hamming<=k pairs. At scale, pair
  generation goes through band-of-bits buckets (same LSH idea);
  locally the verifier joins all pairs.
- embedding cosine: brute-force verifier here; the scale path is
  sign-LSH bucketing in operators.simsearch.

All content hashes are MD5-derived (functions.hashing) so the DuckDB
oracle computes identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.functions.hashing import (
    BANDS,
    MINHASH_COEFFS,
    R,
    ROWS_PER_BAND,
    md5_long,
)


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: content-hash groupBy; groups with >1 member.

    -> (text_md5, canonical_id = min id, n_dups, member_ids '|'-joined)
    """
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_dups"),
            F.array_join(
                F.array_sort(F.collect_list(F.col(id_col).cast("string"))), "|"
            ).alias("member_ids"),
        )
        .where(F.col("n_dups") > 1)
    )


def shingles(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    distinct: bool = True,
) -> DataFrame:
    """k-word shingles per document: (id, shingle).

    ``distinct=True`` (set semantics — what Jaccard needs) costs a
    full shuffle of the exploded stream; pass ``distinct=False`` for
    consumers that are multiset-invariant (MinHash: min over
    duplicates == min over the set) and dedup later on whatever
    small subset actually needs set semantics."""
    toks = F.split(F.col(text_col), " ")
    sh = F.transform(
        F.sequence(F.lit(0), F.size(toks) - k),
        lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
    )
    out = docs.where(F.size(toks) >= k).select(
        F.col(id_col).alias("id"), F.explode(sh).alias("shingle")
    )
    return out.distinct() if distinct else out


def jaccard_pairs(
    sh: DataFrame, threshold: float, candidates: DataFrame | None = None
) -> DataFrame:
    """Pairwise n-gram Jaccard >= threshold.

    -> (id_a, id_b, jaccard) with id_a < id_b. Exact.

    Precondition: ``sh`` must carry DISTINCT (id, shingle) rows
    (``shingles(..., distinct=True)``, the default): sizes and
    intersections are row counts, so multiset input inflates both.

    Without ``candidates``, pairs come from the shared-shingle
    self-join — quadratic in bucket size, the exhaustive verifier.
    With ``candidates(id_a, id_b)`` (e.g. from LSH), the
    intersection is computed candidates-first: candidates join
    a-shingles join b-shingles — cost |candidates| x shingles/doc
    instead of all co-shingled pairs. That is the scale path.
    """
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    if candidates is None:
        a = sh.select(F.col("id").alias("id_a"), "shingle")
        b = sh.select(F.col("id").alias("id_b"), "shingle")
        inter = (
            a.join(b, "shingle")
            .where(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    else:
        sa = sh.select(F.col("id").alias("id_a"), "shingle")
        sb = sh.select(
            F.col("id").alias("_idb"), F.col("shingle").alias("_shb")
        )
        inter = (
            candidates.select("id_a", "id_b")
            .join(sa, "id_a")
            .join(
                sb,
                (F.col("id_b") == F.col("_idb"))
                & (F.col("shingle") == F.col("_shb")),
            )
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sza"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "szb"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 6
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def containment_pairs(
    sh: DataFrame, threshold: float, candidates: DataFrame | None = None
) -> DataFrame:
    """Asymmetric shingle containment — quote / near-subset
    detection: C(small, big) = |S(a) ∩ S(b)| / min(|S(a)|, |S(b)|).

    -> (id_a, id_b, containment, contained_id) with id_a < id_b and
    containment >= threshold; ``contained_id`` is the smaller
    (quoted) side, ties to id_a. High containment does NOT imply
    high Jaccard (a paragraph quoted inside a long page), which is
    exactly why dedup passes miss quotes and this operator exists.

    Precondition: ``sh`` must carry DISTINCT (id, shingle) rows —
    i.e. ``shingles(..., distinct=True)`` (the default) — exactly
    like ``jaccard_pairs``. Sizes come from ``count(*)`` and the
    intersection from a row-count join, so multiset shingle input
    inflates both and can push containment past 1.0.

    Scale note: plain MinHash-LSH candidates under-recall here for
    the same reason (Jaccard of a small-in-big pair is low). The
    exhaustive path bounds work by co-shingled pairs; at corpus
    scale feed ``candidates`` from a containment-aware generator
    (e.g. LSH over the SMALLER side's shingle sample, or the
    shared-rare-shingle join), then this verifies exactly.
    """
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    if candidates is None:
        a = sh.select(F.col("id").alias("id_a"), "shingle")
        b = sh.select(F.col("id").alias("id_b"), "shingle")
        inter = (
            a.join(b, "shingle")
            .where(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    else:
        sa = sh.select(F.col("id").alias("id_a"), "shingle")
        sb = sh.select(F.col("id").alias("_idb"), F.col("shingle").alias("_shb"))
        inter = (
            candidates.select("id_a", "id_b")
            .join(sa, "id_a")
            .join(
                sb,
                (F.col("id_b") == F.col("_idb"))
                & (F.col("shingle") == F.col("_shb")),
            )
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    return (
        inter.join(
            sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sza"),
            "id_a",
        )
        .join(
            sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "szb"),
            "id_b",
        )
        .withColumn(
            "containment",
            F.round(F.col("inter") / F.least("sza", "szb"), 6),
        )
        .where(F.col("containment") >= threshold)
        .select(
            "id_a",
            "id_b",
            "containment",
            F.when(F.col("sza") <= F.col("szb"), F.col("id_a"))
            .otherwise(F.col("id_b"))
            .alias("contained_id"),
        )
    )


def minhash_signatures(sh: DataFrame) -> DataFrame:
    """WIDE signatures: (id, mh0..mh{N-1}) — all N_HASHES mins in ONE
    aggregation over the shingle stream.

    One pass, one shuffle keyed by id, no row blowup: each shingle
    row evaluates the 16 affine hashes as 16 agg expressions (all
    map-side combined), instead of exploding 16x and re-grouping by
    (id, i). The hash family is compile-time literal — no broadcast
    build job, no join in the plan.

    (A zero-shuffle per-document array-expression variant — 16
    array_min traversals of the per-doc hash array — was
    A/B-measured SLOWER for the full LSH query at sf1.0, 9.0 s vs
    7.1 s best-of-4 interleaved: higher-order array functions
    evaluate interpreted, and the codegen'd explode + map-side-
    combined agg beats them even counting its exchange. The array
    form survives only where it removes work outright — the verify
    sets in :func:`minhash_neardup_pairs`.)
    """
    hashed = sh.select("id", (md5_long(F.col("shingle")) % R).alias("x"))
    return hashed.groupBy("id").agg(
        *[
            F.min((F.lit(a) * F.col("x") + F.lit(b)) % R).alias(f"mh{i}")
            for i, a, b in MINHASH_COEFFS
        ]
    )


def shingle_arrays(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Per-document MULTISET shingle array: (id, sh_arr) — the
    no-explode carrier for the signature and verify paths.

    Same shingle expression as :func:`shingles` (identical strings,
    identical ``size >= k`` document filter) kept as one
    array<string> per document instead of an exploded stream, so
    consumers traverse it with higher-order array expressions —
    no row blowup, no shuffle anywhere in the subtree."""
    toks = F.split(F.col(text_col), " ")
    sh = F.transform(
        F.sequence(F.lit(0), F.size(toks) - k),
        lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
    )
    return docs.where(F.size(toks) >= k).select(
        F.col(id_col).alias("id"), sh.alias("sh_arr")
    )


def banded_buckets(sigs: DataFrame) -> DataFrame:
    """Wide signatures -> (id, band, sig) bucket rows: per-band
    signature strings are pure column concat (no extra shuffle — the
    frame is already one row per id), then a narrow explode."""
    n_hashes = len(MINHASH_COEFFS)
    bands = [
        F.struct(
            F.lit(band).alias("band"),
            F.concat_ws(
                ",",
                *[
                    F.col(f"mh{i}").cast("string")
                    for i in range(
                        band * ROWS_PER_BAND,
                        min((band + 1) * ROWS_PER_BAND, n_hashes),
                    )
                ],
            ).alias("sig"),
        )
        for band in range(BANDS)
    ]
    return sigs.select("id", F.explode(F.array(*bands)).alias("bb")).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.sig").alias("sig")
    )


def lsh_candidate_pairs(sigs: DataFrame) -> DataFrame:
    """Signatures -> band-bucket equi-join -> distinct candidate
    pairs (id_a < id_b)."""
    banded = banded_buckets(sigs)
    a = banded.select(F.col("id").alias("id_a"), "band", "sig")
    b = banded.select(F.col("id").alias("id_b"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def lsh_candidate_pairs_cross(
    sigs_base: DataFrame, sigs_batch: DataFrame
) -> DataFrame:
    """CROSS-CORPUS candidates: batch signatures band-join against
    the (stored) base signature index — (id_a = base id, id_b =
    batch id). The base corpus is touched only through its signature
    table, and batch x batch pairs are never generated: the
    incremental-dedup shape, where yesterday's corpus is an index
    segment and only today's batch is new work."""
    a = banded_buckets(sigs_base).select(
        F.col("id").alias("id_a"), "band", "sig"
    )
    b = banded_buckets(sigs_batch).select(
        F.col("id").alias("id_b"), "band", "sig"
    )
    return a.join(b, ["band", "sig"]).select("id_a", "id_b").distinct()


def incremental_neardup_pairs(
    base_docs: DataFrame,
    batch_docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Incremental MinHash dedup of a NEW batch against an EXISTING
    corpus: signatures per side, cross band-bucket candidates, exact
    Jaccard verify on candidates only (the set-algebra verify of
    ``minhash_neardup_pairs``). Never a base x base or batch x batch
    comparison — cost is linear in the batch plus the candidate
    fraction of the base. In production the base side is the
    persisted signature/ shingle index (``text_minhash_doc_signature``
    is the export of exactly that table), so the base corpus text is
    not re-read at all.

    -> (id_a = base id, id_b = batch id, jaccard >= threshold)
    """
    # one shingle derivation per side (the minhash_neardup_pairs
    # shared-carrier shape): the per-doc array table materializes
    # once, signatures explode it, the verify reads it directly
    sh_base = shingle_arrays(
        base_docs, id_col=id_col, text_col=text_col
    ).localCheckpoint(eager=True)
    sh_batch = shingle_arrays(
        batch_docs, id_col=id_col, text_col=text_col
    ).localCheckpoint(eager=True)
    raw_base = sh_base.select("id", F.explode("sh_arr").alias("shingle"))
    raw_batch = sh_batch.select("id", F.explode("sh_arr").alias("shingle"))
    cands = lsh_candidate_pairs_cross(
        minhash_signatures(raw_base), minhash_signatures(raw_batch)
    ).localCheckpoint()
    # set semantics restored per candidate DOC with array_distinct on
    # the per-doc shingle array (== the former collect_set, order
    # irrelevant downstream) — the second explode + groupBy shuffle
    # of the verify stage is gone; the semi-join is broadcast
    # (candidate ids are pair-table-sized)
    sets_a = (
        sh_base.join(
            F.broadcast(cands.select(F.col("id_a").alias("id")).distinct()),
            "id",
            "leftsemi",
        )
        .select(F.col("id").alias("id_a"), F.array_distinct("sh_arr").alias("sa"))
    )
    sets_b = (
        sh_batch.join(
            F.broadcast(cands.select(F.col("id_b").alias("id")).distinct()),
            "id",
            "leftsemi",
        )
        .select(F.col("id").alias("id_b"), F.array_distinct("sh_arr").alias("sb"))
    )
    scored = (
        cands.join(sets_a, "id_a")
        .join(sets_b, "id_b")
        .withColumn("inter", F.size(F.array_intersect("sa", "sb")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.size("sa") + F.size("sb") - F.col("inter")),
                6,
            ),
        )
    )
    return scored.where(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


def minhash_neardup_pairs(docs: DataFrame, threshold: float, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """MinHash-LSH discovery + exact Jaccard verification computed
    on the candidate pairs only (never all co-shingled pairs).

    Shuffle budget: the signature aggregation runs on the RAW
    (non-distinct) shingle stream — min() is multiset-invariant, so
    the corpus-wide distinct shuffle is skipped entirely — and set
    semantics are restored only on the shingle arrays of candidate
    ids (broadcast semi-join first: a tiny fraction of the corpus).
    The verify is SET-ALGEBRA on per-candidate-doc shingle sets:
    broadcast-semi-join the per-doc shingle ARRAYS
    (:func:`shingle_arrays`) to candidate ids, array_distinct per
    doc (a pure projection — the former second explode +
    collect_set regroup shuffle are both gone; interleaved A/B at
    sf1.0: 7.1 s vs 7.9 s best-of-4, and far lower variance under
    load because one corpus-wide shuffle stage disappeared), then
    |A∩B| via array_intersect on the pair rows — no per-shingle
    pair join at all. The two SMALL intermediates
    (candidate pairs; candidate shingle sets) are
    localCheckpoint()ed: without the barrier every downstream
    reference re-inlines the whole upstream pipeline (measured: 90
    scan nodes in the un-checkpointed plan). With them and the shared
    shingle-array table: exactly ONE corpus scan, zero full-stream
    distincts. On a cluster the checkpoints are the 'persist the
    candidate stage tables' steps of the curation DAG."""
    # ONE shingle derivation feeds both stages: the per-doc shingle
    # ARRAY table is materialized once, the signature path explodes
    # it (codegen) and the verify path array_distincts it — the
    # second corpus scan + re-shingling of the former shape is gone.
    # Interleaved A/B at sf1.0 (best-of-4): 6.57 s -> 5.98 s, with
    # the pass spread collapsing from [6.6, 13.0] to [6.0, 7.9].
    doc_sh = shingle_arrays(docs, id_col=id_col, text_col=text_col).localCheckpoint(
        eager=True
    )
    raw = doc_sh.select("id", F.explode("sh_arr").alias("shingle"))
    cands = lsh_candidate_pairs(minhash_signatures(raw)).localCheckpoint()
    cand_ids = (
        cands.select(F.explode(F.array("id_a", "id_b")).alias("id")).distinct()
    )
    sets = (
        doc_sh.join(F.broadcast(cand_ids), "id", "leftsemi")
        .select("id", F.array_distinct("sh_arr").alias("sh_set"))
        .localCheckpoint()
    )
    scored = (
        cands.join(
            sets.select(F.col("id").alias("id_a"), F.col("sh_set").alias("sa")),
            "id_a",
        )
        .join(
            sets.select(F.col("id").alias("id_b"), F.col("sh_set").alias("sb")),
            "id_b",
        )
        .withColumn("inter", F.size(F.array_intersect("sa", "sb")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.size("sa") + F.size("sb") - F.col("inter")),
                6,
            ),
        )
    )
    return scored.where(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


def simhash64(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 60) -> DataFrame:
    """60-bit SimHash per document (token-frequency weighted).

    bit_j(doc) = 1 iff sum over tokens(count * (bit_j(H(token))*2-1)) > 0.
    Explodes (token x bit) — linear in corpus size * bits, all
    map-side combined before the (id, bit) shuffle. The bit index is
    a literal sequence explode (no broadcast join in the plan).
    A/B-measured ~2.5x FASTER than computing the 60 per-bit sums as
    wide agg expressions (the vectorized explode + hash-agg beats a
    60-term sum(case) chain per input row).
    """
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    )
    tok_h = toks.groupBy("id", "token").agg(F.count(F.lit(1)).alias("w")).withColumn(
        "h", md5_long(F.col("token"))
    )
    per_bit = (
        tok_h.select(
            "id",
            "w",
            "h",
            F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
        )
        .groupBy("id", "bit")
        .agg(
            F.sum(
                F.when(F.expr("(h >> bit) & 1") == 1, F.col("w")).otherwise(
                    -F.col("w")
                )
            ).alias("s")
        )
    )
    return per_bit.groupBy("id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)"))
            .otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )


def simhash_pairs(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """All-pairs hamming<=k VERIFIER (quadratic — test fixtures only).

    The registered / scale path is :func:`simhash_banded_pairs`,
    which returns the identical pair set via band-bucket equi-joins.
    """
    a = hashes.select(F.col("id").alias("id_a"), F.col("simhash").alias("ha"))
    b = hashes.select(F.col("id").alias("id_b"), F.col("simhash").alias("hb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_banded_pairs(
    hashes: DataFrame,
    max_hamming: int = 3,
    bits: int = 60,
    n_bands: int = 4,
) -> DataFrame:
    """Hamming<=k pairs via bit-band bucketing — the scale path.

    Split the ``bits``-bit fingerprint into ``n_bands`` equal bands
    (4 x 15 for the 60-bit default). Pigeonhole: a pair with hamming
    distance <= max_hamming < n_bands differs in at most max_hamming
    bands, so at least one band matches EXACTLY. Equi-joining on
    (band, band_bits) therefore has recall 1.0 — the residual exact
    hamming filter only removes false positives, never true pairs.

    Cost at 100 TB: n_bands rows per doc (linear explode), one
    hash-partitioned equi-join on (band, band_bits); candidate
    volume is the sum of squared bucket sizes — tiny unless the
    corpus has giant exact-duplicate clusters, which exact dedup
    removes upstream. No CartesianProduct anywhere in the plan.

    -> (id_a, id_b, hamming), identical to :func:`simhash_pairs`.
    """
    if max_hamming >= n_bands:
        raise ValueError(
            f"recall 1.0 needs n_bands > max_hamming (got {n_bands} <= {max_hamming})"
        )
    if bits % n_bands != 0:
        # truncated division would leave the top bits outside every
        # band, silently missing pairs that differ only there
        raise ValueError(f"bits ({bits}) must divide evenly into {n_bands} bands")
    width = bits // n_bands
    mask = (1 << width) - 1
    banded = hashes.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bnd).alias("band"),
                        (
                            F.shiftright(F.col("simhash"), bnd * width).bitwiseAND(
                                F.lit(mask)
                            )
                        ).alias("bbits"),
                    )
                    for bnd in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "simhash", F.col("bb.band").alias("band"), F.col("bb.bbits").alias("bbits"))
    a = banded.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("ha"), "band", "bbits"
    )
    b = banded.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("hb"), "band", "bbits"
    )
    return (
        a.join(b, ["band", "bbits"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def keep_best_per_cluster(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Canonical-document selection: collapse each near-duplicate
    cluster (connected components over ``pairs``) to the single
    member worth keeping — the longest document, ties broken by
    smallest id — and report what was dropped. This is the step a
    curation pipeline runs AFTER pair discovery: dedup does not just
    find duplicates, it must pick which copy survives (reference
    analog: the adapters' min-id canonicalisation discipline,
    e.g. ``multiomics_kg/adapters/uniprot_adapter.py`` dedup of
    accessions; here the keep rule is quality-aware rather than
    id-min).

    Scale: components come from pointer-jump CC (O(log n) rounds);
    the quality join touches only clustered docs (semi-join-sized,
    a tiny fraction of the corpus after LSH), and the per-cluster
    argmax is one map-side-combinable ``max(struct(...))`` — no
    window, no sort. Singletons never enter ``pairs`` and are kept
    implicitly; output covers clusters of size >= 2 only.

    -> (cluster_id, kept_doc_id, kept_n_tokens, n_members,
    n_dropped)
    """
    from multiomics_biocypher_kg_spark.operators.canonicalize import (
        connected_components,
    )

    comp = connected_components(pairs, src="id_a", dst="id_b")
    quality = docs.select(
        F.col(id_col).alias("node"),
        F.size(F.split(F.col(text_col), " ")).cast("int").alias("n_tokens"),
    )
    m = comp.join(quality, "node")
    best = F.max(
        F.struct(F.col("n_tokens"), (-F.col("node")).alias("neg_id"))
    ).alias("best")
    return m.groupBy(F.col("component").alias("cluster_id")).agg(
        best, F.count(F.lit(1)).cast("bigint").alias("n_members")
    ).select(
        "cluster_id",
        (-F.col("best.neg_id")).alias("kept_doc_id"),
        F.col("best.n_tokens").alias("kept_n_tokens"),
        "n_members",
        (F.col("n_members") - 1).cast("bigint").alias("n_dropped"),
    )


def line_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_tokens: int = 8,
    max_doc_freq: int = 2,
) -> DataFrame:
    """CCNet-style line-level deduplication: hash every line of
    every document, count how many distinct documents each line
    appears in, and drop lines shared by more than ``max_doc_freq``
    documents — the boilerplate-stripping pass (nav bars, cookie
    banners, footers) that document-level dedup cannot express
    because it operates above line granularity. The synthetic corpus
    has no newlines, so a "line" here is a fixed non-overlapping
    ``line_tokens``-token segment — the segmentation is injective
    per document, which is all the algorithm needs.

    Scale: two shuffles — one distinct-doc count keyed by line hash
    and one per-doc regroup of the surviving lines. The doc-frequency
    table is DISTINCT-LINE-sized (one row per distinct line — the
    same state contract as document-level exact dedup, one
    granularity down), not vocabulary-sized; the join back is an
    equi-join on the line hash, co-partitioned with the agg's own
    exchange, and column pruning keeps the counting subtree to
    (hash, doc_id). The retained text is pinned by md5 so the
    cross-engine compare never hauls full documents.

    -> (doc_id, n_lines, n_dropped, kept_md5)
    """
    arr = F.split(F.col(text_col), " ")
    t = docs.select(
        F.col(id_col).alias("doc_id"), arr.alias("arr"), F.size(arr).alias("n")
    )
    n_seg = F.ceil(F.col("n").cast("double") / line_tokens).cast("long")
    lines = t.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0).cast("long"), n_seg - 1),
                lambda i: F.struct(
                    i.cast("int").alias("line_idx"),
                    F.array_join(
                        F.slice(
                            F.col("arr"),
                            (i * line_tokens + 1).cast("int"),
                            line_tokens,
                        ),
                        " ",
                    ).alias("line"),
                ),
            )
        ).alias("s"),
    ).select("doc_id", "s.line_idx", "s.line", F.md5(F.col("s.line")).alias("h"))
    # the line stream has two consumers (frequency build, probe
    # join): materialize it once instead of re-running the segment
    # explode per consumer (interleaved A/B at sf1.0: 3.10 -> 2.59 s)
    lines = lines.localCheckpoint(eager=True)
    freq = lines.groupBy("h").agg(
        F.countDistinct("doc_id").alias("line_df")
    )
    j = lines.join(freq, "h")
    kept = F.when(F.col("line_df") <= max_doc_freq, F.struct("line_idx", "line"))
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(
            (F.col("line_df") > max_doc_freq).cast("long")
        ).cast("bigint").alias("n_dropped"),
        F.md5(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(kept)), lambda s: s["line"]
                ),
                " ",
            )
        ).alias("kept_md5"),
    )


def span_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 8,
    min_doc_freq: int = 2,
) -> DataFrame:
    """Exact repeated-span detection (the ExactSubstr pass of Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): slide a ``span_tokens``-token window over every
    document (stride 1), hash each window, and mark a window
    DUPLICATED when it occurs in >= ``min_doc_freq`` distinct
    documents. Because stride-1 windows overlap, per-document
    coverage is the INTERVAL UNION of the duplicated windows
    (gaps-and-islands merge), not ``n_dup_spans * span_tokens`` —
    partially-overlapping near-copies are counted exactly once per
    token. This is the span-granular pass document-level dedup and
    line-level dedup both miss: a quoted paragraph inside an
    otherwise-unique page shows up here as a high ``dup_frac`` band,
    while the page survives both other passes.

    Scale: the window stream is ``~n_tokens`` rows per document (the
    same order as the shingle stream the MinHash path already
    materializes); frequency state is DISTINCT-SPAN-sized with
    map-side combine, and the join back is an equi-join on the span
    hash, co-partitioned with the agg's exchange. The island merge is
    one window function PARTITIONED BY document (per-doc sort of the
    doc's own duplicated spans — bounded by document length, never a
    global sort). Within-document repetition does NOT count: the
    frequency is ``countDistinct(doc)`` (the repetition gates already
    cover intra-doc loops).

    -> (doc_id, n_tokens, n_dup_spans, dup_tokens, dup_frac),
    one row per input document (docs shorter than ``span_tokens``
    or with no duplicated span report zeros).
    """
    from pyspark.sql import Window

    arr = F.split(F.col(text_col), " ")
    t = docs.select(
        F.col(id_col).alias("doc_id"), arr.alias("arr"), F.size(arr).alias("n")
    )
    spans = t.where(F.col("n") >= span_tokens).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0).cast("long"), (F.col("n") - span_tokens).cast("long")
                ),
                lambda i: F.struct(
                    i.alias("start_idx"),
                    F.md5(
                        F.array_join(
                            F.slice(F.col("arr"), (i + 1).cast("int"), span_tokens),
                            " ",
                        )
                    ).alias("h"),
                ),
            )
        ).alias("s"),
    ).select("doc_id", "s.start_idx", "s.h")
    # two consumers of the span stream (frequency build, dup join) —
    # materialize once, same pattern as line_dedup
    spans = spans.localCheckpoint(eager=True)
    freq = spans.groupBy("h").agg(F.countDistinct("doc_id").alias("span_df"))
    dup = (
        spans.join(freq.where(F.col("span_df") >= min_doc_freq), "h")
        .select(
            "doc_id",
            F.col("start_idx"),
            (F.col("start_idx") + span_tokens - 1).alias("end_idx"),
        )
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("start_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = dup.withColumn(
        "new_island",
        (
            F.col("start_idx")
            > F.coalesce(F.max("end_idx").over(w_prev), F.lit(-1).cast("long"))
        ).cast("long"),
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("start_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    isl = isl.withColumn("island", F.sum("new_island").over(w_run))
    per_doc = (
        isl.groupBy("doc_id", "island")
        .agg(
            (F.max("end_idx") - F.min("start_idx") + 1).alias("covered"),
            F.count(F.lit(1)).alias("spans"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("covered").cast("long").alias("dup_tokens"),
            F.sum("spans").cast("long").alias("n_dup_spans"),
        )
    )
    return (
        t.select("doc_id", F.col("n").cast("long").alias("n_tokens"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_dup_spans", F.lit(0).cast("long")).alias("n_dup_spans"),
            F.coalesce("dup_tokens", F.lit(0).cast("long")).alias("dup_tokens"),
            (
                F.coalesce("dup_tokens", F.lit(0).cast("long")).cast("double")
                / F.col("n_tokens")
            ).alias("dup_frac"),
        )
    )


def prefix_filter_pairs(
    items: DataFrame,
    threshold: float = 0.8,
) -> DataFrame:
    """EXACT set-similarity join via prefix filtering (the AllPairs /
    PPJoin candidate scheme of Bayardo et al. 2007 / Xiao et al.
    2008) — the classic exact alternative to MinHash-LSH: no false
    negatives BY THEOREM, no signature/band tuning. Order every set's
    elements by ascending global frequency (rarest first, ties by
    element string — one total order shared by all sets); a pair with
    ``J >= t`` MUST share an element within each side's first
    ``sz - ceil(t * sz) + 1`` elements, so only prefix elements
    generate candidates, and the rare-element-first prefix keeps
    candidate buckets small exactly where shared-element buckets
    would explode. Candidates are then verified with the exact
    intersection count.

    ``items`` carries DISTINCT (id, tok) rows — the set elements
    (e.g. the 3-gram shingle stream from :func:`shingles`, renamed).
    Same precondition as :func:`jaccard_pairs`: multiset input
    inflates sizes and intersections.

    -> (id_a, id_b, inter, sz_a, sz_b, jaccard) with id_a < id_b,
    jaccard >= threshold (rounded to 6 before the filter, matching
    ``jaccard_pairs``). Identical result set to the brute-force
    all-pairs join, at a fraction of the candidate volume.

    Scale: the frequency "ordering" is a JOIN against the element-
    frequency table (no global rank, no single-task sort); the
    per-set position window partitions by id (bounded by set size);
    candidate generation touches only prefix elements, whose buckets
    are the RAREST elements' postings. The verify join is candidates
    x elements-per-set, same contract as :func:`jaccard_pairs`.
    """
    from pyspark.sql import Window

    toks = items.select("id", "tok")
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))
    sized = toks.join(freq, "tok")
    w = Window.partitionBy("id").orderBy(F.asc("tf"), F.asc("tok"))
    pos = sized.select(
        "id",
        "tok",
        F.row_number().over(w).alias("pos"),
        F.count(F.lit(1)).over(Window.partitionBy("id")).alias("sz"),
    )
    pref = pos.where(
        F.col("pos")
        <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
    )
    cands = (
        pref.select(F.col("id").alias("id_a"), "tok")
        .join(pref.select(F.col("id").alias("id_b"), "tok"), "tok")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    a = toks.select(F.col("id").alias("id_a"), "tok")
    b = toks.select(F.col("id").alias("id_b"), "tok")
    inter = (
        cands.join(a, "id_a")
        .join(b, ["id_b", "tok"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sizes = toks.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    return (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "inter", "sz_a", "sz_b", "jaccard")
    )


def ngram_contamination(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 13,
) -> DataFrame:
    """Benchmark-contamination audit (the GPT-3 appendix-C / PaLM
    decontamination rule): an eval document is contaminated when any
    of its ``ngram``-token stride-1 windows appears verbatim in the
    training corpus. 13 tokens is the published operating point —
    long enough that chance collisions are negligible, short enough
    to catch partial quotes document-level dedup misses.

    -> one row per eval document:
    (doc_id, n_grams, n_contaminated, contam_frac, is_contaminated)
    where ``n_grams`` counts the doc's DISTINCT 13-gram hashes and
    ``n_contaminated`` the ones found anywhere in train. Eval docs
    shorter than ``ngram`` tokens report zeros.

    Scale: the asymmetry is the whole design. Eval sets are
    fixed-size benchmarks (thousands of docs) while train is the
    100 TB side, so the DISTINCT eval gram set is BROADCAST and the
    training corpus is consumed as a STREAM — its gram stream is
    map-generated in the scan projection, hash-probed against the
    broadcast, and only collisions (tiny) ever reach a shuffle
    (the per-doc distinct + count). No train-side groupBy, no
    train-side distinct, one pass over the corpus.
    """
    def grams(docs: DataFrame) -> DataFrame:
        arr = F.split(F.col(text_col), " ")
        t = docs.select(
            F.col(id_col).alias("doc_id"),
            arr.alias("arr"),
            F.size(arr).alias("n"),
        )
        return t.where(F.col("n") >= ngram).select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(0).cast("long"),
                        (F.col("n") - ngram).cast("long"),
                    ),
                    lambda i: F.md5(
                        F.array_join(
                            F.slice(F.col("arr"), (i + 1).cast("int"), ngram),
                            " ",
                        )
                    ),
                )
            ).alias("h"),
        )

    eval_grams = grams(eval_docs).distinct()
    per_eval = eval_grams.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams")
    )
    hits = (
        grams(train_docs)
        .select("h")
        .join(F.broadcast(eval_grams), "h")
        .select("doc_id", "h")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    base = eval_docs.select(F.col(id_col).alias("doc_id"))
    # both report joins are eval-set-sized (per-doc aggregates of the
    # fixed benchmark side) — broadcast them so the whole plan stays
    # SortMergeJoin-free (plan-asserted in tests/test_plans.py)
    return (
        base.join(F.broadcast(per_eval), "doc_id", "left")
        .join(F.broadcast(hits), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0).cast("long")).cast("long").alias("n_grams"),
            F.coalesce("n_contaminated", F.lit(0).cast("long"))
            .cast("long")
            .alias("n_contaminated"),
        )
        .withColumn(
            "contam_frac",
            F.when(F.col("n_grams") > 0,
                   F.col("n_contaminated").cast("double") / F.col("n_grams"))
            .otherwise(F.lit(0.0)),
        )
        .withColumn("is_contaminated", F.col("n_contaminated") > 0)
    )
