"""Similarity search over an embedding column (array<float/double>).

- ``cosine_topk``: brute-force exact top-k — the correctness
  baseline and the verifier for ANN variants. Queries are broadcast;
  the corpus is scanned once; per-pair dot products are native
  zip_with/aggregate expressions (JVM codegen, no Python).
- ``lsh_bucketed_topk``: the scale path — sign-LSH (random-ish but
  DETERMINISTIC hyperplanes derived from (plane, dim) parity
  formulas) buckets the corpus; candidates = same-bucket vectors,
  then exact re-rank. Recall tested against brute force in pytest.
- ``knn_classify`` / ``label_centroids``: the two downstream
  consumers (majority-vote classification, per-label centroids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

N_PLANES = 4
N_TABLES = 8


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_topk(
    vectors: DataFrame,
    query_ids: DataFrame | None = None,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    allow_full_corpus_queries: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    -> (query_id, neighbor_id, cosine, rank); ties broken by
    neighbor id. Self-matches excluded.

    CONTRACT: the query side is BROADCAST — ``query_ids`` must be a
    broadcast-safe subset. ``query_ids=None`` would ship the entire
    corpus to every task (OOM at real scale), so it raises unless
    ``allow_full_corpus_queries=True`` is passed explicitly (test
    fixtures); the all-vectors case belongs to
    :func:`lsh_bucketed_topk`, whose bucket equi-join needs no
    broadcast at all.
    """
    if query_ids is None and not allow_full_corpus_queries:
        raise ValueError(
            "cosine_topk broadcasts the query side: pass query_ids (a "
            "broadcast-safe subset) or use lsh_bucketed_topk for "
            "all-vectors top-k; allow_full_corpus_queries=True overrides "
            "for small fixtures only"
        )
    base = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("nv", _norm(F.col("v")))
    q = vectors.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    if query_ids is not None:
        q = q.join(F.broadcast(query_ids), q.query_id == query_ids[query_ids.columns[0]], "leftsemi")
    q = q.withColumn("nq", _norm(F.col("qv")))
    scored = (
        base.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(_dot(F.col("v"), F.col("qv")) / (F.col("nv") * F.col("nq")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _plane_sign(table: int, plane: int, dim_col):
    """Deterministic ±1 hyperplane entry for (table, plane, dim):
    fixed affine mix parity. Same closed form is renderable in SQL."""
    mix = (F.lit((table * 131 + plane) * 2654435761) + dim_col * 40503) % 97
    return F.when(mix % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))


def lsh_bucket(vec_col, table: int, n_planes: int = N_PLANES):
    """Sign-LSH bucket id (0..2^n_planes-1) for one hash table."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.transform(
                    F.sequence(F.lit(0), F.size(vec_col) - 1),
                    lambda d: _plane_sign(table, p, d),
                ),
                lambda x, s: x * s,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_bucketed_topk(
    vectors: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = N_TABLES,
) -> DataFrame:
    """ANN: multi-table sign-LSH bucketing, exact re-rank on the
    candidate union (classic LSH: T independent tables of p planes —
    recall 1-(1-s^p)^T for same-side probability s).

    At 100 TB the (table, bucket) equi-join replaces the cross join:
    per-table candidate sets shrink by ~2^p, and T tables recover
    recall. Each vector appears T times (explode by table) — linear
    blowup, hash-partitioned by bucket, no skew beyond data skew
    (AQE splits hot buckets).
    """
    tables = _lsh_tables(vectors, id_col, vec_col, n_tables, N_PLANES)
    a = tables.select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"), F.col("nv").alias("nq"), "t", "b"
    )
    b = tables.select(F.col("id").alias("neighbor_id"), "v", "nv", "t", "b")
    cands = (
        a.join(b, ["t", "b"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qv", "nq", "neighbor_id", "v", "nv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.withColumn(
        "cosine",
        F.round(_dot(F.col("v"), F.col("qv")) / (F.col("nv") * F.col("nq")), 6),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _lsh_tables(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    n_tables: int,
    n_planes: int,
) -> DataFrame:
    """(id, v, nv, t, b): each vector exploded into its n_tables
    (table, sign-LSH bucket) assignments — the linear-cost discovery
    index shared by ANN top-k and near-dup pair generation."""
    v = vectors.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("nv", _norm(F.col("v")))
    return v.select(
        "id",
        "v",
        "nv",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("t"),
                        lsh_bucket(F.col("v"), t, n_planes).alias("b"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select("id", "v", "nv", F.col("tb.t").alias("t"), F.col("tb.b").alias("b"))


def embedding_neardup_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = N_TABLES,
    n_planes: int = N_PLANES,
) -> DataFrame:
    """Embedding near-dup pairs: sign-LSH candidate discovery + exact
    cosine verification on candidates only — the scale path (mirrors
    the MinHash-LSH pattern in operators.dedup).

    Candidates = pairs sharing a (table, bucket) cell in any of
    n_tables independent p-plane tables; expected recall for
    same-side probability s = 1-(1-s^p)^T. The cosine is then exact,
    so precision vs brute force is 1.0 by construction. At 100 TB the
    (t, b) equi-join replaces the quadratic crossJoin: per-table
    candidate volume shrinks ~2^p x, AQE splits hot buckets.

    -> (id_a, id_b, cosine) with id_a < id_b, cosine >= threshold.
    """
    tables = _lsh_tables(vectors, id_col, vec_col, n_tables, n_planes)
    a = tables.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nv").alias("na"), "t", "b"
    )
    b = tables.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nv").alias("nb"), "t", "b"
    )
    cands = (
        a.join(b, ["t", "b"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "va", "na", "id_b", "vb", "nb")
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cands.withColumn(
            "cosine",
            F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6),
        )
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def knn_classify(
    vectors: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_ids: DataFrame | None = None,
    allow_full_corpus_queries: bool = False,
) -> DataFrame:
    """k-NN majority-vote label per vector (tie -> smaller label).
    Inherits cosine_topk's broadcast contract: pass ``query_ids``
    (broadcast-safe) or opt in explicitly for fixtures."""
    topk = cosine_topk(
        vectors,
        query_ids=query_ids,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        allow_full_corpus_queries=allow_full_corpus_queries,
    )
    labeled = topk.join(
        vectors.select(
            F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("nb_label")
        ),
        "neighbor_id",
    )
    votes = labeled.groupBy("query_id", "nb_label").agg(F.count(F.lit(1)).alias("votes"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("nb_label").asc()
    )
    pred = (
        votes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("query_id", F.col("nb_label").alias("pred_label"))
    )
    return pred.join(
        vectors.select(
            F.col(id_col).alias("query_id"), F.col(label_col).alias("true_label")
        ),
        "query_id",
    )


def label_centroids(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label centroid via posexplode + (label, dim) mean; returns
    (label, n_vectors, centroid_norm) — the array-op pattern without
    shipping arrays to the comparator."""
    exploded = vectors.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "x"),
    )
    per_dim = exploded.groupBy("label", "dim").agg(F.avg("x").alias("m"))
    return (
        per_dim.groupBy("label")
        .agg(F.round(F.sqrt(F.sum(F.col("m") * F.col("m"))), 6).alias("centroid_norm"))
        .join(
            vectors.groupBy(F.col(label_col).alias("label")).agg(
                F.count(F.lit(1)).alias("n_vectors")
            ),
            "label",
        )
        .select("label", "n_vectors", "centroid_norm")
    )


# ── IVF (inverted-file) ANN ──────────────────────────────────────────


def _sq_dist_lit(vec_col, centroid: list[float]):
    arr = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec_col, arr, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _ivf_assign(v: DataFrame, cents: list[list[float]]) -> DataFrame:
    """Nearest-centroid list id (ties -> smallest list id). Centroids
    are literal arrays — tiny (n_lists x dim), compiled into the
    expression; the vector table is scanned once, no join."""
    dist_arr = F.array(*[_sq_dist_lit(F.col("v"), c) for c in cents])
    best = F.array_position(dist_arr, F.array_min(dist_arr))
    return v.withColumn("list_id", (best - 1).cast("int"))


def ivf_index(
    vectors: DataFrame,
    n_lists: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """Deterministic IVF index: k-means with FIXED init (the n_lists
    lowest-id vectors) and a FIXED iteration count — reproducible
    across runs/engines, no RNG.

    Returns (assignments(id, v, nv, list_id), centroids). Lloyd steps
    are two scans per iteration: assign (literal-centroid argmin,
    map-only) + per-dim mean (posexplode, map-side combined). The
    centroid table is n_lists x dim floats — driver-size by
    construction, shipped back as expression literals.
    """
    v = vectors.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("nv", _norm(F.col("v")))
    cents = [list(r.v) for r in v.orderBy("id").limit(n_lists).collect()]
    # a corpus smaller than n_lists yields fewer seed centroids
    n_lists = len(cents)
    if n_lists == 0:
        raise ValueError("ivf_index: empty vector table")
    for _ in range(iters):
        assigned = _ivf_assign(v, cents)
        per_dim = (
            assigned.select("list_id", F.posexplode("v").alias("pos", "x"))
            .groupBy("list_id", "pos")
            .agg(F.avg("x").alias("m"))
        )
        new = {}
        for r in per_dim.collect():
            new.setdefault(r.list_id, {})[r.pos] = r.m
        cents = [
            [new[i][p] for p in sorted(new[i])] if i in new else cents[i]
            for i in range(n_lists)
        ]
    return _ivf_assign(v, cents), cents


def ivf_topk(
    vectors: DataFrame,
    k: int = 5,
    n_lists: int = 8,
    n_probe: int = 2,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: probe the n_probe nearest inverted lists per query,
    exact cosine re-rank on candidates only.

    At scale the corpus is partitioned (bucketed) by list_id, so a
    query touches n_probe/n_lists of the data; probe selection is a
    literal-centroid argsort per query (map-only) and candidates come
    from an equi-join on list_id after exploding the probe set —
    never an array_contains nested-loop join. Recall/cost dial:
    n_probe (n_probe = n_lists degenerates to exact search).
    """
    assigned, cents = ivf_index(
        vectors, n_lists=n_lists, iters=iters, id_col=id_col, vec_col=vec_col
    )
    dist_structs = F.array(
        *[
            F.struct(
                _sq_dist_lit(F.col("qv"), c).alias("d"), F.lit(i).alias("l")
            )
            for i, c in enumerate(cents)
        ]
    )
    probes = F.slice(
        F.transform(F.array_sort(dist_structs), lambda s: s["l"]), 1, n_probe
    )
    q = (
        assigned.select(
            F.col("id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nv").alias("nq"),
        )
        .withColumn("list_id", F.explode(probes))
    )
    cand = (
        q.join(
            assigned.select(
                F.col("id").alias("neighbor_id"), "v", "nv", "list_id"
            ),
            "list_id",
        )
        .where(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn(
        "cosine",
        F.round(_dot(F.col("v"), F.col("qv")) / (F.col("nv") * F.col("nq")), 6),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def semdedup(
    vectors: DataFrame,
    threshold: float = 0.6,
    n_lists: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by k-means clustering + WITHIN-CLUSTER pairwise
    cosine — the scale trick that makes embedding dedup tractable is
    that the quadratic comparison is bounded per cluster, never
    corpus-wide. Reuses the deterministic fixed-init Lloyd index
    (``ivf_index``), so the clustering itself is oracle-gated.

    Keep rule (deterministic, engine-independent): a vector is a
    semantic duplicate iff some LOWER-id vector in the same cluster
    has cosine >= threshold — i.e. keep the lowest id of each
    near-dup family, the same greedy-by-id convention as the
    MinHash/SimHash dedup family.

    At 100 TB: bucket the corpus by ``list_id`` and the pair join is
    cluster-co-located (no corpus-wide shuffle); cluster sizes are
    balanced by the k-means objective, and a hot cluster can be
    re-split by raising n_lists (or salting on a secondary hash).

    -> (vec_id, list_id, is_dup, max_cos_prior) — one row per input
    vector; ``max_cos_prior`` is the strongest lower-id same-cluster
    cosine at/above threshold (NULL for keepers).
    """
    assigned, _ = ivf_index(
        vectors, n_lists=n_lists, iters=iters, id_col=id_col, vec_col=vec_col
    )
    a = assigned.select(
        F.col("id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("nv").alias("na"),
        "list_id",
    )
    b = assigned.select(
        F.col("id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("nv").alias("nb"),
        "list_id",
    )
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    dups = (
        a.join(b, "list_id")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_b", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
        .groupBy("id_b")
        .agg(F.max("cosine").alias("mx"))
    )
    return (
        assigned.join(dups, assigned["id"] == dups["id_b"], "left")
        .select(
            F.col("id").alias(id_col),
            "list_id",
            F.col("id_b").isNotNull().alias("is_dup"),
            F.round("mx", 6).alias("max_cos_prior"),
        )
    )


def pq_codes(
    vectors: DataFrame,
    m: int = 4,
    k: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product quantization (Jegou et al., TPAMI 2011) — the
    compressed-vector representation IVF systems pair with inverted
    lists (IVF-PQ): split each vector into ``m`` contiguous
    subspaces, learn a ``k``-codebook per subspace with the SAME
    deterministic fixed-init Lloyd used by ``ivf_index``, and emit
    each vector's per-subspace code + squared reconstruction error.
    m codes of log2(k) bits replace the float vector (here 4x3 bits
    vs 64 doubles) for in-memory distance tables.

    Scale shape: each subspace's codebook fit runs on the SLICED
    column (slice() in the scan projection — no copy of the full
    vector shuffles anywhere); codebooks are k x (dim/m) literals
    collected driver-side (bounded, like ivf_index's centroids), and
    encoding is a map-only literal-argmin pass. The m fits are
    independent jobs over the same cached scan.

    -> (vec_id, subspace, code, sq_err) — m rows per vector;
    ``sq_err`` rounded to 6 (sum over the subspace's dims).
    """
    v = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("full"),
    )
    dim = len(v.select("full").first()["full"])
    if dim % m != 0:
        raise ValueError(f"pq_codes: dim {dim} not divisible by m={m}")
    sub_d = dim // m
    outs = []
    for s in range(m):
        sub = v.select(
            "id", F.slice("full", s * sub_d + 1, sub_d).alias("v")
        )
        assigned, cents = ivf_index(
            sub, n_lists=k, iters=iters, id_col="id", vec_col="v"
        )
        dist_arr = F.array(*[_sq_dist_lit(F.col("v"), c) for c in cents])
        outs.append(
            assigned.select(
                F.col("id").alias(id_col),
                F.lit(s).alias("subspace"),
                F.col("list_id").alias("code"),
                F.round(
                    F.element_at(dist_arr, F.col("list_id") + 1), 6
                ).alias("sq_err"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def matryoshka_eval(
    vectors: DataFrame,
    dims: tuple[int, ...] = (64, 32, 16),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka (MRL) truncation audit: how much cosine structure
    survives keeping only the first k dimensions — the measurement
    that decides whether an index can serve d/2- or d/4-dim
    prefixes of its embeddings (Kusupati et al. 2022). Pairs are the
    deterministic adjacent-id chain (vec i vs i+1): a fixed,
    synthesis-free probe set with one pair per vector.

    -> one row per truncation level:
    (trunc_dim, n_pairs, avg_cos, avg_abs_delta, avg_norm_frac)
    where avg_abs_delta averages |cos_k - cos_full| over pairs and
    avg_norm_frac averages the retained-norm fraction of the pair's
    first vector.

    Scale: the pair join is a co-partitioned equi-join on the id
    chain; every per-pair metric is a pure array expression in the
    join projection (zip_with/aggregate — zero Python); the final
    state is len(dims) rows via map-side-combined avg. Summation
    order inside each dot product is the array order in BOTH
    engines, so values match before rounding.
    """
    e = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    v = vectors.select(F.col(id_col).alias("vid"), e.alias("e"))
    b = v.select((F.col("vid") - 1).alias("vid"), F.col("e").alias("eb"))
    pairs = v.join(b, "vid").select("e", "eb")
    kdf = pairs.select(
        "e",
        "eb",
        F.explode(F.array(*[F.lit(k) for k in dims])).alias("trunc_dim"),
    )
    sa = F.slice(F.col("e"), F.lit(1), F.col("trunc_dim"))
    sb = F.slice(F.col("eb"), F.lit(1), F.col("trunc_dim"))
    cos_k = _dot(sa, sb) / (_norm(sa) * _norm(sb))
    cos_full = _dot(F.col("e"), F.col("eb")) / (
        _norm(F.col("e")) * _norm(F.col("eb"))
    )
    nf = _norm(sa) / _norm(F.col("e"))
    return (
        kdf.select(
            "trunc_dim",
            cos_k.alias("ck"),
            cos_full.alias("cf"),
            nf.alias("nf"),
        )
        .groupBy("trunc_dim")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("ck"), 6).alias("avg_cos"),
            F.round(F.avg(F.abs(F.col("ck") - F.col("cf"))), 6).alias(
                "avg_abs_delta"
            ),
            F.round(F.avg("nf"), 6).alias("avg_norm_frac"),
        )
    )


def ivfpq_topk(
    vectors: DataFrame,
    k: int = 5,
    n_lists: int = 8,
    n_probe: int = 3,
    coarse_iters: int = 2,
    m: int = 4,
    pq_k: int = 8,
    pq_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ ANN with asymmetric distance computation (ADC) — the
    billion-vector search shape (Jegou et al., TPAMI 2011): a coarse
    IVF index routes each query to ``n_probe`` inverted lists, and
    candidate distances are approximated from m-subspace PQ codes
    via per-query lookup tables instead of touching raw vectors.

    Scale shape (the point of IVF-PQ): the database side carries
    ONLY (id, list_id, m small int codes) — the raw vectors never
    shuffle. Codebooks (coarse + per-subspace) are driver-bounded
    literals compiled into expressions, so code assignment and the
    per-query LUT (pq_k literal distances per subspace) are map-only
    projections in whole-stage codegen; the single shuffle is the
    probe equi-join on list_id. approx distance = sum over subspaces
    of LUT[code] — a fixed-order chain of element_at adds, mirrored
    left-associatively by the oracle.

    -> (query_id, neighbor_id, approx_sq_dist, rank), top-k per
    query by (unrounded approx asc, neighbor_id asc).
    """
    assigned, coarse_cents = ivf_index(
        vectors, n_lists=n_lists, iters=coarse_iters, id_col=id_col, vec_col=vec_col
    )
    dim = len(assigned.select("v").first()["v"])
    if dim % m != 0:
        raise ValueError(f"ivfpq_topk: dim {dim} not divisible by m={m}")
    sub_d = dim // m
    codebooks = []
    for s in range(m):
        sub = assigned.select("id", F.slice("v", s * sub_d + 1, sub_d).alias("v"))
        _, cents_s = ivf_index(sub, n_lists=pq_k, iters=pq_iters, id_col="id", vec_col="v")
        codebooks.append(cents_s)

    def _sub(col, s):
        return F.slice(col, s * sub_d + 1, sub_d)

    # db side: coarse list + m codes, all literal-argmin map-only
    code_cols = []
    for s, cents_s in enumerate(codebooks):
        dist_arr = F.array(*[_sq_dist_lit(_sub(F.col("v"), s), c) for c in cents_s])
        code_cols.append(
            (F.array_position(dist_arr, F.array_min(dist_arr)) - 1)
            .cast("int")
            .alias(f"code{s}")
        )
    db = assigned.select(F.col("id").alias("neighbor_id"), "list_id", *code_cols)

    # query side: probe lists + per-subspace LUT arrays (pq_k literal
    # squared distances each), also map-only
    dist_structs = F.array(
        *[
            F.struct(_sq_dist_lit(F.col("v"), c).alias("d"), F.lit(i).alias("l"))
            for i, c in enumerate(coarse_cents)
        ]
    )
    probes = F.slice(
        F.transform(F.array_sort(dist_structs), lambda s: s["l"]), 1, n_probe
    )
    lut_cols = [
        F.array(*[_sq_dist_lit(_sub(F.col("v"), s), c) for c in cents_s]).alias(
            f"lut{s}"
        )
        for s, cents_s in enumerate(codebooks)
    ]
    q = assigned.select(
        F.col("id").alias("query_id"), F.explode(probes).alias("list_id"), *lut_cols
    )
    approx = F.element_at(F.col("lut0"), F.col("code0") + 1)
    for s in range(1, m):
        approx = approx + F.element_at(F.col(f"lut{s}"), F.col(f"code{s}") + 1)
    # no dedup needed: each db vector lives in exactly one inverted
    # list and the probe set per query is distinct, so (query_id,
    # neighbor_id) pairs are unique by construction
    cand = (
        q.join(db, "list_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("approx", approx)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx").asc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("approx", 6).alias("approx_sq_dist"),
            "rank",
        )
    )


# ── Per-label centroid-distance outliers ─────────────────────────────


def label_outliers(
    vectors: DataFrame,
    z: float = 2.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label embedding outliers: distance of every vector to its
    label centroid, flagged when dist > mean + z * stddev within the
    label — the mislabeled-example / embedding-drift audit a training
    pipeline runs before a fine-tune batch ships.

    Shape: posexplode -> per-(label, dim) mean (vocabulary-sized:
    |labels| x dim rows) joined back on (label, dim) — the centroid
    table broadcasts; per-vector distances re-aggregate by id; the
    per-label mean/stddev is a second tiny aggregate joined back on
    label. Two corpus passes over the exploded stream, zero Python.
    Output: (vec_id, label, dist, is_outlier).
    """
    exploded = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "x"),
    )
    cent = exploded.groupBy("label", "dim").agg(F.avg("x").alias("m"))
    dists = (
        exploded.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(F.sqrt(F.sum((F.col("x") - F.col("m")) * (F.col("x") - F.col("m")))).alias("dist"))
    )
    stats = dists.groupBy("label").agg(
        F.avg("dist").alias("mu"), F.stddev_samp("dist").alias("sd")
    )
    return dists.join(F.broadcast(stats), "label").select(
        "vec_id",
        "label",
        F.round("dist", 6).alias("dist"),
        (F.col("dist") > F.col("mu") + F.lit(z) * F.col("sd")).cast("int").alias(
            "is_outlier"
        ),
    )


# ── Random projection (Johnson–Lindenstrauss) ────────────────────────


def random_projection(
    vectors: DataFrame,
    out_dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-matrix random projection to ``out_dim`` dims:
    y_j = sum_i s(i, j) * x_i / sqrt(out_dim) with s(i, j) = +/-1
    derived from MD5 of (i, j) — the matrix is a pure hash EXPRESSION
    (never materialized or broadcast as data), so the projection is
    one exploded-stream join against an (in_dim x out_dim) literal-
    free grid plus one keyed sum. Returns (vec_id, j, y) long format.

    This is the dimensionality-reduction front half of the JL lemma;
    at 10^9 vectors it is a map-side-combinable aggregate keyed by
    (vec_id, j) — no shuffle of raw vectors beyond the one the
    consumer already pays."""
    from multiomics_biocypher_kg_spark.functions.hashing import md5_long

    ex = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("i", "x"),
    )
    js = F.explode(F.array(*[F.lit(j) for j in range(out_dim)])).alias("j")
    sign = 1 - 2 * (
        md5_long(
            F.concat(
                F.lit("jl|"), F.col("i").cast("string"), F.lit("|"), F.col("j").cast("string")
            )
        )
        % 2
    )
    return (
        ex.select("vec_id", "i", "x", js)
        .groupBy("vec_id", "j")
        .agg(
            (F.sum(F.col("x") * sign) / F.lit(float(out_dim) ** 0.5)).alias("y")
        )
    )


def jl_distortion_pairs(
    vectors: DataFrame,
    out_dim: int,
    sample_mod: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """JL distortion audit on a deterministic hash SAMPLE of vectors:
    for every sampled pair, the original and projected Euclidean
    distances and their ratio — the empirical check of the
    (1 +/- eps) JL guarantee that calibrates out_dim before a
    10^9-vector deployment. The all-pairs stage runs on the SAMPLE
    only (audit scale, the data_bitext_mine eval-scale contract);
    distances are keyed joins on the dimension index."""
    sampled = vectors.where((F.col(id_col) % sample_mod) == 0)
    ex = sampled.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("i", "x"),
    )
    proj = random_projection(sampled, out_dim, id_col=id_col, vec_col=vec_col)
    # pair enumeration happens INSIDE the dimension-keyed joins below
    # (a < b filter on the shared dim join) — no separate cross join.
    d_orig = (
        ex.select(F.col("vec_id").alias("vec_a"), "i", F.col("x").alias("xa"))
        .join(
            ex.select(F.col("vec_id").alias("vec_b"), "i", F.col("x").alias("xb")),
            "i",
        )
        .where(F.col("vec_a") < F.col("vec_b"))
        .groupBy("vec_a", "vec_b")
        .agg(F.sqrt(F.sum((F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")))).alias("d_orig"))
    )
    d_proj = (
        proj.select(F.col("vec_id").alias("vec_a"), "j", F.col("y").alias("ya"))
        .join(
            proj.select(F.col("vec_id").alias("vec_b"), "j", F.col("y").alias("yb")),
            "j",
        )
        .where(F.col("vec_a") < F.col("vec_b"))
        .groupBy("vec_a", "vec_b")
        .agg(F.sqrt(F.sum((F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb")))).alias("d_proj"))
    )
    return (
        d_orig.join(d_proj, ["vec_a", "vec_b"])
        .select(
            "vec_a",
            "vec_b",
            F.round("d_orig", 6).alias("d_orig"),
            F.round("d_proj", 6).alias("d_proj"),
            F.round(F.col("d_proj") / F.col("d_orig"), 6).alias("distortion"),
        )
    )


def sign_code_words(vec_col, dim: int, word_bits: int = 32):
    """Pack a float vector's sign pattern into ``ceil(dim/word_bits)``
    non-negative integer words: bit ``j`` of word ``w`` is 1 iff
    ``vec[w*word_bits + j] > 0`` (sign binarization — the zero-cost
    binary embedding every Hamming-space ANN starts from).

    32-bit words, not 64, on purpose: every word stays strictly
    below 2^32, so the packing is portable to engines whose BIGINT
    shift traps on the sign bit (DuckDB raises on ``1 << 63``) and
    the Horner fold below can never overflow a long. The cost vs
    64-bit words is one extra xor+popcount per 64 dims — noise next
    to the 32x scan-width reduction the codes buy in the first
    place (a 64-dim float vector is 256 B; its code is 8 B).

    The per-word fold is Horner over DESCENDING bit positions
    (``acc*2 + bit``) — all-integer, whole-stage-codegen, and it
    sidesteps shiftleft-by-a-column (PySpark's ``shiftleft`` only
    accepts a literal shift amount).
    """
    words = []
    for w in range(0, dim, word_bits):
        hi = min(dim, w + word_bits) - 1
        word = F.aggregate(
            F.sequence(F.lit(hi), F.lit(w), F.lit(-1)),
            F.lit(0).cast("long"),
            lambda acc, i: acc * 2
            + F.when(F.element_at(vec_col, i + 1) > 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long"),
        )
        words.append(word)
    return F.array(*words)


def hamming_distance(code_a, code_b):
    """Hamming distance between two array<long> sign codes: summed
    per-word popcount-of-xor (two JVM instructions per word)."""
    return F.aggregate(
        F.zip_with(code_a, code_b, lambda a, b: F.bit_count(a.bitwiseXOR(b))),
        F.lit(0),
        lambda acc, v: acc + v,
    ).cast("int")


def hamming_topk(
    vectors: DataFrame,
    query_ids: DataFrame | None = None,
    k: int = 5,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    allow_full_corpus_queries: bool = False,
) -> DataFrame:
    """Brute-force top-k by Hamming distance over packed sign codes
    -> (query_id, neighbor_id, hamming, rank); ties hamming asc,
    neighbor_id asc; self-matches excluded.

    The binary-code counterpart of :func:`cosine_topk`, and the
    cheap first pass of a code-then-rerank retrieval stack: the
    corpus collapses to (id, ceil(dim/32) longs) IN THE SCAN
    PROJECTION, so the broadcast-join pass streams 32x less data
    than the float brute force and each distance is two xor+popcount
    instructions inside whole-stage codegen instead of a 64-lane
    multiply-add reduction. Recall vs true cosine follows the
    sign-random-projection collision bound (P[bit agrees] =
    1 - theta/pi); pytest pins measured recall@5 against
    :func:`cosine_topk` on the fixture corpus.

    Same broadcast contract as cosine_topk: the query side must be
    a broadcast-safe subset (``query_ids=None`` raises unless
    ``allow_full_corpus_queries=True``); the all-vectors case
    belongs to an LSH/band bucket join, not a broadcast.
    """
    if query_ids is None and not allow_full_corpus_queries:
        raise ValueError(
            "hamming_topk broadcasts the query side: pass query_ids (a "
            "broadcast-safe subset); allow_full_corpus_queries=True "
            "overrides for small fixtures only"
        )
    codes = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        sign_code_words(F.col(vec_col), dim).alias("code"),
    )
    q = vectors.select(
        F.col(id_col).alias("query_id"),
        sign_code_words(F.col(vec_col), dim).alias("qcode"),
    )
    if query_ids is not None:
        q = q.join(
            F.broadcast(query_ids),
            q.query_id == query_ids[query_ids.columns[0]],
            "leftsemi",
        )
    scored = (
        codes.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "hamming", hamming_distance(F.col("code"), F.col("qcode"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "hamming", "rank")
    )


def hamming_band_pairs(
    vectors: DataFrame,
    threshold: int = 15,
    dim: int = 64,
    band_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs within ``threshold`` Hamming distance over packed
    sign codes, via BAND BUCKETING — the scale path hamming_topk's
    contract points to: with ``n_bands = dim/band_bits`` bands, any
    pair differing in <= threshold < n_bands bits must agree EXACTLY
    on >= one band (pigeonhole), so candidates come from an
    equi-join on (band_idx, band_value) and the exact popcount
    verify runs on candidates only — never an all-pairs comparison.

    -> (id_a, id_b, hamming) with id_a < id_b, hamming <= threshold.
    EXACT recall (no false negatives) whenever threshold < n_bands —
    asserted. Band width is the candidate/recall dial: narrow bands
    (4 bits here, needed because threshold 15 of 64 is permissive)
    collide often; production codes (256+ bits, tight thresholds)
    use 16-bit bands for ~65k-way bucket selectivity. Same
    band-join discipline as dedup.simhash_pairs (4x15-bit bands,
    threshold 3) — this variant runs on EMBEDDING sign codes instead
    of text shingle hashes.
    """
    n_bands = dim // band_bits
    if threshold >= n_bands:
        raise ValueError(
            f"pigeonhole-exact recall needs threshold < n_bands "
            f"({threshold} >= {n_bands}); widen dim or narrow bands"
        )
    codes = vectors.select(
        F.col(id_col).alias("id"),
        sign_code_words(F.col(vec_col), dim).alias("code"),
    ).localCheckpoint(eager=False)
    per_word = 32 // band_bits
    mask = (1 << band_bits) - 1
    bands = codes.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(
                        F.element_at(F.col("code"), k // per_word + 1),
                        band_bits * (k % per_word),
                    ).bitwiseAND(F.lit(mask))
                    for k in range(n_bands)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    cands = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .distinct()
    )
    ca = codes.select(F.col("id").alias("id_a"), F.col("code").alias("code_a"))
    cb = codes.select(F.col("id").alias("id_b"), F.col("code").alias("code_b"))
    return (
        cands.join(ca, "id_a")
        .join(cb, "id_b")
        .withColumn(
            "hamming", hamming_distance(F.col("code_a"), F.col("code_b"))
        )
        .where(F.col("hamming") <= threshold)
        .select("id_a", "id_b", "hamming")
    )
