"""Record-linkage scoring, winnowing fingerprints, and RAKE keywords.

Three classic mining operators over the document corpus, each
expressed as pure DataFrame transforms:

- ``fellegi_sunter_pairs``: probabilistic record-linkage scoring
  (Fellegi & Sunter 1969) over blocked candidate pairs — the
  principled upgrade to the boolean blocking profile
  (``kg_blocking_keys``): every within-block pair gets a
  log-likelihood match score from per-field agreement weights,
  with u-probabilities ESTIMATED FROM THE DATA (chance-agreement
  rate of a random pair = sum of squared value frequencies) and
  m-probabilities fixed constants (the no-training-data default).
  Reference analog: the reference resolves records by exact-key
  cascades (multiomics_kg/utils.py resolve_row); FS scoring is what
  replaces that cascade when keys are dirty at web scale.
- ``winnowing_fingerprints`` / ``winnowing_pairs``: the MOSS local
  fingerprinting scheme (Schleimer, Wilkerson & Aiken, SIGMOD'03):
  hash every k-gram, slide a w-window over the hash stream, keep
  the window minimum — guarantees any match of length >= w+k-1 is
  caught while sampling ~2/(w+1) of the hashes. The fingerprint
  equi-join then finds local-overlap pairs that whole-document
  MinHash misses (a copied paragraph inside an otherwise-unrelated
  page).
- ``rake_keywords``: RAKE (Rose et al. 2010) corpus keywords —
  stopword/non-word tokens split token streams into candidate
  phrases (gaps-and-islands, per-doc window), word scores
  deg(w)/freq(w) from two vocabulary-sized aggregates, phrase
  score = sum of member word scores.

100 TB notes: every per-doc window partitions by doc_id (no global
sort); word/field statistics are vocabulary-sized aggregates;
candidate pairs come only from equi-joins on block keys or
fingerprints, never a cross join. Hot fingerprints (boilerplate
shared by thousands of pages) are dropped by a frequency cap before
the pair join — the same skew guard as the co-mention fanout cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.functions.hashing import md5_long

# ── Fellegi–Sunter record-linkage scoring ───────────────────────────

# m-probabilities: P(field agrees | true match). Without labeled
# training pairs these are fixed priors (the standard bootstrap before
# EM refinement); u is estimated from the data per field.
FS_M = 0.9


def _u_prob(df: DataFrame, field: str) -> DataFrame:
    """u-probability for one field: the probability two RANDOM records
    agree = sum_v P(v)^2 over the field's empirical distribution.
    One vocabulary-sized aggregate; returned as a 1-row DataFrame so
    the caller can cross-join (broadcast) it into the pair scorer."""
    counts = df.groupBy(field).agg(F.count(F.lit(1)).alias("c"))
    return counts.agg(
        (F.sum(F.col("c") * F.col("c")) / (F.sum("c") * F.sum("c"))).alias(
            f"u_{field}"
        )
    )


def fellegi_sunter_pairs(
    docs: DataFrame,
    fields: tuple[str, ...] = ("lang", "source", "char_bucket"),
    m: float = FS_M,
) -> DataFrame:
    """Score within-block candidate pairs with Fellegi–Sunter
    log-likelihood weights.

    Input needs (doc_id, block_key, *fields). Per field f:
    agree  -> log2(m / u_f)
    disagree -> log2((1-m) / (1-u_f))
    where u_f is the chance-agreement probability estimated from the
    full corpus. Score = sum over fields; is_match = score >= 0.

    Shuffle profile: one self-equi-join on block_key (candidate
    generation — cost bounded by the blocking profile, see
    kg_blocking_keys), |fields| vocabulary-sized aggregates
    broadcast into the scorer. No all-pairs stage anywhere.
    """
    u = None
    for f_ in fields:
        uf = _u_prob(docs, f_)
        u = uf if u is None else u.crossJoin(uf)

    a = docs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("block_key"),
        *[F.col(f_).alias(f"a_{f_}") for f_ in fields],
    )
    b = docs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("block_key"),
        *[F.col(f_).alias(f"b_{f_}") for f_ in fields],
    )
    pairs = a.join(b, "block_key").where(F.col("doc_a") < F.col("doc_b"))
    pairs = pairs.crossJoin(F.broadcast(u))

    score = F.lit(0.0)
    out_cols = [F.col("doc_a"), F.col("doc_b")]
    for f_ in fields:
        agree = (F.col(f"a_{f_}") == F.col(f"b_{f_}")).cast("int")
        w = F.when(
            agree == 1, F.log2(F.lit(m) / F.col(f"u_{f_}"))
        ).otherwise(F.log2(F.lit(1.0 - m) / (F.lit(1.0) - F.col(f"u_{f_}"))))
        score = score + w
        out_cols.append(agree.alias(f"agree_{f_}"))
    return pairs.select(
        *out_cols,
        F.round(score, 6).alias("score"),
        (score >= 0).cast("int").alias("is_match"),
    )


# ── Winnowing (MOSS) fingerprints ────────────────────────────────────

WINNOW_K = 3  # tokens per k-gram
WINNOW_W = 4  # hashes per winnowing window
WINNOW_MAX_DF = 50  # fingerprints in more docs than this are boilerplate


def winnowing_fingerprints(
    docs: DataFrame,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, fp): the distinct window-minimum k-gram hashes.

    Token k-grams come from lead() over the per-doc position window
    (no self-join on the token stream); the winnowing minimum is a
    ROWS BETWEEN w-1 PRECEDING frame over the same partitioning, so
    the whole selection is two window passes partitioned by doc_id —
    embarrassingly parallel across documents.

    (A per-document array-expression variant — hash array +
    array_min over sliced windows, zero shuffles — was A/B-measured
    SLOWER at sf1.0, 6.7 s vs 5.85 s for the full pair query:
    higher-order array functions evaluate interpreted and the O(n*w)
    per-window slice allocations lose to the codegen'd running
    window min, unlike the MinHash case where the array form also
    removed an aggregation shuffle. Kept the window form.)
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "token"),
    )
    byW = Window.partitionBy("doc_id").orderBy("pos")
    gram = F.concat_ws(
        " ", F.col("token"), *[F.lead("token", i).over(byW) for i in range(1, k)]
    )
    hashes = toks.select(
        "doc_id", "pos", md5_long(gram).alias("h"), F.lead("token", k - 1).over(byW).alias("last")
    ).where(F.col("last").isNotNull())
    winmin = hashes.select(
        "doc_id",
        F.min("h")
        .over(byW.rowsBetween(-(w - 1), 0))
        .alias("fp"),
        F.row_number().over(byW).alias("rn"),
    ).where(F.col("rn") >= w)
    return winmin.select("doc_id", "fp").distinct()


def winnowing_pairs(
    fps: DataFrame, min_shared: int = 2, max_df: int = WINNOW_MAX_DF
) -> DataFrame:
    """(doc_a, doc_b, n_shared): pairs sharing >= min_shared selected
    fingerprints. Fingerprints present in more than ``max_df`` docs
    are dropped first (boilerplate/skew guard: a site-wide footer
    fingerprint would otherwise fan out quadratically, exactly the
    hot-key failure the co-mention cap exists for).

    The fingerprint table has two consumers (frequency build, pair
    join), so it materializes once and the upstream selection
    windows run once (interleaved A/B at sf1.0: 4.63 -> 3.69 s)."""
    fps = fps.localCheckpoint(eager=True)
    df_counts = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("df"))
    keep = fps.join(
        df_counts.where(F.col("df") <= max_df).select("fp"), "fp"
    )
    a = keep.select(F.col("fp"), F.col("doc_id").alias("doc_a"))
    b = keep.select(F.col("fp"), F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


# ── RAKE keyword extraction ──────────────────────────────────────────


def rake_keywords(
    docs: DataFrame,
    stopwords: list[str],
    top_n: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level RAKE keywords: (phrase, n_occurrences, score).

    Candidate phrases are maximal runs of content tokens (lowercase
    alphabetic, not stopwords) — the gaps-and-islands pattern over the
    per-doc position window. Word stats (freq, degree = sum of
    containing-phrase lengths) are ONE vocabulary-sized aggregate;
    phrase score = sum over member occurrences of deg(w)/freq(w).
    Top-n is orderBy().limit() (TakeOrderedAndProject — distributed
    top-k, never a single-task global sort), ordered by the ROUNDED
    score with the phrase text as tiebreak: RAKE scores are sums of
    shared rational deg/freq terms, so 6dp ties are exact ties in
    real arithmetic and the unrounded float carries summation-order
    ulp noise (the adamic-adar tie regime, not the tf-idf one).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "raw"),
    ).select("doc_id", "pos", F.lower("raw").alias("tok"))
    content = toks.where(
        F.col("tok").rlike("^[a-z]+$") & ~F.col("tok").isin(stopwords)
    )
    byW = Window.partitionBy("doc_id").orderBy("pos")
    words = content.select(
        "doc_id",
        "pos",
        "tok",
        (F.col("pos") - F.row_number().over(byW)).alias("isl"),
    )
    phrases = words.groupBy("doc_id", "isl").agg(
        F.concat_ws(
            " ", F.transform(F.sort_array(F.collect_list(F.struct("pos", "tok"))), lambda s: s["tok"])
        ).alias("phrase"),
        F.count(F.lit(1)).alias("plen"),
    )
    occ = words.join(phrases, ["doc_id", "isl"]).select("doc_id", "isl", "tok", "plen")
    wstat = occ.groupBy("tok").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("deg")
    )
    pscore = (
        occ.join(wstat, "tok")
        .groupBy("doc_id", "isl")
        .agg(F.sum(F.col("deg") / F.col("freq")).alias("score"))
        .join(phrases.select("doc_id", "isl", "phrase"), ["doc_id", "isl"])
    )
    return (
        pscore.groupBy("phrase")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.round(F.max("score"), 6).alias("score"),
        )
        .orderBy(F.desc("score"), "phrase")
        .limit(top_n)
        .select("phrase", "n_occurrences", "score")
    )
