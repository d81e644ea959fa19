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
