"""Round-4h additions: deterministic epoch ordering (permutation
identity + epoch decorrelation), Matryoshka truncation monotonicity,
and per-host quality calibration (keep-half property) — closed-form
invariants the oracle sweep doesn't pin."""

from __future__ import annotations

from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.operators.simsearch import matryoshka_eval
from multiomics_biocypher_kg_spark.registry import QUERIES
from tests.conftest import SF_TINY


def test_epoch_order_is_permutation_and_decorrelated(spark):
    rows = QUERIES["data_epoch_order"](spark, SF_TINY).collect()
    assert rows
    by_epoch = {}
    for r in rows:
        # positions within (epoch, shard) are exactly 0..m-1
        m = r["n_docs"]
        assert r["sum_pos"] == m * (m - 1) // 2
        by_epoch.setdefault(r["epoch"], {})[r["shard"]] = r
    assert set(by_epoch) == {0, 1}
    # the hash seed includes the epoch: shard populations AND order
    # checksums differ between epochs (same docs, different permutation)
    e0, e1 = by_epoch[0], by_epoch[1]
    assert sum(r["n_docs"] for r in e0.values()) == sum(
        r["n_docs"] for r in e1.values()
    )
    assert any(
        e0[s]["order_checksum"] != e1[s]["order_checksum"]
        for s in set(e0) & set(e1)
    )


def test_matryoshka_norm_frac_monotone(spark):
    """Retained norm fraction decreases with the truncation dim and
    is exactly 1.0 at the full dim; the full dim has zero cosine
    delta by definition."""
    vecs = spark.read.parquet(f"{SF_TINY}/embeddings.parquet")
    rows = {r["trunc_dim"]: r for r in matryoshka_eval(vecs).collect()}
    assert set(rows) == {64, 32, 16}
    assert rows[64]["avg_abs_delta"] == 0.0
    assert rows[64]["avg_norm_frac"] == 1.0
    assert rows[64]["avg_norm_frac"] >= rows[32]["avg_norm_frac"] >= rows[16]["avg_norm_frac"]
    assert rows[16]["n_pairs"] == rows[64]["n_pairs"] > 0


def test_matryoshka_known_vectors(spark):
    """Hand-checked pair: orthogonal tails flip the truncated cosine."""
    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 1.0, 0.0]),
            (1, [1.0, 0.0, -1.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    rows = {r["trunc_dim"]: r for r in matryoshka_eval(vecs, dims=(4, 2)).collect()}
    assert rows[4]["avg_cos"] == 0.0        # full vectors orthogonal
    assert rows[2]["avg_cos"] == 1.0        # prefixes identical
    assert rows[2]["avg_abs_delta"] == 1.0
    # prefix keeps 1 of 2 squared units -> 1/sqrt(2)
    assert abs(rows[2]["avg_norm_frac"] - 0.707107) < 1e-6


def test_quality_calibration_keeps_half_per_host(spark):
    rows = QUERIES["web_quality_calibration"](spark, SF_TINY).collect()
    assert rows
    for r in rows:
        # percent_rank <= 0.5 keeps ceil((n-1)/2)+1 docs of n (the
        # top half inclusive); always at least 1, never more than n
        assert 1 <= r["n_kept"] <= r["n_docs"]
        if r["n_docs"] > 1:
            assert r["n_kept"] == (r["n_docs"] - 1) // 2 + 1
        if r["max_dropped_mlogit"] is not None:
            assert r["min_kept_mlogit"] >= r["max_dropped_mlogit"]
    hosts = {r["host"] for r in rows}
    assert "hot.example.com" in hosts
