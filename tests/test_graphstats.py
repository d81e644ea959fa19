"""operators.graphstats unit tests: known-graph triangle counts
(degree orientation vs ground truth), PMI formula values, temporal
edge intervals, and the no-cartesian plan guard for the wedge join."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.operators.graphstats import (
    comention_pairs,
    pmi_edges,
    predicate_profile,
    temporal_edges,
    triangle_counts,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a string, b string")


def test_triangle_counts_k4(spark):
    """K4: every node sits in C(3,2) = 3 triangles; a pendant node
    attached to one vertex sits in 0."""
    nodes = ["a", "b", "c", "d"]
    k4 = [(x, y) for i, x in enumerate(nodes) for y in nodes[i + 1 :]]
    e = _edges(spark, k4 + [("d", "p")])
    got = {r["entity_id"]: r["n_triangles"] for r in triangle_counts(e).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3, "p": 0}


def test_triangle_counts_star_hub_zero(spark):
    """A star graph has no triangles regardless of hub degree — the
    degree-oriented wedge join must not fabricate any."""
    e = _edges(spark, [("hub", f"leaf{i}") for i in range(20)])
    got = triangle_counts(e)
    assert got.agg(F.sum("n_triangles")).collect()[0][0] == 0
    assert got.count() == 21


def test_triangle_counts_dedups_and_ignores_direction(spark):
    """Duplicate edges and reversed duplicates count once."""
    e = _edges(
        spark,
        [("a", "b"), ("b", "a"), ("b", "c"), ("a", "c"), ("c", "a"), ("a", "a")],
    )
    got = {r["entity_id"]: r["n_triangles"] for r in triangle_counts(e).collect()}
    assert got == {"a": 1, "b": 1, "c": 1}


def test_triangle_plan_no_cartesian(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c")])
    plan = triangle_counts(e)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pmi_formula_values(spark):
    """3 docs: (x,y) in docs 1+2, x alone in 3 via pair (x,z).
    n_xy=2, n_x=3, n_y=2, n_z=1, N=3."""
    pairs = spark.createDataFrame(
        [(1, "x", "y"), (2, "x", "y"), (3, "x", "z")],
        "doc_id long, subj string, obj string",
    )
    got = {(r["subj"], r["obj"]): r for r in pmi_edges(pairs).collect()}
    xy = got[("x", "y")]
    assert xy["n_docs_pair"] == 2 and xy["n_docs_subj"] == 3 and xy["n_docs_obj"] == 2
    assert xy["pmi"] == round(math.log(2 * 3 / (3 * 2)), 6) == 0.0
    assert xy["npmi"] == round(0.0 / math.log(3 / 2), 6) == 0.0
    xz = got[("x", "z")]
    assert xz["pmi"] == round(math.log(1 * 3 / (3 * 1)), 6) == 0.0


def test_pmi_npmi_always_together_is_one(spark):
    """A pair present in every doc hits the denom=0 guard: npmi=1."""
    pairs = spark.createDataFrame(
        [(1, "x", "y"), (2, "x", "y")], "doc_id long, subj string, obj string"
    )
    row = pmi_edges(pairs).collect()[0]
    assert row["npmi"] == 1.0


def test_temporal_edges_interval(spark):
    pairs = spark.createDataFrame(
        [(1, "x", "y"), (5, "x", "y"), (3, "x", "y")],
        "doc_id long, subj string, obj string",
    )
    pages = spark.createDataFrame(
        [(i, i * 100) for i in (1, 3, 5)], "doc_id long, sec long"
    ).select("doc_id", F.timestamp_seconds("sec").alias("warc_ts"))
    row = temporal_edges(pairs, pages).collect()[0]
    assert (row["first_seen_ts"], row["last_seen_ts"], row["n_snapshots"]) == (
        100,
        500,
        3,
    )
    assert row["pred"] == "co_mentioned_with"


def test_predicate_profile_functionality(spark):
    """p1 is functional (1 obj per subj), p2 is not."""
    t = spark.createDataFrame(
        [
            ("s1", "p1", "o1"),
            ("s2", "p1", "o2"),
            ("s1", "p2", "o1"),
            ("s1", "p2", "o2"),
        ],
        "subj string, pred string, obj string",
    )
    got = {r["pred"]: r for r in predicate_profile(t).collect()}
    assert got["p1"]["functionality"] == 1.0
    assert got["p2"]["functionality"] == 0.5
    assert got["p2"]["inverse_functionality"] == 1.0


def test_comention_pairs_sorted_unique(spark):
    """Pairs come from the sorted per-doc set: subj < obj, repeats
    collapse, singleton docs emit nothing."""
    links = spark.createDataFrame(
        [(1, "b"), (1, "a"), (1, "b"), (2, "z"), (1, None)],
        "doc_id long, entity_id string",
    )
    got = [(r["doc_id"], r["subj"], r["obj"]) for r in comention_pairs(links).collect()]
    assert got == [(1, "a", "b")]


def test_comention_fanout_cap_drops_list_pages(spark):
    """max_entities_per_doc drops the viral list page BEFORE the
    quadratic explode; normal docs are untouched; the guard metric
    reports exactly what the cap saves."""
    from multiomics_biocypher_kg_spark.operators.graphstats import (
        comention_fanout_metrics,
    )

    rows = [(1, "a"), (1, "b")] + [(9, f"e{i:03d}") for i in range(50)]
    links = spark.createDataFrame(rows, "doc_id long, entity_id string")
    capped = comention_pairs(links, max_entities_per_doc=10).collect()
    assert [(r["doc_id"], r["subj"], r["obj"]) for r in capped] == [(1, "a", "b")]
    # uncapped still emits the full 50*49/2 pairs for doc 9
    assert comention_pairs(links).count() == 1 + 50 * 49 // 2
    m = comention_fanout_metrics(links, cap=10).collect()[0]
    assert m["n_docs"] == 2
    assert m["n_over_cap"] == 1
    assert m["max_fanout"] == 50
    assert m["pairs_bound_capped"] == 1
    assert m["pairs_bound_uncapped"] == 1 + 50 * 49 // 2


def test_comention_pairs_consumers_scan_checkpoint_not_pipeline(spark):
    """comention_pairs returns a (lazily) checkpointed stage: every
    consumer's plan reads the materialized RDD instead of re-deriving
    the groupBy/explode pipeline — the 'persisted stage table' shape
    the multi-consumer queries (PMI, triangles, temporal) rely on."""
    links = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (2, "c")], "doc_id long, entity_id string"
    )
    pairs = comention_pairs(links)
    consumer = pairs.groupBy("subj").count()
    plan = consumer._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan
    # the upstream collect_set/explode pipeline must NOT be re-inlined
    assert "collect_set" not in plan and "Generate" not in plan


def test_adamic_adar_topk_known_graph(spark):
    """Hand-computed AA scores on a 5-node graph.

    Edges: a-b, b-c, a-c (triangle) plus c-d, d-e (tail).
    Degrees: a=2, b=2, c=3, d=2, e=1.
    Non-adjacent pairs with shared neighbors:
      (b,d) share c          -> 1/ln(3)
      (a,d) share c          -> 1/ln(3)
      (c,e) share d          -> 1/ln(2)
      (a,e),(b,e): none shared (e's only neighbor d is not theirs).
    Adjacent pairs (a,b),(a,c),(b,c),(c,d),(d,e) must be excluded
    even though e.g. (a,b) share c.
    """
    import math

    from multiomics_biocypher_kg_spark.operators.graphstats import adamic_adar_topk

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")],
        "a string, b string",
    )
    rows = adamic_adar_topk(edges, k=10).collect()
    got = {(r["subj"], r["obj"]): (r["n_common"], r["adamic_adar"]) for r in rows}
    inv_ln2 = round(1 / math.log(2), 6)
    inv_ln3 = round(1 / math.log(3), 6)
    assert got == {
        ("c", "e"): (1, inv_ln2),
        ("a", "d"): (1, inv_ln3),
        ("b", "d"): (1, inv_ln3),
    }
    # rank: unrounded score desc, then (a,b) asc
    assert [(r["rank"], r["subj"], r["obj"]) for r in rows] == [
        (1, "c", "e"),
        (2, "a", "d"),
        (3, "b", "d"),
    ]
    # max_degree cap drops apex c (deg 3): only the d-wedge survives
    capped = adamic_adar_topk(edges, k=10, max_degree=2).collect()
    assert {(r["subj"], r["obj"]) for r in capped} == {("c", "e")}
