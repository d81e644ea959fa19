"""Link-graph operators: href extraction, host rollup, PageRank.

The registry oracles (web_link_graph / web_pagerank,
tests/test_queries_oracle.py) value-gate the full pipeline against
DuckDB; these tests pin the operator semantics on hand-built graphs
where the expected answer is known in closed form.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.functions.text import extract_text, synth_html
from multiomics_biocypher_kg_spark.operators.linkgraph import (
    host_graph,
    href_edges,
    pagerank,
)
from multiomics_biocypher_kg_spark.sources.pages import pages_from_documents
from tests.conftest import SF_TINY


def test_synth_outlinks_do_not_change_extracted_text():
    t = "GeneA interacts with GeneB."
    plain = synth_html("https://h1.example.org/doc/000001", t, "en")
    linked = synth_html(
        "https://h1.example.org/doc/000001",
        t,
        "en",
        outlinks=["https://h0.example.org/doc/000000?utm_source=nav", "https://x.org/#top"],
    )
    assert plain != linked
    assert extract_text(plain.encode()) == t
    assert extract_text(linked.encode()) == t


def test_href_edges_parse_and_canonicalize(spark):
    pages = pages_from_documents(spark, SF_TINY)
    edges = href_edges(pages)
    rows = edges.where(F.col("src_url").endswith("/doc/000013")).collect()
    # doc 13: hub7 = doc 7 (h7), hub50 = doc 0 (hot), partner;
    # the utm param and fragment must be canonicalized away.
    dsts = sorted(r.dst_url for r in rows)
    assert dsts == [
        "https://h7.example.org/doc/000007",
        "https://hot.example.com/doc/000000",
        "https://partner.example.net/about",
    ]
    assert all("?utm" not in d and "#" not in d for d in dsts)


def test_host_graph_counts(spark):
    pages = pages_from_documents(spark, SF_TINY)
    hg = host_graph(href_edges(pages)).collect()
    n_pages_total = pages.count()
    # every page emits exactly 3 anchors
    assert sum(r.n_links for r in hg) == 3 * n_pages_total
    # the partner host is a pure sink: never a source
    assert not [r for r in hg if r.src_host == "partner.example.net"]
    assert [r for r in hg if r.dst_host == "partner.example.net"]


def _ranks(spark, edge_rows, **kw):
    edges = spark.createDataFrame(edge_rows, "src string, dst string, weight double")
    out = pagerank(edges, **kw).collect()
    return {r.node: r.rank for r in out}


def test_pagerank_mass_conserved_with_dangling(spark):
    # b is dangling (no out-edges): its mass must be redistributed,
    # keeping sum(rank) == 1 every iteration.
    ranks = _ranks(spark, [("a", "b", 1.0), ("c", "b", 1.0)], iters=7)
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-12)
    assert ranks["b"] > ranks["a"] == pytest.approx(ranks["c"], abs=1e-12)


def test_pagerank_symmetric_cycle_is_uniform(spark):
    # a->b->c->a: symmetry forces the uniform fixed point exactly.
    ranks = _ranks(
        spark, [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0)], iters=3
    )
    for v in ranks.values():
        assert v == pytest.approx(1.0 / 3.0, abs=1e-12)


def test_pagerank_weighted_split_closed_form(spark):
    # a splits 3:1 between b and c; b, c both dangling. After ONE
    # iteration from uniform start the closed form is:
    #   dangling mass = 2/3, teleport = 0.05, d = 0.85
    #   rank(b) = 0.05 + 0.85*(1/3*3/4 + 2/9) = 0.05 + 0.85*(1/4/... )
    d = 0.85
    n = 3.0
    dang = 2.0 / 3.0
    b1 = (1 - d) / n + d * ((1 / 3) * 0.75 + dang / n)
    c1 = (1 - d) / n + d * ((1 / 3) * 0.25 + dang / n)
    a1 = (1 - d) / n + d * (dang / n)
    ranks = _ranks(spark, [("a", "b", 3.0), ("a", "c", 1.0)], iters=1)
    assert ranks["a"] == pytest.approx(a1, abs=1e-12)
    assert ranks["b"] == pytest.approx(b1, abs=1e-12)
    assert ranks["c"] == pytest.approx(c1, abs=1e-12)


def test_pagerank_checkpoint_matches_uncheckpointed(spark):
    edge_rows = [("a", "b", 1.0), ("b", "c", 2.0), ("c", "a", 1.0), ("a", "c", 1.0)]
    plain = _ranks(spark, edge_rows, iters=6)
    chk = _ranks(spark, edge_rows, iters=6, checkpoint_every=2)
    for k in plain:
        assert plain[k] == pytest.approx(chk[k], abs=1e-12)


def test_anchor_pairs_and_profile(spark):
    """Hand-built pages: two pages link the same target with
    different anchor texts; the profile picks the majority text and
    breaks count ties lexicographically."""
    from multiomics_biocypher_kg_spark.operators.linkgraph import (
        anchor_pairs,
        anchor_text_profile,
    )

    def page(url, anchors):
        nav = "".join(f'<a href="{h}">{a}</a>' for h, a in anchors)
        return (url, f"<html><body>{nav}<main><p>x</p></main></body></html>".encode())

    t = "https://t.example.org/page"
    pages = spark.createDataFrame(
        [
            page("https://a.org/1", [(t + "?utm_source=x", "Gene A"), (t, "Gene A")]),
            page("https://b.org/2", [(t + "#frag", "GeneA protein")]),
            page("https://c.org/3", [("https://other.org/", "zzz")]),
        ],
        "url string, html binary",
    )
    prof = {r["dst_url"]: r for r in anchor_text_profile(anchor_pairs(pages)).collect()}
    row = prof[t]
    # utm + fragment variants collapse onto one canonical target
    assert row["n_links"] == 3 and row["n_texts"] == 2
    assert row["top_anchor"] == "Gene A" and row["top_anchor_links"] == 2
    other = prof["https://other.org/"]
    assert other["top_anchor"] == "zzz" and other["n_links"] == 1


def test_anchor_profile_tie_breaks_lexicographically(spark):
    from multiomics_biocypher_kg_spark.operators.linkgraph import (
        anchor_pairs,
        anchor_text_profile,
    )

    html = '<a href="https://t.org/">beta</a><a href="https://t.org/">alpha</a>'
    pages = spark.createDataFrame(
        [("https://s.org/", html.encode())], "url string, html binary"
    )
    row = anchor_text_profile(anchor_pairs(pages)).collect()[0]
    assert row["top_anchor"] == "alpha" and row["n_texts"] == 2


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_label_propagation_two_cliques(spark):
    """Disjoint triangles resolve into separate communities, each
    labeled by its clique's min node id (the deterministic
    tie-break: every neighbor label ties at count 1, min wins)."""
    from multiomics_biocypher_kg_spark.operators.linkgraph import (
        label_propagation,
    )

    tri1 = [("a", "b"), ("b", "c"), ("a", "c")]
    tri2 = [("x", "y"), ("y", "z"), ("x", "z")]
    labels = {
        r["node"]: r["label"]
        for r in label_propagation(_edges(spark, tri1 + tri2), iters=4).collect()
    }
    assert labels["a"] == labels["b"] == labels["c"] == "a"
    assert labels["x"] == labels["y"] == labels["z"] == "x"


def test_kcore_peels_tail_and_cascades(spark):
    """A 4-clique with a pendant chain: k=3 peels the chain AND the
    cascade (chain node adjacent to the clique goes too), keeping
    exactly the clique at degree 3."""
    from multiomics_biocypher_kg_spark.operators.linkgraph import kcore

    clique = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    chain = [("d", "e"), ("e", "f")]
    out = {r["node"]: r["degree"] for r in
           kcore(_edges(spark, clique + chain), k=3, rounds=3).collect()}
    assert out == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_trustrank_mass_conserved_and_decays_from_seeds(spark):
    """sum(rank) == 1 exactly each run; a node unreachable from the
    seed set gets rank 0 under seed-only teleport (the TrustRank
    demotion property)."""
    from multiomics_biocypher_kg_spark.operators.linkgraph import trustrank

    edges = spark.createDataFrame(
        [("s", "m", 1.0), ("m", "t", 1.0), ("u", "s", 1.0)],
        "src string, dst string, weight double",
    )
    seeds = spark.createDataFrame([("s",)], "node string")
    # damping 0.5: the s->m->t->(dangling reinject)->s cycle's
    # power-iteration oscillation dies at 0.5^k, so 10 rounds is
    # converged to ~1e-3 and the chain ordering is strict
    ranks = {r["node"]: r["rank"] for r in
             trustrank(edges, seeds, iters=10, damping=0.5).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    # u never receives teleport and has no in-edges -> exactly 0
    assert ranks["u"] == 0.0
    # trust decays along the chain s -> m -> t
    assert ranks["s"] > ranks["m"] > ranks["t"] > 0.0


def test_deterministic_walks_structure_and_reproducibility(spark):
    """Every hop follows an actual edge, walks have n_steps+1 nodes,
    the start column matches the first path node, and a second
    invocation returns byte-identical walks (the derandomization
    contract)."""
    from multiomics_biocypher_kg_spark.operators.linkgraph import (
        deterministic_walks,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("b", "d")], "a string, b string"
    )
    rows = {r["start_host"]: r["walk"] for r in deterministic_walks(edges, 3).collect()}
    assert set(rows) == {"a", "b", "c", "d"}
    adj = {("a", "b"), ("b", "c"), ("c", "d"), ("b", "d")}
    adj |= {(y, x) for x, y in adj}
    for start, walk in rows.items():
        nodes = walk.split(">")
        assert len(nodes) == 4 and nodes[0] == start
        assert all((u, v) in adj for u, v in zip(nodes, nodes[1:]))
    again = {
        r["start_host"]: r["walk"] for r in deterministic_walks(edges, 3).collect()
    }
    assert again == rows
