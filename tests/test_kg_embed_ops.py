"""Round-4 batch-2 operators (registry_kg_embed): closed-form
contracts the oracle sweep doesn't pin — IVF-PQ recall vs exact
top-k and its codes-only shuffle shape, TransE margin identities,
heterogeneous 2-hop path families, N-Triples syntax, reification
cardinality, BFS distance axioms, Zipf slope sign on natural-ish
text, salience ordering, CCNet tercile structure."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.registry import QUERIES
from tests.conftest import SF_TINY


def test_ivfpq_adc_exact_on_lossless_fixture(spark):
    """ADC correctness gate. A recall floor on the driver's
    near-uniform synthetic embeddings measures the DATA, not the
    code: with all pairwise distances concentrated in a narrow band
    (dim-64 uniform vectors), quantization noise exceeds the
    distance spread and recall@5 sits at chance (5/(N-1)) for any
    correct PQ — so instead this fixture makes quantization
    provably LOSSLESS and asserts ADC == exact squared L2, which
    catches a broken code assignment or an off-by-one LUT index
    far more sharply than a recall floor.

    Construction: every vector is a concatenation of m=4 subspace
    patterns drawn from exactly pq_k=8 distinct integer 2-d
    patterns per subspace, and the 8 lowest-id vectors enumerate
    all 8 patterns in every subspace. ivf_index's fixed init then
    seeds each PQ codebook with exactly the distinct patterns;
    assignment is exact (distance 0, no ties); the mean update over
    identical integer subvectors reproduces them bit-exactly (k*x
    exact for small ints, and fl((k*x)/k) == x when the real
    quotient is representable). Hence code(x) reconstructs x
    exactly and ADC == true distance for every pair. Probing all
    lists (n_probe = n_lists) removes coarse-routing loss, so the
    approximate top-k must EQUAL the exact top-k, ranks included
    (both order by distance asc, neighbor_id asc, and distances
    are exact integers on both sides)."""
    from multiomics_biocypher_kg_spark.operators.simsearch import ivfpq_topk

    m, pq_k, n = 4, 8, 24
    # pattern i in subspace s = [(i+1)*(s+1), (i+1)*(s+2)] — distinct
    # integer 2-vectors within each subspace
    def pat(s, i):
        return [float((i + 1) * (s + 1)), float((i + 1) * (s + 2))]

    def vec(j):
        if j < pq_k:
            idx = [j, j, j, j]
        else:
            idx = [j % 8, (j * 3 + 1) % 8, (j * 5 + 2) % 8, (j * 7 + 3) % 8]
        v = []
        for s in range(m):
            v += pat(s, idx[s])
        return (j, v)

    emb = spark.createDataFrame(
        [vec(j) for j in range(n)], "vec_id int, embedding array<double>"
    )
    approx = ivfpq_topk(emb, k=5, n_lists=4, n_probe=4, m=m, pq_k=pq_k)
    # exact squared-L2 top-5 (same tie rule: dist asc, neighbor asc)
    a = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("vb"))
    d = (
        a.join(b, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.aggregate(
                F.zip_with("va", "vb", lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("d"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("d").asc(), F.col("neighbor_id").asc())
    exact = d.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 5)
    exact_rows = {
        (r["query_id"], r["neighbor_id"]): (r["rn"], r["d"]) for r in exact.collect()
    }
    approx_rows = {
        (r["query_id"], r["neighbor_id"]): (r["rank"], r["approx_sq_dist"])
        for r in approx.collect()
    }
    assert len(exact_rows) == n * 5
    assert set(approx_rows) == set(exact_rows)
    for key, (rank, ad) in approx_rows.items():
        ern, ed = exact_rows[key]
        assert rank == ern, (key, rank, ern)
        assert abs(ad - ed) < 1e-6, (key, ad, ed)


def test_ivfpq_db_side_carries_codes_not_vectors(spark):
    """The scale contract of PQ: the candidate join's database side
    is (id, list_id, m small codes) — the raw embedding array never
    reaches the probe join. The optimized plan's join must not
    reference the embedding column on the db side (it appears only
    upstream, inside the map-only code-assignment projections)."""
    from multiomics_biocypher_kg_spark.operators.simsearch import ivfpq_topk

    emb = spark.read.parquet(f"{SF_TINY}/embeddings.parquet")
    out = ivfpq_topk(emb, k=5)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    join_block = plan[plan.index("Join") :]
    # after the join node, the only columns flowing are ids, lists,
    # codes and LUTs — a raw `embedding` reference below the join
    # means vectors are shuffling
    first_project_after_join = join_block.split("\n", 1)[0]
    assert "embedding" not in first_project_after_join


def test_transe_margin_identity_and_determinism(spark):
    q = QUERIES["kg_transe_score"](spark, SF_TINY).limit(200).collect()
    assert len(q) > 0
    for r in q:
        assert abs(r["margin"] - round(r["transe_score"] - r["neg_score"], 6)) < 2e-6
        assert r["plausible"] == (r["margin"] > 0)
        assert r["transe_score"] <= 0.0 and r["neg_score"] <= 0.0


def test_path_2hop_families_nonempty(spark):
    fams = {
        r["pred_path"]: r["n"]
        for r in QUERIES["kg_path_2hop"](spark, SF_TINY)
        .groupBy("pred_path")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # the three structurally-possible compositions all occur
    assert set(fams) == {"hosts>mentions", "links_to>hosts", "links_to>links_to"}
    assert all(v > 0 for v in fams.values())


_NT_LINE = re.compile(r"^<[^<>\s]+> <[^<>\s]+> <[^<>\s]+> \.$")


def test_nt_export_syntax_and_shards(spark):
    rows = QUERIES["kg_nt_export"](spark, SF_TINY).collect()
    assert len(rows) > 0
    shards = set()
    for r in rows:
        assert _NT_LINE.match(r["nt_line"]), r["nt_line"]
        assert 0 <= r["shard"] < 16
        shards.add(r["shard"])
    # content-hash sharding fills every shard even at tiny scale
    assert len(shards) == 16


def test_reify_three_roles_per_statement(spark):
    df = QUERIES["kg_reify_statements"](spark, SF_TINY)
    per_stmt = df.groupBy("stmt_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("role").alias("nroles"),
    )
    bad = per_stmt.where((F.col("n") != 3) | (F.col("nroles") != 3)).count()
    assert bad == 0


def test_seed_distance_axioms(spark):
    rows = QUERIES["web_seed_distance"](spark, SF_TINY).collect()
    assert rows
    by_host = {r["host"]: r for r in rows}
    for r in rows:
        if r["is_seed"]:
            assert r["dist"] == 0
        else:
            assert 1 <= r["dist"] <= 6
    # triangle inequality over the host graph: dist(dst) <= dist(src)+1
    from multiomics_biocypher_kg_spark.operators.linkgraph import (
        host_graph,
        href_edges,
    )
    from multiomics_biocypher_kg_spark.sources.pages import pages_from_documents

    hg = host_graph(href_edges(pages_from_documents(spark, SF_TINY)))
    for e in hg.select("src_host", "dst_host").collect():
        s, d = by_host.get(e["src_host"]), by_host.get(e["dst_host"])
        if s is not None and d is not None:
            assert d["dist"] <= s["dist"] + 1


def test_zipf_slope_negative(spark):
    rows = QUERIES["text_zipf_fit"](spark, SF_TINY).collect()
    assert rows
    for r in rows:
        # frequency decreases with rank in any natural-ish corpus
        assert r["zipf_slope"] < 0, (r["lang"], r["zipf_slope"])
        assert r["n_freq_bins"] >= 2


def test_salience_rank_orders_by_score(spark):
    df = QUERIES["kg_entity_salience"](spark, SF_TINY)
    sample = df.where(F.col("doc_id") < 20).collect()
    assert sample
    by_doc: dict[int, list] = {}
    for r in sample:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r["salience_rank"])
        assert [r["salience_rank"] for r in rows] == list(range(1, len(rows) + 1))
        for a, b in zip(rows, rows[1:]):
            assert a["salience"] >= b["salience"] - 1e-9
        for r in rows:
            assert 0 <= r["first_pos"] < r["n_tokens"]


def test_ccnet_buckets_structure(spark):
    rows = QUERIES["text_ccnet_buckets"](spark, SF_TINY).collect()
    assert rows
    by_lang: dict[str, list] = {}
    for r in rows:
        assert r["bucket"] in ("head", "middle", "tail")
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        n = len(rs)
        heads = [r for r in rs if r["bucket"] == "head"]
        if n >= 30:
            # terciles are histogram-derived, so only roughly equal
            assert n / 6 <= len(heads) <= n / 1.5, (lang, len(heads), n)
        # bucket must be monotone in the bin: every head bin <= every
        # middle bin <= every tail bin
        maxb = {"head": -(10**9), "middle": -(10**9), "tail": -(10**9)}
        minb = {"head": 10**9, "middle": 10**9, "tail": 10**9}
        for r in rs:
            maxb[r["bucket"]] = max(maxb[r["bucket"]], r["ppl_bin"])
            minb[r["bucket"]] = min(minb[r["bucket"]], r["ppl_bin"])
        if maxb["head"] > -(10**9) and minb["middle"] < 10**9:
            assert maxb["head"] <= minb["middle"]
        if maxb["middle"] > -(10**9) and minb["tail"] < 10**9:
            assert maxb["middle"] <= minb["tail"]


_N4J_FILE = re.compile(
    r"^(Page|Entity|MENTIONS|SAME_AS_CANONICAL)-(header|part\d{3})\.csv$"
)
_CSV_3FIELDS = re.compile(r'^"(?:[^"]|"")*",(?:\d+|"(?:[^"]|"")*"),"[A-Z_a-z]+"$')


def test_neo4j_export_admin_import_shape(spark):
    rows = QUERIES["kg_neo4j_export"](spark, SF_TINY).collect()
    assert rows
    by_file: dict[str, list[str]] = {}
    for r in rows:
        by_file.setdefault(r["csv_file"], []).append(r["line"])
    # exactly one import-call line, referencing all four header files
    call = by_file.pop("neo4j-admin-import-call.sh")
    assert len(call) == 1 and call[0].startswith("neo4j-admin database import")
    for f in ("Page", "Entity", "MENTIONS", "SAME_AS_CANONICAL"):
        assert f"{f}-header.csv" in call[0]
    headers = {f: ls for f, ls in by_file.items() if "-header" in f}
    parts = {f: ls for f, ls in by_file.items() if "-part" in f}
    assert len(headers) == 4
    for f, ls in by_file.items():
        assert _N4J_FILE.match(f), f
    for f, ls in headers.items():
        assert len(ls) == 1
        first = ls[0].split(",")[0]
        assert first == (":ID" if f.split("-")[0] in ("Page", "Entity") else ":START_ID")
    # every part line is a 3-field always-quoted CSV row whose label
    # field matches its file's label
    for f, ls in parts.items():
        label = f.split("-")[0]
        for ln in ls:
            assert _CSV_3FIELDS.match(ln), (f, ln)
            assert ln.endswith(f',"{label}"'), (f, ln)
    # referential integrity: every SAME_AS endpoint is an Entity node
    ent_ids = {
        ln.split('",')[0][1:]
        for f, ls in parts.items()
        if f.startswith("Entity")
        for ln in ls
    }
    for f, ls in parts.items():
        if f.startswith("SAME_AS_CANONICAL"):
            for ln in ls:
                fields = ln.split('","')
                assert fields[0][1:] in ent_ids
                assert fields[1] in ent_ids
    # shard files stay within the configured shard count
    for f in parts:
        assert int(f.split("-part")[1].split(".")[0]) < 4


def test_mrr_eval_metric_identities(spark):
    """Per-relation rows; MRR bounded by Hits@1 from below at 1/1
    weight and 1.0 above; Hits monotone in k; mean_rank >= 1; the
    filtered protocol can never rank the true tail below the
    candidate-dictionary size."""
    rows = QUERIES["kg_mrr_eval"](spark, SF_TINY).collect()
    assert rows and len({r["pred"] for r in rows}) == len(rows)
    for r in rows:
        assert r["n_test"] >= 1
        assert 0.0 < r["mrr"] <= 1.0
        assert 0.0 <= r["hits_at_1"] <= r["hits_at_3"] <= r["hits_at_10"] <= 1.0
        assert r["mrr"] >= r["hits_at_1"] * 1.0 - 1e-9
        assert r["mean_rank"] >= 1.0


def test_ann_recall_eval_bounds_and_exhaustive_probe(spark):
    """recall in [0,1] with n_hit <= n_gold == k; and when n_probe =
    n_lists the IVF candidate set is the whole corpus, so recall
    must be exactly 1.0 for every query (pinned via the operator
    composition, not the registry entry)."""
    rows = QUERIES["ann_recall_eval"](spark, SF_TINY).collect()
    assert rows
    for r in rows:
        assert r["n_gold"] == 5
        assert 0 <= r["n_hit"] <= r["n_gold"]
        assert abs(r["recall"] - round(r["n_hit"] / r["n_gold"], 6)) < 1e-9

    from multiomics_biocypher_kg_spark.operators.simsearch import (
        cosine_topk,
        ivf_topk,
    )

    emb = spark.read.parquet(f"{SF_TINY}/embeddings.parquet")
    qids = emb.select("vec_id").where(F.col("vec_id") % 10 == 0)
    gold = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, query_ids=qids, k=5).collect()
    }
    full = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, k=5, n_lists=8, n_probe=8, iters=2)
        .where(F.col("query_id") % 10 == 0)
        .collect()
    }
    assert gold == full


def test_url_templates_mask_all_digits(spark):
    """Digit runs are always masked: no template may contain a raw
    digit (they appear only inside '{n}'), every url lands in
    exactly one template, and multi-host families (the /doc/{n}
    tier-host formula) collapse across hosts."""
    rows = QUERIES["web_url_templates"](spark, SF_TINY).collect()
    assert rows
    import re as _re

    for r in rows:
        assert not _re.search(r"[0-9]", r["template"]), r["template"]
        assert r["n_urls"] >= 1 and r["n_hosts"] >= 1
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet").count()
    assert sum(r["n_urls"] for r in rows) == docs
    assert any(r["n_hosts"] > 1 for r in rows)


def test_clustering_coeff_identities(spark):
    """cc in [0,1]; cc = 2T/(d(d-1)) re-derived row by row; degree<2
    forces cc=0; triangle participation requires degree >= 2."""
    rows = QUERIES["kg_clustering_coeff"](spark, SF_TINY).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["clustering"] <= 1.0
        assert r["degree"] >= 1
        if r["degree"] < 2:
            assert r["clustering"] == 0.0 and r["n_triangles"] == 0
        else:
            expect = round(
                2.0 * r["n_triangles"] / (r["degree"] * (r["degree"] - 1)), 6
            )
            assert abs(r["clustering"] - expect) < 1e-9


def test_distmult_integer_scores_match_md5_mirror(spark):
    """kg_distmult_score must equal a pure-Python recomputation of
    the exact int64 bilinear form from md5 first principles on a
    sample of triples, and exhibit DistMult's defining symmetry:
    swapping subject and object embeddings leaves the positive score
    unchanged (both sides use the entity tag 'e')."""
    import hashlib

    from multiomics_biocypher_kg_spark.registry import QUERIES
    from tests.conftest import SF_TINY

    def h(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def dim(name: str, tag: str, j: int) -> int:
        return h(f"{name}#{tag}{j}") % 1000 - 500

    rows = QUERIES["kg_distmult_score"](spark, SF_TINY).limit(40).collect()
    assert rows
    for r in rows:
        pos = sum(
            dim(r["subj"], "e", j) * dim(r["pred"], "r", j)
            * dim(r["obj"], "e", j)
            for j in range(8)
        )
        neg = sum(
            dim(r["subj"], "e", j) * dim(r["pred"], "r", j)
            * dim(r["obj"], "n", j)
            for j in range(8)
        )
        assert r["distmult_score_e9"] == pos
        assert r["neg_score_e9"] == neg
        assert r["margin_e9"] == pos - neg
        assert r["plausible"] == (pos - neg > 0)
        # the symmetry DistMult is famous for (and criticized for)
        swapped = sum(
            dim(r["obj"], "e", j) * dim(r["pred"], "r", j)
            * dim(r["subj"], "e", j)
            for j in range(8)
        )
        assert swapped == pos
