"""Ontology query families: closure / levels / subtree rollups plus
interval merge, reachability pruning, and nearest typed ancestor
(SURVEY.md S2.9, J6, W9).

Split out of registry.py in round 4 — a pure move, oracles verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.registry import register

# --------------------------------------------------------------------------
# Ontology section: closure / levels / subtree rollups (G2/G3/G5)
# over a deterministic tree derived from doc ids (FIXTURES B5).
# --------------------------------------------------------------------------

ONTO_EDGES_SQL = """
  SELECT format('n{:04d}', doc_id) AS child,
         format('n{:04d}', doc_id // 4) AS parent
  FROM documents WHERE doc_id > 0
"""

ONTO_CLOSURE_SQL = f"""
WITH RECURSIVE edges AS ({ONTO_EDGES_SQL}),
clos(node, ancestor, depth) AS (
  SELECT child, parent, 1 FROM edges
  UNION
  SELECT c.node, e.parent, c.depth + 1
  FROM clos c JOIN edges e ON c.ancestor = e.child
)
SELECT node, ancestor, CAST(depth AS INTEGER) AS depth FROM clos
"""


def _onto_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return docs.where(F.col("doc_id") > 0).select(
        F.format_string("n%04d", F.col("doc_id")).alias("child"),
        F.format_string("n%04d", F.floor(F.col("doc_id") / 4).cast("int")).alias(
            "parent"
        ),
    )


@register("onto_closure", oracle=ONTO_CLOSURE_SQL)
def onto_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2/G5: bounded ancestor closure via iterative self-joins."""
    from multiomics_biocypher_kg_spark.operators.enrich import ancestors_closure

    return ancestors_closure(_onto_edges(spark, sf_dir), max_depth=10).select(
        "node", "ancestor", F.col("depth").cast("int").alias("depth")
    )


@register(
    "onto_levels",
    oracle=f"""
    WITH RECURSIVE edges AS ({ONTO_EDGES_SQL}),
    lv(node, level) AS (
      SELECT 'n0000', 0
      UNION
      SELECT e.child, lv.level + 1 FROM lv JOIN edges e ON e.parent = lv.node
    )
    SELECT node, CAST(min(level) AS INTEGER) AS level FROM lv GROUP BY node
    """,
)
def onto_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3: min-depth BFS levels from the root (go_utils.py:255-325)."""
    from multiomics_biocypher_kg_spark.operators.enrich import min_levels

    spark_edges = _onto_edges(spark, sf_dir)
    roots = spark.createDataFrame([("n0000",)], "node string")
    return min_levels(spark_edges, roots).select(
        "node", F.col("level").cast("int").alias("level")
    )


@register(
    "onto_subtree_rollup",
    oracle=f"""
    WITH clos AS ({ONTO_CLOSURE_SQL}),
    allnodes AS (SELECT node FROM clos UNION SELECT ancestor FROM clos),
    pairs AS (
      SELECT node, ancestor FROM clos
      UNION
      SELECT node, node FROM allnodes
    )
    SELECT ancestor, count(DISTINCT node) AS member_count
    FROM pairs GROUP BY ancestor
    """,
)
def onto_subtree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5: per-ancestor distinct-descendant rollup incl. self
    (Cypher *0.. subtree counts, post-import.cypher:840-911)."""
    from multiomics_biocypher_kg_spark.operators.enrich import (
        ancestors_closure,
        subtree_rollup,
    )

    closure = ancestors_closure(_onto_edges(spark, sf_dir), max_depth=10)
    nodes = (
        closure.select("node")
        .union(closure.select("ancestor"))
        .distinct()
        .select(F.col("node").alias("id"), F.col("node").alias("val"))
    )
    return subtree_rollup(closure, nodes, "id", "val")


# --------------------------------------------------------------------------
# Interval merge, reachability pruning, nearest typed ancestor
# --------------------------------------------------------------------------

INTERVALS_A_SQL = """
  SELECT doc_id AS a_id, 's' || CAST(doc_id % 2 AS VARCHAR) AS strand,
         doc_id * 100 AS a_start,
         doc_id * 100 + 80 + doc_id % 40 AS a_end
  FROM documents
"""

# shifted twin of A (small jitter: matches) + decoys (shift 60 > max_dstart)
INTERVALS_B_SQL = """
  SELECT doc_id AS b_id, 's' || CAST(doc_id % 2 AS VARCHAR) AS strand,
         doc_id * 100 + (doc_id % 7) - 3 AS b_start,
         doc_id * 100 + 80 + doc_id % 40 + (doc_id % 5) - 2 AS b_end
  FROM documents WHERE doc_id % 3 <> 0
  UNION ALL
  SELECT doc_id + 500000, 's' || CAST(doc_id % 2 AS VARCHAR),
         doc_id * 100 + 60, doc_id * 100 + 80 + doc_id % 40 + 60
  FROM documents WHERE doc_id % 11 = 0
"""


@register(
    "interval_position_merge",
    oracle=f"""
    WITH a AS ({INTERVALS_A_SQL}), b AS ({INTERVALS_B_SQL}),
    cand AS (
      SELECT a.a_id, b.b_id,
        least(a.a_end, b.b_end) - greatest(a.a_start, b.b_start) + 1 AS overlap_len
      FROM a JOIN b ON a.strand = b.strand
        AND abs(a.a_start - b.b_start) <= 50
        AND abs(a.a_end - b.b_end) <= 3
        AND least(a.a_end, b.b_end) - greatest(a.a_start, b.b_start) + 1
            >= 0.9 * (a.a_end - a.a_start + 1)
        AND least(a.a_end, b.b_end) - greatest(a.a_start, b.b_start) + 1
            >= 0.9 * (b.b_end - b.b_start + 1)
    ),
    counted AS (
      SELECT *, count(*) OVER (PARTITION BY a_id) AS na,
                count(*) OVER (PARTITION BY b_id) AS nb
      FROM cand
    )
    SELECT a_id, b_id, overlap_len FROM counted WHERE na = 1 AND nb = 1
    """,
)
def interval_position_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: the reference's genomic position-fallback merge (same
    strand, reciprocal overlap >= 0.9, |dstart| <= 50, |dend| <= 3,
    1:1 only) via bucketized hash join — operators.intervals."""
    from multiomics_biocypher_kg_spark.operators.intervals import (
        position_fallback_merge,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    d = F.col("doc_id")
    a = docs.select(
        d.alias("a_id"),
        F.concat(F.lit("s"), (d % 2).cast("string")).alias("strand"),
        (d * 100).alias("a_start"),
        (d * 100 + 80 + d % 40).alias("a_end"),
    )
    b1 = docs.where(d % 3 != 0).select(
        d.alias("b_id"),
        F.concat(F.lit("s"), (d % 2).cast("string")).alias("strand"),
        (d * 100 + (d % 7) - 3).alias("b_start"),
        (d * 100 + 80 + d % 40 + (d % 5) - 2).alias("b_end"),
    )
    b2 = docs.where(d % 11 == 0).select(
        (d + 500000).alias("b_id"),
        F.concat(F.lit("s"), (d % 2).cast("string")).alias("strand"),
        (d * 100 + 60).alias("b_start"),
        (d * 100 + 80 + d % 40 + 60).alias("b_end"),
    )
    return position_fallback_merge(a, b1.unionByName(b2))


@register(
    "onto_reachability_prune",
    oracle=f"""
    WITH RECURSIVE edges AS ({ONTO_EDGES_SQL}),
    known AS (
      SELECT format('n{{:04d}}', doc_id) AS node FROM documents WHERE doc_id % 7 = 0
    ),
    kept(node) AS (
      SELECT node FROM known
      UNION
      SELECT e.parent FROM kept k JOIN edges e ON e.child = k.node
    )
    SELECT node FROM kept
    """,
)
def onto_reachability_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10 (BRITE prune, brite_adapter.py:188-248): keep only
    hierarchy nodes whose subtree contains a known leaf — seed the
    known set, walk parents to fixpoint (bottom-up ancestor marking
    via iterative join)."""
    edges = _onto_edges(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    known = docs.where(F.col("doc_id") % 7 == 0).select(
        F.format_string("n%04d", F.col("doc_id")).alias("node")
    )
    kept = known
    frontier = known
    for _ in range(12):
        step = (
            frontier.join(edges, frontier.node == edges.child)
            .select(F.col("parent").alias("node"))
            .join(kept, "node", "left_anti")
            .distinct()
            .localCheckpoint(eager=True)
        )
        if step.isEmpty():
            break
        kept = kept.union(step)
        frontier = step
    return kept


@register(
    "onto_nearest_class_ancestor",
    oracle=f"""
    WITH clos AS ({ONTO_CLOSURE_SQL}),
    self_pairs AS (
      SELECT node, node AS ancestor, 0 AS depth
      FROM (SELECT node FROM clos UNION SELECT ancestor FROM clos)
    ),
    all_pairs AS (
      SELECT node, ancestor, depth FROM clos
      UNION ALL SELECT * FROM self_pairs
    ),
    classes AS (SELECT * FROM all_pairs WHERE ancestor IN ('n0000','n0001','n0002','n0003')),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY node ORDER BY depth, ancestor) AS rn
      FROM classes
    )
    SELECT node, ancestor AS class_node, CAST(depth AS INTEGER) AS class_depth
    FROM ranked WHERE rn = 1
    """,
)
def onto_nearest_class_ancestor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W9 (tc_class ancestor pointer, post-import.cypher:864-870):
    nearest ancestor (min depth, deterministic tiebreak) belonging to
    the 'class' level, self included — closure join + row_number."""
    from pyspark.sql import Window

    from multiomics_biocypher_kg_spark.operators.enrich import ancestors_closure

    closure = ancestors_closure(_onto_edges(spark, sf_dir), max_depth=10)
    nodes = closure.select("node").union(closure.select("ancestor")).distinct()
    self_pairs = nodes.select(
        "node", F.col("node").alias("ancestor"), F.lit(0).alias("depth")
    )
    all_pairs = closure.select("node", "ancestor", "depth").union(self_pairs)
    classes = all_pairs.where(
        F.col("ancestor").isin("n0000", "n0001", "n0002", "n0003")
    )
    w = Window.partitionBy("node").orderBy(F.col("depth").asc(), F.col("ancestor").asc())
    return (
        classes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "node",
            F.col("ancestor").alias("class_node"),
            F.col("depth").cast("int").alias("class_depth"),
        )
    )

# Re-apply the driver-window order after this module's registrations:
# if this module is imported FIRST, registry's own bottom-of-file
# ordering pass runs before these queries exist. Idempotent.
from multiomics_biocypher_kg_spark.registry import (  # noqa: E402
    _apply_driver_window_order,
)

_apply_driver_window_order()


# --------------------------------------------------------------------------
# Resnik / Lin semantic similarity over the ontology (IC of the LCA)
# --------------------------------------------------------------------------

_SIM_PAIR_MOD = 29  # probe pairs: (doc_id, doc_id+1) where doc_id % 29 == 1


@register(
    "onto_resnik_similarity",
    oracle=f"""
    WITH RECURSIVE edges AS ({ONTO_EDGES_SQL}),
    clos(node, ancestor) AS (
      SELECT child, parent FROM edges
      UNION
      SELECT c.node, e.parent FROM clos c JOIN edges e ON c.ancestor = e.child
    ),
    nodes AS (
      SELECT DISTINCT node FROM (
        SELECT child AS node FROM edges
        UNION ALL SELECT parent AS node FROM edges
      )
    ),
    ext AS (
      SELECT DISTINCT node, ancestor FROM (
        SELECT node, ancestor FROM clos
        UNION ALL SELECT node, node AS ancestor FROM nodes
      )
    ),
    dc AS (SELECT ancestor, count(*) AS n_desc FROM ext GROUP BY ancestor),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    pairs AS (
      SELECT format('n{{:04d}}', a.doc_id) AS node_a,
             format('n{{:04d}}', b.doc_id) AS node_b
      FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      WHERE a.doc_id % {_SIM_PAIR_MOD} = 1 AND a.doc_id > 0
    ),
    lca AS (
      SELECT node_a, node_b, ancestor AS lca, n_desc AS lca_desc FROM (
        SELECT p.node_a, p.node_b, ea.ancestor, d.n_desc,
          row_number() OVER (PARTITION BY p.node_a, p.node_b
                             ORDER BY d.n_desc ASC, ea.ancestor ASC) AS rn
        FROM pairs p
        JOIN ext ea ON ea.node = p.node_a
        JOIN ext eb ON eb.node = p.node_b AND eb.ancestor = ea.ancestor
        JOIN dc d ON d.ancestor = ea.ancestor
      ) r WHERE rn = 1
    )
    SELECT l.node_a, l.node_b, l.lca,
      round(log2(t.n) - log2(l.lca_desc), 6) AS resnik,
      round(2 * (log2(t.n) - log2(l.lca_desc))
            / ((log2(t.n) - log2(da.n_desc))
               + (log2(t.n) - log2(db.n_desc))), 6) AS lin
    FROM lca l
    JOIN dc da ON da.ancestor = l.node_a
    JOIN dc db ON db.ancestor = l.node_b
    CROSS JOIN tot t
    """,
)
def onto_resnik_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resnik and Lin semantic similarity for a deterministic probe
    set of node pairs — THE ontology-similarity measures of the
    reference's domain (GO-term similarity in multi-omics: Resnik =
    IC of the most-informative common ancestor, IC(c) =
    -log2 p(c) with p(c) = descendants(c)/N; Lin = 2·IC(lca) /
    (IC(a)+IC(b)), the [0,1]-normalized form). LCA selection avoids
    floats entirely: max-IC common ancestor == MIN-descendant-count
    ancestor, so the pick is min(struct(n_desc, ancestor)) over
    integer counts — bit-identical cross-engine regardless of libm
    log2 ulps, which only enter the final rounded outputs. Scale
    shape: descendant counts are ONE keyed agg over the (self-
    extended) closure; the probe pairs are a bounded scan filter;
    per-pair ancestor intersection is two keyed joins against the
    closure (each node carries O(depth) ancestor rows — for a quad
    tree ~log4 N), never a pairwise node x node expansion.
    """
    from multiomics_biocypher_kg_spark.operators.enrich import ancestors_closure

    edges = _onto_edges(spark, sf_dir)
    clos = ancestors_closure(edges, max_depth=10).select("node", "ancestor")
    nodes = (
        edges.select(F.col("child").alias("node"))
        .union(edges.select(F.col("parent").alias("node")))
        .distinct()
    )
    ext = clos.union(nodes.select("node", F.col("node").alias("ancestor"))).distinct()
    dc = ext.groupBy("ancestor").agg(F.count(F.lit(1)).alias("n_desc"))
    tot = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    a = docs.where(
        (F.col("doc_id") % _SIM_PAIR_MOD == 1) & (F.col("doc_id") > 0)
    ).select(F.col("doc_id").alias("id_a"))
    b = docs.select(F.col("doc_id").alias("id_b"))
    pairs = a.join(b, F.col("id_b") == F.col("id_a") + 1).select(
        F.format_string("n%04d", F.col("id_a")).alias("node_a"),
        F.format_string("n%04d", F.col("id_b")).alias("node_b"),
    )
    ea = ext.select(F.col("node").alias("node_a"), "ancestor")
    eb = ext.select(F.col("node").alias("node_b"), "ancestor")
    lca = (
        pairs.join(ea, "node_a")
        .join(eb, ["node_b", "ancestor"])
        .join(dc, "ancestor")
        .groupBy("node_a", "node_b")
        .agg(F.min(F.struct("n_desc", "ancestor")).alias("m"))
        .select(
            "node_a",
            "node_b",
            F.col("m.ancestor").alias("lca"),
            F.col("m.n_desc").alias("lca_desc"),
        )
    )
    ic = lambda c: F.log2(F.col("n")) - F.log2(c)  # noqa: E731
    return (
        lca.join(
            dc.select(F.col("ancestor").alias("node_a"), F.col("n_desc").alias("da")),
            "node_a",
        )
        .join(
            dc.select(F.col("ancestor").alias("node_b"), F.col("n_desc").alias("db")),
            "node_b",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "node_a",
            "node_b",
            "lca",
            F.round(ic(F.col("lca_desc")), 6).alias("resnik"),
            F.round(
                2 * ic(F.col("lca_desc")) / (ic(F.col("da")) + ic(F.col("db"))), 6
            ).alias("lin"),
        )
    )


# --------------------------------------------------------------------------
# Instance typing through the is_a closure (annotation up-propagation)
# --------------------------------------------------------------------------


def _type_inference_sql() -> str:
    from multiomics_biocypher_kg_spark.functions.hashing import md5_long_sql
    from multiomics_biocypher_kg_spark.oracle_fragments import TRIPLES_SQL

    return f"""
    WITH RECURSIVE edges AS ({ONTO_EDGES_SQL}),
    clos(node, ancestor, depth) AS (
      SELECT child, parent, 1 FROM edges
      UNION
      SELECT c.node, e.parent, c.depth + 1
      FROM clos c JOIN edges e ON c.ancestor = e.child
    ),
    t AS ({TRIPLES_SQL}),
    m AS (SELECT max(doc_id) + 1 AS n_classes FROM documents),
    ent AS (SELECT DISTINCT subj AS entity FROM t),
    direct AS (
      SELECT entity,
        format('n{{:04d}}', {md5_long_sql('entity')} % m.n_classes) AS cls
      FROM ent CROSS JOIN m
    )
    SELECT entity, cls AS type, CAST(0 AS INTEGER) AS depth,
      'direct' AS source
    FROM direct
    UNION ALL
    SELECT d.entity, c.ancestor AS type, CAST(c.depth AS INTEGER) AS depth,
      'inherited' AS source
    FROM direct d JOIN clos c ON c.node = d.cls
    """


@register("kg_type_inference", oracle=_type_inference_sql())
def kg_type_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instance typing through the is_a closure — every KG entity's
    direct class PLUS all inherited ancestor classes with their
    inheritance depth. This is annotation up-propagation, the
    operation the reference's domain runs constantly (a gene
    annotated with a GO term is implicitly annotated with every
    ancestor term; the reference imports OBO is_a edges for exactly
    this semantics — brite/go hierarchy adapters), materialized so
    every downstream rollup/filter can equi-join types instead of
    re-walking the hierarchy.

    Scale shape: the closure table is ONTOLOGY-sized (bounded by
    classes x depth, never entities), so the inherited branch is the
    entity dictionary joined against a BROADCAST closure; the direct
    class resolves in the projection (one hash vs the broadcast
    1-row class-count dim). The entity dictionary is the only
    corpus-derived input and it is touched twice (direct + inherited
    branches of the union) — localCheckpoint()ed once so the triple
    pipeline underneath runs once."""
    from multiomics_biocypher_kg_spark.functions.hashing import md5_long
    from multiomics_biocypher_kg_spark.operators.enrich import ancestors_closure
    from multiomics_biocypher_kg_spark.registry import kg_triples

    ents = (
        kg_triples(spark, sf_dir)
        .select(F.col("subj").alias("entity"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_classes = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .agg((F.max("doc_id") + 1).alias("n_classes"))
    )
    direct = ents.crossJoin(F.broadcast(n_classes)).select(
        "entity",
        F.format_string(
            "n%04d",
            (md5_long(F.col("entity")) % F.col("n_classes")).cast("int"),
        ).alias("cls"),
    )
    clos = ancestors_closure(_onto_edges(spark, sf_dir), max_depth=10)
    direct_rows = direct.select(
        "entity",
        F.col("cls").alias("type"),
        F.lit(0).cast("int").alias("depth"),
        F.lit("direct").alias("source"),
    )
    inherited = direct.join(
        F.broadcast(clos), direct["cls"] == clos["node"]
    ).select(
        "entity",
        F.col("ancestor").alias("type"),
        F.col("depth").cast("int").alias("depth"),
        F.lit("inherited").alias("source"),
    )
    return direct_rows.unionByName(inherited)


# --------------------------------------------------------------------------
# Wu-Palmer semantic similarity (depth of the deepest common ancestor)
# --------------------------------------------------------------------------

_WUP_PAIR_MOD = 23  # probe pairs: (doc_id, doc_id+2) where doc_id % 23 == 1


@register(
    "onto_wupalmer_similarity",
    oracle=f"""
    WITH RECURSIVE edges AS ({{onto_edges}}),
    clos(node, ancestor) AS (
      SELECT child, parent FROM edges
      UNION
      SELECT c.node, e.parent FROM clos c JOIN edges e ON c.ancestor = e.child
    ),
    nodes AS (
      SELECT DISTINCT node FROM (
        SELECT child AS node FROM edges
        UNION ALL SELECT parent AS node FROM edges
      )
    ),
    ext AS (
      SELECT DISTINCT node, ancestor FROM (
        SELECT node, ancestor FROM clos
        UNION ALL SELECT node, node AS ancestor FROM nodes
      )
    ),
    d AS (SELECT node, CAST(count(*) AS BIGINT) AS depth FROM ext GROUP BY node),
    pairs AS (
      SELECT format('n{{{{:04d}}}}', a.doc_id) AS node_a,
             format('n{{{{:04d}}}}', b.doc_id) AS node_b
      FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 2
      WHERE a.doc_id % {_WUP_PAIR_MOD} = 1 AND a.doc_id > 0
    ),
    lca AS (
      SELECT node_a, node_b, ancestor AS lca, depth AS d_lca FROM (
        SELECT p.node_a, p.node_b, ea.ancestor, dd.depth,
          row_number() OVER (PARTITION BY p.node_a, p.node_b
                             ORDER BY dd.depth DESC, ea.ancestor DESC) AS rn
        FROM pairs p
        JOIN ext ea ON ea.node = p.node_a
        JOIN ext eb ON eb.node = p.node_b AND eb.ancestor = ea.ancestor
        JOIN d dd ON dd.node = ea.ancestor
      ) r WHERE rn = 1
    )
    SELECT l.node_a, l.node_b, l.lca,
      CAST(l.d_lca AS INTEGER) AS d_lca,
      CAST(da.depth AS INTEGER) AS d_a,
      CAST(db.depth AS INTEGER) AS d_b,
      round(2.0 * l.d_lca / (da.depth + db.depth), 6) AS wup
    FROM lca l
    JOIN d da ON da.node = l.node_a
    JOIN d db ON db.node = l.node_b
    """.format(onto_edges=ONTO_EDGES_SQL),
)
def onto_wupalmer_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wu-Palmer semantic similarity (Wu & Palmer, ACL 1994) for a
    deterministic probe set of node pairs: 2*depth(LCA) /
    (depth(a) + depth(b)) — the PATH-based ontology similarity
    beside onto_resnik_similarity's information-content one (Resnik
    asks "how specific is what they share", Wu-Palmer asks "how far
    down the hierarchy is it relative to both" — corpus-frequency
    free, so it works before any annotation counts exist). Depth is
    the node count on the root path (root = 1), computed as ONE
    count(*) agg over the self-extended closure — in a tree the path
    is unique, so depth and LCA are exact integers and the emitted
    d_lca / d_a / d_b columns carry the contract integer-exactly;
    only the final ratio is a rounded float. LCA = the DEEPEST
    common ancestor = max(struct(depth, ancestor)) over integer
    depths, bit-identical cross-engine (the Resnik min-descendant
    trick with depth in place of IC).

    Scale shape identical to Resnik: per-node ancestor lists are
    O(depth) closure rows (~log4 N for the quad tree), the probe
    pairs are a bounded scan filter, and the intersection is two
    keyed joins — never node x node."""
    from multiomics_biocypher_kg_spark.operators.enrich import ancestors_closure

    edges = _onto_edges(spark, sf_dir)
    clos = ancestors_closure(edges, max_depth=10).select("node", "ancestor")
    nodes = (
        edges.select(F.col("child").alias("node"))
        .union(edges.select(F.col("parent").alias("node")))
        .distinct()
    )
    ext = clos.union(nodes.select("node", F.col("node").alias("ancestor"))).distinct()
    d = ext.groupBy("node").agg(F.count(F.lit(1)).alias("depth"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    a = docs.where(
        (F.col("doc_id") % _WUP_PAIR_MOD == 1) & (F.col("doc_id") > 0)
    ).select(F.col("doc_id").alias("id_a"))
    b = docs.select(F.col("doc_id").alias("id_b"))
    pairs = a.join(b, F.col("id_b") == F.col("id_a") + 2).select(
        F.format_string("n%04d", F.col("id_a")).alias("node_a"),
        F.format_string("n%04d", F.col("id_b")).alias("node_b"),
    )
    ea = ext.select(F.col("node").alias("node_a"), "ancestor")
    eb = ext.select(F.col("node").alias("node_b"), "ancestor")
    danc = d.select(F.col("node").alias("ancestor"), F.col("depth").alias("d_anc"))
    lca = (
        pairs.join(ea, "node_a")
        .join(eb, ["node_b", "ancestor"])
        .join(danc, "ancestor")
        .groupBy("node_a", "node_b")
        .agg(F.max(F.struct("d_anc", "ancestor")).alias("m"))
        .select(
            "node_a",
            "node_b",
            F.col("m.ancestor").alias("lca"),
            F.col("m.d_anc").alias("d_lca"),
        )
    )
    return (
        lca.join(
            d.select(F.col("node").alias("node_a"), F.col("depth").alias("d_a")),
            "node_a",
        )
        .join(
            d.select(F.col("node").alias("node_b"), F.col("depth").alias("d_b")),
            "node_b",
        )
        .select(
            "node_a",
            "node_b",
            "lca",
            F.col("d_lca").cast("int").alias("d_lca"),
            F.col("d_a").cast("int").alias("d_a"),
            F.col("d_b").cast("int").alias("d_b"),
            F.round(
                2.0 * F.col("d_lca") / (F.col("d_a") + F.col("d_b")), 6
            ).alias("wup"),
        )
    )


# --------------------------------------------------------------------------
# DAG diamond audit (multiple-inheritance double-count risk)
# --------------------------------------------------------------------------

# The base ontology fixture is a TREE (doc_id // 4); the diamond
# audit needs a DAG, so every doc_id % 3 == 2 class gets a SECOND
# parent (doc_id // 5) — the multiple-inheritance pattern real
# ontologies (GO, BRITE) carry and the reference's subtree rollups
# must not double-count through.
ONTO_DAG_EDGES_SQL = f"""
  SELECT child, parent FROM ({ONTO_EDGES_SQL})
  UNION
  SELECT format('n{{:04d}}', doc_id) AS child,
         format('n{{:04d}}', doc_id // 5) AS parent
  FROM documents
  WHERE doc_id > 0 AND doc_id % 3 = 2 AND doc_id // 5 <> doc_id // 4
"""


def _onto_dag_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    second = docs.where(
        (F.col("doc_id") > 0)
        & (F.col("doc_id") % 3 == 2)
        & (F.floor(F.col("doc_id") / 5) != F.floor(F.col("doc_id") / 4))
    ).select(
        F.format_string("n%04d", F.col("doc_id")).alias("child"),
        F.format_string(
            "n%04d", F.floor(F.col("doc_id") / 5).cast("int")
        ).alias("parent"),
    )
    return _onto_edges(spark, sf_dir).unionByName(second).distinct()


@register(
    "onto_diamond_audit",
    oracle=f"""
    WITH edges AS ({ONTO_DAG_EDGES_SQL}),
    two AS (
      SELECT a.child AS node, b.parent AS grand,
        count(DISTINCT a.parent) AS n_paths
      FROM edges a JOIN edges b ON a.parent = b.child
      GROUP BY 1, 2
    )
    SELECT node, grand AS grand_ancestor,
      CAST(n_paths AS BIGINT) AS n_paths,
      CAST(n_paths * (n_paths - 1) // 2 AS BIGINT) AS n_diamonds
    FROM two WHERE n_paths >= 2
    """,
)
def onto_diamond_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIAMOND detection in the multiple-inheritance ontology DAG:
    (class, grand-ancestor) pairs reachable through >= 2 distinct
    intermediate parents — the exact structural pattern that makes
    naive subtree rollups DOUBLE-COUNT (a gene annotated to the
    class propagates to the grand-ancestor once per path unless the
    rollup dedups by node, which onto_subtree_rollup's
    count-distinct discipline does; this query measures how much
    that discipline is load-bearing). Reference analog: GO / BRITE
    are DAGs, not trees — brite_adapter.py's prune-to-reachable
    walks multiple parents.

    Scale shape: one self-join of the edge dictionary keyed by the
    shared mid node (edges are dictionary-sized in any ontology —
    this is the wedge-count shape of kg_triangles, degree-bounded),
    one (node, grand) count-distinct agg, all-integer output
    (n_paths choose 2)."""
    edges = _onto_dag_edges(spark, sf_dir).localCheckpoint()
    a = edges.select(F.col("child").alias("node"), F.col("parent").alias("mid"))
    b = edges.select(F.col("child").alias("mid"), F.col("parent").alias("grand"))
    two = (
        a.join(b, "mid")
        .groupBy("node", "grand")
        .agg(F.countDistinct("mid").alias("n_paths"))
        .where(F.col("n_paths") >= 2)
    )
    return two.select(
        "node",
        F.col("grand").alias("grand_ancestor"),
        F.col("n_paths").cast("long").alias("n_paths"),
        (F.col("n_paths") * (F.col("n_paths") - 1) / 2)
        .cast("long")
        .alias("n_diamonds"),
    )
