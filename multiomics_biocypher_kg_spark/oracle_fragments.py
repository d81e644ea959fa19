"""Shared oracle-SQL fragments — ONE source of truth for the
synthetic corpus shapes (url formula, tokenization, the tiered link
cascade, same-as components, the triple table, snapshot families,
co-mention pairs) used across the per-family registry modules and
their DuckDB oracles.

Leaf module: imports only sources.vocab, so every registry family
module (and registry itself) can import it in any order with no
circularity. Split out of registry.py in round 4 — all strings
verbatim, oracles byte-identical.
"""

from __future__ import annotations

from multiomics_biocypher_kg_spark.functions.hashing import (
    R as MH_R,
    ROWS_PER_BAND,
    md5_long_sql,
    minhash_coeffs_sql,
)
from multiomics_biocypher_kg_spark.sources.vocab import vocab_values_sql

# url formula must match sources.pages.url_of
def url_sql(id_expr: str) -> str:
    """The page-url formula over an arbitrary doc-id SQL expression
    (SQL twin of sources.pages.url_of)."""
    return (
        f"('https://' || CASE WHEN ({id_expr}) % 10 < 3 THEN 'hot.example.com' "
        f"ELSE 'h' || CAST(({id_expr}) % 50 AS VARCHAR) || '.example.org' END "
        f"|| '/doc/' || lpad(CAST(({id_expr}) AS VARCHAR), 6, '0'))"
    )


URL_SQL = url_sql("doc_id")

# tokenization with 0-based positions (mirrors posexplode(split(text,' ')))
TOKENS_SQL = f"""
  SELECT doc_id, {URL_SQL} AS url, lang,
         CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INTEGER) AS pos,
         unnest(string_split(text, ' ')) AS token
  FROM documents
"""

VOCAB_SQL = vocab_values_sql()

# the tiered resolution cascade (mirror of operators.link.link)
LINKS_SQL = f"""
WITH vocab AS (SELECT * FROM {VOCAB_SQL}),
toks AS ({TOKENS_SQL}),
t1 AS (SELECT surface AS k, min(entity_id) AS e, count(DISTINCT entity_id) AS n
       FROM vocab WHERE tier = 1 AND surface NOT LIKE '% %' GROUP BY surface),
t1ci AS (SELECT lower(surface) AS k, min(entity_id) AS e, count(DISTINCT entity_id) AS n
         FROM vocab WHERE tier = 1 AND surface NOT LIKE '% %' GROUP BY lower(surface)),
t2 AS (SELECT surface AS k, min(entity_id) AS e, count(DISTINCT entity_id) AS n
       FROM vocab WHERE tier = 2 AND surface NOT LIKE '% %' GROUP BY surface),
norm AS (SELECT *, regexp_replace(regexp_replace(token, '[*+]+$', ''), '\\.\\d+$', '') AS norm_token
         FROM toks),
detected AS (
  SELECT n.* FROM norm n
  WHERE lower(n.token) IN (SELECT lower(surface) FROM vocab WHERE surface NOT LIKE '% %')
     OR lower(n.norm_token) IN (SELECT lower(surface) FROM vocab WHERE surface NOT LIKE '% %')
),
joined AS (
  SELECT d.doc_id, d.url, d.lang, d.pos, d.token,
         a1.e AS e1, a1.n AS n1, a2.e AS e2, a2.n AS n2,
         a3.e AS e3, a3.n AS n3, a4.e AS e4, a4.n AS n4,
         a5.e AS e5, a5.n AS n5
  FROM detected d
  LEFT JOIN t1   a1 ON d.token = a1.k
  LEFT JOIN t1ci a2 ON lower(d.token) = a2.k
  LEFT JOIN t1   a3 ON d.norm_token = a3.k
  LEFT JOIN t2   a4 ON d.token = a4.k
  LEFT JOIN t2   a5 ON d.norm_token = a5.k
)
SELECT doc_id, url, lang, pos, token,
  CASE WHEN n1 = 1 THEN e1
       WHEN n1 > 1 THEN NULL
       WHEN n2 = 1 THEN e2
       WHEN n2 > 1 THEN NULL
       WHEN n3 = 1 THEN e3
       WHEN n3 > 1 THEN NULL
       WHEN n4 = 1 THEN e4
       WHEN n4 > 1 THEN NULL
       WHEN n5 = 1 THEN e5
       ELSE NULL END AS entity_id,
  CASE WHEN n1 = 1 THEN 'tier1_exact'
       WHEN n1 > 1 THEN 'conflict'
       WHEN n2 = 1 THEN 'case_insensitive'
       WHEN n2 > 1 THEN 'conflict'
       WHEN n3 = 1 THEN 'heuristic'
       WHEN n3 > 1 THEN 'conflict'
       WHEN n4 = 1 THEN 'tier2_singleton'
       WHEN n4 > 1 THEN 'ambiguous'
       WHEN n5 = 1 THEN 'heuristic'
       WHEN n5 > 1 THEN 'ambiguous'
       ELSE 'unmatched' END AS resolution_method
FROM joined
"""

# same-as evidence (mirror of plans.pipeline.sameas_from_documents)
SAMEAS_SQL = """
  SELECT format('ent:{:06d}', doc_id) AS id_a,
         format('ent:{:06d}', doc_id - doc_id % 5) AS id_b
  FROM documents WHERE doc_id % 5 <> 0
  UNION ALL
  SELECT format('ent:{:06d}', doc_id), format('ent:{:06d}', doc_id + 1)
  FROM documents WHERE doc_id % 10 = 4
"""

# connected components over the same-as graph (min-label, recursive CTE)
COMPONENTS_SQL = f"""
WITH RECURSIVE raw AS ({SAMEAS_SQL}),
und AS (
  SELECT id_a AS a, id_b AS b FROM raw
  UNION
  SELECT id_b, id_a FROM raw
),
reach(node, lbl) AS (
  SELECT a, a FROM und
  UNION
  SELECT u.a, r.lbl FROM und u JOIN reach r ON u.b = r.node
)
SELECT node, min(lbl) AS component FROM reach GROUP BY node
"""

TRIPLES_SQL = f"""
    WITH links AS ({LINKS_SQL}),
    mention_triples AS (
      SELECT DISTINCT url AS subj, 'mentions' AS pred, entity_id AS obj
      FROM links WHERE entity_id IS NOT NULL
    ),
    comp AS ({COMPONENTS_SQL}),
    same_triples AS (
      SELECT node AS subj, 'same_as_canonical' AS pred, component AS obj
      FROM comp WHERE node <> component
    ),
    allt AS (SELECT * FROM mention_triples UNION ALL SELECT * FROM same_triples)
    SELECT subj, pred, obj, subj || '|' || pred || '|' || obj AS edge_id FROM allt
"""

# byte-identical SQL twin of sources.pages html synthesis
# (functions.text.synth_html_col as composed by
# pages_from_documents_df: nav outlinks/anchors, ~1/23 noindex meta,
# ~1/17 broken trailing markup). An expression over documents
# (doc_id, text, lang) producing the exact html STRING Spark casts
# to binary — so any oracle can reason about raw page bytes
# (octet_length, tag counts) without Spark in the loop.
HTML_SQL = (
    "('<html lang=\"' || lang || '\"><head><title>' || " + URL_SQL + " || '</title>'"
    " || CASE WHEN doc_id % 23 = 1 THEN '<meta name=\"robots\" content=\"noindex\">' ELSE '' END"
    " || '<script>var t=1;function f(){return ''<main>'';}</script>'"
    " || '<style>.x{color:red}/*<main>*/</style></head>'"
    " || '<body><!-- header for ' || " + URL_SQL + " || ' --><h1>' || " + URL_SQL + " || '</h1>'"
    " || '<nav><a href=\"' || " + url_sql("doc_id - doc_id % 7")
    + " || '?utm_source=nav\">hub ' || CAST(doc_id % 3 AS VARCHAR) || '</a>'"
    " || '<a href=\"' || " + url_sql("doc_id - doc_id % 50")
    + " || '#top\">section ' || CAST(doc_id % 5 AS VARCHAR) || '</a>'"
    " || '<a href=\"https://partner.example.net/about\">partner '"
    " || CAST(doc_id % 2 AS VARCHAR) || '</a></nav>'"
    " || '<main><p>'"
    " || replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
    " || '</p></main>'"
    " || '<div class=\"footer\">&copy; 2026 Example &amp; Co. &#174;</div>'"
    " || CASE WHEN doc_id % 17 = 0 THEN '<div><span class=''unclosed'"
    " ELSE '</body></html>' END)"
)

_SNAPS_SQL = """
  SELECT doc_id, doc_id % 125 AS fam, 1767225600 + doc_id AS ts_epoch,
    'https://' || CASE WHEN doc_id % 125 % 10 < 3 THEN 'hot.example.com'
         ELSE 'h' || CAST(doc_id % 125 % 50 AS VARCHAR) || '.example.org' END
    || '/doc/' || lpad(CAST(doc_id % 125 AS VARCHAR), 6, '0') AS url,
    CASE WHEN doc_id % 125 % 10 < 3 THEN 'hot.example.com'
         ELSE 'h' || CAST(doc_id % 125 % 50 AS VARCHAR) || '.example.org' END AS host
  FROM documents
"""

# unordered per-doc co-mention pairs (subj < obj), one row per (doc, pair)
COMENTION_PAIRS_SQL = f"""
  WITH links AS ({LINKS_SQL}),
  ents AS (
    SELECT DISTINCT doc_id, entity_id FROM links WHERE entity_id IS NOT NULL
  )
  SELECT a.doc_id, a.entity_id AS subj, b.entity_id AS obj
  FROM ents a JOIN ents b
    ON a.doc_id = b.doc_id AND a.entity_id < b.entity_id
"""

# corpus = documents + near-dups (every 4th doc, drop every 7th token)
#                    + exact dups (every 5th doc)
DEDUP_CORPUS_SQL = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000,
    array_to_string(
      list_where(string_split(text, ' '),
                 list_transform(generate_series(1, len(string_split(text, ' '))),
                                i -> (i - 1) % 10 <> 9)), ' ')
  FROM documents WHERE doc_id % 4 = 0
  UNION ALL
  SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 5 = 0
"""

SHINGLES_SQL = f"""
  SELECT DISTINCT doc_id AS id,
    arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2] AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM ({DEDUP_CORPUS_SQL})) d,
       LATERAL (SELECT unnest(generate_series(1, len(d.arr) - 2)) AS i) t
"""

JACCARD_SQL = f"""
WITH sh AS ({SHINGLES_SQL}),
sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT i.id_a, i.id_b,
  round(CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter), 6) AS jaccard
FROM inter i JOIN sizes sa ON i.id_a = sa.id JOIN sizes sb ON i.id_b = sb.id
"""

MINHASH_PAIRS_CTES = f"""
    sh AS ({SHINGLES_SQL}),
    hashed AS (SELECT id, {md5_long_sql('shingle')} % {MH_R} AS x FROM sh),
    sigs AS (
      SELECT id, h.i AS i, min((h.a * x + h.b) % {MH_R}) AS mh
      FROM hashed CROSS JOIN {minhash_coeffs_sql()} h
      GROUP BY id, h.i
    ),
    banded AS (
      SELECT id, i // {ROWS_PER_BAND} AS band,
        string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS sig
      FROM sigs GROUP BY id, i // {ROWS_PER_BAND}
    ),
    cands AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM banded a JOIN banded b ON a.band = b.band AND a.sig = b.sig AND a.id < b.id
    ),
    verified AS (SELECT * FROM ({JACCARD_SQL}) WHERE jaccard >= 0.5),
    pairs AS (
      SELECT c.id_a, c.id_b, v.jaccard
      FROM cands c JOIN verified v ON c.id_a = v.id_a AND c.id_b = v.id_b
    )
"""


# Fixed-init Lloyd (k-means) CTE mirror — shared by the IVF / IVF-PQ /
# SemDeDup oracles (registry_dedup_text, registry_kg_embed). Lives here,
# below the registry import graph, so either family module can be
# imported first without a cycle.
def _lloyd_assign_sql(cent: str, out: str) -> str:
    """One nearest-centroid assignment CTE pair (squared-L2 argmin,
    ties -> smallest list id)."""
    return f"""
    {out}_d AS (
      SELECT e.vec_id, c.list_id, sum((e.x - c.c) * (e.x - c.c)) AS d
      FROM exploded e JOIN {cent} c ON e.dim = c.dim
      GROUP BY e.vec_id, c.list_id
    ),
    {out} AS (
      SELECT vec_id, list_id FROM (
        SELECT vec_id, list_id,
          row_number() OVER (PARTITION BY vec_id
                             ORDER BY d ASC, list_id ASC) AS rn
        FROM {out}_d) WHERE rn = 1
    )"""


def _lloyd_prefix_parts(n_lists: int, iters: int) -> list[str]:
    """CTE parts for the full fixed-init Lloyd chain, ending at
    ``afinal(vec_id, list_id)`` — shared by the IVF and SemDeDup
    oracles so the k-means mirror lives in exactly one place."""
    parts = [
        f"""
    exploded AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    norms AS (
      SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM exploded GROUP BY vec_id
    ),
    seeds AS (
      SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER)
               AS list_id
      FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {n_lists})
    ),
    cent0 AS (
      SELECT s.list_id, e.dim, e.x AS c
      FROM seeds s JOIN exploded e ON s.vec_id = e.vec_id
    )"""
    ]
    for i in range(iters):
        parts.append(_lloyd_assign_sql(f"cent{i}", f"a{i + 1}"))
        parts.append(f"""
    m{i + 1} AS (
      SELECT a.list_id, e.dim, avg(e.x) AS c
      FROM a{i + 1} a JOIN exploded e ON a.vec_id = e.vec_id
      GROUP BY a.list_id, e.dim
    ),
    cent{i + 1} AS (
      SELECT c0.list_id, c0.dim, coalesce(m.c, c0.c) AS c
      FROM cent{i} c0
      LEFT JOIN m{i + 1} m ON c0.list_id = m.list_id AND c0.dim = m.dim
    )""")
    parts.append(_lloyd_assign_sql(f"cent{iters}", "afinal"))
    return parts
