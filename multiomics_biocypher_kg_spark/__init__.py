"""PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the reference pipeline
(wosnat/multiomics_biocypher_kg: schema-driven ETL emitting typed
node/edge tuples, tiered entity resolution, fixed-point
canonicalization, rollup enrichment) as staged Spark DataFrame
transforms over a Common-Crawl-style page corpus:

    pages(url, warc_ts, html binary, text, lang)
      -> extract   (html -> text, byte-identical per url)
      -> mention   (gazetteer detection vs broadcast vocab)
      -> link      (tiered resolution cascade, J3 semantics)
      -> canonicalize (connected components over same-as edges, G1)
      -> materialize  (typed nodes / edges / (subj,pred,obj) triples)
      -> enrich    (group rollups, window ranks/percentiles/buckets)

Everything is DataFrame/SQL (Catalyst-optimized); per-row work is
confined to vectorized Arrow pandas UDFs (HTML extraction, trie
matching). No row-at-a-time Python UDFs anywhere.
"""

__version__ = "0.1.0"

from multiomics_biocypher_kg_spark.session import build_session  # noqa: F401
