"""CURIE normalization — the reference's #1 hot spot, made free.

The reference normalized ~3M CURIEs through bioregistry at ~45% of
total build wall-clock before adding an lru_cache
(/root/reference/multiomics_kg/utils/curie_utils.py:1-34). The Spark
re-expression removes the per-row work entirely: the prefix registry
is tiny and static, so normalization is a driver-side dict + one
native ``concat_ws`` / ``translate`` per column — no UDF, no cache,
nothing per-row in Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# bioregistry-normalized prefix map (the subset the reference uses;
# schema_config.yaml preferred_id values + underscore fallbacks)
PREFIX_REGISTRY: dict[str, str] = {
    "ncbigene": "ncbigene",
    "NCBIGene": "ncbigene",
    "uniprot": "uniprot",
    "UniProt": "uniprot",
    "UniProtKB": "uniprot",
    "go": "go",
    "GO": "go",
    "eccode": "eccode",
    "EC": "eccode",
    "kegg.orthology": "kegg.orthology",
    "KO": "kegg.orthology",
    "kegg.compound": "kegg.compound",
    "tcdb": "tcdb",
    "cazy": "cazy",
    "doi": "doi",
    "DOI": "doi",
    "insdc.gcf": "insdc.gcf",
    "psortb": "psortb",
    "signalp": "signalp",
}


def normalize_prefix(prefix: str) -> str:
    """Driver-side prefix normalization with underscore fallback
    (curie_utils.py:20-34 semantics: unknown prefix -> lowercase,
    spaces -> underscores)."""
    return PREFIX_REGISTRY.get(prefix, prefix.lower().replace(" ", "_"))


def make_curie(prefix: str, local_id: Column) -> Column:
    """Normalized CURIE column: prefix resolved ONCE on the driver,
    composed with native concat — zero per-row Python."""
    return F.concat_ws(":", F.lit(normalize_prefix(prefix)), local_id.cast("string"))


def normalize_curie_col(c: Column) -> Column:
    """Column already holding 'prefix:local' CURIEs: normalize the
    prefix via a CASE over the (tiny) registry — native expression."""
    prefix = F.split(c, ":", 2)[0]
    local = F.substring_index(c, ":", -1)
    norm = None
    for raw, n in PREFIX_REGISTRY.items():
        cond = prefix == raw
        norm = F.when(cond, F.lit(n)) if norm is None else norm.when(cond, F.lit(n))
    norm = norm.otherwise(F.regexp_replace(F.lower(prefix), " ", "_"))
    return F.concat_ws(":", norm, local)


def clean_text(c: Column) -> Column:
    """F1 (curie_utils.py:38-53): single-pass translate of
    '|' -> ',' and "'" -> '^' (the Neo4j-array-delimiter escape)."""
    return F.translate(c, "|'", ",^")
