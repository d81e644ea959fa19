"""Chemistry helpers (F13).

Re-expresses the reference's chemparse-based formula handling
(/root/reference/multiomics_kg/adapters/metabolism_adapter.py:40-53)
as a native regexp program — sorted unique element symbols from a
Hill-notation formula, with the same never-raise contract (malformed
or empty -> empty list).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# a formula is a sequence of Element[count] tokens, optionally grouped
# with parentheses (group counts allowed) or separated by '.' (hydrate
# dot notation)
_FORMULA_VALID_RE = r"^([A-Z][a-z]?\d*|\(|\)\d*|\.\d*)+$"
_ELEMENT_RE = r"([A-Z][a-z]?)\d*"


def formula_elements(c: Column) -> Column:
    """F13 (_parse_elements): Hill-notation formula -> sorted unique
    element symbols; null/empty/malformed -> [] (a bad KEGG formula
    must never break the build)."""
    syms = F.array_sort(
        F.array_distinct(F.regexp_extract_all(c, F.lit(_ELEMENT_RE), 1))
    )
    return F.when(
        c.isNull() | (c == "") | ~c.rlike(_FORMULA_VALID_RE),
        F.array().cast("array<string>"),
    ).otherwise(syms)
