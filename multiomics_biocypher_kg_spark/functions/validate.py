"""Hard-error validation contracts (F9/F10).

The reference's observations adapter raises on the first unknown
boolean token / out-of-vocabulary category
(/root/reference/multiomics_kg/adapters/observations_adapter.py:78-126,
:435-461). Spark expressions cannot raise row-level errors cleanly,
so the engine uses validate-then-fail (SURVEY.md §7.3 hard part #5):
one aggregation pass counts violations and collects examples, then
the driver raises with the evidence — same contract, one extra job,
no partial output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ValidationError(ValueError):
    pass


def _fail_if_any(df: DataFrame, bad: Column, what: str, show: int = 5) -> None:
    """ONE bounded job on the happy path (a plain count — no row
    buffering, so a systematically-broken input with millions of
    violations cannot OOM the validator); the example fetch is a
    second, ``show``-bounded job taken only on the failure path."""
    n = df.where(bad).count()
    if n:
        sample = [
            r.j
            for r in df.where(bad)
            .select(F.to_json(F.struct(*df.columns)).alias("j"))
            .head(show)
        ]
        raise ValidationError(f"{what}: {n} violating rows, e.g. {sample}")


def map_boolean_tokens(
    df: DataFrame,
    col: str,
    true_tokens: list[str],
    false_tokens: list[str],
    skip_tokens: list[str] = (),
    blank_policy: str = "skip",  # 'skip' | 'true' | 'false' (+ 'error' ext.)
) -> DataFrame:
    """F9 (_parse_boolean_cell, observations_adapter.py:78-126):
    declared-token boolean mapping, hard error on unknowns.

    Output column ``{col}_bool`` is the reference's string enum
    'true'|'false' (or null for skipped rows). blank_policy follows
    the reference exactly ('skip' -> null, 'true'/'false' -> that
    enum; anything else raises like _apply_blank_policy), plus an
    'error' extension that fails fast on blanks. Token precedence is
    the reference's: true_tokens, then false_tokens, then
    skip_tokens. Differential-tested against the reference function
    in tests/test_metabolite_assay_parity.py.
    """
    if blank_policy not in ("skip", "true", "false", "error"):
        raise ValidationError(f"Invalid blank_policy {blank_policy!r}")
    c = F.trim(F.col(col))
    is_blank = F.col(col).isNull() | (c == "")
    known = (
        c.isin(*true_tokens)
        | c.isin(*false_tokens)
        | (c.isin(*skip_tokens) if skip_tokens else F.lit(False))
    )
    bad = ~is_blank & ~known
    _fail_if_any(df, bad, f"unknown boolean token in {col!r}")
    if blank_policy == "error":
        _fail_if_any(df, is_blank, f"blank value in {col!r}")
    mapped = (
        F.when(c.isin(*true_tokens), F.lit("true"))
        .when(c.isin(*false_tokens), F.lit("false"))
        .when(
            is_blank & F.lit(blank_policy in ("true", "false")),
            F.lit(blank_policy if blank_policy in ("true", "false") else None),
        )
        .otherwise(F.lit(None))
    )
    return df.withColumn(f"{col}_bool", mapped)


def enforce_categories(
    df: DataFrame, col: str, allowed: list[str], allow_null: bool = True
) -> DataFrame:
    """F10: allowed-set enforcement — anti-join vs allowed values,
    assert empty, return df unchanged (validation is a pass, not a
    transform)."""
    c = F.col(col)
    bad = ~c.isin(*allowed)
    if allow_null:
        bad = c.isNotNull() & bad
    _fail_if_any(df, bad, f"out-of-vocabulary category in {col!r}")
    return df


# parse_embedded_mean_sd_n's anchored cell grammar
# (metabolite_assay_adapter.py:67-69), verbatim
_EMBEDDED_RE = (
    r"^\s*([0-9.+\-eE]+)\s*\(\s*([0-9.+\-eEnNaA/]+)\s*\)\s*,\s*n\s*=\s*(\d+)\s*$"
)


def parse_embedded_stats(df: DataFrame, col: str) -> DataFrame:
    """A12 (parse_embedded_mean_sd_n,
    metabolite_assay_adapter.py:181-203): parse embedded
    '0.00054 (8.8e-05), n=2' cells into (mean, sd, n) — anchored
    regexp + casts, no Python. Pinned to the reference:

    - the WHOLE cell must match the grammar ('1.5' alone -> nulls,
      unlike a prefix match);
    - 'nd' / 'n.d.' (case-insensitive) -> (0.0, 0.0, 0);
    - a non-numeric sd inside the parens (e.g. 'NA') -> 0.0;
    - empty / unparseable -> all null.

    Differential-tested against the reference function itself in
    tests/test_metabolite_assay_parity.py."""
    s = F.trim(F.col(col).cast("string"))
    matched = s.rlike(_EMBEDDED_RE)
    is_nd = F.lower(s).isin("nd", "n.d.")
    mean = F.when(is_nd, F.lit(0.0)).when(
        matched, F.regexp_extract(s, _EMBEDDED_RE, 1).try_cast("double")
    )
    sd = F.when(is_nd, F.lit(0.0)).when(
        matched,
        F.coalesce(
            F.regexp_extract(s, _EMBEDDED_RE, 2).try_cast("double"), F.lit(0.0)
        ),
    )
    n = F.when(is_nd, F.lit(0)).when(
        matched, F.regexp_extract(s, _EMBEDDED_RE, 3).try_cast("int")
    )
    return df.select(
        "*",
        mean.alias(f"{col}_mean"),
        sd.alias(f"{col}_sd"),
        n.alias(f"{col}_n"),
    )
