"""PII detection / scrubbing for training-data curation.

Emails, phone-like digit runs, and IPv4 literals are detected and
masked with typed placeholders — the standard pre-training scrub
pass. Everything is native regexp Column expressions (whole-stage
codegen, no Python); the same pattern TEXT is embedded in the DuckDB
oracle, so the patterns are restricted to the syntax both engines
(Java regex / RE2) interpret identically: no lookarounds, no
backreferences, ASCII word boundaries only.

Masking order is fixed (email -> ip -> phone) and placeholders
contain no digits, so later passes can't re-match inside an earlier
mask. The driver corpus contains no PII by construction — the
registry query proves the zero-count path end to end, and the unit
tests (tests/test_pii.py) pin detection and masking on hand-built
fixtures.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IP_RE = r"\b(\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = r"\+?[0-9][0-9()\- ]{6,}[0-9]\b"

EMAIL_MASK = "<EMAIL>"
IP_MASK = "<IP>"
PHONE_MASK = "<PHONE>"


def email_count(c: Column) -> Column:
    return F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), F.lit(0)))


def ip_count(c: Column) -> Column:
    return F.size(F.regexp_extract_all(c, F.lit(IP_RE), F.lit(0)))


def phone_count(c: Column) -> Column:
    """Counted AFTER email+ip masking so an ip or a phone-looking
    email local part is not double-counted."""
    return F.size(
        F.regexp_extract_all(_mask_email_ip(c), F.lit(PHONE_RE), F.lit(0))
    )


def _mask_email_ip(c: Column) -> Column:
    return F.regexp_replace(
        F.regexp_replace(c, EMAIL_RE, EMAIL_MASK), IP_RE, IP_MASK
    )


def scrub(c: Column) -> Column:
    """Masked text: email -> ip -> phone, fixed order."""
    return F.regexp_replace(_mask_email_ip(c), PHONE_RE, PHONE_MASK)


def scrub_sql(expr: str) -> str:
    """DuckDB twin of :func:`scrub` (regexp_replace with 'g' flag —
    Spark's regexp_replace is global by default)."""
    return (
        f"regexp_replace(regexp_replace(regexp_replace({expr}, "
        f"'{EMAIL_RE}', '{EMAIL_MASK}', 'g'), "
        f"'{IP_RE}', '{IP_MASK}', 'g'), "
        f"'{PHONE_RE}', '{PHONE_MASK}', 'g')"
    )


def counts_sql(expr: str) -> dict[str, str]:
    """DuckDB twins of the three count columns."""
    masked = (
        f"regexp_replace(regexp_replace({expr}, "
        f"'{EMAIL_RE}', '{EMAIL_MASK}', 'g'), '{IP_RE}', '{IP_MASK}', 'g')"
    )
    return {
        "n_emails": f"len(regexp_extract_all({expr}, '{EMAIL_RE}'))",
        "n_ips": f"len(regexp_extract_all({expr}, '{IP_RE}'))",
        "n_phones": f"len(regexp_extract_all({masked}, '{PHONE_RE}'))",
    }
