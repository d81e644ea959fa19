"""Cross-engine deterministic hashing.

All content hashing in the dedup/fingerprint operators goes through
standard MD5 (bit-identical everywhere) reduced to a bounded integer:

    H(s) = parse(substr(md5(s), 1, 15), base=16)   # 60 bits, positive
    h_i(x) = (a_i * (x % R) + b_i) % R             # minhash family

R = 1_000_003 (prime) keeps a_i * x well inside int64 in both Spark
(silent wraparound) and DuckDB (overflow error) — no overflow, no
engine divergence. xxhash64/crc32 are Spark-only, so they are NOT
used for anything that must match the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

R = 1_000_003  # prime modulus for the minhash family

# (band, row) layout: N_HASHES = BANDS * ROWS_PER_BAND.
# 8 bands x 2 rows targets recall ~0.9 at Jaccard 0.5
# (P = 1 - (1 - j^2)^8), trading more candidates for recall — right
# for dedup, where the exact-Jaccard verify pass prunes cheaply.
N_HASHES = 16
BANDS = 8
ROWS_PER_BAND = 2

# deterministic affine-family coefficients (small primes; literal on
# both engines)
MINHASH_COEFFS: list[tuple[int, int, int]] = [
    (i, 2 * i + 3, 104729 * (i + 1) % R) for i in range(N_HASHES)
]


def md5_long(c: Column) -> Column:
    """H(s): first 15 hex chars of md5 as a positive 60-bit long."""
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    """DuckDB twin of ``md5_long``."""
    return f"CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 15)) AS BIGINT)"


def minhash_coeffs_sql() -> str:
    """VALUES list (i, a, b) for the hash family."""
    vals = ", ".join(f"({i}, {a}, {b})" for i, a, b in MINHASH_COEFFS)
    return f"(SELECT * FROM (VALUES {vals}) h(i, a, b))"
