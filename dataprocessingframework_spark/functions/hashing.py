"""Deterministic, engine-portable hashing primitives.

Everything downstream (exact dedup, minhash, simhash, fingerprinting,
LSH bucketing) is built on one primitive: a 60-bit integer hash derived
from md5, chosen because md5 is bit-identical in Spark, DuckDB, and
Python — which makes every sketch oracle-checkable, unlike
engine-native ``hash()`` functions which differ per engine.

Spark:  conv(substring(md5(x), 1, 15), 16, 10) :: long
DuckDB: CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)

15 hex digits = 60 bits, always positive in an int64.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^31 - 1, Mersenne prime: (a * h + b) % p products stay < 2^62.
MINHASH_PRIME = 2_147_483_647


def hash64(col: Column | str) -> Column:
    """60-bit md5-derived hash of a string column (JVM-side, codegen)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hash64_py(s: str) -> int:
    """Python twin of :func:`hash64` for goldens and driver-side checks."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def minhash_coeffs(k: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) for k universal-hash functions
    h_i(x) = (a_i * x + b_i) mod p. Same formula is inlined into the
    DuckDB oracle SQL, so coefficients must stay stable."""
    p = MINHASH_PRIME
    out = []
    for i in range(k):
        a = ((2 * i + 1) * 2_654_435_761) % p  # odd multiplier, Knuth constant
        b = (i * 40_503 * 65_537 + 1_013_904_223) % p
        out.append((a if a != 0 else 1, b))
    return out


def minhash_expr(h: Column, a: int, b: int) -> Column:
    """One universal-hash application over a pre-reduced 31-bit hash."""
    return (h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME)
