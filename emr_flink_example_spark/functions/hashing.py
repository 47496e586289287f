"""Portable deterministic hashing.

MinHash / SimHash / fingerprint operators need a 64-bit-ish integer hash of a
string that an external oracle (DuckDB) can reproduce exactly. Spark's
`xxhash64` and DuckDB's `hash` are different algorithms, so we standardize on
md5 (identical everywhere) and take the top 15 hex digits as a non-negative
60-bit integer:

    Spark : conv(substring(md5(s), 1, 15), 16, 10) :: bigint
    DuckDB: ('0x' || substr(md5(s), 1, 15)) :: bigint

60 bits keeps us clear of BIGINT overflow in both engines while leaving
collision probability negligible (~1e-10 at 1e4 distinct tokens). md5 is
computed JVM-side by Catalyst — no Python in the hot path — and is only used
where cross-engine determinism matters; internal-only hashing should prefer
`xxhash64` (faster).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne prime 2^61 - 1, the classic universal-hashing modulus.
MERSENNE_61 = (1 << 61) - 1


def portable_hash(col: Column) -> Column:
    """Deterministic 60-bit non-negative hash of a string column."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def portable_hash_sql_duckdb(expr: str) -> str:
    """The DuckDB expression computing exactly `portable_hash(expr)`."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def minhash_perm(h: Column, a: int, b: int) -> Column:
    """One universal-hash permutation h_i(x) = (a*h(x) + b) mod (2^61-1).

    `a`/`b` must be < 2^31 so a*h (60-bit h) stays within signed-64 range ...
    it does not: 31+60 > 63. So we first fold h into 31 bits (h % 2^31-1),
    keeping the multiplication inside BIGINT for both Spark and DuckDB.
    """
    h31 = h % F.lit((1 << 31) - 1)
    return (F.lit(a) * h31 + F.lit(b)) % F.lit(MERSENNE_61)


def minhash_perm_sql_duckdb(h_expr: str, a: int, b: int) -> str:
    return f"(({a}::BIGINT * ({h_expr} % 2147483647) + {b}) % {MERSENNE_61})"
