"""Shared column expressions with exact DuckDB-SQL parity.

Every helper here has two faces: a PySpark Column expression and a SQL
template string that DuckDB evaluates to the *same value* — the foundation
of the driver's side-by-side correctness gate.

PRODUCTION NOTE — the md5 layer is an oracle-parity choice, not an engine
dependency: every ``md5_long``/``md5_mod`` call site (minhash shingles,
simhash word hashes, fingerprints, exact-dedup content hashes) only needs
a uniform 64-bit hash, and in production should be ``F.xxhash64(col)``
(or ``F.xxhash64(col, F.lit(seed))`` for the per-permutation variants) —
one JVM intrinsic instead of md5 + hex substring + base-16 conv.
Measured on the sf0.1 word-hash map (round 3): xxhash64 is ~1.13x faster
— modest, because the interpreted higher-order ``transform`` around the
hash dominates, not the hash itself.  md5 is kept because DuckDB has no
xxhash64 twin and the correctness gate demands identical values on both
engines; swapping is a one-line change here, with no operator logic
depending on the hash beyond determinism + uniformity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# modulus for polynomial/minhash arithmetic: fits comfortably in int64
# even after (2^31-1) * (2^31-1) style products are avoided by reducing
# operands first.
HASH_P = 2147483647  # 2^31 - 1 (Mersenne prime)
POLY_P = 1000000007


def md5_long(col: Column) -> Column:
    """Stable 60-bit integer hash of a string, identical in Spark and
    DuckDB: first 15 hex digits of md5, parsed base-16.

    Spark's xxhash64 has no DuckDB twin, so md5 is the cross-engine
    choice (both implement RFC 1321 over utf-8 bytes).
    """
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10).cast("long")


def sql_md5_long(expr: str) -> str:
    """DuckDB equivalent of :func:`md5_long`."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def md5_mod(col: Column, p: int = HASH_P) -> Column:
    return md5_long(col) % F.lit(p)


def sql_md5_mod(expr: str, p: int = HASH_P) -> str:
    return f"({sql_md5_long(expr)} % {p})"
