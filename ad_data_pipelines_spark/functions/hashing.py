"""Portable, oracle-reproducible hashing expressions.

Spark's native `xxhash64`/`hash` are fast but engine-specific; for
operators whose correctness is checked against a DuckDB oracle (dedup,
minhash, fingerprints) we derive 60-bit integers from MD5 — both engines
produce identical values, so the whole dedup pipeline is bit-reproducible
cross-engine. Production pipelines can swap `portable_hash64` for
`F.xxhash64` via the `fast=` flag (same algebra, cheaper hash).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne prime 2^61 - 1: modulus for minhash permutations.
MERSENNE_61 = (1 << 61) - 1


def portable_hash64(col: Column | str, *, fast: bool = False) -> Column:
    """Deterministic non-negative 60-bit hash of a string column.

    Portable form: first 15 hex chars of md5 → bigint. DuckDB equivalent:
    ``CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    if fast:
        # pmod, not abs: abs(Long.MIN_VALUE) is still Long.MIN_VALUE in
        # Java two's-complement, which would leak a negative "hash"
        return F.pmod(F.xxhash64(c), F.lit((1 << 63) - 1))
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


#: 31-bit Mersenne prime: universe size for minhash permutations. Reducing
#: the 60-bit base hash to 31 bits keeps a*h+b inside int64 (a < 2^31)
#: with collision probability ~n/2^31 — negligible for shingle sets.
MERSENNE_31 = (1 << 31) - 1


def minhash_perm(h: Column, a: int, b: int) -> Column:
    """One universal-hash permutation ``(a*(h mod P) + b) mod P`` with
    P = 2^31-1. Identical arithmetic is expressible in ANSI SQL, so the
    DuckDB oracle reproduces the exact minhash signatures."""
    h31 = h % F.lit(MERSENNE_31)
    return (h31 * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_31)
