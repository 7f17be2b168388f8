"""Stable fleet-wide hashing — FNV-1a 64 + splitmix64 finaliser.

Reproduces the reference's wire-law partition contract bit-for-bit
(libs/routers_realtime/src/partition.rs:13-45): never rely on an engine's
built-in ``hash()`` for placement that must survive resume/rewrites (the
reference calls this out explicitly; Spark's ``hash()`` has the same caveat).

Provided as numpy kernels AND dialect-portable SQL (both Spark and DuckDB
evaluate the identical unsigned-64 arithmetic via signed BIGINT wrapping).
"""

from __future__ import annotations

import numpy as np

from routers_spark.config import N_PARTITIONS

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x00000100000001B3)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def fnv1a_np(data: bytes) -> int:
    """FNV-1a 64 of a byte string (partition.rs:19-26)."""
    h = _FNV_OFFSET
    with np.errstate(over="ignore"):
        for b in data:
            h = np.uint64(h ^ np.uint64(b)) * _FNV_PRIME
    return int(h)


def mix_np(x) -> np.ndarray:
    """splitmix64 finaliser (partition.rs:31-38), vectorized over uint64."""
    x = np.asarray(x, dtype=np.uint64)
    with np.errstate(over="ignore"):
        x = x ^ (x >> np.uint64(30))
        x = x * _MIX1
        x = x ^ (x >> np.uint64(27))
        x = x * _MIX2
        return x ^ (x >> np.uint64(31))


def partition_of_np(vehicle_id) -> np.ndarray:
    """``splitmix64(id) % 1024`` (partition.rs:43-45)."""
    v = np.asarray(vehicle_id).astype(np.uint64)
    return (mix_np(v) % np.uint64(N_PARTITIONS)).astype(np.int64)


def splitmix64_sql(x: str, dialect: str) -> str:
    """splitmix64 as SQL over signed BIGINT two's-complement arithmetic.

    Multiplication overflow: Spark BIGINT ``*`` wraps silently;
    DuckDB raises — so for DuckDB we decompose the 64x64 product into
    32-bit limbs that never overflow. XOR/shift need an unsigned right
    shift emulated from the arithmetic one.
    """

    def ushr(a: str, n: int) -> str:
        if dialect == "spark":
            return f"shiftrightunsigned({a}, {n})"
        # DuckDB >> on BIGINT is arithmetic; mask the smeared sign bits.
        mask = (1 << (64 - n)) - 1
        return f"(({a} >> {n}) & {mask})"

    def xor(a: str, b: str) -> str:
        return f"({a} ^ {b})" if dialect == "spark" else f"xor({a}, {b})"

    def _to_i64(c: int) -> int:
        return c - (1 << 64) if c >= (1 << 63) else c

    def mul(a: str, c: int) -> str:
        if dialect == "spark":
            return f"({a} * {_to_i64(c)})"
        # DuckDB: wrapping 64-bit multiply via 128-bit HUGEINT, with the
        # constant split in 32-bit limbs so no intermediate exceeds 2^97:
        #   u*c mod 2^64 = (u*c_lo + (u mod 2^32)*c_hi*2^32) mod 2^64
        c_lo, c_hi = c & 0xFFFFFFFF, (c >> 32) & 0xFFFFFFFF
        u = (
            f"(CAST({a} AS HUGEINT) + CASE WHEN ({a}) < 0"
            f" THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END)"
        )
        p = (
            f"(({u} * {c_lo} + ({u} % 4294967296) * {c_hi} * 4294967296)"
            f" % 18446744073709551616::HUGEINT)"
        )
        return (
            f"CAST({p} - CASE WHEN {p} >= 9223372036854775808::HUGEINT"
            f" THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END AS BIGINT)"
        )

    e = f"({x})"
    e = xor(e, ushr(e, 30))
    e = mul(e, 0xBF58476D1CE4E5B9)
    e = xor(e, ushr(e, 27))
    e = mul(e, 0x94D049BB133111EB)
    e = xor(e, ushr(e, 31))
    return e


def partition_of_sql(x: str, dialect: str) -> str:
    """``splitmix64(x) % 1024`` as SQL; the low 10 bits via mask (values are
    uniformly mixed so mask == modulo for a power of two)."""
    return f"({splitmix64_sql(x, dialect)} & {N_PARTITIONS - 1})"
