"""Portable (Spark <-> DuckDB reproducible) hashing primitives.

``xxhash64`` is Spark-only, so any operator built on it can only get a
rows-only driver check. Everything here derives hash material from
``md5`` — byte-identical lowercase hex in Spark, DuckDB, and Python —
plus pure int64 arithmetic, so MinHash/SimHash/LSH pipelines built on
these primitives carry full value-hash DuckDB oracles:

- ``md5_long(col, n)``: first ``n`` hex chars of md5 as a non-negative
  long. Spark: ``conv(substr(md5(c),1,n),16,10)`` cast long; DuckDB:
  ``('0x'||substr(md5(c),1,n))::BIGINT``. ``n<=15`` (60 bits) keeps the
  value inside signed int64.
- Carter-Wegman universal family ``h_i(x) = (A[i]*x + B[i]) % P`` over
  the 32-bit ``md5_long(col, 8)`` value: ONE md5 per input row yields
  any number of independent hash columns via multiply-mod. This is
  both portable and cheaper than one xxhash64 per (row, i):
  ``A[i] < P < 2^31`` and ``x < 2^32`` bound ``A*x < 2^63`` — no
  overflow under Spark 4's ANSI mode.

Coefficients are generated once at import from a fixed seed; the
DuckDB oracle SQL (built at import in queries/*) inlines the same
constants, so both engines always agree.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

#: prime modulus < 2^31 for the multiply-mod family
P = 2_038_074_743

_MAX_HASHES = 64
_rng = np.random.RandomState(20260813)
A: list[int] = [int(a) for a in _rng.randint(1, P, size=_MAX_HASHES)]
B: list[int] = [int(b) for b in _rng.randint(0, P, size=_MAX_HASHES)]


def md5_long(c: Column, n: int = 8) -> Column:
    """First ``n`` hex chars of md5 as a non-negative long (n <= 15)."""
    if not 1 <= n <= 15:
        raise ValueError("n must be in [1, 15] to fit signed int64")
    return F.conv(F.substring(F.md5(c), 1, n), 16, 10).cast("long")


def universal_hash(i: int, x: Column) -> Column:
    """i-th Carter-Wegman hash of a 32-bit value column."""
    return (F.lit(A[i]) * x + F.lit(B[i])) % F.lit(P)


# -- DuckDB-side SQL fragments (same constants, same arithmetic) ------------


def duck_md5_long(expr: str, n: int = 8) -> str:
    """DuckDB twin of :func:`md5_long` as a SQL fragment."""
    return f"('0x' || substr(md5({expr}), 1, {n}))::BIGINT"


def duck_coef_values(num_hashes: int) -> str:
    """DuckDB VALUES table ``coef(i, a, b)`` with the first ``num_hashes``
    (A, B) coefficient pairs, for a CROSS JOIN hash fan-out."""
    rows = ", ".join(f"({i}, {A[i]}, {B[i]})" for i in range(num_hashes))
    return f"(VALUES {rows}) coef(i, a, b)"
