"""Portable seeded pseudo-randomness as pure bigint SQL arithmetic.

The reference derives *all* randomness from ``(seed, epoch)`` so that an
index stream is reproducible across ranks and workers (reference
``src/scdataset/scdataset.py:471-488``).  We keep that design rule but go
one step further: randomness must also be reproducible across *engines*,
because the driver checks every query against a DuckDB oracle.

``rand(seed)`` is unusable in a plan (re-evaluated on recompute, engine-
specific) and ``xxhash64`` has no DuckDB twin.  So the engine's one
randomness primitive is an affine-xorshift mixer mod 2^31-1 that both
Spark SQL and DuckDB evaluate identically using only ``*``, ``+``, ``%``,
integer division and XOR on BIGINTs.  No 64-bit overflow is possible:
every intermediate product stays < 2^63.

``mix(k, seed)`` -> uniform-looking bigint in [0, 2^31-1), deterministic,
stable under recompute and across engines.  All sampling/shuffling
operators draw their randomness exclusively from this.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MIX_MOD = 2_147_483_647  # 2^31 - 1 (prime)
_M1 = 2_654_435_761
_M2 = 1_597_334_677
_M3 = 1_103_515_245
_A1 = 2_246_822_519
_A3 = 12_345


def _div(a: str, b: int, dialect: str) -> str:
    """Floor division on non-negative bigints."""
    return f"(({a}) // {b})" if dialect == "duckdb" else f"(({a}) div {b})"


def _xor(a: str, b: str, dialect: str) -> str:
    return f"xor({a}, {b})" if dialect == "duckdb" else f"(({a}) ^ ({b}))"


def mix_sql(k: str, seed: int, dialect: str = "spark") -> str:
    """SQL text computing mix(k, seed); ``k`` is a SQL expression that
    must evaluate to a non-negative BIGINT (values up to ~2^33 are safe).

    Two affine rounds mod 2^31-1 interleaved with xorshifts (a PCG-style
    output permutation): max intermediate is
    (2^31-1) * 2654435761 ≈ 5.7e18 < 2^63-1.

    >>> import duckdb
    >>> duckdb.sql("SELECT " + mix_sql("7", 42, "duckdb")).fetchone()[0]
    527903548
    >>> mix_sql("x", 1, "spark").count("div") > 0  # spark integer division
    True
    >>> mix_sql("x", 1, "nope")
    Traceback (most recent call last):
        ...
    ValueError: unknown dialect: nope
    """
    if dialect not in ("spark", "duckdb"):
        raise ValueError(f"unknown dialect: {dialect}")
    h1 = f"(((({k}) % {MIX_MOD}) * {_M1} + {(seed % MIX_MOD) * _A1 % MIX_MOD} + 3266489917) % {MIX_MOD})"
    x = _xor(h1, _div(h1, 1 << 21, dialect), dialect)
    h2 = f"((({x}) * {_M2}) % {MIX_MOD})"
    y = _xor(h2, _div(h2, 1 << 16, dialect), dialect)
    return f"(((({y}) * {_M3} + {_A3}) % {MIX_MOD}))"


def mix_py(k: int, seed: int) -> int:
    """Pure-Python twin of :func:`mix_sql` — bit-identical to both SQL
    dialects, for driver-side fixture/data generation that must agree
    with in-plan randomness.

    >>> mix_py(7, 42)
    527903548
    """
    h1 = (
        (k % MIX_MOD) * _M1 + (seed % MIX_MOD) * _A1 % MIX_MOD + 3_266_489_917
    ) % MIX_MOD
    x = h1 ^ (h1 >> 21)
    h2 = (x * _M2) % MIX_MOD
    y = h2 ^ (h2 >> 16)
    return (y * _M3 + _A3) % MIX_MOD


def mix_col(k: Column | str, seed: int) -> Column:
    """Spark Column form of mix(k, seed).

    ``k`` may be a column name / SQL expression string.  Column objects
    are not accepted because the mixer is generated as SQL text shared
    with the DuckDB oracle dialect — pass the expression string instead.
    """
    if isinstance(k, Column):
        raise TypeError("pass k as a SQL string expression, e.g. 'row_id'")
    return F.expr(mix_sql(k, seed, "spark"))
