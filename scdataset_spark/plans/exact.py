"""Exact order-independent sums without decimal buffers (limb form).

Spark backs any decimal sum buffer over precision 18 with BigDecimal —
~0.25 s per aggregated column per 600 k rows of pure serde, and in
Structured Streaming the same serde applies to every STATE update.  The
limb form keeps the exactness with pure long arithmetic:

- the value is fixed-pointed at 1e-8: ``v = FLOOR(x*1e8 + 0.5)`` — the
  same two IEEE double ops in Spark and DuckDB, so ``v`` is identical
  bit-for-bit on both sides even where the fixed point saturates double
  precision (|x| >~ 9e7);
- ``v`` is split into three 1e6-wide limbs, each summed as BIGINT:
  the l0/l1 per-row terms are bounded in (-1e6, 1e6), so those two
  accumulators are overflow-safe to ~9.2e12 rows per group REGARDLESS
  of |x|; the TOP limb's per-row term is ``v DIV 1e12`` ≈ |x|/1e4 —
  unbounded — so the l2 accumulator's true bound is |x|-dependent:
  sum(|x|) <= ~9.2e22 per group;
- recombination uses only truncated DIV/% (verified identical for
  negative operands in both engines: -7 DIV 2 = -3, -7 % 2 = -1 in
  Spark and DuckDB), then one deterministic two-op IEEE expression to
  double — value-identical across engines by construction.

Overflow bounds (|x|-dependent — the binding constraint is usually the
RECOMBINATION, not the accumulators): ``lsum_out`` multiplies the top
limb by 1e4 in BIGINT, which wraps when |l2| > ~9.2e14, i.e. when
sum(|x|) per group exceeds ~9.2e18.  For value-scale inputs
(|x| ~ 1e5, e.g. extendedprice) that is ~9e13 rows per group — far
past any decade this engine targets — but for MOMENT sums the term
magnitude squares: x² ~ 1.7e10 gives a per-row l2 term of ~1.7e6 and
wraps at only ~5e8 rows per group.  DuckDB never wraps (sum(BIGINT)
promotes to HUGEINT there), so an unguarded wrap is a SILENT
cross-engine divergence in non-ANSI Spark.  ``lsum_out``'s Spark
dialect therefore guards the recombination with ``raise_error`` —
loud failure, never a wrong value.  Call sites whose groups can
legitimately exceed the bound (giant-group moments) should pre-split
the group (e.g. sub-aggregate by a salt, then re-sum the limbs) or
drop the fixed point to 1e-4 for the squared terms.

Used by the TPC-H pattern set (``queries/relational.py``, which
re-exports these names), the windowed running sums, and the streaming
window aggregates.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _lsum_v(expr: str) -> str:
    return f"CAST(FLOOR(({expr}) * 100000000.0 + 0.5) AS BIGINT)"


def lsum_inner(expr: str, tag: str, div: str = "DIV") -> str:
    """The three limb-sum aggregate columns (SQL fragment).  ``div`` is
    the dialect's integer-division operator: ``DIV`` (Spark), ``//``
    (DuckDB)."""
    v = _lsum_v(expr)
    return (
        f"sum(({v}) % 1000000) AS {tag}_l0, "
        f"sum((({v}) {div} 1000000) % 1000000) AS {tag}_l1, "
        f"sum(({v}) {div} 1000000000000) AS {tag}_l2"
    )


def lsum_cols(expr: str, tag: str) -> list:
    """Spark side of :func:`lsum_inner` for use in ``.agg(*...)``.
    Catalyst CSEs the shared scaled subexpression across the three
    sums (measured: inline within 12% of a hand-projected variant)."""
    v = _lsum_v(expr)
    return [
        F.expr(f"sum(({v}) % 1000000)").alias(f"{tag}_l0"),
        F.expr(f"sum((({v}) DIV 1000000) % 1000000)").alias(f"{tag}_l1"),
        F.expr(f"sum(({v}) DIV 1000000000000)").alias(f"{tag}_l2"),
    ]


def lsum_out(tag: str, alias: str, div: str = "DIV") -> str:
    """Recombine the three limb sums into the final double ``alias``.
    total = l2*1e12 + l1*1e6 + l0 is split into intpart/frac with
    overflow-safe long arithmetic (l1*1e6 would overflow directly), and
    the double is intpart + frac/1e8 — the identical op sequence in
    both dialects.

    The Spark dialect guards ``l2 * 10000`` (the recombination term
    that wraps first — see the module docstring's |x|-dependent bound):
    |l2| past 9.1e14 raises instead of silently wrapping, because the
    DuckDB side runs the same sum in HUGEINT and would silently
    diverge.  The guard is one per-GROUP CASE on the final projection —
    zero per-row cost.  Threshold arithmetic (ADVICE r14): the guard
    admits |l2*1e4| up to 9.1e18, leaving 2^63-1 - 9.1e18 ≈ 1.23e17 of
    headroom, which covers the additive terms' worst case — |l1 DIV
    100| < ~9.2e16 (|l1| itself bounded by the same ~9.2e18 row bound)
    plus the f0 DIV 1e8 term (orders of magnitude smaller) — so the
    recombination sum stays inside int64 whenever the guard passes.
    NULL sums (all-NULL input groups) pass through: abs(NULL) > k is
    NULL, so the CASE falls to the multiply and NULL propagates."""
    f0 = f"(({tag}_l1 % 100) * 1000000 + {tag}_l0)"
    if div == "DIV":  # Spark: BIGINT recombination — guard the wrap
        top = (
            f"(CASE WHEN abs({tag}_l2) > 910000000000000 THEN "
            f"CAST(raise_error('lsum_out: top limb |{tag}_l2| exceeds the "
            f"BIGINT recombination range (sum(|x|) > ~9.2e18 in one group) "
            f"— pre-split the group or rescale the fixed point') AS BIGINT) "
            f"ELSE {tag}_l2 * 10000 END)"
        )
    else:  # DuckDB: sum(BIGINT) is HUGEINT — never wraps
        top = f"({tag}_l2 * 10000)"
    ip = f"({top} + ({tag}_l1 {div} 100) + ({f0} {div} 100000000))"
    return (
        f"CAST({ip} AS DOUBLE) + CAST(({f0} % 100000000) AS DOUBLE)"
        f" / 100000000.0 AS {alias}"
    )
