"""Portable cross-engine rounding.

``round(double, n)`` disagrees between engines on half-way binary
values: Spark rounds the exact binary expansion (BigDecimal HALF_UP)
while DuckDB multiplies by 10^n first and rounds that product — e.g.
52298.924999999996 → Spark .92, DuckDB .93 (5229892.5000000003 rounds
up).  Since every float in the engine's outputs is display-rounded, we
standardize on ONE formula executed identically (same IEEE ops, same
order) on both engines:

    pround(x, n) = floor(x * 10^n + 0.5) / 10^n      -- half-toward-+∞

The oracle SQL spells it the same way, so value hashes match bit-for-
bit.  Semantics deviation from PG ROUND (half away from zero) only on
negative half-way values — documented engine-wide choice.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def pround(col: Column, digits: int = 2) -> Column:
    """floor(x·10^n + 0.5)/10^n — deterministic cross-engine rounding."""
    scale = 10 ** digits
    return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def pround_sql(expr: str, digits: int = 2) -> str:
    """The identical formula as SQL text (for oracle strings)."""
    scale = 10 ** digits
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"


# ---------------------------------------------------------------------------
# Exact monetary aggregation.
#
# Summing 2-decimal money as double is ORDER-DEPENDENT: both engines
# produce values a few ulps apart, and because source data is exact
# cents, sums/averages land exactly on .xx5 halfway points where any
# rounding formula flips on 1-ulp noise.  The reference keeps money in
# DECIMAL (init.sql:53-54) — we do the same for aggregation: cast to
# decimal (exact, associative), sum, surface as double.  Deterministic
# on every engine and every partitioning, at any scale.
# ---------------------------------------------------------------------------

def dsum(col: Column, scale: int = 2) -> Column:
    """Exact decimal sum of a fixed-point column, surfaced as double."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


def davg(col: Column, scale: int = 2) -> Column:
    """Exact-sum average: decimal sum ÷ non-null count, in double.
    Both engines divide the identical exact operands → identical bits."""
    return dsum(col, scale) / F.count(col)


def dsum_sql(expr: str, scale: int = 2) -> str:
    return f"CAST(sum(CAST(({expr}) AS DECIMAL(18,{scale}))) AS DOUBLE)"


def davg_sql(expr: str, scale: int = 2) -> str:
    return f"({dsum_sql(expr, scale)} / count({expr}))"
