"""Deterministic float normalization for cross-engine hash matching.

The driver compares every query against a DuckDB oracle with an
order-insensitive **value hash** — so floating-point aggregates must be
*bit-identical* across Spark and DuckDB, not merely close. Two facts
make that achievable:

1. IEEE-754 double ops (+ - * / floor sqrt) are deterministic: the same
   expression tree over the same inputs yields the same bits in any
   engine. Only **reduction order** (SUM/AVG over a group) varies.
2. The synthetic data is decimal-clean: money columns carry exactly 2
   decimals, ``l_quantity`` is integral (verified against
   ``/root/testdata`` — see tests). So the *true* value of a money sum
   is an exact multiple of 0.01, while the float summation error is
   ~1e-9 — far below the 0.005 rounding boundary.

Normalization recipe: ``floor(x * 10^d + 0.5) / 10^d``. We avoid the
engines' ``round()`` builtins on purpose — Spark rounds on the decimal
string repr (BigDecimal HALF_UP) while DuckDB rounds in binary, and
they disagree exactly at the .xx5 boundaries; the floor form is pure
IEEE arithmetic, identical in both.

Every helper comes as a *pair*: a Spark ``Column`` builder and a SQL
fragment builder, so a query and its oracle are generated from the same
formula and can never drift.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def fix(c: Column | str, decimals: int = 2) -> Column:
    """Normalize a double to ``decimals`` places, IEEE-deterministically."""
    scale = float(10**decimals)
    return F.floor(_col(c) * scale + F.lit(0.5)) / scale


def fix_sql(expr: str, decimals: int = 2) -> str:
    """SQL twin of :func:`fix` (DuckDB + SparkSQL compatible)."""
    scale = float(10**decimals)
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"


def fsum(c: Column | str, decimals: int = 2) -> Column:
    """SUM normalized to the true value's decimal precision.

    Correct when the *inputs* have at most ``decimals`` decimals (so the
    true sum does too) and the group is small enough that float error
    stays under ``0.5 * 10^-decimals`` (error ~n·eps·|sum|; safe up to
    ~1e12 rows per group at d=2 for money-sized values).
    """
    return fix(F.sum(_col(c)), decimals)


def fsum_sql(expr: str, decimals: int = 2) -> str:
    return fix_sql(f"sum({expr})", decimals)


def favg(c: Column | str, decimals: int = 2) -> Column:
    """AVG as (normalized SUM) / COUNT — deterministic division of
    already-identical doubles, no boundary risk on the quotient."""
    return fsum(c, decimals) / F.count(F.lit(1))


def favg_sql(expr: str, decimals: int = 2) -> str:
    return f"{fsum_sql(expr, decimals)} / count(*)"
