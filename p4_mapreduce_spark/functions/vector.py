"""Vector math over array<float> embedding columns — dual builders.

Each helper comes as (Spark Column, SQL fragment) generated from the
same formula so queries and DuckDB oracles stay bit-identical:

- Spark computes dot products with a sequential left fold
  (``aggregate(zip_with(...))``), i.e. ``((0.0 + t1) + t2) + ...``;
- the SQL twin emits the same sum as an explicit left-associative
  64-term expression, so both engines execute the identical IEEE
  operation sequence — no reduction-order nondeterminism.

All math is float32→float64 upcast first (exact), then double ops.
Everything stays JVM-side / vectorized — no Python UDF; at 100 TB a
brute-force cosine scan is bandwidth-bound, exactly where you want it.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

EMBEDDING_DIM = 64


def as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dot_sql(a: str, b: str, dim: int = EMBEDDING_DIM) -> str:
    """Left-associative explicit dot product (matches the Spark fold)."""
    terms = " + ".join(
        f"(CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE))"
        for i in range(1, dim + 1)
    )
    return f"(0.0 + {terms})"


def cosine(a: Column | str, b: Column | str) -> Column:
    ad, bd = as_double(a), as_double(b)
    return dot(ad, bd) / F.sqrt(dot(ad, ad) * dot(bd, bd))


def cosine_sql(a: str, b: str, dim: int = EMBEDDING_DIM) -> str:
    return (
        f"({dot_sql(a, b, dim)}) / "
        f"sqrt(({dot_sql(a, a, dim)}) * ({dot_sql(b, b, dim)}))"
    )
