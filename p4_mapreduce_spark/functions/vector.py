"""Vector math over array<float> embedding columns — dual builders.

Each helper comes as (Spark Column, SQL fragment) generated from the
same formula so queries and DuckDB oracles stay bit-identical:

- Spark computes dot products as an explicit left-associative chain of
  ``element_at`` products, ``((0.0 + t1) + t2) + ...`` — plain
  arithmetic that WHOLE-STAGE-CODEGENS (r6: the previous
  ``aggregate(zip_with(...))`` fold computed the identical doubles but
  higher-order functions run INTERPRETED, ~100x slower per pair — the
  same finding that moved the k-means assignment to Arrow);
- the SQL twin emits the same sum as an explicit left-associative
  64-term expression, so both engines execute the identical IEEE
  operation sequence — no reduction-order nondeterminism.

All math is float32→float64 upcast first (exact), then double ops.
Everything stays JVM-side / codegen'd — no Python UDF; at 100 TB a
brute-force cosine scan is bandwidth-bound, exactly where you want it.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

EMBEDDING_DIM = 64


def as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column, dim: int = EMBEDDING_DIM) -> Column:
    """Left-associative dot product of two array<double> columns over
    the first ``dim`` elements — bit-identical to the old
    aggregate/zip_with fold (same ``(0.0 + t1) + t2 + ...`` IEEE
    sequence) but expressed as plain arithmetic so it stays inside
    whole-stage codegen instead of the interpreted HOF evaluator."""
    expr = F.lit(0.0)
    for i in range(1, dim + 1):
        expr = expr + F.element_at(a, i) * F.element_at(b, i)
    return expr


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
