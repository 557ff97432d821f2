"""Query registry: the engine's public query surface.

Every operator from ``SURVEY.md §2`` (and every north-star extension)
registers here as a named query with:

- ``fn(spark, sf_dir) -> DataFrame`` — the Spark-first implementation;
- ``oracle`` — an equivalent ANSI-SQL string DuckDB can run on the same
  parquet tables (``None`` for genuinely non-SQL-expressible ops, which
  the driver then checks rows-only);
- ``headline`` — whether ``bench.py`` times it at sf0.1.

``__spark_entry__.py`` exposes this registry through the driver
contract (``queries()`` / ``oracle_sql()``).
"""

from __future__ import annotations

import importlib.util
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    doc: str = ""
    headline: bool = False
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}

# Modules that register queries on import. Order is cosmetic (registry
# is a dict); grouped as SURVEY.md §2 groups them.
_QUERY_MODULES = [
    "p4_mapreduce_spark.operators.relational",
    "p4_mapreduce_spark.operators.relational_extra",
    "p4_mapreduce_spark.operators.tpch_more",
    "p4_mapreduce_spark.operators.joins",
    "p4_mapreduce_spark.operators.windows",
    "p4_mapreduce_spark.operators.setops",
    "p4_mapreduce_spark.operators.aggregates",
    "p4_mapreduce_spark.operators.subqueries",
    "p4_mapreduce_spark.operators.nested",
    "p4_mapreduce_spark.operators.pandas_udfs",
    "p4_mapreduce_spark.functions.scalar_queries",
    "p4_mapreduce_spark.operators.mapreduce_compat",
    "p4_mapreduce_spark.operators.text_analysis",
    "p4_mapreduce_spark.operators.pipeline_ops",
    "p4_mapreduce_spark.operators.analytics",
    "p4_mapreduce_spark.operators.timeseries",
    "p4_mapreduce_spark.operators.dedup",
    "p4_mapreduce_spark.operators.graph",
    "p4_mapreduce_spark.operators.similarity",
    "p4_mapreduce_spark.operators.retrieval",
    "p4_mapreduce_spark.operators.ml_cluster",
    "p4_mapreduce_spark.operators.sketches",
    "p4_mapreduce_spark.operators.multimodal",
    "p4_mapreduce_spark.operators.sql_modern",
    "p4_mapreduce_spark.operators.fuzzy_text",
    "p4_mapreduce_spark.operators.megapipeline",
    "p4_mapreduce_spark.streaming.windows",
]


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    headline: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as query ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            doc=doc or (fn.__doc__ or "").strip(),
            headline=headline,
            tags=tags,
        )
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (idempotent) and return the registry.

    Modules listed but not yet present are skipped (the list is the
    build plan); a module that exists but fails to import raises.
    """
    for mod in _QUERY_MODULES:
        if importlib.util.find_spec(mod) is not None:
            importlib.import_module(mod)
    return REGISTRY
