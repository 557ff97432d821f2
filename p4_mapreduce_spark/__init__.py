"""p4_mapreduce_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
the reference MapReduce framework (``andrerod22/p4-mapreduce``, surveyed
in ``SURVEY.md``), re-expressed Spark-first: DataFrame/SQL logical
plans, Catalyst optimization, Tungsten execution — plus the
LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) the reference never had, designed for 100 TB
scale.

Layout
------
- ``session``    : SparkSession factory (AQE, Arrow, partition tuning).
- ``sources``    : parquet/text/binary readers over the test tables.
- ``operators``  : relational, join, window, dedup, similarity,
                   text-analysis, multimodal, and MapReduce-compat
                   operators. Each registers queries in ``registry``.
- ``functions``  : reusable column-expression builders (deterministic
                   rounding, vector math, hashing) shared by operators
                   and their DuckDB oracle SQL.
- ``plans``      : generic job API (the reference's submit() surface)
                   and plan-inspection helpers.
- ``streaming``  : Structured Streaming versions of the windowed ops.
"""

from p4_mapreduce_spark.session import get_spark
from p4_mapreduce_spark.registry import REGISTRY, register, load_all

__all__ = ["get_spark", "REGISTRY", "register", "load_all"]

__version__ = "0.1.0"
