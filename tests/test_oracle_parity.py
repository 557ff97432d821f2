"""The correctness gate, locally: every registered query with an
oracle must hash-match DuckDB on the same parquet (driver bar)."""

from __future__ import annotations

import pytest

from p4_mapreduce_spark.registry import load_all
from tests.oracle import compare_frames, run_oracle

REGISTRY = load_all()
ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


# r14 driver-window split (see pytest.ini): the 275-query replay is
# ~5 min and duplicates the check the driver itself performs against
# __spark_entry__ (and tools/verify_contract.py replays on demand);
# run it with `pytest -m slow` before committing operator changes.
@pytest.mark.slow
@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, name):
    spec = REGISTRY[name]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    oracle_pdf = run_oracle(spec.oracle, sf_dir)
    compare_frames(spark_pdf, oracle_pdf, name=name)


def test_every_query_has_an_oracle():
    """Since r3 the registry carries zero rows-only queries; pin that
    so a regression (a new query shipped without an oracle) is loud."""
    assert ROWS_ONLY_QUERIES == []


if ROWS_ONLY_QUERIES:  # pragma: no cover - guarded by the pin above

    @pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
    def test_rows_only_queries_run(spark, sf_dir, name):
        spec = REGISTRY[name]
        df = spec.fn(spark, sf_dir)
        assert df.count() >= 0
        assert len(df.schema) > 0
