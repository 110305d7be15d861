"""Round-7 staged queries, now registered: driver-style DuckDB
side-by-side for the four queries staged during round 6, plus the
guard that they joined the live registry in round 7 (the growth
simulation in test_rotation.py gated the registration timing)."""

from __future__ import annotations

import duckdb
import pytest

from incubyte_vaccination_data_pipeline_spark import catalog
from incubyte_vaccination_data_pipeline_spark.catalog import round7_staged
from incubyte_vaccination_data_pipeline_spark.sources.parquet_io import TESTDATA_TABLES
from tests.test_oracle import _normalize, _values_equal


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def test_staged_now_registered():
    """Round 7: all four staged queries are live in the registry (and
    therefore also swept by tests/test_oracle.py); this file keeps the
    explicit per-query side-by-side as the registration-independent
    anchor."""
    assert set(round7_staged.STAGED) <= set(catalog.QUERIES)
    assert set(round7_staged.STAGED) <= set(catalog.ORACLES)


@pytest.mark.parametrize("name", sorted(round7_staged.STAGED))
def test_staged_query_matches_oracle(spark, sf_dir, duck, name):
    fn, oracle = round7_staged.STAGED[name]
    spark_df = fn(spark, sf_dir).toPandas()
    duck_df = duck.execute(oracle).df()
    assert len(spark_df) == len(duck_df)
    spark_df.columns = [c.lower() for c in spark_df.columns]
    duck_df.columns = [c.lower() for c in duck_df.columns]
    s, d = _normalize(spark_df), _normalize(duck_df)
    assert sorted(s.columns) == sorted(d.columns)
    for col in s.columns:
        for av, bv in zip(s[col], d[col]):
            if av is None and bv is None:
                continue
            assert _values_equal(av, bv), (name, col, av, bv)
