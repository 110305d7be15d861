"""Round-7 staged queries: driver-style DuckDB side-by-side for the
three implemented-but-not-yet-registered queries, plus the guard that
they are NOT in the live registry this round (the growth simulation in
test_rotation.py is what forces the staging)."""

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


def test_staged_not_registered():
    assert not set(round7_staged.STAGED) & set(catalog.QUERIES)


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
