"""Round-4-staged catalog queries (catalog/training_ext.py): run the
same Spark-vs-DuckDB side-by-side compare the driver will, before the
queries enter the live registry."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from incubyte_vaccination_data_pipeline_spark.catalog import training_ext
from incubyte_vaccination_data_pipeline_spark.catalog.registry import QUERIES
from incubyte_vaccination_data_pipeline_spark.sources.parquet_io import TESTDATA_TABLES


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: "NULL" if pd.isna(v) else str(v))
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", sorted(training_ext.STAGED))
def test_staged_query_matches_oracle(spark, sf_dir, duck, name):
    fn, oracle = training_ext.STAGED[name]
    s = _norm(fn(spark, sf_dir).toPandas())
    o = _norm(duck.execute(oracle).df())
    assert list(s.columns) == list(o.columns), name
    assert len(s) > 0, f"{name} is vacuous"
    assert s.equals(o), f"{name}: spark {len(s)} rows vs oracle {len(o)} rows"


def test_staged_queries_not_yet_registered():
    """Registration is deferred to the round-4 window (see module
    docstring); importing training_ext must not mutate the registry."""
    assert not (set(training_ext.STAGED) & set(QUERIES))
