"""Local mirror of the driver's correctness gate: run every catalog
query on Spark and its oracle on DuckDB over the same parquet tables,
compare row count, column names, and (order-insensitively) values."""

from __future__ import annotations

import datetime as _dt
import math

import duckdb
import pandas as pd
import pytest

from incubyte_vaccination_data_pipeline_spark import catalog
from incubyte_vaccination_data_pipeline_spark.sources.parquet_io import TESTDATA_TABLES

ORACLE_NAMES = sorted(catalog.ORACLES)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm_value(v):
    if pd.isna(v):
        return None  # uniform null marker (None vs NaT vs NaN)
    if isinstance(v, (pd.Timestamp, _dt.date, _dt.datetime)):
        ts = pd.Timestamp(v)
        return ts.date().isoformat() if ts == ts.normalize() else ts.isoformat()
    return v


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(_norm_value)
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b or abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return str(a) == str(b)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    spark_df = catalog.QUERIES[name](spark, sf_dir).toPandas()
    duck_df = duck.execute(catalog.ORACLES[name]).df()

    assert len(spark_df) == len(duck_df), (
        f"{name}: row count {len(spark_df)} != oracle {len(duck_df)}"
    )
    assert sorted(c.lower() for c in spark_df.columns) == sorted(
        c.lower() for c in duck_df.columns
    ), f"{name}: columns {sorted(spark_df.columns)} != {sorted(duck_df.columns)}"

    spark_df.columns = [c.lower() for c in spark_df.columns]
    duck_df.columns = [c.lower() for c in duck_df.columns]
    s = _normalize(spark_df)
    d = _normalize(duck_df)
    mismatches = []
    for col in s.columns:
        for i, (av, bv) in enumerate(zip(s[col], d[col])):
            an, bn = pd.isna(av), pd.isna(bv)
            if an and bn:
                continue
            if an != bn or not _values_equal(av, bv):
                mismatches.append((col, i, av, bv))
                if len(mismatches) >= 5:
                    break
        if len(mismatches) >= 5:
            break
    assert not mismatches, f"{name}: value mismatches {mismatches}"


def test_approx_count_distinct_tolerance(spark, sf_dir):
    """The query now emits an in-query 5% error-bound assertion on the
    HLL estimate (the raw estimate is engine-specific, so the oracle
    states the bound as literal TRUE); every group must satisfy it."""
    rows = catalog.QUERIES["agg_approx_count_distinct"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.approx_within_5pct, (
            f"{r.o_orderpriority}: HLL estimate outside 5% of "
            f"{r.exact_customers}"
        )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(q for q in e.oracle_sql()) <= set(e.queries())
