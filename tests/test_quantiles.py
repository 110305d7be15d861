"""operators/quantiles: the sorted-array exact-quantile operator must
be value-identical to Spark's ``percentile`` aggregate (which the
DuckDB oracles' ``quantile_cont`` already matches at 6 dp) — including
interpolated positions, ties, NULL inputs, and single-row groups —
and NULL (not an ANSI error) on empty/all-NULL groups."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incubyte_vaccination_data_pipeline_spark.operators.quantiles import (
    quantile_cont,
    sorted_values,
)


@pytest.fixture(scope="module")
def groups(spark):
    # deterministic values with ties, negatives, and a NULL; group 'c'
    # is a single row (every quantile = that row); group 'd' all-NULL
    rows = []
    for i in range(101):
        rows.append(("a", float((i * 37) % 101)))
    for i in range(10):
        rows.append(("b", float(i % 4)))  # heavy ties
    rows.append(("b", None))
    rows.append(("c", 42.5))
    rows.append(("d", None))
    return spark.createDataFrame(rows, "g string, v double")


@pytest.mark.parametrize("q", [0.0, 0.025, 0.5, 0.9, 0.99, 1.0])
def test_matches_percentile_aggregate(groups, q):
    ref = {
        r["g"]: r["p"]
        for r in groups.groupBy("g")
        .agg(F.round(F.percentile(F.col("v"), F.lit(q)), 6).alias("p"))
        .collect()
    }
    got = {
        r["g"]: r["p"]
        for r in groups.groupBy("g")
        .agg(sorted_values("v").alias("arr"))
        .select("g", quantile_cont("arr", q).alias("p"))
        .collect()
    }
    assert got == ref  # exact equality, incl. None for group 'd'


def test_empty_array_is_null_not_error(spark):
    # the ANSI hazard: element_at on an empty array throws under the
    # driver's ANSI-ON session; the guard must yield NULL instead
    df = spark.createDataFrame([([],)], "arr array<double>")
    assert df.select(quantile_cont("arr", 0.5).alias("p")).collect()[0][
        "p"
    ] is None
