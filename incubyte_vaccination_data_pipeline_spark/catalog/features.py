"""Feature-store patterns: point-in-time-correct trailing features.

``pit_trailing_features`` computes, for every order, the customer's
trailing-90-day order count and spend as of the moment *before* that
order — the leakage-free "point-in-time join" every ML feature store
exists to provide (training rows must never see same-moment or future
activity). Spark-first shape: a single ``RANGE BETWEEN 90 PRECEDING
AND 1 PRECEDING`` window over an integer day number per customer —
no self-join, no per-row subquery, one ``o_custkey`` shuffle. The
strictly-preceding range frame is what encodes the leakage rule:
same-day sibling orders are excluded along with the current row.

Money stays DECIMAL(18,2) until the final cast (the repo-wide
money-determinism convention), so the trailing sums are exact and
order-independent.

Reference parity: the reference has no feature surface; this extends
the training-data family (splits / contamination / sequences) with
the supervised-learning feature side.

100 TB posture: one scan, one keyed shuffle, and a sorted range-frame
window whose state is one running aggregate per customer — the same
cost class as the SCD2 build. Skewed customers are bounded by their
own history length, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from incubyte_vaccination_data_pipeline_spark.catalog.registry import query
from incubyte_vaccination_data_pipeline_spark.sources.parquet_io import read_table

_DEC = "decimal(18,2)"
_TRAIL_DAYS = 90
_EPOCH = "1990-01-01"


@query(
    "pit_trailing_features",
    oracle=f"""
    SELECT o_orderkey,
           o_custkey,
           o_orderdate,
           CAST(COALESCE(COUNT(*) OVER w, 0) AS BIGINT)
               AS feat_orders_{_TRAIL_DAYS}d,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w,
                         0) AS DOUBLE) AS feat_spend_{_TRAIL_DAYS}d
    FROM (
        SELECT *, CAST(date_diff('day', DATE '{_EPOCH}', o_orderdate)
                       AS BIGINT) AS day_no
        FROM orders
    )
    WINDOW w AS (
        PARTITION BY o_custkey ORDER BY day_no
        RANGE BETWEEN {_TRAIL_DAYS} PRECEDING AND 1 PRECEDING
    )
    """,
)
def pit_trailing_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free trailing features via one strictly-preceding
    range-frame window per customer."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        "o_totalprice",
        F.datediff(F.col("o_orderdate"), F.lit(_EPOCH).cast("date"))
        .cast("bigint")
        .alias("day_no"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_no")
        .rangeBetween(-_TRAIL_DAYS, -1)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.coalesce(F.count(F.lit(1)).over(w), F.lit(0))
        .cast("bigint")
        .alias(f"feat_orders_{_TRAIL_DAYS}d"),
        F.coalesce(
            F.sum(F.col("o_totalprice").cast(_DEC)).over(w), F.lit(0).cast(_DEC)
        )
        .cast("double")
        .alias(f"feat_spend_{_TRAIL_DAYS}d"),
    )
