"""Round-7 staged queries (implemented, tested, NOT yet registered).

The round-6 window is full: 8 force-staled rewrites + 38 new
registrations occupy 46 of the 50 driver slots, and the growth
simulation (tests/test_rotation.py) shows that registering these
three too would push the oldest re-verification cohort past the
ceil(N/50) bound — the same trade round 4 made when it staged the
round5_ext family. They pass the driver-style DuckDB side-by-side at
sf0.001 + sf0.01 (tests/test_round7_staged.py) and register with one
``register()`` call in round 7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from incubyte_vaccination_data_pipeline_spark.catalog.registry import QUERIES, ORACLES
from incubyte_vaccination_data_pipeline_spark.catalog.relational_ext import (
    _REVENUE_SQL,
    _revenue,
)
from incubyte_vaccination_data_pipeline_spark.sources.parquet_io import read_table

_PATH_TOP = 20


def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 3-step user paths (sequential pattern mining, the n-gram
    extension of ``events_markov_transitions``'s 1-step matrix): every
    consecutive event-type triple per user, counted corpus-wide —
    the "what do users do next" path-analysis staple. One user_id
    shuffle (the LEAD window), one map-side-combinable count, top-k
    via TakeOrderedAndProject; ordering pinned by (ts, event_id) so
    intra-second ties cannot reorder paths between engines.

    Scale: paths are generated in-row from the window (no explode, no
    self-join); the count's key domain is |event_types|^3 — tiny."""
    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = events.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
    ).filter(F.col("t1").isNotNull() & F.col("t2").isNotNull())
    return (
        o.select(
            F.concat_ws(">", "event_type", "t1", "t2").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "path")
        .limit(_PATH_TOP)
    )


_EVENTS_TOP_PATHS_ORACLE = f"""
    WITH o AS (
        SELECT user_id, event_type,
               LEAD(event_type, 1) OVER w AS t1,
               LEAD(event_type, 2) OVER w AS t2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type || '>' || t1 || '>' || t2 AS path,
           COUNT(*) AS n_occurrences
    FROM o WHERE t1 IS NOT NULL AND t2 IS NOT NULL
    GROUP BY 1
    ORDER BY n_occurrences DESC, path
    LIMIT {_PATH_TOP}
    """


def events_bot_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user automation/bot signal profile — the trust-and-safety
    screen a production event pipeline runs before analytics trust the
    traffic: event rate (events/hour over the active span), behavioral
    diversity (distinct event types), and inter-arrival-time variance
    (human traffic is bursty; automation is metronomic). Each signal
    is emitted for EVERY user alongside a rule-hit count (rate > 10/h,
    single-type high volume, low-variance cadence), so the consumer
    sets its own threshold. The IAT variance is emitted in EXACT
    integer form (n^2 * var = n * sum(d^2) - (sum d)^2 over the
    lag-window differences): a 6dp-rounded double at ~1e9 magnitude
    exceeds double significand precision, so engine round()
    implementations disagree in the last ulp — the integer form is
    hash-exact and the low-variance rule compares integers
    (var_n2 < 3600 * n^2). The span denominator is span+1 so
    single-burst users cannot divide by zero.

    Scale: one scan, one user_id shuffle shared by the lag window and
    the per-user aggregate (same partitioning), O(users) output."""
    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = events.select(
        "user_id",
        "event_type",
        F.col("ts").cast("long").alias("ts_s"),
        (
            F.col("ts").cast("long")
            - F.lag(F.col("ts").cast("long")).over(w)
        ).alias("iat"),
    )
    g = o.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("ts_s") - F.min("ts_s")).alias("span_s"),
        F.countDistinct("event_type").alias("n_types"),
        F.sum("iat").cast("bigint").alias("iat_sum"),
        F.sum(F.col("iat") * F.col("iat")).cast("bigint").alias("iat_sum2"),
        F.count("iat").alias("n_iat"),
    ).filter(F.col("n_iat") >= 1)
    eph = "cast(n_events as double) * 3600.0D / cast(span_s + 1 as double)"
    # variance stays INTEGER: n^2 * var = n * sum(d^2) - (sum d)^2 — a
    # rounded 6dp double at ~1e9 magnitude needs more significant
    # digits than a double carries, so the engines' round()
    # implementations disagree in the last ulp (found by the strict
    # driver-style compare); the integer form is hash-exact and the
    # low-variance rule restates as var_n2 < 3600 * n^2
    var_n2 = "n_iat * iat_sum2 - iat_sum * iat_sum"
    return g.select(
        "user_id",
        "n_events",
        "span_s",
        "n_types",
        F.round(F.expr(eph), 6).alias("events_per_hour"),
        F.expr(f"cast({var_n2} as bigint)").alias("iat_var_n2"),
        F.expr(
            f"cast((case when {eph} > 10.0D then 1 else 0 end)"
            " + (case when n_types = 1 and n_events >= 10 then 1 else 0 end)"
            f" + (case when n_iat >= 10 and {var_n2} < 3600 * n_iat * n_iat"
            " then 1 else 0 end) as int)"
        ).alias("rule_hits"),
    )


_EVENTS_BOT_SIGNALS_ORACLE = """
    WITH o AS (
        SELECT user_id, event_type,
               date_diff('second', TIMESTAMP '1970-01-01', ts) AS ts_s,
               date_diff('second', TIMESTAMP '1970-01-01', ts)
               - LAG(date_diff('second', TIMESTAMP '1970-01-01', ts))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS iat
        FROM events
    ),
    g AS (
        SELECT user_id,
               COUNT(*) AS n_events,
               MAX(ts_s) - MIN(ts_s) AS span_s,
               CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
               CAST(SUM(iat) AS BIGINT) AS iat_sum,
               CAST(SUM(iat * iat) AS BIGINT) AS iat_sum2,
               COUNT(iat) AS n_iat
        FROM o GROUP BY user_id
    )
    SELECT user_id, n_events, span_s, n_types,
           ROUND(CAST(n_events AS DOUBLE) * 3600.0
                 / CAST(span_s + 1 AS DOUBLE), 6) AS events_per_hour,
           CAST(n_iat * iat_sum2 - iat_sum * iat_sum AS BIGINT)
               AS iat_var_n2,
           CAST((CASE WHEN CAST(n_events AS DOUBLE) * 3600.0
                           / CAST(span_s + 1 AS DOUBLE) > 10.0
                      THEN 1 ELSE 0 END)
                + (CASE WHEN n_types = 1 AND n_events >= 10
                        THEN 1 ELSE 0 END)
                + (CASE WHEN n_iat >= 10
                             AND n_iat * iat_sum2 - iat_sum * iat_sum
                                 < 3600 * n_iat * n_iat
                        THEN 1 ELSE 0 END) AS INT) AS rule_hits
    FROM g WHERE n_iat >= 1
    """


def lineitem_yoy_brand_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per part brand — the BI staple
    (period-over-period comparison via LAG over the period dimension).
    Revenue aggregates DECIMAL-exact per (brand, year) before the one
    double cast; the growth ratio is a fixed float op sequence over
    those exact sums, rounded at 6dp. The part dimension broadcasts
    into the fact scan (star-join shape); the LAG window partitions on
    brand — years per brand are calendar-bounded, so window state is
    tiny. First year per brand drops (no prior period)."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.year("l_shipdate").cast("int").alias("year"),
        )
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )
    w = Window.partitionBy("brand").orderBy("year")
    return (
        rev.withColumn("prev_revenue", F.lag("revenue").over(w))
        .filter(F.col("prev_revenue").isNotNull())
        .select(
            "brand",
            "year",
            "revenue",
            "prev_revenue",
            F.round(
                (F.col("revenue") - F.col("prev_revenue"))
                / F.col("prev_revenue")
                * 100.0,
                6,
            ).alias("yoy_pct"),
        )
    )


_LINEITEM_YOY_BRAND_GROWTH_ORACLE = f"""
    WITH rev AS (
        SELECT p.p_brand AS brand,
               CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS year,
               CAST(SUM({_REVENUE_SQL}) AS DOUBLE) AS revenue
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2
    )
    SELECT brand, year, revenue,
           LAG(revenue) OVER (PARTITION BY brand ORDER BY year)
               AS prev_revenue,
           ROUND((revenue - LAG(revenue) OVER (PARTITION BY brand
                                               ORDER BY year))
                 / LAG(revenue) OVER (PARTITION BY brand ORDER BY year)
                 * 100.0, 6) AS yoy_pct
    FROM rev
    QUALIFY LAG(revenue) OVER (PARTITION BY brand ORDER BY year)
            IS NOT NULL
    """


STAGED = {
    "events_top_paths": (events_top_paths, _EVENTS_TOP_PATHS_ORACLE),
    "events_bot_signals": (events_bot_signals, _EVENTS_BOT_SIGNALS_ORACLE),
    "lineitem_yoy_brand_growth": (lineitem_yoy_brand_growth, _LINEITEM_YOY_BRAND_GROWTH_ORACLE),
}


def register(names: list[str] | None = None) -> None:
    """Move staged queries into the live registry (round-7 kickoff:
    call ``round7_staged.register()`` from catalog/__init__.py)."""
    for name in (names if names is not None else list(STAGED)):
        fn, oracle = STAGED[name]
        QUERIES[name] = fn
        ORACLES[name] = oracle
