"""The four queries staged during round 6 and REGISTERED in round 7.

History: the round-6 driver window was full (8 force-staled rewrites +
38 new registrations occupied 46 of the 50 slots), so these four
(``events_top_paths``, ``lineitem_yoy_brand_growth``,
``events_bot_signals``, ``text_zipf_fit``) were implemented and
oracle-verified locally first (tests/test_round7_staged.py, driver-style
DuckDB side-by-side at sf0.001 + sf0.01) and registered via
``register()`` from ``catalog/__init__.py`` in round 7; the EDF
rotation queues them for their first driver window in round 8.
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



_ZIPF_TOP = 500


def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus token-frequency distribution
    via log-log regression of frequency on rank for the top-500
    (_ZIPF_TOP) tokens — the corpus-linguistics sanity check (natural
    text slopes ~ -1; templated/synthetic text deviates) and a quality
    gate for generated-data detection. Ranks come from a top-k over
    the vocabulary aggregate (map-side-combinable count + distributed
    partial top-k; the regression then runs on a 500-row frame — the
    vocabulary-bounded pattern of the BPE family). Determinism: the
    log values are QUANTIZED to floor(ln(x) * 2^20) BIGINTs before
    summing (sums of floats are partition-order-dependent; sums of
    ints are exact — the perplexity recipe), and the slope/intercept
    combine those exact sums in one fixed float op sequence, rounded
    at 6dp.

    Emits one row: n_tokens_fit, slope, intercept, r2 — slope ~ -1 is
    the Zipf signature. (A ``.replace()`` on this literal previously
    made it an EXPRESSION, not a docstring — __doc__ was None and the
    QUERIES.md generator emitted an empty one-liner; ADVICE r7.)"""
    docs = read_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w")
    ).filter(F.length("w") >= 1)
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    top = vocab.orderBy(F.desc("n"), "w").limit(_ZIPF_TOP)
    ranked = top.select(
        "n",
        F.row_number()
        .over(Window.partitionBy(F.lit(1)).orderBy(F.desc("n"), "w"))
        .alias("rank"),
    )
    q = ranked.select(
        F.expr("cast(floor(ln(cast(rank as double)) * 1048576.0D) as bigint)").alias("xq"),
        F.expr("cast(floor(ln(cast(n as double)) * 1048576.0D) as bigint)").alias("yq"),
    )
    m = q.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("xq").alias("sx"),
        F.sum("yq").alias("sy"),
        F.sum(F.expr("xq * yq")).alias("sxy"),
        F.sum(F.expr("xq * xq")).alias("sxx"),
        F.sum(F.expr("yq * yq")).alias("syy"),
    )
    scale = "1048576.0D"
    num = f"(cast(k as double) * cast(sxy as double) - cast(sx as double) * cast(sy as double))"
    denx = f"(cast(k as double) * cast(sxx as double) - cast(sx as double) * cast(sx as double))"
    deny = f"(cast(k as double) * cast(syy as double) - cast(sy as double) * cast(sy as double))"
    return m.select(
        F.col("k").cast("bigint").alias("n_tokens_fit"),
        F.round(F.expr(f"{num} / {denx}"), 6).alias("slope"),
        F.round(
            F.expr(
                f"(cast(sy as double) - {num} / {denx} * cast(sx as double))"
                f" / cast(k as double) / {scale}"
            ),
            6,
        ).alias("intercept"),
        F.round(F.expr(f"{num} * {num} / ({denx} * {deny})"), 6).alias("r2"),
    )


_TEXT_ZIPF_FIT_ORACLE = """
    WITH words AS (
        SELECT UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS w
        FROM documents
    ),
    vocab AS (
        SELECT w, COUNT(*) AS n FROM words WHERE len(w) >= 1 GROUP BY w
    ),
    top AS (SELECT w, n FROM vocab ORDER BY n DESC, w LIMIT 500),
    ranked AS (
        SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, w) AS rank FROM top
    ),
    q AS (
        SELECT CAST(floor(ln(CAST(rank AS DOUBLE)) * 1048576.0) AS BIGINT) AS xq,
               CAST(floor(ln(CAST(n AS DOUBLE)) * 1048576.0) AS BIGINT) AS yq
        FROM ranked
    ),
    m AS (
        SELECT COUNT(*) AS k,
               CAST(SUM(xq) AS BIGINT) AS sx, CAST(SUM(yq) AS BIGINT) AS sy,
               CAST(SUM(xq * yq) AS BIGINT) AS sxy,
               CAST(SUM(xq * xq) AS BIGINT) AS sxx,
               CAST(SUM(yq * yq) AS BIGINT) AS syy
        FROM q
    )
    SELECT CAST(k AS BIGINT) AS n_tokens_fit,
           ROUND((CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
           ROUND((CAST(sy AS DOUBLE)
                  - (CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * CAST(sx AS DOUBLE))
                 / CAST(k AS DOUBLE) / 1048576.0, 6) AS intercept,
           ROUND((CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 * (CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / ((CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(k AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
    FROM m
"""

STAGED = {
    "events_top_paths": (events_top_paths, _EVENTS_TOP_PATHS_ORACLE),
    "events_bot_signals": (events_bot_signals, _EVENTS_BOT_SIGNALS_ORACLE),
    "lineitem_yoy_brand_growth": (lineitem_yoy_brand_growth, _LINEITEM_YOY_BRAND_GROWTH_ORACLE),
    "text_zipf_fit": (text_zipf_fit, _TEXT_ZIPF_FIT_ORACLE),
}


def register(names: list[str] | None = None) -> None:
    """Move staged queries into the live registry (round-7 kickoff:
    call ``round7_staged.register()`` from catalog/__init__.py)."""
    for name in (names if names is not None else list(STAGED)):
        fn, oracle = STAGED[name]
        QUERIES[name] = fn
        ORACLES[name] = oracle
