"""Event-stream analytics over the ``events`` table (batch semantics;
the Structured Streaming ingest in ``streaming/`` reuses the same
windowed-aggregation logic — see ``streaming/events_stream.py``).

Covers: JSON property extraction, tumbling-window aggregation
(alignment-compatible with DuckDB ``time_bucket``: epoch-aligned for
sub-day widths), and gap-based sessionization via window functions —
the batch shape of ``session_window``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from incubyte_vaccination_data_pipeline_spark.catalog.registry import query
from incubyte_vaccination_data_pipeline_spark.shared_cache import register_dict_cache
from incubyte_vaccination_data_pipeline_spark.sources.parquet_io import read_table

_DEC = "decimal(18,2)"
SESSION_GAP_SECONDS = 1800

_TUMBLING_ORACLE = """
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
"""


@query(
    "events_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction + aggregation (semi-structured column
    handling; stays JVM-side via get_json_object)."""
    events = read_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("sum_k"),
        F.sum(F.col("value").cast(_DEC)).cast("double").alias("sum_value"),
    )


@query("events_tumbling_window", oracle=_TUMBLING_ORACLE)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute event-time windows (batch equivalent of the
    streaming windowed agg; both Spark ``window()`` and DuckDB
    ``time_bucket`` are epoch-aligned for 5-minute widths)."""
    events = read_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "events_sessionization",
    oracle=f"""
    WITH lagged AS (
        SELECT user_id, event_id, ts, value,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
    ),
    flagged AS (
        SELECT *, CASE WHEN prev_ts IS NULL
                         OR date_diff('second', prev_ts, ts) > {SESSION_GAP_SECONDS}
                       THEN 1 ELSE 0 END AS is_new
        FROM lagged
    ),
    sessions AS (
        SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT)
                      AS session_id
        FROM flagged
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           min(ts) AS session_start,
           max(ts) AS session_end,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag + cumulative
    new-session flags — the classic batch sessionizer; the streaming
    twin is ``session_window`` (streaming/events_stream.py)."""
    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    is_new = (
        prev_ts.isNull()
        | (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts) > SESSION_GAP_SECONDS)
    ).cast("int")
    return (
        events.select("user_id", "event_id", "ts", "value", is_new.alias("is_new"))
        .withColumn(
            "session_id",
            F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("session_value"),
        )
    )


@query(
    "events_range_join",
    oracle="""
    SELECT a.user_id, a.event_id,
           COUNT(b.ts) AS n_clicks,
           CAST(SUM(CAST(b.value AS DECIMAL(18,2))) AS DOUBLE) AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') a
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts - INTERVAL 30 MINUTE AND b.ts < a.ts
    GROUP BY a.user_id, a.event_id
    """,
)
def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: clicks in the 30 minutes before each purchase,
    per user. Executes as an equi-join on user_id with the time band
    as a join residual — never a cartesian product. (At extreme
    per-user fan-in the scale path is time-bucket blocking: join on
    (user_id, 30-min bucket) over the two adjacent buckets.)"""
    events = read_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.expr("ts - INTERVAL 30 MINUTES"))
        & (F.col("c_ts") < F.col("ts")),
        "left",
    )
    return joined.groupBy("user_id", "event_id").agg(
        F.count("c_ts").alias("n_clicks"),
        F.sum(F.col("c_value").cast(_DEC)).cast("double").alias("click_value"),
    )


@query(
    "events_asof_join",
    oracle="""
    SELECT a.user_id, a.event_id, a.ts,
           b.ts AS click_ts, b.value AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') a
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
      ON a.user_id = b.user_id AND a.ts >= b.ts
    """,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase event picks up the user's
    most recent click at-or-before it (union + last_value window —
    one keyed shuffle, no range join; operators/asof.py)."""
    from incubyte_vaccination_data_pipeline_spark.operators.asof import (
        asof_join_backward,
    )

    events = read_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    out = asof_join_backward(
        purchases, clicks, on=["user_id"], ts_col="ts",
        payload_cols=["value"], payload_prefix="click_",
    )
    return out.select(
        "user_id",
        "event_id",
        "ts",
        F.col("click_ts"),
        F.col("click_value"),
    )


@query(
    "events_asof_join_tolerance",
    oracle="""
    SELECT a.user_id, a.event_id, a.ts,
           CASE WHEN b.ts >= a.ts - INTERVAL 10 MINUTES
                THEN b.ts END AS click_ts,
           CASE WHEN b.ts >= a.ts - INTERVAL 10 MINUTES
                THEN b.value END AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') a
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
      ON a.user_id = b.user_id AND a.ts >= b.ts
    """,
)
def events_asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join WITH matching tolerance (pandas
    ``merge_asof(tolerance=...)`` / kdb ``wj`` semantics): the most
    recent click at-or-before each purchase counts only within a
    10-minute window, else the payload nulls out. Same
    union+last_value single-shuffle plan as ``events_asof_join`` —
    the tolerance is a post-match null-out, not a join predicate, so
    no range join appears at any scale. The oracle restates it via
    DuckDB's NATIVE ``ASOF LEFT JOIN`` plus the tolerance CASE."""
    from incubyte_vaccination_data_pipeline_spark.operators.asof import (
        asof_join_backward,
    )

    events = read_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    out = asof_join_backward(
        purchases, clicks, on=["user_id"], ts_col="ts",
        payload_cols=["value"], payload_prefix="click_",
    )
    in_tol = F.col("click_ts") >= F.col("ts") - F.expr("INTERVAL 10 MINUTES")
    return out.select(
        "user_id",
        "event_id",
        "ts",
        F.when(in_tol, F.col("click_ts")).alias("click_ts"),
        F.when(in_tol, F.col("click_value")).alias("click_value"),
    )


# --------------------------------------------------------------------------
# Structured Streaming surface (streaming/events_stream.py), exposed
# through the driver gate: the tumbling stream shares the batch oracle
# (same windows, same aggregates), the session stream is checked via
# its per-user aggregate against the batch sessionizer's SQL.
# --------------------------------------------------------------------------


@query("stream_tumbling_counts", oracle=_TUMBLING_ORACLE)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark + tumbling-window streaming aggregation, driven to
    completion against the memory sink; results must equal the batch
    twin (and therefore its DuckDB oracle)."""
    from incubyte_vaccination_data_pipeline_spark.streaming.events_stream import (
        read_events_stream,
        run_to_memory,
        windowed_counts,
    )

    stream = read_events_stream(spark, sf_dir)
    return run_to_memory(windowed_counts(stream), "ivdp_stream_tumbling")


@query(
    "stream_session_user_counts",
    oracle=f"""
    WITH lagged AS (
        SELECT user_id, event_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
    ),
    flagged AS (
        SELECT *, CASE WHEN prev_ts IS NULL
                         OR date_diff('second', prev_ts, ts) > {SESSION_GAP_SECONDS}
                       THEN 1 ELSE 0 END AS is_new
        FROM lagged
    )
    SELECT user_id,
           CAST(SUM(is_new) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM flagged
    GROUP BY user_id
    """,
)
def stream_session_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window streaming sessions, aggregated per user and
    validated against the batch gap-sessionizer's session counts."""
    from incubyte_vaccination_data_pipeline_spark.streaming.events_stream import (
        read_events_stream,
        run_to_memory,
        session_windows,
    )

    stream = read_events_stream(spark, sf_dir)
    sessions = run_to_memory(session_windows(stream), "ivdp_stream_sessions")
    return sessions.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
    )


@query(
    "stream_stream_join_counts",
    oracle="""
    SELECT a.user_id, a.event_id,
           COUNT(*) AS n_clicks,
           CAST(SUM(CAST(b.value AS DECIMAL(18,2))) AS DOUBLE) AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') a
    JOIN (SELECT * FROM events WHERE event_type = 'click') b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts - INTERVAL 30 MINUTE AND b.ts < a.ts
    GROUP BY a.user_id, a.event_id
    """,
)
def stream_stream_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream join (purchases x preceding clicks),
    driven to completion and aggregated per purchase — must equal the
    inner batch range join."""
    from incubyte_vaccination_data_pipeline_spark.streaming.events_stream import (
        read_events_stream,
        run_to_memory,
        stream_stream_click_purchase_join,
    )

    stream = read_events_stream(spark, sf_dir)
    # stream-stream joins keep FOUR state stores per partition (left/
    # right x keyToNumValues/keyWithIndexToValue), so partitions are
    # the expensive axis locally: 2 measured 1.1-1.3s vs 1.5s at 8,
    # 2.4s at 16 at sf0.1 — but the optimum tracks source VOLUME (2x
    # slower than 8 at the 10x stress), so the width is derived, not
    # pinned (stream_state_partitions, ROUND_NOTES r7).
    from incubyte_vaccination_data_pipeline_spark.streaming.events_stream import (
        stream_state_partitions,
    )

    joined = run_to_memory(
        stream_stream_click_purchase_join(stream),
        "ivdp_ss_join",
        "append",
        shuffle_partitions=stream_state_partitions(spark, sf_dir),
    )
    return joined.groupBy(
        "user_id", F.col("purchase_id").alias("event_id")
    ).agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.sum(F.col("value").cast(_DEC)).cast("double").alias("click_value"),
    )


#: full-schema flush sentinels per (app, corpus) for the OUTER
#: stream-stream join: one far-future purchase + click for user -1,
#: so BOTH sides' watermarks advance past every real purchase's join
#: window and the unmatched-left nulls flush before the stream ends
_SS_FLUSH_DIRS: dict[tuple[str, str], str] = register_dict_cache({})


def _ss_flush_dir(spark: SparkSession, sf_dir: str) -> str:
    key = (spark.sparkContext.applicationId, sf_dir)
    path = _SS_FLUSH_DIRS.get(key)
    if path is None:
        import os
        import tempfile

        max_ts = read_table(spark, sf_dir, "events").agg(F.max("ts")).first()[0]
        path = os.path.join(tempfile.mkdtemp(prefix="ivdp-ss-flush-"), "flush")
        far = (F.lit(max_ts).cast("timestamp") + F.expr("INTERVAL 24 HOURS"))
        (
            spark.createDataFrame(
                [(-1, "purchase"), (-2, "click")],
                "event_id bigint, event_type string",
            )
            .select(
                "event_id",
                far.alias("ts"),
                F.lit(-1).cast("bigint").alias("user_id"),
                "event_type",
                F.lit(0.0).alias("value"),
                F.lit("{}").alias("props"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(path)
        )
        _SS_FLUSH_DIRS[key] = path
    return path


@query(
    "stream_stream_left_outer_counts",
    oracle="""
    SELECT a.user_id, a.event_id,
           COUNT(b.event_id) AS n_clicks,
           CAST(COALESCE(SUM(CAST(b.value AS DECIMAL(18,2))),
                         0) AS DOUBLE) AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') a
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts - INTERVAL 30 MINUTE AND b.ts < a.ts
    GROUP BY a.user_id, a.event_id
    """,
)
def stream_stream_left_outer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT-OUTER watermarked stream-stream join — the hard mode of
    the streaming join family: an unmatched purchase may only emit its
    null-click row once the watermark PROVES no matching click can
    still arrive (join-state eviction), so the run unions a far-future
    purchase+click sentinel (advancing both sides' watermarks past
    every real purchase's window) and enables no-data batches to flush
    the tail. Aggregated per purchase, every purchase appears exactly
    once — zero-click purchases with n_clicks = 0 — and the batch
    LEFT JOIN restates all four columns: a full value check."""
    from incubyte_vaccination_data_pipeline_spark.streaming.events_stream import (
        read_events_stream,
        run_to_memory,
        stream_stream_click_purchase_join,
    )

    stream = read_events_stream(spark, sf_dir)
    sentinel = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint,"
            " event_type string, value double, props string"
        )
        .parquet(_ss_flush_dir(spark, sf_dir))
    )
    unioned = stream.select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ).unionByName(sentinel)
    # same four-state-stores-per-partition economics as the inner
    # join (volume-derived width: 1.8-2.2s at sf0.1 vs 2.5s at the
    # old fixed 8; the no-data eviction batch scans every store, so
    # store count is the floor here — and the 10x stress flips the
    # optimum back up, hence derived not pinned)
    from incubyte_vaccination_data_pipeline_spark.streaming.events_stream import (
        stream_state_partitions,
    )

    joined = run_to_memory(
        stream_stream_click_purchase_join(unioned, how="left_outer"),
        "ivdp_ss_left_outer",
        "append",
        shuffle_partitions=stream_state_partitions(spark, sf_dir),
        no_data_batches=True,
    )
    return (
        joined.filter(F.col("user_id") >= 0)
        .groupBy("user_id", F.col("purchase_id").alias("event_id"))
        .agg(
            F.count("click_id").alias("n_clicks"),
            F.coalesce(F.sum(F.col("value").cast(_DEC)), F.lit(0).cast(_DEC))
            .cast("double")
            .alias("click_value"),
        )
    )


@query(
    "stream_running_totals",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY user_id
    """,
)
def stream_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState custom stateful operator (per-user
    running totals), driven to completion; the FINAL stream state per
    user (max n_events + its total via max_by — update mode may emit
    one row per micro-batch) is what the query returns. The state
    accumulates integer cents (event values are 2-dp money), so the
    total is exact and arrival-order independent — which is what lets
    the oracle restate BOTH columns with no tolerance and no TRUE
    certificate (this was a rows-only certificate through round 4;
    the decimal-exact state upgraded it to a full value check)."""
    from incubyte_vaccination_data_pipeline_spark.streaming.events_stream import (
        read_events_stream,
        run_to_memory,
        running_user_totals,
    )

    stream = read_events_stream(spark, sf_dir)
    updates = run_to_memory(
        running_user_totals(stream), "ivdp_stream_running", "update"
    )
    return updates.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.expr("max_by(total_value, n_events)").alias("total_value"),
    )


#: flush-sentinel scratch dirs per (app, corpus): the sentinel file
#: holds one far-future row PER USER (|distinct users| rows) and
#: depends only on max(ts) + the user set of the immutable corpus, so
#: warm runs re-stream the same parquet instead of re-aggregating and
#: re-writing it
_FLUSH_DIRS: dict[tuple[str, str], str] = register_dict_cache({})


def _session_flush_dir(spark: SparkSession, sf_dir: str) -> str:
    """Write (once per app+corpus) a far-future flush event PER USER:
    24 h past max(ts), so every user's open session is closed by a
    gap-breaking ARRIVAL inside the data batch (the vectorized numpy
    split path) instead of by an event-time timeout.  The one-row
    user=-1 sentinel this replaces needed the timeout machinery: a
    trailing no-data micro-batch re-invoking the Python state fn once
    per active user with an empty iterator — 2x the per-group calls
    plus a whole extra micro-batch (~1.1 s of the query's 2.4-3.0 s
    at sf0.1).  The sentinel-opened sessions never close, so they are
    never emitted (append mode emits CLOSED sessions only); the
    emitted set is bit-identical either way.  Size: |distinct users|
    rows — the same metadata scale as the state itself."""
    key = (spark.sparkContext.applicationId, sf_dir)
    path = _FLUSH_DIRS.get(key)
    if path is None:
        import os
        import tempfile

        max_ts = read_table(spark, sf_dir, "events").agg(F.max("ts")).first()[0]
        path = os.path.join(
            tempfile.mkdtemp(prefix="ivdp-session-flush-"), "flush"
        )
        (
            read_table(spark, sf_dir, "events")
            .select("user_id")
            .distinct()
            .select(
                "user_id",
                (
                    F.lit(max_ts).cast("timestamp") + F.expr("INTERVAL 24 HOURS")
                ).alias("ts"),
                F.lit(0.0).alias("value"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(path)
        )
        _FLUSH_DIRS[key] = path
    return path


@query(
    "stream_session_gap_stateful",
    oracle=f"""
    WITH lagged AS (
        SELECT user_id, event_id, ts, value,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
    ),
    flagged AS (
        SELECT *, CASE WHEN prev_ts IS NULL
                         OR date_diff('second', prev_ts, ts) > {SESSION_GAP_SECONDS}
                       THEN 1 ELSE 0 END AS is_new
        FROM lagged
    ),
    sess AS (
        SELECT *, SUM(is_new) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
    FROM sess
    GROUP BY user_id, sid
    """,
)
def stream_session_gap_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful sessionization: ``applyInPandasWithState`` with
    EVENT-TIME timeout (the one stateful-streaming surface the batch
    catalog lacked through round 5).  Each user's open session lives
    in explicit group state and is emitted when a later event breaks
    the 30-minute gap OR when the watermark passes ``last + gap``
    (timeout) — so the output is every session with its exact
    integer-cent value total, and the batch lag-based sessionizer
    restates all five columns in DuckDB: a FULL value check, no TRUE
    certificate.

    Flush sentinels: one far-future event PER USER (streamed from a
    scratch dir, unioned in) closes every open session as a
    gap-breaking arrival inside the data batch — the vectorized
    split path — so no timeout needs to fire and no trailing empty
    micro-batch runs in the drive-to-completion run (the timeout
    machinery stays, exercised by the multi-batch unit tests: a real
    deployment has no flush file and DOES rely on it).  The
    sentinel-opened sessions never close, hence never emit."""
    from incubyte_vaccination_data_pipeline_spark.streaming.events_stream import (
        read_events_stream,
        run_to_memory,
        stateful_session_gap,
    )

    stream = read_events_stream(spark, sf_dir).select("user_id", "ts", "value")
    sentinel = (
        spark.readStream.schema("user_id bigint, ts timestamp, value double")
        .parquet(_session_flush_dir(spark, sf_dir))
    )
    # sp=16: the opposite trade from the stream-stream joins — one
    # state store per partition but a Python worker pipeline per
    # partition, and the per-GROUP pandas calls are the cost (group
    # count, not bytes: the 10x stress is FLAT), so wider local
    # parallelism wins (measured 2.4s at 16 vs 2.7s at 8, 5.3s at 2)
    # no_data_batches OFF: per-user flush sentinels close every real
    # session in the data batch itself (see _session_flush_dir), so
    # no timeout ever needs to fire and the trailing empty micro-batch
    # would be pure fixed cost
    sessions = run_to_memory(
        stateful_session_gap(stream.unionByName(sentinel)),
        "ivdp_stream_session_gap",
        "append",
        shuffle_partitions=16,
    )
    return sessions.filter(F.col("user_id") >= 0)


@query(
    "stream_dedup_events",
    oracle="""
    SELECT event_id, user_id, event_type, ts
    FROM events
    """,
)
def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup over an at-least-once source: the event
    stream unioned with itself (every event delivered twice) must come
    out exactly once through dropDuplicatesWithinWatermark — so the
    result equals the plain batch events table."""
    from incubyte_vaccination_data_pipeline_spark.streaming.events_stream import (
        dedup_events_stream,
        read_events_stream,
        run_to_memory,
    )

    stream = read_events_stream(spark, sf_dir)
    doubled = stream.unionByName(read_events_stream(spark, sf_dir))
    # one store per partition keyed by event_id; 4 measured best at
    # sf0.1 (1.2s vs 1.4s at 8, 2.1s at 16). Volume-derived with
    # volume_factor=2 (the union streams the source twice, so the
    # state exchange carries 2x the on-disk bytes) and lo=4 (the
    # measured sf0.1 floor): at the 10x stress the width now tracks
    # the DOUBLED volume instead of relying on the floor (ADVICE r7)
    from incubyte_vaccination_data_pipeline_spark.streaming.events_stream import (
        stream_state_partitions,
    )

    return run_to_memory(
        dedup_events_stream(doubled),
        "ivdp_stream_dedup",
        "append",
        shuffle_partitions=stream_state_partitions(
            spark, sf_dir, lo=4, volume_factor=2
        ),
    )


@query(
    "events_retention_cohorts",
    oracle="""
    WITH user_weeks AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('week', ts) AS DATE) AS week
        FROM events
    ),
    cohorts AS (
        SELECT user_id, MIN(week) AS cohort_week FROM user_weeks GROUP BY user_id
    )
    SELECT c.cohort_week,
           u.week AS activity_week,
           COUNT(DISTINCT u.user_id) AS n_users
    FROM user_weeks u JOIN cohorts c ON u.user_id = c.user_id
    GROUP BY c.cohort_week, u.week
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week,
    counted in every week they were active — the canonical
    product-analytics rollup. Both engines truncate weeks to Monday.
    Scale shape: ONE events scan and ONE explicit user_id repartition
    feed the (user, week) distinct AND the cohort assignment — the
    per-user min is a window over the same partitioning, not a
    self-join (a join back to a per-user aggregate would re-execute
    the scan+shuffle for the build side: Spark self-joins duplicate
    the subtree). Then one small shuffle on the (cohort, week) pair.
    The final count is a plain count — user_weeks is distinct per
    (user, week) and cohort_week is functionally dependent on
    user_id, so COUNT(DISTINCT) would only add the two-phase
    distinct-aggregate exchange."""
    events = read_table(spark, sf_dir, "events")
    user_weeks = (
        events.select(
            "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
        )
        .repartition("user_id")
        .distinct()
    )
    cohort = F.min("week").over(Window.partitionBy("user_id"))
    return (
        user_weeks.withColumn("cohort_week", cohort)
        .groupBy("cohort_week", F.col("week").alias("activity_week"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "events_funnel_conversion",
    oracle="""
    WITH w1 AS (
        SELECT user_id, MIN(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    w2 AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM events e JOIN w1 ON e.user_id = w1.user_id
        WHERE e.event_type = 'click' AND e.ts > w1.t_view
        GROUP BY e.user_id
    ),
    w3 AS (
        SELECT e.user_id, MIN(e.ts) AS t_purchase
        FROM events e JOIN w2 ON e.user_id = w2.user_id
        WHERE e.event_type = 'purchase' AND e.ts > w2.t_click
        GROUP BY e.user_id
    )
    SELECT 'view' AS step, (SELECT COUNT(*) FROM w1) AS n_users
    UNION ALL
    SELECT 'click', (SELECT COUNT(*) FROM w2)
    UNION ALL
    SELECT 'purchase', (SELECT COUNT(*) FROM w3)
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who viewed, then clicked AFTER their first
    view, then purchased AFTER that click — strict event-time ordering,
    not mere co-occurrence. Each stage is one groupBy + an equi-join on
    user_id against the previous stage, so all three stages reuse a
    single user_id hash partitioning at scale."""
    events = read_table(spark, sf_dir, "events")
    w1 = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    w2 = (
        events.filter(F.col("event_type") == "click")
        .join(w1, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    w3 = (
        events.filter(F.col("event_type") == "purchase")
        .join(w2, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    spark_counts = [
        w1.agg(F.count(F.lit(1)).alias("n_users")).withColumn("step", F.lit("view")),
        w2.agg(F.count(F.lit(1)).alias("n_users")).withColumn("step", F.lit("click")),
        w3.agg(F.count(F.lit(1)).alias("n_users")).withColumn(
            "step", F.lit("purchase")
        ),
    ]
    out = spark_counts[0]
    for c in spark_counts[1:]:
        out = out.unionByName(c)
    return out.select("step", "n_users")


@query(
    "events_value_trend",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           round(covar_pop(value, CAST(epoch_us(ts) AS DOUBLE))
                 / NULLIF(var_pop(CAST(epoch_us(ts) AS DOUBLE)), 0)
                 * 86400000000, 6) AS slope_per_day
    FROM events
    GROUP BY user_id
    HAVING COUNT(*) >= 2
    """,
)
def events_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS trend of event value over time (regression
    aggregates): slope = covar_pop/var_pop over epoch-microsecond
    timestamps, scaled to per-day units and rounded to 6 dp (merge
    order of the moment sums differs across engines). One map-side
    combinable shuffle — the moments are distributive."""
    events = read_table(spark, sf_dir, "events")
    t = F.unix_micros(F.col("ts")).cast("double")
    return (
        events.select("user_id", F.col("value"), t.alias("t"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.expr("covar_pop(value, t) / nullif(var_pop(t), 0)") * 86400000000,
                6,
            ).alias("slope_per_day"),
        )
        .filter(F.col("n_events") >= 2)
    )


@query(
    "stream_upsert_snapshot",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY user_id
    """,
)
def stream_upsert_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch exactly-once sink through the driver gate: stream
    per-user totals into a key-hash-partitioned parquet target with
    last-writer-wins upsert semantics (``run_foreach_batch_upsert`` —
    the partition-pruned JDBC-upsert / Delta-MERGE pattern), then
    return the LANDED snapshot. The streaming total is computed in
    DECIMAL(18,2), so both columns are exact and the oracle restates
    them directly — no TRUE certificate, no batch-twin join (rows-only
    through round 4; the decimal-exact totals upgraded it to a full
    value check of what actually landed on disk). The target lands
    under the repo's own warehouse dir, keyed by sf, and is
    overwritten per run — the upsert path itself is idempotent per
    batch id."""
    import hashlib
    import shutil
    from pathlib import Path

    from incubyte_vaccination_data_pipeline_spark.streaming.events_stream import (
        read_events_stream,
        run_foreach_batch_upsert,
    )

    repo_root = Path(__file__).resolve().parents[2]
    target = str(
        repo_root
        / "spark-warehouse"
        / ("stream_upsert_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8])
    )
    shutil.rmtree(target, ignore_errors=True)
    shutil.rmtree(target + ".tmp", ignore_errors=True)
    stream = read_events_stream(spark, sf_dir)
    totals = stream.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(_DEC)).cast("double").alias("total_value"),
    )
    run_foreach_batch_upsert(totals, target, key_cols=["user_id"])
    return spark.read.parquet(target).select(
        "user_id", "n_events", "total_value"
    )


@query(
    "stream_hopping_counts",
    oracle="""
    WITH slots AS (
        SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
               CAST(value AS DECIMAL(18,2)) AS v
        FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes',
               CAST(value AS DECIMAL(18,2))
        FROM events
    )
    SELECT window_start,
           COUNT(*) AS n_events,
           CAST(SUM(v) AS DOUBLE) AS total_value
    FROM slots
    GROUP BY window_start
    """,
)
def stream_hopping_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) event-time windows on the STREAM — 10-minute
    windows every 5 minutes with a late-data watermark, driven to
    completion; must equal the batch ``events_hopping_window``
    restatement (each event lands in exactly window/slide = 2 state
    slots). Completes the streaming family's window symmetry next to
    tumbling and session windows."""
    from incubyte_vaccination_data_pipeline_spark.streaming.events_stream import (
        read_events_stream,
        run_to_memory,
    )

    stream = read_events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window(F.col("ts"), "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "n_events", "total_value"
        )
    )
    return run_to_memory(agg, "ivdp_stream_hopping")


def _cms_bucket_sql(key: str, half: int) -> str:
    """DuckDB positional decode of an md5 half -> [0, 64) bucket (the
    round5_ext CMS recipe, restated here over the events key)."""
    from incubyte_vaccination_data_pipeline_spark.operators.dedup import (
        md5_half_decode_sql,
    )

    start = 1 if half == 0 else 9
    return (
        f"({md5_half_decode_sql(f'md5(cast({key} as string))', start, 'strpos')}"
        f" % 64)"
    )


_SHH_B0 = None  # filled right below (helper needs to exist first)
_SHH_B1 = None


def _shh_buckets() -> tuple[str, str]:
    return _cms_bucket_sql("user_id", 0), _cms_bucket_sql("user_id", 1)


_SHH_B0, _SHH_B1 = _shh_buckets()


@query(
    "stream_heavy_hitters_cms",
    oracle=f"""
    WITH cells AS (
        SELECT 0 AS row_id, {_SHH_B0} AS bucket, COUNT(*) AS n
        FROM events GROUP BY 2
        UNION ALL
        SELECT 1, {_SHH_B1}, COUNT(*)
        FROM events GROUP BY 2
    ),
    truth AS (
        SELECT user_id, COUNT(*) AS true_n,
               {_SHH_B0} AS b0, {_SHH_B1} AS b1
        FROM events GROUP BY 1
    )
    SELECT user_id, true_n,
           CAST(LEAST(c0.n, c1.n) AS BIGINT) AS cm_estimate,
           LEAST(c0.n, c1.n) >= true_n AS bound_holds
    FROM truth
    JOIN cells c0 ON c0.row_id = 0 AND c0.bucket = truth.b0
    JOIN cells c1 ON c1.row_id = 1 AND c1.bucket = truth.b1
    ORDER BY cm_estimate DESC, user_id
    LIMIT 20
    """,
)
def stream_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy hitters ON THE STREAM: the batch
    ``agg_heavy_hitters_cms`` sketch maintained as streaming state —
    each event updates its two (row, bucket) cells and the
    complete-mode aggregation keeps exactly the 2x64 = 128 cell
    counters as state, BOUNDED regardless of key cardinality. That is
    the streaming answer to unbounded key domains: a per-key counter
    state grows with distinct users forever, the sketch never — the
    canonical trending-keys / hot-partition detector shape. After the
    drive-to-completion run, heavy-hitter readout joins the final
    128-row sketch (broadcast twice) against the candidate keys with
    their true counts from the batch table (at scale the monitored
    candidate set; here every key, so the CM >= truth bound is
    checkable per row). Deterministic md5-half hashing makes the whole
    pipeline — cells, estimates, top-20 — restatable in DuckDB as a
    full value check."""
    from incubyte_vaccination_data_pipeline_spark.streaming.events_stream import (
        read_events_stream,
        run_to_memory,
    )

    stream = read_events_stream(spark, sf_dir)
    hashed = stream.select(F.md5(F.col("user_id").cast("string")).alias("h"))
    cell = lambda start: (  # noqa: E731 — two literal half-decodes
        F.expr(f"cast(conv(substring(h, {start}, 8), 16, 10) as bigint)") % 64
    )
    cells_in = hashed.select(
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("row_id"), cell(1).alias("bucket")),
                F.struct(F.lit(1).alias("row_id"), cell(9).alias("bucket")),
            )
        ).alias("c")
    ).select("c.row_id", "c.bucket")
    sketch = run_to_memory(
        cells_in.groupBy("row_id", "bucket").agg(F.count(F.lit(1)).alias("n")),
        "ivdp_stream_cms",
    )
    ev = read_table(spark, sf_dir, "events").select("user_id")
    truth = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_n"))
        .withColumn("h", F.md5(F.col("user_id").cast("string")))
        .select(
            "user_id",
            "true_n",
            cell(1).alias("b0"),
            cell(9).alias("b1"),
        )
    )
    c0 = sketch.filter(F.col("row_id") == 0).select(
        F.col("bucket").alias("b0"), F.col("n").alias("n0")
    )
    c1 = sketch.filter(F.col("row_id") == 1).select(
        F.col("bucket").alias("b1"), F.col("n").alias("n1")
    )
    est = F.least(F.col("n0"), F.col("n1"))
    return (
        truth.join(F.broadcast(c0), "b0")
        .join(F.broadcast(c1), "b1")
        .select(
            "user_id",
            "true_n",
            est.cast("bigint").alias("cm_estimate"),
            (est >= F.col("true_n")).alias("bound_holds"),
        )
        .orderBy(F.col("cm_estimate").desc(), F.col("user_id"))
        .limit(20)
    )
