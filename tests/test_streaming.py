"""Streaming correctness: every streaming query must agree with its
batch twin (which is itself DuckDB-oracled in catalog/events.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from incubyte_vaccination_data_pipeline_spark.catalog import QUERIES
from incubyte_vaccination_data_pipeline_spark.streaming.events_stream import (
    read_events_stream,
    run_to_memory,
    running_user_totals,
    session_windows,
    windowed_counts,
)


def _rows(df, *key):
    return sorted(tuple(r) for r in df.select(*key).collect())


def test_stream_tumbling_equals_batch(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    streamed = run_to_memory(windowed_counts(stream), "t_stream_win")
    batch = QUERIES["events_tumbling_window"](spark, sf_dir)
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    assert _rows(streamed, *cols) == _rows(batch, *cols)


def test_stream_sessions_agree_with_batch_sessionization(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    streamed = run_to_memory(session_windows(stream), "t_stream_sess")
    batch = QUERIES["events_sessionization"](spark, sf_dir)
    # same number of sessions per user and same total events
    s = sorted(
        tuple(r)
        for r in streamed.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"), F.sum("n_events").alias("n_events"))
        .collect()
    )
    b = sorted(
        tuple(r)
        for r in batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"), F.sum("n_events").alias("n_events"))
        .collect()
    )
    assert s == b


def test_stateful_running_totals(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    out = run_to_memory(running_user_totals(stream), "t_stream_state", "update")
    # one final state row per user (single micro-batch over the file)
    per_user = {r["user_id"]: r for r in out.collect()}
    batch = (
        QUERIES["events_json_extract"](spark, sf_dir)  # any events read
        .sparkSession.read.parquet(f"{sf_dir}/events.parquet")
    )
    # independent ground truth via a plain batch aggregation
    from incubyte_vaccination_data_pipeline_spark.sources.parquet_io import read_table

    truth = {
        r["user_id"]: r
        for r in read_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("tv"))
        .collect()
    }
    assert set(per_user) == set(truth)
    for uid, row in per_user.items():
        assert row["n_events"] == truth[uid]["n"]
        assert abs(row["total_value"] - float(truth[uid]["tv"])) < 1e-3


def test_foreach_batch_upsert_sink(spark, sf_dir, tmp_path):
    """foreachBatch upsert: streaming per-user totals land in parquet
    with last-writer-wins keys and match the batch ground truth."""
    from incubyte_vaccination_data_pipeline_spark.sources.parquet_io import read_table
    from incubyte_vaccination_data_pipeline_spark.streaming.events_stream import (
        run_foreach_batch_upsert,
    )

    target = str(tmp_path / "upsert_target")
    stream = read_events_stream(spark, sf_dir)
    totals = stream.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )
    run_foreach_batch_upsert(totals, target, key_cols=["user_id"])

    landed = {r["user_id"]: r for r in spark.read.parquet(target).collect()}
    truth = {
        r["user_id"]: r
        for r in read_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("tv"))
        .collect()
    }
    assert set(landed) == set(truth)
    for uid, row in landed.items():
        assert row["n_events"] == truth[uid]["n"]
        assert abs(row["total_value"] - float(truth[uid]["tv"])) < 1e-3


def test_stream_stream_join_matches_batch_range_join(spark, sf_dir):
    """Watermarked stream-stream join produces the same matches as the
    batch range join (events_range_join counts per purchase)."""
    from incubyte_vaccination_data_pipeline_spark.streaming.events_stream import (
        stream_stream_click_purchase_join,
    )

    stream = read_events_stream(spark, sf_dir)
    joined = stream_stream_click_purchase_join(stream)
    out = run_to_memory(joined, "t_ss_join", "append")
    streamed = {
        (r["user_id"], r["purchase_id"]): r["n"]
        for r in out.groupBy("user_id", "purchase_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    batch = {
        (r["user_id"], r["event_id"]): r["n_clicks"]
        for r in QUERIES["events_range_join"](spark, sf_dir).collect()
        if r["n_clicks"] > 0
    }
    assert streamed == batch


def test_cli_entry_runs_pipeline(tmp_path):
    """python -m incubyte_vaccination_data_pipeline_spark <data> <out> — C1 parity."""
    import subprocess
    import sys

    from tests.test_pipeline import AUS_CSV, IND_CSV, USA_CSV

    d = tmp_path / "data"
    d.mkdir()
    (d / "IND (1) 1(in).csv").write_text(IND_CSV)
    (d / "USA (1) 1(in).csv").write_text(USA_CSV)
    (d / "AUS (1) 1(Sheet1).csv").write_text(AUS_CSV)
    out = tmp_path / "out"
    r = subprocess.run(
        [
            sys.executable, "-m", "incubyte_vaccination_data_pipeline_spark",
            str(d), str(out), "--dead-letter-csv",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(tmp_path),
        env={**__import__("os").environ, "PYTHONPATH": "/root/repo"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "warehouse rows:" in r.stdout
    assert (out / "warehouse").exists() and (out / "dead_letter").exists()
    # C5 parity: a per-run timestamped log file under logs/
    logs = list((tmp_path / "logs").glob("etl_pipeline_*.log"))
    assert logs and logs[0].stat().st_size > 0
    # reference-style dead-letter: timestamped CSV with header
    csvs = list((out / "dead_letter").glob("invalid_records_*.csv/*.csv"))
    assert csvs, "timestamped CSV dead-letter missing"
    assert csvs[0].read_text().splitlines()[0].count(",") >= 2
