#!/usr/bin/env python
"""Reproducible 10x streaming stress: the evidence behind SCALE.md's
stream-width claims (`stream_state_partitions` / `derive_state_partitions`).

Builds a scratch corpus whose ``events.parquet`` is a DIRECTORY of 10
part files (the production layout `read_events_stream` handles), each
a copy of the sf0.1 events with DISTINCT ids (event_id += i * 10^9,
user_id += i * 10^7) so keyed state (dedup by event_id, joins/sessions
by user_id) carries genuinely 10x the keys — a hard-link copy would
collapse dedup state onto the same ids and understate the stress.
Timestamps are left unshifted: every copy covers the same event-time
range, so watermark progression and window/session counts per user
match the 1x shape and only VOLUME scales.

Usage:
    python scripts/stress_streaming_10x.py [--factor 10] [--keep]

Prints, per streaming query: the derived state-partition width and
wall time at 1x and Nx, plus the ratio. The scratch lives under /tmp
and is deleted on exit unless --keep.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = "/root/testdata/sf0.1"

#: the exchange-heavy streaming family whose widths are volume-derived,
#: plus the Python-stateful ops whose claim is flatness (cost is
#: per-GROUP calls, not bytes)
STREAM_QUERIES = [
    "stream_dedup_events",
    "stream_stream_join_counts",
    "stream_stream_left_outer_counts",
    "stream_session_gap_stateful",
    "stream_running_totals",
]


def build_scratch(spark, factor: int) -> str:
    root = tempfile.mkdtemp(prefix=f"ivdp-stress{factor}x-")
    events_dir = os.path.join(root, "events.parquet")
    os.makedirs(events_dir)
    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{BASE_SF}/events.parquet")
    for i in range(factor):
        (
            base.select(
                (F.col("event_id") + i * 1_000_000_000).alias("event_id"),
                "ts",
                (F.col("user_id") + i * 10_000_000).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(root, f"_tmp_{i}"))
        )
        part = next(
            f
            for f in os.listdir(os.path.join(root, f"_tmp_{i}"))
            if f.startswith("part-") and f.endswith(".parquet")
        )
        os.rename(
            os.path.join(root, f"_tmp_{i}", part),
            os.path.join(events_dir, f"part-{i:05d}.parquet"),
        )
        shutil.rmtree(os.path.join(root, f"_tmp_{i}"))
    # the non-events tables are not exercised by the streaming family,
    # but read_table callers expect them to exist if touched
    for t in ("documents", "embeddings"):
        os.symlink(f"{BASE_SF}/{t}.parquet", os.path.join(root, f"{t}.parquet"))
    return root


def run_family(spark, sf_dir: str) -> dict[str, float]:
    from incubyte_vaccination_data_pipeline_spark.catalog import QUERIES
    from incubyte_vaccination_data_pipeline_spark.shared_cache import (
        release_shared_state,
    )

    times: dict[str, float] = {}
    for name in STREAM_QUERIES:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)
    release_shared_state(sf_dir)
    return times


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    from incubyte_vaccination_data_pipeline_spark.session import get_spark
    from incubyte_vaccination_data_pipeline_spark.streaming.events_stream import (
        stream_state_partitions,
    )

    spark = get_spark(app_name="ivdp-stress-streaming")
    scratch = build_scratch(spark, args.factor)
    try:
        for label, sf_dir in (("1x", BASE_SF), (f"{args.factor}x", scratch)):
            w_join = stream_state_partitions(spark, sf_dir)
            w_dedup = stream_state_partitions(
                spark, sf_dir, lo=4, volume_factor=2
            )
            print(f"[{label}] width(join)={w_join} width(dedup)={w_dedup}")
        base = run_family(spark, BASE_SF)
        big = run_family(spark, scratch)
        print(f"{'query':40s} {'1x':>8s} {args.factor:>7d}x {'ratio':>7s}")
        for name in STREAM_QUERIES:
            r = big[name] / base[name] if base[name] else float("inf")
            print(f"{name:40s} {base[name]:8.3f} {big[name]:8.3f} {r:7.2f}")
    finally:
        if args.keep:
            print(f"scratch kept at {scratch}")
        else:
            shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
