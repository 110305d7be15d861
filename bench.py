#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries and prints one
JSON line (driver contract). Protocol per BASELINE.md: local Spark with
AQE on, parquet inputs from $SPARK_GRAFT_SF_DIR (default sf0.1),
wall-clock per named query, warmup run discarded, MEDIAN of the
subsequent 3 runs recorded (round 10: medians + per-query spread make
round-over-round regressions attributable — a best-of sample hides
which query moved when the machine is loaded; best-of is still
recorded alongside for continuity with rounds 1-9).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from incubyte_vaccination_data_pipeline_spark import catalog  # noqa: E402
from incubyte_vaccination_data_pipeline_spark.session import get_spark  # noqa: E402

#: queries timed by the harness (the full catalog; each also serves as
#: the per-round BENCH feedback loop while widening coverage).
#: CANONICAL name-sorted order, deliberately independent of the
#: driver-window registration rotation: shared warm caches (session,
#: scans, the dedup/ANN shared_cache frames) make per-query numbers
#: order-sensitive, so a fixed order is what makes round-over-round
#: per-query deltas attributable to code changes rather than to the
#: rotation reshuffling who pays the warm-up (r3 verdict, finding #4).
HEADLINE = sorted(catalog.QUERIES)

RUNS = 3  # timed runs after the discarded warmup (median recorded)

#: the driver keeps only this many trailing stdout chars; the LAST
#: printed line must parse from inside that window
DRIVER_TAIL_CHARS = 2000
COMPACT_TOP_N = 25


def compact_payload(payload: dict, timings: dict[str, float]) -> dict:
    """A copy of the bench payload with only the slowest queries, sized
    to fit the driver's tail window (regression-tested)."""
    compact = {
        k: v
        for k, v in payload.items()
        if k not in ("queries_cold", "queries_best", "queries_spread")
    }
    compact["queries"] = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:COMPACT_TOP_N]
    )
    compact["n_queries"] = len(timings)
    compact["queries_full"] = "BENCH_local.json"
    return compact


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(app_name="ivdp-bench")
    timings: dict[str, float] = {}
    best_of: dict[str, float] = {}
    per_spread: dict[str, float] = {}
    cold: dict[str, float] = {}
    spread = 0.0  # sum over queries of (worst - best) timed run: the
    # session-noise floor of this sample — the r8->r9 lesson is that a
    # loaded machine reads as "broad shallow drift" on the total, and
    # a large spread flags exactly that condition in the artifact;
    # per-query spreads (BENCH_local only) attribute it
    for name in HEADLINE:
        fn = catalog.QUERIES[name]
        runs: list[float] = []
        for i in range(RUNS + 1):
            t0 = time.perf_counter()
            # foreach-noop forces full materialization without driver collect
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if i == 0:
                # first touch: plan compile + any shared-cache build this
                # query triggers — recorded separately so warm numbers
                # stay comparable round-over-round
                cold[name] = round(dt, 4)
                continue
            runs.append(dt)
        runs.sort()
        timings[name] = round(runs[len(runs) // 2], 4)  # median of RUNS
        best_of[name] = round(runs[0], 4)
        per_spread[name] = round(runs[-1] - runs[0], 4)
        spread += runs[-1] - runs[0]

    # release every shared frame keyed to this corpus: the cache bounds
    # entry count, but persisted RDDs pin executor storage memory until
    # LRU eviction — a multi-sf sweep in one session must not accumulate
    from incubyte_vaccination_data_pipeline_spark.shared_cache import (
        release_shared_state,
    )

    release_shared_state(sf_dir)

    total = round(sum(timings.values()), 4)
    payload = {
        "metric": "total_headline_query_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_best": best_of,
        "queries_spread": per_spread,
        "queries_cold": cold,
        "noise_spread_sec": round(spread, 4),
        "sf": sf,
    }
    line = json.dumps(payload)
    print(line)
    # full local copy: the driver's recorded BENCH_r{N}.json keeps only
    # the last 2000 chars of stdout, so the complete timing set lives
    # in-repo for round-over-round comparison
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_local.json"), "w") as f:
            f.write(line + "\n")
    except OSError:
        pass
    # ... and the LAST stdout line is a compact payload sized to fit
    # that 2000-char tail window (slowest queries only), so the
    # driver's parse of the final line succeeds (r1/r2 recorded
    # parsed: null because the full ~100-query line overflowed it)
    print(json.dumps(compact_payload(payload, timings)))


if __name__ == "__main__":
    main()
