#!/usr/bin/env python
"""Round-14 optimization profiler: isolated per-query timing + plan capture.

Usage:
    python scripts/profile_r14.py [--plans-dir plans/r14] [--tag before]
        [--runs 5] query [query ...]

For each named catalog query, in ONE session (bench-identical session
factory + env contract):
  - one discarded warmup (plan compile + shared-cache build),
  - N timed runs against the noop sink (guide §1.4),
  - `.explain("formatted")` captured to <plans-dir>/<query>_<tag>.txt.

Prints one JSON line per query: {"query", "median", "best", "runs"}.
Timing methodology matches bench.py exactly (perf_counter around a
noop-sink write) so numbers are comparable with the committed record.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incubyte_vaccination_data_pipeline_spark import catalog  # noqa: E402
from incubyte_vaccination_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ivdp-profile-r14")
    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)

    for name in args.queries:
        fn = catalog.QUERIES[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        df = fn(spark, sf_dir)
        if args.plans_dir:
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.tag}.txt"), "w"
            ) as f:
                f.write(plan)
        # warmup (discarded): plan compile + shared-cache builds
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 4))
        r = sorted(runs)
        print(
            json.dumps(
                {
                    "query": name,
                    "median": r[len(r) // 2],
                    "best": r[0],
                    "runs": runs,
                }
            ),
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
