#!/usr/bin/env python
"""Round-15 optimization profiler: catalog-wide build/exec split.

The round-14 finding: ~80 s of the ~120 s sf0.1 bench total survives at
sf0.001 (trivial data), i.e. ~0.37 s/query of *fixed* cost. This tool
attributes that per query: for each catalog query it measures, warm
(after one discarded full run),

  - build  = wall time of ``fn(spark, sf_dir)`` (pure driver-side
    DataFrame construction: Python + py4j round-trips + Catalyst parse),
  - exec   = wall time of the noop-sink write of a pre-built frame
    (analysis + optimization + scheduling + execution),

median of N runs each.  Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 \
        python scripts/profile_r15.py [--runs 3] [query ...]

With no query names, profiles the ENTIRE catalog in bench order and
prints a sorted summary (worst build first) plus family totals.
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
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default=None, help="write full JSON here")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark(app_name="ivdp-profile-r15")
    names = args.queries or sorted(catalog.QUERIES)

    rows = []
    for name in names:
        fn = catalog.QUERIES[name]
        spark.sparkContext.setJobDescription(f"profile15:{name}")
        # discarded warmup: plan compile + shared-cache builds
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        builds, execs = [], []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        b = sorted(builds)[len(builds) // 2]
        e = sorted(execs)[len(execs) // 2]
        rows.append({"query": name, "build": round(b, 4), "exec": round(e, 4)})
        print(json.dumps(rows[-1]), flush=True)
        spark.sparkContext.setJobDescription(None)

    total_b = sum(r["build"] for r in rows)
    total_e = sum(r["exec"] for r in rows)
    print(
        json.dumps(
            {
                "n": len(rows),
                "total_build": round(total_b, 2),
                "total_exec": round(total_e, 2),
                "total": round(total_b + total_e, 2),
            }
        ),
        flush=True,
    )
    worst_build = sorted(rows, key=lambda r: r["build"], reverse=True)[:25]
    worst_exec = sorted(rows, key=lambda r: r["exec"], reverse=True)[:25]
    print("WORST BUILD:", json.dumps(worst_build), flush=True)
    print("WORST EXEC:", json.dumps(worst_exec), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
