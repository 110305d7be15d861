#!/usr/bin/env python
"""Matched-conditions A/B drift harness (round-12 verdict item 4).

Times a FIXED query subset (one name per line in the names file) at
$SPARK_GRAFT_SF_DIR on whatever tree is on sys.path, with bench.py's
exact protocol (1 discarded warmup + 3 timed runs, median recorded,
canonical name-sorted order) — so the same subset can be timed on two
git worktrees and diffed per-query to attribute a drift to code,
registry growth, shared-cache pressure, or machine load.

Usage:  python scripts/ab_drift.py names.txt [out.json]

Standalone by design: no imports from bench.py, so the script can be
dropped (untracked) into an older tree that predates it. The tree
under test is the one the SCRIPT FILE lives in (copy the script into
each worktree) — cwd-based resolution would silently time whichever
tree you happen to be standing in.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_TREE = os.path.dirname(os.path.abspath(__file__))
if os.path.basename(_TREE) == "scripts":  # in-repo copy vs dropped-in
    _TREE = os.path.dirname(_TREE)
sys.path.insert(0, _TREE)

from incubyte_vaccination_data_pipeline_spark import catalog  # noqa: E402
from incubyte_vaccination_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sorted(
        line.strip() for line in open(sys.argv[1]) if line.strip()
    )
    missing = [n for n in names if n not in catalog.QUERIES]
    if missing:
        raise SystemExit(f"not in this tree's catalog: {missing}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark(app_name="ivdp-ab-drift")
    load0 = [round(v, 2) for v in os.getloadavg()]
    wall0 = time.time()
    meds: dict[str, float] = {}
    colds: dict[str, float] = {}
    for n in names:
        fn = catalog.QUERIES[n]
        runs: list[float] = []
        for i in range(4):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        colds[n] = round(runs[0], 4)
        meds[n] = round(sorted(runs[1:])[1], 4)

    payload = {
        "total_median_sec": round(sum(meds.values()), 4),
        "n_queries": len(meds),
        "sf_dir": sf_dir,
        "wall_sec": round(time.time() - wall0, 1),
        "load_start": load0,
        "load_end": [round(v, 2) for v in os.getloadavg()],
        "tree": subprocess.run(
            ["git", "-C", str(_TREE), "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True,
        ).stdout.strip(),
        "queries": meds,
        "queries_cold": colds,
    }
    line = json.dumps(payload)
    out = sys.argv[2] if len(sys.argv) > 2 else None
    if out:
        with open(out, "w") as f:
            f.write(line + "\n")
    print(line[:800])


if __name__ == "__main__":
    main()
