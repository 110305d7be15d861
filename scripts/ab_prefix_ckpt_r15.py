#!/usr/bin/env python
"""Interleaved A/B for the global_cumsum INPUT checkpoint (VERDICT r14
item 3): variant A = with the r14 input pre-checkpoint
(prefix.CHECKPOINT_INPUT = True), variant B = without. One session,
A,B alternating per round, noop sink, per-query medians + best-of.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/ab_prefix_ckpt_r15.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incubyte_vaccination_data_pipeline_spark import catalog  # noqa: E402
from incubyte_vaccination_data_pipeline_spark.operators import prefix  # noqa: E402
from incubyte_vaccination_data_pipeline_spark.session import get_spark  # noqa: E402

QUERIES = [
    "corpus_pack_sequences",
    "orders_pareto_abc",
    "stats_equiheight_histogram",
]
ROUNDS = 7


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-prefix-ckpt-r15")
    results: dict[str, dict[str, list[float]]] = {
        q: {"A": [], "B": []} for q in QUERIES
    }
    # warm both variants once (plan compile + shared caches)
    for flag in (True, False):
        prefix.CHECKPOINT_INPUT = flag
        for q in QUERIES:
            catalog.QUERIES[q](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
    for r in range(ROUNDS):
        for label, flag in (("A", True), ("B", False)):
            prefix.CHECKPOINT_INPUT = flag
            for q in QUERIES:
                spark.sparkContext.setJobDescription(f"ab15:{q}:{label}:{r}")
                t0 = time.perf_counter()
                catalog.QUERIES[q](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                results[q][label].append(time.perf_counter() - t0)
    prefix.CHECKPOINT_INPUT = True
    for q in QUERIES:
        out = {"query": q}
        for label in ("A", "B"):
            runs = sorted(results[q][label])
            out[label] = {
                "median": round(runs[len(runs) // 2], 4),
                "best": round(runs[0], 4),
                "runs": [round(v, 4) for v in results[q][label]],
            }
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
