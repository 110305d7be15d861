"""CLI entry: ``python -m incubyte_vaccination_data_pipeline_spark <data_dir> <out_dir>``.

Parity with the reference's ``python main.py`` driver (main.py:141-165):
load dialect CSVs, validate with dead-letter quarantine, land the
warehouse table partitioned by COUNTRY, register per-country views, and
print a per-view row-count summary. This is the only place the engine
defaults ``as_of``/``load_date`` to wall-clock time — library calls pin
them for determinism.
"""

from __future__ import annotations

import logging
import sys

from incubyte_vaccination_data_pipeline_spark.pipeline import run_pipeline
from incubyte_vaccination_data_pipeline_spark.run_logging import setup_run_logging
from incubyte_vaccination_data_pipeline_spark.session import get_spark


def main(argv: list[str]) -> int:
    if len(argv) < 2:
        print(
            "usage: python -m incubyte_vaccination_data_pipeline_spark"
            " <data_dir> <out_dir> [--strict] [--dead-letter-csv]",
            file=sys.stderr,
        )
        return 2
    data_dir, out_dir = argv[0], argv[1]
    flags = argv[2:]
    strict = "--strict" in flags
    log_path = setup_run_logging()  # logs/etl_pipeline_{ts}.log (C5 parity)
    logging.getLogger(__name__).info("run log: %s", log_path)
    spark = get_spark(app_name="ivdp-pipeline")
    stored, views = run_pipeline(
        spark,
        data_dir,
        warehouse_path=f"{out_dir}/warehouse",
        dead_letter_path=f"{out_dir}/dead_letter",
        strict=strict,
        dead_letter_format="csv" if "--dead-letter-csv" in flags else "parquet",
    )
    print(f"warehouse rows: {stored.count()}")
    for v in views:
        print(f"view {v}: {spark.table(v).count()} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
