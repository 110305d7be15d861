#!/usr/bin/env python
"""End-to-end demo of the reference pipeline shape at sf1-scale:
CSV ingest -> synonym projection -> validate -> dead-letter ->
warehouse parquet -> per-country dedup-latest views — the reference's
own "billions of records -> PySpark" framing (reference README), run
as ONE lazy Spark DAG over a synthetic multi-dialect CSV corpus ~100x
the unit-test fixtures (default 10M rows across 8 country files).

The generator writes one CSV per country under a scratch dir using
the reference's three source dialects (India / USA / Australia
headers, ``schema.COLUMN_MAP``), with deterministic dirt planted at
known rates so the validation split is checkable, not just timed:

- ~2% rows with an unparseable Open_Date -> DEAD-LETTERED with the
  reference's reason text (mandatory date parse failure)
- ~1% rows with a NULL mandatory Customer_Name -> silently dropped by
  the P8 mandatory filter (reference parity: only mandatory-DATE
  failures reach the dead-letter channel)
- ~2% rows with an invalid DOB -> kept, DOB nulled (P9)
- customers repeat ~4x with distinct consult dates -> the per-country
  ROW_NUMBER dedup-latest views do real work
- USA files use the compact ``Mddyyyy`` date form (F1 parity)

Wall times for generate / pipeline / view fan-out are printed for
SCALE.md. Run:  python scripts/demo_pipeline_sf1.py [--rows 10000000]
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COUNTRIES = ["IND", "USA", "AUS", "FRA", "GER", "JPN", "BRA", "CAN"]

# dialect per country file: header layout + date rendering
IND_STYLE = ["IND", "FRA", "GER", "JPN"]  # MM/dd/yyyy dates
USA_STYLE = ["USA", "BRA"]  # compact Mddyyyy dates, no DOB column
AUS_STYLE = ["AUS", "CAN"]  # Australia dialect headers


def _gen_country(spark, country: str, idx: int, rows_per_country: int):
    """One country's raw frame in its source dialect, dirt planted by
    deterministic id arithmetic (reproducible, engine-portable)."""
    from pyspark.sql import functions as F

    base = spark.range(rows_per_country).select(
        (F.col("id") * len(COUNTRIES) + idx).alias("gid")
    )
    # ~4 consults per customer WITHIN a country (gid strides by
    # len(COUNTRIES) inside one file, so /32 groups 4 of them) ->
    # the per-country dedup-latest views do real work
    cust = (F.col("gid") / (4 * len(COUNTRIES))).cast("long")
    name = F.when(
        F.pmod(F.col("gid"), 97) == 13, F.lit(None).cast("string")
    ).otherwise(F.concat(F.lit("Cust_"), cust.cast("string")))
    open_dt = F.date_add(F.lit("2020-01-01").cast("date"), F.pmod(F.col("gid"), 1096).cast("int"))
    consult_dt = F.date_add(open_dt, F.pmod(F.col("gid"), 211).cast("int"))
    dob = F.date_add(F.lit("1950-01-01").cast("date"), F.pmod(F.col("gid") * 7, 18263).cast("int"))

    if country in USA_STYLE:  # compact Mddyyyy / Mdyyyy form
        fmt_open = F.concat(
            F.month(open_dt).cast("string"),
            F.lpad(F.dayofmonth(open_dt).cast("string"), 2, "0"),
            F.year(open_dt).cast("string"),
        )
        fmt_consult = F.concat(
            F.month(consult_dt).cast("string"),
            F.lpad(F.dayofmonth(consult_dt).cast("string"), 2, "0"),
            F.year(consult_dt).cast("string"),
        )
        fmt_dob = None
    elif country in AUS_STYLE:
        # the AUS fixture's own format (MM/dd/yyyy); ISO yyyy-MM-dd is
        # NOT in the reference cascade once the non-[0-9/] strip runs
        # (faithful oddity — its digits then hit the compact M[M]ddyyyy
        # reading and die on "Invalid month", like the fixture's
        # planted 2021-13-13 row)
        fmt_open = F.date_format(open_dt, "MM/dd/yyyy")
        fmt_consult = F.date_format(consult_dt, "MM/dd/yyyy")
        fmt_dob = F.date_format(dob, "MM/dd/yyyy")
    else:
        fmt_open = F.date_format(open_dt, "MM/dd/yyyy")
        fmt_consult = F.date_format(consult_dt, "MM/dd/yyyy")
        fmt_dob = F.date_format(dob, "MM/dd/yyyy")

    # ~2% unparseable mandatory date -> dead-letter; ~2% invalid DOB
    fmt_open = F.when(F.pmod(F.col("gid"), 53) == 7, F.lit("2021-13-13")).otherwise(
        fmt_open
    )
    if fmt_dob is not None:
        fmt_dob = F.when(F.pmod(F.col("gid"), 59) == 11, F.lit("13/45/1970")).otherwise(
            fmt_dob
        )

    vacc = F.element_at(
        F.array(*[F.lit(v) for v in ("XYZ", "ABC", "EFG", "LMN", "MVD")]),
        (F.pmod(F.col("gid"), 5) + 1).cast("int"),
    )
    doctor = F.concat(F.lit("Dr_"), F.pmod(F.col("gid"), 1000).cast("string"))
    state = F.element_at(
        F.array(*[F.lit(s) for s in ("SA", "TN", "WA", "NY", "QL")]),
        (F.pmod(F.col("gid"), 5) + 1).cast("int"),
    )

    if country in USA_STYLE:
        return base.select(
            cust.cast("string").alias("ID"),
            name.alias("Name"),
            vacc.alias("VaccinationType"),
            fmt_open.alias("VaccinationDate"),
            fmt_consult.alias("Consultation Date"),
            doctor.alias("Doctor Name"),
            state.alias("State"),
        )
    if country in AUS_STYLE:
        return base.select(
            cust.cast("string").alias("Unique ID"),
            name.alias("Patient Name"),
            vacc.alias("Vaccine Type"),
            fmt_dob.alias("Date of Birth"),
            fmt_open.alias("Date of Vaccination"),
            fmt_consult.alias("Last Consulted Date"),
            doctor.alias("Doctor"),
            state.alias("State/Province"),
        )
    return base.select(
        cust.cast("string").alias("ID"),
        name.alias("Name"),
        fmt_dob.alias("DOB"),
        vacc.alias("VaccinationType"),
        fmt_open.alias("VaccinationDate"),
        fmt_consult.alias("Consultation Date"),
        doctor.alias("Doctor Name"),
        state.alias("State"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    from incubyte_vaccination_data_pipeline_spark.pipeline import run_pipeline
    from incubyte_vaccination_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="ivdp-demo-sf1")
    root = tempfile.mkdtemp(prefix="ivdp-demo-sf1-")
    data_dir = os.path.join(root, "csv")
    os.makedirs(data_dir)
    rows_per_country = args.rows // len(COUNTRIES)
    # the actually-generated total (integer division remainder is NOT
    # generated and must not be misattributed to the pipeline's drops)
    n_rows = rows_per_country * len(COUNTRIES)

    try:
        t0 = time.perf_counter()
        for idx, country in enumerate(COUNTRIES):
            df = _gen_country(spark, country, idx, rows_per_country)
            tmp_out = os.path.join(root, f"_gen_{country}")
            df.coalesce(1).write.option("header", True).mode("overwrite").csv(tmp_out)
            part = glob.glob(os.path.join(tmp_out, "part-*.csv"))[0]
            shutil.move(part, os.path.join(data_dir, f"{country}.csv"))
            shutil.rmtree(tmp_out)
        t_gen = time.perf_counter() - t0
        csv_bytes = sum(
            os.path.getsize(os.path.join(data_dir, f)) for f in os.listdir(data_dir)
        )
        print(
            f"generated {n_rows:,} rows across {len(COUNTRIES)} CSVs "
            f"({csv_bytes / 1e9:.2f} GB) in {t_gen:.1f}s"
        )

        t0 = time.perf_counter()
        stored, views = run_pipeline(
            spark,
            data_dir,
            warehouse_path=os.path.join(root, "warehouse"),
            dead_letter_path=os.path.join(root, "dead_letter"),
            as_of="2023-01-01",
        )
        n_warehouse = stored.count()
        t_pipe = time.perf_counter() - t0
        n_dead = spark.read.parquet(os.path.join(root, "dead_letter")).count()
        n_dropped = n_rows - n_warehouse - n_dead
        print(
            f"pipeline: {n_warehouse:,} warehouse rows + {n_dead:,} "
            f"dead-lettered + {n_dropped:,} mandatory-filtered of "
            f"{n_rows:,} in {t_pipe:.1f}s "
            f"({n_rows / t_pipe / 1e6:.2f}M rows/s end-to-end)"
        )
        # planted dirt: bad Open_Date (gid % 53 == 7) -> dead-letter;
        # NULL name (gid % 97 == 13, minus the % 53 overlap already
        # dead) -> silently dropped by the P8 mandatory filter
        expect_dead = n_rows / 53
        expect_dropped = n_rows / 97 * (1 - 1 / 53)
        assert 0.9 * expect_dead <= n_dead <= 1.1 * expect_dead, (
            f"dead-letter count {n_dead} outside expected ~{expect_dead:.0f}"
        )
        assert 0.9 * expect_dropped <= n_dropped <= 1.1 * expect_dropped, (
            f"dropped count {n_dropped} outside expected ~{expect_dropped:.0f}"
        )

        t0 = time.perf_counter()
        total_view_rows = 0
        for v in views:
            total_view_rows += spark.table(v).count()
        t_views = time.perf_counter() - t0
        print(
            f"views: {len(views)} per-country dedup-latest views, "
            f"{total_view_rows:,} deduped rows, materialized in {t_views:.1f}s"
        )
        # ~4 consults per customer -> the ROW_NUMBER dedup must shrink
        # the view union to roughly a quarter of the warehouse
        assert total_view_rows < 0.35 * n_warehouse, (
            f"dedup-latest no-op? {total_view_rows} of {n_warehouse}"
        )
    finally:
        if args.keep:
            print(f"scratch kept at {root}")
        else:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
