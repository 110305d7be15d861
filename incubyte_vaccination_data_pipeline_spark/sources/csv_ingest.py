"""CSV dialect ingest: scan, pipe-frame strip, synonym projection.

Parity targets in the reference (intshivam/incubyte-vaccination-data-pipeline):

- S1/S2 directory CSV scan + parse (``main.py:30-62``): every ``*.csv``
  under a directory, header row, values kept as strings.
- S3 pipe-frame handling (``data_validator.py:227-230``): if the first
  data row embeds a ``|H|...`` header record, that header is validated
  (warn-only) against the expected layout and every row whose first
  column starts with ``|`` is dropped.
- P1-P3 synonym projection (``data_validator.py:52-108``): keep only
  columns present in the dialect map, renamed to canonical names;
  synonym sets coalesce first-non-null in map order; unmapped columns
  (e.g. India's ``Free or Paid``) are dropped; a missing ``Country`` is
  synthesized from ``filename[:3].upper()``.

Scale note: files are read individually because each carries its own
dialect header; per-file plans union lazily via ``unionByName`` so
Catalyst still sees one DAG. For a 100 TB ingest you would group files
by dialect and glob each group into a single multi-file scan — the
projection logic here is per-dialect, not per-file, so it transfers
unchanged.
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubyte_vaccination_data_pipeline_spark.schema import (
    COLUMN_MAP,
    EXPECTED_PIPE_HEADER,
    MANDATORY_COLUMNS,
    OPTIONAL_COLUMNS,
)

logger = logging.getLogger(__name__)


def read_dialect_csv(spark: SparkSession, path: str) -> DataFrame:
    """Read one source CSV: header row, everything as strings (no
    inference — the validators own typing, matching the reference's
    object-dtype reads)."""
    return spark.read.option("header", True).option("inferSchema", False).csv(path)


def strip_pipe_frames(df: DataFrame) -> DataFrame:
    """Drop ``|``-framed records when the file embeds a pipe header.

    Mirrors ``data_validator.py:227-230``: detection looks at the first
    data row only (a bounded single-row action, not a data-path
    collect); the header record is compared to the expected layout and
    mismatches only warn; all rows whose *first* column starts with
    ``|`` are then filtered out distributively.
    """
    first = df.limit(1).collect()
    if not first:
        return df
    row = first[0]
    cells = [v for v in row if isinstance(v, str)]
    header_cells = [v for v in cells if v.startswith("|H|")]
    if not header_cells:
        return df
    header = header_cells[0]
    if header != EXPECTED_PIPE_HEADER:
        logger.warning(
            "Header does not match expected format. Expected: %s Received: %s",
            EXPECTED_PIPE_HEADER,
            header,
        )
    first_col = df.columns[0]
    return df.filter(~F.coalesce(df[first_col].startswith("|"), F.lit(False)))


def synonym_projection(
    df: DataFrame, filename: str | None = None, strict: bool = False
) -> DataFrame:
    """Project source-dialect columns onto the canonical schema.

    - output column order = first-occurrence order in the source file;
    - synonym sets (>1 source column -> one target) coalesce
      first-non-null in ``COLUMN_MAP`` insertion order
      (``data_validator.py:76-82``);
    - unmapped source columns are dropped;
    - absent ``Country`` is synthesized from the filename prefix;
    - missing mandatory columns warn (raise when ``strict``).
    """
    exprs = []
    processed: list[str] = []
    for source_col in df.columns:
        target = COLUMN_MAP.get(source_col)
        if target is None or target in processed:
            continue
        sources = [s for s, t in COLUMN_MAP.items() if t == target and s in df.columns]
        if len(sources) > 1:
            expr = F.coalesce(*[df[s] for s in sources])
        else:
            expr = df[source_col]
        exprs.append(expr.alias(target))
        processed.append(target)

    out = df.select(*exprs)

    if "Country" not in processed and filename:
        country_code = os.path.basename(filename)[:3].upper()
        out = out.withColumn("Country", F.lit(country_code))
        processed.append("Country")

    missing_mandatory = [c for c in MANDATORY_COLUMNS if c not in processed]
    if missing_mandatory:
        logger.warning("Missing mandatory columns: %s", missing_mandatory)
        if strict:
            raise ValueError(f"Missing mandatory columns: {missing_mandatory}")
    missing_optional = [c for c in OPTIONAL_COLUMNS if c not in processed]
    if missing_optional:
        logger.info("Missing optional columns: %s", missing_optional)
    return out


def load_source_data(
    spark: SparkSession, data_dir: str, strict: bool = False
) -> DataFrame:
    """S1+S3+P1-P3 composed over every ``*.csv`` in ``data_dir``,
    unioned by name with missing columns null-filled
    (``pd.concat`` parity, ``main.py:59-60``)."""
    files = sorted(
        f for f in os.listdir(data_dir) if f.lower().endswith(".csv")
    )
    if not files:
        raise FileNotFoundError(f"no CSV files under {data_dir}")
    frames = []
    for fname in files:
        df = read_dialect_csv(spark, os.path.join(data_dir, fname))
        df = strip_pipe_frames(df)
        df = synonym_projection(df, filename=fname, strict=strict)
        df = df.withColumn("Source_File", F.lit(fname))
        frames.append(df)
    out = frames[0]
    for df in frames[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out
