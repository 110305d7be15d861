"""Derived-column expressions for the country views.

Parity targets (reference ``src/utils/view_generator.py:33-40``):

- ``AGE = DATEDIFF(YEAR, DOB, CURRENT_DATE())`` — Snowflake's
  DATEDIFF(YEAR) counts *year-boundary crossings*, i.e.
  ``year(as_of) - year(dob)``, NOT full elapsed years. Implemented
  exactly so (not ``floor(months_between/12)``).
- ``DAYS_SINCE_CONSUL_GT_30`` — ``CASE WHEN DATEDIFF(DAY, CONSUL_DT,
  CURRENT_DATE()) > 30 THEN TRUE ELSE FALSE END``; a NULL CONSUL_DT
  falls into the CASE else-branch -> FALSE, so the Spark expression
  coalesces the three-valued ``>`` to FALSE.

Both take an explicit ``as_of`` instead of ``current_date()`` so results
are deterministic and oracle-comparable (SURVEY.md §7.3).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_of_col(as_of: str | _dt.date | Column) -> Column:
    if isinstance(as_of, Column):
        return as_of
    return F.lit(str(as_of)).cast("date")


def age_years(dob: Column, as_of: str | _dt.date | Column) -> Column:
    """Snowflake DATEDIFF(YEAR) semantics: year-number difference."""
    return (F.year(_as_of_col(as_of)) - F.year(dob)).cast("int")


def staleness_flag(consul_dt: Column, as_of: str | _dt.date | Column, days: int = 30) -> Column:
    """TRUE iff the last consultation is more than ``days`` days before
    ``as_of``; NULL consultation dates yield FALSE (CASE else-branch)."""
    return F.coalesce(
        F.datediff(_as_of_col(as_of), consul_dt) > days, F.lit(False)
    )
