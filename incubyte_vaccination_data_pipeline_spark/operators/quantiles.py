"""Exact interpolated quantiles over a sorted value array.

Spark's exact ``percentile`` aggregate maintains a boxed
value->count OpenHashMap per (group, partition) and sorts the merged
entries at finalization; for near-unique doubles (prices, keys) that
buffer IS the group's value multiset with per-row boxing on top.
Collecting the values with ``sort_array(collect_list(...))`` and
interpolating positionally holds the same O(group size) state in a
flat array instead — measured 0.81 s -> 0.29 s median (interleaved
A/B, sf0.1 orders, 3 quantiles per group) with BIT-IDENTICAL output
at every SF (r14).

The interpolation restates DuckDB's ``quantile_cont`` exactly —
``RN = q * (n - 1); lower + (upper - lower) * (RN - floor(RN))`` —
which is the formula every oracle in this catalog states, so the
cross-engine 6-dp agreement is by construction rather than by the
empirical agreement Spark's own formulation relied on.

Scale note (unchanged contract): exact per-group quantiles hold the
group's values in memory in ANY exact formulation (Spark's
``percentile`` buffer included); ``approx_percentile`` remains the
documented single-pass 100 TB path, and the docstrings of the
consuming queries say so.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sorted_values(col: Column | str) -> Column:
    """Aggregate expression: the group's values as an ascending array
    (the quantile buffer). ``collect_list`` skips NULLs, matching
    ``percentile``'s NULL-ignoring semantics — no caller-side filter
    is needed (an all-NULL group yields an empty array, which the
    ``quantile_cont_sql`` size guard turns into NULL, again matching
    ``percentile``)."""
    return F.sort_array(F.collect_list(col))


def quantile_cont_sql(arr: str, q: float, dp: int = 6) -> str:
    """SQL expression string: exact interpolated quantile ``q`` of the
    ascending array column ``arr``, rounded to ``dp`` — DuckDB
    ``quantile_cont`` semantics (validated bit-identical to Spark's
    ``percentile`` on the testdata at every SF)."""
    rn = f"({q!r}D * (size({arr}) - 1))"
    lo = f"element_at({arr}, cast(floor({rn}) as int) + 1)"
    hi = f"element_at({arr}, cast(ceil({rn}) as int) + 1)"
    # the empty-array guard mirrors percentile's NULL-on-no-rows AND
    # keeps the expression ANSI-safe (the driver session runs ANSI ON,
    # where element_at on an empty array throws instead of nulling)
    return (
        f"CASE WHEN size({arr}) > 0 THEN"
        f" round({lo} + ({hi} - {lo}) * ({rn} - floor({rn})), {dp})"
        f" END"
    )


def quantile_cont(arr: str, q: float, dp: int = 6) -> Column:
    return F.expr(quantile_cont_sql(arr, q, dp))
