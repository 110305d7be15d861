"""Co-occurrence pair generation (market basket / co-purchase graphs).

The classic shape is a self-equi-join on the group key; this module
uses the strictly cheaper single-scan form — groupBy(group) →
collect_list → map-side combination expansion via array higher-order
functions — which produces the IDENTICAL multiset of (lo, hi) pairs
(duplicate items in a group contribute one pair per instance pair,
matching the self-join's row semantics; equal-item pairs are dropped
by the strict `<`).

Scale notes: the k²/2 per-group pair fan-out is the same as the
self-join's (both co-locate a group in one task), so the skew class is
unchanged; the win is ONE scan + ONE keyed shuffle instead of a
shuffle-both-sides join, and pairs are generated inside the JVM from
an in-memory array. Groups must be bounded (order baskets are — TPC-H
≤ 7 lines); for unbounded group sizes both shapes degrade identically
and need a support-threshold or sampling gate first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_pairs(
    df: DataFrame, group_col: str, item_col: str
) -> DataFrame:
    """All within-group ordered item pairs (lo < hi), one output row
    per pair instance: equivalent to the self-join
    ``a JOIN b ON a.group = b.group AND a.item < b.item``."""
    arrs = df.groupBy(group_col).agg(
        F.sort_array(F.collect_list(item_col)).alias("__items")
    )
    return (
        arrs.select(
            F.explode(
                F.expr(
                    "flatten(transform(__items, (x, i) ->"
                    " transform(slice(__items, i + 2, size(__items)),"
                    " y -> struct(x AS lo, y AS hi))))"
                )
            ).alias("p")
        )
        .select("p.lo", "p.hi")
        .filter(F.col("lo") < F.col("hi"))
    )
