"""Skew-mitigation operators for hot keys at the 100 TB design point.

AQE's skew-join handling (on by default, ``session.py``) splits
oversized partitions at runtime, but only for sort-merge joins and only
post-shuffle. Salting is the explicit, planner-independent form: spread
one hot key across ``salt`` sub-keys so no single task owns it.

``salted_join`` implements the classic replicate-and-salt equi-join:
the skewed (probe) side gets a random salt in ``[0, salt)``; the build
side is replicated ``salt`` times via ``explode(sequence(...))`` (a
narrow op — no shuffle of its own); the join key becomes
``(key, salt)``, so the hot key's rows land on ``salt`` different
reducers. Results are exactly equal to the unsalted join (asserted in
tests/test_plans.py); cost is ``salt``x the build side's shuffle
volume, which is the right trade when the build side is small-ish and
the probe side has pathological keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    build: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed ⋈ build`` on column ``on``, salted ``salt``
    ways. Column set of the result matches ``skewed.join(build, on,
    how)`` (the join column appears once)."""
    skewed_s = skewed.withColumn(
        "__salt", (F.rand(seed=7) * salt).cast("int")
    )
    build_s = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = skewed_s.join(build_s, [on, "__salt"], how)
    return out.drop("__salt")
