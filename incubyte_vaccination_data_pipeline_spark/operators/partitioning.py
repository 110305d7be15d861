"""Partition-layout helpers shared by the operator library."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fanout_repartition(df: DataFrame, *cols: str) -> DataFrame:
    """Hash-spread ``df`` over ``max(defaultParallelism, current
    partitions)`` partitions keyed by ``cols``.

    For explode-heavy operators (shingles, n-grams, per-char terms)
    the input bytes wildly understate the downstream work: a small
    parquet file arrives as 1-3 splits, so a 100-1000x row explosion
    runs on 3 of N cores. An explicit pre-explode repartition costs
    one tiny shuffle of the compact input and spreads the expensive
    stage across the cluster. The explicit partition count matters:
    it pins the exchange against AQE coalescing, which only sees the
    small input bytes and would shrink it right back. Keying by the
    downstream grouping column lets the following groupBy reuse the
    layout (hash partitioning on a subset of the grouping keys
    satisfies its clustering) instead of shuffling again — so the
    exchange count does not grow. On inputs already wider than the
    cluster (the 100 TB case) this is a no-op-sized reshuffle that
    preserves the existing parallelism.
    """
    spark = df.sparkSession
    n = max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
    )
    return df.repartition(n, *cols)
