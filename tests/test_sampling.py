"""Deterministic train/val/test split (operators/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incubyte_vaccination_data_pipeline_spark.operators.sampling import (
    BUCKETS,
    split_boundaries,
    take_split,
    with_split,
)
from incubyte_vaccination_data_pipeline_spark.sources.parquet_io import read_table


def test_split_boundaries_cover_all_buckets():
    bounds = split_boundaries({"train": 0.9, "val": 0.05, "test": 0.05})
    assert bounds[-1][1] == BUCKETS
    assert [n for n, _ in bounds] == ["train", "val", "test"]
    with pytest.raises(ValueError):
        split_boundaries({"a": 0.5, "b": 0.2})


def test_split_boundaries_property_random_fractions():
    """Property (hypothesis): for any normalized fraction mapping, the
    boundaries are strictly increasing, cover [0, BUCKETS) exactly
    (last forced to BUCKETS — rounding can never drop rows), and each
    split's bucket width is within 1 of fraction * BUCKETS."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.floats(min_value=0.01, max_value=1.0, allow_nan=False),
            min_size=1,
            max_size=5,
        )
    )
    def check(weights):
        total = sum(weights)
        fractions = {f"s{i}": w / total for i, w in enumerate(weights)}
        # renormalize drift so the sum gate passes
        fractions[f"s{len(weights) - 1}"] += 1.0 - sum(fractions.values())
        bounds = split_boundaries(fractions)
        assert bounds[-1][1] == BUCKETS
        uppers = [u for _, u in bounds]
        assert uppers == sorted(uppers)
        lower = 0
        for (name, upper) in bounds[:-1]:
            width = upper - lower
            assert abs(width - fractions[name] * BUCKETS) <= 1.0
            lower = upper

    check()


def test_split_is_exhaustive_disjoint_and_proportional(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    labeled = with_split(docs, "doc_id")
    counts = {
        r["split"]: r["n"]
        for r in labeled.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total = docs.count()
    assert sum(counts.values()) == total  # exhaustive, no dropped rows
    assert counts["train"] / total == pytest.approx(0.9, abs=0.05)
    assert (counts.get("val", 0) + counts.get("test", 0)) / total == pytest.approx(
        0.1, abs=0.05
    )


def test_split_deterministic_and_content_addressed(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    a = {r["doc_id"]: r["split"] for r in with_split(docs, "doc_id").collect()}
    b = {r["doc_id"]: r["split"] for r in with_split(docs, "doc_id").collect()}
    assert a == b
    # growing the corpus never moves an existing row's assignment
    subset = docs.filter(F.col("doc_id") % 3 == 0)
    sub = {r["doc_id"]: r["split"] for r in with_split(subset, "doc_id").collect()}
    assert all(a[k] == v for k, v in sub.items())
    # a different salt is an independent re-split
    resalted = {
        r["doc_id"]: r["split"]
        for r in with_split(docs, "doc_id", salt="split-v2").collect()
    }
    assert resalted != a


def test_take_split_matches_labeled_frame(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    labeled = with_split(docs, "doc_id")
    for split in ("train", "val", "test"):
        direct = {r["doc_id"] for r in take_split(docs, "doc_id", split).collect()}
        from_label = {
            r["doc_id"] for r in labeled.filter(F.col("split") == split).collect()
        }
        assert direct == from_label
    with pytest.raises(ValueError):
        take_split(docs, "doc_id", "holdout")


def test_take_split_is_scan_side_filter(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    plan = (
        take_split(docs, "doc_id", "train")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, "split selection must not shuffle"
