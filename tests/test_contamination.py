"""Cross-split contamination detection (operators/contamination.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from incubyte_vaccination_data_pipeline_spark.operators.contamination import (
    exact_contamination,
    ngram_contamination,
)
from incubyte_vaccination_data_pipeline_spark.operators.sampling import take_split
from incubyte_vaccination_data_pipeline_spark.sources.parquet_io import read_table


def _frames(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "completely unrelated training text about spark partitions"),
        (3, "another training document with its own words entirely"),
    ]
    train = spark.createDataFrame(rows, "doc_id long, text string")
    eval_rows = [
        # exact copy of train doc 1 modulo whitespace/case
        (101, "  The quick   brown fox jumps over the lazy dog again and again "),
        # partial leak: quotes 12 train words then continues on its own
        (
            102,
            "the quick brown fox jumps over the lazy dog again and again "
            "but then this evaluation document keeps going with fresh material "
            "of its own for a while longer",
        ),
        # clean doc
        (103, "evaluation only content sharing nothing with the training set"),
        # too short for 8-grams
        (104, "tiny doc"),
    ]
    evaluation = spark.createDataFrame(eval_rows, "doc_id long, text string")
    return train, evaluation


def test_exact_contamination_normalized_hash(spark):
    train, evaluation = _frames(spark)
    pairs = {
        (r["eval_doc_id"], r["train_doc_id"])
        for r in exact_contamination(train, evaluation).collect()
    }
    assert pairs == {(101, 1)}


def test_ngram_contamination_flags_partial_leak(spark):
    train, evaluation = _frames(spark)
    out = {
        r["eval_doc_id"]: r
        for r in ngram_contamination(
            train, evaluation, n=8, min_overlap=0.2
        ).collect()
    }
    assert 101 in out and out[101]["overlap"] == 1.0
    assert 102 in out and 0.0 < out[102]["overlap"] < 1.0
    assert 103 not in out
    assert 104 not in out  # shorter than n words -> no grams, never flagged


def test_ngram_contamination_short_docs_make_no_grams(spark):
    # regression: Spark's sequence(1, 0) is [1, 0], not empty — an
    # unguarded gram expression fabricates grams for short docs
    train = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    evaluation = spark.createDataFrame([(2, "a b c")], "doc_id long, text string")
    assert ngram_contamination(train, evaluation, n=8, min_overlap=0.0).count() == 0


def test_contamination_joins_are_equi_joins(spark):
    train, evaluation = _frames(spark)
    for df in (
        exact_contamination(train, evaluation),
        ngram_contamination(train, evaluation),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_split_then_contaminate_on_testdata(spark, sf_dir):
    """End-to-end with the real corpus: split documents, then verify
    the splits are contamination-free under exact hashing (the corpus
    has no cross-doc duplicates before augmentation)."""
    docs = read_table(spark, sf_dir, "documents")
    train = take_split(docs, "doc_id", "train")
    test = take_split(docs, "doc_id", "test")
    assert exact_contamination(train, test).count() == 0
    # planting a leak is detected
    leaked = test.unionByName(train.limit(3))
    assert exact_contamination(train, leaked).count() >= 3
