"""Multimodal-column queries: binary payloads + typed metadata, and the
Arrow-batched (stubbed) decode/feature-extract stage.

``multimodal_features`` has no SQL oracle (mapInPandas operator;
rows-only check) — its batch shape and determinism are covered by
``tests/test_training_ops.py``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubyte_vaccination_data_pipeline_spark.catalog.registry import query
from incubyte_vaccination_data_pipeline_spark.operators.multimodal import (
    extract_features,
    to_binary_table,
)
from incubyte_vaccination_data_pipeline_spark.sources.parquet_io import read_table


@query(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_hash,
           'text/plain' AS mime,
           lang
    FROM documents
    """,
)
def multimodal_metadata_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload metadata: byte length + content hash + typed
    meta columns (the schema contract for opaque media columns)."""
    docs = read_table(spark, sf_dir, "documents")
    binary = to_binary_table(docs)
    return binary.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.md5("payload").alias("content_hash"),
        F.col("meta.mime").alias("mime"),
        F.col("meta.lang").alias("lang"),
    )


@query("multimodal_features")  # rows-only: mapInPandas operator
def multimodal_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stubbed decode -> feature extraction over binary payloads via
    Arrow-batched mapInPandas (deterministic byte-histogram fake;
    real codecs raise DecoderNotAvailable in this container)."""
    docs = read_table(spark, sf_dir, "documents")
    feats = extract_features(to_binary_table(docs))
    # project the array to scalars so the rows-only check sees a
    # stable flat schema
    return feats.select(
        "doc_id",
        "n_bytes",
        "decoder",
        F.round(F.element_at("features", 1), 6).alias("f0"),
        F.round(F.element_at("features", 2), 6).alias("f1"),
    )
