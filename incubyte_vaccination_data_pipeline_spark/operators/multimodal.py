"""Multimodal column handling: opaque binary payloads + typed metadata.

The engine's model for image/audio/video at 100 TB: a ``binary`` column
carrying the raw payload next to a typed metadata struct, processed by
Arrow-batched ``mapInPandas`` operators so payload bytes never pass
through Python row-by-row.

The actual codec step (image decode, resize, audio resample, video
frame-sample) requires libraries not present in this container, so the
codecs are STUBBED behind ``DecoderNotAvailable``; a deterministic fake
decoder (byte-histogram features) keeps the Spark-side plumbing —
schema, batching, partition parallelism, UDF signature — real and
testable end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_BINS = 16

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, features array<double>, decoder string"
)


class DecoderNotAvailable(NotImplementedError):
    """Raised by the real codec paths; this container has no
    image/audio libraries (by design — see module docstring)."""


def decode_image(payload: bytes) -> "object":
    raise DecoderNotAvailable(
        "image decode requires an imaging library not present in this "
        "container; use fake_decode_features for pipeline testing"
    )


def decode_audio(payload: bytes) -> "object":
    raise DecoderNotAvailable(
        "audio decode requires an audio library not present in this "
        "container; use fake_decode_features for pipeline testing"
    )


def to_binary_table(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Model a documents table as a multimodal table: binary payload +
    typed metadata struct (mime/size/lang)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(payload).alias("n_bytes"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


def fake_decode_features(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for a codec: 16-bin byte histogram,
    normalized. Arrow-batched; payloads stay as contiguous buffers."""
    for pdf in batch_iter:
        out_rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            data = bytes(payload)
            hist = [0] * FEATURE_BINS
            for byte in data:
                hist[byte % FEATURE_BINS] += 1
            total = max(len(data), 1)
            out_rows.append(
                {
                    "doc_id": doc_id,
                    "n_bytes": len(data),
                    "features": [round(h / total, 6) for h in hist],
                    "decoder": "fake-bytehist-v1",
                }
            )
        yield pd.DataFrame(out_rows, columns=["doc_id", "n_bytes", "features", "decoder"])


def extract_features(binary_df: DataFrame) -> DataFrame:
    """Feature extraction over the multimodal table via mapInPandas
    (the production shape for decode/resize/embed stages)."""
    return binary_df.select("doc_id", "payload").mapInPandas(
        fake_decode_features, schema=FEATURE_SCHEMA
    )
