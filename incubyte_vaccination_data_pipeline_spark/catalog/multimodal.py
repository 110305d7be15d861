"""Multimodal-column queries: binary payloads + typed metadata, and the
Arrow-batched decode/feature-extract stage.

``multimodal_features`` (round 6): the mapInPandas feature vectors ARE
SQL-restatable in closed form, because every ``documents`` payload is
text and the text path is a 16-bin low-nibble byte histogram
(``operators/multimodal.py:_bytehist_features`` — bin = byte & 15,
value = round(count/total, 6)).  The query reconstructs the exact
integer bin counts from the emitted features (round(value * total) is
exact while total < ~1e6 at 6-dp quantization) and folds them into two
weighted checksums (weights b+1 and (b+1)^2 — two independent linear
forms, so no single count error or pairwise swap can cancel).  The
DuckDB oracle recomputes both checksums directly from the payload
bytes via hex-nibble counting over ``hex(encode(text))`` — a FULL
value check of the decode->feature path, replacing the former
``features_ok`` TRUE-certificate (the decode-roundtrip recipe applied
to the feature stage).  Feature determinism stays pinned by
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


@query(
    "multimodal_features",
    oracle="""
    WITH h AS (
        SELECT doc_id,
               hex(encode(text)) AS hx,
               octet_length(encode(text)) AS n
        FROM documents
    ),
    nib AS (
        -- low nibble of byte i is hex char 2i+2 (1-based, uppercase);
        -- its strpos in the hex alphabet is (bin + 1), the checksum
        -- weight
        SELECT doc_id,
               strpos('0123456789ABCDEF', substr(hx, 2 * i.i + 2, 1)) AS w
        FROM h, UNNEST(range(n)) AS i(i)
    ),
    s AS (
        SELECT doc_id,
               SUM(w)::BIGINT AS cks1,
               SUM(w * w)::BIGINT AS cks2
        FROM nib GROUP BY doc_id
    )
    SELECT h.doc_id,
           h.n AS n_bytes,
           'fake-bytehist-v1' AS decoder,
           COALESCE(s.cks1, 0) AS hist_checksum,
           COALESCE(s.cks2, 0) AS hist_checksum_sq
    FROM h LEFT JOIN s USING (doc_id)
    """,
)
def multimodal_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode -> feature extraction over binary payloads via
    Arrow-batched mapInPandas (PNG/JPEG/WAV decode real; text payloads
    take the deterministic 16-bin byte-histogram path). The exact bin
    counts are reconstructed from the 6-dp features and folded into
    two weighted integer checksums the oracle recomputes from the raw
    payload bytes — a full value check (see module docstring)."""
    docs = read_table(spark, sf_dir, "documents")
    feats = extract_features(to_binary_table(docs))
    total = F.greatest(F.col("n_bytes"), F.lit(1))
    # counts[b] = round(features[b] * total): exact integer recovery of
    # the histogram numerator (6-dp quantization error < 0.5 for any
    # payload under ~1e6 bytes; testdata documents are << that)
    counts = F.transform(
        "features", lambda v: F.round(v * total).cast("bigint")
    )
    weights = F.sequence(F.lit(1), F.lit(16))

    def _weighted(power: int):
        return F.aggregate(
            F.zip_with(
                counts,
                weights,
                lambda c, w: c * (w if power == 1 else w * w),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )

    return feats.select(
        "doc_id",
        "n_bytes",
        "decoder",
        _weighted(1).alias("hist_checksum"),
        _weighted(2).alias("hist_checksum_sq"),
    )


@query(
    "multimodal_decode_roundtrip",
    oracle="""
    WITH docs AS (
        SELECT doc_id,
               (8 + doc_id % 9)::INT AS width,
               (8 + doc_id % 7)::INT AS height,
               (2 + doc_id % 3)::INT AS jbw,
               (1 + doc_id % 4)::INT AS jbh
        FROM documents
        WHERE doc_id < 48
    ),
    px AS (
        SELECT d.doc_id,
               SUM((d.doc_id + 31 * y.y + 7 * x.x + 97 * c.c) % 256)
                   ::BIGINT AS pixel_checksum
        FROM docs d,
             UNNEST(range(d.height)) AS y(y),
             UNNEST(range(d.width)) AS x(x),
             UNNEST(range(3)) AS c(c)
        GROUP BY d.doc_id
    ),
    au AS (
        SELECT d.doc_id,
               SUM((13 * d.doc_id + 29 * i.i) % 65536 - 32768)
                   ::BIGINT AS wav_checksum
        FROM docs d, UNNEST(range(128)) AS i(i)
        GROUP BY d.doc_id
    ),
    jp AS (
        SELECT d.doc_id,
               (64 * SUM((d.doc_id + 11 * bx.bx + 17 * by.by) % 256))
                   ::BIGINT AS jpeg_checksum
        FROM docs d,
             UNNEST(range(d.jbh)) AS by(by),
             UNNEST(range(d.jbw)) AS bx(bx)
        GROUP BY d.doc_id
    )
    SELECT d.doc_id, d.width, d.height, 3 AS channels,
           px.pixel_checksum, 128 AS n_samples, au.wav_checksum,
           d.jbw AS jpeg_blocks_w, d.jbh AS jpeg_blocks_h,
           jp.jpeg_checksum
    FROM docs d
    JOIN px USING (doc_id)
    JOIN au USING (doc_id)
    JOIN jp USING (doc_id)
    """,
)
def multimodal_decode_roundtrip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-codec driver path: per document row, synthesize a
    deterministic RGB PNG (all 5 scanline filters exercised), a PCM16
    WAV, and a DC-only baseline JPEG (block-constant gray — exact
    under the all-ones quant table, with a real differential-DC
    Huffman entropy segment), decode all three through the
    dependency-free codecs (``operators/multimodal.py:decode_image/
    decode_audio/decode_jpeg``), and emit integer checksums computed
    from the DECODED bytes. The oracle restates each checksum in
    closed form over generate_series — a full value check on the
    decode paths, replacing the byte-histogram-only coverage the
    driver data gave ``multimodal_features``. Scale shape:
    Arrow-batched mapInPandas, small payloads per row, no shuffle
    before the exchange-free per-row map."""
    from incubyte_vaccination_data_pipeline_spark.operators.multimodal import (
        ROUNDTRIP_SCHEMA,
        decode_roundtrip_batch,
    )

    docs = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 48)
        .select(
            "doc_id",
            (F.lit(8) + F.col("doc_id") % 9).cast("int").alias("width"),
            (F.lit(8) + F.col("doc_id") % 7).cast("int").alias("height"),
        )
    )
    return docs.mapInPandas(decode_roundtrip_batch, schema=ROUNDTRIP_SCHEMA)


@query(
    "multimodal_decode_progressive",
    oracle="""
    WITH docs AS (
        SELECT doc_id,
               (2 + doc_id % 3)::INT AS jbw,
               (1 + doc_id % 4)::INT AS jbh
        FROM documents
        WHERE doc_id < 48
    ),
    jp AS (
        SELECT d.doc_id,
               (64 * SUM((d.doc_id + 11 * bx.bx + 17 * by.by) % 256))
                   ::BIGINT AS jpeg_checksum
        FROM docs d,
             UNNEST(range(d.jbh)) AS by(by),
             UNNEST(range(d.jbw)) AS bx(bx)
        GROUP BY d.doc_id
    )
    SELECT d.doc_id, d.jbw AS jpeg_blocks_w, d.jbh AS jpeg_blocks_h,
           'jpeg-progressive-v1' AS decoder, jp.jpeg_checksum
    FROM docs d JOIN jp USING (doc_id)
    """,
)
def multimodal_decode_progressive_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Progressive-JPEG (SOF2) driver leg: the round-5 roundtrip query
    value-checked the BASELINE (SOF0) decode path; this sibling pushes
    a real three-scan progressive stream (DC first with successive
    approximation Al=1, DC refinement, AC first as EOB runs) through
    ``decode_jpeg`` per document row and emits the decoded pixel
    checksum plus the decoder-reported mode tag.  The oracle restates
    the checksum in closed form and pins the tag to
    'jpeg-progressive-v1', so a silent fall-through to the baseline
    path (or any scan mis-application) hash-mismatches.  Same
    Arrow-batched exchange-free mapInPandas shape as
    ``multimodal_decode_roundtrip``."""
    from incubyte_vaccination_data_pipeline_spark.operators.multimodal import (
        PROGRESSIVE_SCHEMA,
        decode_progressive_batch,
    )

    docs = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 48)
        .select("doc_id")
    )
    return docs.mapInPandas(decode_progressive_batch, schema=PROGRESSIVE_SCHEMA)


@query(
    "multimodal_resize_thumbnail",
    oracle="""
    WITH docs AS (
        SELECT doc_id,
               (8 + doc_id % 9)::INT AS width,
               (8 + doc_id % 7)::INT AS height
        FROM documents
        WHERE doc_id < 48
    ),
    t AS (
        SELECT d.doc_id, d.width, d.height, c.c,
               SUM((d.doc_id
                    + 31 * ((i.i * d.height) // 4)
                    + 7 * ((j.j * d.width) // 4)
                    + 97 * c.c) % 256) AS s
        FROM docs d,
             UNNEST(range(4)) AS i(i),
             UNNEST(range(4)) AS j(j),
             UNNEST(range(3)) AS c(c)
        GROUP BY d.doc_id, d.width, d.height, c.c
    )
    SELECT doc_id, width AS src_w, height AS src_h,
           CAST(MAX(CASE WHEN c = 0 THEN s END) AS BIGINT) AS ch0_sum,
           CAST(MAX(CASE WHEN c = 1 THEN s END) AS BIGINT) AS ch1_sum,
           CAST(MAX(CASE WHEN c = 2 THEN s END) AS BIGINT) AS ch2_sum
    FROM t
    GROUP BY doc_id, width, height
    """,
)
def multimodal_resize_thumbnail_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode -> RESIZE driver path (the thumbnail / model-input
    normalization stage): synthesize the deterministic RGB PNG per
    row, decode it, nearest-neighbor-resize to 4x4
    (``operators/multimodal.py:resize_nearest`` — integer index map,
    pure numpy), and emit per-channel integer sums of the thumbnail.
    The oracle restates each sum in closed form (the resize index map
    is integer division), value-checking decode AND resize end-to-end.
    Same Arrow-batched mapInPandas scale shape as
    ``multimodal_decode_roundtrip``."""
    from incubyte_vaccination_data_pipeline_spark.operators.multimodal import (
        THUMBNAIL_SCHEMA,
        thumbnail_roundtrip_batch,
    )

    docs = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 48)
        .select(
            "doc_id",
            (F.lit(8) + F.col("doc_id") % 9).cast("int").alias("width"),
            (F.lit(8) + F.col("doc_id") % 7).cast("int").alias("height"),
        )
    )
    return docs.mapInPandas(thumbnail_roundtrip_batch, schema=THUMBNAIL_SCHEMA)


@query(
    "multimodal_audio_frames",
    oracle="""
    WITH docs AS (
        SELECT doc_id FROM documents WHERE doc_id < 48
    ),
    s AS (
        SELECT d.doc_id,
               (i.i // 32)::INT AS frame_id,
               (13 * d.doc_id + 29 * i.i) % 65536 - 32768 AS v
        FROM docs d, UNNEST(range(128)) AS i(i)
    )
    SELECT doc_id, frame_id,
           CAST(SUM(v) AS BIGINT) AS frame_sum,
           CAST(SUM(v * v) AS BIGINT) AS frame_energy
    FROM s
    GROUP BY doc_id, frame_id
    """,
)
def multimodal_audio_frames_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode -> FRAME-SAMPLE driver path (the windowing step of audio
    curation; the same shape frame-samples video once a codec exists):
    synthesize the deterministic PCM16 WAV per row, decode it, slice
    the DECODED samples into 32-sample frames, and emit each frame's
    integer sum + energy. One row per (doc, frame); the oracle
    restates both integers in closed form, value-checking decode and
    framing end-to-end. Arrow-batched mapInPandas, exchange-free."""
    from incubyte_vaccination_data_pipeline_spark.operators.multimodal import (
        FRAMES_SCHEMA,
        audio_frames_batch,
    )

    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 48
    ).select("doc_id")
    return docs.mapInPandas(audio_frames_batch, schema=FRAMES_SCHEMA)
