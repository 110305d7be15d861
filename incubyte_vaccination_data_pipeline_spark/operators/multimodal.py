"""Multimodal column handling: opaque binary payloads + typed metadata.

The engine's model for image/audio/video at 100 TB: a ``binary`` column
carrying the raw payload next to a typed metadata struct, processed by
Arrow-batched ``mapInPandas`` operators so payload bytes never pass
through Python row-by-row.

Two codecs are REAL and dependency-free (stdlib only): PNG (zlib
inflate + full scanline unfiltering, 8-bit gray/RGB/RGBA) and WAV
(RIFF chunk walk + PCM16 sample decode). Formats that genuinely need
external libraries (JPEG, MP3, video) raise ``DecoderNotAvailable``;
unrecognized payloads (e.g. plain text modeled as binary) fall back to
a deterministic byte-histogram so the Spark-side plumbing — schema,
batching, partition parallelism, UDF signature — is exercised
end-to-end on every payload kind.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_BINS = 16

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, features array<double>, decoder string"
)

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


class DecoderNotAvailable(NotImplementedError):
    """Raised when a payload needs a codec this container does not
    ship (JPEG/MP3/video) or a PNG/WAV variant outside the
    dependency-free decoders' scope."""


def decode_image(payload: bytes) -> dict:
    """Dependency-free PNG decoder: stdlib zlib inflate + full
    scanline unfiltering (filters 0-4 incl. Paeth). Supports 8-bit
    depth, color types 0 (gray), 2 (RGB), 6 (RGBA), non-interlaced.
    Returns {width, height, channels, pixels: bytes} with ``pixels``
    in row-major channel-interleaved order."""
    if not payload.startswith(PNG_MAGIC):
        raise DecoderNotAvailable(
            "not a PNG payload; only PNG images decode dependency-free"
        )
    pos, ihdr, idat = len(PNG_MAGIC), None, []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise DecoderNotAvailable("truncated PNG (missing IHDR/IDAT)")
    width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    channels = {0: 1, 2: 3, 6: 4}.get(color_type)
    if bit_depth != 8 or channels is None or interlace:
        raise DecoderNotAvailable(
            f"PNG variant out of scope (bit_depth={bit_depth}, "
            f"color_type={color_type}, interlace={interlace})"
        )
    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _y in range(height):
        f = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if f == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif f != 0:
            raise DecoderNotAvailable(f"unknown PNG filter {f}")
        out.extend(line)
        prev = line
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "pixels": bytes(out),
    }


def decode_audio(payload: bytes) -> dict:
    """Dependency-free WAV decoder: RIFF chunk walk + 16-bit PCM
    sample decode. Returns {sample_rate, channels, samples: list[int]}
    (interleaved)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise DecoderNotAvailable(
            "not a RIFF/WAVE payload; only WAV decodes dependency-free"
        )
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise DecoderNotAvailable("truncated WAV (missing fmt/data chunk)")
    audio_format, channels, sample_rate, _br, _ba, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if audio_format != 1 or bits != 16:
        raise DecoderNotAvailable(
            f"WAV variant out of scope (format={audio_format}, bits={bits})"
        )
    n = len(data) // 2
    samples = list(struct.unpack(f"<{n}h", data[: n * 2]))
    return {"sample_rate": sample_rate, "channels": channels, "samples": samples}


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


def _bytehist_features(data: bytes) -> list[float]:
    hist = [0] * FEATURE_BINS
    for byte in data:
        hist[byte % FEATURE_BINS] += 1
    total = max(len(data), 1)
    return [round(h / total, 6) for h in hist]


def _pad(feats: list[float]) -> list[float]:
    return (feats + [0.0] * FEATURE_BINS)[:FEATURE_BINS]


def decode_features(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction, routed by magic bytes:

    - PNG  -> real pixel decode; features = [width, height, channels,
      per-channel mean/255 ...] (decoder ``png-v1``)
    - WAV  -> real PCM16 decode; features = [sample_rate, channels,
      n_samples, rms/32768, mean/32768] (decoder ``wav-pcm-v1``)
    - else -> deterministic 16-bin byte histogram (``fake-bytehist-v1``)

    All feature vectors are zero-padded to FEATURE_BINS so the column
    type is stable across modalities."""
    for pdf in batch_iter:
        out_rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            data = bytes(payload)
            if data.startswith(PNG_MAGIC):
                img = decode_image(data)
                px, ch = img["pixels"], img["channels"]
                npx = max(len(px) // ch, 1)
                means = [
                    round(sum(px[c::ch]) / npx / 255.0, 6) for c in range(ch)
                ]
                feats = _pad(
                    [float(img["width"]), float(img["height"]), float(ch)] + means
                )
                decoder = "png-v1"
            elif data[:4] == b"RIFF" and data[8:12] == b"WAVE":
                au = decode_audio(data)
                s = au["samples"] or [0]
                n = len(s)
                rms = (sum(v * v for v in s) / n) ** 0.5
                feats = _pad(
                    [
                        float(au["sample_rate"]),
                        float(au["channels"]),
                        float(n),
                        round(rms / 32768.0, 6),
                        round(sum(s) / n / 32768.0, 6),
                    ]
                )
                decoder = "wav-pcm-v1"
            else:
                feats = _bytehist_features(data)
                decoder = "fake-bytehist-v1"
            out_rows.append(
                {
                    "doc_id": doc_id,
                    "n_bytes": len(data),
                    "features": feats,
                    "decoder": decoder,
                }
            )
        yield pd.DataFrame(out_rows, columns=["doc_id", "n_bytes", "features", "decoder"])


#: round-1 name for the histogram-only path, kept for callers/tests
fake_decode_features = decode_features


def extract_features(binary_df: DataFrame) -> DataFrame:
    """Feature extraction over the multimodal table via mapInPandas
    (the production shape for decode/resize/embed stages)."""
    return binary_df.select("doc_id", "payload").mapInPandas(
        decode_features, schema=FEATURE_SCHEMA
    )
