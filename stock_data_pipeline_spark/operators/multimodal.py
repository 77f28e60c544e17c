"""Tier C multimodal columns (SURVEY.md §2 C5).

Model: media (image/audio/video) live as opaque ``binary`` payloads with a
typed metadata struct beside them — the standard large-scale layout (payload
in the lake, features extracted by Arrow-batched Python). The decode step
itself needs codec libraries that are not in this environment, so it is
stubbed behind ``NotImplementedError`` / a deterministic fake — but the
Spark-side plumbing (schema, batching, ``mapInPandas`` signature, partition
behavior) is real and tested.

The registered query derives a deterministic binary payload from
``documents.text`` (utf-8 bytes) so the byte-level feature extraction is
oracle-checkable end-to-end (sha256 + length have exact SQL equivalents).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, payload_sha256 string, head_char_code int"
)


def _byte_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extractor over binary payloads.

    This is the exact shape a real image/audio decoder plugs into: per
    Arrow batch, vectorized work over ``bytes`` objects, schema declared
    up front. Replace the body with PIL/librosa calls when the codecs are
    available (see :func:`decode_image_stub`).
    """
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int32"),
                "payload_sha256": payloads.map(
                    lambda b: hashlib.sha256(b).hexdigest()
                ),
                # decode-then-inspect: the stand-in for a real codec step
                "head_char_code": payloads.map(
                    lambda b: ord(b.decode("utf-8")[0]) if len(b) else -1
                ).astype("int32"),
            }
        )


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary column + typed metadata struct."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.col("n_chars").alias("n_chars"),
            F.col("source").alias("source"),
        ).alias("media_meta"),
    )


def extract_byte_features(docs: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over the binary column.

    Scale: pure map — no shuffle; Arrow carries the binary column to
    Python in columnar batches (spark.sql.execution.arrow.maxRecordsPerBatch
    bounds batch memory). At 100 TB this is the one place Python is
    justified: codec work that no built-in expresses.
    """
    return with_binary_payload(docs).mapInPandas(_byte_features, FEATURE_SCHEMA)


FRAME_SIZE = 16
FRAME_STRIDE = 4
FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, frame_off int, frame_bytes int,"
    " frame_sha256 string"
)


def _frame_sample(
    batches: Iterator[pd.DataFrame],
    *,
    frame_size: int = FRAME_SIZE,
    stride: int = FRAME_STRIDE,
) -> Iterator[pd.DataFrame]:
    """Arrow-batched frame sampler: treat the payload as a sequence of
    fixed-size frames, emit every ``stride``-th frame's offset + digest.

    The stand-in for video keyframe extraction: a real implementation
    swaps the byte-slice for a codec seek (pyav/ffmpeg) with the same
    (doc_id → many frames) fan-out shape and schema contract.
    """
    for pdf in batches:
        out = {k: [] for k in
               ("doc_id", "frame_idx", "frame_off", "frame_bytes", "frame_sha256")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n = len(payload)
            n_frames = max((n + frame_size - 1) // frame_size, 1)
            for idx in range(0, n_frames, stride):
                off = idx * frame_size
                chunk = bytes(payload[off : off + frame_size])
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(idx)
                out["frame_off"].append(off)
                out["frame_bytes"].append(len(chunk))
                out["frame_sha256"].append(hashlib.sha256(chunk).hexdigest())
        yield pd.DataFrame(out).astype(
            {"frame_idx": "int32", "frame_off": "int32", "frame_bytes": "int32"}
        )


def sample_frames(docs: DataFrame) -> DataFrame:
    """One row per sampled frame per document (mapInPandas fan-out).

    Scale: map-only like :func:`extract_byte_features`, but row-expanding
    (×frames/stride) — at 100 TB size the downstream shuffle off the
    SAMPLED rows, never the raw payloads.
    """
    return with_binary_payload(docs).mapInPandas(_frame_sample, FRAME_SCHEMA)


@query("c05_frame_sample")  # byte-slice digests aren't SQL-expressible in
# the oracle dialect (no BLOB substring); checked against an in-process
# recompute in tests/test_multimodal.py
def c05_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5b: frame sampling over opaque media payloads — every 4th 16-byte
    frame's offset and sha256, the keyframe-extraction plumbing shape."""
    return sample_frames(load(spark, sf_dir, "documents"))


def decode_image_stub(payload: bytes) -> "tuple[int, int]":
    """Placeholder for real image decode (PIL not available in this env).

    STUB: raises — callers must gate on availability. The production
    implementation returns (width, height) from the decoded header.
    """
    raise NotImplementedError(
        "image codecs are not installed in this environment; "
        "plug PIL/pillow into _byte_features when available"
    )


@query(
    "c05_multimodal_features",
    oracle="""
    SELECT
      doc_id,
      CAST(octet_length(encode(text)) AS INT) AS n_bytes,
      sha256(text) AS payload_sha256,
      CAST(CASE WHEN length(text) > 0 THEN ascii(text) ELSE -1 END AS INT)
        AS head_char_code
    FROM documents
    """,
)
def c05_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5: binary-column feature extraction via Arrow-batched mapInPandas.

    The payload is utf-8 text bytes (deterministic), so sha256/length/first
    byte are exactly checkable against DuckDB — proving the binary plumbing
    (BinaryType schema, Arrow transfer, batch iterator contract) without
    needing codec libraries.
    """
    return extract_byte_features(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# C5c — resize / thumbnail (deterministic stand-in for image resample)
# --------------------------------------------------------------------------
THUMB_BYTES = 32
RESIZE_SCHEMA = "doc_id bigint, orig_bytes int, thumb binary, thumb_sha256 string"


def _resize_payload(
    batches: Iterator[pd.DataFrame], *, out_bytes: int = THUMB_BYTES
) -> Iterator[pd.DataFrame]:
    """Arrow-batched "resize": even-stride downsample of the payload to a
    fixed byte budget — the plumbing shape of image thumbnailing (decode →
    resample → re-encode) with a deterministic fake in place of the codec.
    A real implementation swaps the strided byte pick for
    ``PIL.Image.resize`` keeping schema and batch contract identical.
    """
    for pdf in batches:
        rows = {k: [] for k in ("doc_id", "orig_bytes", "thumb", "thumb_sha256")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n = len(payload)
            if n <= out_bytes:
                thumb = bytes(payload)
            else:
                idx = [i * n // out_bytes for i in range(out_bytes)]
                thumb = bytes(payload[i] for i in idx)
            rows["doc_id"].append(doc_id)
            rows["orig_bytes"].append(n)
            rows["thumb"].append(thumb)
            rows["thumb_sha256"].append(hashlib.sha256(thumb).hexdigest())
        yield pd.DataFrame(rows).astype({"orig_bytes": "int32"})


def resize_payloads(docs: DataFrame) -> DataFrame:
    """Fixed-budget thumbnails for every payload (map-only, no shuffle)."""
    return with_binary_payload(docs).mapInPandas(_resize_payload, RESIZE_SCHEMA)


@query("c05_resize_thumbnail")  # byte-slice output isn't SQL-expressible in
# the oracle dialect; checked against an in-process recompute in
# tests/test_multimodal.py
def c05_resize_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5c: resize/thumbnail plumbing — every payload downsampled to a
    32-byte strided thumbnail with digest, the image-resample fan-in shape."""
    return resize_payloads(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# C5d — audio-style windowed energy (deterministic stand-in for DSP)
# --------------------------------------------------------------------------
AUDIO_WINDOW = 64
AUDIO_SCHEMA = "doc_id bigint, n_windows int, window_rms array<double>"


def _audio_energy(
    batches: Iterator[pd.DataFrame], *, window: int = AUDIO_WINDOW
) -> Iterator[pd.DataFrame]:
    """Per-payload windowed RMS over byte values — the frame-energy shape
    of audio feature extraction (librosa RMS / mel energies), computed
    vectorized per Arrow batch with numpy. A real DSP step swaps the byte
    interpretation for PCM decode with the same (doc → array) contract.
    """
    import numpy as np

    for pdf in batches:
        ids, counts, feats = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            x = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.float64)
            if len(x) == 0:
                ids.append(doc_id); counts.append(0); feats.append([])
                continue
            pad = (-len(x)) % window
            x = np.pad(x, (0, pad))
            frames = x.reshape(-1, window)
            rms = np.sqrt((frames * frames).mean(axis=1))
            ids.append(doc_id)
            counts.append(frames.shape[0])
            feats.append([round(float(v), 6) for v in rms])
        yield pd.DataFrame(
            {"doc_id": ids, "n_windows": pd.array(counts, dtype="int32"),
             "window_rms": feats}
        )


def audio_energy(docs: DataFrame) -> DataFrame:
    """Windowed-RMS feature arrays for every payload (map-only)."""
    return with_binary_payload(docs).mapInPandas(_audio_energy, AUDIO_SCHEMA)


@query("c05_audio_energy")  # windowed byte-RMS isn't expressible in the
# oracle dialect (no BLOB slicing); checked against an in-process recompute
# in tests/test_multimodal.py
def c05_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5d: audio-style windowed RMS energy per payload — the DSP
    feature-extraction plumbing over opaque media bytes."""
    return audio_energy(load(spark, sf_dir, "documents"))
