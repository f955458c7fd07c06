"""Multimodal media operators: audio feature extraction, video frame
sampling, and image resizing — Arrow-batched kernels over opaque binary
columns (the training-data-pipeline mandate beyond images).

Dataflow discipline matches operators/image_checks.py: decode runs
map-only on the scan partitions, the heavy ``bytes`` never shuffle, and
decode failures become row verdicts, never task failures. Sampled video
frames are re-encoded in the validator's raw image container, so they flow
directly into the existing image pipeline (digests, dedup, drift) — frame
sampling composes with every image operator.

External-library formats (mp3/mp4/...) hit the clearly-marked stub seam
``media_codec.decode_external`` (NotImplementedError); the kernel
signatures, schemas, and batch shapes are identical for real codecs.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import image_codec as icodec
from ..functions import media_codec as mcodec

AUDIO_SCHEMA = "audio_id string, bytes binary, sample_rate int, fmt string"
AUDIO_FEATURE_SCHEMA = (
    "audio_id string, decode_ok boolean, duration_s double, rms double, "
    "zero_crossing_rate double, peak double"
)
VIDEO_SCHEMA = "video_id string, bytes binary, w int, h int, n_frames int, fmt string"
FRAME_SCHEMA = "video_id string, frame_idx int, w int, h int, frame_bytes binary"
RESIZE_SCHEMA = "image_id string, bytes binary, w int, h int, fmt string"


def generate_audio(spark: SparkSession, n: int, seed: int = 42, partitions: int = 8) -> DataFrame:
    """Deterministic synthetic audio table (no external data)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ords = pdf["id"].to_numpy()
            rows = []
            for o in ords:
                payload = mcodec.synth_audio(seed, int(o))
                sr = int(np.frombuffer(payload[4:8], dtype="<u4")[0])
                rows.append((f"aud_{int(o):08d}", payload, sr, "aada"))
            yield pd.DataFrame(
                rows, columns=["audio_id", "bytes", "sample_rate", "fmt"]
            )

    return spark.range(0, n, 1, partitions).mapInPandas(gen, AUDIO_SCHEMA)


def generate_video(spark: SparkSession, n: int, seed: int = 42, partitions: int = 8) -> DataFrame:
    """Deterministic synthetic video table."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for o in pdf["id"].to_numpy():
                payload = mcodec.synth_video(seed, int(o))
                w, h, nf = mcodec.decode_video_header(payload)
                rows.append((f"vid_{int(o):08d}", payload, w, h, nf, "aadv"))
            yield pd.DataFrame(
                rows, columns=["video_id", "bytes", "w", "h", "n_frames", "fmt"]
            )

    return spark.range(0, n, 1, partitions).mapInPandas(gen, VIDEO_SCHEMA)


def audio_features(audio: DataFrame) -> DataFrame:
    """Map-only audio feature extraction: (duration, rms, zcr, peak) per
    row. Malformed payloads yield decode_ok=false rows (module contract)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for aid, payload, fmt in zip(
                pdf["audio_id"], pdf["bytes"], pdf["fmt"]
            ):
                try:
                    if fmt != "aada":
                        mcodec.decode_external(bytes(payload or b""), str(fmt))
                    dur, rms, zcr, peak = mcodec.audio_feature_vector(
                        bytes(payload or b"")
                    )
                    out.append((aid, True, dur, rms, zcr, peak))
                except (mcodec.MediaDecodeError, NotImplementedError):
                    out.append((aid, False, 0.0, 0.0, 0.0, 0.0))
            yield pd.DataFrame(
                out,
                columns=[
                    "audio_id", "decode_ok", "duration_s", "rms",
                    "zero_crossing_rate", "peak",
                ],
            )

    return audio.select("audio_id", "bytes", "fmt").mapInPandas(
        run, AUDIO_FEATURE_SCHEMA
    )


def sample_frames(video: DataFrame, every_k: int = 2) -> DataFrame:
    """Frame sampling: one output row per kept frame, re-encoded in the
    validator's raw image container so sampled frames feed the existing
    image operators (digest, dedup, drift) unchanged. Random access into
    the container means skipped frames are never decoded."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for vid, payload, fmt in zip(
                pdf["video_id"], pdf["bytes"], pdf["fmt"]
            ):
                try:
                    if fmt != "aadv":
                        mcodec.decode_external(bytes(payload or b""), str(fmt))
                    p = bytes(payload or b"")
                    w, h, nf = mcodec.decode_video_header(p)
                    for idx in range(0, nf, every_k):
                        frame = mcodec.decode_frame(p, idx)
                        rows.append(
                            (vid, idx, w, h, icodec.encode_raw(frame))
                        )
                except (mcodec.MediaDecodeError, NotImplementedError):
                    continue  # malformed video: no frames, not a task failure
            yield pd.DataFrame(
                rows,
                columns=["video_id", "frame_idx", "w", "h", "frame_bytes"],
            )

    return video.select("video_id", "bytes", "fmt").mapInPandas(run, FRAME_SCHEMA)


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor image resize: decode (any of the three real image
    codecs), index-map resample, re-encode lossless raw. Map-only; output
    metadata updated to the new dims."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for iid, payload in zip(pdf["image_id"], pdf["bytes"]):
                try:
                    px = icodec.decode(bytes(payload or b""))
                except icodec.DecodeError:
                    continue  # undecodable rows drop out (validator flags them)
                h, w = px.shape
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                resized = px[yi[:, None], xi[None, :]]
                rows.append(
                    (iid, icodec.encode_raw(resized), out_w, out_h, "raw")
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt"]
            )

    return images.select("image_id", "bytes").mapInPandas(run, RESIZE_SCHEMA)
