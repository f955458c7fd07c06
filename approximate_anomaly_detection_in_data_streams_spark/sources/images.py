"""Deterministic distributed generator for the Iceberg-shaped image+caption
table (BASELINE.json input_hint):

    image_id string, bytes binary, w int, h int, fmt string,
    caption string, phash long

Generation is a pure function of (config, ordinal): ``spark.range`` feeds
``mapInPandas`` and every row is derived independently — no driver-side
data, no cross-partition state, linear scale-out to any row count (the
10^12-row shape at small n). Violations are *planted* at configurable
rates so validator tests have exact ground truth:

  * near-duplicates (re-encode of an earlier image -> same phash),
  * corrupt bytes (truncation -> DecodeError),
  * caption mismatches (caption text of a different ordinal),
  * duplicate image_ids,
  * isolated point anomalies (large per-row brightness excursions — what
    the distance-based windowed detector flags),
  * a *sustained* drifted ordinal range (uniform brightness shift — a
    distribution change that self-neighbors inside the window, so it is
    correctly NOT a distance outlier; the per-slide drift check catches it),
  * skewed fmt distribution (hot "raw" key — north_rule skew axis).

``generate_reference`` emits the uncorrupted truth rows (ref bytes +
caption) for the per-row invariant join (decoded-pixel PSNR >= 40 dB +
caption equality, per input_hint).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..functions import image_codec as codec

SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)
LABELED_SCHEMA = SCHEMA + (
    ", _ordinal long, _is_dup boolean, _is_corrupt boolean, "
    "_caption_bad boolean, _is_drifted boolean, _is_anomaly boolean"
)
REF_SCHEMA = "image_id string, ref_bytes binary, ref_caption string, ref_phash long"

_ADJ = ["quiet", "bright", "old", "tiny", "vast", "warm", "sharp", "pale"]
_NOUN = ["harbor", "forest", "street", "window", "garden", "bridge", "field", "tower"]
_SIZES = [(16, 16), (32, 32), (32, 16), (64, 32)]


@dataclass(frozen=True)
class ImageTableConfig:
    n: int = 2000
    seed: int = 42
    partitions: int = 16
    dup_frac: float = 0.02
    corrupt_frac: float = 0.01
    caption_bad_frac: float = 0.01
    id_dup_frac: float = 0.005
    drift_start_frac: float = 0.8
    drift_end_frac: float = 0.9
    drift_brightness: int = 60
    anomaly_frac: float = 0.012
    # skewed fmt mix: hot "raw" key plus a rare stubbed codec
    p_raw: float = 0.70
    p_qnt: float = 0.29
    size_scale: int = 1  # multiplies base w/h (bench: heavier per-image work)


def caption_for(seed: int, idx: int) -> str:
    rng = np.random.default_rng((seed * 31 + idx * 7 + 1) & 0xFFFFFFFF)
    a = _ADJ[int(rng.integers(len(_ADJ)))]
    b = _NOUN[int(rng.integers(len(_NOUN)))]
    return f"a photo of a {a} {b} ({idx})"


def size_for(seed: int, idx: int, scale: int = 1) -> tuple[int, int]:
    rng = np.random.default_rng((seed * 17 + idx * 3 + 2) & 0xFFFFFFFF)
    w, h = _SIZES[int(rng.integers(len(_SIZES)))]
    return w * scale, h * scale


def _true_pixels(
    cfg: ImageTableConfig, idx: int
) -> tuple[np.ndarray, int, bool]:
    """Uncorrupted pixels + source ordinal + anomaly flag.

    Dup rows copy an earlier ordinal verbatim. Anomalies get a large,
    per-row-varying brightness excursion (isolated in feature space);
    drifted rows get the uniform segment shift."""
    rng = np.random.default_rng((cfg.seed * 13 + idx * 11 + 3) & 0xFFFFFFFF)
    src = idx
    if idx > 0 and rng.random() < cfg.dup_frac:
        src = int(rng.integers(0, idx))
        w, h = size_for(cfg.seed, src, cfg.size_scale)
        return codec.synth_pixels(cfg.seed, src, w, h), src, False
    w, h = size_for(cfg.seed, src, cfg.size_scale)
    lo = int(cfg.n * cfg.drift_start_frac)
    hi = int(cfg.n * cfg.drift_end_frac)
    brightness = cfg.drift_brightness if lo <= idx < hi else 0
    is_anomaly = rng.random() < cfg.anomaly_frac
    if is_anomaly:
        sign = 1 if rng.random() < 0.5 else -1
        brightness = sign * int(90 + rng.random() * 80)
    return codec.synth_pixels(cfg.seed, src, w, h, brightness), src, is_anomaly


def _fmt_for(cfg: ImageTableConfig, idx: int) -> str:
    rng = np.random.default_rng((cfg.seed * 19 + idx * 5 + 4) & 0xFFFFFFFF)
    u = rng.random()
    if u < cfg.p_raw:
        return "raw"
    if u < cfg.p_raw + cfg.p_qnt:
        return "qnt"
    return "jpeg"


def _encode(fmt: str, pixels: np.ndarray) -> bytes:
    if fmt == "raw":
        return codec.encode_raw(pixels)
    if fmt == "qnt":
        return codec.encode_qnt(pixels)
    return codec.encode_jpeg(pixels)


def _row(cfg: ImageTableConfig, idx: int) -> dict:
    pixels, src, is_anomaly = _true_pixels(cfg, idx)
    h, w = pixels.shape
    fmt = _fmt_for(cfg, idx)
    data = _encode(fmt, pixels)
    phash = codec.average_hash(codec.decode(data))

    rng = np.random.default_rng((cfg.seed * 23 + idx * 29 + 5) & 0xFFFFFFFF)
    is_corrupt = rng.random() < cfg.corrupt_frac
    if is_corrupt:
        data = data[: max(len(data) // 2, 4)]
    caption_bad = rng.random() < cfg.caption_bad_frac
    caption = caption_for(cfg.seed, idx + 999_983 if caption_bad else idx)
    id_dup = idx > 0 and rng.random() < cfg.id_dup_frac
    image_id = f"img-{cfg.seed}-{(idx - 1) if id_dup else idx:012d}"
    lo = int(cfg.n * cfg.drift_start_frac)
    hi = int(cfg.n * cfg.drift_end_frac)
    return {
        "image_id": image_id,
        "bytes": data,
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": caption,
        "phash": phash,
        "_ordinal": idx,
        "_is_dup": src != idx,
        "_is_corrupt": is_corrupt,
        "_caption_bad": caption_bad,
        "_is_drifted": (lo <= idx < hi) and src == idx and not is_anomaly,
        "_is_anomaly": is_anomaly,
    }


def generate_images(
    spark: SparkSession, cfg: ImageTableConfig, include_labels: bool = False
) -> DataFrame:
    """The main table. ``include_labels=True`` adds ``_``-prefixed truth
    columns for tests; validators must ignore them."""
    schema = LABELED_SCHEMA if include_labels else SCHEMA
    label_cols = [
        "_ordinal", "_is_dup", "_is_corrupt", "_caption_bad",
        "_is_drifted", "_is_anomaly",
    ]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_row(cfg, int(i)) for i in pdf["id"]]
            out = pd.DataFrame(rows)
            if not include_labels:
                out = out.drop(columns=label_cols)
            yield out

    return spark.range(0, cfg.n, 1, cfg.partitions).mapInPandas(gen, schema)


def reference_row(cfg: ImageTableConfig, idx: int) -> dict:
    """One truth row of the reference table — part of the INPUT-DATA
    definition (what ``generate_reference`` writes), shared with the
    planted-truth oracle which replays the generator."""
    r = _row(cfg, idx)
    pixels, _src, _anom = _true_pixels(cfg, idx)
    return {
        "image_id": r["image_id"],
        "ref_bytes": codec.encode_raw(pixels),
        "ref_caption": caption_for(cfg.seed, idx),
        "ref_phash": codec.average_hash(pixels),
    }


def generate_reference(spark: SparkSession, cfg: ImageTableConfig) -> DataFrame:
    """Truth table for the per-row invariant: reference bytes are always the
    lossless encoding of the *uncorrupted, correct-ordinal* pixels, plus
    the correct caption and phash. Keyed by the row's written image_id (so
    planted id-dups join both claimant rows — both get checked)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame([reference_row(cfg, int(i)) for i in pdf["id"]])

    return spark.range(0, cfg.n, 1, cfg.partitions).mapInPandas(gen, REF_SCHEMA)
