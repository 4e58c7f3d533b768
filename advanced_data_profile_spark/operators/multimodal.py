"""Multimodal column operators: decode / feature-extract / resize /
frame-sample over opaque binary payloads with typed metadata.

Every modality is REAL with pure-numpy codecs for public uncompressed
formats: images (raw/BMP, functions.imagecodec), audio (RIFF/WAVE PCM,
functions.audiocodec) and video (Y4M/YUV4MPEG2, functions.videocodec).
Compressed codecs (jpeg/mp3/h264) are one-function production swap-ins
inside the same kernels — the Spark plumbing (schema, Arrow batching,
pruned columns, ok=False error rows) is identical.

All kernels are mapInPandas over pruned column sets: a featurize pass
reads ONLY (id, bytes, w, h, fmt) — Catalyst never drags caption or
phash through the Arrow channel.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from advanced_data_profile_spark.functions.imagecodec import decode

IMAGE_FEATURES_SCHEMA = (
    "image_id string, mean_r double, mean_g double, mean_b double, "
    "std_gray double, brightness double, ok boolean"
)

RESIZE_SCHEMA = "image_id string, bytes binary, w int, h int, ok boolean"

AUDIO_FEATURES_SCHEMA = (
    "clip_id string, duration_sec double, rms double, zero_crossings bigint, ok boolean"
)

FRAME_SAMPLE_SCHEMA = (
    "video_id string, frame_idx int, bytes binary, w int, h int, ok boolean"
)


def image_features(images: DataFrame) -> DataFrame:
    """Per-channel means, gray stddev, brightness — decoded per Arrow
    batch. The real multimodal feature-extraction path."""
    src = images.select("image_id", "bytes", "w", "h", "fmt")

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in
                   ("image_id", "mean_r", "mean_g", "mean_b", "std_gray",
                    "brightness", "ok")}
            for iid, payload, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                out["image_id"].append(iid)
                try:
                    px = decode(payload, int(w), int(h), fmt).astype(np.float64)
                    gray = px.mean(axis=2)
                    out["mean_r"].append(float(px[:, :, 0].mean()))
                    out["mean_g"].append(float(px[:, :, 1].mean()))
                    out["mean_b"].append(float(px[:, :, 2].mean()))
                    out["std_gray"].append(float(gray.std()))
                    out["brightness"].append(float(gray.mean() / 255.0))
                    out["ok"].append(True)
                except (ValueError, TypeError):
                    for k in ("mean_r", "mean_g", "mean_b", "std_gray", "brightness"):
                        out[k].append(None)
                    out["ok"].append(False)
            yield pd.DataFrame(out)

    return src.mapInPandas(fn, schema=IMAGE_FEATURES_SCHEMA)


def resize_images(images: DataFrame, target: int = 8) -> DataFrame:
    """Nearest-neighbour resize to target x target, re-encoded raw —
    pure-numpy, real for raw/bmp payloads."""
    src = images.select("image_id", "bytes", "w", "h", "fmt")

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for iid, payload, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                try:
                    px = decode(payload, int(w), int(h), fmt)
                    ys = (np.arange(target) * px.shape[0] // target)
                    xs = (np.arange(target) * px.shape[1] // target)
                    small = px[np.ix_(ys, xs)]
                    rows.append((iid, small.tobytes(), target, target, True))
                except (ValueError, TypeError):
                    rows.append((iid, None, None, None, False))
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "ok"]
            )

    return src.mapInPandas(fn, schema=RESIZE_SCHEMA)


def audio_features(clips: DataFrame, id_col: str = "clip_id",
                   bytes_col: str = "bytes") -> DataFrame:
    """REAL audio featurize for WAV (RIFF PCM) payloads — duration,
    RMS, zero crossings — via the pure-numpy functions.audiocodec
    parser (public spec, no soundfile/librosa needed). Compressed
    codecs are a one-function swap inside this same kernel; undecodable
    payloads produce ok=False rows, never task failures."""
    from advanced_data_profile_spark.functions.audiocodec import decode_wav

    src = clips.select(id_col, bytes_col)

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for cid, payload in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    rate, x = decode_wav(payload)
                    rows.append((
                        cid,
                        float(len(x) / rate),
                        float(np.sqrt(np.mean(x**2))) if len(x) else 0.0,
                        int(np.count_nonzero(np.diff(np.signbit(x)))),
                        True,
                    ))
                except (ValueError, TypeError):
                    rows.append((cid, None, None, None, False))
            yield pd.DataFrame(
                rows, columns=["clip_id", "duration_sec", "rms",
                               "zero_crossings", "ok"]
            )

    return src.mapInPandas(fn, schema=AUDIO_FEATURES_SCHEMA)



def video_frame_sample(videos: DataFrame, id_col: str = "video_id",
                       bytes_col: str = "bytes",
                       every_n: int = 10) -> DataFrame:
    """REAL frame sampling for Y4M (YUV4MPEG2) payloads — a public
    uncompressed container parsed with pure numpy
    (functions.videocodec); unsampled frames are SKIPPED by pointer
    arithmetic, never converted. Sampled frames re-encode as raw RGB
    (decode-able by functions.imagecodec). Compressed containers
    (h264/vp9 via pyav/ffmpeg) are a one-function swap inside this same
    kernel; undecodable payloads yield ok=False rows."""
    from advanced_data_profile_spark.functions.videocodec import decode_y4m

    src = videos.select(id_col, bytes_col)

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for vid, payload in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    _, frames = decode_y4m(payload, every_n=every_n)
                    if not frames:
                        raise ValueError("no frames")
                    for idx, rgb in frames:
                        h, w, _ = rgb.shape
                        rows.append((vid, idx, rgb.tobytes(), w, h, True))
                except (ValueError, TypeError):
                    rows.append((vid, None, None, None, None, False))
            yield pd.DataFrame(
                rows, columns=["video_id", "frame_idx", "bytes", "w", "h", "ok"]
            )

    return src.mapInPandas(fn, schema=FRAME_SAMPLE_SCHEMA)

