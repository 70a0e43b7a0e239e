"""Multimodal binary-column operators for training-data pipelines.

Images, audio, and video ride through the engine as opaque ``binary``
columns with typed metadata (the same posture as the ``images`` table of
``BASELINE.json`` input_hint) — Spark never interprets the payload; all
decode/feature work happens in Arrow-batched ``mapInPandas`` stages so the
JVM side stays pure shuffle/scan.

What is REAL here (runs in this sandbox):
- image resize (area-mean downsample, numpy) over the real PNG / XJPG
  codec from functions/imagecodec.py;
- image feature extraction (mean/std per channel + phash);
- all Spark plumbing: schemas, batch iteration, partition lineage.

What is a clearly-marked STUB (the sandbox has no libjpeg/ffmpeg/librosa):
- audio decode (``decode_audio``) — accepts the deterministic "XPCM"
  container produced by ``synth_audio`` and raises NotImplementedError on
  anything else (swap in soundfile/librosa on a real deployment);
- video frame-sampling (``sample_frames``) — accepts the deterministic
  "XVID" container of concatenated XJPG frames produced by
  ``synth_video`` and raises NotImplementedError otherwise (swap in
  PyAV/ffmpeg). The *plumbing* — batch shape, frame-stride logic, output
  schema — is real and tested.

At 100 TB: these stages are embarrassingly parallel maps; partition sizing
is governed by payload bytes, not row counts, so callers should
``spark.sql.files.maxPartitionBytes``-size scans of payload tables and
keep payloads in their own table joined by id (never carry binary columns
through wide shuffles).
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame

from xcrawl3r_spark.functions.imagecodec import (
    decode_image,
    encode_image,
    phash64,
)

_XPCM_SIG = b"XPCM"
_XVID_SIG = b"XVID"


# ---------------------------------------------------------------------------
# deterministic synthetic payloads (test/bench fixtures; no external data)
# ---------------------------------------------------------------------------

def synth_audio(audio_id: str, n_samples: int = 8000, rate: int = 8000) -> bytes:
    """Deterministic 16-bit mono PCM in a tagged container."""
    seed = zlib.crc32(audio_id.encode()) & 0xFFFFFFFF
    t = np.arange(n_samples, dtype=np.float64)
    freq = 100.0 + (seed % 800)
    wave = np.sin(2 * np.pi * freq * t / rate) * 0.5
    pcm = (wave * 32767).astype("<i2").tobytes()
    return _XPCM_SIG + struct.pack("<II", n_samples, rate) + zlib.compress(pcm, 6)


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """STUB decoder: real implementations (soundfile/librosa) are absent
    in this sandbox; only the deterministic XPCM container is accepted."""
    if not data.startswith(_XPCM_SIG):
        raise NotImplementedError(
            "audio codec not available in sandbox (only XPCM fixture)")
    n, rate = struct.unpack("<II", data[4:12])
    pcm = np.frombuffer(zlib.decompress(data[12:]), dtype="<i2")[:n]
    return pcm.astype(np.float64) / 32767.0, rate


def synth_video(video_id: str, n_frames: int = 8, w: int = 16, h: int = 16) -> bytes:
    """Deterministic 'video': n_frames XJPG frames, length-prefixed."""
    from xcrawl3r_spark.functions.imagecodec import synth_pixels

    frames = []
    for i in range(n_frames):
        px = synth_pixels(f"{video_id}:{i}", w, h)
        enc = encode_image(px, "jpeg")
        frames.append(struct.pack("<I", len(enc)) + enc)
    return _XVID_SIG + struct.pack("<I", n_frames) + b"".join(frames)


def _iter_video_frames(data: bytes) -> Iterator[bytes]:
    if not data.startswith(_XVID_SIG):
        raise NotImplementedError(
            "video codec not available in sandbox (only XVID fixture)")
    (n,) = struct.unpack("<I", data[4:8])
    pos = 8
    for _ in range(n):
        (ln,) = struct.unpack("<I", data[pos:pos + 4])
        yield data[pos + 4:pos + 4 + ln]
        pos += 4 + ln


# ---------------------------------------------------------------------------
# numpy kernels (real)
# ---------------------------------------------------------------------------

def resize_area(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Area-mean resize HxWx3 -> out_h x out_w x 3 (exact for integer
    downscale factors, mean-pooled otherwise). Pure numpy, deterministic."""
    h, w, c = pixels.shape
    ys = (np.arange(out_h + 1) * h / out_h).round().astype(int)
    xs = (np.arange(out_w + 1) * w / out_w).round().astype(int)
    out = np.empty((out_h, out_w, c), dtype=np.float64)
    for i in range(out_h):
        for j in range(out_w):
            block = pixels[ys[i]:max(ys[i + 1], ys[i] + 1),
                           xs[j]:max(xs[j + 1], xs[j] + 1)]
            out[i, j] = block.reshape(-1, c).mean(axis=0)
    return out.round().clip(0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Spark operators (Arrow-batched mapInPandas; schemas explicit)
# ---------------------------------------------------------------------------

IMAGE_FEATURES_SCHEMA = (
    "image_id string, w int, h int, fmt string, "
    "mean_r double, mean_g double, mean_b double, std_gray double, "
    "phash long, part_id int"
)

RESIZE_SCHEMA = "image_id string, bytes binary, w int, h int, fmt string"

AUDIO_FEATURES_SCHEMA = (
    "audio_id string, n_samples int, rate int, rms double, "
    "zero_crossings int, part_id int"
)

FRAME_SAMPLE_SCHEMA = (
    "video_id string, frame_idx int, bytes binary, w int, h int, "
    "phash long, part_id int"
)


def _shipped(df: DataFrame) -> DataFrame:
    from xcrawl3r_spark.session import ship_package

    ship_package(df.sparkSession)
    return df


def image_features(images: DataFrame) -> DataFrame:
    """(image_id, bytes, fmt) -> per-channel stats + phash (real).

    Decode stays a per-row codec call (variable-length zlib); the stats
    and phash math runs numpy-batched per dimension group — the same
    vectorization as operators/images.py's verify stage."""
    from xcrawl3r_spark.functions.imagecodec import phash64_batch

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else -1
        cols = ["image_id", "w", "h", "fmt", "mean_r", "mean_g", "mean_b",
                "std_gray", "phash", "part_id"]
        for pdf in batches:
            decoded, keep = [], []
            for i, (bts, fmt) in enumerate(
                    zip(pdf["bytes"].tolist(), pdf["fmt"].tolist())):
                try:
                    decoded.append(decode_image(bts, fmt))
                    keep.append(i)
                except (ValueError, NotImplementedError):
                    continue
            groups: dict[tuple, list[int]] = {}
            for j, px in enumerate(decoded):
                groups.setdefault(px.shape[:2], []).append(j)
            ids = pdf["image_id"].tolist()
            fmts = pdf["fmt"].tolist()
            rows = []
            for (h, w), js in groups.items():
                stack = np.stack([decoded[j] for j in js])
                fl = stack.astype(np.float64)
                means = fl.mean(axis=(1, 2))            # (N, 3)
                stds = fl.mean(axis=3).std(axis=(1, 2))  # gray std per image
                phs = phash64_batch(stack)
                for k, j in enumerate(js):
                    i = keep[j]
                    rows.append((ids[i], w, h, fmts[i],
                                 float(means[k, 0]), float(means[k, 1]),
                                 float(means[k, 2]), float(stds[k]),
                                 int(phs[k]), pid))
            yield pd.DataFrame(rows, columns=cols)

    return _shipped(images).select("image_id", "bytes", "fmt").mapInPandas(
        gen, IMAGE_FEATURES_SCHEMA)


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """(image_id, bytes, fmt) -> re-encoded payloads at out_w x out_h
    (real: decode -> area-mean resize -> encode, all in the Arrow batch)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    px = decode_image(r.bytes, r.fmt)
                except (ValueError, NotImplementedError):
                    continue
                small = resize_area(px, out_w, out_h)
                rows.append((r.image_id, encode_image(small, r.fmt),
                             out_w, out_h, r.fmt))
            yield pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h", "fmt"])

    return _shipped(images).select("image_id", "bytes", "fmt").mapInPandas(
        gen, RESIZE_SCHEMA)


def audio_features(audio: DataFrame) -> DataFrame:
    """(audio_id, bytes) -> rms + zero-crossing count. Decode is the
    sandbox STUB (XPCM only); feature math and plumbing are real."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else -1
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    wave, rate = decode_audio(r.bytes)
                except NotImplementedError:
                    continue
                zc = int(np.count_nonzero(np.diff(np.signbit(wave))))
                rows.append((r.audio_id, len(wave), rate,
                             float(np.sqrt((wave ** 2).mean())), zc, pid))
            yield pd.DataFrame(rows, columns=[
                "audio_id", "n_samples", "rate", "rms", "zero_crossings",
                "part_id"])

    return _shipped(audio).select("audio_id", "bytes").mapInPandas(
        gen, AUDIO_FEATURES_SCHEMA)


def sample_frames(videos: DataFrame, stride: int = 2) -> DataFrame:
    """(video_id, bytes) -> every ``stride``-th frame as its own payload
    row. Container parse is the sandbox STUB (XVID only); the stride
    logic, per-frame decode and fan-out plumbing are real."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else -1
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    frames = list(_iter_video_frames(r.bytes))
                except NotImplementedError:
                    continue
                for idx in range(0, len(frames), stride):
                    px = decode_image(frames[idx], "jpeg")
                    rows.append((r.video_id, idx, frames[idx],
                                 px.shape[1], px.shape[0], phash64(px), pid))
            yield pd.DataFrame(rows, columns=[
                "video_id", "frame_idx", "bytes", "w", "h", "phash",
                "part_id"])

    return _shipped(videos).select("video_id", "bytes").mapInPandas(
        gen, FRAME_SAMPLE_SCHEMA)
