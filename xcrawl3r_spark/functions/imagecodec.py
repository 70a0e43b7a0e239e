"""Deterministic image codec + perceptual hash + PSNR.

The sandbox has no PIL/libjpeg, so this module provides:

- a REAL minimal PNG encoder/decoder (8-bit RGB, zlib, filter 0) — the
  lossless path is a genuine codec round-trip;
- a clearly-marked deterministic stand-in for JPEG ("XJPG"): uniform
  quantization of RGB samples (step Q=4 -> max abs error 2 -> PSNR ~42-48 dB)
  + zlib. It exists to exercise the lossy-invariant plumbing
  (PSNR >= 40 dB per BASELINE.json input_hint); swap `encode_jpeg/decode_jpeg`
  for PIL when available (import-gated below).

All functions are numpy-vectorized and deterministic (no wall clock, no RNG
state) so checkpoint resume stays bit-identical.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

try:  # pragma: no cover - PIL absent in this sandbox
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_XJPG_SIG = b"XJPG"
_JPEG_Q = 4  # quantization step; max abs err = Q/2 -> PSNR >= 20*log10(255/2) ~ 42 dB


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode HxWx3 uint8 -> real PNG bytes (color type 2, filter 0)."""
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[r].tobytes() for r in range(h))
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos, idat, w, h = len(_PNG_SIG), b"", 0, 0
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bit, ctype = struct.unpack(">IIBB", payload[:10])
            if bit != 8 or ctype != 2:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = w * 3 + 1
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    if (rows[:, 0] != 0).any():
        raise ValueError("unsupported PNG filter")
    return rows[:, 1:].reshape(h, w, 3).copy()


def encode_jpeg(pixels: np.ndarray) -> bytes:
    """DETERMINISTIC JPEG STAND-IN (no libjpeg in sandbox): quantize + zlib.

    Not a real JPEG bitstream; the container tag makes that explicit. The
    decode loses at most Q/2 per sample, keeping PSNR >= 40 dB as the lossy
    invariant requires.
    """
    h, w, _ = pixels.shape
    q = (pixels.astype(np.int16) + _JPEG_Q // 2) // _JPEG_Q
    q = np.clip(q, 0, 255 // _JPEG_Q).astype(np.uint8)
    return _XJPG_SIG + struct.pack(">IIB", w, h, _JPEG_Q) + zlib.compress(q.tobytes(), 6)


def decode_jpeg(data: bytes) -> np.ndarray:
    if not data.startswith(_XJPG_SIG):
        raise ValueError("not an XJPG")
    w, h, q = struct.unpack(">IIB", data[4:13])
    arr = np.frombuffer(zlib.decompress(data[13:]), dtype=np.uint8)
    return (arr.reshape(h, w, 3).astype(np.int16) * q).clip(0, 255).astype(np.uint8)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt in ("jpeg", "jpg"):
        return decode_jpeg(data)
    raise NotImplementedError(f"decoder for format {fmt!r} not available in sandbox")


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(pixels)
    if fmt in ("jpeg", "jpg"):
        return encode_jpeg(pixels)
    raise NotImplementedError(f"encoder for format {fmt!r} not available in sandbox")


def _phash_block_sums(gray_sum: np.ndarray) -> np.ndarray:
    """(… , H, W) int64 channel-sum image -> (… , 8, 8) int64 block sums
    (edge-repeat padded to multiples of 8)."""
    h, w = gray_sum.shape[-2], gray_sum.shape[-1]
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        pad = [(0, 0)] * (gray_sum.ndim - 2) + [(0, ph), (0, pw)]
        gray_sum = np.pad(gray_sum, pad, mode="edge")
    bh, bw = gray_sum.shape[-2] // 8, gray_sum.shape[-1] // 8
    lead = gray_sum.shape[:-2]
    return gray_sum.reshape(*lead, 8, bh, 8, bw).sum(
        axis=(-3, -1), dtype=np.int64)


def phash64(pixels: np.ndarray) -> int:
    """64-bit average perceptual hash: 8x8 block means of the channel-sum
    image, bit set where a block's mean exceeds the global mean. Signed
    int64 (Spark LongType friendly).

    INTEGER-EXACT by design: the mean comparison is the cross-multiplied
    block-sum test ``block_sum * 64 > total_sum`` over exact int64 sums —
    no float means. A float formulation is NOT deterministic for
    tie-prone images: numpy's SIMD mean is last-ulp sensitive to buffer
    alignment, and a block mean that ties the global mean can flip bits
    between processes (observed in the wild: the same PNG bytes hashed
    differently on driver vs executor). Bound: total_sum < 765*H*W, so
    ``*64`` stays far inside int64 for any real image."""
    s = pixels.astype(np.int64).sum(axis=2)
    blocks = _phash_block_sums(s)
    bits = (blocks.astype(np.int64) * 64 > blocks.sum()).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def phash64_batch(stack: np.ndarray) -> np.ndarray:
    """Vectorized ``phash64`` over an (N, H, W, 3) uint8 stack -> int64[N].

    Bit-identical to the per-image function (same exact-integer block-sum
    comparison, same MSB-first bit packing — integer arithmetic makes
    that equality unconditional, alignment and batching included); exists
    so the Arrow verify/feature stages can hash a whole equal-dimension
    batch in one numpy pass instead of a row-at-a-time Python loop."""
    n = stack.shape[0]
    s = stack.astype(np.int64).sum(axis=3)
    blocks = _phash_block_sums(s)                      # (N, 8, 8) int64
    totals = blocks.sum(axis=(1, 2))[:, None, None]
    bits = blocks * 64 > totals
    weights = np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64)
    v = (bits.reshape(n, 64).astype(np.uint64) * weights).sum(
        axis=1, dtype=np.uint64)
    return v.view(np.int64)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (hamming weight) for uint64/int64
    arrays — numpy 1.x has no bit_count ufunc."""
    return (
        np.unpackbits(np.ascontiguousarray(x).view(np.uint8))
        .reshape(x.shape[0], 64).sum(axis=1).astype(np.int64)
    )


def psnr_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized PSNR over matching (N, H, W, 3) stacks -> float64[N]
    (inf where identical), same arithmetic as ``psnr``."""
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean(
        axis=(1, 2, 3))
    out = np.full(mse.shape, np.inf)
    nz = mse > 0
    out[nz] = 20.0 * np.log10(255.0) - 10.0 * np.log10(mse[nz])
    return out


def synth_pixels_batch(ids, w: int, h: int) -> np.ndarray:
    """Vectorized ``synth_pixels`` for N ids at one (w, h) ->
    (N, h, w, 3) uint8, bit-identical to the per-id function (integer
    arithmetic throughout — no float intermediates)."""
    seeds = np.array([zlib.crc32(i.encode()) & 0xFFFFFFFF for i in ids],
                     dtype=np.int64)
    yy, xx = np.mgrid[0:h, 0:w]
    gx = xx * 255 // max(w - 1, 1)
    gy = yy * 255 // max(h - 1, 1)
    r = (gx[None] + (seeds % 97)[:, None, None]) % 256
    g = (gy[None] + (seeds % 89)[:, None, None]) % 256
    b = ((xx + yy)[None] + seeds[:, None, None]) % 256
    return np.stack([r, g, b], axis=3).astype(np.uint8)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(20.0 * np.log10(255.0) - 10.0 * np.log10(mse))


def synth_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic per-id pixel pattern: seeded gradient + id-derived
    stripes (FIXTURES.md §3). Pure function of (image_id, w, h)."""
    seed = zlib.crc32(image_id.encode()) & 0xFFFFFFFF
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 // max(w - 1, 1) + seed % 97) % 256
    g = (yy * 255 // max(h - 1, 1) + seed % 89) % 256
    b = ((xx + yy + seed) % 256)
    return np.stack([r, g, b], axis=2).astype(np.uint8)
