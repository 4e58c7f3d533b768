"""Pure-numpy image payload codec for the fixture formats.

The sandbox has no PIL/turbojpeg (SURVEY.md §2.8), so fixture payloads
use two losslessly numpy-decodable formats:

- ``raw``: exactly w*h*3 bytes of RGB, row-major.
- ``bmp``: a real (minimal) 24-bit BMP — 14-byte file header, 40-byte
  BITMAPINFOHEADER, BGR pixel rows bottom-up padded to 4 bytes. This is
  the standard public BMP layout, parsed here with int.from_bytes +
  numpy slicing (no image library).

A production deployment swaps ``decode`` for a PIL/turbojpeg call
inside the same mapInPandas kernel; the Spark-side plumbing (schema,
Arrow batching, partitioning) is identical.
"""

from __future__ import annotations

import hashlib

import numpy as np


def encode_raw(pixels: np.ndarray) -> bytes:
    """pixels: (h, w, 3) uint8 RGB."""
    return pixels.tobytes()


def decode_raw(payload: bytes, w: int, h: int) -> np.ndarray:
    expected = w * h * 3
    if w <= 0 or h <= 0 or len(payload) != expected:
        raise ValueError(f"raw payload size {len(payload)} != {expected}")
    return np.frombuffer(payload, dtype=np.uint8).reshape(h, w, 3)


def encode_bmp(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    off = 14 + 40
    header = (
        b"BM"
        + (off + img_size).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + img_size.to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    bgr = pixels[::-1, :, ::-1]  # bottom-up, BGR
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return header + rows.tobytes()


def decode_bmp(payload: bytes, w: int, h: int) -> np.ndarray:
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(payload[10:14], "little")
    bw = int.from_bytes(payload[18:22], "little", signed=True)
    bh = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    if bpp != 24:
        raise ValueError(f"unsupported bpp {bpp}")
    if bw != w or bh != h:
        raise ValueError(f"BMP header dims ({bw},{bh}) != declared ({w},{h})")
    row_size = (bw * 3 + 3) & ~3
    need = off + row_size * bh
    if len(payload) < need:
        raise ValueError(f"BMP payload truncated: {len(payload)} < {need}")
    data = np.frombuffer(payload, dtype=np.uint8, count=row_size * bh, offset=off)
    rows = data.reshape(bh, row_size)[:, : bw * 3].reshape(bh, bw, 3)
    # top-down RGB as a zero-copy strided VIEW — validation/stats read
    # it fine; callers needing contiguous memory copy explicitly
    return rows[::-1, :, ::-1]


DECODERS = {"raw": decode_raw, "bmp": decode_bmp}
KNOWN_FORMATS = frozenset(DECODERS)


def decode(payload: bytes | None, w: int, h: int, fmt: str | None) -> np.ndarray:
    if payload is None:
        raise ValueError("null payload")
    if fmt not in DECODERS:
        raise ValueError(f"unknown fmt {fmt!r}")
    return DECODERS[fmt](payload, w, h)


def psnr(a: np.ndarray, b: np.ndarray, cap: float = 99.0) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images;
    identical images return `cap` (instead of inf).

    uint8 inputs use int16-diff / int64-accumulate arithmetic — exact
    (no float rounding) and 4x less memory traffic than the float64
    path, which matters in the bandwidth-bound verify kernel; other
    dtypes fall back to float64."""
    if a.shape != b.shape:
        return 0.0
    if a.dtype == np.uint8 and b.dtype == np.uint8:
        d = a.astype(np.int16) - b.astype(np.int16)
        sse = int(np.sum(np.square(d, dtype=np.int32), dtype=np.int64))
        if sse == 0:
            return cap
        mse = sse / a.size
    else:
        mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
        if mse == 0.0:
            return cap
    return min(cap, 10.0 * np.log10(255.0 * 255.0 / mse))


def pixel_hash(pixels: np.ndarray) -> int:
    """Deterministic 63-bit (non-negative) content hash of the pixel
    buffer — the fixture's `phash` (a stand-in for a perceptual hash;
    same type and referential semantics). Non-negative by construction
    so planted orphan phashes (negative) are disjoint from legit ones."""
    d = hashlib.blake2b(pixels.tobytes(), digest_size=8).digest()
    return int.from_bytes(d, "big", signed=False) & ((1 << 63) - 1)


def stub_perceptual_phash(pixels: np.ndarray) -> int:
    """Difference-hash style perceptual hash over an 8x9 mean-pooled
    grayscale grid (public dHash construction) — numpy only."""
    h, w, _ = pixels.shape
    gray = pixels.astype(np.float64).mean(axis=2)
    ys = np.linspace(0, h, 9, dtype=int)
    xs = np.linspace(0, w, 10, dtype=int)
    pooled = np.empty((8, 9))
    for i in range(8):
        for j in range(9):
            block = gray[ys[i]:max(ys[i] + 1, ys[i + 1]), xs[j]:max(xs[j] + 1, xs[j + 1])]
            pooled[i, j] = block.mean()
    bits = (pooled[:, 1:] > pooled[:, :-1]).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 63) if v >= (1 << 63) else v
