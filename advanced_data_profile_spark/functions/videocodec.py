"""Pure-numpy Y4M (YUV4MPEG2) video codec — the video analogue of
functions.audiocodec. Y4M is a public plain-header uncompressed
container (mjpegtools spec): one ASCII header line
``YUV4MPEG2 W<w> H<h> F<n>:<d> ... C420`` then per frame an ASCII
``FRAME`` line followed by raw YUV420 planes (Y w*h, U and V
(w/2)*(h/2)). No ffmpeg needed, so the frame-sampling path is REAL in
this container; compressed codecs (h264/vp9) remain a production
swap-in inside the same kernel.

RGB<->YUV uses the full-range BT.601 (JPEG) matrix, so neutral-chroma
frames round-trip exactly (U=V=128 -> R=G=B=Y).
"""

from __future__ import annotations

import numpy as np


def encode_y4m(frames: list[np.ndarray], fps: tuple[int, int] = (25, 1)) -> bytes:
    """frames: list of (h, w, 3) uint8 RGB; h and w must be even
    (YUV420 chroma is 2x2 subsampled)."""
    if not frames:
        raise ValueError("no frames")
    h, w, _ = frames[0].shape
    if h % 2 or w % 2:
        raise ValueError("Y4M 420 needs even dimensions")
    out = [f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C420\n".encode()]
    for fr in frames:
        if fr.shape != (h, w, 3):
            raise ValueError("inconsistent frame shapes")
        rgb = fr.astype(np.float64)
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        u = 128.0 + (rgb[:, :, 2] - y) * 0.564
        v = 128.0 + (rgb[:, :, 0] - y) * 0.713
        # 2x2 mean-pool the chroma planes
        u2 = u.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        v2 = v.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        out.append(b"FRAME\n")
        out.append(np.clip(np.round(y), 0, 255).astype(np.uint8).tobytes())
        out.append(np.clip(np.round(u2), 0, 255).astype(np.uint8).tobytes())
        out.append(np.clip(np.round(v2), 0, 255).astype(np.uint8).tobytes())
    return b"".join(out)


def _parse_header(payload: bytes) -> tuple[int, int, tuple[int, int], int]:
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    fps = (25, 1)
    for tok in payload[:nl].split(b" ")[1:]:
        if tok.startswith(b"W"):
            w = int(tok[1:])
        elif tok.startswith(b"H"):
            h = int(tok[1:])
        elif tok.startswith(b"F"):
            n, d = tok[1:].split(b":")
            fps = (int(n), int(d))
        elif tok.startswith(b"C") and tok not in (b"C420", b"C420jpeg", b"C420mpeg2"):
            raise ValueError(f"unsupported colorspace {tok!r}")
    if not w or not h:
        raise ValueError("missing W/H in Y4M header")
    return w, h, fps, nl + 1


def decode_y4m(payload: bytes, every_n: int = 1) -> tuple[tuple[int, int], list[tuple[int, np.ndarray]]]:
    """-> (fps, [(frame_idx, (h, w, 3) uint8 RGB), ...]) for every
    every_n-th frame. Frames not selected are SKIPPED without
    conversion (the seek is pointer arithmetic, no decode cost)."""
    w, h, fps, pos = _parse_header(payload)
    ysz, csz = w * h, (w // 2) * (h // 2)
    frame_bytes = ysz + 2 * csz
    frames: list[tuple[int, np.ndarray]] = []
    idx = 0
    n = len(payload)
    while pos < n:
        nl = payload.find(b"\n", pos)
        if nl < 0 or not payload[pos:nl].startswith(b"FRAME"):
            raise ValueError(f"bad FRAME marker at offset {pos}")
        data_start = nl + 1
        if data_start + frame_bytes > n:
            raise ValueError("truncated frame")
        if idx % every_n == 0:
            y = np.frombuffer(payload, np.uint8, ysz, data_start).reshape(h, w)
            u = np.frombuffer(payload, np.uint8, csz, data_start + ysz).reshape(h // 2, w // 2)
            v = np.frombuffer(payload, np.uint8, csz, data_start + ysz + csz).reshape(h // 2, w // 2)
            yf = y.astype(np.float64)
            uf = np.repeat(np.repeat(u, 2, 0), 2, 1).astype(np.float64) - 128.0
            vf = np.repeat(np.repeat(v, 2, 0), 2, 1).astype(np.float64) - 128.0
            rgb = np.stack(
                [yf + 1.403 * vf, yf - 0.344 * uf - 0.714 * vf, yf + 1.773 * uf],
                axis=2,
            )
            frames.append((idx, np.clip(np.round(rgb), 0, 255).astype(np.uint8)))
        pos = data_start + frame_bytes
        idx += 1
    return fps, frames
