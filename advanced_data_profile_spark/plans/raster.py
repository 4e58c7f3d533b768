"""Pure-stdlib raster artifacts: a minimal PNG encoder (zlib + struct
+ crc32 — no imaging libraries in this environment) plus deterministic
renderers for the two reference artifacts that were previously emitted
as data/SVG only: the word-cloud image (reference Profiler.py:812-851
renders a word-cloud PNG data-URI into the HTML report) and a raster
histogram. Everything is driver-side over ALREADY-AGGREGATED rows
(word frequencies, bin counts) — raster rendering never touches
distributed data, so scale is irrelevant here by construction.

Text is drawn with the classic 5x7 dot-matrix glyph set (the public
HD44780-style patterns), nearest-neighbor upscaled per word weight —
deterministic layout, no randomness, identical bytes across runs.
"""

from __future__ import annotations

import base64
import struct
import zlib

import numpy as np

# ---------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(rgb: np.ndarray) -> bytes:
    """RGB uint8 (h, w, 3) -> PNG bytes. Color type 2, bit depth 8,
    filter 0 per scanline, single IDAT. Deterministic (zlib level 9,
    no timestamps)."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError(f"expected uint8 (h, w, 3), got {rgb.dtype} {rgb.shape}")
    h, w = rgb.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 9))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Inverse of encode_png for the subset it emits (color type 2,
    depth 8, filter 0 rows) — the test-side verifier; raises on
    anything else."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(">IIBBBBB", body)
            if (depth, ctype, comp, filt, inter) != (8, 2, 0, 0, 0):
                raise ValueError("unsupported PNG subset")
        elif tag == b"IDAT":
            idat += body
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = w * 3 + 1
    rows = []
    for y in range(h):
        row = raw[y * stride : (y + 1) * stride]
        if row[0] != 0:
            raise ValueError("unsupported filter")
        rows.append(np.frombuffer(row[1:], dtype=np.uint8).reshape(w, 3))
    return np.stack(rows)


def png_data_uri(rgb: np.ndarray) -> str:
    return "data:image/png;base64," + base64.b64encode(encode_png(rgb)).decode()


# ------------------------------------------------------------- 5x7 font

# Classic 5x7 dot-matrix glyphs (HD44780-ROM-style public patterns),
# one int per row, bit 4 = leftmost pixel.
FONT_5X7: dict[str, tuple[int, ...]] = {
    "A": (0x0E, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    "B": (0x1E, 0x11, 0x11, 0x1E, 0x11, 0x11, 0x1E),
    "C": (0x0E, 0x11, 0x10, 0x10, 0x10, 0x11, 0x0E),
    "D": (0x1E, 0x11, 0x11, 0x11, 0x11, 0x11, 0x1E),
    "E": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x1F),
    "F": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x10),
    "G": (0x0E, 0x11, 0x10, 0x10, 0x13, 0x11, 0x0F),
    "H": (0x11, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    "I": (0x0E, 0x04, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "J": (0x07, 0x02, 0x02, 0x02, 0x02, 0x12, 0x0C),
    "K": (0x11, 0x12, 0x14, 0x18, 0x14, 0x12, 0x11),
    "L": (0x10, 0x10, 0x10, 0x10, 0x10, 0x10, 0x1F),
    "M": (0x11, 0x1B, 0x15, 0x15, 0x11, 0x11, 0x11),
    "N": (0x11, 0x11, 0x19, 0x15, 0x13, 0x11, 0x11),
    "O": (0x0E, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "P": (0x1E, 0x11, 0x11, 0x1E, 0x10, 0x10, 0x10),
    "Q": (0x0E, 0x11, 0x11, 0x11, 0x15, 0x12, 0x0D),
    "R": (0x1E, 0x11, 0x11, 0x1E, 0x14, 0x12, 0x11),
    "S": (0x0F, 0x10, 0x10, 0x0E, 0x01, 0x01, 0x1E),
    "T": (0x1F, 0x04, 0x04, 0x04, 0x04, 0x04, 0x04),
    "U": (0x11, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "V": (0x11, 0x11, 0x11, 0x11, 0x11, 0x0A, 0x04),
    "W": (0x11, 0x11, 0x11, 0x15, 0x15, 0x15, 0x0A),
    "X": (0x11, 0x11, 0x0A, 0x04, 0x0A, 0x11, 0x11),
    "Y": (0x11, 0x11, 0x11, 0x0A, 0x04, 0x04, 0x04),
    "Z": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x10, 0x1F),
    "0": (0x0E, 0x11, 0x13, 0x15, 0x19, 0x11, 0x0E),
    "1": (0x04, 0x0C, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "2": (0x0E, 0x11, 0x01, 0x02, 0x04, 0x08, 0x1F),
    "3": (0x1F, 0x02, 0x04, 0x02, 0x01, 0x11, 0x0E),
    "4": (0x02, 0x06, 0x0A, 0x12, 0x1F, 0x02, 0x02),
    "5": (0x1F, 0x10, 0x1E, 0x01, 0x01, 0x11, 0x0E),
    "6": (0x06, 0x08, 0x10, 0x1E, 0x11, 0x11, 0x0E),
    "7": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x08, 0x08),
    "8": (0x0E, 0x11, 0x11, 0x0E, 0x11, 0x11, 0x0E),
    "9": (0x0E, 0x11, 0x11, 0x0F, 0x01, 0x02, 0x0C),
    " ": (0, 0, 0, 0, 0, 0, 0),
}

GLYPH_W, GLYPH_H, GLYPH_GAP = 5, 7, 1


def draw_text(
    canvas: np.ndarray, x: int, y: int, text: str, scale: int,
    color: tuple[int, int, int],
) -> int:
    """Draw text (uppercased; unknown chars as space) at (x, y) with
    integer nearest-neighbor scale; returns the x just past the text.
    Clips at canvas edges."""
    h, w = canvas.shape[:2]
    cx = x
    for ch in text.upper():
        glyph = FONT_5X7.get(ch, FONT_5X7[" "])
        for gy, bits in enumerate(glyph):
            for gx in range(GLYPH_W):
                if bits & (1 << (GLYPH_W - 1 - gx)):
                    y0, y1 = y + gy * scale, y + (gy + 1) * scale
                    x0, x1 = cx + gx * scale, cx + (gx + 1) * scale
                    canvas[max(0, y0):max(0, min(h, y1)),
                           max(0, x0):max(0, min(w, x1))] = color
        cx += (GLYPH_W + GLYPH_GAP) * scale
    return cx


def text_width(text: str, scale: int) -> int:
    return len(text) * (GLYPH_W + GLYPH_GAP) * scale


# a small fixed palette (rank-cycled) — same spirit as the reference's
# matplotlib colormap, but deterministic with no dependency
_PALETTE: list[tuple[int, int, int]] = [
    (31, 78, 121), (160, 54, 35), (54, 110, 52), (100, 60, 130),
    (165, 120, 25), (25, 110, 120), (120, 50, 90), (70, 70, 70),
]


def render_word_cloud(
    freqs: list[tuple[str, int]],
    width: int = 480,
    max_words: int = 40,
    max_scale: int = 4,
) -> np.ndarray:
    """Deterministic word-cloud raster from (word, count) rows (the
    word_frequencies aggregate): words sorted by count desc then word,
    glyph scale proportional to count/max, greedy left-to-right row
    layout (wrap when the row fills), rank-cycled palette, white
    background. Returns RGB uint8 (h, width, 3)."""
    rows = sorted(freqs, key=lambda t: (-int(t[1]), str(t[0])))[:max_words]
    if not rows:
        return np.full((24, width, 3), 255, dtype=np.uint8)
    top = max(int(c) for _, c in rows)
    pad = 6
    # plan layout first (canvas height depends on it)
    placed = []  # (word, scale, color, x, y)
    x, y, row_h = pad, pad, 0
    for rank, (word, cnt) in enumerate(rows):
        word = str(word)[:24] or "?"
        scale = max(1, round(max_scale * int(cnt) / top))
        tw = text_width(word, scale)
        if x > pad and x + tw > width - pad:
            x, y = pad, y + row_h + pad
            row_h = 0
        placed.append((word, scale, _PALETTE[rank % len(_PALETTE)], x, y))
        x += tw + pad * scale
        row_h = max(row_h, GLYPH_H * scale)
    height = y + row_h + pad
    canvas = np.full((height, width, 3), 255, dtype=np.uint8)
    for word, scale, color, px, py in placed:
        draw_text(canvas, px, py, word, scale, color)
    return canvas


def render_histogram(
    bins: list[tuple[int, int]],
    width: int = 320,
    height: int = 120,
    color: tuple[int, int, int] = (31, 78, 121),
) -> np.ndarray:
    """Raster bar chart from (bin, count) rows (the drift/profile
    histogram aggregate — already tiny): bars over a baseline, white
    background. Returns RGB uint8 (height, width, 3)."""
    canvas = np.full((height, width, 3), 255, dtype=np.uint8)
    if not bins:
        return canvas
    bins = sorted((int(b), int(c)) for b, c in bins)
    top = max(c for _, c in bins) or 1
    n = len(bins)
    pad = 4
    plot_w, plot_h = width - 2 * pad, height - 2 * pad
    bar_w = max(1, plot_w // max(n, 1))
    for i, (_, cnt) in enumerate(bins):
        bh = round(plot_h * cnt / top)
        x0 = pad + i * bar_w
        canvas[height - pad - bh : height - pad, x0 : x0 + max(1, bar_w - 1)] = color
    canvas[height - pad - 1 : height - pad, pad : pad + plot_w] = (80, 80, 80)
    return canvas


# ------------------------------------------------- figure rasterization

def _nums(vals) -> list[float]:
    return [float(v) for v in vals if v is not None]


def figure_to_png(fig: dict, width: int = 360, height: int = 200) -> np.ndarray:
    """Rasterize a figures.py plotly-schema figure dict (bar / scatter /
    box / heatmap traces) to an RGB canvas — the raster counterpart of
    the reference's image-exported figures, built from the SAME
    aggregated trace data the JSON carries (never raw rows). Title is
    drawn in the 5x7 font; axes are a frame + baseline. Unknown trace
    types raise ValueError so a silently-blank artifact can't ship."""
    canvas = np.full((height, width, 3), 255, dtype=np.uint8)
    title = str(
        (fig.get("layout") or {}).get("title", {}).get("text", "")
        if isinstance((fig.get("layout") or {}).get("title"), dict)
        else (fig.get("layout") or {}).get("title", "")
    )
    pad_t = 16 if title else 6
    pad = 8
    x0, y0 = pad, pad_t
    x1, y1 = width - pad, height - pad
    # frame
    frame = (120, 120, 140)
    canvas[y0, x0:x1] = frame
    canvas[y1 - 1, x0:x1] = frame
    canvas[y0:y1, x0] = frame
    canvas[y0:y1, x1 - 1] = frame
    if title:
        draw_text(canvas, pad, 3, title[:40], 1, (40, 40, 60))
    traces = fig.get("data") or []
    if not traces:
        return canvas
    plot_w, plot_h = (x1 - x0) - 4, (y1 - y0) - 4
    for t_i, tr in enumerate(traces):
        kind = tr.get("type")
        color = _PALETTE[t_i % len(_PALETTE)]
        if kind == "bar":
            ys = _nums(tr.get("y") or [])
            if not ys:
                continue
            top = max(max(ys), 1e-12)
            lo = min(min(ys), 0.0)
            span = top - lo or 1.0
            bw = max(1, plot_w // max(len(ys), 1))
            for i, v in enumerate(ys):
                bh = max(1, round(plot_h * (v - lo) / span))
                bx = x0 + 2 + i * bw
                canvas[y1 - 2 - bh : y1 - 2, bx : bx + max(1, bw - 1)] = color
        elif kind == "scatter":
            xs, ys = _nums(tr.get("x") or []), _nums(tr.get("y") or [])
            n = min(len(xs), len(ys))
            if n == 0:
                continue
            xs, ys = xs[:n], ys[:n]
            xspan = (max(xs) - min(xs)) or 1.0
            yspan = (max(ys) - min(ys)) or 1.0
            pts = [
                (
                    x0 + 2 + round((x - min(xs)) / xspan * (plot_w - 1)),
                    y1 - 3 - round((y - min(ys)) / yspan * (plot_h - 1)),
                )
                for x, y in zip(xs, ys)
            ]
            if "lines" in str(tr.get("mode", "")):
                for (ax, ay), (bx, by) in zip(pts, pts[1:]):
                    steps = max(abs(bx - ax), abs(by - ay), 1)
                    for s in range(steps + 1):
                        px = ax + (bx - ax) * s // steps
                        py = ay + (by - ay) * s // steps
                        canvas[py, px] = color
            else:
                for px, py in pts:
                    canvas[max(y0, py - 1) : py + 2, max(x0, px - 1) : px + 2] = color
        elif kind == "box":
            q1s, meds, q3s = _nums(tr.get("q1") or []), _nums(
                tr.get("median") or []), _nums(tr.get("q3") or [])
            los = _nums(tr.get("lowerfence") or [])
            his = _nums(tr.get("upperfence") or [])
            n = min(map(len, (q1s, meds, q3s, los, his)), default=0)
            if n == 0:
                continue
            lo, hi = min(los[:n]), max(his[:n])
            span = (hi - lo) or 1.0
            slot = plot_w // n
            for i in range(n):
                cx = x0 + 2 + i * slot + slot // 2
                ys_px = {
                    k: y1 - 3 - round((v - lo) / span * (plot_h - 1))
                    for k, v in (("lo", los[i]), ("q1", q1s[i]),
                                 ("med", meds[i]), ("q3", q3s[i]),
                                 ("hi", his[i]))
                }
                half = max(2, slot // 4)
                canvas[ys_px["hi"] : ys_px["lo"] + 1, cx] = color  # whisker
                canvas[ys_px["q3"] : ys_px["q1"] + 1,
                       cx - half : cx + half] = color              # box
                canvas[ys_px["med"], cx - half : cx + half] = (255, 255, 255)
        elif kind == "heatmap":
            z = tr.get("z") or []
            n_r = len(z)
            n_c = max((len(r) for r in z), default=0)
            if n_r == 0 or n_c == 0:
                continue
            ch = max(1, plot_h // n_r)
            cw = max(1, plot_w // n_c)
            zmin = float(tr.get("zmin", -1.0))
            zmax = float(tr.get("zmax", 1.0))
            span = (zmax - zmin) or 1.0
            for r_i, row in enumerate(z):
                for c_i, v in enumerate(row):
                    if v is None:
                        continue
                    f = min(1.0, max(0.0, (float(v) - zmin) / span))
                    # blue (low) -> white (mid) -> red (high)
                    if f < 0.5:
                        g = round(255 * (f * 2))
                        cell = (g, g, 255)
                    else:
                        g = round(255 * ((1 - f) * 2))
                        cell = (255, g, g)
                    cy = y0 + 2 + r_i * ch
                    cx = x0 + 2 + c_i * cw
                    canvas[cy : cy + ch, cx : cx + cw] = cell
        else:
            raise ValueError(f"unsupported trace type: {kind!r}")
    return canvas


def rasterize_figures(figs: dict[str, dict]) -> dict[str, str]:
    """PNG data-URIs for every figure figures_for_report emitted —
    the bulk image-export seam (reference exports its plotly figures as
    images; this is the dependency-free equivalent)."""
    return {name: png_data_uri(figure_to_png(f)) for name, f in figs.items()}
