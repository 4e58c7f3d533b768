"""Pure-stdlib PNG encoder + deterministic word-cloud/histogram
rasters (plans/raster.py) — the reference's rasterized-artifact parity
(Profiler.py:812-851 word-cloud PNG data-URI). No Spark needed: raster
rendering is driver-side over aggregated rows by construction."""

from __future__ import annotations

import numpy as np

from advanced_data_profile_spark.plans.raster import (
    FONT_5X7,
    decode_png,
    draw_text,
    encode_png,
    png_data_uri,
    render_histogram,
    render_word_cloud,
    text_width,
)


def test_png_roundtrip_random():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(37, 53, 3), dtype=np.uint8)
    assert (decode_png(encode_png(img)) == img).all()


def test_png_header_and_determinism():
    img = np.zeros((4, 6, 3), dtype=np.uint8)
    data = encode_png(img)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert data[12:16] == b"IHDR"
    # width=6 height=4 big-endian
    assert data[16:24] == (6).to_bytes(4, "big") + (4).to_bytes(4, "big")
    assert encode_png(img) == data  # byte-identical across calls
    uri = png_data_uri(img)
    assert uri.startswith("data:image/png;base64,")


def test_font_glyphs_well_formed():
    for ch, rows in FONT_5X7.items():
        assert len(rows) == 7, ch
        assert all(0 <= r < 32 for r in rows), ch  # 5-bit rows


def test_draw_text_marks_pixels_and_clips():
    canvas = np.full((20, 60, 3), 255, dtype=np.uint8)
    end = draw_text(canvas, 2, 2, "AB1", 1, (10, 20, 30))
    assert end == 2 + text_width("AB1", 1)
    assert ((canvas == (10, 20, 30)).all(axis=2)).sum() > 20
    # clipping: drawing past the edge must not raise
    draw_text(canvas, 55, 18, "WWW", 3, (0, 0, 0))


def test_word_cloud_deterministic_and_weighted():
    freqs = [("alpha", 100), ("beta", 50), ("gamma", 10), ("delta", 1)]
    a = render_word_cloud(freqs)
    b = render_word_cloud(freqs)
    assert (a == b).all()
    assert a.dtype == np.uint8 and a.shape[2] == 3 and a.shape[1] == 480
    # the dominant word draws more ink than the rare one: count colored
    # pixels of the rank-0 palette color vs the rank-3 one
    from advanced_data_profile_spark.plans.raster import _PALETTE

    ink0 = ((a == _PALETTE[0]).all(axis=2)).sum()
    ink3 = ((a == _PALETTE[3]).all(axis=2)).sum()
    assert ink0 > ink3 > 0
    # empty input yields a valid blank canvas
    blank = render_word_cloud([])
    assert (blank == 255).all()


def test_word_cloud_wraps_rows():
    freqs = [(f"word{i}", 10) for i in range(20)]
    img = render_word_cloud(freqs, width=200)
    # 20 equal words cannot fit one 200px row -> canvas grew vertically
    assert img.shape[0] > 30


def test_histogram_render_heights_track_counts():
    img = render_histogram([(0, 1), (1, 10), (2, 5)], width=64, height=40)
    col = np.array((31, 78, 121), dtype=np.uint8)
    ink = (img == col).all(axis=2)
    # measure colored-run height per x column, then compare maxima in
    # thirds of the plot area: bar 1 tallest, bar 0 shortest
    col_h = ink.sum(axis=0)
    third = len(col_h) // 3
    h0, h1, h2 = col_h[:third].max(), col_h[third:2 * third].max(), col_h[2 * third:].max()
    assert h1 > h2 > h0 >= 1
    assert (render_histogram([]) == 255).all()


def test_html_report_embeds_word_cloud():
    from advanced_data_profile_spark.plans.html_report import render_html

    report = {
        "table": {"n_rows": 1, "n_cols": 1},
        "text_analysis": {
            "caption": {
                "mean_flesch": 50.0,
                "word_frequencies": [
                    {"word": "hello", "cnt": 5}, {"word": "world", "cnt": 2}
                ],
            }
        },
    }
    html = render_html(report)
    assert "data:image/png;base64," in html
    assert "word cloud" in html


def test_figure_to_png_all_trace_types():
    import pytest

    from advanced_data_profile_spark.plans.raster import (
        figure_to_png,
        rasterize_figures,
    )

    figs = {
        "bar": {"layout": {"title": {"text": "Bars"}},
                "data": [{"type": "bar", "x": ["a", "b"], "y": [3, 7]}]},
        "scatter": {"layout": {"title": "QQ"},
                    "data": [{"type": "scatter", "mode": "markers",
                              "x": [0, 1, 2], "y": [0.1, 0.9, 2.2]},
                             {"type": "scatter", "mode": "lines",
                              "x": [0, 2], "y": [0, 2]}]},
        "box": {"layout": {},
                "data": [{"type": "box", "x": ["c"], "q1": [1.0],
                          "median": [2.0], "q3": [3.0],
                          "lowerfence": [0.0], "upperfence": [4.0]}]},
        "heatmap": {"layout": {},
                    "data": [{"type": "heatmap", "x": ["a", "b"],
                              "y": ["a", "b"], "zmin": -1, "zmax": 1,
                              "z": [[1.0, -0.5], [-0.5, 1.0]]}]},
    }
    uris = rasterize_figures(figs)
    assert set(uris) == set(figs)
    for name, uri in uris.items():
        assert uri.startswith("data:image/png;base64,"), name
    # every rendered figure actually drew something beyond the frame
    for name, fig in figs.items():
        img = figure_to_png(fig)
        non_white = (img != 255).any(axis=2).sum()
        assert non_white > 50, name
    # unknown trace types fail loudly, never ship blank
    with pytest.raises(ValueError, match="unsupported trace"):
        figure_to_png({"data": [{"type": "violin"}]})


def test_figure_determinism():
    from advanced_data_profile_spark.plans.raster import figure_to_png

    fig = {"layout": {"title": "T"},
           "data": [{"type": "bar", "x": ["a"], "y": [1]}]}
    assert (figure_to_png(fig) == figure_to_png(fig)).all()
