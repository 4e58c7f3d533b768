"""Plotly-figure JSON parity (reference Profiler.py:735-767, 800-851):
figures are plain {"data": [...], "layout": {...}} dicts built from the
already-aggregated report rows — schema-compatible with
plotly.utils.PlotlyJSONEncoder output, no plotly runtime."""

from __future__ import annotations

import json

import pandas as pd
import pytest

from advanced_data_profile_spark.plans import figures as FG


def test_histogram_figure_midpoints_and_overflow():
    rows = [
        {"column": "x", "bin": 0, "lo": 0.0, "hi": 10.0, "cnt": 2},
        {"column": "x", "bin": 1, "lo": 0.0, "hi": 10.0, "cnt": 5},
        {"column": "x", "bin": 2, "lo": 0.0, "hi": 10.0, "cnt": 7},
        {"column": "x", "bin": 3, "lo": 0.0, "hi": 10.0, "cnt": 1},  # overflow
    ]
    fig = FG.histogram_figure(rows, "x", n_bins=2)
    (trace,) = fig["data"]
    assert trace["type"] == "bar"
    assert trace["x"] == ["< 0", 2.5, 7.5, "> 10"]
    assert trace["y"] == [2, 5, 7, 1]
    assert fig["layout"]["title"]["text"] == "Histogram of x"


def test_box_figure_uses_precomputed_quartiles():
    rows = [{"col_name": "a", "q1": 1.0, "median": 2.0, "q3": 3.0,
             "min": 0.0, "max": 9.0, "lo_whisker": 0.0, "hi_whisker": 6.0}]
    (trace,) = FG.box_plot_figure(rows)["data"]
    assert trace["type"] == "box"
    assert trace["q1"] == [1.0] and trace["upperfence"] == [6.0]


def test_correlation_heatmap_symmetry():
    rows = [
        {"col_a": "a", "col_b": "b", "corr": 0.5},
        {"col_a": "a", "col_b": "c", "corr": -0.25},
        {"col_a": "b", "col_b": "c", "corr": 0.0},
    ]
    (trace,) = FG.correlation_heatmap(rows)["data"]
    assert trace["x"] == ["a", "b", "c"]
    z = trace["z"]
    assert z[0][1] == z[1][0] == 0.5
    assert z[0][2] == z[2][0] == -0.25
    assert all(z[i][i] == 1.0 for i in range(3))


def test_figures_merge_partition_histograms():
    report = {
        "histograms": [
            {"grp": 0, "column": "w", "bin": 1, "lo": 0.0, "hi": 4.0,
             "n_bins": 2, "cnt": 3},
            {"grp": 1, "column": "w", "bin": 1, "lo": 0.0, "hi": 4.0,
             "n_bins": 2, "cnt": 4},
            {"grp": 1, "column": "w", "bin": 2, "lo": 0.0, "hi": 4.0,
             "n_bins": 2, "cnt": 2},
        ],
    }
    figs = FG.figures_for_report(report)
    (trace,) = figs["histogram:w"]["data"]
    assert trace["y"] == [7, 2]  # summed across partitions, bins shared
    # midpoints come from the STORED grid (n_bins=2 → width 2), never
    # inferred from max(bin)
    assert trace["x"] == [1.0, 3.0]
    json.dumps(figs)  # valid JSON document


def test_histogram_figure_requires_grid_metadata():
    # rows without n_bins and no override: refusing beats silently
    # skewing every midpoint by inferring max(bin) (overflow bin trap)
    rows = [{"column": "w", "bin": 1, "lo": 0.0, "hi": 4.0, "cnt": 3}]
    with pytest.raises(ValueError, match="n_bins"):
        FG.histogram_figure(rows, "w")
    # explicit override still works for legacy stored rows
    fig = FG.histogram_figure(rows, "w", n_bins=2)
    assert fig["data"][0]["x"] == [1.0]


def test_profile_report_embeds_figures(spark):
    from advanced_data_profile_spark.plans.profile_report import (
        profile_table_report,
    )

    pdf = pd.DataFrame({
        "n": [float(i) for i in range(50)],
        "m": [float(i % 7) for i in range(50)],
        "txt": ["the quick brown fox jumps over the lazy dog again"] * 50,
    })
    report = profile_table_report(spark.createDataFrame(pdf), "t")
    figs = report["figures"]
    assert "histogram:n" in figs and "histogram:m" in figs
    assert "correlation_heatmap" in figs
    assert "word_frequencies:txt" in figs
    for f in figs.values():
        assert set(f) == {"data", "layout"}
        for tr in f["data"]:
            assert tr["type"] in {"bar", "scatter", "box", "heatmap"}
    json.dumps(report["figures"])


def test_qq_tfidf_datepart_figures():
    qq = FG.qq_figure(
        [{"p": 0.25, "theoretical_q": -0.67, "sample_q": -0.7},
         {"p": 0.75, "theoretical_q": 0.67, "sample_q": 0.72}], "x")
    assert [t["mode"] for t in qq["data"]] == ["markers", "lines"]
    tf = FG.tfidf_bar_figure([{"ngram": "big cat", "mean_tfidf": 0.5}])
    assert tf["data"][0]["x"] == ["big cat"]
    dp = FG.datepart_figure(
        [{"mon": 2, "cnt": 5}, {"mon": 1, "cnt": 3}], "mon", "ts")
    assert dp["data"][0]["x"] == [1, 2]  # sorted by part


def test_html_report_embeds_plotly_json(spark, tmp_path):
    from advanced_data_profile_spark.plans.html_report import render_html
    from advanced_data_profile_spark.plans.profile_report import (
        profile_table_report,
    )

    pdf = pd.DataFrame({"x": [float(i) for i in range(30)],
                        "y": [float(i % 3) for i in range(30)]})
    report = profile_table_report(spark.createDataFrame(pdf), "t")
    html = render_html(report)
    assert 'id="plotly-figures"' in html
    start = html.index('id="plotly-figures">') + len('id="plotly-figures">')
    payload = html[start: html.index("</script>", start)]
    figs = json.loads(payload.replace("<\\/", "</"))
    assert "histogram:x" in figs and figs["histogram:x"]["data"]


def test_html_renders_global_constraints():
    from advanced_data_profile_spark.plans.html_report import render_html

    report = {
        "table": "t", "generated_at": "now", "total_rows": 10,
        "n_partitions": 1, "overall_passed": False,
        "global_constraints": {
            "image_id_unique_global": {
                "kind": "unique_global", "n_violations": 4,
                "passed": False, "failed_partitions": ["0", "3"],
            }
        },
        "partitions": {}, "histograms": [], "violation_samples": [],
        "row_sample": [], "lineage": [],
    }
    html = render_html(report)
    assert "Global (cross-run) constraints" in html
    assert "image_id_unique_global" in html and "0, 3" in html
    assert '<span class="fail">FAIL</span>' in html


def test_histogram_midpoints_correct_with_overflow_bin(spark):
    """width_bucket sends max-valued rows to the overflow bin; the
    figure must still use the TRUE bin count for midpoints (regression:
    inferring n_bins from max(bin) skewed every midpoint by one bin)."""
    from advanced_data_profile_spark.plans.profile_report import (
        profile_table_report,
    )

    pdf = pd.DataFrame({"x": [float(i) for i in range(21)]})  # 0..20, max hits hi
    report = profile_table_report(spark.createDataFrame(pdf), "t", n_bins=10)
    fig = report["figures"]["histogram:x"]
    (trace,) = fig["data"]
    # 10 interior bins over [0, 20] -> width 2.0; first midpoint 1.0
    numeric_x = [v for v in trace["x"] if not isinstance(v, str)]
    assert numeric_x[0] == pytest.approx(1.0)
    assert numeric_x[1] == pytest.approx(3.0)
    # the max value (20.0) lands in the overflow label
    assert any(isinstance(v, str) and v.startswith(">") for v in trace["x"])
