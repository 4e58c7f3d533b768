"""Plotly-figure JSON parity (reference Profiler.py:735-767 numeric/
datetime figures, 800-811 TF-IDF bar, 812-851 word cloud).

The reference embeds ``plotly.utils.PlotlyJSONEncoder`` output for every
figure into its HTML report. A plotly Figure serializes to a plain
``{"data": [traces...], "layout": {...}}`` dict, so the engine emits the
SAME schema directly from the already-aggregated report data — no plotly
runtime needed (the sandbox has none), and nothing is recomputed from
raw rows: every figure is built from the (bin, count) / stats rows the
distributed pass already produced (SURVEY.md M8 discipline).

Deviation, documented: the reference's word-cloud PNG (a matplotlib
raster embedded as a data URI) is represented as its underlying
frequency bar figure — the DATA the raster encodes; rendering a raster
is presentation, not engine semantics.
"""

from __future__ import annotations

import json
from collections import defaultdict


def _fig(traces: list[dict], title: str, xaxis: str = "", yaxis: str = "") -> dict:
    return {
        "data": traces,
        "layout": {
            "title": {"text": title},
            "xaxis": {"title": {"text": xaxis}},
            "yaxis": {"title": {"text": yaxis}},
        },
    }


def histogram_figure(rows: list[dict], column: str, n_bins: int | None = None) -> dict:
    """Bar figure from shared-bin histogram rows ((grp, column, bin, lo,
    hi, n_bins, cnt) — drift.histogram output). Bin midpoints from the
    stored self-describing grid; underflow/overflow buckets (0, n_bins+1)
    get open-ended labels. Reference: px.histogram per numeric column
    (Profiler.py:735-741).

    The interior-bin count comes from the rows themselves (drift.histogram
    persists it alongside lo/hi) with the parameter as override; it is
    NEVER inferred as max(bin) — width_bucket sends max-valued rows to the
    overflow bin (n_bins+1), so that inference skews every midpoint."""
    rs = sorted(
        (r for r in rows if r["column"] == column), key=lambda r: r["bin"]
    )
    if not rs:
        return _fig([], f"Histogram of {column}")
    lo, hi = rs[0]["lo"], rs[0]["hi"]
    nb = n_bins or rs[0].get("n_bins")
    if not nb:
        raise ValueError(
            f"histogram rows for {column!r} carry no n_bins grid metadata "
            "and no n_bins was passed — cannot place bin midpoints "
            "(inferring max(bin) would mislabel the overflow bin)"
        )
    width = (hi - lo) / nb if nb else 1.0
    xs, ys = [], []
    for r in rs:
        b = r["bin"]
        if b == 0:
            xs.append(f"< {lo:g}")
        elif b > nb:
            xs.append(f"> {hi:g}")
        else:
            xs.append(round(lo + (b - 0.5) * width, 6))
        ys.append(r["cnt"])
    return _fig(
        [{"type": "bar", "x": xs, "y": ys, "name": column}],
        f"Histogram of {column}", column, "count",
    )


def box_plot_figure(stats_rows: list[dict]) -> dict:
    """Box figure from PRECOMPUTED quartile stats (plotdata.box_plot_stats
    rows) — plotly box traces accept q1/median/q3/lowerfence/upperfence
    directly, so no raw values ship to the figure (the reference feeds
    raw columns to px.box, Profiler.py:743-746; at 10^12 rows only the
    stats can leave the cluster)."""
    cols = [r["col_name"] for r in stats_rows]
    return _fig(
        [{
            "type": "box",
            "x": cols,
            "q1": [r["q1"] for r in stats_rows],
            "median": [r["median"] for r in stats_rows],
            "q3": [r["q3"] for r in stats_rows],
            "lowerfence": [r["lo_whisker"] for r in stats_rows],
            "upperfence": [r["hi_whisker"] for r in stats_rows],
        }],
        "Box plot", "", "value",
    )


def qq_figure(points: list[dict], column: str) -> dict:
    """Scatter of (theoretical, sample) quantiles + the y=x reference
    line (reference Profiler.py:748-754 QQ scatter)."""
    xs = [p["theoretical_q"] for p in points]
    ys = [p["sample_q"] for p in points]
    lo = min(xs + ys) if points else 0
    hi = max(xs + ys) if points else 1
    return _fig(
        [
            {"type": "scatter", "mode": "markers", "x": xs, "y": ys,
             "name": "quantiles"},
            {"type": "scatter", "mode": "lines", "x": [lo, hi],
             "y": [lo, hi], "name": "y = x"},
        ],
        f"Q-Q plot of {column}", "theoretical", "sample",
    )


def datepart_figure(rows: list[dict], part: str, column: str) -> dict:
    """Bar of counts per date part (reference's year/month/day/hour/
    minute/second histograms, Profiler.py:768-794)."""
    rs = sorted(rows, key=lambda r: r[part])
    return _fig(
        [{"type": "bar", "x": [r[part] for r in rs],
          "y": [r["cnt"] for r in rs], "name": part}],
        f"{part} histogram of {column}", part, "count",
    )


def tfidf_bar_figure(rows: list[dict]) -> dict:
    """Top-ngram TF-IDF bar (reference Profiler.py:805-809)."""
    return _fig(
        [{"type": "bar", "x": [r["ngram"] for r in rows],
          "y": [r["mean_tfidf"] for r in rows]}],
        "Top TF-IDF Scores", "N-grams", "TF-IDF Score",
    )


def word_frequency_figure(rows: list[dict], column: str) -> dict:
    """The word-cloud DATA as a bar figure (reference renders a raster
    word cloud from exactly these frequencies, Profiler.py:812-851 —
    documented presentation deviation)."""
    return _fig(
        [{"type": "bar", "x": [r["word"] for r in rows],
          "y": [r["cnt"] for r in rows]}],
        f"Word frequencies of {column}", "word", "count",
    )


def correlation_heatmap(corr_rows: list[dict]) -> dict:
    """Heatmap from the pairwise correlation rows (reference px.imshow
    of df.corr(), Profiler.py:1023-1031)."""
    cols = sorted({r["col_a"] for r in corr_rows} | {r["col_b"] for r in corr_rows})
    idx = {c: i for i, c in enumerate(cols)}
    z = [[1.0 if i == j else None for j in range(len(cols))]
         for i in range(len(cols))]
    for r in corr_rows:
        i, j = idx[r["col_a"]], idx[r["col_b"]]
        z[i][j] = z[j][i] = r["corr"]
    return _fig(
        [{"type": "heatmap", "x": cols, "y": cols, "z": z,
          "zmin": -1, "zmax": 1}],
        "Correlation matrix",
    )


def pca_importance_figure(rows: list[dict]) -> dict:
    return _fig(
        [{"type": "bar", "x": [r["feature"] for r in rows],
          "y": [r["importance"] for r in rows]}],
        "PCA feature importance", "feature", "sum |loadings|",
    )


def figures_for_report(report: dict, n_bins: int | None = None) -> dict[str, dict]:
    """Every figure derivable from an assembled report dict
    (plans.report.assemble_report or plans.profile_report shape):
    per-column histograms, correlation heatmap, PCA bar, per-text-column
    word-frequency bars. All inputs are the tiny aggregated rows already
    in the report — this never touches a DataFrame."""
    figs: dict[str, dict] = {}
    # the true interior-bin count lives ON the histogram rows
    # (drift.histogram persists it next to lo/hi); `histogram_bins` /
    # the parameter remain as overrides for legacy stored rows.
    n_bins = n_bins or report.get("histogram_bins")
    hists = report.get("histograms") or []
    # partition histograms share bin edges by construction — merge
    # across groups (sum counts per bin) into one table-wide figure
    merged: dict[tuple, dict] = {}
    for r in hists:
        key = (r["column"], r["bin"])
        m = merged.setdefault(
            key,
            {"column": r["column"], "bin": r["bin"],
             "lo": r["lo"], "hi": r["hi"],
             "n_bins": r.get("n_bins"), "cnt": 0},
        )
        m["cnt"] += r["cnt"]
    by_col: dict[str, list] = defaultdict(list)
    for m in merged.values():
        by_col[m["column"]].append(m)
    for col, rows in sorted(by_col.items()):
        figs[f"histogram:{col}"] = histogram_figure(rows, col, n_bins)
    if report.get("correlation"):
        figs["correlation_heatmap"] = correlation_heatmap(report["correlation"])
    if report.get("pca_importance"):
        figs["pca_importance"] = pca_importance_figure(report["pca_importance"])
    for col, sec in (report.get("text_analysis") or {}).items():
        if sec.get("word_frequencies"):
            figs[f"word_frequencies:{col}"] = word_frequency_figure(
                sec["word_frequencies"], col
            )
    # every figure must be a valid plotly JSON document
    json.dumps(figs)
    return figs
