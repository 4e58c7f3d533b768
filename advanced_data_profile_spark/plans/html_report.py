"""Self-contained gzip HTML report — the analogue of the reference's
user-facing artifact (reference Profiler.py:1080-1112 renders a Jinja
template, minifies, gzips; jinja_template.html ~940 lines).

Rendered DRIVER-SIDE from the assembled JSON report (plans.report) —
never from raw data. Histograms become inline SVG bars from the stored
(bin, count) pairs; no raw values ever reach the artifact (SURVEY.md
M8). No template engine: the document is built from small f-string
helpers, so the only dependency is the stdlib.
"""

from __future__ import annotations

import gzip
import html
from collections import defaultdict

_CSS = """
body{font-family:system-ui,sans-serif;margin:24px;color:#1a1a2e;max-width:1200px}
h1{font-size:22px} h2{font-size:17px;margin-top:28px;border-bottom:1px solid #ccd;
padding-bottom:4px} h3{font-size:14px;margin:14px 0 6px}
table{border-collapse:collapse;font-size:12px;margin:6px 0}
th,td{border:1px solid #d8d8e8;padding:3px 8px;text-align:right}
th{background:#eef;text-align:center} td:first-child{text-align:left}
.pass{color:#0a7d38;font-weight:600}.fail{color:#c0182b;font-weight:600}
.meta{color:#556;font-size:13px}.sec{margin-bottom:8px}
svg{background:#fafaff;border:1px solid #e0e0ee;margin:2px 8px 2px 0}
.hists{display:flex;flex-wrap:wrap}
.hcap{font-size:11px;text-align:center;color:#556}
"""


def _esc(v) -> str:
    # data newlines become spaces (what HTML displays anyway): the
    # minify step in write_html_report joins stripped LINES, and a raw
    # newline inside a cell value would otherwise glue two words
    # together in the persisted artifact
    return html.escape("" if v is None else str(v)).replace("\n", " ").replace(
        "\r", ""
    )


def _fmt(v) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return f"{v:.6g}"
    return _esc(v)


def _verdict(passed) -> str:
    return '<span class="pass">PASS</span>' if passed else '<span class="fail">FAIL</span>'


def _table(headers: list[str], rows: list[list[str]]) -> str:
    th = "".join(f"<th>{_esc(h)}</th>" for h in headers)
    trs = "".join(
        "<tr>" + "".join(f"<td>{c}</td>" for c in r) + "</tr>" for r in rows
    )
    return f"<table><tr>{th}</tr>{trs}</table>"


def _hist_svg(column: str, grp, bins: list[tuple[int, int]],
              width: int = 220, height: int = 80) -> str:
    """Inline SVG bar chart from (bin, count) pairs — the report never
    carries raw values, only the stored histogram."""
    if not bins:
        return ""
    bins = sorted(bins)
    mx = max(c for _, c in bins) or 1
    lo_bin = bins[0][0]
    span = max(bins[-1][0] - lo_bin + 1, 1)
    bw = width / span
    bars = []
    for b, c in bins:
        bh = max(1, round((height - 12) * c / mx))
        x = (b - lo_bin) * bw
        bars.append(
            f'<rect x="{x:.1f}" y="{height - bh}" width="{max(bw - 1, 1):.1f}" '
            f'height="{bh}" fill="#5470c6"><title>bin {b}: {c}</title></rect>'
        )
    return (
        f'<div><svg width="{width}" height="{height}" role="img">'
        + "".join(bars)
        + f'</svg><div class="hcap">{_esc(column)} · part {_esc(grp)}</div></div>'
    )


_PROFILE_COLS = [
    "logical_type", "n_rows", "n_nonnull", "null_ratio", "n_distinct",
    "mean", "stddev", "min_num", "max_num", "p50", "skewness", "kurtosis",
    "max_length",
]


def render_html(report: dict) -> str:
    """dict from plans.report.assemble_report -> one self-contained
    HTML document (sections mirror the reference's report: overview,
    per-column stats, constraints, drift, plots, violations, lineage)."""
    parts: list[str] = []
    parts.append(
        f"<h1>Data profile &amp; validation — {_esc(report.get('table'))}</h1>"
        f'<div class="meta sec">generated {_esc(report.get("generated_at"))} · '
        f'{_fmt(report.get("total_rows"))} rows · '
        f'{_fmt(report.get("n_partitions"))} partitions · overall '
        f'{_verdict(report.get("overall_passed"))}</div>'
    )

    gc = report.get("global_constraints") or {}
    if gc:
        parts.append("<h2>Global (cross-run) constraints</h2>")
        rows = [
            [_esc(name), _esc(g.get("kind")), _fmt(g.get("n_violations")),
             _esc(", ".join(g.get("failed_partitions") or []) or "—"),
             _verdict(g.get("passed"))]
            for name, g in sorted(gc.items())
        ]
        parts.append(_table(
            ["constraint", "kind", "n_violations", "failed partitions",
             "verdict"], rows
        ))

    for pid, p in sorted(report.get("partitions", {}).items()):
        parts.append(f"<h2>Partition {_esc(pid)} — {_verdict(p.get('passed'))}</h2>")
        cols = p.get("columns", {})
        if cols:
            parts.append("<h3>Column profile</h3>")
            rows = [
                [_esc(name)] + [_fmt(stats.get(k)) for k in _PROFILE_COLS]
                for name, stats in sorted(cols.items())
            ]
            parts.append(_table(["column", *_PROFILE_COLS], rows))
        cons = p.get("constraints", {})
        if cons:
            parts.append("<h3>Constraints</h3>")
            rows = [
                [_esc(name), _esc(c.get("kind")), _fmt(c.get("n_rows")),
                 _fmt(c.get("n_violations")), _verdict(c.get("passed"))]
                for name, c in sorted(cons.items())
            ]
            parts.append(_table(
                ["constraint", "kind", "n_rows", "n_violations", "verdict"], rows
            ))
        dr = p.get("drift", {})
        if dr:
            parts.append("<h3>Drift vs baseline</h3>")
            rows = [
                [_esc(name), _fmt(d.get("ks")), _fmt(d.get("psi")),
                 _verdict(d.get("passed"))]
                for name, d in sorted(dr.items())
            ]
            parts.append(_table(["check", "ks", "psi", "verdict"], rows))
        cd = p.get("drift_categorical", {})
        if cd:
            parts.append("<h3>Categorical drift vs baseline</h3>")
            rows = [
                [_esc(name), _fmt(d.get("psi")), _fmt(d.get("chi2")),
                 _fmt(d.get("dof")), _fmt(d.get("n_categories")),
                 _verdict(d.get("passed"))]
                for name, d in sorted(cd.items())
            ]
            parts.append(_table(
                ["check", "psi", "chi2", "dof", "categories", "verdict"], rows
            ))

    top_values = report.get("top_values") or {}
    if top_values:
        parts.append("<h2>Top values</h2>")
        for col, vals in sorted(top_values.items()):
            parts.append(f"<h3>{_esc(col)}</h3>")
            parts.append(_table(
                ["value", "count", "rank"],
                [[_esc(v.get("value")), _fmt(v.get("cnt")), _fmt(v.get("rank"))]
                 for v in vals],
            ))

    corr = report.get("correlation") or []
    if corr:
        parts.append("<h2>Correlation</h2>")
        parts.append(_table(
            ["column a", "column b", "pearson"],
            [[_esc(r.get("col_a")), _esc(r.get("col_b")), _fmt(r.get("corr"))]
             for r in corr],
        ))

    pca = report.get("pca_importance") or []
    if pca:
        parts.append("<h2>PCA feature importance</h2>")
        parts.append(_table(
            ["feature", "importance"],
            [[_esc(r.get("feature")), _fmt(r.get("importance"))] for r in pca],
        ))

    text_sections = report.get("text_analysis") or {}
    for col, t in sorted(text_sections.items()):
        parts.append(f"<h2>Text analysis — {_esc(col)}</h2>")
        parts.append(
            '<div class="meta sec">mean Flesch reading ease '
            f"{_fmt(t.get('mean_flesch'))} · {_fmt(t.get('n_chars'))} chars · "
            f"{_fmt(t.get('n_monosyllable_words'))} mono- / "
            f"{_fmt(t.get('n_polysyllable_words'))} polysyllable words</div>"
        )
        langs = t.get("languages_detected") or []
        if langs:
            # reference "Languages Detected with Confidence"
            # (Profiler.py:663-673): top-5 (language, confidence %)
            parts.append(
                '<div class="meta">languages detected: '
                + ", ".join(
                    f"{_esc(r.get('lang'))} ({_fmt(r.get('conf'))}%)"
                    for r in langs
                )
                + "</div>"
            )
        wf = t.get("word_frequencies") or []
        if wf:
            # rasterized word cloud (PNG data-URI, the reference's
            # Profiler.py:812-851 artifact) above the exact-count table;
            # rendered driver-side from the aggregated rows only
            from advanced_data_profile_spark.plans.raster import (
                png_data_uri,
                render_word_cloud,
            )

            cloud = render_word_cloud(
                [(w.get("word"), w.get("cnt", 0)) for w in wf]
            )
            parts.append(
                f'<div><img src="{png_data_uri(cloud)}" '
                f'alt="word cloud — {_esc(col)}"></div>'
            )
            parts.append(_table(
                ["word", "count"],
                [[_esc(w.get("word")), _fmt(w.get("cnt"))] for w in wf],
            ))

    hists = report.get("histograms") or []
    if hists:
        parts.append("<h2>Histograms</h2><div class='hists'>")
        by_key: dict[tuple, list[tuple[int, int]]] = defaultdict(list)
        for h in hists:
            by_key[(h.get("column"), h.get("grp"))].append(
                (int(h.get("bin", 0)), int(h.get("cnt", 0)))
            )
        for (column, grp), bins in sorted(by_key.items(), key=lambda kv: (
            str(kv[0][0]), str(kv[0][1])
        )):
            parts.append(_hist_svg(column, grp, bins))
        parts.append("</div>")

    sample = report.get("row_sample") or []
    if sample:
        parts.append("<h2>Random row sample</h2>")
        headers = list(sample[0].keys())
        rows = [[_fmt(r.get(h)) for h in headers] for r in sample]
        parts.append(_table(headers, rows))

    vio = report.get("violation_samples") or []
    if vio:
        parts.append("<h2>Violation samples</h2>")
        rows = [
            [_esc(v.get("part_id")), _esc(v.get("constraint")),
             _esc(v.get("key")), _esc((v.get("detail") or "")[:160])]
            for v in vio[:100]
        ]
        parts.append(_table(["part", "constraint", "key", "detail"], rows))

    lineage = report.get("lineage") or []
    if lineage:
        parts.append("<h2>Lineage (manifest)</h2>")
        rows = [
            [_esc(m.get("run_id")), _esc(m.get("part_id")), _esc(m.get("status")),
             _fmt(m.get("n_rows")), _fmt(m.get("finished_at"))]
            for m in lineage
        ]
        parts.append(_table(["run", "part", "status", "n_rows", "finished"], rows))

    figures = report.get("figures") or {}
    if figures:
        # plotly-figure JSON embedded exactly as the reference embeds
        # PlotlyJSONEncoder output (Profiler.py:789-794 etc.) — a
        # client with plotly.js calls Plotly.newPlot per entry; the SVG
        # above stays the dependency-free rendering
        import json as _json

        payload = _json.dumps(figures).replace("</", "<\\/")
        parts.append(
            '<script type="application/json" id="plotly-figures">'
            f"{payload}</script>"
        )

    body = "".join(parts)
    return (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        f"<title>profile — {_esc(report.get('table'))}</title>"
        f"<style>{_CSS}</style></head><body>{body}</body></html>"
    )


def write_html_report(report: dict, path: str, compress: bool = True) -> str:
    """Persist like the reference's artifact (minified gzip HTML,
    Profiler.py:1104-1112)."""
    doc = render_html(report)
    # cheap minify: strip indentation-only whitespace
    data = "".join(line.strip() for line in doc.splitlines()).encode()
    if compress:
        path = path if path.endswith(".gz") else path + ".gz"
        with gzip.open(path, "wb") as f:
            f.write(data)
    else:
        with open(path, "wb") as f:
            f.write(data)
    return path
