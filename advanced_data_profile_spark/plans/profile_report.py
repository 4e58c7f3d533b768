"""Generic-table profile report — the reference's MAIN user flow
(reference main.py:14-43: profile a CSV through the five phases, emit
one gzip HTML report). Here: any DataFrame (CSV via sources.csvfile,
parquet, Iceberg) → infer types → one-pass wide profile + top-k +
histograms + correlation → a report dict in the SAME shape
plans.report/assemble_report produces, so plans.html_report renders it
with zero extra code.

Everything is computed in a handful of fused scans (profile is one agg;
top-k one melt pipeline; histograms one melt agg; correlation one agg)
— never per-column loops like the reference (Profiler.py:576,627,695).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from advanced_data_profile_spark.operators.correlation import (
    correlation_matrix,
    pca_feature_importance,
)
from advanced_data_profile_spark.operators.drift import histogram
from advanced_data_profile_spark.operators.stats import (
    NUMERIC_TYPES,
    profile,
    table_summary,
)
from advanced_data_profile_spark.operators.text_ml import (
    char_counts,
    flesch_reading_ease,
    language_profile,
    word_frequencies,
)
from advanced_data_profile_spark.operators.topk import top_k_values
from advanced_data_profile_spark.operators.typeinfer import InferredType, infer_types



def profile_table_report(
    df: DataFrame,
    table_name: str = "table",
    decisions: dict[str, InferredType] | None = None,
    top_k: int = 10,
    n_bins: int = 20,
    max_corr_cols: int = 12,
    sample_rows: int = 100,
) -> dict:
    """One report dict for a generic table: per-column stats, inferred
    logical types, top-k values for low-cardinality columns, numeric
    histograms (bin/count pairs only), correlation matrix, a seeded row
    sample and the table summary. Renderable by html_report.render_html."""
    decisions = decisions or infer_types(df)
    dtypes = {f.name: f.dataType for f in df.schema.fields}

    prof_rows = [r.asDict() for r in profile(df).collect()]
    summary = table_summary(df).first().asDict()

    columns: dict[str, dict] = {}
    for r in prof_rows:
        name = r.pop("column")
        t = decisions.get(name)
        r["logical_type"] = t.logical if t else None
        if t and t.datetime_format:
            r["datetime_format"] = t.datetime_format
        columns[name] = r

    # top-k for plausibly-categorical columns (distinct ratio < 10%)
    cat_cols = [
        name for name, r in columns.items()
        if r.get("n_distinct") is not None and r.get("n_rows")
        and r["n_distinct"] <= max(top_k * 5, 0.1 * r["n_rows"])
        and isinstance(dtypes[name], (T.StringType, *NUMERIC_TYPES))
    ]
    top_values: dict[str, list] = {}
    if cat_cols:
        tk = top_k_values(df, cat_cols, k=top_k).collect()
        for r in tk:
            top_values.setdefault(r.column, []).append(
                {"value": r.value, "cnt": r.cnt, "rank": int(r.rank)}
            )

    # shared-bin histograms for numeric columns, bounds from the profile
    num_cols = [n for n in columns if isinstance(dtypes[n], NUMERIC_TYPES)]
    hists: list[dict] = []
    if num_cols:
        bounds = {
            n: (columns[n]["min_num"], columns[n]["max_num"]) for n in num_cols
        }
        h = histogram(
            df.withColumn("__grp", F.lit("__all__")), num_cols, "__grp",
            bounds, n_bins=n_bins,
        )
        hists = [r.asDict() for r in h.collect()]

    corr = []
    pca = []
    if 2 <= len(num_cols) <= max_corr_cols:
        corr = [r.asDict() for r in correlation_matrix(df, num_cols).collect()]
        if len(num_cols) >= 3:
            pca = [
                r.asDict()
                for r in pca_feature_importance(
                    df, num_cols, k=min(len(num_cols), 4)
                ).collect()
            ]

    # free-text columns (reference N2/N3: word cloud data + readability):
    # string columns whose mean token count suggests prose, not codes
    text_sections: dict[str, dict] = {}
    for name in columns:
        if not isinstance(dtypes[name], T.StringType):
            continue
        r = columns[name]
        if (r.get("max_length") or 0) < 20 or r.get("logical_type") != "string":
            continue
        words = [w.asDict() for w in word_frequencies(df, name, top=25).collect()]
        flesch = flesch_reading_ease(df, name).first()[0]
        cc = char_counts(df, name).first().asDict()
        # reference "Languages Detected with Confidence" (Profiler.py:
        # 663-673): per-language best confidence, top 5 by conf desc
        langs = [r.asDict() for r in language_profile(df, name, k=5).collect()]
        text_sections[name] = {
            "word_frequencies": words,
            "mean_flesch": flesch,
            "languages_detected": langs,
            **cc,
        }

    sample = [
        r.asDict() for r in
        df.sample(fraction=0.5, seed=42).limit(sample_rows).collect()
    ] if sample_rows else []

    report = {
        "table": table_name,
        "generated_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "n_partitions": 1,
        "total_rows": summary.get("n_rows"),
        "overall_passed": True,
        "table_summary": summary,
        "partitions": {
            "__all__": {
                "columns": columns,
                "constraints": {},
                "drift": {},
                "passed": True,
            }
        },
        "top_values": top_values,
        "correlation": corr,
        "pca_importance": pca,
        "text_analysis": text_sections,
        "histograms": hists,
        "histogram_bins": n_bins,
        "violation_samples": [],
        "row_sample": sample,
        "lineage": [],
    }
    # plotly-figure JSON parity (reference embeds PlotlyJSONEncoder
    # output per figure; same schema, emitted from the aggregated rows)
    from advanced_data_profile_spark.plans.figures import figures_for_report

    report["figures"] = figures_for_report(report)
    # rasterized counterparts (PNG data-URIs; reference exports its
    # figures as images — Profiler.py word-cloud PNG + plotly image
    # export). Pure-stdlib encoder; built from the same trace data.
    from advanced_data_profile_spark.plans.raster import rasterize_figures

    report["figure_images"] = rasterize_figures(report["figures"])
    return report
