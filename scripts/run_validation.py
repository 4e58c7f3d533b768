"""spark-submit entry point for the validation pipeline (north_rule:
"ships via spark-submit --py-files to clusters of N and 4N executors").

Cluster usage:
    python scripts/make_pyfiles.py              # builds dist/adp_spark.zip
    spark-submit --py-files dist/adp_spark.zip \\
        scripts/run_validation.py \\
        --images <iceberg-or-parquet path> --output <results dir> \\
        [--format iceberg] [--no-resume] [--no-images] [--report out.json.gz]

Local usage (creates its own local session):
    python scripts/run_validation.py --images /tmp/imgs --output /tmp/out
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="image+caption table validation")
    ap.add_argument("--images", required=True, help="images table path")
    ap.add_argument("--output", required=True, help="results directory")
    ap.add_argument("--format", default="parquet", choices=["parquet", "iceberg"])
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--no-images", action="store_true",
                    help="skip the payload-decoding verification pass")
    ap.add_argument("--no-drift", action="store_true")
    ap.add_argument("--baseline-part", type=int, default=0)
    ap.add_argument("--approx", action=argparse.BooleanOptionalAction, default=True,
                    help="sketch mode for distinct/quantiles (default on)")
    ap.add_argument("--global-unique", action="store_true",
                    help="run the cross-RUN uniqueness pass after the "
                         "incremental run (writes constraint_results_global)")
    ap.add_argument("--id-index", default=None, metavar="TABLE",
                    help="maintain a bucketed id-index under this catalog "
                         "table name: each run appends its partitions' id "
                         "counts and --global-unique becomes a shuffle-free "
                         "per-bucket self-check instead of a full-table "
                         "rescan (the scale path; see plans/id_index.py)")
    ap.add_argument("--id-index-compact", action="store_true",
                    help="after the run, compact the --id-index table "
                         "(keep latest per (key, partition)) so the check "
                         "stays O(distinct keys) across many runs")
    ap.add_argument("--sketch-drift-baseline", default=None, metavar="DIR",
                    help="a PRIOR run's output dir: score this run's data "
                         "against it from the two runs' persisted sketch "
                         "state alone (no rescan; writes "
                         "<output>/sketch_drift_results)")
    ap.add_argument("--report", default=None, help="also write an assembled JSON report")
    ap.add_argument("--html-report", default=None,
                    help="also render the self-contained gzip HTML report")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from advanced_data_profile_spark.plans.pipeline import PipelineConfig, run_pipeline
    from advanced_data_profile_spark.plans.report import assemble_report, write_report

    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active  # under spark-submit: the cluster session
    else:
        from advanced_data_profile_spark.session import get_spark

        spark = get_spark(app_name="adp-validation")

    cfg = PipelineConfig(
        approx=args.approx,
        validate_images=not args.no_images,
        drift=not args.no_drift,
        baseline_part=args.baseline_part,
        table_format=args.format,
        global_unique=args.global_unique,
        id_index_table=args.id_index,
    )
    summary = run_pipeline(
        spark, args.images, args.output, resume=not args.no_resume, cfg=cfg
    )
    print(json.dumps(summary))

    if args.id_index_compact:
        if not args.id_index:
            ap.error("--id-index-compact requires --id-index")
        from advanced_data_profile_spark.plans.id_index import index_compact

        n = index_compact(
            spark, args.id_index, f"{args.output}/_id_index_staging"
        )
        print(json.dumps({"id_index_compacted_rows": n}))

    if args.sketch_drift_baseline:
        from advanced_data_profile_spark.plans.pipeline import (
            sketch_drift_between_runs,
        )

        dv, scores = sketch_drift_between_runs(
            spark, args.sketch_drift_baseline, args.output
        )
        rows = dv.collect()
        scores.unpersist()
        print(json.dumps({
            "sketch_drift": [
                {"constraint": r.constraint, "passed": bool(r.passed),
                 "ks": r.ks, "psi": r.psi}
                for r in rows
            ]
        }))

    if args.report or args.html_report:
        report = assemble_report(spark, args.output)
        if args.report:
            path = write_report(report, args.report)
            print(f"report written: {path}")
        if args.html_report:
            from advanced_data_profile_spark.plans.html_report import write_html_report

            path = write_html_report(report, args.html_report)
            print(f"html report written: {path}")


if __name__ == "__main__":
    main()
