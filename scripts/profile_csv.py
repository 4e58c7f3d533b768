"""The reference's end-to-end user flow (reference main.py:14-43):
profile one CSV file, write a gzip HTML report (+ optional JSON).

    python scripts/profile_csv.py --csv data.csv --out report.html.gz
    spark-submit --py-files dist/adp_spark.zip scripts/profile_csv.py \\
        --csv hdfs://.../data.csv --out /reports/data.html.gz

Phases map 1:1 to the reference's five: load (read_csv, all-string) →
type inference (sampled voting) → column stats (ONE wide agg) → top-k /
histograms / correlation (one fused pass each) → HTML render.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="profile a CSV to a gzip HTML report")
    ap.add_argument("--csv", required=True)
    ap.add_argument("--out", required=True, help="output .html(.gz) path")
    ap.add_argument("--json", default=None, help="also write the report dict as JSON(.gz)")
    ap.add_argument("--table-name", default=None)
    ap.add_argument("--delimiter", default=",")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    else:
        from advanced_data_profile_spark.session import get_spark

        spark = get_spark(app_name="adp-profile-csv")

    from advanced_data_profile_spark.plans.html_report import write_html_report
    from advanced_data_profile_spark.plans.profile_report import profile_table_report
    from advanced_data_profile_spark.plans.report import write_report
    from advanced_data_profile_spark.sources.csvfile import read_csv_typed

    t0 = time.time()
    typed, decisions = read_csv_typed(spark, args.csv, delimiter=args.delimiter)
    name = args.table_name or os.path.splitext(os.path.basename(args.csv))[0]
    report = profile_table_report(typed, table_name=name, decisions=decisions)
    path = write_html_report(report, args.out)
    out = {"report": path, "elapsed_sec": round(time.time() - t0, 3),
           "rows": report["total_rows"],
           "report_size_kb": round(os.path.getsize(path) / 1024, 1)}
    if args.json:
        out["json"] = write_report(report, args.json)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
