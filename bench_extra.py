"""Optimization-round instrumentation (guide §1): per-query timing with
BOTH the bench-parity collect() sink and the noop sink (isolates the
computation from result transfer), plus .explain(\"formatted\") capture
for the plan artifacts under plans/rNN/.

Never used by the driver — bench.py stays the frozen measurement
surface. Usage:

    SPARK_GRAFT_SF_DIR=/root/localdata/sf1.0 python bench_extra.py \
        [query ...] [--plans plans/r09 --suffix before] [--reps 3]

With no query args, runs the full bench.py HEADLINE list.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from advanced_data_profile_spark.session import get_spark  # noqa: E402
from bench import HEADLINE  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    plans_dir = None
    suffix = "before"
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--plans":
            plans_dir = next(it)
        elif a == "--suffix":
            suffix = next(it)
        elif a == "--reps":
            reps = int(next(it))
        else:
            names.append(a)
    if not names:
        names = [n for n in HEADLINE]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="adp-bench-extra")
    qs = {**entry_mod.queries(), **entry_mod.extended_queries()}
    spark.range(0, 128, 1, 128).mapInPandas(lambda it: it, "id long").count()

    out: dict[str, dict] = {}
    for name in names:
        q = qs[name]
        sc = spark.sparkContext
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            df = q(spark, sf_dir)
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            with open(f"{plans_dir}/{name}_{suffix}.txt", "w") as f:
                f.write(df._jdf.queryExecution().explainString(mode))
        # steady-state warmup x2 (same discipline as bench.py)
        for _ in range(2):
            q(spark, sf_dir).collect()
        coll, noop = [], []
        for _ in range(reps):
            sc.setJobDescription(f"{name}: collect")
            t0 = time.time()
            q(spark, sf_dir).collect()
            coll.append(round(time.time() - t0, 3))
            sc.setJobDescription(f"{name}: noop")
            t0 = time.time()
            q(spark, sf_dir).write.format("noop").mode("overwrite").save()
            noop.append(round(time.time() - t0, 3))
            sc.setJobDescription(None)
        out[name] = {
            "collect_min": min(coll), "collect": coll,
            "noop_min": min(noop), "noop": noop,
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "results": out}))


if __name__ == "__main__":
    main()
