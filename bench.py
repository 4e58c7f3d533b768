"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]; prints a bench_detail JSON line
(spreads/probe/notes, mirrored to BENCH/DETAIL_latest.json) followed
by a COMPACT headline JSON as the FINAL line — the driver tail-parses
the last line, so the headline stays well under the tail budget.

Also times the end-to-end images validation pipeline (the north_rule
headline metric, images validated/sec) over a deterministic synthetic
images table generated once and cached under /tmp.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from advanced_data_profile_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "profile_lineitem",
    "pricing_summary",
    "topk_per_column",
    "entropy_event_type",
    "outlier_pct",
    "skew_kurt",
    "uniqueness_violations",
    "referential_integrity",
    "histogram_quantity",
    "datepart_histogram",
    "drift_psi_events",
    # round-5 adds (new operator surfaces; totals are not comparable to
    # BENCH_r04 — compare per-query)
    "drift_from_sketches",
    "chunk_slice_documents",
    # round-6 add: the production-shaped stored-state drift check —
    # read persisted KB-sized sketch state, merge, score; no raw scan,
    # no verification harness in the timed path (drift_from_sketches
    # above keeps timing the harnessed variant)
    "drift_from_stored_state_events",
    # round-8 adds (totals not comparable to BENCH_r07 — compare
    # per-query): the stored-state ANN search (index built once, /tmp-
    # cached by fixture tag — warm-up passes absorb the build, timed
    # passes measure the production search path) and the C4 global
    # span-removal transform (the heaviest text-transform surface)
    "ivf_index_search_embeddings",
    "dedup_spans_documents",
]

# drift_from_sketches times the CONTRACT query, which is HARNESSED:
# sketch build from a raw scan + the exact-KS/PSI verification harness
# around the scored merge. The bench artifact labels it accordingly so
# a regression in the operator is never masked by (or blamed on)
# harness noise; the operator-only production leg — score from stored
# KB-sized state, no raw scan, no harness — is benched separately as
# drift_from_stored_state_events.
BENCH_LABELS = {"drift_from_sketches": "drift_from_sketches_harnessed"}


def _lbl(d: dict) -> dict:
    return {BENCH_LABELS.get(k, k): v for k, v in d.items()}


BENCH_IMAGES = "/tmp/adp_bench_images"
BENCH_PARTS, BENCH_ROWS = 8, 2000
# steady-state fixture: decode-dominant payloads at enough volume that
# fixed per-run costs amortize (the small fixture's images/sec is
# fixed-cost dominated and understates the engine ~10-20x)
BIG_IMAGES = "/tmp/adp_bench_images_big"
BIG_PARTS, BIG_ROWS = 32, 4000


def ensure_images(spark, path: str, n_parts: int, rows: int, dims) -> None:
    marker = f"{path}/_SUCCESS_MARKER_unc"  # _unc: uncompressed payload fixture
    if os.path.exists(marker):
        return
    from advanced_data_profile_spark.sources.images import generate_images, write_images

    shutil.rmtree(path, ignore_errors=True)
    write_images(
        generate_images(spark, n_parts=n_parts, rows_per_part=rows, dims=dims),
        path,
    )
    with open(marker, "w") as f:
        f.write("ok")


def kernel_probe(n_procs: int = 32, repeats: int = 3) -> dict:
    """Frameworkless hardware-health probe (the machine-vs-engine
    attribution evidence, embedded so every BENCH_rN.json is
    self-contained): the pipeline's real bytes-reading decode kernel
    (scripts/scaling_bench._calib_worker — pyarrow parquet read +
    _validate_arrow) over the steady-state images fixture via raw
    multiprocessing, NO Spark in the loop. If this number moves between
    rounds on identical code and fixtures, the box moved, not the
    engine; a regression narrative may only blame the engine for time
    the probe does NOT account for."""
    import multiprocessing as mp

    scripts_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts")
    sys.path.insert(0, scripts_dir)
    import scaling_bench  # noqa: E402

    files = scaling_bench._part_files(BIG_IMAGES)
    n_images = BIG_PARTS * BIG_ROWS
    groups = [files[i::n_procs] for i in range(n_procs)]
    # warm the page cache (the Spark passes also read warm /tmp files)
    for f in files:
        with open(f, "rb") as fh:
            while fh.read(1 << 22):
                pass
    samples = []
    for _ in range(repeats):
        with mp.get_context("spawn").Pool(n_procs) as pool:
            ts = pool.map(scaling_bench._calib_worker, groups)
        samples.append(round(max(ts), 3))  # slowest worker bounds the stage
    s = sorted(samples)
    best = s[0]
    return {
        "probe_kernel_sec": best,
        "probe_kernel_imgs_per_sec": round(n_images / best, 1),
        "probe_spread": {"min": s[0], "med": s[len(s) // 2], "max": s[-1]},
        "probe_procs": n_procs,
        "probe_images": n_images,
    }


def jvm_probe(spark, repeats: int = 3) -> dict:
    """Fixed JVM-query health probe, the metadata-query counterpart of
    kernel_probe: a constant 3-expression aggregation over 1B
    generated longs — pure whole-stage codegen, no I/O, no Python, no
    shuffle beyond the final single-partition agg, and independent of
    every engine code path. kernel_probe vouches only for the decode
    subsystem; this vouches for JVM query execution itself, so uniform
    movements in the metadata queries (profile/topk/entropy/...) get
    the same machine-vs-engine attribution the decode path has. If
    this number moves between rounds on identical Spark configs, the
    box/JVM moved, not the engine."""
    from pyspark.sql import functions as F

    def run() -> None:
        spark.range(0, 1_000_000_000, 1, 32).select(
            F.col("id"), (F.col("id") % 97).alias("m")
        ).agg(
            F.sum("id").alias("s"),
            F.avg("m").alias("a"),
            F.count(F.lit(1)).alias("c"),
        ).collect()

    run()  # untimed warm pass (codegen compile)
    samples = []
    for _ in range(repeats):
        t0 = time.time()
        run()
        samples.append(round(time.time() - t0, 3))
    s = sorted(samples)
    return {
        "probe_jvm_sec": s[0],
        "probe_jvm_spread": {"min": s[0], "med": s[len(s) // 2], "max": s[-1]},
        "probe_jvm_rows": 1_000_000_000,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="adp-bench")
    # merged surface: HEADLINE membership is independent of which
    # registry (contract vs extended) a query currently lives in
    qs = {**entry_mod.queries(), **entry_mod.extended_queries()}

    # warm-up: JVM JIT + parquet footer reads + the Python worker pool
    # (forked workers import pandas on first use; reused afterwards).
    # Each headline query runs TWICE untimed first — steady-state
    # measurement, the same discipline as scripts/scaling_bench.py (a
    # long-running cluster is always in that state); collect() below
    # still recomputes from the scan, nothing is cached. Two passes,
    # not one (round-7 finding): C2 compilation of the widest generated
    # aggregate (profile_lineitem's fused struct) converges only around
    # the 4th-5th execution — with a single warm pass the 3-pass min
    # was still warm-up-bound (~5.3s vs ~5.0s steady on the same box),
    # so a JIT-speed shift between VM windows masqueraded as a query
    # regression.
    spark.range(0, 128, 1, 128).mapInPandas(lambda it: it, "id long").count()
    for _ in range(2):
        for name in HEADLINE:
            qs[name](spark, sf_dir).collect()

    # best-of-3 timed passes per query, with the per-query spread
    # (min/med/max) reported so VM drift on this shared box is
    # attributable: a REAL regression moves the min; CPU steal widens
    # the spread while the min stays put (external interference only
    # ever ADDS time)
    def timed_passes(target_dir: str, n: int = 3) -> dict[str, list[float]]:
        samples: dict[str, list[float]] = {q: [] for q in HEADLINE}
        for _ in range(n):
            for name in HEADLINE:
                t0 = time.time()
                qs[name](spark, target_dir).collect()
                samples[name].append(round(time.time() - t0, 3))
        return samples

    def spread(vals: list[float]) -> dict[str, float]:
        s = sorted(vals)
        return {"min": s[0], "med": s[len(s) // 2], "max": s[-1]}

    main_samples = timed_passes(sf_dir)
    timings: dict[str, float] = {q: min(v) for q, v in main_samples.items()}
    spreads = {q: spread(v) for q, v in main_samples.items()}

    # SECOND SCALE: the same headline queries at the adjacent sf (sf0.01
    # when main is sf0.1) so round-over-round trends separate fixed plan
    # cost from scan cost — a query whose time doesn't move with sf is
    # all fixed cost
    second_sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_2")
    if second_sf_dir is None:
        cand = "/root/testdata/sf0.01" if "0.1" in sf else "/root/testdata/sf0.001"
        second_sf_dir = cand if os.path.isdir(cand) and cand != sf_dir else None
    second: dict[str, float] = {}
    if second_sf_dir:
        for name in HEADLINE:
            qs[name](spark, second_sf_dir).collect()  # warm-up
        second = {q: min(v) for q, v in timed_passes(second_sf_dir).items()}

    # end-to-end images pipeline (profile + constraints + verify + drift)
    from advanced_data_profile_spark.plans.pipeline import run_pipeline

    ensure_images(spark, BENCH_IMAGES, BENCH_PARTS, BENCH_ROWS, (16, 32, 64))
    out_dir = "/tmp/adp_bench_out"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    summary = run_pipeline(spark, BENCH_IMAGES, out_dir)
    timings["images_pipeline"] = round(time.time() - t0, 3)

    # steady-state images/sec: 128k decode-dominant images, measured on
    # the SECOND run (first pass warms the page cache + JIT for this
    # payload size — a long-running cluster is always in that state;
    # same discipline as scripts/scaling_bench.py)
    # best-of-3 passes (min taken — the first, cold page-cache/JIT pass
    # never wins; external CPU steal on this shared VM only ADDS time)
    ensure_images(spark, BIG_IMAGES, BIG_PARTS, BIG_ROWS, (64, 128))
    big_out = "/tmp/adp_bench_out_big"
    best, big, steady_samples = None, None, []
    for _ in range(3):
        shutil.rmtree(big_out, ignore_errors=True)
        t0 = time.time()
        s = run_pipeline(spark, BIG_IMAGES, big_out)
        el = round(time.time() - t0, 3)
        steady_samples.append(el)
        if best is None or el < best:
            best, big = el, s
    timings["images_pipeline_steady"] = best
    spreads["images_pipeline_steady"] = spread(steady_samples)

    # hardware-health probes AFTER the Spark passes (the kernel probe
    # saturates all cores; running it concurrently would poison both
    # measurements). JVM probe first — it reuses the warm session.
    jvmp = jvm_probe(spark)
    probe = kernel_probe()

    total = round(sum(timings.values()), 3)
    # Detail record: spreads / probe / second-sf / notes. Printed on its
    # own EARLIER stdout line and mirrored to BENCH/DETAIL_latest.json;
    # it must never ride the final line (round 5 lesson: the combined
    # line outgrew the driver's tail-capture window and the artifact's
    # `parsed` field came back null).
    detail = {
        "record": "bench_detail",
        "queries_spread": _lbl(spreads),
        **jvmp,
        **probe,
        "images_per_sec": summary.get("images_per_sec"),
        "images_rows": summary.get("rows"),
        "notes": {
            # round-5 A/B (judge ask): exact-mode profile's distinct
            # pass — dedicated count_distinct scan (EXPAND rewrite) vs
            # melt-shuffle (explode to (column, value), count_distinct
            # per column). sf0.1 lineitem x l_returnflag, 32 cores,
            # best-of-3: expand 3.242s vs melt 3.299s (and melt's
            # distinct is over string casts). Kept the dedicated scan;
            # measurement script preserved in stats.py docstring terms.
            "ab_exact_distinct_pass_sf0.1": {
                "expand_scan_sec": 3.242,
                "melt_shuffle_sec": 3.299,
                "kept": "expand_scan",
            },
        },
    }
    if second:
        s2 = second_sf_dir.rstrip("/").split("sf")[-1]
        detail["second_sf"] = float(s2) if s2.replace(".", "").isdigit() else s2
        detail["queries_second_sf"] = _lbl(second)
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH", "DETAIL_latest.json"
    )
    try:
        os.makedirs(os.path.dirname(detail_path), exist_ok=True)
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1)
    except OSError:
        pass  # side file is best-effort; stdout line below is canonical
    print(json.dumps(detail))

    # COMPACT headline — the FINAL stdout line, sized well under the
    # driver's tail budget: metric/value/sf plus per-query mins only.
    print(
        json.dumps(
            {
                "metric": "headline_queries_plus_images_pipeline_total",
                "value": total,
                "unit": "sec",
                "queries": _lbl(timings),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "images_per_sec_steady": big.get("images_per_sec"),
                "images_rows_steady": big.get("rows"),
            }
        )
    )


if __name__ == "__main__":
    main()
