"""End-to-end validation pipeline: profile → constraints → payload
verify → drift → manifest. The north_rule job.

One run processes ALL pending partitions in one set of Spark jobs
(grouped by part_id inside each job — no per-partition driver loop),
then commits one manifest row per partition. Resume skips partitions
whose latest manifest status is `done` (broadcast anti-join). Result
tables are overwritten per-partition (dynamic partition overwrite) so
re-runs are idempotent.

Scan economy per run (any number of partitions/columns):
  1 scan  — metadata-column profile (bytes pruned out)
  1 scan  — row-wise constraint counts (fused wide agg)
  1 scan  — uniqueness (two-stage agg) + referential anti-join
  1 scan  — payload validation (the only scan that reads `bytes`)
  2 scans — drift bounds + histogram (numeric metadata only)
plus violation-sample scans for failed checks only.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from advanced_data_profile_spark.operators import constraints as C
from advanced_data_profile_spark.operators.drift import drift_verdicts, histogram, ks_psi
from advanced_data_profile_spark.operators.image_verify import (
    validate_payloads,
    validation_verdicts,
)
from advanced_data_profile_spark.operators.stats import profile
from advanced_data_profile_spark.plans.manifest import Manifest, new_run_id
from advanced_data_profile_spark.sources.images import phash_reference, read_images


@dataclass
class PipelineConfig:
    approx: bool = True                    # sketch mode for distinct/quantiles
    validate_images: bool = True           # run the bytes-reading pass
    drift: bool = True
    baseline_part: int = 0                 # drift baseline partition
    drift_columns: tuple = ("w", "h", "caption_len")
    ks_threshold: float = 0.15
    psi_threshold: float = 0.25
    max_w: int = 8192
    max_h: int = 8192
    known_fmts: tuple = ("raw", "bmp")
    sample_violations: int = 20
    extra_checks: list = field(default_factory=list)


def image_checks(images_ref: DataFrame, cfg: PipelineConfig) -> list[C.Check]:
    return [
        C.not_null("caption_not_null", "caption"),
        C.domain("w_domain", (F.col("w") > 0) & (F.col("w") <= cfg.max_w), "w"),
        C.domain("h_domain", (F.col("h") > 0) & (F.col("h") <= cfg.max_h), "h"),
        C.domain("fmt_known", F.col("fmt").isin(*cfg.known_fmts), "fmt"),
        C.unique("image_id_unique", "image_id"),
        C.referential("phash_ref", "phash", images_ref, "phash"),
        *cfg.extra_checks,
    ]


def run_pipeline(
    spark: SparkSession,
    images_path: str,
    output_dir: str,
    phash_ref: DataFrame | None = None,
    resume: bool = True,
    cfg: PipelineConfig | None = None,
) -> dict:
    """Returns a run summary dict (rows processed, timings, verdicts)."""
    cfg = cfg or PipelineConfig()
    t0 = time.time()
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    orig_split = spark.conf.get("spark.sql.files.maxPartitionBytes")

    # small result DataFrames are persisted (eagerly) before their
    # parquet writes: every .write otherwise re-computes its full
    # lineage — measured ~2x the whole run at bench scale
    persisted = []

    def _materialize(d):
        d = d.persist()
        d.count()
        persisted.append(d)
        return d

    timings: dict[str, float] = {}
    t = time.time()
    images = read_images(spark, images_path)
    manifest = Manifest(spark, f"{output_dir}/manifest")
    run_id = new_run_id()

    all_parts = images.select("part_id").distinct()
    pending = manifest.pending(all_parts) if resume else all_parts
    pending_ids = [r.part_id for r in pending.collect()]
    timings["plan"] = time.time() - t
    if not pending_ids:
        return {
            "run_id": run_id, "partitions": 0, "rows": 0,
            "elapsed_sec": time.time() - t0, "skipped": "all partitions done",
        }
    # partition pruning: isin on the partition column prunes at the scan
    df = images.where(F.col("part_id").isin(pending_ids))
    meta = df.withColumn("caption_len", F.length("caption"))

    # The profile / metadata-constraint / payload-decode stages have no
    # dependencies on each other, so their materializations are
    # submitted as CONCURRENT Spark jobs from driver threads (standard
    # multi-job driver practice; local scheduler interleaves tasks).
    # This removes most of the serial per-job latency floor that
    # otherwise caps scaling on short runs. Split sizing: metadata-only
    # scans get large splits via a separate child session config (split
    # accounting counts the pruned-out bytes column, so the default
    # would over-parallelize scans that read ~2% of each file); the
    # decode pass keeps small splits for balanced bytes-reading tasks.
    from concurrent.futures import ThreadPoolExecutor

    spark.conf.set("spark.sql.files.maxPartitionBytes", "256m")
    ref = phash_ref if phash_ref is not None else phash_reference(images)
    profiles_df = profile(meta.drop("bytes"), group_by="part_id", approx=cfg.approx)
    results, violations = C.evaluate(
        df, image_checks(ref, cfg), part_col="part_id",
        sample_violations=cfg.sample_violations,
    )

    t = time.time()
    stage_t: dict[str, float] = {}

    def _mat(name, d):
        s = time.time()
        out = _materialize(d)
        stage_t[name] = round(time.time() - s, 3)
        return out

    with ThreadPoolExecutor(max_workers=4) as pool:
        f_prof = pool.submit(_mat, "profile", profiles_df)
        f_res = pool.submit(_mat, "constraint_counts", results)
        f_vio = pool.submit(_mat, "violations", violations)
        if cfg.validate_images:
            def _decode():
                # plan the decode scan with small splits in a child
                # session (shared context, independent SQLConf)
                s2 = spark.newSession()
                s2.conf.set("spark.sql.files.maxPartitionBytes", "16m")
                df2 = read_images(s2, images_path).where(
                    F.col("part_id").isin(pending_ids)
                )
                return _mat("decode_verify", validation_verdicts(validate_payloads(df2)))
            f_ver = pool.submit(_decode)
        profiles = f_prof.result()
        results = f_res.result()
        violations = f_vio.result()
        if cfg.validate_images:
            verdicts = f_ver.result()
    timings["compute"] = time.time() - t
    timings.update(stage_t)

    t = time.time()
    profiles.write.mode("overwrite").partitionBy("part_id").parquet(
        f"{output_dir}/column_profiles"
    )
    if cfg.validate_images:
        # verdicts live in a sibling session; align by collect-free
        # union through a common parent plan is not possible, so write
        # both parts into the same output (parquet schema-identical)
        results.write.mode("overwrite").partitionBy("part_id").parquet(
            f"{output_dir}/constraint_results"
        )
        verdicts.write.mode("append").partitionBy("part_id").parquet(
            f"{output_dir}/constraint_results"
        )
    else:
        results.write.mode("overwrite").partitionBy("part_id").parquet(
            f"{output_dir}/constraint_results"
        )
    violations.write.mode("overwrite").parquet(f"{output_dir}/violations")
    timings["writes"] = time.time() - t

    if cfg.drift:
        t = time.time()
        spark.conf.set("spark.sql.files.maxPartitionBytes", "256m")
        cols = [c for c in cfg.drift_columns if c in meta.columns]
        # histogram bounds come from the already-persisted profiles
        # (min_num/max_num per column) — no extra scan
        prow = profiles.select("column", "min_num", "max_num").collect()
        bounds = {}
        for c in cols:
            vals = [(r.min_num, r.max_num) for r in prow if r.column == c]
            mns = [v[0] for v in vals if v[0] is not None]
            mxs = [v[1] for v in vals if v[1] is not None]
            bounds[c] = (min(mns) if mns else None, max(mxs) if mxs else None)
        hist = _materialize(histogram(meta, cols, "part_id", bounds))
        hist.write.mode("overwrite").parquet(f"{output_dir}/histograms")
        scores = ks_psi(hist, cfg.baseline_part)
        dv = drift_verdicts(scores, cfg.ks_threshold, cfg.psi_threshold)
        dv.write.mode("overwrite").parquet(f"{output_dir}/drift_results")
        timings["drift"] = time.time() - t

    # per-partition lineage + metrics rows — commit point. Row counts
    # come from the already-persisted profiles (no extra scan).
    t = time.time()
    part_rows = {
        r.part_id: r.n
        for r in profiles.groupBy("part_id").agg(F.max("n_rows").alias("n")).collect()
    }
    manifest.record_many([
        {
            "run_id": run_id, "part_id": str(pid), "status": "done",
            "started_at": t0, "n_rows": part_rows.get(pid, 0),
            "metrics": {"timings": {k: round(v, 3) for k, v in timings.items()}},
            "input_path": images_path,
        }
        for pid in pending_ids
    ])
    timings["manifest"] = time.time() - t

    for d in persisted:
        d.unpersist()
    spark.conf.set("spark.sql.files.maxPartitionBytes", orig_split)

    total_rows = sum(part_rows.values())
    elapsed = time.time() - t0
    return {
        "run_id": run_id,
        "partitions": len(pending_ids),
        "rows": total_rows,
        "elapsed_sec": round(elapsed, 3),
        "images_per_sec": round(total_rows / elapsed, 1) if elapsed > 0 else None,
        "timings": {k: round(v, 3) for k, v in timings.items()},
    }
