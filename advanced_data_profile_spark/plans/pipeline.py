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
from advanced_data_profile_spark.operators.drift import drift_verdicts, histogram, ks_psi, shared_bins
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

    t = time.time()
    profiles = profile(
        meta.drop("bytes"),
        group_by="part_id",
        approx=cfg.approx,
    )
    profiles.write.mode("overwrite").partitionBy("part_id").parquet(
        f"{output_dir}/column_profiles"
    )
    timings["profile"] = time.time() - t

    t = time.time()
    ref = phash_ref if phash_ref is not None else phash_reference(images)
    results, violations = C.evaluate(
        df, image_checks(ref, cfg), part_col="part_id",
        sample_violations=cfg.sample_violations,
    )
    if cfg.validate_images:
        results = results.unionByName(validation_verdicts(validate_payloads(df)))
    results.write.mode("overwrite").partitionBy("part_id").parquet(
        f"{output_dir}/constraint_results"
    )
    violations.write.mode("overwrite").parquet(f"{output_dir}/violations")
    timings["constraints"] = time.time() - t

    if cfg.drift:
        t = time.time()
        cols = [c for c in cfg.drift_columns if c in meta.columns]
        bounds = shared_bins(meta, cols)
        hist = histogram(meta, cols, "part_id", bounds)
        hist.write.mode("overwrite").parquet(f"{output_dir}/histograms")
        scores = ks_psi(hist, cfg.baseline_part)
        dv = drift_verdicts(scores, cfg.ks_threshold, cfg.psi_threshold)
        dv.write.mode("overwrite").parquet(f"{output_dir}/drift_results")
        timings["drift"] = time.time() - t

    # per-partition lineage + metrics rows — commit point
    t = time.time()
    part_rows = {
        r.part_id: r.n
        for r in df.groupBy("part_id").agg(F.count(F.lit(1)).alias("n")).collect()
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
