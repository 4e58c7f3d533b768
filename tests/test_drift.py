"""Drift detection: KS + PSI over shared-bin histograms."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from advanced_data_profile_spark.operators.drift import (
    drift_verdicts,
    histogram,
    ks_psi,
    shared_bins,
)
from advanced_data_profile_spark.sources.images import read_images


def _two_sample_df(spark, a, b):
    pdf = pd.DataFrame({
        "grp": ["base"] * len(a) + ["new"] * len(b),
        "x": np.concatenate([a, b]).astype(float),
    })
    return spark.createDataFrame(pdf)


def test_identical_distributions_no_drift(spark):
    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, 4000)
    b = rng.normal(0, 1, 4000)
    df = _two_sample_df(spark, a, b)
    hist = histogram(df, ["x"], "grp")
    r = ks_psi(hist, "base").collect()[0]
    assert r.ks < 0.05
    assert r.psi < 0.05


def test_shifted_distribution_detected(spark):
    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, 4000)
    b = rng.normal(1.5, 1, 4000)  # strong mean shift
    df = _two_sample_df(spark, a, b)
    hist = histogram(df, ["x"], "grp")
    r = ks_psi(hist, "base").collect()[0]
    assert r.ks > 0.4
    assert r.psi > 1.0


def test_binned_ks_close_to_exact(spark):
    # binned KS approximates the exact two-sample KS from numpy sorts
    rng = np.random.default_rng(3)
    a = rng.normal(0, 1, 5000)
    b = rng.normal(0.5, 1.2, 5000)
    sa, sb = np.sort(a), np.sort(b)
    grid = np.concatenate([sa, sb])
    fa = np.searchsorted(sa, grid, side="right") / len(sa)
    fb = np.searchsorted(sb, grid, side="right") / len(sb)
    exact = float(np.max(np.abs(fa - fb)))
    df = _two_sample_df(spark, a, b)
    hist = histogram(df, ["x"], "grp", n_bins=200)
    r = ks_psi(hist, "base").collect()[0]
    assert r.ks == pytest.approx(exact, abs=0.02)


def test_fixture_drifted_partitions_flagged(spark, images_path):
    images = read_images(spark, images_path).withColumn(
        "caption_len", F.length("caption")
    )
    cols = ["w", "h", "caption_len"]
    hist = histogram(images, cols, "part_id", shared_bins(images, cols))
    verdicts = drift_verdicts(ks_psi(hist, 0)).collect()
    by = {(r.part_id, r.constraint): r.passed for r in verdicts}
    # parts 2,3 are generated drifted (DRIFT_PARTS=2 of 4); part 1 is not
    assert by[("1", "drift_w")] is True
    assert by[("2", "drift_w")] is False
    assert by[("3", "drift_w")] is False
    assert by[("2", "drift_caption_len")] is False


def test_histogram_shared_bins_across_groups(spark):
    df = _two_sample_df(spark, np.arange(100), np.arange(100) + 1000)
    bounds = shared_bins(df, ["x"])
    hist = histogram(df, ["x"], "grp", bounds, n_bins=10).collect()
    # disjoint ranges must land in disjoint shared bins
    base_bins = {r.bin for r in hist if r.grp == "base"}
    new_bins = {r.bin for r in hist if r.grp == "new"}
    assert base_bins.isdisjoint(new_bins)


def test_ks_psi_skips_empty_baseline_column(spark):
    """A column with NO baseline rows (all-NULL in the baseline
    partition, or drift_columns grew after the baseline was stored) is
    dropped from the scored set instead of emitting NULL ks/psi that a
    bool() coercion would silently turn into a FAIL."""
    rows = (
        # column x exists in baseline and new
        [("base", "x", b, 0.0, 10.0, 10) for b in range(1, 6)]
        + [("new", "x", b, 0.0, 10.0, 12) for b in range(1, 6)]
        # column y exists ONLY in the new snapshot
        + [("new", "y", b, 0.0, 10.0, 7) for b in range(1, 6)]
    )
    hist = spark.createDataFrame(
        rows, "grp string, column string, bin int, lo double, hi double, cnt long"
    )
    scores = ks_psi(hist, "base").collect()
    cols = {r.column for r in scores}
    assert cols == {"x"}
    for r in scores:
        assert r.ks is not None and r.psi is not None
