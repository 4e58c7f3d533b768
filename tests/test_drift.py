"""Drift detection: KS + PSI over shared-bin histograms."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from advanced_data_profile_spark.operators.drift import (
    drift_from_sketches,
    drift_from_stored_state,
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


# ---------------------------------------------------------------- sketches


def _part_sketches(spark, arr, n_parts=4, column="x", label_offset=0):
    pdf = pd.DataFrame({
        "x": np.asarray(arr, dtype=float),
        "part_id": [f"p{label_offset + (i % n_parts)}" for i in range(len(arr))],
    })
    df = spark.createDataFrame(pdf)
    return df.groupBy("part_id").agg(
        F.kll_sketch_agg_double(F.col("x"), F.lit(200)).alias("kll")
    ).select("part_id", F.lit(column).alias("column"), "kll")


def _exact_ks(a, b):
    sa, sb = np.sort(a), np.sort(b)
    grid = np.concatenate([sa, sb])
    fa = np.searchsorted(sa, grid, side="right") / len(sa)
    fb = np.searchsorted(sb, grid, side="right") / len(sb)
    return float(np.max(np.abs(fa - fb)))


def test_sketch_drift_within_rank_error_of_exact(spark):
    # KS from merged KLL sketches must sit within the documented bound
    # (2 x ~1.65% sketch rank error + 2/n_grid ~= 0.05) of the exact
    # two-sample KS — on both a drifted and a null pair
    rng = np.random.default_rng(11)
    a = rng.normal(0, 1, 20000)
    b = np.concatenate([rng.normal(0.35, 1.25, 15000), rng.normal(0, 1, 5000)])
    c = rng.normal(0, 1, 20000)
    ska = _part_sketches(spark, a)
    skb = _part_sketches(spark, b)
    skc = _part_sketches(spark, c)
    drifted = drift_from_sketches(ska, skb).collect()[0]
    null = drift_from_sketches(ska, skc).collect()[0]
    assert abs(drifted.ks - _exact_ks(a, b)) <= 0.05
    assert abs(null.ks - _exact_ks(a, c)) <= 0.05
    assert drifted.psi > 5 * null.psi  # separation, not just bounds
    assert drifted.n_base == 20000 and drifted.n_cur == 20000


def test_sketch_drift_from_stored_state_detects_one_partition(spark, tmp_path):
    # the point of persisted state: drift ONE partition after the
    # baseline was stored, and detect it from the sketch relations
    # alone — no raw data in scope at check time
    rng = np.random.default_rng(12)
    base = _part_sketches(spark, rng.normal(0, 1, 16000), n_parts=4)
    base_path = str(tmp_path / "base_sketches")
    base.write.partitionBy("part_id").parquet(base_path)
    # current snapshot: parts q0..q2 match baseline dist, q3 drifted
    cur_ok = _part_sketches(spark, rng.normal(0, 1, 12000), n_parts=3)
    cur_bad = _part_sketches(spark, rng.normal(2.0, 1, 4000), n_parts=1,
                             label_offset=3)
    cur_path = str(tmp_path / "cur_sketches")
    cur_ok.unionByName(cur_bad).withColumn(
        "part_id", F.regexp_replace("part_id", "p", "q")
    ).write.partitionBy("part_id").parquet(cur_path)

    full = drift_from_stored_state(spark, base_path, cur_path).collect()[0]
    assert full.psi > 0.05  # 25% of rows shifted by 2 sigma

    # subset comparison: the clean parts alone show no drift; the bad
    # part alone screams — all from stored state
    clean = drift_from_stored_state(
        spark, base_path, cur_path, cur_parts=["q0", "q1", "q2"]
    ).collect()[0]
    bad = drift_from_stored_state(
        spark, base_path, cur_path, cur_parts=["q3"]
    ).collect()[0]
    assert clean.ks < 0.05 and clean.psi < 0.05
    assert bad.ks > 0.5 and bad.psi > 1.0


def test_sketch_drift_column_handling(spark):
    # columns missing on either side are unscorable and dropped
    # (inner-join contract, same as ks_psi's empty-baseline filter);
    # NULL sketch rows (non-numeric columns) are ignored; constant
    # columns score 0 drift
    rng = np.random.default_rng(13)
    a = _part_sketches(spark, rng.normal(0, 1, 2000), column="shared")
    a2 = _part_sketches(spark, np.full(2000, 7.0), column="const")
    a_only = _part_sketches(spark, rng.normal(0, 1, 500), column="gone")
    null_row = a.limit(1).select(
        "part_id", F.lit("strcol").alias("column"),
        F.lit(None).cast("binary").alias("kll"),
    )
    b = _part_sketches(spark, rng.normal(0, 1, 2000), column="shared")
    b2 = _part_sketches(spark, np.full(2000, 7.0), column="const")
    out = drift_from_sketches(
        a.unionByName(a2).unionByName(a_only).unionByName(null_row),
        b.unionByName(b2),
    )
    rows = {r.column: r for r in out.collect()}
    assert set(rows) == {"shared", "const"}
    assert rows["const"].ks == 0.0 and abs(rows["const"].psi) < 1e-9
    assert rows["shared"].ks < 0.05


def test_sketch_drift_between_runs_pipeline_surface(spark, tmp_path):
    # the run-level wiring: two pipeline-shaped sketch-state dirs
    # (part_id, column, kll, hll), verdicts written under the current
    # run's output dir in drift_verdicts shape
    from advanced_data_profile_spark.plans.pipeline import (
        sketch_drift_between_runs,
    )

    rng = np.random.default_rng(21)
    base_out = str(tmp_path / "run1")
    cur_out = str(tmp_path / "run2")
    hll = F.hll_sketch_agg(F.col("x").cast("string")).alias("hll")
    for out, arr in ((base_out, rng.normal(0, 1, 8000)),
                     (cur_out, rng.normal(3.0, 1, 8000))):
        pdf = pd.DataFrame({"x": arr, "part_id": np.arange(len(arr)) % 4})
        sk = spark.createDataFrame(pdf).groupBy("part_id").agg(
            F.kll_sketch_agg_double(F.col("x"), F.lit(200)).alias("kll"), hll
        ).select(F.col("part_id").cast("string").alias("part_id"),
                 F.lit("w").alias("column"), "kll", "hll")
        sk.write.partitionBy("part_id").parquet(f"{out}/profile_sketches")

    dv, scores = sketch_drift_between_runs(spark, base_out, cur_out)
    rows = dv.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.part_id == "__snapshot__" and r.constraint == "drift_w"
    assert r.passed is False and r.ks > 0.5
    stored = spark.read.parquet(f"{cur_out}/sketch_drift_results").collect()
    assert len(stored) == 1 and stored[0].passed is False
    scores.unpersist()


# ------------------------------------------------------------ categorical


def test_categorical_drift_detects_frequency_shift(spark):
    from advanced_data_profile_spark.operators.drift import (
        categorical_counts,
        categorical_psi_chi2,
    )

    rows = (
        [("base", "a")] * 500 + [("base", "b")] * 400 + [("base", "c")] * 100
        # new snapshot: mass moved from a to c, plus a NEW category d
        + [("new", "a")] * 200 + [("new", "b")] * 400
        + [("new", "c")] * 300 + [("new", "d")] * 100
        # null snapshot: same as baseline
        + [("same", "a")] * 500 + [("same", "b")] * 400 + [("same", "c")] * 100
    )
    df = spark.createDataFrame(rows, "grp0 string, cat string")
    counts = categorical_counts(df, ["cat"], "grp0")
    out = {r.grp: r for r in categorical_psi_chi2(counts, "base").collect()}
    assert out["new"].psi > 0.3 and out["new"].chi2 > 100
    assert out["new"].n_categories == 4  # the new category is in frame
    assert out["same"].psi < 1e-6 and out["same"].chi2 < 1e-6
    assert out["same"].dof == 2  # only a,b,c exist in this pair


def test_categorical_drift_null_sentinel(spark):
    from advanced_data_profile_spark.operators.drift import (
        categorical_counts,
        categorical_psi_chi2,
    )

    rows = (
        [("base", "x")] * 90 + [("base", None)] * 10
        + [("new", "x")] * 50 + [("new", None)] * 50  # null-rate spike
    )
    df = spark.createDataFrame(rows, "grp0 string, cat string")
    counts = categorical_counts(df, ["cat"], "grp0")
    cats = {r.category for r in counts.collect()}
    assert "__null__" in cats
    r = categorical_psi_chi2(counts, "base").collect()[0]
    assert r.psi > 0.5  # the null-rate shift IS drift


def test_chi2_pvalue_on_categorical_scores(spark):
    from advanced_data_profile_spark.operators.drift import (
        categorical_counts,
        categorical_psi_chi2,
        with_chi2_pvalue,
    )

    rows = (
        [("base", "a")] * 500 + [("base", "b")] * 500
        + [("new", "a")] * 300 + [("new", "b")] * 700   # strong shift
        + [("same", "a")] * 495 + [("same", "b")] * 505  # noise-level
    )
    df = spark.createDataFrame(rows, "grp0 string, cat string")
    scores = categorical_psi_chi2(categorical_counts(df, ["cat"], "grp0"), "base")
    out = {r.grp: r for r in with_chi2_pvalue(scores).collect()}
    assert out["new"].p_value < 1e-9       # real shift: decisively rejected
    assert out["same"].p_value > 0.5       # noise: not significant
    # dof=1 here; sanity vs the published critical value
    from advanced_data_profile_spark.functions.numeric import chi2_sf

    assert abs(chi2_sf(3.841, 1) - 0.05) < 2e-3


def test_chi2_sf_reference_values():
    from advanced_data_profile_spark.functions.numeric import chi2_sf

    for crit, dof, alpha in [
        (3.841, 1, 0.05), (5.991, 2, 0.05), (9.488, 4, 0.05),
        (6.635, 1, 0.01), (15.086, 5, 0.01), (18.307, 10, 0.05),
    ]:
        assert abs(chi2_sf(crit, dof) - alpha) < 2e-3
    assert chi2_sf(0.0, 3) == 1.0
    assert chi2_sf(1e6, 2) == 0.0
    import pytest

    with pytest.raises(ValueError):
        chi2_sf(1.0, 0)


def test_chi2_sf_np_matches_scalar_and_large_dof():
    """Vectorized path == scalar path on a grid spanning both the
    series and continued-fraction branches, including dof in the tens
    of thousands (where the old fixed 500-iteration cap silently
    truncated — the scaled caps must converge to a real value)."""
    import math

    import numpy as np

    from advanced_data_profile_spark.functions.numeric import chi2_sf, chi2_sf_np

    dofs = [1, 2, 5, 10, 100, 1000, 20000, 50000]
    chis = []
    ds = []
    for d in dofs:
        for mult in (0.1, 0.5, 0.9, 1.0, 1.1, 2.0, 5.0):
            chis.append(d * mult)
            ds.append(d)
    got = chi2_sf_np(np.array(chis), np.array(ds))
    for g, c, d in zip(got, chis, ds):
        s = chi2_sf(c, d)
        assert math.isfinite(s), (c, d)  # scaled caps: no NaN truncation
        assert abs(g - s) < 1e-10, (c, d, g, s)
    # dof=50000, chi2=dof sits just above the median: p slightly < 0.5
    p = chi2_sf(50000.0, 50000)
    assert 0.45 < p < 0.51
    # invalid dof -> NaN (not a raise) in the vectorized batch path
    bad = chi2_sf_np(np.array([1.0, 5.0, -1.0]), np.array([0.0, np.nan, 3.0]))
    assert np.isnan(bad[0]) and np.isnan(bad[1]) and bad[2] == 1.0


def test_stored_state_scores_equal_built_state(spark, tmp_path):
    """drift_from_stored_state over persisted sketch parquet must score
    IDENTICALLY to drift_from_sketches over the in-memory relations the
    parquet was written from — the round-trip through storage changes
    nothing (same merged sketches, same grid, same edges)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    pdf = pd.DataFrame({
        "part_id": (np.arange(4000) % 5).astype(str),
        "value": np.concatenate(
            [rng.normal(0, 1, 2000), rng.normal(0.6, 1.3, 2000)]
        ),
        "half": ["a"] * 2000 + ["b"] * 2000,
    })
    df = spark.createDataFrame(pdf)
    sk = df.groupBy("half", "part_id").agg(
        F.kll_sketch_agg_double("value", F.lit(200)).alias("kll")
    ).withColumn("column", F.lit("value"))
    base = sk.where(F.col("half") == "a").drop("half")
    cur = sk.where(F.col("half") == "b").drop("half")
    # persist to parquet, then compare scored outputs row-for-row
    bp, cp = str(tmp_path / "base"), str(tmp_path / "cur")
    base.write.parquet(bp)
    cur.write.parquet(cp)
    mem = drift_from_sketches(base, cur).collect()[0]
    stored = drift_from_stored_state(spark, bp, cp).collect()[0]
    # counts are EXACT through the round trip; ks/psi agree within the
    # sketch's own rank-error budget (KLL merge is order-dependent in
    # its compaction randomness, and the parquet read order differs
    # from the in-memory order — estimates are equal only within the
    # documented error bounds, not bit-identical)
    assert (mem.n_base, mem.n_cur) == (stored.n_base, stored.n_cur) == (2000, 2000)
    assert abs(mem.ks - stored.ks) <= 0.05
    assert abs(mem.psi - stored.psi) <= 0.05
    assert mem.ks > 0.1 and stored.ks > 0.1  # the planted shift is detected


def test_chi2_sf_wilson_hilferty_continuity():
    """The exact-iterative and Wilson-Hilferty regimes must agree where
    they meet: values just under the dof threshold (exact branch) vs
    the WH formula evaluated at the same points sit within the
    documented ~1e-4 absolute accuracy, so crossing the threshold can
    never flip a drift verdict."""
    from advanced_data_profile_spark.functions.numeric import (
        _WH_DOF_THRESHOLD,
        _chi2_sf_wh,
        chi2_sf,
    )

    d = _WH_DOF_THRESHOLD - 1  # exact branch
    for mult in (0.95, 0.99, 1.0, 1.01, 1.05):
        exact = chi2_sf(d * mult, d)
        wh = _chi2_sf_wh(d * mult, d)
        assert abs(exact - wh) < 5e-4, (mult, exact, wh)
    # above the threshold the scalar takes the WH path outright and
    # must be finite and sensible even at dof ~10^6 (the old cap-500
    # silent truncation / O(dof) loop territory)
    import math
    import time

    t0 = time.time()
    p = chi2_sf(1_000_000.0, 1_000_000)
    assert time.time() - t0 < 0.1  # no O(dof) loop
    assert math.isfinite(p) and 0.45 < p < 0.52
