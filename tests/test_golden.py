"""Golden-report regression test (SURVEY.md §5.3): the full pipeline's
per-partition verdicts over the canonical 4x250 fixture must match the
checked-in golden JSON exactly (counts/verdicts) and drift stats to
6 dp — the diffable analogue of the reference's golden HTML artifact."""

from __future__ import annotations

import json
import os

import pytest

from advanced_data_profile_spark.plans.pipeline import run_pipeline

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "constraint_results_4x250.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


def test_pipeline_matches_golden(spark, images_path, tmp_path_factory, golden):
    out = str(tmp_path_factory.mktemp("golden_run") / "out")
    run_pipeline(spark, images_path, out)

    res = spark.read.parquet(f"{out}/constraint_results")
    got = sorted(
        (r.part_id, r.constraint, r.kind, r.n_rows, r.n_violations, bool(r.passed))
        for r in res.collect()
    )
    want = sorted(
        (g["part_id"], g["constraint"], g["kind"], g["n_rows"],
         g["n_violations"], g["passed"])
        for g in golden["constraints"]
    )
    assert got == want

    drift = spark.read.parquet(f"{out}/drift_results")
    got_d = {
        (r.part_id, r.constraint): (bool(r.passed), float(r.ks), float(r.psi))
        for r in drift.collect()
    }
    for g in golden["drift"]:
        passed, ks, psi = got_d[(g["part_id"], g["constraint"])]
        assert passed == g["passed"]
        assert ks == pytest.approx(g["ks"], abs=1e-6)
        assert psi == pytest.approx(g["psi"], abs=1e-6)
