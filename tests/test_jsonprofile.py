"""Semi-structured JSON key profiling: type census per top-level key."""

from __future__ import annotations

import pandas as pd
import pytest

from advanced_data_profile_spark.operators.jsonprofile import (
    discover_keys,
    json_key_profile,
)


@pytest.fixture(scope="module")
def mixed_json(spark):
    rows = [
        '{"n": 1, "f": 1.5, "b": true, "s": "x", "mix": 1}',
        '{"n": 2, "f": 2.0, "b": false, "s": "y", "mix": "two"}',
        '{"n": 3, "f": -0.25, "s": "z", "nested": {"a": 1}}',
        None,
        '{"weird key!": 1, "n": 4}',
    ]
    return spark.createDataFrame(pd.DataFrame({"props": rows}))


def test_key_discovery_caps_and_filters(mixed_json):
    keys = discover_keys(mixed_json, "props")
    assert "n" in keys and "mix" in keys
    assert "weird key!" not in keys  # unsafe JSONPath keys skipped
    assert keys[0] == "n"  # most frequent first


def test_type_census(mixed_json):
    prof = {r.key: r for r in json_key_profile(mixed_json, "props").collect()}
    assert prof["n"].inferred_type == "integer"
    assert (prof["n"].n_present, prof["n"].min_num, prof["n"].max_num) == (4, 1.0, 4.0)
    assert prof["n"].present_ratio == pytest.approx(4 / 5)
    assert prof["f"].inferred_type == "double"
    assert prof["b"].inferred_type == "boolean" and prof["b"].n_boolean == 2
    assert prof["s"].inferred_type == "string"
    assert prof["mix"].inferred_type == "string"  # int + string -> string
    assert prof["nested"].inferred_type == "string"  # objects are opaque


def test_empty_and_no_json(spark):
    df = spark.createDataFrame(pd.DataFrame({"props": [None, None]}))
    assert json_key_profile(df, "props").count() == 0


def test_unsafe_keys_filtered_before_cap(spark):
    # an unsafe key that would otherwise crowd the top-max_keys must not
    # displace a safe key below the cap (filter BEFORE limit — mirrors
    # the DuckDB oracle's pre-LIMIT filter)
    rows = ['{"bad key!": 1, "ok": 2}'] * 10 + ['{"rare": 3}']
    df = spark.createDataFrame(pd.DataFrame({"props": rows}))
    keys = discover_keys(df, "props", max_keys=2)
    assert keys == ["ok", "rare"]  # 'bad key!' never consumed a slot


def test_sampled_discovery_and_explicit_key_census(spark):
    # 'rare' appears in 1/400 rows — below a 0.1% discovery sample's
    # reach at this size; a tiny threshold forces the sampled path
    rows = ['{"common": 1}'] * 399 + ['{"rare": 7, "common": 1}']
    df = spark.createDataFrame(pd.DataFrame({"props": rows}))
    sampled = discover_keys(
        df, "props", sample_threshold=100, sample_fraction=0.001
    )
    full = discover_keys(df, "props")  # below default threshold: full scan
    assert "common" in full and "rare" in full
    assert "rare" not in sampled  # rare key can fall below the sample
    # ...but the census pass is always full-table: requesting the key
    # explicitly profiles it exactly
    prof = {r.key: r for r in
            json_key_profile(df, "props", keys=["rare"]).collect()}
    assert prof["rare"].n_present == 1
    assert prof["rare"].min_num == 7.0
    assert prof["rare"].present_ratio == pytest.approx(1 / 400)


def test_discovery_n_rows_hint_skips_count(spark):
    rows = ['{"a": 1}'] * 50
    df = spark.createDataFrame(pd.DataFrame({"props": rows}))
    # hint below threshold → full-scan discovery, no count() needed
    assert discover_keys(df, "props", n_rows=50) == ["a"]
