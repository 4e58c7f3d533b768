"""Type inference parity with the reference's six logical types
(reference Profiler.py:203-220; quirks documented in SURVEY.md §1.2)."""

from __future__ import annotations

import pandas as pd
import pytest

from advanced_data_profile_spark.operators.typeinfer import (
    FormatCache,
    apply_types,
    infer_types,
)


@pytest.fixture(scope="module")
def mixed_df(spark):
    pdf = pd.DataFrame({
        "all_null": pd.Series([None] * 6, dtype="object"),
        "ints": [1, 2, 3, 4, 5, 6],
        "float_integral": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
        "floats": [1.5, 2.25, 3.125, 4.0, 5.5, 6.75],
        "double_precision": [0.1234567, 1.23456789, 2.2, 3.3, 4.4, 5.5],
        "date_str": ["2024-01-01", "2024-02-15", "2023-12-31",
                     "2024-06-01", "2024-07-04", "2024-03-03"],
        "ts_str": ["2024-01-01 10:30:00", "2024-02-15 00:00:01",
                   "2023-12-31 23:59:59", "2024-06-01 12:00:00",
                   "2024-07-04 01:02:03", "2024-03-03 03:03:03"],
        "slash_date": ["01/15/2024", "02/20/2024", "03/25/2024",
                       "04/30/2024", "05/05/2024", "06/10/2024"],
        "numeric_str": ["10", "20", "30", "40", "50", "60"],
        "float_str": ["1.5", "2.5", "3.5", "4.5", "5.5", "6.5"],
        "pace": ["5:30", "6:15", "4:45", "5:00", "7:10", "6:40"],
        "plain": ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"],
        "bad_year": ["0001-01-01", "2024-01-01", "2024-01-02",
                     "2024-01-03", "2024-01-04", "2024-01-05"],
    })
    return spark.createDataFrame(pdf)


def test_inference(mixed_df):
    t = infer_types(mixed_df)
    assert t["all_null"].logical == "empty"
    assert t["ints"].logical == "integer"
    # all-integral float downcasts to integer (Profiler.py:533-535)
    assert t["float_integral"].logical == "integer"
    assert t["floats"].logical == "float"
    # > 6 decimal places => "double" (Profiler.py:587-588)
    assert t["double_precision"].logical == "double"
    assert t["date_str"].logical == "date"
    assert t["ts_str"].logical == "timestamp"
    assert t["slash_date"].logical == "date"
    assert t["numeric_str"].logical == "integer"
    assert t["float_str"].logical == "float"
    # the reference's pace quirk: "5:30" parses as time-of-day
    assert t["pace"].logical == "timestamp"
    assert t["plain"].logical == "string"
    # year outside [1900, 2100] fails validation (Profiler.py:139-144)
    assert t["bad_year"].logical == "string"


def test_apply_types(mixed_df):
    t = infer_types(mixed_df)
    typed = apply_types(mixed_df, t)
    d = dict(typed.dtypes)
    assert d["date_str"] == "date"
    assert d["ts_str"] == "timestamp"
    assert d["numeric_str"] == "bigint"
    assert d["float_str"] == "double"
    assert d["plain"] == "string"
    row = typed.select("date_str", "numeric_str").orderBy("numeric_str").first()
    assert str(row.date_str) == "2024-01-01"
    assert row.numeric_str == 10


def test_format_cache_roundtrip(tmp_path, mixed_df):
    path = str(tmp_path / "fmt_cache.json")
    cache = FormatCache(path)
    infer_types(mixed_df, cache=cache)
    assert cache.freq.get("yyyy-MM-dd", 0) >= 1
    reloaded = FormatCache(path)
    assert reloaded.freq == cache.freq
    # higher-frequency format ordered first
    reloaded.record("yyyy-MM-dd")
    reloaded.record("yyyy-MM-dd")
    assert reloaded.ordered(["H:mm", "yyyy-MM-dd"])[0] == "yyyy-MM-dd"


def test_format_generator_breadth(spark):
    """T1 Cartesian generator: >= 20 diverse real-world formats all
    classified date/timestamp (reference Profiler.py:97-123 sweep)."""
    import pandas as pd

    samples = {
        # fmt-name -> (values, expected logical)
        "iso": (["2024-01-02", "2023-12-31"], "date"),
        "iso_ts": (["2024-01-02 10:30:00", "2023-12-31 23:59:59"], "timestamp"),
        "iso_t": (["2024-01-02T10:30:00", "2023-12-31T23:59:59"], "timestamp"),
        "iso_millis": (["2024-01-02T10:30:00.123", "2023-12-31T23:59:59.999"], "timestamp"),
        "dotted_dmy": (["02.01.2024", "31.12.2023"], "date"),
        "dotted_dmy_ts": (["02.01.2024 10:30:00", "31.12.2023 08:00:00"], "timestamp"),
        "slash_mdy": (["01/15/2024", "12/31/2023"], "date"),
        "slash_ymd": (["2024/01/02", "2023/12/31"], "date"),
        "dash_dmy": (["02-01-2024", "31-12-2024"], "date"),
        "compact": (["20240102", "20231231"], "date"),
        "space_dmy": (["02 01 2024", "31 12 2023"], "date"),
        "mon_name": (["02 Jan 2024", "31 Dec 2023"], "date"),
        "mon_name_comma": (["Jan 02, 2024", "Dec 31, 2023"], "date"),
        "mon_d_y": (["Jan 2 2024", "Dec 31 2023"], "date"),
        "full_month": (["January 2, 2024", "December 31, 2023"], "date"),
        "d_full_month": (["2 January 2024", "31 December 2023"], "date"),
        "ampm": (["01/15/2024 1:30 PM", "12/31/2023 11:59 AM"], "timestamp"),
        "ampm_sec": (["01/15/2024 01:30:05 PM", "12/31/2023 11:59:59 AM"], "timestamp"),
        "iso_min": (["2024-01-02 10:30", "2023-12-31 23:59"], "timestamp"),
        "time_only": (["10:30:05", "23:59:59"], "timestamp"),
        "pace": (["5:30", "6:40"], "timestamp"),
        "slash_ts": (["2024/01/02 10:30:00", "2023/12/31 08:00:00"], "timestamp"),
        "two_digit_year": (["02/01/24", "31/12/23"], "date"),
    }
    assert len(samples) >= 20
    pdf = pd.DataFrame({k: v[0] for k, v in samples.items()})
    t = infer_types(spark.createDataFrame(pdf))
    bad = {
        k: t[k].logical for k, (_, want) in samples.items()
        if t[k].logical != want
    }
    assert not bad, f"misclassified: {bad}"


def test_lenient_fallback_parses_iso_variants(spark):
    """T4: strings Spark's default parser accepts (ISO with micros /
    offsets) but no explicit Cartesian pattern covers must still
    classify via the LENIENT_FORMAT last-resort candidate (the
    reference's pd.to_datetime fallback, Profiler.py:196-200)."""
    import pandas as pd

    from advanced_data_profile_spark.operators.typeinfer import (
        LENIENT_FORMAT,
        apply_types,
    )

    pdf = pd.DataFrame({
        "iso_micros_tz": ["2024-01-02T10:30:00.123456+02:00",
                          "2023-12-31T23:59:59.000001Z"] * 3,
    })
    t = infer_types(spark.createDataFrame(pdf))
    assert t["iso_micros_tz"].logical == "timestamp"
    assert t["iso_micros_tz"].datetime_format == LENIENT_FORMAT
    typed = apply_types(spark.createDataFrame(pdf), t)
    assert dict(typed.dtypes)["iso_micros_tz"] == "timestamp"
    assert typed.where(typed.iso_micros_tz.isNull()).count() == 0


def test_sample_confirm_rejects_partial_format(spark):
    # sample parses but the full column has a non-conforming tail value
    pdf = pd.DataFrame({"d": ["2024-01-01"] * 50 + ["not-a-date"]})
    t = infer_types(spark.createDataFrame(pdf).coalesce(1), sample_rows=10)
    assert t["d"].logical == "string"


def test_sparse_column_never_typed_empty(spark):
    """A column all-NULL in the seeded sample but with values in the
    full column must be confirmed full-column (same discipline as the
    datetime/numeric confirm pass), never declared 'empty'."""
    n = 5000
    pdf = pd.DataFrame({
        "sparse_num": [None] * (n - 1) + ["42"],
        "sparse_str": [None] * (n - 1) + ["hello"],
        "true_empty": pd.Series([None] * n, dtype="object"),
    })
    t = infer_types(spark.createDataFrame(pdf).coalesce(1), sample_rows=20)
    assert t["sparse_num"].logical == "integer"
    assert t["sparse_str"].logical == "string"
    assert t["true_empty"].logical == "empty"
