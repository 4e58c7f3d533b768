"""Property-based tests (hypothesis): codec roundtrips and statistic
invariants hold for arbitrary inputs, not just the fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from advanced_data_profile_spark.functions.imagecodec import (
    decode_bmp,
    decode_raw,
    encode_bmp,
    encode_raw,
    pixel_hash,
    psnr,
)
from advanced_data_profile_spark.operators.plotdata import _norm_ppf

dims = st.integers(min_value=1, max_value=40)


@settings(max_examples=40, deadline=None)
@given(w=dims, h=dims, seed=st.integers(0, 2**31 - 1))
def test_raw_roundtrip_any_dims(w, h, seed):
    px = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_raw(encode_raw(px), w, h), px)


@settings(max_examples=40, deadline=None)
@given(w=dims, h=dims, seed=st.integers(0, 2**31 - 1))
def test_bmp_roundtrip_any_dims(w, h, seed):
    px = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = decode_bmp(encode_bmp(px), w, h)
    assert np.array_equal(out, px)


@settings(max_examples=30, deadline=None)
@given(w=dims, h=dims, seed=st.integers(0, 2**31 - 1),
       cut=st.integers(min_value=1, max_value=8))
def test_truncated_bmp_always_rejected(w, h, seed, cut):
    px = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    payload = encode_bmp(px)
    try:
        decode_bmp(payload[:-cut], w, h)
        raise AssertionError("truncated payload decoded")
    except ValueError:
        pass


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_psnr_properties(seed):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    b = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    assert psnr(a, a) == 99.0
    p = psnr(a, b)
    assert 0.0 <= p <= 99.0
    assert psnr(a, b) == psnr(b, a)  # symmetric


@settings(max_examples=50, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_pixel_hash_nonnegative_and_stable(seed):
    px = np.random.default_rng(seed).integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    h1, h2 = pixel_hash(px), pixel_hash(px.copy())
    assert h1 == h2
    assert 0 <= h1 < (1 << 63)


@settings(max_examples=60, deadline=None)
@given(p=st.floats(min_value=1e-6, max_value=1 - 1e-6, allow_nan=False))
def test_norm_ppf_monotone_and_symmetric(p):
    v = _norm_ppf(p)
    assert _norm_ppf(1 - p) == -v or abs(_norm_ppf(1 - p) + v) < 1e-9
    if p < 0.5:
        assert v < 0
    eps = min(p / 2, (1 - p) / 2, 1e-4)
    assert _norm_ppf(p + eps) >= v  # monotone
