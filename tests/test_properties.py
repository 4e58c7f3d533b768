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


from advanced_data_profile_spark.functions.audiocodec import decode_wav, encode_wav
from advanced_data_profile_spark.functions.videocodec import decode_y4m, encode_y4m


@settings(max_examples=30, deadline=None)
@given(n=st.integers(8, 4000), rate=st.sampled_from([8000, 16000, 44100]),
       bits=st.sampled_from([8, 16, 32]), seed=st.integers(0, 2**31 - 1))
def test_wav_roundtrip_any_pcm(n, rate, bits, seed):
    x = np.random.default_rng(seed).uniform(-1, 1, n)
    got_rate, got = decode_wav(encode_wav(x, rate, bits))
    assert got_rate == rate and len(got) == n
    tol = 1.5 / (1 << (bits - 1))
    assert float(np.abs(got - x).max()) <= tol


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), cut=st.integers(1, 64))
def test_truncated_wav_never_crashes(seed, cut):
    x = np.random.default_rng(seed).uniform(-1, 1, 256)
    payload = encode_wav(x, 16000)
    trunc = payload[:-cut]
    try:
        rate, got = decode_wav(trunc)
        # a cut inside the data chunk may still parse header-wise but
        # must never return MORE samples than encoded
        assert len(got) <= 256
    except ValueError:
        pass


@settings(max_examples=20, deadline=None)
@given(n_frames=st.integers(1, 8), every=st.integers(1, 4),
       seed=st.integers(0, 2**31 - 1))
def test_y4m_sampling_indexes(n_frames, every, seed):
    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, size=(8, 12, 3), dtype=np.uint8)
              for _ in range(n_frames)]
    fps, got = decode_y4m(encode_y4m(frames), every_n=every)
    assert fps == (25, 1)
    assert [i for i, _ in got] == list(range(0, n_frames, every))
    # chroma is 2x2 subsampled, so RGB only approximates; luma-derived
    # gray must track closely
    for idx, rgb in got:
        want_gray = frames[idx].astype(float) @ np.array([0.299, 0.587, 0.114])
        got_gray = rgb.astype(float) @ np.array([0.299, 0.587, 0.114])
        assert float(np.abs(want_gray - got_gray).mean()) < 6.0


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), d=st.integers(0, 3))
def test_simhash_blocks_pigeonhole_property(seed, d):
    """Random 60-bit signature pairs within hamming d ALWAYS share at
    least one of the 4 pigeonhole blocks."""
    from advanced_data_profile_spark.operators.dedup import _hamming_blocks

    rng = np.random.default_rng(seed)
    sig = int(rng.integers(0, 1 << 60))
    flip = 0
    for b in rng.choice(60, size=d, replace=False):
        flip ^= 1 << int(b)
    other = sig ^ flip
    blocks = _hamming_blocks(60, 4)
    shared = any(
        (sig >> off) & ((1 << wdt) - 1) == (other >> off) & ((1 << wdt) - 1)
        for off, wdt in blocks
    )
    assert shared


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 4000), st.integers(1, 40))
def test_chi2_sf_np_equals_scalar_property(chi2_tenths, dof):
    """Vectorized == scalar chi2_sf across the series/CF branch split
    (x < a+1 vs >=) for arbitrary small-dof inputs."""
    import numpy as np

    from advanced_data_profile_spark.functions.numeric import chi2_sf, chi2_sf_np

    x = chi2_tenths / 10.0
    v = float(chi2_sf_np(np.array([x]), np.array([float(dof)]))[0])
    s = chi2_sf(x, dof)
    assert abs(v - s) < 1e-12


@settings(max_examples=300, deadline=None)
@given(st.integers(0, 4001), st.integers(1, 97))
def test_py_round_formula_matches_cpython_property(p, q):
    """The _py_round midpoint-recovery scheme (pure-Python replay of
    the same IEEE operations the Spark expression performs) must equal
    CPython round() on arbitrary rationals at both digit widths —
    including the exact-tie family (p/q*scale landing on .5)."""
    import math

    x = p / q
    for digits, parts in ((1, (8.0, 2.0)), (2, (64.0, 32.0, 4.0))):
        scale = float(10 ** digits)
        y = x * scale
        r = math.floor(y)
        is_half = (y - r) == 0.5
        if not is_half:
            # Math.rint == round-half-even on the double itself
            import numpy as np

            n = float(np.rint(y))
        else:
            delta = x * parts[0] - y
            for pm in parts[1:]:
                delta = delta + x * pm
            if delta > 0:
                n = r + 1.0
            elif delta < 0:
                n = float(r)
            else:
                import numpy as np

                n = float(np.rint(y))
        assert n / scale == round(x, digits), (x, digits, n / scale, round(x, digits))
