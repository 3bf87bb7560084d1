"""Property-based tests (hypothesis) for the codec and URL layers."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from doonop_ray.codec import (
    QSTEP,
    decode_jpeg,
    decode_png,
    encode_jpeg,
    encode_png,
    phash64,
    psnr,
)
from doonop_ray.url import canonicalize, make_absolute


@st.composite
def images(draw):
    h = draw(st.integers(1, 48))
    w = draw(st.integers(1, 48))
    seed = draw(st.integers(0, 2**31 - 1))
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


@given(images())
@settings(max_examples=30, deadline=None)
def test_png_roundtrip_any_size(pix):
    assert np.array_equal(decode_png(encode_png(pix)), pix)


@given(images())
@settings(max_examples=30, deadline=None)
def test_fake_jpeg_bounded_error_any_size(pix):
    out = decode_jpeg(encode_jpeg(pix))
    assert out.shape == pix.shape
    assert np.abs(out.astype(int) - pix.astype(int)).max() <= QSTEP
    assert psnr(pix, out) >= 40.0 or np.array_equal(pix, out)


@given(images())
@settings(max_examples=20, deadline=None)
def test_phash_in_int64_range_and_deterministic(pix):
    v = phash64(pix)
    assert np.iinfo(np.int64).min <= v <= np.iinfo(np.int64).max
    assert phash64(pix) == v


_url_chars = st.text(
    alphabet="abcdefghij0123456789-._~/?#=&%", min_size=0, max_size=30
)


@given(st.text(min_size=0, max_size=60))
@settings(max_examples=100, deadline=None)
def test_canonicalize_never_raises_and_is_idempotent(s):
    c = canonicalize(s)
    if c is not None:
        assert canonicalize(c) == c  # idempotence


@given(_url_chars)
@settings(max_examples=100, deadline=None)
def test_make_absolute_total_and_canonical(href):
    base = "https://example.com/a/b"
    a = make_absolute(base, href)
    if a is not None:
        assert canonicalize(a) == a
        assert a.startswith(("http://", "https://"))
