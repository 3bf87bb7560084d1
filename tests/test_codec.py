import numpy as np
import pytest

from doonop_ray.codec import (
    QSTEP,
    decode_image,
    decode_png,
    encode_image,
    encode_png,
    hamming64,
    phash64,
    psnr,
)


def _rand_img(seed=0, h=23, w=31):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_png_roundtrip_lossless():
    pix = _rand_img()
    out = decode_png(encode_png(pix))
    assert out.shape == pix.shape
    assert np.array_equal(out, pix)
    assert psnr(pix, out) == float("inf")


def test_png_signature_and_determinism():
    pix = _rand_img(1)
    a, b = encode_png(pix), encode_png(pix)
    assert a == b and a[:8] == b"\x89PNG\r\n\x1a\n"


def test_fake_jpeg_lossy_but_over_40db():
    pix = _rand_img(2)
    out = decode_image(encode_image(pix, "jpeg"), "jpeg")
    assert out.shape == pix.shape
    assert np.abs(out.astype(int) - pix.astype(int)).max() <= QSTEP
    p = psnr(pix, out)
    assert 40.0 <= p < float("inf")


def test_phash_stability_and_distance():
    a = _rand_img(3)
    assert phash64(a) == phash64(a)
    near = a.copy()
    near[0, 0] ^= 1
    assert hamming64(phash64(a), phash64(near)) <= 2
    b = _rand_img(4)
    assert hamming64(phash64(a), phash64(b)) > 4
    assert np.iinfo(np.int64).min <= phash64(a) <= np.iinfo(np.int64).max


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png(b"nope")
    with pytest.raises(ValueError):
        decode_image(b"nope", "jpeg")
