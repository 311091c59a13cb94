"""Mu-law codec tests (parity target: reference wavenet.py:17-47)."""

import numpy as np
import pytest

from pytorchwavenetvocoder_tpu.ops.mulaw import (
    decode_mu_law,
    decode_mu_law_jax,
    encode_mu_law,
    encode_mu_law_jax,
)


def _reference_encode(x, mu=256):
    # literal transcription of the published mu-law formula the reference
    # uses, as an independent oracle
    mu = mu - 1
    fx = np.sign(x) * np.log(1 + mu * np.abs(x)) / np.log(1 + mu)
    return np.floor((fx + 1) / 2 * mu + 0.5).astype(np.int64)


def _reference_decode(y, mu=256):
    mu = mu - 1
    fx = (y - 0.5) / mu * 2 - 1
    return np.sign(fx) / mu * ((1 + mu) ** np.abs(fx) - 1)


@pytest.mark.parametrize("mu", [256, 512, 1024])
def test_encode_matches_reference_formula(mu):
    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, 10000).astype(np.float32)
    np.testing.assert_array_equal(encode_mu_law(x, mu), _reference_encode(x, mu))


@pytest.mark.parametrize("mu", [256, 512])
def test_decode_matches_reference_formula(mu):
    y = np.arange(mu)
    np.testing.assert_allclose(decode_mu_law(y, mu), _reference_decode(y, mu),
                               rtol=1e-12)


def test_range_and_roundtrip():
    rng = np.random.RandomState(1)
    x = rng.uniform(-1, 1, 50000).astype(np.float32)
    y = encode_mu_law(x)
    assert y.min() >= 0 and y.max() <= 255
    x_hat = decode_mu_law(y)
    # 8-bit companding error bound (the reference decode has a half-step
    # offset, so error near |x|=1 reaches ~4.5%)
    assert np.abs(x - x_hat).max() < 0.05


def test_jax_variants_match_numpy():
    rng = np.random.RandomState(2)
    x = rng.uniform(-1, 1, 4096).astype(np.float32)
    y_np = encode_mu_law(x)
    y_jx = np.asarray(encode_mu_law_jax(x))
    np.testing.assert_array_equal(y_np, y_jx)
    np.testing.assert_allclose(decode_mu_law(y_np),
                               np.asarray(decode_mu_law_jax(y_jx)),
                               rtol=1e-5, atol=1e-6)


def test_extreme_values():
    # note: encode(0) = floor(0.5*255 + 0.5) = 128 (round-half-up rule)
    np.testing.assert_array_equal(encode_mu_law(np.array([-1.0, 0.0, 1.0])),
                                  [0, 128, 255])
