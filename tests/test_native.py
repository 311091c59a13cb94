"""Native C++ DSP library (native/wndsp.cc) parity tests vs the numpy
reference implementations.  Skipped when the library isn't built."""

import numpy as np
import pytest

from pytorchwavenetvocoder_tpu import native
from pytorchwavenetvocoder_tpu.dsp import cepstrum as npc
from pytorchwavenetvocoder_tpu.dsp import mlsa as npm
from pytorchwavenetvocoder_tpu.ops import mulaw as npmu

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libwndsp.so not built (make -C native)")


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def test_freqt_parity(rng):
    c = rng.randn(26) * np.exp(-0.2 * np.arange(26))
    np.testing.assert_allclose(native.freqt(c, 63, 0.41),
                               npc.freqt(c, 63, 0.41), atol=1e-12)
    np.testing.assert_allclose(native.freqt(c, 15, -0.41),
                               npc.freqt(c, 15, -0.41), atol=1e-12)


def test_mc2b_b2mc_parity(rng):
    c = rng.randn(26)
    np.testing.assert_allclose(native.mc2b(c, 0.41), npc.mc2b(c, 0.41), atol=1e-12)
    np.testing.assert_allclose(native.b2mc(c, 0.41), npc.b2mc(c, 0.41), atol=1e-12)


def test_sp2mc_and_mcep_parity(rng):
    ps = np.exp(rng.randn(257))
    np.testing.assert_allclose(native.sp2mc(ps, 24, 0.41),
                               npc.sp2mc(ps, 24, 0.41), atol=1e-9)
    frame = rng.randn(512) * np.hamming(512)
    np.testing.assert_allclose(native.mcep(frame, 24, 0.41),
                               npc.mcep(frame, 24, 0.41), atol=1e-9)


def test_stft_mcep_parity(rng, monkeypatch):
    monkeypatch.setenv("WNDSP_DISABLE_NATIVE", "1")  # numpy side of compare
    x = rng.randn(6000)
    np.testing.assert_allclose(native.stft_mcep(x, 512, 256, 25),
                               npc.stft_mcep(x, 512, 256, 25), atol=1e-9)


def test_mlsa_parity(rng, monkeypatch):
    monkeypatch.setenv("WNDSP_DISABLE_NATIVE", "1")
    coef = npc.mc2b(np.concatenate(
        [[0.0], 0.3 * rng.randn(25) * np.exp(-0.2 * np.arange(25))]), 0.41)
    np.testing.assert_allclose(native.mlsa_impulse_response(coef, 0.41),
                               npm.mlsa_impulse_response(coef, 0.41), atol=1e-9)
    x = rng.randn(16000)
    np.testing.assert_allclose(native.mlsa_filter(x, coef, 0.41),
                               npm.mlsa_filter(x, coef, 0.41), atol=1e-7)


def test_mulaw_parity(rng):
    x = rng.uniform(-1, 1, 10000)
    np.testing.assert_array_equal(native.encode_mu_law(x),
                                  npmu.encode_mu_law(x))
    np.testing.assert_allclose(native.decode_mu_law(np.arange(256)),
                               npmu.decode_mu_law(np.arange(256)), rtol=1e-12)


def test_dsp_dispatch_uses_native(rng):
    """dsp.mlsa_filter with native available must equal the numpy path."""
    coef = npc.mc2b(np.concatenate(
        [[0.0], 0.2 * rng.randn(25) * np.exp(-0.2 * np.arange(25))]), 0.41)
    x = rng.randn(4000)
    import os

    os.environ.pop("WNDSP_DISABLE_NATIVE", None)
    y_native_path = npm.mlsa_filter(x, coef, 0.41)
    os.environ["WNDSP_DISABLE_NATIVE"] = "1"
    try:
        y_numpy_path = npm.mlsa_filter(x, coef, 0.41)
    finally:
        os.environ.pop("WNDSP_DISABLE_NATIVE", None)
    np.testing.assert_allclose(y_native_path, y_numpy_path, atol=1e-7)
