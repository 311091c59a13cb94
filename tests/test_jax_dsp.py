"""JAX device DSP kernels vs the numpy reference implementations."""

import numpy as np



from pytorchwavenetvocoder_tpu.dsp import cepstrum as npc
from pytorchwavenetvocoder_tpu.dsp import mlsa as npm
from pytorchwavenetvocoder_tpu.dsp import spectral as nps
from pytorchwavenetvocoder_tpu.dsp.jax_dsp import (
    freqt_jax,
    melspectrogram_jax,
    mlsa_filter_jax,
    sp2mc_jax,
    stft_jax,
    stft_mcep_jax,
)


def test_stft_jax_matches_numpy():
    x = np.random.RandomState(0).randn(8000)
    ref = nps.stft(x, n_fft=512, hop_length=128)
    out = np.asarray(stft_jax(x, n_fft=512, hop_length=128))
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.abs(out), np.abs(ref), atol=1e-6)


def test_melspectrogram_jax_matches_numpy():
    fs = 16000
    x = np.random.RandomState(1).randn(fs)
    ref = nps.melspectrogram(x, fs, n_fft=1024, hop_length=80, n_mels=80)
    out = np.asarray(melspectrogram_jax(x, fs, n_fft=1024, hop_length=80,
                                        n_mels=80))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_melspectrogram_jax_batched():
    fs = 16000
    x = np.random.RandomState(2).randn(3, 4000)
    out = np.asarray(melspectrogram_jax(x, fs, hop_length=80))
    assert out.shape[0] == 3
    for b in range(3):
        np.testing.assert_allclose(
            out[b], nps.melspectrogram(x[b], fs, hop_length=80), atol=1e-5)


def test_freqt_jax_matches_numpy():
    rng = np.random.RandomState(3)
    c = rng.randn(26) * np.exp(-0.2 * np.arange(26))
    np.testing.assert_allclose(np.asarray(freqt_jax(c, 63, 0.41)),
                               npc.freqt(c, 63, 0.41), atol=1e-9)
    # batched
    cb = rng.randn(5, 26)
    out = np.asarray(freqt_jax(cb, 24, 0.41))
    for b in range(5):
        np.testing.assert_allclose(out[b], npc.freqt(cb[b], 24, 0.41), atol=1e-9)
    # tiny orders
    np.testing.assert_allclose(np.asarray(freqt_jax(c, 0, 0.41)),
                               npc.freqt(c, 0, 0.41), atol=1e-9)
    np.testing.assert_allclose(np.asarray(freqt_jax(c, 1, 0.41)),
                               npc.freqt(c, 1, 0.41), atol=1e-9)


def test_sp2mc_jax_matches_numpy():
    rng = np.random.RandomState(4)
    ps = np.exp(rng.randn(3, 257))
    out = np.asarray(sp2mc_jax(ps, 24, 0.41))
    for b in range(3):
        np.testing.assert_allclose(out[b], npc.sp2mc(ps[b], 24, 0.41), atol=1e-7)


def test_stft_mcep_jax_matches_numpy(monkeypatch):
    monkeypatch.setenv("WNDSP_DISABLE_NATIVE", "1")
    x = np.random.RandomState(5).randn(6000)
    ref = npc.stft_mcep(x, 512, 256, 25)
    out = np.asarray(stft_mcep_jax(x, 512, 256, 25))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_mlsa_filter_jax_matches_numpy(monkeypatch):
    monkeypatch.setenv("WNDSP_DISABLE_NATIVE", "1")
    rng = np.random.RandomState(6)
    coef = npc.mc2b(np.concatenate(
        [[0.0], 0.3 * rng.randn(25) * np.exp(-0.2 * np.arange(25))]), 0.41)
    x = rng.randn(8000)
    ref = npm.mlsa_filter(x, coef, 0.41)
    out = np.asarray(mlsa_filter_jax(x, coef, 0.41))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def _world_test_frames(T=40, fs=16000, fftl=1024):
    rng = np.random.RandomState(0)
    n = fftl + 80 * T
    x = (np.sin(2 * np.pi * np.cumsum(np.full(n, 170.0)) / fs)
         + 0.1 * rng.randn(n))
    f0 = 180 + 30 * np.sin(2 * np.pi * 2 * np.arange(T) / T)
    idx = np.arange(fftl)[None, :] + 80 * np.arange(T)[:, None]
    return x[idx], f0


def test_cheaptrick_jax_matches_numpy():
    from pytorchwavenetvocoder_tpu.dsp.cheaptrick import cheaptrick
    from pytorchwavenetvocoder_tpu.dsp.jax_dsp import cheaptrick_jax

    fs, fftl = 16000, 1024
    frames, f0 = _world_test_frames(fs=fs, fftl=fftl)
    ref_db = 10 * np.log10(cheaptrick(frames, f0, fs, fftl))
    # f64: bit-close
    out = np.asarray(cheaptrick_jax(frames, f0, fs, fftl))
    np.testing.assert_allclose(10 * np.log10(out), ref_db, atol=1e-7)
    # f32 (the TPU dtype): the compensated-cumsum smoothing keeps the
    # envelope within a hundredth of a dB (measured 2e-4 on CPU f32)
    out32 = np.asarray(cheaptrick_jax(frames.astype(np.float32),
                                      f0.astype(np.float32), fs, fftl))
    assert np.abs(10 * np.log10(out32.astype(np.float64)) - ref_db).max() < 0.01


def test_d4c_jax_matches_numpy():
    from pytorchwavenetvocoder_tpu.dsp.d4c import d4c
    from pytorchwavenetvocoder_tpu.dsp.jax_dsp import d4c_jax

    fs, fftl = 16000, 1024
    frames, f0 = _world_test_frames(fs=fs, fftl=fftl)
    f0[::7] = 0.0  # unvoiced rows must come back exactly 0 dB
    ref = d4c(frames, f0, fs, fftl)
    out = np.asarray(d4c_jax(frames, f0, fs, fftl))
    np.testing.assert_allclose(out, ref, atol=1e-7)
    assert np.all(out[::7] == 0.0)
    out32 = np.asarray(d4c_jax(frames.astype(np.float32),
                               f0.astype(np.float32), fs, fftl))
    # floorless smoothing + cancellation-free tail-sum ratio: ~2e-5
    assert np.abs(out32 - ref).max() < 0.01


def test_world_frames_jax_f32_at_int16_scale():
    """Full device analysis path in f32 at the real pipeline's input
    scale (int16-range floats): peak normalization + rescaled floors
    must hold parity with the f64 host pipeline to ~1e-5 (regression
    for the f32 conditioning fixes; measured 4e-6 mcep / 2e-5 codeap).
    """
    from pytorchwavenetvocoder_tpu.dsp.cheaptrick import cheaptrick
    from pytorchwavenetvocoder_tpu.dsp.d4c import d4c
    from pytorchwavenetvocoder_tpu.dsp.cepstrum import sp2mc
    from pytorchwavenetvocoder_tpu.dsp.jax_dsp import _world_frames_jax

    fs, fftl = 16000, 1024
    frames, f0 = _world_test_frames(fs=fs, fftl=fftl)
    f0u = f0.copy()
    f0u[::7] = 0.0
    fi16 = frames * 8000.0  # int16-range amplitudes
    env = cheaptrick(fi16, f0, fs, fftl)
    mcep_ref = np.stack([sp2mc(np.maximum(env[t], 1e-10), 24, 0.41)
                         for t in range(env.shape[0])])
    cod_ref = d4c(fi16, f0u, fs, fftl)
    m32, c32 = _world_frames_jax(
        fi16.astype(np.float32), f0.astype(np.float32),
        f0u.astype(np.float32), fs, fftl, 24, 0.41)
    assert np.abs(np.asarray(m32, np.float64) - mcep_ref).max() < 1e-3
    assert np.abs(np.asarray(c32, np.float64) - cod_ref).max() < 1e-3


def test_world_jax_pure_f32_regime():
    """The f32 assertions above, with x64 globally DISABLED.

    The suite's conftest enables x64, under which int-arange * float
    intermediates inside the jax kernels promote to f64 — so f32
    *inputs* alone don't pin the pure-f32 regime the TPU actually runs.
    This repeats the envelope/aperiodicity bounds with the promotion
    semantics the device sees (measured 1.7e-4 dB / 1.6e-5 here).
    """
    import jax

    from pytorchwavenetvocoder_tpu.dsp.cheaptrick import cheaptrick
    from pytorchwavenetvocoder_tpu.dsp.d4c import d4c
    from pytorchwavenetvocoder_tpu.dsp.jax_dsp import cheaptrick_jax, d4c_jax

    fs, fftl = 16000, 1024
    frames, f0 = _world_test_frames(fs=fs, fftl=fftl)
    f0u = f0.copy()
    f0u[::7] = 0.0
    ref_db = 10 * np.log10(cheaptrick(frames, f0, fs, fftl))
    cod_ref = d4c(frames, f0u, fs, fftl)
    with jax.enable_x64(False):
        env32 = np.asarray(cheaptrick_jax(frames.astype(np.float32),
                                          f0.astype(np.float32), fs, fftl))
        cod32 = np.asarray(d4c_jax(frames.astype(np.float32),
                                   f0u.astype(np.float32), fs, fftl))
    assert np.abs(10 * np.log10(env32.astype(np.float64))
                  - ref_db).max() < 0.01
    assert np.abs(cod32 - cod_ref).max() < 0.01
    assert np.all(cod32[::7] == 0.0)


def test_world_analyze_jax_many_matches_single():
    """Cross-utterance frame batching == per-utterance analysis.

    device_batch=64 forces several device slices whose boundaries fall
    inside utterances, exercising the concatenate/pad/split bookkeeping.
    """
    from pytorchwavenetvocoder_tpu.dsp.jax_dsp import (
        world_analyze_jax, world_analyze_jax_many)

    fs = 16000
    rng = np.random.RandomState(7)
    xs = []
    for dur, f0 in [(0.31, 120.0), (0.44, 200.0), (0.23, 90.0)]:
        t = np.arange(int(fs * dur)) / fs
        xs.append(np.sin(2 * np.pi * f0 * t) + 0.01 * rng.randn(len(t)))

    many = world_analyze_jax_many(xs, fs, minf0=60, maxf0=300,
                                  device_batch=64)
    for x, got in zip(xs, many):
        ref = world_analyze_jax(x, fs, minf0=60, maxf0=300)
        assert got.shape == ref.shape
        # XLA reduction order differs between batch shapes (64 vs the
        # single path's 256 bucket) -> not bit-exact, but ~1e-6 in f64
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)
