"""CheapTrick spectral-envelope tests (dsp/cheaptrick.py).

Pins the published constants/steps (q1 = -0.15, 3-period window,
2/3*f0 smoothing width, DC correction) and the algorithm's defining
property: the harmonic comb of a periodic source is removed while the
vocal-tract envelope is preserved.
"""

import numpy as np
from scipy.signal import lfilter

from pytorchwavenetvocoder_tpu.dsp import cheaptrick as CT

FS = 16000
FFTL = 1024


def _frames(x, hop, n_frames):
    half = FFTL // 2
    xp = np.pad(x, (half, half + FFTL))
    idx = np.arange(FFTL)[None, :] + hop * np.arange(n_frames)[:, None]
    return xp[idx]


def _pulse_train(f0, n, fs=FS):
    """Unit impulse train at f0 (flat true envelope)."""
    x = np.zeros(n)
    period = fs / f0
    x[np.round(np.arange(0, n - 1, period)).astype(int)] = 1.0
    return x


def test_published_constants():
    assert CT.Q1 == -0.15
    assert CT.DEFAULT_F0 == 500.0


def test_linear_smoothing_flat_at_edges():
    """The fractional boxcar must preserve a flat spectrum all the way
    to DC and Nyquist (regression: a 2-bin right extension truncated
    the boxcar at Nyquist, drooping the top ~f0/3 band by ~2 dB)."""
    for f0 in (100.0, 300.0, 500.0):
        v = CT._linear_smoothing(np.ones((1, FFTL // 2 + 1)),
                                 np.array([f0]), FS, FFTL)
        np.testing.assert_allclose(v[0], 1.0, rtol=1e-10)


def test_harmonic_comb_removed():
    """For a pulse train (flat envelope), the estimated envelope's
    ripple across [f0, fs/2 - f0] must be tiny compared to the ~40 dB
    peak-to-valley comb of the raw periodogram."""
    f0 = 150.0
    x = _pulse_train(f0, 2 * FS)
    n_frames = 100
    frames = _frames(x, 80, n_frames)
    env = CT.cheaptrick(frames, np.full(n_frames, f0), FS, FFTL)
    freqs = np.arange(FFTL // 2 + 1) * FS / FFTL
    band = (freqs > 2 * f0) & (freqs < FS / 2 - 2 * f0)
    log_env = 10 * np.log10(env[20:-20, band])
    ripple = log_env.max(axis=1) - log_env.min(axis=1)
    assert np.median(ripple) < 6.0, np.median(ripple)  # dB

    # the raw windowed periodogram keeps the comb (sanity contrast)
    win = CT._adaptive_window(np.full(n_frames, f0), FS, FFTL)
    raw = CT._windowed_power_spectrum(frames, win, FFTL)
    log_raw = 10 * np.log10(np.maximum(raw[20:-20, band], 1e-12))
    raw_ripple = np.median(log_raw.max(axis=1) - log_raw.min(axis=1))
    assert raw_ripple > 3 * np.median(ripple)


def test_known_filter_envelope_recovered():
    """Excite a known all-pole filter with a pulse train; the estimated
    envelope must track the filter's magnitude response (within a few
    dB over the passband), independent of where the harmonics fall."""
    f0 = 125.0
    b, a = [1.0], [1.0, -1.2, 0.8]  # resonance near 1.5 kHz
    x = lfilter(b, a, _pulse_train(f0, 2 * FS))
    n_frames = 80
    frames = _frames(x, 80, n_frames)
    env = CT.cheaptrick(frames, np.full(n_frames, f0), FS, FFTL)

    freqs = np.arange(FFTL // 2 + 1) * FS / FFTL
    w = 2 * np.pi * freqs / FS
    H = np.abs(1.0 / (1.0 - 1.2 * np.exp(-1j * w) + 0.8 * np.exp(-2j * w)))
    band = (freqs > 300) & (freqs < 6000)
    mean_env = 10 * np.log10(env[20:-20, band]).mean(axis=0)
    true = 20 * np.log10(H[band])
    # compare shapes (gain is arbitrary)
    mean_env -= mean_env.mean()
    true -= true.mean()
    err = np.abs(mean_env - true)
    assert np.median(err) < 3.0, np.median(err)


def test_dc_correction_fills_low_band():
    """Below f0 the corrected spectrum must carry the mirrored energy of
    the band above f0 instead of the window's DC leak."""
    f0 = 200.0
    n_half1 = FFTL // 2 + 1
    freqs = np.arange(n_half1) * FS / FFTL
    # energy only above f0, at 1.4-1.6 f0: its mirror at f0 lands at
    # 0.4-0.6 f0
    spec = np.where((freqs > f0 * 1.4) & (freqs < f0 * 1.6), 1.0, 1e-8)
    out = CT._dc_correction(spec[None, :], np.array([f0]), FS, FFTL)[0]
    target = (freqs > f0 * 0.45) & (freqs < f0 * 0.55)
    assert out[target].min() > 0.5
    # elsewhere below f0 (away from the mirror) stays tiny
    elsewhere = freqs < f0 * 0.3
    assert out[elsewhere].max() < 0.1
    # above f0 nothing changes
    hi = freqs > f0 * 1.2
    np.testing.assert_allclose(out[hi], spec[hi])


def test_smoothing_width_tracks_f0():
    """The rectangular smoother's width is 2/3*f0: a spectral impulse
    spreads to exactly that support (continuous axis, not bin-rounded)."""
    n_half1 = FFTL // 2 + 1
    df = FS / FFTL
    spec = np.full((1, n_half1), 1e-9)
    k0 = 256
    spec[0, k0] = 1.0
    for f0 in (120.0, 240.0):
        sm = CT._linear_smoothing(spec, np.array([f0]), FS, FFTL)[0]
        above = np.where(sm > 0.5 * sm.max())[0]
        support_hz = (above[-1] - above[0] + 1) * df
        assert abs(support_hz - (2.0 / 3.0) * f0) < 3 * df, (f0, support_hz)


def test_unvoiced_frames_use_default_f0():
    """f0 <= 0 frames run with the 500-Hz default window; the envelope
    stays finite and smooth."""
    rng = np.random.RandomState(0)
    x = rng.randn(FS)
    frames = _frames(x, 80, 50)
    env = CT.cheaptrick(frames, np.zeros(50), FS, FFTL)
    assert np.isfinite(env).all() and (env > 0).all()


def test_envelope_energy_scales_with_signal():
    x = _pulse_train(150.0, FS)
    frames = _frames(x, 80, 50)
    e1 = CT.cheaptrick(frames, np.full(50, 150.0), FS, FFTL)
    e2 = CT.cheaptrick(2.0 * frames, np.full(50, 150.0), FS, FFTL)
    ratio = e2[10:-10] / e1[10:-10]
    np.testing.assert_allclose(np.median(ratio), 4.0, rtol=0.05)
