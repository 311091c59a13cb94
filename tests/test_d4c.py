"""D4C band-aperiodicity tests (dsp/d4c.py).

Pins the static-group-delay construction (the published D4C estimator
behind the reference's codeap channels, `feature_extract.py:182`) and
its discrimination behavior on analytic signals.
"""

import numpy as np
from scipy.signal import butter, lfilter

from pytorchwavenetvocoder_tpu.dsp.d4c import (
    _static_group_delay,
    d4c,
    n_codeap_bands,
)

FS, FFTL = 16000, 1024


def _frames_of(x, hop, n, fftl=FFTL):
    half = fftl // 2
    xp = np.pad(x, (half, half + fftl))
    idx = np.arange(fftl)[None, :] + hop * np.arange(n)[:, None]
    return xp[idx]


def _harm(f0, n, fs=FS, n_harm=20):
    t = np.arange(n) / fs
    return sum(np.sin(2 * np.pi * f0 * k * t) / k
               for k in range(1, n_harm + 1))


def test_band_count_matches_world():
    assert n_codeap_bands(16000) == 1
    assert n_codeap_bands(22050) == 2
    assert n_codeap_bands(44100) == 5
    assert n_codeap_bands(48000) == 5  # 15 kHz upper limit


def test_periodic_is_floor_noise_is_near_zero():
    rng = np.random.RandomState(0)
    n, hop, T = 2 * FS, 160, 100
    f0 = np.full(T, 150.0)
    ap_h = d4c(_frames_of(_harm(150.0, n), hop, T), f0, FS, FFTL)
    ap_n = d4c(_frames_of(rng.randn(n), hop, T), f0, FS, FFTL)
    assert np.median(ap_h[10:-10]) < -40.0
    assert np.median(ap_n[10:-10]) > -4.0
    assert (ap_h >= -60.0).all() and (ap_n <= 0.0).all()


def test_unvoiced_frames_are_fully_aperiodic():
    """f0 = 0 (the raw Harvest track's unvoiced marker) -> 0 dB, the
    WORLD convention."""
    ap = d4c(_frames_of(_harm(150.0, FS), 160, 50), np.zeros(50), FS, FFTL)
    assert (ap == 0.0).all()


def test_band_discrimination_at_22050():
    """Harmonics through the 3-kHz center + noise over the 6-kHz center
    must separate the two coarse bands by far more than the 0.5 dB the
    pipeline needs."""
    fs2 = 22050
    rng = np.random.RandomState(1)
    n = 2 * fs2
    t = np.arange(n) / fs2
    x_low = sum(np.sin(2 * np.pi * 150 * k * t) / k for k in range(1, 30))
    b, a = butter(4, 6500 / (fs2 / 2), "high")
    x = x_low + 0.5 * lfilter(b, a, rng.randn(n))
    T = 100
    ap = d4c(_frames_of(x, int(fs2 * 0.005), T), np.full(T, 150.0),
             fs2, FFTL)
    low = np.median(ap[10:-10, 0])
    high = np.median(ap[10:-10, 1])
    assert low < high - 5.0, (low, high)
    assert high > -10.0, high


def test_static_group_delay_is_static_for_periodic():
    """Structural: the f0/2-smoothed power-weighted group delay of a
    periodic signal varies far less across frequency than noise's."""
    rng = np.random.RandomState(2)
    n, hop, T = 2 * FS, 160, 40
    f0 = np.full(T, 150.0)
    sgd_h = _static_group_delay(_frames_of(_harm(150.0, n), hop, T),
                                f0, FS, FFTL)
    sgd_n = _static_group_delay(_frames_of(rng.randn(n), hop, T),
                                f0, FS, FFTL)
    band = slice(64, FFTL // 2 - 64)  # avoid edges
    var_h = np.median(np.std(sgd_h[:, band], axis=1))
    var_n = np.median(np.std(sgd_n[:, band], axis=1))
    assert var_n > 5 * var_h, (var_h, var_n)


def test_aperiodicity_monotone_in_noise_level():
    """More added noise -> less negative aperiodicity, graded over a
    1000x noise range.

    The harmonics must span the whole band: the group delay is
    scale-invariant per bin, so band regions with NO harmonic content
    read as aperiodic regardless of how quiet the noise there is (which
    is correct — aperiodicity is about gd stability, not power share).
    """
    rng = np.random.RandomState(3)
    n, hop, T = 2 * FS, 160, 60
    f0 = np.full(T, 150.0)
    x = _harm(150.0, n, n_harm=52)  # harmonics to Nyquist
    noise = rng.randn(n)
    meds = []
    for lvl in (0.001, 0.01, 0.1, 3.0):
        ap = d4c(_frames_of(x + lvl * noise, hop, T), f0, FS, FFTL)
        meds.append(np.median(ap[10:-10]))
    assert all(meds[i] < meds[i + 1] + 1e-9 for i in range(len(meds) - 1)), meds
    assert meds[0] < -30 and meds[-1] > -6, meds


def test_pulse_train_phase_robustness():
    """A pulse train is maximally periodic at every frame phase (the
    T0/8 pedestal guards the pitch-synchronous degenerate case)."""
    period = FS / 150.0
    n = 2 * FS
    x = np.zeros(n)
    x[np.round(np.arange(0, n - 1, period)).astype(int)] = 1.0
    T = 100
    ap = d4c(_frames_of(x, 160, T), np.full(T, 150.0), FS, FFTL)
    assert np.percentile(ap[10:-10], 90) < -30.0
