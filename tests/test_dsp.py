"""DSP unit tests: mel filterbank, cepstrum transforms, F0, MLSA."""

import numpy as np


from pytorchwavenetvocoder_tpu.dsp.cepstrum import (
    b2mc,
    freqt,
    mc2b,
    mc2sp,
    mcep,
    sp2mc,
    stft_mcep,
)
from pytorchwavenetvocoder_tpu.dsp.f0 import (
    convert_to_continuous_f0,
    extract_f0,
)
from pytorchwavenetvocoder_tpu.dsp.filters import low_cut_filter, low_pass_filter
from pytorchwavenetvocoder_tpu.dsp.mlsa import mlsa_filter, mlsa_impulse_response
from pytorchwavenetvocoder_tpu.dsp.spectral import (
    hz_to_mel,
    mel_filterbank,
    mel_to_hz,
    melspectrogram,
    stft,
)
from pytorchwavenetvocoder_tpu.dsp.world import n_codeap_bands, world_analyze


# ----------------------------------------------------------- spectral


def test_mel_scale_roundtrip():
    f = np.array([0.0, 100.0, 440.0, 1000.0, 4000.0, 8000.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-10)
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f, htk=True), htk=True),
                               f, rtol=1e-10)


def test_mel_filterbank_shape_and_coverage():
    fb = mel_filterbank(16000, 1024, n_mels=80)
    assert fb.shape == (80, 513)
    # every filter has positive mass; interior fft bins are covered
    assert (fb.sum(axis=1) > 0).all()


def test_stft_tone_peak():
    fs, f_tone = 16000, 1000.0
    t = np.arange(fs) / fs
    x = np.sin(2 * np.pi * f_tone * t)
    spec = np.abs(stft(x, n_fft=1024, hop_length=256))
    peak_bin = spec[10].argmax()
    assert abs(peak_bin * fs / 1024 - f_tone) < fs / 1024


def test_melspectrogram_shape():
    fs = 16000
    x = np.random.RandomState(0).randn(fs)
    m = melspectrogram(x, fs, n_fft=1024, hop_length=80, n_mels=80)
    assert m.shape == (fs // 80 + 1, 80)
    assert (m >= 0).all()


# ----------------------------------------------------------- cepstrum


def test_freqt_identity_at_zero_alpha():
    c = np.random.RandomState(0).randn(20)
    np.testing.assert_allclose(freqt(c, 19, 0.0), c, atol=1e-12)


def test_freqt_inverse():
    c = np.random.RandomState(1).randn(16) * np.exp(-0.3 * np.arange(16))
    warped = freqt(c, 63, 0.41)
    back = freqt(warped, 15, -0.41)
    np.testing.assert_allclose(back, c, atol=1e-3)


def test_mc2b_b2mc_roundtrip():
    mc = np.random.RandomState(2).randn(26)
    b = mc2b(mc, 0.41)
    np.testing.assert_allclose(b2mc(b, 0.41), mc, atol=1e-12)


def test_sp2mc_mc2sp_reconstruction():
    """mcep of a smooth spectrum reconstructs that spectrum closely."""
    n_fft = 512
    w = np.linspace(0, np.pi, n_fft // 2 + 1)
    log_sp = 2.0 * np.cos(w) - 0.5 * np.cos(2 * w)  # smooth envelope
    sp = np.exp(log_sp)
    mc = sp2mc(sp, 30, 0.41)
    sp_rec = mc2sp(mc, 0.41, n_fft)
    np.testing.assert_allclose(np.log(sp_rec), np.log(sp), atol=0.05)


def test_mcep_gain_term_tracks_energy():
    rng = np.random.RandomState(3)
    frame = rng.randn(512) * np.hamming(512)
    mc_soft = mcep(frame * 0.1, 24, 0.41)
    mc_loud = mcep(frame * 10.0, 24, 0.41)
    # c0 is log-gain: scaling by 100 shifts c0 by log(100)
    np.testing.assert_allclose(mc_loud[0] - mc_soft[0], np.log(100.0),
                               atol=1e-6)
    np.testing.assert_allclose(mc_loud[1:], mc_soft[1:], atol=1e-6)


def test_stft_mcep_shape():
    x = np.random.RandomState(4).randn(4000)
    m = stft_mcep(x, fftl=512, shiftl=256, dim=25)
    assert m.shape == ((4000 - 512) // 256 + 1, 26)


# ----------------------------------------------------------------- f0


def test_extract_f0_on_harmonic_tone():
    fs, f_true = 16000, 150.0
    t = np.arange(int(fs * 0.6)) / fs
    x = sum(0.5 / k * np.sin(2 * np.pi * f_true * k * t) for k in range(1, 4))
    f0 = extract_f0(np.asarray(x), fs, minf0=70, maxf0=300)
    voiced = f0[f0 > 0]
    assert voiced.size > 0.8 * f0.size
    np.testing.assert_allclose(np.median(voiced), f_true, rtol=0.02)


def test_extract_f0_silence_is_unvoiced():
    f0 = extract_f0(np.zeros(8000), 16000)
    assert (f0 == 0).all()


def test_extract_f0_noise_mostly_unvoiced():
    x = np.random.RandomState(5).randn(16000)
    f0 = extract_f0(x, 16000)
    assert (f0 > 0).mean() < 0.3


def test_convert_to_continuous_f0():
    f0 = np.array([0, 0, 100, 110, 0, 0, 130, 0], np.float64)
    uv, cont = convert_to_continuous_f0(f0)
    np.testing.assert_array_equal(uv, [0, 0, 1, 1, 0, 0, 1, 0])
    assert cont[0] == 100 and cont[-1] == 130
    assert 110 < cont[5] < 130  # interpolated
    uv0, cont0 = convert_to_continuous_f0(np.zeros(5))
    assert (cont0 == 0).all()


# ---------------------------------------------------------------- mlsa


def test_mlsa_impulse_response_unit_for_zero_coef():
    h = mlsa_impulse_response(np.zeros(26), 0.41)
    np.testing.assert_allclose(h[0], 1.0, atol=1e-10)
    np.testing.assert_allclose(h[1:], 0.0, atol=1e-10)


def test_mlsa_forward_inverse_identity():
    """Noise weighting then restoration must be ~identity (the whole
    point of the stage-3/stage-6 pair in the recipes)."""
    rng = np.random.RandomState(6)
    coef = mc2b(np.concatenate([[0.0], 0.3 * rng.randn(25)
                                * np.exp(-0.2 * np.arange(25))]), 0.41)
    x = rng.randn(16000)
    y = mlsa_filter(x, -coef, 0.41)   # inverse (weighting)
    z = mlsa_filter(y, coef, 0.41)    # forward (restoration)
    err = np.abs(z - x).max() / np.abs(x).max()
    assert err < 1e-3, err


def test_mlsa_filter_shapes_spectrum():
    """The forward filter must boost where the mcep envelope is high."""
    rng = np.random.RandomState(7)
    # envelope with a strong first-cepstral tilt
    mc = np.zeros(26)
    mc[1] = 1.0
    coef = mc2b(mc, 0.41)
    x = rng.randn(32000)
    y = mlsa_filter(x, coef, 0.41)
    X = np.abs(np.fft.rfft(x))
    Y = np.abs(np.fft.rfft(y))
    gain = Y / (X + 1e-9)
    # c1 > 0 => low-frequency boost, high-frequency cut
    assert gain[: len(gain) // 8].mean() > 1.2
    assert gain[-len(gain) // 8:].mean() < 0.8


# --------------------------------------------------------------- world


def test_n_codeap_bands():
    assert n_codeap_bands(16000) == 1
    assert n_codeap_bands(22050) == 2
    assert n_codeap_bands(44100) == 5


def test_world_analyze_shapes_and_alignment():
    fs = 16000
    rng = np.random.RandomState(8)
    t = np.arange(int(fs * 0.4)) / fs
    x = np.sin(2 * np.pi * 160 * t) * 8000 + rng.randn(len(t)) * 10
    feats = world_analyze(x, fs, shiftms=5, minf0=70, maxf0=300,
                          fftl=1024, mcep_dim=24)
    hop = int(fs * 5 / 1000)
    assert feats.shape == (len(x) // hop + 1, 28)  # arctic n_aux
    uv, lf0 = feats[:, 0], feats[:, 1]
    assert set(np.unique(uv)).issubset({0.0, 1.0})
    assert uv.mean() > 0.5  # mostly voiced tone
    voiced_f0 = lf0[uv > 0]
    np.testing.assert_allclose(np.median(voiced_f0), 160, rtol=0.05)
    codeap = feats[:, -1]
    assert (codeap <= 0).all() and (codeap >= -60).all()


def test_filters_run():
    x = np.random.RandomState(9).randn(16000)
    y = low_cut_filter(x, 16000, 70)
    assert y.shape == x.shape
    z = low_pass_filter(np.abs(x), 200, cutoff=20)
    assert z.shape == x.shape


def test_mlsa_filter_tv_matches_invariant_for_constant_coefs():
    """The time-varying MLSA variant with identical per-frame coefs must
    match the time-invariant filter (up to block-edge IR truncation)."""
    from pytorchwavenetvocoder_tpu.dsp.mlsa import mlsa_filter_tv

    rng = np.random.RandomState(10)
    coef = mc2b(np.concatenate([[0.0], 0.2 * rng.randn(25)
                                * np.exp(-0.2 * np.arange(25))]), 0.41)
    x = rng.randn(4000)
    hop = 80
    coefs = np.tile(coef, (len(x) // hop + 1, 1))
    y_tv = mlsa_filter_tv(x, coefs, 0.41, hop)
    y_ti = mlsa_filter(x, coef, 0.41)
    err = np.abs(y_tv - y_ti).max() / np.abs(y_ti).max()
    assert err < 1e-3, err


def test_stft_mcep_padding_mode():
    x = np.random.RandomState(11).randn(3000)
    m = stft_mcep(x, fftl=512, shiftl=256, dim=24, is_padding=True)
    assert m.shape[1] == 25
    assert np.isfinite(m).all()
