"""Harvest F0 estimator tests (dsp/harvest.py).

The published algorithm (Morise 2017) is pinned at two levels: the
structural steps (Nuttall band-pass bank, four event trains,
instantaneous-frequency refinement, contour fixing) and the end-to-end
accuracy/voicing behavior the reference pipeline depends on
(`feature_extract.py:154-160,179`).
"""

import numpy as np
import pytest

from pytorchwavenetvocoder_tpu.dsp import harvest as H

FS = 16000


def _tone(f0, seconds=2.0, harmonics=4, fs=FS):
    t = np.arange(int(seconds * fs)) / fs
    return sum(np.sin(2 * np.pi * f0 * k * t) / k
               for k in range(1, harmonics + 1)), t


def _true_at_frames(true_f0, n_frames, shiftms=5.0, fs=FS):
    idx = np.round(np.arange(n_frames) * shiftms / 1000.0 * fs).astype(int)
    return true_f0[np.clip(idx, 0, len(true_f0) - 1)]


def test_steady_tone_accuracy():
    """Median relative error on a steady harmonic tone must be in the
    instantaneous-frequency-refinement class (<0.1%), far beyond the
    frame/lag quantization of autocorrelation methods."""
    x, _ = _tone(150.0)
    f0 = H.harvest(x, FS, 60, 400)
    v = f0 > 0
    assert v.mean() > 0.9
    err = np.abs(f0[v] - 150.0) / 150.0
    assert np.median(err) < 1e-3, np.median(err)


def test_vibrato_tracking():
    t = np.arange(3 * FS) / FS
    inst = 180 + 20 * np.sin(2 * np.pi * 5 * t)
    ph = 2 * np.pi * np.cumsum(inst) / FS
    x = np.sin(ph) + 0.5 * np.sin(2 * ph) + 0.3 * np.sin(3 * ph)
    f0 = H.harvest(x, FS, 60, 400)
    true = _true_at_frames(inst, len(f0))
    v = f0 > 0
    assert v.mean() > 0.9
    err = np.abs(f0[v] - true[v]) / true[v]
    assert (err > 0.05).mean() < 0.02, (err > 0.05).mean()


def test_octave_jump_followed():
    t = np.arange(3 * FS) / FS
    inst = np.where(t < 1.5, 120.0, 240.0)
    ph = 2 * np.pi * np.cumsum(inst) / FS
    x = np.sin(ph) + 0.4 * np.sin(2 * ph)
    f0 = H.harvest(x, FS, 60, 400)
    true = _true_at_frames(inst, len(f0))
    v = f0 > 0
    err = np.abs(f0[v] - true[v]) / true[v]
    assert (err > 0.05).mean() < 0.05


def test_noise_is_unvoiced():
    x = np.random.RandomState(0).randn(3 * FS)
    f0 = H.harvest(x, FS, 60, 400)
    assert (f0 > 0).mean() < 0.1


def test_silence_is_unvoiced():
    f0 = H.harvest(np.zeros(FS), FS)
    assert (f0 == 0).all()


def test_voiced_unvoiced_segmentation():
    rng = np.random.RandomState(1)
    t = np.arange(FS) / FS
    seg = np.concatenate([np.sin(2 * np.pi * 130 * t),
                          0.3 * rng.randn(FS // 2),
                          np.sin(2 * np.pi * 200 * t)])
    f0 = H.harvest(seg, FS, 60, 400)
    hop = FS // 200
    n1, nu = FS // hop, (FS // 2) // hop
    assert (f0[: n1 - 2] > 0).mean() > 0.9
    assert (f0[n1 + 2: n1 + nu - 2] > 0).mean() < 0.2
    assert (f0[n1 + nu + 2:] > 0).mean() > 0.9


def test_additive_noise_robustness():
    x, _ = _tone(150.0, harmonics=5)
    x = x + 0.3 * np.random.RandomState(2).randn(len(x))  # ~10 dB SNR
    f0 = H.harvest(x, FS, 60, 400)
    v = f0 > 0
    assert v.mean() > 0.8
    err = np.abs(f0[v] - 150.0) / 150.0
    assert (err > 0.05).mean() < 0.02


def test_output_length_convention():
    for n in [16000, 16001, 16079, 16080]:
        f0 = H.harvest(np.zeros(n), FS, shiftms=5.0)
        assert len(f0) == n // 80 + 1


def test_four_event_trains_agree_on_periodic_signal():
    """Structural: the four event trains (both zero-crossing polarities,
    peaks, dips) of a band-passed periodic signal all estimate the
    fundamental."""
    x, _ = _tone(120.0, harmonics=1)
    trains = H._four_event_tracks_all(np.asarray(x)[None], float(FS))[0]
    tracks, valid = H._tracks_from_trains(list(trains),
                                          np.arange(0.2, 1.8, 0.001))
    assert tracks is not None and valid.all()
    np.testing.assert_allclose(tracks, 120.0, rtol=0.02)


def test_refinement_beats_interval_quantization():
    """Structural: the instantaneous-frequency refinement recovers an
    off-grid frequency to <0.1% from deliberately coarse candidates."""
    fs8 = 8000.0
    t = np.arange(int(2 * fs8)) / fs8
    true = 173.7
    x8 = np.sin(2 * np.pi * true * t) + 0.4 * np.sin(2 * np.pi * 2 * true * t)
    t_axis = np.arange(0.3, 1.7, 0.001)
    cand = np.full((len(t_axis), 1), 170.0)  # 2% off on purpose
    ref, score = H._refine_candidates(x8, fs8, t_axis, cand)
    v = ref[:, 0] > 0
    assert v.mean() > 0.95
    err = np.abs(ref[v, 0] - true) / true
    assert np.median(err) < 1e-3
    assert np.median(score[v, 0]) < 0.01


def test_refinement_scores_separate_noise():
    """Structural: the harmonic-consistency score separates periodic
    content from noise by at least 3x (this is the voicing feature)."""
    fs8 = 8000.0
    rng = np.random.RandomState(3)
    t = np.arange(int(2 * fs8)) / fs8
    tone = np.sin(2 * np.pi * 140 * t) + 0.5 * np.sin(2 * np.pi * 280 * t)
    noise = rng.randn(len(t))
    t_axis = np.arange(0.3, 1.7, 0.001)
    cand = np.full((len(t_axis), 1), 140.0)
    _, sc_tone = H._refine_candidates(tone, fs8, t_axis, cand)
    _, sc_noise = H._refine_candidates(noise, fs8, t_axis, cand)
    assert np.median(sc_noise[:, 0]) > 3 * np.median(sc_tone[:, 0])


def test_min_voiced_run_removed():
    """Contour fixing drops voiced runs shorter than the 9-ms minimum."""
    T = 100
    cand_f0 = np.zeros((T, 2))
    cand_sc = np.full((T, 2), np.inf)
    cand_f0[40:45, 0] = 150.0   # 5 ms: too short
    cand_sc[40:45, 0] = 0.001
    cand_f0[60:80, 0] = 150.0   # 20 ms: kept
    cand_sc[60:80, 0] = 0.001
    f0 = H._fix_contour(cand_f0, cand_sc, 60, 400)
    assert (f0[40:45] == 0).all()
    assert (f0[60:80] > 0).all()


def test_extension_respects_continuity_bound():
    """Extension walks through the candidate pool but refuses steps
    larger than the 18% continuity bound."""
    T = 60
    cand_f0 = np.zeros((T, 2))
    cand_sc = np.full((T, 2), np.inf)
    cand_f0[10:30, 0] = 150.0
    cand_sc[10:30, 0] = 0.001
    # frames 30-40 hold a plausible continuation the threshold rejected
    cand_f0[30:40, 0] = 152.0
    cand_sc[30:40, 0] = 0.03
    # frames 40+: only a far-off candidate -> extension must stop
    cand_f0[40:, 0] = 300.0
    cand_sc[40:, 0] = 0.03
    f0 = H._fix_contour(cand_f0, cand_sc, 60, 400)
    assert (f0[30:40] == 152.0).all()
    assert (f0[40:50] == 0).all()


def test_extract_f0_dispatch():
    from pytorchwavenetvocoder_tpu.dsp.f0 import extract_f0

    x, _ = _tone(150.0, seconds=1.0)
    fh = extract_f0(x, FS, minf0=60, maxf0=400, method="harvest")
    fn = extract_f0(x, FS, minf0=60, maxf0=400, method="nac")
    for f in (fh, fn):
        v = f > 0
        assert v.mean() > 0.8
        assert abs(np.median(f[v]) - 150.0) < 5.0
    with pytest.raises(ValueError):
        extract_f0(x, FS, method="dio")
