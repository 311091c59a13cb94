"""Device Harvest tests (dsp/harvest_jax.py).

Two layers, mirroring the host suite (tests/test_harvest.py): the same
end-to-end golden criteria the reference pipeline depends on
(`feature_extract.py:154-160,179`), plus host-vs-device agreement —
the device path runs the identical algorithm in f32 with bucket-padded
FFTs, so voicing decisions and voiced-frame values must track the host
to well inside every downstream threshold.
"""

import numpy as np

from pytorchwavenetvocoder_tpu.dsp import harvest as H
from pytorchwavenetvocoder_tpu.dsp.harvest_jax import (
    harvest_jax,
    harvest_jax_many,
)

FS = 16000


def _tone(f0, seconds=2.0, harmonics=4, fs=FS):
    t = np.arange(int(seconds * fs)) / fs
    return sum(np.sin(2 * np.pi * f0 * k * t) / k
               for k in range(1, harmonics + 1)), t


def _true_at_frames(true_f0, n_frames, shiftms=5.0, fs=FS):
    idx = np.round(np.arange(n_frames) * shiftms / 1000.0 * fs).astype(int)
    return true_f0[np.clip(idx, 0, len(true_f0) - 1)]


def test_steady_tone_accuracy():
    x, _ = _tone(150.0)
    f0 = harvest_jax(x, FS, 60, 400)
    v = f0 > 0
    assert v.mean() > 0.9
    err = np.abs(f0[v] - 150.0) / 150.0
    assert np.median(err) < 1e-3, np.median(err)


def test_vibrato_tracking():
    t = np.arange(3 * FS) / FS
    inst = 180 + 20 * np.sin(2 * np.pi * 5 * t)
    ph = 2 * np.pi * np.cumsum(inst) / FS
    x = np.sin(ph) + 0.5 * np.sin(2 * ph) + 0.3 * np.sin(3 * ph)
    f0 = harvest_jax(x, FS, 60, 400)
    true = _true_at_frames(inst, len(f0))
    v = f0 > 0
    assert v.mean() > 0.9
    err = np.abs(f0[v] - true[v]) / true[v]
    assert (err > 0.05).mean() < 0.02, (err > 0.05).mean()


def test_noise_is_unvoiced():
    x = np.random.RandomState(0).randn(2 * FS)
    f0 = harvest_jax(x, FS, 60, 400)
    assert (f0 > 0).mean() < 0.1


def test_silence_is_unvoiced_and_length_convention():
    for n in [16000, 16001, 16079, 16080]:
        f0 = harvest_jax(np.zeros(n), FS, shiftms=5.0)
        assert len(f0) == n // 80 + 1
        assert (f0 == 0).all()


def test_voiced_unvoiced_segmentation():
    rng = np.random.RandomState(1)
    t = np.arange(FS // 2) / FS
    seg = np.concatenate([np.sin(2 * np.pi * 130 * t),
                          0.3 * rng.randn(FS // 2),
                          np.sin(2 * np.pi * 200 * t)])
    f0 = harvest_jax(seg, FS, 60, 400)
    hop = FS // 200
    n1, nu = (FS // 2) // hop, (FS // 2) // hop
    assert (f0[: n1 - 2] > 0).mean() > 0.9
    assert (f0[n1 + 2: n1 + nu - 2] > 0).mean() < 0.2
    assert (f0[n1 + nu + 2:] > 0).mean() > 0.9


def test_matches_host_on_modulated_harmonics():
    """Voicing decisions and voiced-frame values track the host path.

    The agreement bound is behavioral, not bitwise: f32 arithmetic and
    the padded-FFT filter bank perturb candidate scores at f32-rounding
    level, which can flip only frames already sitting on a
    voicing-decision threshold.
    """
    rng = np.random.default_rng(0)
    fs = FS
    t = np.arange(fs * 2) / fs
    f0c = 120 * (1 + 0.05 * np.sin(2 * np.pi * 3 * t))
    ph = 2 * np.pi * np.cumsum(f0c) / fs
    x = (np.sin(ph) + 0.3 * np.sin(2 * ph)
         + 0.05 * rng.standard_normal(len(t)))
    fh = H.harvest(x, fs, 71, 400)
    fj = harvest_jax(x, fs, 71, 400)
    assert fh.shape == fj.shape
    vh, vj = fh > 0, fj > 0
    assert (vh == vj).mean() > 0.995, (vh == vj).mean()
    both = vh & vj
    rel = np.abs(fj[both] - fh[both]) / fh[both]
    # measured ~1e-8 median / ~5e-8 max on the CPU backend (f32 device
    # arrays; x64 on or off) — these bounds keep 50-2000x slack while
    # still catching a lost grid match or event-precision regression
    assert np.median(rel) < 5e-7, np.median(rel)
    assert rel.max() < 1e-4, rel.max()


def test_many_matches_single_and_buckets_lengths():
    """harvest_jax_many == per-utterance harvest_jax, across utterances
    of different lengths (different sample buckets and zero-padded
    micro-batch slots must not leak between utterances)."""
    rng = np.random.default_rng(7)
    xs = []
    for seconds, f0 in [(1.0, 140.0), (2.3, 190.0), (0.7, 250.0)]:
        t = np.arange(int(seconds * FS)) / FS
        xs.append(np.sin(2 * np.pi * f0 * t)
                  + 0.2 * np.sin(4 * np.pi * f0 * t)
                  + 0.02 * rng.standard_normal(len(t)))
    many = harvest_jax_many(xs, FS, 71, 400)
    for x, got in zip(xs, many):
        one = harvest_jax(x, FS, 71, 400)
        np.testing.assert_array_equal(got, one)
        v = got > 0
        assert v.mean() > 0.8


def test_narrow_f0_range_small_channel_bank():
    """A narrow [minf0, maxf0] builds a bank with fewer channels than
    the _MAX_CANDIDATES pool width; the candidate pool must clamp to
    the channel count instead of crashing top_k (regression)."""
    x, _ = _tone(210.0)
    # log2(220/200)*24 + 1 -> 5 channels < 6-wide pool
    fj = harvest_jax(x, FS, f0_floor=200.0, f0_ceil=220.0)
    fh = H.harvest(x, FS, f0_floor=200.0, f0_ceil=220.0)
    v = fj > 0
    assert v.mean() > 0.9
    err = np.abs(fj[v] - 210.0) / 210.0
    assert np.median(err) < 1e-3, np.median(err)
    assert ((fh > 0) == (fj > 0)).mean() > 0.97


def test_long_utterance_tail_precision():
    """Host agreement must hold at the END of a long utterance too.

    Late-signal event positions reach ~2^17 samples at the 131072-sample
    bucket; carrying them as absolute f32 values loses ~0.03 samples of
    precision (the order of the sub-sample interpolation itself), which
    is why the scans carry exact int32 columns + per-column fractions.
    This pins that the last quarter of a 9 s utterance tracks the host
    as tightly as the front."""
    rng = np.random.default_rng(3)
    t = np.arange(9 * FS) / FS
    f0c = 220 * (1 + 0.04 * np.sin(2 * np.pi * 4 * t))
    ph = 2 * np.pi * np.cumsum(f0c) / FS
    x = (np.sin(ph) + 0.3 * np.sin(2 * ph)
         + 0.03 * rng.standard_normal(len(t)))
    fh = H.harvest(x, FS, 71, 400)
    fj = harvest_jax(x, FS, 71, 400)
    assert fh.shape == fj.shape
    for sl in (slice(None), slice(3 * len(fh) // 4, None)):
        vh, vj = fh[sl] > 0, fj[sl] > 0
        assert (vh == vj).mean() > 0.995, (vh == vj).mean()
        both = vh & vj
        rel = np.abs(fj[sl][both] - fh[sl][both]) / fh[sl][both]
        assert np.median(rel) < 5e-7, np.median(rel)
        assert rel.max() < 1e-4, rel.max()


def test_short_utterance_falls_back_to_host():
    """Utterances where the host adjusts f0_floor from the signal length
    route to the host path bit-exactly."""
    # 60 ms -> 480 samples at the 8 kHz analysis rate, under the
    # 3*fs8/40 = 600-sample bound where the host adjusts f0_floor
    t = np.arange(int(0.06 * FS)) / FS
    x = np.sin(2 * np.pi * 200 * t)
    got = harvest_jax(x, FS, f0_floor=40.0, f0_ceil=400.0)
    want = H.harvest(x, FS, f0_floor=40.0, f0_ceil=400.0)
    np.testing.assert_array_equal(got, want)
