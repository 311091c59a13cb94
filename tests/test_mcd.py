"""MCD metric tests."""

import numpy as np
import pytest

from pytorchwavenetvocoder_tpu.eval.mcd import compute_mcd, mcd_from_wavs
from pytorchwavenetvocoder_tpu.utils import write_wav


def _speechy(seed, n=16000):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / 16000.0
    return (0.5 * np.sin(2 * np.pi * 150 * t)
            + 0.2 * np.sin(2 * np.pi * 300 * t)
            + 0.05 * rng.randn(n))


def test_mcd_zero_for_identical():
    x = _speechy(0)
    assert compute_mcd(x, x, 16000) < 1e-8


def test_mcd_orders_by_similarity():
    x = _speechy(0)
    near = x + 0.01 * np.random.RandomState(1).randn(len(x))
    far = _speechy(2) * 0.3 + 0.3 * np.random.RandomState(3).randn(len(x))
    d_near = compute_mcd(x, near, 16000)
    d_far = compute_mcd(x, far, 16000)
    assert 0 < d_near < d_far


def test_mcd_shift_tolerance():
    x = _speechy(4)
    shifted = np.roll(x, 256)  # exactly one hop
    assert compute_mcd(x, shifted, 16000) < compute_mcd(
        x, shifted, 16000, shift_search=0) + 1e-9


def test_mcd_from_wavs(tmp_path):
    a, b = str(tmp_path / "a.wav"), str(tmp_path / "b.wav")
    x = _speechy(5)
    write_wav(a, x.astype(np.float32) * 0.5, 16000)
    write_wav(b, x.astype(np.float32) * 0.5, 16000)
    assert mcd_from_wavs(a, b) < 1e-6


def test_mcd_too_short_raises():
    with pytest.raises(ValueError):
        compute_mcd(np.zeros(100), np.zeros(100), 16000)


def test_mcd_dtw_absorbs_drift():
    """DTW alignment must beat a constant-offset search on a signal with
    a time-varying lag (here: a mid-signal splice that offsets the second
    half by ~1.5 hops — no single frame offset aligns both halves)."""
    x = _speechy(6, n=32000)
    drifted = np.concatenate([x[:16000], x[16000 - 384:len(x) - 384]])
    d_dtw = compute_mcd(x, drifted, 16000, align="dtw")
    d_off = compute_mcd(x, drifted, 16000, align="offset")
    assert d_dtw < d_off


def test_mcd_power_threshold_skips_silence():
    """Leading/trailing silence should not dilute the distortion average
    when power gating is on."""
    x = _speechy(7)
    y = _speechy(8) * 0.5  # different signal -> nonzero MCD
    pad = np.zeros(8000)
    xp = np.concatenate([pad, x, pad])
    yp = np.concatenate([pad, y, pad])
    d_gated = compute_mcd(xp, yp, 16000, power_threshold_db=-40.0)
    d_plain = compute_mcd(xp, yp, 16000)
    # silence frames match each other (both ~zero), pulling the ungated
    # average down; gating removes them so the distortion is honest
    assert d_gated > d_plain
    # identical signals stay ~0 under gating
    assert compute_mcd(xp, xp, 16000, power_threshold_db=-40.0) < 1e-8


def test_mcd_gating_is_gain_symmetric():
    """Each signal gates against its OWN peak: a global gain offset (a
    quieter decode) must not gate the two sides asymmetrically.  c1+ of
    the mel-cepstrum is gain-invariant, so a pure rescale stays tiny."""
    x = _speechy(9)
    quiet = 0.05 * x  # -26 dB
    d = compute_mcd(x, quiet, 16000, power_threshold_db=-40.0)
    assert d < 0.5, d


def test_mcd_rejects_unknown_align():
    x = _speechy(10)
    with pytest.raises(ValueError):
        compute_mcd(x, x, 16000, align="DTW")


def test_native_dtw_matches_numpy_spec():
    """The C++ banded DTW must reproduce the numpy implementation
    cell-for-cell (same band, same up/diag/left tie-breaking)."""
    from pytorchwavenetvocoder_tpu import native
    from pytorchwavenetvocoder_tpu.eval.mcd import _dtw_path_numpy

    if not native.dtw_available():
        pytest.skip("native library not built")
    rng = np.random.RandomState(7)
    for ta, tb, band in [(40, 40, 6), (61, 50, 4), (25, 90, 3),
                         (120, 118, 16), (2, 2, 1)]:
        a, b = rng.randn(ta, 25), rng.randn(tb, 25)
        pi, pj, pc = _dtw_path_numpy(a, b, band)
        ni, nj, nc = native.dtw_band(a, b, band)
        assert np.array_equal(pi, ni), (ta, tb, band)
        assert np.array_equal(pj, nj), (ta, tb, band)
        # same strict left-to-right distance accumulation on both sides
        # -> costs are bit-identical, not merely close
        assert np.array_equal(pc, nc), (ta, tb, band)


def test_dtw_dispatch_honors_native_kill_switch(monkeypatch):
    """WNDSP_DISABLE_NATIVE=1 must force the numpy DTW like every other
    native dispatch (regression: _dtw_path used to ignore it)."""
    from pytorchwavenetvocoder_tpu import native
    from pytorchwavenetvocoder_tpu.eval import mcd as mcd_mod

    if not native.dtw_available():
        pytest.skip("native library not built")
    monkeypatch.setenv("WNDSP_DISABLE_NATIVE", "1")

    def boom(*a, **k):  # the native path must not be consulted at all
        raise AssertionError("native.dtw_band called despite kill switch")

    monkeypatch.setattr(native, "dtw_band", boom)
    a, b = np.random.RandomState(0).randn(30, 5), np.zeros((28, 5))
    pi, pj, pc = mcd_mod._dtw_path(a, b, 4)
    assert len(pi) == len(pj) == len(pc) >= max(len(a), len(b))


def test_eval_mcd_cli(tmp_path):
    """eval_mcd.py pairs by basename, scores in parallel, writes the
    per-utterance report, and prints the machine-readable mean."""
    import subprocess
    import sys

    ref_dir = tmp_path / "ref"
    gen_dir = tmp_path / "gen"
    ref_dir.mkdir()
    gen_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(4):
        x = _speechy(i)
        write_wav(str(ref_dir / f"utt{i}.wav"), x.astype(np.float32), 16000)
        # generated = reference + small noise -> small but nonzero MCD
        write_wav(str(gen_dir / f"utt{i}.wav"),
                  (x + 0.01 * rng.randn(len(x))).astype(np.float32), 16000)
    # one unmatched generated file must be reported, not fatal
    write_wav(str(gen_dir / "orphan.wav"),
              _speechy(9).astype(np.float32), 16000)

    out = tmp_path / "mcd.txt"
    r = subprocess.run(
        [sys.executable, "-m", "pytorchwavenetvocoder_tpu.bin.eval_mcd",
         "--gen", str(gen_dir), "--ref", str(ref_dir),
         "--out", str(out), "--n_jobs", "2"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert "mean_mcd_db" in r.stdout
    mean = float(r.stdout.split("mean_mcd_db")[1].split()[0])
    assert 0.0 < mean < 3.0, mean
    lines = out.read_text().strip().splitlines()
    assert sum(1 for l in lines if l.startswith("utt")) == 4
    assert "mean" in lines[-1]


def test_eval_mcd_cli_identical_is_zero(tmp_path):
    import subprocess
    import sys

    d = tmp_path / "wavs"
    d.mkdir()
    x = _speechy(3)
    write_wav(str(d / "a.wav"), x.astype(np.float32), 16000)
    r = subprocess.run(
        [sys.executable, "-m", "pytorchwavenetvocoder_tpu.bin.eval_mcd",
         "--gen", str(d), "--ref", str(d), "--n_jobs", "1"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    mean = float(r.stdout.split("mean_mcd_db")[1].split()[0])
    assert mean < 1e-6, mean
