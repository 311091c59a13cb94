"""Pseudo-speech (Klatt cascade) corpus generator sanity checks."""

import numpy as np
import pytest

from pytorchwavenetvocoder_tpu.eval.klatt import (
    make_corpus,
    synthesize_utterance,
)


def test_deterministic_and_int16():
    a = synthesize_utterance(3, seed=7)
    b = synthesize_utterance(3, seed=7)
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.int16
    assert 8000 < len(a) < 16000 * 8
    peak = np.abs(a).max()
    assert 4000 < peak < 32767  # audible, unclipped


def test_differs_per_index_and_seed():
    a = synthesize_utterance(0, seed=0)
    b = synthesize_utterance(1, seed=0)
    c = synthesize_utterance(0, seed=1)
    assert len(a) != len(b) or not np.array_equal(a, b)
    assert len(a) != len(c) or not np.array_equal(a, c)


def test_voiced_unvoiced_alternation():
    """Frame energy + zero-crossing rate must show BOTH voiced (high
    energy, low ZCR) and unvoiced/silent stretches — the structure the
    tone corpora lack."""
    x = synthesize_utterance(0).astype(np.float64) / 32768.0
    frame = 80
    n = len(x) // frame
    f = x[: n * frame].reshape(n, frame)
    energy = (f ** 2).mean(axis=1)
    zcr = (np.diff(np.signbit(f), axis=1) != 0).mean(axis=1)
    # declination makes late syllables much quieter than the loudest
    # one, so "loud" is a low fraction of the peak frame energy
    loud = energy > 0.03 * energy.max()
    quiet = energy < 0.01 * energy.max()
    assert loud.mean() > 0.2, "no sustained voicing"
    assert quiet.mean() > 0.03, "no pauses/closures"
    # among loud frames both low-ZCR (voiced) and high-ZCR (fricative)
    assert (zcr[loud] < 0.1).any()
    assert (zcr > 0.25).any(), "no noise-dominated (fricative) frames"


@pytest.mark.slow
def test_world_sees_speech_like_voicing():
    """The in-repo WORLD pipeline must see speech-like voicing and an
    F0 inside the requested per-speaker range (arctic slt conf)."""
    from pytorchwavenetvocoder_tpu.dsp.world import world_analyze

    x = synthesize_utterance(0).astype(np.float64) / 32768.0
    feats = world_analyze(x, 16000, minf0=120, maxf0=275, shiftms=5.0,
                          mcep_dim=24, mcep_alpha=0.41)
    uv, contf0 = feats[:, 0], feats[:, 1]
    assert 0.3 < uv.mean() < 0.9
    vf0 = contf0[uv > 0.5]
    assert 120 <= np.median(vf0) <= 275
    # the envelope must MOVE (formant trajectories), unlike a tone
    mc = feats[uv > 0.5, 2:26]
    assert np.abs(np.diff(mc, axis=0)).mean() > 0.02


def test_make_corpus(tmp_path):
    make_corpus(str(tmp_path), 3, fs=16000, seed=0)
    from scipy.io import wavfile

    fs, x = wavfile.read(tmp_path / "arctic_a0001.wav")
    assert fs == 16000 and x.dtype == np.int16 and len(x) > 8000
