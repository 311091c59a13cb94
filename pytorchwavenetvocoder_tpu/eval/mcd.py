"""Mel-cepstral distortion (MCD) — the framework's fidelity metric.

BASELINE.md's north star requires "waveform MCD parity vs reference
checkpoints"; this module provides the measurement: framewise
mel-cepstra of both signals (excluding the gain term c0) compared with
the standard 10*sqrt(2)/ln(10) scaling, with a small ±frame search to
absorb constant decoding offsets.
"""

from __future__ import annotations

import numpy as np

from pytorchwavenetvocoder_tpu.dsp.cepstrum import stft_mcep

MCD_CONST = 10.0 * np.sqrt(2.0) / np.log(10.0)


def compute_mcd(x_ref: np.ndarray, x_gen: np.ndarray, fs: int,
                mcep_dim: int = 24, mcep_alpha: float = 0.41,
                fftl: int = 512, shift_search: int = 2) -> float:
    """MCD in dB between two waveforms (lower is better; ~0 = identical).

    Frames both signals (hop = fftl//2), drops c0 (gain), and returns the
    best mean frame MCD over a small ±``shift_search`` frame offset.
    """
    shiftl = fftl // 2
    n = min(len(x_ref), len(x_gen))
    if n < fftl * 2:
        raise ValueError("signals too short for MCD")
    x_ref = np.asarray(x_ref, np.float64)[:n]
    x_gen = np.asarray(x_gen, np.float64)[:n]

    mc_ref = stft_mcep(x_ref, fftl, shiftl, mcep_dim, mcep_alpha)[:, 1:]
    mc_gen = stft_mcep(x_gen, fftl, shiftl, mcep_dim, mcep_alpha)[:, 1:]

    best = np.inf
    for off in range(-shift_search, shift_search + 1):
        if off >= 0:
            a, b = mc_ref[off:], mc_gen[: mc_gen.shape[0] - off]
        else:
            a, b = mc_ref[:off], mc_gen[-off:]
        m = min(a.shape[0], b.shape[0])
        if m == 0:
            continue
        d = np.sqrt(np.sum((a[:m] - b[:m]) ** 2, axis=1))
        best = min(best, float(np.mean(MCD_CONST * d)))
    return best


def mcd_from_wavs(ref_path: str, gen_path: str, mcep_dim: int = 24,
                  mcep_alpha: float = 0.41) -> float:
    """MCD between two wav files (must share a sampling rate)."""
    from pytorchwavenetvocoder_tpu.utils import read_wav

    x_ref, fs1 = read_wav(ref_path, dtype="float64")
    x_gen, fs2 = read_wav(gen_path, dtype="float64")
    assert fs1 == fs2, "sampling rates differ"
    return compute_mcd(x_ref, x_gen, fs1, mcep_dim, mcep_alpha)
