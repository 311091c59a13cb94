"""Mel-cepstral distortion (MCD) — the framework's fidelity metric.

BASELINE.md's north star requires "waveform MCD parity vs reference
checkpoints"; this module provides the measurement: framewise
mel-cepstra of both signals (excluding the gain term c0) compared with
the standard 10*sqrt(2)/ln(10) scaling.

Alignment: AR vocoders drift in time relative to the reference (the
one-sample seed offset, MLSA group delay, and any frame-rate rounding
all shift frames), so a fixed offset is not enough for a parity
instrument.  Default alignment is frame-level DTW (band-constrained,
symmetric step pattern) over the c0-free mel-cepstra; per-path-cell mean
is the standard speech-synthesis MCD.  ``align="offset"`` keeps the
cheaper ±frame-offset search for smoke use.  Low-energy (silence) frames
can be excluded via ``power_threshold_db`` so long silences do not
dilute the average.
"""

from __future__ import annotations

import numpy as np

from pytorchwavenetvocoder_tpu.dsp.cepstrum import stft_mcep

MCD_CONST = 10.0 * np.sqrt(2.0) / np.log(10.0)


def _dtw_mean_cost(a: np.ndarray, b: np.ndarray, band: int) -> float:
    """Mean Euclidean frame distance along the best DTW path.

    Symmetric steps (diag/up/left), Sakoe-Chiba band of ``band`` frames
    around the diagonal.  Returns mean local cost over path cells so
    longer paths are not penalized (the standard MCD averaging).
    """
    Ta, Tb = a.shape[0], b.shape[0]
    band = max(band, abs(Ta - Tb) + 1)
    INF = np.inf
    # cost[i, j] = min cumulative cost to align a[:i+1], b[:j+1]
    acc = np.full((Ta, Tb), INF)
    steps = np.zeros((Ta, Tb), np.int32)  # path length in cells
    # local distances inside the band only
    for i in range(Ta):
        lo = max(0, i * Tb // Ta - band)
        hi = min(Tb, i * Tb // Ta + band + 1)
        d = np.sqrt(np.sum((b[lo:hi] - a[i]) ** 2, axis=1))
        if i == 0:
            acc[0, lo:hi] = np.cumsum(d)
            steps[0, lo:hi] = np.arange(1, hi - lo + 1)
            continue
        for j, dj in zip(range(lo, hi), d):
            best, bsteps = INF, 0
            if acc[i - 1, j] < best:
                best, bsteps = acc[i - 1, j], steps[i - 1, j]
            if j > 0:
                if acc[i - 1, j - 1] < best:
                    best, bsteps = acc[i - 1, j - 1], steps[i - 1, j - 1]
                if acc[i, j - 1] < best:
                    best, bsteps = acc[i, j - 1], steps[i, j - 1]
            if best < INF:
                acc[i, j] = best + dj
                steps[i, j] = bsteps + 1
    if not np.isfinite(acc[-1, -1]):
        raise ValueError("DTW band too narrow for these lengths")
    return float(acc[-1, -1] / steps[-1, -1])


def compute_mcd(x_ref: np.ndarray, x_gen: np.ndarray, fs: int,
                mcep_dim: int = 24, mcep_alpha: float = 0.41,
                fftl: int = 512, shift_search: int = 2,
                align: str = "dtw", dtw_band: int = 16,
                power_threshold_db: float | None = None) -> float:
    """MCD in dB between two waveforms (lower is better; ~0 = identical).

    Frames both signals (hop = fftl//2), drops c0 (gain).  With
    ``align="dtw"`` (default) frames are DTW-aligned within a
    ±``dtw_band``-frame band; ``align="offset"`` takes the best constant
    offset in ±``shift_search`` frames.  ``power_threshold_db`` (e.g.
    -40) drops reference frames whose energy is more than that many dB
    below the loudest frame before aligning.
    """
    shiftl = fftl // 2
    n = min(len(x_ref), len(x_gen))
    if n < fftl * 2:
        raise ValueError("signals too short for MCD")
    x_ref = np.asarray(x_ref, np.float64)[:n]
    x_gen = np.asarray(x_gen, np.float64)[:n]

    mc_ref = stft_mcep(x_ref, fftl, shiftl, mcep_dim, mcep_alpha)
    mc_gen = stft_mcep(x_gen, fftl, shiftl, mcep_dim, mcep_alpha)

    if power_threshold_db is not None:
        # c0 is the log-gain: threshold relative to the loudest frame
        thr = mc_ref[:, 0].max() + power_threshold_db * np.log(10.0) / 20.0
        keep_ref = mc_ref[:, 0] >= thr
        keep_gen = mc_gen[:, 0] >= thr
        if keep_ref.sum() >= 2 and keep_gen.sum() >= 2:
            mc_ref = mc_ref[keep_ref]
            mc_gen = mc_gen[keep_gen]

    mc_ref = mc_ref[:, 1:]
    mc_gen = mc_gen[:, 1:]

    if align == "dtw":
        return MCD_CONST * _dtw_mean_cost(mc_ref, mc_gen, dtw_band)

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
                  mcep_alpha: float = 0.41, **kwargs) -> float:
    """MCD between two wav files (must share a sampling rate)."""
    from pytorchwavenetvocoder_tpu.utils import read_wav

    x_ref, fs1 = read_wav(ref_path, dtype="float64")
    x_gen, fs2 = read_wav(gen_path, dtype="float64")
    assert fs1 == fs2, "sampling rates differ"
    return compute_mcd(x_ref, x_gen, fs1, mcep_dim, mcep_alpha, **kwargs)
