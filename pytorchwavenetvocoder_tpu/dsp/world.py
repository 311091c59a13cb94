"""WORLD-style acoustic analysis: [uv, cont_f0_lpf, mcep, codeap].

Provides the feature surface the reference gets from WORLD-via-sprocket
(`feature_extract.py:151-196`): per-frame F0/uv, 20 Hz low-passed
continuous F0, mel-cepstral spectral envelope, and coded band
aperiodicity, concatenated in the same column order and dimensioning
(e.g. fs=16k, mcep_dim=24 -> 1+1+25+1 = 28 = the arctic recipes' n_aux).

WORLD itself (Harvest/CheapTrick/D4C, C++) is not available; these are
original estimators with matching shapes and semantics:
  f0      — normalized-autocorrelation tracker (dsp/f0.py)
  mcep    — order-truncated warped cepstrum of the frame periodogram
            (the truncation itself acts as envelope smoothing)
  codeap  — per-band aperiodicity from the band-limited NAC at the F0 lag,
            in dB (0 = aperiodic, strongly negative = periodic), with
            WORLD's band count floor((min(15000, fs/2-3000))/3000).
"""

from __future__ import annotations

import numpy as np

from pytorchwavenetvocoder_tpu.dsp.cepstrum import sp2mc_batch
from pytorchwavenetvocoder_tpu.dsp.f0 import (
    convert_to_continuous_f0,
    extract_f0,
)
from pytorchwavenetvocoder_tpu.dsp.filters import low_pass_filter

EPS = 1e-10


def n_codeap_bands(fs: int) -> int:
    """WORLD D4C coded-aperiodicity band count for a sampling rate."""
    frequency_interval = 3000.0
    upper_limit = 15000.0
    return max(1, int(min(upper_limit, fs / 2.0 - frequency_interval)
                      / frequency_interval))


def _centered_frames(x: np.ndarray, frame_len: int, hop: int,
                     n_frames: int) -> np.ndarray:
    half = frame_len // 2
    xp = np.pad(x, (half, half + frame_len), "constant")
    idx = np.arange(frame_len)[None, :] + hop * np.arange(n_frames)[:, None]
    return xp[idx]


def spectral_envelope_mcep(x: np.ndarray, fs: int, shiftms: float,
                           fftl: int, mcep_dim: int, mcep_alpha: float,
                           n_frames: int,
                           cont_f0: np.ndarray | None = None) -> np.ndarray:
    """(n_frames, mcep_dim+1) mel-cepstra of the spectral envelope.

    With ``cont_f0``, runs the published CheapTrick algorithm
    (``dsp/cheaptrick.py`` — the reference's envelope estimator,
    `feature_extract.py:154-160`): F0-adaptive 3-period Hanning window
    with DC-bias removal, DC correction below f0, fractional-width
    2/3*f0 rectangular smoothing on the continuous frequency axis, and
    the sinc + q1=-0.15 liftering with recovery.  Without ``cont_f0``,
    falls back to fixed Hanning-window periodogram mcep.  All steps are
    vectorized over frames.
    """
    hop = int(fs * shiftms / 1000.0)
    x = np.asarray(x, np.float64)
    if cont_f0 is None:
        frames = _centered_frames(x, fftl, hop, n_frames)
        win = np.hanning(fftl)
        spec = np.abs(np.fft.rfft(frames * win[None, :], axis=1)) ** 2
        return sp2mc_batch(np.maximum(spec, EPS), mcep_dim, mcep_alpha)

    from pytorchwavenetvocoder_tpu.dsp.cheaptrick import cheaptrick

    f0 = np.asarray(cont_f0, np.float64)[:n_frames]
    if len(f0) < n_frames:
        f0 = np.pad(f0, (0, n_frames - len(f0)), "edge")
    frames = _centered_frames(x, fftl, hop, n_frames)       # (T, fftl)
    env = cheaptrick(frames, f0, fs, fftl)
    return sp2mc_batch(np.maximum(env, EPS), mcep_dim, mcep_alpha)


def band_aperiodicity(x: np.ndarray, fs: int, cont_f0: np.ndarray,
                      shiftms: float, n_frames: int) -> np.ndarray:
    """(n_frames, n_bands) coded aperiodicity in dB.

    Per band: band-pass the signal (FFT masking), frame it, and measure
    the normalized autocorrelation at the frame's F0 lag; aperiodicity
    ap = sqrt(max(0, 1 - nac)) -> 20*log10(ap), clipped to [-60, 0].
    """
    hop = int(fs * shiftms / 1000.0)
    n_bands = n_codeap_bands(fs)
    x = np.asarray(x, np.float64)
    n = len(x)
    nfft = 1
    while nfft < n:
        nfft *= 2
    spec = np.fft.rfft(x, n=nfft)
    freqs = np.fft.rfftfreq(nfft, 1.0 / fs)

    frame_len = int(0.06 * fs)  # 60 ms window covers >= 2 periods at 40 Hz
    out = np.full((n_frames, n_bands), 0.0)
    safe_f0 = np.clip(cont_f0 if cont_f0 is not None else np.zeros(n_frames),
                      40.0, fs / 4.0)
    lags = np.clip((fs / safe_f0).astype(int), 2, frame_len - 1)

    rows = np.arange(n_frames)
    for b in range(n_bands):
        lo, hi = 3000.0 * b, 3000.0 * (b + 1)
        mask = (freqs >= lo) & (freqs < hi)
        xb = np.fft.irfft(spec * mask, n=nfft)[:n]
        frames = _centered_frames(xb, frame_len, hop, n_frames)
        frames = frames - frames.mean(axis=1, keepdims=True)
        e0 = np.einsum("ij,ij->i", frames, frames) + 1e-12
        # NAC at each frame's own F0 lag, fully vectorized:
        #   numerator  = per-frame autocorrelation at lag_t (FFT)
        #   denominators = prefix/suffix energies at lag_t (cumsum)
        acl = 1
        while acl < 2 * frame_len:
            acl *= 2
        ac = np.fft.irfft(np.abs(np.fft.rfft(frames, n=acl, axis=1)) ** 2,
                          n=acl, axis=1)
        num = ac[rows, lags]
        csum = np.cumsum(frames ** 2, axis=1)
        total = csum[:, -1]
        head = csum[rows, frame_len - lags - 1]         # dot(a, a)
        tail = total - csum[rows, lags - 1]             # dot(c, c)
        nac = num / np.sqrt((head + 1e-12) * (tail + 1e-12))
        ap = np.sqrt(np.maximum(0.0, 1.0 - nac))
        out[:, b] = 20.0 * np.log10(np.maximum(ap, 1e-3))
        out[:, b] = np.where(e0 > 1e-10 * e0.max(), out[:, b], 0.0)
    return np.clip(out, -60.0, 0.0)


def world_analyze(x: np.ndarray, fs: int, shiftms: float = 5.0,
                  minf0: float = 40.0, maxf0: float = 400.0,
                  fftl: int = 1024, mcep_dim: int = 24,
                  mcep_alpha: float = 0.41) -> np.ndarray:
    """Full WORLD-style feature matrix (n_frames, 2 + mcep_dim+1 + n_bands):
    columns [uv, cont_f0_lpf, mcep..., codeap...] in the reference's
    concatenation order (`feature_extract.py:186-188`)."""
    x = np.asarray(x, np.float64)
    hop = int(fs * shiftms / 1000.0)
    n_frames = len(x) // hop + 1

    f0 = extract_f0(x, fs, minf0=minf0, maxf0=maxf0, shiftms=shiftms)
    f0 = f0[:n_frames]
    if len(f0) < n_frames:
        f0 = np.pad(f0, (0, n_frames - len(f0)))
    uv, cont_f0 = convert_to_continuous_f0(f0)
    frame_rate = int(1.0 / (shiftms * 0.001))
    cont_f0_lpf = low_pass_filter(cont_f0, frame_rate, cutoff=20)

    mcep = spectral_envelope_mcep(x, fs, shiftms, fftl, mcep_dim,
                                  mcep_alpha, n_frames, cont_f0=cont_f0)
    codeap = band_aperiodicity(x, fs, cont_f0, shiftms, n_frames)

    return np.concatenate([uv[:, None].astype(np.float64),
                           cont_f0_lpf[:, None], mcep, codeap], axis=1)
