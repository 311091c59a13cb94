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

    With ``cont_f0``, uses F0-ADAPTIVE analysis in the spirit of WORLD's
    CheapTrick (the reference's envelope estimator,
    `feature_extract.py:154-160`): a 3-pitch-period Hanning window per
    frame, rectangular spectral smoothing of width 2/3*f0, and the
    sinc + q1-compensation liftering that removes the interference of
    the harmonic structure — the envelope is then nearly ripple-free
    between harmonics instead of following the periodogram's comb.
    Without ``cont_f0``, falls back to fixed Hanning-window periodogram
    mcep.  All steps are vectorized over frames.
    """
    hop = int(fs * shiftms / 1000.0)
    x = np.asarray(x, np.float64)
    if cont_f0 is None:
        frames = _centered_frames(x, fftl, hop, n_frames)
        win = np.hanning(fftl)
        spec = np.abs(np.fft.rfft(frames * win[None, :], axis=1)) ** 2
        return sp2mc_batch(np.maximum(spec, EPS), mcep_dim, mcep_alpha)

    f0 = np.asarray(cont_f0, np.float64)[:n_frames]
    if len(f0) < n_frames:
        f0 = np.pad(f0, (0, n_frames - len(f0)), "edge")
    # CheapTrick's working F0 range: too-low/unvoiced F0 gets the floor
    # implied by the fft size (window must fit 3 periods)
    f0_floor = 3.0 * fs / fftl
    f0 = np.clip(np.where(f0 > 0, f0, 160.0), f0_floor, fs / 8.0)

    # ---- per-frame 3-period Hanning window (vectorized) ----------------
    half_win = np.minimum((1.5 * fs / f0).astype(int), fftl // 2 - 1)
    frames = _centered_frames(x, fftl, hop, n_frames)       # (T, fftl)
    idx = np.arange(fftl)[None, :] - fftl // 2              # centered taps
    in_win = np.abs(idx) <= half_win[:, None]
    # Hanning over the 2*half_win+1 support
    win = np.where(in_win,
                   0.5 + 0.5 * np.cos(np.pi * idx / (half_win[:, None] + 1)),
                   0.0)
    win /= np.sqrt(np.sum(win ** 2, axis=1, keepdims=True)) + 1e-12
    spec = np.abs(np.fft.rfft(frames * win, axis=1)) ** 2   # (T, fftl/2+1)

    # ---- rectangular spectral smoothing of width 2/3 * f0 --------------
    n_half1 = fftl // 2 + 1
    df = fs / fftl
    w_bins = np.maximum(1, np.round((2.0 / 3.0) * f0 / df).astype(int))
    # reflect-pad so the boxcar is well-defined at the edges
    pad = int(w_bins.max()) + 1
    sp_pad = np.pad(spec, ((0, 0), (pad, pad)), "reflect")
    csum = np.cumsum(sp_pad, axis=1)
    rows = np.arange(n_frames)[:, None]
    k = np.arange(n_half1)[None, :] + pad
    lo = k - (w_bins[:, None] // 2) - 1
    hi = k + ((w_bins[:, None] - 1) // 2)
    smoothed = (csum[rows, hi] - csum[rows, lo]) / w_bins[:, None]
    smoothed = np.maximum(smoothed, EPS)

    # ---- liftering (CheapTrick eq. 13-15): sinc lifter removes the
    # residual harmonic interference, q1-compensation restores the
    # envelope tilt the smoothing flattened (q1 = -0.15) ---------------
    cep = np.fft.irfft(np.log(smoothed), n=fftl, axis=1)    # (T, fftl)
    q = np.arange(fftl) * (1.0 / fs)
    q = np.minimum(q, fftl / fs - q)                        # symmetric axis
    arg = np.pi * f0[:, None] * q[None, :]
    sinc = np.where(arg > 1e-9, np.sin(np.maximum(arg, 1e-9)) / np.maximum(arg, 1e-9), 1.0)
    q1 = -0.15
    comp = (1.0 - 2.0 * q1) + 2.0 * q1 * np.cos(2.0 * arg)
    env = np.exp(np.fft.rfft(cep * sinc * comp, axis=1).real)
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
