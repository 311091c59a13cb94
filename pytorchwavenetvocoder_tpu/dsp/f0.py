"""F0 estimation and continuous-F0 interpolation.

Replaces the WORLD (Harvest/DIO) F0 analysis the reference reaches via
sprocket (`feature_extract.py:154-183`).  WORLD itself is a C++
dependency that is not available; this is an original normalized-
autocorrelation tracker with the same *surface*: frame-rate F0 in Hz with
0 for unvoiced frames, bounded by (minf0, maxf0), at a ``shiftms`` hop.

``convert_to_continuous_f0`` mirrors the reference helper
(`feature_extract.py:80-113`): binary uv flag + linear interpolation of
voiced F0 across unvoiced gaps, with edge values held.
"""

from __future__ import annotations

import numpy as np


def convert_to_continuous_f0(f0: np.ndarray):
    """(T,) f0-with-zeros -> (uv (T,), continuous f0 (T,))."""
    f0 = np.asarray(f0, np.float64).copy()
    uv = np.float32(f0 != 0)
    if (f0 == 0).all():
        return uv, f0

    nz = np.nonzero(f0)[0]
    start_idx, end_idx = nz[0], nz[-1]
    f0[:start_idx] = f0[start_idx]
    f0[end_idx:] = f0[end_idx]
    nz = np.nonzero(f0)[0]
    cont_f0 = np.interp(np.arange(len(f0)), nz, f0[nz])
    return uv, cont_f0


def _frame_autocorr(frames: np.ndarray, max_lag: int) -> np.ndarray:
    """Normalized autocorrelation per frame via FFT (n_frames, max_lag+1)."""
    n = frames.shape[1]
    n_fft = 1
    while n_fft < 2 * n:
        n_fft *= 2
    spec = np.fft.rfft(frames, n=n_fft, axis=1)
    ac = np.fft.irfft(np.abs(spec) ** 2, n=n_fft, axis=1)[:, : max_lag + 1]
    return ac


def extract_f0(x: np.ndarray, fs: int, minf0: float = 40.0,
               maxf0: float = 400.0, shiftms: float = 5.0,
               voicing_threshold: float = 0.45) -> np.ndarray:
    """Frame-rate F0 track in Hz; 0 marks unvoiced frames.

    Method: per frame, normalized autocorrelation (NAC) over the lag range
    [fs/maxf0, fs/minf0]; the NAC peak with parabolic interpolation gives
    the period; voicing = NAC peak above threshold AND frame energy above
    a relative floor; 3-tap median smoothing plus octave-error correction
    against the frame-median F0.
    """
    x = np.asarray(x, np.float64)
    x = x - np.mean(x)
    hop = int(fs * shiftms / 1000.0)
    min_lag = max(2, int(fs / maxf0))
    max_lag = int(np.ceil(fs / minf0))
    frame_len = min(len(x), 2 * max_lag + hop)
    if len(x) < frame_len or frame_len <= max_lag:
        n_frames = max(1, len(x) // hop + 1)
        return np.zeros(n_frames)

    # centered frames, edge-padded
    half = frame_len // 2
    xp = np.pad(x, (half, half + frame_len), "constant")
    n_frames = len(x) // hop + 1
    idx = np.arange(frame_len)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = xp[idx]

    ac = _frame_autocorr(frames, max_lag)
    energy = ac[:, 0] + 1e-12

    # NAC with a mild lag-window to de-bias long lags
    lags = np.arange(max_lag + 1)
    norm = np.maximum(1e-12, 1.0 - lags / frame_len)
    nac = ac / energy[:, None] / norm[None, :]
    nac[:, :min_lag] = -1.0

    peak_lag = np.argmax(nac[:, : max_lag + 1], axis=1)
    peak_val = nac[np.arange(n_frames), peak_lag]

    # parabolic interpolation around the integer peak
    l0 = np.clip(peak_lag, min_lag + 1, max_lag - 1)
    y_m = nac[np.arange(n_frames), l0 - 1]
    y_0 = nac[np.arange(n_frames), l0]
    y_p = nac[np.arange(n_frames), l0 + 1]
    denom = y_m - 2 * y_0 + y_p
    safe_denom = np.where(np.abs(denom) > 1e-12, denom, 1.0)
    delta = np.where(np.abs(denom) > 1e-12, 0.5 * (y_m - y_p) / safe_denom, 0.0)
    delta = np.clip(delta, -0.5, 0.5)
    lag_ref = np.where(peak_lag == l0, l0 + delta, peak_lag).astype(np.float64)

    f0 = fs / np.maximum(lag_ref, 1.0)
    # voicing decision: correlation + energy gates
    energy_floor = 1e-4 * np.max(energy)
    voiced = (peak_val > voicing_threshold) & (energy > energy_floor)
    f0 = np.where(voiced & (f0 >= minf0) & (f0 <= maxf0), f0, 0.0)

    # median smoothing (3-tap) over voiced runs to kill single-frame spikes
    f0_s = f0.copy()
    for t in range(1, n_frames - 1):
        window = f0[t - 1: t + 2]
        if np.all(window > 0):
            f0_s[t] = np.median(window)
    # halving/doubling correction vs the voiced median
    voiced_vals = f0_s[f0_s > 0]
    if voiced_vals.size:
        med = np.median(voiced_vals)
        for t in range(n_frames):
            if f0_s[t] > 0:
                if f0_s[t] > 1.8 * med and f0_s[t] / 2 >= minf0:
                    f0_s[t] /= 2.0
                elif f0_s[t] < 0.55 * med and f0_s[t] * 2 <= maxf0:
                    f0_s[t] *= 2.0
    return f0_s
