"""Mel-cepstral analysis (the SPTK surface the reference consumes).

Provides equivalents of the pysptk functions the reference calls:
``mcep`` (`feature_extract.py:144`), ``mc2b`` (`noise_shaping.py:41`) and
the ``sp2mc`` path used by sprocket for WORLD envelopes.

The mel-cepstrum here is computed by the classic two-step construction —
real cepstrum of the (floored) log spectrum, then the Oppenheim
frequency-warping recursion (``freqt``) to the all-pass-warped axis.
SPTK's ``mcep`` additionally runs Newton refinement on the UELS
criterion; the warped-cepstrum solution is its standard initialization
and is spectrally close (adequate for conditioning features and for the
averaged-mcep noise-shaping filter, which is what the framework needs).
"""

from __future__ import annotations

import numpy as np

EPS = 1e-10


def freqt(c: np.ndarray, order: int, alpha: float) -> np.ndarray:
    """Frequency-transform a cepstrum by the all-pass warping ``alpha``.

    Oppenheim recursion; (M+1,) -> (order+1,).  ``alpha > 0`` warps
    linear-frequency cepstra to mel; ``-alpha`` inverts.
    """
    c = np.asarray(c, np.float64)
    g = np.zeros(order + 1)
    beta = 1.0 - alpha * alpha
    for i in range(len(c) - 1, -1, -1):
        prev = g.copy()
        g[0] = c[i] + alpha * prev[0]
        if order >= 1:
            g[1] = beta * prev[0] + alpha * prev[1]
        for m in range(2, order + 1):
            g[m] = prev[m - 1] + alpha * (prev[m] - g[m - 1])
    return g


def mc2b(mc: np.ndarray, alpha: float) -> np.ndarray:
    """Mel-cepstrum -> MLSA filter coefficients (pysptk.mc2b)."""
    mc = np.asarray(mc, np.float64)
    b = np.zeros_like(mc)
    b[-1] = mc[-1]
    for m in range(len(mc) - 2, -1, -1):
        b[m] = mc[m] - alpha * b[m + 1]
    return b


def b2mc(b: np.ndarray, alpha: float) -> np.ndarray:
    """MLSA filter coefficients -> mel-cepstrum (inverse of mc2b)."""
    b = np.asarray(b, np.float64)
    mc = np.zeros_like(b)
    mc[-1] = b[-1]
    for m in range(len(b) - 2, -1, -1):
        mc[m] = b[m] + alpha * b[m + 1]
    return mc


def _log_spec_to_cepstrum(log_spec: np.ndarray, n_fft: int) -> np.ndarray:
    """One-sided log spectrum (n_fft//2+1,) -> real cepstrum (n_fft//2+1,)."""
    c = np.fft.irfft(log_spec, n=n_fft)
    cep = c[: n_fft // 2 + 1].copy()
    return cep


def sp2mc(power_spec: np.ndarray, order: int, alpha: float) -> np.ndarray:
    """Power spectrum (one-sided, n_fft//2+1) -> mel-cepstrum (order+1,).

    Equivalent surface of pysptk.sp2mc: cepstrum of 0.5*log(power), then
    freqt to the warped axis.
    """
    n_fft = (len(power_spec) - 1) * 2
    log_spec = 0.5 * np.log(np.maximum(power_spec, EPS))
    cep = _log_spec_to_cepstrum(log_spec, n_fft)
    # double interior terms: one-sided cepstrum of a symmetric sequence
    cep[1:-1] *= 2.0
    return freqt(cep, order, alpha)


def mc2sp(mc: np.ndarray, alpha: float, n_fft: int) -> np.ndarray:
    """Mel-cepstrum -> power spectrum (inverse of sp2mc)."""
    c = freqt(mc, n_fft // 2, -alpha)
    c[1:-1] *= 0.5  # undo one-sided doubling (Nyquist term appears once)
    full = np.zeros(n_fft)
    full[: n_fft // 2 + 1] = c
    full[n_fft // 2 + 1:] = c[1: n_fft // 2][::-1]
    log_spec = np.fft.rfft(full).real
    return np.exp(2.0 * log_spec)


def mcep(frame: np.ndarray, order: int = 24, alpha: float = 0.41,
         eps: float = EPS, n_fft: int | None = None) -> np.ndarray:
    """Mel-cepstrum of a windowed waveform frame (pysptk.mcep surface,
    etype=1 semantics: periodogram floored at ``eps``)."""
    frame = np.asarray(frame, np.float64)
    if n_fft is None:
        n_fft = len(frame)
    spec = np.abs(np.fft.rfft(frame, n=n_fft)) ** 2
    return sp2mc(np.maximum(spec, eps), order, alpha)


def stft_mcep(x: np.ndarray, fftl: int = 512, shiftl: int = 256,
              dim: int = 25, alpha: float = 0.41, window: str = "hamming",
              is_padding: bool = False) -> np.ndarray:
    """Framewise STFT mel-cepstrum (reference ``stft_mcep``,
    `feature_extract.py:116-148`): non-centered frames of length ``fftl``
    hopped by ``shiftl``, windowed, mcep per frame -> (n_frames, dim+1)."""
    import os

    from scipy.signal import get_window

    x = np.asarray(x, np.float64)
    if is_padding:
        n_pad = fftl - (len(x) - fftl) % shiftl
        x = np.pad(x, (0, n_pad), "reflect")
    if not os.environ.get("WNDSP_DISABLE_NATIVE"):
        from pytorchwavenetvocoder_tpu import native

        if native.available():
            return native.stft_mcep(x, fftl, shiftl, dim, alpha, window)
    n_frame = (len(x) - fftl) // shiftl + 1
    win = get_window(window, fftl)
    out = np.empty((n_frame, dim + 1))
    for i in range(n_frame):
        out[i] = mcep(x[shiftl * i: shiftl * i + fftl] * win, dim, alpha)
    return out
