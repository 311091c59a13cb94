"""jit-compiled JAX parity kernels for the host DSP.

Device-side (XLA) implementations of the feature transforms, validated
against the numpy reference implementations in this package
(tests/test_jax_dsp.py).  These let feature extraction run batched on
the TPU when preprocessing throughput matters, and serve as the
"bit-close JAX parity transforms" companion to the host path
(SURVEY.md §7 step 2).

All functions are shape-polymorphic-jit (retrace per shape) and operate
on batches where noted.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from pytorchwavenetvocoder_tpu.dsp.spectral import mel_filterbank


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "center"))
def stft_jax(x: jnp.ndarray, n_fft: int = 1024, hop_length: int = 256,
             center: bool = True) -> jnp.ndarray:
    """Complex STFT of (T,) or (B, T) -> (..., n_frames, n_fft//2+1).

    Hann window, centered reflect padding (librosa conventions; matches
    dsp.spectral.stft).
    """
    x = jnp.asarray(x)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    if center:
        x = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    B, T = x.shape
    n_frames = 1 + (T - n_fft) // hop_length
    idx = jnp.arange(n_fft)[None, :] + hop_length * jnp.arange(n_frames)[:, None]
    frames = x[:, idx]                                  # (B, n_frames, n_fft)
    # scipy/librosa periodic Hann
    win = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * jnp.arange(n_fft) / n_fft)
    spec = jnp.fft.rfft(frames * win[None, None, :], axis=-1)
    return spec[0] if squeeze else spec


@partial(jax.jit, static_argnames=("fs", "n_fft", "hop_length", "n_mels",
                                   "fmin", "fmax", "power", "log10",
                                   "center"))
def melspectrogram_jax(x: jnp.ndarray, fs: int, n_fft: int = 1024,
                       hop_length: int = 256, n_mels: int = 80,
                       fmin: float = 0.0, fmax: float | None = None,
                       power: float = 1.0, log10: bool = False,
                       center: bool = True) -> jnp.ndarray:
    """Mel spectrogram (..., n_frames, n_mels); parity with
    dsp.spectral.melspectrogram (+ optional log10(max(eps, .))).

    ``center=False`` lets a caller that length-buckets its input do the
    reflect padding itself (zero-padding a centered signal would corrupt
    the reflection at the true signal end)."""
    spec = jnp.abs(stft_jax(x, n_fft=n_fft, hop_length=hop_length,
                            center=center)) ** power
    fb = jnp.asarray(mel_filterbank(fs, n_fft, n_mels, fmin, fmax),
                     spec.dtype)
    m = spec @ fb.T
    if log10:
        m = jnp.log10(jnp.maximum(1e-10, m))
    return m


@partial(jax.jit, static_argnames=("order",))
def freqt_jax(c: jnp.ndarray, order: int, alpha: float) -> jnp.ndarray:
    """Batched frequency warping: (..., M1) -> (..., order+1).

    lax.scan over the input-cepstrum axis of the Oppenheim recursion
    (parity with dsp.cepstrum.freqt).
    """
    c = jnp.asarray(c, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    batch_shape = c.shape[:-1]
    m1 = c.shape[-1]
    cf = c.reshape(-1, m1)
    beta = 1.0 - alpha * alpha

    def step(g, ci):
        # one Oppenheim update: g <- recursion(g, ci); g is (B, order+1)
        g0 = ci + alpha * g[:, 0]
        if order == 0:
            return g0[:, None], None
        g1 = beta * g[:, 0] + alpha * g[:, 1]
        if order == 1:
            return jnp.stack([g0, g1], axis=1), None

        # m >= 2: new[m] = g[m-1] + alpha * (g[m] - new[m-1])
        def inner(carry, xs):
            g_m_1, g_m = xs
            new = g_m_1 + alpha * (g_m - carry)
            return new, new

        _, rest = jax.lax.scan(
            inner, g1, (g[:, 1:order].T, g[:, 2: order + 1].T))
        return jnp.concatenate([g0[:, None], g1[:, None], rest.T], axis=1), None

    g0 = jnp.zeros((cf.shape[0], order + 1), cf.dtype)
    g, _ = jax.lax.scan(step, g0, cf.T[::-1])
    return g.reshape(*batch_shape, order + 1)


@partial(jax.jit, static_argnames=("order", "n_fft"))
def sp2mc_jax(power_spec: jnp.ndarray, order: int, alpha: float,
              n_fft: int | None = None, floor=1e-10) -> jnp.ndarray:
    """Batched power spectrum -> mel-cepstrum (parity with
    dsp.cepstrum.sp2mc): (..., n_fft//2+1) -> (..., order+1).

    ``floor`` (scalar or broadcastable) is the absolute power floor
    under the log; rescaled callers must rescale it with their input.
    """
    ps = jnp.asarray(power_spec)
    n_half1 = ps.shape[-1]
    if n_fft is None:
        n_fft = (n_half1 - 1) * 2
    log_spec = 0.5 * jnp.log(jnp.maximum(ps, floor))
    cep = jnp.fft.irfft(log_spec, n=n_fft, axis=-1)[..., : n_half1]
    doubler = jnp.ones(n_half1).at[1:-1].set(2.0)
    cep = cep * doubler
    return freqt_jax(cep, order, alpha)


@partial(jax.jit, static_argnames=("order", "n_iter"))
def uels_refine_jax(c: jnp.ndarray, power_spec: jnp.ndarray, alpha: float,
                    order: int, n_iter: int = 15) -> jnp.ndarray:
    """Batched UELS Newton refinement (parity with
    dsp.cepstrum.uels_refine, fixed iteration count for jit):
    c (..., order+1), power_spec (..., n_fft//2+1)."""
    ps = jnp.asarray(power_spec)
    c = jnp.asarray(c, ps.dtype)
    n_half1 = ps.shape[-1]
    n_fft = (n_half1 - 1) * 2

    # warped log spectrum: full freqt of the log-power cepstrum
    log_spec = 0.5 * jnp.log(ps)
    cep = jnp.fft.irfft(log_spec, n=n_fft, axis=-1)[..., : n_half1]
    doubler = jnp.ones(n_half1, ps.dtype).at[1:-1].set(2.0)
    cw = freqt_jax(cep * doubler, n_fft // 2, alpha)
    halver = jnp.ones(n_half1, ps.dtype).at[1:-1].set(0.5)
    log_sw = 2.0 * jnp.fft.rfft(
        _mirror(cw * halver, n_fft), n=n_fft, axis=-1).real

    idx = jnp.arange(1, order + 1)
    habs = jnp.abs(idx[:, None] - idx[None, :])
    hsum = idx[:, None] + idx[None, :]

    def body(_, c):
        halved = c.at[..., 1:].multiply(0.5)
        logh = jnp.fft.rfft(_mirror(halved, n_fft), n=n_fft, axis=-1).real
        E = jnp.exp(log_sw - 2.0 * logh)
        r = jnp.fft.irfft(E, n=n_fft, axis=-1)[..., : 2 * order + 1]
        c = c.at[..., 0].add(0.5 * jnp.log(r[..., 0]))
        r = r / r[..., :1]
        H = r[..., habs] + r[..., hsum]
        delta = jnp.linalg.solve(H, r[..., 1: order + 1][..., None])[..., 0]
        return c.at[..., 1:].add(delta)

    return jax.lax.fori_loop(0, n_iter, body, c)


def _mirror(c: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """(..., M+1) one-sided coefficients -> (..., n_fft) symmetric seq."""
    m1 = c.shape[-1]
    out = jnp.zeros(c.shape[:-1] + (n_fft,), c.dtype)
    out = out.at[..., :m1].set(c)
    return out.at[..., n_fft - m1 + 1:].set(c[..., 1:][..., ::-1])


@partial(jax.jit, static_argnames=("fftl", "shiftl", "dim", "refine"))
def stft_mcep_jax(x: jnp.ndarray, fftl: int = 512, shiftl: int = 256,
                  dim: int = 25, alpha: float = 0.41,
                  refine: bool = True) -> jnp.ndarray:
    """Framewise STFT mel-cepstrum (parity with dsp.cepstrum.stft_mcep):
    non-centered Hamming frames, UELS Newton refinement by default."""
    x = jnp.asarray(x)
    n_frame = (x.shape[-1] - fftl) // shiftl + 1
    idx = jnp.arange(fftl)[None, :] + shiftl * jnp.arange(n_frame)[:, None]
    frames = x[idx]
    # periodic Hamming (scipy get_window's fftbins=True default)
    win = 0.54 - 0.46 * jnp.cos(2.0 * jnp.pi * jnp.arange(fftl) / fftl)
    spec = jnp.maximum(
        jnp.abs(jnp.fft.rfft(frames * win[None, :], axis=-1)) ** 2, 1e-10)
    c = sp2mc_jax(spec, dim, alpha)
    if refine:
        c = uels_refine_jax(c, spec, alpha, dim)
    return c


@partial(jax.jit, static_argnames=("n_fft", "ir_length"))
def mlsa_filter_jax(x: jnp.ndarray, coef: jnp.ndarray, alpha: float,
                    n_fft: int = 8192, ir_length: int = 2048) -> jnp.ndarray:
    """Time-invariant MLSA filtering on device (parity with
    dsp.mlsa.mlsa_filter): minimum-phase IR + FFT convolution."""
    coef = jnp.asarray(coef)
    m1 = coef.shape[0]
    # b2mc
    def b2mc_step(carry, b_m):
        mc = b_m + alpha * carry
        return b_m, mc

    _, mc_rev = jax.lax.scan(b2mc_step, jnp.zeros((), coef.dtype), coef[::-1])
    mc = mc_rev[::-1]
    c = freqt_jax(mc[None], n_fft // 2, -alpha)[0]
    buf = jnp.zeros(n_fft, c.dtype).at[: c.shape[0]].set(c)
    H = jnp.exp(jnp.fft.fft(buf))
    h = jnp.fft.ifft(H).real[:ir_length]
    n_conv = int(2 ** np.ceil(np.log2(x.shape[-1] + ir_length)))
    y = jnp.fft.irfft(jnp.fft.rfft(x, n=n_conv) * jnp.fft.rfft(h, n=n_conv),
                      n=n_conv)
    return y[: x.shape[-1]]


# ---------------------------------------------------------------------------
# WORLD analyses on device (parity with dsp/cheaptrick.py and dsp/d4c.py)
# ---------------------------------------------------------------------------

def _dd_cumsum(x: jnp.ndarray):
    """Compensated (two-float) cumulative sum along axis 1.

    The smoothing integral differences two nearly-equal cumulative
    totals; a plain f32 cumsum drops every increment smaller than
    ~total*2^-24, which destroys the low-power bins of a
    high-dynamic-range spectrum (a clean tone spans ~13 decades between
    its peak and its noise floor).  Carrying the running total as an
    unevaluated (hi, lo) float pair keeps ~2x the mantissa bits, so the
    difference of totals still resolves the small bins.  Exact in the
    f64 CPU test configuration (where it is simply more accurate than
    the plain cumsum of the numpy spec by ~1 ulp).
    """
    def two(a, b):
        ah, al = a
        bh, bl = b
        s = ah + bh
        t = s - ah
        e = (ah - (s - t)) + (bh - t)
        lo = e + al + bl
        hi = s + lo
        return hi, lo - (hi - s)

    return jax.lax.associative_scan(two, (x, jnp.zeros_like(x)), axis=1)


def _linear_smoothing_jax(spec: jnp.ndarray, f0: jnp.ndarray, fs: int,
                          fftl: int, floor=1e-10) -> jnp.ndarray:
    """Fractional-width (2/3 f0) rectangular smoothing on the continuous
    frequency axis; parity with dsp.cheaptrick._linear_smoothing.

    ``floor`` (scalar or per-frame (T, 1)) is the positivity floor on
    the smoothed value — callers that rescale their input must rescale
    the floor with it to keep parity with the numpy spec's absolute
    EPS.
    """
    n_half1 = fftl // 2 + 1
    df = fs / fftl
    # full reflection about DC and about Nyquist (see the numpy impl)
    ext = jnp.concatenate([spec[:, 1:][:, ::-1], spec, spec[:, -2::-1]],
                          axis=1)
    n_ext = ext.shape[1]
    orig0 = n_half1 - 1
    ch, cl = _dd_cumsum(0.5 * (ext[:, 1:] + ext[:, :-1]) * df)
    zero = jnp.zeros((spec.shape[0], 1), spec.dtype)
    cum_hi = jnp.concatenate([zero, ch], axis=1)
    cum_lo = jnp.concatenate([zero, cl], axis=1)

    def integral_at(freq_pos):
        pos = jnp.clip(freq_pos / df + orig0, 0, n_ext - 1.001)
        lo = jnp.floor(pos).astype(jnp.int32)
        frac = (pos - lo).astype(spec.dtype)
        a = jnp.take_along_axis(ext, lo, axis=1)
        b = jnp.take_along_axis(ext, jnp.minimum(lo + 1, n_ext - 1), axis=1)
        part = df * frac * (a + 0.5 * frac * (b - a))
        return (jnp.take_along_axis(cum_hi, lo, axis=1),
                jnp.take_along_axis(cum_lo, lo, axis=1) + part)

    width = (2.0 / 3.0) * f0[:, None]
    freqs = (jnp.arange(n_half1) * df)[None, :]
    up_hi, up_lo = integral_at(freqs + width / 2.0)
    lo_hi, lo_lo = integral_at(freqs - width / 2.0)
    # difference hi parts first (the cancellation), then add the small
    # residuals — this is where the compensation pays off
    integral = (up_hi - lo_hi) + (up_lo - lo_lo)
    return jnp.maximum(integral / width, floor)


@partial(jax.jit, static_argnames=("fs", "fftl"))
def cheaptrick_jax(frames: jnp.ndarray, f0: jnp.ndarray, fs: int,
                   fftl: int, power_floor=None) -> jnp.ndarray:
    """CheapTrick spectral envelopes (T, fftl//2+1) on device.

    ``power_floor`` (scalar or per-frame (T, 1), default the numpy
    spec's EPS=1e-10) is the absolute power-domain floor — a caller
    that rescales the frames by k must pass EPS*k^2 to keep the floor
    at the same physical level.

    Step-for-step parity with dsp.cheaptrick.cheaptrick (the published
    algorithm): F0-adaptive 3-period Hanning window with DC-bias
    removal, DC correction below f0, fractional 2/3*f0 smoothing, and
    the sinc + q1 = -0.15 liftering with recovery.
    """
    from pytorchwavenetvocoder_tpu.dsp.cheaptrick import (
        DEFAULT_F0, EPS, Q1)

    if power_floor is None:
        power_floor = EPS
    frames = jnp.asarray(frames)
    dt = frames.dtype
    f0 = jnp.asarray(f0, dt)
    f0_floor = 3.0 * fs / fftl
    f0 = jnp.clip(jnp.where(f0 > 0, f0, DEFAULT_F0), f0_floor, fs / 8.0)
    n_half1 = fftl // 2 + 1

    # F0-adaptive window, unit power, weighted-mean (DC bias) removal
    half = jnp.minimum(jnp.round(1.5 * fs / f0).astype(jnp.int32),
                       fftl // 2 - 1)
    idx = (jnp.arange(fftl) - fftl // 2)[None, :]
    in_win = jnp.abs(idx) <= half[:, None]
    win = jnp.where(
        in_win,
        0.5 + 0.5 * jnp.cos(jnp.pi * idx / (half[:, None] + 1.0)), 0.0
    ).astype(dt)
    win = win / (jnp.sqrt(jnp.sum(win ** 2, axis=1, keepdims=True)) + 1e-12)
    wsum = jnp.sum(win, axis=1, keepdims=True)
    bias = jnp.sum(win * frames, axis=1, keepdims=True) / jnp.maximum(
        wsum, 1e-12)
    xw = (frames - bias) * win
    spec = jnp.abs(jnp.fft.rfft(xw, n=fftl, axis=1)) ** 2

    # DC correction: add the mirror of the band above f0 below it
    freqs = (jnp.arange(n_half1) * (fs / fftl)).astype(dt)
    mirror_freq = 2.0 * f0[:, None] - freqs[None, :]
    pos = jnp.clip(mirror_freq / (fs / fftl), 0, n_half1 - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, n_half1 - 1)
    frac = (pos - lo).astype(dt)
    mirrored = (jnp.take_along_axis(spec, lo, axis=1) * (1 - frac)
                + jnp.take_along_axis(spec, hi, axis=1) * frac)
    below = freqs[None, :] < f0[:, None]
    spec = spec + jnp.where(below, mirrored, 0.0)

    spec = _linear_smoothing_jax(spec, f0, fs, fftl,
                                 floor=power_floor) + power_floor

    # liftering with recovery
    cep = jnp.fft.irfft(jnp.log(spec), n=fftl, axis=1)
    q = jnp.arange(fftl) * (1.0 / fs)
    q = jnp.minimum(q, fftl / fs - q).astype(dt)
    arg = jnp.pi * f0[:, None] * q[None, :]
    safe = jnp.maximum(arg, 1e-9)
    sinc = jnp.where(arg > 1e-9, jnp.sin(safe) / safe, 1.0)
    comp = (1.0 - 2.0 * Q1) + 2.0 * Q1 * jnp.cos(2.0 * arg)
    return jnp.exp(jnp.fft.rfft(cep * sinc * comp, axis=1).real)


@partial(jax.jit, static_argnames=("fs", "fftl"))
def d4c_jax(frames: jnp.ndarray, f0: jnp.ndarray, fs: int,
            fftl: int) -> jnp.ndarray:
    """D4C coarse band aperiodicity (T, n_bands) in dB on device.

    Parity with dsp.d4c.d4c; unvoiced frames (f0 <= 0) are fully
    aperiodic (0 dB).  All frames are computed (static shapes) and the
    unvoiced rows masked afterwards.
    """
    from pytorchwavenetvocoder_tpu.dsp.d4c import EPS, FLOOR_DB, n_codeap_bands
    from pytorchwavenetvocoder_tpu.dsp.harvest import _nuttall

    frames = jnp.asarray(frames)
    dt = frames.dtype
    f0 = jnp.asarray(f0, dt)
    voiced = f0 > 0
    n_bands = n_codeap_bands(fs)
    f0_floor = 4.0 * fs / fftl
    f0v = jnp.clip(jnp.where(voiced, f0, f0_floor), f0_floor, fs / 8.0)

    # static group delay (steps 1-2)
    half = jnp.minimum(jnp.round(2.0 * fs / f0v).astype(jnp.int32),
                       fftl // 2 - 1)
    idx = (jnp.arange(fftl) - fftl // 2)[None, :]
    in_win = jnp.abs(idx) <= half[:, None]
    ph = jnp.pi * idx / (half[:, None] + 1.0)
    win = jnp.where(in_win,
                    0.42 + 0.5 * jnp.cos(ph) + 0.08 * jnp.cos(2 * ph),
                    0.0).astype(dt)
    xw = frames * win
    t_rel = (idx / fs).astype(dt)
    X = jnp.fft.rfft(xw, axis=1)
    Xt = jnp.fft.rfft(xw * t_rel, axis=1)
    power = jnp.abs(X) ** 2
    num = (Xt * jnp.conj(X)).real
    # per-frame power normalization: sgd = num/power is scale-invariant,
    # and O(1) inputs keep the f32 smoothing well-conditioned at any
    # waveform scale (int16-range or unit-range)
    k = 1.0 / jnp.maximum(jnp.max(power, axis=1, keepdims=True), 1e-30)
    power = power * k
    num = num * k

    def smooth(signal, width_hz):
        # the numpy spec's min-offset exists only to dodge its
        # smoothing's positivity floor; running the jax smoothing
        # floorless on the raw signal is analytically identical
        # (smoothing preserves constants; the band never reaches the
        # clip edges, and numpy's floor never bites behind its offset)
        # and numerically FAR better in f32: re-adding a large offset
        # cancels away the small null-bin values, while the raw
        # oscillating integrand keeps the cumulative totals small
        pseudo_f0 = width_hz * 1.5
        return _linear_smoothing_jax(signal, pseudo_f0, fs, fftl,
                                     floor=-jnp.inf)

    num_s = smooth(num, f0v / 2.0)
    pow_s = smooth(power, f0v / 2.0)
    floor = jnp.maximum(jnp.max(pow_s, axis=1, keepdims=True) * 1e-8, EPS)
    sgd = num_s / jnp.maximum(pow_s, floor) + 0.125 / f0v[:, None]

    df = fs / fftl
    n_half1 = fftl // 2 + 1
    half_bins = int(round(3000.0 / df))
    L = 2 * half_bins + 1
    nuttall = jnp.asarray(_nuttall(L), dt)
    n_seg_fft = 1
    while n_seg_fft < L:
        n_seg_fft *= 2
    n_static = max(1, int(round(8.0 * n_seg_fft / L / 2.0)))

    cols = []
    for b in range(n_bands):
        center = int(round(3000.0 * (b + 1) / df))
        lo_b = center - half_bins
        hi_b = center + half_bins + 1
        lo_c, hi_c = max(lo_b, 0), min(hi_b, n_half1)
        seg = jnp.zeros((sgd.shape[0], L), dt)
        seg = seg.at[:, lo_c - lo_b: hi_c - lo_b].set(sgd[:, lo_c:hi_c])
        seg = seg * nuttall[None, :]
        P = jnp.abs(jnp.fft.rfft(seg, n=n_seg_fft, axis=1)) ** 2
        P = P.at[:, 1:-1].multiply(2.0)
        # ascending sort + direct tail sum: algebraically identical to
        # the numpy spec's 1 - static/total (tail + EPS == total + EPS
        # - static), but free of the catastrophic cancellation that a
        # small f32 aperiodic ratio suffers in the subtraction
        P_asc = jnp.sort(P, axis=1)
        n_keep = P.shape[1] - n_static
        tail = jnp.sum(P_asc[:, :n_keep], axis=1)
        total = jnp.sum(P_asc, axis=1) + EPS
        ratio = jnp.maximum((tail + EPS) / total,
                            10.0 ** (FLOOR_DB / 10.0))
        cols.append(10.0 * jnp.log10(ratio))
    out = jnp.stack(cols, axis=1)
    out = jnp.where(voiced[:, None], out, 0.0)
    return jnp.clip(out, FLOOR_DB, 0.0)


@partial(jax.jit, static_argnames=("fs", "fftl", "mcep_dim", "mcep_alpha"))
def _world_frames_jax(frames: jnp.ndarray, cont_f0: jnp.ndarray,
                      f0_raw: jnp.ndarray, fs: int, fftl: int,
                      mcep_dim: int, mcep_alpha: float):
    """Device part of the WORLD analysis: (mcep, codeap) from frames.

    Frames are normalized to unit peak per frame before the spectral
    analyses so the f32 device arithmetic is well-conditioned at any
    waveform scale (the host pipeline feeds int16-range floats).  The
    envelope then scales by k^2, which shifts only the 0th mel-cepstral
    coefficient by log k (freqt is linear and maps a c0 delta to c0),
    so the exact compensation is mc0 -= log k; D4C is a power ratio and
    needs none.
    """
    frames = jnp.asarray(frames)  # f64 under x64 (CPU tests), f32 on TPU
    peak = jnp.maximum(jnp.max(jnp.abs(frames), axis=1, keepdims=True),
                       jnp.asarray(1e-6, frames.dtype))
    fn = frames / peak
    # the numpy pipeline's absolute 1e-10 power floors, rescaled to the
    # normalized frame scale so they bite at the same physical level
    floor_n = 1e-10 / (peak * peak)
    env = cheaptrick_jax(fn, cont_f0, fs, fftl, power_floor=floor_n)
    mcep = sp2mc_jax(jnp.maximum(env, floor_n), mcep_dim, mcep_alpha,
                     floor=floor_n)
    mcep = mcep.at[..., 0].add(jnp.log(peak[:, 0]))
    codeap = d4c_jax(fn, f0_raw, fs, fftl)
    return mcep, codeap


def world_analyze_jax(x: np.ndarray, fs: int, shiftms: float = 5.0,
                      minf0: float = 40.0, maxf0: float = 400.0,
                      fftl: int = 1024, mcep_dim: int = 24,
                      mcep_alpha: float = 0.41,
                      frame_bucket: int = 256) -> np.ndarray:
    """WORLD feature matrix with the spectral analyses on device.

    Same output contract as ``dsp.world.world_analyze`` — columns
    [uv, cont_f0_lpf, mcep..., codeap...] — but CheapTrick, sp2mc, and
    D4C run batched through XLA (TPU when available).  Harvest F0 stays
    on the host (sequential event processing).  Thin wrapper over
    ``world_analyze_jax_many`` (the production path behind
    ``feature_extract --device jax``) with ``frame_bucket`` as the
    device batch, so the host prep and padding bookkeeping live in
    exactly one place.
    """
    return world_analyze_jax_many(
        [x], fs, shiftms=shiftms, minf0=minf0, maxf0=maxf0, fftl=fftl,
        mcep_dim=mcep_dim, mcep_alpha=mcep_alpha,
        device_batch=frame_bucket)[0]


def world_analyze_jax_many(xs: list, fs: int, shiftms: float = 5.0,
                           minf0: float = 40.0, maxf0: float = 400.0,
                           fftl: int = 1024, mcep_dim: int = 24,
                           mcep_alpha: float = 0.41,
                           device_batch: int = 4096,
                           f0_device: str = "host") -> list:
    """WORLD analysis of MANY waveforms with cross-utterance batching.

    CheapTrick and D4C are strictly per-frame, so frames from different
    utterances can share a device batch: all utterances' frames are
    concatenated and processed in fixed ``(device_batch, fftl)`` slices
    — exactly one compiled shape regardless of utterance lengths, with
    the device dispatch cost amortized over every utterance in the
    group.  Harvest F0 runs per utterance on the host by default;
    ``f0_device="jax"`` routes its heavy stages through the device too
    (``dsp.harvest_jax`` — same algorithm in f32, so voicing flips are
    confined to threshold-straddling frames).  Returns one feature
    matrix per input, identical to ``world_analyze_jax``.
    """
    from pytorchwavenetvocoder_tpu.dsp.f0 import (
        convert_to_continuous_f0, extract_f0)
    from pytorchwavenetvocoder_tpu.dsp.filters import low_pass_filter
    from pytorchwavenetvocoder_tpu.dsp.world import _centered_frames

    import logging
    import time as _time

    hop = int(fs * shiftms / 1000.0)
    frame_rate = int(1.0 / (shiftms * 0.001))
    per_utt = []
    _t0 = _time.perf_counter()
    if f0_device == "jax":
        from pytorchwavenetvocoder_tpu.dsp.harvest_jax import (
            harvest_jax_many)

        f0s_pre = harvest_jax_many(
            [np.asarray(x, np.float64) for x in xs], fs,
            f0_floor=minf0, f0_ceil=maxf0, shiftms=shiftms)
    elif f0_device == "host":
        f0s_pre = None
    else:
        raise ValueError(
            f"f0_device must be 'host' or 'jax', got {f0_device!r}")
    for i, x in enumerate(xs):
        x = np.asarray(x, np.float64)
        n_frames = len(x) // hop + 1
        f0 = (f0s_pre[i] if f0s_pre is not None
              else extract_f0(x, fs, minf0=minf0, maxf0=maxf0,
                              shiftms=shiftms))
        f0 = f0[:n_frames]
        if len(f0) < n_frames:
            f0 = np.pad(f0, (0, n_frames - len(f0)))
        uv, cont_f0 = convert_to_continuous_f0(f0)
        cont_f0_lpf = low_pass_filter(cont_f0, frame_rate, cutoff=20)
        per_utt.append({
            "n": n_frames, "uv": uv, "lpf": cont_f0_lpf,
            "frames": _centered_frames(x, fftl, hop, n_frames),
            "cont": cont_f0, "f0": f0,
        })

    frames = np.concatenate([u["frames"] for u in per_utt])
    cont = np.concatenate([u["cont"] for u in per_utt])
    f0_raw = np.concatenate([u["f0"] for u in per_utt])
    total = len(frames)
    pad = -total % device_batch
    frames = np.pad(frames, ((0, pad), (0, 0)))
    cont = np.pad(cont, (0, pad), mode="edge")
    f0_raw = np.pad(f0_raw, (0, pad))  # padded rows unvoiced

    logging.debug("world_many: host prep of %d utts (%d frames): %.2f s",
                  len(xs), total, _time.perf_counter() - _t0)
    mceps, codeaps = [], []
    for s in range(0, total + pad, device_batch):
        _t0 = _time.perf_counter()
        m, c = _world_frames_jax(frames[s:s + device_batch],
                                 cont[s:s + device_batch],
                                 f0_raw[s:s + device_batch],
                                 fs, fftl, mcep_dim, mcep_alpha)
        mceps.append(np.asarray(m))
        codeaps.append(np.asarray(c))
        logging.debug("world_many: device slice %d: %.2f s",
                      s // device_batch, _time.perf_counter() - _t0)
    mcep = np.concatenate(mceps)[:total]
    codeap = np.concatenate(codeaps)[:total]

    out, off = [], 0
    for u in per_utt:
        n = u["n"]
        out.append(np.concatenate(
            [u["uv"][:, None].astype(np.float64), u["lpf"][:, None],
             mcep[off:off + n], codeap[off:off + n]], axis=1))
        off += n
    return out
