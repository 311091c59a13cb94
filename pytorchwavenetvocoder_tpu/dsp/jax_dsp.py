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
                                   "fmin", "fmax", "power", "log10"))
def melspectrogram_jax(x: jnp.ndarray, fs: int, n_fft: int = 1024,
                       hop_length: int = 256, n_mels: int = 80,
                       fmin: float = 0.0, fmax: float | None = None,
                       power: float = 1.0, log10: bool = False) -> jnp.ndarray:
    """Mel spectrogram (..., n_frames, n_mels); parity with
    dsp.spectral.melspectrogram (+ optional log10(max(eps, .)))."""
    spec = jnp.abs(stft_jax(x, n_fft=n_fft, hop_length=hop_length)) ** power
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
              n_fft: int | None = None) -> jnp.ndarray:
    """Batched power spectrum -> mel-cepstrum (parity with
    dsp.cepstrum.sp2mc): (..., n_fft//2+1) -> (..., order+1)."""
    ps = jnp.asarray(power_spec)
    n_half1 = ps.shape[-1]
    if n_fft is None:
        n_fft = (n_half1 - 1) * 2
    log_spec = 0.5 * jnp.log(jnp.maximum(ps, 1e-10))
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
