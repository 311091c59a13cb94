"""Mu-law companding codec.

Behavioral parity target: reference ``wavenet_vocoder/nets/wavenet.py:17-47``
(numpy encode/decode with ``mu - 1`` compression constant and the
``floor(.. + 0.5)`` rounding rule).  Integer outputs of :func:`encode_mu_law`
are bit-exact vs the reference formula.

Both host (numpy) and device (jnp, jit-able) variants are provided; the
device variants are used inside the training data path and the AR decode
postprocessing so the whole pipeline can stay on-device.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def encode_mu_law(x: np.ndarray, mu: int = 256) -> np.ndarray:
    """Encode waveform in [-1, 1] to integer classes ``0 .. mu-1`` (numpy).

    Uses compression constant ``mu - 1`` and round-half-up quantization,
    matching reference semantics (`wavenet.py:17-30`).
    """
    m = mu - 1
    fx = np.sign(x) * np.log1p(m * np.abs(x)) / np.log1p(m)
    return np.floor((fx + 1) / 2 * m + 0.5).astype(np.int64)


def decode_mu_law(y: np.ndarray, mu: int = 256) -> np.ndarray:
    """Decode integer classes back to waveform in [-1, 1] (numpy).

    Matches reference semantics (`wavenet.py:33-47`).
    """
    m = mu - 1
    fx = (y - 0.5) / m * 2 - 1
    return np.sign(fx) / m * ((1 + m) ** np.abs(fx) - 1)


def encode_mu_law_jax(x: jnp.ndarray, mu: int = 256) -> jnp.ndarray:
    """jit-able mu-law encode; same formula as the numpy variant.

    Computes at f64 when x64 is enabled so the integer classes match the
    host (numpy f64) encoder exactly at floor boundaries.
    """
    import jax

    dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    x = jnp.asarray(x, dt)
    m = float(mu - 1)
    fx = jnp.sign(x) * jnp.log1p(m * jnp.abs(x)) / jnp.log1p(m)
    return jnp.floor((fx + 1.0) / 2.0 * m + 0.5).astype(jnp.int32)


def decode_mu_law_jax(y: jnp.ndarray, mu: int = 256) -> jnp.ndarray:
    """jit-able mu-law decode; same formula as the numpy variant."""
    m = float(mu - 1)
    fx = (y.astype(jnp.float32) - 0.5) / m * 2.0 - 1.0
    return jnp.sign(fx) / m * (jnp.power(1.0 + m, jnp.abs(fx)) - 1.0)
