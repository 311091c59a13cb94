"""Fused Pallas training-kernel tests (interpret mode, CPU).

Validates ops/train_kernel.py against its precision-matched JAX replica
``ref_layer_stack``: the forward must be bit-exact (identical op order
and dtypes), and the custom-VJP backward must match ``jax.grad`` of the
replica up to the bf16 rounding of the saved activations (the kernel
stores sigma/tanh and the inter-layer dx streams in bf16; the replica's
autodiff flows f32).

Hardware timing/parity of the same kernels at the flagship operating
point is covered by the TPU smoke scripts (scripts/tpu_learning_smoke.sh)
and README-tracked bench numbers.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorchwavenetvocoder_tpu.models.wavenet import (
    WaveNetConfig,
    init_wavenet_params,
    wavenet_forward,
)
from pytorchwavenetvocoder_tpu.ops import train_kernel as tk


def _small_cfg(kernel_size=2, depth=3, repeat=2):
    return WaveNetConfig(
        n_quantize=256, n_aux=20, n_resch=128, n_skipch=128,
        dilation_depth=depth, dilation_repeat=repeat,
        kernel_size=kernel_size, upsampling_factor=0,
        compute_dtype="bfloat16")


def _data(cfg, B=2, T=1700, seed=0):
    params = init_wavenet_params(jax.random.PRNGKey(seed), cfg)
    lw = tk._layer_weights(params)
    rng = np.random.RandomState(seed)
    stream0 = jnp.asarray(rng.randn(B, T, cfg.n_resch), jnp.float32) * 0.5
    h_up = jnp.asarray(rng.randn(B, T, cfg.n_aux), jnp.float32)
    return params, lw, stream0, h_up


@pytest.mark.parametrize("kernel_size", [2, 3])
def test_fused_forward_bit_exact(kernel_size):
    cfg = _small_cfg(kernel_size)
    _, lw, stream0, h_up = _data(cfg)
    ref = np.asarray(tk.ref_layer_stack(lw, cfg, stream0, h_up))
    got, _ = tk._fwd_pallas(cfg, lw, stream0, h_up, interpret=True)
    np.testing.assert_array_equal(ref, np.asarray(got))


@pytest.mark.parametrize("n_tiles_shape", [3 * tk._TILE, 4 * tk._TILE - 300,
                                           5 * tk._TILE - 1])
def test_fused_forward_tile_boundaries(n_tiles_shape):
    """Ring-slot aliasing across layer boundaries was a real bug: the
    first failing case was n_tiles exceeding the ring depth.  Cover
    aligned, padded and off-by-one window lengths."""
    cfg = _small_cfg()
    _, lw, stream0, h_up = _data(cfg, B=1, T=n_tiles_shape)
    ref = np.asarray(tk.ref_layer_stack(lw, cfg, stream0, h_up))
    got, _ = tk._fwd_pallas(cfg, lw, stream0, h_up, interpret=True)
    np.testing.assert_array_equal(ref, np.asarray(got))


def test_tile_selection_prefers_1024_when_window_allows():
    """_tile_for upgrades to the 1024 row tile only when the window
    still yields >= 4 tiles (and VMEM fits); fwd/bwd call it with the
    same (config, T), so the padding grid always agrees."""
    cfg = _small_cfg()
    assert tk._tile_for(cfg, 4096) == 1024
    assert tk._tile_for(cfg, 12000) == 1024
    # 3 tiles of 1024 < 4 -> falls back to the 512 fallback tile
    assert tk._tile_for(cfg, 2560) == tk._TILE
    assert tk.fused_train_constraint_error(cfg, 4096) is None


def test_fused_forward_bit_exact_at_1024_tile():
    """Same bit-exactness contract as test_fused_forward_bit_exact, at a
    window long enough that _tile_for selects the 1024 row tile (the
    flagship training grid)."""
    cfg = _small_cfg()
    T = 4 * 1024 - 100  # padded grid: 4 tiles of 1024
    assert tk._tile_for(cfg, T) == 1024
    _, lw, stream0, h_up = _data(cfg, B=1, T=T)
    ref = np.asarray(tk.ref_layer_stack(lw, cfg, stream0, h_up))
    got, _ = tk._fwd_pallas(cfg, lw, stream0, h_up, interpret=True)
    np.testing.assert_array_equal(ref, np.asarray(got))


@pytest.mark.parametrize("kernel_size", [2, 3])
def test_fused_backward_matches_autodiff(kernel_size):
    cfg = _small_cfg(kernel_size)
    _, lw, stream0, h_up = _data(cfg)
    rng = np.random.RandomState(1)
    ct = jnp.asarray(rng.randn(*stream0.shape[:2], cfg.n_skipch), jnp.float32)

    def loss_ref(lw, s0, h):
        return jnp.sum(tk.ref_layer_stack(lw, cfg, s0, h) * ct)

    def loss_fused(lw, s0, h):
        return jnp.sum(tk._fused_stack(cfg, True, lw,
                                       s0.astype(jnp.bfloat16),
                                       h.astype(jnp.bfloat16)) * ct)

    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(lw, stream0, h_up)
    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(lw, stream0, h_up)

    flats = [(n, g_r[0][n], g_f[0][n]) for n in g_r[0]]
    flats += [("stream0", g_r[1], g_f[1]), ("h_up", g_r[2], g_f[2])]
    for name, a, b in flats:
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)
        assert cos > 0.9999, (name, cos)
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
        assert rel < 3e-2, (name, rel)


def test_fused_wavenet_forward_close_to_xla():
    """End-to-end wavenet_forward(fused=True) vs the XLA bf16 path."""
    cfg = _small_cfg()
    params, _, _, _ = _data(cfg)
    rng = np.random.RandomState(2)
    B, T = 2, 1700
    x = jnp.asarray(rng.randint(0, 256, (B, T)), jnp.int32)
    h = jnp.asarray(rng.randn(B, T, cfg.n_aux), jnp.float32)

    # route the fused path through interpret mode for the CPU test
    import pytorchwavenetvocoder_tpu.models.wavenet as wn

    orig = tk.fused_layer_stack
    tk.fused_layer_stack = lambda p, c, s, hh: orig(p, c, s, hh,
                                                   interpret=True)
    try:
        got = np.asarray(wavenet_forward(params, cfg, x, h, fused=True))
    finally:
        tk.fused_layer_stack = orig
    ref = np.asarray(wavenet_forward(params, cfg, x, h,
                                     bf16_intermediates=True))
    # differs only by where bf16 rounding lands (gate inputs vs saves)
    assert np.abs(got - ref).max() < 0.15, np.abs(got - ref).max()
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.9999


def test_supports_fused_train_gates():
    assert tk.supports_fused_train(_small_cfg(), 20000)
    # flagship arctic-sd
    assert tk.supports_fused_train(WaveNetConfig(
        n_resch=512, n_skipch=256, dilation_depth=10, dilation_repeat=3,
        kernel_size=2, upsampling_factor=80,
        compute_dtype="bfloat16"), 23120)
    # ljspeech kernel-3 flagship
    assert tk.supports_fused_train(WaveNetConfig(
        n_aux=39, n_resch=512, n_skipch=256, dilation_depth=10,
        dilation_repeat=3, kernel_size=3, upsampling_factor=110,
        compute_dtype="bfloat16"), 21644)
    # unsupported shapes fall back
    assert not tk.supports_fused_train(WaveNetConfig(
        n_resch=96, n_skipch=96), 20000)
    assert not tk.supports_fused_train(WaveNetConfig(kernel_size=4), 20000)
    assert not tk.supports_fused_train(_small_cfg(), 900)  # < 4 tiles


def test_streams_only_mode_matches_full():
    """save_st=False (the decoder warm-up mode) must produce identical
    per-layer streams to the full training forward."""
    cfg = _small_cfg()
    _, lw, stream0, h_up = _data(cfg, B=1, T=2100)
    _, (_, s_full, _, _) = tk._fwd_pallas(cfg, lw, stream0, h_up,
                                          interpret=True)
    out, (_, s_only, _, _) = tk._fwd_pallas(cfg, lw, stream0, h_up,
                                            interpret=True, save_st=False)
    assert out is None
    np.testing.assert_array_equal(np.asarray(s_full), np.asarray(s_only))


def test_fused_backward_odd_batch_and_tiles():
    """Odd batch and odd tile counts exercise every grid-parity and
    ring-slot wraparound combination in the backward's descending
    iteration."""
    cfg = _small_cfg()
    _, lw, stream0, h_up = _data(cfg, B=3, T=5 * tk._TILE - 200)
    rng = np.random.RandomState(4)
    ct = jnp.asarray(rng.randn(*stream0.shape[:2], cfg.n_skipch), jnp.float32)

    def loss_ref(lw, s0, h):
        return jnp.sum(tk.ref_layer_stack(lw, cfg, s0, h) * ct)

    def loss_fused(lw, s0, h):
        return jnp.sum(tk._fused_stack(cfg, True, lw,
                                       s0.astype(jnp.bfloat16),
                                       h.astype(jnp.bfloat16)) * ct)

    g_r = jax.grad(loss_ref, argnums=(0, 1))(lw, stream0, h_up)
    g_f = jax.grad(loss_fused, argnums=(0, 1))(lw, stream0, h_up)
    for name in g_r[0]:
        a = np.asarray(g_r[0][name], np.float32)
        b = np.asarray(g_f[0][name], np.float32)
        cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)
        assert cos > 0.9999, (name, cos)
    a = np.asarray(g_r[1], np.float32)
    b = np.asarray(g_f[1], np.float32)
    assert np.abs(a - b).max() / (np.abs(a).max() + 1e-9) < 3e-2
