"""WaveNet model tests.

Mirrors the reference test strategy (`test/test_wavenet.py`): forward
shape contracts, and the load-bearing generation-equivalence invariant —
naive full-forward AR == scan ring-buffer AR == batched scan AR in argmax
mode — across kernel sizes, with/without the upsampling layer, and for
ragged batch lengths.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorchwavenetvocoder_tpu.models.wavenet import (
    WaveNet,
    WaveNetConfig,
    batch_fast_generate,
    fast_generate,
    generate,
    init_wavenet_params,
    upsample_aux,
    wavenet_forward,
)


def tiny_config(**kw):
    base = dict(n_quantize=256, n_aux=28, n_resch=16, n_skipch=16,
                dilation_depth=3, dilation_repeat=2, kernel_size=2,
                upsampling_factor=0)
    base.update(kw)
    return WaveNetConfig(**base)


def make_inputs(config, B=1, T=100, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randint(0, config.n_quantize, (B, T)).astype(np.int32)
    if config.upsampling_factor > 0:
        Tf = T // config.upsampling_factor
        h = rng.randn(B, Tf, config.n_aux).astype(np.float32)
    else:
        h = rng.randn(B, T, config.n_aux).astype(np.float32)
    return x, h


# ---------------------------------------------------------------- forward


@pytest.mark.parametrize("kernel_size", [2, 3])
@pytest.mark.parametrize("upsampling_factor", [0, 10])
def test_forward_shape(kernel_size, upsampling_factor):
    cfg = tiny_config(kernel_size=kernel_size, upsampling_factor=upsampling_factor)
    params = init_wavenet_params(jax.random.PRNGKey(0), cfg)
    T = 100
    x, h = make_inputs(cfg, B=2, T=T)
    y = wavenet_forward(params, cfg, x, h)
    assert y.shape == (2, T, cfg.n_quantize)
    assert np.isfinite(np.asarray(y)).all()


def test_receptive_field():
    cfg = WaveNetConfig(dilation_depth=10, dilation_repeat=3, kernel_size=2)
    assert cfg.receptive_field == 3070  # (2-1)*3*(2^10-1)+1, wavenet.py:184-185
    cfg = WaveNetConfig(dilation_depth=5, dilation_repeat=1, kernel_size=3)
    assert cfg.receptive_field == 2 * 31 + 1


def test_forward_causality():
    """Changing input at time t must not affect logits at positions < t."""
    cfg = tiny_config()
    params = init_wavenet_params(jax.random.PRNGKey(1), cfg)
    x, h = make_inputs(cfg, T=64, seed=1)
    y1 = np.asarray(wavenet_forward(params, cfg, x, h))
    t = 40
    x2 = x.copy()
    x2[0, t] = (x2[0, t] + 17) % cfg.n_quantize
    y2 = np.asarray(wavenet_forward(params, cfg, x2, h))
    np.testing.assert_allclose(y1[0, :t], y2[0, :t], atol=1e-6)
    assert not np.allclose(y1[0, t], y2[0, t])


def test_aux_conditioning_is_pointwise_in_time():
    """Aux features at frame t affect only positions >= t (1x1 convs)."""
    cfg = tiny_config()
    params = init_wavenet_params(jax.random.PRNGKey(2), cfg)
    x, h = make_inputs(cfg, T=64, seed=2)
    y1 = np.asarray(wavenet_forward(params, cfg, x, h))
    h2 = h.copy()
    h2[0, 50] += 1.0
    y2 = np.asarray(wavenet_forward(params, cfg, x, h2))
    np.testing.assert_allclose(y1[0, :50], y2[0, :50], atol=1e-6)
    assert not np.allclose(y1[0, 50], y2[0, 50])


def test_upsampling_replication_at_init():
    """Upsampler init (w=1, b=0) must replicate frames, matching the
    reference's ConvTranspose2d constant-1 init (wavenet.py:61-63)."""
    cfg = tiny_config(upsampling_factor=4)
    params = init_wavenet_params(jax.random.PRNGKey(0), cfg)
    h = np.random.RandomState(0).randn(2, 5, cfg.n_aux).astype(np.float32)
    up = np.asarray(upsample_aux(params, cfg, jnp.asarray(h)))
    assert up.shape == (2, 20, cfg.n_aux)
    np.testing.assert_allclose(up, np.repeat(h, 4, axis=1), rtol=1e-6)


# ------------------------------------------------------------- generation


@pytest.mark.parametrize("kernel_size", [2, 3])
def test_fast_generate_matches_naive(kernel_size):
    cfg = tiny_config(kernel_size=kernel_size, compute_dtype="float64")
    params = init_wavenet_params(jax.random.PRNGKey(3), cfg)
    T = cfg.receptive_field + 10
    x, h = make_inputs(cfg, B=1, T=T + 30, seed=3)
    x_seed = x[:, :T]
    n = 30
    y_naive = generate(params, cfg, x_seed, h, n, mode="argmax")
    y_fast = fast_generate(params, cfg, x_seed, h, n, mode="argmax")
    np.testing.assert_array_equal(y_naive, y_fast)


@pytest.mark.parametrize("upsampling_factor", [0, 10])
def test_fast_generate_matches_naive_upsampling(upsampling_factor):
    cfg = tiny_config(upsampling_factor=upsampling_factor, compute_dtype="float64")
    params = init_wavenet_params(jax.random.PRNGKey(4), cfg)
    n = 20
    if upsampling_factor:
        T_total = cfg.receptive_field + n + upsampling_factor
        x, h = make_inputs(cfg, B=1, T=T_total, seed=4)
        x_seed = x[:, : cfg.receptive_field]
    else:
        x, h = make_inputs(cfg, B=1, T=cfg.receptive_field + n, seed=4)
        x_seed = x[:, : cfg.receptive_field]
    y_naive = generate(params, cfg, x_seed, h, n, mode="argmax")
    y_fast = fast_generate(params, cfg, x_seed, h, n, mode="argmax")
    np.testing.assert_array_equal(y_naive, y_fast)


def test_short_seed_gets_padded():
    """Seeds shorter than the receptive field are padded like the
    reference (constant Q//2 ids + replicated aux, wavenet.py:262-265)."""
    cfg = tiny_config(compute_dtype="float64")
    params = init_wavenet_params(jax.random.PRNGKey(5), cfg)
    n = 15
    x = np.zeros((1, 1), np.int32)
    h = np.random.RandomState(5).randn(1, n + 1, cfg.n_aux).astype(np.float32)
    y_naive = generate(params, cfg, x, h, n, mode="argmax")
    y_fast = fast_generate(params, cfg, x, h, n, mode="argmax")
    assert y_naive.shape == (n,)
    np.testing.assert_array_equal(y_naive, y_fast)


def test_batch_fast_generate_matches_single():
    """Batched scan AR must equal per-utterance scan AR, including ragged
    lengths (reference test_wavenet.py:225-253)."""
    cfg = tiny_config(compute_dtype="float64")
    params = init_wavenet_params(jax.random.PRNGKey(6), cfg)
    B = 3
    n_list = [25, 10, 18]
    T = cfg.receptive_field
    rng = np.random.RandomState(6)
    x = rng.randint(0, cfg.n_quantize, (B, T)).astype(np.int32)
    h = rng.randn(B, T + max(n_list), cfg.n_aux).astype(np.float32)

    batch_out = batch_fast_generate(params, cfg, x, h, list(n_list), mode="argmax")
    assert len(batch_out) == B
    for b in range(B):
        single = fast_generate(params, cfg, x[b:b + 1], h[b:b + 1],
                               n_list[b], mode="argmax")
        assert batch_out[b].shape == (n_list[b],)
        np.testing.assert_array_equal(batch_out[b], single)


def test_sampling_mode_runs_and_differs_by_seed():
    cfg = tiny_config()
    params = init_wavenet_params(jax.random.PRNGKey(7), cfg)
    T = cfg.receptive_field
    x, h = make_inputs(cfg, B=1, T=T + 40, seed=7)
    y1 = fast_generate(params, cfg, x[:, :T], h, 40, mode="sampling",
                       rng=jax.random.PRNGKey(0))
    y2 = fast_generate(params, cfg, x[:, :T], h, 40, mode="sampling",
                       rng=jax.random.PRNGKey(1))
    assert y1.shape == (40,)
    assert (y1 != y2).any()
    # same seed -> deterministic
    y3 = fast_generate(params, cfg, x[:, :T], h, 40, mode="sampling",
                       rng=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(y1, y3)


def test_wavenet_class_api():
    net = WaveNet(tiny_config(), rng=jax.random.PRNGKey(0))
    assert net.receptive_field == net.config.receptive_field
    x, h = make_inputs(net.config, B=1, T=50)
    y = net(x, h)
    assert y.shape == (1, 50, 256)


def test_intervals_chunked_decode_identical():
    """intervals-chunked generation must emit EXACTLY the fused stream
    (same ring state threading, same per-step PRNG folds) while logging
    progress (reference wavenet.py:479-484)."""
    cfg = tiny_config()
    params = init_wavenet_params(jax.random.PRNGKey(2), cfg)
    T = cfg.receptive_field
    x, h = make_inputs(cfg, B=2, T=T + 50, seed=3)
    for mode in ("argmax", "sampling"):
        fused = batch_fast_generate(params, cfg, x[:, :T], h, [50, 50],
                                    mode=mode, rng=jax.random.PRNGKey(5))
        chunked = batch_fast_generate(params, cfg, x[:, :T], h, [50, 50],
                                      mode=mode, rng=jax.random.PRNGKey(5),
                                      intervals=13)
        for a, b in zip(fused, chunked):
            np.testing.assert_array_equal(a, b)


def test_fleet_chunked_decode_matches_unchunked(monkeypatch):
    """HBM auto-capping: a fleet decoded in sequential sub-fleets must
    emit the same argmax stream as the single-shot path (argmax ignores
    the per-chunk PRNG fold, so equality is exact)."""
    cfg = tiny_config(compute_dtype="float64")
    params = init_wavenet_params(jax.random.PRNGKey(8), cfg)
    B = 5
    n_list = [20, 14, 20, 9, 17]
    T = cfg.receptive_field
    rng = np.random.RandomState(8)
    x = rng.randint(0, cfg.n_quantize, (B, T)).astype(np.int32)
    h = rng.randn(B, T + max(n_list), cfg.n_aux).astype(np.float32)

    whole = batch_fast_generate(params, cfg, x, h, list(n_list),
                                mode="argmax")
    monkeypatch.setenv("WNV_DECODE_FLEET_CHUNK", "2")
    chunked = batch_fast_generate(params, cfg, x, h, list(n_list),
                                  mode="argmax")
    assert len(chunked) == B
    for a, b in zip(whole, chunked):
        np.testing.assert_array_equal(a, b)


def test_fleet_hbm_estimate_triggers_chunking(monkeypatch):
    """A tiny WNV_DECODE_HBM_BUDGET must force the estimator-driven
    chunk path (and still produce correct ragged outputs)."""
    from pytorchwavenetvocoder_tpu.models.wavenet import _fleet_hbm_bytes

    cfg = tiny_config(compute_dtype="float64")
    params = init_wavenet_params(jax.random.PRNGKey(9), cfg)
    B, n = 4, 15
    T = cfg.receptive_field
    rng = np.random.RandomState(9)
    x = rng.randint(0, cfg.n_quantize, (B, T)).astype(np.int32)
    h = rng.randn(B, T + n, cfg.n_aux).astype(np.float32)
    assert _fleet_hbm_bytes(cfg, B, n) > _fleet_hbm_bytes(cfg, 1, n)

    whole = batch_fast_generate(params, cfg, x, h, [n] * B, mode="argmax")
    monkeypatch.setenv("WNV_DECODE_HBM_BUDGET",
                       str(_fleet_hbm_bytes(cfg, 1, n) * 2))
    chunked = batch_fast_generate(params, cfg, x, h, [n] * B, mode="argmax")
    for a, b in zip(whole, chunked):
        np.testing.assert_array_equal(a, b)
