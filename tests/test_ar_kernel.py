"""Pallas AR kernel equivalence tests (interpret mode on the CPU mesh).

The kernel must reproduce the lax.scan decoder exactly under identical
arithmetic (interpret mode evaluates the same op graph in f32).  On real
TPUs the bf16 rounding of the two implementations differs slightly, so
argmax trajectories can diverge at near-ties; that path is exercised by
bench.py on hardware.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorchwavenetvocoder_tpu.models.wavenet import (
    WaveNetConfig,
    _pad_seed,
    _scan_from_state,
    _warmup_state,
    init_wavenet_params,
)
from pytorchwavenetvocoder_tpu.ops.ar_kernel import (
    pallas_ar_generate,
    supports_pallas_ar,
)


def small_cfg(**kw):
    base = dict(n_quantize=256, n_aux=28, n_resch=128, n_skipch=128,
                dilation_depth=3, dilation_repeat=2, kernel_size=2,
                upsampling_factor=0, compute_dtype="bfloat16")
    base.update(kw)
    return WaveNetConfig(**base)


def test_supports_matrix():
    assert supports_pallas_ar(small_cfg())
    assert supports_pallas_ar(small_cfg(kernel_size=3))  # ljspeech configs
    assert not supports_pallas_ar(small_cfg(kernel_size=4))
    assert not supports_pallas_ar(small_cfg(n_resch=100))
    assert supports_pallas_ar(WaveNetConfig())  # flagship arctic config


def _make(cfg, B, n, seed=0):
    rng = np.random.RandomState(seed)
    T = cfg.receptive_field
    x = rng.randint(0, 256, (B, T)).astype(np.int32)
    h = rng.randn(B, T + n, cfg.n_aux).astype(np.float32)
    xj, hj = _pad_seed(cfg, jnp.asarray(x), jnp.asarray(h, jnp.float32))
    return xj, hj


@pytest.mark.parametrize("B", [4, 8])
def test_pallas_matches_scan_argmax(B):
    cfg = small_cfg()
    params = init_wavenet_params(jax.random.PRNGKey(3), cfg)
    n = 20
    xj, hj = _make(cfg, B, n)
    T0 = xj.shape[1]
    carry = _warmup_state(params, cfg, xj, hj)
    ref = np.asarray(_scan_from_state(params, cfg, carry, hj, T0, n,
                                      "argmax", jax.random.PRNGKey(0)))
    out = np.asarray(pallas_ar_generate(params, cfg, carry, hj, T0, n,
                                        "argmax", jax.random.PRNGKey(0),
                                        interpret=True))
    np.testing.assert_array_equal(ref, out)


def test_prestaged_aux_matches_internal_staging():
    """stage_aux + prestaged=True must reproduce the internal staging
    exactly (the bounded-memory path for huge decode fleets)."""
    from pytorchwavenetvocoder_tpu.ops.ar_kernel import (
        stage_aux,
        staged_aux_rows,
    )

    cfg = small_cfg()
    params = init_wavenet_params(jax.random.PRNGKey(3), cfg)
    B, n = 4, 20
    xj, hj = _make(cfg, B, n)
    T0 = xj.shape[1]
    carry = _warmup_state(params, cfg, xj, hj)
    ref = np.asarray(pallas_ar_generate(params, cfg, carry, hj, T0, n,
                                        "argmax", jax.random.PRNGKey(0),
                                        interpret=True))
    staged = stage_aux(hj, staged_aux_rows(cfg), chunk=16)  # force chunking
    out = np.asarray(pallas_ar_generate(params, cfg, carry, staged, T0, n,
                                        "argmax", jax.random.PRNGKey(0),
                                        interpret=True, prestaged=True))
    np.testing.assert_array_equal(ref, out)
    with pytest.raises(ValueError):
        pallas_ar_generate(params, cfg, carry, staged[:, :, :64], T0, n,
                           "argmax", jax.random.PRNGKey(0),
                           interpret=True, prestaged=True)


@pytest.mark.skip(reason="pltpu.prng_seed has no CPU interpret lowering; "
                         "sampling mode is exercised on hardware by bench.py")
def test_pallas_sampling_mode_runs():
    cfg = small_cfg()
    params = init_wavenet_params(jax.random.PRNGKey(4), cfg)
    n, B = 12, 4
    xj, hj = _make(cfg, B, n, seed=1)
    T0 = xj.shape[1]
    carry = _warmup_state(params, cfg, xj, hj)
    out = np.asarray(pallas_ar_generate(params, cfg, carry, hj, T0, n,
                                        "sampling", jax.random.PRNGKey(7),
                                        interpret=True))
    assert out.shape == (B, n)
    assert out.min() >= 0 and out.max() < 256
    out2 = np.asarray(pallas_ar_generate(params, cfg, carry, hj, T0, n,
                                         "sampling", jax.random.PRNGKey(8),
                                         interpret=True))
    assert (out != out2).any()


def test_pallas_deeper_dilations():
    """Exercise slot arithmetic across a repeat boundary (d: 1..8, 1..8)."""
    cfg = small_cfg(dilation_depth=4, dilation_repeat=2)
    params = init_wavenet_params(jax.random.PRNGKey(5), cfg)
    n, B = 18, 4
    xj, hj = _make(cfg, B, n, seed=2)
    T0 = xj.shape[1]
    carry = _warmup_state(params, cfg, xj, hj)
    ref = np.asarray(_scan_from_state(params, cfg, carry, hj, T0, n,
                                      "argmax", jax.random.PRNGKey(0)))
    out = np.asarray(pallas_ar_generate(params, cfg, carry, hj, T0, n,
                                        "argmax", jax.random.PRNGKey(0),
                                        interpret=True))
    np.testing.assert_array_equal(ref, out)


def test_pallas_mesh_generate_matches_scan():
    """shard_map'd pallas kernel over the 8-device CPU mesh (interpret
    mode) must match the scan decoder, argmax."""
    from pytorchwavenetvocoder_tpu.models.wavenet import pallas_mesh_generate
    from pytorchwavenetvocoder_tpu.parallel import make_mesh

    cfg = small_cfg()
    params = init_wavenet_params(jax.random.PRNGKey(9), cfg)
    B, n = 16, 15  # 2 utterances per device
    xj, hj = _make(cfg, B, n, seed=3)
    T0 = xj.shape[1]
    mesh = make_mesh(8)
    carry = _warmup_state(params, cfg, xj, hj)
    ref = np.asarray(_scan_from_state(params, cfg, carry, hj, T0, n,
                                      "argmax", jax.random.PRNGKey(0)))
    out = np.asarray(pallas_mesh_generate(params, cfg, carry, hj, T0, n,
                                          "argmax", jax.random.PRNGKey(0),
                                          mesh, interpret=True))
    np.testing.assert_array_equal(ref, out)


def test_pad_params_forward_bit_exact():
    """pad_params_for_pallas is inference-transparent: the padded model's
    logits over the original Q classes are BIT-identical (appended zero
    rows/columns never perturb a nonzero partial sum)."""
    from pytorchwavenetvocoder_tpu.models.wavenet import wavenet_forward
    from pytorchwavenetvocoder_tpu.ops.ar_kernel import (
        pad_params_for_pallas,
        pallas_paddable,
    )

    cfg = small_cfg(n_resch=192, n_skipch=160)  # 192%128=64, 160%128=32
    assert not supports_pallas_ar(cfg) and pallas_paddable(cfg)
    params = init_wavenet_params(jax.random.PRNGKey(21), cfg)
    pp, pc = pad_params_for_pallas(params, cfg)
    assert (pc.n_resch, pc.n_skipch) == (256, 256)
    assert supports_pallas_ar(pc)
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randint(0, 256, (2, cfg.receptive_field + 8)),
                    jnp.int32)
    h = jnp.asarray(rng.randn(2, x.shape[1], cfg.n_aux), jnp.float32)
    ref = np.asarray(wavenet_forward(params, cfg, x, h))
    got = np.asarray(wavenet_forward(pp, pc, x, h))
    np.testing.assert_array_equal(ref, got)
    # already-aligned configs pass through untouched
    cfg2 = small_cfg()
    params2 = init_wavenet_params(jax.random.PRNGKey(22), cfg2)
    pp2, pc2 = pad_params_for_pallas(params2, cfg2)
    assert pp2 is params2 and pc2 is cfg2


def test_pallas_padded_channels_match_scan():
    """A non-128-multiple config decoded through the padded kernel must
    reproduce the UNPADDED scan decoder exactly (argmax, interpret) —
    the shim batch_fast_generate applies on TPU for such configs."""
    from pytorchwavenetvocoder_tpu.ops.ar_kernel import pad_params_for_pallas

    cfg = small_cfg(n_resch=192, n_skipch=160)
    params = init_wavenet_params(jax.random.PRNGKey(23), cfg)
    B, n = 4, 20
    xj, hj = _make(cfg, B, n, seed=7)
    T0 = xj.shape[1]
    carry = _warmup_state(params, cfg, xj, hj)
    ref = np.asarray(_scan_from_state(params, cfg, carry, hj, T0, n,
                                      "argmax", jax.random.PRNGKey(0)))
    pp, pc = pad_params_for_pallas(params, cfg)
    pcarry = _warmup_state(pp, pc, xj, hj)
    out = np.asarray(pallas_ar_generate(pp, pc, pcarry, hj, T0, n,
                                        "argmax", jax.random.PRNGKey(0),
                                        interpret=True))
    np.testing.assert_array_equal(ref, out)


def test_pallas_kernel3_matches_scan():
    """kernel_size 3 (the ljspeech operating point): two taps per layer,
    ring capacity 2d, staging through the oldest tap's slot."""
    cfg = small_cfg(kernel_size=3, dilation_depth=3, dilation_repeat=2)
    params = init_wavenet_params(jax.random.PRNGKey(11), cfg)
    B, n = 4, 20
    xj, hj = _make(cfg, B, n, seed=5)
    T0 = xj.shape[1]
    carry = _warmup_state(params, cfg, xj, hj)
    ref = np.asarray(_scan_from_state(params, cfg, carry, hj, T0, n,
                                      "argmax", jax.random.PRNGKey(0)))
    out = np.asarray(pallas_ar_generate(params, cfg, carry, hj, T0, n,
                                        "argmax", jax.random.PRNGKey(0),
                                        interpret=True))
    np.testing.assert_array_equal(ref, out)


def test_pallas_int8_close_to_bf16():
    """Quantized path stays close (interpret mode; same quantization)."""
    cfg = small_cfg()
    params = init_wavenet_params(jax.random.PRNGKey(12), cfg)
    B, n = 4, 12
    xj, hj = _make(cfg, B, n, seed=6)
    T0 = xj.shape[1]
    carry = _warmup_state(params, cfg, xj, hj)
    ref = np.asarray(pallas_ar_generate(params, cfg, carry, hj, T0, n,
                                        "argmax", jax.random.PRNGKey(0),
                                        interpret=True))
    out = np.asarray(pallas_ar_generate(params, cfg, carry, hj, T0, n,
                                        "argmax", jax.random.PRNGKey(0),
                                        interpret=True, quantize=True))
    # int8 introduces small logit error; most argmax picks should agree
    assert (ref == out).mean() > 0.5


def test_pallas_int8_close_to_scan_argmax():
    """Interpret-mode int8 decode: quantization noise may flip borderline
    argmaxes, but the mu-law trajectories must track the f32 scan."""
    from pytorchwavenetvocoder_tpu.ops.ar_kernel import calibrate_act_scales

    cfg = small_cfg()
    params = init_wavenet_params(jax.random.PRNGKey(5), cfg)
    n, B = 30, 4
    xj, hj = _make(cfg, B, n, seed=2)
    T0 = xj.shape[1]
    scales = calibrate_act_scales(params, cfg, xj, hj)
    carry = _warmup_state(params, cfg, xj, hj)
    ref = np.asarray(_scan_from_state(params, cfg, carry, hj, T0, n,
                                      "argmax", jax.random.PRNGKey(0)))
    out = np.asarray(pallas_ar_generate(params, cfg, carry, hj, T0, n,
                                        "argmax", jax.random.PRNGKey(0),
                                        interpret=True, quantize=True,
                                        act_scales=scales))
    diff = np.abs(ref.astype(int) - out.astype(int))
    assert np.median(diff) <= 2, np.median(diff)
    assert (diff <= 10).mean() > 0.7, (diff.mean(), (diff <= 10).mean())


def test_pallas_int8_kernel3_close_to_scan():
    """int8 with kernel_size 3 (ljspeech shape): both lagged taps read
    raw int8 rings through qdot_pre (launch-time re-quantization)."""
    from pytorchwavenetvocoder_tpu.ops.ar_kernel import calibrate_act_scales

    cfg = small_cfg(kernel_size=3, dilation_depth=3, dilation_repeat=2)
    params = init_wavenet_params(jax.random.PRNGKey(7), cfg)
    n, B = 24, 4
    xj, hj = _make(cfg, B, n, seed=9)
    T0 = xj.shape[1]
    scales = calibrate_act_scales(params, cfg, xj, hj)
    carry = _warmup_state(params, cfg, xj, hj)  # k=3 rings are raw already
    ref = np.asarray(_scan_from_state(params, cfg, carry, hj, T0, n,
                                      "argmax", jax.random.PRNGKey(0)))
    out = np.asarray(pallas_ar_generate(params, cfg, carry, hj, T0, n,
                                        "argmax", jax.random.PRNGKey(0),
                                        interpret=True, quantize=True,
                                        act_scales=scales))
    diff = np.abs(ref.astype(int) - out.astype(int))
    assert np.median(diff) <= 2, np.median(diff)
    assert (diff <= 10).mean() > 0.7, (diff.mean(), (diff <= 10).mean())


@pytest.mark.parametrize("B", [4, 128, 72])  # single-chunk / lax.map / uneven
def test_warmup_collected_maxes_match_calibration(B):
    """_warmup_state(collect_act_maxes=True) must reproduce
    calibrate_act_scales — the int8 fleet path rides the warm-up forward
    instead of a second teacher-forced pass, across all three batch-
    chunking branches of the warm-up."""
    from pytorchwavenetvocoder_tpu.ops.ar_kernel import (
        act_scales_from_maxes,
        calibrate_act_scales,
    )

    cfg = small_cfg()
    params = init_wavenet_params(jax.random.PRNGKey(11), cfg)
    xj, hj = _make(cfg, B, 8, seed=4)
    ref_scales = np.asarray(calibrate_act_scales(params, cfg, xj, hj))
    ref_carry = _warmup_state(params, cfg, xj, hj)
    carry, maxes = _warmup_state(params, cfg, xj, hj,
                                 collect_act_maxes=True)
    scales = np.asarray(act_scales_from_maxes(maxes))
    # f32 warm-up shares the exact op sequence with _forward_act_maxes
    np.testing.assert_allclose(scales, ref_scales, rtol=1e-6)
    # collecting maxes must not perturb the carry
    for a, b in zip(jax.tree_util.tree_leaves(carry),
                    jax.tree_util.tree_leaves(ref_carry)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the bf16 warm-up's maxes carry only bf16 rounding
    _, maxes_bf16 = _warmup_state(params, cfg, xj, hj,
                                  bf16_intermediates=True,
                                  collect_act_maxes=True)
    np.testing.assert_allclose(np.asarray(act_scales_from_maxes(maxes_bf16)),
                               ref_scales, rtol=2e-2)


def test_warmup_collected_maxes_sharded_matches_unsharded():
    """The int8 fleet path collects act maxes inside the warm-up even
    when the fleet is sharded over the mesh (batch_fast_generate's
    mesh + quantize branch): GSPMD must reduce the per-shard maxes to
    the same global scales the unsharded call produces."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pytorchwavenetvocoder_tpu.parallel import make_mesh

    cfg = small_cfg()
    params = init_wavenet_params(jax.random.PRNGKey(13), cfg)
    xj, hj = _make(cfg, 16, 8, seed=6)
    _, ref = _warmup_state(params, cfg, xj, hj, collect_act_maxes=True)
    mesh = make_mesh(8)
    xs = jax.device_put(xj, NamedSharding(mesh, P("data")))
    hs = jax.device_put(hj, NamedSharding(mesh, P("data")))
    _, mx = _warmup_state(params, cfg, xs, hs, collect_act_maxes=True)
    np.testing.assert_allclose(np.asarray(mx), np.asarray(ref), rtol=1e-6)
