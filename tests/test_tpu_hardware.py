"""Real-TPU hardware tests (run via ``WN_TPU_TESTS=1 pytest``; the
default CPU test session skips them — scripts/tpu_learning_smoke.sh is
the driver).

Covers what interpret mode CANNOT: the Pallas Gumbel-max sampler's
DISTRIBUTION (pltpu.prng_seed has no CPU lowering, and a biased sampler
would silently wreck audio quality — VERDICT round-1 item 5), seed
determinism, and the int8 decode path end-to-end on silicon.
Reference sampler being replaced: `wavenet_vocoder/nets/wavenet.py:466-470`.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    os.environ.get("WN_TPU_TESTS") != "1" or jax.default_backend() != "tpu",
    reason="needs WN_TPU_TESTS=1 and a real TPU")


def _kernel_cfg():
    from pytorchwavenetvocoder_tpu.models.wavenet import WaveNetConfig

    return WaveNetConfig(n_quantize=256, n_aux=28, n_resch=128,
                         n_skipch=128, dilation_depth=3, dilation_repeat=2,
                         kernel_size=2, upsampling_factor=0,
                         compute_dtype="bfloat16")


def _fixed_logit_params(cfg, logits):
    """All-zero network: the decoder's logits equal post2's bias, so the
    emitted samples are iid Categorical(softmax(logits))."""
    from pytorchwavenetvocoder_tpu.models.wavenet import init_wavenet_params

    params = init_wavenet_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(jnp.zeros_like, params)
    params["post2"]["b"] = jnp.asarray(logits, jnp.float32)
    return params


def _decode(params, cfg, B, n, rng, quantize=False):
    from pytorchwavenetvocoder_tpu.models.wavenet import (
        _pad_seed,
        _warmup_state,
    )
    from pytorchwavenetvocoder_tpu.ops.ar_kernel import pallas_ar_generate

    x = jnp.full((B, 1), 128, jnp.int32)
    h = jnp.zeros((B, cfg.receptive_field + n, cfg.n_aux), jnp.float32)
    xj, hj = _pad_seed(cfg, x, h)
    carry = _warmup_state(params, cfg, xj, hj)
    return np.asarray(pallas_ar_generate(
        params, cfg, carry, hj, xj.shape[1], n, "sampling", rng,
        quantize=quantize))


def test_pallas_sampler_distribution_chi2():
    """Gumbel-max sample frequencies must match softmax probabilities."""
    cfg = _kernel_cfg()
    Q = cfg.n_quantize
    # 16 live classes spread over the range; the rest suppressed
    logits = np.full(Q, -30.0)
    live = np.arange(16) * 16 + 3
    rng0 = np.random.RandomState(0)
    logits[live] = rng0.uniform(-1.0, 1.0, 16)
    params = _fixed_logit_params(cfg, logits)

    B, n = 128, 2000
    samples = _decode(params, cfg, B, n, jax.random.PRNGKey(7)).ravel()
    probs = np.exp(logits - logits.max())
    probs /= probs.sum()

    counts = np.bincount(samples, minlength=Q)
    assert counts[probs < 1e-9].sum() == 0  # suppressed classes never drawn

    expected = probs[live] * samples.size
    chi2 = float(np.sum((counts[live] - expected) ** 2 / expected))
    # df = 15; 99.9th percentile ~ 37.7.  Allow slack for the bf16 logit
    # path, but a biased sampler (e.g. reused PRNG streams) blows this up
    # by orders of magnitude.
    assert chi2 < 60.0, (chi2, counts[live], expected.astype(int))


def test_pallas_sampler_seed_determinism_and_decorrelation():
    cfg = _kernel_cfg()
    logits = np.zeros(256)  # uniform: maximally sensitive to stream reuse
    params = _fixed_logit_params(cfg, logits)
    B, n = 8, 500
    a = _decode(params, cfg, B, n, jax.random.PRNGKey(3))
    b = _decode(params, cfg, B, n, jax.random.PRNGKey(3))
    c = _decode(params, cfg, B, n, jax.random.PRNGKey(4))
    np.testing.assert_array_equal(a, b)  # same seed -> same stream
    assert (a != c).mean() > 0.9         # different seed -> decorrelated
    # batch rows must not share a stream either
    assert (a[0] != a[1]).mean() > 0.9


def test_kernel3_matches_scan_on_hardware():
    """kernel_size=3 (ljspeech configs) on silicon: the round-1 review
    found a DMA-semaphore sizing bug interpret mode could not catch, so
    the k=3 path must be exercised on the real chip.  bf16 rounding
    differs slightly between the scan and Pallas implementations, so
    assert near-identical argmax trajectories, not bit equality."""
    from pytorchwavenetvocoder_tpu.models.wavenet import (
        WaveNetConfig,
        _pad_seed,
        _scan_from_state,
        _warmup_state,
        init_wavenet_params,
    )
    from pytorchwavenetvocoder_tpu.ops.ar_kernel import pallas_ar_generate

    cfg = WaveNetConfig(n_quantize=256, n_aux=28, n_resch=128, n_skipch=128,
                        dilation_depth=4, dilation_repeat=2, kernel_size=3,
                        upsampling_factor=0, compute_dtype="bfloat16")
    params = init_wavenet_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.RandomState(0)
    B, n = 8, 300
    T = cfg.receptive_field
    x = rng.randint(0, 256, (B, T)).astype(np.int32)
    h = rng.randn(B, T + n, cfg.n_aux).astype(np.float32)
    xj, hj = _pad_seed(cfg, jnp.asarray(x), jnp.asarray(h, jnp.float32))
    T0 = xj.shape[1]
    carry = _warmup_state(params, cfg, xj, hj)
    ref = np.asarray(_scan_from_state(params, cfg, carry, hj, T0, n,
                                      "argmax", jax.random.PRNGKey(0)))
    out = np.asarray(pallas_ar_generate(params, cfg, carry, hj, T0, n,
                                        "argmax", jax.random.PRNGKey(0)))
    agree = (ref == out).mean()
    dist = np.abs(ref.astype(int) - out.astype(int))
    assert agree > 0.95 or np.percentile(dist, 95) <= 2, (
        agree, np.percentile(dist, 95))


def test_padded_channels_decode_on_hardware():
    """Off-128-grid channel counts route through the Pallas kernel via
    the zero-padding shim (pad_params_for_pallas) on silicon.  Padded
    logits are bit-equal to the unpadded model's, so the argmax decode
    should track the scan oracle as closely as the aligned configs do
    (bf16 warm-up rounding still cascades — assert closeness, not bit
    equality)."""
    from pytorchwavenetvocoder_tpu.models.wavenet import (
        WaveNetConfig,
        batch_fast_generate,
        init_wavenet_params,
    )
    from pytorchwavenetvocoder_tpu.ops.ar_kernel import (
        pallas_paddable,
        supports_pallas_ar,
    )

    cfg = WaveNetConfig(n_quantize=256, n_aux=28, n_resch=192, n_skipch=160,
                        dilation_depth=4, dilation_repeat=2, kernel_size=2,
                        upsampling_factor=0, compute_dtype="bfloat16")
    assert not supports_pallas_ar(cfg) and pallas_paddable(cfg)
    params = init_wavenet_params(jax.random.PRNGKey(5), cfg)
    rng = np.random.RandomState(2)
    B, n = 8, 300
    x = np.full((B, 1), 128, np.int32)
    h = rng.randn(B, cfg.receptive_field + n, cfg.n_aux).astype(np.float32)

    # impl="pallas" on this config only runs through the padding shim
    out = np.stack(batch_fast_generate(params, cfg, x, h, [n] * B,
                                       mode="argmax", impl="pallas"))
    ref = np.stack(batch_fast_generate(params, cfg, x, h, [n] * B,
                                       mode="argmax", impl="scan"))
    dist = np.abs(ref.astype(int) - out.astype(int))
    agree = (ref == out).mean()
    assert agree > 0.9 or np.percentile(dist, 95) <= 2, (
        agree, np.percentile(dist, 95))


def test_int8_decode_matches_bf16_argmax_mostly():
    """Calibrated-static-scale int8 argmax decode should track the bf16
    decode closely on a smooth model (exact match is not expected)."""
    from pytorchwavenetvocoder_tpu.models.wavenet import (
        WaveNetConfig,
        batch_fast_generate,
        init_wavenet_params,
    )

    cfg = WaveNetConfig(n_quantize=256, n_aux=28, n_resch=128, n_skipch=128,
                        dilation_depth=4, dilation_repeat=2, kernel_size=2,
                        upsampling_factor=0, compute_dtype="bfloat16")
    params = init_wavenet_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.RandomState(0)
    B, n = 8, 400
    x = np.full((B, 1), 128, np.int32)
    h = rng.randn(B, cfg.receptive_field + n, cfg.n_aux).astype(np.float32)

    ref = batch_fast_generate(params, cfg, x, h, [n] * B, mode="argmax",
                              impl="pallas")
    q = batch_fast_generate(params, cfg, x, h, [n] * B, mode="argmax",
                            impl="pallas", quantize=True)
    # mu-law class distance, not exact equality: int8 noise may shift
    # borderline argmaxes, but trajectories must stay close
    diff = np.abs(np.stack(ref).astype(int) - np.stack(q).astype(int))
    assert np.median(diff) <= 2, np.median(diff)
    assert (diff <= 8).mean() > 0.8, (diff.mean(), (diff <= 8).mean())


def test_fused_train_kernels_match_xla_on_hardware():
    """Fused Pallas train step vs the XLA path, on silicon.

    Interpret mode validates the kernel math but CANNOT catch Mosaic
    lowering bugs (DMA semaphore behavior, dynamic-rotate lowering,
    alignment) — two such bugs were only visible on hardware during
    development.  Train both paths for a few steps from identical state
    and require near-identical loss trajectories.
    """
    import optax

    from pytorchwavenetvocoder_tpu.models.wavenet import (
        WaveNetConfig,
        init_wavenet_params,
        wavenet_forward,
    )
    from pytorchwavenetvocoder_tpu.ops.train_kernel import (
        supports_fused_train,
    )
    from pytorchwavenetvocoder_tpu.parallel import masked_ce_loss
    from pytorchwavenetvocoder_tpu.parallel.train import make_optimizer

    cfg = WaveNetConfig(n_quantize=256, n_aux=28, n_resch=256,
                        n_skipch=256, dilation_depth=6, dilation_repeat=2,
                        kernel_size=2, upsampling_factor=0,
                        compute_dtype="bfloat16")
    T = 4000
    assert supports_fused_train(cfg, T)
    rf = cfg.receptive_field
    params0 = init_wavenet_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(1e-4)
    rng = np.random.RandomState(0)
    bh = jnp.asarray(rng.randn(1, T, cfg.n_aux), np.float32)

    def run(fused, n=6):
        def one_step(carry, _):
            params, opt_state, key = carry
            key, k1 = jax.random.split(key)
            bx = jax.random.randint(k1, (1, T), 0, 256)

            def loss_fn(p):
                return masked_ce_loss(
                    wavenet_forward(p, cfg, bx, bh,
                                    bf16_intermediates=True,
                                    fused=fused), bx, rf)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state, key), loss

        f = jax.jit(lambda p, o, k: jax.lax.scan(
            one_step, (p, o, k), None, length=n)[1])
        return np.asarray(f(params0, tx.init(params0), jax.random.PRNGKey(7)))

    losses_xla = run(False)
    losses_fused = run(True)
    # same data order (same key): trajectories differ only by bf16
    # rounding of the kernel's saved activations
    np.testing.assert_allclose(losses_fused, losses_xla, rtol=2e-3)
    assert losses_xla[-1] < losses_xla[0]  # actually learning


def test_int8_sampler_distribution_chi2_at_flagship_width():
    """The int8-MXU sampling path's DISTRIIBUTION at the flagship channel
    width (512 resch): sample frequencies under quantize=True must match
    softmax probabilities.  The 128-ch chi^2 test cannot see width-
    dependent quantization artifacts in the logit path feeding the
    Gumbel-max sampler."""
    from pytorchwavenetvocoder_tpu.models.wavenet import WaveNetConfig
    from pytorchwavenetvocoder_tpu.ops.ar_kernel import calibrate_act_scales
    from pytorchwavenetvocoder_tpu.models.wavenet import (
        _pad_seed,
        _warmup_state,
    )
    from pytorchwavenetvocoder_tpu.ops.ar_kernel import pallas_ar_generate

    cfg = WaveNetConfig(n_quantize=256, n_aux=28, n_resch=512,
                        n_skipch=256, dilation_depth=3, dilation_repeat=2,
                        kernel_size=2, upsampling_factor=0,
                        compute_dtype="bfloat16")
    Q = cfg.n_quantize
    logits = np.full(Q, -30.0)
    live = np.arange(16) * 16 + 3
    rng0 = np.random.RandomState(0)
    logits[live] = rng0.uniform(-1.0, 1.0, 16)
    params = _fixed_logit_params(cfg, logits)

    B, n = 128, 1500
    x = jnp.full((B, 1), 128, jnp.int32)
    h = jnp.zeros((B, cfg.receptive_field + n, cfg.n_aux), jnp.float32)
    xj, hj = _pad_seed(cfg, x, h)
    carry = _warmup_state(params, cfg, xj, hj)
    scales = calibrate_act_scales(params, cfg, xj, hj)
    samples = np.asarray(pallas_ar_generate(
        params, cfg, carry, hj, xj.shape[1], n, "sampling",
        jax.random.PRNGKey(11), quantize=True, act_scales=scales)).ravel()

    probs = np.exp(logits - logits.max())
    probs /= probs.sum()
    counts = np.bincount(samples, minlength=Q)
    assert counts[probs < 1e-9].sum() == 0
    expected = probs[live] * samples.size
    chi2 = float(np.sum((counts[live] - expected) ** 2 / expected))
    assert chi2 < 60.0, (chi2, counts[live], expected.astype(int))


def test_int8_decode_tracks_bf16_at_flagship_scale():
    """int8 vs bf16 argmax decode at the FULL flagship config (30x512,
    RF 3070) — the exact model whose int8 throughput is the headline
    benchmark.  Quantization error accumulates through 30 layers and a
    3070-sample receptive field; the reduced-scale tracking test cannot
    bound that."""
    from pytorchwavenetvocoder_tpu.models.wavenet import (
        WaveNetConfig,
        batch_fast_generate,
        init_wavenet_params,
    )

    cfg = WaveNetConfig(n_quantize=256, n_aux=28, n_resch=512, n_skipch=256,
                        dilation_depth=10, dilation_repeat=3, kernel_size=2,
                        upsampling_factor=0, compute_dtype="bfloat16")
    params = init_wavenet_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.RandomState(0)
    B, n = 8, 400
    x = np.full((B, 1), 128, np.int32)
    h = rng.randn(B, cfg.receptive_field + n, cfg.n_aux).astype(np.float32)

    ref = batch_fast_generate(params, cfg, x, h, [n] * B, mode="argmax",
                              impl="pallas")
    q = batch_fast_generate(params, cfg, x, h, [n] * B, mode="argmax",
                            impl="pallas", quantize=True)
    diff = np.abs(np.stack(ref).astype(int) - np.stack(q).astype(int))
    assert np.median(diff) <= 2, np.median(diff)
    assert (diff <= 8).mean() > 0.8, (diff.mean(), (diff <= 8).mean())


def test_device_harvest_tracks_host_on_hardware():
    """Device Harvest (dsp/harvest_jax.py) vs the f64 host path on
    silicon.  The CPU suite runs the same comparison through the XLA
    CPU backend; this covers what that cannot — the TPU's own FFT
    lowering for the filter bank, the Hillis-Steele cummax path (the
    CPU backend takes lax.cummax instead), and the MXU einsums pinned
    to Precision.HIGHEST in the refinement.  Margins measured on the
    CPU backend in pure f32 are ~1e-8 median relative; the thresholds
    here leave two orders of slack for the TPU FFT."""
    from pytorchwavenetvocoder_tpu.dsp import harvest as H
    from pytorchwavenetvocoder_tpu.dsp.harvest_jax import harvest_jax_many

    fs = 16000
    rng = np.random.RandomState(0)
    xs = []
    for sec, f0, nz in [(2.0, 120.0, 0.05), (1.3, 190.0, 0.1),
                        (0.9, 250.0, 0.02)]:
        t = np.arange(int(sec * fs)) / fs
        f0c = f0 * (1 + 0.05 * np.sin(2 * np.pi * 3 * t))
        ph = 2 * np.pi * np.cumsum(f0c) / fs
        xs.append(np.sin(ph) + 0.3 * np.sin(2 * ph)
                  + nz * rng.standard_normal(len(t)))
    fjs = harvest_jax_many(xs, fs, 71, 400)
    for x, fj in zip(xs, fjs):
        fh = H.harvest(x, fs, 71, 400)
        vh, vj = fh > 0, fj > 0
        assert (vh == vj).mean() > 0.98, (vh == vj).mean()
        both = vh & vj
        rel = np.abs(fj[both] - fh[both]) / fh[both]
        assert np.median(rel) < 1e-4, np.median(rel)
        assert rel.max() < 0.01, rel.max()


def test_fleet_512x48k_decodes_within_hbm():
    """Production-scale fleet on silicon: 512 utterances x 48000 samples
    (3 s at 16 kHz) through the FULL flagship model (30x512, RF 3070)
    with upsampling, staging, int8 quantization and the HBM auto-capper
    engaged.  This is the exact configuration whose OOM destroyed the
    round-4 benchmark (RESOURCE_EXHAUSTED in stage_aux with a second
    fleet resident): batch_fast_generate must now split the fleet into
    sequential sub-fleets whenever warm-up + staged stream exceed the
    chip budget, and the decode must finish rc=0."""
    from pytorchwavenetvocoder_tpu.models.wavenet import (
        WaveNetConfig,
        batch_fast_generate,
        init_wavenet_params,
    )

    cfg = WaveNetConfig(n_quantize=256, n_aux=28, n_resch=512, n_skipch=256,
                        dilation_depth=10, dilation_repeat=3, kernel_size=2,
                        upsampling_factor=80, compute_dtype="bfloat16")
    params = init_wavenet_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.RandomState(3)
    B, n = 512, 48000
    n_fr = (cfg.receptive_field + n) // 80 + 2
    h = rng.randn(B, n_fr, cfg.n_aux).astype(np.float32)
    x = np.full((B, 1), 128, np.int32)

    outs = batch_fast_generate(params, cfg, x, h, [n] * B, mode="sampling",
                               rng=jax.random.PRNGKey(7), impl="pallas",
                               quantize=True)
    assert len(outs) == B
    assert all(len(o) == n for o in outs)
    # a trained-free net still must emit varied mu-law ids, not a constant
    assert len(np.unique(np.stack(outs[:8]))) > 16


def test_tail_batch_unaligned_fleet_decodes():
    """Fleet sizes off the 8-row tile grid (a decode corpus's TAIL batch,
    or a single utterance) must decode through the Pallas path: Mosaic
    rejects HBM slices whose batch extent is not tile-aligned ("Slice
    shape along dimension 1 must be aligned to tiling"), so
    batch_fast_generate pads the fleet to a multiple of 8 and drops the
    pad rows.  Argmax output per utterance must be identical to the same
    utterances decoded inside an aligned fleet (lockstep masking makes
    rows independent)."""
    from pytorchwavenetvocoder_tpu.models.wavenet import (
        WaveNetConfig,
        batch_fast_generate,
        init_wavenet_params,
    )

    cfg = WaveNetConfig(n_quantize=256, n_aux=28, n_resch=128, n_skipch=128,
                        dilation_depth=4, dilation_repeat=2, kernel_size=2,
                        upsampling_factor=0, compute_dtype="bfloat16")
    params = init_wavenet_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.RandomState(4)
    n = 300
    x8 = np.full((8, 1), 128, np.int32)
    h8 = rng.randn(8, cfg.receptive_field + n, cfg.n_aux).astype(np.float32)
    ref = batch_fast_generate(params, cfg, x8, h8, [n] * 8, mode="argmax",
                              impl="pallas")
    for B in (1, 3):  # single utterance / tail batch
        out = batch_fast_generate(params, cfg, x8[:B], h8[:B], [n] * B,
                                  mode="argmax", impl="pallas")
        for b in range(B):
            np.testing.assert_array_equal(out[b], ref[b])
    # int8 path pads the same way (static scales from the padded warm-up)
    q = batch_fast_generate(params, cfg, x8[:3], h8[:3], [n] * 3,
                            mode="argmax", impl="pallas", quantize=True)
    assert len(q) == 3 and all(len(s) == n for s in q)
