#!/usr/bin/env python
"""Headline benchmark: batched AR mu-law decode throughput per chip.

Runs the flagship arctic-sd model (30x512 gated layers, RF 3070, kernel
2, uf 80) and measures steady-state aggregate samples/sec of the fused
Pallas batched decoder on one chip (warm-up timed separately — it is a
one-time O(batch) cost per decode fleet).

Robustness contract (learned the hard way in round 4, where an optional
metric OOMed and destroyed the already-measured headline):

- the decode headline is measured FIRST and its JSON line is printed
  LAST (the driver records the last parseable line);
- every optional metric (train step, e2e fleet) runs inside its own
  try/except — a failure prints an error-annotated line for that metric
  only and can never take the headline down with it;
- each block frees its device buffers before the next one runs.

``vs_baseline`` is measured against the BASELINE.md north star:
>100x real-time aggregate generation at 16 kHz = 1.6M samples/sec/chip
(the reference publishes no numbers; its per-sample Python loop decoder
is far below real time per GPU).
"""

import gc
import json
import os
import sys
import time
import traceback

import numpy as np

BASELINE_SPS = 1.6e6  # 100x RT at 16 kHz


def _flagship_config():
    from pytorchwavenetvocoder_tpu.models.wavenet import WaveNetConfig

    return WaveNetConfig(
        n_quantize=256, n_aux=28, n_resch=512, n_skipch=256,
        dilation_depth=10, dilation_repeat=3, kernel_size=2,
        upsampling_factor=80, compute_dtype="bfloat16")


def measure_decode(params, config, B, n_samples, use_pallas, use_int8):
    """Steady-state decode throughput at fleet size B.

    Builds its fleet, measures bf16 (+ int8 when enabled) over two
    separated rounds of distinct keys, and frees every device buffer
    before returning plain floats."""
    import jax
    import jax.numpy as jnp

    from pytorchwavenetvocoder_tpu.models.wavenet import (
        _pad_seed,
        _scan_from_state,
        _warmup_state,
        upsample_aux,
    )
    from pytorchwavenetvocoder_tpu.ops.ar_kernel import (
        calibrate_act_scales,
        pallas_ar_generate,
    )

    rng = np.random.RandomState(0)
    x = np.full((B, 1), 128, np.int32)
    n_frames = (config.receptive_field + n_samples) // 80 + 2
    h = rng.randn(B, n_frames, 28).astype(np.float32)

    xj = jnp.asarray(x)
    hj = upsample_aux(params, config, jnp.asarray(h))
    xj, hj = _pad_seed(config, xj, hj)
    T0 = xj.shape[1]
    need = T0 + n_samples
    if hj.shape[1] < need:
        hj = jnp.pad(hj, ((0, 0), (0, need - hj.shape[1]), (0, 0)),
                     mode="edge")

    def decode_fn(carry, key, quantize=False, scales=None):
        if use_pallas:
            return pallas_ar_generate(params, config, carry, hj, T0,
                                      n_samples, "sampling", key,
                                      quantize=quantize, act_scales=scales)
        return _scan_from_state(params, config, carry, hj, T0, n_samples,
                                "sampling", key)

    # compile + warm caches (bf16 warm-up: the pallas kernel consumes
    # the rings in bf16 anyway; ~18% faster fleet warm-up)
    wb = bool(use_pallas)
    t0 = time.time()
    carry = _warmup_state(params, config, xj, hj, bf16_intermediates=wb)
    jax.block_until_ready(carry)
    t_warm_compile = time.time() - t0
    np.asarray(decode_fn(carry, jax.random.PRNGKey(0)))
    scales = (calibrate_act_scales(params, config, xj, hj)
              if use_int8 else None)
    if use_int8:
        np.asarray(decode_fn(carry, jax.random.PRNGKey(0), True, scales))

    # warm-up cost (cached executable)
    t0 = time.time()
    carry = _warmup_state(params, config, xj, hj, bf16_intermediates=wb)
    jax.block_until_ready(carry)
    warmup_s = time.time() - t0

    # steady state, best of N with distinct keys (the axon runtime
    # memoizes identical executions; run-to-run variance through the
    # tunnel is large, so take enough samples).  A second round runs
    # after a pause: a degraded chip/tunnel window was observed to
    # persist for a whole measurement loop (~18% slow, both dtypes) and
    # then clear — two separated rounds protect the recorded number.
    times, times_bf16 = [], []

    def measure_round(base_key):
        for k in range(base_key, base_key + 7):
            t0 = time.time()
            np.asarray(decode_fn(carry, jax.random.PRNGKey(k)))
            times_bf16.append(time.time() - t0)
            if use_int8:
                t0 = time.time()
                np.asarray(decode_fn(carry, jax.random.PRNGKey(k), True,
                                     scales))
                times.append(time.time() - t0)

    measure_round(1)
    time.sleep(3.0)
    measure_round(100)
    elapsed_bf16 = min(times_bf16)
    elapsed = min(times) if use_int8 else elapsed_bf16

    total = B * n_samples
    result = {
        "batch": B,
        "n_samples": n_samples,
        "samples_per_sec": round(total / elapsed, 1),
        "scan_seconds": round(elapsed, 4),
        "us_per_step": round(elapsed / n_samples * 1e6, 1),
        "warmup_seconds": round(warmup_s, 3),
        "warmup_compile_seconds": round(t_warm_compile, 1),
        "realtime_x_16k": round(total / elapsed / 16000.0, 2),
        "bf16_samples_per_sec": round(total / elapsed_bf16, 1),
        "bf16_us_per_step": round(elapsed_bf16 / n_samples * 1e6, 1),
        "impl": ("pallas-int8" if use_int8 else
                 "pallas" if use_pallas else "scan"),
    }
    # free the fleet before the caller runs the next metric block
    del carry, hj, xj, scales
    gc.collect()
    return result


def bench_train(config):
    """Train step time at the arctic-sd operating point (BASELINE.md
    tracked metric; the reference logs sec/batch at batch_length 20000,
    batch_size 1)."""
    import jax
    import jax.numpy as jnp
    import optax

    from pytorchwavenetvocoder_tpu.models.wavenet import wavenet_forward
    from pytorchwavenetvocoder_tpu.parallel import (
        create_train_state,
        masked_ce_loss,
    )
    from pytorchwavenetvocoder_tpu.parallel.train import make_optimizer
    from pytorchwavenetvocoder_tpu.ops.train_kernel import (
        supports_fused_train,
    )

    rng = np.random.RandomState(1)
    bl = 20000
    rf = config.receptive_field
    uf = config.upsampling_factor
    T = ((bl + rf) // uf + 1) * uf  # frame-aligned batch_length + rf
    # fused Pallas train kernels (ops/train_kernel.py): the production
    # default on TPU (make_train_step auto-gates the same way);
    # BENCH_FUSED=0 reverts to the XLA path
    use_fused = (jax.default_backend() == "tpu"
                 and supports_fused_train(config, T)
                 and os.environ.get("BENCH_FUSED", "1") == "1")
    state = create_train_state(jax.random.PRNGKey(0), config, lr=1e-4)
    tx = make_optimizer(1e-4)
    tb_h = jnp.asarray(rng.randn(1, T // uf, 28), np.float32)

    # N steps INSIDE one jit: per-call host timing through a remote
    # runtime adds ~30 ms of dispatch/fetch latency per call, which
    # inflated earlier single-step measurements to 114-124 ms; the
    # on-device step is what the metric should report.
    def one_step(carry, _):
        params, opt_state, key = carry
        key, k1 = jax.random.split(key)
        bx = jax.random.randint(k1, (1, T), 0, 256)

        def loss_fn(p):
            return masked_ce_loss(
                wavenet_forward(p, config, bx, tb_h,
                                bf16_intermediates=True,
                                fused=use_fused), bx, rf)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, key), loss

    # Steady-state per-step time via the difference of two MULTI-step
    # programs: t(N) = c + N*s only holds for N >= ~10 (a 1-step program
    # has measurably lower fixed cost c than the scan programs, which
    # made the old (t10-t1)/9 estimate overstate s by ~3 ms/step at the
    # flagship point).  (t30-t10)/20 cancels both the per-call
    # dispatch/fetch latency and the scan programs' fixed overhead, and
    # matches the profiler's on-device while-loop span to within noise.
    N1, N2 = 10, 30

    def run_n(params, opt_state, key, n):
        return jax.lax.scan(one_step, (params, opt_state, key), None,
                            length=n)[1][-1]

    f1 = jax.jit(lambda p, o, k: run_n(p, o, k, 1))
    fA = jax.jit(lambda p, o, k: run_n(p, o, k, N1))
    fB = jax.jit(lambda p, o, k: run_n(p, o, k, N2))
    for f in (f1, fA, fB):
        float(f(state.params, state.opt_state, jax.random.PRNGKey(0)))
    t1s, tAs, tBs = [], [], []
    for s in range(1, 4):
        for f, acc in ((f1, t1s), (fA, tAs), (fB, tBs)):
            t0 = time.time()
            float(f(state.params, state.opt_state, jax.random.PRNGKey(s)))
            acc.append(time.time() - t0)
    t_step = max(1e-4, (min(tBs) - min(tAs)) / (N2 - N1))
    # the r1-r4 estimator, kept in the detail for trend continuity
    t_step_1v10 = max(1e-4, (min(tAs) - min(t1s)) / (N1 - 1))

    # analytic model FLOPs for one fwd+bwd step (2 FLOPs per MAC;
    # backward ~= 2x forward: one matmul set each for dL/dx and dL/dW).
    # Embed/post stacks included; upsampler negligible.
    R, S = config.n_resch, config.n_skipch
    k, A, Q = config.kernel_size, config.n_aux, config.n_quantize
    L = len(config.dilations)
    per_t = (L * (k * R * 2 * R + A * 2 * R + R * S + R * R)
             + Q * R + S * S + S * Q)
    flops_step = 3 * 2 * T * per_t
    # bf16 peak by device generation (fallback: v5e)
    dev_kind = jax.devices()[0].device_kind.lower()
    peak = {"v5 lite": 197e12, "v5e": 197e12, "v5p": 459e12,
            "v4": 275e12, "v6": 918e12}.get(
        next((g for g in ("v5 lite", "v5e", "v5p", "v6", "v4")
              if g in dev_kind), "v5e"), 197e12)
    mfu = flops_step / t_step / peak

    detail = {
        "train_step_seconds": round(t_step, 4),
        "train_samples_per_sec": round(bl / t_step, 1),
        "train_batches_per_sec": round(1.0 / t_step, 3),
        "train_batch_length": bl,
        "per_call_seconds": round(min(t1s), 4),
        # (t10-t1)/9, the round-1..4 estimator (includes ~1/9 of the
        # scan programs' fixed overhead); r4 measured 0.0485 with it
        "train_step_seconds_1v10_method": round(t_step_1v10, 4),
        "step_estimator": "(t30-t10)/20 steady-state (changed r5)",
        "model_flops_per_step": flops_step,
        "mfu": round(mfu, 4),
        "peak_flops_assumed": peak,
        "impl": "pallas-fused" if use_fused else "xla",
        # the 0.088 s baseline is this repo's own round-1 XLA step at
        # the same operating point; the reference publishes no train
        # throughput numbers, so vs_baseline measures self-relative
        # speedup, not reference-relative speed
        "baseline_source": "round1 XLA step 0.088 s (self-referential)",
    }
    print(json.dumps({
        "metric": "train_step_seconds",
        "value": round(t_step, 4),
        "unit": "s/step(bl=20000)",
        "vs_baseline": round(0.088 / t_step, 4),
        "detail": detail,
    }), flush=True)
    del state, f1, fA, fB
    gc.collect()


def bench_e2e(params, config, use_pallas, use_int8):
    """End-to-end fleet RTF at realistic utterance length.

    The headline times the steady-state scan only; this metric answers
    "what does a production decode fleet actually deliver": ONE
    wall-clock around the full batch_fast_generate chain — aux
    upsampling, int8 calibration, ring warm-up, aux staging, the AR
    scan, device->host copy — plus the host mu-law inverse, at a
    3-second (48k-sample) eval utterance per fleet slot.
    batch_fast_generate's HBM auto-capping splits the fleet into
    sequential sub-fleets if it would not fit the chip."""
    import jax

    from pytorchwavenetvocoder_tpu.models.wavenet import batch_fast_generate
    from pytorchwavenetvocoder_tpu.ops.mulaw import decode_mu_law

    B = int(os.environ.get("BENCH_E2E_BATCH", "256"))
    n_e2e = int(os.environ.get("BENCH_E2E_SAMPLES", "48000"))
    rng = np.random.RandomState(2)
    n_fr = (config.receptive_field + n_e2e) // 80 + 2
    h2 = rng.randn(B, n_fr, 28).astype(np.float32)
    x2 = np.full((B, 1), 128, np.int32)
    lens = [n_e2e] * B
    impl2 = "pallas" if use_pallas else "scan"

    def e2e_once(seed):
        t0 = time.time()
        outs = batch_fast_generate(
            params, config, x2, h2, lens, "sampling",
            jax.random.PRNGKey(seed), impl=impl2, quantize=use_int8)
        wavs = [decode_mu_law(s, config.n_quantize) for s in outs]
        dt = time.time() - t0
        assert len(wavs) == B and len(wavs[0]) == n_e2e
        return dt

    e2e_once(0)  # compile
    # best of 3 distinct-key runs: the axon tunnel shows +-15% process-
    # level timing noise (see .claude/skills/verify), and two reps were
    # measured straddling the 100x RT line on an otherwise identical HEAD
    e2e_s = min(e2e_once(s) for s in (1, 2, 3))
    e2e_sps = B * n_e2e / e2e_s
    print(json.dumps({
        "metric": "e2e_fleet_decode_samples_per_sec_per_chip",
        "value": round(e2e_sps, 1),
        "unit": "samples/s",
        "vs_baseline": round(e2e_sps / BASELINE_SPS, 4),
        "detail": {
            "batch": B, "n_samples": n_e2e,
            "wall_seconds": round(e2e_s, 3),
            "impl": ("pallas-int8" if use_int8 else impl2),
            "includes": "upsample+calibration+warmup+staging+scan"
                        "+host_copy+mulaw_decode",
            "realtime_x_16k": round(e2e_sps / 16000.0, 2),
        },
    }), flush=True)
    gc.collect()


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pytorchwavenetvocoder_tpu.models.wavenet import init_wavenet_params
    from pytorchwavenetvocoder_tpu.ops.ar_kernel import supports_pallas_ar

    # B=512 is the aggregate-throughput operating point: per-step cost
    # is near-linear in B above 128 (the kernel is MXU-throughput-
    # bound) but the int8 weight pack stays VMEM-resident through
    # B=512, measured ~9% more samples/s/chip than B=256 at 2x the
    # per-utterance latency.  B=256 is ALSO measured every run — it is
    # the latency-sensitive fleet point and the round-over-round
    # continuity series (rounds 2-3 reported B=256 headlines).
    B = int(os.environ.get("BENCH_BATCH", "512"))
    n_samples = int(os.environ.get("BENCH_SAMPLES", "4000"))
    config = _flagship_config()
    params = init_wavenet_params(jax.random.PRNGKey(0), config)

    impl = os.environ.get("BENCH_IMPL", "auto")
    use_pallas = (supports_pallas_ar(config)
                  and jax.default_backend() == "tpu"
                  and impl in ("auto", "pallas"))
    # headline decode is the int8-MXU path (warmup-calibrated static
    # activation scales; fidelity guarded by tests/test_tpu_hardware.py
    # and the learning-smoke MCD check); bf16 is also measured and
    # reported in detail.  BENCH_INT8=0 reverts the headline to bf16.
    use_int8 = use_pallas and os.environ.get("BENCH_INT8", "1") == "1"

    # ---- decode headline: measured FIRST, printed LAST ------------------
    head = measure_decode(params, config, B, n_samples, use_pallas, use_int8)
    extra_batches = {}
    for Bx in sorted({256} - {B}):
        try:
            extra_batches[f"b{Bx}"] = measure_decode(
                params, config, Bx, n_samples, use_pallas, use_int8)
        except Exception:
            traceback.print_exc(file=sys.stderr)
    headline_line = json.dumps({
        "metric": "ar_decode_samples_per_sec_per_chip",
        "value": head["samples_per_sec"],
        "unit": "samples/s",
        "vs_baseline": round(head["samples_per_sec"] / BASELINE_SPS, 4),
        "detail": dict(head,
                       model="arctic-sd 30x512 RF3070 bf16",
                       device=str(jax.devices()[0]),
                       **extra_batches),
    })

    # ---- optional metrics: each isolated, never fatal --------------------
    if os.environ.get("BENCH_TRAIN", "1") == "1":
        try:
            bench_train(config)
        except Exception as e:
            traceback.print_exc(file=sys.stderr)
            print(json.dumps({"metric": "train_step_seconds", "value": 0,
                              "unit": "s/step(bl=20000)", "vs_baseline": 0.0,
                              "error": repr(e)[:300]}), flush=True)
    if os.environ.get("BENCH_E2E", "1") == "1":
        try:
            bench_e2e(params, config, use_pallas, use_int8)
        except Exception as e:
            traceback.print_exc(file=sys.stderr)
            print(json.dumps({
                "metric": "e2e_fleet_decode_samples_per_sec_per_chip",
                "value": 0, "unit": "samples/s", "vs_baseline": 0.0,
                "error": repr(e)[:300]}), flush=True)

    print(headline_line, flush=True)


def _arm_backend_watchdog(seconds: int = 600):
    """Emit a degraded-but-valid JSON line if device init never returns.

    Covers the outage mode where the backend registered but device
    initialization hangs (``jax.devices()`` stalling for minutes on a
    dead TPU tunnel before raising — observed).  The worse mode — the
    environment's sitecustomize hanging inside plugin registration at
    interpreter startup, before any line of this file runs — cannot be
    guarded in-process; only the caller's timeout catches that one.
    """
    import signal

    def _bail(signum, frame):
        print(json.dumps({
            "metric": "decode_samples_per_sec",
            "value": 0,
            "unit": "samples/s",
            "vs_baseline": 0.0,
            "error": f"device backend initialization hung >{seconds}s "
                     "(TPU tunnel outage?); no measurement taken",
        }), flush=True)
        os._exit(2)

    try:
        signal.signal(signal.SIGALRM, _bail)
        signal.alarm(seconds)
        return lambda: signal.alarm(0)
    except (ValueError, AttributeError):  # non-main thread / platform
        return lambda: None


if __name__ == "__main__":
    _disarm = _arm_backend_watchdog(
        int(os.environ.get("BENCH_INIT_TIMEOUT", "600")))
    import jax

    jax.devices()  # force backend init under the watchdog
    _disarm()
    main()
