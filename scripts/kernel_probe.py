#!/usr/bin/env python
"""Micro-probe for the Pallas AR kernel's per-step cost structure.

Times pallas_ar_generate variants on the flagship arctic-sd config to
attribute the measured us/step between MXU work, VPU work (gate
transcendentals, sampling), and DMA.  Usage:

    python scripts/kernel_probe.py [B] [mode] [n_samples]

Findings drive ops/ar_kernel.py optimizations; see PROGRESS notes.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from pytorchwavenetvocoder_tpu.models.wavenet import (
        WaveNetConfig,
        _pad_seed,
        _warmup_state,
        init_wavenet_params,
        upsample_aux,
    )
    from pytorchwavenetvocoder_tpu.ops.ar_kernel import pallas_ar_generate

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    mode = sys.argv[2] if len(sys.argv) > 2 else "sampling"
    n_samples = int(sys.argv[3]) if len(sys.argv) > 3 else 4000
    quantize = len(sys.argv) > 4 and sys.argv[4] == "int8"
    shape = sys.argv[5] if len(sys.argv) > 5 else "arctic"

    if shape == "ljspeech":  # kernel-3 operating point (egs/ljspeech/sd)
        config = WaveNetConfig(
            n_quantize=256, n_aux=39, n_resch=512, n_skipch=256,
            dilation_depth=10, dilation_repeat=3, kernel_size=3,
            upsampling_factor=110, compute_dtype="bfloat16")
    else:
        config = WaveNetConfig(
            n_quantize=256, n_aux=28, n_resch=512, n_skipch=256,
            dilation_depth=10, dilation_repeat=3, kernel_size=2,
            upsampling_factor=80, compute_dtype="bfloat16")
    params = init_wavenet_params(jax.random.PRNGKey(0), config)

    rng = np.random.RandomState(0)
    x = np.full((B, 1), 128, np.int32)
    uf = config.upsampling_factor
    n_frames = (config.receptive_field + n_samples) // uf + 2
    h = rng.randn(B, n_frames, config.n_aux).astype(np.float32)

    xj = jnp.asarray(x)
    hj = upsample_aux(params, config, jnp.asarray(h))
    xj, hj = _pad_seed(config, xj, hj)
    T0 = xj.shape[1]
    need = T0 + n_samples
    if hj.shape[1] < need:
        hj = jnp.pad(hj, ((0, 0), (0, need - hj.shape[1]), (0, 0)), mode="edge")

    from pytorchwavenetvocoder_tpu.ops.ar_kernel import calibrate_act_scales

    scales = calibrate_act_scales(params, config, xj, hj) if quantize else None
    carry = _warmup_state(params, config, xj, hj)
    jax.block_until_ready(carry)

    t0 = time.time()
    np.asarray(pallas_ar_generate(params, config, carry, hj, T0,
                                  n_samples, mode, jax.random.PRNGKey(0),
                                  quantize=quantize, act_scales=scales))
    compile_s = time.time() - t0

    # best-of-14 in two separated rounds (mirrors bench.py): the tunnel
    # shows multi-second degraded windows that a 3-rep loop sits inside
    times = []
    for base in (1, 100):
        for k in range(base, base + 7):
            t0 = time.time()
            np.asarray(pallas_ar_generate(params, config, carry, hj, T0,
                                          n_samples, mode,
                                          jax.random.PRNGKey(k),
                                          quantize=quantize,
                                          act_scales=scales))
            times.append(time.time() - t0)
        time.sleep(3.0)
    el = min(times)
    print(f"B={B} mode={mode} q={quantize} n={n_samples}: {el:.4f}s "
          f"{el / n_samples * 1e6:.2f} us/step "
          f"{B * n_samples / el / 1e6:.3f} Msamples/s "
          f"(compile {compile_s:.1f}s)")


if __name__ == "__main__":
    main()
