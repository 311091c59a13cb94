#!/usr/bin/env python
"""Attribute the fused train step's wall time across device ops.

Runs N flagship train steps inside one jit under jax.profiler, then
parses the trace to report per-op totals (XLA fusions, the two Pallas
kernels, optimizer, loss) so the gap between the measured step and the
kernels' matmul floor is attributable.  Usage:

    python scripts/train_step_profile.py [outdir]

Findings drive ops/train_kernel.py optimizations; see docs/DESIGN.md.
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np
    import jax.numpy as jnp
    import optax

    from pytorchwavenetvocoder_tpu.models.wavenet import (
        WaveNetConfig, wavenet_forward)
    from pytorchwavenetvocoder_tpu.parallel import (
        create_train_state, masked_ce_loss)
    from pytorchwavenetvocoder_tpu.parallel.train import make_optimizer

    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_profile"
    config = WaveNetConfig(
        n_quantize=256, n_aux=28, n_resch=512, n_skipch=256,
        dilation_depth=10, dilation_repeat=3, kernel_size=2,
        upsampling_factor=80, compute_dtype="bfloat16")
    rf, uf, bl = config.receptive_field, config.upsampling_factor, 20000
    T = ((bl + rf) // uf + 1) * uf
    rng = np.random.RandomState(0)

    state = create_train_state(jax.random.PRNGKey(0), config, lr=1e-4)
    tx = make_optimizer(1e-4)
    tb_h = jnp.asarray(rng.randn(1, T // uf, 28), np.float32)

    def one_step(carry, _):
        params, opt_state, key = carry
        key, k1 = jax.random.split(key)
        bx = jax.random.randint(k1, (1, T), 0, 256)

        def loss_fn(p):
            return masked_ce_loss(
                wavenet_forward(p, config, bx, tb_h,
                                bf16_intermediates=True, fused=True),
                bx, rf)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, key), loss

    N = 10
    fN = jax.jit(lambda p, o, k: jax.lax.scan(
        one_step, (p, o, k), None, length=N)[1][-1])
    # compile + warm
    float(fN(state.params, state.opt_state, jax.random.PRNGKey(0)))

    with jax.profiler.trace(outdir):
        float(fN(state.params, state.opt_state, jax.random.PRNGKey(1)))

    traces = sorted(glob.glob(os.path.join(
        outdir, "**", "*.trace.json.gz"), recursive=True))
    if not traces:
        print("no trace written under", outdir)
        return
    with gzip.open(traces[-1], "rt") as f:
        trace = json.load(f)

    # device-lane complete events: name / dur (us)
    per_op = defaultdict(float)
    per_cat = defaultdict(float)
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        args = ev.get("args") or {}
        cat = args.get("hlo_category")
        if cat is None:
            continue
        dur = ev.get("dur", 0.0)
        per_op[ev.get("name", "?")] += dur
        per_cat[cat] += dur
        total += dur

    print(f"\ndevice op time over {N} steps "
          f"(total {total / 1e3:.2f} ms, {total / N / 1e3:.2f} ms/step)\n")
    print("by hlo_category:")
    for cat, us in sorted(per_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {us / N / 1e3:8.3f} ms/step  {cat}")
    print("\ntop ops:")
    for name, us in sorted(per_op.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {us / N / 1e3:8.3f} ms/step  {name[:110]}")


if __name__ == "__main__":
    main()
