#!/usr/bin/env python
"""Floor probe: serial WaveNet-shaped matmul chain in Pallas, nothing else.

Measures the pure MXU cost of the AR kernel's serial spine (30 layers x
[cur 512->1024, past 512->1024, sr 512->768] bf16 matmuls with resident
weights) WITHOUT ring DMA, gates, sampling, aux, or output writes.  The
delta between this and the full kernel's us/step attributes the
remaining time.

Usage: python scripts/matmul_chain_probe.py [B] [n_steps] [variant]
  variant: "split"  - 3 matmuls as in the real kernel (default)
           "merged" - [cur|past] fused into one K=1024 matmul
           "spine"  - only the 2 serial matmuls (cur + sr), no past tap
           "full"   - 2 serial matmuls, ALL columns consumed (no DCE)
           "dual"   - like full, but two independent B/2 chains
                      interleaved per layer (pipeline-drain recovery)
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
    variant = sys.argv[3] if len(sys.argv) > 3 else "split"
    L, R, S = 30, 512, 256

    key = jax.random.PRNGKey(0)
    w_cur = jax.random.normal(key, (L, R, 2 * R), jnp.bfloat16) * 0.02
    w_past = jax.random.normal(key, (L, R, 2 * R), jnp.bfloat16) * 0.02
    w_merged = jnp.concatenate([w_cur, w_past], axis=1)  # (L, 2R, 2R)
    w_sr = jax.random.normal(key, (L, R, S + R), jnp.bfloat16) * 0.02
    x0 = jax.random.normal(key, (B, R), jnp.bfloat16)

    # only ship the weights the variant uses (all four together blow VMEM)
    if variant == "merged":
        weights = {"wm": w_merged, "ws": w_sr}
    elif variant in ("spine", "full", "dual"):
        weights = {"wc": w_cur, "ws": w_sr}
    else:
        weights = {"wc": w_cur, "wp": w_past, "ws": w_sr}
    wnames = list(weights)
    w_back = jax.random.normal(key, (L, 2 * R, R), jnp.bfloat16) * 0.02
    if variant in ("full", "dual"):
        weights["wb"] = w_back
        wnames = list(weights)

    def kernel(x_ref, *refs):
        o_ref, acc = refs[len(wnames)], refs[len(wnames) + 1]
        wrefs = dict(zip(wnames, refs[: len(wnames)]))
        wc_ref = wrefs.get("wc")
        wp_ref = wrefs.get("wp")
        wm_ref = wrefs.get("wm")
        ws_ref = wrefs["ws"]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc[:] = x_ref[:]

        wb_ref = wrefs.get("wb")
        if variant == "full":
            out = acc[:]
            for l in range(L):
                z = jnp.dot(out, wc_ref[l], preferred_element_type=jnp.float32)
                out = jnp.dot(z.astype(jnp.bfloat16), wb_ref[l],
                              preferred_element_type=jnp.float32
                              ).astype(jnp.bfloat16) + out
            acc[:] = out
        elif variant == "dual":
            h1 = acc[: B // 2]
            h2 = acc[B // 2:]
            for l in range(L):
                z1 = jnp.dot(h1, wc_ref[l], preferred_element_type=jnp.float32)
                z2 = jnp.dot(h2, wc_ref[l], preferred_element_type=jnp.float32)
                h1 = jnp.dot(z1.astype(jnp.bfloat16), wb_ref[l],
                             preferred_element_type=jnp.float32
                             ).astype(jnp.bfloat16) + h1
                h2 = jnp.dot(z2.astype(jnp.bfloat16), wb_ref[l],
                             preferred_element_type=jnp.float32
                             ).astype(jnp.bfloat16) + h2
            acc[: B // 2] = h1
            acc[B // 2:] = h2
        else:
            out = acc[:]
            for l in range(L):
                if variant == "merged":
                    lhs = jnp.concatenate([out, out], axis=1)  # stand-in
                    z = jnp.dot(lhs, wm_ref[l],
                                preferred_element_type=jnp.float32)
                elif variant == "spine":
                    z = jnp.dot(out, wc_ref[l],
                                preferred_element_type=jnp.float32)
                else:
                    z = jnp.dot(out, wc_ref[l],
                                preferred_element_type=jnp.float32)
                    z = z + jnp.dot(out, wp_ref[l],
                                    preferred_element_type=jnp.float32)
                g = z[:, :R].astype(jnp.bfloat16)
                sr = jnp.dot(g, ws_ref[l], preferred_element_type=jnp.float32)
                out = sr[:, S:].astype(jnp.bfloat16) + out
            acc[:] = out

        @pl.when(i == n - 1)
        def _():
            o_ref[:] = acc[:]

    f = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec((B, R), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)] +
                 [pl.BlockSpec(weights[wn].shape,
                               lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
                  for wn in wnames],
        out_specs=pl.BlockSpec((B, R), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, R), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((B, R), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )
    fj = jax.jit(lambda a: f(a, *[weights[wn] for wn in wnames]))

    t0 = time.time()
    np.asarray(fj(x0))
    compile_s = time.time() - t0
    times = []
    for s in range(3):
        xs = x0 + s * 1e-3
        t0 = time.time()
        np.asarray(fj(xs))
        times.append(time.time() - t0)
    el = min(times)
    flops = {"split": 2 * B * R * (2 * 2 * R + (S + R)) * L,
             "merged": 2 * B * (2 * R) * (2 * R) * L + 2 * B * R * (S + R) * L,
             "spine": 2 * B * R * (2 * R + S + R) * L,
             "full": 2 * B * R * 2 * R * 2 * L,
             "dual": 2 * B * R * 2 * R * 2 * L}[variant]
    print(f"chain B={B} variant={variant}: {el / n * 1e6:.2f} us/step  "
          f"{flops / (el / n) / 1e12:.1f} TFLOPs "
          f"(compile {compile_s:.1f}s)")


if __name__ == "__main__":
    main()
