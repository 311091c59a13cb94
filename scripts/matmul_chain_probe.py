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
           "int8"   - the quantized proj_fwd spine exactly as the AR
                      kernel runs it: round/clip/cast quantize (VPU) +
                      int8 MXU matmul + f32 dequant scale, per layer
                      [cur+fwd 512->2048, gate, sr 512->768]
           "int8raw" - same matmul shapes on the int8 MXU but with the
                      quantize/dequant VPU work REMOVED (int8 inputs
                      carried layer to layer): the pure serial-int8-MXU
                      rate.  int8 - int8raw = the VPU quantization tax;
                      int8raw vs the 394-TOPS peak = the pipeline-drain
                      cost of serial dependence.
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
    elif variant in ("int8", "int8raw"):
        # proj_fwd kernel shapes: cur+forward matmul is (R, 4R), sr is
        # (R, S+R); quantized per-output-channel like the AR kernel
        wq1 = jnp.clip(jnp.round(
            jax.random.normal(key, (L, R, 4 * R)) * 40), -127, 127
            ).astype(jnp.int8)
        wq2 = jnp.clip(jnp.round(
            jax.random.normal(jax.random.PRNGKey(1), (L, R, S + R)) * 40),
            -127, 127).astype(jnp.int8)
        weights = {"w1": wq1, "w2": wq2}
    else:
        weights = {"wc": w_cur, "wp": w_past, "ws": w_sr}
    wnames = list(weights)
    w_back = jax.random.normal(key, (L, 2 * R, R), jnp.bfloat16) * 0.02
    if variant in ("full", "dual"):
        weights["wb"] = w_back
        wnames = list(weights)
    if variant == "int8":
        # per-output-channel dequant scales, like the AR kernel's wscale
        weights["wsc"] = (jnp.abs(jax.random.normal(
            jax.random.PRNGKey(2), (L, 4 * R + S + R))) * 1e-3 + 1e-4
            ).astype(jnp.float32)
        wnames = list(weights)

    def kernel(x_ref, *refs):
        o_ref, acc = refs[len(wnames)], refs[len(wnames) + 1]
        wrefs = dict(zip(wnames, refs[: len(wnames)]))
        wc_ref = wrefs.get("wc")
        wp_ref = wrefs.get("wp")
        wm_ref = wrefs.get("wm")
        ws_ref = wrefs.get("ws")
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc[:] = x_ref[:]

        wb_ref = wrefs.get("wb")
        if variant == "int8":
            # mirror ops/ar_kernel.py qdot: round/clip/cast quantize on
            # the VPU, int8 MXU matmul, f32 per-column dequant — the
            # full dependent spine of the quantized proj_fwd kernel
            w1_ref, w2_ref = wrefs["w1"], wrefs["w2"]
            wsc_ref = wrefs["wsc"]
            out = acc[:].astype(jnp.float32)
            sink = jnp.zeros((B, R), jnp.float32)
            for l in range(L):
                xq = jnp.clip(jnp.round(out * 25.4), -127, 127
                              ).astype(jnp.int8)
                z = jnp.dot(xq, w1_ref[l], preferred_element_type=jnp.int32)
                zf = (z.astype(jnp.float32)
                      * wsc_ref[l, : 4 * R][None, :])        # (B, 4R)
                gate = jax.nn.sigmoid(zf[:, :R]) * jnp.tanh(zf[:, R:2 * R])
                gq = jnp.clip(jnp.round(gate * 127.0), -127, 127
                              ).astype(jnp.int8)
                sr = jnp.dot(gq, w2_ref[l], preferred_element_type=jnp.int32)
                srf = (sr.astype(jnp.float32)
                       * wsc_ref[l, 4 * R:][None, :])        # (B, S+R)
                out = srf[:, S:] + out
                # consume the forward-projection half like the real
                # kernel does (it stages zfull[:, 2R:] into the ring) —
                # without this Mosaic DCEs half the first matmul
                sink = sink + zf[:, 2 * R: 3 * R] + zf[:, 3 * R:]
            acc[:] = (out + 1e-20 * sink).astype(jnp.bfloat16)
        elif variant == "int8raw":
            # activations carried int8 end to end: no quantize/dequant
            # VPU work, only a shift renorm to keep the serial dependence
            # (Mosaic has no i8 vector arithmetic: carry i32, cast to i8
            # only at the dot inputs)
            w1_ref, w2_ref = wrefs["w1"], wrefs["w2"]
            out32 = acc[:].astype(jnp.int32)
            sink = jnp.zeros((B, R), jnp.int32)
            for l in range(L):
                x8 = jnp.clip(out32, -127, 127).astype(jnp.int8)
                z = jnp.dot(x8, w1_ref[l], preferred_element_type=jnp.int32)
                g8 = jnp.clip(jax.lax.shift_right_arithmetic(z[:, :R], 9),
                              -127, 127).astype(jnp.int8)
                sr = jnp.dot(g8, w2_ref[l], preferred_element_type=jnp.int32)
                out32 = jax.lax.shift_right_arithmetic(sr[:, S:], 9) + out32
                sink = sink + z[:, 2 * R: 3 * R] + z[:, 3 * R:]
            acc[:] = (out32 + jax.lax.shift_right_arithmetic(sink, 30)
                      ).astype(jnp.bfloat16)
        elif variant == "full":
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
                               lambda i, nd=weights[wn].ndim: (0,) * nd,
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
             "dual": 2 * B * R * 2 * R * 2 * L,
             "int8": 2 * B * R * (4 * R + S + R) * L,
             "int8raw": 2 * B * R * (4 * R + S + R) * L}[variant]
    print(f"chain B={B} variant={variant}: {el / n * 1e6:.2f} us/step  "
          f"{flops / (el / n) / 1e12:.1f} T(FL)OPs "
          f"(compile {compile_s:.1f}s)")


if __name__ == "__main__":
    main()
