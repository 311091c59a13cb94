"""Pallas TPU fused training kernels for the WaveNet gated-residual stack.

The XLA training step is HBM-bandwidth-bound: at the flagship operating
point (batch_length 20000, 30x512 layers — reference
``egs/arctic/sd/run.sh:45-58``, hot loop ``train.py:530-539``) the
profiler shows ~42 GB/step flowing through the convolution fusions at
~763 GB/s (the chip's practical HBM rate), because every per-layer
matmul materializes its (T, 2R) gate inputs and (T, R) residual stream
to HBM in both the forward and the backward.  The pure-compute floor of
the step (fwd+bwd FLOPs at the MXU rate) is ~2.5x lower.

These kernels run the whole L-layer stack with activations living in
VMEM tiles, writing to HBM only what the backward genuinely needs:

- ``fwd``: grid (B, L, tiles).  Each step computes one (M, R) tile of
  one layer: the dilated causal conv as k shifted (M,R)@(R,2R) matmuls,
  the fused aux 1x1, the sigmoid*tanh gate, and the skip/res 1x1s.
  Per-layer HBM traffic collapses to the (T, R) bf16 stream plus the
  (T, 2R) bf16 sigmoid/tanh saves — both backward residuals.  The f32
  skip accumulator stays VMEM-resident across all L layers.
- ``bwd``: grid (L, B, tiles), layers reversed, tiles DESCENDING.
  Weight gradients avoid shifted reads of the saved streams via
  ``dWp_j[c, o] = sum_u x[u, c] * dz[u + j*d, o]`` — the *gradient* is
  read shifted forward instead, and with descending tiles those rows
  are still in a VMEM ring.  dx chains between layers through a
  ping-pong HBM stream; per-layer weight grads accumulate in-place in
  VMEM output blocks (each layer's block index is revisited
  consecutively across (b, tile) — the idiomatic Pallas accumulation
  pattern).

Shifted taps never touch HBM at unaligned offsets (Mosaic requires
8-row-aligned HBM slices): each kernel keeps a small VMEM **ring of
recent (M, .) tiles** and a tap at arbitrary dynamic shift is realized
as ``pltpu.roll`` (a dynamic rotate) of the ring followed by a static
slice.  Ring slots not yet written this layer read as zeros, which is
exactly the causal zero-padding semantics.  Mosaic's dynamic rotate
requires 32-bit data, so BOTH rings store bf16 rows **sublane-packed
in pairs into int32** (``pltpu.bitcast``) — every ring consumer casts
to bf16 anyway, and the packing halves the per-tap rotate bytes.  The
rolls were measured to be the forward kernel's entire overhead
(~3.3 ms/step); the backward's dz ring was 4 MB/rotate as f32 at the
flagship shape (x1200 rotates/step), its largest non-matmul cost.  An
odd shift needs rows from both halves of adjacent packed words: one
rotate plus a 16-bit shift/or recombine of the rotation and its
one-row-offset slice reconstructs it.

Unlike remat (which re-materializes the recomputed intermediates to HBM
and was measured ~15% SLOWER here), saving only the bf16 streams +
gate halves cuts the traffic at the source.

Numerics: MXU matmuls take bf16 inputs with f32 accumulation; the gate
transcendentals run in f32; the residual stream and saved activations
are bf16 (matching ``wavenet_forward(bf16_intermediates=True)``, the
production training configuration); the skip accumulator and all weight
gradients are f32.

The decode-side equivalent of this file is ops/ar_kernel.py; the
reference device-side work being replaced is ``wavenet.py:212-241``
under ``train.py:530-539``.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# v5e usable VMEM; keep in sync with ar_kernel.VMEM_BUDGET_BYTES
VMEM_BUDGET_BYTES = 112 * 1024 * 1024

import os as _os

# Row-tile size M; T is padded to a multiple of the selected tile.
# ``_tile_for`` picks the largest candidate the window/VMEM budget
# allows (bigger tiles amortize the per-step DMA + matmul issue
# overhead: 1024 measured ~7% faster per train step than 512 at the
# flagship shapes).  The env knob pins a single size — a benchmarking
# aid (scripts/), not a production switch.  ``_TILE`` is the fallback
# size, kept as a module attribute for the interpret-mode tests that
# size their windows in tile units.
_TILE_ENV = _os.environ.get("_WN_TRAIN_TILE")
_TILE = int(_TILE_ENV) if _TILE_ENV is not None else 512
_TILE_CANDIDATES = (_TILE,) if _TILE_ENV is not None else (1024, _TILE)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _hist_tiles(config, M: int) -> int:
    """Ring depth covering the largest tap shift ((k-1) * max dilation)."""
    max_shift = (config.kernel_size - 1) * max(config.dilations)
    return 1 + -(-max_shift // M)  # current tile + ceil(shift / M)


def _constraint_error_at(config, T: int, M: int) -> str | None:
    """Why the fused train kernels can NOT run this config/window at
    row-tile size ``M`` (None when they can)."""
    c = config
    if M % 2 != 0:
        # the backward packs its dz ring as bf16 pairs in int32 rows of
        # M // 2 — an odd tile would silently corrupt gradients
        return f"tile size M={M} must be even (bf16-pair dz ring)"
    if c.kernel_size not in (2, 3):
        return f"kernel_size={c.kernel_size} (fused kernels support 2 or 3)"
    if c.n_resch % 128 != 0 or c.n_skipch % 128 != 0:
        return (f"n_resch={c.n_resch}/n_skipch={c.n_skipch} must be "
                "multiples of 128 (MXU lane tiling)")
    if c.n_aux < 1:
        return "n_aux=0 (fused kernels require at least one aux channel)"
    T_pad = _round_up(T, M)
    # The rotate-2 write-sem discipline only waits a staged cross-layer
    # stream write two steps after it starts, while the NEXT layer's read
    # of that tile is prefetched n_tiles-1 steps later: n_tiles >= 4
    # keeps the read issue strictly after the write's wait.  (Training
    # windows are ~40 tiles; this only excludes toy lengths.)
    if T_pad // M < 4:
        return (f"window T={T} pads to {T_pad // M} tiles of {M}; "
                "the kernel's DMA cadence requires >= 4 tiles")
    R, S, k = c.n_resch, c.n_skipch, c.kernel_size
    HA = _round_up(c.n_aux, 128)
    KH = _hist_tiles(config, M)
    # fwd high-water: resident f32 skip accumulator + packed tap ring
    fwd = (T_pad * S * 4
           + KH * M * R * 2 + 4 * M * R * 2 + 2 * M * 2 * R * 2
           + 2 * (k * R * 2 * R + HA * 2 * R + R * S + R * R) * 2
           + 10 * M * 2 * R * 4)
    # bwd high-water: per-layer f32 weight-grad blocks + tiles + packed
    # dz ring (bf16 pairs in int32)
    bwd = (2 * (k * R * 2 * R + HA * 2 * R + R * S + R * R) * (4 + 2)
           + KH * M * 2 * R * 2
           + (10 + 2 * k) * M * 2 * R * 4)
    if max(fwd, bwd) >= VMEM_BUDGET_BYTES:
        return (f"VMEM high-water {max(fwd, bwd) / 2**20:.0f} MiB exceeds "
                f"the {VMEM_BUDGET_BYTES / 2**20:.0f} MiB budget at this "
                f"config/window size (tile {M})")
    return None


def _tile_for(config, T: int) -> int:
    """Row-tile size for this config/window: the first candidate (largest
    first) whose constraints pass, else the fallback ``_TILE``.  Both
    ``_fwd_pallas`` and ``_bwd_pallas`` call this with the same (config,
    T), so forward and backward always agree on the padding grid."""
    for M in _TILE_CANDIDATES:
        if _constraint_error_at(config, T, M) is None:
            return M
    return _TILE


def fused_train_constraint_error(config, T: int) -> str | None:
    """Why the fused train kernels can NOT run this config/window.

    Returns a human-readable reason, or None when the config qualifies.
    ``supports_fused_train`` is the boolean view; CLIs that let the user
    force ``fused=True`` should surface this string instead of running
    the kernel outside its validated envelope (the n_tiles >= 4 DMA
    cadence in particular would be a silent data race, not an error).
    """
    return _constraint_error_at(config, T, _tile_for(config, T))


def supports_fused_train(config, T: int) -> bool:
    """Whether the fused train kernels can run this config/window length."""
    return fused_train_constraint_error(config, T) is None



def _rem(a, b: int):
    """int32 remainder (robust under jax_enable_x64 test configs)."""
    return jax.lax.rem(a, jnp.int32(b))

def _layer_weights(params):
    """The stacked per-layer weight arrays the kernels consume."""
    return dict(
        dil_w=params["dil"]["w"], dil_b=params["dil"]["b"],
        aux_w=params["aux"]["w"], aux_b=params["aux"]["b"],
        skip_w=params["skip"]["w"], skip_b=params["skip"]["b"],
        res_w=params["res"]["w"], res_b=params["res"]["b"],
    )



def _kernel_weights(lw, HA: int):
    """bf16 weight arrays in the layout both kernels consume (aux 1x1
    zero-padded to the 128-aligned HA lane width)."""
    L = lw["dil_w"].shape[0]
    R2 = lw["dil_w"].shape[3]
    dil_w = lw["dil_w"].astype(jnp.bfloat16)              # (L, k, R, 2R)
    aux_w = jnp.zeros((L, HA, R2), jnp.bfloat16)
    aux_w = aux_w.at[:, : lw["aux_w"].shape[1]].set(
        lw["aux_w"].astype(jnp.bfloat16))
    return (dil_w, aux_w, lw["skip_w"].astype(jnp.bfloat16),
            lw["res_w"].astype(jnp.bfloat16))


def _tap_shifts(config):
    """(L, max(k-1,1)) int32 tap shifts, oldest tap first (dil_w order)."""
    k = config.kernel_size
    shifts = np.zeros((config.n_layers, max(k - 1, 1)), np.int32)
    for l, d in enumerate(config.dilations):
        for j in range(k - 1):
            shifts[l, j] = (k - 1 - j) * d
    return jnp.asarray(shifts)


# ---------------------------------------------------------------------------
# precision-matched pure-JAX reference (tests; documents the kernel math)
# ---------------------------------------------------------------------------


def ref_layer_stack(lw, config, stream0, h_up):
    """JAX replica of the kernel numerics: bf16 matmul inputs, f32 accum,
    f32 gate, bf16 residual stream.

    stream0 (B, T, R), h_up (B, T, A) -> skip_sum (B, T, S) f32.
    The production XLA path stays ``wavenet_forward`` (whose
    bf16_intermediates mode differs only by materializing the gate
    inputs in bf16 before the f32 gate).
    """
    c = config
    R = c.n_resch
    x = stream0.astype(jnp.bfloat16)
    h = h_up.astype(jnp.bfloat16)
    T = x.shape[1]
    skip_sum = None
    for l, d in enumerate(c.dilations):
        w = lw["dil_w"][l].astype(jnp.bfloat16)          # (k, R, 2R)
        k = w.shape[0]
        z = jnp.dot(x, w[k - 1], preferred_element_type=jnp.float32)
        for j in range(k - 1):
            shift = (k - 1 - j) * d
            xs = jnp.pad(x[:, : T - shift], ((0, 0), (shift, 0), (0, 0)))
            z = z + jnp.dot(xs, w[j], preferred_element_type=jnp.float32)
        za = jnp.dot(h, lw["aux_w"][l].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        zz = z + za + (lw["dil_b"][l] + lw["aux_b"][l]).astype(jnp.float32)
        s = jax.nn.sigmoid(zz[..., :R])
        t = jnp.tanh(zz[..., R:])
        g = (s * t).astype(jnp.bfloat16)
        sk = jnp.dot(g, lw["skip_w"][l].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32) + lw["skip_b"][l]
        skip_sum = sk if skip_sum is None else skip_sum + sk
        x = (jnp.dot(g, lw["res_w"][l].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
             + lw["res_b"][l] + x.astype(jnp.float32)).astype(jnp.bfloat16)
    return skip_sum


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_pallas(config, lw, stream0, h_up, interpret=False,
                save_st=True):
    """Fused forward over the padded window.

    stream0 (B, T, R), h_up (B, T, A).  Returns
    (skip_sum (B,T,S) f32, residuals (x0, streams, st, hb)).

    ``save_st=False`` skips the sigma/tanh saves and the skip-sum flush
    (their outputs come back uninitialized): the mode for consumers that
    only need the residual streams, like the decoder's ring warm-up.
    """
    c = config
    R, S, L, k = c.n_resch, c.n_skipch, c.n_layers, c.kernel_size
    A = c.n_aux
    HA = _round_up(A, 128)
    B, T = stream0.shape[0], stream0.shape[1]
    M = _tile_for(c, T)
    T_pad = _round_up(T, M)
    n_tiles = T_pad // M
    NR = _hist_tiles(c, M)  # ring slots (DMAs land in x_land, not the ring)

    x0 = jnp.zeros((B, T_pad, R), jnp.bfloat16)
    x0 = x0.at[:, :T].set(stream0.astype(jnp.bfloat16))
    hb = jnp.zeros((B, T_pad, HA), jnp.bfloat16)
    hb = hb.at[:, :T, :A].set(h_up.astype(jnp.bfloat16))

    dil_w = lw["dil_w"].astype(jnp.bfloat16)              # (L, k, R, 2R)
    aux_w = jnp.zeros((L, HA, 2 * R), jnp.bfloat16)
    aux_w = aux_w.at[:, :A].set(lw["aux_w"].astype(jnp.bfloat16))
    skip_w = lw["skip_w"].astype(jnp.bfloat16)
    res_w = lw["res_w"].astype(jnp.bfloat16)
    zb = (lw["dil_b"] + lw["aux_b"]).astype(jnp.float32)[:, None]
    skip_b = lw["skip_b"].astype(jnp.float32)[:, None]
    res_b = lw["res_b"].astype(jnp.float32)[:, None]
    shifts = _tap_shifts(c)

    def kernel(shift_ref,                        # scalar prefetch (SMEM)
               x0_ref, h_ref, dilw_ref, auxw_ref, skipw_ref, resw_ref,
               zb_ref, skipb_ref, resb_ref,
               skip_out, streams_out, st_out,
               x_land, ring, out_stage, st_stage, skip_acc,
               x_sems, out_sems, st_sems, skip_sem):
        b = pl.program_id(0)
        l = pl.program_id(1)
        m = pl.program_id(2)
        gi = (b * L + l) * n_tiles + m
        par = _rem(gi, 2)
        npar = _rem(gi + 1, 2)
        m0 = pl.multiple_of(m * M, M)

        def issue_x(sem_slot, sb, sl, sm):
            """DMA layer sl's input tile sm into the staging buffer."""
            dst = x_land.at[sem_slot]
            sem = x_sems.at[sem_slot]

            @pl.when(sl == 0)
            def _():
                pltpu.make_async_copy(
                    x0_ref.at[sb, pl.ds(sm * M, M)], dst, sem).start()

            @pl.when(sl > 0)
            def _():
                pltpu.make_async_copy(
                    streams_out.at[jnp.maximum(sl - 1, 0), sb,
                                   pl.ds(sm * M, M)], dst, sem).start()

        # ---- prologue / prefetch ---------------------------------------
        @pl.when(gi == 0)
        def _():
            issue_x(par, b, l, m)

        last = ((b == pl.num_programs(0) - 1) & (l == L - 1)
                & (m == n_tiles - 1))

        @pl.when(~last)
        def _():
            nm = _rem(m + 1, n_tiles)
            nl = _rem(l + jnp.where(m == n_tiles - 1, 1, 0), L)
            nb = b + jnp.where((m == n_tiles - 1) & (l == L - 1), 1, 0)
            issue_x(npar, nb, nl, nm)

        # at a layer start, ring slots holding the previous layer's tiles
        # must read as zero (t < 0 taps)
        @pl.when(m == 0)
        def _():
            ring[...] = jnp.zeros_like(ring)

        pltpu.make_async_copy(x_land.at[par], x_land.at[par],
                              x_sems.at[par]).wait()

        # ---- compute the tile -------------------------------------------
        x_cur = x_land[par]
        M2 = M // 2
        ring[pl.ds(pl.multiple_of(_rem(m, NR) * M2, M2), M2)] = (
            pltpu.bitcast(x_cur, jnp.int32))
        z = jnp.dot(x_cur, dilw_ref[0, k - 1],
                    preferred_element_type=jnp.float32)
        for j in range(k - 1):
            # tap rows [m0 - shift, m0 - shift + M) live in the ring at
            # logical position n = (m0 - shift) mod (NR * M); rows are
            # packed in sublane pairs (even row = low 16 bits), so one
            # half-size rotate by ceil(n/2) recovers them — odd n takes
            # each word's high half and its successor's low half
            n = _rem(
                _rem(shift_ref[l, j] - m0, NR * M) + NR * M, NR * M)
            r1 = pltpu.roll(ring[...], (n + 1) // 2, 0)
            y_even = r1[:M2]
            y_odd = jax.lax.bitwise_or(
                jax.lax.shift_right_logical(r1[:M2], jnp.int32(16)),
                jax.lax.shift_left(r1[1:M2 + 1], jnp.int32(16)))
            y = pltpu.bitcast(
                jnp.where(_rem(n, 2) == 1, y_odd, y_even), jnp.bfloat16)
            z = z + jnp.dot(y, dilw_ref[0, j],
                            preferred_element_type=jnp.float32)
        z = z + jnp.dot(h_ref[0], auxw_ref[0],
                        preferred_element_type=jnp.float32)
        z = z + zb_ref[0]
        s = jax.nn.sigmoid(z[:, :R])
        t = jnp.tanh(z[:, R:])
        g = (s * t).astype(jnp.bfloat16)

        if save_st:  # the warm-up mode needs neither skips nor saves
            sk = jnp.dot(g, skipw_ref[0],
                         preferred_element_type=jnp.float32) + skipb_ref[0]

            @pl.when(l == 0)
            def _():
                skip_acc[pl.ds(m0, M)] = sk

            @pl.when(l > 0)
            def _():
                skip_acc[pl.ds(m0, M)] = skip_acc[pl.ds(m0, M)] + sk

        out = (jnp.dot(g, resw_ref[0], preferred_element_type=jnp.float32)
               + resb_ref[0]
               + x_land[par].astype(jnp.float32)).astype(jnp.bfloat16)

        # ---- stage + flush the per-layer saves ---------------------------
        @pl.when(gi >= 2)
        def _():
            if save_st:
                pltpu.make_async_copy(st_stage.at[par], st_stage.at[par],
                                      st_sems.at[par]).wait()
            pltpu.make_async_copy(out_stage.at[par], out_stage.at[par],
                                  out_sems.at[par]).wait()

        if save_st:
            st_stage[par, :, :R] = s.astype(jnp.bfloat16)
            st_stage[par, :, R:] = t.astype(jnp.bfloat16)
            pltpu.make_async_copy(
                st_stage.at[par], st_out.at[l, b, pl.ds(m0, M)],
                st_sems.at[par]).start()

        # layer L-1's stream is never read back (bwd reads slot lr-1,
        # max L-2) but is still written: gating the DMA on l would break
        # the rotate-2 sem cadence across the b boundary, and the write
        # is 0.06% of the step at the flagship shape
        out_stage[par] = out
        pltpu.make_async_copy(
            out_stage.at[par], streams_out.at[l, b, pl.ds(m0, M)],
            out_sems.at[par]).start()

        if save_st:
            @pl.when(l == L - 1)
            def _():
                flush = pltpu.make_async_copy(
                    skip_acc.at[pl.ds(m0, M)], skip_out.at[b, pl.ds(m0, M)],
                    skip_sem)
                flush.start()
                flush.wait()

        # ---- drain staged writes at the very end --------------------------
        @pl.when(last)
        def _():
            if save_st:
                pltpu.make_async_copy(st_stage.at[par], st_stage.at[par],
                                      st_sems.at[par]).wait()
            pltpu.make_async_copy(out_stage.at[par], out_stage.at[par],
                                  out_sems.at[par]).wait()

            @pl.when(gi >= 1)
            def _():
                if save_st:
                    pltpu.make_async_copy(st_stage.at[npar],
                                          st_stage.at[npar],
                                          st_sems.at[npar]).wait()
                pltpu.make_async_copy(out_stage.at[npar], out_stage.at[npar],
                                      out_sems.at[npar]).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, L, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                     # x0
            pl.BlockSpec((1, M, HA), lambda b, l, m, *_: (b, m, 0)),  # h
            pl.BlockSpec((1, k, R, 2 * R), lambda b, l, m, *_: (l, 0, 0, 0)),
            pl.BlockSpec((1, HA, 2 * R), lambda b, l, m, *_: (l, 0, 0)),
            pl.BlockSpec((1, R, S), lambda b, l, m, *_: (l, 0, 0)),
            pl.BlockSpec((1, R, R), lambda b, l, m, *_: (l, 0, 0)),
            pl.BlockSpec((1, 1, 2 * R), lambda b, l, m, *_: (l, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda b, l, m, *_: (l, 0, 0)),
            pl.BlockSpec((1, 1, R), lambda b, l, m, *_: (l, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # skip_sum
            pl.BlockSpec(memory_space=pl.ANY),   # streams
            pl.BlockSpec(memory_space=pl.ANY),   # sigma/tanh saves
        ],
        scratch_shapes=[
            pltpu.VMEM((2, M, R), jnp.bfloat16),        # x_land
            pltpu.VMEM((NR * M // 2, R), jnp.int32),    # packed ring
            pltpu.VMEM((2, M, R), jnp.bfloat16),        # out_stage
            pltpu.VMEM((2, M, 2 * R), jnp.bfloat16),    # st_stage
            pltpu.VMEM((T_pad, S), jnp.float32),        # skip_acc
            pltpu.SemaphoreType.DMA((2,)),              # x_sems
            pltpu.SemaphoreType.DMA((2,)),              # out_sems
            pltpu.SemaphoreType.DMA((2,)),              # st_sems
            pltpu.SemaphoreType.DMA,                    # skip_sem
        ],
    )

    # unwritten outputs in streams-only mode get token shapes so the
    # (B, T_pad, 2R) sigma/tanh buffer is never allocated (it OOMs HBM
    # at decode-fleet batch sizes)
    skip_shape = (B, T_pad, S) if save_st else (1, 8, S)
    st_shape = (L, B, T_pad, 2 * R) if save_st else (1, 1, 8, 2 * R)
    skip_sum, streams, st = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(skip_shape, jnp.float32),
            jax.ShapeDtypeStruct((L, B, T_pad, R), jnp.bfloat16),
            jax.ShapeDtypeStruct(st_shape, jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(shifts, x0, hb, dil_w, aux_w, skip_w, res_w, zb, skip_b, res_b)
    if not save_st:
        return None, (x0, streams, st, hb)
    return skip_sum[:, :T], (x0, streams, st, hb)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _bwd_pallas(config, lw, x0, streams, st, hb, dskip, interpret=False):
    """Backward of the fused stack.

    Returns (dlw dict, dstream0 (B,T,R) bf16, dh_up (B,T,A) f32) — cast
    to the primal dtypes by the custom-vjp wrapper.
    """
    c = config
    R, S, L, k = c.n_resch, c.n_skipch, c.n_layers, c.kernel_size
    A = c.n_aux
    HA = hb.shape[2]
    B, T = dskip.shape[0], dskip.shape[1]
    M = _tile_for(c, T)
    T_pad = st.shape[2]
    assert T_pad % M == 0, (T_pad, M)  # fwd and bwd tile choice must agree
    n_tiles = T_pad // M
    KH = _hist_tiles(c, M)

    dsk = jnp.zeros((B, T_pad, S), jnp.float32)
    dsk = dsk.at[:, :T].set(dskip.astype(jnp.float32))

    # the dx chain contracts against the UNtransposed weights via
    # dot_general dimension numbers — no transposed copies (those cost
    # ~2.3 ms/step of pure data formatting at the flagship shapes)
    dil_w, aux_w, skip_w, res_w = _kernel_weights(lw, HA)
    shifts = _tap_shifts(c)

    rows = (((0,), (0,)), ((), ()))  # dot_general: contract over rows
    cols = (((1,), (1,)), ((), ()))  # dot_general: x @ W^T

    def kernel(shift_ref,
               x0_ref, streams_ref, st_ref, dsk_ref, h_ref,
               dilw_ref, auxw_ref, skipw_ref, resw_ref,
               ddil_o, daux_o, dskipw_o, dresw_o, dzb_o, dresb_o,
               dx0_o, dh_o, dx_pp,
               x_tile, st_tile, dout_tile, dzring, dx_stage, dh_stage,
               in_sems, dx_sems, dh_sems):
        li = pl.program_id(0)
        b = pl.program_id(1)
        mi = pl.program_id(2)
        lr = L - 1 - li
        m = n_tiles - 1 - mi
        m0 = pl.multiple_of(m * M, M)
        gi = (li * B + b) * n_tiles + mi
        par = _rem(gi, 2)
        npar = _rem(gi + 1, 2)

        def issue_inputs(slot, sli, sb, smi):
            slr = L - 1 - sli
            sm0 = (n_tiles - 1 - smi) * M

            # x: the input stream of layer slr (x0 for layer 0)
            @pl.when(slr == 0)
            def _():
                pltpu.make_async_copy(
                    x0_ref.at[sb, pl.ds(sm0, M)],
                    x_tile.at[slot], in_sems.at[slot, 0]).start()

            @pl.when(slr > 0)
            def _():
                pltpu.make_async_copy(
                    streams_ref.at[jnp.maximum(slr - 1, 0), sb,
                                   pl.ds(sm0, M)],
                    x_tile.at[slot], in_sems.at[slot, 0]).start()

            pltpu.make_async_copy(
                st_ref.at[slr, sb, pl.ds(sm0, M)],
                st_tile.at[slot], in_sems.at[slot, 1]).start()

            # dout = dx of layer slr+1 (the top layer has no dout)
            @pl.when(slr < L - 1)
            def _():
                pltpu.make_async_copy(
                    dx_pp.at[_rem(slr + 1, 2), sb, pl.ds(sm0, M)],
                    dout_tile.at[slot], in_sems.at[slot, 2]).start()

        @pl.when(gi == 0)
        def _():
            issue_inputs(0, li, b, mi)

        last = ((li == L - 1) & (b == pl.num_programs(1) - 1)
                & (mi == n_tiles - 1))

        @pl.when(~last)
        def _():
            nmi = _rem(mi + 1, n_tiles)
            nb = _rem(b + jnp.where(mi == n_tiles - 1, 1, 0),
                             pl.num_programs(1))
            nli = li + jnp.where((mi == n_tiles - 1)
                                 & (b == pl.num_programs(1) - 1), 1, 0)
            issue_inputs(npar, nli, nb, nmi)

        # ---- wait inputs --------------------------------------------------
        pltpu.make_async_copy(x_tile.at[par], x_tile.at[par],
                              in_sems.at[par, 0]).wait()
        pltpu.make_async_copy(st_tile.at[par], st_tile.at[par],
                              in_sems.at[par, 1]).wait()

        @pl.when(lr < L - 1)
        def _():
            pltpu.make_async_copy(dout_tile.at[par], dout_tile.at[par],
                                  in_sems.at[par, 2]).wait()

        @pl.when(lr == L - 1)
        def _():
            dout_tile[par] = jnp.zeros_like(dout_tile[par])

        dout_bf = dout_tile[par]                            # (M, R) bf16
        dskip_t = dsk_ref[0]                                # (M, S) f32
        s = st_tile[par, :, :R].astype(jnp.float32)
        t = st_tile[par, :, R:].astype(jnp.float32)

        dg = (jax.lax.dot_general(dout_bf, resw_ref[0], cols,
                                  preferred_element_type=jnp.float32)
              + jax.lax.dot_general(dskip_t.astype(jnp.bfloat16),
                                    skipw_ref[0], cols,
                                    preferred_element_type=jnp.float32))
        ds = dg * t * s * (1.0 - s)
        dt = dg * s * (1.0 - t * t)

        # dz ring: slot m % KH holds tile m; tiles above the window read
        # as zeros (the tail of the sequence has no future gradient).
        # Every consumer of the ring casts to bf16, so the ring stores
        # bf16 rows sublane-packed in pairs into int32 (Mosaic's dynamic
        # rotate needs 32-bit data) exactly like the forward kernel's
        # tap ring — halving the per-iteration rotate bytes, which were
        # this kernel's largest non-matmul cost (4 MB/rotate f32 at the
        # flagship shape, x1200 rotates/step).
        @pl.when(mi == 0)
        def _():
            dzring[...] = jnp.zeros_like(dzring)

        M2 = M // 2
        dz = jnp.concatenate([ds, dt], axis=1).astype(jnp.bfloat16)
        dzring[pl.ds(pl.multiple_of(_rem(m, KH) * M2, M2), M2)] = (
            pltpu.bitcast(dz, jnp.int32))

        # ---- weight grads: accumulate in-place in the output blocks ------
        first = (b == 0) & (mi == 0)
        x_t = x_tile[par]                                    # (M, R) bf16
        g_t = (s * t).astype(jnp.bfloat16)

        def acc(ref, idx, val):
            @pl.when(first)
            def _():
                ref[idx] = val

            @pl.when(~first)
            def _():
                ref[idx] = ref[idx] + val

        acc(ddil_o, (0, k - 1), jax.lax.dot_general(
            x_t, dz, rows, preferred_element_type=jnp.float32))
        acc(daux_o, (0,), jax.lax.dot_general(
            h_ref[0], dz, rows, preferred_element_type=jnp.float32))
        acc(dskipw_o, (0,), jax.lax.dot_general(
            g_t, dskip_t.astype(jnp.bfloat16), rows,
            preferred_element_type=jnp.float32))
        acc(dresw_o, (0,), jax.lax.dot_general(
            g_t, dout_bf, rows, preferred_element_type=jnp.float32))
        acc(dzb_o, (0,), jnp.concatenate(
            [jnp.sum(ds, axis=0, keepdims=True),
             jnp.sum(dt, axis=0, keepdims=True)], axis=1))
        acc(dresb_o, (0,), jnp.sum(dout_bf.astype(jnp.float32), axis=0,
                                   keepdims=True))

        # lagged-tap weight grads (via forward-shifted dz) + the dx chain
        dx = (jax.lax.dot_general(dz, dilw_ref[0, k - 1], cols,
                                  preferred_element_type=jnp.float32)
              + dout_bf.astype(jnp.float32))
        for j in range(k - 1):
            # dz rows [m0 + shift, m0 + shift + M) from the ring; rows
            # are packed in sublane pairs (even row = low 16 bits), so
            # one half-size rotate by ceil(n/2) recovers them — odd n
            # takes each word's high half and its successor's low half
            # (the forward kernel's recombine, lines ~327-341)
            n = _rem(
                _rem(-(m0 + shift_ref[lr, j]), KH * M) + KH * M,
                KH * M)
            r1 = pltpu.roll(dzring[...], (n + 1) // 2, 0)
            y_even = r1[:M2]
            y_odd = jax.lax.bitwise_or(
                jax.lax.shift_right_logical(r1[:M2], jnp.int32(16)),
                jax.lax.shift_left(r1[1:M2 + 1], jnp.int32(16)))
            dzsh = pltpu.bitcast(
                jnp.where(_rem(n, 2) == 1, y_odd, y_even), jnp.bfloat16)
            acc(ddil_o, (0, j), jax.lax.dot_general(
                x_t, dzsh, rows, preferred_element_type=jnp.float32))
            dx = dx + jax.lax.dot_general(
                dzsh, dilw_ref[0, j], cols,
                preferred_element_type=jnp.float32)

        # ---- dh partial + dx tile -----------------------------------------
        @pl.when(gi >= 2)
        def _():
            pltpu.make_async_copy(dh_stage.at[par], dh_stage.at[par],
                                  dh_sems.at[par]).wait()
            pltpu.make_async_copy(dx_stage.at[par], dx_stage.at[par],
                                  dx_sems.at[par]).wait()

        dh_stage[par] = jax.lax.dot_general(
            dz, auxw_ref[0], cols,
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        pltpu.make_async_copy(dh_stage.at[par],
                              dh_o.at[lr, b, pl.ds(m0, M)],
                              dh_sems.at[par]).start()

        dx_stage[par] = dx.astype(jnp.bfloat16)

        @pl.when(lr > 0)
        def _():
            pltpu.make_async_copy(
                dx_stage.at[par],
                dx_pp.at[_rem(lr, 2), b, pl.ds(m0, M)],
                dx_sems.at[par]).start()

        @pl.when(lr == 0)
        def _():
            pltpu.make_async_copy(dx_stage.at[par],
                                  dx0_o.at[b, pl.ds(m0, M)],
                                  dx_sems.at[par]).start()

        @pl.when(last)
        def _():
            pltpu.make_async_copy(dx_stage.at[par], dx_stage.at[par],
                                  dx_sems.at[par]).wait()
            pltpu.make_async_copy(dh_stage.at[par], dh_stage.at[par],
                                  dh_sems.at[par]).wait()

            @pl.when(gi >= 1)
            def _():
                pltpu.make_async_copy(dx_stage.at[npar], dx_stage.at[npar],
                                      dx_sems.at[npar]).wait()
                pltpu.make_async_copy(dh_stage.at[npar], dh_stage.at[npar],
                                      dh_sems.at[npar]).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # x0
            pl.BlockSpec(memory_space=pl.ANY),   # streams
            pl.BlockSpec(memory_space=pl.ANY),   # sigma/tanh saves
            pl.BlockSpec((1, M, S),
                         lambda li, b, m, *_: (b, n_tiles - 1 - m, 0)),
            pl.BlockSpec((1, M, HA),
                         lambda li, b, m, *_: (b, n_tiles - 1 - m, 0)),
            pl.BlockSpec((1, k, R, 2 * R),
                         lambda li, b, m, *_: (L - 1 - li, 0, 0, 0)),
            pl.BlockSpec((1, HA, 2 * R),
                         lambda li, b, m, *_: (L - 1 - li, 0, 0)),
            pl.BlockSpec((1, R, S), lambda li, b, m, *_: (L - 1 - li, 0, 0)),
            pl.BlockSpec((1, R, R), lambda li, b, m, *_: (L - 1 - li, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, k, R, 2 * R),
                         lambda li, b, m, *_: (L - 1 - li, 0, 0, 0)),
            pl.BlockSpec((1, HA, 2 * R),
                         lambda li, b, m, *_: (L - 1 - li, 0, 0)),
            pl.BlockSpec((1, R, S), lambda li, b, m, *_: (L - 1 - li, 0, 0)),
            pl.BlockSpec((1, R, R), lambda li, b, m, *_: (L - 1 - li, 0, 0)),
            pl.BlockSpec((1, 1, 2 * R),
                         lambda li, b, m, *_: (L - 1 - li, 0, 0)),
            pl.BlockSpec((1, 1, R),
                         lambda li, b, m, *_: (L - 1 - li, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),   # dx0
            pl.BlockSpec(memory_space=pl.ANY),   # dh partials
            pl.BlockSpec(memory_space=pl.ANY),   # dx ping-pong (scratch)
        ],
        scratch_shapes=[
            pltpu.VMEM((2, M, R), jnp.bfloat16),        # x_tile
            pltpu.VMEM((2, M, 2 * R), jnp.bfloat16),    # st_tile
            pltpu.VMEM((2, M, R), jnp.bfloat16),        # dout_tile
            pltpu.VMEM((KH * M // 2, 2 * R), jnp.int32),  # packed dz ring
            pltpu.VMEM((2, M, R), jnp.bfloat16),        # dx_stage
            pltpu.VMEM((2, M, HA), jnp.bfloat16),       # dh_stage
            pltpu.SemaphoreType.DMA((2, 3)),            # in_sems
            pltpu.SemaphoreType.DMA((2,)),              # dx_sems
            pltpu.SemaphoreType.DMA((2,)),              # dh_sems
        ],
    )

    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((L, k, R, 2 * R), jnp.float32),    # ddil_w
            jax.ShapeDtypeStruct((L, HA, 2 * R), jnp.float32),      # daux_w
            jax.ShapeDtypeStruct((L, R, S), jnp.float32),           # dskip_w
            jax.ShapeDtypeStruct((L, R, R), jnp.float32),           # dres_w
            jax.ShapeDtypeStruct((L, 1, 2 * R), jnp.float32),       # dzb
            jax.ShapeDtypeStruct((L, 1, R), jnp.float32),           # dres_b
            jax.ShapeDtypeStruct((B, T_pad, R), jnp.bfloat16),      # dx0
            jax.ShapeDtypeStruct((L, B, T_pad, HA), jnp.bfloat16),  # dh parts
            jax.ShapeDtypeStruct((2, B, T_pad, R), jnp.bfloat16),   # dx pp
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(shifts, x0, streams, st, dsk, hb,
      dil_w, aux_w, skip_w, res_w)

    ddil_w, daux_w, dskip_w, dres_w, dzb, dres_b, dx0, dh_parts = outs[:8]

    # skip_b's grad is layer-independent: the sum of the incoming cotangent
    dskip_b = jnp.broadcast_to(
        jnp.sum(dskip, axis=(0, 1)).astype(jnp.float32), (L, S))
    dh_up = jnp.sum(dh_parts.astype(jnp.float32), axis=0)[:, :T, :A]
    dzb = dzb[:, 0]
    dlw = dict(
        dil_w=ddil_w, dil_b=dzb, aux_w=daux_w[:, :A], aux_b=dzb,
        skip_w=dskip_w, skip_b=dskip_b, res_w=dres_w, res_b=dres_b[:, 0],
    )
    dstream0 = dx0[:, :T]
    return dlw, dstream0, dh_up


# ---------------------------------------------------------------------------
# custom-vjp wiring + public API
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused_stack(config, interpret, lw, stream0, h_up):
    skip_sum, _ = _fwd_pallas(config, lw, stream0, h_up, interpret)
    return skip_sum


def _fused_stack_fwd(config, interpret, lw, stream0, h_up):
    skip_sum, res = _fwd_pallas(config, lw, stream0, h_up, interpret)
    return skip_sum, (lw, res)


def _fused_stack_bwd(config, interpret, saved, dskip):
    lw, (x0, streams, st, hb) = saved
    dlw, dstream0, dh_up = _bwd_pallas(config, lw, x0, streams, st, hb,
                                       dskip, interpret)
    # primal stream0/h_up are bf16 by API contract (fused_layer_stack)
    dlw = {k: v.astype(lw[k].dtype) for k, v in dlw.items()}
    return dlw, dstream0.astype(jnp.bfloat16), dh_up.astype(jnp.bfloat16)


_fused_stack.defvjp(_fused_stack_fwd, _fused_stack_bwd)


def fused_layer_stack(params, config, stream0, h_up, interpret=False):
    """Differentiable fused gated-residual stack.

    stream0 (B, T, R) — the input-embed output; h_up (B, T, A) —
    sample-rate aux.  Returns skip_sum (B, T, S) f32.  Gate with
    ``supports_fused_train(config, T)``.
    """
    return _fused_stack(config, interpret, _layer_weights(params),
                        stream0.astype(jnp.bfloat16),
                        h_up.astype(jnp.bfloat16))
