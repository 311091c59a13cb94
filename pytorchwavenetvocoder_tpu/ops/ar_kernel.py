"""Pallas TPU kernel for the WaveNet AR sample loop.

The XLA ``lax.scan`` decoder (models/wavenet.py ``_scan_from_state``)
tops out around 30% MXU utilization: its step is ~60 small dependent
matmuls plus gather/scatter ops, each paying XLA op overhead, and the
~86 MB of layer weights re-stream from HBM every emitted sample.  This
kernel runs the WHOLE sample loop on-core:

- grid = (n_samples,); TPU grid iterations run sequentially, so VMEM
  scratch carries the decoder state (residual vector, previous sample
  ids, skip accumulator) across samples with zero host round-trips;
- **weights live resident in VMEM** (v5e has ~128 MB; the flagship
  arctic-sd pack is 86 MB bf16 / 43 MB int8) so per-sample HBM traffic
  collapses to the ring-buffer taps — the decoder becomes MXU-
  throughput-bound (~90% of the chip's measured 160-TFLOPs dependent-
  matmul rate at fleet 256).  Models whose pack exceeds the VMEM budget
  fall back to streaming the layer pack HBM->VMEM one layer ahead;
- the fast-WaveNet ring buffers stay in HBM, **dilation-grouped**: the
  G layers sharing a dilation read/write the same slot index, so their
  taps move in ONE (G, B, *) DMA — 20 DMA ops/step for the flagship.
  For kernel_size 2 the rings are **projection-forwarded**: each slot
  holds out_l(p) @ w_past_l, computed at write time fused with the
  current-tap matmul into one (B,R)@(R,4R) op, making the read side a
  pure add.  The read and write slot coincide ((p-d) mod d == p mod d);
- hidden latencies: the aux column is prefetched one step ahead
  (double-buffered), sample flushes are double-buffered 8-row blocks
  waited only when their half is reused, and ring-write completions are
  waited in the NEXT step's prologue;
- aux conditioning, the one-hot input conv (a one-hot matmul on the
  MXU), the ReLU/1x1 post stack, and Gumbel-max sampling (pltpu PRNG,
  sign-bit-masked uniforms) all happen in-kernel;
- opt-in **int8 MXU** path (``quantize=True``): per-output-channel
  weight scales + per-layer static activation scales calibrated from
  the warmup forward.  ~1.35x decode throughput at equal MCD; for
  kernel_size > 2 the raw rings are additionally stored as int8 (the
  exact xq the current-tap matmul already quantizes, staged for free),
  halving ring HBM bytes and dropping the read-side quantization —
  measured 1.23M -> 1.57M samples/s on the ljspeech kernel-3 flagship.

Restrictions: kernel_size in (2, 3), n_quantize 256.  Channel counts
that are not multiples of 128 are zero-padded into the envelope at
decode time (``pad_params_for_pallas`` — inference-transparent, see its
docstring); only kernel_size / n_quantize outliers use the lax.scan
path.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM planning: v5e TensorCore VMEM measured at ~120+ MB usable; leave
# headroom for Mosaic's stack and the pipeline buffers
VMEM_BUDGET_BYTES = 112 * 1024 * 1024

# perf-attribution knob for scripts/kernel_probe.py ONLY (never set in
# production): "mul" replaces the gate transcendentals with a multiply
# to measure their VPU cost
import os as _os

_DEBUG_GATE = _os.environ.get("_WN_AR_DEBUG_GATE", "")
# more perf-attribution knobs (wrong math; probe use only):
# skip ring-tap reads/matmuls/writes / skip the per-layer aux matmul
_DEBUG_NOTAP = _os.environ.get("_WN_AR_DEBUG_NOTAP", "") == "1"
_DEBUG_NOAUX = _os.environ.get("_WN_AR_DEBUG_NOAUX", "") == "1"


def supports_pallas_ar(config, backend: str | None = None) -> bool:
    """Whether the fused AR kernel can run this config as-is.

    Configs that fail ONLY on channel divisibility can still be decoded
    through the kernel after ``pad_params_for_pallas`` (see
    ``pallas_paddable``); ``batch_fast_generate`` applies that shim
    automatically.
    """
    if config.kernel_size not in (2, 3):
        return False
    if config.n_resch % 128 != 0 or config.n_skipch % 128 != 0:
        return False
    if config.n_quantize != 256:
        return False
    return True


def pallas_paddable(config) -> bool:
    """True when the ONLY reason ``supports_pallas_ar`` fails is channel
    divisibility — zero-padding R/S up to the next multiple of 128 makes
    the kernel applicable (``pad_params_for_pallas``)."""
    return (config.kernel_size in (2, 3) and config.n_quantize == 256
            and not supports_pallas_ar(config))


def _pad_tail(a, axis: int, new: int):
    pads = [(0, 0)] * a.ndim
    pads[axis] = (0, new - a.shape[axis])
    return jnp.pad(a, pads)


def _pad_gate(a, axis: int, Rp: int):
    """Pad a fused-gate axis of width 2R ([:R]=sigmoid, [R:]=tanh — see
    init_wavenet_params) to 2*Rp, padding EACH half so the kernel's
    split-at-Rp convention still lands on the right halves."""
    sig, tanh = jnp.split(a, 2, axis=axis)
    return jnp.concatenate(
        [_pad_tail(sig, axis, Rp), _pad_tail(tanh, axis, Rp)], axis=axis)


def pad_params_for_pallas(params, config):
    """Zero-pad channel counts to the kernel's 128-lane envelope.

    Returns ``(padded_params, padded_config)`` with n_resch/n_skipch
    rounded up to multiples of 128.  Inference-transparent BY
    CONSTRUCTION: padded weight rows/columns and biases are zero, so
    padded residual lanes stay exactly 0.0 through every layer
    (gate pre-activations 0 -> sigmoid(0)*tanh(0) = 0; residual adds
    0 + 0; post-stack ReLU(0) = 0), and the logits over the original Q
    classes are bit-identical — appended zero rows extend MXU
    contraction tiles without perturbing any nonzero partial sum.  The
    int8 path is safe too: all-zero columns hit the 1e-8 weight-scale
    floor and quantize to 0.  NOT applicable to training (padded
    weights would receive nonzero gradients and stop being zero).
    """
    import dataclasses

    c = config
    R, S = c.n_resch, c.n_skipch
    Rp, Sp = -(-R // 128) * 128, -(-S // 128) * 128
    if (Rp, Sp) == (R, S):
        return params, config
    p = {
        "causal": {"w": _pad_tail(params["causal"]["w"], 2, Rp),
                   "b": _pad_tail(params["causal"]["b"], 0, Rp)},
        "dil": {"w": _pad_gate(_pad_tail(params["dil"]["w"], 2, Rp), 3, Rp),
                "b": _pad_gate(params["dil"]["b"], 1, Rp)},
        "aux": {"w": _pad_gate(params["aux"]["w"], 2, Rp),
                "b": _pad_gate(params["aux"]["b"], 1, Rp)},
        "skip": {"w": _pad_tail(_pad_tail(params["skip"]["w"], 1, Rp), 2, Sp),
                 "b": _pad_tail(params["skip"]["b"], 1, Sp)},
        "res": {"w": _pad_tail(_pad_tail(params["res"]["w"], 1, Rp), 2, Rp),
                "b": _pad_tail(params["res"]["b"], 1, Rp)},
        "post1": {"w": _pad_tail(_pad_tail(params["post1"]["w"], 0, Sp),
                                 1, Sp),
                  "b": _pad_tail(params["post1"]["b"], 0, Sp)},
        "post2": {"w": _pad_tail(params["post2"]["w"], 0, Sp),
                  "b": params["post2"]["b"]},
    }
    if "upsampling" in params:
        p["upsampling"] = params["upsampling"]
    return p, dataclasses.replace(c, n_resch=Rp, n_skipch=Sp)


def _pack_weights(params, config):
    """Pack per-layer weights for the kernel:
    (L, R, k*2R + S + R) bf16, columns
    [w_cur (2R) | w_past lag d (2R) | ... | w_past lag (k-1)d | skip+res].
    """
    c = config
    R, S, L, k = c.n_resch, c.n_skipch, c.n_layers, c.kernel_size
    dil_w = params["dil"]["w"].astype(jnp.bfloat16)       # (L, k, R, 2R)
    blocks = [dil_w[:, k - 1]]                            # current tap
    for j in range(1, k):                                 # lag j*d taps
        blocks.append(dil_w[:, k - 1 - j])
    sr_w = jnp.concatenate([params["skip"]["w"], params["res"]["w"]],
                           axis=-1).astype(jnp.bfloat16)  # (L, R, S+R)
    wpack = jnp.concatenate(blocks + [sr_w], axis=-1)
    assert wpack.shape == (L, R, k * 2 * R + S + R)

    A = c.n_aux
    aux_rows = max(32, ((A + 31) // 32) * 32)
    aux = jnp.zeros((L, aux_rows, 2 * R), jnp.bfloat16)
    aux = aux.at[:, :A].set(params["aux"]["w"].astype(jnp.bfloat16))

    Q = c.n_quantize
    causal = params["causal"]["w"].astype(jnp.bfloat16)   # (k, Q, R)
    # row block m multiplies the one-hot of the id at lag (k-1-m):
    # oldest tap first, matching the ids buffer order
    causal_pack = jnp.concatenate([causal[m] for m in range(k)], axis=0)

    biases = dict(
        dil_b=params["dil"]["b"].astype(jnp.float32),
        sr_b=jnp.concatenate([params["skip"]["b"], params["res"]["b"]],
                             axis=-1).astype(jnp.float32),
        causal_b=params["causal"]["b"].astype(jnp.float32).reshape(1, -1),
        post1_b=params["post1"]["b"].astype(jnp.float32).reshape(1, -1),
        post2_b=params["post2"]["b"].astype(jnp.float32).reshape(1, -1),
    )
    post1_w = params["post1"]["w"].astype(jnp.bfloat16)
    post2_w = params["post2"]["w"].astype(jnp.bfloat16)
    return wpack, aux, causal_pack, post1_w, post2_w, biases


def weights_resident(config, B: int, quantize: bool = False) -> bool:
    """Static decision: does the weight pack + working set fit VMEM?

    int8 quantization halves the pack — e.g. the ljspeech kernel-3
    flagship (118 MB bf16, streaming) becomes VMEM-resident at 59 MB.
    """
    c = config
    R, S, L = c.n_resch, c.n_skipch, c.n_layers
    W = c.kernel_size * 2 * R + S + R
    pack = L * R * W * (1 if quantize else 2)
    # kernel_size 2 rings are projection-forwarded: staging rows are
    # (B, 2R) bf16; k > 2 rings are raw (k-1) x (B, R) rows — int8
    # under quantization (see raw_int8_rings), bf16 otherwise
    if c.kernel_size == 2:
        tap_bytes = 2 * R * 2
    else:
        tap_bytes = (c.kernel_size - 1) * R * (1 if quantize else 2)
    working = (L * B * tap_bytes      # tap staging
               + L * 32 * 2 * R * 2  # aux pack
               + B * R * 8           # residual/gate temporaries
               + 8 * 1024 * 1024)    # stack headroom
    return pack + working < VMEM_BUDGET_BYTES


def act_scales_from_maxes(maxes):
    """(L,) per-layer max |residual-stream| -> (L, 1) int8 act scales.

    Sized so the teacher-forced range maps into [-127, 127] with 25%
    headroom for free-running drift past it.  The maxes come from either
    ``calibrate_act_scales`` (standalone forward) or the warm-up forward
    itself (``_warmup_state(collect_act_maxes=True)`` — free, since the
    warm-up already materializes every layer's stream)."""
    return (1.25 * jnp.maximum(maxes, 1e-3) / 127.0)[:, None]


@partial(jax.jit, static_argnames=("config",))
def calibrate_act_scales(params, config, x, h_up):
    """Static per-layer int8 activation scales from the warmup region.

    Runs the teacher-forced forward over the WHOLE fleet's seed region
    (max-only — see ``_forward_act_maxes``) and returns (L, 1) f32
    scales sized so the residual-stream activations map into [-127, 127]
    with 25% headroom for free-running drift past the teacher-forced
    range.  Calibrating from a row subset instead would clip utterances
    whose conditioning is louder than the sampled rows'.

    Rows are processed in blocks of 8 via ``lax.map``: a full-batch
    forward at B=256 peaks ~5 GB of activation temporaries, and that
    high-water mark was measured to degrade the SUBSEQUENT Pallas decode
    by ~20% (allocator state) — blocking keeps the one-time calibration
    footprint at the few-hundred-MB level.
    """
    from pytorchwavenetvocoder_tpu.models.wavenet import _forward_act_maxes

    B = x.shape[0]
    blk = min(8, B)
    nblk = (B + blk - 1) // blk
    pad = nblk * blk - B
    h = h_up[:, : x.shape[1]]
    if pad:
        # duplicate leading rows: duplicates cannot change the max
        x = jnp.concatenate([x, x[:pad]], axis=0)
        h = jnp.concatenate([h, h[:pad]], axis=0)
    xb = x.reshape(nblk, blk, *x.shape[1:])
    hb = h.reshape(nblk, blk, *h.shape[1:])
    maxes = jax.lax.map(
        lambda xh: _forward_act_maxes(params, config, xh[0], xh[1]),
        (xb, hb))                      # (nblk, L)
    return act_scales_from_maxes(jnp.max(maxes, axis=0))  # (L, 1)


def aux_lane_layout(config) -> tuple[int, int, int]:
    """(aux_rows, h_rows, pack) geometry of the staged aux stream.

    The per-step aux column is only ``aux_rows`` wide (32 for A <= 32)
    but an HBM-sliced row must be 128 lanes (Mosaic memref_slice
    tiling), so ``pack = h_rows // aux_rows`` CONSECUTIVE timesteps
    share one 128-lane row: step t lives in row t // pack, lane block
    t % pack.  This cuts the staged stream's HBM footprint and DMA
    traffic by ``pack`` (4x for A <= 32: fleet 512 x 3 s utterances is
    1.7 GB staged instead of 6.7)."""
    aux_rows = max(32, ((config.n_aux + 31) // 32) * 32)  # _pack_weights
    h_rows = max(128, ((aux_rows + 127) // 128) * 128)
    return aux_rows, h_rows, h_rows // aux_rows


def staged_aux_rows(config) -> int:
    """Lane width of the kernel's staged aux stream (128-aligned)."""
    return aux_lane_layout(config)[1]


def staged_aux_len(config, n_steps: int) -> int:
    """Number of staged rows covering ``n_steps`` decode positions."""
    pack = aux_lane_layout(config)[2]
    return -(-n_steps // pack)


@partial(jax.jit, static_argnames=("aux_rows", "h_rows", "chunk"))
def _stage_aux_packed(h_up, aux_rows: int, h_rows: int, chunk: int):
    B, T, A = h_up.shape
    pack = h_rows // aux_rows
    rows_total = -(-T // pack)
    nc = -(-rows_total // chunk)
    # cast BEFORE padding: the padded copy is the staging pass's largest
    # temporary (the kernel consumes bf16 anyway, so no fidelity change)
    hp = jnp.pad(h_up.astype(jnp.bfloat16),
                 ((0, 0), (0, nc * chunk * pack - T), (0, 0)))

    def one(i):
        hb = jax.lax.dynamic_slice_in_dim(hp, i * chunk * pack,
                                          chunk * pack, 1)
        hb = jnp.transpose(hb, (1, 0, 2))
        out = jnp.zeros((chunk, B, h_rows), jnp.bfloat16)
        for j in range(pack):
            out = out.at[:, :, j * aux_rows:j * aux_rows + A].set(hb[j::pack])
        return out

    out = jax.lax.map(one, jnp.arange(nc))
    return out.reshape(nc * chunk, B, h_rows)[:rows_total]


def stage_aux(h_up, h_rows: int = 128, chunk: int = 2048, config=None):
    """(B, T, A) aux -> the kernel's lane-packed (ceil(T/pack), B,
    h_rows) bf16 layout (see ``aux_lane_layout``), built in bounded
    T-chunks.

    ``pallas_ar_generate`` stages this internally in ONE op, whose XLA
    lowering materializes both the transposed source and the padded
    target (~2x the final array) — for huge fleets that temp OOMs the
    chip.  Staging here via lax.map bounds the temp to one chunk; pass
    the result with ``prestaged=True``.

    Pass ``config`` to pin the lane layout to the model's ``n_aux``:
    aux wider than the kernel's pack geometry would otherwise produce a
    stream that passes the kernel's length check but decodes with a
    silently wrong lane layout."""
    A = h_up.shape[2]
    aux_rows = max(32, ((A + 31) // 32) * 32)
    if config is not None:
        want_aux_rows, want_h_rows, _ = aux_lane_layout(config)
        if A != config.n_aux or aux_rows != want_aux_rows \
                or h_rows != want_h_rows:
            raise ValueError(
                f"aux width {A} / h_rows {h_rows} do not match the "
                f"kernel lane layout for n_aux={config.n_aux} "
                f"(aux_rows {want_aux_rows}, h_rows {want_h_rows})")
    return _stage_aux_packed(h_up, aux_rows, h_rows, chunk)


def _pallas_ar_generate(params, config, carry, h_up, T0: int, max_n: int,
                        mode: str, rng, interpret: bool = False,
                        quantize: bool = False, act_scales=None,
                        prestaged: bool = False):
    """Fused AR decode. Same contract as ``_scan_from_state``.

    Args:
      carry: (act_buf, sample_hist (B, k-1), prev (B,)) from _warmup_state.
      h_up: (B, >= T0 + max_n, A) sample-rate aux — or, with
        ``prestaged=True``, the lane-packed (>= staged_aux_len(config,
        T0 + max_n), B, staged_aux_rows) bf16 stream from ``stage_aux``
        (bounded-memory staging for huge fleets).
      quantize: run the large per-layer matmuls on the int8 MXU (2x the
        bf16 rate).  Weights use per-output-channel scales; activations
        use STATIC per-layer scales calibrated from the teacher-forced
        warmup region (gate activations are bounded by sigmoid*tanh, so
        their scale is exactly 1).  For kernel_size > 2 the raw rings
        are stored as int8 — half the ring HBM traffic and no read-side
        quantization, since the staged value is the xq the current-tap
        matmul already computes (kernel_size 2 keeps the measured-faster
        projection-forwarded bf16 rings; see the proj_fwd comment).
        Opt-in: small logit error — fidelity-check with eval/mcd before
        production use (a per-row dynamic-scale variant was measured
        SLOWER than bf16: the VPU max-reduce per activation outweighed
        the MXU gain).
    Returns:
      (B, max_n) int32 samples.
    """
    c = config
    act_buf, sample_hist, prev = carry
    B = prev.shape[0]
    R, S, Q, L, A = c.n_resch, c.n_skipch, c.n_quantize, c.n_layers, c.n_aux
    k = c.kernel_size
    dils = list(c.dilations)
    caps = [(k - 1) * d for d in dils]
    offsets = np.concatenate([[0], np.cumsum(caps[:-1])]).astype(int)
    offsets = [int(o) for o in offsets]
    W = k * 2 * R + S + R
    resident = weights_resident(c, B, quantize)
    # kernel_size 2: projection-forwarded rings — slots hold the (B, 2R)
    # gate contribution out_l(p) @ w_past_l (computed at write time
    # fused with the current-tap matmul into one (B,R)@(R,4R) op — int8
    # under quantization); the read side is then a pure add.
    # _warmup_state packs the ring this way.
    #
    # kernel_size > 2 with quantize=True: the raw rings are stored as
    # int8 — exactly the xq the current-tap qdot already computes, so
    # staging costs zero extra VPU work — and the lagged-tap matmuls
    # (which exist regardless for k > 2) feed the int8 MXU directly at
    # read time (qdot_pre), dropping both the read-side VPU
    # quantization and half the ring HBM bytes.  Measured on the
    # ljspeech kernel-3 flagship: 1.23M -> 1.57M samples/s at B=256.
    # (Raw int8 rings at k == 2 were also measured: they ADD a read
    # matmul the projected scheme doesn't have, and at B=512 the extra
    # MXU work costs more than the ring bytes save — 1.94M -> 1.53M —
    # so k == 2 keeps projection forwarding.)
    proj_fwd = (k == 2)
    raw_int8 = quantize and not proj_fwd
    RW = 2 * R if proj_fwd else R  # ring row width
    ring_dt = jnp.int8 if raw_int8 else jnp.bfloat16
    if act_buf.shape[-1] != RW:
        raise ValueError(
            f"kernel_size {k} consumes {'projected (B, 2R)' if proj_fwd else 'raw (B, R)'} "
            f"rings from _warmup_state (got ring width {act_buf.shape[-1]}, "
            f"expected {RW})")

    # ---- dilation-grouped ring layout ----------------------------------
    # The dilation cycle repeats `G` times; all G layers sharing a
    # dilation read/write the SAME ring slot index each step, so laying
    # their rings out interleaved ((cap, G, B, R) flattened) turns G
    # separate tap DMAs into ONE (G, B, R) DMA per distinct dilation —
    # 60 -> 20 DMA ops/step for the flagship config.
    base_cycle: list[int] = []
    for d in dils:
        if base_cycle and d == base_cycle[0]:
            break
        base_cycle.append(d)
    depth = len(base_cycle)
    G = L // depth
    if not (L == depth * G and dils == base_cycle * G):
        depth, G = L, 1  # irregular dilations: one group per layer
    gcaps = [(k - 1) * d for d in dils[:depth]]
    gbases = [0]
    for g in range(depth - 1):
        gbases.append(gbases[-1] + gcaps[g] * G)

    if act_scales is None:
        act_scales = jnp.full((L, 1), 0.05, jnp.float32)  # quantize=False
    act_scales = act_scales.astype(jnp.float32).reshape(L, 1)

    if raw_int8:
        # fill the ring with int8 xq values under each layer's static
        # scale — the same quantization the kernel's write side applies,
        # so warm-up-filled and kernel-written slots are indistinguishable
        lidx = jnp.asarray(np.repeat(np.arange(L), caps))   # (total_cap,)
        s = act_scales[lidx, 0][:, None, None]
        act_buf = jnp.clip(
            jnp.round(act_buf.astype(jnp.float32) / s), -127, 127
        ).astype(jnp.int8)

    if G > 1:
        parts = []
        for g in range(depth):
            segs = [act_buf[offsets[g + r * depth]:
                            offsets[g + r * depth] + gcaps[g]]
                    for r in range(G)]
            seg = jnp.stack(segs, axis=1)          # (cap, G, B, RW)
            parts.append(seg.reshape(gcaps[g] * G, B, RW))
        act_buf = jnp.concatenate(parts, axis=0)

    wpack, auxpack, causal_pack, post1_w, post2_w, biases = _pack_weights(params, c)
    # One-matmul aux conditioning (experimental, default OFF): the 30
    # separate (B,32)@(32,2R) aux matmuls attribute to ~22 us/step (3x
    # their pass count's worth — per-op issue overhead dominates at
    # K=32), so batching them into ONE (B,32)@(32,L*2R) matmul into a
    # (B, L*2R) bf16 scratch should reclaim most of that.  Measured
    # A/B on hardware straddled tunnel noise (no consistent win): the
    # big matmul sits on the serial spine's critical path before the
    # layer chain starts, while the per-layer form overlaps with ring
    # DMA waits.  Kept behind _WN_AR_AUX_ONEMM=1 for re-evaluation.
    aux_pack_bytes = L * R * W * (1 if quantize else 2)
    aux_buf_bytes = B * L * 2 * R * 2
    tap_bytes = L * (k - 1) * B * RW * (1 if raw_int8 else 2)
    aux_onemm = bool(quantize and resident
                     and (aux_pack_bytes + aux_buf_bytes + tap_bytes
                          + 16 * 1024 * 1024) < VMEM_BUDGET_BYTES
                     and _os.environ.get("_WN_AR_AUX_ONEMM", "0") == "1")
    if aux_onemm:
        aux_rows_all = auxpack.shape[1]
        auxall = jnp.transpose(auxpack, (1, 0, 2)).reshape(
            aux_rows_all, L * 2 * R)                         # (32, L*2R)
    else:
        auxall = jnp.zeros((1, 128), jnp.bfloat16)           # unused
    if quantize:
        wf = wpack.astype(jnp.float32)                       # (L, R, W)
        wscale = jnp.maximum(jnp.max(jnp.abs(wf), axis=1), 1e-8) / 127.0
        wpack = jnp.clip(jnp.round(wf / wscale[:, None, :]), -127, 127
                         ).astype(jnp.int8)
        wscale = wscale.astype(jnp.float32)                  # (L, W)
    else:
        wscale = jnp.zeros((c.n_layers, W), jnp.float32)     # unused
    aux_rows = auxpack.shape[1]
    # the h stream is sliced out of HBM per step; rows are 128 lanes
    # (Mosaic memref_slice tiling) holding `hpk` consecutive timesteps
    # in aux_rows-wide lane blocks — see aux_lane_layout
    h_rows = max(128, ((aux_rows + 127) // 128) * 128)
    hpk = h_rows // aux_rows
    T_need = T0 + max_n
    T_rows = -(-T_need // hpk)

    if prestaged:
        # caller built the stream with stage_aux (bounded-memory path)
        if (h_up.ndim != 3 or h_up.shape[1] != B or h_up.shape[2] != h_rows
                or h_up.shape[0] < T_rows or h_up.dtype != jnp.bfloat16):
            raise ValueError(
                f"prestaged aux must be (>= {T_rows}, {B}, {h_rows}) "
                f"bf16 from stage_aux; got {h_up.shape} {h_up.dtype}")
        h_t = h_up[:T_rows]
    else:
        # bf16: the aux projection consumes bf16 anyway, and f32 would
        # cost 4 bytes/lane of HBM for long-utterance fleets
        src = jnp.transpose(h_up[:, :T_need, :], (1, 0, 2)).astype(
            jnp.bfloat16)
        src = jnp.pad(src, ((0, T_rows * hpk - T_need), (0, 0), (0, 0)))
        h_t = jnp.zeros((T_rows, B, h_rows), jnp.bfloat16)
        for j in range(hpk):
            h_t = h_t.at[:, :, j * aux_rows:j * aux_rows + A].set(src[j::hpk])

    if not raw_int8:
        act_buf = act_buf.astype(jnp.bfloat16)
    # ids at lags k-1 .. 0, oldest first
    prev_init = jnp.concatenate([sample_hist, prev[:, None]],
                                axis=1).astype(jnp.int32)
    # the samples output is (rows, B): its lane dim must be 128-aligned
    # for the block DMA, so pad the batch lane and slice after
    B_pad = max(128, ((B + 127) // 128) * 128)

    if mode == "sampling":
        seed = jax.random.randint(rng, (1, 1), 0, np.int32(2**31 - 1), jnp.int32)
    else:
        seed = jnp.zeros((1, 1), jnp.int32)

    def kernel(seed_ref, ascale_ref,              # SMEM
               wpack_ref, wscale_ref, h_ref, actbuf_in_ref,
               auxpack_ref, auxall_ref, causal_ref, post1_ref, post2_ref,
               dil_b_ref, sr_b_ref, causal_b_ref, post1_b_ref, post2_b_ref,
               prev_init_ref,
               samples_ref, actbuf_ref,           # outputs (actbuf aliased)
               *scratch):
        if resident:
            (tap_buf, aux_buf, hcol_buf, out_buf, prev_buf, samp_buf,
             read_sems, write_sems, h_sem, samp_sem) = scratch
        else:
            (tap_buf, aux_buf, w_buf, hcol_buf, out_buf, prev_buf, samp_buf,
             read_sems, write_sems, w_sems, h_sem, samp_sem) = scratch

        i = pl.program_id(0)
        p = T0 - 1 + i

        def w_dma(l):
            return pltpu.make_async_copy(
                wpack_ref.at[pl.ds(l, 1)],
                w_buf.at[pl.ds(l % 2, 1)],
                w_sems.at[l % 2])

        def w_cols(l, lo, hi):
            if resident:
                return wpack_ref[l, :, lo:hi]
            return w_buf[l % 2, :, lo:hi]

        def qdot_pre(xq, l, lo, hi, sx):
            """int8 MXU matmul on an ALREADY-quantized input (the ring
            taps are stored as int8 under the same static scale, so no
            VPU round/clip is paid at read time)."""
            acc = jnp.dot(xq, w_cols(l, lo, hi),
                          preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32)
                    * (sx * wscale_ref[l, lo:hi])[None, :])

        def quant(x_f32, sx):
            """Quantize to int8 under a STATIC activation scale ``sx`` (a
            scalar: calibrated per layer for the residual stream, exactly
            1/127 for the bounded gate activations).  A per-row dynamic
            max-reduce here was measured to cost more VPU time than the
            int8 MXU saves."""
            return jnp.clip(jnp.round(x_f32 * (1.0 / sx)), -127, 127
                            ).astype(jnp.int8)

        def qdot(x_f32, l, lo, hi, sx):
            return qdot_pre(quant(x_f32, sx), l, lo, hi, sx)

        def tap_read_dma(g, j, slot):
            # lag j*d taps of ALL G layers in dilation-group g land in
            # tap_buf rows [(g*(k-1)+j-1)*G, +G) with one DMA
            row = (g * (k - 1) + (j - 1)) * G
            return pltpu.make_async_copy(
                actbuf_ref.at[pl.ds(gbases[g] + slot * G, G)],
                tap_buf.at[pl.ds(row, G)],
                read_sems.at[g * (k - 1) + (j - 1)])

        def tap_write_dma(g, slot):
            # staging reuses the OLDEST tap's buffer rows (their ring
            # slot is the write slot: (p-(k-1)d) mod (k-1)d == p mod
            # (k-1)d); issued once per group after its last member
            row = (g * (k - 1) + (k - 2)) * G
            return pltpu.make_async_copy(
                tap_buf.at[pl.ds(row, G)],
                actbuf_ref.at[pl.ds(gbases[g] + slot * G, G)],
                write_sems.at[g])

        def h_dma(row, slot):
            # double-buffered: a row (hpk consecutive steps' aux lane
            # blocks) is prefetched while the previous row is consumed,
            # so the HBM latency never sits on the critical path
            return pltpu.make_async_copy(
                h_ref.at[pl.ds(row, 1)],
                hcol_buf.at[pl.ds(slot, 1)], h_sem.at[slot])

        hrow = p // hpk          # staged row holding step p's aux column
        hjj = p % hpk            # its lane block within the row

        # ---- step prologue -------------------------------------------
        @pl.when(i == 0)
        def _():
            prev_buf[:] = prev_init_ref[:]
            h_dma(hrow, hrow % 2).start()

        if not resident:
            @pl.when(i == 0)
            def _():
                w_dma(0).start()

        # prefetch the NEXT row exactly when step i+1 crosses into it
        @pl.when((i + 1 < max_n) & ((p + 1) % hpk == 0))
        def _():
            h_dma(hrow + 1, (hrow + 1) % 2).start()

        # wait for LAST step's ring writes before this step's reads: the
        # d=1 layers reuse the same slot every step, and waiting here
        # (a full post-stack later) instead of at end-of-step keeps the
        # late layers' write latency off the critical path
        if not _DEBUG_NOTAP:
            @pl.when(i > 0)
            def _():
                for g in range(depth):
                    # wait() only consumes the semaphore for a copy of
                    # this shape; the slot index is irrelevant here
                    tap_write_dma(g, 0).wait()

        wslots = []
        rslots = []
        for g in range(depth):
            cap, d = gcaps[g], dils[g]
            wslot = p % cap if cap > 1 else 0
            wslots.append(wslot)
            rs = []
            for j in range(1, k):
                rslot = (p - j * d) % cap if cap > 1 else 0
                rs.append(rslot)
                if not _DEBUG_NOTAP:
                    tap_read_dma(g, j, rslot).start()
            rslots.append(rs)

        # input conv as one one-hot matmul over all k taps
        ids = prev_buf[:]                         # (B, k) int32, oldest first
        col = jax.lax.broadcasted_iota(jnp.int32, (B, Q), 1)
        oh = jnp.concatenate(
            [(col == ids[:, m:m + 1]).astype(jnp.bfloat16) for m in range(k)],
            axis=1)                               # (B, kQ)
        out = jnp.dot(oh, causal_ref[:],
                      preferred_element_type=jnp.float32) + causal_b_ref[:]
        out_buf[:] = out

        # each started row DMA is waited exactly once: by the prologue
        # step, or by the first step that lands in the row (hjj == 0)
        @pl.when((i == 0) | (hjj == 0))
        def _():
            h_dma(hrow, hrow % 2).wait()
        hslot = hrow % 2
        if hpk == 1:
            hcol = hcol_buf[hslot, :, :aux_rows]  # (B, aux_rows) bf16
        else:
            # select step p's lane block (static slices + scalar selects:
            # ~3 (B, aux_rows) VPU selects, off the critical path)
            hcol = hcol_buf[hslot, :, :aux_rows]
            for jj in range(1, hpk):
                hcol = jnp.where(
                    hjj == jj,
                    hcol_buf[hslot, :, jj * aux_rows:(jj + 1) * aux_rows],
                    hcol)

        if aux_onemm:
            # all L layers' aux conditioning in one (B,32)@(32,L*2R)
            # matmul (see aux_onemm comment above)
            aux_buf[:] = jnp.dot(
                hcol, auxall_ref[:],
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        skip = jnp.zeros((B, S), jnp.float32)

        def z_indep(l):
            """Layer l's gate-input terms that do NOT depend on the serial
            chain: ring taps, aux conditioning, bias."""
            g, rep = l % depth, l // depth
            def aux_term(zp):
                if _DEBUG_NOAUX:
                    return zp
                if aux_onemm:
                    return zp + aux_buf[:, l * 2 * R:(l + 1) * 2 * R
                                        ].astype(jnp.float32)
                return zp + jnp.dot(hcol, auxpack_ref[l],
                                    preferred_element_type=jnp.float32)

            if _DEBUG_NOTAP:
                zp = aux_term(jnp.zeros((B, 2 * R), jnp.float32))
                return zp + dil_b_ref[l][None, :]
            if rep == 0:  # the group's DMA is waited once, by its first member
                for j in range(1, k):
                    tap_read_dma(g, j, rslots[g][j - 1]).wait()

            def tap_row(j):
                return tap_buf[(g * (k - 1) + (j - 1)) * G + rep]

            if proj_fwd:
                # the ring already holds the projected contribution
                zp = tap_row(1).astype(jnp.float32)
            elif quantize:
                # taps are stored int8 under this layer's static scale:
                # feed the MXU directly, no read-side quantization
                zp = qdot_pre(tap_row(1), l, 2 * R, 4 * R,
                              ascale_ref[l, 0])
                for j in range(2, k):
                    zp = zp + qdot_pre(tap_row(j),
                                       l, j * 2 * R, (j + 1) * 2 * R,
                                       ascale_ref[l, 0])
            else:
                zp = jnp.dot(tap_row(1), w_cols(l, 2 * R, 4 * R),
                             preferred_element_type=jnp.float32)
                for j in range(2, k):
                    zp = zp + jnp.dot(tap_row(j),
                                      w_cols(l, j * 2 * R, (j + 1) * 2 * R),
                                      preferred_element_type=jnp.float32)
            return aux_term(zp) + dil_b_ref[l][None, :]

        # ---- layer chain, software-pipelined by one layer -------------
        # The chain's serial spine is matmul(z) -> gate (VPU) ->
        # matmul(sr) -> residual add; the MXU idles during each gate.
        # Issuing layer l+1's INDEPENDENT matmuls (ring tap + aux) before
        # layer l's gate keeps the MXU queue full while the VPU runs the
        # transcendentals, overlapping the two units.  (Batch-split
        # chains were measured NOT to overlap; hoisting independent ops
        # in program order is what Mosaic's in-order issue rewards.)
        zp_next = None
        for l in range(L):
            if not resident:
                w_dma(l).wait()
                if l + 1 < L:
                    w_dma(l + 1).start()
                # streaming mode: l+1's weights aren't here yet, so no
                # cross-layer hoist — compute everything in-layer
                zp_l = z_indep(l)
            else:
                zp_l = z_indep(l) if zp_next is None else zp_next

            out_bf = out_buf[:].astype(jnp.bfloat16)
            xq_out = None
            if proj_fwd and not _DEBUG_NOTAP:
                # ONE double-width matmul computes this layer's current-
                # tap term AND the projected contribution for step p + d
                if quantize:
                    zfull = qdot(out_buf[:], l, 0, 4 * R, ascale_ref[l, 0])
                else:
                    zfull = jnp.dot(out_bf, w_cols(l, 0, 4 * R),
                                    preferred_element_type=jnp.float32)
                z = zfull[:, : 2 * R] + zp_l
            elif quantize:
                # the quantized input is both the matmul operand and the
                # ring value staged for future taps (zero extra VPU work)
                xq_out = quant(out_buf[:], ascale_ref[l, 0])
                z = qdot_pre(xq_out, l, 0, 2 * R, ascale_ref[l, 0]) + zp_l
            else:
                z = jnp.dot(out_bf, w_cols(l, 0, 2 * R),
                            preferred_element_type=jnp.float32) + zp_l

            if resident and l + 1 < L:
                zp_next = z_indep(l + 1)  # MXU work issued before the VPU gate

            if _DEBUG_GATE == "mul":      # perf probe only: wrong math
                gate = z[:, :R] * z[:, R:]
            else:
                gate = jax.nn.sigmoid(z[:, :R]) * jnp.tanh(z[:, R:])
            g = gate.astype(jnp.bfloat16)

            # stage this layer's ring value into the oldest tap's (now
            # free) buffer row; once the group's LAST member has staged,
            # one DMA writes all G rows back to the ring for future taps
            if not _DEBUG_NOTAP:
                grp, rep = l % depth, l // depth
                staged = (zfull[:, 2 * R:].astype(jnp.bfloat16)
                          if proj_fwd else
                          xq_out if quantize else out_bf)
                tap_buf[(grp * (k - 1) + (k - 2)) * G + rep] = staged
                if rep == G - 1:
                    tap_write_dma(grp, wslots[grp]).start()

            if quantize:
                # gate = sigmoid*tanh is bounded by 1: exact static scale
                sr = qdot(gate, l, k * 2 * R, W,
                          jnp.float32(1.0 / 127.0)) + sr_b_ref[l][None, :]
            else:
                sr = jnp.dot(g, w_cols(l, k * 2 * R, W),
                             preferred_element_type=jnp.float32) + sr_b_ref[l][None, :]
            skip = skip + sr[:, :S]
            out_buf[:] = sr[:, S:] + out_buf[:]

        if not resident:
            # prefetch layer 0 for the next step (lands in buf 0: L even)
            @pl.when(i + 1 < max_n)
            def _():
                w_dma(0).start()

        # ---- post stack + sampling -----------------------------------
        post = jax.nn.relu(skip).astype(jnp.bfloat16)
        post = jnp.dot(post, post1_ref[:],
                       preferred_element_type=jnp.float32) + post1_b_ref[:]
        post = jax.nn.relu(post).astype(jnp.bfloat16)
        logits = jnp.dot(post, post2_ref[:],
                         preferred_element_type=jnp.float32) + post2_b_ref[:]

        if mode == "sampling":
            pltpu.prng_seed(seed_ref[0, 0] + i)
            bits = pltpu.prng_random_bits((B, Q))
            # bits arrive as SIGNED int32: converting directly to f32
            # makes half the uniforms negative (clipped to a constant),
            # which badly biases the sampler — caught by the hardware
            # chi^2 test (tests/test_tpu_hardware.py).  Mask to 31 bits.
            ub = jax.lax.bitwise_and(bits, np.int32(0x7FFFFFFF))
            u = ub.astype(jnp.float32) * (1.0 / 2147483648.0)
            u = jnp.clip(u, 1e-7, 1.0 - 1e-7)
            gumbel = -jnp.log(-jnp.log(u))
            sample = jnp.argmax(logits + gumbel, axis=1).astype(jnp.int32)
        else:
            sample = jnp.argmax(logits, axis=1).astype(jnp.int32)

        # samples flush in 8-row blocks (HBM sublane tiling alignment),
        # double-buffered halves so the flush DMA never stalls the loop:
        # block m's flush is only waited when its buffer half is reused
        # (block m+2) or at the very last step
        def samp_flush(m):
            if isinstance(m, int):
                half, blk = (m % 2) * 8, m * 8
            else:
                half = pl.multiple_of((m % 2) * 8, 8)
                blk = pl.multiple_of(m * 8, 8)
            return pltpu.make_async_copy(
                samp_buf.at[pl.ds(half, 8)],
                samples_ref.at[pl.ds(blk, 8)],
                samp_sem.at[m % 2])

        @pl.when((i % 8 == 0) & (i >= 16))
        def _():
            samp_flush(i // 8 - 2).wait()

        samp_buf[i % 16, :B] = sample

        @pl.when((i % 8 == 7) | (i == max_n - 1))
        def _():
            samp_flush(i // 8).start()

        n_blocks = (max_n + 7) // 8
        @pl.when(i == max_n - 1)
        def _():
            if n_blocks >= 2:
                samp_flush(n_blocks - 2).wait()
            samp_flush(n_blocks - 1).wait()
            # the last step's ring writes have no next prologue to wait
            # in — drain them here so the kernel exits clean
            if not _DEBUG_NOTAP:
                for g in range(depth):
                    tap_write_dma(g, 0).wait()

        pv = prev_buf[:]
        prev_buf[:] = jnp.concatenate([pv[:, 1:], sample[:, None]], axis=1)

    total_cap = act_buf.shape[0]

    pack_dt = jnp.int8 if quantize else jnp.bfloat16
    scratch_shapes = [pltpu.VMEM((L * (k - 1), B, RW), ring_dt)]  # tap_buf
    scratch_shapes.append(pltpu.VMEM(
        (B, L * 2 * R) if aux_onemm else (8, 128), jnp.bfloat16))  # aux_buf
    if not resident:
        scratch_shapes.append(pltpu.VMEM((2, R, W), pack_dt))  # w_buf
    scratch_shapes += [
        pltpu.VMEM((2, B, h_rows), jnp.bfloat16),  # hcol (double-buffered)
        pltpu.VMEM((B, R), jnp.float32),          # out_buf
        pltpu.VMEM((B, k), jnp.int32),            # prev_buf
        pltpu.VMEM((16, B_pad), jnp.int32),       # samp_buf (2 halves)
        # one semaphore per GROUP tap DMA: tap_read_dma indexes read_sems
        # at g*(k-1)+(j-1) up to depth*(k-1)-1 (undersizing would alias/
        # overflow semaphores on hardware — caught by the round-1 review)
        pltpu.SemaphoreType.DMA((depth * (k - 1),)),  # read_sems
        pltpu.SemaphoreType.DMA((depth,)),            # write_sems
    ]
    if not resident:
        scratch_shapes.append(pltpu.SemaphoreType.DMA((2,)))   # w_sems
    scratch_shapes += [
        pltpu.SemaphoreType.DMA((2,)),            # h_sem (per h buffer)
        pltpu.SemaphoreType.DMA((2,)),            # samp_sem (per half)
    ]

    wpack_spec = (pl.BlockSpec((L, R, W), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
                  if resident else pl.BlockSpec(memory_space=pl.ANY))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(max_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),    # act scales (L, 1)
            wpack_spec,                               # wpack
            pl.BlockSpec((L, W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),    # wscale
            pl.BlockSpec(memory_space=pl.ANY),     # h_t
            pl.BlockSpec(memory_space=pl.ANY),     # act_buf (aliased)
            pl.BlockSpec((L, aux_rows, 2 * R), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(auxall.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),             # auxall
            pl.BlockSpec((k * Q, R), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, Q), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 2 * R), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, S + R), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=scratch_shapes,
    )

    max_n_pad = ((max_n + 7) // 8) * 8
    samples, _ = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((max_n_pad, B_pad), jnp.int32),
            jax.ShapeDtypeStruct((total_cap, B, RW), ring_dt),
        ],
        input_output_aliases={5: 1},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # the default scoped-vmem budget is 16 MiB; resident weights
            # + scratch at large B need most of the chip's ~128 MiB
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(seed, act_scales, wpack, wscale, h_t, act_buf, auxpack, auxall,
      causal_pack, post1_w, post2_w, biases["dil_b"], biases["sr_b"],
      biases["causal_b"], biases["post1_b"], biases["post2_b"], prev_init)

    return jnp.transpose(samples[:max_n, :B], (1, 0))


_AR_STATICS = ("config", "T0", "max_n", "mode", "interpret", "quantize",
               "prestaged")

#: Standard entry: the caller's ``carry`` stays valid (reusable across
#: repeated decodes from the same warm-up state — bench loops, tests).
pallas_ar_generate = partial(jax.jit, static_argnames=_AR_STATICS)(
    _pallas_ar_generate)

#: Fleet entry: DONATES the carry.  The kernel updates the dilation
#: rings in place (``input_output_aliases``); without donation XLA must
#: copy the ring buffer to preserve the jit argument — 6.4 GB at fleet
#: 512 for the flagship, the difference between fitting and OOM.  The
#: caller's carry buffers are invalidated; use only when the carry is
#: consumed exactly once (``batch_fast_generate``).
pallas_ar_generate_donate = partial(
    jax.jit, static_argnames=_AR_STATICS, donate_argnums=(2,))(
    _pallas_ar_generate)
