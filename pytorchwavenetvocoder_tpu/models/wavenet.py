"""Conditional WaveNet, TPU-first.

Re-designed equivalent of the reference model
(``wavenet_vocoder/nets/wavenet.py:157-549``): a gated residual
dilated-causal-conv stack over 256-way mu-law classes with per-layer aux
(1x1) conditioning, skip accumulation and a 2-layer ReLU/1x1 post stack.

Design differences from the reference (deliberate, TPU-native):

- **Functional pytree params**, channels-last ``(B, T, C)`` activations.
- **Causal convs as per-tap shifted matmuls**: a dilated causal conv with
  kernel ``k`` is exactly ``k`` time-shifted ``(T, C) @ (C, O)`` matmuls —
  the MXU-optimal formulation; no padding/trim dance
  (reference `wavenet.py:95-121` pads both sides then trims).
- **Fused gates**: the reference's separate ``dil_sigmoid``/``dil_tanh``
  convs (`wavenet.py:201-202`) are one conv producing ``2R`` channels,
  split into the sigmoid/tanh halves (identical math, half the matmuls).
  Same for the aux 1x1 pair.
- **Stacked layer params**: all ``L`` residual layers' weights live in
  arrays with a leading layer axis, keeping the pytree small.
- **AR generation is a single ``lax.scan``** over samples carrying flat
  ring buffers of the per-layer residual activations (fast-WaveNet queues,
  arXiv 1611.09482) — replacing the reference's per-sample Python loop
  (`wavenet.py:446-509`).  Ragged batches are handled by masking, not by
  shrinking the live batch (`wavenet.py:487-509` is dynamic-shape hostile).

Parity invariant (mirrors reference ``test/test_wavenet.py:93-253``):
naive full-forward AR == scan ring-buffer AR == batched scan AR, bit-equal
in argmax mode.
"""

from __future__ import annotations

import dataclasses
import math
import os
from functools import partial
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

Params = dict


@dataclasses.dataclass(frozen=True)
class WaveNetConfig:
    """Static model hyperparameters (hashable -> usable as a jit static arg).

    Field semantics follow the reference constructor
    (`wavenet.py:172-185`): ``upsampling_factor == 0`` disables the learned
    upsampling layer (aux features must then arrive at sample rate).
    """

    n_quantize: int = 256
    n_aux: int = 28
    n_resch: int = 512
    n_skipch: int = 256
    dilation_depth: int = 10
    dilation_repeat: int = 3
    kernel_size: int = 2
    upsampling_factor: int = 0
    compute_dtype: str = "float32"  # "float32", "bfloat16", or "float64"

    @property
    def dilations(self) -> tuple:
        return tuple(
            2**i for _ in range(self.dilation_repeat)
            for i in range(self.dilation_depth)
        )

    @property
    def n_layers(self) -> int:
        return self.dilation_depth * self.dilation_repeat

    @property
    def receptive_field(self) -> int:
        return (self.kernel_size - 1) * sum(self.dilations) + 1

    @property
    def dtype(self):
        return {"bfloat16": jnp.bfloat16, "float64": jnp.float64}.get(
            self.compute_dtype, jnp.float32)

    @property
    def acc_dtype(self):
        """Accumulation dtype: f64 only in full-f64 (parity-test) mode."""
        return jnp.float64 if self.compute_dtype == "float64" else jnp.float32

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "WaveNetConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


def _device_hbm_bytes() -> int:
    """The default device's memory limit, for sizing staging buffers.

    Falls back to the 16 GB of a v5e when the backend doesn't report
    memory stats (CPU tests, older runtimes) so behavior is unchanged
    there.
    """
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and stats.get("bytes_limit", 0) > 0:
            return int(stats["bytes_limit"])
    except Exception:
        pass
    return 16 * 1024**3


def _xavier_uniform(key, k: int, fan_in_c: int, fan_out_c: int, shape):
    """Xavier-uniform for a conv weight with kernel size ``k``.

    Matches torch's ``xavier_uniform_`` fans for a Conv1d weight
    (fan_in = in_c * k, fan_out = out_c * k), which is what the reference
    ``initialize`` applies to every conv (`wavenet.py:50-59`).
    """
    bound = math.sqrt(6.0 / (fan_in_c * k + fan_out_c * k))
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def init_wavenet_params(rng: jax.Array, config: WaveNetConfig) -> Params:
    """Initialize the parameter pytree.

    Weight layouts (channels-last matmul convention, ``y = x @ w + b``):
      causal.w (k, Q, R)      input one-hot -> residual width
      dil.w    (L, k, R, 2R)  fused gate conv; [:R]=sigmoid half, [R:]=tanh
      aux.w    (L, A, 2R)     fused aux 1x1
      skip.w   (L, R, S), res.w (L, R, R), post1.w (S, S), post2.w (S, Q)
      upsampling.w (uf,)      per-phase scalars of the reference's
                              ConvTranspose2d(1,1,(1,uf),(1,uf)), init 1.0
                              (replication start, `wavenet.py:61-63`)

    The two gate halves are initialized independently with the per-branch
    Xavier bound so the init distribution matches the reference's separate
    convs.
    """
    c = config
    Q, A, R, S = c.n_quantize, c.n_aux, c.n_resch, c.n_skipch
    L, k = c.n_layers, c.kernel_size
    keys = iter(jax.random.split(rng, 16))

    def gate_pair(key, kk, in_c, shape_half):
        k1, k2 = jax.random.split(key)
        sig = _xavier_uniform(k1, kk, in_c, R, shape_half)
        tanh = _xavier_uniform(k2, kk, in_c, R, shape_half)
        return jnp.concatenate([sig, tanh], axis=-1)

    params: Params = {
        "causal": {
            "w": _xavier_uniform(next(keys), k, Q, R, (k, Q, R)),
            "b": jnp.zeros((R,), jnp.float32),
        },
        "dil": {
            "w": gate_pair(next(keys), k, R, (L, k, R, R)),
            "b": jnp.zeros((L, 2 * R), jnp.float32),
        },
        "aux": {
            "w": gate_pair(next(keys), 1, A, (L, A, R)),
            "b": jnp.zeros((L, 2 * R), jnp.float32),
        },
        "skip": {
            "w": _xavier_uniform(next(keys), 1, R, S, (L, R, S)),
            "b": jnp.zeros((L, S), jnp.float32),
        },
        "res": {
            "w": _xavier_uniform(next(keys), 1, R, R, (L, R, R)),
            "b": jnp.zeros((L, R), jnp.float32),
        },
        "post1": {
            "w": _xavier_uniform(next(keys), 1, S, S, (S, S)),
            "b": jnp.zeros((S,), jnp.float32),
        },
        "post2": {
            "w": _xavier_uniform(next(keys), 1, S, Q, (S, Q)),
            "b": jnp.zeros((Q,), jnp.float32),
        },
    }
    if c.upsampling_factor > 0:
        params["upsampling"] = {
            "w": jnp.ones((c.upsampling_factor,), jnp.float32),
            "b": jnp.zeros((), jnp.float32),
        }
    return params


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


def _dot(x, w, out_dtype=None):
    """Matmul with f32/f64 MXU accumulation.

    ``out_dtype`` controls only the MATERIALIZED result dtype (the MXU
    always accumulates f32 internally): bf16 halves the HBM traffic of
    every downstream elementwise read — the training forward at
    batch_length 20000 is bandwidth-bound on its (T, 2R) f32
    intermediates, worth ~20% of the step (see make_train_step).
    """
    acc = jnp.float64 if x.dtype == jnp.float64 else jnp.float32
    return jnp.dot(x, w, preferred_element_type=out_dtype or acc)


def upsample_aux(params: Params, config: WaveNetConfig, h: jnp.ndarray) -> jnp.ndarray:
    """Learned frame->sample upsampling: (B, T', A) -> (B, T' * uf, A).

    Equivalent of the reference's ConvTranspose2d upsampler
    (`wavenet.py:124-154`): each output phase p within a frame is
    ``h * w[p] + b``.
    """
    uf = config.upsampling_factor
    if uf <= 0:
        return h
    w = params["upsampling"]["w"]
    b = params["upsampling"]["b"]
    B, T, A = h.shape
    out = h[:, :, None, :] * w[None, None, :, None] + b
    return out.reshape(B, T * uf, A)


def causal_conv(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                dilation: int, out_dtype=None) -> jnp.ndarray:
    """Dilated causal conv as per-tap shifted matmuls.

    x (B, T, C), w (k, C, O) -> (B, T, O); positions before t=0 are
    zero (matches torch Conv1d zero padding + right trim,
    `wavenet.py:104,118-121`).  ``out_dtype``: see ``_dot``.
    """
    k = w.shape[0]
    T = x.shape[1]
    y = _dot(x, w[k - 1], out_dtype)
    for j in range(k - 1):
        shift = (k - 1 - j) * dilation
        if shift >= T:
            continue
        xs = jnp.pad(x[:, : T - shift], ((0, 0), (shift, 0), (0, 0)))
        y = y + _dot(xs, w[j], out_dtype)
    return y + (b.astype(out_dtype) if out_dtype is not None else b)


def input_embed(x_ids: jnp.ndarray, params: Params, config: WaveNetConfig) -> jnp.ndarray:
    """One-hot + causal k-conv on class ids as shifted one-hot MATMULS.

    Equivalent of reference ``_preprocess`` (`wavenet.py:513-516`:
    OneHot -> CausalConv1d(Q, R, k)).  A row gather ``w[ids]`` is exact
    but lowers to a slow serial gather on TPU (~30 ms of the training
    forward at batch_length 20000); the one-hot matmul computes the
    identical values (one weight row per output — no accumulation) on
    the MXU.  Ids are wrapped mod Q (defensive ``x % depth``,
    `wavenet.py:88`); taps reaching before t=0 contribute zero (the
    shifted one-hot rows are all-zero there).
    """
    w = params["causal"]["w"].astype(config.dtype)
    b = params["causal"]["b"]
    k = w.shape[0]
    Q = config.n_quantize
    ids = x_ids % Q
    T = ids.shape[1]
    onehot = jax.nn.one_hot(ids, Q, dtype=config.dtype)       # (B, T, Q)
    y = _dot(onehot, w[k - 1])
    for j in range(k - 1):
        shift = k - 1 - j
        if shift >= T:
            continue
        oh_s = jnp.pad(onehot[:, : T - shift], ((0, 0), (shift, 0), (0, 0)))
        y = y + _dot(oh_s, w[j])
    return (y + b).astype(config.acc_dtype)


def _gate(z: jnp.ndarray, za: jnp.ndarray, R: int) -> jnp.ndarray:
    """sigmoid(z_s + za_s) * tanh(z_t + za_t) over fused 2R channels."""
    s = z[..., :R] + za[..., :R]
    t = z[..., R:] + za[..., R:]
    return jax.nn.sigmoid(s) * jnp.tanh(t)


def _post_stack(params: Params, skip_sum: jnp.ndarray, dt) -> jnp.ndarray:
    """ReLU -> 1x1 -> ReLU -> 1x1 to Q logits (reference
    ``_postprocess``, `wavenet.py:518-523`)."""
    post = jax.nn.relu(skip_sum)
    post = jax.nn.relu(
        _dot(post.astype(dt), params["post1"]["w"].astype(dt))
        + params["post1"]["b"])
    return (_dot(post.astype(dt), params["post2"]["w"].astype(dt))
            + params["post2"]["b"])


def wavenet_forward(params: Params, config: WaveNetConfig,
                    x: jnp.ndarray, h: jnp.ndarray,
                    remat: bool = False,
                    bf16_intermediates: bool = False,
                    fused: bool = False) -> jnp.ndarray:
    """Training forward: (B, T) ids + (B, T', A) aux -> (B, T, Q) logits.

    Mirrors reference ``forward`` (`wavenet.py:212-241`).  If
    ``upsampling_factor > 0``, ``h`` is frame-rate and gets upsampled here;
    otherwise it must already be sample-rate with T' == T.

    ``remat=True`` checkpoints each residual layer (rematerialized in the
    backward): the f32 gate intermediates are ~360 MB per layer per 4
    batch rows at batch_length 20000, so large-batch training OOMs HBM
    without it.  ~15% step-time cost; identical gradients.

    ``bf16_intermediates=True`` materializes the big per-layer matmul
    outputs (gate inputs, residual stream) in bf16 instead of f32 (MXU
    accumulation stays f32; the gate transcendentals still run in f32).
    The step is HBM-bandwidth-bound on those (T, 2R) buffers, so this is
    ~20% faster at the flagship operating point, at ~4e-5 relative loss
    difference.  Used by the training path only — generation keeps f32
    so the naive == scan == pallas bit-equality invariants hold.

    ``fused=True`` routes the L-layer stack through the Pallas fused
    training kernels (ops/train_kernel.py): activations stay in VMEM
    tiles and only the bf16 backward residuals touch HBM, removing the
    HBM-bandwidth wall entirely (TPU only; gate with
    ``ops.train_kernel.supports_fused_train``).  Numerics match
    ``bf16_intermediates=True`` up to bf16 rounding of the saved
    activations.
    """
    c = config
    if fused:
        from pytorchwavenetvocoder_tpu.ops.train_kernel import (
            fused_layer_stack,
            fused_train_constraint_error,
        )

        if c.dtype != jnp.bfloat16:
            raise ValueError(
                "fused=True requires compute_dtype='bfloat16' (the fused "
                "kernels are inherently bf16; an f32 parity/debug run "
                "must use the XLA path)")
        why_not = fused_train_constraint_error(c, x.shape[1])
        if why_not is not None:
            raise ValueError(
                f"fused=True but this config/window is outside the fused "
                f"kernels' validated envelope: {why_not}. Use the XLA "
                "path (fused=False / --fused false) instead.")

        out = input_embed(x, params, c).astype(jnp.bfloat16)
        if c.upsampling_factor > 0:
            h = upsample_aux(params, c, h)
        skip_sum = fused_layer_stack(params, c, out, h)
        return _post_stack(params, skip_sum, jnp.bfloat16)

    R = c.n_resch
    dt = c.dtype
    mm_dt = dt if bf16_intermediates and dt == jnp.bfloat16 else None

    out = input_embed(x, params, c)
    if c.upsampling_factor > 0:
        h = upsample_aux(params, c, h)
    h = h.astype(dt)
    if mm_dt is not None:
        out = out.astype(dt)

    dil_w = params["dil"]["w"].astype(dt)
    dil_b = params["dil"]["b"]
    aux_w = params["aux"]["w"].astype(dt)
    aux_b = params["aux"]["b"]
    skip_w = params["skip"]["w"].astype(dt)
    skip_b = params["skip"]["b"]
    res_w = params["res"]["w"].astype(dt)
    res_b = params["res"]["b"]

    def layer_fn(d, out, skip_sum, h, lw):
        z = causal_conv(out.astype(dt), lw["dil_w"], lw["dil_b"], d,
                        out_dtype=mm_dt)
        za = _dot(h, lw["aux_w"], mm_dt) + (
            lw["aux_b"].astype(mm_dt) if mm_dt is not None else lw["aux_b"])
        if mm_dt is not None:
            # upcast fuses into the gate read; transcendentals stay f32
            z = z.astype(jnp.float32)
            za = za.astype(jnp.float32)
        g = _gate(z, za, R).astype(dt)
        # skip stays f32: it is the 30-term accumulator (and 2x smaller)
        skip = _dot(g, lw["skip_w"]) + lw["skip_b"]
        skip_sum = skip if skip_sum is None else skip_sum + skip
        if mm_dt is not None:
            out = _dot(g, lw["res_w"], mm_dt) + lw["res_b"].astype(mm_dt) + out
        else:
            out = _dot(g, lw["res_w"]) + lw["res_b"] + out
        return out, skip_sum

    skip_sum = None
    for l, d in enumerate(c.dilations):
        lw = dict(dil_w=dil_w[l], dil_b=dil_b[l], aux_w=aux_w[l],
                  aux_b=aux_b[l], skip_w=skip_w[l], skip_b=skip_b[l],
                  res_w=res_w[l], res_b=res_b[l])
        fn = partial(layer_fn, d)
        if remat and skip_sum is not None:
            fn = jax.checkpoint(fn)
        out, skip_sum = fn(out, skip_sum, h, lw)

    return _post_stack(params, skip_sum, dt)


# ---------------------------------------------------------------------------
# autoregressive generation
# ---------------------------------------------------------------------------


def _pad_seed(config: WaveNetConfig, x: jnp.ndarray, h: jnp.ndarray):
    """Left-pad seed ids with Q//2 and replicate-pad aux to receptive field.

    Mirrors reference padding before generation (`wavenet.py:262-265`).
    ``h`` must already be at sample rate here.
    """
    n_pad = config.receptive_field - x.shape[1]
    if n_pad > 0:
        x = jnp.pad(x, ((0, 0), (n_pad, 0)), constant_values=config.n_quantize // 2)
        h = jnp.pad(h, ((0, 0), (n_pad, 0), (0, 0)), mode="edge")
    return x, h


def _forward_collect(params: Params, config: WaveNetConfig,
                     x: jnp.ndarray, h: jnp.ndarray,
                     bf16_intermediates: bool = False):
    """Forward over the seed region, returning every layer's input stream.

    r[0] = causal-conv output, r[l+1] = layer l output; these fill the AR
    ring buffers (the warm-up of `wavenet.py:336-350`).

    ``bf16_intermediates`` materializes the big matmul outputs in bf16
    (f32 MXU accumulation, f32 gate) — the warm-up is HBM-bound on its
    (B, T0, 2R) buffers, so this is ~2x at decode-fleet batch sizes.
    Default f32 preserves the naive == scan == pallas bit-equality
    invariant; the Pallas decode consumes the rings in bf16 anyway, so
    its production path opts in (`batch_fast_generate(warmup_bf16=...)`).
    """
    c = config
    R = c.n_resch
    dt = c.dtype
    mm_dt = dt if bf16_intermediates and dt == jnp.bfloat16 else None
    out = input_embed(x, params, c)
    if mm_dt is not None:
        out = out.astype(dt)
    h = h.astype(dt)
    streams = [out]
    for l, d in enumerate(c.dilations):
        z = causal_conv(out.astype(dt), params["dil"]["w"][l].astype(dt),
                        params["dil"]["b"][l], d, out_dtype=mm_dt)
        za = _dot(h, params["aux"]["w"][l].astype(dt), mm_dt) + (
            params["aux"]["b"][l].astype(mm_dt) if mm_dt is not None
            else params["aux"]["b"][l])
        if mm_dt is not None:
            z = z.astype(jnp.float32)
            za = za.astype(jnp.float32)
        g = _gate(z, za, R).astype(dt)
        if mm_dt is not None:
            out = _dot(g, params["res"]["w"][l].astype(dt), mm_dt) + (
                params["res"]["b"][l].astype(mm_dt)) + out
        else:
            out = _dot(g, params["res"]["w"][l].astype(dt))                 + params["res"]["b"][l] + out
        streams.append(out)
    return streams  # list of (B, T, R); last entry unused by buffers


def _forward_act_maxes(params: Params, config: WaveNetConfig,
                       x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Per-layer max |residual-stream| over the teacher-forced seed region.

    Same math as ``_forward_collect`` but reduces each layer's input
    stream to a scalar instead of materializing all L streams (O(1)
    stream memory), so int8 calibration can see the WHOLE decode fleet —
    calibrating from a few rows lets louder utterances elsewhere in the
    batch clip at ±127.  Returns (n_layers,) f32.
    """
    c = config
    R = c.n_resch
    dt = c.dtype
    out = input_embed(x, params, c)
    h = h.astype(dt)
    maxes = []
    for l, d in enumerate(c.dilations):
        maxes.append(jnp.max(jnp.abs(out.astype(jnp.float32))))
        z = causal_conv(out.astype(dt), params["dil"]["w"][l].astype(dt),
                        params["dil"]["b"][l], d)
        za = _dot(h, params["aux"]["w"][l].astype(dt)) + params["aux"]["b"][l]
        g = _gate(z, za, R).astype(dt)
        out = _dot(g, params["res"]["w"][l].astype(dt)) + params["res"]["b"][l] + out
    return jnp.stack(maxes)


def _buffer_layout(config: WaveNetConfig):
    """Static ring-buffer layout: per-layer capacity (k-1)*d and offsets."""
    k = config.kernel_size
    caps = [(k - 1) * d for d in config.dilations]
    offsets = np.concatenate([[0], np.cumsum(caps[:-1])]).astype(int) if caps else np.array([], int)
    total = int(np.sum(caps))
    return caps, [int(o) for o in offsets], total


@partial(jax.jit, static_argnames=("config", "bf16_intermediates",
                                   "collect_act_maxes"))
def _warmup_state(params: Params, config: WaveNetConfig,
                  x: jnp.ndarray, h_up: jnp.ndarray,
                  bf16_intermediates: bool = False,
                  collect_act_maxes: bool = False):
    """Run the teacher-forced forward over the seed region and pack the
    AR carry (ring buffers + sample history) for the scan decoder.

    The fast-WaveNet warm-up (`wavenet.py:336-350` in the reference).
    One-time O(B * T0 * model) cost per batch; the scan itself is O(B)
    per emitted sample.

    For kernel_size 2 the ring stores PROJECTION-FORWARDED values: each
    slot holds ``out_l(p) @ w_past_l`` (the (B, 2R) gate contribution the
    activation will make at position p + d) instead of the raw (B, R)
    activation.  The projection runs at WRITE time fused with the
    current-tap matmul, so the per-sample read becomes a pure add — one
    double-width matmul per layer instead of two dependent ones.
    (kernel_size > 2 rings hold the raw activations; the int8 Pallas
    decoder re-quantizes them under its static per-layer scales at
    launch — see ops/ar_kernel.py.)

    ``collect_act_maxes=True`` additionally returns the per-layer max
    |residual-stream| over the whole fleet's seed region ((L,) f32) —
    the statistic int8 calibration needs (``ops/ar_kernel.py::
    act_scales_from_maxes``).  The streams are already materialized here
    per chunk, so collecting the maxes is a free VPU reduce; it replaces
    the separate ``calibrate_act_scales`` forward pass, which doubled
    every int8 decode fleet's teacher-forced cost.  The returned value
    becomes ``(carry, maxes)``.
    """
    c = config
    B, T0 = x.shape
    R = c.n_resch
    k = c.kernel_size
    L = c.n_layers
    dt = c.dtype
    buf_dt = dt if dt == jnp.bfloat16 else c.acc_dtype
    caps, offsets, total_cap = _buffer_layout(c)

    proj_fwd = (k == 2)
    dil_w_past = params["dil"]["w"][:, 0].astype(dt) if proj_fwd else None

    # bf16 mode on TPU: run the teacher-forced forward through the fused
    # training-forward kernel in streams-only mode (ops/train_kernel.py,
    # save_st=False) — its per-layer stream outputs are exactly what the
    # ring fill consumes, and activations stay in VMEM tiles instead of
    # materializing every layer's (B, T0, 2R) gate inputs to HBM
    import os as _os

    use_kernel = False
    if (bf16_intermediates and dt == jnp.bfloat16
            and _os.environ.get("WN_WARMUP_KERNEL", "1") == "1"):
        from pytorchwavenetvocoder_tpu.ops.train_kernel import (
            supports_fused_train,
        )

        use_kernel = (jax.default_backend() == "tpu"
                      and supports_fused_train(c, T0))

    def fill(x_chunk, h_chunk):
        if use_kernel:
            from pytorchwavenetvocoder_tpu.ops.train_kernel import (
                _fwd_pallas,
                _layer_weights,
            )

            out0 = input_embed(x_chunk, params, c).astype(jnp.bfloat16)
            _, (_x0, s_arr, _st, _hb) = _fwd_pallas(
                c, _layer_weights(params), out0, h_chunk, save_st=False)
            streams = [out0] + [s_arr[l, :, :T0] for l in range(L - 1)]
        else:
            streams = _forward_collect(params, c, x_chunk, h_chunk,
                                       bf16_intermediates=bf16_intermediates)
        parts = []
        for l in range(L):
            cap = caps[l]
            # positions T0-1-cap .. T0-2 of stream l, at slot pos % cap
            seg = streams[l][:, T0 - 1 - cap: T0 - 1]         # (Bc, cap, R)
            if proj_fwd:
                seg = _dot(seg.astype(dt), dil_w_past[l])     # (Bc, cap, 2R)
            pos = (jnp.arange(T0 - 1 - cap, T0 - 1)) % cap
            seg_t = jnp.transpose(seg, (1, 0, 2)).astype(buf_dt)
            buf_l = jnp.zeros((cap,) + seg_t.shape[1:], buf_dt).at[pos].set(seg_t)
            parts.append(buf_l)
        buf = jnp.concatenate(parts, axis=0)    # (total_cap, Bc, R or 2R)
        if collect_act_maxes:
            # max |layer input stream| per layer over this chunk's whole
            # seed region — same statistic as _forward_act_maxes
            mx = jnp.stack([
                jnp.max(jnp.abs(streams[l][:, :T0].astype(jnp.float32)))
                for l in range(L)])
            return buf, mx
        return buf

    # chunk the teacher-forced warm-up over batch — its activations are
    # O(B * T0 * channels) and blow HBM for big decode fleets otherwise.
    # lax.map forces the chunks to run SEQUENTIALLY (a python loop has no
    # data dependence between chunks, so XLA overlaps them and the temp
    # memory multiplies right back).  The chunk adapts to the receptive
    # field (~64 rows at arctic's T0=3070, 32 at ljspeech's 6139 on a
    # 16 GB chip) and scales with the ACTUAL device HBM — the base
    # budgets below were probe-derived on a 16 GB v5e, and a different
    # TPU generation gets them rescaled instead of silently inheriting
    # the v5e numbers.
    hbm_scale = _device_hbm_bytes() / (16 * 1024**3)
    chunk = int(max(8, min(64, (int(200_000 * hbm_scale) // max(T0, 1))
                           // 8 * 8)))
    if use_kernel:
        # the kernel path materializes per-layer bf16 streams
        # (L * chunk * T0 * R); cap the chunk so that stays ~3 GB of a
        # 16 GB chip (scaled to the actual device)
        stream_bytes_per_row = c.n_layers * c.n_resch * 2
        budget = int(3 * 1024**3 * hbm_scale)
        chunk = int(max(8, min(
            chunk,
            (budget // max(T0 * stream_bytes_per_row, 1)) // 8 * 8)))
    maxes = None
    if B <= chunk:
        out = fill(x, h_up[:, :T0])
        act_buf, maxes = out if collect_act_maxes else (out, None)
    elif B % chunk == 0:
        xc = x.reshape(B // chunk, chunk, T0)
        hc = h_up[:, :T0].reshape(B // chunk, chunk, T0, h_up.shape[2])
        out = lax.map(lambda args: fill(*args), (xc, hc))
        bufs, mxs = out if collect_act_maxes else (out, None)
        # (n_chunks, total_cap, chunk, W) -> (total_cap, B, W)
        act_buf = jnp.transpose(bufs, (1, 0, 2, 3)).reshape(
            bufs.shape[1], B, bufs.shape[-1])
        if collect_act_maxes:
            maxes = jnp.max(mxs, axis=0)
    else:
        outs = [fill(x[b: b + chunk], h_up[b: b + chunk, :T0])
                for b in range(0, B, chunk)]
        if collect_act_maxes:
            act_buf = jnp.concatenate([o[0] for o in outs], axis=1)
            maxes = jnp.max(jnp.stack([o[1] for o in outs]), axis=0)
        else:
            act_buf = jnp.concatenate(outs, axis=1)

    # ids at positions p-k+1 .. p-1 for the first step (p = T0-1), oldest
    # first; the current-position id rides separately as ``prev``
    sample_hist = x[:, T0 - k: T0 - 1] if k > 1 else jnp.zeros((B, 0), jnp.int32)
    carry = (act_buf, sample_hist.astype(jnp.int32),
             x[:, -1].astype(jnp.int32))
    return (carry, maxes) if collect_act_maxes else carry


@partial(jax.jit, static_argnames=("config", "T0", "max_n", "mode"))
def _scan_chunk(params: Params, config: WaveNetConfig, carry,
                h_up: jnp.ndarray, T0: int, max_n: int, mode: str,
                rng: jax.Array, i0=0):
    """Like ``_scan_from_state`` but returns ``(carry, samples)`` so
    generation can proceed in chunks (``intervals`` progress logging)
    with output identical to one fused scan: ``i0`` is the absolute
    step offset (dynamic — one compile serves every chunk), keeping the
    per-step PRNG folds and ring positions aligned."""
    c = config
    act_buf0, sample_hist0, prev0 = carry
    B = prev0.shape[0]
    R = c.n_resch
    S = c.n_skipch
    k = c.kernel_size
    L = c.n_layers
    dt = c.dtype
    buf_dt = act_buf0.dtype
    caps, offsets, total_cap = _buffer_layout(c)

    # ---- static index vectors for the fused ring-buffer ops ------------
    offs_v = jnp.asarray(offsets, jnp.int32)                    # (L,)
    caps_v = jnp.asarray(caps, jnp.int32)                       # (L,)
    # read lags j*d per (layer, tap j=1..k-1), flattened (L*(k-1),)
    lags_np = np.asarray([[j * d for j in range(1, k)]
                          for d in c.dilations], np.int32).reshape(L, k - 1)
    lags_v = jnp.asarray(lags_np)                               # (L, k-1)

    # fused aux projection weights: (A, L*2R)
    aux_w_flat = jnp.transpose(params["aux"]["w"], (1, 0, 2)).reshape(
        c.n_aux, L * 2 * R).astype(dt)
    aux_b = params["aux"]["b"]

    dil_w = params["dil"]["w"].astype(dt)            # (L, k, R, 2R)
    dil_w_cur = dil_w[:, k - 1]                      # (L, R, 2R) current tap
    # past taps ordered by lag j=1..k-1 -> weight index k-1-j
    dil_w_past = (dil_w[:, k - 2::-1].reshape(L, (k - 1), R, 2 * R)
                  if k > 1 else None)
    dil_b = params["dil"]["b"]
    # fused skip+res projection: (L, R, S+R)
    sr_w = jnp.concatenate([params["skip"]["w"], params["res"]["w"]],
                           axis=-1).astype(dt)
    sr_b = jnp.concatenate([params["skip"]["b"], params["res"]["b"]], axis=-1)
    causal_w = params["causal"]["w"].astype(dt)      # (k, Q, R)
    causal_b = params["causal"]["b"]
    post1_w = params["post1"]["w"].astype(dt)
    post1_b = params["post1"]["b"]
    post2_w = params["post2"]["w"].astype(dt)
    post2_b = params["post2"]["b"]

    def step(carry, i):
        act_buf, sample_hist, prev = carry
        p = T0 - 1 + i  # absolute position being evaluated

        # input causal conv at position p: taps are ids at p, p-1, .., p-k+1
        ids = jnp.concatenate([sample_hist, prev[:, None]], axis=1) % c.n_quantize
        out = causal_b.astype(c.acc_dtype) + jnp.zeros((B, R), c.acc_dtype)
        for j in range(k):
            out = out + causal_w[j][ids[:, j]]

        # aux column at position p, projected for all layers at once
        hcol = lax.dynamic_slice(h_up, (0, p, 0), (B, 1, c.n_aux))[:, 0, :].astype(dt)
        za_all = _dot(hcol, aux_w_flat).reshape(B, L, 2 * R) + aux_b[None]

        # ONE gather for every layer's past taps.  kernel_size 2 rings
        # are projection-forwarded (slots already hold the (B, 2R) gate
        # contribution), so the gather IS z_past — no matmul; other
        # kernel sizes batch one einsum over the raw activations.
        if k == 2:
            read_idx = (offs_v + (p - lags_v[:, 0]) % caps_v)
            z_past = act_buf[read_idx].astype(c.acc_dtype)        # (L, B, 2R)
        elif k > 1:
            read_idx = (offs_v[:, None] + (p - lags_v) % caps_v[:, None]).reshape(-1)
            past = act_buf[read_idx].reshape(L, k - 1, B, R)      # gather
            z_past = jnp.einsum(
                "ljbr,ljro->lbo", past.astype(dt), dil_w_past,
                preferred_element_type=c.acc_dtype)               # (L, B, 2R)
        else:
            z_past = jnp.zeros((L, B, 2 * R), c.acc_dtype)

        skip_sum = jnp.zeros((B, S), c.acc_dtype)
        new_vals = []
        for l in range(L):
            z = (_dot(out.astype(dt), dil_w_cur[l]) + z_past[l]
                 + dil_b[l] + za_all[:, l])
            g = jax.nn.sigmoid(z[:, :R]) * jnp.tanh(z[:, R:])
            sr = _dot(g.astype(dt), sr_w[l]) + sr_b[l]
            skip_sum = skip_sum + sr[:, :S]
            new_vals.append(out)
            out = sr[:, S:] + out

        # ONE scatter records every layer's input for future taps
        # (kernel_size 2: projected at write time, one batched matmul)
        write_idx = offs_v + p % caps_v
        new_stack = jnp.stack(new_vals)                           # (L, B, R)
        if k == 2:
            new_stack = jnp.einsum(
                "lbr,lro->lbo", new_stack.astype(dt), dil_w_past[:, 0],
                preferred_element_type=c.acc_dtype)               # (L, B, 2R)
        act_buf = act_buf.at[write_idx].set(new_stack.astype(buf_dt))

        post = jax.nn.relu(skip_sum)
        post = jax.nn.relu(_dot(post.astype(dt), post1_w) + post1_b)
        logits = _dot(post.astype(dt), post2_w) + post2_b  # (B, Q)

        if mode == "argmax":
            sample = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            key = jax.random.fold_in(rng, i)
            sample = jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)

        if k > 1:
            sample_hist = jnp.concatenate([sample_hist[:, 1:], prev[:, None]], axis=1)
        return (act_buf, sample_hist, sample), sample

    init = (act_buf0, sample_hist0, prev0)
    carry_out, samples = lax.scan(step, init,
                                  jnp.arange(max_n) + jnp.asarray(i0))
    return carry_out, jnp.transpose(samples, (1, 0))  # (B, max_n)


@partial(jax.jit, static_argnames=("config", "T0", "max_n", "mode"))
def _scan_from_state(params: Params, config: WaveNetConfig, carry,
                     h_up: jnp.ndarray, T0: int, max_n: int, mode: str,
                     rng: jax.Array) -> jnp.ndarray:
    """Steady-state AR scan from a packed carry (see ``_warmup_state``).

    Args:
      carry: (act_buf, sample_hist, prev) from ``_warmup_state``.
      h_up: (B, >= T0 + max_n, A) sample-rate aux features.
      T0: seed length (static; first generated sample has index T0).
      max_n: number of samples to generate (static).
      mode: "sampling" | "argmax" (static).
      rng: PRNG key (used in sampling mode).

    Returns:
      (B, max_n) int32 generated mu-law classes.
    """
    return _scan_chunk(params, config, carry, h_up, T0, max_n, mode, rng)[1]


def _scan_generate(params: Params, config: WaveNetConfig,
                   x: jnp.ndarray, h_up: jnp.ndarray,
                   max_n: int, mode: str, rng: jax.Array,
                   intervals: int | None = None,
                   warmup_bf16: bool = False) -> jnp.ndarray:
    """Full AR decode: warm-up + steady-state scan (two jit units so the
    one-time warm-up doesn't inflate or OOM the per-sample path).

    ``intervals`` (reference `wavenet.py:479-484`) chunks the scan and
    logs progress + sec/sample every that many samples; the emitted
    samples are identical to the fused call (same PRNG stream).
    """
    import logging
    import time

    carry = _warmup_state(params, config, x, h_up,
                          bf16_intermediates=warmup_bf16)
    T0 = x.shape[1]
    if not intervals or intervals >= max_n:
        return _scan_from_state(params, config, carry, h_up, T0,
                                max_n, mode, rng)
    # equal-size chunks (one compiled executable); the remainder chunk
    # compiles at most one extra size
    gen, outs = 0, []
    t_start = time.time()
    while gen < max_n:
        n_c = min(intervals, max_n - gen)
        carry, s = _scan_chunk(params, config, carry, h_up, T0, n_c,
                               mode, rng, i0=gen)
        jax.block_until_ready(s)
        outs.append(s)
        gen += n_c
        el = time.time() - t_start
        logging.info("%d/%d samples generated (%.6f sec / sample)",
                     gen, max_n, el / gen)
    return jnp.concatenate(outs, axis=1)


def pallas_mesh_generate(params: Params, config: WaveNetConfig, carry, h,
                         T0: int, max_n: int, mode: str, rng, mesh,
                         interpret: bool = False, quantize: bool = False,
                         act_scales=None):
    """Decode fleet over a mesh: each chip runs the fused Pallas kernel
    on its batch shard (shard_map keeps the kernel single-chip; the RNG
    key is decorrelated per shard via the data-axis index)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from pytorchwavenetvocoder_tpu.ops.ar_kernel import pallas_ar_generate

    if act_scales is None:
        act_scales = jnp.full((config.n_layers, 1), 0.05, jnp.float32)

    def shard_fn(params, carry, h, rng, act_scales):
        key = jax.random.fold_in(rng, lax.axis_index("data"))
        return pallas_ar_generate(params, config, carry, h, T0,
                                  max_n, mode, key, interpret=interpret,
                                  quantize=quantize, act_scales=act_scales)

    return shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), (P(None, "data"), P("data"), P("data")),
                  P("data"), P(), P()),
        out_specs=P("data"),
        check_vma=False,
    )(params, carry, h, rng, act_scales)


def _fleet_hbm_bytes(config: WaveNetConfig, B: int, max_n: int) -> int:
    """Estimated single-chip HBM high-water of one decode fleet.

    Counts the big O(B) buffers of the pallas decode path: the warm-up
    ring carry, the upsampled f32 aux, the lane-packed staged aux
    stream (plus one staging temporary), the int32 output, and ~half a
    ring again for warm-up forward temporaries.  Used by
    ``batch_fast_generate`` to auto-cap fleet size before the chip
    OOMs; deliberately conservative rather than exact."""
    c = config
    need_T = c.receptive_field + 1 + max_n
    rw = 2 * c.n_resch if c.kernel_size == 2 else c.n_resch
    ring = (c.kernel_size - 1) * sum(c.dilations) * B * rw * 2
    h_up = B * need_T * c.n_aux * 4
    aux_rows = max(32, -(-c.n_aux // 32) * 32)
    h_rows = max(128, -(-aux_rows // 128) * 128)
    staged = -(-need_T // (h_rows // aux_rows)) * B * h_rows * 2
    out = B * max_n * 4
    return ring + h_up + staged + out + ring // 2


def _decode_hbm_budget() -> float:
    """HBM budget (bytes) available to one decode fleet.

    ``WNV_DECODE_HBM_BUDGET`` overrides; otherwise 3/4 of the device's
    reported ``bytes_limit`` (leaving headroom for weights, XLA
    temporaries, and a resident train state), falling back to 12 GB on
    TPU and unbounded elsewhere (CPU tests must not chunk)."""
    env = os.environ.get("WNV_DECODE_HBM_BUDGET")
    if env:
        return float(env)
    if jax.default_backend() != "tpu":
        return float("inf")
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        lim = stats.get("bytes_limit")
        if lim:
            return 0.75 * float(lim)
    except Exception:
        pass
    return 12e9


def batch_fast_generate(params: Params, config: WaveNetConfig,
                        x, h, n_samples_list, mode: str = "sampling",
                        rng: jax.Array | None = None, mesh=None,
                        impl: str = "scan", intervals: int | None = None,
                        quantize: bool = False,
                        warmup_bf16: bool | None = None):
    """Batched fast AR generation (reference ``batch_fast_generate``,
    `wavenet.py:397-511`).

    Args:
      x: (B, T0) int seed ids.
      h: (B, T_frames, A) frame-rate aux (upsampled here if configured) or
         (B, T_samples, A) sample-rate aux when upsampling_factor == 0.
      n_samples_list: per-utterance sample counts (python list, length B).
      mode: "sampling" | "argmax".
      rng: PRNG key for sampling mode.
      mesh: optional jax.sharding.Mesh — the batch dim is sharded over its
        'data' axis (the decode-fleet replacement for the reference's
        one-process-per-GPU fan-out, `decode.py:329-338`).  B must be a
        multiple of the data-axis size.
      impl: "scan" (lax.scan, any config, mesh-shardable), "pallas"
        (fused TPU kernel, kernel_size 2/3, n_quantize 256; channel
        counts off the 128-lane grid are zero-padded in transparently —
        see ops/ar_kernel.py pad_params_for_pallas), or "auto" (pallas
        when supported).
      quantize: pallas path only — int8 MXU matmuls with warmup-
        calibrated static activation scales (~1.35x throughput, small
        logit error; see ops/ar_kernel.py).
      warmup_bf16: materialize the warm-up forward's intermediates in
        bf16 (~2x faster warm-up, HBM-bound at fleet batch sizes).
        Default (None): on for the pallas path — its kernel consumes the
        rings in bf16 anyway — and off for scan, which keeps the
        naive == scan bit-equality invariant.

    Returns:
      list of np.int32 arrays, one per utterance in input order, each of
      its requested length (finished utterances are masked, not removed —
      static shapes for XLA).
    """
    c = config
    # ---- fleet HBM auto-capping ----------------------------------------
    # A fleet whose warm-up carry + upsampled aux + staged stream exceed
    # the chip's HBM budget is decoded in sequential sub-fleets instead
    # of OOMing (huge B x long utterances).  Chunked before the f32 aux
    # upsample so the big buffers are never built at full fleet size.
    # Sampling keys are fold_in-split per sub-fleet; argmax decoding is
    # bit-identical chunked vs not.
    # WNV_DECODE_FLEET_CHUNK=<B> forces a chunk size (testing aid).
    B_fleet = int(np.shape(x)[0])
    if mesh is None and B_fleet > 1:
        forced = int(os.environ.get("WNV_DECODE_FLEET_CHUNK", "0"))
        if forced > 0:
            chunk_B = min(forced, B_fleet)
        else:
            budget = _decode_hbm_budget()
            est = _fleet_hbm_bytes(c, B_fleet, int(max(n_samples_list)))
            chunk_B = (B_fleet if est <= budget
                       else max(1, B_fleet // -(-est // int(budget))))
        if chunk_B < B_fleet:
            outs = []
            base_rng = rng if rng is not None else jax.random.PRNGKey(0)
            n_list = list(n_samples_list)
            for i in range(0, B_fleet, chunk_B):
                sl = slice(i, i + chunk_B)
                outs.extend(batch_fast_generate(
                    params, config, x[sl], h[sl], n_list[sl],
                    mode, jax.random.fold_in(base_rng, i), mesh=None,
                    impl=impl, intervals=intervals, quantize=quantize,
                    warmup_bf16=warmup_bf16))
            return outs
    x = jnp.asarray(x, jnp.int32)
    h = jnp.asarray(h, c.acc_dtype)
    if c.upsampling_factor > 0:
        h = upsample_aux(params, c, h)
    x, h = _pad_seed(c, x, h)
    max_n = int(max(n_samples_list))
    # aux must cover positions up to T0 - 1 + max_n - 1 + 1
    need = x.shape[1] + max_n
    if h.shape[1] < need:
        h = jnp.pad(h, ((0, 0), (0, need - h.shape[1]), (0, 0)), mode="edge")
    if rng is None:
        rng = jax.random.PRNGKey(0)

    use_pallas = False
    pl_params, pl_c = params, c
    if impl in ("pallas", "auto"):
        from pytorchwavenetvocoder_tpu.ops.ar_kernel import (
            pad_params_for_pallas,
            pallas_paddable,
            supports_pallas_ar,
        )

        on_tpu = jax.default_backend() == "tpu"
        use_pallas = supports_pallas_ar(c) and on_tpu
        if not use_pallas and on_tpu and pallas_paddable(c):
            # channel counts off the 128-lane grid: zero-pad the params
            # into the kernel envelope (inference-transparent — padded
            # lanes stay exactly 0; see pad_params_for_pallas) instead
            # of falling back to the ~3x slower scan path
            pl_params, pl_c = pad_params_for_pallas(params, c)
            use_pallas = True
        if mesh is not None and x.shape[0] % mesh.shape["data"] != 0:
            use_pallas = False
        if impl == "pallas" and not use_pallas:
            raise ValueError("pallas AR kernel does not support this "
                             "config/mesh/backend; use impl='scan'")
    if quantize and not use_pallas:
        # never mislabel a bf16 run as int8 — a silent fallback would
        # make int8-vs-bf16 fidelity comparisons vacuously pass
        import warnings

        warnings.warn("quantize=True requested but the pallas kernel is "
                      "unavailable for this config/mesh/backend; decoding "
                      "with the bf16 scan path instead.", stacklevel=2)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        x = jax.device_put(x, sh)
        h = jax.device_put(h, sh)
        padded = pl_params is not params
        params = jax.device_put(params, repl)
        pl_params = jax.device_put(pl_params, repl) if padded else params

    # Mosaic HBM memref slices must be tile-aligned along the batch dim:
    # a fleet whose B is not a multiple of 8 (e.g. the TAIL batch of a
    # decode corpus, or a single utterance) fails kernel compilation with
    # "Slice shape along dimension 1 must be aligned to tiling".  Pad the
    # fleet by duplicating the last row (masked out of the returned list;
    # at small B the kernel is dependent-chain-bound, so the pad rows are
    # ~free) — 8 covers the bf16 (4,128) packed tiling and is the batch
    # granularity proven on silicon (tests/test_tpu_hardware.py).
    B_orig = x.shape[0]
    if use_pallas and mesh is None and B_orig % 8:
        pad_B = 8 - B_orig % 8
        x = jnp.concatenate([x, jnp.repeat(x[-1:], pad_B, axis=0)], axis=0)
        h = jnp.concatenate([h, jnp.repeat(h[-1:], pad_B, axis=0)], axis=0)

    if use_pallas:
        wb = (pl_c.dtype == jnp.bfloat16 if warmup_bf16 is None
              else warmup_bf16)
        act_scales = None
        if quantize:
            # int8 calibration rides the warm-up forward: the per-layer
            # stream maxes are collected from the streams the ring fill
            # already materializes, instead of a second teacher-forced
            # pass over the whole fleet (calibrate_act_scales doubled
            # every int8 fleet's warm-up cost — ~1 s at fleet 256 x
            # RF 3070).  The warm-up runs bf16 streams, so the maxes
            # carry bf16 rounding (~0.4% relative) — negligible against
            # the scale formula's 25% drift headroom.
            from pytorchwavenetvocoder_tpu.ops.ar_kernel import (
                act_scales_from_maxes,
            )

            carry, maxes = _warmup_state(pl_params, pl_c, x, h,
                                         bf16_intermediates=wb,
                                         collect_act_maxes=True)
            act_scales = act_scales_from_maxes(maxes)
        else:
            carry = _warmup_state(pl_params, pl_c, x, h,
                                  bf16_intermediates=wb)
        if mesh is None:
            from pytorchwavenetvocoder_tpu.ops.ar_kernel import (
                pallas_ar_generate_donate,
                stage_aux,
                staged_aux_len,
                staged_aux_rows,
            )

            # the kernel's internal aux staging materializes ~2x the
            # lane-packed (ceil(T/pack), B, 128) bf16 stream as XLA
            # temporaries; above ~1.5 GB of that, stage in bounded
            # chunks instead (huge fleets / long utterances would
            # otherwise OOM the chip).  The carry is DONATED either way:
            # it is consumed exactly once here, and donation lets the
            # kernel's in-place ring update alias the warm-up buffer
            # instead of copying it (6.4 GB at fleet 512).
            need_T = x.shape[1] + max_n
            rows = staged_aux_rows(pl_c)
            n_rows = staged_aux_len(pl_c, need_T)
            if 2 * n_rows * x.shape[0] * rows * 2 > 1_500_000_000:
                h_staged = stage_aux(h[:, :need_T], rows, config=pl_c)
                del h  # free the (B, T, A) f32 aux before the kernel runs
                samples = pallas_ar_generate_donate(
                    pl_params, pl_c, carry, h_staged, x.shape[1], max_n,
                    mode, rng, quantize=quantize, act_scales=act_scales,
                    prestaged=True)
            else:
                samples = pallas_ar_generate_donate(
                    pl_params, pl_c, carry, h, x.shape[1], max_n, mode, rng,
                    quantize=quantize, act_scales=act_scales)
        else:
            samples = pallas_mesh_generate(pl_params, pl_c, carry, h,
                                           x.shape[1], max_n, mode, rng,
                                           mesh, quantize=quantize,
                                           act_scales=act_scales)
    else:
        samples = _scan_generate(params, config, x, h, max_n, mode, rng,
                                 intervals=intervals,
                                 warmup_bf16=bool(warmup_bf16))
    samples = samples[:B_orig]  # drop tile-alignment pad rows
    if config.n_quantize <= 256:
        # mu-law ids fit uint8: shrink the device->host copy 4x (the
        # fleet output is B x max_n int32 on device — 49 MB at fleet
        # 256 x 3 s, a measurable slice of e2e decode through thin
        # host links)
        samples = samples.astype(jnp.uint8)  # eager: shape-keyed dispatch cache
    samples = np.asarray(jax.device_get(samples)).astype(np.int32)
    return [samples[b, : int(n)] for b, n in enumerate(n_samples_list)]


def fast_generate(params: Params, config: WaveNetConfig, x, h, n_samples: int,
                  mode: str = "sampling", rng: jax.Array | None = None,
                  intervals: int | None = None):
    """Single-utterance fast AR generation (reference `wavenet.py:309-395`).

    ``intervals`` chunks the scan decode and logs progress/sec-per-sample
    every that many samples (reference `wavenet.py:479-484`); the
    samples are identical to the fused call.
    """
    out = batch_fast_generate(params, config, x, h, [n_samples], mode, rng,
                              intervals=intervals)
    return out[0]


def generate(params: Params, config: WaveNetConfig, x, h, n_samples: int,
             mode: str = "sampling", rng: jax.Array | None = None):
    """Naive AR generation re-running the full forward per sample.

    Direct analogue of reference ``generate`` (`wavenet.py:243-307`);
    kept as the slow-but-obviously-correct oracle for the equivalence
    tests.  Batch size must be 1.
    """
    c = config
    x = jnp.asarray(x, jnp.int32)
    h = jnp.asarray(h, c.acc_dtype)
    if c.upsampling_factor > 0:
        h = upsample_aux(params, c, h)
    x, h = _pad_seed(c, x, h)
    need = x.shape[1] + n_samples
    if h.shape[1] < need:
        h = jnp.pad(h, ((0, 0), (0, need - h.shape[1]), (0, 0)), mode="edge")
    rf = c.receptive_field
    if rng is None:
        rng = jax.random.PRNGKey(0)

    cfg_no_up = dataclasses.replace(c, upsampling_factor=0)

    @jax.jit
    def one_step(window_x, window_h, key):
        logits = wavenet_forward(params, cfg_no_up, window_x, window_h)
        last = logits[0, -1]
        if mode == "argmax":
            return jnp.argmax(last).astype(jnp.int32)
        return jax.random.categorical(key, last).astype(jnp.int32)

    samples = list(np.asarray(jax.device_get(x[0])))
    for i in range(n_samples):
        cur = len(samples)
        window_x = jnp.asarray(samples[-rf:], jnp.int32)[None]
        window_h = lax.dynamic_slice(h, (0, cur - rf, 0), (1, rf, h.shape[2]))
        key = jax.random.fold_in(rng, i)
        s = one_step(window_x, window_h, key)
        samples.append(int(jax.device_get(s)))
    return np.asarray(samples[-n_samples:], np.int32)


class WaveNet:
    """Object wrapper bundling (config, params) with the reference's API
    surface: ``forward``, ``generate``, ``fast_generate``,
    ``batch_fast_generate`` (`wavenet.py:157-549`)."""

    def __init__(self, config: WaveNetConfig | None = None,
                 params: Params | None = None,
                 rng: jax.Array | None = None, **kwargs: Any) -> None:
        if config is None:
            config = WaveNetConfig(**kwargs)
        self.config = config
        if params is None:
            params = init_wavenet_params(
                rng if rng is not None else jax.random.PRNGKey(0), config)
        self.params = params

    @property
    def receptive_field(self) -> int:
        return self.config.receptive_field

    def forward(self, x, h):
        return wavenet_forward(self.params, self.config,
                               jnp.asarray(x, jnp.int32), jnp.asarray(h, jnp.float32))

    __call__ = forward

    def generate(self, x, h, n_samples, intervals=None, mode="sampling",
                 rng=None):
        return generate(self.params, self.config, x, h, n_samples, mode, rng)

    def fast_generate(self, x, h, n_samples, intervals=None, mode="sampling",
                      rng=None):
        return fast_generate(self.params, self.config, x, h, n_samples, mode,
                             rng, intervals=intervals)

    def batch_fast_generate(self, x, h, n_samples_list, intervals=None,
                            mode="sampling", rng=None, mesh=None, impl="auto",
                            quantize=False):
        return batch_fast_generate(self.params, self.config, x, h,
                                   n_samples_list, mode, rng, mesh=mesh,
                                   impl=impl, quantize=quantize,
                                   intervals=intervals)
