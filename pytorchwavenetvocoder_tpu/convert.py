"""Reference (PyTorch) checkpoint -> framework parameter conversion.

Lets users of kan-bayashi/PytorchWaveNetVocoder bring their trained
models over: maps the reference ``WaveNet`` state_dict layout
(`wavenet_vocoder/nets/wavenet.py:157-210` — per-layer ``dil_sigmoid``/
``dil_tanh`` causal convs, ``aux_1x1_*``, ``skip_1x1``/``res_1x1``,
``conv_post_*``, ``upsampling.conv``) onto this framework's fused,
stacked pytree (models/wavenet.py ``init_wavenet_params``).

Conventions bridged:
- torch Conv1d weight (out, in, k) -> channels-last matmul (k, in, out),
  with tap index preserved (torch tap j multiplies x[t-(k-1-j)], which
  is exactly this framework's w[j]);
- the separate sigmoid/tanh branch convs concatenate into the fused 2R
  gate convs ([:R] sigmoid, [R:] tanh);
- per-layer tensors stack along a leading L axis;
- ConvTranspose2d(1,1,(1,uf),(1,uf)) collapses to the (uf,) per-phase
  scalar upsampler.

The CLI (bin/convert_checkpoint.py) converts full reference checkpoint
files; ``test_convert.py`` validates end-to-end forward/generation
parity against the actual reference implementation when it is present.

Feature-pipeline compatibility: conversion is numerically exact for the
NETWORK.  This repo's stages 1-3 implement the published WORLD analyses
(Harvest in dsp/harvest.py, CheapTrick in dsp/cheaptrick.py, D4C in
dsp/d4c.py) with the same shapes/columns, so migrated checkpoints can
run against features extracted here; for strictest reproduction of a
reference model's audio, prefer the reference's own feature h5s and
stats.h5 — independent implementations of the same algorithms are
close but not bit-identical (and noise-shaping restoration here
inverts an exact minimum-phase filter rather than the reference's Pade
MLSA lattice approximation).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from pytorchwavenetvocoder_tpu.models.wavenet import Params, WaveNetConfig


def _to_np(v) -> np.ndarray:
    """Accept torch tensors or arrays without importing torch."""
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def params_from_torch_state_dict(state_dict: dict,
                                 config: WaveNetConfig) -> Params:
    """Convert a reference WaveNet state_dict to this framework's params."""
    sd = {k: _to_np(v) for k, v in state_dict.items()}
    c = config
    L, k = c.n_layers, c.kernel_size
    R, S, Q, A = c.n_resch, c.n_skipch, c.n_quantize, c.n_aux

    def conv_w(name, kk):
        w = sd[name]                       # (out, in, kk)
        return np.transpose(w, (2, 1, 0))  # (kk, in, out)

    causal_w = conv_w("causal.conv.weight", k)
    assert causal_w.shape == (k, Q, R), causal_w.shape

    dil_w = np.empty((L, k, R, 2 * R), np.float32)
    aux_w = np.empty((L, A, 2 * R), np.float32)
    skip_w = np.empty((L, R, S), np.float32)
    res_w = np.empty((L, R, R), np.float32)
    dil_b = np.empty((L, 2 * R), np.float32)
    aux_b = np.empty((L, 2 * R), np.float32)
    skip_b = np.empty((L, S), np.float32)
    res_b = np.empty((L, R), np.float32)
    for l in range(L):
        dil_w[l, :, :, :R] = conv_w(f"dil_sigmoid.{l}.conv.weight", k)
        dil_w[l, :, :, R:] = conv_w(f"dil_tanh.{l}.conv.weight", k)
        dil_b[l, :R] = sd[f"dil_sigmoid.{l}.conv.bias"]
        dil_b[l, R:] = sd[f"dil_tanh.{l}.conv.bias"]
        aux_w[l, :, :R] = conv_w(f"aux_1x1_sigmoid.{l}.weight", 1)[0]
        aux_w[l, :, R:] = conv_w(f"aux_1x1_tanh.{l}.weight", 1)[0]
        aux_b[l, :R] = sd[f"aux_1x1_sigmoid.{l}.bias"]
        aux_b[l, R:] = sd[f"aux_1x1_tanh.{l}.bias"]
        skip_w[l] = conv_w(f"skip_1x1.{l}.weight", 1)[0]
        skip_b[l] = sd[f"skip_1x1.{l}.bias"]
        res_w[l] = conv_w(f"res_1x1.{l}.weight", 1)[0]
        res_b[l] = sd[f"res_1x1.{l}.bias"]

    params: Params = {
        "causal": {"w": jnp.asarray(causal_w, jnp.float32),
                   "b": jnp.asarray(sd["causal.conv.bias"], jnp.float32)},
        "dil": {"w": jnp.asarray(dil_w), "b": jnp.asarray(dil_b)},
        "aux": {"w": jnp.asarray(aux_w), "b": jnp.asarray(aux_b)},
        "skip": {"w": jnp.asarray(skip_w), "b": jnp.asarray(skip_b)},
        "res": {"w": jnp.asarray(res_w), "b": jnp.asarray(res_b)},
        "post1": {"w": jnp.asarray(conv_w("conv_post_1.weight", 1)[0], jnp.float32),
                  "b": jnp.asarray(sd["conv_post_1.bias"], jnp.float32)},
        "post2": {"w": jnp.asarray(conv_w("conv_post_2.weight", 1)[0], jnp.float32),
                  "b": jnp.asarray(sd["conv_post_2.bias"], jnp.float32)},
    }
    if c.upsampling_factor > 0:
        w = sd["upsampling.conv.weight"]        # (1, 1, 1, uf)
        params["upsampling"] = {
            "w": jnp.asarray(w.reshape(-1), jnp.float32),
            "b": jnp.asarray(sd["upsampling.conv.bias"].reshape(()), jnp.float32),
        }
    return params


def config_from_torch_conf(conf) -> WaveNetConfig:
    """Build a WaveNetConfig from a reference model.conf namespace/dict."""
    if not isinstance(conf, dict):
        conf = vars(conf)
    uf = conf.get("upsampling_factor", 80)
    if not conf.get("use_upsampling_layer", True):
        uf = 0
    return WaveNetConfig(
        n_quantize=conf.get("n_quantize", 256),
        n_aux=conf.get("n_aux", 28),
        n_resch=conf.get("n_resch", 512),
        n_skipch=conf.get("n_skipch", 256),
        dilation_depth=conf.get("dilation_depth", 10),
        dilation_repeat=conf.get("dilation_repeat", 3),
        kernel_size=conf.get("kernel_size", 2),
        upsampling_factor=uf,
    )
