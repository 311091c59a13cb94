"""Checkpoint conversion between the reference (PyTorch) and this framework.

Lets users of kan-bayashi/PytorchWaveNetVocoder bring their trained
models over — and take models trained here back to the reference
(``torch_state_dict_from_params``) for validation or serving
continuity: maps the reference ``WaveNet`` state_dict layout
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


def torch_state_dict_from_params(params: Params,
                                 config: WaveNetConfig) -> dict:
    """Inverse of ``params_from_torch_state_dict``: this framework's
    pytree -> the reference WaveNet state_dict layout, as numpy arrays
    (the caller tensorizes; torch is not imported here).

    Exact inverse of the forward mapping — round-tripping either way is
    bit-identical — so models trained here can be loaded by the
    reference implementation (`wavenet_vocoder/nets/wavenet.py:157-210`)
    for validation or serving continuity.
    """
    p = {k: {kk: np.asarray(vv, np.float32) for kk, vv in v.items()}
         for k, v in params.items()}
    c = config
    L, k = c.n_layers, c.kernel_size
    R = c.n_resch

    def t_conv(w):                         # (kk, in, out) -> (out, in, kk)
        return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))

    def t_1x1(w):                          # (in, out) -> (out, in, 1)
        return np.ascontiguousarray(np.transpose(w)[:, :, None])

    sd = {
        "causal.conv.weight": t_conv(p["causal"]["w"]),
        "causal.conv.bias": p["causal"]["b"],
        "conv_post_1.weight": t_1x1(p["post1"]["w"]),
        "conv_post_1.bias": p["post1"]["b"],
        "conv_post_2.weight": t_1x1(p["post2"]["w"]),
        "conv_post_2.bias": p["post2"]["b"],
    }
    for l in range(L):
        dw, db = p["dil"]["w"][l], p["dil"]["b"][l]
        aw, ab = p["aux"]["w"][l], p["aux"]["b"][l]
        sd[f"dil_sigmoid.{l}.conv.weight"] = t_conv(dw[:, :, :R])
        sd[f"dil_sigmoid.{l}.conv.bias"] = db[:R]
        sd[f"dil_tanh.{l}.conv.weight"] = t_conv(dw[:, :, R:])
        sd[f"dil_tanh.{l}.conv.bias"] = db[R:]
        sd[f"aux_1x1_sigmoid.{l}.weight"] = t_1x1(aw[:, :R])
        sd[f"aux_1x1_sigmoid.{l}.bias"] = ab[:R]
        sd[f"aux_1x1_tanh.{l}.weight"] = t_1x1(aw[:, R:])
        sd[f"aux_1x1_tanh.{l}.bias"] = ab[R:]
        sd[f"skip_1x1.{l}.weight"] = t_1x1(p["skip"]["w"][l])
        sd[f"skip_1x1.{l}.bias"] = p["skip"]["b"][l]
        sd[f"res_1x1.{l}.weight"] = t_1x1(p["res"]["w"][l])
        sd[f"res_1x1.{l}.bias"] = p["res"]["b"][l]
    if c.upsampling_factor > 0:
        sd["upsampling.conv.weight"] = (
            p["upsampling"]["w"].reshape(1, 1, 1, -1))
        sd["upsampling.conv.bias"] = p["upsampling"]["b"].reshape(1)
    return sd


def torch_conf_dict_from_config(config: WaveNetConfig,
                                feature_type: str = "world",
                                upsampling_factor_no_layer: int = 80) -> dict:
    """The model.conf fields the reference's decode path reads
    (`wavenet_vocoder/bin/decode.py:266-309`), from a WaveNetConfig.

    This framework encodes "no upsampling layer" as
    ``upsampling_factor == 0`` while the reference keeps the true frame
    factor alongside ``use_upsampling_layer=False`` (its decode still
    needs it for sample counts); ``upsampling_factor_no_layer`` supplies
    that value for such models.
    """
    c = config
    return {
        "n_quantize": c.n_quantize,
        "n_aux": c.n_aux,
        "n_resch": c.n_resch,
        "n_skipch": c.n_skipch,
        "dilation_depth": c.dilation_depth,
        "dilation_repeat": c.dilation_repeat,
        "kernel_size": c.kernel_size,
        "upsampling_factor": (c.upsampling_factor if c.upsampling_factor > 0
                              else upsampling_factor_no_layer),
        "use_upsampling_layer": c.upsampling_factor > 0,
        "use_speaker_code": False,
        "feature_type": feature_type,
    }


def config_from_json_conf(conf: dict) -> WaveNetConfig:
    """Build a WaveNetConfig from this framework's JSON model.conf.

    The JSON keeps the pipeline's frame factor in ``upsampling_factor``
    with ``use_upsampling_layer`` holding the on/off switch; the config
    encodes "off" as factor 0.  Shared by decode and the exporter so the
    encoding rule cannot drift between them.
    """
    import dataclasses

    config = WaveNetConfig.from_dict(conf)
    if not conf.get("use_upsampling_layer", True):
        config = dataclasses.replace(config, upsampling_factor=0)
    return config


def torch_param_key_order(config: WaveNetConfig) -> list:
    """state_dict key order of the reference WaveNet.

    This equals the reference's ``model.parameters()`` order (module
    registration order, `wavenet_vocoder/nets/wavenet.py:188-211`; Conv
    modules contribute weight then bias, and the model has no buffers),
    which is the index space torch optimizer state_dicts use.
    ``test_convert.py`` asserts this against the live reference model.
    """
    c = config
    L = c.n_layers
    keys = ["causal.conv.weight", "causal.conv.bias"]
    if c.upsampling_factor > 0:
        keys += ["upsampling.conv.weight", "upsampling.conv.bias"]
    for mod in ("dil_sigmoid", "dil_tanh"):
        for l in range(L):
            keys += [f"{mod}.{l}.conv.weight", f"{mod}.{l}.conv.bias"]
    for mod in ("aux_1x1_sigmoid", "aux_1x1_tanh", "skip_1x1", "res_1x1"):
        for l in range(L):
            keys += [f"{mod}.{l}.weight", f"{mod}.{l}.bias"]
    keys += ["conv_post_1.weight", "conv_post_1.bias",
             "conv_post_2.weight", "conv_post_2.bias"]
    return keys


def find_adam_state(opt_state):
    """Locate the optax ScaleByAdamState (count, mu, nu) in a (possibly
    chained/pickled) optimizer-state tree; None if absent."""
    if (hasattr(opt_state, "mu") and hasattr(opt_state, "nu")
            and hasattr(opt_state, "count")):
        return opt_state
    if isinstance(opt_state, (tuple, list)):
        for element in opt_state:
            found = find_adam_state(element)
            if found is not None:
                return found
    return None


def torch_adam_moments_from_opt_state(opt_state, config: WaveNetConfig):
    """Map this framework's Adam moments onto the reference's parameter
    index space: ``(count, {index: (exp_avg, exp_avg_sq)})`` as numpy, or
    None when the state carries no Adam moments.

    The moment trees are params-shaped, and every layout transform in
    ``torch_state_dict_from_params`` is a pure permutation/split (no
    linear mixing), so first and second moments transform exactly like
    the weights they belong to.  Indices follow
    :func:`torch_param_key_order` — the order torch's ``Adam`` assigns
    when constructed over ``model.parameters()``.
    """
    adam = find_adam_state(opt_state)
    if adam is None:
        return None
    mu_sd = torch_state_dict_from_params(adam.mu, config)
    nu_sd = torch_state_dict_from_params(adam.nu, config)
    order = torch_param_key_order(config)
    assert set(order) == set(mu_sd), (
        sorted(set(order) ^ set(mu_sd)))
    count = int(np.asarray(adam.count))
    return count, {i: (mu_sd[k], nu_sd[k]) for i, k in enumerate(order)}


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
