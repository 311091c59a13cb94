#!/usr/bin/env python
"""Convert checkpoints between this framework and the reference.

``--direction to_jax`` (default): takes the reference's
``checkpoint-*.pkl`` + pickled ``model.conf`` (`train.py:315-332,429`)
and writes this framework's pickle checkpoint + JSON model.conf, ready
for ``decode.py`` or ``train.py --resume``.  Adam moments carry over
(every layout transform is a pure permutation, so the moments map
exactly like their weights), giving optimizer continuity on resume.

``--direction to_torch``: the reverse — takes this framework's
checkpoint + JSON model.conf and writes a reference-layout
``torch.save`` checkpoint ({model, optimizer, iterations}, Adam moments
included) plus the pickled argparse-Namespace model.conf the
reference's ``decode.py:249`` loads, so models trained here can be
validated, served, or resumed by the reference implementation.
"""

from __future__ import annotations

import argparse
import logging
import os
import pickle

from pytorchwavenetvocoder_tpu.bin.common import configure_logging, echo_args


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Convert a PytorchWaveNetVocoder checkpoint")
    parser.add_argument("--checkpoint", required=True,
                        help="to_jax: reference checkpoint-*.pkl "
                        "(torch.save format); to_torch: this framework's "
                        "checkpoint-*.pkl")
    parser.add_argument("--config", required=True,
                        help="to_jax: reference model.conf (pickled "
                        "argparse Namespace); to_torch: this framework's "
                        "model.conf (JSON)")
    parser.add_argument("--outdir", required=True,
                        help="directory for the converted bundle")
    parser.add_argument("--direction", default="to_jax",
                        choices=["to_jax", "to_torch"],
                        help="conversion direction (see module docstring)")
    parser.add_argument("--verbose", default=1, type=int)
    return parser


def _to_jax(args) -> None:
    import torch

    import jax
    import numpy as np

    from pytorchwavenetvocoder_tpu.convert import (
        config_from_torch_conf,
        params_from_torch_state_dict,
        torch_param_key_order,
    )
    from pytorchwavenetvocoder_tpu.parallel.checkpoint import save_model_conf

    conf = torch.load(args.config, map_location="cpu", weights_only=False)
    config = config_from_torch_conf(conf)
    logging.info("model config: %s", config)

    ckpt = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
    state_dict = ckpt["model"] if "model" in ckpt else ckpt
    params = params_from_torch_state_dict(state_dict, config)
    iterations = int(ckpt.get("iterations", 0)) if isinstance(ckpt, dict) else 0

    # carry the reference's Adam moments over so train.py --resume
    # continues the optimizer instead of restarting it (reference saves
    # {model, optimizer, iterations}, train.py:324-327; torch Adam state
    # indexes model.parameters() order == torch_param_key_order)
    optimizer = None
    ref_opt = ckpt.get("optimizer") if isinstance(ckpt, dict) else None
    if isinstance(ref_opt, dict) and ref_opt.get("state"):
        order = torch_param_key_order(config)
        idx_to_key, pos = {}, 0
        for group in ref_opt.get("param_groups", []):
            for pid in group["params"]:
                idx_to_key[pid] = order[pos]
                pos += 1
        st = ref_opt["state"]
        if pos == len(order) and set(st) <= set(idx_to_key):
            def np_(v):
                return np.asarray(v.detach().cpu() if hasattr(v, "detach")
                                  else v)

            mu_sd = {idx_to_key[i]: np_(s["exp_avg"]) for i, s in st.items()}
            nu_sd = {idx_to_key[i]: np_(s["exp_avg_sq"])
                     for i, s in st.items()}
            if set(mu_sd) == set(order):
                count = int(float(np_(next(iter(st.values()))["step"])))
                to_np = lambda tree: jax.tree.map(np.asarray, tree)
                optimizer = {"adam_moments": {
                    "count": count,
                    "mu": to_np(params_from_torch_state_dict(mu_sd, config)),
                    "nu": to_np(params_from_torch_state_dict(nu_sd, config)),
                }}
                logging.info("converted Adam moments (count=%d).", count)
        if optimizer is None:
            logging.warning("reference optimizer state incomplete; "
                            "resume here will restart Adam moments.")

    os.makedirs(args.outdir, exist_ok=True)
    payload = {
        "model": jax.tree.map(lambda x: np.asarray(x), params),
        "optimizer": optimizer,
        "iterations": iterations,
    }
    name = os.path.basename(args.checkpoint)
    if not name.startswith("checkpoint-"):
        name = "checkpoint-converted.pkl"
    out_path = os.path.join(args.outdir, name)
    with open(out_path, "wb") as f:
        pickle.dump(payload, f)
    # reference args take precedence so upsampling_factor stays the frame
    # factor even when the learned upsampler is disabled (cf. bin/train.py)
    conf_dict = conf if isinstance(conf, dict) else vars(conf)
    save_model_conf(args.outdir, dict(config.to_dict(), **conf_dict))
    logging.info("wrote %s (+ model.conf)", out_path)


def _to_torch(args) -> None:
    import torch

    from pytorchwavenetvocoder_tpu.convert import (
        config_from_json_conf,
        torch_adam_moments_from_opt_state,
        torch_conf_dict_from_config,
        torch_param_key_order,
        torch_state_dict_from_params,
    )
    from pytorchwavenetvocoder_tpu.parallel.checkpoint import load_model_conf

    conf = load_model_conf(args.config)
    config = config_from_json_conf(conf)
    logging.info("model config: %s", config)

    with open(args.checkpoint, "rb") as f:
        payload = pickle.load(f)
    params = payload["model"] if "model" in payload else payload
    iterations = (int(payload.get("iterations", 0))
                  if isinstance(payload, dict) else 0)

    sd_np = torch_state_dict_from_params(params, config)
    state_dict = {k: torch.from_numpy(v.copy()) for k, v in sd_np.items()}

    # the reference's train.py --resume reads checkpoint["optimizer"]
    # unconditionally (train.py:505-511), so always write one.  A dummy
    # torch Adam provides a version-correct skeleton (fully-keyed
    # param_groups, indices in model.parameters() order); when our
    # checkpoint carries Adam moments they are mapped in, giving true
    # optimizer continuity — otherwise the state is fresh.
    order = torch_param_key_order(config)
    assert set(sd_np) == set(order), sorted(set(sd_np) ^ set(order))
    dummies = [torch.nn.Parameter(torch.zeros(1)) for _ in order]
    opt = torch.optim.Adam(dummies, lr=float(conf.get("lr", 1e-4)),
                           weight_decay=float(conf.get("weight_decay", 0.0)))
    opt_sd = opt.state_dict()
    moments = torch_adam_moments_from_opt_state(
        payload.get("optimizer") if isinstance(payload, dict) else None,
        config)
    if moments is not None:
        count, per_param = moments
        opt_sd["state"] = {
            i: {"step": torch.tensor(float(count)),
                "exp_avg": torch.from_numpy(mu.copy()),
                "exp_avg_sq": torch.from_numpy(nu.copy())}
            for i, (mu, nu) in per_param.items()}
        logging.info("exported Adam moments (count=%d).", count)
    else:
        logging.warning("checkpoint has no Adam moments; the exported "
                        "optimizer state is fresh (resume restarts Adam).")

    # the trained frame factor survives in our JSON conf even when the
    # learned upsampler is off (config.upsampling_factor == 0)
    uf_pipeline = int(conf.get("upsampling_factor", 0) or 0)
    if config.upsampling_factor == 0 and uf_pipeline <= 0:
        raise SystemExit(
            "model.conf lacks the pipeline frame factor (upsampling_factor"
            " is 0/absent while use_upsampling_layer is false); the "
            "reference decode needs it for sample counts — add the true "
            "shift-derived factor to the JSON conf")

    conf_out = torch_conf_dict_from_config(
        config,
        feature_type=conf.get("feature_type", "world"),
        upsampling_factor_no_layer=uf_pipeline)

    os.makedirs(args.outdir, exist_ok=True)
    name = os.path.basename(args.checkpoint)
    if not name.startswith("checkpoint-"):
        name = "checkpoint-converted.pkl"
    out_path = os.path.join(args.outdir, name)
    torch.save({"model": state_dict, "optimizer": opt_sd,
                "iterations": iterations}, out_path)
    torch.save(argparse.Namespace(**conf_out),
               os.path.join(args.outdir, "model.conf"))
    logging.info("wrote %s (+ model.conf)", out_path)


def main(argv=None) -> None:
    args = get_parser().parse_args(argv)
    configure_logging(args.verbose)
    echo_args(args)
    if args.direction == "to_jax":
        _to_jax(args)
    else:
        _to_torch(args)


if __name__ == "__main__":
    main()
