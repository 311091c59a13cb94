#!/usr/bin/env python
"""Convert checkpoints between this framework and the reference.

``--direction to_jax`` (default): takes the reference's
``checkpoint-*.pkl`` + pickled ``model.conf`` (`train.py:315-332,429`)
and writes this framework's pickle checkpoint + JSON model.conf, ready
for ``decode.py`` or ``train.py --resume`` (optimizer state is not
converted — resumed training restarts Adam moments).

``--direction to_torch``: the reverse — takes this framework's
checkpoint + JSON model.conf and writes a reference-layout
``torch.save`` checkpoint plus the pickled argparse-Namespace
model.conf the reference's ``decode.py:249`` loads, so models trained
here can be validated or served by the reference implementation.
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
    )
    from pytorchwavenetvocoder_tpu.parallel.checkpoint import save_model_conf

    conf = torch.load(args.config, map_location="cpu", weights_only=False)
    config = config_from_torch_conf(conf)
    logging.info("model config: %s", config)

    ckpt = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
    state_dict = ckpt["model"] if "model" in ckpt else ckpt
    params = params_from_torch_state_dict(state_dict, config)
    iterations = int(ckpt.get("iterations", 0)) if isinstance(ckpt, dict) else 0

    os.makedirs(args.outdir, exist_ok=True)
    payload = {
        "model": jax.tree.map(lambda x: np.asarray(x), params),
        "optimizer": None,
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
        torch_conf_dict_from_config,
        torch_state_dict_from_params,
    )
    from pytorchwavenetvocoder_tpu.models.wavenet import WaveNetConfig
    from pytorchwavenetvocoder_tpu.parallel.checkpoint import load_model_conf

    import dataclasses

    conf = load_model_conf(args.config)
    config = WaveNetConfig.from_dict(conf)
    # same reconstruction as decode.py: the JSON keeps the pipeline's
    # frame factor in upsampling_factor with use_upsampling_layer
    # holding the on/off; config encodes "off" as factor 0
    if not conf.get("use_upsampling_layer", True):
        config = dataclasses.replace(config, upsampling_factor=0)
    logging.info("model config: %s", config)

    with open(args.checkpoint, "rb") as f:
        payload = pickle.load(f)
    params = payload["model"] if "model" in payload else payload
    iterations = (int(payload.get("iterations", 0))
                  if isinstance(payload, dict) else 0)

    sd_np = torch_state_dict_from_params(params, config)
    state_dict = {k: torch.from_numpy(v.copy()) for k, v in sd_np.items()}

    # the trained frame factor survives in our JSON conf even when the
    # learned upsampler is off (config.upsampling_factor == 0)
    conf_out = torch_conf_dict_from_config(
        config,
        feature_type=conf.get("feature_type", "world"),
        upsampling_factor_no_layer=int(conf.get("upsampling_factor", 80)
                                       or 80))

    os.makedirs(args.outdir, exist_ok=True)
    name = os.path.basename(args.checkpoint)
    if not name.startswith("checkpoint-"):
        name = "checkpoint-converted.pkl"
    out_path = os.path.join(args.outdir, name)
    torch.save({"model": state_dict, "iterations": iterations}, out_path)
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
