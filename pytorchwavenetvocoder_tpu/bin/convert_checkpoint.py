#!/usr/bin/env python
"""Convert a reference PyTorch checkpoint bundle to this framework.

Takes the reference's ``checkpoint-*.pkl`` + pickled ``model.conf``
(`train.py:315-332,429`) and writes this framework's pickle checkpoint +
JSON model.conf, ready for ``decode.py`` or ``train.py --resume``
(optimizer state is not converted — resumed training restarts Adam
moments).
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
                        help="reference checkpoint-*.pkl (torch.save format)")
    parser.add_argument("--config", required=True,
                        help="reference model.conf (pickled argparse Namespace)")
    parser.add_argument("--outdir", required=True,
                        help="directory for the converted bundle")
    parser.add_argument("--verbose", default=1, type=int)
    return parser


def main(argv=None) -> None:
    args = get_parser().parse_args(argv)
    configure_logging(args.verbose)
    echo_args(args)

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


if __name__ == "__main__":
    main()
