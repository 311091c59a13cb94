"""Checkpoint / resume and model-config serialization.

Keeps the reference's 3-file portable-model contract
(``checkpoint-<iter>.pkl`` + ``model.conf`` + ``stats.h5``,
`train.py:315-332,429`, `egs/README.md:113-121`) with two changes:

- the checkpoint payload is a pickle of **numpy-ified pytrees**
  ({"model": params, "optimizer": opt_state, "iterations": step}), not
  torch state_dicts;
- ``model.conf`` is JSON (a dict of hyperparameters), not a pickled
  argparse Namespace — portable and inspectable.
"""

from __future__ import annotations

import glob
import json
import logging
import os
import pickle
import re
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(checkpoint_dir: str, state, iterations: int | None = None,
                    final: bool = False) -> str:
    """Write ``checkpoint-<iter>.pkl`` (or ``checkpoint-final.pkl``)."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    if iterations is None:
        iterations = int(state.step)
    payload = {
        "model": _to_numpy(state.params),
        "optimizer": _to_numpy(state.opt_state),
        "iterations": int(iterations),
    }
    name = "checkpoint-final.pkl" if final else f"checkpoint-{iterations}.pkl"
    path = os.path.join(checkpoint_dir, name)
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    if final:
        # sidecar lets --resume latest compare iteration counts without
        # unpickling the full (hundreds of MB) payload
        with open(path + ".iter", "w") as f:
            f.write(str(int(iterations)))
    logging.info("%d-iter checkpoint created.", iterations)
    return path


def load_checkpoint(path: str) -> dict:
    """Load a checkpoint payload dict."""
    with open(path, "rb") as f:
        return pickle.load(f)


def _graft_adam_moments(opt_state, count, mu, nu):
    """Replace the (count, mu, nu) of the ScaleByAdamState found inside
    an optax state tree (chains are plain tuples of namedtuples)."""
    if (hasattr(opt_state, "mu") and hasattr(opt_state, "nu")
            and hasattr(opt_state, "count")):
        def cast(ref_tree, val_tree):
            return jax.tree.map(
                lambda ref, v: jnp.asarray(np.asarray(v), ref.dtype),
                ref_tree, val_tree)

        return opt_state._replace(
            count=jnp.asarray(count, np.asarray(opt_state.count).dtype),
            mu=cast(opt_state.mu, mu),
            nu=cast(opt_state.nu, nu))
    if isinstance(opt_state, tuple):
        rebuilt = tuple(_graft_adam_moments(s, count, mu, nu)
                        for s in opt_state)
        return (type(opt_state)(*rebuilt) if hasattr(opt_state, "_fields")
                else rebuilt)
    return opt_state


def restore_train_state(path: str, state):
    """Restore params/opt_state/step from ``path`` into ``state``
    (same pytree structure required).

    ``payload["optimizer"]`` may be a full optax state tree (this
    framework's own checkpoints), ``None`` (fresh optimizer), or an
    ``{"adam_moments": {count, mu, nu}}`` dict written by
    ``convert_checkpoint --direction to_jax`` from a reference torch
    checkpoint — the moments are grafted onto whatever optax chain the
    current run uses, so converted models RESUME with optimizer
    continuity instead of restarting Adam.
    """
    payload = load_checkpoint(path)
    state.params = jax.tree.map(lambda _, v: v, state.params, payload["model"])
    opt = payload.get("optimizer")
    if isinstance(opt, dict) and "adam_moments" in opt:
        m = opt["adam_moments"]
        state.opt_state = _graft_adam_moments(
            state.opt_state, m["count"], m["mu"], m["nu"])
        logging.info("grafted converted Adam moments (count=%d).",
                     int(m["count"]))
    elif opt is not None:
        state.opt_state = jax.tree.map(lambda _, v: v, state.opt_state, opt)
    state.step = payload["iterations"]
    return state


def find_latest_checkpoint(checkpoint_dir: str) -> str | None:
    """Return the newest checkpoint path, if any.

    ``checkpoint-final.pkl`` counts as newest when its stored iteration
    is >= every numbered checkpoint — a completed short run relaunched
    by a preemption-recovery loop must not restart from scratch.
    """
    paths = glob.glob(os.path.join(checkpoint_dir, "checkpoint-*.pkl"))
    best, best_it = None, -1
    for p in paths:
        m = re.search(r"checkpoint-(\d+)\.pkl$", p)
        if m and int(m.group(1)) > best_it:
            best, best_it = p, int(m.group(1))
    final = os.path.join(checkpoint_dir, "checkpoint-final.pkl")
    if os.path.exists(final):
        try:
            if os.path.exists(final + ".iter"):  # cheap sidecar
                with open(final + ".iter") as f:
                    final_it = int(f.read().strip())
            else:  # older checkpoints: fall back to unpickling
                final_it = int(load_checkpoint(final)["iterations"])
            if final_it >= best_it:
                return final
        except Exception:
            pass  # unreadable final checkpoint: fall back to numbered ones
    return best


def save_model_conf(expdir: str, conf: dict[str, Any]) -> str:
    """Write model.conf (JSON) next to the checkpoints."""
    os.makedirs(expdir, exist_ok=True)
    path = os.path.join(expdir, "model.conf")
    with open(path, "w") as f:
        json.dump(conf, f, indent=2, sort_keys=True, default=str)
    return path


def load_model_conf(path: str) -> dict[str, Any]:
    if os.path.isdir(path):
        path = os.path.join(path, "model.conf")
    with open(path) as f:
        return json.load(f)
