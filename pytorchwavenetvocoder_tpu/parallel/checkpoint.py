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
    # Atomic publish: a preemption mid-write must never leave a truncated
    # pickle under the final name, or --resume latest would pick it and
    # crash — the exact failure the resume contract
    # (reference train.py:503-513) exists to survive. Write to a tmp file
    # in the same directory, fsync, then os.replace (atomic on POSIX).
    tmp = path + ".tmp"
    if final and os.path.exists(path + ".iter"):
        # drop the stale sidecar first so a crash between the two renames
        # can't pair an old iteration count with the new payload
        os.remove(path + ".iter")
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    if final:
        # sidecar lets --resume latest compare iteration counts without
        # unpickling the full (hundreds of MB) payload
        iter_tmp = path + ".iter.tmp"
        with open(iter_tmp, "w") as f:
            f.write(str(int(iterations)))
        os.replace(iter_tmp, path + ".iter")
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


def _is_loadable(path: str) -> bool:
    """True iff ``path`` unpickles cleanly. Writes are atomic
    (`save_checkpoint` tmp+os.replace), so this only trips on
    checkpoints written by older versions or damaged storage."""
    try:
        load_checkpoint(path)
        return True
    except Exception:
        logging.warning("skipping unreadable checkpoint %s", path)
        return False


def find_latest_checkpoint(checkpoint_dir: str) -> str | None:
    """Return the newest *loadable* checkpoint path, if any.

    ``checkpoint-final.pkl`` counts as newest when its stored iteration
    is >= every numbered checkpoint — a completed short run relaunched
    by a preemption-recovery loop must not restart from scratch.
    Truncated or otherwise unpicklable files (numbered or final) are
    skipped so ``--resume latest`` always lands on the newest *good*
    checkpoint rather than crashing in ``restore_train_state``.
    """
    numbered = []
    for p in glob.glob(os.path.join(checkpoint_dir, "checkpoint-*.pkl")):
        m = re.search(r"checkpoint-(\d+)\.pkl$", p)
        if m:
            numbered.append((int(m.group(1)), p))
    numbered.sort(reverse=True)
    best, best_it = None, -1
    for it, p in numbered:  # newest first; probe until one loads
        if _is_loadable(p):
            best, best_it = p, it
            break
    final = os.path.join(checkpoint_dir, "checkpoint-final.pkl")
    if os.path.exists(final):
        try:
            if os.path.exists(final + ".iter"):  # cheap sidecar
                with open(final + ".iter") as f:
                    final_it = int(f.read().strip())
            else:  # older checkpoints: fall back to unpickling
                final_it = int(load_checkpoint(final)["iterations"])
            if final_it >= best_it and _is_loadable(final):
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
