"""Shared CLI plumbing: logging configuration and argument echo.

Mirrors the uniform logging setup every reference CLI repeats
(`train.py:396-413`, `decode.py:206-219`, `feature_extract.py:334-351`).
"""

from __future__ import annotations

import argparse
import logging
import os


def enable_compilation_cache() -> None:
    """Persist XLA/Mosaic compilations across CLI invocations.

    The Pallas kernels take minutes to compile against a TPU backend;
    without a persistent cache every CLI process (each recipe stage is
    its own process) pays that again.  Honors JAX_COMPILATION_CACHE_DIR
    when the user sets it (jax reads that env var itself); otherwise
    defaults to ~/.cache/pytorchwavenetvocoder_tpu/xla.  Best-effort:
    an unwritable cache dir only logs a debug line.
    """
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    import jax

    cache = os.path.join(os.path.expanduser("~"), ".cache",
                         "pytorchwavenetvocoder_tpu", "xla")
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as exc:  # cache is an optimization, never fatal
        logging.debug("persistent compilation cache not enabled: %s", exc)


def configure_logging(verbose: int) -> None:
    fmt = "%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s"
    datefmt = "%m/%d/%Y %I:%M:%S"
    if verbose == 1:
        logging.basicConfig(level=logging.INFO, format=fmt, datefmt=datefmt)
    elif verbose > 1:
        logging.basicConfig(level=logging.DEBUG, format=fmt, datefmt=datefmt)
    else:
        logging.basicConfig(level=logging.WARNING, format=fmt, datefmt=datefmt)
        logging.warning("logging is disabled.")


def echo_args(args: argparse.Namespace) -> None:
    for key, value in vars(args).items():
        logging.info("%s = %s", key, str(value))


def strtobool(v: str) -> bool:
    """distutils.util.strtobool equivalent (distutils is removed in 3.12)."""
    v = str(v).lower()
    if v in ("y", "yes", "t", "true", "on", "1"):
        return True
    if v in ("n", "no", "f", "false", "off", "0"):
        return False
    raise ValueError(f"invalid truth value {v!r}")
