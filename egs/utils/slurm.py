#!/usr/bin/env python
"""Slurm job runner — Python replacement for Kaldi's slurm.pl.

Same CLI contract as run.py (and the reference
`wavenet_vocoder/utils/slurm.pl`): wraps the command in ``srun`` with
resource flags mapped from --gpu/--mem/--num-threads (optionally
overridden by a --config file of "option flag" template lines, like
conf/slurm.conf).  Falls back to local execution when slurm is absent so
recipes stay runnable anywhere.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from run import parse_argv, run_one  # noqa: E402


def build_srun_prefix(opts) -> list[str]:
    prefix = ["srun", "--quiet"]
    gpu = int(opts.get("gpu") or 0)
    if gpu > 0:
        prefix += ["--gres=gpu:%d" % gpu]
    threads = int(opts.get("num_threads") or 1)
    if threads > 1:
        prefix += ["--cpus-per-task=%d" % threads]
    if opts.get("mem"):
        prefix += ["--mem=%s" % opts["mem"]]
    return prefix


def main() -> None:
    opts, job, log_file, command = parse_argv(sys.argv[1:])
    env = dict(os.environ)
    if int(opts.get("gpu") or 0) > 0:
        env["WN_NUM_DEVICES"] = str(opts["gpu"])

    if shutil.which("srun") is None:
        sys.stderr.write("slurm.py: srun not found; running locally.\n")
        sys.exit(run_one(log_file, command, env))

    prefix = build_srun_prefix(opts)
    if job is None:
        sys.exit(run_one(log_file, prefix + command, env))

    import re
    import threading

    name, lo, hi = job
    codes = {}

    def worker(idx: int) -> None:
        sub = lambda s: re.sub(r"\b%s\b" % re.escape(name), str(idx), s)
        codes[idx] = run_one(sub(log_file), prefix + [sub(c) for c in command], env)

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(lo, hi + 1)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    sys.exit(1 if any(c != 0 for c in codes.values()) else 0)


if __name__ == "__main__":
    main()
