#!/usr/bin/env python
"""Local job runner — Python replacement for Kaldi's run.pl.

Same contract as the reference job layer (`wavenet_vocoder/utils/run.pl`):

    run.py [options] <log-file> <command...>
    run.py [options] JOB=1:N <log-file> <command...>

- runs the command with stdout+stderr captured to <log-file>, with a
  header line and an exit-status trailer ("# Ended (code N) at ...")
- JOB=1:N fans out N array jobs (every occurrence of the JOB name in the
  log path and command is substituted), bounded by --max-jobs-run
- accepts and ignores scheduler-shaping flags (--gpu, --mem,
  --num-threads, --config) so `${train_cmd}`/`${cuda_cmd}` lines work
  unchanged; --gpu is exported as WN_NUM_DEVICES for the tools
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import threading
import time


def parse_argv(argv):
    opts = {"gpu": 0, "num_threads": 1, "max_jobs_run": 0, "mem": None,
            "config": None, "time": None}
    i = 0
    while i < len(argv):
        a = argv[i]
        if a in ("--gpu", "--mem", "--num-threads", "--num_threads",
                 "--max-jobs-run", "--max_jobs_run", "--config", "--time"):
            key = a.lstrip("-").replace("-", "_")
            opts[key] = argv[i + 1]
            i += 2
        else:
            break
    rest = argv[i:]

    job = None
    if rest and re.match(r"^\w+=\d+:\d+$", rest[0]):
        name, rng = rest[0].split("=")
        lo, hi = map(int, rng.split(":"))
        job = (name, lo, hi)
        rest = rest[1:]
    if len(rest) < 2:
        sys.stderr.write(
            "usage: run.py [options] [JOB=1:N] <log-file> <command...>\n")
        sys.exit(1)
    return opts, job, rest[0], rest[1:]


def run_one(log_file: str, command: list[str], env: dict) -> int:
    log_dir = os.path.dirname(log_file)
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
    cmd_str = " ".join(command)
    with open(log_file, "w") as log:
        log.write("# " + cmd_str + "\n")
        log.write("# Started at " + time.strftime("%c") + "\n#\n")
        log.flush()
        proc = subprocess.Popen(["bash", "-c", cmd_str], stdout=log,
                                stderr=subprocess.STDOUT, env=env)
        code = proc.wait()
        log.write("#\n# Ended (code %d) at %s, elapsed time\n" % (code, time.strftime("%c")))
    return code


def main() -> None:
    opts, job, log_file, command = parse_argv(sys.argv[1:])
    env = dict(os.environ)
    if int(opts.get("gpu") or 0) > 0:
        env["WN_NUM_DEVICES"] = str(opts["gpu"])

    if job is None:
        sys.exit(run_one(log_file, command, env))

    name, lo, hi = job
    max_run = int(opts.get("max_jobs_run") or 0) or (hi - lo + 1)
    codes = {}
    sem = threading.Semaphore(max_run)

    def worker(idx: int) -> None:
        with sem:
            sub = lambda s: re.sub(r"\b%s\b" % re.escape(name), str(idx), s)
            codes[idx] = run_one(sub(log_file), [sub(c) for c in command], env)

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(lo, hi + 1)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    failed = [i for i, c in codes.items() if c != 0]
    if failed:
        sys.stderr.write("run.py: %d / %d jobs failed (e.g. %s=%d, see %s)\n"
                         % (len(failed), hi - lo + 1, name, failed[0],
                            re.sub(r"\b%s\b" % re.escape(name),
                                   str(failed[0]), log_file)))
        sys.exit(1)


if __name__ == "__main__":
    main()
