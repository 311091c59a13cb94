#!/usr/bin/env python
"""Slurm job runner — Python replacement for Kaldi's slurm.pl.

Same CLI contract as run.py and the reference
`wavenet_vocoder/utils/slurm.pl:21-50`: scheduler options are translated
through a config file of template lines (default ``conf/slurm.conf``,
overridable with ``--config``):

    command sbatch --export=PATH --ntasks-per-node=1
    option mem=* --mem-per-cpu $0
    option mem=0
    option gpu=* -p hpc --gres=gpu:$0
    default gpu=0

- ``command`` gives the submission command line;
- ``option <key>=* <template>`` maps ``--<key> <val>`` to the template
  with ``$0`` replaced by the value;
- ``option <key>=<val> <template>`` overrides for an exact value (an
  empty template means "add nothing");
- ``default <key>=<val>`` applies when the option wasn't passed.

Jobs are submitted with ``sbatch --wait`` (array jobs via ``--array``,
with the JOB name mapped to ``%a``/``$SLURM_ARRAY_TASK_ID``).  When
sbatch is absent, falls back to srun, then to local execution, so
recipes stay runnable anywhere.
"""

from __future__ import annotations

import os
import re
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from run import parse_argv, run_one  # noqa: E402

DEFAULT_CONF = """
command sbatch --export=PATH --ntasks-per-node=1
option time=* --time $0
option mem=* --mem-per-cpu $0
option mem=0
option num_threads=* --cpus-per-task $0 --ntasks-per-node=1
option num_threads=1 --cpus-per-task 1 --ntasks-per-node=1
default gpu=0
option gpu=0
option gpu=* --gres=gpu:$0 --time 10-00:00:00
"""


def parse_conf(path: str | None, explicit: bool = False):
    """Parse a slurm.conf into (command, {key: {value-or-'*': template}},
    {key: default}).

    An EXPLICITLY passed path that does not exist is an error (matching
    slurm.pl, which dies on an unreadable --config) — silently falling
    back to the built-in defaults would submit with the wrong partition/
    resource flags.  The implicit default path falls back quietly.
    """
    if path and os.path.isfile(path):
        with open(path) as f:
            text = f.read()
    else:
        if explicit:
            sys.stderr.write(f"slurm.py: config file not found: {path}\n")
            sys.exit(1)
        text = DEFAULT_CONF
    command = "sbatch --export=PATH"
    options: dict[str, dict[str, str]] = {}
    defaults: dict[str, str] = {}
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line:
            continue
        head, _, rest = line.partition(" ")
        rest = rest.strip()
        if head == "command":
            command = rest
        elif head == "option":
            kv, _, template = rest.partition(" ")
            key, _, val = kv.partition("=")
            options.setdefault(key, {})[val] = template.strip()
        elif head == "default":
            key, _, val = rest.partition("=")
            defaults[key] = val
    return command, options, defaults


def translate_options(opts: dict, conf_options: dict, defaults: dict) -> list[str]:
    """Map CLI options to scheduler flags via the conf templates
    (the logic of slurm.pl's cli_options loop).

    Two safety properties beyond straight template substitution:

    - an explicitly passed option that no config line matches is an
      ERROR (slurm.pl dies with "none of the config lines matched";
      silently dropping e.g. --mem would submit without a memory limit).
      Caveat: a value equal to the runner default (``--gpu 0`` /
      ``--num-threads 1``) cannot be distinguished from "not passed"
      after parse_argv, so those specific values never trigger the
      error;
    - a template may embed defaults for OTHER flags (the stock conf's
      ``option gpu=* ... --time 10-00:00:00``); since sbatch takes the
      LAST occurrence of a repeated flag, such embedded flags are
      dropped when the user passed that option explicitly — otherwise
      the template default would silently override the user's value.
    """
    cli = {}
    explicit: set = set()
    # parse_argv fills these even when the user typed nothing; only a
    # differing value is "explicit" (unmatched-option death applies to it)
    runner_defaults = {"gpu": "0", "num_threads": "1"}
    for key in ("time", "mem", "num_threads", "gpu"):
        v = opts.get(key)
        if v not in (None, "") and not (key == "gpu" and str(v) == "0"
                                        and "gpu" not in conf_options):
            cli[key] = str(v)
            if str(v) != runner_defaults.get(key):
                explicit.add(key)
    for key, val in defaults.items():
        cli.setdefault(key, str(val))

    def expand(key):
        templates = conf_options.get(key)
        if not templates:
            return None
        if cli[key] in templates:
            return templates[cli[key]]
        if "*" in templates:
            return templates["*"].replace("$0", cli[key])
        return None

    # which explicit option "owns" each scheduler flag: an option's FIRST
    # flag token is its primary flag (e.g. time -> --time) and wins over
    # another template's embedded default for the same flag
    flag_owner: dict[str, str] = {}
    for pass_primary in (True, False):
        for key in sorted(explicit):
            flags = [t.split("=", 1)[0] for t in (expand(key) or "").split()
                     if t.startswith("-")]
            for f in (flags[:1] if pass_primary else flags[1:]):
                flag_owner.setdefault(f, key)

    out: list[str] = []
    for key, val in cli.items():
        template = expand(key)
        if template is None:
            if key in explicit:
                sys.stderr.write(
                    f"slurm.py: none of the config lines matched option "
                    f"--{key} {val} (add an 'option {key}=*' line to the "
                    f"config)\n")
                sys.exit(1)
            continue  # defaulted option unknown to the conf: add nothing
        keep, skip_group = [], False
        for tok in template.split():
            if tok.startswith("-"):
                owner = flag_owner.get(tok.split("=", 1)[0])
                skip_group = owner is not None and owner != key
            if not skip_group:
                keep.append(tok)
        out += keep
    return out


def submit_sbatch(command: str, sched_flags: list[str], job, log_file: str,
                  cmd: list[str], max_jobs_run: int = 0,
                  extra_env: dict | None = None) -> int:
    """Submit through sbatch --wait; returns the exit code.

    ``max_jobs_run`` becomes the slurm array throttle (``--array lo-hi%N``,
    slurm.pl's mapping); ``extra_env`` is exported inside the batch
    script (sbatch --export=PATH strips the submitter's environment).
    """
    base = command.split()
    cmd_str = " ".join(cmd)
    name, lo, hi = job if job else ("JOB", 1, 1)

    log_dir = os.path.dirname(log_file) or "."
    os.makedirs(log_dir, exist_ok=True)
    # the batch script re-maps JOB to the slurm array index
    sub_log = re.sub(r"\b%s\b" % re.escape(name), "$SLURM_ARRAY_TASK_ID",
                     log_file) if job else log_file
    sub_cmd = re.sub(r"\b%s\b" % re.escape(name), "$SLURM_ARRAY_TASK_ID",
                     cmd_str) if job else cmd_str
    env_lines = [f"export {k}={v}" for k, v in (extra_env or {}).items()]
    script = "\n".join([
        "#!/usr/bin/env bash",
        "# Auto-generated by slurm.py",
        *env_lines,
        'echo "# ' + sub_cmd.replace('"', '\\"') + '" > ' + sub_log,
        'echo "# Started at $(date)" >> ' + sub_log,
        "( " + sub_cmd + " ) >> " + sub_log + " 2>&1",
        "code=$?",
        'echo "#" >> ' + sub_log,
        'echo "# Ended (code $code) at $(date)" >> ' + sub_log,
        "exit $code",
        "",
    ])
    fd, spath = tempfile.mkstemp(prefix="slurm_py_", suffix=".sh",
                                 dir=log_dir)
    try:
        with os.fdopen(fd, "w") as f:
            f.write(script)
        argv = base + sched_flags + ["--wait",
                                     "-o", os.path.join(log_dir, "sbatch.%j.out")]
        if job:
            spec = "%d-%d" % (lo, hi)
            if max_jobs_run:
                spec += "%%%d" % max_jobs_run  # slurm array throttle
            argv += ["--array", spec]
        argv += [spath]
        proc = subprocess.run(argv)
        return proc.returncode
    finally:
        try:
            os.unlink(spath)
        except OSError:
            pass


def main() -> None:
    opts, job, log_file, command = parse_argv(sys.argv[1:])
    env = dict(os.environ)
    extra_env = {}
    if int(opts.get("gpu") or 0) > 0:
        env["WN_NUM_DEVICES"] = str(opts["gpu"])
        extra_env["WN_NUM_DEVICES"] = str(opts["gpu"])
    max_run = int(opts.get("max_jobs_run") or 0)

    conf_path = opts.get("config") or "conf/slurm.conf"
    sub_command, conf_options, defaults = parse_conf(
        conf_path, explicit=bool(opts.get("config")))
    sched_flags = translate_options(opts, conf_options, defaults)

    if shutil.which("sbatch") is not None:
        sys.exit(submit_sbatch(sub_command, sched_flags, job, log_file,
                               command, max_jobs_run=max_run,
                               extra_env=extra_env))

    if shutil.which("srun") is not None:
        prefix = ["srun", "--quiet"] + sched_flags
        if job is None:
            sys.exit(run_one(log_file, prefix + command, env))
        import threading

        name, lo, hi = job
        codes = {}
        sem = threading.Semaphore(max_run or (hi - lo + 1))

        def worker(idx: int) -> None:
            with sem:
                sub = lambda s: re.sub(r"\b%s\b" % re.escape(name), str(idx), s)
                codes[idx] = run_one(sub(log_file),
                                     prefix + [sub(c) for c in command], env)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(lo, hi + 1)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        sys.exit(1 if any(c != 0 for c in codes.values()) else 0)

    sys.stderr.write("slurm.py: no sbatch/srun found; running locally.\n")
    if job is None:
        sys.exit(run_one(log_file, command, env))
    name, lo, hi = job
    code = 0
    for i in range(lo, hi + 1):
        sub = lambda s: re.sub(r"\b%s\b" % re.escape(name), str(i), s)
        code |= run_one(sub(log_file), [sub(c) for c in command], env)
    sys.exit(1 if code else 0)


if __name__ == "__main__":
    main()
