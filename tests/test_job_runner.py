"""Job-runner (egs/utils/run.py) and parse_options.sh tests."""

import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUN_PY = os.path.join(REPO, "egs", "utils", "run.py")
PARSE = os.path.join(REPO, "egs", "utils", "parse_options.sh")


def run(cmd, **kw):
    return subprocess.run(cmd, capture_output=True, text=True, **kw)


def test_run_py_logs_and_succeeds(tmp_path):
    log = str(tmp_path / "logs" / "hello.log")
    r = run(["python", RUN_PY, log, "echo", "hello world"])
    assert r.returncode == 0
    content = open(log).read()
    assert "hello world" in content
    assert "# Started at" in content
    assert "Ended (code 0)" in content


def test_run_py_propagates_failure(tmp_path):
    log = str(tmp_path / "fail.log")
    r = run(["python", RUN_PY, log, "false"])
    assert r.returncode != 0
    assert "Ended (code 1)" in open(log).read()


def test_run_py_accepts_scheduler_flags(tmp_path):
    log = str(tmp_path / "flags.log")
    # args are joined and run through bash (run.pl contract), so a
    # compound command travels as one quoted word
    r = run(["python", RUN_PY, "--gpu", "2", "--num-threads", "4", log,
             "echo dev=$WN_NUM_DEVICES"])
    assert r.returncode == 0
    assert "dev=2" in open(log).read()


def test_run_py_array_jobs(tmp_path):
    log = str(tmp_path / "job.JOB.log")
    r = run(["python", RUN_PY, "--max-jobs-run", "2", "JOB=1:4", log,
             "echo", "task", "JOB"])
    assert r.returncode == 0
    for i in range(1, 5):
        assert "task %d" % i in open(str(tmp_path / ("job.%d.log" % i))).read()


def test_run_py_array_failure(tmp_path):
    log = str(tmp_path / "j.JOB.log")
    r = run(["python", RUN_PY, "JOB=1:3", log, "exit JOB"])
    assert r.returncode != 0


def test_parse_options(tmp_path):
    script = tmp_path / "s.sh"
    script.write_text(f"""#!/bin/bash
foo=1
bar_baz=hello
flag=true
. {PARSE}
echo "foo=$foo bar_baz=$bar_baz flag=$flag"
""")
    r = run(["bash", str(script), "--foo", "42", "--bar-baz", "world",
             "--flag", "false"])
    assert r.returncode == 0
    assert r.stdout.strip() == "foo=42 bar_baz=world flag=false"
    # unknown option rejected
    r = run(["bash", str(script), "--nope", "1"])
    assert r.returncode != 0
    # boolean type enforced
    r = run(["bash", str(script), "--flag", "maybe"])
    assert r.returncode != 0


def _import_slurm():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "slurm_py", os.path.join(REPO, "egs", "utils", "slurm.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_slurm_conf_translation(tmp_path):
    slurm = _import_slurm()
    conf = tmp_path / "slurm.conf"
    conf.write_text(
        "command sbatch --export=PATH --ntasks-per-node=1\n"
        "option time=* --time $0\n"
        "option mem=* --mem-per-cpu $0\n"
        "option mem=0\n"
        "option num_threads=* --cpus-per-task $0 --ntasks-per-node=1\n"
        "option num_threads=1 --cpus-per-task 1\n"
        "default gpu=0\n"
        "option gpu=0 -p all,hpc\n"
        "option gpu=* -p hpc --gres=gpu:$0 --time 10-00:00:00\n")
    command, options, defaults = slurm.parse_conf(str(conf))
    assert command == "sbatch --export=PATH --ntasks-per-node=1"
    assert defaults == {"gpu": "0"}

    # wildcard template with $0 substitution
    flags = slurm.translate_options({"gpu": "2"}, options, defaults)
    assert flags == ["-p", "hpc", "--gres=gpu:2", "--time", "10-00:00:00"]
    # exact-value override beats the wildcard; default gpu=0 applies
    flags = slurm.translate_options({"mem": "4G"}, options, defaults)
    assert "--mem-per-cpu" in flags and "4G" in flags
    assert "-p" in flags and "all,hpc" in flags  # from default gpu=0
    # exact match with empty template adds nothing
    flags = slurm.translate_options({"mem": "0", "gpu": "1"}, options, defaults)
    assert "--mem-per-cpu" not in flags
    assert "--gres=gpu:1" in flags


def test_slurm_default_conf_used_when_missing():
    slurm = _import_slurm()
    command, options, defaults = slurm.parse_conf("/nonexistent/slurm.conf")
    assert command.startswith("sbatch")
    assert "gpu" in options and "*" in options["gpu"]


def test_slurm_sbatch_submission(tmp_path):
    """End-to-end with a fake sbatch on PATH: conf-translated flags must
    reach the submission command and the array job must run."""
    bindir = tmp_path / "bin"
    bindir.mkdir()
    fake = bindir / "sbatch"
    # fake sbatch: records argv, executes the script for each array index
    fake.write_text(f"""#!/bin/bash
echo "$@" >> {tmp_path}/sbatch.argv
array=""
script=""
while [ $# -gt 0 ]; do
  case "$1" in
    --array) array="$2"; shift 2;;
    -o) shift 2;;
    --wait) shift;;
    -*) if [[ "$1" == *=* ]]; then shift; else shift 2; fi;;
    *) script="$1"; shift;;
  esac
done
code=0
if [ -n "$array" ]; then
  array="${{array%%%*}}"   # strip the %N throttle
  lo="${{array%-*}}"; hi="${{array#*-}}"
  for i in $(seq $lo $hi); do
    SLURM_ARRAY_TASK_ID=$i bash "$script" || code=1
  done
else
  bash "$script" || code=1
fi
exit $code
""")
    fake.chmod(0o755)
    conf = tmp_path / "slurm.conf"
    conf.write_text("command sbatch --export=PATH\n"
                    "option gpu=* --gres=gpu:$0\n")
    env = dict(os.environ, PATH=f"{bindir}:{os.environ['PATH']}")
    log = str(tmp_path / "work" / "t.JOB.log")
    r = subprocess.run(["python", os.path.join(REPO, "egs", "utils", "slurm.py"),
                        "--gpu", "1", "--max-jobs-run", "2",
                        "--config", str(conf), "JOB=1:3", log,
                        "echo ran JOB dev=$WN_NUM_DEVICES"],
                       capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    argv = open(str(tmp_path / "sbatch.argv")).read()
    assert "--export=PATH" in argv and "--gres=gpu:1" in argv
    assert "--array 1-3%2" in argv  # slurm.pl's max-jobs-run mapping
    for i in (1, 2, 3):
        content = open(str(tmp_path / "work" / f"t.{i}.log")).read()
        # WN_NUM_DEVICES must reach the job even though --export=PATH
        # strips the submitter's environment
        assert f"ran {i} dev=1" in content and "Ended (code 0)" in content

    # an explicitly passed but missing conf must fail fast, not silently
    # fall back to defaults
    r = subprocess.run(["python", os.path.join(REPO, "egs", "utils", "slurm.py"),
                        "--config", str(tmp_path / "nope.conf"),
                        str(tmp_path / "x.log"), "true"],
                       capture_output=True, text=True, env=env)
    assert r.returncode != 0
    assert "config file not found" in r.stderr


def test_all_recipes_syntax():
    import glob

    recipes = glob.glob(os.path.join(REPO, "egs", "*", "*", "run.sh"))
    assert len(recipes) == 11
    for rs in recipes:
        r = run(["bash", "-n", rs])
        assert r.returncode == 0, rs


def test_slurm_user_time_beats_gpu_template_default(tmp_path):
    """The gpu=* template embeds '--time 10-00:00:00'; with sbatch's
    last-wins parsing that silently overrode an explicit --time. The
    embedded default must be dropped when the user passed --time."""
    slurm = _import_slurm()
    conf = tmp_path / "slurm.conf"
    conf.write_text("option time=* --time $0\n"
                    "option gpu=* -p hpc --gres=gpu:$0 --time 10-00:00:00\n")
    _, options, defaults = slurm.parse_conf(str(conf))
    flags = slurm.translate_options({"time": "4:00:00", "gpu": "2"},
                                    options, defaults)
    assert flags.count("--time") == 1
    assert flags[flags.index("--time") + 1] == "4:00:00"
    assert "--gres=gpu:2" in flags and "10-00:00:00" not in flags
    # without an explicit --time the template default still applies
    flags = slurm.translate_options({"gpu": "2"}, options, defaults)
    assert "10-00:00:00" in flags


def test_slurm_unmatched_option_is_fatal(tmp_path):
    """slurm.pl dies when no config line matches a passed option; dropping
    it silently (e.g. --mem) would submit without the resource limit."""
    import pytest

    slurm = _import_slurm()
    conf = tmp_path / "slurm.conf"
    conf.write_text("option time=* --time $0\n")
    _, options, defaults = slurm.parse_conf(str(conf))
    with pytest.raises(SystemExit):
        slurm.translate_options({"mem": "50G"}, options, defaults)
    # an unmatched DEFAULT (not user-passed) still just adds nothing
    flags = slurm.translate_options({"time": "1:00"}, options, {"gpu": "0"})
    assert flags == ["--time", "1:00"]
