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


def test_all_recipes_syntax():
    import glob

    recipes = glob.glob(os.path.join(REPO, "egs", "*", "*", "run.sh"))
    assert len(recipes) == 11
    for rs in recipes:
        r = run(["bash", "-n", rs])
        assert r.returncode == 0, rs
