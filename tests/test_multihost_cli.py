"""Multi-host trainer CLI end-to-end: two CPU processes, one global mesh.

Spawns two real ``bin/train.py`` processes wired through
``jax.distributed`` (JAX_COORDINATOR_ADDRESS env autodetection), each
with 2 virtual CPU devices, training a tiny model on a shared synthetic
corpus.  Proves the multihost branch: global mesh construction,
per-process batch slicing through ``shard_global_batch``, the gradient
psum crossing process boundaries, and single-writer checkpointing.
The model_parallel=2 variant additionally shards the layer weights over
the within-host model axis (multi-host DP x TP).
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_two_process_train(tmp_path, model_parallel):
    from scipy.io import wavfile

    from pytorchwavenetvocoder_tpu.utils import write_hdf5

    wavdir, featdir = tmp_path / "wav", tmp_path / "feats"
    wavdir.mkdir(), featdir.mkdir()
    rng = np.random.RandomState(0)
    fs, n_aux, uf = 16000, 4, 10
    for i in range(4):
        T = 4000
        x = (3000 * np.sin(2 * np.pi * 150 * np.arange(T) / fs)
             + 100 * rng.randn(T)).astype(np.int16)
        wavfile.write(str(wavdir / f"u{i}.wav"), fs, x)
        write_hdf5(str(featdir / f"u{i}.h5"), "/world",
                   rng.randn(T // uf + 1, n_aux).astype(np.float32))
    stats = str(tmp_path / "stats.h5")
    write_hdf5(stats, "/world/mean", np.zeros(n_aux, np.float32))
    write_hdf5(stats, "/world/scale", np.ones(n_aux, np.float32))

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    expdir = str(tmp_path / "exp")
    procs = []
    for pid in range(2):
        env = dict(os.environ,
                   PYTHONPATH=REPO,
                   JAX_PLATFORMS="cpu",
                   JAX_NUM_CPU_DEVICES="2",
                   JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                   JAX_NUM_PROCESSES="2",
                   JAX_PROCESS_ID=str(pid))
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "pytorchwavenetvocoder_tpu.bin.train",
             "--waveforms", str(wavdir), "--feats", str(featdir),
             "--stats", stats, "--expdir", expdir,
             "--n_aux", str(n_aux), "--n_resch", "16", "--n_skipch", "16",
             "--dilation_depth", "3", "--dilation_repeat", "1",
             "--upsampling_factor", str(uf), "--batch_length", "600",
             "--batch_size", "4", "--iters", "4", "--intervals", "2",
             "--checkpoint_interval", "100", "--verbose", "1",
             "--model_parallel", str(model_parallel)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=REPO))
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
    assert "multi-host mesh: 2 processes, 4 devices" in outs[0]
    # single-writer checkpoint
    assert os.path.exists(os.path.join(expdir, "checkpoint-final.pkl"))
    # both processes computed the same (psum-agreed) losses
    l0 = re.findall(r"average loss = ([\d.]+)", outs[0])
    l1 = re.findall(r"average loss = ([\d.]+)", outs[1])
    assert l0 and l0 == l1, (l0, l1)
    return outs


@pytest.mark.slow
def test_train_cli_two_processes(tmp_path):
    _run_two_process_train(tmp_path, model_parallel=1)


@pytest.mark.slow
def test_train_cli_two_processes_model_parallel(tmp_path):
    """Multi-host DP x TP: the data axis spans the two hosts (one data
    row block each) and each host's 2 devices form a model-parallel
    group holding half the layer weights + Adam moments."""
    outs = _run_two_process_train(tmp_path, model_parallel=2)
    assert "model_parallel=2" in outs[0]
