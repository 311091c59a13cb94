"""End-to-end CLI pipeline test: stats -> train -> resume -> decode on
dummy data (the reference's `sd-mini` smoke role, at unit-test scale)."""

import os

import numpy as np
import pytest

from pytorchwavenetvocoder_tpu.utils import read_wav, write_hdf5, write_wav


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipeline")
    wavdir = root / "wav"
    h5dir = root / "hdf5"
    wavdir.mkdir()
    h5dir.mkdir()
    rng = np.random.RandomState(0)
    fs, uf, n_aux = 16000, 80, 28
    wav_scp, feat_scp = [], []
    for i in range(3):
        T = int(fs * rng.uniform(0.3, 0.5))
        t = np.arange(T) / fs
        x = (0.4 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
        h = rng.randn(T // uf + 1, n_aux).astype(np.float32)
        wav = str(wavdir / f"utt{i}.wav")
        h5 = str(h5dir / f"utt{i}.h5")
        write_wav(wav, x, fs)
        write_hdf5(h5, "/world", h)
        wav_scp.append(wav)
        feat_scp.append(h5)
    (root / "wav.scp").write_text("\n".join(wav_scp) + "\n")
    (root / "feats.scp").write_text("\n".join(feat_scp) + "\n")
    return root


def test_full_cli_pipeline(dataset, tmp_path):
    from pytorchwavenetvocoder_tpu.bin import calc_stats, decode, train

    stats = str(dataset / "stats.h5")
    expdir = str(tmp_path / "exp")
    outdir = str(tmp_path / "out")

    # stage: stats
    calc_stats.main(["--feats", str(dataset / "feats.scp"),
                     "--stats", stats, "--feature_type", "world",
                     "--verbose", "0"])
    from pytorchwavenetvocoder_tpu.utils import read_hdf5

    mean = read_hdf5(stats, "/world/mean")
    assert mean.shape == (28,)
    assert mean[0] == 0.0  # uv dim pinned

    # stage: train (tiny net, few iters)
    common = ["--waveforms", str(dataset / "wav.scp"),
              "--feats", str(dataset / "feats.scp"),
              "--stats", stats, "--expdir", expdir,
              "--n_aux", "28", "--n_resch", "16", "--n_skipch", "16",
              "--dilation_depth", "3", "--dilation_repeat", "1",
              "--upsampling_factor", "80", "--batch_length", "800",
              "--batch_size", "2", "--checkpoint_interval", "2",
              "--compute_dtype", "float32", "--verbose", "0"]
    train.main(common + ["--iters", "4"])
    assert os.path.exists(os.path.join(expdir, "model.conf"))
    assert os.path.exists(os.path.join(expdir, "checkpoint-4.pkl"))
    assert os.path.exists(os.path.join(expdir, "checkpoint-final.pkl"))

    # stage: resume from iter 4 and run 2 more
    train.main(common + ["--iters", "6",
                         "--resume", os.path.join(expdir, "checkpoint-4.pkl")])
    assert os.path.exists(os.path.join(expdir, "checkpoint-6.pkl"))

    # stage: decode (batch mode over the mesh-free path)
    decode.main(["--feats", str(dataset / "feats.scp"),
                 "--stats", stats,
                 "--checkpoint", os.path.join(expdir, "checkpoint-final.pkl"),
                 "--config", expdir, "--outdir", outdir,
                 "--batch_size", "2", "--fs", "16000",
                 "--mode", "argmax", "--verbose", "0"])
    wavs = sorted(os.listdir(outdir))
    assert wavs == ["utt0.wav", "utt1.wav", "utt2.wav"]
    for i, w in enumerate(wavs):
        y, fs = read_wav(os.path.join(outdir, w))
        assert fs == 16000
        # n_samples = frames * uf - 1
        from pytorchwavenetvocoder_tpu.utils import shape_hdf5

        n_frames = shape_hdf5(str(dataset / "hdf5" / f"utt{i}.h5"), "/world")[0]
        assert len(y) == n_frames * 80 - 1


def test_decode_multidevice_mesh(dataset, tmp_path):
    """Decode with the batch sharded over the 8-device virtual mesh."""
    from pytorchwavenetvocoder_tpu.bin import calc_stats, decode, train

    stats = str(dataset / "stats.h5")
    expdir = str(tmp_path / "exp")
    outdir = str(tmp_path / "out_mesh")
    calc_stats.main(["--feats", str(dataset / "feats.scp"),
                     "--stats", stats, "--verbose", "0"])
    train.main(["--waveforms", str(dataset / "wav.scp"),
                "--feats", str(dataset / "feats.scp"),
                "--stats", stats, "--expdir", expdir,
                "--n_resch", "16", "--n_skipch", "16",
                "--dilation_depth", "3", "--dilation_repeat", "1",
                "--upsampling_factor", "80", "--batch_length", "800",
                "--batch_size", "2", "--iters", "2",
                "--compute_dtype", "float32", "--verbose", "0"])
    decode.main(["--feats", str(dataset / "feats.scp"),
                 "--stats", stats,
                 "--checkpoint", os.path.join(expdir, "checkpoint-final.pkl"),
                 "--config", expdir, "--outdir", outdir,
                 "--batch_size", "3", "--n_devices", "8",
                 "--mode", "argmax", "--verbose", "0"])
    assert sorted(os.listdir(outdir)) == ["utt0.wav", "utt1.wav", "utt2.wav"]


def test_train_data_parallel_mesh(dataset, tmp_path):
    """Train with batch sharded over the 8-device virtual mesh."""
    from pytorchwavenetvocoder_tpu.bin import train

    stats = str(dataset / "stats.h5")
    expdir = str(tmp_path / "exp_dp")
    from pytorchwavenetvocoder_tpu.bin import calc_stats

    calc_stats.main(["--feats", str(dataset / "feats.scp"),
                     "--stats", stats, "--verbose", "0"])
    train.main(["--waveforms", str(dataset / "wav.scp"),
                "--feats", str(dataset / "feats.scp"),
                "--stats", stats, "--expdir", expdir,
                "--n_resch", "16", "--n_skipch", "16",
                "--dilation_depth", "3", "--dilation_repeat", "1",
                "--upsampling_factor", "80", "--batch_length", "400",
                "--batch_size", "8", "--iters", "2", "--n_devices", "8",
                "--compute_dtype", "float32", "--verbose", "0"])
    assert os.path.exists(os.path.join(expdir, "checkpoint-final.pkl"))


def test_train_resume_latest(dataset, tmp_path):
    """--resume latest auto-resumes from the newest checkpoint in expdir
    (preemption recovery)."""
    from pytorchwavenetvocoder_tpu.bin import calc_stats, train

    stats = str(dataset / "stats.h5")
    expdir = str(tmp_path / "exp_latest")
    calc_stats.main(["--feats", str(dataset / "feats.scp"),
                     "--stats", stats, "--verbose", "0"])
    common = ["--waveforms", str(dataset / "wav.scp"),
              "--feats", str(dataset / "feats.scp"),
              "--stats", stats, "--expdir", expdir,
              "--n_resch", "16", "--n_skipch", "16",
              "--dilation_depth", "3", "--dilation_repeat", "1",
              "--upsampling_factor", "80", "--batch_length", "800",
              "--batch_size", "2", "--checkpoint_interval", "2",
              "--compute_dtype", "float32", "--verbose", "0",
              "--resume", "latest"]
    # fresh start (no checkpoint yet)
    train.main(common + ["--iters", "2"])
    assert os.path.exists(os.path.join(expdir, "checkpoint-2.pkl"))
    # auto-resume continues from iter 2 to 4
    train.main(common + ["--iters", "4"])
    assert os.path.exists(os.path.join(expdir, "checkpoint-4.pkl"))


def test_enable_compilation_cache(tmp_path, monkeypatch):
    """CLIs persist XLA compilations under ~/.cache by default; an
    explicit JAX_COMPILATION_CACHE_DIR (which jax reads itself) wins."""
    import jax

    from pytorchwavenetvocoder_tpu.bin.common import enable_compilation_cache

    old = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
        monkeypatch.setenv("HOME", str(tmp_path))
        enable_compilation_cache()
        expect = os.path.join(str(tmp_path), ".cache",
                              "pytorchwavenetvocoder_tpu", "xla")
        assert jax.config.jax_compilation_cache_dir == expect
        assert os.path.isdir(expect)
        # user override: leave jax's own env-var handling alone
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "o"))
        enable_compilation_cache()
        assert jax.config.jax_compilation_cache_dir == expect  # untouched
    finally:
        jax.config.update("jax_compilation_cache_dir", old)


def test_train_utterance_mode_buckets_and_mesh_fallback(dataset, tmp_path):
    """--batch_length 0 (utterance mode): variable-length utterances run
    through the length-bucket padding (a handful of compiled shapes, pad
    targets masked), and --n_devices > 1 falls back to a single device
    instead of crashing on the B=1 shard (review fixes)."""
    from pytorchwavenetvocoder_tpu.bin import calc_stats, train

    stats = str(dataset / "stats.h5")
    expdir = str(tmp_path / "exp_utt")
    calc_stats.main(["--feats", str(dataset / "feats.scp"),
                     "--stats", stats, "--verbose", "0"])
    train.main(["--waveforms", str(dataset / "wav.scp"),
                "--feats", str(dataset / "feats.scp"),
                "--stats", stats, "--expdir", expdir,
                "--n_resch", "16", "--n_skipch", "16",
                "--dilation_depth", "3", "--dilation_repeat", "1",
                "--upsampling_factor", "80", "--batch_length", "0",
                "--batch_size", "8", "--iters", "4", "--n_devices", "8",
                "--compute_dtype", "float32", "--verbose", "0"])
    assert os.path.exists(os.path.join(expdir, "checkpoint-final.pkl"))


def test_train_rejects_mismatched_n_aux(dataset, tmp_path):
    """--n_aux that disagrees with the stats dim (+ speaker-code column)
    must fail fast with a readable message, not a dot_general shape error
    deep in the model (found by the /verify CLI drive)."""
    from pytorchwavenetvocoder_tpu.bin import calc_stats, train

    stats = str(dataset / "stats.h5")
    calc_stats.main(["--feats", str(dataset / "feats.scp"),
                     "--stats", stats, "--verbose", "0"])
    args = ["--waveforms", str(dataset / "wav.scp"),
            "--feats", str(dataset / "feats.scp"),
            "--stats", stats, "--expdir", str(tmp_path / "exp_bad"),
            "--iters", "1", "--verbose", "0"]
    with pytest.raises(SystemExit):
        train.main(args + ["--n_aux", "29"])  # stats cover 28 dims
    with pytest.raises(SystemExit):
        # with a speaker code the data is 29-wide; default n_aux=28 is off
        train.main(args + ["--use_speaker_code", "true"])


def test_train_model_parallel_cli(dataset, tmp_path):
    """--model_parallel 2 on the 8-device virtual mesh: DP x TP training
    end-to-end through the CLI, checkpoint written (gathered to host),
    and misconfiguration (mp does not divide devices) fails fast."""
    from pytorchwavenetvocoder_tpu.bin import calc_stats, train

    stats = str(dataset / "stats.h5")
    expdir = str(tmp_path / "exp_tp")
    calc_stats.main(["--feats", str(dataset / "feats.scp"),
                     "--stats", stats, "--verbose", "0"])
    base = ["--waveforms", str(dataset / "wav.scp"),
            "--feats", str(dataset / "feats.scp"),
            "--stats", stats, "--expdir", expdir,
            "--n_resch", "16", "--n_skipch", "16",
            "--dilation_depth", "3", "--dilation_repeat", "1",
            "--upsampling_factor", "80", "--batch_length", "800",
            "--batch_size", "4", "--iters", "3",
            "--compute_dtype", "float32", "--verbose", "0"]
    train.main(base + ["--n_devices", "8", "--model_parallel", "2"])
    assert os.path.exists(os.path.join(expdir, "checkpoint-final.pkl"))
    with pytest.raises(SystemExit):
        train.main(base + ["--expdir", str(tmp_path / "exp_bad"),
                           "--n_devices", "8", "--model_parallel", "3"])
