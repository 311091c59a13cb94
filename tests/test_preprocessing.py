"""End-to-end preprocessing pipeline tests (mirrors reference
test/test_preprocessing.py:63-107): extract -> stats -> noise-shape for
each feature type, driven through the real CLIs on dummy wavs."""

import os

import numpy as np
import pytest

from pytorchwavenetvocoder_tpu.utils import read_hdf5, shape_hdf5


def make_dummy_wavs(tmp_path, n=2, fs=16000, sec=0.4):
    from scipy.io import wavfile

    rng = np.random.RandomState(0)
    wavdir = tmp_path / "wav_src"
    wavdir.mkdir(exist_ok=True)
    paths = []
    for i in range(n):
        t = np.arange(int(fs * sec)) / fs
        x = (6000 * np.sin(2 * np.pi * 150 * t)
             + 500 * rng.randn(len(t))).astype(np.int16)
        p = str(wavdir / f"utt{i}.wav")
        wavfile.write(p, fs, x)
        paths.append(p)
    return paths


@pytest.mark.parametrize("feature_type", ["world", "melspc", "mcep"])
def test_feature_extract_cli(tmp_path, feature_type):
    from pytorchwavenetvocoder_tpu.bin import feature_extract

    fs = 16000
    wavs = make_dummy_wavs(tmp_path)
    scp = tmp_path / "wav.scp"
    scp.write_text("\n".join(wavs) + "\n")
    hdf5dir = str(tmp_path / "hdf5")
    wavdir = str(tmp_path / "wav_filtered")

    feature_extract.main([
        "--waveforms", str(scp), "--hdf5dir", hdf5dir, "--wavdir", wavdir,
        "--fs", str(fs), "--shiftms", "5", "--feature_type", feature_type,
        "--minf0", "70", "--maxf0", "300", "--mcep_dim", "24",
        "--mspc_dim", "80", "--fftl", "1024" if feature_type != "mcep" else "512",
        "--n_jobs", "2", "--verbose", "0"])

    hop = int(fs * 5 / 1000)
    for i in range(2):
        h5 = os.path.join(hdf5dir, f"utt{i}.h5")
        feats = read_hdf5(h5, "/" + feature_type)
        assert np.isfinite(feats).all()
        if feature_type == "world":
            assert feats.shape[1] == 28
        elif feature_type == "melspc":
            assert feats.shape[1] == 80
        else:
            assert feats.shape[1] == 25
        # filtered wav rewritten
        assert os.path.exists(os.path.join(wavdir, f"utt{i}.wav"))


@pytest.mark.parametrize("feature_type", ["world", "mcep"])
def test_full_preprocessing_pipeline(tmp_path, feature_type):
    """extract -> calc_stats -> noise_shaping(inv) -> noise_shaping
    (restore) round-trips the waveform."""
    from scipy.io import wavfile

    from pytorchwavenetvocoder_tpu.bin import calc_stats, feature_extract, noise_shaping

    fs = 16000
    wavs = make_dummy_wavs(tmp_path)
    scp = tmp_path / "wav.scp"
    scp.write_text("\n".join(wavs) + "\n")
    hdf5dir = str(tmp_path / "hdf5")
    wavdir = str(tmp_path / "wav_f")

    fftl = "1024" if feature_type == "world" else "512"
    feature_extract.main([
        "--waveforms", str(scp), "--hdf5dir", hdf5dir, "--wavdir", wavdir,
        "--fs", str(fs), "--feature_type", feature_type,
        "--minf0", "70", "--maxf0", "300", "--mcep_dim", "24",
        "--fftl", fftl, "--n_jobs", "1", "--verbose", "0"])

    feats_scp = tmp_path / "feats.scp"
    feats_scp.write_text("\n".join(
        os.path.join(hdf5dir, f"utt{i}.h5") for i in range(2)) + "\n")
    stats = str(tmp_path / "stats.h5")
    calc_stats.main(["--feats", str(feats_scp), "--stats", stats,
                     "--feature_type", feature_type, "--verbose", "0"])
    assert shape_hdf5(stats, "/" + feature_type + "/mean")[0] in (25, 28)

    # noise weighting (inverse filter) on the filtered wavs
    ns_dir = str(tmp_path / "wav_ns")
    kwargs = ["--stats", stats, "--fs", str(fs),
              "--feature_type", feature_type,
              "--mcep_dim_start", "2", "--mcep_dim_end", "27",
              "--n_jobs", "1", "--verbose", "0"]
    noise_shaping.main(["--waveforms", wavdir, "--outdir", ns_dir,
                        "--inv", "true"] + kwargs)
    # restoration
    rest_dir = str(tmp_path / "wav_restored")
    noise_shaping.main(["--waveforms", ns_dir, "--outdir", rest_dir,
                        "--inv", "false"] + kwargs)

    for i in range(2):
        _, orig = wavfile.read(os.path.join(wavdir, f"utt{i}.wav"))
        _, ns = wavfile.read(os.path.join(ns_dir, f"utt{i}.wav"))
        _, rest = wavfile.read(os.path.join(rest_dir, f"utt{i}.wav"))
        assert not np.array_equal(orig, ns)  # weighting changed the signal
        # restoration recovers the original up to int16 rounding noise
        err = np.abs(orig.astype(float) - rest.astype(float)).mean()
        assert err < 3.0, err


def test_noise_shaping_requires_stats(tmp_path):
    from pytorchwavenetvocoder_tpu.bin import noise_shaping

    wavs = make_dummy_wavs(tmp_path)
    scp = tmp_path / "wav.scp"
    scp.write_text("\n".join(wavs) + "\n")
    with pytest.raises(SystemExit):
        noise_shaping.main(["--waveforms", str(scp),
                            "--outdir", str(tmp_path / "o"),
                            "--stats", str(tmp_path / "missing.h5"),
                            "--verbose", "0"])


@pytest.mark.parametrize("feature_type", ["world", "melspc", "mcep"])
def test_feature_extract_cli_device_jax(tmp_path, feature_type):
    """--device jax (XLA spectral analyses) matches the host path."""
    from pytorchwavenetvocoder_tpu.bin import feature_extract

    fs = 16000
    wavs = make_dummy_wavs(tmp_path)
    scp = tmp_path / "wav.scp"
    scp.write_text("\n".join(wavs) + "\n")
    fftl = "1024" if feature_type != "mcep" else "512"
    common = [
        "--waveforms", str(scp), "--fs", str(fs), "--shiftms", "5",
        "--feature_type", feature_type, "--minf0", "70", "--maxf0", "300",
        "--mcep_dim", "24", "--mspc_dim", "80", "--fftl", fftl,
        "--save_wav", "false", "--verbose", "0"]
    feature_extract.main(
        common + ["--hdf5dir", str(tmp_path / "h_host"), "--n_jobs", "1"])
    feature_extract.main(
        common + ["--hdf5dir", str(tmp_path / "h_jax"), "--device", "jax",
                  "--n_jobs", "2"])  # n_jobs must be ignored on jax

    for i in range(2):
        a = read_hdf5(str(tmp_path / "h_host" / f"utt{i}.h5"),
                      "/" + feature_type)
        b = read_hdf5(str(tmp_path / "h_jax" / f"utt{i}.h5"),
                      "/" + feature_type)
        assert a.shape == b.shape
        # conftest enables x64 on CPU -> near-bit parity; the stored
        # features are float32, so compare at f32 resolution
        np.testing.assert_allclose(b, a, atol=5e-5, rtol=1e-4)


def test_feature_extract_cli_f0_device_jax(tmp_path):
    """--f0_device jax (device Harvest) tracks the host F0 leg.

    The device Harvest is the same algorithm in f32, so voicing flips
    are confined to threshold-straddling frames; on the dummy tones the
    uv column must agree on essentially every frame and the continuous
    F0 must match to well under the WaveNet conditioning resolution.
    """
    from pytorchwavenetvocoder_tpu.bin import feature_extract

    fs = 16000
    wavs = make_dummy_wavs(tmp_path, sec=1.1)
    scp = tmp_path / "wav.scp"
    scp.write_text("\n".join(wavs) + "\n")
    common = [
        "--waveforms", str(scp), "--fs", str(fs), "--shiftms", "5",
        "--feature_type", "world", "--minf0", "70", "--maxf0", "300",
        "--mcep_dim", "24", "--fftl", "1024",
        "--save_wav", "false", "--verbose", "0"]
    feature_extract.main(
        common + ["--hdf5dir", str(tmp_path / "h_host"), "--n_jobs", "1"])
    feature_extract.main(
        common + ["--hdf5dir", str(tmp_path / "h_f0jax"), "--device", "jax",
                  "--f0_device", "jax", "--n_jobs", "1"])

    for i in range(2):
        a = read_hdf5(str(tmp_path / "h_host" / f"utt{i}.h5"), "/world")
        b = read_hdf5(str(tmp_path / "h_f0jax" / f"utt{i}.h5"), "/world")
        assert a.shape == b.shape
        uv_a, uv_b = a[:, 0], b[:, 0]
        assert (uv_a == uv_b).mean() > 0.97, (uv_a == uv_b).mean()
        both = (uv_a > 0) & (uv_b > 0)
        rel = np.abs(b[both, 1] - a[both, 1]) / np.maximum(a[both, 1], 1e-6)
        assert np.median(rel) < 1e-3, np.median(rel)


def test_feature_extract_cli_f0_device_jax_requires_world_device_jax(
        tmp_path):
    from pytorchwavenetvocoder_tpu.bin import feature_extract

    wavs = make_dummy_wavs(tmp_path)
    scp = tmp_path / "wav.scp"
    scp.write_text("\n".join(wavs) + "\n")
    with pytest.raises(SystemExit):
        feature_extract.main([
            "--waveforms", str(scp), "--fs", "16000",
            "--feature_type", "world", "--f0_device", "jax",
            "--hdf5dir", str(tmp_path / "h"), "--verbose", "0"])
