"""Frozen-fixture regression pinning for the in-repo DSP stack.

pyworld/pysptk are uninstallable in this sandbox, so bit-parity against
the real WORLD/SPTK binaries the reference calls
(`/root/reference/wavenet_vocoder/bin/feature_extract.py:154-188`,
`noise_shaping.py:57-64`) cannot be tested directly; the analytic
goldens in tests/test_dsp_golden.py validate the algorithms instead.
What THIS module pins is regressions: the full CLI preprocessing chain
(feature_extract -> calc_stats -> noise_shaping --inv true) on three
deterministic Klatt pseudo-speech utterances, frozen as committed
fixtures.  Any change to the ~1,900-LoC DSP stack that shifts these
outputs beyond float tolerance fails here.

Regenerate (after an INTENDED DSP change, with justification in the
commit message):

    python tests/test_dsp_fixtures.py --freeze
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "tests", "fixtures", "dsp_chain_klatt.npz")

# arctic/sd operating point (egs/arctic/sd/run.sh analysis settings)
FS = 16000
EXTRACT_ARGS = [
    "--feature_type", "world", "--fs", str(FS), "--shiftms", "5",
    "--minf0", "120", "--maxf0", "275", "--mcep_dim", "24",
    "--mcep_alpha", "0.41", "--fftl", "1024", "--highpass_cutoff", "70",
]


def _run_chain(workdir):
    """Synthesize 3 deterministic utterances and run the CLI chain.

    Returns {name: array} of every pinned output: per-utterance /world
    features, corpus stats mean/scale, and the noise-weighted waveforms.
    """
    from pytorchwavenetvocoder_tpu.eval.klatt import make_corpus
    from pytorchwavenetvocoder_tpu.utils import read_hdf5, read_wav

    wav_dir = os.path.join(workdir, "wav")
    make_corpus(wav_dir, 3, fs=FS, seed=42, n_syllables=(2, 3))
    scp = os.path.join(workdir, "wav.scp")
    names = sorted(os.listdir(wav_dir))
    with open(scp, "w") as f:
        f.writelines(os.path.join(wav_dir, n) + "\n" for n in names)

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))

    def cli(tool, *args):
        subprocess.run(
            [sys.executable, "-m", f"pytorchwavenetvocoder_tpu.bin.{tool}",
             *args, "--verbose", "0"],
            check=True, env=env, cwd=workdir,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)

    hdf5_dir, hpf_dir = os.path.join(workdir, "hdf5"), os.path.join(
        workdir, "wav_hpf")
    cli("feature_extract", "--waveforms", scp, "--wavdir", hpf_dir,
        "--hdf5dir", hdf5_dir, "--n_jobs", "1", *EXTRACT_ARGS)

    feats_scp = os.path.join(workdir, "feats.scp")
    with open(feats_scp, "w") as f:
        f.writelines(os.path.join(hdf5_dir, n.replace(".wav", ".h5")) + "\n"
                     for n in names)
    stats_h5 = os.path.join(workdir, "stats.h5")
    cli("calc_stats", "--feats", feats_scp, "--stats", stats_h5,
        "--feature_type", "world")

    hpf_scp = os.path.join(workdir, "wav_hpf.scp")
    with open(hpf_scp, "w") as f:
        f.writelines(os.path.join(hpf_dir, n) + "\n" for n in names)
    nwf_dir = os.path.join(workdir, "wav_nwf")
    cli("noise_shaping", "--waveforms", hpf_scp, "--stats", stats_h5,
        "--outdir", nwf_dir, "--feature_type", "world", "--fs", str(FS),
        "--shiftms", "5", "--mcep_dim_start", "2", "--mcep_dim_end", "27",
        "--mcep_alpha", "0.41", "--mag", "0.5", "--n_jobs", "1",
        "--inv", "true")

    out = {
        "stats_mean": read_hdf5(stats_h5, "/world/mean"),
        "stats_scale": read_hdf5(stats_h5, "/world/scale"),
    }
    for i, n in enumerate(names):
        out[f"world_{i}"] = read_hdf5(
            os.path.join(hdf5_dir, n.replace(".wav", ".h5")), "/world")
        out[f"nwf_{i}"] = read_wav(os.path.join(nwf_dir, n))[0]
    return out


@pytest.fixture(scope="module")
def chain_outputs(tmp_path_factory):
    return _run_chain(str(tmp_path_factory.mktemp("dsp_chain")))


def test_fixture_file_is_committed():
    assert os.path.exists(FIXTURE), (
        "frozen DSP fixture missing — run "
        "`python tests/test_dsp_fixtures.py --freeze` and commit it")


def test_dsp_chain_matches_frozen_fixture(chain_outputs):
    frozen = np.load(FIXTURE)
    assert sorted(frozen.files) == sorted(chain_outputs)
    for key in frozen.files:
        got, want = np.asarray(chain_outputs[key]), frozen[key]
        assert got.shape == want.shape, key
        # same-platform reruns are bit-equal today; the tolerance admits
        # only float noise from future numpy/scipy kernel changes, not
        # algorithmic drift
        scale = max(1.0, float(np.abs(want).max()))
        np.testing.assert_allclose(
            got, want, rtol=1e-5, atol=1e-5 * scale,
            err_msg=f"DSP chain output '{key}' drifted from the frozen "
                    "fixture — if intended, re-freeze and justify")


def test_fixture_covers_expected_surface():
    frozen = np.load(FIXTURE)
    # arctic/sd world layout: [uv, cont_f0_lpf, mcep(25), codeap] = 28
    assert frozen["world_0"].shape[1] == 28
    assert frozen["stats_mean"].shape == (28,)
    # uv dim pinned by calc_stats (reference calc_stats.py:32-34)
    assert frozen["stats_mean"][0] == 0.0 and frozen["stats_scale"][0] == 1.0
    for i in range(3):
        assert np.isfinite(frozen[f"nwf_{i}"]).all()


if __name__ == "__main__":
    if "--freeze" in sys.argv:
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            outs = _run_chain(td)
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        np.savez_compressed(FIXTURE, **outs)
        print(f"froze {len(outs)} arrays -> {FIXTURE} "
              f"({os.path.getsize(FIXTURE)} bytes)")
    else:
        print(__doc__)
