"""Device-vs-host Harvest throughput + agreement probe (real TPU).

Usage: python scripts/harvest_device_probe.py [n_utts] [seconds_each]

Builds a synthetic voiced corpus (distinct per-utterance content so the
runtime's memoization of identical executions can't fake the timing),
runs the host path once and the device path twice (first call pays the
per-bucket compiles; the second measures steady state), and prints
throughput plus host-vs-device agreement.  Companion to the chip test
``tests/test_tpu_hardware.py::test_device_harvest_tracks_host_on_hardware``
— this one reports numbers instead of asserting bounds.
"""

import sys
import time

import numpy as np


def make_corpus(n, sec, fs, seed):
    rng = np.random.default_rng(seed)
    xs = []
    for i in range(n):
        f0 = 100.0 + 180.0 * rng.random()
        t = np.arange(int(sec * fs)) / fs
        f0c = f0 * (1 + 0.04 * np.sin(2 * np.pi * (2 + 3 * rng.random()) * t))
        ph = 2 * np.pi * np.cumsum(f0c) / fs
        xs.append(np.sin(ph) + 0.3 * np.sin(2 * ph)
                  + 0.05 * rng.standard_normal(len(t)))
    return xs


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    sec = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0
    fs = 16000

    import jax
    print("backend:", jax.default_backend(), flush=True)

    from pytorchwavenetvocoder_tpu.dsp.harvest import harvest
    from pytorchwavenetvocoder_tpu.dsp.harvest_jax import harvest_jax_many

    xs_a = make_corpus(n, sec, fs, seed=0)
    xs_b = make_corpus(n, sec, fs, seed=1)
    audio_s = n * sec

    t0 = time.perf_counter()
    f_dev_a = harvest_jax_many(xs_a, fs, 71, 400)
    t1 = time.perf_counter()
    f_dev = harvest_jax_many(xs_b, fs, 71, 400)
    t2 = time.perf_counter()
    print(f"device: first (incl compiles) {t1 - t0:.1f}s, "
          f"warm {t2 - t1:.2f}s = "
          f"{(t2 - t1) / audio_s * 1000:.1f} ms per second of audio",
          flush=True)

    t3 = time.perf_counter()
    f_host = [harvest(x, fs, 71, 400) for x in xs_b]
    t4 = time.perf_counter()
    print(f"host (1 core): {t4 - t3:.2f}s = "
          f"{(t4 - t3) / audio_s * 1000:.1f} ms per second of audio",
          flush=True)

    agrees, meds, maxes = [], [], []
    for fh, fj in zip(f_host, f_dev):
        vh, vj = fh > 0, fj > 0
        agrees.append((vh == vj).mean())
        both = vh & vj
        if both.any():
            rel = np.abs(fj[both] - fh[both]) / fh[both]
            meds.append(np.median(rel))
            maxes.append(rel.max())
    print(f"agreement over {n} utts: voicing min {min(agrees):.4f}, "
          f"f0 rel median {np.median(meds):.2e}, worst max {max(maxes):.2e}")
    del f_dev_a


if __name__ == "__main__":
    main()
