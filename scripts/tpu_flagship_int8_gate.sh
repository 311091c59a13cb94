#!/bin/bash
# Flagship-scale int8 decode fidelity gate on real TPU hardware.
#
# The headline decode benchmark (bench.py) runs int8 at the arctic-sd
# FLAGSHIP config (30x512 gated layers, RF 3070).  This gate trains that
# exact config on a synthetic voiced corpus, decodes the held-out set
# with bf16 AND int8 at flagship scale, and asserts:
#   (a) the model learned: mean MCD << white-noise baseline
#   (b) int8 does not degrade MCD by more than 0.4 dB vs bf16
# i.e. the int8 headline's fidelity evidence is gathered at the same
# scale that produces the headline number, not at a reduced model.
#
# Usage: scripts/tpu_flagship_int8_gate.sh [workdir]
# ~15-25 min on one v5e chip (first run pays the Pallas compiles; the
# persistent compilation cache makes reruns much faster).
set -euo pipefail

PRJ_ROOT=$(cd "$(dirname "$0")/.." && pwd)
WORK=${1:-$(mktemp -d /tmp/wn_flagship.XXXXXX)}
echo "workdir: $WORK"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$PRJ_ROOT/.jax_cache}

mkdir -p "$WORK"
cp -r "$PRJ_ROOT/egs/arctic/sd/." "$WORK/"
cd "$WORK"
export PRJ_ROOT

python - <<'EOF'
import numpy as np, os
from scipy.io import wavfile
os.makedirs("downloads/cmu_us_slt_arctic/wav", exist_ok=True)
rng = np.random.RandomState(0)
fs = 16000
for i in range(1140):
    T = int(fs * rng.uniform(0.4, 0.6))
    t = np.arange(T) / fs
    f0 = 130 + 50 * np.sin(2 * np.pi * (1.0 + (i % 7) * 0.3) * t)
    phase = 2 * np.pi * np.cumsum(f0) / fs
    x = (6000 * np.sin(phase) + 2500 * np.sin(2 * phase)
         + 1000 * np.sin(3 * phase) + 200 * rng.randn(T)).astype(np.int16)
    wavfile.write(f"downloads/cmu_us_slt_arctic/wav/arctic_a{i:04d}.wav", fs, x)
open("downloads/.done", "w").write("")
print("synthetic corpus ready")
EOF

./run.sh --stage 0123 --n-jobs 8

# stage 4 at the FLAGSHIP defaults (n_resch 512, n_skipch 256, depth 10,
# repeat 3, kernel 2) — only iters/batch_length reduced for smoke time
./run.sh --stage 4 --iters 3000 --batch-length 8000 \
    --checkpoint-interval 3000 --tag flagship

head -8 data/ev_slt/feats.scp > gate_feats.scp

# bf16 decode (stage 5 path) + noise restoration (stage 6)
./run.sh --stage 56 --tag flagship --feats gate_feats.scp \
    --decode-batch-size 8

# int8 decode of the SAME flagship checkpoint
PYTHONPATH=$PRJ_ROOT:${PYTHONPATH:-} python -m pytorchwavenetvocoder_tpu.bin.decode \
    --feats gate_feats.scp --stats data/tr_slt/stats.h5 \
    --checkpoint exp/tr_arctic_flagship/checkpoint-final.pkl \
    --config exp/tr_arctic_flagship --outdir exp/tr_arctic_flagship/wav_int8 \
    --batch_size 8 --quantize --verbose 1

PYTHONPATH=$PRJ_ROOT:${PYTHONPATH:-} python - <<'EOF'
import os
import numpy as np
from pytorchwavenetvocoder_tpu.eval.mcd import mcd_from_wavs as _mcd
mcd_from_wavs = lambda a, b: _mcd(a, b, align="dtw")
from pytorchwavenetvocoder_tpu.utils import read_wav, write_wav

ref_dir = "wav_hpf/ev_slt"
nsf_dir = "exp/tr_arctic_flagship/wav_nsf"
raw_dir = "exp/tr_arctic_flagship/wav"
int8_dir = "exp/tr_arctic_flagship/wav_int8"
rng = np.random.RandomState(0)
mcds, base, raw, q8 = [], [], [], []
for f in sorted(os.listdir(nsf_dir))[:8]:
    if not f.endswith(".wav"):
        continue
    mcds.append(mcd_from_wavs(os.path.join(ref_dir, f),
                              os.path.join(nsf_dir, f)))
    x, fs = read_wav(os.path.join(ref_dir, f))
    write_wav("/tmp/_noise.wav",
              (rng.randn(len(x)) * x.std()).astype(np.float32), fs)
    base.append(mcd_from_wavs(os.path.join(ref_dir, f), "/tmp/_noise.wav"))
    raw.append(mcd_from_wavs(os.path.join(ref_dir, f),
                             os.path.join(raw_dir, f)))
    q8.append(mcd_from_wavs(os.path.join(ref_dir, f),
                            os.path.join(int8_dir, f)))
print(f"FLAGSHIP 30x512: mean MCD generated {np.mean(mcds):.2f} dB "
      f"vs white-noise baseline {np.mean(base):.2f} dB")
print(f"FLAGSHIP int8 fidelity: bf16 raw {np.mean(raw):.2f} dB vs "
      f"int8 raw {np.mean(q8):.2f} dB (delta {np.mean(q8)-np.mean(raw):+.3f})")
assert np.mean(mcds) < 0.8 * np.mean(base), "flagship model did not learn"
assert np.mean(q8) < np.mean(raw) + 0.4, "int8 degraded MCD at flagship scale"
print("FLAGSHIP INT8 GATE PASSED")
EOF
