#!/bin/bash
# End-to-end learning smoke for the MELSPC recipe family on real TPU.
#
# Same shape as tpu_learning_smoke.sh but drives arctic/sd-melspc: mel-
# spectrogram conditioning, the mcep side-pass for stft-mcep noise
# shaping, training, decode, and restoration.  Asserts the decoded
# audio's MCD against ground truth beats a white-noise baseline.
#
# Usage: scripts/tpu_melspc_smoke.sh [workdir]
set -euo pipefail

PRJ_ROOT=$(cd "$(dirname "$0")/.." && pwd)
WORK=${1:-$(mktemp -d /tmp/wn_melspc_smoke.XXXXXX)}
echo "workdir: $WORK"

mkdir -p "$WORK"
cp -r "$PRJ_ROOT/egs/arctic/sd-melspc/." "$WORK/"
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
./run.sh --stage 4 --n-resch 128 --n-skipch 128 --dilation-depth 8 \
    --dilation-repeat 2 --iters 3000 --batch-length 8000 \
    --checkpoint-interval 3000 --tag smoke
head -8 data/ev_slt/feats.scp > smoke_feats.scp
./run.sh --stage 56 --n-resch 128 --n-skipch 128 --dilation-depth 8 \
    --dilation-repeat 2 --tag smoke --feats smoke_feats.scp \
    --decode-batch-size 8

PYTHONPATH=$PRJ_ROOT:${PYTHONPATH:-} python - <<'EOF'
import os, sys
import numpy as np
from pytorchwavenetvocoder_tpu.eval.mcd import mcd_from_wavs as _mcd
# pin the metric definition: DTW-aligned (the instrument these
# baselines were recorded with), not whatever the default becomes
mcd_from_wavs = lambda a, b: _mcd(a, b, align="dtw")
from pytorchwavenetvocoder_tpu.utils import read_wav, write_wav

gen_dir, ref_dir = "exp/tr_arctic_smoke/wav_nsf", "wav_hpf/ev_slt"
rng = np.random.RandomState(0)
mcds, base = [], []
for f in sorted(os.listdir(gen_dir))[:8]:
    if not f.endswith(".wav"):
        continue
    mcds.append(mcd_from_wavs(os.path.join(ref_dir, f),
                              os.path.join(gen_dir, f)))
    x, fs = read_wav(os.path.join(ref_dir, f))
    write_wav("/tmp/_noise.wav",
              (rng.randn(len(x)) * x.std()).astype(np.float32), fs)
    base.append(mcd_from_wavs(os.path.join(ref_dir, f), "/tmp/_noise.wav"))
print(f"melspc mean MCD: generated {np.mean(mcds):.2f} dB "
      f"vs white-noise baseline {np.mean(base):.2f} dB")
assert np.mean(mcds) < 0.8 * np.mean(base), "model did not learn"
print("MELSPC LEARNING SMOKE PASSED")
EOF
