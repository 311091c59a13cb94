#!/bin/bash
# ljspeech kernel-3 int8 decode fidelity gate on real TPU hardware.
#
# bench-adjacent fidelity evidence for the OTHER int8 ring format: the
# ljspeech operating point (22.05 kHz, kernel_size 3, n_aux 39) decodes
# through the RAW-int8-ring pallas path (ops/ar_kernel.py selects raw
# int8 rings for k > 2), whose throughput round 4 doubled to 1.57M
# samples/s — this gate puts an MCD number next to that number, exactly
# like scripts/tpu_flagship_int8_gate.sh does for the arctic k=2
# projected-bf16-ring path.
#
# Pseudo-speech (Klatt cascade) corpus in the LJSpeech-1.1 layout
# (chapter LJ050 held out), pushed through the UNMODIFIED ljspeech/sd
# recipe at the FULL k=3 flagship width (512/256, depth 10 x repeat 3,
# RF 6139) with only iters/batch_length reduced, then decoded bf16 AND
# int8 from the same checkpoint and MCD-scored.
#
# Usage: scripts/tpu_ljspeech_int8_gate.sh [workdir]
# ~25-35 min on one v5e chip + 1 host core.  Results recorded in
# PARITY.md ("Fidelity evidence").
set -euo pipefail

PRJ_ROOT=$(cd "$(dirname "$0")/.." && pwd)
WORK=${1:-$(mktemp -d /tmp/wn_lj_int8.XXXXXX)}
echo "workdir: $WORK"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$PRJ_ROOT/.jax_cache}

mkdir -p "$WORK"
cp -r "$PRJ_ROOT/egs/ljspeech/sd/." "$WORK/"
cd "$WORK"
export PRJ_ROOT

N_TRAIN=${N_TRAIN:-600}
N_EVAL=${N_EVAL:-64}

PYTHONPATH=$PRJ_ROOT:${PYTHONPATH:-} python - <<EOF
from pytorchwavenetvocoder_tpu.eval.klatt import make_corpus
import os
out = "downloads/LJSpeech-1.1/wavs"
# train chapters LJ001-LJ049 collapsed into one prefix; LJ050 is the
# recipe's held-out eval chapter.  22.05 kHz, LJ f0 range.
make_corpus(out, ${N_TRAIN}, fs=22050, seed=0, prefix="LJ001-",
            f0_range=(140.0, 300.0), n_syllables=(3, 7))
make_corpus(out, ${N_EVAL}, fs=22050, seed=1, prefix="LJ050-",
            f0_range=(140.0, 300.0), n_syllables=(3, 7))
open("downloads/.done", "w").write("")
print("klatt pseudo-speech LJ corpus ready:", len(os.listdir(out)), "utts")
EOF

# stages 0-3: prep, WORLD features (n_aux 39), stats, noise weighting
./run.sh --stage 0123 --n-jobs 4

# stage 4 at the k=3 flagship defaults (n_resch 512, n_skipch 256,
# depth 10, repeat 3, kernel 3) — only iters/batch_length reduced
./run.sh --stage 4 --iters 3000 --batch-length 8000 \
    --checkpoint-interval 3000 --tag k3gate

head -16 data/ev_ljspeech/feats.scp > gate_feats.scp

# bf16 decode (stage 5 path) + noise restoration (stage 6)
./run.sh --stage 56 --tag k3gate --feats gate_feats.scp \
    --decode-batch-size 16

# int8 decode of the SAME checkpoint (raw-int8-ring path: k=3)
PYTHONPATH=$PRJ_ROOT:${PYTHONPATH:-} python -m pytorchwavenetvocoder_tpu.bin.decode \
    --feats gate_feats.scp --stats data/tr_ljspeech/stats.h5 \
    --checkpoint exp/tr_ljspeech_22k_k3gate/checkpoint-final.pkl \
    --config exp/tr_ljspeech_22k_k3gate \
    --outdir exp/tr_ljspeech_22k_k3gate/wav_int8 \
    --fs 22050 --batch_size 16 --quantize --verbose 1

PYTHONPATH=$PRJ_ROOT:${PYTHONPATH:-} python - <<'EOF'
import os
import numpy as np
from pytorchwavenetvocoder_tpu.eval.mcd import mcd_from_wavs as _mcd
mcd_from_wavs = lambda a, b: _mcd(a, b, align="dtw")
from pytorchwavenetvocoder_tpu.utils import read_wav, write_wav

ref_dir = "wav_hpf/ev_ljspeech"
nsf_dir = "exp/tr_ljspeech_22k_k3gate/wav_nsf"
raw_dir = "exp/tr_ljspeech_22k_k3gate/wav"
int8_dir = "exp/tr_ljspeech_22k_k3gate/wav_int8"
rng = np.random.RandomState(0)
mcds, base, raw, q8 = [], [], [], []
for f in sorted(os.listdir(nsf_dir))[:16]:
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
print(f"LJSPEECH K3 GATE over {len(mcds)} eval utterances")
print(f"mean MCD: generated (noise-restored) {np.mean(mcds):.2f} dB "
      f"vs white-noise floor {np.mean(base):.2f} dB")
print(f"k=3 int8 fidelity: bf16 raw {np.mean(raw):.2f} dB vs "
      f"int8 raw {np.mean(q8):.2f} dB (delta {np.mean(q8)-np.mean(raw):+.3f})")
assert np.mean(mcds) < 0.8 * np.mean(base), "k3 model did not learn speech"
assert np.mean(q8) < np.mean(raw) + 0.4, "int8 degraded MCD at k=3"
print("LJSPEECH K3 INT8 GATE PASSED")
EOF
