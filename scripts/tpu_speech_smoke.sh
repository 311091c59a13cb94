#!/bin/bash
# End-to-end fidelity run on PSEUDO-SPEECH (Klatt cascade synthesis).
#
# The sandbox has no network (recipe stage-0 downloads are impossible)
# and ships no recorded speech, so this is the closest achievable stand-
# in for the BASELINE.md fidelity leg: a 1140-utterance corpus of
# source-filter synthesized nonsense syllables — glottal pulse train
# with jitter/shimmer, moving formant cascades, fricatives, plosives,
# pauses, sentence prosody in the arctic-slt F0 range — laid out exactly
# like the arctic download, pushed through the UNMODIFIED arctic/sd
# recipe (all 7 stages), then MCD-scored: generated-vs-truth against a
# white-noise floor, bf16 vs int8 decode of the same checkpoint.
#
# Unlike tpu_learning_smoke.sh (vibrato tones, minutes-fast gate), this
# exercises what the vocoder actually models about speech: moving
# spectral envelopes, voiced/unvoiced alternation, noisy periodicity.
# Results are recorded in PARITY.md ("Fidelity evidence").
#
# Usage: scripts/tpu_speech_smoke.sh [workdir]
# Takes ~40-60 minutes on one v5e chip + 1 host core.
set -euo pipefail

PRJ_ROOT=$(cd "$(dirname "$0")/.." && pwd)
WORK=${1:-$(mktemp -d /tmp/wn_speech.XXXXXX)}
echo "workdir: $WORK"

mkdir -p "$WORK"
cp -r "$PRJ_ROOT/egs/arctic/sd/." "$WORK/"
cd "$WORK"
export PRJ_ROOT

PYTHONPATH=$PRJ_ROOT:${PYTHONPATH:-} python - <<'EOF'
from pytorchwavenetvocoder_tpu.eval.klatt import make_corpus
import os
out = "downloads/cmu_us_slt_arctic/wav"
# 3-7 syllables ~= 0.8-1.6 s per utterance: enough phonetic variety,
# bounded host feature-extraction time on the 1-core host
make_corpus(out, 1140, fs=16000, seed=0, n_syllables=(3, 7))
open("downloads/.done", "w").write("")
print("klatt pseudo-speech corpus ready:", len(os.listdir(out)), "utts")
EOF

# stages 0-3: prep, WORLD features, stats, noise weighting
./run.sh --stage 0123 --n-jobs 4

# stage 4: train a mid-size model (flagship width is unnecessary for a
# smoke; 256x128ch depth 10x2 has RF 2047 and trains in ~10 min)
./run.sh --stage 4 --n-resch 256 --n-skipch 128 --dilation-depth 10 \
    --dilation-repeat 2 --iters 15000 --batch-length 12000 \
    --checkpoint-interval 15000 --tag speech

# stages 5+6 on 16 eval utterances
head -16 data/ev_slt/feats.scp > speech_feats.scp
./run.sh --stage 56 --n-resch 256 --n-skipch 128 --dilation-depth 10 \
    --dilation-repeat 2 --tag speech --feats speech_feats.scp \
    --decode-batch-size 16

# int8 decode of the SAME checkpoint for the quantization fidelity row
PYTHONPATH=$PRJ_ROOT:${PYTHONPATH:-} python -m pytorchwavenetvocoder_tpu.bin.decode \
    --feats speech_feats.scp --stats data/tr_slt/stats.h5 \
    --checkpoint exp/tr_arctic_speech/checkpoint-final.pkl \
    --config exp/tr_arctic_speech --outdir exp/tr_arctic_speech/wav_int8 \
    --batch_size 16 --quantize --verbose 1

PYTHONPATH=$PRJ_ROOT:${PYTHONPATH:-} python - <<'EOF'
import os
import numpy as np
from pytorchwavenetvocoder_tpu.eval.mcd import mcd_from_wavs as _mcd
mcd_from_wavs = lambda a, b: _mcd(a, b, align="dtw")
from pytorchwavenetvocoder_tpu.utils import read_wav, write_wav

gen_dir, ref_dir = "exp/tr_arctic_speech/wav_nsf", "wav_hpf/ev_slt"
raw_dir, int8_dir = "exp/tr_arctic_speech/wav", "exp/tr_arctic_speech/wav_int8"
rng = np.random.RandomState(0)
mcds, base, raw, q8 = [], [], [], []
for f in sorted(os.listdir(gen_dir))[:16]:
    if not f.endswith(".wav"):
        continue
    mcds.append(mcd_from_wavs(os.path.join(ref_dir, f),
                              os.path.join(gen_dir, f)))
    x, fs = read_wav(os.path.join(ref_dir, f))
    write_wav("/tmp/_noise.wav",
              (rng.randn(len(x)) * x.std()).astype(np.float32), fs)
    base.append(mcd_from_wavs(os.path.join(ref_dir, f), "/tmp/_noise.wav"))
    raw.append(mcd_from_wavs(os.path.join(ref_dir, f),
                             os.path.join(raw_dir, f)))
    q8.append(mcd_from_wavs(os.path.join(ref_dir, f),
                            os.path.join(int8_dir, f)))
print(f"SPEECH SMOKE RESULTS over {len(mcds)} eval utterances")
print(f"mean MCD: generated (noise-restored) {np.mean(mcds):.2f} dB "
      f"vs white-noise floor {np.mean(base):.2f} dB")
print(f"int8 fidelity: bf16 raw {np.mean(raw):.2f} dB vs "
      f"int8 raw {np.mean(q8):.2f} dB")
assert np.mean(mcds) < 0.8 * np.mean(base), "model did not learn speech"
assert np.mean(q8) < np.mean(raw) + 0.4, "int8 decode degraded MCD"
print("SPEECH SMOKE PASSED")
EOF
