#!/bin/bash
# Full-size (30x512) checkpoint migration gate.
#
# The conversion contract (`bin/convert_checkpoint.py`) is parity-tested
# at toy shapes in tests/test_convert.py; this gate proves it at the
# REAL flagship shape (n_resch 512, n_skipch 256, depth 10 x repeat 3,
# RF 3070 — reference `wavenet_vocoder/nets/wavenet.py:172-210`):
#
#   1. train a short flagship run on-chip through the unmodified
#      arctic/sd recipe (pseudo-speech corpus),
#   2. convert the trained checkpoint --direction to_torch,
#   3. reload it with the ACTUAL reference PyTorch code
#      (/root/reference), strict state_dict load, and run the reference
#      forward on a test window,
#   4. convert back --direction to_jax and assert the round-trip is
#      BIT-equal (params and Adam moments) and the reference logits
#      match ours at f32 tolerance,
#   5. decode eval utterances from the round-tripped checkpoint on-chip
#      (it must be a drop-in bundle for decode.py).
#
# Usage: scripts/tpu_fullsize_migration.sh [workdir]
# ~15-20 min on one v5e chip + 1 host core (the torch CPU forward at
# flagship width is the long host step).  Results recorded in PARITY.md.
set -euo pipefail

PRJ_ROOT=$(cd "$(dirname "$0")/.." && pwd)
WORK=${1:-$(mktemp -d /tmp/wn_migrate.XXXXXX)}
echo "workdir: $WORK"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$PRJ_ROOT/.jax_cache}

mkdir -p "$WORK"
cp -r "$PRJ_ROOT/egs/arctic/sd/." "$WORK/"
cd "$WORK"
export PRJ_ROOT

PYTHONPATH=$PRJ_ROOT:${PYTHONPATH:-} python - <<'EOF'
from pytorchwavenetvocoder_tpu.eval.klatt import make_corpus
make_corpus("downloads/cmu_us_slt_arctic/wav", 160, fs=16000, seed=3,
            n_syllables=(3, 5))
open("downloads/.done", "w").write("")
print("klatt corpus (160 utts) ready")
EOF

./run.sh --stage 0123 --n-jobs 4

# short flagship train run (full 30x512 shape; only iters reduced)
./run.sh --stage 4 --iters 300 --batch-length 8000 \
    --checkpoint-interval 300 --tag mig

# ---- to_torch ---------------------------------------------------------
PYTHONPATH=$PRJ_ROOT:${PYTHONPATH:-} python -m \
    pytorchwavenetvocoder_tpu.bin.convert_checkpoint \
    --checkpoint exp/tr_arctic_mig/checkpoint-final.pkl \
    --config exp/tr_arctic_mig/model.conf \
    --outdir torch_bundle --direction to_torch --verbose 1

# ---- reload with the REFERENCE code and forward a test window ---------
PYTHONPATH=$PRJ_ROOT:${PYTHONPATH:-} python - <<'EOF'
import sys

import numpy as np
import torch

sys.path.insert(0, "/root/reference")
from wavenet_vocoder.nets import WaveNet as TorchWaveNet

conf = torch.load("torch_bundle/model.conf", map_location="cpu",
                  weights_only=False)
net = TorchWaveNet(
    n_quantize=conf.n_quantize, n_aux=conf.n_aux, n_resch=conf.n_resch,
    n_skipch=conf.n_skipch, dilation_depth=conf.dilation_depth,
    dilation_repeat=conf.dilation_repeat, kernel_size=conf.kernel_size,
    upsampling_factor=conf.upsampling_factor)
assert conf.n_resch == 512 and conf.dilation_repeat == 3, vars(conf)
ckpt = torch.load("torch_bundle/checkpoint-final.pkl", map_location="cpu",
                  weights_only=False)
net.load_state_dict(ckpt["model"], strict=True)   # full-shape layout check
net.eval()
print("reference strict load OK at 30x512; iterations =",
      ckpt["iterations"])

rng = np.random.RandomState(7)
frames = 45                                       # T = 3600 > RF 3070
x = rng.randint(0, 256, (1, frames * conf.upsampling_factor))
h = rng.randn(1, conf.n_aux, frames).astype(np.float32)
with torch.no_grad():
    logits = net(torch.from_numpy(x), torch.from_numpy(h)).numpy()
np.save("torch_logits.npy", logits)
np.save("window_x.npy", x.astype(np.int32))
np.save("window_h.npy", h)
print("reference forward done:", logits.shape)
EOF

# ---- back to_jax -------------------------------------------------------
PYTHONPATH=$PRJ_ROOT:${PYTHONPATH:-} python -m \
    pytorchwavenetvocoder_tpu.bin.convert_checkpoint \
    --checkpoint torch_bundle/checkpoint-final.pkl \
    --config torch_bundle/model.conf \
    --outdir jax_roundtrip --direction to_jax --verbose 1

# ---- round-trip bit-parity + logits parity -----------------------------
PYTHONPATH=$PRJ_ROOT:${PYTHONPATH:-} python - <<'EOF'
import dataclasses
import pickle

import numpy as np
import jax

from pytorchwavenetvocoder_tpu.convert import config_from_json_conf
from pytorchwavenetvocoder_tpu.models.wavenet import wavenet_forward
from pytorchwavenetvocoder_tpu.parallel.checkpoint import load_model_conf

orig = pickle.load(open("exp/tr_arctic_mig/checkpoint-final.pkl", "rb"))
rt = pickle.load(open("jax_roundtrip/checkpoint-final.pkl", "rb"))

flat_o, treedef_o = jax.tree.flatten(orig["model"])
flat_r, treedef_r = jax.tree.flatten(rt["model"])
assert treedef_o == treedef_r
for a, b in zip(flat_o, flat_r):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
print(f"round-trip params BIT-equal ({len(flat_o)} leaves)")

def adam_moments(opt):
    """(count, mu, nu) from either layout: train.py stores the raw
    optax opt_state (ScaleByAdamState somewhere in the tuple);
    convert_checkpoint --to_jax stores {"adam_moments": {...}}."""
    if isinstance(opt, dict):
        m = opt["adam_moments"]
        return m["count"], m["mu"], m["nu"]
    stack = [opt]
    while stack:
        s = stack.pop()
        if hasattr(s, "mu") and hasattr(s, "nu") and hasattr(s, "count"):
            return s.count, s.mu, s.nu
        if isinstance(s, (tuple, list)):
            stack.extend(s)
    raise AssertionError("no Adam moments found in optimizer state")

co, muo, nuo = adam_moments(orig["optimizer"])
cr, mur, nur = adam_moments(rt["optimizer"])
for fo, fr in ((muo, mur), (nuo, nur)):
    lo, lr = jax.tree.leaves(fo), jax.tree.leaves(fr)
    assert len(lo) == len(lr) and lo
    for a, b in zip(lo, lr):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
assert int(np.asarray(co)) == int(np.asarray(cr))
print(f"round-trip Adam moments BIT-equal (count={int(np.asarray(co))})")

config = config_from_json_conf(load_model_conf("exp/tr_arctic_mig"))
config = dataclasses.replace(config, compute_dtype="float32")
x = np.load("window_x.npy")
h = np.transpose(np.load("window_h.npy"), (0, 2, 1))  # ours: channels-last
# TPU f32 matmuls default to bf16 passes (measured max|diff| 5e-2 at
# this depth); parity vs the torch-CPU f32 forward needs true f32
with jax.default_matmul_precision("highest"):
    ours = np.asarray(wavenet_forward(rt["model"], config, x, h),
                      np.float32)
ref = np.load("torch_logits.npy")
rf = config.receptive_field
a, b = ours[:, rf:], ref[:, rf:]
max_abs = float(np.abs(a - b).max())
agree = float((a.argmax(-1) == b.argmax(-1)).mean())
print(f"torch-vs-jax flagship logits: max|diff|={max_abs:.2e}, "
      f"argmax agreement={agree:.4f} over {a.shape[1]} positions")
assert max_abs < 5e-2 and agree > 0.995, (max_abs, agree)
print("FULL-SIZE LOGITS PARITY PASSED")
EOF

# ---- the round-tripped bundle must be a drop-in for decode.py ----------
head -8 data/ev_slt/feats.scp > mig_feats.scp
cp exp/tr_arctic_mig/stats.h5 jax_roundtrip/ 2>/dev/null \
    || cp data/tr_slt/stats.h5 jax_roundtrip/stats.h5
PYTHONPATH=$PRJ_ROOT:${PYTHONPATH:-} python -m \
    pytorchwavenetvocoder_tpu.bin.decode \
    --feats mig_feats.scp --stats jax_roundtrip/stats.h5 \
    --checkpoint jax_roundtrip/checkpoint-final.pkl \
    --config jax_roundtrip --outdir jax_roundtrip/wav \
    --batch_size 8 --verbose 1
n_wav=$(find jax_roundtrip/wav -name "*.wav" | wc -l)
echo "round-tripped checkpoint decoded ${n_wav} utterances"
[ "$n_wav" -ge 8 ]
echo "FULL-SIZE MIGRATION GATE PASSED"
