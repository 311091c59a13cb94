"""TPU-native WaveNet vocoder framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
kan-bayashi/PytorchWaveNetVocoder: WORLD/mel-spectrogram conditioned
mu-law WaveNet vocoder with feature extraction, noise shaping, training
and batched autoregressive synthesis — built TPU-first (SPMD over
`jax.sharding.Mesh`, `lax.scan` AR decode, MXU-shaped matmul convs).

Layer map (mirrors reference layers, see SURVEY.md §1):
  recipes (egs/)  ->  job runner (utils/job.py)  ->  CLI tools (bin/)
  ->  model (models/)  +  ops/dsp kernels (ops/, dsp/)  ->  utils/ I/O
"""

__version__ = "0.1.0"

from pytorchwavenetvocoder_tpu.ops.mulaw import decode_mu_law, encode_mu_law  # noqa: F401
from pytorchwavenetvocoder_tpu.models.wavenet import WaveNet, WaveNetConfig  # noqa: F401
