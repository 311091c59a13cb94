"""Compute ops: mu-law codec, feature scaling, causal convs, AR scan."""

from pytorchwavenetvocoder_tpu.ops.mulaw import (  # noqa: F401
    decode_mu_law,
    encode_mu_law,
    decode_mu_law_jax,
    encode_mu_law_jax,
)
from pytorchwavenetvocoder_tpu.ops.scaler import StandardScaler  # noqa: F401
