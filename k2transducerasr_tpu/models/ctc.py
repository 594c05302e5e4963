"""CTC output head.

The reference's zipformer2-CTC models are single fused ONNX graphs whose
output[0] is log-probs ``[B, T, V]`` (``OfflineProjOfZipformer2ctc.cs:48-92``).
Here the head is explicit: one linear over encoder output + log-softmax,
composable with any encoder family.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from k2transducerasr_tpu.ops import layers as L


@dataclasses.dataclass(frozen=True)
class CtcConfig:
    encoder_dim: int
    vocab_size: int


def init_params(key, cfg: CtcConfig):
    return {"output": L.init_linear(key, cfg.encoder_dim, cfg.vocab_size)}


def log_probs(params, enc_out, compute_dtype=None):
    """enc_out [B, T, D] -> log-probs [B, T, V]."""
    logits = L.apply_linear(params["output"], enc_out, compute_dtype)
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
