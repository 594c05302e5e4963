"""RNN-T joint network (icefall "Joiner").

Reference treats this as joiner.onnx: inputs ``encoder_out``/``decoder_out``
``[N, joiner_dim]`` (already projected), output logits ``[N, vocab]``
(``OfflineProjOfTransducer.cs:125-152``).  Architecture:

    logits = W_out @ tanh(P_enc(enc) + P_dec(dec))

TPU-first decomposition: the two input projections are exposed separately so
the decode loops hoist them — ``project_encoder`` runs ONCE over the whole
[B, T, enc_dim] encoder output as a single large MXU matmul, and
``project_decoder`` runs once per decoder evaluation; the per-frame inner
step is then only a [B, J] x [J, V] matmul.  The reference instead pays a
full joiner session dispatch per frame (OfflineRecognizer.cs:139-141).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from k2transducerasr_tpu.ops import layers as L
import jax


@dataclasses.dataclass(frozen=True)
class JoinerConfig:
    encoder_dim: int
    decoder_dim: int
    joiner_dim: int
    vocab_size: int


def init_params(key, cfg: JoinerConfig):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "encoder_proj": L.init_linear(k1, cfg.encoder_dim, cfg.joiner_dim),
        "decoder_proj": L.init_linear(k2, cfg.decoder_dim, cfg.joiner_dim),
        "output": L.init_linear(k3, cfg.joiner_dim, cfg.vocab_size),
    }


def project_encoder(params, enc_out, compute_dtype=None):
    """[..., encoder_dim] -> [..., joiner_dim]; hoisted out of the loop."""
    return L.apply_linear(params["encoder_proj"], enc_out, compute_dtype)


def project_decoder(params, dec_out, compute_dtype=None):
    return L.apply_linear(params["decoder_proj"], dec_out, compute_dtype)


def joint_logits(params, enc_proj, dec_proj, compute_dtype=None):
    """enc_proj/dec_proj: broadcast-compatible [..., joiner_dim] (already
    projected) -> logits [..., vocab]."""
    return L.apply_linear(params["output"], jnp.tanh(enc_proj + dec_proj), compute_dtype)


def forward(params, enc_out, dec_out, project_input: bool = True, compute_dtype=None):
    """Reference-shaped entry: raw (or pre-projected) activations -> logits."""
    if project_input:
        enc_out = project_encoder(params, enc_out, compute_dtype)
        dec_out = project_decoder(params, dec_out, compute_dtype)
    return joint_logits(params, enc_out, dec_out, compute_dtype)
