"""Stateless RNN-T prediction network (icefall "Decoder").

The reference drives this as an opaque decoder.onnx taking ``y [B, context]``
and returning ``decoder_out`` (``OfflineProjOfTransducer.cs:93-123``).  The
underlying icefall architecture is: token embedding followed by a grouped
1-D convolution over the ``context_size`` previous tokens and a ReLU —
"stateless" because its only state is the last ``context_size`` token ids
(metadata ``context_size``, typically 2; ``OfflineModel.cs:31-39``).

TPU note: in the greedy/beam loops this runs once per emitted token per
lane; it is evaluated *unconditionally* every frame step (uniform work beats
`lax.cond` divergence on TPU) — cost is one [B,2] gather + tiny matmuls.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from k2transducerasr_tpu.ops import layers as L


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int
    decoder_dim: int = 512
    context_size: int = 2
    blank_id: int = 0


def init_params(key, cfg: DecoderConfig):
    k_emb, k_conv = jax.random.split(key)
    p = {"embedding": L.init_embedding(k_emb, cfg.vocab_size, cfg.decoder_dim)}
    if cfg.context_size > 1:
        # grouped conv over the context window (icefall uses groups=dim//4,
        # kernel=context_size, no bias)
        groups = max(1, cfg.decoder_dim // 4)
        p["conv"] = L.init_conv1d(
            k_conv,
            cfg.decoder_dim,
            cfg.decoder_dim,
            kernel=cfg.context_size,
            groups=groups,
            bias=False,
        )
    return p


def forward(params, cfg: DecoderConfig, y: jnp.ndarray) -> jnp.ndarray:
    """y: [B, context_size] int32 (left-padded history) -> [B, decoder_dim].

    Negative ids (the reference seeds offline hyps with -1,
    OfflineRecognizer.cs:105) embed as the blank id.
    """
    y = jnp.where(y < 0, cfg.blank_id, y)
    emb = L.apply_embedding(params["embedding"], y)  # [B, ctx, D]
    if cfg.context_size > 1:
        # groups derived from the weight layout [k, in/groups, out] so
        # imported exports with different grouping still apply correctly
        groups = cfg.decoder_dim // params["conv"]["w"].shape[1]
        out = L.apply_conv1d(params["conv"], emb, groups=groups, padding="VALID")
        out = out[:, 0, :]  # context window == kernel -> single output frame
    else:
        out = emb[:, -1, :]
    return jax.nn.relu(out)


def context_tables(params, cfg: DecoderConfig):
    """Fold embedding + grouped context conv into per-position lookup tables.

    Returns a tuple of ``context_size`` arrays ``T_t [V, D]`` with
    ``forward(params, cfg, y) == relu(sum_t T_t[y[:, t]])`` — the grouped
    conv is linear, so its contraction with the embedding table can be done
    once per model instead of once per decode-loop trip.  Inside
    ``lax.while_loop`` decode bodies this replaces an embedding gather +
    grouped convolution (a high-latency op for [B, 2, D] operands on TPU)
    with two row gathers and an add.
    """
    emb = params["embedding"]["table"]  # [V, D]
    if cfg.context_size == 1:
        return (emb,)
    w = params["conv"]["w"]  # [k, in/groups, D_out]
    k, gi, d_out = w.shape
    groups = emb.shape[1] // gi  # same derivation as forward()
    go = d_out // groups
    v = emb.shape[0]
    emb_g = emb.reshape(v, groups, gi)
    tables = []
    for t in range(k):
        w_g = w[t].reshape(gi, groups, go)
        tables.append(
            jnp.einsum("vji,ijo->vjo", emb_g, w_g).reshape(v, d_out)
        )
    return tuple(tables)


def forward_from_tables(tables, cfg: DecoderConfig, y: jnp.ndarray) -> jnp.ndarray:
    """y: [B, context_size] int32 -> [B, decoder_dim] using the folded
    tables from ``context_tables`` (identical math to ``forward`` up to f32
    summation order)."""
    y = jnp.where(y < 0, cfg.blank_id, y)
    out = tables[0][y[:, 0]]
    for t in range(1, len(tables)):
        out = out + tables[t][y[:, t]]
    return jax.nn.relu(out)


def forward_sequence(params, cfg: DecoderConfig, ys: jnp.ndarray) -> jnp.ndarray:
    """ys: [B, U] full label sequence -> [B, U, decoder_dim] with left
    padding of blanks (training/rescoring utility; the reference has no
    equivalent — inference-only)."""
    b, u = ys.shape
    pad = jnp.full((b, cfg.context_size - 1), cfg.blank_id, ys.dtype)
    hist = jnp.concatenate([pad, jnp.where(ys < 0, cfg.blank_id, ys)], axis=1)
    emb = L.apply_embedding(params["embedding"], hist)
    if cfg.context_size > 1:
        groups = cfg.decoder_dim // params["conv"]["w"].shape[1]
        out = L.apply_conv1d(params["conv"], emb, groups=groups, padding="VALID")
    else:
        out = emb
    return jax.nn.relu(out)
