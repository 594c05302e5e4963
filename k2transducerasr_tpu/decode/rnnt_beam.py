"""Batched device-side RNN-T beam search (icefall modified_beam_search).

The reference only implements greedy (its ``maxActivePaths`` ctor argument
is plumbed nowhere, ``OnlineRecognizer.cs:18-19``); beam search is new
surface designed TPU-first per BASELINE config #3:

  * K hypotheses per lane live entirely on device: context tokens
    [B, K, ctx], scores [B, K], token/timestamp history buffers
    [B, K, max_tokens] — one fixed-shape pytree, scannable and shardable
    (per-beam state exchange across chips is a gather over the `data` axis
    handled by GSPMD when lanes are sharded).
  * one expansion per frame (modified beam search): joint logits [B, K, V]
    -> joint log-probs + beam scores -> top-K over the flattened K*V
    candidates -> parent-gather + masked token append.  No host round trips
    per token; the loop is a single ``lax.scan`` over frames.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from k2transducerasr_tpu.models import decoder as decoder_mod
from k2transducerasr_tpu.models import joiner as joiner_mod

NEG_INF = -1e30


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BeamState:
    hyp: Any  # [B, K, ctx] int32
    dec_proj: Any  # [B, K, J] f32
    score: Any  # [B, K] f32 — cumulative log-prob
    tokens: Any  # [B, K, U] int32
    timestamps: Any  # [B, K, U] int32
    count: Any  # [B, K] int32


def init_state(
    dec_params,
    dec_cfg: decoder_mod.DecoderConfig,
    join_params,
    batch: int,
    num_active_paths: int = 4,
    max_tokens: int = 1024,
    compute_dtype=None,
) -> BeamState:
    k = num_active_paths
    hyp = jnp.full((batch * k, dec_cfg.context_size), dec_cfg.blank_id, jnp.int32)
    dec_out = decoder_mod.forward(dec_params, dec_cfg, hyp)
    dec_proj = joiner_mod.project_decoder(join_params, dec_out, compute_dtype)
    j = dec_proj.shape[-1]
    # only beam 0 starts live; the rest at -inf so the first top-k fans out
    score = jnp.where(jnp.arange(k)[None, :] == 0, 0.0, NEG_INF)
    return BeamState(
        hyp=hyp.reshape(batch, k, -1),
        dec_proj=dec_proj.reshape(batch, k, j),
        score=jnp.broadcast_to(score, (batch, k)).astype(jnp.float32),
        tokens=jnp.zeros((batch, k, max_tokens), jnp.int32),
        timestamps=jnp.zeros((batch, k, max_tokens), jnp.int32),
        count=jnp.zeros((batch, k), jnp.int32),
    )


def beam_frames(
    dec_params,
    dec_cfg: decoder_mod.DecoderConfig,
    join_params,
    state: BeamState,
    enc_proj,  # [B, T, J]
    enc_lens,  # [B]
    frame_offset,  # [B]
    extra_skip_sos: bool = False,
    compute_dtype=None,
) -> BeamState:
    b, t_max, j = enc_proj.shape
    k = state.score.shape[1]
    max_tokens = state.tokens.shape[2]
    blank = dec_cfg.blank_id
    lane = jnp.arange(b)[:, None]
    beam_idx = jnp.arange(k)[None, :]
    # embedding + grouped context conv folded into [V, D] lookup tables once
    # per program (see rnnt_greedy) — per-step refresh is gathers + add + relu
    dec_tables = decoder_mod.context_tables(dec_params, dec_cfg)

    def step(carry: BeamState, inp):
        t, enc_t = inp  # enc_t: [B, J]
        logits = joiner_mod.joint_logits(
            join_params, enc_t[:, None, :], carry.dec_proj, compute_dtype
        )  # [B, K, V]
        v = logits.shape[-1]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        if extra_skip_sos:
            # forbid emitting <sos/eos>=1 and <unk>=2 (they'd pollute hyps)
            forbid = (jnp.arange(v) == 1) | (jnp.arange(v) == 2)
            logp = jnp.where(forbid[None, None, :], NEG_INF, logp)
        else:
            forbid = jnp.arange(v) == 2
            logp = jnp.where(forbid[None, None, :], NEG_INF, logp)
        cand = carry.score[:, :, None] + logp  # [B, K, V]
        top_val, top_idx = jax.lax.top_k(cand.reshape(b, k * v), k)  # [B, K]
        parent = top_idx // v  # [B, K]
        token = (top_idx % v).astype(jnp.int32)  # [B, K]

        valid = (t < enc_lens)[:, None]  # [B, 1]
        emit = (token != blank) & valid

        # gather parent state
        def pg(x):  # [B, K, ...] gather along beam axis
            return jnp.take_along_axis(
                x, parent.reshape(b, k, *([1] * (x.ndim - 2))), axis=1
            )

        hyp_p = pg(carry.hyp)
        tokens_p = pg(carry.tokens)
        ts_p = pg(carry.timestamps)
        count_p = pg(carry.count.reshape(b, k, 1)).reshape(b, k)
        dec_proj_p = pg(carry.dec_proj)

        new_hyp = jnp.concatenate([hyp_p[:, :, 1:], token[:, :, None]], axis=2)
        hyp = jnp.where(emit[:, :, None], new_hyp, hyp_p)
        dec_out = decoder_mod.forward_from_tables(
            dec_tables, dec_cfg, hyp.reshape(b * k, -1)
        )
        dec_proj_new = joiner_mod.project_decoder(
            join_params, dec_out, compute_dtype
        ).reshape(b, k, j)
        dec_proj = jnp.where(emit[:, :, None], dec_proj_new, dec_proj_p)

        can_store = emit & (count_p < max_tokens)
        pos = jnp.minimum(count_p, max_tokens - 1)
        tok_val = jnp.where(can_store, token, tokens_p[lane, beam_idx, pos])
        ts_val = jnp.where(
            can_store, frame_offset[:, None] + t, ts_p[lane, beam_idx, pos]
        )
        tokens = tokens_p.at[lane, beam_idx, pos].set(tok_val)
        timestamps = ts_p.at[lane, beam_idx, pos].set(ts_val)
        count = count_p + can_store.astype(jnp.int32)

        score = jnp.where(valid, top_val, carry.score)
        # lanes past their length keep their old beams entirely
        keep_old = ~valid
        hyp = jnp.where(keep_old[:, :, None], carry.hyp, hyp)
        dec_proj = jnp.where(keep_old[:, :, None], carry.dec_proj, dec_proj)
        tokens = jnp.where(keep_old[:, :, None], carry.tokens, tokens)
        timestamps = jnp.where(keep_old[:, :, None], carry.timestamps, timestamps)
        count = jnp.where(keep_old, carry.count, count)
        return BeamState(hyp, dec_proj, score, tokens, timestamps, count), ()

    ts = jnp.arange(t_max)
    final, _ = jax.lax.scan(step, state, (ts, jnp.swapaxes(enc_proj, 0, 1)))
    return final


@functools.partial(
    jax.jit,
    static_argnames=(
        "dec_cfg", "num_active_paths", "max_tokens", "extra_skip_sos", "compute_dtype",
    ),
)
def rnnt_beam_search(
    dec_params,
    dec_cfg: decoder_mod.DecoderConfig,
    join_params,
    enc_out,  # [B, T, enc_dim]
    enc_lens,
    num_active_paths: int = 4,
    max_tokens: int = 1024,
    extra_skip_sos: bool = False,
    compute_dtype=None,
):
    """Whole-utterance modified beam search.  Returns (tokens [B, U],
    timestamps [B, U], count [B]) for each lane's best-scoring beam."""
    b = enc_out.shape[0]
    enc_proj = joiner_mod.project_encoder(join_params, enc_out, compute_dtype)
    state = init_state(
        dec_params, dec_cfg, join_params, b, num_active_paths, max_tokens, compute_dtype
    )
    final = beam_frames(
        dec_params, dec_cfg, join_params, state, enc_proj, enc_lens,
        jnp.zeros((b,), jnp.int32), extra_skip_sos, compute_dtype,
    )
    return best_beam(final)


def best_beam(state: BeamState):
    b = state.score.shape[0]
    best = jnp.argmax(state.score, axis=1)  # [B]
    lane = jnp.arange(b)
    return (
        state.tokens[lane, best],
        state.timestamps[lane, best],
        state.count[lane, best],
    )
