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


def beam_frames_skip(
    dec_params,
    dec_cfg: decoder_mod.DecoderConfig,
    join_params,
    state: BeamState,
    enc_proj,  # [B, T, J]
    enc_lens,  # [B]
    frame_offset,  # [B]
    extra_skip_sos: bool = False,
    compute_dtype=None,
    window: int = 64,
) -> BeamState:
    """Blank-skipping modified beam search — identical results to
    ``beam_frames`` in ~#emissions sequential steps instead of T.

    The greedy-skip insight (rnnt_greedy.greedy_frames_skip) extends to beam
    search: at a frame where NO candidate in the top-K is non-blank, the
    selected top-K are exactly the K blank-extensions of the K live beams
    (there are precisely K blank candidates, one per parent), so the state
    update collapses to ``score_k += logp_k[blank]`` plus a descending
    re-sort of the beams — no hyp/decoder change.  Since decoder states are
    untouched across such frames, the joint logits for a whole window of W
    frames are computable per trip as ONE [B,K,W,J] x [J,V] MXU matmul, and
    the first possible emission frame is found in closed form:

      * blank candidate value at window frame w:
        bv_k(w) = score_k + cumsum_blank_k(w)            (inclusive cumsum)
      * best non-blank candidate value at w:
        nv(w)  = max_{k, v!=blank} score_k + cumsum_blank_k(w-1) + logp_k(w)[v]
      * a frame can emit only if nv(w) >= min_k bv_k(w)  (strict < means the
        K blanks beat every non-blank, so the top-K is provably all-blank).

    Frames strictly before the first such w* are skipped in closed form; the
    EXACT per-frame step (top-K over K*V, parent gather, token append,
    decoder refresh) then runs at w* — so a conservative trigger (ties at
    the boundary) costs one extra trip, never correctness.  The re-sort is a
    stable descending sort, matching the per-frame ``lax.top_k``'s
    descending output with ties broken by lower parent index; iterated
    per-frame sorts and one final sort agree whenever final scores are
    untied (float scores — ties are measure-zero).

    Trip count is max-over-lanes(#emission-frames + ceil(T/W)) — for the
    calibrated bench load (~2.6 tokens/audio-s over T=766 frames) ~9x fewer
    sequential steps than the per-frame scan, each dominated by one
    well-shaped joiner matmul (VERDICT r4 item #2).
    """
    b, t_max, j = enc_proj.shape
    k = state.score.shape[1]
    max_tokens = state.tokens.shape[2]
    blank = dec_cfg.blank_id
    lane = jnp.arange(b)[:, None]
    beam_idx = jnp.arange(k)[None, :]
    w = min(t_max, window)
    dec_tables = decoder_mod.context_tables(dec_params, dec_cfg)

    def cond(carry):
        _, t_ptr = carry
        return jnp.any(t_ptr < enc_lens)

    def body(carry):
        st, t_ptr = carry
        active = t_ptr < enc_lens  # [B]
        start = jnp.clip(t_ptr, 0, t_max - w)  # [B]
        win = jax.vmap(
            lambda e, s_: jax.lax.dynamic_slice_in_dim(e, s_, w, axis=0)
        )(enc_proj, start)  # [B, W, J]
        logits = joiner_mod.joint_logits(
            join_params, win[:, None, :, :], st.dec_proj[:, :, None, :], compute_dtype
        )  # [B, K, W, V]
        v = logits.shape[-1]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        forbid = (jnp.arange(v) == 2) | ((jnp.arange(v) == 1) if extra_skip_sos else False)
        logp = jnp.where(forbid[None, None, None, :], NEG_INF, logp)

        abs_t = start[:, None] + jnp.arange(w)[None, :]  # [B, W]
        in_range = (abs_t >= t_ptr[:, None]) & (abs_t < enc_lens[:, None])  # [B, W]

        blank_lp = jnp.where(in_range[:, None, :], logp[..., blank], 0.0)  # [B,K,W]
        cum_incl = jnp.cumsum(blank_lp, axis=2)  # [B, K, W]
        cum_excl = cum_incl - blank_lp
        bv = st.score[:, :, None] + cum_incl  # [B, K, W] blank candidate values
        nb_lp = logp.at[..., blank].set(NEG_INF)
        nv = st.score[:, :, None, None] + cum_excl[:, :, :, None] + nb_lp  # [B,K,W,V]
        max_nb = jnp.max(nv, axis=(1, 3))  # [B, W]
        min_blank = jnp.min(bv, axis=1)  # [B, W]
        may_emit = (max_nb >= min_blank) & in_range  # [B, W]
        has = jnp.any(may_emit, axis=1)  # [B]
        w_star = jnp.argmax(may_emit, axis=1).astype(jnp.int32)  # 0 when none

        # closed-form skip over the all-blank frames before w* (all of the
        # in-range window when no candidate frame): score += blank cumsum
        skip_cum = jnp.where(
            has[:, None],
            jnp.take_along_axis(cum_excl, w_star[:, None, None], axis=2)[:, :, 0],
            cum_incl[:, :, -1],
        )  # [B, K]
        skip_score = st.score + skip_cum
        # descending stable sort == the per-frame top_k's blank reorder
        perm = jnp.argsort(-skip_score, axis=1, stable=True).astype(jnp.int32)
        score_sorted = jnp.take_along_axis(skip_score, perm, axis=1)

        # exact per-frame step at w* in sorted beam space
        lp_star = jnp.take_along_axis(
            logp, w_star[:, None, None, None], axis=2
        )[:, :, 0, :]  # [B, K, V] (original beam order)
        lp_sorted = jnp.take_along_axis(lp_star, perm[:, :, None], axis=1)
        cand = score_sorted[:, :, None] + lp_sorted  # [B, K, V]
        top_val, top_idx = jax.lax.top_k(cand.reshape(b, k * v), k)
        parent_sorted = top_idx // v
        token = (top_idx % v).astype(jnp.int32)

        emit_lane = has & active  # [B]
        parent_sorted = jnp.where(emit_lane[:, None], parent_sorted, beam_idx)
        token = jnp.where(emit_lane[:, None], token, blank)
        new_score = jnp.where(emit_lane[:, None], top_val, score_sorted)
        parent = jnp.take_along_axis(perm, parent_sorted, axis=1)  # original idx

        def pg(x):  # [B, K, ...] gather along beam axis (original arrays)
            return jnp.take_along_axis(
                x, parent.reshape(b, k, *([1] * (x.ndim - 2))), axis=1
            )

        hyp_p = pg(st.hyp)
        tokens_p = pg(st.tokens)
        ts_p = pg(st.timestamps)
        count_p = pg(st.count.reshape(b, k, 1)).reshape(b, k)
        dec_proj_p = pg(st.dec_proj)

        emit = (token != blank) & emit_lane[:, None]  # [B, K]
        new_hyp = jnp.concatenate([hyp_p[:, :, 1:], token[:, :, None]], axis=2)
        hyp = jnp.where(emit[:, :, None], new_hyp, hyp_p)
        dec_out = decoder_mod.forward_from_tables(
            dec_tables, dec_cfg, hyp.reshape(b * k, -1)
        )
        dec_proj_new = joiner_mod.project_decoder(
            join_params, dec_out, compute_dtype
        ).reshape(b, k, j)
        dec_proj = jnp.where(emit[:, :, None], dec_proj_new, dec_proj_p)

        frame = start + w_star  # [B] absolute emission frame
        can_store = emit & (count_p < max_tokens)
        pos = jnp.minimum(count_p, max_tokens - 1)
        tok_val = jnp.where(can_store, token, tokens_p[lane, beam_idx, pos])
        ts_val = jnp.where(
            can_store, (frame_offset + frame)[:, None], ts_p[lane, beam_idx, pos]
        )
        tokens = tokens_p.at[lane, beam_idx, pos].set(tok_val)
        timestamps = ts_p.at[lane, beam_idx, pos].set(ts_val)
        count = count_p + can_store.astype(jnp.int32)

        # inactive lanes keep their beams entirely (scores included: their
        # skip window is empty so skip_score == score and perm == identity)
        keep_old = ~active
        hyp = jnp.where(keep_old[:, None, None], st.hyp, hyp)
        dec_proj = jnp.where(keep_old[:, None, None], st.dec_proj, dec_proj)
        tokens = jnp.where(keep_old[:, None, None], st.tokens, tokens)
        timestamps = jnp.where(keep_old[:, None, None], st.timestamps, timestamps)
        count = jnp.where(keep_old[:, None], st.count, count)
        score = jnp.where(keep_old[:, None], st.score, new_score)

        scanned_to = jnp.minimum(start + w, enc_lens)
        t_new = jnp.where(active, jnp.where(has, frame + 1, scanned_to), t_ptr)
        return (
            BeamState(hyp, dec_proj, score, tokens, timestamps, count),
            t_new,
        )

    final, _ = jax.lax.while_loop(cond, body, (state, jnp.zeros((b,), jnp.int32)))
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
    final = beam_frames_skip(
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


def nbest_beams(state: BeamState):
    """All K beams per lane, ordered best-first: (tokens [B,K,U],
    timestamps [B,K,U], count [B,K], score [B,K]).  The n-best surface the
    reference's dead HotwordsHelper was sketched against
    (Utils/HotwordsHelper.cs:8-57) — here reachable from both recognizers'
    ``get_nbest_results`` (VERDICT r4 item #7)."""
    order = jnp.argsort(-state.score, axis=1, stable=True)
    return (
        jnp.take_along_axis(state.tokens, order[:, :, None], axis=1),
        jnp.take_along_axis(state.timestamps, order[:, :, None], axis=1),
        jnp.take_along_axis(state.count, order, axis=1),
        jnp.take_along_axis(state.score, order, axis=1),
    )
