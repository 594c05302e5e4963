"""Device-side batched RNN-T greedy search.

Replaces the reference's host loop (``OfflineRecognizer.cs:127-179`` /
``OnlineRecognizer.cs:141-202``): per frame it paid a joiner ONNX session
dispatch plus an O(V) scalar argmax on the host.  The production path is
``greedy_frames_skip``: a blank-skipping ``lax.while_loop`` whose trip count
scales with emitted tokens, not frames — each trip evaluates the joiner over
a bounded window of frames as one MXU-shaped matmul, finds each lane's first
non-blank argmax, emits there, and refreshes the decoder.  ``greedy_frames``
(one ``lax.scan`` step per frame) survives as the reference/oracle
implementation the skip variant is tested against.  Only final token buffers
reach the host.

Semantics parity (SURVEY.md §5 contract):
  * blank=0, sos/eos=1, unk=2; offline emission skips {blank, unk}
    (OfflineRecognizer.cs:161), online additionally skips 1
    (OnlineRecognizer.cs:181) — expressed via ``extra_skip_sos``;
  * max_sym_per_frame=1 (OfflineRecognizer.cs:19): exactly one emission
    attempt per frame, so the data-dependent while-loop collapses into a
    fixed-length scan — uniform per-step work, ideal for the TPU;
  * timestamps are emission frame indices (+ ``frame_offset`` online);
  * lanes past their ``enc_lens`` or with a full token buffer are masked.

The decoder is re-evaluated UNCONDITIONALLY every frame (uniform work beats
divergent `lax.cond` lanes on TPU); its output is only *used* when the lane
emitted.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from k2transducerasr_tpu.models import decoder as decoder_mod
from k2transducerasr_tpu.models import joiner as joiner_mod


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GreedyState:
    """Per-lane decode state — the device-resident half of the reference's
    OnlineStream (Hyp/Tokens/Timestamps, OnlineStream.cs:9-20).  A pytree so
    it can be carried through jitted chunk steps, donated, and sharded."""

    hyp: Any  # [B, context_size] int32 — last context tokens
    dec_proj: Any  # [B, joiner_dim] f32 — projected decoder output for hyp
    tokens: Any  # [B, K] int32 — emitted tokens
    timestamps: Any  # [B, K] int32 — emission frame index
    count: Any  # [B] int32 — number of emitted tokens
    trailing_blanks: Any  # [B] int32 — consecutive blank frames (endpointing)


def init_state(
    dec_params,
    dec_cfg: decoder_mod.DecoderConfig,
    join_params,
    batch: int,
    max_tokens: int = 1024,
    compute_dtype=None,
) -> GreedyState:
    hyp = jnp.full((batch, dec_cfg.context_size), dec_cfg.blank_id, jnp.int32)
    dec_out = decoder_mod.forward(dec_params, dec_cfg, hyp)
    dec_proj = joiner_mod.project_decoder(join_params, dec_out, compute_dtype)
    return GreedyState(
        hyp=hyp,
        dec_proj=dec_proj,
        tokens=jnp.zeros((batch, max_tokens), jnp.int32),
        timestamps=jnp.zeros((batch, max_tokens), jnp.int32),
        count=jnp.zeros((batch,), jnp.int32),
        trailing_blanks=jnp.zeros((batch,), jnp.int32),
    )


def greedy_frames(
    dec_params,
    dec_cfg: decoder_mod.DecoderConfig,
    join_params,
    state: GreedyState,
    enc_proj,  # [B, T, J] — joiner-projected encoder frames (hoisted matmul)
    enc_lens,  # [B] valid frame counts within this chunk
    frame_offset,  # [B] absolute frame index of enc_proj[:, 0]
    extra_skip_sos: bool = False,
    compute_dtype=None,
) -> GreedyState:
    """Advance greedy decode over ``T`` encoder frames for all lanes."""
    b, t_max, _ = enc_proj.shape
    max_tokens = state.tokens.shape[1]
    blank, unk = dec_cfg.blank_id, 2
    lane = jnp.arange(b)

    # embedding + grouped context conv folded into [V, D] lookup tables once
    # per program — inside the loop the decoder refresh is two row gathers +
    # add + relu instead of a grouped convolution (a high-latency op for
    # [B, ctx, D] operands on TPU)
    dec_tables = decoder_mod.context_tables(dec_params, dec_cfg)

    def step(carry: GreedyState, inp):
        t, enc_t = inp  # enc_t: [B, J]
        logits = joiner_mod.joint_logits(
            join_params, enc_t, carry.dec_proj, compute_dtype
        )
        y = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B]
        valid = t < enc_lens
        is_blankish = (y == blank) | (y == unk) | ((y == 1) if extra_skip_sos else False)
        emit = valid & ~is_blankish & (carry.count < max_tokens)

        new_hyp = jnp.concatenate([carry.hyp[:, 1:], y[:, None]], axis=1)
        hyp = jnp.where(emit[:, None], new_hyp, carry.hyp)
        dec_out = decoder_mod.forward_from_tables(dec_tables, dec_cfg, hyp)
        dec_proj_new = joiner_mod.project_decoder(join_params, dec_out, compute_dtype)
        dec_proj = jnp.where(emit[:, None], dec_proj_new, carry.dec_proj)

        pos = jnp.minimum(carry.count, max_tokens - 1)
        tok_val = jnp.where(emit, y, carry.tokens[lane, pos])
        ts_val = jnp.where(emit, frame_offset + t, carry.timestamps[lane, pos])
        tokens = carry.tokens.at[lane, pos].set(tok_val)
        timestamps = carry.timestamps.at[lane, pos].set(ts_val)
        count = carry.count + emit.astype(jnp.int32)
        trailing = jnp.where(
            valid, jnp.where(emit, 0, carry.trailing_blanks + 1), carry.trailing_blanks
        )
        return (
            GreedyState(hyp, dec_proj, tokens, timestamps, count, trailing),
            (),
        )

    ts = jnp.arange(t_max)
    final, _ = jax.lax.scan(
        step, state, (ts, jnp.swapaxes(enc_proj, 0, 1))
    )
    return final


def greedy_frames_skip(
    dec_params,
    dec_cfg: decoder_mod.DecoderConfig,
    join_params,
    state: GreedyState,
    enc_proj,  # [B, T, J]
    enc_lens,  # [B]
    frame_offset,  # [B]
    extra_skip_sos: bool = False,
    compute_dtype=None,
    window: int = 64,
) -> GreedyState:
    """Blank-skipping greedy decode — identical results to ``greedy_frames``
    in ~#emitted-tokens sequential steps instead of T.

    Key fact: with max_sym_per_frame=1 the decoder state only changes on an
    emission, so between emissions the per-frame argmax is computable for a
    whole window of frames at once as one [B*W, J] x [J, V] MXU matmul.
    Frames up to the first non-blank argmax are final (their decoder input
    was the current hyp); the loop emits there, refreshes the decoder, and
    re-scans from the emission point.  For 30 s utterances that turns a
    750-step ``lax.scan`` of tiny matmuls (latency-bound on TPU) into
    ~#tokens well-shaped ones.

    The per-trip re-scan is bounded to ``window`` frames starting at each
    lane's own pointer (per-lane ``dynamic_slice``), so worst-case cost on
    high-emission input stays O((#tokens + T/W) * B*W*V) instead of the
    unbounded O(#tokens * B*T*V): a lane with no candidate inside its window
    consumes the whole window as blanks and the loop continues.  Trip count
    is max-over-lanes(#tokens + ceil(T/W)).
    """
    b, t_max, _ = enc_proj.shape
    max_tokens = state.tokens.shape[1]
    blank, unk = dec_cfg.blank_id, 2
    lane = jnp.arange(b)
    w = min(t_max, window)
    # see greedy_frames: decoder refresh via folded lookup tables
    dec_tables = decoder_mod.context_tables(dec_params, dec_cfg)

    def cond(carry):
        _, t_ptr = carry
        return jnp.any(t_ptr < enc_lens)

    def body(carry):
        st, t_ptr = carry
        start = jnp.clip(t_ptr, 0, t_max - w)  # [B] window start per lane
        win = jax.vmap(
            lambda e, s: jax.lax.dynamic_slice_in_dim(e, s, w, axis=0)
        )(enc_proj, start)  # [B, W, J]
        logits = joiner_mod.joint_logits(
            join_params, win, st.dec_proj[:, None, :], compute_dtype
        )  # [B, W, V]
        y = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, W]
        blankish = (y == blank) | (y == unk)
        if extra_skip_sos:
            blankish = blankish | (y == 1)
        active = t_ptr < enc_lens
        abs_t = start[:, None] + jnp.arange(w)[None, :]  # [B, W]
        cand = (~blankish) & (abs_t >= t_ptr[:, None]) & (abs_t < enc_lens[:, None])
        has = jnp.any(cand, axis=1)
        first_rel = jnp.argmax(cand, axis=1).astype(jnp.int32)  # 0 when none
        first = start + first_rel  # absolute frame of first candidate
        emit = has & active & (st.count < max_tokens)
        y_emit = y[lane, first_rel]

        new_hyp = jnp.concatenate([st.hyp[:, 1:], y_emit[:, None]], axis=1)
        hyp = jnp.where(emit[:, None], new_hyp, st.hyp)
        dec_out = decoder_mod.forward_from_tables(dec_tables, dec_cfg, hyp)
        dec_proj_new = joiner_mod.project_decoder(join_params, dec_out, compute_dtype)
        dec_proj = jnp.where(emit[:, None], dec_proj_new, st.dec_proj)

        pos = jnp.minimum(st.count, max_tokens - 1)
        tok_val = jnp.where(emit, y_emit, st.tokens[lane, pos])
        ts_val = jnp.where(emit, frame_offset + first, st.timestamps[lane, pos])
        tokens = st.tokens.at[lane, pos].set(tok_val)
        timestamps = st.timestamps.at[lane, pos].set(ts_val)
        count = st.count + emit.astype(jnp.int32)
        # frames fully scanned this trip end at the window edge (or the
        # lane's length); a candidate blocked by a full token buffer is
        # consumed as a blank too (matches the scan)
        scanned_to = jnp.minimum(start + w, enc_lens)
        t_new = jnp.where(active, jnp.where(emit, first + 1, scanned_to), t_ptr)
        # emission resets the blank run; otherwise every frame consumed this
        # trip was (or counts as) a blank
        trailing = jnp.where(
            active,
            jnp.where(emit, 0, st.trailing_blanks + (scanned_to - t_ptr)),
            st.trailing_blanks,
        )
        return (
            GreedyState(hyp, dec_proj, tokens, timestamps, count, trailing),
            t_new,
        )

    final, _ = jax.lax.while_loop(cond, body, (state, jnp.zeros((b,), jnp.int32)))
    return final


@functools.partial(
    jax.jit,
    static_argnames=("dec_cfg", "join_cfg", "max_tokens", "extra_skip_sos", "compute_dtype"),
)
def rnnt_greedy_search(
    dec_params,
    dec_cfg: decoder_mod.DecoderConfig,
    join_params,
    join_cfg: joiner_mod.JoinerConfig,
    enc_out,  # [B, T, encoder_dim]
    enc_lens,  # [B]
    max_tokens: int = 1024,
    extra_skip_sos: bool = False,
    compute_dtype=None,
):
    """Offline whole-utterance greedy: returns (tokens, timestamps, count)."""
    b = enc_out.shape[0]
    enc_proj = joiner_mod.project_encoder(join_params, enc_out, compute_dtype)
    state = init_state(dec_params, dec_cfg, join_params, b, max_tokens, compute_dtype)
    final = greedy_frames_skip(
        dec_params,
        dec_cfg,
        join_params,
        state,
        enc_proj,
        enc_lens,
        jnp.zeros((b,), jnp.int32),
        extra_skip_sos,
        compute_dtype,
    )
    return final.tokens, final.timestamps, final.count


def extract_results(tokens, timestamps, count):
    """Device buffers -> per-lane python lists (the single host transfer).

    One batched ``device_get`` — through the axon tunnel each transfer costs
    a ~25 ms round trip, so three separate gets triple the readback cost."""
    tokens, timestamps, count = jax.device_get((tokens, timestamps, count))
    out = []
    for b in range(tokens.shape[0]):
        n = int(count[b])
        out.append((tokens[b, :n].tolist(), timestamps[b, :n].tolist()))
    return out
