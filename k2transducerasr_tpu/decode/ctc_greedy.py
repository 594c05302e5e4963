"""Device-side batched CTC greedy decoding.

Parity with the reference's CTC paths (``OfflineRecognizer.cs:305-430``,
``OnlineRecognizer.cs:220-319``): per-frame argmax over log-probs, collapse
repeats, drop blanks, ``timestamp = t + frame_offset``, track trailing
blanks.  The whole pass is vectorized: one argmax over [B, T, V], a
shifted-compare for repeat collapse, and a cumsum-scatter compaction — no
per-frame host loop.

For streaming, ``prev_token`` carries the last argmax across chunk
boundaries so repeats collapse across chunks exactly like the reference's
rolling loop.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CtcState:
    tokens: Any  # [B, K] int32
    timestamps: Any  # [B, K] int32
    count: Any  # [B] int32
    prev: Any  # [B] int32 — last frame's argmax (for cross-chunk collapse)
    trailing_blanks: Any  # [B] int32


def init_state(batch: int, max_tokens: int = 1024, blank_id: int = 0) -> CtcState:
    return CtcState(
        tokens=jnp.zeros((batch, max_tokens), jnp.int32),
        timestamps=jnp.zeros((batch, max_tokens), jnp.int32),
        count=jnp.zeros((batch,), jnp.int32),
        prev=jnp.full((batch,), blank_id, jnp.int32),
        trailing_blanks=jnp.zeros((batch,), jnp.int32),
    )


def ctc_frames(
    state: CtcState,
    log_probs,  # [B, T, V]
    lens,  # [B]
    frame_offset,  # [B]
    blank_id: int = 0,
) -> CtcState:
    b, t_max, _ = log_probs.shape
    max_tokens = state.tokens.shape[1]
    y = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)  # [B, T]
    valid = jnp.arange(t_max)[None, :] < lens[:, None]  # [B, T]

    prev = jnp.concatenate([state.prev[:, None], y[:, :-1]], axis=1)  # [B, T]
    emit = valid & (y != blank_id) & (y != prev)  # [B, T]

    # compaction: output position of each emission = count + #emits before it;
    # non-emitting frames scatter to an out-of-bounds slot and are dropped,
    # so every in-bounds position is written at most once (deterministic).
    pos = state.count[:, None] + jnp.cumsum(emit, axis=1) - 1  # [B, T]
    pos = jnp.where(emit, pos, max_tokens)
    lane = jnp.arange(b)[:, None]
    ts = frame_offset[:, None] + jnp.arange(t_max)[None, :]
    tokens = state.tokens.at[lane, pos].set(y, mode="drop")
    timestamps = state.timestamps.at[lane, pos].set(ts, mode="drop")
    count = jnp.minimum(state.count + emit.sum(axis=1), max_tokens)

    # prev for next chunk = last VALID frame's argmax (or carried prev)
    last_idx = jnp.maximum(lens - 1, 0)
    any_valid = lens > 0
    new_prev = jnp.where(any_valid, y[jnp.arange(b), last_idx], state.prev)

    # trailing blanks: count of consecutive blank frames at the valid tail
    is_blank = jnp.where(valid, (y == blank_id).astype(jnp.int32), 1)
    # suffix-run length of blanks within valid region:
    rev_pos = jnp.arange(t_max)[None, :]
    nonblank_valid = valid & (y != blank_id)
    last_nonblank = jnp.max(
        jnp.where(nonblank_valid, rev_pos, -1), axis=1
    )  # [B], -1 if none
    tail = jnp.where(
        any_valid,
        lens - 1 - last_nonblank,
        0,
    )
    trailing = jnp.where(
        last_nonblank >= 0, tail, state.trailing_blanks + jnp.where(any_valid, lens, 0)
    )
    del is_blank
    return CtcState(tokens, timestamps, count, new_prev, trailing)


@functools.partial(jax.jit, static_argnames=("blank_id", "max_tokens"))
def ctc_greedy_search(log_probs, lens, blank_id: int = 0, max_tokens: int = 1024):
    """Offline whole-utterance CTC greedy -> (tokens, timestamps, count)."""
    b = log_probs.shape[0]
    state = init_state(b, max_tokens, blank_id)
    final = ctc_frames(state, log_probs, lens, jnp.zeros((b,), jnp.int32), blank_id)
    return final.tokens, final.timestamps, final.count
