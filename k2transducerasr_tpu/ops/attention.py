"""Shared attention helpers.

``rel_shift``: gather-free realization of relative-position score alignment.
The naive form materializes ``idx[t, s]`` and runs ``take_along_axis`` over a
``[B, H, T, T+S-1]`` tensor — a giant arbitrary gather, which TPUs execute
very slowly.  Computing the position scores against DESCENDING relative
positions instead makes the needed element ``y[t, s] = z[t, (T-1) - t + s]``
a pure pad+reshape+slice (the "skew" trick), which XLA lowers to layout ops
at memory speed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def descending_rel_positions(t_q: int, s_kv: int) -> jnp.ndarray:
    """Relative positions r = (S-1) .. -(T-1), descending — the order
    ``rel_shift`` expects the R axis of the score tensor to follow."""
    return jnp.arange(s_kv - 1, -t_q, -1, dtype=jnp.float32)


def chunk_causal_mask(t: int, chunk: int, left: int) -> jnp.ndarray:
    """[t, t] bool self-attention pattern: query i attends key j iff j is in
    [chunk_start(i) - left, chunk_start(i) + chunk) — icefall's streaming
    chunked-attention mask, shared by every causal encoder family."""
    q = jnp.arange(t)[:, None]
    s = jnp.arange(t)[None, :]
    cs = (q // chunk) * chunk
    return (s <= cs + chunk - 1) & (s >= cs - left)


def rel_shift(bd_desc: jnp.ndarray, s_kv: int) -> jnp.ndarray:
    """bd_desc: [..., T, R] position scores where the last axis follows
    ``descending_rel_positions`` (R = T + S - 1).  Returns [..., T, S] with
    out[t, s] = score for relative position (t_global - s), t_global = t +
    (S - T) — i.e. queries are the last T positions of the kv sequence."""
    *lead, t, r = bd_desc.shape
    w = jnp.pad(bd_desc, [(0, 0)] * len(lead) + [(0, 0), (0, 1)])
    flat = w.reshape(*lead, t * (r + 1))
    v = jax.lax.slice_in_dim(flat, t - 1, t - 1 + t * r, axis=-1)
    return v.reshape(*lead, t, r)[..., :s_kv]
