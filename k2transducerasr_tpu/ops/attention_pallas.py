"""Fused relative-position attention probabilities — Pallas TPU kernel.

Why this kernel exists: the XLA path (models/zipformer2._attn_weights)
materializes, per layer, the position-score tensor ``pos_full [B, H, T, R]``
(R = T+S-1) in f32 and then realizes the skew ``out[t, s] = z[t, (S-1)-t+s]``
via pad+reshape+slice.  On TPU, XLA lowers that merged reshape of a tiled
[B, H, T, R+1] array into a serialized per-(batch, head) loop of
dynamic-update-slices through HBM scratch — measured at ~230 ms of a 367 ms
offline zipformer2 forward (xprof: 41% of device time in dynamic-update-slice
over f32[4,16,1532*3064] buffers, plus ~2.4 GB of HBM temporaries).

TWO kernels share one score/mask/skew body, computed per (batch, head,
query-block) grid cell entirely in VMEM:

    scores = q @ k^T  +  skew(pos_q @ pos_k^T)         [BT, S]  (f32)
    probs  = softmax(mask(scores))                      -> out_dtype
    ctx    = probs @ v                                  -> out_dtype   (ctx kernel)

``relpos_attn_probs`` writes the probs (one HBM write, consumers read them);
``relpos_attn_ctx`` additionally consumes the probs against a value block
IN VMEM, so nothing [T, S]-sized ever touches HBM.

Which to use is a MEASURED trade, not a principle (paired xprof module
traces of the flagship offline program, r5):
  * single-consumer attention (conformer): ctx is a strict win — the same
    one score compute, and the probs write + consumer read disappear.
  * multi-consumer attention (zipformer2's self_attn1/self_attn2/
    nonlin_attention, zipformer v1's two value paths): probs wins, 29.9 ms
    vs 37.5 ms whole-program — each score compute costs ~1.3 ms/call at
    stack-0 shapes (the pd=4 / qd=32 matmuls underutilize the MXU's 128-
    deep contraction) while the probs HBM traffic it would avoid is only
    ~1.2 ms/layer and largely fuses into the consumers.  Round 4's
    "probs re-read is the last 2x" hypothesis (BASELINE.md:172-177) did
    not survive the head-to-head; K2T_ATTN_FUSE=ctx re-runs it.

The skew is realized with ``pltpu.roll``'s per-row strided rotate (row t
rolls right by ``c0 + t`` where ``c0 = (i*BT + 1 - S) mod R_pad``), which maps
``m[t, (S-1) - (i*BT + t) + s]`` into position ``[t, s]`` — the exact
relation ``ops/attention.rel_shift`` realizes (descending relative
positions).  Nothing [T, S]- or [T, R]-sized ever touches HBM except the
final probs block, written once in ``out_dtype`` (bf16 under mixed
precision — numerically identical to the XLA path, which casts the f32
probs to bf16 at every consumer anyway).

Semantics match ``_attn_weights`` on all three product paths:
  * offline non-causal — key-padding mask (columns >= lens[b] get
    ``NEG_INF``).  Query-side masking is intentionally dropped: invalid
    query rows only influence invalid output rows, which every caller
    zeroes (see models/zipformer2._stack_forward / _conv_module).
  * offline chunk-causal — the static per-block chunk mask (``chunk``/
    ``left``) computed from iota in-kernel, same skew.
  * streaming — per-lane ``kv_start`` marks the first written cache slot
    ([cache | chunk] key layout; earlier columns are unseeded history).

Reference context: the C# reference executes attention inside opaque ONNX
graphs (OnlineProjOfZipformer2.cs); this kernel is the TPU-native equivalent
of ONNX Runtime's fused attention op, specialized to icefall's compact
rel-pos formulation.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9  # must match ops/layers.NEG_INF for bit-parity with XLA path


def _masked_scores(lens_ref, start_ref, q_ref, k_ref, pq_ref, pk_ref, *,
                   bt, t, s, r_pad, chunk, left, pos_vpu=False):
    """Shared body: masked rel-pos attention scores [BT, S_blk] in f32 for
    one (batch, head, query-block) grid cell — used by both the probs kernel
    and the fused probs-consumer (ctx) kernel."""
    b = pl.program_id(0)
    i = pl.program_id(2)

    q = q_ref[0, 0]  # [BT, qd]
    k = k_ref[0, 0]  # [S_blk, qd]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BT, S_blk]
    s_blk = scores.shape[1]

    pq = pq_ref[0, 0]  # [BT, pd]
    pk = pk_ref[0]  # [pd, R_pad]
    if pos_vpu:
        # pd is 4: a K=4 MXU dot runs the systolic array at ~3% utilization;
        # pd broadcast multiply-adds on the VPU can beat it (A/B measured in
        # benchmarks/attn_ctx_sweep.py — kept behind a flag either way)
        pd = pq.shape[1]
        pqf = pq.astype(jnp.float32)
        pkf = pk.astype(jnp.float32)
        m = pqf[:, 0:1] * pkf[0:1, :]
        for j in range(1, pd):
            m = m + pqf[:, j : j + 1] * pkf[j : j + 1, :]
    else:
        m = jax.lax.dot_general(
            pq, pk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [BT, R_pad]
    # roll right by (c0 + tl) on row tl: out[tl, j] = m[tl, (j - c0 - tl) mod
    # R_pad] = m[tl, (T-1) - (i*BT + tl) + j] for j < S — ops/attention.
    # rel_shift's exact relation (queries are the LAST T positions of the kv
    # sequence, so the offset is T-1, not S-1; they only coincide offline
    # where T == S).  Indices stay in [0, R) so the modulus never wraps into
    # the zero padding for valid columns.
    c0 = (i * bt + 1 - t) % r_pad
    pos = pltpu.roll(m, shift=c0, axis=1, stride=1, stride_axis=0)
    scores = scores + pos[:, :s_blk]

    col = jax.lax.broadcasted_iota(jnp.int32, (bt, s_blk), 1)
    limit = jnp.minimum(lens_ref[b], s)
    valid = (col < limit) & (col >= start_ref[b])
    if chunk:
        # static chunk-causal pattern (t == s self-attention): query row gq
        # attends keys in [chunk_start - left, chunk_start + chunk - 1]
        gq = jax.lax.broadcasted_iota(jnp.int32, (bt, s_blk), 0) + i * bt
        cs_start = (gq // chunk) * chunk
        valid &= (col <= cs_start + chunk - 1) & (col >= cs_start - left)
    return jnp.where(valid, scores, NEG_INF)


def _kernel(lens_ref, start_ref, q_ref, k_ref, pq_ref, pk_ref, out_ref, *,
            bt, t, s, r_pad, out_dtype, chunk, left, pos_vpu=False):
    scores = _masked_scores(
        lens_ref, start_ref, q_ref, k_ref, pq_ref, pk_ref,
        bt=bt, t=t, s=s, r_pad=r_pad, chunk=chunk, left=left, pos_vpu=pos_vpu,
    )
    out_ref[0, 0] = jax.nn.softmax(scores, axis=-1).astype(out_dtype)


def _kernel_ctx(lens_ref, start_ref, q_ref, k_ref, pq_ref, pk_ref, v_ref,
                out_ref, *, bt, t, s, r_pad, out_dtype, chunk, left):
    scores = _masked_scores(
        lens_ref, start_ref, q_ref, k_ref, pq_ref, pk_ref,
        bt=bt, t=t, s=s, r_pad=r_pad, chunk=chunk, left=left,
    )
    probs = jax.nn.softmax(scores, axis=-1)
    v = v_ref[0, 0]  # [S_blk, vd]
    # cast f32 probs to the value dtype before the dot, f32 accumulation —
    # exactly the XLA consumers' einsum("bhts,bshd->bthd",
    # probs.astype(v.dtype), v, preferred_element_type=f32)
    ctx = jax.lax.dot_general(
        probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0, 0] = ctx.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_t", "interpret", "out_dtype", "chunk", "left", "pos_vpu"),
)
def relpos_attn_probs(
    q, k, pos_q, pos_k, lens, block_t: int = 256, interpret: bool = False,
    out_dtype=None, chunk: int = 0, left: int = 0, kv_start=None,
    pos_vpu: bool = True,
):
    """Fused softmax(q@k^T + rel_shift(pos_q@pos_k^T)) with key-side masks.

    q:     [B, T, H, qd]   queries (compute dtype)
    k:     [B, S, H, qd]   keys
    pos_q: [B, T, H, pd]   position-query projections
    pos_k: [R, H, pd]      projected compact rel-pos table, R = T+S-1,
                           DESCENDING relative positions (the layout
                           ops/attention.rel_shift consumes)
    lens:  [B] int32       valid key counts (None = all S valid)
    chunk/left:            static chunk-causal self-attention pattern
                           (requires T == S): query gq attends keys in
                           [(gq//chunk)*chunk - left, (gq//chunk)*chunk + chunk).
                           chunk=0 disables.
    kv_start: [B] int32    first valid key column per lane (streaming cache
                           gating: positions before it are unwritten history).
    Returns probs [B, H, T, S] in ``out_dtype`` (default: q.dtype).
    """
    (qh, kh, pqh, pkh), (lens, kv_start), (bt, r_pad) = _prep_inputs(
        q, k, pos_q, pos_k, lens, kv_start, block_t, chunk
    )
    b, t, h, qd = q.shape
    s = k.shape[1]
    out_dtype = out_dtype or q.dtype

    grid = (b, h, pl.cdiv(t, bt))
    kernel = functools.partial(
        _kernel, bt=bt, t=t, s=s, r_pad=r_pad, out_dtype=out_dtype, chunk=chunk,
        left=left, pos_vpu=pos_vpu,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, bt, qd), lambda bi, hi, ii, *_: (bi, hi, ii, 0)),
                pl.BlockSpec((1, 1, s, qd), lambda bi, hi, ii, *_: (bi, hi, 0, 0)),
                pl.BlockSpec((1, 1, bt, pos_q.shape[-1]), lambda bi, hi, ii, *_: (bi, hi, ii, 0)),
                pl.BlockSpec((1, pos_k.shape[-1], r_pad), lambda bi, hi, ii, *_: (hi, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, bt, s), lambda bi, hi, ii, *_: (bi, hi, ii, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, t, s), out_dtype),
        interpret=interpret,
    )(lens, kv_start, qh, kh, pqh, pkh)


def _prep_inputs(q, k, pos_q, pos_k, lens, kv_start, block_t, chunk):
    """Shared contract checks + head-major layout prep for both kernels."""
    b, t, h, qd = q.shape
    s = k.shape[1]
    r = pos_k.shape[0]
    # ValueError (not assert): these are API contracts that must survive
    # python -O — a mismatch would silently misalign position scores
    if r != t + s - 1:
        raise ValueError(f"pos_k rows {r} != t+s-1 ({t}+{s}-1)")
    if chunk and t != s:
        raise ValueError(f"chunk-causal requires t == s, got t={t} s={s}")
    bt = min(block_t, max(8, t))

    if lens is None:
        lens = jnp.full((b,), s, jnp.int32)
    lens = lens.astype(jnp.int32)
    if kv_start is None:
        kv_start = jnp.zeros((b,), jnp.int32)
    kv_start = kv_start.astype(jnp.int32)

    # head-major layouts so each block's minor dims are (time, feature)
    qh = q.transpose(0, 2, 1, 3)  # [B, H, T, qd]
    kh = k.transpose(0, 2, 1, 3)  # [B, H, S, qd]
    pqh = pos_q.transpose(0, 2, 1, 3)  # [B, H, T, pd]
    r_pad = -(-r // 128) * 128
    pkh = jnp.pad(pos_k, ((0, r_pad - r), (0, 0), (0, 0))).transpose(1, 2, 0)  # [H, pd, R_pad]
    return (qh, kh, pqh, pkh), (lens, kv_start), (bt, r_pad)


@functools.partial(
    jax.jit, static_argnames=("block_t", "interpret", "out_dtype", "chunk", "left")
)
def relpos_attn_ctx(
    q, k, pos_q, pos_k, v, lens, block_t: int = 128, interpret: bool = False,
    out_dtype=None, chunk: int = 0, left: int = 0, kv_start=None,
):
    """Fused softmax(q@k^T + rel_shift(pos_q@pos_k^T)) @ v — the probs are
    consumed in VMEM and NEVER materialize in HBM.

    This is the probs-consumer half of the round-4 frontier (BASELINE.md:
    172-177): the zipformer2 layer re-reads one [B,H,T,S] probs tensor from
    HBM three times (self_attn1 / self_attn2 / nonlin_attention).  Score
    matmuls are cheap relative to probs IO (qd=32 per head), so each
    consumer recomputes scores+softmax per (batch, head, query-block) grid
    cell and immediately multiplies with its value block; per cell the HBM
    traffic is q/k/pos blocks + v [S, vd] + ctx [BT, vd] — nothing
    [T, S]-sized is ever written or read.

    Same inputs/mask semantics as ``relpos_attn_probs``, plus:
    v: [B, S, H, vd]  per-head values (vd may differ from qd; for the
       nonlin-attention consumer call with H=1 slices and vd=hidden).
    Returns ctx [B, T, H, vd] in ``out_dtype`` (default q.dtype) — equal to
    ``einsum("bhts,bshd->bthd", probs.astype(v.dtype), v)`` with f32
    accumulation, cast to out_dtype.
    """
    (qh, kh, pqh, pkh), (lens, kv_start), (bt, r_pad) = _prep_inputs(
        q, k, pos_q, pos_k, lens, kv_start, block_t, chunk
    )
    b, t, h, qd = q.shape
    s = k.shape[1]
    vd = v.shape[-1]
    if v.shape != (b, s, h, vd):
        raise ValueError(f"v shape {v.shape} != {(b, s, h, vd)}")
    out_dtype = out_dtype or q.dtype
    vh = v.transpose(0, 2, 1, 3)  # [B, H, S, vd]

    grid = (b, h, pl.cdiv(t, bt))
    kernel = functools.partial(
        _kernel_ctx, bt=bt, t=t, s=s, r_pad=r_pad, out_dtype=out_dtype,
        chunk=chunk, left=left,
    )
    ctx = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, bt, qd), lambda bi, hi, ii, *_: (bi, hi, ii, 0)),
                pl.BlockSpec((1, 1, s, qd), lambda bi, hi, ii, *_: (bi, hi, 0, 0)),
                pl.BlockSpec((1, 1, bt, pos_q.shape[-1]), lambda bi, hi, ii, *_: (bi, hi, ii, 0)),
                pl.BlockSpec((1, pos_k.shape[-1], r_pad), lambda bi, hi, ii, *_: (hi, 0, 0)),
                pl.BlockSpec((1, 1, s, vd), lambda bi, hi, ii, *_: (bi, hi, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, bt, vd), lambda bi, hi, ii, *_: (bi, hi, ii, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, t, vd), out_dtype),
        interpret=interpret,
    )(lens, kv_start, qh, kh, pqh, pkh, vh)
    return ctx.transpose(0, 2, 1, 3)  # [B, T, H, vd]


def mask_from_specs(b, t, s, pad_lens=None, chunk_left=None, kv_start=None):
    """XLA-fallback boolean mask [B, T, S] equivalent to the kernel's mask
    specs (used by every encoder family when ``flash_attn_mode() == 'off'``):
    ``pad_lens`` adds the query+key padding mask (the kernel masks only keys
    — the difference lives on invalid query rows, which callers zero),
    ``chunk_left`` the static chunk-causal pattern (T == S), ``kv_start``
    per-lane first-valid-column gating.  Returns None if no spec is set."""
    from k2transducerasr_tpu.ops.attention import chunk_causal_mask
    from k2transducerasr_tpu.ops.layers import length_mask

    mask = None
    if pad_lens is not None:
        mask = length_mask(pad_lens, s)[:, None, :] & length_mask(pad_lens, t)[:, :, None]
    if chunk_left is not None:
        cmask = chunk_causal_mask(t, chunk_left[0], chunk_left[1])[None]
        mask = cmask if mask is None else (mask & cmask)
    if kv_start is not None:
        smask = jnp.broadcast_to(
            jnp.arange(s)[None, None, :] >= kv_start[:, None, None], (b, t, s)
        )
        mask = smask if mask is None else (mask & smask)
    return mask


def flash_attn_mode() -> str:
    """'on' | 'off' | 'interpret' — whether _attn_weights should use the
    Pallas kernel.  Defaults to on for TPU backends; K2T_FLASH_ATTN=0 forces
    the XLA path, =interpret forces interpreter mode (CPU testing)."""
    env = os.environ.get("K2T_FLASH_ATTN", "").lower()
    if env in ("0", "off", "false"):
        return "off"
    if env == "interpret":
        return "interpret"
    if env in ("1", "on", "true"):
        return "on"
    return "on" if jax.default_backend() == "tpu" else "off"
