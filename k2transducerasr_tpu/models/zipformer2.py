"""Zipformer2 encoder (icefall "zipformer" 2023), offline + streaming.

The reference drives this as opaque ONNX graphs with per-layer streaming
caches (``OnlineProjOfZipformer2.cs``): ``cached_key_<j> [left,B,H*qd]``,
``cached_nonlin_attn_<j> [1,B,left,3D/4]``, ``cached_val1/2_<j>
[left,B,H*vd]``, ``cached_conv1/2_<j> [B,D,k//2]``, plus ``embed_states`` and
``processed_lens`` (metadata keys: ``OnlineModel.cs:51-94``).  Those cache
inventories are the structural spec this module implements natively.

Architecture (pinned to icefall zipformer.py, 2023 "zipformer" recipe):
  * encoder_embed: three 3x3 convs (time stride 2 overall, freq 80 -> 19) ->
    ConvNeXt block (depthwise 7x7, hidden ratio 3, SwooshL) -> linear over
    the channel-major [C, F] flatten -> BiasNorm.  Streaming windows carry a
    3-stage-frame ConvNeXt cache and a 3-stage-frame LOOKAHEAD inside the
    window (icefall streaming export: T = decode_chunk_len + 13, initial
    ``embed_states`` zeros — the reference's [B,128,3,19] tensor,
    ``OnlineProjOfZipformer2.cs:58-62``).
  * 6 stacks at downsampling factors (1,2,4,8,4,2) with per-stack dims;
    SimpleDownsample (learned softmax window weights over each window,
    tail window padded by repeating the last frame) / SimpleUpsample
    (repeat) and a learned per-channel Bypass around each stack.
  * each layer computes attention WEIGHTS once (query/key head dim 32,
    pos-head scores against the compact rel-pos encoding) shared by
    self_attn1, self_attn2 (separate value/out projections) and a
    nonlin-attention gate (head 0 only); two conv modules — plain SAME
    depthwise offline, ChunkCausalDepthwiseConv1d (causal half-kernel conv
    + per-chunk SAME conv with learned edge scales) when causal; three
    SwooshL feed-forwards; op order ff1, nonlin_attn, attn1, conv1, ff2,
    bypass_mid, attn2, conv2, ff3, BiasNorm, bypass.
  * outputs of all stacks are channel-stitched to max(dims) then
    downsampled x2 -> final frame rate = raw/4.

Streaming == offline-chunked is exact BY CONSTRUCTION here: the offline
causal path applies the same per-chunk conv windows (left cache + right
zero-pad) and chunk-causal attention masks the streaming path uses; the
test oracle asserts agreement to f32 accumulation tolerance (rtol/atol
3e-3, tests/test_zipformer2.py — the two paths schedule reductions
differently, so bitwise equality is not expected).

The compact relative positional encoding is icefall's exact formula
(CompactRelPositionalEncoding: log compression with compression_length
sqrt(pos_dim), atan squashing with length_scale pos_dim/(2*pi), integer
frequencies 1..pos_dim/2, interleaved cos/sin, last column pinned to 1.0),
laid out in the descending order ops/attention.rel_shift consumes — which is
row-for-row the tensor icefall's linear_pos is applied to.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from k2transducerasr_tpu.ops import layers as L


@dataclasses.dataclass(frozen=True)
class Zipformer2Config:
    feature_dim: int = 80
    num_encoder_layers: tuple = (2, 2, 3, 4, 3, 2)
    encoder_dims: tuple = (192, 256, 384, 512, 384, 256)
    downsampling_factors: tuple = (1, 2, 4, 8, 4, 2)
    num_heads: tuple = (4, 4, 4, 8, 4, 4)
    feedforward_dims: tuple = (512, 768, 1024, 1536, 1024, 768)
    cnn_module_kernels: tuple = (31, 31, 15, 15, 15, 31)
    query_head_dim: int = 32
    value_head_dim: int = 12
    pos_head_dim: int = 4
    pos_dim: int = 48
    # embed conv channels
    embed_channels: tuple = (8, 32, 128)
    causal: bool = False
    chunk_size: int = 32  # encoder-rate (post-embed) frames per step
    left_context_frames: int = 128  # encoder-rate frames of attention memory

    @property
    def num_stacks(self) -> int:
        return len(self.encoder_dims)

    @property
    def output_downsampling_factor(self) -> int:
        return 2

    @property
    def encoder_out_dim(self) -> int:
        return max(self.encoder_dims)

    def embed_len(self, t_raw: int) -> int:
        """Raw frames -> encoder-rate frames through the embed conv stack
        (receptive field 9, stride 2): t0 = (t_raw - 7) // 2."""
        return (t_raw - 7) // 2

    def subsampled_len(self, t_raw: int) -> int:
        """Raw frames -> final output frames (embed then /2)."""
        t0 = self.embed_len(t_raw)
        return -(-t0 // self.output_downsampling_factor)

    @property
    def decode_chunk_len(self) -> int:
        return 2 * self.chunk_size

    @property
    def embed_cache_len(self) -> int:
        """Stage (post-conv-stack) frames cached across streaming windows:
        the ConvNeXt half-kernel.  icefall's ``embed_states`` (zeros at
        stream start), the reference's [B,128,3,19]
        (``OnlineProjOfZipformer2.cs:58-62``)."""
        return 3

    @property
    def embed_freq_out(self) -> int:
        """Frequency width after the conv stack (80 -> 39 -> 19)."""
        f2 = (self.feature_dim - 3) // 2 + 1
        return (f2 - 3) // 2 + 1

    @property
    def chunk_input_len(self) -> int:
        """Raw feature frames per streaming window: 2*chunk + 13 — the conv
        stack's receptive field 9 (stride 2) plus 2*3 raw frames so the
        ConvNeXt's 3-stage-frame LOOKAHEAD stays inside the window; the
        3-stage-frame cache supplies its left context.  Equals the
        reference's metadata ``T`` (= decode_chunk_len + pad_length,
        ``OnlineModel.cs:37-49`` — e.g. T=45 for chunk 32)."""
        return 2 * self.chunk_size + 13

    def stack_chunk(self, i: int) -> int:
        return self.chunk_size // self.downsampling_factors[i]

    def stack_left(self, i: int) -> int:
        return max(1, self.left_context_frames // self.downsampling_factors[i])


Config = Zipformer2Config


def output_dim(cfg: Zipformer2Config) -> int:
    return cfg.encoder_out_dim


def output_chunk_len(cfg: Zipformer2Config) -> int:
    """Output frames per streaming step (final /2 downsample)."""
    return cfg.chunk_size // cfg.output_downsampling_factor


# ---------------------------------------------------------------------------
# Embed (Conv2dSubsampling + ConvNeXt)
# ---------------------------------------------------------------------------


def _init_embed(key, cfg: Zipformer2Config):
    c1, c2, c3 = cfg.embed_channels
    ks = jax.random.split(key, 6)
    return {
        "conv1": L.init_conv2d(ks[0], 1, c1, (3, 3)),
        "conv2": L.init_conv2d(ks[1], c1, c2, (3, 3)),
        "conv3": L.init_conv2d(ks[2], c2, c3, (3, 3)),
        "convnext_dw": L.init_conv2d(ks[3], c3, c3, (7, 7)),  # depthwise via groups trick below
        # icefall ConvNeXt hidden_ratio = 3
        "convnext_pw1": L.init_linear(ks[4], c3, 3 * c3),
        "convnext_pw2": L.init_linear(jax.random.fold_in(ks[4], 1), 3 * c3, c3),
        "out": L.init_linear(ks[5], c3 * cfg.embed_freq_out, cfg.encoder_dims[0]),
        "out_norm": L.init_biasnorm(cfg.encoder_dims[0]),
    }


def _embed_conv_stack(p, x, compute_dtype=None):
    """Conv 3-stack: x [B, T, F] -> stage tensor [B, (T-7)//2, F', c3].

    Time layout: conv1 (VALID, s=1): T-2; conv2 (VALID, s=2): (T-5)//2+1;
    conv3 (VALID, s=1 time): -2 => total (T-7)//2, receptive field 9,
    stride 2.  Freq (pad 1 on conv1): 80 -> 80 -> 39 -> 19.  SwooshR after
    each conv (icefall Conv2dSubsampling)."""
    # conv1 as a banded matmul: same products/f32 accumulation, avoids the
    # ~2.5 ms of XLA layout copies around the conv form (ops/layers
    # apply_conv2d_c1_banded docstring has the measurement)
    h = L.swoosh_r(L.apply_conv2d_c1_banded(p["conv1"], x, compute_dtype=compute_dtype))
    h = L.swoosh_r(L.apply_conv2d_banded_s2(p["conv2"], h, compute_dtype=compute_dtype))
    h = L.swoosh_r(L.apply_conv2d(p["conv3"], h, strides=(1, 2), compute_dtype=compute_dtype))
    return h


def _embed_tail(p, h, compute_dtype=None):
    """ConvNeXt (time-VALID over a pre-extended stage tensor) + out linear +
    BiasNorm.  h: [B, T0+6, F', c3] -> [B, T0, dims[0]].

    The caller supplies 3 extra stage frames on EACH side (zeros offline,
    cache/lookahead streaming), so one code path serves both and they agree
    exactly.  The flatten before ``out`` is channel-major [C, F] — icefall's
    ``x.transpose(1, 2).reshape(b, t, c * f)``."""
    residual = h[:, 3:-3]
    hh = jnp.pad(h, ((0, 0), (0, 0), (3, 3), (0, 0)))  # freq SAME
    w = p["convnext_dw"]["w"]  # [7, 7, c3, c3] — applied depthwise (diagonal)
    dw = _depthwise2d(hh, w, p["convnext_dw"].get("b"), compute_dtype)
    hh = L.apply_linear(p["convnext_pw1"], dw, compute_dtype)
    hh = L.swoosh_l(hh)
    hh = L.apply_linear(p["convnext_pw2"], hh, compute_dtype)
    h = residual + hh
    b, t0, f, c = h.shape
    h = jnp.swapaxes(h, 2, 3).reshape(b, t0, c * f)
    h = L.apply_linear(p["out"], h, compute_dtype)
    return L.apply_biasnorm(p["out_norm"], h)


def _embed_forward(p, cfg: Zipformer2Config, x, compute_dtype=None, x_lens=None):
    """Offline embed: x [B, T, F] -> [B, (T-7)//2, dims[0]] (ConvNeXt SAME
    in time via 3 zero stage frames each side — icefall's padding=(3,3))."""
    h = _embed_conv_stack(p, x, compute_dtype)
    if x_lens is not None:
        # zero stage frames derived from padding so they cannot bleed into
        # valid frames through the ConvNeXt receptive field
        stage_valid = (x_lens - 7) // 2
        mask = L.length_mask(jnp.maximum(stage_valid, 0), h.shape[1])
        h = jnp.where(mask[:, :, None, None], h, 0.0)
    h = jnp.pad(h, ((0, 0), (3, 3), (0, 0), (0, 0)))
    return _embed_tail(p, h, compute_dtype)


def _depthwise2d(x, w, b, compute_dtype=None):
    """Depthwise 7x7 conv (VALID): x [B, T, F, C], w [7, 7, C, C] (only the
    per-channel diagonal is used — initialized dense for importer layout,
    applied depthwise).

    Stays on ``conv_general_dilated``: a 49-term shifted multiply-add
    variant was tried in round 4 and measured 6x WORSE (20.9 ms vs ~3.3 ms
    of layout copies) — 2-D shifts along the narrow frequency (sublane)
    axis do not vectorize, unlike the 1-D depthwise fast path in
    ops.layers.apply_conv1d whose shifts run along the major time axis."""
    c = x.shape[-1]
    dw = jnp.einsum("hwcc->hwc", w)[:, :, None, :]  # HWIO [7,7,1,C] diagonal
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        dw = dw.astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        x,
        dw,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b
    if compute_dtype is not None:
        y = y.astype(compute_dtype)  # see ops.layers.apply_linear: bandwidth
    return y


# ---------------------------------------------------------------------------
# Compact relative positional encoding
# ---------------------------------------------------------------------------


def _compact_rel_pos(t_q: int, s_kv: int, pos_dim: int, length_factor: float = 1.0):
    """[R, pos_dim] compact relative positional embedding — icefall's exact
    CompactRelPositionalEncoding formula.

    Our R axis follows DESCENDING relative positions r = s_kv-1 .. -(t_q-1)
    (the layout ops/attention.rel_shift expects, rel = query - key); icefall
    stores its ``pe`` by ASCENDING key-minus-query position and gathers index
    (T-1) - t + s — the very same skew rel_shift realizes — so row j here is
    the embedding of icefall position p_j = -r_j, making this tensor equal
    ROW-FOR-ROW the one icefall's linear_pos consumes.

    Formula (icefall zipformer.py CompactRelPositionalEncoding.extend_pe):
    log compression with compression_length sqrt(pos_dim), atan squashing
    with length_scale length_factor*pos_dim/(2*pi), integer frequencies
    1..pos_dim/2, columns interleaved cos (even) / sin (odd), and the last
    column pinned to 1.0 as a bias term.
    """
    from k2transducerasr_tpu.ops.attention import descending_rel_positions

    p = -descending_rel_positions(t_q, s_kv)  # ascending -(s_kv-1)..(t_q-1)
    comp = math.sqrt(pos_dim)
    x_compressed = comp * jnp.sign(p) * (jnp.log(jnp.abs(p) + comp) - math.log(comp))
    length_scale = length_factor * pos_dim / (2.0 * math.pi)
    x_atan = jnp.arctan(x_compressed / length_scale)
    freqs = 1.0 + jnp.arange(pos_dim // 2, dtype=jnp.float32)
    ang = x_atan[:, None] * freqs[None, :]
    pe = jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=2).reshape(-1, pos_dim)
    return pe.at[:, -1].set(1.0)  # [R, pos_dim]


# ---------------------------------------------------------------------------
# Layer sub-modules
# ---------------------------------------------------------------------------


def _init_ff(key, dim, ff):
    k1, k2 = jax.random.split(key)
    return {"w1": L.init_linear(k1, dim, ff), "w2": L.init_linear(k2, ff, dim)}


def _apply_ff(p, x, compute_dtype):
    return L.apply_linear(p["w2"], L.swoosh_l(L.apply_linear(p["w1"], x, compute_dtype)), compute_dtype)


def _init_attn_weights(key, dim, heads, qd, pd, pos_dim):
    k1, k2 = jax.random.split(key)
    return {
        "in_proj": L.init_linear(k1, dim, heads * (2 * qd + pd)),
        "pos_proj": L.init_linear(k2, pos_dim, heads * pd, bias=False),
    }


def _init_self_attn(key, dim, heads, vd):
    k1, k2 = jax.random.split(key)
    return {
        "v": L.init_linear(k1, dim, heads * vd),
        "out": L.init_linear(k2, heads * vd, dim),
    }


def _init_nonlin_attn(key, dim):
    hidden = 3 * dim // 4
    k1, k2 = jax.random.split(key)
    return {
        "in_proj": L.init_linear(k1, dim, 3 * hidden),
        "out": L.init_linear(k2, hidden, dim),
    }


def _init_conv_mod(key, dim, kernel, causal: bool):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {
        "in_proj": L.init_linear(k1, dim, 2 * dim),
        "out": L.init_linear(k3, dim, dim),
    }
    if causal:
        # icefall ChunkCausalDepthwiseConv1d: a causal depthwise conv of
        # half width plus a within-chunk SAME depthwise conv whose output is
        # scaled by learned per-position edge corrections
        p["causal_dw"] = L.init_conv1d(k2, dim, dim, kernel=kernel // 2 + 1, groups=dim)
        p["chunk_dw"] = L.init_conv1d(k4, dim, dim, kernel=kernel, groups=dim)
        p["chunk_scale"] = jnp.zeros((2, kernel, dim))  # [left/right, k, D]
    else:
        p["dw"] = L.init_conv1d(k2, dim, dim, kernel=kernel, groups=dim)
    return p


def _chunkwise_scale(scale, chunk: int):
    """scale [2, k, D] -> [chunk, D]: 1 + left-edge + right-edge corrections
    (icefall ChunkCausalDepthwiseConv1d._get_chunk_scale)."""
    left, right = scale[0], scale[1]
    k, d = left.shape
    if chunk < k:
        l_e, r_e = left[:chunk], right[k - chunk :]
    else:
        pad = jnp.zeros((chunk - k, d), left.dtype)
        l_e = jnp.concatenate([left, pad], axis=0)
        r_e = jnp.concatenate([pad, right], axis=0)
    return 1.0 + l_e + r_e


def _init_layer(key, cfg: Zipformer2Config, si: int):
    dim = cfg.encoder_dims[si]
    heads = cfg.num_heads[si]
    ff = cfg.feedforward_dims[si]
    kernel = cfg.cnn_module_kernels[si]
    ks = jax.random.split(key, 10)
    return {
        "attn_weights": _init_attn_weights(
            ks[0], dim, heads, cfg.query_head_dim, cfg.pos_head_dim, cfg.pos_dim
        ),
        "self_attn1": _init_self_attn(ks[1], dim, heads, cfg.value_head_dim),
        "self_attn2": _init_self_attn(ks[2], dim, heads, cfg.value_head_dim),
        "nonlin_attn": _init_nonlin_attn(ks[3], dim),
        "conv1": _init_conv_mod(ks[4], dim, kernel, cfg.causal),
        "conv2": _init_conv_mod(ks[5], dim, kernel, cfg.causal),
        "ff1": _init_ff(ks[6], dim, ff),
        "ff2": _init_ff(ks[7], dim, ff),
        "ff3": _init_ff(ks[8], dim, ff),
        "norm": L.init_biasnorm(dim),
        "bypass": jnp.full((dim,), 0.5),
        "bypass_mid": jnp.full((dim,), 0.5),
    }


def _init_stack(key, cfg: Zipformer2Config, si: int):
    n = cfg.num_encoder_layers[si]
    ks = jax.random.split(key, n + 2)
    p = {"layers": [_init_layer(ks[j], cfg, si) for j in range(n)]}
    ds = cfg.downsampling_factors[si]
    if ds > 1:
        # only DownsampledZipformer2Encoder has downsample + out_combiner;
        # ds=1 stacks are bare Zipformer2Encoders in icefall
        p["downsample_weights"] = jnp.zeros((ds,))
        p["bypass_out"] = jnp.full((cfg.encoder_dims[si],), 0.5)
    return p


def init_params(key, cfg: Zipformer2Config):
    ks = jax.random.split(key, cfg.num_stacks + 2)
    return {
        "embed": _init_embed(ks[0], cfg),
        "stacks": [_init_stack(ks[1 + i], cfg, i) for i in range(cfg.num_stacks)],
        "downsample_output_weights": jnp.zeros((cfg.output_downsampling_factor,)),
    }


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------


def _attn_shared(p, cfg: Zipformer2Config, si, x_q, k_src, mask, compute_dtype,
                 pad_lens=None, chunk_left=None, kv_start=None):
    """Project the shared attention inputs and return a handle the three
    probs consumers (self_attn1, self_attn2, nonlin_attention) apply via
    ``_attn_apply`` / ``_attn_apply_head0``.

    x_q: [B, T, D]; k_src: [B, S, H*qd] pre-projected keys (streaming:
    cache|chunk) or None (offline: keys taken from this same in_proj
    evaluation — saves a duplicate projection).

    Two modes (K2T_ATTN_FUSE env, default "probs"):
      * probs (DEFAULT): probs [B,H,T,S] computed ONCE — by the Pallas probs
        kernel when on, else the XLA fallback below — and shared by all
        three consumers via einsum.  Paired xprof module traces of the
        flagship offline program measured this at 29.9 ms vs 37.5 ms for
        the recompute strategy: with three consumers per layer, 2x extra
        score computes (~1.3 ms/call — the pd=4/qd=32 matmuls underutilize
        the MXU) cost more than the ~1.2 ms/layer of probs HBM traffic
        they avoid, refuting round 4's "probs re-read is the last 2x"
        hypothesis.
      * ctx (K2T_ATTN_FUSE=ctx, kept for measurement): the handle carries
        the q/k/pos projections and mask specs; each consumer runs
        ops/attention_pallas.relpos_attn_ctx, recomputing scores+softmax
        per grid cell IN VMEM — nothing [T,S]-sized touches HBM.  This IS
        the default for conformer's single-consumer attention, where no
        extra score compute is paid and cutting the probs write+read is a
        strict win.

    Mask specs (mutually composable, all require ``mask is None``):
      * ``pad_lens`` — non-causal offline: valid key counts per lane.
      * ``chunk_left`` — offline chunk-causal: static (chunk, left) pattern.
      * ``kv_start`` — streaming: first valid [cache|chunk] key column per
        lane (cache slots before it hold unseeded history).
    The two modes are numerically equivalent: same NEG_INF fill, f32
    softmax, f32-accumulated probs@value with probs cast to the value dtype,
    and the kernel's key-side-only mask differs from the query+key mask
    solely at invalid query rows, which every caller zeroes downstream.
    """
    heads, qd, pd = cfg.num_heads[si], cfg.query_head_dim, cfg.pos_head_dim
    b, t, _ = x_q.shape
    # in_proj column layout is flat [q (H*qd) | k (H*qd) | pos (H*pd)] —
    # matching icefall's export so weights import as-is
    proj = L.apply_linear(p["in_proj"], x_q, compute_dtype)
    q = proj[..., : heads * qd].reshape(b, t, heads, qd)
    pos_q = proj[..., 2 * heads * qd :].reshape(b, t, heads, pd)
    if k_src is None:
        k_src = proj[..., heads * qd : 2 * heads * qd]
    s = k_src.shape[1]
    k = k_src.reshape(b, s, heads, qd)

    pe = _compact_rel_pos(t, s, cfg.pos_dim)
    pos_k = L.apply_linear(p["pos_proj"], pe, compute_dtype).reshape(-1, heads, pd)

    has_spec = pad_lens is not None or chunk_left is not None or kv_start is not None
    if has_spec and mask is None:
        from k2transducerasr_tpu.ops import attention_pallas as AP

        mode = AP.flash_attn_mode()
        if mode != "off":
            ch, lf = chunk_left if chunk_left is not None else (0, 0)
            interpret = mode == "interpret"
            import os

            if os.environ.get("K2T_ATTN_FUSE", "probs") == "ctx":
                # A/B switch: recompute-per-consumer via the fused ctx
                # kernel (relpos_attn_ctx) instead of materializing probs.
                # MEASURED SLOWER here and kept only for measurement: paired
                # xprof module traces of the flagship offline program read
                # 37.5 ms (ctx) vs 29.9 ms (probs) — with THREE consumers
                # per layer the 2x extra score computes (~1.3 ms/call; the
                # pd=4 / qd=32 matmuls underutilize the MXU) cost more than
                # the ~1.2 ms/layer of probs HBM traffic they avoid.  The
                # round-4 "probs re-read is the last 2x" hypothesis
                # (BASELINE.md:172-177) is thereby refuted by measurement.
                # Single-consumer attention is different — conformer
                # defaults to the ctx kernel, where it IS a strict win.
                return {
                    "q": q.astype(k.dtype),
                    "k": k,
                    "pos_q": pos_q.astype(pos_k.dtype),
                    "pos_k": pos_k,
                    "lens": pad_lens,
                    "chunk": ch,
                    "left": lf,
                    "kv_start": kv_start,
                    "interpret": interpret,
                }
            return {
                "probs": AP.relpos_attn_probs(
                    q.astype(k.dtype), k, pos_q.astype(pos_k.dtype),
                    pos_k, pad_lens, interpret=interpret, chunk=ch,
                    left=lf, kv_start=kv_start,
                )
            }
        mask = AP.mask_from_specs(b, t, s, pad_lens, chunk_left, kv_start)

    scores = jnp.einsum(
        "bthd,bshd->bhts", q.astype(k.dtype), k, preferred_element_type=jnp.float32
    )
    from k2transducerasr_tpu.ops.attention import rel_shift

    pos_full = jnp.einsum(
        "bthd,rhd->bhtr", pos_q.astype(pos_k.dtype), pos_k, preferred_element_type=jnp.float32
    )
    scores = scores + rel_shift(pos_full, s)
    if mask is not None:
        scores = jnp.where(mask[:, None, :, :], scores, L.NEG_INF)
    return {"probs": jax.nn.softmax(scores, axis=-1)}


def _attn_apply(shared, v):
    """probs @ v for all heads.  v: [B, S, H, vd] -> ctx [B, T, H, vd]."""
    if "probs" in shared:
        return jnp.einsum(
            "bhts,bshd->bthd", shared["probs"].astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        )
    from k2transducerasr_tpu.ops import attention_pallas as AP

    return AP.relpos_attn_ctx(
        shared["q"], shared["k"], shared["pos_q"], shared["pos_k"], v,
        shared["lens"], interpret=shared["interpret"], chunk=shared["chunk"],
        left=shared["left"], kv_start=shared["kv_start"],
    )


def _attn_apply_head0(shared, v):
    """Head-0 probs @ v (the nonlin-attention gate).  v: [B, S, hidden] ->
    [B, T, hidden]."""
    if "probs" in shared:
        return jnp.einsum(
            "bts,bsh->bth", shared["probs"][:, 0].astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        )
    from k2transducerasr_tpu.ops import attention_pallas as AP

    return AP.relpos_attn_ctx(
        shared["q"][:, :, :1], shared["k"][:, :, :1],
        shared["pos_q"][:, :, :1], shared["pos_k"][:, :1], v[:, :, None, :],
        shared["lens"], interpret=shared["interpret"], chunk=shared["chunk"],
        left=shared["left"], kv_start=shared["kv_start"],
    )[:, :, 0]


def _project_keys(p, cfg: Zipformer2Config, si, x, compute_dtype):
    """Key projection only (for building/caching the kv-side key sequence).
    Uses a sliced weight so the matmul is one-third of in_proj, not the full
    projection with discarded columns."""
    heads, qd = cfg.num_heads[si], cfg.query_head_dim
    sl = slice(heads * qd, 2 * heads * qd)
    if "w_q8" in p["in_proj"]:  # int8 mode: slice quantized columns + scales
        sub = {
            "w_q8": p["in_proj"]["w_q8"][:, sl],
            "w_scale": p["in_proj"]["w_scale"][sl],
        }
    else:
        sub = {"w": p["in_proj"]["w"][:, sl]}
    if "b" in p["in_proj"]:
        sub["b"] = p["in_proj"]["b"][sl]
    return L.apply_linear(sub, x, compute_dtype)


def _self_attn(p, cfg, si, v_src, shared, compute_dtype):
    """v_src: [B, S, H*vd] pre-projected values; shared: _attn_shared
    handle (fused kernel or shared probs)."""
    heads, vd = cfg.num_heads[si], cfg.value_head_dim
    b, s, _ = v_src.shape
    v = v_src.reshape(b, s, heads, vd)
    ctx = _attn_apply(shared, v)
    t = ctx.shape[1]
    return L.apply_linear(p["out"], ctx.reshape(b, t, heads * vd), compute_dtype)


def _nonlin_attention(p, dim, x, shared, v_cached, compute_dtype):
    """Attention-gated nonlinearity.  x: [B, T, D] (target side);
    v_cached: [B, S-T, hidden] cached source values or None.
    shared: _attn_shared handle (head 0 is the gate's probs).
    Returns (out [B,T,D], v_chunk [B,T,hidden])."""
    hidden = 3 * dim // 4
    proj = L.apply_linear(p["in_proj"], x, compute_dtype)
    s_gate, xv, y = jnp.split(proj, [hidden, 2 * hidden], axis=-1)
    v_chunk = xv * jnp.tanh(s_gate)  # source-side gated value
    v_src = v_chunk if v_cached is None else jnp.concatenate(
        [v_cached.astype(v_chunk.dtype), v_chunk], axis=1
    )
    attended = _attn_apply_head0(shared, v_src)
    out = L.apply_linear(p["out"], attended * y, compute_dtype)
    return out, v_chunk


# ---------------------------------------------------------------------------
# Conv module (chunk-causal)
# ---------------------------------------------------------------------------


def _conv_module(p, dim, kernel, x, cache, chunk, compute_dtype, valid=None):
    """zipformer2 ConvolutionModule (in_proj -> value*sigmoid(gate) ->
    depthwise -> SwooshR -> out_proj).

    Non-causal (chunk == 0): plain SAME depthwise conv — icefall's offline
    nn.Conv1d branch; ``valid`` zeroes padded positions pre-conv exactly as
    icefall's masked_fill so they can't bleed through the receptive field.

    Causal: icefall's ChunkCausalDepthwiseConv1d — the sum of (a) a causal
    depthwise conv of width kernel//2+1 over [left-context | x] and (b) a
    SAME depthwise conv applied strictly within each chunk, scaled by
    learned per-position edge corrections.  Offline-causal (cache is None)
    uses zero left context and T split into chunks; streaming (cache
    [B, k//2, D]) processes one chunk — identical computations, so the two
    paths agree exactly.  Returns (out [B,T,D], new_cache or None).
    """
    half = kernel // 2
    h = L.apply_linear(p["in_proj"], x, compute_dtype)
    a, g = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(g)

    if valid is not None:
        h = jnp.where(valid[:, :, None], h, 0.0)

    if chunk == 0:
        y = L.apply_conv1d(p["dw"], h, groups=dim, padding="SAME", compute_dtype=compute_dtype)
        new_cache = None
    else:
        b, t, d = h.shape
        left = cache.astype(h.dtype) if cache is not None else jnp.zeros((b, half, d), h.dtype)
        y_causal = L.apply_conv1d(
            p["causal_dw"], jnp.concatenate([left, h], axis=1), groups=dim,
            padding="VALID", compute_dtype=compute_dtype,
        )  # [B, T, D]
        n = t // chunk
        win = jnp.pad(h.reshape(b * n, chunk, d), ((0, 0), (half, half), (0, 0)))
        y_chunk = L.apply_conv1d(
            p["chunk_dw"], win, groups=dim, padding="VALID", compute_dtype=compute_dtype
        ).reshape(b, n, chunk, d)
        y_chunk = y_chunk * _chunkwise_scale(p["chunk_scale"], chunk)[None, None]
        y = y_causal + y_chunk.reshape(b, t, d)
        # the next cache comes from [cache | h], NOT h alone: deep stacks see
        # chunks shorter than kernel//2 (e.g. default chunk 32 at downsample 8
        # is 4 frames vs half-kernel 7), and icefall keeps the tail of the
        # concatenated buffer (ChunkCausalDepthwiseConv1d.streaming_forward)
        new_cache = (
            jnp.concatenate([left, h], axis=1)[:, -half:, :]
            if cache is not None else None
        )
    y = L.swoosh_r(y)
    return L.apply_linear(p["out"], y, compute_dtype), new_cache


# ---------------------------------------------------------------------------
# Bypass / downsample / channel stitch
# ---------------------------------------------------------------------------


def _bypass(scale, x_orig, x):
    return x_orig + scale * (x - x_orig)


def _simple_downsample(weights, x, ds: int, lens=None):
    """[B, T, D] -> [B, ceil(T/ds), D]: learned softmax weights over each
    window; a partial tail window is padded by repeating the last frame
    (icefall SimpleDownsample.forward).

    ``lens`` (valid frame counts): when given, frames at index >= lens are
    replaced by each lane's LAST VALID frame first.  icefall repeats the last
    frame of the padded tensor — for the longest lane of a batch that is its
    real last frame; shorter (padded) lanes see processed pad garbage there,
    so icefall offline outputs are not padding-invariant.  Repeating the last
    valid frame computes what icefall computes for an unpadded lane while
    keeping this design's padding invariance."""
    b, t, d = x.shape
    t_out = -(-t // ds)
    pad = t_out * ds - t
    if lens is not None:
        last = jnp.take_along_axis(
            x, jnp.maximum(lens - 1, 0).astype(jnp.int32)[:, None, None], axis=1
        )  # [B, 1, D]
        x = jnp.where(jnp.arange(t)[None, :, None] < lens[:, None, None], x, last)
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)), mode="edge")
    w = jax.nn.softmax(weights)
    return jnp.einsum("bkwd,w->bkd", x.reshape(b, t_out, ds, d), w.astype(x.dtype),
                      preferred_element_type=jnp.float32).astype(x.dtype)


def _simple_upsample(x, ds: int, t_target: int):
    return jnp.repeat(x, ds, axis=1)[:, :t_target]


def _convert_channels(x, dim: int):
    cur = x.shape[-1]
    if cur == dim:
        return x
    if cur > dim:
        return x[..., :dim]
    return jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, dim - cur),))


# ---------------------------------------------------------------------------
# Layer forward (shared by offline & streaming)
# ---------------------------------------------------------------------------


def _layer_forward(
    p, cfg: Zipformer2Config, si: int, x, mask, chunk: int, caches, compute_dtype,
    valid=None, pad_lens=None, chunk_left=None, kv_start=None,
):
    """One Zipformer2 layer.

    caches: None (offline) or dict with keys key/val1/val2/nonlin/conv1/conv2
    ([B, left, ...] / [B, k//2, D]).  Returns (out, new_caches or None).
    ``chunk``: conv chunk size (0 = non-causal offline).
    """
    dim = cfg.encoder_dims[si]
    kernel = cfg.cnn_module_kernels[si]
    x_orig = x
    streaming = caches is not None

    # shared attention weights from the ORIGINAL layer input.  Offline, the
    # keys come from the same in_proj evaluation as q/pos (k_src=None);
    # streaming projects only the chunk's keys (sliced weight) and
    # concatenates the cache.
    if streaming:
        k_chunk = _project_keys(p["attn_weights"], cfg, si, x, compute_dtype)
        k_src = jnp.concatenate([caches["key"].astype(k_chunk.dtype), k_chunk], axis=1)
        new_key = k_src[:, -caches["key"].shape[1] :, :]
    else:
        k_src = None
        new_key = None
    shared = _attn_shared(
        p["attn_weights"], cfg, si, x, k_src, mask, compute_dtype,
        pad_lens=pad_lens, chunk_left=chunk_left, kv_start=kv_start,
    )

    x = x + _apply_ff(p["ff1"], x, compute_dtype)

    na, nonlin_chunk = _nonlin_attention(
        p["nonlin_attn"], dim, x, shared,
        caches["nonlin"] if streaming else None, compute_dtype,
    )
    x = x + na
    if streaming:
        nonlin_full = jnp.concatenate(
            [caches["nonlin"].astype(nonlin_chunk.dtype), nonlin_chunk], axis=1
        )
        new_nonlin = nonlin_full[:, -caches["nonlin"].shape[1] :, :]

    v1_chunk = L.apply_linear(p["self_attn1"]["v"], x, compute_dtype)
    if streaming:
        v1_src = jnp.concatenate([caches["val1"].astype(v1_chunk.dtype), v1_chunk], axis=1)
        new_val1 = v1_src[:, -caches["val1"].shape[1] :, :]
    else:
        v1_src = v1_chunk
        new_val1 = None
    x = x + _self_attn(p["self_attn1"], cfg, si, v1_src, shared, compute_dtype)

    c1, new_conv1 = _conv_module(
        p["conv1"], dim, kernel, x,
        caches["conv1"] if streaming else None, chunk, compute_dtype, valid,
    )
    x = x + c1
    x = x + _apply_ff(p["ff2"], x, compute_dtype)
    # bypass in the middle of the layer (icefall: after feed_forward2)
    x = _bypass(p["bypass_mid"], x_orig, x)

    v2_chunk = L.apply_linear(p["self_attn2"]["v"], x, compute_dtype)
    if streaming:
        v2_src = jnp.concatenate([caches["val2"].astype(v2_chunk.dtype), v2_chunk], axis=1)
        new_val2 = v2_src[:, -caches["val2"].shape[1] :, :]
    else:
        v2_src = v2_chunk
        new_val2 = None
    x = x + _self_attn(p["self_attn2"], cfg, si, v2_src, shared, compute_dtype)

    c2, new_conv2 = _conv_module(
        p["conv2"], dim, kernel, x,
        caches["conv2"] if streaming else None, chunk, compute_dtype, valid,
    )
    x = x + c2
    x = x + _apply_ff(p["ff3"], x, compute_dtype)
    x = L.apply_biasnorm(p["norm"], x)
    x = _bypass(p["bypass"], x_orig, x)

    if streaming:
        # IMPORTANT: value caches must hold the same *stage* tensors the
        # offline pass would produce; nonlin cache holds the gated source
        # values.  All were computed above at the matching stages.
        new_caches = {
            "key": new_key,
            "nonlin": new_nonlin,
            "val1": new_val1,
            "val2": new_val2,
            "conv1": new_conv1,
            "conv2": new_conv2,
        }
        return x, new_caches
    return x, None


# ---------------------------------------------------------------------------
# Offline forward
# ---------------------------------------------------------------------------


def _chunk_causal_mask(t: int, chunk: int, left: int):
    from k2transducerasr_tpu.ops.attention import chunk_causal_mask

    return chunk_causal_mask(t, chunk, left)


def _stack_forward(p, cfg: Zipformer2Config, si: int, x, valid, compute_dtype):
    """One (possibly downsampled) stack, offline."""
    ds = cfg.downsampling_factors[si]
    t_full = x.shape[1]
    x = _convert_channels(x, cfg.encoder_dims[si])
    src = x
    if ds > 1:
        lens = jnp.sum(valid, axis=1) if valid is not None else None
        src = _simple_downsample(p["downsample_weights"], src, ds, lens)
        # a downsampled frame is valid if its first source frame is valid
        v = valid[:, ::ds][:, : src.shape[1]] if valid is not None else None
    else:
        v = valid
    t = src.shape[1]
    mask = None
    pad_lens = None
    chunk_left = None
    if cfg.causal:
        # chunk-causal pattern as a static spec so _attn_weights can route
        # to the fused Pallas kernel; per-lane limits compose as pad_lens
        chunk_left = (max(1, cfg.stack_chunk(si)), cfg.stack_left(si))
        if v is not None:
            pad_lens = jnp.sum(v.astype(jnp.int32), axis=1)
    elif v is not None:
        # non-causal: padding mask only — expressed as per-lane valid key
        # counts so _attn_weights can route to the fused Pallas kernel
        pad_lens = jnp.sum(v.astype(jnp.int32), axis=1)
    chunk = cfg.stack_chunk(si) if cfg.causal else 0
    for layer in p["layers"]:
        src, _ = _layer_forward(
            layer, cfg, si, src, mask, chunk, None, compute_dtype, v, pad_lens,
            chunk_left=chunk_left,
        )
        if v is not None:
            src = jnp.where(v[:, :, None], src, 0.0)
    if ds > 1:
        src = _simple_upsample(src, ds, t_full)
        src = _bypass(p["bypass_out"], x, src)  # out_combiner (ds>1 only)
    return src


def forward(params, cfg: Zipformer2Config, x, x_lens, compute_dtype=None):
    """x: [B, T, F] raw fbank -> (enc_out [B, T', max_dim], out_lens [B]).

    Causal mode computes EXACTLY what chunked streaming over the same
    (zero-feature-extended) input would: the embed consumes whole windows of
    2*chunk+13 raw frames with 3-zero-stage left context, and NO lane-length
    masking is applied inside the stacks — the streamed graph attends to
    everything inside its windows, tail-flush frames included, so masking
    here would break streaming == offline.  Only the final output is gated
    by out_lens.  Non-causal mode masks padded keys in attention and zeroes
    padded positions pre-conv, exactly as icefall's offline forward does
    with src_key_padding_mask.
    """
    lens0 = jnp.maximum((x_lens - 7) // 2, 0)
    if cfg.causal:
        t_raw = x.shape[1]
        c = cfg.chunk_size
        t0 = max(1, (t_raw - 7) // 2)
        kwin = -(-t0 // c)
        t_need = 2 * c * kwin + 13
        if t_need > t_raw:
            x = jnp.pad(x, ((0, 0), (0, t_need - t_raw), (0, 0)))
        stage = _embed_conv_stack(params["embed"], x, compute_dtype)
        stage = jnp.pad(stage, ((0, 0), (3, 0), (0, 0), (0, 0)))
        h = _embed_tail(params["embed"], stage, compute_dtype)  # [B, c*kwin, D]
        valid = None
    else:
        h = _embed_forward(params["embed"], cfg, x, compute_dtype, x_lens=x_lens)
        valid = L.length_mask(lens0, h.shape[1])
        h = jnp.where(valid[:, :, None], h, 0.0)

    outputs = []
    for si in range(cfg.num_stacks):
        h = _stack_forward(params["stacks"][si], cfg, si, h, valid, compute_dtype)
        if valid is not None:
            h = jnp.where(valid[:, :, None], h, 0.0)
        outputs.append(h)

    # channel stitch to max dim (icefall _get_full_dim_output)
    dims = cfg.encoder_dims
    pieces = [outputs[-1]]
    cur = dims[-1]
    for i in range(cfg.num_stacks - 2, -1, -1):
        if dims[i] > cur:
            pieces.append(outputs[i][..., cur : dims[i]])
            cur = dims[i]
    full = jnp.concatenate(pieces, axis=-1)

    out = _simple_downsample(
        params["downsample_output_weights"], full, cfg.output_downsampling_factor,
        lens0 if valid is not None else None,
    )
    out_lens = -(-lens0 // cfg.output_downsampling_factor)
    ovalid = L.length_mask(out_lens, out.shape[1])
    return jnp.where(ovalid[:, :, None], out, 0.0), out_lens


# ---------------------------------------------------------------------------
# Streaming
# ---------------------------------------------------------------------------


def init_state(cfg: Zipformer2Config, batch: int):
    """Batch-leading state pytree.  Per stack-layer caches mirror the
    reference inventory (OnlineProjOfZipformer2.cs:53-111): key/val1/val2/
    nonlin at [B, left_i, ...], conv at [B, k//2, D]; plus the embed stage
    cache (the reference's ``embed_states`` [B,128,3,19] — here NHWC
    [B, 3, F', c3], zeros at stream start) and a processed-frame counter."""
    layers = []
    for si in range(cfg.num_stacks):
        dim = cfg.encoder_dims[si]
        heads = cfg.num_heads[si]
        left = cfg.stack_left(si)
        half = cfg.cnn_module_kernels[si] // 2
        hidden = 3 * dim // 4
        for _ in range(cfg.num_encoder_layers[si]):
            layers.append(
                {
                    "key": jnp.zeros((batch, left, heads * cfg.query_head_dim)),
                    "val1": jnp.zeros((batch, left, heads * cfg.value_head_dim)),
                    "val2": jnp.zeros((batch, left, heads * cfg.value_head_dim)),
                    "nonlin": jnp.zeros((batch, left, hidden)),
                    "conv1": jnp.zeros((batch, half, dim)),
                    "conv2": jnp.zeros((batch, half, dim)),
                }
            )
    return {
        "layers": layers,
        "embed_stage": jnp.zeros(
            (batch, cfg.embed_cache_len, cfg.embed_freq_out, cfg.embed_channels[-1])
        ),
        "processed": jnp.zeros((batch,), jnp.int32),
    }


def streaming_step(params, cfg: Zipformer2Config, state, x_chunk, compute_dtype=None):
    """x_chunk: [B, 2*chunk+13, F] raw feature window -> (enc_out
    [B, chunk/2, D], new_state).  Requires cfg.causal=True.

    Windows advance by 2*chunk raw frames (13 frames overlap between
    consecutive windows — the reference's T vs decode_chunk_len,
    OnlineModel.cs:44-49).  The conv stack yields chunk+3 stage frames; the
    3-stage-frame cache supplies the ConvNeXt's left context and the last 3
    serve as lookahead AND become the next cache — exactly icefall's
    Conv2dSubsampling.streaming_forward, so streaming == offline-causal.
    """
    b = x_chunk.shape[0]
    c = cfg.chunk_size
    stage = _embed_conv_stack(params["embed"], x_chunk, compute_dtype)  # [B, c+3, F', c3]
    stage = jnp.concatenate([state["embed_stage"].astype(stage.dtype), stage], axis=1)
    new_embed_stage = stage[:, -cfg.embed_cache_len :]
    h = _embed_tail(params["embed"], stage, compute_dtype)  # [B, c, D]
    processed = state["processed"]

    new_layers = []
    outputs = []
    li = 0
    for si in range(cfg.num_stacks):
        ds = cfg.downsampling_factors[si]
        left = cfg.stack_left(si)
        cs = cfg.stack_chunk(si)
        h = _convert_channels(h, cfg.encoder_dims[si])
        src = h
        if ds > 1:
            src = _simple_downsample(params["stacks"][si]["downsample_weights"], src, ds)
        # kv gating over [cache | chunk]: cache slot j valid iff enough
        # history — expressed as the first valid column per lane so
        # _attn_weights can route to the fused Pallas kernel
        done = jnp.minimum(processed // ds, left)
        kv_start = (left - done).astype(jnp.int32)
        for layer in params["stacks"][si]["layers"]:
            src, new_cache = _layer_forward(
                layer, cfg, si, src, None, cs, state["layers"][li], compute_dtype,
                kv_start=kv_start,
            )
            new_layers.append(new_cache)
            li += 1
        if ds > 1:
            src = _simple_upsample(src, ds, c)
            src = _bypass(params["stacks"][si]["bypass_out"], h, src)
        h = src
        outputs.append(h)

    dims = cfg.encoder_dims
    pieces = [outputs[-1]]
    cur = dims[-1]
    for i in range(cfg.num_stacks - 2, -1, -1):
        if dims[i] > cur:
            pieces.append(outputs[i][..., cur : dims[i]])
            cur = dims[i]
    full = jnp.concatenate(pieces, axis=-1)
    out = _simple_downsample(
        params["downsample_output_weights"], full, cfg.output_downsampling_factor
    )
    new_state = {
        "layers": new_layers,
        "embed_stage": new_embed_stage,
        "processed": processed + c,
    }
    return out, new_state
