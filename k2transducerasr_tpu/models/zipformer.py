"""Zipformer v1 encoder (icefall pruned_transducer_stateless7, 2022) —
icefall-exact semantics, offline + streaming.

Reference adapter: ``OnlineProjOfZipformer.cs`` — streaming state is 7 cache
groups per stack (stacked over that stack's layers): ``cached_len [L,B]``,
``cached_avg [L,B,D]``, ``cached_key [L,left,B,attn_dim]``,
``cached_val/val2 [L,left,B,attn_dim/2]``, ``cached_conv1/conv2
[L,B,D,kernel-1]`` (metadata: ``OnlineModel.cs:51-70``).  The C# treats the
graph as a black box; the op semantics implemented here are pinned to the
public icefall source (pruned_transducer_stateless7/zipformer.py and its
_streaming variant) and verified against a torch oracle
(tests/icefall_zipformer1_oracle.py) through the weight map
(convert/zipformer1_map.py):

  * encoder_embed: Conv2dSubsampling — 3x3 convs at (freq-pad 1, stride 1)
    -> (stride 2,2) -> (stride 1,2), DoubleSwish between, linear over the
    [C*F'] flatten, then BasicNorm with FIXED eps 0.25 (learn_eps=False).
    Output length (T-7)//2.
  * layer op order: ff1 -> pooling -> self_attn -> conv1 -> ff2 ->
    self_attn.forward2 (REUSES the attention weights with a separate
    in_proj2/out_proj2 value path) -> conv2 -> ff3 -> norm_final (BasicNorm,
    learned eps) -> scalar layer bypass: out = src + (x - src)*bypass_scale.
  * attention: one in_proj packs [q(adim) | k(adim) | v(adim/2) |
    pos_q(H*pos_dim)]; NO runtime 1/sqrt(d) scaling (icefall folds it into
    ScaledLinear's initial_scale at init time); Transformer-XL style
    SINUSOIDAL relative positional encoding of dim d_model fed through
    linear_pos (d_model -> H*pos_dim), combined via the rel-shift skew.
  * pooling: OFFLINE (non-causal) a masked GLOBAL mean over time, broadcast
    and projected (PoolingModule); causal/streaming the cumulative causal
    mean carried by cached_len/cached_avg (_streaming PoolingModule).
  * v1 activations: DoubleSwish x*sigmoid(x-1); BasicNorm rms-norm with
    (learned) eps, no learned scale.
  * stacks: AttentionDownsample (learned query softmax over each window +
    extra_proj of the window flatten when dims change, tail window padded by
    repeating the last frame) down / SimpleUpsample (repeat + learned
    per-phase bias) up / SimpleCombiner out_combiner
    (src*w1 + up*(1-w1), last-dim pad/truncate to the upsampled dim).
  * U-Net skips: every stack i>=2 combines outputs[j] (first j<=i-2 with
    factor[j] <= factor[i], else 0) into its input via a SimpleCombiner.
  * final output stage: AttentionDownsample x2 -> output frame rate raw/4,
    out_lens = ((x_lens-7)//2 + 1) >> 1; output dim = encoder_dims[-1].

Streaming == offline-chunk-causal EXACTLY (cfg.causal=True runs the same
per-chunk attention masks, cumulative pooling, and causal convs the
streaming path uses); tests/test_zipformer1.py asserts it, and
tests/test_zipformer1_torch_parity.py pins both modes to the torch oracle.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from k2transducerasr_tpu.models.zipformer2 import _chunk_causal_mask
from k2transducerasr_tpu.ops import layers as L


@dataclasses.dataclass(frozen=True)
class ZipformerConfig:
    feature_dim: int = 80
    num_encoder_layers: tuple = (2, 4, 3, 2, 4)
    encoder_dims: tuple = (384, 384, 384, 384, 384)
    attention_dims: tuple = (192, 192, 192, 192, 192)
    downsampling_factors: tuple = (1, 2, 4, 8, 2)
    num_heads: tuple = (8, 8, 8, 8, 8)
    feedforward_dims: tuple = (1024, 1024, 1024, 1024, 1024)
    cnn_module_kernels: tuple = (31, 31, 31, 31, 31)
    pos_dim: int = 4  # positional-query head dim (icefall pos_dim)
    embed_channels: tuple = (8, 32, 128)
    output_downsampling_factor: int = 2
    causal: bool = False
    chunk_size: int = 16  # embed-rate frames/chunk (metadata decode_chunk_len/2)
    left_context_frames: int = 64

    @property
    def num_stacks(self) -> int:
        return len(self.encoder_dims)

    @property
    def encoder_out_dim(self) -> int:
        return self.encoder_dims[-1]

    def embed_len(self, t_raw: int) -> int:
        return (t_raw - 7) // 2

    def subsampled_len(self, t_raw: int) -> int:
        return (self.embed_len(t_raw) + 1) // 2

    @property
    def decode_chunk_len(self) -> int:
        return 2 * self.chunk_size

    @property
    def chunk_input_len(self) -> int:
        return 2 * self.chunk_size + 7

    def stack_chunk(self, i: int) -> int:
        return self.chunk_size // self.downsampling_factors[i]

    def stack_left(self, i: int) -> int:
        return max(1, self.left_context_frames // self.downsampling_factors[i])

    def skip_sources(self) -> tuple:
        """Per-stack U-Net skip source (stack index or None) — icefall
        Zipformer.__init__'s skip_layers rule."""
        z = self.downsampling_factors
        out = [None, None]
        for i in range(2, self.num_stacks):
            j = next((j for j in range(i - 2, -1, -1) if z[j] <= z[i]), 0)
            out.append(j)
        return tuple(out[: self.num_stacks])


Config = ZipformerConfig


def output_dim(cfg: ZipformerConfig) -> int:
    return cfg.encoder_out_dim


def output_chunk_len(cfg: ZipformerConfig) -> int:
    return cfg.chunk_size // cfg.output_downsampling_factor


def double_swish(x):
    return x * jax.nn.sigmoid(x - 1.0)


def init_basicnorm(dim: int):
    return {"eps_log": jnp.asarray(math.log(0.25))}


def apply_basicnorm(p, x):
    x32 = x.astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + jnp.exp(p["eps_log"]))
    return (x32 * scale).astype(x.dtype)


def _sinusoidal_rel_pos(t_q: int, s_kv: int, d_model: int):
    """[R, d_model] Transformer-XL sinusoidal relative positional encoding
    (icefall v1 RelPositionalEncoding / espnet): even columns sin(p*div_i),
    odd columns cos(p*div_i), div_i = 10000^(-2i/d).  Rows follow DESCENDING
    relative positions r = s_kv-1 .. -(t_q-1), the layout
    ops/attention.rel_shift expects (icefall realizes the same skew with
    as_strided over a pe stored positive-flipped-then-negative)."""
    from k2transducerasr_tpu.ops.attention import descending_rel_positions

    p = descending_rel_positions(t_q, s_kv)
    div = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32)
                  * (-math.log(10000.0) / d_model))
    ang = p[:, None] * div[None, :]
    return jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=2).reshape(-1, d_model)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_embed(key, cfg: ZipformerConfig):
    c1, c2, c3 = cfg.embed_channels
    ks = jax.random.split(key, 4)
    f2 = (cfg.feature_dim - 3) // 2 + 1
    freq_out = (f2 - 3) // 2 + 1
    return {
        "conv1": L.init_conv2d(ks[0], 1, c1, (3, 3)),
        "conv2": L.init_conv2d(ks[1], c1, c2, (3, 3)),
        "conv3": L.init_conv2d(ks[2], c2, c3, (3, 3)),
        "out": L.init_linear(ks[3], c3 * freq_out, cfg.encoder_dims[0]),
        "out_norm": init_basicnorm(cfg.encoder_dims[0]),  # learn_eps=False
    }


def _init_layer(key, cfg: ZipformerConfig, si: int):
    dim = cfg.encoder_dims[si]
    adim = cfg.attention_dims[si]
    heads = cfg.num_heads[si]
    ff = cfg.feedforward_dims[si]
    kernel = cfg.cnn_module_kernels[si]
    ks = jax.random.split(key, 12)

    def ffm(k):
        k1, k2 = jax.random.split(k)
        return {"w1": L.init_linear(k1, dim, ff), "w2": L.init_linear(k2, ff, dim)}

    def convm(k):
        k1, k2, k3 = jax.random.split(k, 3)
        return {
            "pw1": L.init_linear(k1, dim, 2 * dim),
            "dw": L.init_conv1d(k2, dim, dim, kernel=kernel, groups=dim),
            "pw2": L.init_linear(k3, dim, dim),
        }

    return {
        "attn": {
            # icefall in_proj packing: [q | k | v | pos_q]
            "in_proj": L.init_linear(ks[0], dim, 2 * adim + adim // 2 + heads * cfg.pos_dim),
            "pos_proj": L.init_linear(ks[1], dim, heads * cfg.pos_dim, bias=False),
            "out1": L.init_linear(ks[3], adim // 2, dim),
            "v2": L.init_linear(ks[4], dim, adim // 2, bias=False),  # in_proj2
            "out2": L.init_linear(ks[5], adim // 2, dim),
        },
        "pooling": {"proj": L.init_linear(ks[6], dim, dim, bias=False)},
        "conv1": convm(ks[7]),
        "conv2": convm(ks[8]),
        "ff1": ffm(ks[9]),
        "ff2": ffm(ks[10]),
        "ff3": ffm(ks[11]),
        "norm": init_basicnorm(dim),
        "bypass_scale": jnp.asarray(0.5),
    }


def _init_attention_downsample(key, in_dim: int, out_dim: int, ds: int):
    p = {"query": jax.random.normal(key, (in_dim,)) * in_dim**-0.5}
    if in_dim != out_dim:
        p["extra_proj"] = L.init_linear(key, in_dim * ds, out_dim - in_dim, bias=False)
    return p


def _init_stack(key, cfg: ZipformerConfig, si: int):
    n = cfg.num_encoder_layers[si]
    ks = jax.random.split(key, n + 2)
    p = {"layers": [_init_layer(ks[j], cfg, si) for j in range(n)]}
    ds = cfg.downsampling_factors[si]
    dim = cfg.encoder_dims[si]
    in_dim = cfg.encoder_dims[si - 1] if si > 0 else cfg.encoder_dims[0]
    if ds > 1:
        p["downsample"] = _init_attention_downsample(ks[n], in_dim, dim, ds)
        p["upsample_bias"] = jax.random.normal(ks[n + 1], (ds, dim)) * 0.01
        p["out_combiner"] = {"weight1": jnp.zeros(())}
    elif in_dim != dim:
        raise ValueError(
            f"stack {si}: ds=1 with dim change {in_dim}->{dim} is not an "
            "icefall v1 configuration"
        )
    return p


def init_params(key, cfg: ZipformerConfig):
    ks = jax.random.split(key, cfg.num_stacks + 2)
    params = {
        "embed": _init_embed(ks[0], cfg),
        "stacks": [_init_stack(ks[1 + i], cfg, i) for i in range(cfg.num_stacks)],
        "downsample_output": _init_attention_downsample(
            ks[-1], cfg.encoder_dims[-1], cfg.encoder_dims[-1],
            cfg.output_downsampling_factor,
        ),
        "skip_combiners": [
            None if j is None else {"weight1": jnp.zeros(())}
            for j in cfg.skip_sources()
        ],
    }
    return params


# ---------------------------------------------------------------------------
# modules
# ---------------------------------------------------------------------------


def _embed_forward(p, cfg: ZipformerConfig, x, compute_dtype=None):
    # conv1 (freq pad 1, time VALID) as a banded matmul — see
    # ops/layers.apply_conv2d_c1_banded for the measured rationale
    h = double_swish(L.apply_conv2d_c1_banded(p["conv1"], x, compute_dtype=compute_dtype))
    h = double_swish(L.apply_conv2d_banded_s2(p["conv2"], h, compute_dtype=compute_dtype))
    h = double_swish(L.apply_conv2d(p["conv3"], h, strides=(1, 2), compute_dtype=compute_dtype))
    b, t0, f, c = h.shape
    # channel-major [C, F] flatten — icefall's x.transpose(1, 2).view(b, t, c*f)
    h = L.apply_linear(p["out"], jnp.swapaxes(h, 2, 3).reshape(b, t0, c * f), compute_dtype)
    return apply_basicnorm(p["out_norm"], h)


def _attention_downsample(p, x, ds: int, lens=None):
    """icefall AttentionDownsample: softmax(query . frame) weights over each
    window of ``ds``; a partial tail window is padded by repeating the last
    frame; when dims change, extra output channels come from a linear over
    the window flatten.  x: [B, T, Din] -> [B, ceil(T/ds), Dout].

    ``lens``: like zipformer2._simple_downsample, frames at index >= lens
    are replaced by the lane's last VALID frame first, computing what
    icefall computes for an unpadded lane while staying padding-invariant.
    """
    b, t, d = x.shape
    t_out = -(-t // ds)
    pad = t_out * ds - t
    if lens is not None:
        last = jnp.take_along_axis(
            x, jnp.maximum(lens - 1, 0).astype(jnp.int32)[:, None, None], axis=1
        )
        x = jnp.where(jnp.arange(t)[None, :, None] < lens[:, None, None], x, last)
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)), mode="edge")
    xw = x.reshape(b, t_out, ds, d)
    scores = jnp.einsum("bkwd,d->bkw", xw.astype(jnp.float32),
                        p["query"].astype(jnp.float32))
    w = jax.nn.softmax(scores, axis=-1)
    ans = jnp.einsum("bkwd,bkw->bkd", xw, w.astype(xw.dtype),
                     preferred_element_type=jnp.float32).astype(xw.dtype)
    if "extra_proj" in p:
        ans2 = L.apply_linear(p["extra_proj"], xw.reshape(b, t_out, ds * d))
        ans = jnp.concatenate([ans, ans2.astype(ans.dtype)], axis=-1)
    return ans


def _simple_upsample_v1(bias, x, t_target: int):
    """icefall v1 SimpleUpsample: repeat each frame ``ds`` times adding a
    learned per-phase bias, truncate to the pre-downsample length."""
    b, t, d = x.shape
    ds = bias.shape[0]
    y = x[:, :, None, :] + bias[None, None, :, :].astype(x.dtype)
    return y.reshape(b, t * ds, d)[:, :t_target]


def _simple_combine(weight1, src1, src2):
    """icefall SimpleCombiner: src1*w1 + src2*(1-w1), with src1 zero-padded
    or truncated on the last dim to src2's width."""
    a = src1 * weight1.astype(src1.dtype)
    b_ = src2 * (1.0 - weight1).astype(src2.dtype)
    d1, d2 = a.shape[-1], b_.shape[-1]
    if d1 < d2:
        a = jnp.pad(a, ((0, 0),) * (a.ndim - 1) + ((0, d2 - d1),))
    elif d1 > d2:
        a = a[..., :d2]
    return a + b_


def _attention(p, cfg: ZipformerConfig, si, x, k_cache, v1_cache, v2_cache, mask, compute_dtype,
               pad_lens=None, chunk_left=None, kv_start=None):
    """Returns (out1, apply2(x2), k_chunk, v1_chunk).  apply2 reuses the SAME
    attention weights with the in_proj2/out_proj2 value path
    (RelPositionMultiheadAttention.forward2).

    Mask specs (``pad_lens``/``chunk_left``/``kv_start``, semantics as
    models/zipformer2._attn_weights) route the probs through the fused
    Pallas kernel; the XLA path below is the fallback and builds the
    equivalent boolean mask."""
    adim = cfg.attention_dims[si]
    heads = cfg.num_heads[si]
    hd = adim // heads
    pd = cfg.pos_dim
    dim = cfg.encoder_dims[si]
    b, t, _ = x.shape

    proj = L.apply_linear(p["in_proj"], x, compute_dtype)
    q = proj[..., :adim].reshape(b, t, heads, hd)
    k_chunk = proj[..., adim : 2 * adim]  # [B,T,adim]
    v1_chunk = proj[..., 2 * adim : 2 * adim + adim // 2]  # [B,T,adim/2]
    pos_q = proj[..., 2 * adim + adim // 2 :].reshape(b, t, heads, pd)

    if k_cache is not None:
        k_src = jnp.concatenate([k_cache.astype(k_chunk.dtype), k_chunk], axis=1)
        v1_src = jnp.concatenate([v1_cache.astype(v1_chunk.dtype), v1_chunk], axis=1)
    else:
        k_src, v1_src = k_chunk, v1_chunk
    s = k_src.shape[1]
    k = k_src.reshape(b, s, heads, hd)

    pe = _sinusoidal_rel_pos(t, s, dim)
    pos_k = L.apply_linear(p["pos_proj"], pe, compute_dtype).reshape(-1, heads, pd)

    # NO 1/sqrt(head_dim): icefall bakes the scaling into in_proj's init
    # (ScaledLinear initial_scale=head_dim**-0.25 on both q and k).
    has_spec = pad_lens is not None or chunk_left is not None or kv_start is not None
    attn_w = None
    fused = None
    if has_spec and mask is None:
        from k2transducerasr_tpu.ops import attention_pallas as AP

        mode = AP.flash_attn_mode()
        if mode != "off":
            ch, lf = chunk_left if chunk_left is not None else (0, 0)
            import os

            if os.environ.get("K2T_ATTN_FUSE", "probs") == "ctx":
                # A/B switch: recompute-per-consumer (relpos_attn_ctx) for
                # the two shared-weights value paths.  Like zipformer2,
                # measured SLOWER than materializing probs once (paired
                # xprof traces; see models/zipformer2._attn_shared) — kept
                # for measurement only.
                fused = dict(
                    q=q.astype(k.dtype), pos_q=pos_q.astype(pos_k.dtype),
                    chunk=ch, left=lf, interpret=(mode == "interpret"),
                )
            else:
                attn_w = AP.relpos_attn_probs(
                    q.astype(k.dtype), k, pos_q.astype(pos_k.dtype), pos_k,
                    pad_lens, interpret=(mode == "interpret"), chunk=ch,
                    left=lf, kv_start=kv_start,
                )
        else:
            mask = AP.mask_from_specs(b, t, s, pad_lens, chunk_left, kv_start)

    if fused is None and attn_w is None:
        from k2transducerasr_tpu.ops.attention import rel_shift

        scores = jnp.einsum(
            "bthd,bshd->bhts", q.astype(k.dtype), k, preferred_element_type=jnp.float32
        )
        pos_full = jnp.einsum(
            "bthd,rhd->bhtr", pos_q.astype(pos_k.dtype), pos_k, preferred_element_type=jnp.float32
        )
        scores = scores + rel_shift(pos_full, s)
        if mask is not None:
            scores = jnp.where(mask[:, None, :, :], scores, L.NEG_INF)
        attn_w = jax.nn.softmax(scores, axis=-1)  # [B,H,T,S]

    def weighted(v_src_):
        v = v_src_.reshape(b, s, heads, (adim // 2) // heads)
        if fused is not None:
            from k2transducerasr_tpu.ops import attention_pallas as AP

            ctx = AP.relpos_attn_ctx(
                fused["q"], k, fused["pos_q"], pos_k, v, pad_lens,
                interpret=fused["interpret"], chunk=fused["chunk"],
                left=fused["left"], kv_start=kv_start,
            )
            return ctx.reshape(b, t, adim // 2)
        ctx = jnp.einsum(
            "bhts,bshd->bthd", attn_w.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        return ctx.astype(v.dtype).reshape(b, t, adim // 2)

    out1 = L.apply_linear(p["out1"], weighted(v1_src), compute_dtype)

    def apply2(x2):
        v2_chunk = L.apply_linear(p["v2"], x2, compute_dtype)
        if v2_cache is not None:
            v2_src = jnp.concatenate([v2_cache.astype(v2_chunk.dtype), v2_chunk], axis=1)
        else:
            v2_src = v2_chunk
        return (
            L.apply_linear(p["out2"], weighted(v2_src), compute_dtype),
            v2_chunk,
        )

    return out1, apply2, k_chunk, v1_chunk


def _pooling_global(p, x, valid, compute_dtype):
    """Offline PoolingModule: masked GLOBAL mean over time, projected and
    broadcast to every frame (icefall PoolingModule.forward)."""
    x32 = x.astype(jnp.float32)
    if valid is None:
        mean = jnp.mean(x32, axis=1, keepdims=True)
    else:
        w = valid.astype(jnp.float32)
        w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1.0)
        mean = jnp.einsum("btd,bt->bd", x32, w)[:, None, :]
    return L.apply_linear(p["proj"], mean.astype(x.dtype), compute_dtype)


def _pooling_causal(p, x, cached_len, cached_avg, compute_dtype):
    """Streaming PoolingModule: causal cumulative mean; cached_len/avg carry
    history across chunks (the reference's cached_len/cached_avg pair).
    Returns (out, new_len, new_avg)."""
    b, t, d = x.shape
    csum = jnp.cumsum(x.astype(jnp.float32), axis=1)
    if cached_len is None:
        base_n = jnp.zeros((b, 1), jnp.float32)
        base_sum = jnp.zeros((b, 1, d), jnp.float32)
    else:
        base_n = cached_len[:, None].astype(jnp.float32)
        base_sum = cached_avg.astype(jnp.float32)[:, None, :] * base_n[:, :, None]
    counts = jnp.arange(1, t + 1, dtype=jnp.float32)[None, :] + base_n
    mean = (csum + base_sum) / counts[:, :, None]
    out = L.apply_linear(p["proj"], mean.astype(x.dtype), compute_dtype)
    return out, counts[:, -1], mean[:, -1]


def _causal_conv(p, dim, kernel, x, cache, valid, compute_dtype):
    """Streaming ConvolutionModule: pw+GLU -> causal depthwise (kernel-1
    left context) -> DoubleSwish -> pw.  cache: [B, kernel-1, D] or None."""
    h = L.glu(L.apply_linear(p["pw1"], x, compute_dtype))
    if valid is not None:
        h = jnp.where(valid[:, :, None], h, 0.0)
    b, t, d = h.shape
    left = cache if cache is not None else jnp.zeros((b, kernel - 1, d), h.dtype)
    win = jnp.concatenate([left.astype(h.dtype), h], axis=1)
    y = L.apply_conv1d(p["dw"], win, groups=dim, padding="VALID", compute_dtype=compute_dtype)
    new_cache = win[:, -(kernel - 1) :, :]
    y = double_swish(y)
    return L.apply_linear(p["pw2"], y, compute_dtype), new_cache


def _centered_conv(p, dim, x, valid, compute_dtype):
    h = L.glu(L.apply_linear(p["pw1"], x, compute_dtype))
    if valid is not None:
        h = jnp.where(valid[:, :, None], h, 0.0)
    y = L.apply_conv1d(p["dw"], h, groups=dim, padding="SAME", compute_dtype=compute_dtype)
    return L.apply_linear(p["pw2"], double_swish(y), compute_dtype), None


def _ff(p, x, compute_dtype):
    return L.apply_linear(p["w2"], double_swish(L.apply_linear(p["w1"], x, compute_dtype)), compute_dtype)


def _layer_forward(p, cfg, si, x, mask, caches, valid, compute_dtype,
                   pad_lens=None, chunk_left=None, kv_start=None):
    """One ZipformerEncoderLayer, icefall op order: ff1 -> pooling ->
    self_attn -> conv1 -> ff2 -> attn.forward2 -> conv2 -> ff3 ->
    norm_final -> scalar bypass.

    caches: None (offline) or dict(len, avg, key, val1, val2, conv1, conv2)
    with batch-leading leaves."""
    dim = cfg.encoder_dims[si]
    kernel = cfg.cnn_module_kernels[si]
    streaming = caches is not None
    causal = cfg.causal
    x_orig = x
    new_caches = {}

    x = x + _ff(p["ff1"], x, compute_dtype)

    if causal:
        pool, new_len, new_avg = _pooling_causal(
            p["pooling"], x,
            caches["len"] if streaming else None,
            caches["avg"] if streaming else None,
            compute_dtype,
        )
        if streaming:
            new_caches["len"] = new_len
            new_caches["avg"] = new_avg
    else:
        pool = _pooling_global(p["pooling"], x, valid, compute_dtype)
    x = x + pool

    out1, apply2, k_chunk, v1_chunk = _attention(
        p["attn"], cfg, si, x,
        caches["key"] if streaming else None,
        caches["val1"] if streaming else None,
        caches["val2"] if streaming else None,
        mask, compute_dtype,
        pad_lens=pad_lens, chunk_left=chunk_left, kv_start=kv_start,
    )
    if streaming:
        left = caches["key"].shape[1]
        new_caches["key"] = jnp.concatenate(
            [caches["key"].astype(k_chunk.dtype), k_chunk], axis=1
        )[:, -left:]
        new_caches["val1"] = jnp.concatenate(
            [caches["val1"].astype(v1_chunk.dtype), v1_chunk], axis=1
        )[:, -left:]
    x = x + out1

    if causal:
        c1, new_conv1 = _causal_conv(
            p["conv1"], dim, kernel, x, caches["conv1"] if streaming else None,
            valid, compute_dtype,
        )
        if streaming:
            new_caches["conv1"] = new_conv1
    else:
        c1, _ = _centered_conv(p["conv1"], dim, x, valid, compute_dtype)
    x = x + c1

    x = x + _ff(p["ff2"], x, compute_dtype)

    out2, v2_chunk = apply2(x)
    if streaming:
        left = caches["val2"].shape[1]
        new_caches["val2"] = jnp.concatenate(
            [caches["val2"].astype(v2_chunk.dtype), v2_chunk], axis=1
        )[:, -left:]
    x = x + out2

    if causal:
        c2, new_conv2 = _causal_conv(
            p["conv2"], dim, kernel, x, caches["conv2"] if streaming else None,
            valid, compute_dtype,
        )
        if streaming:
            new_caches["conv2"] = new_conv2
    else:
        c2, _ = _centered_conv(p["conv2"], dim, x, valid, compute_dtype)
    x = x + c2

    x = x + _ff(p["ff3"], x, compute_dtype)
    x = apply_basicnorm(p["norm"], x)
    x = x_orig + (x - x_orig) * p["bypass_scale"].astype(x.dtype)
    return x, (new_caches if streaming else None)


# ---------------------------------------------------------------------------
# offline / streaming
# ---------------------------------------------------------------------------


def _stack_layers(p, cfg, si, src, mask, v, compute_dtype,
                  pad_lens=None, chunk_left=None):
    for layer in p["layers"]:
        src, _ = _layer_forward(layer, cfg, si, src, mask, None, v, compute_dtype,
                                pad_lens=pad_lens, chunk_left=chunk_left)
        if v is not None:
            src = jnp.where(v[:, :, None], src, 0.0)
    return src


def forward(params, cfg: ZipformerConfig, x, x_lens, compute_dtype=None):
    """x: [B, T, F] raw fbank -> (enc_out [B, T', D_last], out_lens [B]).

    Non-causal: icefall stateless7 offline forward (global pooling, full
    attention, SAME convs, masked pads).  Causal: EXACTLY what chunked
    streaming over the same zero-feature-extended input computes — the test
    oracle for streaming_step."""
    lens0 = jnp.maximum((x_lens - 7) // 2, 0)
    if cfg.causal:
        t_raw = x.shape[1]
        c = cfg.chunk_size
        t0 = max(1, (t_raw - 7) // 2)
        kwin = -(-t0 // c)
        t_need = 2 * c * kwin + 7
        if t_need > t_raw:
            x = jnp.pad(x, ((0, 0), (0, t_need - t_raw), (0, 0)))
    h = _embed_forward(params["embed"], cfg, x, compute_dtype)
    t_full = h.shape[1]
    if cfg.causal:
        # no lane-length masking inside the stacks: the streamed graph
        # attends to everything inside its windows (tail flush included)
        valid = None
    else:
        valid = L.length_mask(lens0, t_full)
        h = jnp.where(valid[:, :, None], h, 0.0)

    skips = cfg.skip_sources()
    outputs = []
    for si in range(cfg.num_stacks):
        p = params["stacks"][si]
        ds = cfg.downsampling_factors[si]
        if skips[si] is not None:
            h = _simple_combine(
                params["skip_combiners"][si]["weight1"], outputs[skips[si]], h
            )
        if ds > 1:
            src_orig = h
            src = _attention_downsample(
                p["downsample"], h, ds, lens0 if valid is not None else None
            )
            v = valid[:, ::ds][:, : src.shape[1]] if valid is not None else None
        else:
            src, src_orig, v = h, None, valid
        t = src.shape[1]
        # masks expressed as specs so _attention can route to the fused
        # Pallas kernel (invalid query rows are key-side-unmasked there but
        # only feed invalid output rows, which downstream masking gates)
        pad_lens = jnp.sum(v.astype(jnp.int32), axis=1) if v is not None else None
        chunk_left = (
            (max(1, cfg.stack_chunk(si)), cfg.stack_left(si)) if cfg.causal else None
        )
        src = _stack_layers(p, cfg, si, src, None, v, compute_dtype,
                            pad_lens=pad_lens, chunk_left=chunk_left)
        if ds > 1:
            src = _simple_upsample_v1(p["upsample_bias"], src, t_full)
            h = _simple_combine(p["out_combiner"]["weight1"], src_orig, src)
            if valid is not None:
                h = jnp.where(valid[:, :, None], h, 0.0)
        else:
            h = src
        outputs.append(h)

    out = _attention_downsample(
        params["downsample_output"], h, cfg.output_downsampling_factor,
        lens0 if valid is not None else None,
    )
    out_lens = (lens0 + 1) // cfg.output_downsampling_factor
    ovalid = L.length_mask(out_lens, out.shape[1])
    return jnp.where(ovalid[:, :, None], out, 0.0), out_lens


def init_state(cfg: ZipformerConfig, batch: int):
    """Batch-leading caches per layer (reference groups them per stack,
    OnlineProjOfZipformer.cs:55-107 — same content, flat layout here)."""
    layers = []
    for si in range(cfg.num_stacks):
        dim = cfg.encoder_dims[si]
        adim = cfg.attention_dims[si]
        left = cfg.stack_left(si)
        k = cfg.cnn_module_kernels[si]
        for _ in range(cfg.num_encoder_layers[si]):
            layers.append(
                {
                    "len": jnp.zeros((batch,), jnp.float32),
                    "avg": jnp.zeros((batch, dim)),
                    "key": jnp.zeros((batch, left, adim)),
                    "val1": jnp.zeros((batch, left, adim // 2)),
                    "val2": jnp.zeros((batch, left, adim // 2)),
                    "conv1": jnp.zeros((batch, k - 1, dim)),
                    "conv2": jnp.zeros((batch, k - 1, dim)),
                }
            )
    return {"layers": layers, "processed": jnp.zeros((batch,), jnp.int32)}


def streaming_step(params, cfg: ZipformerConfig, state, x_chunk, compute_dtype=None):
    """x_chunk: [B, 2*chunk+7, F] -> (enc_out [B, chunk//2, D], new_state).

    Consecutive windows overlap by 7 raw frames (the reference's T vs
    decode_chunk_len, OnlineModel.cs:44-49); the embed is recomputed over
    the overlap — its receptive field is local, so the frames are identical
    to a full-utterance embed."""
    assert cfg.chunk_size % 2 == 0, "v1 streaming needs an even chunk_size"
    b = x_chunk.shape[0]
    c = cfg.chunk_size
    h = _embed_forward(params["embed"], cfg, x_chunk, compute_dtype)
    h = h[:, -c:, :]
    processed = state["processed"]

    skips = cfg.skip_sources()
    new_layers = []
    outputs = []
    li = 0
    for si in range(cfg.num_stacks):
        p = params["stacks"][si]
        ds = cfg.downsampling_factors[si]
        left = cfg.stack_left(si)
        cs = cfg.stack_chunk(si)
        if skips[si] is not None:
            h = _simple_combine(
                params["skip_combiners"][si]["weight1"], outputs[skips[si]], h
            )
        if ds > 1:
            src_orig = h
            src = _attention_downsample(p["downsample"], h, ds)
        else:
            src, src_orig = h, None
        done = jnp.minimum(processed // ds, left)
        kv_start = (left - done).astype(jnp.int32)
        for layer in p["layers"]:
            src, nc = _layer_forward(
                layer, cfg, si, src, None, state["layers"][li], None, compute_dtype,
                kv_start=kv_start,
            )
            new_layers.append(nc)
            li += 1
        if ds > 1:
            src = _simple_upsample_v1(p["upsample_bias"], src, c)
            h = _simple_combine(p["out_combiner"]["weight1"], src_orig, src)
        else:
            h = src
        outputs.append(h)

    out = _attention_downsample(
        params["downsample_output"], h, cfg.output_downsampling_factor
    )
    return out, {"layers": new_layers, "processed": processed + c}
