"""Zipformer v1 encoder (icefall pruned_transducer_stateless7, 2022).

Reference adapter: ``OnlineProjOfZipformer.cs`` — streaming state is 7 cache
groups per stack (stacked over that stack's layers): ``cached_len [L,B]``,
``cached_avg [L,B,D]``, ``cached_key [L,left,B,attn_dim]``,
``cached_val/val2 [L,left,B,attn_dim/2]``, ``cached_conv1/conv2
[L,B,D,kernel-1]`` (metadata: ``OnlineModel.cs:51-70``).  That inventory
pins the layer anatomy implemented here:

  * macaron ff1 -> rel-pos attention (attn_dim keys/queries, attn_dim/2
    values) -> POOLING module (cumulative causal mean, the cached_len/avg
    pair) -> causal conv1 (full kernel-1 left context) -> ff2 -> second
    attention application REUSING the same attention weights with a separate
    value projection (cached_val2) -> conv2 -> ff3 -> BasicNorm.
  * v1 activations: DoubleSwish x*sigmoid(x-1); BasicNorm (rms with learned
    eps) instead of LayerNorm/BiasNorm.
  * stacks at per-stack downsampling factors with learned-weight pooling
    down / repeat up, combined with a bypass.

Known moderate-fidelity deviations from the icefall graph (flagged for
convert/importer.py): stack downsampling uses the same SimpleDownsample as
zipformer2 (icefall v1 uses AttentionDownsample), and the layer-skip
RandomCombine (inference no-op in most exports) is omitted.
Streaming == offline-causal is exact and is the test oracle.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from k2transducerasr_tpu.models.zipformer2 import (
    _chunk_causal_mask,
    _compact_rel_pos,
    _convert_channels,
    _simple_downsample,
    _simple_upsample,
)
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
    pos_dim: int = 4  # pos head dim per head
    embed_channels: tuple = (8, 32, 128)
    causal: bool = False
    chunk_size: int = 32
    left_context_frames: int = 64

    @property
    def num_stacks(self) -> int:
        return len(self.encoder_dims)

    @property
    def encoder_out_dim(self) -> int:
        return max(self.encoder_dims)

    def embed_len(self, t_raw: int) -> int:
        return (t_raw - 7) // 2

    def subsampled_len(self, t_raw: int) -> int:
        return self.embed_len(t_raw)  # v1 output rate = 50 Hz (no final /2)

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


Config = ZipformerConfig


def output_dim(cfg: ZipformerConfig) -> int:
    return cfg.encoder_out_dim


def output_chunk_len(cfg: ZipformerConfig) -> int:
    return cfg.chunk_size


def double_swish(x):
    return x * jax.nn.sigmoid(x - 1.0)


def init_basicnorm(dim: int):
    return {"eps_log": jnp.asarray(math.log(0.25))}


def apply_basicnorm(p, x):
    x32 = x.astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + jnp.exp(p["eps_log"]))
    return (x32 * scale).astype(x.dtype)


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
            "in_proj": L.init_linear(ks[0], dim, 2 * adim + heads * cfg.pos_dim),
            "pos_proj": L.init_linear(ks[1], 48, heads * cfg.pos_dim, bias=False),
            "v1": L.init_linear(ks[2], dim, adim // 2),
            "out1": L.init_linear(ks[3], adim // 2, dim),
            "v2": L.init_linear(ks[4], dim, adim // 2),
            "out2": L.init_linear(ks[5], adim // 2, dim),
        },
        "pooling": {"proj": L.init_linear(ks[6], dim, dim, bias=False)},
        "conv1": convm(ks[7]),
        "conv2": convm(ks[8]),
        "ff1": ffm(ks[9]),
        "ff2": ffm(ks[10]),
        "ff3": ffm(ks[11]),
        "norm": init_basicnorm(dim),
    }


def _init_stack(key, cfg: ZipformerConfig, si: int):
    n = cfg.num_encoder_layers[si]
    ks = jax.random.split(key, n + 1)
    p = {"layers": [_init_layer(ks[j], cfg, si) for j in range(n)]}
    ds = cfg.downsampling_factors[si]
    if ds > 1:
        p["downsample_weights"] = jnp.zeros((ds,))
        p["bypass_scale"] = jnp.full((cfg.encoder_dims[si],), 0.5)
    return p


def init_params(key, cfg: ZipformerConfig):
    ks = jax.random.split(key, cfg.num_stacks + 1)
    return {
        "embed": _init_embed(ks[0], cfg),
        "stacks": [_init_stack(ks[1 + i], cfg, i) for i in range(cfg.num_stacks)],
    }


# ---------------------------------------------------------------------------
# modules
# ---------------------------------------------------------------------------


def _embed_forward(p, cfg: ZipformerConfig, x, compute_dtype=None, x_lens=None):
    h = x[..., None]
    h = jnp.pad(h, ((0, 0), (0, 0), (1, 1), (0, 0)))
    h = double_swish(L.apply_conv2d(p["conv1"], h, strides=(1, 1), compute_dtype=compute_dtype))
    h = double_swish(L.apply_conv2d(p["conv2"], h, strides=(2, 2), compute_dtype=compute_dtype))
    h = double_swish(L.apply_conv2d(p["conv3"], h, strides=(1, 2), compute_dtype=compute_dtype))
    b, t0, f, c = h.shape
    return L.apply_linear(p["out"], h.reshape(b, t0, f * c), compute_dtype)


def _attention(p, cfg: ZipformerConfig, si, x, k_cache, v1_cache, v2_cache, mask, compute_dtype):
    """Returns (out1, out2_fn(x2), new_caches).  out2_fn reuses the SAME
    attention weights with a separate value projection of a later-stage x."""
    adim = cfg.attention_dims[si]
    heads = cfg.num_heads[si]
    hd = adim // heads
    pd = cfg.pos_dim
    b, t, _ = x.shape

    proj = L.apply_linear(p["in_proj"], x, compute_dtype)
    q = proj[..., :adim].reshape(b, t, heads, hd)
    k_chunk = proj[..., adim : 2 * adim]  # [B,T,adim]
    pos_q = proj[..., 2 * adim :].reshape(b, t, heads, pd)
    v1_chunk = L.apply_linear(p["v1"], x, compute_dtype)  # [B,T,adim/2]

    if k_cache is not None:
        k_src = jnp.concatenate([k_cache.astype(k_chunk.dtype), k_chunk], axis=1)
        v1_src = jnp.concatenate([v1_cache.astype(v1_chunk.dtype), v1_chunk], axis=1)
    else:
        k_src, v1_src = k_chunk, v1_chunk
    s = k_src.shape[1]
    k = k_src.reshape(b, s, heads, hd)

    scale = 1.0 / math.sqrt(hd)
    scores = jnp.einsum(
        "bthd,bshd->bhts", q.astype(k.dtype), k, preferred_element_type=jnp.float32
    ) * scale
    from k2transducerasr_tpu.ops.attention import rel_shift

    pe = _compact_rel_pos(t, s, 48)
    pos_k = L.apply_linear(p["pos_proj"], pe, compute_dtype).reshape(-1, heads, pd)
    pos_full = jnp.einsum(
        "bthd,rhd->bhtr", pos_q.astype(pos_k.dtype), pos_k, preferred_element_type=jnp.float32
    )
    scores = scores + rel_shift(pos_full, s)
    if mask is not None:
        scores = jnp.where(mask[:, None, :, :], scores, L.NEG_INF)
    attn_w = jax.nn.softmax(scores, axis=-1)  # [B,H,T,S]

    def weighted(v_src_):
        v = v_src_.reshape(b, s, heads, (adim // 2) // heads)
        ctx = jnp.einsum(
            "bhts,bshd->bthd", attn_w.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        return ctx.reshape(b, t, adim // 2)

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


def _pooling(p, x, cached_len, cached_avg, valid, compute_dtype):
    """Causal cumulative mean + projection.  cached_len/avg carry history
    across chunks (the reference's cached_len/cached_avg pair).
    x: [B, T, D].  Returns (out, new_len, new_avg)."""
    b, t, d = x.shape
    xm = x if valid is None else jnp.where(valid[:, :, None], x, 0.0)
    csum = jnp.cumsum(xm.astype(jnp.float32), axis=1)
    if cached_len is None:
        base_n = jnp.zeros((b, 1), jnp.float32)
        base_sum = jnp.zeros((b, 1, d), jnp.float32)
    else:
        base_n = cached_len[:, None].astype(jnp.float32)
        base_sum = (cached_avg.astype(jnp.float32) * base_n)[:, None, :]
    # counts: number of frames up to and including t (+ history)
    if valid is None:
        counts = jnp.arange(1, t + 1, dtype=jnp.float32)[None, :] + base_n
    else:
        counts = jnp.cumsum(valid.astype(jnp.float32), axis=1) + base_n
    total = csum + base_sum
    mean = total / jnp.maximum(counts[:, :, None], 1.0)
    out = L.apply_linear(p["proj"], mean.astype(x.dtype), compute_dtype)
    new_len = counts[:, -1]
    new_avg = mean[:, -1]
    return out, new_len, new_avg


def _causal_conv(p, dim, kernel, x, cache, valid, compute_dtype):
    """v1 conv module: pw+GLU -> causal depthwise (left kernel-1) ->
    DoubleSwish -> pw.  cache: [B, kernel-1, D] or None (zeros)."""
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


def _layer_forward(p, cfg, si, x, mask, caches, valid, compute_dtype):
    """caches: None (offline) or dict(len, avg, key, val1, val2, conv1,
    conv2) with batch-leading leaves.  Offline-causal convs use kernel-1
    left zero context via the same code path (cache=None -> zeros)."""
    dim = cfg.encoder_dims[si]
    kernel = cfg.cnn_module_kernels[si]
    streaming = caches is not None
    causal = cfg.causal

    x = x + _ff(p["ff1"], x, compute_dtype)

    out1, apply2, k_chunk, v1_chunk = _attention(
        p["attn"], cfg, si, x,
        caches["key"] if streaming else None,
        caches["val1"] if streaming else None,
        caches["val2"] if streaming else None,
        mask, compute_dtype,
    )
    new_caches = {}
    if streaming:
        left = caches["key"].shape[1]
        new_caches["key"] = jnp.concatenate(
            [caches["key"].astype(k_chunk.dtype), k_chunk], axis=1
        )[:, -left:]
        new_caches["val1"] = jnp.concatenate(
            [caches["val1"].astype(v1_chunk.dtype), v1_chunk], axis=1
        )[:, -left:]
    x = x + out1

    pool, new_len, new_avg = _pooling(
        p["pooling"], x,
        caches["len"] if streaming else None,
        caches["avg"] if streaming else None,
        valid, compute_dtype,
    )
    x = x + pool
    if streaming:
        new_caches["len"] = new_len
        new_caches["avg"] = new_avg

    if causal:
        c1, new_conv1 = _causal_conv(
            p["conv1"], dim, kernel, x, caches["conv1"] if streaming else None,
            valid, compute_dtype,
        )
    else:
        c1, new_conv1 = _centered_conv(p["conv1"], dim, x, valid, compute_dtype)
    x = x + c1
    if streaming:
        new_caches["conv1"] = new_conv1

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
    else:
        c2, new_conv2 = _centered_conv(p["conv2"], dim, x, valid, compute_dtype)
    x = x + c2
    if streaming:
        new_caches["conv2"] = new_conv2

    x = x + _ff(p["ff3"], x, compute_dtype)
    x = apply_basicnorm(p["norm"], x)
    return x, (new_caches if streaming else None)


# ---------------------------------------------------------------------------
# offline / streaming
# ---------------------------------------------------------------------------


def forward(params, cfg: ZipformerConfig, x, x_lens, compute_dtype=None):
    h = _embed_forward(params["embed"], cfg, x, compute_dtype)
    lens0 = jnp.maximum((x_lens - 7) // 2, 0)
    if cfg.causal:
        t0 = h.shape[1]
        t0_pad = -(-t0 // cfg.chunk_size) * cfg.chunk_size
        if t0_pad != t0:
            h = jnp.pad(h, ((0, 0), (0, t0_pad - t0), (0, 0)))
    t0 = h.shape[1]
    valid = L.length_mask(lens0, t0)
    h = jnp.where(valid[:, :, None], h, 0.0)

    for si in range(cfg.num_stacks):
        p = params["stacks"][si]
        ds = cfg.downsampling_factors[si]
        h = _convert_channels(h, cfg.encoder_dims[si])
        src = h
        if ds > 1:
            src = _simple_downsample(p["downsample_weights"], src, ds)
            v = valid[:, ::ds][:, : src.shape[1]]
        else:
            v = valid
        t = src.shape[1]
        mask = v[:, None, :] & v[:, :, None]
        if cfg.causal:
            mask = mask & _chunk_causal_mask(t, max(1, cfg.stack_chunk(si)), cfg.stack_left(si))[None]
        for layer in p["layers"]:
            src, _ = _layer_forward(layer, cfg, si, src, mask, None, v, compute_dtype)
            src = jnp.where(v[:, :, None], src, 0.0)
        if ds > 1:
            src = _simple_upsample(src, ds, t0)
            src = jnp.where(valid[:, :, None], src, 0.0)
            h = h + p["bypass_scale"] * (src - h)
        else:
            h = src
    return jnp.where(valid[:, :, None], h, 0.0), lens0


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
    """x_chunk: [B, 2*chunk+7, F] -> (enc_out [B, chunk, D], new_state)."""
    b = x_chunk.shape[0]
    c = cfg.chunk_size
    h = _embed_forward(params["embed"], cfg, x_chunk, compute_dtype)
    h = h[:, -c:, :]
    processed = state["processed"]

    new_layers = []
    li = 0
    for si in range(cfg.num_stacks):
        p = params["stacks"][si]
        ds = cfg.downsampling_factors[si]
        left = cfg.stack_left(si)
        cs = cfg.stack_chunk(si)
        h = _convert_channels(h, cfg.encoder_dims[si])
        src = h
        if ds > 1:
            src = _simple_downsample(p["downsample_weights"], src, ds)
        done = jnp.minimum(processed // ds, left)
        cache_pos = jnp.arange(left)[None, :]
        cache_valid = cache_pos >= (left - done)[:, None]
        kv_valid = jnp.concatenate([cache_valid, jnp.ones((b, cs), bool)], axis=1)
        mask = jnp.broadcast_to(kv_valid[:, None, :], (b, cs, left + cs))
        for layer in p["layers"]:
            src, nc = _layer_forward(
                layer, cfg, si, src, mask, state["layers"][li], None, compute_dtype
            )
            new_layers.append(nc)
            li += 1
        if ds > 1:
            src = _simple_upsample(src, ds, c)
            h = h + p["bypass_scale"] * (src - h)
        else:
            h = src
    return h, {"layers": new_layers, "processed": processed + c}
