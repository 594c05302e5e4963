"""Shared neural-net ops as pure functions over param pytrees.

Conventions:
  * Params are nested dicts of ``jnp.ndarray`` stored in float32.
  * ``apply_*`` functions are shape-polymorphic over leading batch axes and
    respect an optional ``compute_dtype`` (bf16 on TPU) with f32 accumulation
    via ``preferred_element_type`` so matmuls land on the MXU at full rate.
  * Initializers take an explicit PRNG key; no global state.

These are the building blocks for the encoder families that replace the
reference's opaque ONNX graphs (SURVEY.md §2.2 row 1).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _uniform(key, shape, scale):
    return jax.random.uniform(key, shape, jnp.float32, -scale, scale)


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------


def init_linear(key, in_dim: int, out_dim: int, bias: bool = True):
    kw, kb = jax.random.split(key)
    scale = 1.0 / math.sqrt(in_dim)
    p = {"w": _uniform(kw, (in_dim, out_dim), scale)}
    if bias:
        p["b"] = _uniform(kb, (out_dim,), scale)
    return p


def apply_linear(p, x, compute_dtype=None):
    if "w_q8" in p:
        return _apply_linear_int8(p, x, compute_dtype)
    w = p["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jnp.matmul(x, w, preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"]
    # store activations in the compute dtype too: accumulation stays f32
    # inside the MXU, but keeping every inter-op tensor f32 doubles HBM
    # traffic on a bandwidth-bound model (xprof r4: the [B,H,T,S] attention
    # probs alone were 600 MB/layer-pair in f32)
    if compute_dtype is not None:
        y = y.astype(compute_dtype)
    return y


def quantize_linear_int8(p):
    """{"w": [in, out], ...} -> {"w_q8": int8, "w_scale": [out] f32, ...} —
    symmetric per-output-channel weight quantization, the TPU-native
    equivalent of the reference's int8 ONNX execution mode
    (README.EN.md:276; ORT int8 sessions OfflineModel.cs:84-118)."""
    w = p["w"]
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    scale = jnp.where(scale == 0, 1.0, scale)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    out = {"w_q8": q, "w_scale": scale.astype(jnp.float32)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def quantize_tree_int8(tree, min_size: int = 4096):
    """Walk a param pytree and quantize every linear-shaped leaf dict
    ({"w": 2-D, size >= min_size}) to int8.  Conv weights (>2-D) and small
    projections are left in float — they carry negligible weight traffic
    and the small ones are accuracy-sensitive."""
    if isinstance(tree, dict):
        w = tree.get("w")
        if w is not None and getattr(w, "ndim", 0) == 2 and w.size >= min_size:
            return quantize_linear_int8(tree)
        return {k: quantize_tree_int8(v, min_size) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(quantize_tree_int8(v, min_size) for v in tree)
    return tree


def _apply_linear_int8(p, x, compute_dtype):
    """int8 x int8 -> int32 matmul with dynamic per-token symmetric
    activation quantization:

        y = (q(x) @ w_q8) * x_scale * w_scale + b

    The MXU executes int8 dots at ~2x bf16 throughput; honest caveat
    (BASELINE.md): this encoder is ACTIVATION-bandwidth-bound, so the win
    is bounded by the halved weight traffic, not the doubled FLOPs — the
    mode exists for reference-parity (int8 is the reference's production
    configuration) and is benchmarked, not assumed, to help."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.where(amax == 0, 1.0, amax) / 127.0
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, p["w_q8"], (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * xs * p["w_scale"]
    if "b" in p:
        y = y + p["b"]
    if compute_dtype is not None:
        y = y.astype(compute_dtype)
    return y


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------


def init_layernorm(dim: int):
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def apply_layernorm(p, x, eps: float = 1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def init_biasnorm(dim: int):
    """icefall Zipformer BiasNorm: x / rms(x - bias) * exp(log_scale)."""
    return {"bias": jnp.zeros((dim,)), "log_scale": jnp.zeros(())}


def apply_biasnorm(p, x, eps: float = 1e-8):
    x32 = x.astype(jnp.float32)
    centered = x32 - p["bias"]
    rms = jnp.sqrt(jnp.mean(centered * centered, axis=-1, keepdims=True) + eps)
    return (x32 / rms * jnp.exp(p["log_scale"])).astype(x.dtype)


def init_batchnorm(dim: int):
    """Inference-mode batchnorm (folded running stats), used by the conformer
    conv module.  At import time running stats fold into scale/bias."""
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def apply_batchnorm(p, x):
    return x * p["scale"] + p["bias"]


# ---------------------------------------------------------------------------
# Activations (icefall zipformer family)
# ---------------------------------------------------------------------------


def swish(x):
    return x * jax.nn.sigmoid(x)


def double_swish(x):
    """icefall DoubleSwish: x * sigmoid(x - 1)."""
    return x * jax.nn.sigmoid(x - 1.0)


def swoosh_l(x):
    """SwooshL(x) = log(1 + exp(x-4)) - 0.08x - 0.035 (icefall zipformer2)."""
    return jnp.logaddexp(0.0, x - 4.0) - 0.08 * x - 0.035


def swoosh_r(x):
    """SwooshR(x) = log(1 + exp(x-1)) - 0.08x - 0.313261687."""
    return jnp.logaddexp(0.0, x - 1.0) - 0.08 * x - 0.313261687


def glu(x, axis=-1):
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


# ---------------------------------------------------------------------------
# Convolutions
# ---------------------------------------------------------------------------


def init_conv1d(key, in_ch: int, out_ch: int, kernel: int, groups: int = 1, bias: bool = True):
    kw, kb = jax.random.split(key)
    fan_in = in_ch // groups * kernel
    scale = 1.0 / math.sqrt(fan_in)
    p = {"w": _uniform(kw, (kernel, in_ch // groups, out_ch), scale)}
    if bias:
        p["b"] = _uniform(kb, (out_ch,), scale)
    return p


def apply_conv1d(p, x, groups: int = 1, padding="SAME", compute_dtype=None):
    """x: [B, T, C_in] -> [B, T', C_out].  Weight layout [K, C_in/g, C_out].

    Depthwise convs (groups == C_in == C_out) are computed as K shifted
    multiply-adds instead of ``conv_general_dilated``: XLA lowers a
    feature_group_count=C grouped conv on TPU through T-major layout
    conversions that cost more than the conv itself (xprof r4: 8 x 952 us
    of pure layout copies around the zipformer2 conv modules), while the
    shifted form stays in the activations' natural [B, T, C] layout and
    fuses into one VPU loop.  Products are exact (bf16 x bf16 is
    representable in f32) and accumulation is f32 in ascending-k order, so
    all call sites (offline/streaming) agree bit-for-bit with each other.
    """
    w = p["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    k, cin_g, cout = w.shape
    if cin_g == 1 and groups == x.shape[-1] == cout:
        if padding == "SAME":
            lo = (k - 1) // 2
            xp = jnp.pad(x, ((0, 0), (lo, k - 1 - lo), (0, 0)))
        else:  # VALID
            xp = x
        t_out = xp.shape[1] - k + 1
        xp32 = xp.astype(jnp.float32)
        w32 = w.astype(jnp.float32)
        y = xp32[:, 0:t_out] * w32[0, 0][None, None, :]
        for kk in range(1, k):
            y = y + xp32[:, kk : kk + t_out] * w32[kk, 0][None, None, :]
    else:
        y = jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=(1,),
            padding=padding,
            dimension_numbers=("NTC", "TIO", "NTC"),
            feature_group_count=groups,
            preferred_element_type=jnp.float32,
        )
    if "b" in p:
        y = y + p["b"]
    if compute_dtype is not None:
        y = y.astype(compute_dtype)
    return y


def apply_conv2d_c1_banded(p, x, compute_dtype=None):
    """The embed stacks' first conv (3x3, C_in=1, stride 1, freq pad 1,
    time VALID) as ONE banded matmul plus 3 time-shifted adds.

    Why: XLA's conv lowering for this op materializes the f32
    [B,T,F,c1] activation in one layout, copies it to another, and copies
    again for the bf16 cast — ~4.0 ms of the 29.9 ms flagship program was
    this one tiny-FLOP conv (r5 xprof).  The banded form computes the SAME
    products with f32 accumulation as a [B,T,F+2] @ [F+2, 3*F*c1] matmul in
    the activations' natural layout: measured 3.49 vs 5.96 ms/iter in the
    isolated harness (benchmarks/embed_sweep.py), parity to 2e-5 f32.
    The dense band wastes (F+2)/3 x the conv's FLOPs, which is free here
    (the op is layout/bandwidth-bound, c1 = 8).

    p: {"w": [3, 3, 1, c1], "b": [c1]} — the ordinary conv2d params, so
    importers are untouched.  x: [B, T, F] -> [B, T-2, F, c1].
    """
    w = p["w"]
    k_t, k_f, _, c1 = w.shape
    b_, t, f = x.shape
    fp = f + k_f - 1  # padded freq width
    # E[df, g, f'] = 1 iff g == f' + df: band[dt, g, f', c] = w[dt, g-f', 0, c];
    # K axis is (dt, g) so the 3 time-shifted input copies concatenate along
    # K and ONE dot produces the final output — a first version emitted a
    # [B, T, 3, F, c1] f32 partials tensor (377 MB at bench shapes) and paid
    # ~1.3 ms materializing + re-reading it
    eye = jnp.stack([jnp.eye(fp, f, -df, dtype=w.dtype) for df in range(k_f)])
    band = jnp.einsum("egf,dec->dgfc", eye, w[:, :, 0, :]).reshape(k_t * fp, f * c1)
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1)))  # freq SAME
    if compute_dtype is not None:
        xp = xp.astype(compute_dtype)
        band = band.astype(compute_dtype)
    x3 = jnp.concatenate(
        [xp[:, dt : t - (k_t - 1) + dt] for dt in range(k_t)], axis=-1
    )  # [B, T-2, 3*(F+2)]
    y = jnp.matmul(x3, band, preferred_element_type=jnp.float32)
    y = y.reshape(b_, t - (k_t - 1), f, c1)
    if "b" in p:
        y = y + p["b"]
    if compute_dtype is not None:
        y = y.astype(compute_dtype)
    return y


def apply_conv2d_banded_s2(p, x, compute_dtype=None):
    """3x3 conv, stride (2,2), VALID both dims, as 3 strided matmuls + add
    — the embed stacks' conv2 (C_in=8 -> 32 at F=80).

    Same rationale as apply_conv2d_c1_banded: the conv form forces a
    ~1.5 ms layout copy of its [B,T,F,8] bf16 input plus a ~1.1 ms conv
    fusion in the flagship program; the banded form reads the conv1 output
    in its natural [B, T, F*Ci] layout.  The dense band wastes ~(F/3)x the
    conv's FLOPs (118 vs 5.5 GFLOP at bench shapes) which is still only
    ~0.6 ms of MXU time — this op is layout-bound, not FLOP-bound.

    p: {"w": [3, 3, Ci, Co], "b": [Co]}.  x: [B, T, F, Ci] ->
    [B, (T-3)//2+1, (F-3)//2+1, Co], f32 accumulation per output.
    """
    w = p["w"]
    b_, t, f, ci = x.shape
    co = w.shape[-1]
    t2 = (t - 3) // 2 + 1
    f2 = (f - 3) // 2 + 1
    # E[df, fi, f2'] = 1 iff fi == 2*f2' + df
    fi = jnp.arange(f)[None, :, None]
    f2i = jnp.arange(f2)[None, None, :]
    df = jnp.arange(3)[:, None, None]
    eye = (fi == 2 * f2i + df).astype(w.dtype)  # [3, F, F2]
    band = jnp.einsum("efg,deio->dfigo", eye, w).reshape(3, f * ci, f2 * co)
    xf = x.reshape(b_, t, f * ci)
    if compute_dtype is not None:
        xf = xf.astype(compute_dtype)
        band = band.astype(compute_dtype)
    y = None
    for dt in range(3):
        rows = xf[:, dt : dt + 2 * (t2 - 1) + 1 : 2]  # [B, T2, F*Ci]
        z = jnp.matmul(rows, band[dt], preferred_element_type=jnp.float32)
        y = z if y is None else y + z
    y = y.reshape(b_, t2, f2, co)
    if "b" in p:
        y = y + p["b"]
    if compute_dtype is not None:
        y = y.astype(compute_dtype)
    return y


def init_conv2d(key, in_ch: int, out_ch: int, kernel: tuple[int, int], bias: bool = True):
    kw, kb = jax.random.split(key)
    fan_in = in_ch * kernel[0] * kernel[1]
    scale = 1.0 / math.sqrt(fan_in)
    p = {"w": _uniform(kw, (*kernel, in_ch, out_ch), scale)}
    if bias:
        p["b"] = _uniform(kb, (out_ch,), scale)
    return p


def apply_conv2d(p, x, strides=(1, 1), padding="VALID", compute_dtype=None):
    """x: [B, H, W, C_in] -> [B, H', W', C_out].  Weight [kh, kw, C_in, C_out].

    (A shifted-outer-product variant for C_in == 1 was tried in round 4 and
    measured no better than conv_general_dilated — 2-D shifts along the
    narrow frequency axis do not vectorize; see _depthwise2d.)"""
    w = p["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=strides,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if "b" in p:
        y = y + p["b"]
    if compute_dtype is not None:
        y = y.astype(compute_dtype)  # see apply_linear: bandwidth, not accuracy
    return y


# ---------------------------------------------------------------------------
# Embedding
# ---------------------------------------------------------------------------


def init_embedding(key, vocab: int, dim: int):
    return {"table": jax.random.normal(key, (vocab, dim), jnp.float32)}


def apply_embedding(p, ids):
    return jnp.take(p["table"], ids, axis=0)


# ---------------------------------------------------------------------------
# Masking helpers
# ---------------------------------------------------------------------------


def length_mask(lengths, max_len: int):
    """[B] lengths -> [B, max_len] bool mask (True = valid)."""
    pos = jnp.arange(max_len)[None, :]
    return pos < lengths[:, None]


NEG_INF = -1e9  # attention mask fill (f32-safe, bf16-safe)
