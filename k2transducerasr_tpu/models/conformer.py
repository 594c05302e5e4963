"""Conformer encoder (offline + streaming), TPU-native.

Capability parity with the reference's conformer ONNX sessions:
  * offline: ``OfflineProjOfTransducer.cs:48-92`` (x [B,T,80] -> encoder_out)
  * streaming: ``OnlineProjOfConformer.cs`` — states are per-layer attention
    caches ``cached_attn [L, left_context, B, D]``, convolution caches
    ``cached_conv [L, kernel-1, B, D]`` and ``processed_lens [B]``
    (OnlineProjOfConformer.cs:55-81).

Architecture (icefall pruned_transducer_stateless conformer semantics):
Conv2dSubsampling (two stride-2 VALID 3x3 convs -> T/4) then N blocks of
[0.5*FF, rel-pos MHSA, conv module (GLU + depthwise k=31), 0.5*FF, LN].

TPU-first notes:
  * The whole streaming state is ONE fixed-shape pytree carried through a
    jitted chunk step with donated buffers — the reference's host-side
    ``stack_states``/``unstack_states`` interleave loops do not exist here.
  * Rel-pos attention uses the compact [T, S+T-1] form + the gather-free
    pad+reshape skew in ops/attention.rel_shift (no [T,S,H,dh] gather
    materialization — a take_along_axis there costs ~23x on TPU).
  * Chunked-causal masks are built once per (chunk, left-context) config so
    the offline graph can reproduce streaming output exactly — that identity
    is the test oracle (tests/test_conformer.py).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from k2transducerasr_tpu.ops import layers as L


@dataclasses.dataclass(frozen=True)
class ConformerConfig:
    feature_dim: int = 80
    d_model: int = 512
    num_layers: int = 12
    num_heads: int = 8
    ff_dim: int = 2048
    cnn_kernel: int = 31
    # streaming-trained models: causal conv + bounded-left-context attention
    causal: bool = False
    chunk_size: int = 16  # frames after 4x subsampling
    left_context: int = 64  # attention left context, subsampled frames
    subsample_out: int | None = None  # frequency-linear in-dim override

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads

    def subsampled_len(self, t: int) -> int:
        return ((t - 1) // 2 - 1) // 2

    @property
    def decode_chunk_len(self) -> int:
        """Raw feature frames consumed per streaming step."""
        return 4 * self.chunk_size

    @property
    def chunk_input_len(self) -> int:
        """Raw feature frames the streaming step consumes per call: the
        subsampling stack needs a 7-frame receptive field + stride 4, so a
        window of 4*chunk+3 yields exactly ``chunk_size`` output frames."""
        return 4 * self.chunk_size + 3


Config = ConformerConfig  # registry alias


def output_dim(cfg: ConformerConfig) -> int:
    return cfg.d_model


def output_chunk_len(cfg: ConformerConfig) -> int:
    """Encoder output frames produced per streaming step."""
    return cfg.chunk_size


# ---------------------------------------------------------------------------
# Parameter init
# ---------------------------------------------------------------------------


def _init_layer(key, cfg: ConformerConfig):
    ks = jax.random.split(key, 12)
    d, ff = cfg.d_model, cfg.ff_dim
    return {
        "ff1": {
            "ln": L.init_layernorm(d),
            "w1": L.init_linear(ks[0], d, ff),
            "w2": L.init_linear(ks[1], ff, d),
        },
        "attn": {
            "ln": L.init_layernorm(d),
            "q": L.init_linear(ks[2], d, d),
            "k": L.init_linear(ks[3], d, d),
            "v": L.init_linear(ks[4], d, d),
            "pos": L.init_linear(ks[5], d, d, bias=False),
            "out": L.init_linear(ks[6], d, d),
            "u": jnp.zeros((cfg.num_heads, cfg.head_dim)),
            "v_bias": jnp.zeros((cfg.num_heads, cfg.head_dim)),
        },
        "conv": {
            "ln": L.init_layernorm(d),
            "pw1": L.init_conv1d(ks[7], d, 2 * d, kernel=1),
            "dw": L.init_conv1d(ks[8], d, d, kernel=cfg.cnn_kernel, groups=d),
            "bn": L.init_batchnorm(d),
            "pw2": L.init_conv1d(ks[9], d, d, kernel=1),
        },
        "ff2": {
            "ln": L.init_layernorm(d),
            "w1": L.init_linear(ks[10], d, ff),
            "w2": L.init_linear(ks[11], ff, d),
        },
        "norm_final": L.init_layernorm(d),
    }


def init_params(key, cfg: ConformerConfig):
    k_sub, k_lin, *k_layers = jax.random.split(key, cfg.num_layers + 2)
    freq_out = ((cfg.feature_dim - 1) // 2 - 1) // 2
    sub = {
        "conv1": L.init_conv2d(k_sub, 1, cfg.d_model, (3, 3)),
        "conv2": L.init_conv2d(jax.random.fold_in(k_sub, 1), cfg.d_model, cfg.d_model, (3, 3)),
        "out": L.init_linear(k_lin, cfg.d_model * freq_out, cfg.d_model),
    }
    return {
        "subsample": sub,
        "layers": [_init_layer(k, cfg) for k in k_layers],
    }


# ---------------------------------------------------------------------------
# Subsampling
# ---------------------------------------------------------------------------


def subsample(params, cfg: ConformerConfig, x, compute_dtype=None):
    """x: [B, T, F] -> [B, T', d_model], T' = ((T-1)//2 - 1)//2."""
    h = x[..., None]  # [B, T, F, 1]
    h = jax.nn.relu(L.apply_conv2d(params["conv1"], h, strides=(2, 2), compute_dtype=compute_dtype))
    h = jax.nn.relu(L.apply_conv2d(params["conv2"], h, strides=(2, 2), compute_dtype=compute_dtype))
    b, t, f, c = h.shape
    # icefall Conv2dSubsampling flattens (C, F') with F' fastest
    # (transpose(1,2).view(b,t,c*f)); match it so exported
    # ``encoder_embed.out.weight`` imports column-for-column.
    h = jnp.transpose(h, (0, 1, 3, 2)).reshape(b, t, c * f)
    return L.apply_linear(params["out"], h, compute_dtype)


# ---------------------------------------------------------------------------
# Relative positional attention
# ---------------------------------------------------------------------------


def _rel_pos_emb(t_q: int, s_kv: int, dim: int, dtype=jnp.float32):
    """Sinusoidal embeddings for relative positions in DESCENDING order
    (r = s_kv-1 .. -(t_q-1)) so scores align via the gather-free rel_shift
    (ops/attention.py).

    INTERLEAVED sin/cos layout (pe[:, 0::2]=sin, pe[:, 1::2]=cos) — the
    espnet/icefall RelPositionalEncoding convention real exports trained
    ``linear_pos`` against (pinned by tests/icefall_conformer_oracle.py)."""
    from k2transducerasr_tpu.ops.attention import descending_rel_positions

    r = descending_rel_positions(t_q, s_kv)  # [R]
    inv = jnp.exp(
        jnp.arange(0, dim, 2, dtype=jnp.float32) * (-math.log(10000.0) / dim)
    )
    ang = r[:, None] * inv[None, :]
    pe = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=2).reshape(len(r), dim)
    return pe.astype(dtype)  # [R, dim]


def rel_pos_attention(p, cfg: ConformerConfig, x_q, x_kv, mask, compute_dtype=None,
                      pad_lens=None, chunk_left=None, kv_start=None):
    """Transformer-XL attention with queries as the LAST t_q positions of the
    kv sequence (true offline, where x_q == x_kv, and streaming, where x_kv
    is [cache | chunk]).

    x_q: [B, T, D]; x_kv: [B, S, D]; mask: [B, T, S] bool (True = attend) or
    None.  Returns [B, T, D].

    Mask SPECS (``pad_lens``/``chunk_left``/``kv_start``, same semantics as
    models/zipformer2._attn_shared) route the whole attention through the
    fused probs-consumer Pallas kernel (softmax(scores) @ v in VMEM): the
    (q+u)·k + skew((q+v)·p) form maps onto the kernel's q@k +
    skew(pos_q@pos_k) by folding pos_bias_u/v and the 1/sqrt(dh) scale into
    the query operands.  The fold happens in f32 before the single cast to
    compute dtype, so in f32 compute the two paths are exactly equivalent;
    under bf16 compute they still differ by one bf16 rounding (the kernel
    rounds the SCALED query to bf16, the XLA fallback scales the f32
    scores after an unscaled bf16 matmul) — BASELINE.md records ~5e-3
    on-TPU deltas for this family.  The kernel's key-side-only masking
    differs from the query+key mask solely at invalid query rows, which
    forward() zeroes after every block.
    """
    h, dh = cfg.num_heads, cfg.head_dim
    b, t, d = x_q.shape
    s = x_kv.shape[1]

    q = L.apply_linear(p["q"], x_q, compute_dtype).reshape(b, t, h, dh)
    k = L.apply_linear(p["k"], x_kv, compute_dtype).reshape(b, s, h, dh)
    v = L.apply_linear(p["v"], x_kv, compute_dtype).reshape(b, s, h, dh)

    pe = _rel_pos_emb(t, s, d)
    pos = L.apply_linear(p["pos"], pe, compute_dtype).reshape(-1, h, dh)  # [R, H, dh]

    scale = 1.0 / math.sqrt(dh)
    q_u = (q + p["u"]).astype(k.dtype)
    q_v = (q + p["v_bias"]).astype(k.dtype)

    has_spec = pad_lens is not None or chunk_left is not None or kv_start is not None
    if has_spec and mask is None:
        from k2transducerasr_tpu.ops import attention_pallas as AP

        mode = AP.flash_attn_mode()
        if mode != "off":
            # fold the 1/sqrt(dh) scale into the query operands IN F32
            # before the single cast to compute dtype (ADVICE r4: scaling
            # after the bf16 cast added a second rounding vs the XLA
            # fallback, which scales the f32 scores)
            qs = ((q + p["u"]).astype(jnp.float32) * scale).astype(k.dtype)
            ps = ((q + p["v_bias"]).astype(jnp.float32) * scale).astype(pos.dtype)
            ch, lf = chunk_left if chunk_left is not None else (0, 0)
            # fused probs-consumer kernel: softmax(scores) @ v in VMEM, the
            # [B,H,T,S] probs never materialize in HBM
            ctx = AP.relpos_attn_ctx(
                qs, k, ps, pos, v, pad_lens,
                interpret=(mode == "interpret"), chunk=ch, left=lf,
                kv_start=kv_start,
            )
            return L.apply_linear(p["out"], ctx.reshape(b, t, h * dh), compute_dtype)
        mask = AP.mask_from_specs(b, t, s, pad_lens, chunk_left, kv_start)

    from k2transducerasr_tpu.ops.attention import rel_shift

    ac = jnp.einsum("bthd,bshd->bhts", q_u, k, preferred_element_type=jnp.float32)
    bd_full = jnp.einsum("bthd,rhd->bhtr", q_v, pos, preferred_element_type=jnp.float32)
    bd = rel_shift(bd_full, s)
    scores = (ac + bd) * scale  # [B, H, T, S] f32
    if mask is not None:
        scores = jnp.where(mask[:, None, :, :], scores, L.NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum(
        "bhts,bshd->bthd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return L.apply_linear(p["out"], ctx.reshape(b, t, h * dh), compute_dtype)


# ---------------------------------------------------------------------------
# Conformer block
# ---------------------------------------------------------------------------


def _ff(p, x, compute_dtype):
    h = L.apply_layernorm(p["ln"], x)
    h = L.swish(L.apply_linear(p["w1"], h, compute_dtype))
    return L.apply_linear(p["w2"], h, compute_dtype)


def _conv_module(p, cfg: ConformerConfig, x, compute_dtype, conv_cache=None, valid=None):
    """x: [B, T, D].  conv_cache: [B, kernel-1, D] left context (causal) or
    None (offline SAME padding for non-causal, zero left-pad for causal).
    ``valid``: [B, T] bool — padded positions are zeroed before the depthwise
    conv so they cannot bleed into valid frames through its receptive field.
    Returns (out, new_cache)."""
    h = L.apply_layernorm(p["ln"], x)
    h = L.glu(L.apply_conv1d(p["pw1"], h, padding="SAME", compute_dtype=compute_dtype))
    if valid is not None:
        h = jnp.where(valid[:, :, None], h, 0.0)
    k = cfg.cnn_kernel
    if cfg.causal:
        if conv_cache is None:
            cache = jnp.zeros((x.shape[0], k - 1, x.shape[2]), h.dtype)
        else:
            cache = conv_cache.astype(h.dtype)
        hc = jnp.concatenate([cache, h], axis=1)
        new_cache = hc[:, -(k - 1) :, :]
        h = L.apply_conv1d(p["dw"], hc, groups=cfg.d_model, padding="VALID", compute_dtype=compute_dtype)
    else:
        new_cache = None
        h = L.apply_conv1d(p["dw"], h, groups=cfg.d_model, padding="SAME", compute_dtype=compute_dtype)
    h = L.swish(L.apply_batchnorm(p["bn"], h))
    h = L.apply_conv1d(p["pw2"], h, padding="SAME", compute_dtype=compute_dtype)
    return h, new_cache


def _block(p, cfg: ConformerConfig, x, mask, compute_dtype, conv_cache=None, valid=None,
           pad_lens=None, chunk_left=None):
    """One conformer layer (offline: attention kv == q sequence, both at the
    post-ff1 stage — the same stage the streaming path caches).
    Returns (out, new_conv_cache)."""
    x = x + 0.5 * _ff(p["ff1"], x, compute_dtype)
    attn_in = L.apply_layernorm(p["attn"]["ln"], x)
    x = x + rel_pos_attention(p["attn"], cfg, attn_in, attn_in, mask, compute_dtype,
                              pad_lens=pad_lens, chunk_left=chunk_left)
    h, new_cache = _conv_module(p["conv"], cfg, x, compute_dtype, conv_cache, valid)
    x = x + h
    x = x + 0.5 * _ff(p["ff2"], x, compute_dtype)
    return L.apply_layernorm(p["norm_final"], x), new_cache


# ---------------------------------------------------------------------------
# Offline forward
# ---------------------------------------------------------------------------


def _chunk_causal_mask(t: int, chunk: int, left: int):
    """icefall streaming chunked-attention mask — shared helper
    (ops/attention.chunk_causal_mask)."""
    from k2transducerasr_tpu.ops.attention import chunk_causal_mask

    return chunk_causal_mask(t, chunk, left)


def forward(params, cfg: ConformerConfig, x, x_lens, compute_dtype=None):
    """x: [B, T, F]; x_lens: [B] -> (enc_out [B, T', D], out_lens [B])."""
    b, t, _ = x.shape
    h = subsample(params["subsample"], cfg, x, compute_dtype)
    # espnet RelPositionalEncoding scales the embedding by sqrt(d_model)
    # before the first block (icefall stateless conformer keeps this);
    # real exports' weights are trained against the scaled activations
    h = h * math.sqrt(cfg.d_model)
    t_sub = h.shape[1]
    out_lens = ((x_lens - 1) // 2 - 1) // 2
    valid = L.length_mask(out_lens, t_sub)  # [B, T']
    # mask expressed as specs so rel_pos_attention can route to the fused
    # Pallas kernel; invalid query rows are zeroed after every block below
    pad_lens = jnp.maximum(out_lens, 0).astype(jnp.int32)
    chunk_left = (cfg.chunk_size, cfg.left_context) if cfg.causal else None
    for layer in params["layers"]:
        h, _ = _block(layer, cfg, h, None, compute_dtype, valid=valid,
                      pad_lens=pad_lens, chunk_left=chunk_left)
        h = jnp.where(valid[:, :, None], h, 0.0)
    return h, out_lens


# ---------------------------------------------------------------------------
# Streaming
# ---------------------------------------------------------------------------


def init_state(cfg: ConformerConfig, batch: int):
    """Fixed-shape streaming state pytree (the reference's cached_attn /
    cached_conv / processed_lens, OnlineProjOfConformer.cs:55-81).  Every
    leaf is laid out batch-leading ``[B, ...]`` — the framework-wide state
    convention, so the online lane pool can scatter/select on axis 0."""
    lc, k, d = cfg.left_context, cfg.cnn_kernel, cfg.d_model
    return {
        "attn": jnp.zeros((batch, cfg.num_layers, lc, d), jnp.float32),
        "conv": jnp.zeros((batch, cfg.num_layers, k - 1, d), jnp.float32),
        "processed": jnp.zeros((batch,), jnp.int32),
    }


def streaming_step(params, cfg: ConformerConfig, state, x_chunk, compute_dtype=None):
    """One chunk step.  x_chunk: [B, chunk_input_len, F] raw features ->
    (enc_out [B, chunk_size, D], new_state).

    The attention cache stores each layer's post-ff1 sublayer input for the
    previous ``left_context`` subsampled frames.
    """
    b = x_chunk.shape[0]
    lc, c = cfg.left_context, cfg.chunk_size
    h = subsample(params["subsample"], cfg, x_chunk, compute_dtype)  # [B, c, D]
    h = h * math.sqrt(cfg.d_model)  # espnet xscale — see forward()
    processed = state["processed"]

    # attention gating over [cache | chunk]: cache slot j is valid if it
    # holds a real frame, i.e. j >= lc - min(processed, lc) — expressed as
    # the first valid column per lane so rel_pos_attention can route to the
    # fused Pallas kernel
    kv_start = (lc - jnp.minimum(processed, lc)).astype(jnp.int32)

    new_attn = []
    new_conv = []
    for i, layer in enumerate(params["layers"]):
        x_ff = h + 0.5 * _ff(layer["ff1"], h, compute_dtype)
        kv = jnp.concatenate([state["attn"][:, i].astype(x_ff.dtype), x_ff], axis=1)
        new_attn.append(kv[:, -lc:, :].astype(jnp.float32))
        attn_in = L.apply_layernorm(layer["attn"]["ln"], x_ff)
        kv_in = L.apply_layernorm(layer["attn"]["ln"], kv)
        x_attn = x_ff + rel_pos_attention(
            layer["attn"], cfg, attn_in, kv_in, None, compute_dtype,
            kv_start=kv_start,
        )
        hcv, conv_cache = _conv_module(
            layer["conv"], cfg, x_attn, compute_dtype, state["conv"][:, i]
        )
        new_conv.append(conv_cache.astype(jnp.float32))
        x_cv = x_attn + hcv
        x_out = x_cv + 0.5 * _ff(layer["ff2"], x_cv, compute_dtype)
        h = L.apply_layernorm(layer["norm_final"], x_out)

    new_state = {
        "attn": jnp.stack(new_attn, axis=1),
        "conv": jnp.stack(new_conv, axis=1),
        "processed": processed + c,
    }
    return h, new_state
