"""LSTM transducer encoder (icefall lstm_transducer family).

Reference adapter: ``OnlineProjOfLstm.cs`` — streaming states are two
tensors per layer, ``state0 [L, B, d_model]`` (projected hidden) and
``state1 [L, B, rnn_hidden]`` (cell), metadata ``d_model``/``rnn_hidden_size``
(``OnlineModel.cs:118-129``).

Architecture: Conv2dSubsampling (shared with conformer) then N layers of
[LSTM-with-projection -> residual -> feedforward -> residual -> layernorm].

TPU-first: the input-to-gates projection ``x @ Wx`` for ALL timesteps is
hoisted out of the recurrence into one large MXU matmul; the ``lax.scan``
carries only the [B, H] recurrent matmul.  LSTMs are causal, so offline and
streaming are the same program over different windows — that identity is the
test oracle.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from k2transducerasr_tpu.models.conformer import subsample as conv_subsample
from k2transducerasr_tpu.ops import layers as L


@dataclasses.dataclass(frozen=True)
class LstmConfig:
    feature_dim: int = 80
    d_model: int = 512
    rnn_hidden_size: int = 1024
    num_layers: int = 12
    ff_dim: int = 2048
    chunk_size: int = 16  # subsampled frames per streaming step

    def subsampled_len(self, t: int) -> int:
        return ((t - 1) // 2 - 1) // 2

    @property
    def decode_chunk_len(self) -> int:
        return 4 * self.chunk_size

    @property
    def chunk_input_len(self) -> int:
        return 4 * self.chunk_size + 3


Config = LstmConfig


def output_dim(cfg: LstmConfig) -> int:
    return cfg.d_model


def output_chunk_len(cfg: LstmConfig) -> int:
    return cfg.chunk_size


def _init_lstm(key, in_dim: int, hidden: int, proj: int):
    k1, k2, k3 = jax.random.split(key, 3)
    scale = 1.0 / jnp.sqrt(hidden)
    return {
        "wx": jax.random.uniform(k1, (in_dim, 4 * hidden), jnp.float32, -scale, scale),
        "wh": jax.random.uniform(k2, (proj, 4 * hidden), jnp.float32, -scale, scale),
        "b": jnp.zeros((4 * hidden,)),
        "wp": jax.random.uniform(k3, (hidden, proj), jnp.float32, -scale, scale),
    }


def init_params(key, cfg: LstmConfig):
    k_sub, *k_layers = jax.random.split(key, cfg.num_layers + 1)
    freq_out = ((cfg.feature_dim - 1) // 2 - 1) // 2
    sub = {
        "conv1": L.init_conv2d(k_sub, 1, cfg.d_model, (3, 3)),
        "conv2": L.init_conv2d(jax.random.fold_in(k_sub, 1), cfg.d_model, cfg.d_model, (3, 3)),
        "out": L.init_linear(jax.random.fold_in(k_sub, 2), cfg.d_model * freq_out, cfg.d_model),
    }
    layers = []
    for k in k_layers:
        ks = jax.random.split(k, 3)
        layers.append(
            {
                "lstm": _init_lstm(ks[0], cfg.d_model, cfg.rnn_hidden_size, cfg.d_model),
                # icefall RNNEncoderLayer feed_forward: Linear -> DoubleSwish
                # -> Linear (no pre-norm); norm_final closes the layer
                "ff": {
                    "w1": L.init_linear(ks[1], cfg.d_model, cfg.ff_dim),
                    "w2": L.init_linear(ks[2], cfg.ff_dim, cfg.d_model),
                },
                "norm_final": L.init_layernorm(cfg.d_model),
            }
        )
    return {"subsample": sub, "layers": layers}


def _lstm_layer(p, x, h0, c0, compute_dtype=None):
    """x: [B, T, D] -> (out [B, T, proj], h_T [B, proj], c_T [B, H]).

    Input projection hoisted: one [B*T, D] x [D, 4H] MXU matmul; the scan
    carries only the [B, proj] x [proj, 4H] recurrent product.
    """
    hidden = p["wp"].shape[0]
    gates_x = L.apply_linear({"w": p["wx"], "b": p["b"]}, x, compute_dtype)  # [B,T,4H]

    wh = p["wh"].astype(compute_dtype) if compute_dtype else p["wh"]
    wp = p["wp"].astype(compute_dtype) if compute_dtype else p["wp"]

    def step(carry, gx):
        h, c = carry
        hq = h.astype(wh.dtype) if compute_dtype else h
        gates = gx + jnp.matmul(hq, wh, preferred_element_type=jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        hidden_out = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        hoq = hidden_out.astype(wp.dtype) if compute_dtype else hidden_out
        h_new = jnp.matmul(hoq, wp, preferred_element_type=jnp.float32)
        return (h_new, c_new), h_new

    (h_t, c_t), out = jax.lax.scan(step, (h0, c0), jnp.swapaxes(gates_x, 0, 1))
    del hidden
    return jnp.swapaxes(out, 0, 1), h_t, c_t


def _encode(params, cfg: LstmConfig, h, state, compute_dtype=None):
    """Run all layers over subsampled input h [B, T', D] with per-layer
    (h0, c0) carried in/out."""
    new_h, new_c = [], []
    for i, layer in enumerate(params["layers"]):
        h0 = state["h"][:, i]
        c0 = state["c"][:, i]
        lstm_out, h_t, c_t = _lstm_layer(layer["lstm"], h, h0, c0, compute_dtype)
        new_h.append(h_t)
        new_c.append(c_t)
        h = h + lstm_out
        ff = layer["ff"]
        ffh = L.double_swish(L.apply_linear(ff["w1"], h, compute_dtype))
        h = h + L.apply_linear(ff["w2"], ffh, compute_dtype)
        h = L.apply_layernorm(layer["norm_final"], h)
    return h, {"h": jnp.stack(new_h, axis=1), "c": jnp.stack(new_c, axis=1)}


def init_state(cfg: LstmConfig, batch: int):
    """Batch-leading state convention: [B, L, ...] (see conformer.init_state)."""
    return {
        "h": jnp.zeros((batch, cfg.num_layers, cfg.d_model), jnp.float32),
        "c": jnp.zeros((batch, cfg.num_layers, cfg.rnn_hidden_size), jnp.float32),
    }


def forward(params, cfg: LstmConfig, x, x_lens, compute_dtype=None):
    """Offline whole-utterance pass.  Padding frames feed the recurrence but
    out_lens trims them; since LSTMs are causal, valid frames are unaffected."""
    b = x.shape[0]
    h = conv_subsample(params["subsample"], cfg, x, compute_dtype)
    out_lens = ((x_lens - 1) // 2 - 1) // 2
    h, _ = _encode(params, cfg, h, init_state(cfg, b), compute_dtype)
    valid = L.length_mask(out_lens, h.shape[1])
    return jnp.where(valid[:, :, None], h, 0.0), out_lens


def streaming_step(params, cfg: LstmConfig, state, x_chunk, compute_dtype=None):
    """x_chunk: [B, chunk_input_len, F] -> (enc_out [B, chunk, D], state)."""
    h = conv_subsample(params["subsample"], cfg, x_chunk, compute_dtype)
    return _encode(params, cfg, h, state, compute_dtype)
