"""Icefall-fidelity pin: the JAX zipformer2 must reproduce the torch oracle
(tests/icefall_zipformer2_oracle.py — icefall inference semantics, module
tree named exactly as the export serializes it) after importing the oracle's
state_dict through convert/zipformer2_map.  This validates, in one round
trip: every export name mapping + layout transform, the compact rel-pos
formula, the layer op order, conv module semantics (SAME and
ChunkCausalDepthwiseConv1d), embed flatten order, SimpleDownsample padding,
channel stitching, and the final x2 downsample."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from k2transducerasr_tpu.convert.zipformer2_map import map_zipformer2_weights
from k2transducerasr_tpu.models import zipformer2

torch.manual_seed(0)

TINY_KW = dict(
    feature_dim=80,
    num_encoder_layers=(1, 2),
    encoder_dims=(16, 24),
    downsampling_factors=(1, 2),
    num_heads=(2, 2),
    feedforward_dims=(24, 32),
    cnn_module_kernels=(7, 7),
    query_head_dim=4,
    value_head_dim=4,
    pos_head_dim=2,
    pos_dim=8,
    embed_channels=(2, 4, 8),
)


def _state_dict_numpy(model):
    return {k: v.detach().numpy().copy() for k, v in model.state_dict().items()}


def _import(cfg, model):
    export = _state_dict_numpy(model)
    params, mapped, unmapped = map_zipformer2_weights(cfg, export)
    assert unmapped == [], f"oracle state_dict names failed to map: {unmapped}"
    assert len(mapped) == len(export)
    return params


def test_offline_noncausal_matches_torch_oracle():
    from icefall_zipformer2_oracle import OracleModel

    cfg = zipformer2.Zipformer2Config(**TINY_KW)
    model = OracleModel(cfg).eval()
    params = _import(cfg, model)

    torch.manual_seed(1)
    b, t_raw = 3, 93  # T0 = 43: odd and not a multiple of ds=2 -> tail paths
    feats = torch.randn(b, t_raw, 80) * 0.5
    lens = torch.tensor([93, 93, 60])

    want, want_lens = model(feats, lens)
    got, got_lens = zipformer2.forward(
        params, cfg, jnp.asarray(feats.numpy()), jnp.asarray(lens.numpy())
    )
    np.testing.assert_array_equal(np.asarray(got_lens), want_lens.numpy())
    # full-length lanes: exact parity everywhere valid
    for lane in (0, 1):
        n = int(want_lens[lane])
        np.testing.assert_allclose(
            np.asarray(got[lane, :n]), want[lane, :n].numpy(), rtol=2e-4, atol=2e-5
        )
    # ragged lane: icefall's SimpleDownsample tail window mixes processed pad
    # garbage near the boundary (see models/zipformer2._simple_downsample);
    # away from it the two must agree exactly
    n = int(want_lens[2]) - 2
    np.testing.assert_allclose(
        np.asarray(got[2, :n]), want[2, :n].numpy(), rtol=2e-4, atol=2e-5
    )


def test_offline_causal_matches_torch_oracle():
    """Causal (streaming-export) semantics: ChunkCausalDepthwiseConv1d and
    chunk-causal attention with bounded left context."""
    from icefall_zipformer2_oracle import OracleModel

    cfg = zipformer2.Zipformer2Config(
        **TINY_KW, causal=True, chunk_size=8, left_context_frames=16
    )
    model = OracleModel(cfg).eval()
    params = _import(cfg, model)

    torch.manual_seed(2)
    b = 2
    k_chunks = 3
    t_raw = 2 * cfg.chunk_size * k_chunks + 13  # exactly k windows
    feats = torch.randn(b, t_raw, 80) * 0.5
    lens = torch.full((b,), t_raw)

    want, want_lens = model(
        feats, lens, chunk_size=cfg.chunk_size,
        left_context_len=cfg.left_context_frames,
    )
    got, got_lens = zipformer2.forward(
        params, cfg, jnp.asarray(feats.numpy()), jnp.asarray(lens.numpy())
    )
    # compare the frames whose receptive field is identical in both: the
    # k_chunks * chunk_size embed frames the streamed graph would produce
    n = k_chunks * cfg.chunk_size // 2
    np.testing.assert_allclose(
        np.asarray(got[:, :n]), want[:, :n].numpy(), rtol=2e-4, atol=2e-5
    )


def test_streaming_matches_torch_oracle():
    """End of the chain: chunked streaming_step (cache-carried) equals the
    torch oracle's offline chunk-causal forward — so streaming is pinned to
    icefall semantics through two independent paths."""
    from icefall_zipformer2_oracle import OracleModel

    cfg = zipformer2.Zipformer2Config(
        **TINY_KW, causal=True, chunk_size=8, left_context_frames=16
    )
    model = OracleModel(cfg).eval()
    params = _import(cfg, model)

    torch.manual_seed(3)
    b = 2
    k_chunks = 3
    t_raw = 2 * cfg.chunk_size * k_chunks + 13
    feats = torch.randn(b, t_raw, 80) * 0.5
    want, _ = model(
        feats, torch.full((b,), t_raw), chunk_size=cfg.chunk_size,
        left_context_len=cfg.left_context_frames,
    )

    x = jnp.asarray(feats.numpy())
    state = zipformer2.init_state(cfg, b)
    outs = []
    for n in range(k_chunks):
        start = n * cfg.decode_chunk_len
        out, state = zipformer2.streaming_step(
            params, cfg, state, x[:, start : start + cfg.chunk_input_len]
        )
        outs.append(out)
    stream = np.concatenate([np.asarray(o) for o in outs], axis=1)
    n = stream.shape[1]
    np.testing.assert_allclose(want[:, :n].numpy(), stream, rtol=3e-3, atol=3e-4)
