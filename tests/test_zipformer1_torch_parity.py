"""Icefall-fidelity pin for Zipformer v1: the JAX model must reproduce the
torch oracle (tests/icefall_zipformer1_oracle.py — pruned_transducer_stateless7
inference semantics, module tree named exactly as the export serializes it)
after importing the oracle's state_dict through convert/zipformer1_map.
This validates, in one round trip: every export name mapping + layout
transform, the sinusoidal rel-pos encoding + rel-shift, the in_proj
[q|k|v|pos_q] packing with no runtime scaling, the ff1->pooling->attn->
conv1->ff2->attn2->conv2->ff3->norm->bypass op order, global-vs-cumulative
pooling, AttentionDownsample / biased SimpleUpsample / SimpleCombiner,
U-Net skips, and the final x2 output downsample."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from k2transducerasr_tpu.convert.zipformer1_map import map_zipformer1_weights
from k2transducerasr_tpu.models import zipformer

torch.manual_seed(0)

TINY_KW = dict(
    feature_dim=80,
    # 3 stacks with a dim change across the first ds>1 stack exercises
    # extra_proj, out_combiner zero-padding, and a skip combiner (2 <- 0)
    num_encoder_layers=(1, 2, 1),
    encoder_dims=(16, 24, 24),
    attention_dims=(8, 8, 8),
    downsampling_factors=(1, 2, 2),
    num_heads=(2, 2, 2),
    feedforward_dims=(24, 32, 24),
    cnn_module_kernels=(7, 7, 7),
    pos_dim=2,
    embed_channels=(2, 4, 8),
)


def _state_dict_numpy(model):
    return {k: v.detach().numpy().copy() for k, v in model.state_dict().items()}


def _import(cfg, model):
    export = _state_dict_numpy(model)
    params, mapped, unmapped = map_zipformer1_weights(cfg, export)
    assert unmapped == [], f"oracle state_dict names failed to map: {unmapped}"
    assert len(mapped) == len(export)
    return params


def test_skip_topology_has_a_real_skip():
    cfg = zipformer.ZipformerConfig(**TINY_KW)
    assert cfg.skip_sources() == (None, None, 0)


def test_offline_noncausal_matches_torch_oracle():
    from icefall_zipformer1_oracle import OracleModel

    cfg = zipformer.ZipformerConfig(**TINY_KW)
    model = OracleModel(cfg).eval()
    params = _import(cfg, model)

    torch.manual_seed(1)
    b, t_raw = 3, 93  # embed len 43: odd -> exercises tail paths of both ds=2 stages
    feats = torch.randn(b, t_raw, 80) * 0.5
    lens = torch.tensor([93, 93, 60])

    want, want_lens = model(feats, lens)
    got, got_lens = zipformer.forward(
        params, cfg, jnp.asarray(feats.numpy()), jnp.asarray(lens.numpy())
    )
    np.testing.assert_array_equal(np.asarray(got_lens), want_lens.numpy())
    # full-length lanes: exact parity everywhere valid
    for lane in (0, 1):
        n = int(want_lens[lane])
        np.testing.assert_allclose(
            np.asarray(got[lane, :n]), want[lane, :n].numpy(), rtol=2e-4, atol=2e-5
        )
    # ragged lane: icefall's AttentionDownsample tail window mixes processed
    # pad garbage near the boundary (models/zipformer._attention_downsample);
    # away from it the two must agree
    n = int(want_lens[2]) - 2
    np.testing.assert_allclose(
        np.asarray(got[2, :n]), want[2, :n].numpy(), rtol=2e-4, atol=2e-5
    )


def test_offline_causal_matches_torch_oracle():
    """Causal (streaming-export) semantics: cumulative pooling, causal convs,
    chunk-causal attention with bounded left context."""
    from icefall_zipformer1_oracle import OracleModel

    cfg = zipformer.ZipformerConfig(
        **TINY_KW, causal=True, chunk_size=4, left_context_frames=8
    )
    model = OracleModel(cfg).eval()
    params = _import(cfg, model)

    torch.manual_seed(2)
    b, k_chunks = 2, 3
    t_raw = cfg.decode_chunk_len * k_chunks + 7  # exactly k windows
    feats = torch.randn(b, t_raw, 80) * 0.5
    lens = torch.full((b,), t_raw)

    want, want_lens = model(
        feats, lens, chunk_size=cfg.chunk_size,
        left_context_len=cfg.left_context_frames,
    )
    got, got_lens = zipformer.forward(
        params, cfg, jnp.asarray(feats.numpy()), jnp.asarray(lens.numpy())
    )
    np.testing.assert_array_equal(np.asarray(got_lens), want_lens.numpy())
    n = int(want_lens[0])
    np.testing.assert_allclose(
        np.asarray(got[:, :n]), want[:, :n].numpy(), rtol=2e-4, atol=2e-5
    )


def test_streaming_matches_torch_oracle():
    """End of the chain: chunked streaming_step (cache-carried) equals the
    torch oracle's offline chunk-causal forward — streaming is pinned to
    icefall semantics through two independent paths."""
    from icefall_zipformer1_oracle import OracleModel

    cfg = zipformer.ZipformerConfig(
        **TINY_KW, causal=True, chunk_size=4, left_context_frames=8
    )
    model = OracleModel(cfg).eval()
    params = _import(cfg, model)

    torch.manual_seed(3)
    b, k_chunks = 2, 3
    t_raw = cfg.decode_chunk_len * k_chunks + 7
    feats = torch.randn(b, t_raw, 80) * 0.5
    want, _ = model(
        feats, torch.full((b,), t_raw), chunk_size=cfg.chunk_size,
        left_context_len=cfg.left_context_frames,
    )

    x = jnp.asarray(feats.numpy())
    state = zipformer.init_state(cfg, b)
    outs = []
    for n in range(k_chunks):
        start = n * cfg.decode_chunk_len
        out, state = zipformer.streaming_step(
            params, cfg, state, x[:, start : start + cfg.chunk_input_len]
        )
        outs.append(out)
    stream = np.concatenate([np.asarray(o) for o in outs], axis=1)
    n = stream.shape[1]
    np.testing.assert_allclose(want[:, :n].numpy(), stream, rtol=3e-3, atol=3e-4)
