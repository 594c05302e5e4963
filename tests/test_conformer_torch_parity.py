"""Icefall-fidelity pin for the streaming Conformer: the JAX model must
reproduce the torch oracle (tests/icefall_conformer_oracle.py — classic
icefall/espnet conformer inference semantics, module tree named exactly as
the export serializes it) after importing the oracle's state_dict through
convert/family_maps.map_conformer_weights.  This validates, in one round
trip: every export name mapping + layout transform, the packed-qkv split,
the interleaved sin/cos rel-pos table + rel-shift alignment, pos_bias_u/v,
the sqrt(d_model) input scaling, BatchNorm running-stat folding, the
0.5-macaron layer order, chunk-causal masking, and the streaming cache
contract (via streaming == offline-chunk-causal)."""

import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from k2transducerasr_tpu.convert.family_maps import map_conformer_weights
from k2transducerasr_tpu.models import conformer

torch.manual_seed(0)

TINY_KW = dict(
    feature_dim=80, d_model=32, num_layers=2, num_heads=4, ff_dim=48,
    cnn_kernel=7,
)


def _state_dict_numpy(model):
    return {k: v.detach().numpy().copy() for k, v in model.state_dict().items()}


def _randomize_batchnorm(model):
    """Running stats + affine off the init defaults so folding bugs can't
    hide behind mean=0/var=1/gamma=1."""
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.3)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
                m.weight.copy_(torch.randn(m.weight.shape, generator=g) * 0.2 + 1.0)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.2)


def _import(cfg, model):
    export = _state_dict_numpy(model)
    params, mapped, unmapped = map_conformer_weights(cfg, export)
    real_unmapped = [n for n in unmapped if "num_batches_tracked" not in n]
    assert real_unmapped == [], f"oracle names failed to map: {real_unmapped}"
    return params


def _oracle(cfg):
    from icefall_conformer_oracle import OracleConformer

    model = OracleConformer(cfg).eval()
    _randomize_batchnorm(model)
    return model


def test_offline_noncausal_matches_torch_oracle():
    cfg = conformer.ConformerConfig(**TINY_KW)
    model = _oracle(cfg)
    params = _import(cfg, model)

    x = torch.randn(2, 103, 80, generator=torch.Generator().manual_seed(1)) * 0.5
    lens = torch.tensor([103, 57])
    want, want_lens = model(x, lens)

    got, got_lens = conformer.forward(
        params, cfg, jnp.asarray(x.numpy()), jnp.asarray(lens.numpy())
    )
    assert got_lens.tolist() == want_lens.tolist()
    for b in range(2):
        n = int(want_lens[b])
        np.testing.assert_allclose(
            np.asarray(got[b, :n]), want[b, :n].numpy(), rtol=2e-4, atol=2e-4
        )


def test_causal_offline_matches_torch_oracle():
    cfg = conformer.ConformerConfig(
        **TINY_KW, causal=True, chunk_size=4, left_context=8
    )
    model = _oracle(cfg)
    params = _import(cfg, model)

    t_raw = 4 * 4 * 3 + 3  # 3 full streaming windows
    x = torch.randn(2, t_raw, 80, generator=torch.Generator().manual_seed(2)) * 0.5
    lens = torch.full((2,), t_raw)
    want, want_lens = model(x, lens)

    got, got_lens = conformer.forward(
        params, cfg, jnp.asarray(x.numpy()), jnp.asarray(lens.numpy())
    )
    assert got_lens.tolist() == want_lens.tolist()
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), rtol=3e-4, atol=3e-4
    )


def test_streaming_matches_torch_oracle():
    """JAX streaming steps (cache-carried) against the torch oracle's
    chunk-causal offline forward — pins the cache contract against the
    independent implementation, not against our own offline path."""
    cfg = conformer.ConformerConfig(
        **TINY_KW, causal=True, chunk_size=4, left_context=8
    )
    model = _oracle(cfg)
    params = _import(cfg, model)

    n_chunks = 3
    t_raw = cfg.decode_chunk_len * n_chunks + 3
    x = torch.randn(1, t_raw, 80, generator=torch.Generator().manual_seed(3)) * 0.5
    want, _ = model(x, torch.full((1,), t_raw))

    xj = jnp.asarray(x.numpy())
    state = conformer.init_state(cfg, 1)
    outs = []
    for k in range(n_chunks):
        start = k * cfg.decode_chunk_len
        window = xj[:, start : start + cfg.chunk_input_len]
        out, state = conformer.streaming_step(params, cfg, state, window)
        outs.append(out)
    stream = np.concatenate([np.asarray(o) for o in outs], axis=1)
    np.testing.assert_allclose(
        stream, want[:, : stream.shape[1]].numpy(), rtol=3e-4, atol=3e-4
    )
