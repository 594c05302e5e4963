"""Icefall-fidelity pin for the streaming LSTM transducer encoder: the JAX
model must reproduce the torch oracle (tests/icefall_lstm_oracle.py — the
recurrence is torch's OWN nn.LSTM(proj_size=...), an independent ATen
implementation) after importing the oracle's state_dict through
convert/family_maps.map_lstm_weights.  This validates, in one round trip:
every export name mapping + layout transform (weight_ih/hh/hr_l0
transposes), the bias_ih+bias_hh SUM, the i/f/g/o gate order and
projection semantics of the hand-rolled lax.scan, the subsampling flatten
order, and the streaming state contract (state0=h, state1=c per
OnlineProjOfLstm.cs:54-76).  Replaces the circular synthesized-export
round-trip that hid this risk class (VERDICT r3 missing #2)."""

import numpy as np
import torch

import jax.numpy as jnp

from k2transducerasr_tpu.convert.family_maps import map_lstm_weights
from k2transducerasr_tpu.models import lstm

torch.manual_seed(0)

CFG = lstm.LstmConfig(
    feature_dim=80, d_model=32, rnn_hidden_size=48, num_layers=3, ff_dim=64,
    chunk_size=4,
)


def _oracle():
    from icefall_lstm_oracle import OracleLstm

    return OracleLstm(CFG).eval()


def _import(model):
    export = {k: v.detach().numpy().copy() for k, v in model.state_dict().items()}
    params, mapped, unmapped = map_lstm_weights(CFG, export)
    assert unmapped == [], f"oracle names failed to map: {unmapped}"
    return params


def test_offline_matches_torch_oracle():
    model = _oracle()
    params = _import(model)

    x = torch.randn(2, 103, 80, generator=torch.Generator().manual_seed(1)) * 0.5
    lens = torch.tensor([103, 57])
    want, want_lens, _ = model(x, lens)

    got, got_lens = lstm.forward(params, CFG, jnp.asarray(x.numpy()), jnp.asarray(lens.numpy()))
    assert got_lens.tolist() == want_lens.tolist()
    for b in range(2):
        n = int(want_lens[b])
        np.testing.assert_allclose(
            np.asarray(got[b, :n]), want[b, :n].numpy(), rtol=2e-4, atol=2e-4
        )


def test_streaming_matches_torch_oracle():
    """JAX streaming steps (h/c carried across chunks) against the torch
    oracle's full-sequence forward — pins the cache contract against the
    independent implementation, not against our own offline path."""
    model = _oracle()
    params = _import(model)

    n_chunks = 4
    t_raw = CFG.decode_chunk_len * n_chunks + 3
    x = torch.randn(1, t_raw, 80, generator=torch.Generator().manual_seed(2)) * 0.5
    want, _, _ = model(x, torch.full((1,), t_raw))

    xj = jnp.asarray(x.numpy())
    state = lstm.init_state(CFG, 1)
    outs = []
    for k in range(n_chunks):
        start = k * CFG.decode_chunk_len
        window = xj[:, start : start + CFG.chunk_input_len]
        out, state = lstm.streaming_step(params, CFG, state, window)
        outs.append(out)
    stream = np.concatenate([np.asarray(o) for o in outs], axis=1)
    np.testing.assert_allclose(
        stream, want[:, : stream.shape[1]].numpy(), rtol=3e-4, atol=3e-4
    )


def test_oracle_state_carry_matches_offline():
    """Sanity on the oracle itself: feeding it chunked subsampled state must
    equal its own offline pass (torch LSTM state round-trip)."""
    model = _oracle()
    t_raw = 67
    x = torch.randn(1, t_raw, 80, generator=torch.Generator().manual_seed(3)) * 0.5
    whole, _, _ = model(x, torch.full((1,), t_raw))

    # carry states across two halves of the SUBSAMPLED sequence by running
    # the embed once and the layers chunkwise
    with torch.no_grad():
        h = model.encoder_embed(x)
        states = [
            (torch.zeros(1, 1, CFG.d_model), torch.zeros(1, 1, CFG.rnn_hidden_size))
            for _ in model.encoder.layers
        ]
        outs = []
        for part in torch.split(h, [7, h.shape[1] - 7], dim=1):
            y = part
            new_states = []
            for layer, st in zip(model.encoder.layers, states):
                y, ns = layer(y, st)
                new_states.append(ns)
            states = new_states
            outs.append(y)
    np.testing.assert_allclose(
        torch.cat(outs, dim=1).numpy(), whole.numpy(), rtol=1e-5, atol=1e-5
    )
