import jax
import jax.numpy as jnp
import numpy as np

from k2transducerasr_tpu.models import lstm

CFG = lstm.LstmConfig(
    feature_dim=80, d_model=48, rnn_hidden_size=64, num_layers=2, ff_dim=96, chunk_size=4
)


def test_offline_shapes():
    p = lstm.init_params(jax.random.PRNGKey(0), CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 83, 80))
    out, lens = lstm.forward(p, CFG, x, jnp.array([83, 43]))
    assert out.shape == (2, CFG.subsampled_len(83), 48)
    assert lens.tolist() == [CFG.subsampled_len(83), CFG.subsampled_len(43)]


def test_streaming_matches_offline():
    """LSTMs are causal: chunked streaming must equal the whole-utterance
    pass exactly (the reference carries state0/state1 across chunks,
    OnlineProjOfLstm.cs:54-76)."""
    p = lstm.init_params(jax.random.PRNGKey(2), CFG)
    n_chunks = 3
    t_raw = CFG.decode_chunk_len * n_chunks + 3
    x = jax.random.normal(jax.random.PRNGKey(3), (2, t_raw, 80)) * 0.5
    full, full_lens = lstm.forward(p, CFG, x, jnp.full((2,), t_raw))
    t_sub = CFG.chunk_size * n_chunks
    assert int(full_lens[0]) == t_sub

    state = lstm.init_state(CFG, 2)
    outs = []
    for n in range(n_chunks):
        start = n * CFG.decode_chunk_len
        window = x[:, start : start + CFG.chunk_input_len]
        out, state = lstm.streaming_step(p, CFG, state, window)
        outs.append(out)
    stream = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(full[:, :t_sub]), np.asarray(stream), rtol=2e-4, atol=2e-4
    )


def test_state_layout_batch_leading():
    s = lstm.init_state(CFG, 5)
    assert s["h"].shape == (5, CFG.num_layers, CFG.d_model)
    assert s["c"].shape == (5, CFG.num_layers, CFG.rnn_hidden_size)
