import jax
import jax.numpy as jnp
import numpy as np
import pytest

from k2transducerasr_tpu.models import conformer

CFG = conformer.ConformerConfig(
    feature_dim=80,
    d_model=64,
    num_layers=2,
    num_heads=4,
    ff_dim=96,
    cnn_kernel=7,
)


def _params(cfg=CFG, seed=0):
    return conformer.init_params(jax.random.PRNGKey(seed), cfg)


def test_offline_shapes_and_lengths():
    p = _params()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 103, 80))
    lens = jnp.array([103, 51])
    out, out_lens = conformer.forward(p, CFG, x, lens)
    assert out.shape == (2, CFG.subsampled_len(103), CFG.d_model)
    assert out_lens.tolist() == [CFG.subsampled_len(103), CFG.subsampled_len(51)]


def test_padding_invariance():
    """A padded batch entry must produce the same valid frames as unpadded."""
    p = _params()
    x1 = jax.random.normal(jax.random.PRNGKey(2), (1, 51, 80))
    out1, l1 = conformer.forward(p, CFG, x1, jnp.array([51]))
    x2 = jnp.concatenate([x1, jnp.zeros((1, 52, 80))], axis=1)
    out2, l2 = conformer.forward(p, CFG, x2, jnp.array([51]))
    n = int(l1[0])
    assert int(l2[0]) == n
    np.testing.assert_allclose(
        np.asarray(out1[0, :n]), np.asarray(out2[0, :n]), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("n_chunks", [3])
def test_streaming_matches_offline_causal(n_chunks):
    """The core streaming-cache oracle: chunked streaming_step must equal the
    offline forward with chunked-causal masks (SURVEY.md §7 hard part 2)."""
    cfg = conformer.ConformerConfig(
        feature_dim=80,
        d_model=64,
        num_layers=2,
        num_heads=4,
        ff_dim=96,
        cnn_kernel=7,
        causal=True,
        chunk_size=4,
        left_context=8,
    )
    p = _params(cfg, seed=3)
    b = 2
    t_raw = cfg.decode_chunk_len * n_chunks + 3  # exactly n_chunks windows
    x = jax.random.normal(jax.random.PRNGKey(4), (b, t_raw, 80)) * 0.5

    # offline pass over the full sequence with causal masks
    full, full_lens = conformer.forward(p, cfg, x, jnp.full((b,), t_raw))
    t_sub = cfg.chunk_size * n_chunks
    assert int(full_lens[0]) == t_sub

    # streaming: overlapping raw windows, advance by decode_chunk_len
    state = conformer.init_state(cfg, b)
    outs = []
    for n in range(n_chunks):
        start = n * cfg.decode_chunk_len
        window = x[:, start : start + cfg.chunk_input_len]
        out, state = conformer.streaming_step(p, cfg, state, window)
        outs.append(out)
    stream = jnp.concatenate(outs, axis=1)
    assert stream.shape == (b, t_sub, cfg.d_model)
    np.testing.assert_allclose(
        np.asarray(full[:, :t_sub]), np.asarray(stream), rtol=2e-3, atol=2e-3
    )


def test_jit_compiles():
    p = _params()
    fwd = jax.jit(lambda x, l: conformer.forward(p, CFG, x, l))
    out, lens = fwd(jnp.zeros((1, 59, 80)), jnp.array([59]))
    assert out.shape[1] == CFG.subsampled_len(59)
