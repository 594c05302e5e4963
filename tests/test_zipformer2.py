import jax
import jax.numpy as jnp
import numpy as np
import pytest

from k2transducerasr_tpu.models import zipformer2

TINY = zipformer2.Zipformer2Config(
    feature_dim=80,
    num_encoder_layers=(1, 1),
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


def test_offline_shapes_and_lengths():
    p = zipformer2.init_params(jax.random.PRNGKey(0), TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 103, 80)) * 0.5
    out, lens = zipformer2.forward(p, TINY, x, jnp.array([103, 57]))
    assert out.shape[0] == 2
    assert out.shape[2] == 24  # max(encoder_dims)
    assert int(lens[0]) == TINY.subsampled_len(103)
    assert int(lens[1]) == TINY.subsampled_len(57)
    # padded lane: frames beyond lens are zeroed
    assert np.allclose(np.asarray(out[1, int(lens[1]) :]), 0.0)


def test_padding_invariance():
    p = zipformer2.init_params(jax.random.PRNGKey(2), TINY)
    x1 = jax.random.normal(jax.random.PRNGKey(3), (1, 57, 80)) * 0.5
    o1, l1 = zipformer2.forward(p, TINY, x1, jnp.array([57]))
    x2 = jnp.concatenate([x1, jnp.zeros((1, 46, 80))], axis=1)
    o2, l2 = zipformer2.forward(p, TINY, x2, jnp.array([57]))
    n = int(l1[0])
    np.testing.assert_allclose(
        np.asarray(o1[0, :n]), np.asarray(o2[0, :n]), rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("n_chunks", [3])
def test_streaming_matches_offline_causal(n_chunks):
    """The flagship oracle: chunked streaming with the full cache inventory
    (key/val1/val2/nonlin/conv1/conv2 per layer + embed feature cache) must
    reproduce the offline chunk-causal forward exactly."""
    cfg = zipformer2.Zipformer2Config(
        **{
            **TINY.__dict__,
            "causal": True,
            "chunk_size": 8,
            "left_context_frames": 16,
        }
    )
    p = zipformer2.init_params(jax.random.PRNGKey(4), cfg)
    b = 2
    # exactly n_chunks windows of 2*chunk+13 raw frames advancing by 2*chunk
    t_raw = cfg.decode_chunk_len * n_chunks + 13
    x = jax.random.normal(jax.random.PRNGKey(5), (b, t_raw, 80)) * 0.5

    full, full_lens = zipformer2.forward(p, cfg, x, jnp.full((b,), t_raw))

    state = zipformer2.init_state(cfg, b)
    outs = []
    for n in range(n_chunks):
        start = n * cfg.decode_chunk_len
        window = x[:, start : start + cfg.chunk_input_len]
        assert window.shape[1] == cfg.chunk_input_len
        out, state = zipformer2.streaming_step(p, cfg, state, window)
        outs.append(out)
    stream = jnp.concatenate(outs, axis=1)
    # streaming produced chunk/2 output frames per window; the offline pass
    # covers at least as many (plus tail-window frames streaming hasn't
    # flushed yet) — the shared prefix must agree
    n_cmp = stream.shape[1]
    assert n_cmp == n_chunks * cfg.chunk_size // 2
    assert full.shape[1] >= n_cmp
    np.testing.assert_allclose(
        np.asarray(full[:, :n_cmp]), np.asarray(stream), rtol=3e-3, atol=3e-3
    )


def test_streaming_short_chunk_vs_conv_kernel():
    """Regression: when a downsampled stack's per-step chunk is SHORTER than
    the conv half-kernel (the icefall-default config hits this: chunk 32 at
    downsample 8 = 4 frames vs kernel 15 half 7), the next conv cache must be
    the tail of [cache | chunk], not of the chunk alone — slicing the chunk
    alone shrinks the cache and crashes (or corrupts) the following step."""
    cfg = zipformer2.Zipformer2Config(
        **{
            **TINY.__dict__,
            "cnn_module_kernels": (7, 15),  # stack 1: half 7 > stack chunk 4
            "causal": True,
            "chunk_size": 8,
            "left_context_frames": 16,
        }
    )
    p = zipformer2.init_params(jax.random.PRNGKey(7), cfg)
    b = 2
    n_chunks = 3
    t_raw = cfg.decode_chunk_len * n_chunks + 13
    x = jax.random.normal(jax.random.PRNGKey(8), (b, t_raw, 80)) * 0.5

    full, _ = zipformer2.forward(p, cfg, x, jnp.full((b,), t_raw))

    state = zipformer2.init_state(cfg, b)
    outs = []
    for n in range(n_chunks):
        start = n * cfg.decode_chunk_len
        out, state = zipformer2.streaming_step(
            p, cfg, state, x[:, start : start + cfg.chunk_input_len]
        )
        outs.append(out)
    stream = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(full[:, : stream.shape[1]]), np.asarray(stream),
        rtol=3e-3, atol=3e-3,
    )


def test_state_inventory_matches_reference_spec():
    """Cache shapes mirror OnlineProjOfZipformer2.cs:53-111 (batch-leading)."""
    cfg = zipformer2.Zipformer2Config(
        **{**TINY.__dict__, "causal": True, "chunk_size": 8, "left_context_frames": 16}
    )
    s = zipformer2.init_state(cfg, 3)
    assert len(s["layers"]) == sum(cfg.num_encoder_layers)
    l0 = s["layers"][0]  # stack 0: ds=1, left=16
    assert l0["key"].shape == (3, 16, 2 * 4)  # [B, left, H*qd]
    assert l0["val1"].shape == (3, 16, 2 * 4)  # [B, left, H*vd]
    assert l0["nonlin"].shape == (3, 16, 3 * 16 // 4)
    assert l0["conv1"].shape == (3, 7 // 2, 16)  # [B, k//2, D]
    l1 = s["layers"][1]  # stack 1: ds=2, left=8
    assert l1["key"].shape == (3, 8, 2 * 4)
    # embed stage cache — the reference's embed_states [B,128,3,19], NHWC here
    assert s["embed_stage"].shape == (3, 3, 19, 8)


def test_jit_compiles():
    p = zipformer2.init_params(jax.random.PRNGKey(6), TINY)
    fwd = jax.jit(lambda x, l: zipformer2.forward(p, TINY, x, l))
    out, lens = fwd(jnp.zeros((1, 71, 80)), jnp.array([71]))
    assert out.shape[1] == TINY.subsampled_len(71)
