import jax
import jax.numpy as jnp
import numpy as np

from k2transducerasr_tpu.models import zipformer

TINY = zipformer.ZipformerConfig(
    feature_dim=80,
    num_encoder_layers=(1, 2),
    encoder_dims=(16, 16),
    attention_dims=(8, 8),
    downsampling_factors=(1, 2),
    num_heads=(2, 2),
    feedforward_dims=(24, 24),
    cnn_module_kernels=(5, 5),
    pos_dim=2,
    embed_channels=(2, 4, 8),
)


def test_offline_shapes():
    p = zipformer.init_params(jax.random.PRNGKey(0), TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 71, 80)) * 0.5
    out, lens = zipformer.forward(p, TINY, x, jnp.array([71, 39]))
    # output frame rate = raw/4: ((71-7)//2 + 1) // 2 = 16
    assert out.shape == (2, TINY.subsampled_len(71), 16)
    assert int(lens[1]) == TINY.subsampled_len(39)


def test_skip_sources_default_topology():
    cfg = zipformer.ZipformerConfig()  # factors (1,2,4,8,2)
    # icefall skip rule: stack 2 <- 0 (1<=4), stack 3 <- 1 (2<=8),
    # stack 4 <- 1 (4>2 at j=2, then 2<=2 at j=1)
    assert cfg.skip_sources() == (None, None, 0, 1, 1)


def test_streaming_matches_offline_causal():
    cfg = zipformer.ZipformerConfig(
        **{**TINY.__dict__, "causal": True, "chunk_size": 4, "left_context_frames": 8}
    )
    p = zipformer.init_params(jax.random.PRNGKey(2), cfg)
    b, n_chunks = 2, 3
    t_raw = cfg.decode_chunk_len * n_chunks + 7
    assert cfg.embed_len(t_raw) == cfg.chunk_size * n_chunks
    x = jax.random.normal(jax.random.PRNGKey(3), (b, t_raw, 80)) * 0.5

    full, _ = zipformer.forward(p, cfg, x, jnp.full((b,), t_raw))
    t_out = zipformer.output_chunk_len(cfg) * n_chunks

    state = zipformer.init_state(cfg, b)
    outs = []
    for n in range(n_chunks):
        start = n * cfg.decode_chunk_len
        out, state = zipformer.streaming_step(
            p, cfg, state, x[:, start : start + cfg.chunk_input_len]
        )
        outs.append(out)
    stream = jnp.concatenate(outs, axis=1)
    assert stream.shape[1] == t_out
    np.testing.assert_allclose(
        np.asarray(full[:, :t_out]), np.asarray(stream), rtol=3e-3, atol=3e-3
    )


def test_state_inventory():
    cfg = zipformer.ZipformerConfig(
        **{**TINY.__dict__, "causal": True, "chunk_size": 4, "left_context_frames": 8}
    )
    s = zipformer.init_state(cfg, 3)
    assert len(s["layers"]) == 3  # 1 + 2 layers
    l0 = s["layers"][0]
    assert l0["key"].shape == (3, 8, 8)  # [B, left, attn_dim]
    assert l0["val1"].shape == (3, 8, 4)  # attn_dim/2
    assert l0["avg"].shape == (3, 16)
    assert l0["conv1"].shape == (3, 4, 16)  # kernel-1
    l1 = s["layers"][1]  # stack 1: ds=2 -> left=4
    assert l1["key"].shape == (3, 4, 8)
