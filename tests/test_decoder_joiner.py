import jax
import jax.numpy as jnp
import numpy as np

from k2transducerasr_tpu.models import decoder, joiner


def test_decoder_shapes_and_blank_padding():
    cfg = decoder.DecoderConfig(vocab_size=100, decoder_dim=64, context_size=2)
    p = decoder.init_params(jax.random.PRNGKey(0), cfg)
    y = jnp.array([[0, 5], [3, 7]], jnp.int32)
    out = decoder.forward(p, cfg, y)
    assert out.shape == (2, 64)
    assert np.all(np.asarray(out) >= 0)  # relu output

    # -1 ids embed as blank (reference seeds offline hyp with [-1, blank])
    a = decoder.forward(p, cfg, jnp.array([[-1, 0]], jnp.int32))
    b = decoder.forward(p, cfg, jnp.array([[0, 0]], jnp.int32))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_decoder_context1():
    cfg = decoder.DecoderConfig(vocab_size=50, decoder_dim=32, context_size=1)
    p = decoder.init_params(jax.random.PRNGKey(1), cfg)
    out = decoder.forward(p, cfg, jnp.array([[7]], jnp.int32))
    assert out.shape == (1, 32)


def test_decoder_sequence_matches_stepwise():
    cfg = decoder.DecoderConfig(vocab_size=60, decoder_dim=32, context_size=2)
    p = decoder.init_params(jax.random.PRNGKey(2), cfg)
    ys = jnp.array([[5, 9, 11, 3]], jnp.int32)
    seq = decoder.forward_sequence(p, cfg, ys)  # [1, 4, 32]
    # position u sees context [y_{u-1}, y_u]
    for u in range(4):
        ctx = [0 if u == 0 else int(ys[0, u - 1]), int(ys[0, u])]
        one = decoder.forward(p, cfg, jnp.array([ctx], jnp.int32))
        np.testing.assert_allclose(np.asarray(seq[0, u]), np.asarray(one[0]), rtol=1e-5, atol=1e-5)


def test_joiner_projection_hoisting():
    cfg = joiner.JoinerConfig(encoder_dim=48, decoder_dim=32, joiner_dim=40, vocab_size=77)
    p = joiner.init_params(jax.random.PRNGKey(3), cfg)
    enc = jax.random.normal(jax.random.PRNGKey(4), (2, 10, 48))
    dec = jax.random.normal(jax.random.PRNGKey(5), (2, 32))
    # hoisted path == reference-shaped path
    full = joiner.forward(p, enc[:, 3], dec)
    hoisted = joiner.joint_logits(
        p, joiner.project_encoder(p, enc)[:, 3], joiner.project_decoder(p, dec)
    )
    np.testing.assert_allclose(np.asarray(full), np.asarray(hoisted), rtol=1e-5, atol=1e-5)
    assert full.shape == (2, 77)


def test_context_tables_match_forward():
    """The folded lookup tables used inside the decode loops must equal the
    embedding + grouped-conv forward for every (y1, y2) context."""
    cfg = decoder.DecoderConfig(vocab_size=23, decoder_dim=32, context_size=2)
    p = decoder.init_params(jax.random.PRNGKey(6), cfg)
    tables = decoder.context_tables(p, cfg)
    ys = jnp.stack(
        jnp.meshgrid(jnp.arange(23), jnp.arange(23), indexing="ij"), axis=-1
    ).reshape(-1, 2).astype(jnp.int32)
    want = decoder.forward(p, cfg, ys)
    got = decoder.forward_from_tables(tables, cfg, ys)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
    # negative ids embed as blank in both paths
    neg = jnp.array([[-1, 5], [3, -1]], jnp.int32)
    np.testing.assert_allclose(
        np.asarray(decoder.forward_from_tables(tables, cfg, neg)),
        np.asarray(decoder.forward(p, cfg, neg)),
        rtol=1e-5, atol=1e-5,
    )


def test_context_tables_context1():
    cfg = decoder.DecoderConfig(vocab_size=11, decoder_dim=16, context_size=1)
    p = decoder.init_params(jax.random.PRNGKey(7), cfg)
    tables = decoder.context_tables(p, cfg)
    ys = jnp.arange(11, dtype=jnp.int32)[:, None]
    np.testing.assert_allclose(
        np.asarray(decoder.forward_from_tables(tables, cfg, ys)),
        np.asarray(decoder.forward(p, cfg, ys)),
        rtol=1e-5, atol=1e-5,
    )
