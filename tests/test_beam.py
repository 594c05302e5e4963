import jax
import jax.numpy as jnp
import numpy as np

from k2transducerasr_tpu.decode import rnnt_beam, rnnt_greedy
from k2transducerasr_tpu.models import decoder, joiner


def _toy_models(vocab=8, enc_dim=16, dec_dim=12, join_dim=10, seed=0, suppress_unk=True):
    kd, kj = jax.random.split(jax.random.PRNGKey(seed))
    dcfg = decoder.DecoderConfig(vocab_size=vocab, decoder_dim=dec_dim, context_size=2)
    jp = joiner.init_params(kj, joiner.JoinerConfig(
        encoder_dim=enc_dim, decoder_dim=dec_dim, joiner_dim=join_dim, vocab_size=vocab
    ))
    if suppress_unk:
        # make <unk>=2 never the argmax so greedy and beam agree exactly
        jp["output"]["b"] = jp["output"]["b"].at[2].add(-100.0)
    return decoder.init_params(kd, dcfg), dcfg, jp


def test_beam1_equals_greedy():
    dp, dcfg, jp = _toy_models(seed=1)
    enc = jax.random.normal(jax.random.PRNGKey(2), (3, 25, 16))
    lens = jnp.array([25, 13, 25])
    g = rnnt_greedy.extract_results(
        *rnnt_greedy.rnnt_greedy_search(
            dp, dcfg, jp,
            joiner.JoinerConfig(16, 12, 10, 8), enc, lens,
        )
    )
    toks, ts, cnt = rnnt_beam.rnnt_beam_search(dp, dcfg, jp, enc, lens, num_active_paths=1)
    b = rnnt_greedy.extract_results(toks, ts, cnt)
    assert b == g


def test_beam_batch_matches_single():
    dp, dcfg, jp = _toy_models(seed=3)
    enc = jax.random.normal(jax.random.PRNGKey(4), (3, 18, 16))
    lens = jnp.array([18, 9, 18])
    batch = rnnt_greedy.extract_results(
        *rnnt_beam.rnnt_beam_search(dp, dcfg, jp, enc, lens, num_active_paths=4)
    )
    for i in range(3):
        single = rnnt_greedy.extract_results(
            *rnnt_beam.rnnt_beam_search(
                dp, dcfg, jp, enc[i : i + 1], lens[i : i + 1], num_active_paths=4
            )
        )
        assert single[0] == batch[i]


def test_beam_chunked_matches_whole():
    dp, dcfg, jp = _toy_models(seed=5)
    enc = jax.random.normal(jax.random.PRNGKey(6), (2, 24, 16))
    lens = jnp.array([24, 24])
    whole = rnnt_greedy.extract_results(
        *rnnt_beam.rnnt_beam_search(dp, dcfg, jp, enc, lens, num_active_paths=4)
    )
    enc_proj = joiner.project_encoder(jp, enc)
    state = rnnt_beam.init_state(dp, dcfg, jp, batch=2, num_active_paths=4)
    for c in range(0, 24, 8):
        state = rnnt_beam.beam_frames(
            dp, dcfg, jp, state, enc_proj[:, c : c + 8],
            jnp.array([8, 8]), jnp.array([c, c]),
        )
    chunked = rnnt_greedy.extract_results(*rnnt_beam.best_beam(state))
    assert chunked == whole


def test_beam_emissions_are_clean():
    dp, dcfg, jp = _toy_models(seed=7, suppress_unk=False)
    enc = jax.random.normal(jax.random.PRNGKey(8), (2, 30, 16))
    toks, ts, cnt = rnnt_beam.rnnt_beam_search(
        dp, dcfg, jp, enc, jnp.array([30, 30]), num_active_paths=4, extra_skip_sos=True
    )
    for tokens, stamps in rnnt_greedy.extract_results(toks, ts, cnt):
        assert all(t not in (0, 1, 2) for t in tokens)
        assert stamps == sorted(stamps)


def test_zero_length_lane():
    dp, dcfg, jp = _toy_models(seed=9)
    enc = jax.random.normal(jax.random.PRNGKey(10), (2, 10, 16))
    toks, ts, cnt = rnnt_beam.rnnt_beam_search(
        dp, dcfg, jp, enc, jnp.array([10, 0]), num_active_paths=4
    )
    res = rnnt_greedy.extract_results(toks, ts, cnt)
    assert res[1] == ([], [])


def _full_state_equal(a: rnnt_beam.BeamState, b: rnnt_beam.BeamState):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6, atol=1e-6)


def test_beam_skip_matches_scan():
    """beam_frames_skip == beam_frames (full state) across blank densities:
    blank_bias 0 (emission nearly every frame — the skip's exact-step path
    dominates), 3 (mixed), 8 (long all-blank stretches — the closed-form
    skip + re-sort path dominates)."""
    for seed, blank_bias in [(11, 0.0), (12, 3.0), (13, 8.0), (14, 8.0)]:
        dp, dcfg, jp = _toy_models(seed=seed)
        jp["output"]["b"] = jp["output"]["b"].at[0].add(blank_bias)
        enc = jax.random.normal(jax.random.PRNGKey(seed + 100), (3, 50, 16))
        lens = jnp.array([50, 23, 41])
        enc_proj = joiner.project_encoder(jp, enc)
        st0 = rnnt_beam.init_state(dp, dcfg, jp, batch=3, num_active_paths=4)
        offs = jnp.array([0, 5, 0])
        want = rnnt_beam.beam_frames(dp, dcfg, jp, st0, enc_proj, lens, offs)
        for w in (8, 64):  # window smaller and larger than T
            got = rnnt_beam.beam_frames_skip(
                dp, dcfg, jp, st0, enc_proj, lens, offs, window=w
            )
            _full_state_equal(got, want)


def test_beam_skip_matches_scan_extra_skip_sos():
    dp, dcfg, jp = _toy_models(seed=21, suppress_unk=False)
    jp["output"]["b"] = jp["output"]["b"].at[0].add(5.0)
    enc = jax.random.normal(jax.random.PRNGKey(22), (2, 40, 16))
    lens = jnp.array([40, 31])
    enc_proj = joiner.project_encoder(jp, enc)
    st0 = rnnt_beam.init_state(dp, dcfg, jp, batch=2, num_active_paths=4)
    offs = jnp.zeros((2,), jnp.int32)
    want = rnnt_beam.beam_frames(dp, dcfg, jp, st0, enc_proj, lens, offs, True)
    got = rnnt_beam.beam_frames_skip(dp, dcfg, jp, st0, enc_proj, lens, offs, True)
    _full_state_equal(got, want)


def test_beam_skip_chunked_matches_whole():
    """The streaming lane-pool shape: repeated beam_frames_skip chunk calls
    (with frame offsets) == one whole-utterance scan."""
    dp, dcfg, jp = _toy_models(seed=31)
    jp["output"]["b"] = jp["output"]["b"].at[0].add(4.0)
    enc = jax.random.normal(jax.random.PRNGKey(32), (2, 24, 16))
    enc_proj = joiner.project_encoder(jp, enc)
    st0 = rnnt_beam.init_state(dp, dcfg, jp, batch=2, num_active_paths=4)
    want = rnnt_beam.beam_frames(
        dp, dcfg, jp, st0, enc_proj, jnp.array([24, 24]), jnp.zeros((2,), jnp.int32)
    )
    state = st0
    for c in range(0, 24, 8):
        state = rnnt_beam.beam_frames_skip(
            dp, dcfg, jp, state, enc_proj[:, c : c + 8],
            jnp.array([8, 8]), jnp.array([c, c]),
        )
    _full_state_equal(state, want)
