import jax
import jax.numpy as jnp
import numpy as np

from k2transducerasr_tpu.decode import ctc_greedy, rnnt_greedy
from k2transducerasr_tpu.models import decoder, joiner


def _toy_models(vocab=8, enc_dim=16, dec_dim=12, join_dim=10, seed=0):
    kd, kj = jax.random.split(jax.random.PRNGKey(seed))
    dcfg = decoder.DecoderConfig(vocab_size=vocab, decoder_dim=dec_dim, context_size=2)
    jcfg = joiner.JoinerConfig(
        encoder_dim=enc_dim, decoder_dim=dec_dim, joiner_dim=join_dim, vocab_size=vocab
    )
    return decoder.init_params(kd, dcfg), dcfg, joiner.init_params(kj, jcfg), jcfg


def test_rnnt_greedy_runs_and_masks_lengths():
    dp, dcfg, jp, jcfg = _toy_models()
    enc = jax.random.normal(jax.random.PRNGKey(1), (3, 20, 16))
    lens = jnp.array([20, 11, 0])
    toks, ts, cnt = rnnt_greedy.rnnt_greedy_search(dp, dcfg, jp, jcfg, enc, lens)
    res = rnnt_greedy.extract_results(toks, ts, cnt)
    assert len(res) == 3
    assert res[2] == ([], [])  # zero-length lane emits nothing
    for tokens, stamps in res:
        assert all(t not in (0, 2) for t in tokens)  # blank/unk never emitted
        assert all(0 <= s < 20 for s in stamps)
        assert stamps == sorted(stamps)


def test_rnnt_greedy_batch_matches_single():
    """Batched lanes must decode identically to singleton batches."""
    dp, dcfg, jp, jcfg = _toy_models(seed=7)
    enc = jax.random.normal(jax.random.PRNGKey(2), (3, 15, 16))
    lens = jnp.array([15, 9, 15])
    batch = rnnt_greedy.extract_results(
        *rnnt_greedy.rnnt_greedy_search(dp, dcfg, jp, jcfg, enc, lens)
    )
    for b in range(3):
        single = rnnt_greedy.extract_results(
            *rnnt_greedy.rnnt_greedy_search(
                dp, dcfg, jp, jcfg, enc[b : b + 1], lens[b : b + 1]
            )
        )
        assert single[0] == batch[b]


def test_rnnt_greedy_chunked_matches_whole():
    """Streaming continuation: decoding frames chunk-by-chunk with carried
    GreedyState must equal one whole-utterance pass."""
    dp, dcfg, jp, jcfg = _toy_models(seed=3)
    enc = jax.random.normal(jax.random.PRNGKey(5), (2, 24, 16))
    lens = jnp.array([24, 24])
    whole = rnnt_greedy.extract_results(
        *rnnt_greedy.rnnt_greedy_search(dp, dcfg, jp, jcfg, enc, lens)
    )

    enc_proj = joiner.project_encoder(jp, enc)
    state = rnnt_greedy.init_state(dp, dcfg, jp, batch=2)
    for c in range(0, 24, 8):
        state = rnnt_greedy.greedy_frames(
            dp,
            dcfg,
            jp,
            state,
            enc_proj[:, c : c + 8],
            jnp.array([8, 8]),
            jnp.array([c, c]),
        )
    chunked = rnnt_greedy.extract_results(state.tokens, state.timestamps, state.count)
    assert chunked == whole


def test_rnnt_online_skips_sos():
    dp, dcfg, jp, jcfg = _toy_models(seed=11)
    enc = jax.random.normal(jax.random.PRNGKey(6), (2, 30, 16))
    lens = jnp.array([30, 30])
    toks, ts, cnt = rnnt_greedy.rnnt_greedy_search(
        dp, dcfg, jp, jcfg, enc, lens, extra_skip_sos=True
    )
    for tokens, _ in rnnt_greedy.extract_results(toks, ts, cnt):
        assert all(t not in (0, 1, 2) for t in tokens)


def _logprobs_from_ids(ids, vocab):
    """Build log-probs whose argmax per frame is exactly `ids`."""
    t = len(ids)
    lp = np.full((1, t, vocab), -10.0, np.float32)
    lp[0, np.arange(t), ids] = 0.0
    return jnp.asarray(lp)


def test_ctc_greedy_collapse():
    ids = [0, 3, 3, 0, 4, 4, 4, 0, 3, 5]
    lp = _logprobs_from_ids(ids, vocab=8)
    toks, ts, cnt = ctc_greedy.ctc_greedy_search(lp, jnp.array([len(ids)]))
    n = int(cnt[0])
    assert np.asarray(toks)[0, :n].tolist() == [3, 4, 3, 5]
    assert np.asarray(ts)[0, :n].tolist() == [1, 4, 8, 9]


def test_ctc_greedy_cross_chunk_collapse():
    """Repeats spanning a chunk boundary must still collapse."""
    ids = [3, 3, 3, 3, 3, 3]  # one token total
    lp = _logprobs_from_ids(ids, vocab=8)
    state = ctc_greedy.init_state(1)
    s = ctc_greedy.ctc_frames(state, lp[:, :3], jnp.array([3]), jnp.array([0]))
    s = ctc_greedy.ctc_frames(s, lp[:, 3:], jnp.array([3]), jnp.array([3]))
    assert int(s.count[0]) == 1
    assert int(s.tokens[0, 0]) == 3
    assert int(s.timestamps[0, 0]) == 0


def test_ctc_trailing_blanks():
    ids = [3, 0, 0, 0]
    lp = _logprobs_from_ids(ids, vocab=8)
    toks, ts, cnt = ctc_greedy.ctc_greedy_search(lp, jnp.array([4]))
    state = ctc_greedy.init_state(1)
    s = ctc_greedy.ctc_frames(state, lp, jnp.array([4]), jnp.array([0]))
    assert int(s.trailing_blanks[0]) == 3
