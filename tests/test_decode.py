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


# -- blank-skipping greedy (while_loop) vs per-frame scan oracle -------------


def _state_eq(a, b):
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_greedy_skip_matches_scan_whole_utterance():
    dp, dcfg, jp, jcfg = _toy_models(seed=3)
    for seed in range(4):
        enc = jax.random.normal(jax.random.PRNGKey(seed), (4, 37, 16))
        lens = jnp.array([37, 20, 1, 0])
        proj = joiner.project_encoder(jp, enc)
        off = jnp.array([0, 5, 0, 100])
        for skip_sos in (False, True):
            s0 = rnnt_greedy.init_state(dp, dcfg, jp, 4, max_tokens=64)
            ref = rnnt_greedy.greedy_frames(dp, dcfg, jp, s0, proj, lens, off, skip_sos)
            got = rnnt_greedy.greedy_frames_skip(dp, dcfg, jp, s0, proj, lens, off, skip_sos)
            _state_eq(ref, got)


def test_greedy_skip_matches_scan_chunked():
    """Streaming: carrying state across chunks gives identical results for
    both implementations (incl. hyp/dec_proj/trailing_blanks carry)."""
    dp, dcfg, jp, jcfg = _toy_models(seed=11)
    enc = jax.random.normal(jax.random.PRNGKey(9), (3, 32, 16))
    proj = joiner.project_encoder(jp, enc)
    s_ref = rnnt_greedy.init_state(dp, dcfg, jp, 3, max_tokens=64)
    s_got = rnnt_greedy.init_state(dp, dcfg, jp, 3, max_tokens=64)
    chunk = 8
    for c in range(4):
        sl = proj[:, c * chunk : (c + 1) * chunk]
        # ragged valid lengths per chunk (lane 2 goes inactive mid-stream)
        lens = jnp.array([chunk, chunk, chunk if c < 2 else 0])
        off = jnp.full((3,), c * chunk, jnp.int32)
        s_ref = rnnt_greedy.greedy_frames(dp, dcfg, jp, s_ref, sl, lens, off, True)
        s_got = rnnt_greedy.greedy_frames_skip(dp, dcfg, jp, s_got, sl, lens, off, True)
        _state_eq(s_ref, s_got)


def test_greedy_skip_matches_scan_small_windows():
    """The bounded re-scan window must not change results — including
    windows smaller than the blank gaps (forcing no-candidate trips) and
    window=1 (degenerate frame-at-a-time)."""
    dp, dcfg, jp, jcfg = _toy_models(seed=13)
    enc = jax.random.normal(jax.random.PRNGKey(21), (3, 41, 16))
    proj = joiner.project_encoder(jp, enc)
    lens = jnp.array([41, 17, 0])
    off = jnp.array([0, 3, 0])
    s0 = rnnt_greedy.init_state(dp, dcfg, jp, 3, max_tokens=64)
    ref = rnnt_greedy.greedy_frames(dp, dcfg, jp, s0, proj, lens, off, False)
    for w in (1, 2, 7, 41, 500):
        got = rnnt_greedy.greedy_frames_skip(
            dp, dcfg, jp, s0, proj, lens, off, False, window=w
        )
        _state_eq(ref, got)


def test_greedy_skip_token_buffer_overflow():
    """When a lane's token buffer fills, both impls stop emitting and count
    the rest of the frames as trailing blanks."""
    dp, dcfg, jp, jcfg = _toy_models(seed=5)
    enc = jax.random.normal(jax.random.PRNGKey(4), (2, 40, 16)) * 3.0
    proj = joiner.project_encoder(jp, enc)
    lens = jnp.array([40, 33])
    off = jnp.zeros((2,), jnp.int32)
    s0 = rnnt_greedy.init_state(dp, dcfg, jp, 2, max_tokens=3)
    ref = rnnt_greedy.greedy_frames(dp, dcfg, jp, s0, proj, lens, off, False)
    got = rnnt_greedy.greedy_frames_skip(dp, dcfg, jp, s0, proj, lens, off, False)
    _state_eq(ref, got)
    assert int(np.asarray(ref.count).max()) <= 3
