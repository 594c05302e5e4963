import jax.numpy as jnp
import numpy as np
import pytest

from k2transducerasr_tpu.decode import rnnt_greedy
from k2transducerasr_tpu.frontend.fbank import FbankExtractor
from k2transducerasr_tpu.models import joiner as joiner_mod
from k2transducerasr_tpu.models.conformer import ConformerConfig
from k2transducerasr_tpu.models.lstm import LstmConfig
from k2transducerasr_tpu.runtime.bundle import ModelBundle
from k2transducerasr_tpu.runtime.online import OnlineRecognizer


def _pcm(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    x = (0.3 * np.sin(2 * np.pi * 400 * t) + 0.1 * rng.standard_normal(n)).astype(
        np.float32
    )
    # pre-quantize to the PCM16 grid: the online recognizer ships windows as
    # int16 (transfer bandwidth — see OnlineRecognizer.begin_step), which is
    # EXACT for PCM16-grid samples, so the f32 module-level oracle sees
    # identical values
    return (np.clip(np.round(x * 32768.0), -32768, 32767) / 32768.0).astype(np.float32)


@pytest.fixture(scope="module")
def lstm_bundle():
    cfg = LstmConfig(
        feature_dim=80, d_model=48, rnn_hidden_size=64, num_layers=2, ff_dim=96, chunk_size=4
    )
    return ModelBundle.random(
        "lstm", cfg, vocab_size=32, seed=1, decoder_dim=40, joiner_dim=36
    )


@pytest.fixture(scope="module")
def conformer_bundle():
    cfg = ConformerConfig(
        feature_dim=80, d_model=64, num_layers=2, num_heads=4, ff_dim=96,
        cnn_kernel=7, causal=True, chunk_size=4, left_context=8,
    )
    return ModelBundle.random(
        "conformer", cfg, vocab_size=32, seed=2, decoder_dim=40, joiner_dim=36
    )


def _offline_tokens(bundle, pcm, k_windows):
    """Oracle: whole-utterance fbank -> causal encoder -> greedy with the
    online emission rule (skip sos), truncated to exactly the frames the
    online path has processed."""
    enc = bundle.encoder
    feats, n = FbankExtractor(bundle.frontend_cfg)(pcm)
    cfg = bundle.encoder_cfg
    t_raw = cfg.decode_chunk_len * k_windows + 3
    enc_out, lens = enc.forward(
        bundle.params["encoder"], cfg, feats[None, :t_raw], jnp.array([t_raw])
    )
    toks, ts, cnt = rnnt_greedy.rnnt_greedy_search(
        bundle.params["decoder"], bundle.decoder_cfg,
        bundle.params["joiner"], bundle.joiner_cfg,
        enc_out, lens, extra_skip_sos=True,
    )
    return rnnt_greedy.extract_results(toks, ts, cnt)[0]


@pytest.mark.parametrize("fixture", ["lstm_bundle", "conformer_bundle"])
def test_online_matches_offline_oracle(fixture, request):
    bundle = request.getfixturevalue(fixture)
    rec = OnlineRecognizer(bundle, compute_dtype=None, max_lanes=4)
    k = 3
    n_samples = rec.window_samples + (k - 1) * rec.hop_samples
    pcm = _pcm(n_samples, seed=5)

    s = rec.create_online_stream()
    # feed in raggedy chunks like the reference example (800-sample feeds)
    for i in range(0, len(pcm), 800):
        s.add_samples(pcm[i : i + 800])
        rec.get_results([s])  # advances only when a full window is buffered
    # drive any remaining full windows
    res = rec.get_results([s])[0]

    want_toks, want_ts = _offline_tokens(bundle, pcm, k)
    got_toks = [bundle.tokens.id_of(t) for t in res.tokens]
    assert got_toks == want_toks
    assert res.timestamps == want_ts


def test_two_streams_interleaved(lstm_bundle):
    """Lanes must be independent: interleaved streams decode exactly like
    solo streams."""
    rec = OnlineRecognizer(lstm_bundle, compute_dtype=None, max_lanes=4)
    win, hop = rec.window_samples, rec.hop_samples
    n = win + 2 * hop
    pcm_a, pcm_b = _pcm(n, seed=7), _pcm(n, seed=8)

    # solo runs
    solo = []
    for pcm in (pcm_a, pcm_b):
        r = OnlineRecognizer(lstm_bundle, compute_dtype=None, max_lanes=4)
        s = r.create_online_stream()
        s.add_samples(pcm)
        while s._ready():
            r.get_results([s])
        solo.append(r.get_results([s])[0].text)

    sa = rec.create_online_stream()
    sb = rec.create_online_stream()
    sa.add_samples(pcm_a)
    sb.add_samples(pcm_b)
    while sa._ready() or sb._ready():
        rec.get_results([sa, sb])
    ra, rb = rec.get_results([sa, sb])
    assert ra.text == solo[0]
    assert rb.text == solo[1]


def test_lane_reuse_resets_state(lstm_bundle):
    rec = OnlineRecognizer(lstm_bundle, compute_dtype=None, max_lanes=1)
    pcm = _pcm(rec.window_samples + rec.hop_samples, seed=9)

    def run():
        s = rec.create_online_stream()
        s.add_samples(pcm)
        while s._ready():
            rec.get_results([s])
        out = rec.get_results([s])[0]
        rec.dispose_stream(s)
        return out

    first = run()
    second = run()  # same lane, must decode identically from fresh state
    assert first.text == second.text
    assert first.timestamps == second.timestamps


def test_lane_exhaustion(lstm_bundle):
    rec = OnlineRecognizer(lstm_bundle, compute_dtype=None, max_lanes=1)
    rec.create_online_stream()
    with pytest.raises(RuntimeError):
        rec.create_online_stream()


def test_input_finished_flushes(lstm_bundle):
    rec = OnlineRecognizer(lstm_bundle, compute_dtype=None, max_lanes=2)
    pcm = _pcm(rec.window_samples // 2, seed=10)  # less than one window
    s = rec.create_online_stream()
    s.add_samples(pcm)
    assert not s._ready()
    res = rec.decode_to_end(s)
    assert s.is_finished
    assert isinstance(res.text, str)


def test_pipelined_begin_end_step_matches_serial(lstm_bundle):
    """2-deep begin_step/end_step pipelining (chunk k+1 dispatched before
    chunk k's results are read) must produce the same per-chunk partial
    results as the fully serial get_results loop."""
    win_chunks = 5

    def run_serial():
        rec = OnlineRecognizer(lstm_bundle, compute_dtype=None, max_lanes=2)
        s = rec.create_online_stream()
        s.add_samples(_pcm(rec.window_samples + win_chunks * rec.hop_samples, seed=11))
        out = []
        while s._ready():
            out.append(rec.get_results([s])[0].text)
        return out

    def run_pipelined():
        rec = OnlineRecognizer(lstm_bundle, compute_dtype=None, max_lanes=2)
        s = rec.create_online_stream()
        s.add_samples(_pcm(rec.window_samples + win_chunks * rec.hop_samples, seed=11))
        out = []
        pending = None
        while s._ready():
            nxt = rec.begin_step([s])
            if pending is not None:
                out.append(rec.end_step(pending)[0].text)
            pending = nxt
        if pending is not None:
            out.append(rec.end_step(pending)[0].text)
        return out

    assert run_pipelined() == run_serial()


def test_endpoint_counters_ride_batched_transfer(lstm_bundle):
    """is_endpoint must work off the cached counters from the last step's
    batched transfer (no per-stream readback)."""
    rec = OnlineRecognizer(lstm_bundle, compute_dtype=None, max_lanes=2,
                           enable_endpoint=True)
    s = rec.create_online_stream()
    s.add_samples(np.zeros(rec.window_samples + 30 * rec.hop_samples, np.float32))
    while s._ready():
        rec.get_results([s])
    assert rec._endpoint_host is not None
    # long silence with no tokens -> rule 1 (must_contain_nonsilence=False)
    assert rec.is_endpoint(s) in (True, False)  # exercises the cached path


def test_windows_per_step_batching_matches_single(lstm_bundle):
    """windows_per_step=3 (multi-window dispatch) must produce EXACTLY the
    drained results of the windows_per_step=1 path, including a lane that
    has fewer buffered windows than the batch size."""
    def run(wps, n_a, n_b):
        rec = OnlineRecognizer(lstm_bundle, compute_dtype=None, max_lanes=2,
                               windows_per_step=wps)
        sa, sb = rec.create_online_stream(), rec.create_online_stream()
        sa.add_samples(_pcm(rec.window_samples + n_a * rec.hop_samples, seed=21))
        sb.add_samples(_pcm(rec.window_samples + n_b * rec.hop_samples, seed=22))
        while sa._ready() or sb._ready():
            rec.get_results([sa, sb])
        ra, rb = rec.get_results([sa, sb])
        return (ra.text, ra.timestamps, rb.text, rb.timestamps)

    assert run(3, 5, 2) == run(1, 5, 2)
    assert run(4, 3, 0) == run(1, 3, 0)


@pytest.mark.parametrize("method", ["greedy_search_ctc", "modified_beam_search"])
def test_windows_per_step_ctc_and_beam(method, lstm_bundle):
    """Multi-window dispatch exactness for the other two production decode
    paths (greedy is covered above)."""
    if method == "greedy_search_ctc":
        from k2transducerasr_tpu.models.zipformer2 import Zipformer2Config

        cfg = Zipformer2Config(
            num_encoder_layers=(1, 1), encoder_dims=(16, 32),
            downsampling_factors=(1, 2), num_heads=(2, 2),
            feedforward_dims=(32, 48), cnn_module_kernels=(7, 7),
            query_head_dim=4, value_head_dim=4, pos_head_dim=2, pos_dim=8,
            embed_channels=(2, 4, 8), causal=True, chunk_size=8,
            left_context_frames=16,
        )
        bundle = ModelBundle.random("zipformer2ctc", cfg, vocab_size=32, seed=6)
    else:
        bundle = lstm_bundle

    def run(wps):
        rec = OnlineRecognizer(bundle, decoding_method=method,
                               compute_dtype=None, max_lanes=2,
                               windows_per_step=wps)
        s = rec.create_online_stream()
        s.add_samples(_pcm(rec.window_samples + 4 * rec.hop_samples, seed=31))
        while s._ready():
            rec.get_results([s])
        r = rec.get_results([s])[0]
        return (r.text, r.timestamps)

    assert run(3) == run(1)
