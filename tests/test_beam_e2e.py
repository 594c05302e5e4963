import numpy as np
import pytest

from k2transducerasr_tpu.models.lstm import LstmConfig
from k2transducerasr_tpu.runtime.bundle import ModelBundle
from k2transducerasr_tpu.runtime.offline import OfflineRecognizer
from k2transducerasr_tpu.runtime.online import OnlineRecognizer


@pytest.fixture(scope="module")
def bundle():
    cfg = LstmConfig(
        feature_dim=80, d_model=48, rnn_hidden_size=64, num_layers=2, ff_dim=96, chunk_size=4
    )
    return ModelBundle.random("lstm", cfg, vocab_size=32, seed=1, decoder_dim=40, joiner_dim=36)


def _pcm(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    return (0.3 * np.sin(2 * np.pi * 400 * t) + 0.1 * rng.standard_normal(n)).astype(np.float32)


def test_offline_beam_e2e(bundle):
    rec = OfflineRecognizer(bundle, decoding_method="modified_beam_search",
                            compute_dtype=None, max_active_paths=4)
    s = rec.create_offline_stream()
    s.add_samples(_pcm(12000))
    res = rec.get_result(s)
    assert isinstance(res.text, str)
    assert res.timestamps == sorted(res.timestamps)


def test_online_beam_e2e(bundle):
    rec = OnlineRecognizer(bundle, decoding_method="modified_beam_search",
                           compute_dtype=None, max_lanes=2, max_active_paths=4)
    s = rec.create_online_stream()
    s.add_samples(_pcm(rec.window_samples + 2 * rec.hop_samples, seed=2))
    while s._ready():
        rec.get_results([s])
    res = rec.get_results([s])[0]
    assert isinstance(res.text, str)
    # lane reuse with beam state
    rec.dispose_stream(s)
    s2 = rec.create_online_stream()
    assert rec.get_result(s2).text == ""


def test_offline_nbest_and_hotwords(bundle):
    """get_nbest_results exposes all K beams best-first; a hotword present
    only in a lower-ranked hypothesis flips the selected result (the
    reference's HotwordsHelper sketch, but reachable from the public API)."""
    rec = OfflineRecognizer(bundle, decoding_method="modified_beam_search",
                            compute_dtype=None, max_active_paths=4)
    s = rec.create_offline_stream()
    s.add_samples(_pcm(12000, seed=5))
    nbest = rec.get_nbest_results([s])[0]
    assert len(nbest) == 4
    assert nbest[0].text == rec.get_result(s).text  # beam 0 == best

    # find a hypothesis whose text differs from the best and contains a
    # token the best lacks — use its full text as the "hotword"
    target = next((c for c in nbest[1:] if c.text and c.text != nbest[0].text), None)
    if target is None:
        pytest.skip("random weights produced identical n-best texts")
    rec_hw = OfflineRecognizer(
        bundle, decoding_method="modified_beam_search", compute_dtype=None,
        max_active_paths=4, hotwords=[target.text],
    )
    s2 = rec_hw.create_offline_stream()
    s2.add_samples(_pcm(12000, seed=5))
    assert rec_hw.get_result(s2).text == target.text


def test_offline_hotwords_requires_beam(bundle):
    with pytest.raises(ValueError):
        OfflineRecognizer(bundle, hotwords=["x"])
    with pytest.raises(ValueError):
        OnlineRecognizer(bundle, hotwords=["x"])


def test_online_nbest_and_hotwords(bundle):
    rec = OnlineRecognizer(bundle, decoding_method="modified_beam_search",
                           compute_dtype=None, max_lanes=2, max_active_paths=4)
    s = rec.create_online_stream()
    s.add_samples(_pcm(rec.window_samples + 3 * rec.hop_samples, seed=6))
    nbest = None
    while s._ready():
        nbest = rec.get_nbest_results([s])[0]
    assert nbest is not None and len(nbest) == 4
    assert nbest[0].text == rec.get_results([s])[0].text

    target = next((c for c in nbest[1:] if c.text and c.text != nbest[0].text), None)
    if target is None:
        pytest.skip("random weights produced identical n-best texts")
    rec_hw = OnlineRecognizer(
        bundle, decoding_method="modified_beam_search", compute_dtype=None,
        max_lanes=2, max_active_paths=4, hotwords=[target.text],
    )
    s2 = rec_hw.create_online_stream()
    s2.add_samples(_pcm(rec.window_samples + 3 * rec.hop_samples, seed=6))
    res = None
    while s2._ready():
        res = rec_hw.get_results([s2])[0]
    assert res is not None and res.text == target.text
