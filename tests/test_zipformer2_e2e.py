import numpy as np
import pytest

from k2transducerasr_tpu.models.zipformer2 import Zipformer2Config
from k2transducerasr_tpu.runtime.bundle import ModelBundle
from k2transducerasr_tpu.runtime.offline import OfflineRecognizer
from k2transducerasr_tpu.runtime.online import OnlineRecognizer

TINY = dict(
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


def _pcm(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    return (0.3 * np.sin(2 * np.pi * 500 * t) + 0.1 * rng.standard_normal(n)).astype(
        np.float32
    )


def test_offline_transducer_e2e():
    cfg = Zipformer2Config(**TINY)
    bundle = ModelBundle.random("zipformer2", cfg, vocab_size=30, seed=3,
                                decoder_dim=32, joiner_dim=24)
    rec = OfflineRecognizer(bundle, compute_dtype=None)
    s = rec.create_offline_stream()
    s.add_samples(_pcm(12000))
    res = rec.get_result(s)
    assert isinstance(res.text, str)


def test_offline_ctc_e2e():
    cfg = Zipformer2Config(**TINY)
    bundle = ModelBundle.random("zipformer2ctc", cfg, vocab_size=30, seed=4)
    rec = OfflineRecognizer(bundle, compute_dtype=None)
    assert rec.decoding_method == "greedy_search_ctc"  # forced, as in reference
    s = rec.create_offline_stream()
    s.add_samples(_pcm(12000, seed=1))
    res = rec.get_result(s)
    assert isinstance(res.text, str)
    # ctc decode: equal adjacent output tokens imply a blank separated the
    # two runs, so their timestamps cannot be adjacent frames
    ids = [bundle.tokens.id_of(t) for t in res.tokens]
    for a, b, ta, tb in zip(ids, ids[1:], res.timestamps, res.timestamps[1:]):
        if a == b:
            assert tb > ta + 1, (res.tokens, res.timestamps)


@pytest.mark.parametrize("model_type", ["zipformer2", "zipformer2ctc"])
def test_online_e2e(model_type):
    cfg = Zipformer2Config(**TINY, causal=True, chunk_size=8, left_context_frames=16)
    bundle = ModelBundle.random(model_type, cfg, vocab_size=30, seed=5,
                                decoder_dim=32, joiner_dim=24)
    rec = OnlineRecognizer(bundle, compute_dtype=None, max_lanes=2)
    s = rec.create_online_stream()
    s.add_samples(_pcm(rec.window_samples + 2 * rec.hop_samples, seed=2))
    while s._ready():
        rec.get_results([s])
    res = rec.get_results([s])[0]
    assert isinstance(res.text, str)
    assert res.timestamps == sorted(res.timestamps)
