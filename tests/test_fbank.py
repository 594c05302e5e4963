import numpy as np
import pytest

from k2transducerasr_tpu.frontend.fbank import (
    FbankConfig,
    FbankExtractor,
    OnlineFbank,
    num_frames_for,
)
from tests.kaldi_fbank_reference import fbank_reference


def _speech_like(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    x = (
        0.3 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 730 * t + 0.5)
        + 0.05 * rng.standard_normal(n)
    )
    return x.astype(np.float32)


@pytest.mark.parametrize("window", ["hamming", "povey", "hanning"])
def test_matches_kaldi_reference(window):
    cfg = FbankConfig(window_type=window)
    x = _speech_like(16000)  # 1 s
    ref = fbank_reference(x, cfg)
    feats, t = FbankExtractor(cfg)(x)
    assert t == ref.shape[0] == num_frames_for(16000, cfg) == 98
    got = np.asarray(feats)[:t]
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-3)


def test_no_preemph_no_dc():
    cfg = FbankConfig(preemph_coeff=0.0, remove_dc_offset=False)
    x = _speech_like(8000, seed=1)
    ref = fbank_reference(x, cfg)
    feats, t = FbankExtractor(cfg)(x)
    np.testing.assert_allclose(np.asarray(feats)[:t], ref, rtol=2e-4, atol=2e-3)


def test_frame_counts():
    cfg = FbankConfig()
    assert num_frames_for(0, cfg) == 0
    assert num_frames_for(399, cfg) == 0
    assert num_frames_for(400, cfg) == 1
    assert num_frames_for(560, cfg) == 2
    assert num_frames_for(16000, cfg) == 98


def test_batched_matches_single():
    cfg = FbankConfig()
    a, b = _speech_like(16000, 2), _speech_like(12000, 3)
    fa, ta = FbankExtractor(cfg)(a)
    fb, tb = FbankExtractor(cfg)(b)
    batch = np.zeros((2, 16000), np.float32)
    batch[0], batch[1, :12000] = a, b
    feats, n = FbankExtractor(cfg)(batch, n_valid=np.array([16000, 12000]))
    np.testing.assert_allclose(np.asarray(feats[0])[:ta], np.asarray(fa)[:ta], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(feats[1])[:tb], np.asarray(fb)[:tb], rtol=1e-5, atol=1e-5)


def test_whisper_snip_edges_false_matches_reference():
    """OfflineStream.cs:27-32 whisper semantics: hanning, snip_edges=False
    (centered frames with boundary reflection)."""
    cfg = FbankConfig.whisper()
    assert cfg.window_type == "hanning" and not cfg.snip_edges
    x = _speech_like(15843, seed=9)  # odd length exercises reflection
    ref = fbank_reference(x, cfg)
    feats, t = FbankExtractor(cfg)(x)
    assert t == ref.shape[0] == num_frames_for(len(x), cfg)
    np.testing.assert_allclose(np.asarray(feats)[:t], ref, rtol=2e-4, atol=2e-3)


def test_online_streaming_equals_offline():
    """Chunked accept_waveform must produce exactly the whole-buffer frames
    (kaldi online semantics: frame t covers samples [t*160, t*160+400))."""
    cfg = FbankConfig()
    x = _speech_like(16000 * 2 + 137, seed=4)
    whole = fbank_reference(x, cfg)

    online = OnlineFbank(cfg)
    chunks = []
    for i in range(0, len(x), 800):  # the reference example feeds 800-sample chunks
        chunks.append(online.accept_waveform(x[i : i + 800]))
    chunks.append(online.input_finished())
    got = np.concatenate(chunks, axis=0)
    assert got.shape == whole.shape
    np.testing.assert_allclose(got, whole, rtol=2e-4, atol=2e-3)
