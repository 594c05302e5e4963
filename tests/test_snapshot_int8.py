import numpy as np
import pytest

from k2transducerasr_tpu.models.lstm import LstmConfig
from k2transducerasr_tpu.runtime import checkpoint
from k2transducerasr_tpu.runtime.bundle import ModelBundle
from k2transducerasr_tpu.runtime.online import OnlineRecognizer


@pytest.fixture(scope="module")
def bundle():
    cfg = LstmConfig(d_model=32, rnn_hidden_size=48, num_layers=1, ff_dim=64, chunk_size=4)
    return ModelBundle.random("lstm", cfg, vocab_size=16, seed=0, decoder_dim=24, joiner_dim=24)


def _pcm(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    return (0.3 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(n)).astype(np.float32)


def test_stream_snapshot_restore_continues_exactly(bundle):
    """Decode half a stream, snapshot, restore into a DIFFERENT recognizer,
    finish there — result must equal uninterrupted decoding (the migrating-
    stream/elasticity contract, SURVEY.md §5)."""
    rec_a = OnlineRecognizer(bundle, compute_dtype=None, max_lanes=2)
    pcm = _pcm(rec_a.window_samples + 3 * rec_a.hop_samples, seed=3)

    # uninterrupted reference run
    s_ref = rec_a.create_online_stream()
    s_ref.add_samples(pcm)
    while s_ref._ready():
        rec_a.get_results([s_ref])
    want = rec_a.get_results([s_ref])[0]

    # interrupted run: decode 2 chunks, snapshot, migrate, finish
    rec_b = OnlineRecognizer(bundle, compute_dtype=None, max_lanes=2)
    s1 = rec_b.create_online_stream()
    s1.add_samples(pcm)
    rec_b.get_results([s1])
    rec_b.get_results([s1])
    snap = rec_b.snapshot_stream(s1)

    rec_c = OnlineRecognizer(bundle, compute_dtype=None, max_lanes=2)
    s2 = rec_c.restore_stream(snap)
    while s2._ready():
        rec_c.get_results([s2])
    got = rec_c.get_results([s2])[0]

    assert got.text == want.text
    assert got.timestamps == want.timestamps


def test_int8_param_storage_roundtrip(tmp_path, bundle):
    p = str(tmp_path / "params_q8.npz")
    checkpoint.save_params(p, bundle.params, dtype="int8")
    loaded = checkpoint.load_params(p)
    flat_orig = checkpoint.flatten_params(bundle.params)
    flat_new = checkpoint.flatten_params(loaded)
    assert flat_orig.keys() == flat_new.keys()
    for k, v in flat_orig.items():
        if v.ndim >= 2 and v.size >= 1024:
            scale = np.abs(v).max() / 127.0
            np.testing.assert_allclose(flat_new[k], v, atol=scale * 0.51)
        else:
            np.testing.assert_array_equal(flat_new[k], v)
    # quantized file is materially smaller
    import os

    p32 = str(tmp_path / "params_f32.npz")
    checkpoint.save_params(p32, bundle.params)
    assert os.path.getsize(p) < 0.55 * os.path.getsize(p32)
