"""Parity tests: the native C++ audio library must match the numpy paths."""

import io
import wave

import numpy as np
import pytest

from k2transducerasr_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def _wav_bytes(samples, rate=16000, channels=1):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        if channels > 1:
            samples = np.stack([samples] * channels, 1).reshape(-1)
        w.writeframes((np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def test_wav_decode_matches_python():
    from k2transducerasr_tpu.audio.wav import _decode_pcm

    x = (np.sin(np.linspace(0, 30, 3200)) * 0.6).astype(np.float32)
    data = _wav_bytes(x)
    native_out, rate = native.wav_decode(data)
    assert rate == 16000
    with wave.open(io.BytesIO(data)) as w:
        py_out = _decode_pcm(w.readframes(w.getnframes()), 2, 1)
    np.testing.assert_allclose(native_out, py_out, atol=1e-6)


def test_wav_decode_stereo_downmix():
    x = (np.sin(np.linspace(0, 30, 1600)) * 0.5).astype(np.float32)
    native_out, _ = native.wav_decode(_wav_bytes(x, channels=2))
    mono, _ = native.wav_decode(_wav_bytes(x))
    np.testing.assert_allclose(native_out, mono, atol=1e-6)


def test_wav_decode_rejects_garbage():
    assert native.wav_decode(b"not a wav file at all........") is None


def test_resample_matches_python():
    from k2transducerasr_tpu.audio.resample import resample_linear

    x = np.random.default_rng(0).standard_normal(32000).astype(np.float32)
    got = native.resample_linear(x, 32000, 16000)
    want = resample_linear(x, 32000, 16000)
    assert len(got) == len(want)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_ring_buffer_semantics():
    rb = native.RingBuffer()
    rb.push(np.arange(10, dtype=np.float32))
    assert len(rb) == 10
    assert rb.window(12) is None  # underfull
    win = rb.window(6)
    np.testing.assert_array_equal(win, np.arange(6, dtype=np.float32))
    rb.advance(4)
    assert len(rb) == 6
    win = rb.window(6)
    np.testing.assert_array_equal(win, np.arange(4, 10, dtype=np.float32))
    # many pushes exercise compaction
    for i in range(100):
        rb.push(np.full(1000, i, np.float32))
        rb.advance(1000)
    assert len(rb) == 6


def test_online_stream_uses_native(tmp_path):
    """End-to-end: OnlineStream backed by the native ring buffer decodes
    identically to the numpy-fallback path."""
    from k2transducerasr_tpu.models.lstm import LstmConfig
    from k2transducerasr_tpu.runtime.bundle import ModelBundle
    from k2transducerasr_tpu.runtime.online import OnlineRecognizer

    cfg = LstmConfig(d_model=32, rnn_hidden_size=48, num_layers=1, ff_dim=64, chunk_size=4)
    bundle = ModelBundle.random("lstm", cfg, vocab_size=16, seed=0,
                                decoder_dim=24, joiner_dim=24)
    rec = OnlineRecognizer(bundle, compute_dtype=None, max_lanes=2)
    pcm = np.random.default_rng(1).standard_normal(
        rec.window_samples + rec.hop_samples
    ).astype(np.float32) * 0.1

    s = rec.create_online_stream()
    assert s._rb is not None  # native path active
    s.add_samples(pcm)
    while s._ready():
        rec.get_results([s])
    native_text = rec.get_results([s])[0].text

    s2 = rec.create_online_stream()
    s2._rb = None  # force numpy fallback
    s2.add_samples(pcm)
    while s2._ready():
        rec.get_results([s2])
    assert rec.get_results([s2])[0].text == native_text
