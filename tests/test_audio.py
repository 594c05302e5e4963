import io
import struct
import wave

import numpy as np

from k2transducerasr_tpu.audio.resample import resample_linear, resample_sinc
from k2transducerasr_tpu.audio.wav import read_wav, sniff_format


def _make_wav_bytes(samples, rate=16000, sampwidth=2, channels=1):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        if sampwidth == 2:
            data = (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
        else:
            raise NotImplementedError
        w.writeframes(data)
    return buf.getvalue()


def test_read_pcm16_mono():
    x = np.sin(np.linspace(0, 10, 1600)).astype(np.float32) * 0.5
    audio = read_wav(_make_wav_bytes(x))
    assert audio.sample_rate == 16000
    assert abs(audio.duration - 0.1) < 1e-6
    np.testing.assert_allclose(audio.samples, np.round(x * 32767) / 32767, atol=1e-4)


def test_read_stereo_downmix():
    x = np.sin(np.linspace(0, 10, 1600)).astype(np.float32) * 0.5
    inter = np.stack([x, -x], axis=1).reshape(-1)
    audio = read_wav(_make_wav_bytes(inter, channels=2))
    np.testing.assert_allclose(audio.samples, np.zeros(1600), atol=1e-4)


def test_read_float32_wav():
    x = (np.sin(np.linspace(0, 20, 800)) * 0.25).astype("<f4")
    hdr = b"RIFF" + struct.pack("<I", 36 + x.nbytes) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 16000, 64000, 4, 32)
    data = b"data" + struct.pack("<I", x.nbytes) + x.tobytes()
    audio = read_wav(hdr + fmt + data)
    np.testing.assert_allclose(audio.samples, x, atol=1e-7)


def test_sniffing():
    assert sniff_format(b"RIFFxxxxWAVE") == "wav"
    assert sniff_format(b"ID3\x04rest") == "mp3"
    assert sniff_format(b"OggS....") == "ogg"
    assert sniff_format(b"fLaC....") == "flac"
    assert sniff_format(b"\x00\x00\x00\x20ftypisom") == "mp4"


def test_resample_linear_halves_length():
    x = np.sin(np.linspace(0, 100, 32000)).astype(np.float32)
    y = resample_linear(x, 32000, 16000)
    assert len(y) == 16000
    # downsampled signal still tracks the original at shared points
    np.testing.assert_allclose(y[10:100], x[20:200:2], atol=5e-3)


def test_resample_identity():
    x = np.random.default_rng(0).standard_normal(1000).astype(np.float32)
    assert resample_linear(x, 16000, 16000) is not None
    np.testing.assert_array_equal(resample_linear(x, 16000, 16000), x)


def test_resample_sinc_tone_preserved():
    # a 440 Hz tone resampled 48k -> 16k keeps its frequency and amplitude
    t = np.arange(48000) / 48000.0
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = resample_sinc(x, 48000, 16000)
    assert abs(len(y) - 16000) <= 1
    t2 = np.arange(len(y)) / 16000.0
    expect = np.sin(2 * np.pi * 440 * t2)
    err = np.abs(y[200:-200] - expect[200:-200]).max()
    assert err < 0.02
