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


def _codec_libs_present():
    import ctypes.util

    return bool(
        (ctypes.util.find_library("mpg123") or _so_exists("libmpg123.so.0"))
        and (ctypes.util.find_library("mp3lame") or _so_exists("libmp3lame.so.0"))
    )


def _so_exists(name):
    import ctypes

    try:
        ctypes.CDLL(name)
        return True
    except OSError:
        return False


def test_mp3_roundtrip(tmp_path):
    import pytest

    if not _codec_libs_present():
        pytest.skip("host codec libraries not present")
    from k2transducerasr_tpu.audio import read_audio
    from k2transducerasr_tpu.audio.codecs import encode_mp3

    rate = 16000
    t = np.arange(rate) / rate  # 1 s
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = tmp_path / "tone.mp3"
    encode_mp3(x, rate, path)
    audio = read_audio(str(path))
    assert audio.sample_rate == rate
    # lossy codec: length faithful up to codec delay, waveform well correlated
    assert abs(len(audio.samples) - len(x)) < 3000
    n = min(len(audio.samples), len(x))
    # align by cross-correlation over a small lag window (codec delay)
    best = -1.0
    for lag in range(0, 2400, 24):
        seg = audio.samples[lag : lag + 8000]
        if len(seg) < 8000:
            break
        c = np.corrcoef(seg, x[:8000])[0, 1]
        best = max(best, c)
    assert best > 0.95, f"decoded waveform poorly correlated: {best}"
    # mp3 bytes fed directly (no filename) also decode
    audio2 = read_audio(path.read_bytes())
    assert audio2.sample_rate == rate
    assert len(audio2.samples) == len(audio.samples)


def test_mp3_chunked_read(tmp_path):
    import pytest

    if not _codec_libs_present():
        pytest.skip("host codec libraries not present")
    from k2transducerasr_tpu.audio.codecs import encode_mp3
    from k2transducerasr_tpu.audio.wav import read_wav_chunks

    rate = 16000
    x = np.random.default_rng(7).standard_normal(rate).astype(np.float32) * 0.1
    path = tmp_path / "noise.mp3"
    encode_mp3(x, rate, path)
    chunks = list(read_wav_chunks(str(path), 800))
    assert all(len(c) == 800 for c in chunks[:-1])
    assert sum(len(c) for c in chunks) > 0


def test_media_roundtrip_ogg_flac_mp4(tmp_path):
    """ogg/flac/mp4 decode through the ffmpeg-backed native media library —
    the host-OS codec route the reference takes via MediaFoundation
    (AudioHelper.cs:41-78)."""
    import pytest

    from k2transducerasr_tpu import native

    if not native.media_available():
        pytest.skip("host ffmpeg media stack not present")
    from k2transducerasr_tpu.audio import read_audio
    from k2transducerasr_tpu.audio.wav import sniff_format

    rate = 16000
    t = np.arange(2 * rate) / rate
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)

    for ext, kind, lossless in (("ogg", "ogg", False), ("flac", "flac", True),
                                ("m4a", "mp4", False)):
        path = tmp_path / f"tone.{ext}"
        assert native.media_encode(str(path), x, rate), f"{ext} encode failed"
        assert sniff_format(path.read_bytes()) == kind
        audio = read_audio(str(path))
        assert audio.sample_rate == rate
        assert abs(len(audio.samples) - len(x)) < 4000
        if lossless:
            # flac encodes via an integer sample format: exact up to one
            # quantization step
            n = min(len(audio.samples), len(x))
            assert np.max(np.abs(audio.samples[:n] - x[:n])) < 2.0 / 32768
        else:
            best = -1.0
            for lag in range(0, 4000, 20):
                seg = audio.samples[lag : lag + 8000]
                if len(seg) < 8000:
                    break
                best = max(best, float(np.corrcoef(seg, x[:8000])[0, 1]))
            assert best > 0.95, f"{ext}: decoded waveform poorly correlated ({best})"
        # bytes input (no filename) routes through the same decoder
        audio2 = read_audio(path.read_bytes())
        assert audio2.sample_rate == rate
        assert len(audio2.samples) == len(audio.samples)
