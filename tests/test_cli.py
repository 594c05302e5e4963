import io
import wave

import numpy as np
import pytest

from k2transducerasr_tpu.cli.main import main, parse_args
from k2transducerasr_tpu.models.lstm import LstmConfig
from k2transducerasr_tpu.runtime.bundle import ModelBundle


def _write_wav(path, pcm, rate=16000):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((np.clip(pcm, -1, 1) * 32767).astype("<i2").tobytes())


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("model")
    cfg = LstmConfig(d_model=32, rnn_hidden_size=48, num_layers=1, ff_dim=64, chunk_size=4)
    bundle = ModelBundle.random("lstm", cfg, vocab_size=16, seed=0,
                                decoder_dim=24, joiner_dim=24)
    bundle.save(str(d))
    wavs = d / "test_wavs"
    wavs.mkdir()
    t = np.arange(16000) / 16000.0
    _write_wav(wavs / "a.wav", 0.3 * np.sin(2 * np.pi * 440 * t))
    return str(d)


def test_parse_args_flags_and_env(monkeypatch):
    monkeypatch.setenv("MANYSPEECH_TYPE", "online")
    monkeypatch.setenv("MANYSPEECH_BATCH", "multi")
    o = parse_args(["-base", "/m", "-model", "x", "-files", "a.wav", "b.wav", "-threads", "4"])
    assert o["base"] == "/m" and o["model"] == "x"
    assert o["type"] == "online" and o["batch"] == "multi"  # from env
    assert o["files"] == ["a.wav", "b.wav"] and o["threads"] == 4
    # explicit flag overrides env
    o2 = parse_args(["-type", "offline"])
    assert o2["type"] == "offline"


def test_cli_offline_default_test_wavs(model_dir, capsys):
    rc = main(["-base", model_dir, "-type", "offline", "-batch", "multi"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "rtf:" in out and "end!" in out and "elapsed_milliseconds:" in out


def test_cli_online(model_dir, capsys):
    rc = main(["-base", model_dir, "-type", "online"])
    assert rc == 0
    assert "rtf:" in capsys.readouterr().out


def test_cli_missing_model(capsys):
    rc = main(["-base", "/nonexistent-dir-xyz"])
    assert rc == 2


def test_cli_unknown_flag():
    with pytest.raises(SystemExit):
        parse_args(["-bogus"])


def test_parse_hotwords_flag():
    opts = parse_args(["-hotwords", "hello,world", "-accuracy", "int8"])
    assert opts["hotwords"] == "hello,world"
    assert opts["accuracy"] == "int8"


def test_cli_hotwords_beam(model_dir, capsys):
    """-hotwords forces modified_beam_search and decodes end-to-end."""
    rc = main(["-base", model_dir, "-type", "offline", "-hotwords", "zzz"])
    assert rc == 0
    assert "rtf:" in capsys.readouterr().out


def test_cli_int8_compute(model_dir, capsys):
    rc = main(["-base", model_dir, "-type", "offline", "-accuracy", "int8"])
    assert rc == 0
    assert "rtf:" in capsys.readouterr().out
