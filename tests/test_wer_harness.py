"""End-to-end WER harness self-test: build a model dir + tiny dataset where
references are the model's own outputs -> WER must be 0; corrupt one
reference -> WER > 0."""

import json
import subprocess
import sys
import wave

import numpy as np
import pytest

from k2transducerasr_tpu.models.lstm import LstmConfig
from k2transducerasr_tpu.runtime.bundle import ModelBundle
from k2transducerasr_tpu.runtime.offline import OfflineRecognizer


def _write_wav(path, pcm):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((np.clip(pcm, -1, 1) * 32767).astype("<i2").tobytes())


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("wer")
    model_dir = root / "model"
    data_dir = root / "data"
    data_dir.mkdir()
    cfg = LstmConfig(d_model=32, rnn_hidden_size=48, num_layers=1, ff_dim=64, chunk_size=4)
    bundle = ModelBundle.random("lstm", cfg, vocab_size=16, seed=0,
                                decoder_dim=24, joiner_dim=24)
    bundle.save(str(model_dir))

    # IMPORTANT: decode EXACTLY the way benchmarks/wer_harness.py will
    # (default bf16 compute, one batch-3 get_results call, samples read back
    # from the wav file through the package's own reader) — the references
    # are the model's own outputs, and on a random-weight model any numeric
    # difference (f32 vs bf16, batch shape, or raw-float vs wav-quantized
    # samples) flips near-tied argmaxes and WER != 0
    from k2transducerasr_tpu.audio import read_wav

    rec = OfflineRecognizer(bundle)
    streams = []
    for i in range(3):
        rng = np.random.default_rng(i)
        t = np.arange(12000) / 16000.0
        pcm = (0.3 * np.sin(2 * np.pi * (200 + 100 * i) * t)
               + 0.1 * rng.standard_normal(len(t))).astype(np.float32)
        _write_wav(data_dir / f"utt{i}.wav", pcm)
        s = rec.create_offline_stream()
        s.add_samples(read_wav(str(data_dir / f"utt{i}.wav")).samples)
        streams.append(s)
    results = rec.get_results(streams)
    lines = [f"utt{i}\t{results[i].text}" for i in range(3)]
    (data_dir / "transcripts.tsv").write_text("\n".join(lines) + "\n", encoding="utf-8")
    return str(model_dir), str(data_dir), lines


def _run_harness(model_dir, data_dir):
    import os

    env = dict(**__import__("os").environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "benchmarks/wer_harness.py", "--model-dir", model_dir,
         "--data", data_dir, "--batch", "3"],
        capture_output=True, text=True, timeout=300, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])

def test_wer_zero_on_self_outputs(setup):
    model_dir, data_dir, _ = setup
    res = _run_harness(model_dir, data_dir)
    assert res["utterances"] == 3
    assert res["wer"] == 0.0
    assert res["rtf"] > 0


def test_wer_nonzero_on_corrupted_ref(setup, tmp_path):
    model_dir, data_dir, lines = setup
    import shutil

    data2 = tmp_path / "data2"
    shutil.copytree(data_dir, data2)
    bad = lines.copy()
    utt, text = bad[0].split("\t", 1)
    bad[0] = f"{utt}\t{text} extraword"
    (data2 / "transcripts.tsv").write_text("\n".join(bad) + "\n", encoding="utf-8")
    res = _run_harness(model_dir, str(data2))
    assert res["wer"] > 0.0
    assert res["deletions"] >= 1
