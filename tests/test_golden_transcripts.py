"""Golden-transcript parity harness against the reference's published output.

Env-gated: set ``K2T_REAL_MODEL_DIR`` to a directory holding a real reference
model export (encoder/decoder/joiner .onnx + tokens.txt + test_wavs/) — e.g.
k2transducer-zipformer-large-en-onnx-offline from the reference's model list —
and this converts it, decodes its test_wavs, and diffs the transcripts
against the reference's published results (README.EN.md:96-117).  Set
``K2T_REAL_ONLINE_MODEL_DIR`` for the streaming equivalent
(README.EN.md:246-265).  Unset, both tests skip — zero new code is needed
the day real exports become mountable:

    K2T_REAL_MODEL_DIR=/path/to/model python -m pytest tests/test_golden_transcripts.py -v
"""

from __future__ import annotations

import glob
import os

import pytest

# Published final transcripts (reference README.EN.md).
GOLDEN_OFFLINE_EN = [
    "after early nightfall the yellow lamps would light up here and there "
    "the squalid quarter of the brothels",
    "god as a direct consequence of the sin which man thus punished had "
    "given her a lovely child whose place was on that same dishonoured "
    "bosom to connect her parent for ever with the race and descent of "
    "mortals and to be finally a blessed soul in heaven",
]
GOLDEN_ONLINE = [
    # English online model, final hypothesis (README.EN.md:263)
    "after early nightfall the yellow lamps would light up here and there "
    "the squalid quarter of the brothels",
    # Chinese online model, final hypothesis (README.EN.md:212)
    "是不是平凡的啊不认识记下来 frequently频繁的",
]


def _norm(s: str) -> str:
    return " ".join(s.strip().lower().split())


def _wavs(model_dir: str) -> list[str]:
    hits = sorted(
        glob.glob(os.path.join(model_dir, "test_wavs", "*.wav"))
        or glob.glob(os.path.join(model_dir, "*.wav"))
    )
    if not hits:
        pytest.skip(f"no test wavs under {model_dir}")
    return hits


def _convert(model_dir: str, tmp_path) -> str:
    from k2transducerasr_tpu.convert.importer import convert_model_dir

    dst = str(tmp_path / "converted")
    convert_model_dir(model_dir, dst)
    return dst


@pytest.mark.skipif(
    not os.environ.get("K2T_REAL_MODEL_DIR"),
    reason="K2T_REAL_MODEL_DIR not set (real reference export unavailable)",
)
def test_offline_golden_transcripts(tmp_path):
    from k2transducerasr_tpu.audio import read_audio
    from k2transducerasr_tpu.runtime.bundle import ModelBundle
    from k2transducerasr_tpu.runtime.offline import OfflineRecognizer

    model_dir = os.environ["K2T_REAL_MODEL_DIR"]
    bundle = ModelBundle.from_dir(_convert(model_dir, tmp_path))
    rec = OfflineRecognizer(bundle)

    streams = []
    for w in _wavs(model_dir):
        a = read_audio(w)
        s = rec.create_offline_stream()
        s.add_samples(a.samples)
        streams.append(s)
    texts = [_norm(r.text) for r in rec.get_results(streams)]
    print("\n".join(texts))

    missing = [g for g in map(_norm, GOLDEN_OFFLINE_EN) if g not in texts]
    assert not missing, (
        "decoded transcripts miss published reference output:\n"
        + "\n".join(f"- {m}" for m in missing)
        + "\ngot:\n"
        + "\n".join(f"+ {t}" for t in texts)
    )


@pytest.mark.skipif(
    not os.environ.get("K2T_REAL_ONLINE_MODEL_DIR"),
    reason="K2T_REAL_ONLINE_MODEL_DIR not set (real reference export unavailable)",
)
def test_online_golden_transcripts(tmp_path):
    from k2transducerasr_tpu.audio import read_audio
    from k2transducerasr_tpu.runtime.bundle import ModelBundle
    from k2transducerasr_tpu.runtime.online import OnlineRecognizer

    model_dir = os.environ["K2T_REAL_ONLINE_MODEL_DIR"]
    bundle = ModelBundle.from_dir(_convert(model_dir, tmp_path))
    rec = OnlineRecognizer(bundle, max_lanes=2)

    finals = []
    for w in _wavs(model_dir):
        a = read_audio(w)
        s = rec.create_online_stream()
        # the reference example feeds 800-sample chunks (Program.cs)
        for i in range(0, len(a.samples), 800):
            s.add_samples(a.samples[i : i + 800])
            rec.get_result(s)
        s.input_finished()
        finals.append(_norm(rec.decode_to_end(s).text))
        rec.dispose_stream(s)
    print("\n".join(finals))

    golden = set(map(_norm, GOLDEN_ONLINE))
    assert golden & set(finals), (
        "no decoded final transcript matches the published reference output:\n"
        + "\n".join(f"+ {t}" for t in finals)
    )
