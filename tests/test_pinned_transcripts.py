"""Pinned deterministic transcripts per family (VERDICT r4 item #8).

The env-gated golden tests (test_golden_transcripts.py) need real model
exports; until those can be ingested, the tokens -> byte-BPE -> text
assembly path has this content oracle instead: seeded tiny bundles decode a
fixed synthetic waveform to EXACT pinned strings, f32 compute on the CPU
backend (deterministic).  Any change to fbank, an encoder family, the
greedy loop, timestamp bookkeeping, or text assembly that alters output
trips these — unlike the previous ``isinstance(res.text, str)`` smoke
checks.

The online pins extend the offline ones because ``input_finished`` zero-pad
flushing appends tail-window emissions (reference semantics,
OnlineStream.cs:124-161); the shared prefix is asserted explicitly.
"""

import numpy as np
import pytest

from k2transducerasr_tpu.runtime.bundle import ModelBundle
from k2transducerasr_tpu.runtime.offline import OfflineRecognizer
from k2transducerasr_tpu.runtime.online import OnlineRecognizer


def _pcm(n, seed=9):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    return (0.3 * np.sin(2 * np.pi * 420 * t) + 0.1 * rng.standard_normal(n)).astype(
        np.float32
    )


def _bundle(family):
    if family == "lstm":
        from k2transducerasr_tpu.models.lstm import LstmConfig

        cfg = LstmConfig(d_model=32, rnn_hidden_size=48, num_layers=1, ff_dim=64,
                         chunk_size=4)
        return ModelBundle.random("lstm", cfg, vocab_size=16, seed=0,
                                  decoder_dim=24, joiner_dim=24)
    if family == "conformer":
        from k2transducerasr_tpu.models.conformer import ConformerConfig

        cfg = ConformerConfig(d_model=64, num_layers=2, num_heads=4, ff_dim=96,
                              cnn_kernel=7, causal=True, chunk_size=4, left_context=8)
        return ModelBundle.random("conformer", cfg, vocab_size=32, seed=2,
                                  decoder_dim=40, joiner_dim=36)
    if family == "zipformer":
        from k2transducerasr_tpu.models.zipformer import ZipformerConfig

        cfg = ZipformerConfig(
            num_encoder_layers=(1, 1), encoder_dims=(32, 32), attention_dims=(32, 32),
            num_heads=(4, 4), feedforward_dims=(48, 48), cnn_module_kernels=(7, 7),
            downsampling_factors=(1, 2), causal=True, chunk_size=4,
            left_context_frames=8,
        )
        return ModelBundle.random("zipformer", cfg, vocab_size=32, seed=3,
                                  decoder_dim=40, joiner_dim=36)
    from k2transducerasr_tpu.models.zipformer2 import Zipformer2Config

    cfg = Zipformer2Config(
        num_encoder_layers=(1, 1), encoder_dims=(16, 32), downsampling_factors=(1, 2),
        num_heads=(2, 2), feedforward_dims=(32, 48), cnn_module_kernels=(7, 7),
        query_head_dim=4, value_head_dim=4, pos_head_dim=2, pos_dim=8,
        embed_channels=(2, 4, 8), causal=True, chunk_size=8, left_context_frames=16,
    )
    return ModelBundle.random(family, cfg, vocab_size=32, seed=4)


# (family, offline_text, offline_timestamps, online_text)
PINS = [
    ("lstm", "tok6tok15tok15tok15tok15tok15tok15", [0, 1, 2, 3, 4, 5, 6, 7],
     "tok6tok15tok15tok15tok15tok15tok15tok9tok9tok9tok9tok9tok9"),
    ("conformer", "tok28tok28tok28tok28", [0, 1, 4, 7],
     "tok28tok28tok28tok28"),
    ("zipformer", "tok5tok17tok5tok17tok5tok17tok5tok17", [0, 1, 2, 3, 4, 5, 6, 7],
     "tok5tok17tok5tok17tok5tok17tok5tok17tok5tok23"),
    ("zipformer2", "tok25tok25tok18tok8tok12tok6tok25tok6", [0, 1, 2, 3, 4, 5, 6, 7],
     "tok25tok25tok18tok8tok12tok6tok25tok6tok12tok6tok25tok6"),
    ("zipformer2ctc", "tok29", [0], "tok29tok27"),
]


@pytest.mark.parametrize("family,off_text,off_ts,on_text", PINS,
                         ids=[p[0] for p in PINS])
def test_pinned_transcript(family, off_text, off_ts, on_text):
    bundle = _bundle(family)
    rec = OfflineRecognizer(bundle, compute_dtype=None)
    s = rec.create_offline_stream()
    s.add_samples(_pcm(6400))
    res = rec.get_result(s)
    assert res.text == off_text
    assert res.timestamps == off_ts

    ron = OnlineRecognizer(bundle, compute_dtype=None, max_lanes=2)
    st = ron.create_online_stream()
    st.add_samples(_pcm(6400))
    on = ron.decode_to_end(st)
    assert on.text == on_text
    # streaming must agree with offline on the real-audio prefix; the extra
    # tokens come from the zero-pad tail flush
    assert on.text.startswith(off_text) or off_text.startswith(on.text)


def test_pinned_text_assembly_regimes():
    """Exact pins through a REAL recognizer for the three text-assembly
    regimes the tokN pins above cannot reach (SURVEY.md §5 contract,
    OfflineRecognizer.cs:432-545): BPE '▁'->space + lowercase, CJK chars
    joined without spaces, and a dangling hex byte recovered by
    SmartByteDecode (here: dropped as an invalid UTF-8 prefix)."""
    from k2transducerasr_tpu.models.lstm import LstmConfig

    base = ["<blk>", "<sos/eos>", "<unk>", "t3", "t4", "t5"]
    cases = [
        (base + ["▁HE", "t7", "t8", "t9", "t10", "t11", "t12", "t13", "t14", "LLO"],
         " hellollollollollollo"),
        (base + ["好", "t7", "t8", "t9", "t10", "t11", "t12", "t13", "t14", "世"],
         "好世世世世世世"),
        (base + ["<0xE4>", "t7", "t8", "t9", "t10", "t11", "t12", "t13", "t14", "Q"],
         "qqqqqq"),
    ]
    cfg = LstmConfig(d_model=32, rnn_hidden_size=48, num_layers=1, ff_dim=64,
                     chunk_size=4)
    for symbols, want in cases:
        bundle = ModelBundle.random(
            "lstm", cfg, vocab_size=16, seed=0, decoder_dim=24, joiner_dim=24,
            symbols=symbols,
        )
        rec = OfflineRecognizer(bundle, compute_dtype=None)
        s = rec.create_offline_stream()
        s.add_samples(_pcm(6400))
        assert rec.get_result(s).text == want
