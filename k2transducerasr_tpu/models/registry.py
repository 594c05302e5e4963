"""Encoder-family registry.

The reference dispatches on the ONNX metadata key ``model_type``
(``OfflineRecognizer.cs:38-53``, ``OnlineRecognizer.cs:26-44``):
conformer | lstm | zipformer | zipformer2 | zipformer2ctc.  Here each family
is a module exposing the same functional surface:

    Config                         dataclass of hyperparameters
    init_params(key, cfg)          -> params pytree
    forward(params, cfg, x, lens)  -> (enc_out [B,T',D], out_lens)
    init_state(cfg, batch)         -> streaming state pytree   (online only)
    streaming_step(params, cfg, state, chunk) -> (enc_out, new_state)
"""

from __future__ import annotations

import importlib

_FAMILIES = {
    "conformer": "k2transducerasr_tpu.models.conformer",
    "lstm": "k2transducerasr_tpu.models.lstm",
    "zipformer": "k2transducerasr_tpu.models.zipformer",
    "zipformer2": "k2transducerasr_tpu.models.zipformer2",
    # zipformer2ctc shares the zipformer2 encoder; the CTC head replaces
    # decoder+joiner (OfflineProjOfZipformer2ctc.cs:93-101)
    "zipformer2ctc": "k2transducerasr_tpu.models.zipformer2",
}


def get_encoder(model_type: str):
    if model_type not in _FAMILIES:
        raise ValueError(
            f"unknown model_type {model_type!r}; expected one of {sorted(_FAMILIES)}"
        )
    return importlib.import_module(_FAMILIES[model_type])


def is_ctc(model_type: str) -> bool:
    return model_type.endswith("ctc")
