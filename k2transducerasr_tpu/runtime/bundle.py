"""ModelBundle: everything a recognizer needs, loadable from a model dir.

The analogue of the reference's OfflineModel/OnlineModel (3 ORT sessions +
parsed metadata, ``OfflineModel.cs:23-73`` / ``OnlineModel.cs:32-183``), but
as one pytree + dataclass configs; the "sessions" are jitted functions built
lazily by the recognizers.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax

from k2transducerasr_tpu.frontend.fbank import FbankConfig
from k2transducerasr_tpu.models import ctc as ctc_mod
from k2transducerasr_tpu.models import decoder as decoder_mod
from k2transducerasr_tpu.models import joiner as joiner_mod
from k2transducerasr_tpu.models.registry import get_encoder, is_ctc
from k2transducerasr_tpu.runtime import checkpoint
from k2transducerasr_tpu.text.symbol_table import SymbolTable


@dataclasses.dataclass
class ModelBundle:
    model_type: str
    encoder_cfg: Any
    params: Any  # {"encoder": ..., "decoder": ..., "joiner": ..., "ctc": ...}
    tokens: SymbolTable
    frontend_cfg: FbankConfig
    decoder_cfg: decoder_mod.DecoderConfig | None = None
    joiner_cfg: joiner_mod.JoinerConfig | None = None
    ctc_cfg: ctc_mod.CtcConfig | None = None

    @property
    def encoder(self):
        return get_encoder(self.model_type)

    @property
    def is_ctc(self) -> bool:
        return is_ctc(self.model_type)

    @property
    def vocab_size(self) -> int:
        return self.ctc_cfg.vocab_size if self.is_ctc else self.decoder_cfg.vocab_size

    # -- construction -------------------------------------------------------

    @classmethod
    def from_dir(cls, model_dir: str, accuracy: str = "") -> "ModelBundle":
        files = checkpoint.model_dir_files(model_dir, accuracy)
        raw = checkpoint.load_config(files["config"])
        model_type = raw["model_type"]
        enc_mod = get_encoder(model_type)
        encoder_cfg = enc_mod.Config(**raw["encoder"])
        frontend_cfg = FbankConfig(**raw.get("frontend", {}))
        decoder_cfg = joiner_cfg = ctc_cfg = None
        if is_ctc(model_type):
            ctc_cfg = ctc_mod.CtcConfig(**raw["ctc"])
        else:
            decoder_cfg = decoder_mod.DecoderConfig(**raw["decoder"])
            joiner_cfg = joiner_mod.JoinerConfig(**raw["joiner"])
        params = checkpoint.load_params(files["params"])
        tokens = SymbolTable.from_file(files["tokens"])
        return cls(
            model_type=model_type,
            encoder_cfg=encoder_cfg,
            params=params,
            tokens=tokens,
            frontend_cfg=frontend_cfg,
            decoder_cfg=decoder_cfg,
            joiner_cfg=joiner_cfg,
            ctc_cfg=ctc_cfg,
        )

    def save(self, model_dir: str) -> None:
        import os

        os.makedirs(model_dir, exist_ok=True)
        checkpoint.save_config(
            os.path.join(model_dir, "config.json"),
            self.model_type,
            {
                "encoder": self.encoder_cfg,
                "decoder": self.decoder_cfg,
                "joiner": self.joiner_cfg,
                "ctc": self.ctc_cfg,
                "frontend": self.frontend_cfg,
            },
        )
        checkpoint.save_params(os.path.join(model_dir, "params.npz"), self.params)
        with open(os.path.join(model_dir, "tokens.txt"), "w", encoding="utf-8") as f:
            for i in range(len(self.tokens)):
                f.write(f"{self.tokens[i]} {i}\n")

    @classmethod
    def random(
        cls,
        model_type: str,
        encoder_cfg,
        vocab_size: int,
        seed: int = 0,
        decoder_dim: int = 512,
        joiner_dim: int = 512,
        context_size: int = 2,
        symbols: list[str] | None = None,
        frontend_cfg: FbankConfig | None = None,
    ) -> "ModelBundle":
        """Random-weight bundle (testing/benchmarking without real weights)."""
        enc_mod = get_encoder(model_type)
        key = jax.random.PRNGKey(seed)
        k_enc, k_dec, k_join, k_ctc = jax.random.split(key, 4)
        params: dict[str, Any] = {"encoder": enc_mod.init_params(k_enc, encoder_cfg)}
        decoder_cfg = joiner_cfg = ctc_cfg = None
        enc_dim = enc_mod.output_dim(encoder_cfg)
        if is_ctc(model_type):
            ctc_cfg = ctc_mod.CtcConfig(encoder_dim=enc_dim, vocab_size=vocab_size)
            params["ctc"] = ctc_mod.init_params(k_ctc, ctc_cfg)
        else:
            decoder_cfg = decoder_mod.DecoderConfig(
                vocab_size=vocab_size, decoder_dim=decoder_dim, context_size=context_size
            )
            joiner_cfg = joiner_mod.JoinerConfig(
                encoder_dim=enc_dim,
                decoder_dim=decoder_dim,
                joiner_dim=joiner_dim,
                vocab_size=vocab_size,
            )
            params["decoder"] = decoder_mod.init_params(k_dec, decoder_cfg)
            params["joiner"] = joiner_mod.init_params(k_join, joiner_cfg)
        if symbols is None:
            symbols = ["<blk>", "<sos/eos>", "<unk>"] + [
                f"tok{i}" for i in range(3, vocab_size)
            ]
        return cls(
            model_type=model_type,
            encoder_cfg=encoder_cfg,
            params=params,
            tokens=SymbolTable(symbols),
            frontend_cfg=frontend_cfg or FbankConfig(),
            decoder_cfg=decoder_cfg,
            joiner_cfg=joiner_cfg,
            ctc_cfg=ctc_cfg,
        )
