"""Torch oracle for the streaming LSTM transducer encoder — icefall
lstm_transducer_stateless inference semantics (the family the reference's
``OnlineProjOfLstm.cs`` adapts: per-layer ``state0 [L,B,d_model]`` projected
hidden and ``state1 [L,B,rnn_hidden]`` cell, metadata ``d_model``/
``rnn_hidden_size``, ``OnlineModel.cs:118-129``), reconstructed from the
public icefall source with the module tree named exactly as the export
serializes it, so ``state_dict()`` keys equal export initializer names
(``encoder_embed.conv.N.*``, ``encoder.layers.N.lstm.weight_ih_l0`` /
``weight_hh_l0`` / ``weight_hr_l0`` / ``bias_ih_l0`` / ``bias_hh_l0``,
``feed_forward.N.*``, ``norm_final.*``).

The recurrence is torch's OWN ``nn.LSTM(proj_size=...)`` (ATen kernel:
gates = W_ih x + b_ih + W_hh h + b_hh, gate order i,f,g,o,
h' = W_hr (o * tanh(c'))) — a genuinely independent implementation of
LSTM-with-projection, not a re-derivation of the JAX scan.  Covered
semantics, keyed to the icefall classes:
  * Conv2dSubsampling: shared with the conformer oracle (two stride-2
    VALID 3x3 convs + ReLU, c-major flatten, Linear).
  * RNNEncoderLayer: x += lstm(x); x += feed_forward(x)
    (Linear -> DoubleSwish -> Linear); x = norm_final(x).

Inference-time no-ops (dropout, ActivationBalancer) are omitted.  LSTMs are
causal, so the oracle's offline forward is also the streaming ground truth.
"""

import torch
import torch.nn as nn
from torch import Tensor

from icefall_conformer_oracle import Conv2dSubsampling


class DoubleSwish(nn.Module):
    def forward(self, x: Tensor) -> Tensor:
        return x * torch.sigmoid(x - 1.0)


class RNNEncoderLayer(nn.Module):
    def __init__(self, d_model: int, rnn_hidden: int, ff_dim: int):
        super().__init__()
        self.lstm = nn.LSTM(
            input_size=d_model,
            hidden_size=rnn_hidden,
            num_layers=1,
            batch_first=True,
            proj_size=d_model,
        )
        self.feed_forward = nn.Sequential(
            nn.Linear(d_model, ff_dim), DoubleSwish(), nn.Identity(),
            nn.Linear(ff_dim, d_model),
        )
        self.norm_final = nn.LayerNorm(d_model)

    def forward(self, x: Tensor, state):
        """x: [B, T, D]; state = (h0 [1,B,D], c0 [1,B,H])."""
        lstm_out, new_state = self.lstm(x, state)
        x = x + lstm_out
        x = x + self.feed_forward(x)
        return self.norm_final(x), new_state


class OracleLstm(nn.Module):
    """Module tree named as the export serializes it: ``encoder_embed.*``,
    ``encoder.layers.N.*``."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.encoder_embed = Conv2dSubsampling(cfg.feature_dim, cfg.d_model)
        self.encoder = nn.Module()
        self.encoder.layers = nn.ModuleList(
            RNNEncoderLayer(cfg.d_model, cfg.rnn_hidden_size, cfg.ff_dim)
            for _ in range(cfg.num_layers)
        )

    @torch.no_grad()
    def forward(self, x: Tensor, x_lens: Tensor, states=None):
        """[B, T, F] -> ([B, T', D], out_lens, new_states).

        states: list of (h, c) per layer, or None for zeros.  Because the
        stack is strictly causal, out[:, :out_lens] is identical whether the
        tail is padding or real audio.
        """
        b = x.shape[0]
        h = self.encoder_embed(x)
        out_lens = torch.div(
            torch.div(x_lens - 1, 2, rounding_mode="floor") - 1, 2,
            rounding_mode="floor",
        )
        if states is None:
            states = [
                (
                    torch.zeros(1, b, self.cfg.d_model),
                    torch.zeros(1, b, self.cfg.rnn_hidden_size),
                )
                for _ in self.encoder.layers
            ]
        new_states = []
        for layer, st in zip(self.encoder.layers, states):
            h, new_st = layer(h, st)
            new_states.append(new_st)
        return h, out_lens, new_states
