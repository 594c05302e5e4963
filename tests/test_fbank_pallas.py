"""Pallas fbank kernel parity vs the XLA composed-matmul path.

Runs in interpreter mode on CPU (tests force the CPU backend); the same
kernel compiles natively on TPU (exercised by bench/drives).
"""

import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from k2transducerasr_tpu.frontend.fbank import FbankConfig, FbankExtractor
from k2transducerasr_tpu.ops import fbank_pallas as fp


def _speech(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    return (0.3 * np.sin(2 * np.pi * 300 * t) + 0.05 * rng.standard_normal(n)).astype(
        np.float32
    )


def test_supported_gate():
    assert fp.supported(FbankConfig())
    assert fp.supported(FbankConfig(snip_edges=False))  # whisper-style OK
    assert not fp.supported(FbankConfig(dither=1.0))


@pytest.mark.parametrize("t_frames", [128, 256])
def test_matches_xla_path(t_frames):
    cfg = FbankConfig()
    n = (t_frames - 1) * cfg.frame_shift + cfg.frame_length
    x = np.stack([_speech(n, 1), _speech(n, 2)])
    want, counts = FbankExtractor(cfg)(x)
    with pltpu.force_tpu_interpret_mode():
        got = fp.fbank_pallas(x, cfg, t_frames)
    t = int(min(counts))
    np.testing.assert_allclose(
        np.asarray(got)[:, :t], np.asarray(want)[:, :t], rtol=2e-4, atol=2e-3
    )


def test_partial_tile():
    cfg = FbankConfig()
    t_frames = 70  # not a multiple of TILE -> one padded tile
    n = (t_frames - 1) * cfg.frame_shift + cfg.frame_length
    x = _speech(n, 3)[None]
    want, _ = FbankExtractor(cfg)(x)
    with pltpu.force_tpu_interpret_mode():
        got = fp.fbank_pallas(x, cfg, t_frames)
    np.testing.assert_allclose(
        np.asarray(got)[:, :t_frames],
        np.asarray(want)[:, :t_frames],
        rtol=2e-4,
        atol=2e-3,
    )
