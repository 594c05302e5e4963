"""Fused Pallas TPU kernel for the fbank frontend.

One kernel fuses the composed windowed-DFT matmul (MXU) -> power -> mel
matmul (MXU) -> log, keeping the [TILE, 2*n_bins] spectrum in VMEM — the
XLA path writes the [B, T, 2*257] spectrum tensor to HBM between the two
matmuls.  Framing (the strided [B, T, frame_len] gather) stays in XLA: it
is cheap and Mosaic's DMA/layout rules make in-kernel overlapped framing
unprofitable (sample rows would need 128-lane / 8-sublane alignment that
10 ms shifts don't have).

Restrictions (fall back to frontend.fbank.fbank_compute otherwise):
dither == 0 (dither would need in-kernel PRNG).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from k2transducerasr_tpu.frontend.fbank import (
    FbankConfig,
    _matrices_cached,
    frame_indices,
)

TILE = 256  # frames per grid step (256x400 @ 400x514 — MXU-shaped)


def supported(cfg: FbankConfig) -> bool:
    return cfg.dither == 0.0


def _kernel(frames_ref, dft_ref, mel_ref, out_ref, *, cfg: FbankConfig, eps: float):
    frames = frames_ref[0] * cfg.input_scale  # [TILE, frame_len]
    spec = jnp.dot(
        frames,
        dft_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [TILE, 2*n_bins] — stays in VMEM
    n_bins = spec.shape[1] // 2
    power = spec[:, :n_bins] ** 2 + spec[:, n_bins:] ** 2
    if not cfg.use_power:
        power = jnp.sqrt(jnp.maximum(power, 0.0))
    feats = jnp.dot(
        power,
        mel_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [TILE, n_mels]
    if cfg.use_log_fbank:
        feats = jnp.log(jnp.maximum(feats, eps))
    out_ref[0] = feats


@functools.partial(jax.jit, static_argnames=("cfg", "num_frames"))
def fbank_pallas(samples, cfg: FbankConfig, num_frames: int, n_valid=None,
                 tables=None):
    """samples: [B, N] float32 -> feats [B, num_frames_padded, n_mels],
    num_frames_padded = ceil(num_frames / TILE) * TILE.

    tables: optional (dft, mel) device arrays from ``fbank_matrices`` —
    production jitted paths MUST pass these as arguments (embedded as
    program constants they ride in the executable image and degrade
    host<->device transfers through the axon tunnel; see frontend.fbank).
    """
    import numpy as np

    if not supported(cfg):
        raise ValueError("config not supported by the pallas fbank kernel")
    dft, mel = tables if tables is not None else _matrices_cached(cfg)
    dft = jnp.asarray(dft)
    mel = jnp.asarray(mel)
    b, n = samples.shape
    tiles = -(-num_frames // TILE)
    t_pad = tiles * TILE

    idx = frame_indices(t_pad, cfg)  # [T_pad, L]
    if cfg.snip_edges:
        need = (t_pad - 1) * cfg.frame_shift + cfg.frame_length
        if n < need:
            samples = jnp.pad(samples, ((0, 0), (0, need - n)))
        frames = samples[:, idx]
    else:
        from k2transducerasr_tpu.frontend.fbank import _reflect

        if n_valid is None:
            n_valid = jnp.full((b,), n, jnp.int32)
        ridx = jnp.clip(_reflect(idx, n_valid), 0, n - 1)
        frames = jnp.take_along_axis(
            samples[:, None, :], ridx.reshape(b, -1)[:, None, :], axis=2
        ).reshape(b, t_pad, -1)

    eps = float(np.finfo(np.float32).eps)
    out = pl.pallas_call(
        functools.partial(_kernel, cfg=cfg, eps=eps),
        grid=(b, tiles),
        in_specs=[
            pl.BlockSpec(
                (1, TILE, cfg.frame_length),
                lambda b_, j_: (b_, j_, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(dft.shape, lambda b_, j_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(mel.shape, lambda b_, j_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE, cfg.num_mel_bins), lambda b_, j_: (b_, j_, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, cfg.num_mel_bins), jnp.float32),
    )(frames, dft, mel)
    return out
