"""Literal per-frame numpy implementation of kaldi fbank (the oracle).

This mirrors kaldi-native-fbank's computation step by step (dither ->
DC-offset removal -> preemphasis -> window -> zero-pad -> rFFT -> power ->
mel -> log) so the framework's composed-matmul implementation
(k2transducerasr_tpu/frontend/fbank.py) can be validated against it.
Deliberately slow and explicit.
"""

import numpy as np

from k2transducerasr_tpu.frontend.fbank import (
    FbankConfig,
    mel_banks,
    num_frames_for,
)


def _window_np(cfg: FbankConfig) -> np.ndarray:
    n = cfg.frame_length
    a = 2.0 * np.pi / (n - 1)
    i = np.arange(n)
    if cfg.window_type == "hanning":
        return 0.5 - 0.5 * np.cos(a * i)
    if cfg.window_type == "hamming":
        return 0.54 - 0.46 * np.cos(a * i)
    if cfg.window_type == "povey":
        return (0.5 - 0.5 * np.cos(a * i)) ** 0.85
    if cfg.window_type == "rectangular":
        return np.ones(n)
    if cfg.window_type == "blackman":
        c = cfg.blackman_coeff
        return c - 0.5 * np.cos(a * i) + (0.5 - c) * np.cos(2 * a * i)
    raise ValueError(cfg.window_type)


def fbank_reference(samples: np.ndarray, cfg: FbankConfig) -> np.ndarray:
    x = np.asarray(samples, dtype=np.float64) * cfg.input_scale
    t = num_frames_for(len(x), cfg)
    nfft = cfg.padded_window_size
    mel = mel_banks(cfg)  # [n_bins, M]
    win = _window_np(cfg)
    out = np.zeros((t, cfg.num_mel_bins))
    assert cfg.dither == 0.0, "reference oracle only covers dither=0"
    n = len(x)
    for f in range(t):
        if cfg.snip_edges:
            frame = x[f * cfg.frame_shift : f * cfg.frame_shift + cfg.frame_length].copy()
        else:
            start = f * cfg.frame_shift + cfg.frame_shift // 2 - cfg.frame_length // 2
            idx = np.arange(start, start + cfg.frame_length)
            idx = np.where(idx < 0, -idx - 1, idx)
            idx = np.where(idx >= n, 2 * n - 1 - idx, idx)
            frame = x[idx].copy()
        if cfg.remove_dc_offset:
            frame -= frame.mean()
        if cfg.preemph_coeff != 0.0:
            prev = np.concatenate([[frame[0]], frame[:-1]])
            frame = frame - cfg.preemph_coeff * prev
        frame *= win
        spec = np.fft.rfft(frame, n=nfft)
        power = np.abs(spec) ** 2
        if not cfg.use_power:
            power = np.sqrt(power)
        energies = power @ mel
        if cfg.use_log_fbank:
            energies = np.log(np.maximum(energies, np.finfo(np.float32).eps))
        out[f] = energies
    return out.astype(np.float32)
