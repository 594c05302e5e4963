"""Kaldi-compatible log-mel filterbank frontend, TPU-native.

Replaces the reference's native kaldi-native-fbank dependency
(``WavFrontend.cs:22-29`` wrapping ManySpeech.SpeechFeatures): 25 ms frames,
10 ms shift, dither, DC-offset removal, preemphasis 0.97, configurable window
(hamming default per ``Model/FrontendConfEntity.cs``), zero-pad to 512, power
spectrum, 80 triangular mel filters on [20 Hz, Nyquist], natural log with
float-epsilon floor, ``snip_edges`` streaming semantics.

TPU-first design — NOT a port of the per-frame C++ loops: with dither == 0
every per-frame op before the power spectrum (DC removal, preemphasis,
windowing, zero-padded rDFT) is *linear* in the frame, so the whole chain is
pre-composed into one ``[frame_len, 2*(nfft//2+1)]`` matrix ``A``:

    power[k] = (x @ A)[k]^2 + (x @ A)[k + n_bins]^2
    fbank    = log(max(power @ Mel, eps))

i.e. framing-gather -> one MXU matmul -> VPU square/add -> one MXU matmul ->
log.  XLA fuses the elementwise stages into the matmuls; there is no FFT
butterfly and no host round trip.  (A fused Pallas kernel for the same
contraction was built and measured in round 4 — identical speed to this XLA
path at bench shapes, so it was removed; finding recorded in BASELINE.md.)
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

_EPS = float(np.finfo(np.float32).eps)  # kaldi's energy floor for log


@dataclasses.dataclass(frozen=True)
class FbankConfig:
    """Mirrors the reference's FrontendConfEntity + kaldi frame options.

    ``window_type`` default "hamming" per ``Model/FrontendConfEntity.cs:10``
    ("hanning" is forced for whisper features, ``OfflineStream.cs:27-32``).
    ``input_scale`` lets callers feed [-1,1] floats (icefall/lhotse-trained
    models) or request kaldi's int16 scaling.
    """

    sample_rate: int = 16000
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    num_mel_bins: int = 80
    window_type: str = "hamming"  # povey | hamming | hanning | rectangular | blackman
    dither: float = 0.0
    preemph_coeff: float = 0.97
    remove_dc_offset: bool = True
    round_to_power_of_two: bool = True
    snip_edges: bool = True
    low_freq: float = 20.0
    high_freq: float = 0.0  # <=0 means Nyquist + high_freq
    use_power: bool = True
    use_log_fbank: bool = True
    blackman_coeff: float = 0.42
    input_scale: float = 1.0

    @property
    def frame_length(self) -> int:
        return int(self.sample_rate * self.frame_length_ms / 1000.0)

    @property
    def frame_shift(self) -> int:
        return int(self.sample_rate * self.frame_shift_ms / 1000.0)

    @property
    def padded_window_size(self) -> int:
        n = self.frame_length
        if self.round_to_power_of_two:
            p = 1
            while p < n:
                p *= 2
            return p
        return n

    @classmethod
    def whisper(cls, sample_rate: int = 16000) -> "FbankConfig":
        """The reference's whisper special-case: hanning window, 80 mels,
        snip_edges=False (OfflineStream.cs:27-32)."""
        return cls(
            sample_rate=sample_rate,
            window_type="hanning",
            num_mel_bins=80,
            snip_edges=False,
        )


def num_frames_for(num_samples: int, cfg: FbankConfig) -> int:
    """Frame count under snip_edges semantics (kaldi NumFrames)."""
    fl, fs = cfg.frame_length, cfg.frame_shift
    if cfg.snip_edges:
        if num_samples < fl:
            return 0
        return 1 + (num_samples - fl) // fs
    return (num_samples + fs // 2) // fs


def num_frames_jnp(num_samples, cfg: FbankConfig):
    """Traced-array version of ``num_frames_for`` (for use inside jit)."""
    fl, fs = cfg.frame_length, cfg.frame_shift
    if cfg.snip_edges:
        return jnp.where(num_samples < fl, 0, 1 + (num_samples - fl) // fs)
    return (num_samples + fs // 2) // fs


def _window(cfg: FbankConfig) -> np.ndarray:
    n = cfg.frame_length
    a = 2.0 * math.pi / (n - 1)
    i = np.arange(n, dtype=np.float64)
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
    raise ValueError(f"unknown window type {cfg.window_type!r}")


def mel_scale(f):
    return 1127.0 * np.log(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_banks(cfg: FbankConfig) -> np.ndarray:
    """Kaldi MelBanks: triangular filters in mel space over fft bins
    ``0 .. nfft/2 - 1`` (the Nyquist bin is never covered).  Returns
    ``[nfft//2 + 1, num_mel_bins]`` with a zero Nyquist row."""
    nfft = cfg.padded_window_size
    n_bins = nfft // 2 + 1
    high_freq = cfg.high_freq if cfg.high_freq > 0 else cfg.sample_rate / 2.0 + cfg.high_freq
    mel_low, mel_high = mel_scale(cfg.low_freq), mel_scale(high_freq)
    delta = (mel_high - mel_low) / (cfg.num_mel_bins + 1)
    fft_freqs = np.arange(n_bins, dtype=np.float64) * (cfg.sample_rate / nfft)
    mel_f = mel_scale(fft_freqs)

    out = np.zeros((n_bins, cfg.num_mel_bins), dtype=np.float64)
    for m in range(cfg.num_mel_bins):
        left = mel_low + m * delta
        center, right = left + delta, left + 2 * delta
        up = (mel_f - left) / (center - left)
        down = (right - mel_f) / (right - center)
        w = np.maximum(0.0, np.minimum(up, down))
        out[:, m] = w
    out[nfft // 2, :] = 0.0  # kaldi never reads the Nyquist bin
    return out


@functools.lru_cache(maxsize=8)
def _matrices_cached(cfg: FbankConfig):
    return _build_matrices(cfg)


def _build_matrices(cfg: FbankConfig):
    """Pre-compose DC-removal, preemphasis, window, and padded rDFT into a
    single real matrix ``A [frame_len, 2*n_bins]`` (cos block | sin block)."""
    n = cfg.frame_length
    nfft = cfg.padded_window_size
    n_bins = nfft // 2 + 1

    m = np.eye(n, dtype=np.float64)
    if cfg.remove_dc_offset:
        m = m - np.full((n, n), 1.0 / n)
    if cfg.preemph_coeff != 0.0:
        p = np.eye(n, dtype=np.float64)
        idx = np.arange(1, n)
        p[idx, idx - 1] = -cfg.preemph_coeff
        p[0, 0] = 1.0 - cfg.preemph_coeff  # kaldi: x[0] -= coeff * x[0]
        m = p @ m
    m = _window(cfg)[:, None] * m  # diag(window) @ preemph @ dc

    k = np.arange(n_bins, dtype=np.float64)
    t = np.arange(n, dtype=np.float64)
    ang = 2.0 * math.pi * np.outer(t, k) / nfft
    a_cos = m.T @ np.cos(ang)  # [n, n_bins] after composing: (M x)ᵀ C = xᵀ Mᵀ C
    a_sin = m.T @ -np.sin(ang)
    dft = np.concatenate([a_cos, a_sin], axis=1)  # [frame_len, 2*n_bins]

    mel = mel_banks(cfg)  # [n_bins, num_mel_bins]
    # Cache as host numpy (never jnp: a device constant created inside a jit
    # trace would leak a tracer through the lru_cache).
    return dft.astype(np.float32), mel.astype(np.float32)


def fbank_matrices(cfg: FbankConfig):
    """Public accessor for the composed (dft, mel) matrices."""
    return _matrices_cached(cfg)


def frame_indices(num_frames: int, cfg: FbankConfig) -> jnp.ndarray:
    """Gather index matrix [num_frames, frame_len].

    snip_edges=True: frame t covers [t*shift, t*shift + frame_len).
    snip_edges=False: frame t is centered at t*shift + shift/2 (kaldi
    semantics); out-of-range indices are produced raw and must be reflected
    against the true sample count (see ``_reflect``).

    Built from traced ``jnp.arange`` (iota) on purpose: a host-precomputed
    [T, L] index table would be embedded in the compiled program as a
    multi-MB constant, and executables carrying large constants degrade
    every subsequent host<->device transfer through the axon tunnel."""
    starts = jnp.arange(num_frames, dtype=jnp.int32) * cfg.frame_shift
    if not cfg.snip_edges:
        starts = starts + (cfg.frame_shift // 2 - cfg.frame_length // 2)
    offs = jnp.arange(cfg.frame_length, dtype=jnp.int32)
    return starts[:, None] + offs[None, :]


def frame_signal(samples, cfg: FbankConfig, num_frames: int):
    """Overlapped framing WITHOUT a gather (snip_edges only): frame t covers
    [t*shift, t*shift + frame_len), so with ``r = samples.reshape(B, M,
    shift)`` the frame decomposes into ``frame_len // shift`` full panels
    plus a remainder slice — all contiguous slices of one reshape, which XLA
    lowers to layout ops at memory speed.  The [T, L] index-matrix gather
    this replaces was the single most expensive op in the fused decode
    (xprof r4: 7.6 ms of a 52 ms program — XLA serialized it into a
    per-lane dynamic-update-slice loop).  Returns [B, num_frames, frame_len]
    bit-identical to ``samples[:, frame_indices(num_frames, cfg)]`` PROVIDED
    ``n >= (num_frames-1)*shift + frame_length`` (all current callers bucket
    the buffer to satisfy this).  When the buffer is shorter, this path
    ZERO-pads the missing tail samples whereas the gather clamped indices to
    the last sample — callers introducing bucketed ``num_frames`` that
    overrun the buffer must not rely on the old gather-clamp semantics."""
    fs, fl = cfg.frame_shift, cfg.frame_length
    b, n = samples.shape
    n_full, rem = divmod(fl, fs)
    m = num_frames + n_full + (1 if rem else 0)
    if n < m * fs:
        samples = jnp.pad(samples, ((0, 0), (0, m * fs - n)))
    r = samples[:, : m * fs].reshape(b, m, fs)
    parts = [r[:, j : j + num_frames] for j in range(n_full)]
    if rem:
        parts.append(r[:, n_full : n_full + num_frames, :rem])
    return jnp.concatenate(parts, axis=-1)


def _reflect(idx, n_valid):
    """Kaldi boundary reflection: s<0 -> -s-1;  s>=n -> 2n-1-s.
    idx: [T, L] int32; n_valid: [B] -> [B, T, L]."""
    idx = jnp.where(idx < 0, -idx - 1, idx)
    n = n_valid[:, None, None]
    idx = jnp.broadcast_to(idx[None], (n_valid.shape[0], *idx.shape))
    idx = jnp.where(idx >= n, 2 * n - 1 - idx, idx)
    return jnp.clip(idx, 0, None)


def fbank_compute(samples, cfg: FbankConfig, num_frames: int, dither_key=None, n_valid=None,
                  tables=None):
    """Pure fbank over a sample window — composable inside larger jitted
    programs (the online chunk step fuses this with encoder + search).

    samples: [B, N] float32 (N >= (num_frames-1)*shift + frame_length).
    n_valid: [B] true sample counts — REQUIRED when snip_edges=False (frame
    centering reflects at the true signal boundaries).
    tables: optional (dft, mel) pair from ``fbank_matrices``.  Production
    jitted paths MUST pass these as device-resident arguments: embedded as
    program constants (the default) they ride in the executable image, and
    large-constant executables degrade all later host<->device transfers
    through the axon tunnel.
    Returns feats [B, num_frames, num_mel_bins].
    """
    dft, mel = tables if tables is not None else _matrices_cached(cfg)
    x = samples * cfg.input_scale
    if cfg.snip_edges:
        frames = frame_signal(x, cfg, num_frames)  # slice+concat, no gather
    else:
        idx = frame_indices(num_frames, cfg)  # [T, L]
        if n_valid is None:
            n_valid = jnp.full((samples.shape[0],), samples.shape[1], jnp.int32)
        ridx = _reflect(idx, n_valid)  # [B, T, L]
        ridx = jnp.clip(ridx, 0, samples.shape[1] - 1)
        frames = jnp.take_along_axis(x[:, None, :], ridx.reshape(x.shape[0], -1)[:, None, :], axis=2)
        frames = frames.reshape(x.shape[0], *idx.shape)
    if cfg.dither > 0.0:
        if dither_key is None:
            dither_key = jax.random.PRNGKey(0)
        noise = jax.random.normal(dither_key, frames.shape, dtype=frames.dtype)
        frames = frames + cfg.dither * noise
    # precision=HIGHEST: feature extraction must be f32-exact on the MXU
    # (default TPU matmul precision is bf16 and costs ~0.1 log-mel error)
    spec = jnp.einsum(
        "btl,lk->btk",
        frames,
        dft,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    n_bins = dft.shape[1] // 2
    power = spec[..., :n_bins] ** 2 + spec[..., n_bins:] ** 2
    if not cfg.use_power:
        power = jnp.sqrt(jnp.maximum(power, 0.0))
    feats = jnp.einsum(
        "btk,km->btm",
        power,
        mel,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if cfg.use_log_fbank:
        feats = jnp.log(jnp.maximum(feats, _EPS))
    return feats


@functools.partial(jax.jit, static_argnames=("cfg", "num_frames"))
def _fbank_impl(samples, n_valid, cfg: FbankConfig, num_frames: int, dither_key):
    """Jitted batch entry.  Frames past a stream's valid count are garbage —
    callers mask with ``num_frames_for``."""
    return fbank_compute(samples, cfg, num_frames, dither_key, n_valid)


class FbankExtractor:
    """Batched whole-buffer fbank computation.

    Pads the frame axis to a bucket size so XLA compiles once per bucket, not
    once per utterance length.
    """

    BUCKET = 64  # frames (= 0.64 s of audio) — keeps recompiles rare

    def __init__(self, cfg: FbankConfig):
        self.cfg = cfg

    def __call__(self, samples: np.ndarray, n_valid=None, key=None):
        """samples: [B, N] or [N] float32 -> (feats [B, T, M], n_frames [B])."""
        cfg = self.cfg
        squeeze = samples.ndim == 1
        if squeeze:
            samples = samples[None, :]
        b, n = samples.shape
        if n_valid is None:
            n_valid = np.full((b,), n, dtype=np.int32)
        n_frames = np.array([num_frames_for(int(v), cfg) for v in n_valid], dtype=np.int32)
        t_max = int(n_frames.max(initial=0))
        t_pad = max(self.BUCKET, -(-t_max // self.BUCKET) * self.BUCKET)
        # Pin the sample axis to the bucket-determined length so the jitted
        # shape depends only on the frame bucket (otherwise every distinct
        # buffer length triggers a recompile — measured 85 s of compiles for
        # a 2 s utterance fed in 800-sample chunks).
        need = (t_pad - 1) * cfg.frame_shift + cfg.frame_length
        if n < need:
            samples = np.pad(samples, ((0, 0), (0, need - n)))
        elif n > need:
            samples = samples[:, :need]
        if key is None:
            key = jax.random.PRNGKey(0)
        feats = _fbank_impl(
            jnp.asarray(samples, dtype=jnp.float32),
            jnp.asarray(n_valid),
            cfg,
            t_pad,
            key,
        )
        if squeeze:
            return feats[0], int(n_frames[0])
        return feats, n_frames


class OnlineFbank:
    """Streaming fbank with kaldi online semantics — the TPU-side equivalent
    of the reference's native ``OnlineFbank`` (``WavFrontend.cs:22-41``).

    Host keeps only a small sample ring-buffer; frames are produced in
    batches on device.  ``input_finished()`` drops any partial tail frame
    (snip_edges=True), matching kaldi's online extractor.
    """

    def __init__(self, cfg: FbankConfig):
        if not cfg.snip_edges:
            raise ValueError(
                "streaming fbank requires snip_edges=True (whisper-style "
                "centered framing reflects at utterance boundaries, which "
                "are unknown while streaming — reference uses it offline "
                "only, OfflineStream.cs:27-32)"
            )
        self.cfg = cfg
        self._buf = np.zeros(0, dtype=np.float32)
        self._finished = False
        self._extractor = FbankExtractor(cfg)

    def accept_waveform(self, samples: np.ndarray) -> np.ndarray:
        """Append samples; return all newly completed frames [T_new, M]."""
        if self._finished:
            raise RuntimeError("accept_waveform after input_finished")
        self._buf = np.concatenate([self._buf, np.asarray(samples, np.float32)])
        return self._drain()

    def input_finished(self) -> np.ndarray:
        self._finished = True
        return self._drain()

    def _drain(self) -> np.ndarray:
        cfg = self.cfg
        t = num_frames_for(len(self._buf), cfg)
        if t == 0:
            return np.zeros((0, cfg.num_mel_bins), dtype=np.float32)
        feats, _ = self._extractor(self._buf)
        out = np.asarray(feats[:t])
        consumed = t * cfg.frame_shift
        self._buf = self._buf[consumed:]
        return out
