"""Benchmark: offline audio-seconds/s/chip on the flagship Zipformer2.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's best published number — offline RTF 0.0455 on an
i7-10750H (README.EN.md:102-104) = 21.97 audio-seconds/s (BASELINE.md).

Measures the FULL public path (fbank -> encoder -> joiner-hoisted greedy ->
text) through OfflineRecognizer on a batch of 30 s utterances, warm (the
XLA compilation cache under .cache/jax makes compiles a one-time cost).
Extra diagnostics (streaming p50 chunk latency) go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.makedirs(os.path.join(os.path.dirname(__file__) or ".", ".cache", "jax"), exist_ok=True)

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache", "jax"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

REFERENCE_AUDIO_S_PER_S = 23.34 / 1.06228  # 21.97, README.EN.md:102-104


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def synth_pcm(n, seed):
    t = np.arange(n) / 16000.0
    rng = np.random.default_rng(seed)
    return (
        0.25 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 523 * t + 1.0)
        + 0.05 * rng.standard_normal(n)
    ).astype(np.float32)


def main():
    from k2transducerasr_tpu.models.zipformer2 import Zipformer2Config
    from k2transducerasr_tpu.runtime.bundle import ModelBundle
    from k2transducerasr_tpu.runtime.offline import OfflineRecognizer

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    utt_seconds = 30.0
    batch = 16
    cfg = Zipformer2Config()  # icefall-default medium zipformer2 (~16 layers)
    bundle = ModelBundle.random("zipformer2", cfg, vocab_size=500, seed=0)
    rec = OfflineRecognizer(bundle)  # bf16 compute

    n = int(16000 * utt_seconds)
    streams = []
    for i in range(batch):
        s = rec.create_offline_stream()
        s.add_samples(synth_pcm(n, i))
        streams.append(s)

    t0 = time.time()
    rec.get_results(streams)
    log(f"warmup (incl compile): {time.time() - t0:.1f}s")

    times = []
    for _ in range(3):
        t0 = time.time()
        rec.get_results(streams)
        times.append(time.time() - t0)
    best = min(times)
    audio_s = batch * utt_seconds
    value = audio_s / best
    log(f"runs: {[round(t, 3) for t in times]} -> {value:.1f} audio-s/s/chip")

    print(
        json.dumps(
            {
                "metric": "offline_audio_seconds_per_second_per_chip",
                "value": round(value, 2),
                "unit": "audio-s/s/chip",
                "vs_baseline": round(value / REFERENCE_AUDIO_S_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
