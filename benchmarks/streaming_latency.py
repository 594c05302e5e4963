"""Streaming chunk-latency benchmark: p50/p95 per-chunk wall time and
streaming RTF on the flagship causal zipformer2 (BASELINE north-star
"streaming p50 latency").

  python benchmarks/streaming_latency.py [--lanes 4] [--seconds 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--model-dir", default="")
    args = ap.parse_args()

    import time

    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache", "jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from k2transducerasr_tpu.models.zipformer2 import Zipformer2Config
    from k2transducerasr_tpu.runtime.bundle import ModelBundle
    from k2transducerasr_tpu.runtime.online import OnlineRecognizer

    if args.model_dir:
        bundle = ModelBundle.from_dir(args.model_dir)
    else:
        cfg = Zipformer2Config(causal=True, chunk_size=32, left_context_frames=128)
        bundle = ModelBundle.random("zipformer2", cfg, vocab_size=500, seed=0)
    rec = OnlineRecognizer(bundle, max_lanes=args.lanes)

    rng = np.random.default_rng(0)
    n = int(16000 * args.seconds)
    t = np.arange(n) / 16000.0
    streams = []
    for i in range(args.lanes):
        s = rec.create_online_stream()
        s.add_samples(
            (0.3 * np.sin(2 * np.pi * (200 + 50 * i) * t)
             + 0.05 * rng.standard_normal(n)).astype(np.float32)
        )
        streams.append(s)

    # warmup/compile
    rec.get_results(streams)
    lat = []
    while any(s._ready() for s in streams):
        t0 = time.time()
        rec.get_results(streams)
        lat.append(time.time() - t0)
    lat_ms = np.array(lat) * 1000
    chunk_s = rec.hop_samples / bundle.frontend_cfg.sample_rate
    print(
        json.dumps(
            {
                "p50_chunk_ms": round(float(np.percentile(lat_ms, 50)), 2),
                "p95_chunk_ms": round(float(np.percentile(lat_ms, 95)), 2),
                "chunk_audio_ms": round(chunk_s * 1000, 1),
                "streaming_rtf": round(float(np.percentile(lat_ms, 50)) / 1000 / chunk_s, 4),
                "lanes": args.lanes,
                "chunks": len(lat),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
