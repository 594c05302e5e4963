"""Per-stage profiling of the offline pipeline on the current backend.

Times each stage (fbank, encoder, enc-projection, greedy search) as its own
jitted program, plus the fused end-to-end program, and reports an MFU
estimate from XLA's compiled cost analysis.  Run on the TPU:

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/profile_offline.py

Writes human-readable timings to stdout (this is a diagnostic tool, not the
driver bench — bench.py owns the one-JSON-line contract).
"""

from __future__ import annotations

import os
import sys
import time

os.makedirs(os.path.join(os.path.dirname(__file__), "..", ".cache", "jax"), exist_ok=True)

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".cache", "jax"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from bench import _calibrate_blank_bias, synth_pcm  # noqa: E402
from benchmarks.stages import stage_report  # noqa: E402


def main(batch=16, utt_seconds=30.0, model="zipformer2"):
    from k2transducerasr_tpu.models.zipformer2 import Zipformer2Config
    from k2transducerasr_tpu.runtime.bundle import ModelBundle
    from k2transducerasr_tpu.runtime.offline import OfflineRecognizer

    dev = jax.devices()[0]
    print(f"backend={jax.default_backend()} device={dev.device_kind}")

    cfg = Zipformer2Config()
    bundle = ModelBundle.random(model, cfg, vocab_size=500, seed=0)
    _calibrate_blank_bias(bundle)
    n_param = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(bundle.params))
    print(f"params: {n_param/1e6:.1f}M")

    rec = OfflineRecognizer(bundle)
    fcfg = bundle.frontend_cfg
    n = int(16000 * utt_seconds)
    pcm = np.stack([synth_pcm(n, i) for i in range(batch)])
    pcm16 = np.clip(pcm * 32768.0, -32768, 32767).astype(np.int16)
    counts = np.full((batch,), n, np.int32)

    t_pad = rec.frame_bucket * (-(-((n - fcfg.frame_length) // fcfg.frame_shift + 1) // rec.frame_bucket))
    need = (t_pad - 1) * fcfg.frame_shift + fcfg.frame_length
    samples = np.zeros((batch, need), np.int16)
    samples[:, : pcm16.shape[1]] = pcm16
    samples_d = jnp.asarray(samples)
    counts_d = jnp.asarray(counts)

    stats = stage_report(rec, bundle, samples_d, counts_d, emit=print)
    audio_s = batch * utt_seconds
    t_sum = stats["t_front"] + stats["t_enc"] + stats["t_proj"] + stats["t_search"]
    print(f"sum of stages: {t_sum*1e3:.2f} ms")
    print(f"throughput: {audio_s/stats['t_e2e']:.1f} audio-s/s/chip (batch={batch}, {utt_seconds}s utts)")

    # host path including transfer
    streams = []
    for i in range(batch):
        s = rec.create_offline_stream()
        s.add_samples(pcm[i])
        streams.append(s)
    rec.get_results(streams)
    t0 = time.perf_counter()
    rec.get_results(streams)
    t_host = time.perf_counter() - t0
    print(f"host e2e (incl transfer + text): {t_host*1e3:.2f} ms -> {audio_s/t_host:.1f} audio-s/s")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=30.0)
    args = ap.parse_args()
    main(batch=args.batch, utt_seconds=args.seconds)
