"""Multi-chip scaling-efficiency benchmark (BASELINE north-star: >=85%
efficiency at N>=2).

Runs the TP+DP-sharded offline decode step over meshes of 1, 2, 4, ...
devices and reports throughput + efficiency.  On this single-chip
environment it runs on virtual CPU devices (set
``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORM_NAME=cpu``)
— which validates the sharding program but NOT real ICI performance; on a
pod slice the same script measures the real thing.

  python benchmarks/scaling.py [--max-devices 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-devices", type=int, default=0)
    ap.add_argument("--per-device-batch", type=int, default=2)
    ap.add_argument("--seconds", type=float, default=8.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from k2transducerasr_tpu.decode import rnnt_greedy
    from k2transducerasr_tpu.models import joiner as joiner_mod
    from k2transducerasr_tpu.models.zipformer2 import Zipformer2Config
    from k2transducerasr_tpu.parallel import sharding as sh
    from k2transducerasr_tpu.runtime.bundle import ModelBundle

    n_avail = len(jax.devices())
    n_max = min(args.max_devices or n_avail, n_avail)

    cfg = Zipformer2Config(
        num_encoder_layers=(1, 1, 1),
        encoder_dims=(128, 192, 256),
        downsampling_factors=(1, 2, 4),
        num_heads=(4, 4, 4),
        feedforward_dims=(256, 384, 512),
        cnn_module_kernels=(15, 15, 15),
    )
    bundle = ModelBundle.random("zipformer2", cfg, vocab_size=500, seed=0)
    enc_mod, enc_cfg, dec_cfg = bundle.encoder, bundle.encoder_cfg, bundle.decoder_cfg
    t_frames = int(args.seconds * 100)

    def run(n_dev: int) -> float:
        mesh = sh.make_mesh(n_dev, 1, devices=jax.devices()[:n_dev])
        params = sh.shard_params(bundle.params, mesh)
        batch = n_dev * args.per_device_batch
        feats = jax.device_put(
            jnp.zeros((batch, t_frames, 80), jnp.float32), sh.batch_sharding(mesh)
        )
        lens = jax.device_put(
            jnp.full((batch,), t_frames, jnp.int32), sh.batch_sharding(mesh)
        )

        @jax.jit
        def step(params, feats, lens):
            enc_out, enc_lens = enc_mod.forward(params["encoder"], enc_cfg, feats, lens, None)
            enc_proj = joiner_mod.project_encoder(params["joiner"], enc_out)
            st = rnnt_greedy.init_state(params["decoder"], dec_cfg, params["joiner"], batch, 256)
            fin = rnnt_greedy.greedy_frames(
                params["decoder"], dec_cfg, params["joiner"], st, enc_proj, enc_lens,
                jnp.zeros((batch,), jnp.int32), False, None,
            )
            return fin.count

        out = step(params, feats, lens)
        jax.block_until_ready(out)
        best = 1e30
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(step(params, feats, lens))
            best = min(best, time.time() - t0)
        return batch * args.seconds / best  # audio-s/s

    results = {}
    n = 1
    while n <= n_max:
        results[n] = run(n)
        n *= 2
    base = results[1]
    print(
        json.dumps(
            {
                "throughput_audio_s_per_s": {str(k): round(v, 1) for k, v in results.items()},
                "scaling_efficiency": {
                    str(k): round(v / (base * k), 3) for k, v in results.items()
                },
                "backend": jax.default_backend(),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
