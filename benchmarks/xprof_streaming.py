"""xprof trace of the online (streaming) chunk step at saturated lane
count — where does the 93 ms/step at B=64 go?  (r5: offline processes the
same audio-seconds ~30x cheaper, so the streaming step is far from its
compute floor.)

Run:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/xprof_streaming.py [lanes]
"""

from __future__ import annotations

import glob
import os
import sys

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

from bench import synth_pcm


def main(lanes=64):
    from k2transducerasr_tpu.models.zipformer2 import Zipformer2Config
    from k2transducerasr_tpu.runtime.bundle import ModelBundle
    from k2transducerasr_tpu.runtime.online import OnlineRecognizer

    cfg = Zipformer2Config(causal=True, chunk_size=32, left_context_frames=128)
    bundle = ModelBundle.random("zipformer2", cfg, vocab_size=500, seed=0)
    rec = OnlineRecognizer(bundle, max_lanes=lanes)

    windows = np.stack(
        [synth_pcm(rec.window_samples, 3000 + i) for i in range(lanes)]
    )[:, None, :]  # [L, W=1, n]
    windows_i16 = np.clip(windows * 32768.0, -32768, 32767).astype(np.int16)
    windows_d = jnp.asarray(windows_i16)
    wcount_d = jnp.asarray(np.ones((lanes,), np.int32))

    def step():
        rec._enc_state, rec._dec_state, rec._frame_count = rec._step_fn(
            rec._params, rec._fbank_tables, rec._enc_state, rec._dec_state,
            rec._frame_count, windows_d, wcount_d,
        )

    step()  # compile + warm
    jax.block_until_ready(rec._frame_count)
    logdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".cache", "xprof")
    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        step()
        jax.block_until_ready(rec._frame_count)

    planes = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True),
                    key=os.path.getmtime)
    print("xplane:", planes[-1])
    from benchmarks.xplane_parse import main as xmain

    xmain(planes[-1], 25)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
