"""Capture an xprof trace of the offline e2e program and print top HLO ops.

Diagnostic tool (not the driver bench).  Run on the TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/xprof_encoder.py
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

from bench import _calibrate_blank_bias, synth_pcm  # noqa: E402


def main(batch=16, utt_seconds=30.0):
    from k2transducerasr_tpu.models.zipformer2 import Zipformer2Config
    from k2transducerasr_tpu.runtime.bundle import ModelBundle
    from k2transducerasr_tpu.runtime.offline import OfflineRecognizer

    cfg = Zipformer2Config()
    bundle = ModelBundle.random("zipformer2", cfg, vocab_size=500, seed=0)
    _calibrate_blank_bias(bundle)
    rec = OfflineRecognizer(bundle)
    fcfg = bundle.frontend_cfg
    n = int(16000 * utt_seconds)
    t_frames = (n - fcfg.frame_length) // fcfg.frame_shift + 1
    t_pad = rec.frame_bucket * (-(-t_frames // rec.frame_bucket))
    need = (t_pad - 1) * fcfg.frame_shift + fcfg.frame_length
    samples = np.zeros((batch, need), np.int16)
    for i in range(batch):
        x = synth_pcm(n, i)
        samples[i, :n] = np.clip(x * 32768.0, -32768, 32767).astype(np.int16)
    counts = jnp.asarray(np.full((batch,), n, np.int32))
    samples_d = jnp.asarray(samples)

    # warm
    jax.block_until_ready(rec._decode_fn(rec._params, rec._fbank_tables, samples_d, counts))

    logdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".cache", "xprof")
    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        jax.block_until_ready(rec._decode_fn(rec._params, rec._fbank_tables, samples_d, counts))

    planes = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True),
                    key=os.path.getmtime)
    print("xplane:", planes[-1])
    # direct xplane parse — the tensorboard_plugin_profile CSV converter
    # cannot load in this image (protobuf generated-code version clash)
    from benchmarks.xplane_parse import main as xmain

    xmain(planes[-1], 25)


if __name__ == "__main__":
    main()
