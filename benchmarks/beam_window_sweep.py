"""Beam-skip window sweep: beam_frames_skip's per-trip joint-logits hoist
is [B,K,W,V]; larger W means fewer while-loop trips but heavier trips.
Times the full offline beam decode (single dispatch + forced readback,
min of 3 — both columns carry the same tunnel RTT) at the bench's
calibrated emission density.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/beam_window_sweep.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

os.makedirs(os.path.join(os.path.dirname(__file__), "..", ".cache", "jax"), exist_ok=True)

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".cache", "jax"),
)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from bench import _calibrate_blank_bias, synth_pcm


def main(batch=16, utt_seconds=30.0):
    from k2transducerasr_tpu.decode import rnnt_beam
    from k2transducerasr_tpu.frontend.fbank import fbank_compute, fbank_matrices, num_frames_jnp
    from k2transducerasr_tpu.models import joiner as joiner_mod
    from k2transducerasr_tpu.models.zipformer2 import Zipformer2Config
    from k2transducerasr_tpu.runtime.bundle import ModelBundle

    print("backend:", jax.default_backend())
    cfg = Zipformer2Config()
    bundle = ModelBundle.random("zipformer2", cfg, vocab_size=500, seed=0)
    _calibrate_blank_bias(bundle)
    fcfg = bundle.frontend_cfg
    n = int(16000 * utt_seconds)
    pcm = np.stack([synth_pcm(n, i) for i in range(batch)])
    tables = tuple(jnp.asarray(m) for m in fbank_matrices(fcfg))

    @jax.jit
    def encode(params, tables, pcm):
        t_pad = (n - fcfg.frame_length) // fcfg.frame_shift + 1
        lens = jnp.full((pcm.shape[0],), n, jnp.int32)
        feats = fbank_compute(pcm, fcfg, t_pad, n_valid=lens, tables=tables)
        enc_out, enc_lens = bundle.encoder.forward(
            params["encoder"], bundle.encoder_cfg, feats,
            num_frames_jnp(lens, fcfg), jnp.bfloat16,
        )
        return joiner_mod.project_encoder(params["joiner"], enc_out, jnp.bfloat16), enc_lens

    enc_proj, enc_lens = jax.block_until_ready(
        encode(bundle.params, tables, jnp.asarray(pcm))
    )

    @functools.partial(jax.jit, static_argnames=("w",))
    def beam(params, enc_proj, enc_lens, w):
        st = rnnt_beam.init_state(
            params["decoder"], bundle.decoder_cfg, params["joiner"], batch, 4, 1024,
            jnp.bfloat16,
        )
        final = rnnt_beam.beam_frames_skip(
            params["decoder"], bundle.decoder_cfg, params["joiner"], st,
            enc_proj, enc_lens, jnp.zeros((batch,), jnp.int32), False,
            jnp.bfloat16, window=w,
        )
        return rnnt_beam.best_beam(final)

    for w in (32, 48, 64, 96, 128):
        toks, _, cnt = beam(bundle.params, enc_proj, enc_lens, w)  # compile
        c0 = np.mean(jax.device_get(cnt))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            cnt = beam(bundle.params, enc_proj, enc_lens, w)[2]
            np.mean(jax.device_get(cnt))
            ts.append(time.perf_counter() - t0)
        print(f"window {w:4d}: {min(ts)*1e3:7.1f} ms (search only + RTT), "
              f"{c0:.0f} tokens/utt")


if __name__ == "__main__":
    main()
