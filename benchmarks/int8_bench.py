"""Head-to-head device-path timing: accuracy='int8' vs bf16 on the
flagship zipformer2 offline program (VERDICT r4 item #4 — the reference's
production mode is int8 ONNX; require the number either way).

Same harness as bench._measure_beam: single dispatch + forced readback on
device-resident int16 samples, min of 3, identical ~25 ms tunnel RTT in
both columns.  Also reports max absolute token-count delta and transcript
equality on the bench audio as the accuracy check.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/int8_bench.py
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

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from bench import _calibrate_blank_bias, synth_pcm


def main(batch=16, utt_seconds=30.0):
    from k2transducerasr_tpu.models.zipformer2 import Zipformer2Config
    from k2transducerasr_tpu.runtime.bundle import ModelBundle
    from k2transducerasr_tpu.runtime.offline import OfflineRecognizer

    print("backend:", jax.default_backend())
    cfg = Zipformer2Config()
    bundle = ModelBundle.random("zipformer2", cfg, vocab_size=500, seed=0)
    _calibrate_blank_bias(bundle)
    fcfg = bundle.frontend_cfg
    n = int(16000 * utt_seconds)

    rec = OfflineRecognizer(bundle)
    t_frames = (n - fcfg.frame_length) // fcfg.frame_shift + 1
    t_pad = rec.frame_bucket * (-(-t_frames // rec.frame_bucket))
    need = (t_pad - 1) * fcfg.frame_shift + fcfg.frame_length
    samples = np.zeros((batch, need), np.int16)
    for i in range(batch):
        x = synth_pcm(n, i)
        samples[i, :n] = np.clip(x * 32768.0, -32768, 32767).astype(np.int16)
    counts_d = jnp.asarray(np.full((batch,), n, np.int32))
    samples_d = jnp.asarray(samples)

    def timed(r):
        out = r._decode_fn(r._params, r._fbank_tables, samples_d, counts_d)
        toks, _, cnt = jax.device_get(out[:3])  # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            c = r._decode_fn(r._params, r._fbank_tables, samples_d, counts_d)[2]
            np.mean(jax.device_get(c))
            ts.append(time.perf_counter() - t0)
        return min(ts), toks, cnt

    t_bf16, tok16, cnt16 = timed(rec)
    rec8 = OfflineRecognizer(bundle, accuracy="int8")
    t_int8, tok8, cnt8 = timed(rec8)

    audio = batch * utt_seconds
    same = sum(
        np.array_equal(tok16[i, : cnt16[i]], tok8[i, : cnt8[i]]) for i in range(batch)
    )
    print(
        f"bf16: {t_bf16*1e3:6.1f} ms/batch = {audio/t_bf16:6.0f} audio-s/s   "
        f"int8: {t_int8*1e3:6.1f} ms/batch = {audio/t_int8:6.0f} audio-s/s   "
        f"(int8/bf16 {t_int8/t_bf16:.2f}x)"
    )
    print(
        f"token-identical lanes: {same}/{batch}; "
        f"token counts bf16 {np.asarray(cnt16).tolist()} vs int8 {np.asarray(cnt8).tolist()}"
    )


if __name__ == "__main__":
    main()
