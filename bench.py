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


def _calibrate_blank_bias(bundle, blank_frac=0.85):
    """Give the random-weight model realistic emission statistics.

    Trained RNN-T models emit blank on ~85-90%% of frames (a 30 s utterance
    yields ~100 BPE tokens over ~750 output frames); untrained random weights
    emit blank on ~1/vocab of frames, i.e. a token nearly EVERY frame — an
    unrepresentative worst case that overweights the decoder/joiner loop and
    underweights the encoder relative to any production model.  Calibrate by
    raising the joiner's blank output bias to the ``blank_frac`` quantile of
    the (max-over-nonblank − blank) logit gap measured on this bench's own
    audio with the initial decoder state.  Pure bias change — same program,
    same shapes, only the params pytree differs."""
    import jax
    import jax.numpy as jnp

    from k2transducerasr_tpu.decode import rnnt_greedy
    from k2transducerasr_tpu.frontend.fbank import fbank_compute, num_frames_jnp
    from k2transducerasr_tpu.models import joiner as joiner_mod

    fcfg = bundle.frontend_cfg
    n = int(16000 * 4.0)
    pcm_host = np.stack([synth_pcm(n, 1000 + i) for i in range(4)])
    from k2transducerasr_tpu.frontend.fbank import fbank_matrices

    tables = tuple(jnp.asarray(m) for m in fbank_matrices(fcfg))

    # pcm and the fbank tables are ARGUMENTS, not closure constants: a jitted
    # program carrying multi-MB constants permanently degrades later
    # host<->device transfers through the axon tunnel (measured 15.7 MB H2D:
    # ~11 ms clean vs ~350 ms once such a program has run)
    @jax.jit
    def probe(params, tables, pcm):
        t_pad = (n - fcfg.frame_length) // fcfg.frame_shift + 1
        lens = jnp.full((pcm.shape[0],), n, jnp.int32)
        feats = fbank_compute(pcm, fcfg, t_pad, n_valid=lens, tables=tables)
        enc_out, _ = bundle.encoder.forward(
            params["encoder"], bundle.encoder_cfg, feats,
            num_frames_jnp(lens, fcfg), jnp.bfloat16,
        )
        enc_proj = joiner_mod.project_encoder(params["joiner"], enc_out, jnp.bfloat16)
        st = rnnt_greedy.init_state(
            params["decoder"], bundle.decoder_cfg, params["joiner"], pcm.shape[0]
        )
        logits = joiner_mod.joint_logits(
            params["joiner"], enc_proj, st.dec_proj[:, None, :], jnp.bfloat16
        ).astype(jnp.float32)
        blank = bundle.decoder_cfg.blank_id
        nonblank = logits.at[..., blank].set(-jnp.inf)
        gap = jnp.max(nonblank, axis=-1) - logits[..., blank]
        return jnp.quantile(gap.reshape(-1), blank_frac)

    bias = float(jax.device_get(probe(bundle.params, tables, jnp.asarray(pcm_host))))
    b = bundle.params["joiner"]["output"]["b"]
    bundle.params["joiner"]["output"]["b"] = b.at[bundle.decoder_cfg.blank_id].add(
        bias + 1e-3
    )
    log(f"blank-bias calibration: +{bias:.3f} (target {blank_frac:.0%} blank frames)")


def main():
    from k2transducerasr_tpu.models.zipformer2 import Zipformer2Config
    from k2transducerasr_tpu.runtime.bundle import ModelBundle
    from k2transducerasr_tpu.runtime.offline import OfflineRecognizer

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    utt_seconds = 30.0
    batch = 16
    cfg = Zipformer2Config()  # icefall-default medium zipformer2 (~16 layers)
    bundle = ModelBundle.random("zipformer2", cfg, vocab_size=500, seed=0)
    _calibrate_blank_bias(bundle)
    rec = OfflineRecognizer(bundle)  # bf16 compute

    n = int(16000 * utt_seconds)
    streams = []
    for i in range(batch):
        s = rec.create_offline_stream()
        s.add_samples(synth_pcm(n, i))
        streams.append(s)

    t0 = time.time()
    res = rec.get_results(streams)
    log(f"warmup (incl compile): {time.time() - t0:.1f}s")
    toks = sum(len(r.tokens) for r in res) / len(res)
    log(f"emissions: {toks:.0f} tokens/utt ({toks / utt_seconds:.1f}/audio-s)")

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
