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

# v5e peak: 197 TFLOP/s bf16 (394 int8), ~819 GB/s HBM
PEAK_FLOPS = {"tpu v5 lite": 197e12}


def timeit(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def flops_of(fn, *args):
    try:
        c = jax.jit(fn).lower(*args).compile()
        an = c.cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return float(an.get("flops", 0.0)), float(an.get("bytes accessed", 0.0))
    except Exception as e:  # pragma: no cover - diagnostic only
        print(f"  cost_analysis failed: {e}")
        return 0.0, 0.0


def main(batch=16, utt_seconds=30.0, model="zipformer2"):
    from k2transducerasr_tpu.decode import rnnt_greedy
    from k2transducerasr_tpu.frontend.fbank import fbank_compute, num_frames_jnp
    from k2transducerasr_tpu.models import joiner as joiner_mod
    from k2transducerasr_tpu.models.zipformer2 import Zipformer2Config
    from k2transducerasr_tpu.runtime.bundle import ModelBundle
    from k2transducerasr_tpu.runtime.offline import OfflineRecognizer

    dev = jax.devices()[0]
    print(f"backend={jax.default_backend()} device={dev.device_kind}")
    peak = PEAK_FLOPS.get(dev.device_kind.lower(), 197e12)

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

    # -- stage 1: fbank (tables as args — closure device constants poison
    # later tunnel transfers)
    def front(tables, samples, counts):
        x = samples.astype(jnp.float32) * (1.0 / 32768.0)
        t = (x.shape[1] - fcfg.frame_length) // fcfg.frame_shift + 1
        feats = fbank_compute(x, fcfg, t, n_valid=counts, tables=tables)
        return feats, num_frames_jnp(counts, fcfg)

    front_j = jax.jit(front)
    t_front = timeit(front_j, rec._fbank_tables, samples_d, counts_d)
    feats, feat_lens = jax.block_until_ready(front_j(rec._fbank_tables, samples_d, counts_d))
    fl_front, by_front = flops_of(front, rec._fbank_tables, samples_d, counts_d)
    print(f"fbank:    {t_front*1e3:8.2f} ms  {fl_front/t_front/1e12:6.2f} TF/s  "
          f"{by_front/t_front/1e9:6.1f} GB/s  feats {feats.shape}")

    # -- stage 2: encoder
    enc = bundle.encoder

    def enc_fn(params, feats, feat_lens):
        return enc.forward(params, bundle.encoder_cfg, feats, feat_lens, jnp.bfloat16)

    enc_j = jax.jit(enc_fn)
    t_enc = timeit(enc_j, bundle.params["encoder"], feats, feat_lens)
    enc_out, enc_lens = jax.block_until_ready(enc_j(bundle.params["encoder"], feats, feat_lens))
    fl_enc, by_enc = flops_of(enc_fn, bundle.params["encoder"], feats, feat_lens)
    print(f"encoder:  {t_enc*1e3:8.2f} ms  {fl_enc/t_enc/1e12:6.2f} TF/s  "
          f"{by_enc/t_enc/1e9:6.1f} GB/s  out {enc_out.shape}  MFU {fl_enc/t_enc/peak*100:.1f}%")

    # -- stage 3: encoder projection
    def proj_fn(jp, enc_out):
        return joiner_mod.project_encoder(jp, enc_out, jnp.bfloat16)

    proj_j = jax.jit(proj_fn)
    t_proj = timeit(proj_j, bundle.params["joiner"], enc_out)
    enc_proj = jax.block_until_ready(proj_j(bundle.params["joiner"], enc_out))

    # -- stage 4: greedy search
    dec_cfg = bundle.decoder_cfg

    def search_fn(params, enc_proj, enc_lens):
        st = rnnt_greedy.init_state(params["decoder"], dec_cfg, params["joiner"],
                                    enc_proj.shape[0], 1024, jnp.bfloat16)
        fin = rnnt_greedy.greedy_frames_skip(
            params["decoder"], dec_cfg, params["joiner"], st, enc_proj, enc_lens,
            jnp.zeros((enc_proj.shape[0],), jnp.int32), False, jnp.bfloat16)
        return fin.tokens, fin.count

    search_j = jax.jit(search_fn)
    t_search = timeit(search_j, bundle.params, enc_proj, enc_lens)
    toks, cnt = jax.block_until_ready(search_j(bundle.params, enc_proj, enc_lens))
    print(f"enc_proj: {t_proj*1e3:8.2f} ms")
    print(f"search:   {t_search*1e3:8.2f} ms  tokens/utt {np.mean(np.asarray(cnt)):.0f}")

    # -- fused end-to-end (the production program)
    t_e2e = timeit(rec._decode_fn, rec._params, rec._fbank_tables, samples_d, counts_d)
    fl_e2e, by_e2e = flops_of(
        lambda p, tb, s, c: rec._decode_fn.__wrapped__(p, tb, s, c),
        rec._params, rec._fbank_tables, samples_d, counts_d,
    )
    audio_s = batch * utt_seconds
    print(f"e2e:      {t_e2e*1e3:8.2f} ms  {fl_e2e/t_e2e/1e12:6.2f} TF/s  "
          f"{by_e2e/t_e2e/1e9:6.1f} GB/s  MFU {fl_e2e/t_e2e/peak*100:.1f}%")
    print(f"sum of stages: {(t_front+t_enc+t_proj+t_search)*1e3:.2f} ms")
    print(f"throughput: {audio_s/t_e2e:.1f} audio-s/s/chip (batch={batch}, {utt_seconds}s utts)")
    # host path including transfer
    rec2 = rec

    class S:  # minimal stream stand-in
        pass

    streams = []
    for i in range(batch):
        s = rec2.create_offline_stream()
        s.add_samples(pcm[i])
        streams.append(s)
    rec2.get_results(streams)
    t0 = time.perf_counter()
    rec2.get_results(streams)
    t_host = time.perf_counter() - t0
    print(f"host e2e (incl transfer + text): {t_host*1e3:.2f} ms -> {audio_s/t_host:.1f} audio-s/s")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=30.0)
    args = ap.parse_args()
    main(batch=args.batch, utt_seconds=args.seconds)
