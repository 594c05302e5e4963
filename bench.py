"""Benchmark: offline audio-seconds/s/chip on the flagship Zipformer2.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's best published number — offline RTF 0.0455 on an
i7-10750H (README.EN.md:102-104) = 21.97 audio-seconds/s (BASELINE.md).

Measures the FULL public path (int16 upload -> fbank -> encoder ->
joiner-hoisted greedy -> text) through OfflineRecognizer on batches of 30 s
utterances, sustained with a 2-deep begin/end pipeline so batch k+1's host
prep + upload overlaps batch k's device execution.  Emission density is
calibrated to a realistic 2-3 BPE tokens/audio-s by bisection on the blank
bias (trained RNN-T models emit ~85-90% blank frames; the assert guards the
bench from quietly measuring an unrealistic decode load).

stderr diagnostics: per-stage device timings + MFU, host-path breakdown
(prep/upload/compute/readback), the tunnel-bandwidth roofline, and streaming
p50/p95 chunk latency on the causal zipformer2 (the BASELINE north-star).
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
    """Speech-band test signal.  The chirp + heavier noise matter: a purely
    periodic tone makes encoder frames (near-)identical, so under bf16 the
    per-frame argmaxes tie and flip in large clumps as the calibration bias
    moves — the emission-density bisection then can't land inside its band
    (observed: stuck at 1.40 tokens/audio-s).  Decorrelated frames give the
    bisection a smooth density curve."""
    t = np.arange(n) / 16000.0
    rng = np.random.default_rng(seed)
    f0 = 180.0 + 40.0 * (seed % 7)
    return (
        0.22 * np.sin(2 * np.pi * (f0 + 15.0 * np.sin(2 * np.pi * 0.31 * t)) * t)
        + 0.18 * np.sin(2 * np.pi * (2.37 * f0) * t + 1.0 + 0.8 * np.sin(2 * np.pi * 0.47 * t))
        + 0.12 * rng.standard_normal(n)
    ).astype(np.float32)


def _calibrate_blank_bias(bundle, blank_frac=0.85):
    """First-pass emission calibration from the logit-gap quantile.

    Trained RNN-T models emit blank on ~85-90%% of frames (a 30 s utterance
    yields ~100 BPE tokens over ~750 output frames); untrained random weights
    emit blank on ~1/vocab of frames, i.e. a token nearly EVERY frame — an
    unrepresentative worst case that overweights the decoder/joiner loop and
    underweights the encoder relative to any production model.  Raise the
    joiner's blank output bias to the ``blank_frac`` quantile of the
    (max-over-nonblank − blank) logit gap measured on this bench's own audio
    with the initial decoder state.  This is coarse (the gap distribution
    shifts once the decoder state evolves) — bench.main() refines it by
    bisection on the actual decode; this helper remains the cheap single-shot
    calibration used by the diagnostic benchmarks."""
    import jax.numpy as jnp

    from k2transducerasr_tpu.decode import rnnt_greedy
    from k2transducerasr_tpu.frontend.fbank import (
        fbank_compute,
        fbank_matrices,
        num_frames_jnp,
    )
    from k2transducerasr_tpu.models import joiner as joiner_mod

    fcfg = bundle.frontend_cfg
    n = int(16000 * 4.0)
    pcm_host = np.stack([synth_pcm(n, 1000 + i) for i in range(4)])
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


def _calibrate_emission_density(rec, bundle, samples_d, counts_d, utt_seconds,
                                target=2.5, iters=12):
    """Bisect the joiner blank bias until the PRODUCTION decode emits
    ~`target` tokens/audio-s on the bench audio (device-resident input, so
    each probe is one warm program dispatch).  Density is monotonically
    decreasing in the bias."""
    blank = bundle.decoder_cfg.blank_id
    base_b = rec._params["joiner"]["output"]["b"]

    def density(delta):
        rec._params["joiner"]["output"]["b"] = base_b.at[blank].add(delta)
        _, _, cnt = jax.block_until_ready(
            rec._decode_fn(rec._params, rec._fbank_tables, samples_d, counts_d)
        )
        return float(np.mean(jax.device_get(cnt))) / utt_seconds

    lo, hi = -12.0, 4.0  # density(lo) high, density(hi) low
    d_lo = density(lo)
    while d_lo < target and lo > -64.0:
        lo *= 2.0
        d_lo = density(lo)
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        if density(mid) >= target:
            lo = mid
        else:
            hi = mid
    delta = 0.5 * (lo + hi)
    d = density(delta)
    # the bisection converges to the closest ACHIEVABLE density: random-weight
    # argmaxes flip in clumps as the bias moves, so density is a step function
    # and the exact target can sit inside a step (r3 landed at 2.12 for
    # target 2.5) — any value in the realistic band measures a representative
    # decode load, which is all the bench needs
    log(f"emission calibration: blank-bias delta {delta:+.3f} -> "
        f"{d:.2f} tokens/audio-s (target {target}, nearest achievable step)")
    if not 1.5 <= d <= 3.5:
        # do NOT assert: the driver contract is one JSON line no matter what
        # (an out-of-band calibration means random-weight logits degenerated;
        # flag it loudly on stderr and let the measurement proceed so the
        # anomaly is visible next to a number instead of a crash)
        log(
            f"WARNING: emission density {d:.2f}/audio-s outside the realistic "
            "1.5-3.5 band — this run measures an unrepresentative decode load"
        )
    return d


def _measure_beam(rec, bundle, samples_d, counts_d, batch, utt_seconds, log):
    """Modified beam search (K=4) device-path throughput on the SAME
    calibrated emissions as the greedy headline (VERDICT r4 item #2 — beam
    performance had never been measured).  Greedy is timed identically
    (single dispatch + forced readback on device-resident input) so the
    ratio is apples-to-apples; both carry the same ~25 ms tunnel RTT."""
    from k2transducerasr_tpu.runtime.offline import OfflineRecognizer

    def timed(r):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            cnt = r._decode_fn(r._params, r._fbank_tables, samples_d, counts_d)[2]
            np.mean(jax.device_get(cnt))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    rec_b = OfflineRecognizer(bundle, decoding_method="modified_beam_search")
    jax.device_get(
        rec_b._decode_fn(rec_b._params, rec_b._fbank_tables, samples_d, counts_d)[2]
    )  # compile + warm
    t_beam = timed(rec_b)
    t_greedy = timed(rec)
    audio = batch * utt_seconds
    log(
        f"beam K=4 device path: {t_beam*1e3:.1f} ms/batch = "
        f"{audio/t_beam:.0f} audio-s/s/chip  (greedy same-harness "
        f"{t_greedy*1e3:.1f} ms = {audio/t_greedy:.0f} audio-s/s; "
        f"beam/greedy {t_beam/t_greedy:.2f}x)"
    )


def _feed_streams(rec, lanes, seconds, seed0):
    n = int(16000 * seconds)
    streams = []
    for i in range(lanes):
        s = rec.create_online_stream()
        s.add_samples(synth_pcm(n, seed0 + i))
        streams.append(s)
    return streams


def _measure_streaming(log):
    """Streaming latency + serving capacity on the causal zipformer2:
      * serial p50/p95 chunk latency, 8 lanes (the BASELINE north-star) —
        each get_results pays dispatch RTT + device + readback RTT;
      * 2-deep pipelined p50 (begin_step/end_step): chunk k+1's upload +
        dispatch overlaps chunk k's compute + readback (VERDICT r4 item #3);
      * saturated lane-pool throughput at 64 lanes — the serving-capacity
        twin of the offline headline (VERDICT r4 item #5)."""
    from k2transducerasr_tpu.models.zipformer2 import Zipformer2Config
    from k2transducerasr_tpu.runtime.bundle import ModelBundle
    from k2transducerasr_tpu.runtime.online import OnlineRecognizer

    lanes, seconds = 8, 15.0
    cfg = Zipformer2Config(causal=True, chunk_size=32, left_context_frames=128)
    bundle = ModelBundle.random("zipformer2", cfg, vocab_size=500, seed=0)
    rec = OnlineRecognizer(bundle, max_lanes=lanes)
    chunk_s = rec.hop_samples / bundle.frontend_cfg.sample_rate

    streams = _feed_streams(rec, lanes, seconds, 2000)
    rec.get_results(streams)  # compile + warm
    lat = []
    while any(s._ready() for s in streams):
        t0 = time.perf_counter()
        rec.get_results(streams)
        lat.append(time.perf_counter() - t0)
    lat_ms = np.array(lat) * 1e3
    p50 = float(np.percentile(lat_ms, 50))
    p95 = float(np.percentile(lat_ms, 95))
    log(
        f"streaming serial ({lanes} lanes, {chunk_s*1e3:.0f} ms chunks): "
        f"p50 {p50:.1f} ms  p95 {p95:.1f} ms  RTF {p50/1e3/chunk_s:.4f}  "
        f"({len(lat)} steps)"
    )

    # 2-deep pipelined: per-iteration time = max(dispatch, prev readback)
    for s in streams:
        rec.dispose_stream(s)
    streams = _feed_streams(rec, lanes, seconds, 2100)
    pending = rec.begin_step(streams)
    plat = []
    while any(s._ready() for s in streams):
        t0 = time.perf_counter()
        nxt = rec.begin_step(streams)
        rec.end_step(pending)
        pending = nxt
        plat.append(time.perf_counter() - t0)
    rec.end_step(pending)
    plat_ms = np.array(plat) * 1e3
    pp50 = float(np.percentile(plat_ms, 50))
    pp95 = float(np.percentile(plat_ms, 95))
    log(
        f"streaming pipelined ({lanes} lanes): p50 {pp50:.1f} ms  "
        f"p95 {pp95:.1f} ms  RTF {pp50/1e3/chunk_s:.4f}  ({len(plat)} steps)"
    )

    # saturated serving capacity: 64 lanes, pipelined drive to drain.
    # windows_per_step=4 additionally amortizes the ~25 ms dispatch RTT over
    # 4 chunks per lane per dispatch (device compute is ~5 ms/step at B=64;
    # the tunnel transfer + RTT are the whole cost)
    big = 64
    for wps in (1, 4):
        rec64 = OnlineRecognizer(bundle, max_lanes=big, windows_per_step=wps)
        streams = _feed_streams(rec64, big, 8.0 * wps, 2200)
        rec64.get_results(streams)  # compile B=64 + warm
        steps = 0
        consumed0 = sum(s._consumed for s in streams)
        t0 = time.perf_counter()
        pending = rec64.begin_step(streams)
        while any(s._ready() for s in streams):
            nxt = rec64.begin_step(streams)
            rec64.end_step(pending)
            pending = nxt
            steps += 1
        rec64.end_step(pending)
        wall = time.perf_counter() - t0
        rate = bundle.frontend_cfg.sample_rate
        audio_s = (sum(s._consumed for s in streams) - consumed0) / rate
        log(
            f"streaming saturated ({big} lanes, {chunk_s*1e3:.0f} ms chunks, "
            f"{wps} windows/step): {audio_s / wall:.0f} audio-s/s/chip "
            f"sustained ({steps + 1} steps, {wall*1e3/(steps+1):.1f} ms/step)"
        )


def main():
    # Streaming FIRST, in a fresh subprocess, BEFORE this process touches
    # the TPU: every executable a process loads degrades its tunnel
    # transfers (CLAUDE.md), and the streaming sections are per-step
    # transfer-bound — measured in-process AFTER the offline diagnostics
    # they read up to 10x worse (p50 175 ms / 58 audio-s/s saturated) than
    # the same code in a clean process (35 ms / 734 audio-s/s).  The
    # subprocess owns the chip exclusively while this process is still
    # uninitialized.
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    try:
        subprocess.run(
            [sys.executable, "-c",
             "import bench; bench._measure_streaming(bench.log)"],
            cwd=here, check=False, timeout=2700,
        )
    except subprocess.TimeoutExpired:  # pragma: no cover - keep the headline
        log("WARNING: streaming subprocess timed out; continuing")

    from benchmarks.stages import stage_report
    from k2transducerasr_tpu.models.zipformer2 import Zipformer2Config
    from k2transducerasr_tpu.runtime.bundle import ModelBundle
    from k2transducerasr_tpu.runtime.offline import OfflineRecognizer

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    utt_seconds = 30.0
    batch = 16
    n_batches = 6  # pipelined sustained window
    cfg = Zipformer2Config()  # icefall-default medium zipformer2 (~16 layers)
    bundle = ModelBundle.random("zipformer2", cfg, vocab_size=500, seed=0)
    _calibrate_blank_bias(bundle)
    rec = OfflineRecognizer(bundle)  # bf16 compute

    n = int(16000 * utt_seconds)
    batches = []
    for k in range(n_batches):
        streams = []
        for i in range(batch):
            s = rec.create_offline_stream()
            s.add_samples(synth_pcm(n, k * batch + i))
            streams.append(s)
        batches.append(streams)

    t0 = time.time()
    rec.get_results(batches[0])
    log(f"warmup (incl compile): {time.time() - t0:.1f}s")

    # refine emission density by bisection on the production decode
    import jax.numpy as jnp

    pcm16 = np.stack(
        [np.clip(s.samples * 32768.0, -32768, 32767).astype(np.int16)
         for s in batches[0]]
    )
    fcfg = bundle.frontend_cfg
    t_pad = rec.frame_bucket * (
        -(-((n - fcfg.frame_length) // fcfg.frame_shift + 1) // rec.frame_bucket)
    )
    need = (t_pad - 1) * fcfg.frame_shift + fcfg.frame_length
    samples_h = np.zeros((batch, need), np.int16)
    samples_h[:, : pcm16.shape[1]] = pcm16
    samples_d = jnp.asarray(samples_h)
    counts_d = jnp.asarray(np.full((batch,), n, np.int32))
    density = _calibrate_emission_density(rec, bundle, samples_d, counts_d, utt_seconds)

    res = rec.get_results(batches[0])
    toks = sum(len(r.tokens) for r in res) / len(res)
    log(f"emissions: {toks:.0f} tokens/utt ({toks / utt_seconds:.1f}/audio-s)")

    # measure throughput BEFORE loading the diagnostic programs: every
    # additional loaded executable further degrades the tunnel's transfer
    # bandwidth (44 MB/s after the production program alone, single-digit
    # MB/s once the per-stage programs are resident)
    # sequential (unpipelined) for the record
    times = []
    for _ in range(3):
        t0 = time.time()
        rec.get_results(batches[0])
        times.append(time.time() - t0)
    audio_s = batch * utt_seconds
    seq = audio_s / min(times)
    log(f"sequential: {[round(t, 3) for t in times]} -> {seq:.1f} audio-s/s/chip")

    # sustained: 2-deep begin/end pipeline, host prep + upload of batch k+1
    # overlapping batch k's device execution
    best = 0.0
    for _ in range(2):
        t0 = time.time()
        pending = rec.begin_decode(batches[0])
        for k in range(1, n_batches):
            nxt = rec.begin_decode(batches[k])
            rec.end_decode(pending)
            pending = nxt
        rec.end_decode(pending)
        wall = time.time() - t0
        best = max(best, n_batches * audio_s / wall)
    log(f"pipelined sustained ({n_batches} batches): {best:.1f} audio-s/s/chip")

    # host-path roofline: time one upload of the bench batch
    t0 = time.perf_counter()
    jax.block_until_ready(jax.device_put(samples_h))
    t_up = time.perf_counter() - t0
    mb = samples_h.nbytes / 1e6
    log(f"upload: {mb:.1f} MB in {t_up*1e3:.0f} ms ({mb/t_up:.0f} MB/s tunnel)")

    # per-stage device timings + MFU (device-resident input)
    stats = stage_report(rec, bundle, samples_d, counts_d, emit=log)
    log(
        f"roofline: {batch*utt_seconds/t_up:.0f} audio-s/s upload-bound vs "
        f"{batch*utt_seconds/stats['t_e2e']:.0f} audio-s/s device-compute-bound"
    )

    _measure_beam(rec, bundle, samples_d, counts_d, batch, utt_seconds, log)

    value = max(best, seq)
    print(
        json.dumps(
            {
                "metric": "offline_audio_seconds_per_second_per_chip",
                "value": round(value, 2),
                "unit": "audio-s/s/chip",
                "vs_baseline": round(value / REFERENCE_AUDIO_S_PER_S, 2),
                # calibration visibility (ADVICE r4): a degenerate emission
                # calibration is flagged IN the headline line, not only on
                # stderr — in_band False means this run measured an
                # unrepresentative decode load
                "emission_density": round(density, 2),
                "in_band": bool(1.5 <= density <= 3.5),
            }
        )
    )


if __name__ == "__main__":
    main()
