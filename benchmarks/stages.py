"""Shared per-stage timing helpers for the offline pipeline.

Used by bench.py (stderr diagnostics) and benchmarks/profile_offline.py
(standalone report).  Times fbank / encoder / enc-projection / greedy search
as separate jitted programs plus the fused production program, with an MFU
estimate from XLA's compiled cost analysis.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

# v5e peak: 197 TFLOP/s bf16 (394 int8), ~819 GB/s HBM
PEAK_FLOPS = {"tpu v5 lite": 197e12}


def peak_flops_of(device) -> float:
    return PEAK_FLOPS.get(device.device_kind.lower(), 197e12)


def _sync(out):
    """Force observable completion: through the axon tunnel
    ``block_until_ready`` can return before the device finishes (measured:
    ~0.1 ms for programs with >= 0.4 ms of mandatory HBM traffic), so pull
    one scalar derived from the output back to the host — the device queue
    is in-order, so the readback proves every prior program completed."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(jnp.ravel(leaf)[0])


def timeit(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        _sync(fn(*args))
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        _sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def flops_of(fn, *args):
    """(flops, bytes_accessed) of the compiled program, or (0, 0)."""
    try:
        c = jax.jit(fn).lower(*args).compile()
        an = c.cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return float(an.get("flops", 0.0)), float(an.get("bytes accessed", 0.0))
    except Exception:  # pragma: no cover - diagnostic only
        return 0.0, 0.0


def stage_report(rec, bundle, samples_d, counts_d, emit=print):
    """Time each stage of `rec`'s offline pipeline on device-resident input.

    Returns a dict of timings (seconds) and derived metrics; prints one line
    per stage through `emit`.
    """
    from k2transducerasr_tpu.decode import rnnt_greedy
    from k2transducerasr_tpu.frontend.fbank import fbank_compute, num_frames_jnp
    from k2transducerasr_tpu.models import joiner as joiner_mod

    peak = peak_flops_of(jax.devices()[0])
    fcfg = bundle.frontend_cfg

    # Per-stage numbers here each pay one HOST DISPATCH round trip (through
    # the axon tunnel: ~10-40 ms), which the fused production program pays
    # only once — so a trivial program on the same input is timed first and
    # its cost shown as the `dispatch` line.  Stage device time ~= raw -
    # dispatch; the r3 "enc_proj 22.8 ms" mystery was exactly this overhead
    # on a sub-ms matmul.
    noop_j = jax.jit(lambda s: s[:, :1] * jnp.int16(1))
    t_disp = timeit(noop_j, samples_d)
    emit(f"dispatch: {t_disp*1e3:8.2f} ms  (per-stage host round trip; "
         f"subtract from stage lines for device time)")

    def front(tables, samples, counts):
        x = samples.astype(jnp.float32) * (1.0 / 32768.0)
        t = (x.shape[1] - fcfg.frame_length) // fcfg.frame_shift + 1
        feats = fbank_compute(x, fcfg, t, n_valid=counts, tables=tables)
        return feats, num_frames_jnp(counts, fcfg)

    def dev(t):
        """Dispatch-corrected device time: every standalone stage pays one
        host round trip (t_disp) the fused program pays once; derived
        TF/s / GB/s / MFU use this, not the raw wall number.  Floored at
        0.3 ms: when RPC jitter makes a stage read at/below the dispatch
        baseline, the subtraction goes to ~0 and the derived rates explode
        into nonsense (a bad-jitter r5 run printed "22329 TF/s fbank")."""
        return max(t - t_disp, 3e-4)

    front_j = jax.jit(front)
    t_front = timeit(front_j, rec._fbank_tables, samples_d, counts_d)
    feats, feat_lens = jax.block_until_ready(
        front_j(rec._fbank_tables, samples_d, counts_d)
    )
    fl_front, by_front = flops_of(front, rec._fbank_tables, samples_d, counts_d)
    emit(
        f"fbank:    {t_front*1e3:8.2f} ms raw (~{dev(t_front)*1e3:.2f} device)  "
        f"{fl_front/dev(t_front)/1e12:6.2f} TF/s  "
        f"{by_front/dev(t_front)/1e9:6.1f} GB/s  feats {feats.shape}"
    )

    enc = bundle.encoder

    def enc_fn(params, feats, feat_lens):
        return enc.forward(params, bundle.encoder_cfg, feats, feat_lens, jnp.bfloat16)

    enc_j = jax.jit(enc_fn)
    t_enc = timeit(enc_j, bundle.params["encoder"], feats, feat_lens)
    enc_out, enc_lens = jax.block_until_ready(
        enc_j(bundle.params["encoder"], feats, feat_lens)
    )
    fl_enc, by_enc = flops_of(enc_fn, bundle.params["encoder"], feats, feat_lens)
    emit(
        f"encoder:  {t_enc*1e3:8.2f} ms raw (~{dev(t_enc)*1e3:.2f} device)  "
        f"{fl_enc/dev(t_enc)/1e12:6.2f} TF/s  "
        f"{by_enc/dev(t_enc)/1e9:6.1f} GB/s  out {enc_out.shape}  "
        f"MFU {fl_enc/dev(t_enc)/peak*100:.1f}%"
    )

    def proj_fn(jp, enc_out):
        return joiner_mod.project_encoder(jp, enc_out, jnp.bfloat16)

    proj_j = jax.jit(proj_fn)
    t_proj = timeit(proj_j, bundle.params["joiner"], enc_out)
    enc_proj = jax.block_until_ready(proj_j(bundle.params["joiner"], enc_out))

    dec_cfg = bundle.decoder_cfg

    def search_fn(params, enc_proj, enc_lens):
        st = rnnt_greedy.init_state(
            params["decoder"], dec_cfg, params["joiner"], enc_proj.shape[0], 1024,
            jnp.bfloat16,
        )
        fin = rnnt_greedy.greedy_frames_skip(
            params["decoder"], dec_cfg, params["joiner"], st, enc_proj, enc_lens,
            jnp.zeros((enc_proj.shape[0],), jnp.int32), False, jnp.bfloat16,
        )
        return fin.tokens, fin.count

    search_j = jax.jit(search_fn)
    t_search = timeit(search_j, bundle.params, enc_proj, enc_lens)
    toks, cnt = jax.block_until_ready(search_j(bundle.params, enc_proj, enc_lens))
    emit(f"enc_proj: {t_proj*1e3:8.2f} ms  (~{max(0.0, t_proj-t_disp)*1e3:.2f} device)")
    emit(
        f"search:   {t_search*1e3:8.2f} ms  (~{max(0.0, t_search-t_disp)*1e3:.2f} device)"
        f"  tokens/utt {np.mean(np.asarray(cnt)):.1f}"
    )

    t_e2e = timeit(rec._decode_fn, rec._params, rec._fbank_tables, samples_d, counts_d)
    fl_e2e, by_e2e = flops_of(
        lambda p, tb, s, c: rec._decode_fn.__wrapped__(p, tb, s, c),
        rec._params, rec._fbank_tables, samples_d, counts_d,
    )
    mfu = fl_e2e / dev(t_e2e) / peak
    emit(
        f"e2e:      {t_e2e*1e3:8.2f} ms raw (~{dev(t_e2e)*1e3:.2f} device)  "
        f"{fl_e2e/dev(t_e2e)/1e12:6.2f} TF/s  "
        f"{by_e2e/dev(t_e2e)/1e9:6.1f} GB/s  MFU {mfu*100:.1f}%"
    )
    return {
        "t_dispatch": t_disp,
        "t_front": dev(t_front),
        "t_enc": dev(t_enc),
        "t_proj": dev(t_proj),
        "t_search": dev(t_search),
        "t_e2e": dev(t_e2e),
        "t_e2e_raw": t_e2e,
        "mfu": mfu,
        "enc_mfu": fl_enc / dev(t_enc) / peak,
        "tokens_per_utt": float(np.mean(np.asarray(cnt))),
    }
