"""Micro-bench: fused probs-consumer (ctx) kernel block_t sweep vs the
round-4 combination (Pallas probs kernel + XLA einsum consumers).

Timing methodology (the third attempt — both failure modes below are real
axon-tunnel landmines recorded in CLAUDE.md/BASELINE.md):
  * closure tensors become jit CONSTANTS -> constant-bearing executables
    wreck tunnel transfers (first attempt read 618 ms for a 1.5 ms kernel);
  * one host dispatch per iteration costs ~25-50 ms through the tunnel
    (second attempt read 54 ms/call).
So each variant runs ITERS dependent iterations inside ONE jitted
``lax.fori_loop`` program — one dispatch, one forced scalar readback;
per-iteration time = (wall - dispatch) / ITERS.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/attn_ctx_sweep.py
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

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from k2transducerasr_tpu.ops.attention_pallas import relpos_attn_ctx, relpos_attn_probs

ITERS = 20


@functools.partial(jax.jit, static_argnames=("bt", "mode"))
def chain_program(q, k, pq, pk, v, lens, bt, mode):
    """ITERS dependent evaluations of one attention variant, one program."""

    def ctx_once(y):
        qq = q + y.astype(q.dtype)
        return jnp.sum(
            relpos_attn_ctx(qq, k, pq, pk, v, lens, block_t=bt),
            dtype=jnp.float32,
        )

    def probs_once(y):
        qq = q + y.astype(q.dtype)
        w = relpos_attn_probs(qq, k, pq, pk, lens, block_t=bt)
        if mode == "probs_consume":
            c = jnp.einsum(
                "bhts,bshd->bthd", w.astype(v.dtype), v,
                preferred_element_type=jnp.float32,
            )
            return jnp.sum(c, dtype=jnp.float32)
        return jnp.sum(w.astype(jnp.float32))

    once = ctx_once if mode == "ctx" else probs_once
    return jax.lax.fori_loop(0, ITERS, lambda i, y: once(y) * 1e-9, jnp.float32(0.0))


def run(label, *args):
    t0 = time.perf_counter()
    out = chain_program(*args)
    float(out)  # includes compile on first use
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(chain_program(*args))
    wall = time.perf_counter() - t0
    print(f"{label}: {wall/ITERS*1e3:7.2f} ms/iter  (program {wall*1e3:6.1f} ms, "
          f"first-call {t_compile:.1f} s)")


def main():
    print("backend:", jax.default_backend())
    b, h, t, qd, pd, vd = 16, 4, 1532, 32, 4, 12
    s = t
    r = t + s - 1
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    q = jax.device_put(jax.random.normal(ks[0], (b, t, h, qd), jnp.bfloat16))
    k = jax.device_put(jax.random.normal(ks[1], (b, s, h, qd), jnp.bfloat16))
    pq = jax.device_put(jax.random.normal(ks[2], (b, t, h, pd), jnp.bfloat16))
    pk = jax.device_put(jax.random.normal(ks[3], (r, h, pd), jnp.bfloat16))
    v = jax.device_put(jax.random.normal(ks[4], (b, s, h, vd), jnp.bfloat16))
    lens = jax.device_put(jnp.full((b,), s, jnp.int32))

    for bt in (128, 256, 512):
        try:
            run(f"ctx   bt={bt}", q, k, pq, pk, v, lens, bt, "ctx")
        except Exception as e:  # noqa: BLE001
            print(f"ctx   bt={bt}: FAILED {type(e).__name__}: {str(e)[:140]}")
    for bt in (128, 256):
        run(f"probs bt={bt} (write only)", q, k, pq, pk, v, lens, bt, "probs")
        run(f"probs bt={bt} + 1 einsum  ", q, k, pq, pk, v, lens, bt, "probs_consume")


if __name__ == "__main__":
    main()


@functools.partial(jax.jit, static_argnames=("bt", "pos_vpu"))
def chain_probs_vpu(q, k, pq, pk, lens, bt, pos_vpu):
    def once(y):
        qq = q + y.astype(q.dtype)
        w = relpos_attn_probs(qq, k, pq, pk, lens, block_t=bt, pos_vpu=pos_vpu)
        return jnp.sum(w.astype(jnp.float32))

    return jax.lax.fori_loop(0, ITERS, lambda i, y: once(y) * 1e-9, jnp.float32(0.0))


def main_posvpu():
    print("backend:", jax.default_backend())
    b, h, t, qd, pd = 16, 4, 1532, 32, 4
    s = t
    r = t + s - 1
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    q = jax.device_put(jax.random.normal(ks[0], (b, t, h, qd), jnp.bfloat16))
    k = jax.device_put(jax.random.normal(ks[1], (b, s, h, qd), jnp.bfloat16))
    pq = jax.device_put(jax.random.normal(ks[2], (b, t, h, pd), jnp.bfloat16))
    pk = jax.device_put(jax.random.normal(ks[3], (r, h, pd), jnp.bfloat16))
    lens = jax.device_put(jnp.full((b,), s, jnp.int32))
    for pos_vpu in (False, True):
        for bt in (128, 256):
            t0 = time.perf_counter()
            float(chain_probs_vpu(q, k, pq, pk, lens, bt, pos_vpu))
            tc = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(chain_probs_vpu(q, k, pq, pk, lens, bt, pos_vpu))
            wall = time.perf_counter() - t0
            print(f"probs pos_vpu={pos_vpu} bt={bt}: {wall/ITERS*1e3:7.2f} ms/iter (first {tc:.1f} s)")


if __name__ == "__main__" and os.environ.get("K2T_SWEEP") == "posvpu":
    main_posvpu()
