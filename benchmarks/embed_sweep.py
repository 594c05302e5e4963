"""Embed-region experiments: alternatives for the two costliest embed ops
seen in the r5 xprof trace (~10 ms of the 29.9 ms flagship program):

  * conv1 (3x3, C_in=1 -> 8, stride 1): the conv + two layout copies of its
    f32 [16,3070,80,8] activation cost ~4.0 ms.  Variant: one banded
    matmul [B,T,F+2] @ [F+2, 3*F*c1] + 3 time-shifted adds — same products,
    f32 accumulation, MXU-shaped, no NHWC layout assignment to fight.
  * ConvNeXt depthwise 7x7 (C=128): lowering materializes u32-packed
    layout shuffles (~3.4 ms).  Variant: NCHW dimension numbers.

Timing: ITERS dependent iterations inside one jitted program (see
attn_ctx_sweep.py for why), numerics cross-checked in-run.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/embed_sweep.py
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

from k2transducerasr_tpu.ops import layers as L

ITERS = 10


def conv1_banded_weights(w, b, f: int):
    """w [3,3,1,c1] -> band matrix [F+2, 3*F*c1] with W[g, (dt*F+f)*c1+c] =
    w[dt, g-f, 0, c] for 0 <= g-f <= 2."""
    c1 = w.shape[-1]
    band = jnp.zeros((f + 2, 3, f, c1), w.dtype)
    for dt in range(3):
        for df in range(3):
            rows = jnp.arange(f) + df
            band = band.at[rows, dt, jnp.arange(f), :].set(
                jnp.broadcast_to(w[dt, df, 0], (f, c1))
            )
    return band.reshape(f + 2, 3 * f * c1)


def conv1_banded(band, b, x, c1, compute_dtype):
    """x [B,T,F] -> [B,T-2,F,c1]; identical math to the 3x3 conv1 (freq pad
    1, VALID time) as one matmul + 3 shifted adds, f32 accumulation."""
    bsz, t, f = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1)))  # [B,T,F+2]
    if compute_dtype is not None:
        xp = xp.astype(compute_dtype)
        band = band.astype(compute_dtype)
    z = jnp.matmul(xp, band, preferred_element_type=jnp.float32)  # [B,T,3*F*c1]
    z = z.reshape(bsz, t, 3, f, c1)
    y = z[:, 0 : t - 2, 0] + z[:, 1 : t - 1, 1] + z[:, 2:t, 2]
    y = y + b
    if compute_dtype is not None:
        y = y.astype(compute_dtype)
    return y


@functools.partial(jax.jit, static_argnames=("variant",))
def chain_conv1(x, w, b, band, variant):
    c1 = w.shape[-1]
    p = {"w": w, "b": b}

    def once(y):
        xx = x + y.astype(x.dtype)
        if variant == "conv":
            h = jnp.pad(xx[..., None], ((0, 0), (0, 0), (1, 1), (0, 0)))
            out = L.swoosh_r(
                L.apply_conv2d(p, h, strides=(1, 1), compute_dtype=jnp.bfloat16)
            )
        else:
            out = L.swoosh_r(conv1_banded(band, b, xx, c1, jnp.bfloat16))
        return jnp.sum(out, dtype=jnp.float32) * 1e-9

    return jax.lax.fori_loop(0, ITERS, lambda i, y: once(y), jnp.float32(0.0))


@functools.partial(jax.jit, static_argnames=("variant",))
def chain_dw(x, w, b, variant):
    c = x.shape[-1]

    def once(y):
        xx = x + y.astype(x.dtype)
        if variant == "nhwc":
            out = jax.lax.conv_general_dilated(
                xx, w, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c, preferred_element_type=jnp.float32,
            )
        else:  # nchw
            xt = jnp.transpose(xx, (0, 3, 1, 2))
            out = jax.lax.conv_general_dilated(
                xt, w, (1, 1), "VALID",
                dimension_numbers=("NCHW", "HWIO", "NCHW"),
                feature_group_count=c, preferred_element_type=jnp.float32,
            )
            out = jnp.transpose(out, (0, 2, 3, 1))
        return jnp.sum((out + b).astype(jnp.bfloat16), dtype=jnp.float32) * 1e-9

    return jax.lax.fori_loop(0, ITERS, lambda i, y: once(y), jnp.float32(0.0))


def run(label, fn, *args):
    t0 = time.perf_counter()
    float(fn(*args))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(fn(*args))
    wall = time.perf_counter() - t0
    print(f"{label}: {wall/ITERS*1e3:7.2f} ms/iter (first {tc:.1f} s)")


def main():
    print("backend:", jax.default_backend())
    key = jax.random.PRNGKey(0)
    # conv1 at bench shapes: [16, 3072, 80] -> [16, 3070, 80, 8]
    x = jax.device_put(jax.random.normal(key, (16, 3072, 80), jnp.float32))
    p = L.init_conv2d(jax.random.PRNGKey(1), 1, 8, (3, 3))
    w, b = p["w"], p["b"]
    band = conv1_banded_weights(w, b, 80)

    # numerics: banded == conv (f32, atol tight)
    h = jnp.pad(x[:1, :64, :, None], ((0, 0), (0, 0), (1, 1), (0, 0)))
    want = np.asarray(L.apply_conv2d(p, h, strides=(1, 1)))
    got = np.asarray(conv1_banded(band, b, x[:1, :64], 8, None))
    np.testing.assert_allclose(got, want, atol=2e-5)
    print("conv1 banded == conv: OK (atol 2e-5 f32)")

    run("conv1 conv   ", chain_conv1, x, w, b, band, "conv")
    run("conv1 banded ", chain_conv1, x, w, b, band, "banded")

    # ConvNeXt depthwise 7x7 at stage shapes: [16, 1538, 25, 128] VALID
    xd = jax.device_put(jax.random.normal(key, (16, 1538, 25, 128), jnp.bfloat16))
    pd_ = L.init_conv2d(jax.random.PRNGKey(2), 128, 128, (7, 7))
    dw = jnp.einsum("hwcc->hwc", pd_["w"])[:, :, None, :].astype(jnp.bfloat16)
    bd = pd_["b"]
    run("dw7x7 NHWC   ", chain_dw, xd, dw, bd, "nhwc")
    run("dw7x7 NCHW   ", chain_dw, xd, dw, bd, "nchw")


if __name__ == "__main__":
    main()
