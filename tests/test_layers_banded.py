"""Banded-matmul reformulations of the embed convs (ops/layers) must match
``conv_general_dilated`` exactly (same products, f32 accumulation — the
band matrices only add zeros to the contraction)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from k2transducerasr_tpu.ops import layers as L


@pytest.mark.parametrize("t,f,c1", [(37, 80, 8), (12, 40, 4)])
def test_conv2d_c1_banded_matches_conv(t, f, c1):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, t, f), jnp.float32)
    p = L.init_conv2d(jax.random.PRNGKey(1), 1, c1, (3, 3))
    h = jnp.pad(x[..., None], ((0, 0), (0, 0), (1, 1), (0, 0)))
    want = np.asarray(L.apply_conv2d(p, h, strides=(1, 1)))
    got = np.asarray(L.apply_conv2d_c1_banded(p, x))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-5)


@pytest.mark.parametrize("t,f,ci,co", [(37, 80, 8, 32), (11, 39, 4, 8)])
def test_conv2d_banded_s2_matches_conv(t, f, ci, co):
    x = jax.random.normal(jax.random.PRNGKey(2), (2, t, f, ci), jnp.float32)
    p = L.init_conv2d(jax.random.PRNGKey(3), ci, co, (3, 3))
    want = np.asarray(L.apply_conv2d(p, x, strides=(2, 2)))
    got = np.asarray(L.apply_conv2d_banded_s2(p, x))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_banded_bf16_compute_dtype():
    """compute_dtype path: inputs cast to bf16 exactly as apply_conv2d does,
    so the two forms agree within bf16 product rounding."""
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 21, 80), jnp.float32)
    p = L.init_conv2d(jax.random.PRNGKey(5), 1, 8, (3, 3))
    h = jnp.pad(x[..., None], ((0, 0), (0, 0), (1, 1), (0, 0)))
    want = np.asarray(
        L.apply_conv2d(p, h, strides=(1, 1), compute_dtype=jnp.bfloat16)
    ).astype(np.float32)
    got = np.asarray(
        L.apply_conv2d_c1_banded(p, x, compute_dtype=jnp.bfloat16)
    ).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
