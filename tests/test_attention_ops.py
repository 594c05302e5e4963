import jax.numpy as jnp
import numpy as np

from k2transducerasr_tpu.ops.attention import descending_rel_positions, rel_shift


def _naive(z, t, s):
    """y[t_, s_] = z[t_, rho] with rho = (S-1) + t_ - s_ (ascending-r layout
    reversed = descending index (T-1) - t_ + s_ ... computed directly)."""
    r = z.shape[-1]
    out = np.zeros(z.shape[:-2] + (t, s), z.dtype)
    desc = np.asarray(descending_rel_positions(t, s))  # values at each R slot
    # slot k holds relative position desc[k]; want y[t_, s_] = score at
    # relative position (t_ + (s - t)) - s_ (query = last t of kv seq)
    for ti in range(t):
        for si in range(s):
            rel = (ti + (s - t)) - si
            k = int(np.where(desc == rel)[0][0])
            out[..., ti, si] = z[..., ti, k]
    return out


def test_rel_shift_matches_naive():
    t, s = 4, 7
    r = t + s - 1
    z = np.random.default_rng(0).standard_normal((2, 3, t, r)).astype(np.float32)
    got = np.asarray(rel_shift(jnp.asarray(z), s))
    want = _naive(z, t, s)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_rel_shift_square():
    t = s = 5
    z = np.random.default_rng(1).standard_normal((1, 1, t, 2 * t - 1)).astype(np.float32)
    got = np.asarray(rel_shift(jnp.asarray(z), s))
    want = _naive(z, t, s)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_descending_positions():
    r = np.asarray(descending_rel_positions(3, 5))
    np.testing.assert_array_equal(r, [4, 3, 2, 1, 0, -1, -2])
