"""Fused rel-pos attention kernel (ops/attention_pallas.py) parity tests.

Run in Pallas interpret mode on CPU against the XLA reference path
(models/zipformer2._attn_weights math) — the same comparison the TPU
backend gets compiled.  Covers uneven T (partial query blocks), ragged
key lengths, 8 heads, and the end-to-end zipformer2 forward with the
kernel forced on (interpret) vs off.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from k2transducerasr_tpu.ops import layers as L
from k2transducerasr_tpu.ops.attention import rel_shift
from k2transducerasr_tpu.ops.attention_pallas import relpos_attn_ctx, relpos_attn_probs


def _xla_reference(q, k, pos_q, pos_k, lens):
    s = k.shape[1]
    scores = jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32)
    pos_full = jnp.einsum(
        "bthd,rhd->bhtr", pos_q, pos_k, preferred_element_type=jnp.float32
    )
    scores = scores + rel_shift(pos_full, s)
    colmask = jnp.arange(s)[None, :] < lens[:, None]
    scores = jnp.where(colmask[:, None, None, :], scores, L.NEG_INF)
    return jax.nn.softmax(scores, axis=-1)


@pytest.mark.parametrize(
    "b,t,h,qd,pd,lens",
    [
        (2, 100, 4, 32, 4, [100, 57]),
        (1, 130, 8, 32, 4, [93]),  # partial final query block, 8 heads
        (3, 48, 4, 16, 4, [48, 1, 20]),
    ],
)
def test_kernel_matches_xla(b, t, h, qd, pd, lens):
    s = t
    r = t + s - 1
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (b, t, h, qd), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, h, qd), jnp.float32)
    pq = jax.random.normal(ks[2], (b, t, h, pd), jnp.float32)
    pk = jax.random.normal(ks[3], (r, h, pd), jnp.float32)
    lens = jnp.asarray(lens, jnp.int32)

    ref = np.asarray(_xla_reference(q, k, pq, pk, lens))
    out = np.asarray(relpos_attn_probs(q, k, pq, pk, lens, interpret=True))
    assert out.shape == ref.shape
    # full equality on valid query rows; invalid rows are zeroed downstream
    for i in range(b):
        np.testing.assert_allclose(
            out[i, :, : int(lens[i])], ref[i, :, : int(lens[i])], atol=2e-6
        )


def test_bf16_output_dtype():
    b, t, h, qd, pd = 1, 64, 4, 32, 4
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    q = jax.random.normal(ks[0], (b, t, h, qd), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, t, h, qd), jnp.bfloat16)
    pq = jax.random.normal(ks[2], (b, t, h, pd), jnp.bfloat16)
    pk = jax.random.normal(ks[3], (2 * t - 1, h, pd), jnp.bfloat16)
    out = relpos_attn_probs(q, k, pq, pk, None, interpret=True)
    assert out.dtype == jnp.bfloat16
    # probs still sum to ~1 per row
    sums = np.asarray(jnp.sum(out.astype(jnp.float32), axis=-1))
    np.testing.assert_allclose(sums, 1.0, atol=2e-2)


def test_kernel_chunk_causal_matches_xla():
    """Static chunk-causal mask (offline causal path) vs the XLA mask."""
    from k2transducerasr_tpu.models.zipformer2 import _chunk_causal_mask

    b, t, h, qd, pd = 2, 96, 4, 32, 4
    chunk, left = 16, 32
    s = t
    r = t + s - 1
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    q = jax.random.normal(ks[0], (b, t, h, qd), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, h, qd), jnp.float32)
    pq = jax.random.normal(ks[2], (b, t, h, pd), jnp.float32)
    pk = jax.random.normal(ks[3], (r, h, pd), jnp.float32)

    scores = jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32)
    pos_full = jnp.einsum("bthd,rhd->bhtr", pq, pk, preferred_element_type=jnp.float32)
    scores = scores + rel_shift(pos_full, s)
    cmask = _chunk_causal_mask(t, chunk, left)
    ref = np.asarray(
        jax.nn.softmax(jnp.where(cmask[None, None], scores, L.NEG_INF), axis=-1)
    )

    out = np.asarray(
        relpos_attn_probs(q, k, pq, pk, None, interpret=True, chunk=chunk, left=left,
                          block_t=32)
    )
    np.testing.assert_allclose(out, ref, atol=2e-6)


def test_kernel_kv_start_matches_xla():
    """Per-lane first-valid-column gating (streaming cache path)."""
    b, t, h, qd, pd = 3, 8, 4, 32, 4
    s = 40  # cache(32) | chunk(8)
    r = t + s - 1
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    q = jax.random.normal(ks[0], (b, t, h, qd), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, h, qd), jnp.float32)
    pq = jax.random.normal(ks[2], (b, t, h, pd), jnp.float32)
    pk = jax.random.normal(ks[3], (r, h, pd), jnp.float32)
    kv_start = jnp.array([32, 10, 0], jnp.int32)

    scores = jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32)
    pos_full = jnp.einsum("bthd,rhd->bhtr", pq, pk, preferred_element_type=jnp.float32)
    scores = scores + rel_shift(pos_full, s)
    smask = jnp.arange(s)[None, :] >= kv_start[:, None]
    ref = np.asarray(
        jax.nn.softmax(
            jnp.where(smask[:, None, None, :], scores, L.NEG_INF), axis=-1
        )
    )

    out = np.asarray(
        relpos_attn_probs(q, k, pq, pk, None, interpret=True, kv_start=kv_start)
    )
    np.testing.assert_allclose(out, ref, atol=2e-6)


def test_zipformer2_streaming_flash_vs_xla():
    """End-to-end streaming steps with the kernel forced on (interpret) vs
    off — the streaming product path now rides the kernel."""
    from k2transducerasr_tpu.models import zipformer2 as Z

    cfg = Z.Zipformer2Config(
        num_encoder_layers=(1, 1, 1, 1, 1, 1), causal=True
    )
    params = Z.init_params(jax.random.PRNGKey(0), cfg)
    b = 2
    win = 2 * cfg.chunk_size + 13
    xs = [
        jax.random.normal(jax.random.PRNGKey(10 + i), (b, win, 80), jnp.float32)
        for i in range(2)
    ]

    def run():
        state = Z.init_state(cfg, b)
        outs = []
        for x in xs:
            out, state = Z.streaming_step(params, cfg, state, x)
            outs.append(np.asarray(out))
        return np.concatenate(outs, axis=1)

    old = os.environ.get("K2T_FLASH_ATTN")
    try:
        os.environ["K2T_FLASH_ATTN"] = "interpret"
        got = run()
        os.environ["K2T_FLASH_ATTN"] = "off"
        want = run()
    finally:
        if old is None:
            os.environ.pop("K2T_FLASH_ATTN", None)
        else:
            os.environ["K2T_FLASH_ATTN"] = old
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_zipformer2_causal_offline_flash_vs_xla():
    """Offline chunk-causal forward with the kernel forced on vs off."""
    from k2transducerasr_tpu.models import zipformer2 as Z

    cfg = Z.Zipformer2Config(
        num_encoder_layers=(1, 1, 1, 1, 1, 1), causal=True
    )
    params = Z.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 170, 80), jnp.float32)
    lens = jnp.array([170, 170], jnp.int32)

    old = os.environ.get("K2T_FLASH_ATTN")
    try:
        os.environ["K2T_FLASH_ATTN"] = "interpret"
        out_flash, l1 = Z.forward(params, cfg, x, lens)
        os.environ["K2T_FLASH_ATTN"] = "off"
        out_xla, l2 = Z.forward(params, cfg, x, lens)
    finally:
        if old is None:
            os.environ.pop("K2T_FLASH_ATTN", None)
        else:
            os.environ["K2T_FLASH_ATTN"] = old
    assert np.array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_xla), atol=5e-6)


def test_zipformer2_forward_flash_vs_xla():
    from k2transducerasr_tpu.models import zipformer2 as Z

    cfg = Z.Zipformer2Config(
        num_encoder_layers=(1, 1, 1, 1, 1, 1), causal=False
    )
    params = Z.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 200, 80), jnp.float32)
    lens = jnp.array([200, 150], jnp.int32)

    old = os.environ.get("K2T_FLASH_ATTN")
    try:
        os.environ["K2T_FLASH_ATTN"] = "interpret"
        out_flash, l1 = Z.forward(params, cfg, x, lens)
        os.environ["K2T_FLASH_ATTN"] = "off"
        out_xla, l2 = Z.forward(params, cfg, x, lens)
    finally:
        if old is None:
            os.environ.pop("K2T_FLASH_ATTN", None)
        else:
            os.environ["K2T_FLASH_ATTN"] = old

    assert np.array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_xla), atol=5e-6
    )


def test_conformer_forward_flash_vs_xla():
    """Conformer offline (non-causal + causal) with the kernel forced on
    (interpret) vs off — the (q+u)/(q+v)/scale folding must be exact."""
    from k2transducerasr_tpu.models import conformer as C

    for causal in (False, True):
        cfg = C.ConformerConfig(
            feature_dim=80, d_model=32, num_layers=2, num_heads=4, ff_dim=48,
            cnn_kernel=7, causal=causal, chunk_size=4, left_context=8,
        )
        params = C.init_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 71, 80), jnp.float32) * 0.5
        lens = jnp.array([71, 43], jnp.int32)

        old = os.environ.get("K2T_FLASH_ATTN")
        try:
            os.environ["K2T_FLASH_ATTN"] = "interpret"
            out_flash, l1 = C.forward(params, cfg, x, lens)
            os.environ["K2T_FLASH_ATTN"] = "off"
            out_xla, l2 = C.forward(params, cfg, x, lens)
        finally:
            if old is None:
                os.environ.pop("K2T_FLASH_ATTN", None)
            else:
                os.environ["K2T_FLASH_ATTN"] = old
        assert np.array_equal(np.asarray(l1), np.asarray(l2))
        np.testing.assert_allclose(
            np.asarray(out_flash), np.asarray(out_xla), atol=1e-5,
            err_msg=f"causal={causal}",
        )


def test_conformer_streaming_flash_vs_xla():
    from k2transducerasr_tpu.models import conformer as C

    cfg = C.ConformerConfig(
        feature_dim=80, d_model=32, num_layers=2, num_heads=4, ff_dim=48,
        cnn_kernel=7, causal=True, chunk_size=4, left_context=8,
    )
    params = C.init_params(jax.random.PRNGKey(0), cfg)
    xs = [
        jax.random.normal(jax.random.PRNGKey(5 + i), (2, cfg.chunk_input_len, 80),
                          jnp.float32) * 0.5
        for i in range(3)
    ]

    def run():
        state = C.init_state(cfg, 2)
        outs = []
        for x in xs:
            out, state = C.streaming_step(params, cfg, state, x)
            outs.append(np.asarray(out))
        return np.concatenate(outs, axis=1)

    old = os.environ.get("K2T_FLASH_ATTN")
    try:
        os.environ["K2T_FLASH_ATTN"] = "interpret"
        got = run()
        os.environ["K2T_FLASH_ATTN"] = "off"
        want = run()
    finally:
        if old is None:
            os.environ.pop("K2T_FLASH_ATTN", None)
        else:
            os.environ["K2T_FLASH_ATTN"] = old
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("fuse_mode", ["probs", "ctx"])
def test_zipformer1_flash_vs_xla(fuse_mode):
    """Zipformer v1 offline (non-causal + causal) and streaming with the
    kernel forced on (interpret) vs off, under BOTH fuse strategies
    (shared probs default and recompute-per-consumer ctx)."""
    from k2transducerasr_tpu.models import zipformer as Z1

    kw = dict(
        num_encoder_layers=(1, 1), encoder_dims=(32, 32),
        attention_dims=(16, 16), downsampling_factors=(1, 2),
        num_heads=(4, 4), feedforward_dims=(48, 48),
        cnn_module_kernels=(7, 7), embed_channels=(2, 4, 8),
        chunk_size=8, left_context_frames=16,
    )

    def run_all(causal):
        cfg = Z1.ZipformerConfig(causal=causal, **kw)
        params = Z1.init_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 71, 80), jnp.float32) * 0.5
        lens = jnp.array([71, 45], jnp.int32)
        out, _ = Z1.forward(params, cfg, x, lens)
        outs = [np.asarray(out)]
        if causal:
            state = Z1.init_state(cfg, 2)
            sout = []
            for i in range(2):
                xc = jax.random.normal(
                    jax.random.PRNGKey(3 + i), (2, cfg.chunk_input_len, 80), jnp.float32
                ) * 0.5
                o, state = Z1.streaming_step(params, cfg, state, xc)
                sout.append(np.asarray(o))
            outs.append(np.concatenate(sout, axis=1))
        return outs

    for causal in (False, True):
        old = os.environ.get("K2T_FLASH_ATTN")
        try:
            os.environ["K2T_FLASH_ATTN"] = "interpret"
            os.environ["K2T_ATTN_FUSE"] = fuse_mode
            got = run_all(causal)
            os.environ["K2T_FLASH_ATTN"] = "off"
            want = run_all(causal)
        finally:
            os.environ.pop("K2T_ATTN_FUSE", None)
            if old is None:
                os.environ.pop("K2T_FLASH_ATTN", None)
            else:
                os.environ["K2T_FLASH_ATTN"] = old
        for g, w in zip(got, want):
            np.testing.assert_allclose(g, w, atol=1e-5, err_msg=f"causal={causal}")


# ---------------------------------------------------------------------------
# Fused probs-consumer (ctx) kernel — relpos_attn_ctx
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "b,t,h,qd,vd,lens,chunk_left,kv_start",
    [
        (2, 100, 4, 32, 12, [100, 57], None, None),       # offline ragged
        (1, 130, 8, 32, 12, None, (32, 64), None),        # chunk-causal, partial block
        (3, 16, 2, 16, 48, None, None, [0, 5, 16]),       # streaming kv gating
        (2, 64, 1, 32, 96, [64, 40], None, None),         # head-0 / nonlin shape
    ],
)
def test_ctx_kernel_matches_probs_einsum(b, t, h, qd, vd, lens, chunk_left, kv_start):
    """relpos_attn_ctx == einsum over relpos_attn_probs (the exact consumer
    math it fuses: probs cast to v dtype, f32 accumulation)."""
    s = t
    r = t + s - 1
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    q = jax.random.normal(ks[0], (b, t, h, qd), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, h, qd), jnp.float32)
    pq = jax.random.normal(ks[2], (b, t, h, 4), jnp.float32)
    pk = jax.random.normal(ks[3], (r, h, 4), jnp.float32)
    v = jax.random.normal(ks[4], (b, s, h, vd), jnp.float32)
    lens_d = None if lens is None else jnp.asarray(lens, jnp.int32)
    kv_d = None if kv_start is None else jnp.asarray(kv_start, jnp.int32)
    ch, lf = chunk_left if chunk_left is not None else (0, 0)

    probs = relpos_attn_probs(
        q, k, pq, pk, lens_d, interpret=True, chunk=ch, left=lf, kv_start=kv_d
    )
    want = jnp.einsum(
        "bhts,bshd->bthd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    got = relpos_attn_ctx(
        q, k, pq, pk, v, lens_d, interpret=True, chunk=ch, left=lf, kv_start=kv_d
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("fuse_mode", ["probs", "ctx"])
def test_zipformer2_fused_vs_xla_path(fuse_mode):
    """End-to-end zipformer2 forward: both kernel strategies (shared probs
    — the default — and recompute-per-consumer ctx) in interpret mode must
    agree with the pure-XLA path."""
    from k2transducerasr_tpu.models import zipformer2 as Z

    cfg = Z.Zipformer2Config(
        num_encoder_layers=(1, 1),
        encoder_dims=(16, 32),
        downsampling_factors=(1, 2),
        num_heads=(2, 2),
        feedforward_dims=(32, 48),
        cnn_module_kernels=(7, 7),
        query_head_dim=4,
        value_head_dim=4,
        pos_head_dim=2,
        pos_dim=8,
        embed_channels=(2, 4, 8),
    )
    params = Z.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 71, 80), jnp.float32)
    lens = jnp.asarray([71, 50], jnp.int32)

    os.environ["K2T_FLASH_ATTN"] = "interpret"
    os.environ["K2T_ATTN_FUSE"] = fuse_mode
    try:
        out_fused, l1 = Z.forward(params, cfg, x, lens)
    finally:
        os.environ["K2T_FLASH_ATTN"] = "0"
        os.environ.pop("K2T_ATTN_FUSE", None)
    out_xla, l2 = Z.forward(params, cfg, x, lens)
    os.environ.pop("K2T_FLASH_ATTN", None)
    assert np.array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_xla), atol=5e-6)
