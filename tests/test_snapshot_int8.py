import numpy as np
import pytest

from k2transducerasr_tpu.models.lstm import LstmConfig
from k2transducerasr_tpu.runtime import checkpoint
from k2transducerasr_tpu.runtime.bundle import ModelBundle
from k2transducerasr_tpu.runtime.online import OnlineRecognizer


@pytest.fixture(scope="module")
def bundle():
    cfg = LstmConfig(d_model=32, rnn_hidden_size=48, num_layers=1, ff_dim=64, chunk_size=4)
    return ModelBundle.random("lstm", cfg, vocab_size=16, seed=0, decoder_dim=24, joiner_dim=24)


def _pcm(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    return (0.3 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(n)).astype(np.float32)


def test_stream_snapshot_restore_continues_exactly(bundle):
    """Decode half a stream, snapshot, restore into a DIFFERENT recognizer,
    finish there — result must equal uninterrupted decoding (the migrating-
    stream/elasticity contract, SURVEY.md §5)."""
    rec_a = OnlineRecognizer(bundle, compute_dtype=None, max_lanes=2)
    pcm = _pcm(rec_a.window_samples + 3 * rec_a.hop_samples, seed=3)

    # uninterrupted reference run
    s_ref = rec_a.create_online_stream()
    s_ref.add_samples(pcm)
    while s_ref._ready():
        rec_a.get_results([s_ref])
    want = rec_a.get_results([s_ref])[0]

    # interrupted run: decode 2 chunks, snapshot, migrate, finish
    rec_b = OnlineRecognizer(bundle, compute_dtype=None, max_lanes=2)
    s1 = rec_b.create_online_stream()
    s1.add_samples(pcm)
    rec_b.get_results([s1])
    rec_b.get_results([s1])
    snap = rec_b.snapshot_stream(s1)

    rec_c = OnlineRecognizer(bundle, compute_dtype=None, max_lanes=2)
    s2 = rec_c.restore_stream(snap)
    while s2._ready():
        rec_c.get_results([s2])
    got = rec_c.get_results([s2])[0]

    assert got.text == want.text
    assert got.timestamps == want.timestamps


def test_int8_param_storage_roundtrip(tmp_path, bundle):
    p = str(tmp_path / "params_q8.npz")
    checkpoint.save_params(p, bundle.params, dtype="int8")
    loaded = checkpoint.load_params(p)
    flat_orig = checkpoint.flatten_params(bundle.params)
    flat_new = checkpoint.flatten_params(loaded)
    assert flat_orig.keys() == flat_new.keys()
    for k, v in flat_orig.items():
        if v.ndim >= 2 and v.size >= 1024:
            scale = np.abs(v).max() / 127.0
            np.testing.assert_allclose(flat_new[k], v, atol=scale * 0.51)
        else:
            np.testing.assert_array_equal(flat_new[k], v)
    # quantized file is materially smaller
    import os

    p32 = str(tmp_path / "params_f32.npz")
    checkpoint.save_params(p32, bundle.params)
    assert os.path.getsize(p) < 0.55 * os.path.getsize(p32)


# ---------------------------------------------------------------------------
# int8 COMPUTE path (accuracy="int8") — the reference's production execution
# mode (int8 ONNX, README.EN.md:276), here as int8 x int8 -> int32 matmuls
# ---------------------------------------------------------------------------


def test_apply_linear_int8_close_to_float():
    import jax
    import jax.numpy as jnp

    from k2transducerasr_tpu.ops import layers as L

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    p = L.init_linear(k1, 128, 96)
    x = jax.random.normal(k2, (4, 17, 128))
    want = np.asarray(L.apply_linear(p, x))
    got = np.asarray(L.apply_linear(L.quantize_linear_int8(p), x))
    # per-channel weight + per-token activation quantization: ~1% relative
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 0.02, err
    # zero input must not divide by zero
    z = np.asarray(L.apply_linear(L.quantize_linear_int8(p), jnp.zeros((2, 128))))
    assert np.all(np.isfinite(z))


def test_quantize_tree_targets_linears_only():
    import jax

    from k2transducerasr_tpu.models.zipformer2 import Zipformer2Config, init_params
    from k2transducerasr_tpu.ops.layers import quantize_tree_int8

    cfg = Zipformer2Config(
        num_encoder_layers=(1,), encoder_dims=(64,), downsampling_factors=(1,),
        num_heads=(2,), feedforward_dims=(96,), cnn_module_kernels=(7,),
        query_head_dim=8, value_head_dim=8, pos_head_dim=2, pos_dim=8,
        embed_channels=(2, 4, 8),
    )
    q = quantize_tree_int8(init_params(jax.random.PRNGKey(0), cfg), min_size=1024)
    flat = jax.tree_util.tree_flatten_with_path(q)[0]
    q8 = [jax.tree_util.keystr(p) for p, _ in flat if "w_q8" in jax.tree_util.keystr(p)]
    convs = [k for k in q8 if "conv" in k and "in_proj" not in k and "out" not in k]
    assert q8, "no linear was quantized"
    assert not convs, f"conv kernels must stay float: {convs}"


def test_int8_encoder_close_and_e2e(bundle):
    """accuracy='int8' encoder output stays within a few percent of the f32
    path, and the full recognizer decodes under it (offline + streaming
    agree with each other because both run the same quantized graph)."""
    import jax.numpy as jnp

    from k2transducerasr_tpu.frontend.fbank import fbank_compute, fbank_matrices, num_frames_jnp
    from k2transducerasr_tpu.ops.layers import quantize_tree_int8
    from k2transducerasr_tpu.runtime.offline import OfflineRecognizer

    import jax

    n = 8000
    pcm = _pcm(n, seed=3)
    fcfg = bundle.frontend_cfg
    t = (n - fcfg.frame_length) // fcfg.frame_shift + 1
    tables = tuple(jnp.asarray(m) for m in fbank_matrices(fcfg))
    feats = fbank_compute(jnp.asarray(pcm)[None], fcfg, t, tables=tables)
    lens = num_frames_jnp(jnp.asarray([n]), fcfg)
    enc = bundle.encoder
    out_f, _ = enc.forward(bundle.params["encoder"], bundle.encoder_cfg, feats, lens)
    out_q, _ = enc.forward(
        quantize_tree_int8(bundle.params["encoder"], min_size=1024),
        bundle.encoder_cfg, feats, lens,
    )
    err = np.linalg.norm(np.asarray(out_q) - np.asarray(out_f)) / np.linalg.norm(
        np.asarray(out_f)
    )
    assert err < 0.05, err

    rec = OfflineRecognizer(bundle, compute_dtype=None, accuracy="int8")
    s = rec.create_offline_stream()
    s.add_samples(pcm)
    res = rec.get_result(s)
    assert isinstance(res.text, str)

    with pytest.raises(ValueError):
        OfflineRecognizer(bundle, accuracy="fp8")


def test_int8_streaming_matches_offline_chunk_causal(bundle):
    """The streaming==offline oracle must hold under int8 compute too (same
    quantized graph both sides)."""
    rec = OnlineRecognizer(bundle, compute_dtype=None, accuracy="int8", max_lanes=2)
    s = rec.create_online_stream()
    s.add_samples(_pcm(rec.window_samples + 2 * rec.hop_samples, seed=4))
    while s._ready():
        rec.get_results([s])
    res = rec.get_results([s])[0]
    assert isinstance(res.text, str)
