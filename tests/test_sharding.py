"""Multi-chip correctness on the 8-virtual-device CPU mesh (conftest forces
--xla_force_host_platform_device_count=8): the PRODUCTION decode paths —
offline blank-skip greedy, the streaming lane-pool step, modified beam
search — must produce token-identical results sharded vs unsharded, params
must round-trip the TP rule bitwise, and snapshot/restore must migrate a
stream across recognizers on DIFFERENT meshes (the elasticity story,
SURVEY.md §5).  The reference has no distribution of any kind (§2.3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from k2transducerasr_tpu.models.zipformer2 import Zipformer2Config
from k2transducerasr_tpu.parallel import sharding as sh
from k2transducerasr_tpu.runtime.bundle import ModelBundle
from k2transducerasr_tpu.runtime.offline import OfflineRecognizer
from k2transducerasr_tpu.runtime.online import OnlineRecognizer

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-virtual-device CPU topology"
)


def _tiny_bundle(causal: bool, vocab: int = 64, model_type: str = "zipformer2"):
    cfg = Zipformer2Config(
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
        causal=causal,
        chunk_size=8,
        left_context_frames=16,
    )
    return ModelBundle.random(model_type, cfg, vocab_size=vocab, seed=0,
                              decoder_dim=32, joiner_dim=32)


def _pcm(n, seed):
    t = np.arange(n) / 16000.0
    rng = np.random.default_rng(seed)
    return (0.3 * np.sin(2 * np.pi * (200 + 40 * seed) * t)
            + 0.05 * rng.standard_normal(n)).astype(np.float32)


def _offline_tokens(rec, n_streams=5, seconds=1.0):
    streams = []
    for i in range(n_streams):
        s = rec.create_offline_stream()
        s.add_samples(_pcm(int(16000 * seconds), i))
        streams.append(s)
    return [(r.tokens, r.timestamps) for r in rec.get_results(streams)]


def test_param_tp_sharding_roundtrip():
    bundle = _tiny_bundle(causal=False)
    mesh = sh.make_mesh(4, 2)
    sharded = sh.shard_params(bundle.params, mesh)
    # at least one leaf actually TP-sharded (not fully replicated)
    n_sharded = sum(
        1 for leaf in jax.tree.leaves(sharded)
        if not leaf.sharding.is_fully_replicated
    )
    assert n_sharded > 0
    orig = jax.tree.leaves(jax.tree.map(np.asarray, bundle.params))
    back = jax.tree.leaves(jax.tree.map(np.asarray, sharded))
    for a, b in zip(orig, back):
        np.testing.assert_array_equal(a, b)


def test_decoder_joiner_params_replicate():
    """Root-cause regression (round 3): GSPMD computes garbage for a grouped
    conv whenever its INPUT feature axis is sharded, even with the kernel
    replicated; the decoder's context conv is grouped, so any feature-axis
    TP shard on an adjacent decoder/joiner leaf corrupts greedy decode.
    The TP rule must therefore replicate those subtrees wholesale."""
    bundle = _tiny_bundle(causal=False)
    mesh = sh.make_mesh(4, 2)
    specs = sh.param_shardings(bundle.params, mesh)
    for sub in ("decoder", "joiner"):
        for leaf in jax.tree.leaves(specs[sub]):
            assert leaf.is_fully_replicated


def test_grouped_conv_feature_sharded_input_is_wrong():
    """Pin the measured GSPMD defect the replication rule guards against:
    if this ever starts passing with a tight tolerance, the workaround can
    be revisited."""
    from k2transducerasr_tpu.ops import layers as L
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = sh.make_mesh(4, 2)
    rng = np.random.default_rng(0)
    p = L.init_conv1d(jax.random.PRNGKey(0), 32, 32, kernel=2, groups=8, bias=False)
    x = jnp.asarray(rng.standard_normal((8, 2, 32)).astype(np.float32))
    f = jax.jit(lambda p, x: L.apply_conv1d(p, x, groups=8, padding="VALID"))
    base = f(p, x)
    p_r = jax.tree.map(lambda a: jax.device_put(a, NamedSharding(mesh, P())), p)
    x_s = jax.device_put(x, NamedSharding(mesh, P(None, None, "model")))
    got = f(p_r, x_s)
    diff = float(jnp.abs(base - got).max())
    if diff < 1e-5:
        pytest.xfail(
            "GSPMD grouped-conv feature sharding is now correct on this "
            "backend; the decoder/joiner replication rule may be relaxable"
        )
    assert diff > 0.1  # the defect is gross corruption, not roundoff


def test_offline_greedy_sharded_equals_unsharded():
    bundle = _tiny_bundle(causal=False)
    # f32 compute: reduction-order differences between the sharded and
    # unsharded programs must stay far below argmax-flipping magnitude
    base = OfflineRecognizer(bundle, compute_dtype=jnp.float32)
    mesh = sh.make_mesh(4, 2)
    dist = OfflineRecognizer(bundle, compute_dtype=jnp.float32, mesh=mesh)
    want = _offline_tokens(base)  # 5 streams: exercises DP pad to 8 lanes
    got = _offline_tokens(dist)
    assert want == got


def test_offline_beam_sharded_equals_unsharded():
    bundle = _tiny_bundle(causal=False)
    base = OfflineRecognizer(
        bundle, decoding_method="modified_beam_search", compute_dtype=jnp.float32
    )
    mesh = sh.make_mesh(2, 2)
    dist = OfflineRecognizer(
        bundle, decoding_method="modified_beam_search", compute_dtype=jnp.float32,
        mesh=mesh,
    )
    want = _offline_tokens(base, n_streams=3)
    got = _offline_tokens(dist, n_streams=3)
    assert want == got


def test_offline_ctc_sharded_equals_unsharded():
    bundle = _tiny_bundle(causal=False, model_type="zipformer2ctc")
    base = OfflineRecognizer(bundle, compute_dtype=jnp.float32)
    mesh = sh.make_mesh(4, 2)
    dist = OfflineRecognizer(bundle, compute_dtype=jnp.float32, mesh=mesh)
    assert _offline_tokens(base, n_streams=3) == _offline_tokens(dist, n_streams=3)


def _stream_tokens(rec, pcms, chunk=1600):
    streams = []
    for pcm in pcms:
        s = rec.create_online_stream()
        streams.append((s, pcm))
    results = {}
    for s, pcm in streams:
        for i in range(0, len(pcm), chunk):
            s.add_samples(pcm[i : i + chunk])
            rec.get_results([s])
        r = rec.decode_to_end(s)
        results[id(s)] = (r.tokens, r.timestamps)
        rec.dispose_stream(s)
    return [results[id(s)] for s, _ in streams]


def test_streaming_lane_pool_sharded_equals_unsharded():
    bundle = _tiny_bundle(causal=True)
    pcms = [_pcm(16000, i) for i in range(3)]
    base = OnlineRecognizer(bundle, compute_dtype=jnp.float32, max_lanes=8)
    want = _stream_tokens(base, pcms)
    mesh = sh.make_mesh(4, 2)
    dist = OnlineRecognizer(bundle, compute_dtype=jnp.float32, max_lanes=8, mesh=mesh)
    got = _stream_tokens(dist, pcms)
    assert want == got


def test_online_mesh_requires_divisible_lanes():
    bundle = _tiny_bundle(causal=True)
    with pytest.raises(ValueError, match="multiple of the mesh"):
        OnlineRecognizer(bundle, max_lanes=6, mesh=sh.make_mesh(4, 2))


def test_snapshot_migrates_across_meshes():
    """Stream decoded half on mesh A, snapshotted, restored on mesh B, and
    drained must equal the same stream decoded end-to-end unsharded."""
    bundle = _tiny_bundle(causal=True)
    pcm = _pcm(16000, 7)
    half = len(pcm) // 2

    ref = OnlineRecognizer(bundle, compute_dtype=jnp.float32, max_lanes=4)
    s = ref.create_online_stream()
    s.add_samples(pcm)
    want = ref.decode_to_end(s)

    rec_a = OnlineRecognizer(
        bundle, compute_dtype=jnp.float32, max_lanes=4, mesh=sh.make_mesh(2, 1)
    )
    sa = rec_a.create_online_stream()
    sa.add_samples(pcm[:half])
    rec_a.get_results([sa])
    snap = rec_a.snapshot_stream(sa)

    rec_b = OnlineRecognizer(
        bundle, compute_dtype=jnp.float32, max_lanes=8, mesh=sh.make_mesh(4, 2)
    )
    sb = rec_b.restore_stream(snap)
    sb.add_samples(pcm[half:])
    got = rec_b.decode_to_end(sb)
    assert (want.tokens, want.timestamps) == (got.tokens, got.timestamps)


def test_host_local_batch_to_global_single_process():
    from k2transducerasr_tpu.parallel.distributed import host_local_batch_to_global

    mesh = sh.make_mesh(4, 2)
    local = np.arange(8 * 5, dtype=np.float32).reshape(8, 5)
    arr = host_local_batch_to_global(mesh, local)
    assert arr.shape == (8, 5)
    assert not arr.sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(arr), local)
