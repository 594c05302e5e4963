import numpy as np
import pytest

from k2transducerasr_tpu.models.conformer import ConformerConfig
from k2transducerasr_tpu.runtime.bundle import ModelBundle
from k2transducerasr_tpu.runtime.offline import OfflineRecognizer


@pytest.fixture(scope="module")
def bundle():
    cfg = ConformerConfig(
        feature_dim=80, d_model=64, num_layers=2, num_heads=4, ff_dim=96, cnn_kernel=7
    )
    return ModelBundle.random(
        "conformer", cfg, vocab_size=32, seed=0, decoder_dim=48, joiner_dim=40
    )


def _pcm(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    return (0.3 * np.sin(2 * np.pi * 300 * t) + 0.1 * rng.standard_normal(n)).astype(
        np.float32
    )


def test_e2e_single(bundle):
    rec = OfflineRecognizer(bundle, compute_dtype=None)
    s = rec.create_offline_stream()
    s.add_samples(_pcm(16000))
    res = rec.get_result(s)
    assert isinstance(res.text, str)
    assert len(res.tokens) == len(res.timestamps)
    # deterministic
    s2 = rec.create_offline_stream()
    s2.add_samples(_pcm(16000))
    assert rec.get_result(s2).text == res.text


def test_e2e_batch_matches_single(bundle):
    rec = OfflineRecognizer(bundle, compute_dtype=None)
    streams = []
    for i, n in enumerate([16000, 12000, 8000]):
        s = rec.create_offline_stream()
        s.add_samples(_pcm(n, seed=i))
        streams.append(s)
    batch = rec.get_results(streams)
    for i, n in enumerate([16000, 12000, 8000]):
        s = rec.create_offline_stream()
        s.add_samples(_pcm(n, seed=i))
        single = rec.get_result(s)
        assert single.text == batch[i].text
        assert single.timestamps == batch[i].timestamps


def test_ctc_model_forces_ctc_decoding(bundle):
    cfg = ConformerConfig(
        feature_dim=80, d_model=64, num_layers=1, num_heads=4, ff_dim=96, cnn_kernel=7
    )
    del cfg
    with pytest.raises(ValueError):
        OfflineRecognizer(bundle, decoding_method="fast_beam_search_nbest")


def test_bundle_save_load_roundtrip(tmp_path, bundle):
    d = str(tmp_path / "model")
    bundle.save(d)
    loaded = ModelBundle.from_dir(d)
    assert loaded.model_type == "conformer"
    assert loaded.encoder_cfg == bundle.encoder_cfg
    assert loaded.decoder_cfg == bundle.decoder_cfg

    rec1 = OfflineRecognizer(bundle, compute_dtype=None)
    rec2 = OfflineRecognizer(loaded, compute_dtype=None)
    s1, s2 = rec1.create_offline_stream(), rec2.create_offline_stream()
    s1.add_samples(_pcm(9000))
    s2.add_samples(_pcm(9000))
    assert rec1.get_result(s1).text == rec2.get_result(s2).text


def test_reference_pad_unit():
    """apply_reference_pad reproduces PadHelper.cs:17-58 semantics: pad
    frames -> ln(1e-10), exact zeros -> ln(1e-10), all lanes claim
    max(lens)+19 (capped at the buffer)."""
    import jax.numpy as jnp

    from k2transducerasr_tpu.runtime.offline import (
        REFERENCE_PAD_FILL,
        apply_reference_pad,
    )

    feats = jnp.ones((2, 64, 4))
    feats = feats.at[0, 10:, :].set(0.0)  # lane 0 pads from frame 10
    feats = feats.at[1, 3, 2].set(0.0)  # a true zero inside valid region
    lens = jnp.array([10, 30])
    out, out_lens = apply_reference_pad(feats, lens)
    assert out_lens.tolist() == [49, 49]  # max(10,30)+19
    np.testing.assert_allclose(np.asarray(out[0, 10:]), REFERENCE_PAD_FILL)
    np.testing.assert_allclose(np.asarray(out[1, 30:]), REFERENCE_PAD_FILL)
    assert float(out[1, 3, 2]) == pytest.approx(REFERENCE_PAD_FILL)
    np.testing.assert_allclose(np.asarray(out[0, :10]), 1.0)
    # cap at the buffer length
    _, capped = apply_reference_pad(feats, jnp.array([60, 64]))
    assert capped.tolist() == [64, 64]


def test_reference_pad_compat_toggle(bundle):
    """The switch is live end-to-end: equal-length lanes stay batch-
    invariant under compat; a padded batch decodes (claimed tail frames
    included) without error."""
    rec_on = OfflineRecognizer(
        bundle, compute_dtype=None, reference_pad_compat=True
    )
    # equal lengths: batch == singles under compat
    s1, s2 = rec_on.create_offline_stream(), rec_on.create_offline_stream()
    s1.add_samples(_pcm(16000, 1))
    s2.add_samples(_pcm(16000, 2))
    both = rec_on.get_results([s1, s2])
    t1, t2 = rec_on.create_offline_stream(), rec_on.create_offline_stream()
    t1.add_samples(_pcm(16000, 1))
    t2.add_samples(_pcm(16000, 2))
    singles = [rec_on.get_result(t1), rec_on.get_result(t2)]
    assert [r.tokens for r in both] == [r.tokens for r in singles]
    # ragged batch decodes; every lane claims the same padded length
    s3, s4 = rec_on.create_offline_stream(), rec_on.create_offline_stream()
    s3.add_samples(_pcm(8000, 3))
    s4.add_samples(_pcm(20000, 4))
    ragged = rec_on.get_results([s3, s4])
    assert len(ragged) == 2
    assert all(isinstance(r.text, str) for r in ragged)
