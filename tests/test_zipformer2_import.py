"""Round-trip test for the zipformer2 encoder weight mapping: emit a
synthetic icefall-style export (torch layouts + state_dict names) from a
known param pytree, import it, and require numerically identical forwards."""

import jax
import jax.numpy as jnp
import numpy as np

from k2transducerasr_tpu.convert.zipformer2_map import map_zipformer2_weights
from k2transducerasr_tpu.models import zipformer2

TINY = zipformer2.Zipformer2Config(
    feature_dim=80,
    num_encoder_layers=(1, 1),
    encoder_dims=(16, 24),
    downsampling_factors=(1, 2),
    num_heads=(2, 2),
    feedforward_dims=(24, 32),
    cnn_module_kernels=(7, 7),
    query_head_dim=4,
    value_head_dim=4,
    pos_head_dim=2,
    pos_dim=8,
    embed_channels=(2, 4, 8),
)


def _lin(w):  # [in,out] -> torch [out,in]
    return np.asarray(w).T


def _conv1d(w):  # [k,in/g,out] -> torch [out,in/g,k]
    return np.transpose(np.asarray(w), (2, 1, 0))


def _conv2d(w):  # [kh,kw,i,o] -> torch [o,i,kh,kw]
    return np.transpose(np.asarray(w), (3, 2, 0, 1))


def _export(params, cfg):
    w = {}
    emb = params["embed"]
    for i, name in zip((0, 3, 6), ("conv1", "conv2", "conv3")):
        w[f"encoder_embed.conv.{i}.weight"] = _conv2d(emb[name]["w"])
        w[f"encoder_embed.conv.{i}.bias"] = np.asarray(emb[name]["b"])
    # convnext depthwise: dense diagonal -> torch [C,1,7,7]
    dw = np.asarray(emb["convnext_dw"]["w"])
    c = dw.shape[-1]
    w["encoder_embed.convnext.depthwise_conv.weight"] = np.stack(
        [dw[:, :, ch, ch] for ch in range(c)]
    )[:, None]
    w["encoder_embed.convnext.depthwise_conv.bias"] = np.asarray(emb["convnext_dw"]["b"])
    w["encoder_embed.convnext.pointwise_conv1.weight"] = _lin(emb["convnext_pw1"]["w"])[
        :, :, None, None
    ]
    w["encoder_embed.convnext.pointwise_conv1.bias"] = np.asarray(emb["convnext_pw1"]["b"])
    w["encoder_embed.convnext.pointwise_conv2.weight"] = _lin(emb["convnext_pw2"]["w"])[
        :, :, None, None
    ]
    w["encoder_embed.convnext.pointwise_conv2.bias"] = np.asarray(emb["convnext_pw2"]["b"])
    w["encoder_embed.out.weight"] = _lin(emb["out"]["w"])
    w["encoder_embed.out.bias"] = np.asarray(emb["out"]["b"])
    w["encoder_embed.out_norm.bias"] = np.asarray(emb["out_norm"]["bias"])
    w["encoder_embed.out_norm.log_scale"] = np.asarray(emb["out_norm"]["log_scale"])

    pairs = {
        "self_attn_weights.in_proj": ("attn_weights", "in_proj"),
        "self_attn_weights.linear_pos": ("attn_weights", "pos_proj"),
        "self_attn1.in_proj": ("self_attn1", "v"),
        "self_attn1.out_proj": ("self_attn1", "out"),
        "self_attn2.in_proj": ("self_attn2", "v"),
        "self_attn2.out_proj": ("self_attn2", "out"),
        "nonlin_attention.in_proj": ("nonlin_attn", "in_proj"),
        "nonlin_attention.out_proj": ("nonlin_attn", "out"),
        "feed_forward1.in_proj": ("ff1", "w1"),
        "feed_forward1.out_proj": ("ff1", "w2"),
        "feed_forward2.in_proj": ("ff2", "w1"),
        "feed_forward2.out_proj": ("ff2", "w2"),
        "feed_forward3.in_proj": ("ff3", "w1"),
        "feed_forward3.out_proj": ("ff3", "w2"),
        "conv_module1.in_proj": ("conv1", "in_proj"),
        "conv_module1.out_proj": ("conv1", "out"),
        "conv_module2.in_proj": ("conv2", "in_proj"),
        "conv_module2.out_proj": ("conv2", "out"),
    }
    for s, stack in enumerate(params["stacks"]):
        wrap = "" if cfg.downsampling_factors[s] == 1 else "encoder."
        for l, layer in enumerate(stack["layers"]):
            base = f"encoder.encoders.{s}.{wrap}layers.{l}."
            for exp_name, (a, b) in pairs.items():
                w[base + exp_name + ".weight"] = _lin(layer[a][b]["w"])
                if "b" in layer[a][b]:
                    w[base + exp_name + ".bias"] = np.asarray(layer[a][b]["b"])
            for which in ("conv1", "conv2"):
                mod = "conv_module1" if which == "conv1" else "conv_module2"
                w[base + mod + ".depthwise_conv.weight"] = _conv1d(layer[which]["dw"]["w"])
                w[base + mod + ".depthwise_conv.bias"] = np.asarray(layer[which]["dw"]["b"])
            w[base + "norm.bias"] = np.asarray(layer["norm"]["bias"])
            w[base + "norm.log_scale"] = np.asarray(layer["norm"]["log_scale"])
            w[base + "bypass.bypass_scale"] = np.asarray(layer["bypass"])
            w[base + "bypass_mid.bypass_scale"] = np.asarray(layer["bypass_mid"])
        if "downsample_weights" in stack:
            w[f"encoder.encoders.{s}.downsample.bias"] = np.asarray(stack["downsample_weights"])
            w[f"encoder.encoders.{s}.out_combiner.bypass_scale"] = np.asarray(stack["bypass_out"])
    w["encoder.downsample_output.bias"] = np.asarray(params["downsample_output_weights"])
    return w


def test_roundtrip_import_exact_forward():
    src = jax.tree.map(np.asarray, zipformer2.init_params(jax.random.PRNGKey(7), TINY))
    export = _export(src, TINY)
    got, mapped, unmapped = map_zipformer2_weights(TINY, export)
    assert unmapped == [], unmapped
    assert len(mapped) == len(export)

    x = jax.random.normal(jax.random.PRNGKey(8), (2, 71, 80)) * 0.5
    lens = jnp.array([71, 55])
    out_src, l1 = zipformer2.forward(src, TINY, x, lens)
    out_got, l2 = zipformer2.forward(got, TINY, x, lens)
    np.testing.assert_allclose(np.asarray(out_src), np.asarray(out_got), rtol=1e-6, atol=1e-6)


def test_unmapped_names_are_reported():
    src = jax.tree.map(np.asarray, zipformer2.init_params(jax.random.PRNGKey(9), TINY))
    export = _export(src, TINY)
    export["encoder.some_unknown.weight"] = np.zeros((3, 3), np.float32)
    _, _, unmapped = map_zipformer2_weights(TINY, export)
    assert unmapped == ["encoder.some_unknown.weight"]


def test_fused_ctc_export_roundtrip(tmp_path):
    """Full convert_model_dir round-trip of a fused zipformer2-CTC export:
    the CTC head weights must be IMPORTED (not random) and the converted
    model's log-probs must equal the source model's exactly.  Guards the
    reference's zipformer2ctc family (OfflineProjOfZipformer2ctc.cs:48-92:
    fused graph, output[0] = log-probs)."""
    from test_onnx_import import model_bytes, tensor_bytes

    from k2transducerasr_tpu.convert.importer import convert_model_dir
    from k2transducerasr_tpu.models import ctc as ctc_mod
    from k2transducerasr_tpu.runtime.bundle import ModelBundle

    vocab = 12
    src = jax.tree.map(np.asarray, zipformer2.init_params(jax.random.PRNGKey(11), TINY))
    ctc_cfg = ctc_mod.CtcConfig(encoder_dim=TINY.encoder_out_dim, vocab_size=vocab)
    ctc_src = jax.tree.map(
        np.asarray, ctc_mod.init_params(jax.random.PRNGKey(12), ctc_cfg)
    )

    export = _export(src, TINY)
    # icefall AsrModel.ctc_output = Sequential(Dropout, Linear, LogSoftmax)
    export["ctc_output.1.weight"] = _lin(ctc_src["output"]["w"])
    export["ctc_output.1.bias"] = np.asarray(ctc_src["output"]["b"])

    meta = {
        "model_type": "zipformer2",
        "comment": "streaming ctc zipformer2",  # triggers zipformer2ctc rewrite
        "vocab_size": str(vocab),
        "num_encoder_layers": "1,1",
        "encoder_dims": "16,24",
        "cnn_module_kernels": "7,7",
        "num_heads": "2,2",
        "query_head_dims": "4,4",
        "value_head_dims": "4,4",
    }
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    tensors = [tensor_bytes(k, np.ascontiguousarray(v, np.float32)) for k, v in export.items()]
    (src_dir / "model.onnx").write_bytes(model_bytes(meta, tensors))
    with open(src_dir / "tokens.txt", "w") as f:
        for i in range(vocab):
            f.write(f"tok{i} {i}\n")

    dst = tmp_path / "dst"
    convert_model_dir(str(src_dir), str(dst))

    report = (dst / "IMPORT_REPORT.txt").read_text()
    assert "UNMAPPED" not in report, report
    assert "ctc head: imported" in report

    bundle = ModelBundle.from_dir(str(dst))
    assert bundle.model_type == "zipformer2ctc"
    assert bundle.ctc_cfg.vocab_size == vocab

    x = jax.random.normal(jax.random.PRNGKey(13), (2, 55, 80)) * 0.5
    lens = jnp.array([55, 40])
    enc_src, _ = zipformer2.forward(src, TINY, x, lens)
    enc_got, _ = zipformer2.forward(bundle.params["encoder"], bundle.encoder_cfg, x, lens)
    lp_src = ctc_mod.log_probs(ctc_src, enc_src)
    lp_got = ctc_mod.log_probs(bundle.params["ctc"], enc_got)
    np.testing.assert_allclose(np.asarray(lp_src), np.asarray(lp_got), rtol=1e-5, atol=1e-6)


def test_fused_ctc_export_missing_head_raises():
    from k2transducerasr_tpu.convert.importer import import_ctc_head

    import pytest

    with pytest.raises(KeyError, match="ctc_output"):
        import_ctc_head({"encoder.something.weight": np.zeros((2, 2), np.float32)})


def test_shape_mismatch_raises():
    src = jax.tree.map(np.asarray, zipformer2.init_params(jax.random.PRNGKey(10), TINY))
    export = _export(src, TINY)
    export["encoder_embed.out.weight"] = np.zeros((7, 7), np.float32)
    import pytest

    with pytest.raises(ValueError, match="shape mismatch"):
        map_zipformer2_weights(TINY, export)
