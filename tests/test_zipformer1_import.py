import jax
import jax.numpy as jnp
import numpy as np

from k2transducerasr_tpu.convert.zipformer1_map import map_zipformer1_weights
from k2transducerasr_tpu.models import zipformer

TINY = zipformer.ZipformerConfig(
    feature_dim=80,
    num_encoder_layers=(1, 2),
    encoder_dims=(16, 16),
    attention_dims=(8, 8),
    downsampling_factors=(1, 2),
    num_heads=(2, 2),
    feedforward_dims=(24, 24),
    cnn_module_kernels=(5, 5),
    pos_dim=2,
    embed_channels=(2, 4, 8),
)


def _lin(w):
    return np.asarray(w).T


def _conv2d(w):
    return np.transpose(np.asarray(w), (3, 2, 0, 1))


def _conv1d(w):
    return np.transpose(np.asarray(w), (2, 1, 0))


def _export(p, cfg):
    w = {}
    for i, name in zip((0, 2, 4), ("conv1", "conv2", "conv3")):
        w[f"encoder_embed.conv.{i}.weight"] = _conv2d(p["embed"][name]["w"])
        w[f"encoder_embed.conv.{i}.bias"] = np.asarray(p["embed"][name]["b"])
    w["encoder_embed.out.weight"] = _lin(p["embed"]["out"]["w"])
    w["encoder_embed.out.bias"] = np.asarray(p["embed"]["out"]["b"])
    lin = {
        "self_attn.in_proj": ("attn", "in_proj"),
        "self_attn.linear_pos": ("attn", "pos_proj"),
        "self_attn.linear_v": ("attn", "v1"),
        "self_attn.out_proj": ("attn", "out1"),
        "self_attn.in_proj2": ("attn", "v2"),
        "self_attn.out_proj2": ("attn", "out2"),
        "pooling.proj": ("pooling", "proj"),
        "feed_forward1.in_proj": ("ff1", "w1"),
        "feed_forward1.out_proj": ("ff1", "w2"),
        "feed_forward2.in_proj": ("ff2", "w1"),
        "feed_forward2.out_proj": ("ff2", "w2"),
        "feed_forward3.in_proj": ("ff3", "w1"),
        "feed_forward3.out_proj": ("ff3", "w2"),
    }
    for s, stack in enumerate(p["stacks"]):
        wrap = "" if cfg.downsampling_factors[s] == 1 else "encoder."
        for l, layer in enumerate(stack["layers"]):
            base = f"encoder.encoders.{s}.{wrap}layers.{l}."
            for exp, (a, b_) in lin.items():
                w[base + exp + ".weight"] = _lin(layer[a][b_]["w"])
                if "b" in layer[a][b_]:
                    w[base + exp + ".bias"] = np.asarray(layer[a][b_]["b"])
            for which, mod in (("conv1", "conv_module1"), ("conv2", "conv_module2")):
                w[base + mod + ".pointwise_conv1.weight"] = _lin(layer[which]["pw1"]["w"])[:, :, None]
                w[base + mod + ".pointwise_conv1.bias"] = np.asarray(layer[which]["pw1"]["b"])
                w[base + mod + ".depthwise_conv.weight"] = _conv1d(layer[which]["dw"]["w"])
                w[base + mod + ".depthwise_conv.bias"] = np.asarray(layer[which]["dw"]["b"])
                w[base + mod + ".pointwise_conv2.weight"] = _lin(layer[which]["pw2"]["w"])[:, :, None]
                w[base + mod + ".pointwise_conv2.bias"] = np.asarray(layer[which]["pw2"]["b"])
            w[base + "norm_final.eps"] = np.exp(np.asarray(layer["norm"]["eps_log"]))
        if "downsample_weights" in stack:
            w[f"encoder.encoders.{s}.downsample.bias"] = np.asarray(stack["downsample_weights"])
            w[f"encoder.encoders.{s}.bypass_scale"] = np.asarray(stack["bypass_scale"])
    return w


def test_roundtrip():
    src = jax.tree.map(np.asarray, zipformer.init_params(jax.random.PRNGKey(11), TINY))
    export = _export(src, TINY)
    got, mapped, unmapped = map_zipformer1_weights(TINY, export)
    assert unmapped == [], unmapped
    x = jax.random.normal(jax.random.PRNGKey(12), (2, 55, 80)) * 0.5
    lens = jnp.array([55, 55])
    out_src, _ = zipformer.forward(src, TINY, x, lens)
    out_got, _ = zipformer.forward(got, TINY, x, lens)
    np.testing.assert_allclose(np.asarray(out_src), np.asarray(out_got), rtol=1e-5, atol=1e-5)
