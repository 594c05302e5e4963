"""Tests for the pure-Python ONNX reader + importer, using a minimal
protobuf ENCODER built here so no onnx package is needed."""

import struct

import numpy as np

from k2transducerasr_tpu.convert import onnx_proto
from k2transducerasr_tpu.convert.importer import (
    detect_model_type,
    encoder_config_from_metadata,
    import_decoder,
    import_joiner,
)


# -- tiny protobuf writer ----------------------------------------------------


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num: int, wire: int, payload: bytes) -> bytes:
    return _varint((num << 3) | wire) + payload


def _ld(num: int, data: bytes) -> bytes:  # length-delimited
    return _field(num, 2, _varint(len(data)) + data)


def _vint(num: int, v: int) -> bytes:
    return _field(num, 0, _varint(v))


def tensor_bytes(name: str, arr: np.ndarray) -> bytes:
    dt = {np.float32: 1, np.int8: 3, np.int64: 7, np.uint8: 2}[arr.dtype.type]
    msg = b"".join(_vint(1, d) for d in arr.shape)
    msg += _vint(2, dt)
    msg += _ld(8, name.encode())
    msg += _ld(9, arr.tobytes())
    return msg


def node_bytes(op: str, inputs, outputs) -> bytes:
    msg = b"".join(_ld(1, i.encode()) for i in inputs)
    msg += b"".join(_ld(2, o.encode()) for o in outputs)
    msg += _ld(4, op.encode())
    return msg


def model_bytes(metadata: dict, tensors: list, nodes: list = ()) -> bytes:
    graph = b"".join(_ld(5, t) for t in tensors)
    graph += b"".join(_ld(1, n) for n in nodes)
    msg = _ld(7, graph)
    for k, v in metadata.items():
        entry = _ld(1, k.encode()) + _ld(2, v.encode())
        msg += _ld(14, entry)
    return msg


# -- parser tests ------------------------------------------------------------


def test_parse_metadata_and_tensor():
    w = np.arange(6, dtype=np.float32).reshape(2, 3)
    data = model_bytes({"model_type": "lstm", "vocab_size": "500"}, [tensor_bytes("w", w)])
    m = onnx_proto.parse_model(data)
    assert m.metadata == {"model_type": "lstm", "vocab_size": "500"}
    np.testing.assert_array_equal(m.initializers["w"], w)


def test_parse_int64_tensor():
    a = np.array([3, -1, 10], dtype=np.int64)
    m = onnx_proto.parse_model(model_bytes({}, [tensor_bytes("x", a)]))
    np.testing.assert_array_equal(m.initializers["x"], a)


def test_float_data_packed_field():
    # tensor using float_data (field 4, packed fixed32) instead of raw_data
    vals = np.array([1.5, -2.25], dtype=np.float32)
    msg = _vint(1, 2) + _vint(2, 1) + _ld(8, b"f") + _ld(4, vals.tobytes())
    m = onnx_proto.parse_model(_ld(7, _ld(5, msg)))
    np.testing.assert_array_equal(m.initializers["f"], vals)


def test_qdq_dequant_per_tensor():
    q = np.array([[10, -20], [30, 40]], dtype=np.int8)
    scale = np.array(0.5, dtype=np.float32).reshape(())
    zp = np.array(10, dtype=np.int8).reshape(())
    tensors = [
        tensor_bytes("w_q", q),
        tensor_bytes("w_scale", scale.reshape(1)[0:1].reshape(())) if False else tensor_bytes("w_scale", np.asarray([0.5], np.float32).reshape(())),
        tensor_bytes("w_zp", np.asarray([10], np.int8).reshape(())),
    ]
    nodes = [node_bytes("DequantizeLinear", ["w_q", "w_scale", "w_zp"], ["w"])]
    m = onnx_proto.parse_model(model_bytes({}, tensors, nodes))
    deq = m.dequantized()
    np.testing.assert_allclose(deq["w"], (q.astype(np.int32) - 10) * 0.5)
    del scale, zp


def test_qdq_dequant_per_axis():
    q = np.array([[1, 2, 3], [4, 5, 6]], dtype=np.int8)
    scale = np.array([0.1, 0.2], dtype=np.float32)  # per-row
    tensors = [tensor_bytes("w_q", q), tensor_bytes("w_s", scale)]
    nodes = [node_bytes("DequantizeLinear", ["w_q", "w_s"], ["w"])]
    m = onnx_proto.parse_model(model_bytes({}, tensors, nodes))
    deq = m.dequantized()
    np.testing.assert_allclose(deq["w"], q.astype(np.float32) * scale[:, None])


# -- importer tests ----------------------------------------------------------


def test_detect_zipformer2ctc_rewrite():
    assert detect_model_type({"model_type": "zipformer2", "comment": "streaming ctc"}) == "zipformer2ctc"
    assert detect_model_type({"model_type": "zipformer2", "comment": ""}) == "zipformer2"


def test_encoder_config_zipformer2_streaming():
    cfg = encoder_config_from_metadata(
        {
            "model_type": "zipformer2",
            "decode_chunk_len": "64",
            "num_encoder_layers": "2,2,3,4,3,2",
            "encoder_dims": "192,256,384,512,384,256",
            "cnn_module_kernels": "31,31,15,15,15,31",
            "num_heads": "4,4,4,8,4,4",
            "query_head_dims": "32",
            "value_head_dims": "12",
            "left_context_len": "128,64,32,16,32,64",
        }
    )
    assert cfg.causal and cfg.chunk_size == 32
    assert cfg.encoder_dims == (192, 256, 384, 512, 384, 256)
    assert cfg.left_context_frames == 128


def test_encoder_config_lstm_and_conformer():
    lstm = encoder_config_from_metadata(
        {"model_type": "lstm", "d_model": "512", "rnn_hidden_size": "1024",
         "num_encoder_layers": "12", "decode_chunk_len": "32"}
    )
    assert lstm.d_model == 512 and lstm.rnn_hidden_size == 1024 and lstm.num_layers == 12
    conf = encoder_config_from_metadata(
        {"model_type": "conformer", "encoder_dim": "256", "num_encoder_layers": "8",
         "cnn_module_kernel": "31", "chunk_size": "16", "left_context": "64",
         "decode_chunk_len": "64"}
    )
    assert conf.causal and conf.d_model == 256 and conf.chunk_size == 16


def test_import_decoder_and_joiner():
    vocab, ddim, ctx = 50, 16, 2
    emb = np.random.default_rng(0).standard_normal((vocab, ddim)).astype(np.float32)
    conv = np.random.default_rng(1).standard_normal((ddim, 4, ctx)).astype(np.float32)
    dec = onnx_proto.parse_model(
        model_bytes(
            {"context_size": "2", "vocab_size": str(vocab)},
            [tensor_bytes("embedding.weight", emb), tensor_bytes("conv.weight", conv)],
        )
    )
    params, cfg = import_decoder(dec)
    assert cfg.vocab_size == vocab and cfg.decoder_dim == ddim and cfg.context_size == 2
    np.testing.assert_array_equal(params["embedding"]["table"], emb)
    assert params["conv"]["w"].shape == (ctx, 4, ddim)

    edim, jdim = 24, 20
    enc_w = np.random.default_rng(2).standard_normal((jdim, edim)).astype(np.float32)
    dec_w = np.random.default_rng(3).standard_normal((jdim, ddim)).astype(np.float32)
    out_w = np.random.default_rng(4).standard_normal((vocab, jdim)).astype(np.float32)
    out_b = np.zeros(vocab, np.float32)
    join = onnx_proto.parse_model(
        model_bytes(
            {"joiner_dim": str(jdim)},
            [
                tensor_bytes("encoder_proj.weight", enc_w),
                tensor_bytes("decoder_proj.weight", dec_w),
                tensor_bytes("output_linear.weight", out_w),
                tensor_bytes("output_linear.bias", out_b),
            ],
        )
    )
    jparams, jcfg = import_joiner(join)
    assert jcfg.joiner_dim == jdim and jcfg.vocab_size == vocab
    np.testing.assert_array_equal(jparams["encoder_proj"]["w"], enc_w.T)
    assert "b" in jparams["output"]

    # imported joiner actually runs through the real module
    import jax.numpy as jnp
    from k2transducerasr_tpu.models import joiner as joiner_mod

    logits = joiner_mod.forward(
        jparams, jnp.ones((1, edim)), jnp.ones((1, ddim))
    )
    assert logits.shape == (1, vocab)
