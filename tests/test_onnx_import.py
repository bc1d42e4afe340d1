"""ONNX importer tests: protobuf wire-format round trip + model mapping.

No ``onnx`` package exists in this environment (and torch.onnx.export
requires it), so these tests serialize minimal ONNX ModelProto bytes with a
local writer and feed them to the from-scratch parser.
"""

import struct

import numpy as np
import pytest

from larynx_tpu.convert.onnx_import import (
    glow_tts_params_from_onnx,
    onnx_state_dict,
    read_onnx_graph,
)

# --- minimal protobuf writer (test-only) --------------------------------------


def _varint(value: int) -> bytes:
    out = b""
    while True:
        byte = value & 0x7F
        value >>= 7
        if value:
            out += bytes([byte | 0x80])
        else:
            out += bytes([byte])
            return out


def _field(num: int, wire: int) -> bytes:
    return _varint((num << 3) | wire)


def _len_field(num: int, payload: bytes) -> bytes:
    return _field(num, 2) + _varint(len(payload)) + payload


_DTYPE_CODES = {
    np.dtype(np.float32): 1,
    np.dtype(np.int64): 7,
    np.dtype(np.float16): 10,
}


def _tensor_proto(name: str, array: np.ndarray, use_raw: bool = True) -> bytes:
    out = b""
    for dim in array.shape:
        out += _field(1, 0) + _varint(dim)
    out += _field(2, 0) + _varint(_DTYPE_CODES[array.dtype])
    out += _len_field(8, name.encode("utf-8"))
    if use_raw:
        out += _len_field(9, array.astype(array.dtype.newbyteorder("<")).tobytes())
    elif array.dtype == np.float32:
        packed = struct.pack(f"<{array.size}f", *array.reshape(-1))
        out += _len_field(4, packed)
    else:
        raise NotImplementedError
    return out


def _attr_proto(name: str, value) -> bytes:
    out = _len_field(1, name.encode())
    if isinstance(value, int):
        out += _field(3, 0) + _varint(value & ((1 << 64) - 1))
    elif isinstance(value, (list, tuple)):  # ints (packed)
        payload = b"".join(_varint(v & ((1 << 64) - 1)) for v in value)
        out += _len_field(8, payload)
    else:
        raise NotImplementedError(type(value))
    return out


def _node_proto(op_type: str, inputs, outputs, attrs=None) -> bytes:
    out = b""
    for i in inputs:
        out += _len_field(1, i.encode())
    for o in outputs:
        out += _len_field(2, o.encode())
    out += _len_field(4, op_type.encode())
    for name, value in (attrs or {}).items():
        out += _len_field(5, _attr_proto(name, value))
    return out


def make_onnx_bytes(initializers, nodes=()) -> bytes:
    graph = b""
    for node in nodes:
        op, ins, outs = node[:3]
        attrs = node[3] if len(node) > 3 else None
        graph += _len_field(1, _node_proto(op, ins, outs, attrs))
    for name, array in initializers.items():
        use_raw = hash(name) % 2 == 0  # exercise both encodings
        if not use_raw and array.dtype != np.float32:
            use_raw = True
        graph += _len_field(5, _tensor_proto(name, array, use_raw))
    model = _field(1, 0) + _varint(7)  # ir_version
    model += _len_field(7, graph)
    return model


# -------------------------------------------------------------------------------


def test_roundtrip_initializers(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "a.weight": rng.standard_normal((4, 3, 5)).astype(np.float32),
        "b.bias": rng.standard_normal(7).astype(np.float32),
        "c.ids": np.arange(6, dtype=np.int64).reshape(2, 3),
        "d.half": rng.standard_normal((2, 2)).astype(np.float16),
    }
    path = tmp_path / "model.onnx"
    path.write_bytes(
        make_onnx_bytes(tensors, nodes=[("MatMul", ["x", "a.weight"], ["y"])])
    )

    init, nodes = read_onnx_graph(path)
    assert len(nodes) == 1
    assert nodes[0]["op_type"] == "MatMul"
    for name, array in tensors.items():
        np.testing.assert_array_equal(init[name], array)


def test_prefix_stripping(tmp_path):
    tensors = {"model.encoder.emb.weight": np.zeros((3, 2), dtype=np.float32)}
    path = tmp_path / "model.onnx"
    path.write_bytes(make_onnx_bytes(tensors))
    sd = onnx_state_dict(path)
    assert "encoder.emb.weight" in sd


def _wn_fixture(rng, out_ch=16, in_ch=8, k=3):
    """weight_g [C,1,1] + weight_v [C,in,k] and the folded torch semantics."""
    g = rng.standard_normal((out_ch, 1, 1)).astype(np.float32)
    v = rng.standard_normal((out_ch, in_ch, k)).astype(np.float32)
    norm = np.sqrt(np.sum(v * v, axis=(1, 2), keepdims=True))
    return g, v, g * v / norm


def test_fold_weight_norm_reducel2_spelling(tmp_path):
    """Mul(g, Div(v, ReduceL2(v))) in-graph weight norm folds to .weight."""
    rng = np.random.default_rng(1)
    g, v, expected = _wn_fixture(rng)
    init = {"conv.weight_g": g, "conv.weight_v": v}
    nodes = [
        ("ReduceL2", ["conv.weight_v"], ["norm"], {"axes": [1, 2], "keepdims": 1}),
        ("Div", ["conv.weight_v", "norm"], ["unit_v"]),
        ("Mul", ["conv.weight_g", "unit_v"], ["w"]),
        ("Conv", ["x", "w"], ["y"], {"dilations": [1]}),
    ]
    path = tmp_path / "m.onnx"
    path.write_bytes(make_onnx_bytes(init, nodes))
    sd = onnx_state_dict(path)
    np.testing.assert_allclose(sd["conv.weight"], expected, rtol=1e-6)


def test_fold_weight_norm_pow_reducesum_spelling(tmp_path):
    """Older exporter spelling: Pow -> ReduceSum -> Sqrt -> Div -> Mul."""
    rng = np.random.default_rng(2)
    g, v, expected = _wn_fixture(rng, out_ch=8, in_ch=4, k=5)
    init = {
        "ups.0.weight_g": g,
        "ups.0.weight_v": v,
        "two": np.asarray(2.0, dtype=np.float32),
    }
    nodes = [
        ("Pow", ["ups.0.weight_v", "two"], ["sq"]),
        ("ReduceSum", ["sq"], ["ssq"], {"axes": [1, 2], "keepdims": 1}),
        ("Sqrt", ["ssq"], ["norm"]),
        ("Div", ["ups.0.weight_v", "norm"], ["unit_v"]),
        ("Mul", ["ups.0.weight_g", "unit_v"], ["w"]),
        ("ConvTranspose", ["x", "w"], ["y"], {"strides": [2]}),
    ]
    path = tmp_path / "m.onnx"
    path.write_bytes(make_onnx_bytes(init, nodes))
    sd = onnx_state_dict(path)
    np.testing.assert_allclose(sd["ups.0.weight"], expected, rtol=1e-6)


def test_fold_weight_norm_matches_torch_remove_weight_norm(reference_torch, tmp_path):
    """Node-folded weights equal torch's remove_weight_norm output."""
    import torch
    from torch.nn.utils import remove_weight_norm, weight_norm

    torch.manual_seed(3)
    conv = weight_norm(torch.nn.Conv1d(8, 16, 3))
    g = conv.weight_g.detach().numpy().copy()
    v = conv.weight_v.detach().numpy().copy()
    remove_weight_norm(conv)
    expected = conv.weight.detach().numpy()

    init = {"c.weight_g": g, "c.weight_v": v}
    nodes = [
        ("ReduceL2", ["c.weight_v"], ["n"], {"axes": [1, 2], "keepdims": 1}),
        ("Div", ["c.weight_v", "n"], ["u"]),
        ("Mul", ["c.weight_g", "u"], ["w"]),
        ("Conv", ["x", "w"], ["y"]),
    ]
    path = tmp_path / "m.onnx"
    path.write_bytes(make_onnx_bytes(init, nodes))
    sd = onnx_state_dict(path)
    np.testing.assert_allclose(sd["c.weight"], expected, rtol=1e-5, atol=1e-7)


def test_glow_tts_from_onnx_matches_torch_converter(reference_torch, tmp_path):
    """A full GlowTTS state dict serialized as ONNX initializers must
    convert identically to the direct torch path."""
    import torch

    from glow_tts.models import FlowGenerator

    from larynx_tpu.convert.torch_import import glow_tts_params_from_state_dict
    from larynx_tpu.models.glow_tts import GlowTTSConfig

    cfg = GlowTTSConfig(
        hidden_channels=64,
        filter_channels=128,
        filter_channels_dp=64,
        n_layers_enc=2,
        n_blocks_dec=2,
        n_block_layers=2,
    )
    torch.manual_seed(0)
    model = FlowGenerator(
        n_vocab=cfg.num_symbols,
        hidden_channels=cfg.hidden_channels,
        filter_channels=cfg.filter_channels,
        filter_channels_dp=cfg.filter_channels_dp,
        out_channels=cfg.mel_channels,
        n_heads=cfg.n_heads,
        n_layers_enc=cfg.n_layers_enc,
        n_blocks_dec=cfg.n_blocks_dec,
        kernel_size_dec=cfg.kernel_size_dec,
        dilation_rate=cfg.dilation_rate,
        n_block_layers=cfg.n_block_layers,
        n_split=cfg.n_split,
        n_sqz=cfg.n_sqz,
        window_size=cfg.window_size,
        mean_only=cfg.mean_only,
        prenet=cfg.prenet,
    )
    sd = {k: v.detach().float().numpy() for k, v in model.state_dict().items()}

    path = tmp_path / "generator.onnx"
    path.write_bytes(make_onnx_bytes(sd))

    via_onnx = glow_tts_params_from_onnx(path, cfg)
    via_torch = glow_tts_params_from_state_dict(sd, cfg)

    import jax

    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_flatten_with_path(via_onnx)[0],
        jax.tree_util.tree_flatten_with_path(via_torch)[0],
    ):
        assert str(p1) == str(p2)
        np.testing.assert_allclose(a, b, rtol=1e-6, err_msg=str(p1))
