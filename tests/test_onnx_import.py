"""ONNX importer tests: protobuf wire-format round trip + model mapping.

No ``onnx`` package exists in this environment (and torch.onnx.export
requires it), so these tests serialize minimal ONNX ModelProto bytes with a
local writer and feed them to the from-scratch parser.
"""

import struct

import zlib

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
    if isinstance(value, bool):
        out += _field(3, 0) + _varint(int(value))
    elif isinstance(value, int):
        out += _field(3, 0) + _varint(value & ((1 << 64) - 1))
    elif isinstance(value, float):
        out += _field(2, 5) + struct.pack("<f", value)
    elif isinstance(value, bytes):
        out += _len_field(4, value)
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
        # exercise both encodings — crc32, not hash(): PYTHONHASHSEED
        # randomizes str hashes per process, making runs differ
        use_raw = zlib.crc32(name.encode()) % 2 == 0
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


# --- torch-1.8-faithful traced-export fixture ---------------------------------
#
# The reference loaded real `generator.onnx` files exported by
# glow-tts-train with torch.onnx.export (larynx/glow_tts.py:98-100).  No
# released checkpoint exists in this environment, so this fixture
# reconstructs the SHAPE of such an export: parameter initializers with
# their state-dict names, weight-norm emitted in-graph (weight_g/weight_v
# + Mul/Div/ReduceL2 feeding Conv), trace-numbered activation names, and
# the full zoo of op spellings a traced FlowGenerator contains (Gather
# embedding, Conv with explicit pads/dilations, rel-attn MatMul/Softmax,
# the opset-11 LayerNorm chain, Unsqueeze/Squeeze/Slice/Split/Concat as
# nodes, Where/Equal masking, Pad, Exp).


def _traced_flowgen_nodes(sd, wn_bases):
    """Trace-shaped node list (activation names are numeric like torch's)."""
    nodes = []
    act = iter(range(100, 1000))

    def nm():
        return str(next(act))

    # embedding lookup + scale
    h = nm()
    nodes.append(("Gather", ["emb.weight", "input_ids"], [h], {"axis": 0}))
    h2 = nm()
    nodes.append(("Mul", [h, "emb_scale"], [h2]))
    t0 = nm()
    nodes.append(("Transpose", [h2], [t0], {"perm": [0, 2, 1]}))

    # in-graph weight norm feeding each decoder WN conv
    for base in wn_bases:
        norm = nm()
        nodes.append(
            ("ReduceL2", [base + ".weight_v"], [norm], {"axes": [1, 2], "keepdims": 1})
        )
        unit = nm()
        nodes.append(("Div", [base + ".weight_v", norm], [unit]))
        w = f"onnx::Conv_{next(act)}"
        nodes.append(("Mul", [base + ".weight_g", unit], [w]))
        c = nm()
        nodes.append(
            (
                "Conv",
                [t0, w, base + ".bias"],
                [c],
                {"dilations": [1], "group": 1, "kernel_shape": [1], "pads": [0, 0], "strides": [1]},
            )
        )
        t0 = c

    # plain Conv with explicit attrs (prenet)
    c2 = nm()
    nodes.append(
        (
            "Conv",
            [t0, "encoder.prenet.conv_layers.0.weight", "encoder.prenet.conv_layers.0.bias"],
            [c2],
            {"dilations": [1], "group": 1, "kernel_shape": [5], "pads": [2, 2], "strides": [1]},
        )
    )
    r = nm()
    nodes.append(("Relu", [c2], [r]))

    # opset-11 LayerNorm chain (torch 1.8 spells LN out)
    mean = nm()
    nodes.append(("ReduceMean", [r], [mean], {"axes": [1], "keepdims": 1}))
    sub = nm()
    nodes.append(("Sub", [r, mean], [sub]))
    var = nm()
    nodes.append(("ReduceMean", [sub], [var], {"axes": [1], "keepdims": 1}))
    add = nm()
    nodes.append(("Add", [var, "ln_eps"], [add]))
    std = nm()
    nodes.append(("Sqrt", [add], [std]))
    normed = nm()
    nodes.append(("Div", [sub, std], [normed]))

    # rel-pos attention spellings
    q = nm()
    nodes.append(("MatMul", [normed, "encoder.encoder.attn_layers.0.conv_q.weight"], [q]))
    soft = nm()
    nodes.append(("Softmax", [q], [soft], {"axis": 3}))
    u1 = nm()
    nodes.append(("Unsqueeze", [soft], [u1], {"axes": [0]}))
    s1 = nm()
    nodes.append(("Squeeze", [u1], [s1], {"axes": [0]}))
    p1 = nm()
    nodes.append(("Pad", [s1, "pad_amounts"], [p1], {"mode": b"constant"}))
    sl = nm()
    nodes.append(("Slice", [p1, "slice_starts", "slice_ends", "slice_axes"], [sl]))

    # masking / flow math spellings
    eq = nm()
    nodes.append(("Equal", [sl, "zero_i64"], [eq]))
    wh = nm()
    nodes.append(("Where", [eq, sl, sl], [wh]))
    ex = nm()
    nodes.append(("Exp", [wh], [ex]))
    sp1, sp2 = nm(), nm()
    nodes.append(("Split", [ex], [sp1, sp2], {"axis": 1, "split": [1, 1]}))
    cc = nm()
    nodes.append(("Concat", [sp1, sp2], [cc], {"axis": 1}))
    sig = nm()
    nodes.append(("Sigmoid", [cc], [sig]))
    th = nm()
    nodes.append(("Tanh", [sig], [th]))
    cast = nm()
    nodes.append(("Cast", [th], [cast], {"to": 1}))
    nodes.append(("LeakyRelu", [cast], ["output"], {"alpha": 0.1}))
    return nodes


def test_torch_faithful_traced_export(reference_torch, tmp_path):
    """A trace-shaped export (in-graph weight norm, numeric activation
    names, full op zoo) must import bit-equal to the torch converter."""
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
    torch.manual_seed(1)
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

    # every weight-norm'd conv in the first decoder block goes through the
    # in-graph spelling; its folded .weight must come back bit-equal
    wn_bases = sorted(
        k[: -len(".weight_g")]
        for k in sd
        if k.endswith(".weight_g") and ".flows.2." in k
    )
    assert wn_bases, "expected weight-norm'd decoder convs in the state dict"

    init = dict(sd)
    extras = {
        "emb_scale": np.asarray([np.sqrt(cfg.hidden_channels)], np.float32),
        "ln_eps": np.asarray([1e-5], np.float32),
        "pad_amounts": np.zeros(8, np.int64),
        "slice_starts": np.asarray([0], np.int64),
        "slice_ends": np.asarray([4], np.int64),
        "slice_axes": np.asarray([1], np.int64),
        "zero_i64": np.zeros(1, np.float32),
    }
    init.update(extras)

    nodes = _traced_flowgen_nodes(sd, wn_bases)
    path = tmp_path / "generator.onnx"
    path.write_bytes(make_onnx_bytes(init, nodes))

    via_onnx = glow_tts_params_from_onnx(path, cfg)
    via_torch = glow_tts_params_from_state_dict(sd, cfg)

    import jax

    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_flatten_with_path(via_onnx)[0],
        jax.tree_util.tree_flatten_with_path(via_torch)[0],
    ):
        assert str(p1) == str(p2)
        np.testing.assert_allclose(a, b, rtol=1e-6, err_msg=str(p1))


def test_unsupported_op_diagnosis(tmp_path):
    """A constant-folded export (numeric names) with an exotic op must fail
    with a message naming the op and the lost-names cause."""
    from larynx_tpu.convert.onnx_import import OnnxParseError
    from larynx_tpu.models.glow_tts import GlowTTSConfig

    rng = np.random.default_rng(3)
    init = {
        str(200 + i): rng.standard_normal((4, 4)).astype(np.float32)
        for i in range(8)
    }
    nodes = [
        ("Conv", ["input", "200", "201"], ["300"], {"kernel_shape": [1]}),
        ("MyCustomFusedOp", ["300"], ["301"]),
    ]
    path = tmp_path / "generator.onnx"
    path.write_bytes(make_onnx_bytes(init, nodes))

    with pytest.raises(OnnxParseError) as excinfo:
        glow_tts_params_from_onnx(path, GlowTTSConfig())
    msg = str(excinfo.value)
    assert "MyCustomFusedOp" in msg
    assert "constant-folded" in msg
