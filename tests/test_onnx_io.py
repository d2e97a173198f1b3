"""Pure-python ONNX weight reader/writer (utils/onnx_io.py)."""
import struct

import numpy as np
import pytest

from cosyvoice_tpu.utils.onnx_io import (_field, _parse_tensor, _varint,
                                         read_onnx_tensors, write_onnx_tensors)


def test_round_trip_all_dtypes(tmp_path, rng):
    tensors = {
        "a.weight": rng.standard_normal((3, 4, 5)).astype(np.float32),
        "b.bias": np.arange(-5, 5, dtype=np.int64),
        "c.i8": np.array([-3, 0, 7], np.int8),
        "d.f16": rng.standard_normal(4).astype(np.float16),
        "e.bool": np.array([True, False]),
        "f.u8": np.array([0, 255, 17], np.uint8),
        "g.f64": rng.standard_normal((2, 2)),
        "h.scalar": np.float32(3.5).reshape(()),
    }
    path = str(tmp_path / "rt.onnx")
    write_onnx_tensors(path, tensors)
    back = read_onnx_tensors(path)
    assert set(back) == set(tensors)
    for k, v in tensors.items():
        assert back[k].dtype == v.dtype and back[k].shape == v.shape, k
        np.testing.assert_array_equal(back[k], v, err_msg=k)


def test_hand_crafted_unpacked_fields():
    """Foreign-producer forms our writer never emits: unpacked dims,
    unpacked float_data, packed int64 with negative (10-byte) varints."""
    t = _field(1, 0, _varint(2)) + _field(1, 0, _varint(3))  # dims 2, 3
    t += _field(2, 0, _varint(1))                            # float32
    t += _field(8, 2, b"hand.f32")
    for x in range(6):
        t += _field(4, 5, struct.pack("<f", x * 0.5))        # unpacked floats
    name, arr = _parse_tensor(memoryview(t))
    assert name == "hand.f32" and arr.shape == (2, 3)
    np.testing.assert_allclose(arr, np.arange(6).reshape(2, 3) * 0.5)

    neg = (-7) & ((1 << 64) - 1)
    t2 = (_field(1, 0, _varint(2)) + _field(2, 0, _varint(7))
          + _field(8, 2, b"hand.i64") + _field(7, 2, _varint(neg) + _varint(42)))
    name, arr = _parse_tensor(memoryview(t2))
    assert name == "hand.i64"
    np.testing.assert_array_equal(arr, [-7, 42])


def test_int32_data_carries_small_types():
    """int32_data (field 5) stores u8/i8/f16/bool payloads as varints."""
    t = (_field(1, 0, _varint(3)) + _field(2, 0, _varint(3))   # int8
         + _field(8, 2, b"x") + _field(5, 2,
         _varint((-3) & ((1 << 64) - 1)) + _varint(0) + _varint(7)))
    _, arr = _parse_tensor(memoryview(t))
    assert arr.dtype == np.int8
    np.testing.assert_array_equal(arr, [-3, 0, 7])

    half = np.float16(1.5)
    t = (_field(1, 0, _varint(1)) + _field(2, 0, _varint(10))  # float16
         + _field(8, 2, b"y")
         + _field(5, 0, _varint(int(half.view(np.uint16)))))
    _, arr = _parse_tensor(memoryview(t))
    assert arr.dtype == np.float16 and arr[0] == half


def test_constant_node_tensors(tmp_path):
    """Constant-node weights (some exporters fold weights into nodes)."""
    from cosyvoice_tpu.utils.onnx_io import _encode_tensor

    w = np.arange(4, dtype=np.float32)
    tensor = _encode_tensor("", w)
    attr = _field(1, 2, b"value") + _field(4, 2, tensor)
    node = (_field(4, 2, b"Constant") + _field(6, 2, b"folded.weight")
            + _field(5, 2, attr))
    graph = _field(2, 2, b"g") + _field(1, 2, node)
    model = _field(1, 0, _varint(8)) + _field(7, 2, graph)
    p = tmp_path / "const.onnx"
    p.write_bytes(model)
    out = read_onnx_tensors(str(p))
    np.testing.assert_array_equal(out["folded.weight"], w)


def test_not_onnx_raises(tmp_path):
    p = tmp_path / "bad.onnx"
    p.write_bytes(_field(1, 0, _varint(8)))  # ir_version only, no graph
    with pytest.raises(ValueError, match="no GraphProto"):
        read_onnx_tensors(str(p))
