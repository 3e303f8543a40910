"""Independent ONNX protobuf wire-writer for TF-export-dialect fixtures.

This module deliberately shares NO code with ``birdnet_tpu/onnx/proto.py``:
it is a from-scratch, bytes-first transcription of the public
``onnx.proto3`` schema (field numbers cited inline), so model files it
emits are genuinely external bytes to the repo's codec — the round-2
verdict's requirement for de-risking the day the real TF-exported
BirdNET weight files arrive. Where proto.py models messages as
dataclasses with a generic reflective codec, this writer is a flat set
of composing functions that append tag/length/payload bytes directly;
there is no decode path at all.

Only the message subset a tf2onnx-style exporter emits is supported.
"""

from __future__ import annotations

import struct

import numpy as np

# -- protobuf wire primitives (proto3 encoding spec) -------------------------

_VARINT, _I64, _LEN, _I32 = 0, 1, 2, 5


def _uvarint(n: int) -> bytes:
    out = bytearray()
    n &= 0xFFFFFFFFFFFFFFFF  # two's-complement 64-bit for negatives
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _uvarint((field << 3) | wire)


def _fv(field: int, value: int) -> bytes:
    """varint field"""
    return _key(field, _VARINT) + _uvarint(int(value))


def _fb(field: int, payload: bytes) -> bytes:
    """length-delimited field (bytes / string / submessage)"""
    return _key(field, _LEN) + _uvarint(len(payload)) + payload


def _fs(field: int, text: str) -> bytes:
    return _fb(field, text.encode("utf-8"))


# -- TensorProto (onnx.proto3: dims=1, data_type=2, name=8, raw_data=9) ------

# TensorProto.DataType values (onnx.proto3 enum)
FLOAT, INT32, INT64, STRING = 1, 6, 7, 8


_RAW_DTYPE = {
    FLOAT: np.float32,
    INT32: np.int32,
    INT64: np.int64,
}


def tensor(name: str, array: np.ndarray, data_type: int | None = None) -> bytes:
    arr = np.asarray(array)
    if data_type is None:
        data_type = {
            np.dtype(np.float32): FLOAT,
            np.dtype(np.int32): INT32,
            np.dtype(np.int64): INT64,
        }[arr.dtype]
    arr = arr.astype(_RAW_DTYPE[data_type])
    msg = b""
    for d in arr.shape:
        msg += _fv(1, d)  # dims
    msg += _fv(2, data_type)  # data_type
    msg += _fs(8, name)  # name
    msg += _fb(9, arr.tobytes(order="C"))  # raw_data (little-endian IEEE)
    return msg


# -- AttributeProto (name=1, f=2, i=3, s=4, t=5, floats=7, ints=8, type=20) --

_A_FLOAT, _A_INT, _A_STRING, _A_TENSOR = 1, 2, 3, 4
_A_FLOATS, _A_INTS, _A_STRINGS = 6, 7, 8


def attr_i(name: str, value: int) -> bytes:
    return _fs(1, name) + _fv(3, value) + _fv(20, _A_INT)


def attr_f(name: str, value: float) -> bytes:
    return (_fs(1, name) + _key(2, _I32) + struct.pack("<f", value)
            + _fv(20, _A_FLOAT))


def attr_s(name: str, value: str) -> bytes:
    return _fs(1, name) + _fb(4, value.encode("utf-8")) + _fv(20, _A_STRING)


def attr_ints(name: str, values) -> bytes:
    msg = _fs(1, name)
    for v in values:
        msg += _fv(8, v)
    return msg + _fv(20, _A_INTS)


def attr_floats(name: str, values) -> bytes:
    msg = _fs(1, name)
    for v in values:
        msg += _key(7, _I32) + struct.pack("<f", v)
    return msg + _fv(20, _A_FLOATS)


def attr_t(name: str, tensor_bytes: bytes) -> bytes:
    return _fs(1, name) + _fb(5, tensor_bytes) + _fv(20, _A_TENSOR)


def attr_strings(name: str, values) -> bytes:
    msg = _fs(1, name)
    for v in values:
        msg += _fb(9, v.encode("utf-8"))  # AttributeProto.strings = 9
    return msg + _fv(20, _A_STRINGS)


# -- NodeProto (input=1, output=2, name=3, op_type=4, attribute=5) -----------

def node(op_type: str, inputs, outputs, *attrs: bytes, name: str = "",
         domain: str = "") -> bytes:
    msg = b""
    for i in inputs:
        msg += _fs(1, i)
    for o in outputs:
        msg += _fs(2, o)
    msg += _fs(3, name or f"{op_type}__{outputs[0]}")
    msg += _fs(4, op_type)
    for a in attrs:
        msg += _fb(5, a)
    if domain:
        msg += _fs(7, domain)  # NodeProto.domain = 7
    return msg


# -- ValueInfoProto / TypeProto ----------------------------------------------
# ValueInfo: name=1, type=2. TypeProto: tensor_type=1.
# TypeProto.Tensor: elem_type=1, shape=2. TensorShapeProto: dim=1.
# Dimension: dim_value=1 | dim_param=2.

def value_info(name: str, elem_type: int, dims) -> bytes:
    shape_msg = b""
    for d in dims:
        if isinstance(d, str):
            dim = _fs(2, d)
        else:
            dim = _fv(1, int(d))
        shape_msg += _fb(1, dim)
    ttype = _fv(1, elem_type) + _fb(2, shape_msg)
    return _fs(1, name) + _fb(2, _fb(1, ttype))


# -- GraphProto (node=1, name=2, initializer=5, input=11, output=12) ---------

def graph(name: str, nodes, initializers, inputs, outputs) -> bytes:
    msg = b""
    for n in nodes:
        msg += _fb(1, n)
    msg += _fs(2, name)
    for t in initializers:
        msg += _fb(5, t)
    for i in inputs:
        msg += _fb(11, i)
    for o in outputs:
        msg += _fb(12, o)
    return msg


# -- ModelProto (ir_version=1, producer_name=2, graph=7, opset_import=8) -----

def model(graph_bytes: bytes, opset: int = 17, ir_version: int = 8,
          producer: str = "tf2onnx-style-independent-writer",
          extra_opsets: dict | None = None) -> bytes:
    opset_msg = _fs(1, "") + _fv(2, opset)  # OperatorSetId: domain=1, version=2
    out = (
        _fv(1, ir_version)
        + _fs(2, producer)
        + _fs(3, "0.0-test")
        + _fb(7, graph_bytes)
        + _fb(8, opset_msg)
    )
    for dom, ver in (extra_opsets or {}).items():
        out += _fb(8, _fs(1, dom) + _fv(2, ver))
    return out
