"""Property-based codec roundtrips (hypothesis).

The fuzz suite covers CORRUPT bytes; these cover the VALID value space:
for any representable model, ``decode(encode(m))`` must reproduce every
tensor bit pattern, attribute value, and name — across the classic
wire-format hazard zones (negative int64 varints, NaN/inf/denormal
floats, unicode names, empty/scalar/odd-length tensors, dynamic dims).
"""

from __future__ import annotations

import math

import ml_dtypes
import numpy as np
import pytest

hyp = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from birdnet_tpu.onnx import proto as P  # noqa: E402

SETTINGS = settings(max_examples=60, deadline=None)


def _roundtrip_model(m: P.ModelProto) -> P.ModelProto:
    return P.decode_model(P.encode_model(m))


def _wrap_tensor(t: P.TensorProto) -> P.ModelProto:
    graph = P.GraphProto(name="g", node=[], input=[], output=[],
                         initializer=[t])
    return P.ModelProto(ir_version=8, graph=graph,
                        opset_import=[P.OperatorSetId(domain="", version=17)])


_DTYPES = st.sampled_from([
    np.float32, np.float64, np.float16, np.int8, np.uint8, np.int16,
    np.uint16, np.int32, np.int64, np.uint32, np.uint64, np.bool_,
    ml_dtypes.bfloat16, ml_dtypes.float8_e4m3fn, ml_dtypes.float8_e5m2,
])

_SHAPES = st.lists(st.integers(0, 5), min_size=0, max_size=4)


@SETTINGS
@given(dtype=_DTYPES, shape=_SHAPES, data=st.data())
def test_tensor_roundtrip_bit_exact(dtype, shape, data):
    n = int(np.prod(shape)) if shape else 1
    raw = data.draw(st.binary(min_size=8 * n, max_size=8 * n))
    base = np.frombuffer(raw, dtype=np.uint8)[: n * np.dtype(dtype).itemsize]
    if base.size < n * np.dtype(dtype).itemsize:
        base = np.resize(base, n * np.dtype(dtype).itemsize)
    arr = base.view(dtype)[:n].reshape(shape)
    if dtype == np.bool_:
        arr = (base[:n] % 2).astype(np.bool_).reshape(shape)
    # NB: np.ascontiguousarray would promote 0-d to 1-d (the codec's
    # from_numpy guards against exactly that); .copy() preserves rank.
    t = P.TensorProto.from_numpy(arr.copy(), "w")
    rt = _roundtrip_model(_wrap_tensor(t)).graph.initializer[0].to_numpy()
    assert rt.dtype == arr.dtype and rt.shape == arr.shape
    # bit-exact: compare raw bytes, so NaN payloads and -0.0 survive too
    np.testing.assert_array_equal(
        np.ascontiguousarray(rt).view(np.uint8).reshape(-1),
        np.ascontiguousarray(arr).view(np.uint8).reshape(-1),
    )


@SETTINGS
@given(vals=st.lists(st.integers(-8, 7), min_size=0, max_size=9))
def test_int4_tensor_roundtrip(vals):
    arr = np.array(vals, np.int8).astype(ml_dtypes.int4)
    t = P.TensorProto.from_numpy(arr, "w")
    rt = _roundtrip_model(_wrap_tensor(t)).graph.initializer[0].to_numpy()
    assert rt.dtype == arr.dtype
    np.testing.assert_array_equal(rt.astype(np.int8), arr.astype(np.int8))


@SETTINGS
@given(v=st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_int_attribute_roundtrip(v):
    node = P.make_node("Constant", [], ["y"], value_int=v)
    graph = P.GraphProto(name="g", node=[node], input=[], output=[],
                         initializer=[])
    m = _roundtrip_model(P.ModelProto(
        ir_version=8, graph=graph,
        opset_import=[P.OperatorSetId(domain="", version=17)],
    ))
    assert m.graph.node[0].attrs["value_int"] == v


@SETTINGS
@given(v=st.floats(width=32, allow_nan=True, allow_infinity=True))
def test_float_attribute_roundtrip(v):
    node = P.make_node("Constant", [], ["y"], alpha=float(np.float32(v)))
    graph = P.GraphProto(name="g", node=[node], input=[], output=[],
                         initializer=[])
    m = _roundtrip_model(P.ModelProto(
        ir_version=8, graph=graph,
        opset_import=[P.OperatorSetId(domain="", version=17)],
    ))
    got = m.graph.node[0].attrs["alpha"]
    if math.isnan(v):
        assert math.isnan(got)
    else:
        assert got == np.float32(v)


@SETTINGS
@given(
    ints=st.lists(st.integers(-(2**62), 2**62), max_size=6),
    floats=st.lists(st.floats(width=32, allow_nan=False,
                              allow_infinity=True), max_size=6),
    strings=st.lists(st.text(max_size=12), max_size=4),
)
def test_list_attribute_roundtrips(ints, floats, strings):
    node = P.make_node("Constant", [], ["y"], axes=ints,
                       scales=[float(np.float32(f)) for f in floats],
                       names=strings)
    graph = P.GraphProto(name="g", node=[node], input=[], output=[],
                         initializer=[])
    m = _roundtrip_model(P.ModelProto(
        ir_version=8, graph=graph,
        opset_import=[P.OperatorSetId(domain="", version=17)],
    ))
    attrs = m.graph.node[0].attrs
    assert list(attrs["axes"]) == ints
    assert [np.float32(x) for x in attrs["scales"]] == [
        np.float32(f) for f in floats
    ]
    got_strings = [
        s.decode() if isinstance(s, bytes) else s for s in attrs["names"]
    ]
    assert got_strings == strings


@SETTINGS
@given(
    name=st.text(max_size=24),
    domain=st.sampled_from(["", "ai.onnx", "com.microsoft", "vendor.x"]),
    n_inputs=st.integers(0, 5),
    empty_at=st.integers(0, 4),
)
def test_node_identity_roundtrip(name, domain, n_inputs, empty_at):
    inputs = [f"in{i}" if i != empty_at else "" for i in range(n_inputs)]
    node = P.make_node("Foo", inputs, ["y"], name=name, domain=domain)
    graph = P.GraphProto(name="g", node=[node], input=[], output=[],
                         initializer=[])
    m = _roundtrip_model(P.ModelProto(
        ir_version=8, graph=graph,
        opset_import=[P.OperatorSetId(domain="", version=17)],
    ))
    got = m.graph.node[0]
    assert got.op_type == "Foo"
    assert got.name == (name or "Foo_y")
    assert got.domain == domain
    assert got.input == inputs


@SETTINGS
@given(dims=st.lists(
    st.one_of(st.integers(1, 10_000), st.text(min_size=1, max_size=8)),
    max_size=4,
))
def test_value_info_dynamic_dims_roundtrip(dims):
    vi = P.make_value_info("x", P.DataType.FLOAT, dims)
    graph = P.GraphProto(name="g", node=[], input=[vi], output=[],
                         initializer=[])
    m = _roundtrip_model(P.ModelProto(
        ir_version=8, graph=graph,
        opset_import=[P.OperatorSetId(domain="", version=17)],
    ))
    got = m.graph.input[0].type.tensor_type.shape.dim
    for d, want in zip(got, dims):
        if isinstance(want, int):
            assert d.dim_value == want
        else:
            assert d.dim_param == want and not d.dim_value
