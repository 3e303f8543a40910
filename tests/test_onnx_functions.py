"""Model-local ONNX function support: codec round-trip + import-time
inlining semantics (ref_attr_name resolution, nesting, collisions)."""

import numpy as np
import pytest

from birdnet_tpu.compiler import import_onnx, make_forward
from birdnet_tpu.errors import ModelLoadError
from birdnet_tpu.onnx import proto as P


def _model(nodes, inputs, outputs, functions, opset=17):
    graph = P.GraphProto(
        name="g",
        node=nodes,
        input=[
            P.make_value_info(n, P.DataType.FLOAT, list(s)) for n, s in inputs
        ],
        output=[P.make_value_info(n, P.DataType.FLOAT, []) for n in outputs],
    )
    m = P.make_model(graph, opset_version=opset)
    m.functions.extend(functions)
    return m


def _run(m, feeds):
    # encode+decode: functions must survive the wire format
    imported = import_onnx(P.encode_model(m))
    fwd = make_forward(imported)
    return [np.asarray(o) for o in fwd(imported.params, *feeds)]


def _affine_fn():
    """y = x*alpha + beta, alpha a required ref attr, beta defaulted 1.0."""
    scale = P.make_node("Constant", [], ["s"])
    scale.attribute.append(
        P.AttributeProto(name="value_float", ref_attr_name="alpha")
    )
    shift = P.make_node("Constant", [], ["b"])
    shift.attribute.append(
        P.AttributeProto(name="value_float", ref_attr_name="beta")
    )
    return P.FunctionProto(
        name="Affine",
        domain="custom",
        input=["x"],
        output=["y"],
        attribute=["alpha", "beta"],
        attribute_proto=[P.make_attr("beta", 1.0)],
        node=[
            scale,
            shift,
            P.make_node("Mul", ["x", "s"], ["t"]),
            P.make_node("Add", ["t", "b"], ["y"]),
        ],
    )


def test_function_roundtrip_through_codec():
    f = _affine_fn()
    m = _model([P.make_node("Affine", ["x"], ["y"])], [("x", (2,))], ["y"], [f])
    m.functions[0].opset_import.append(P.OperatorSetId(domain="", version=17))
    m2 = P.decode_model(P.encode_model(m))
    (f2,) = m2.functions
    assert (f2.name, f2.domain) == ("Affine", "custom")
    assert f2.input == ["x"] and f2.output == ["y"]
    assert f2.attribute == ["alpha", "beta"]
    assert [a.name for a in f2.attribute_proto] == ["beta"]
    assert [n.op_type for n in f2.node] == ["Constant", "Constant", "Mul", "Add"]
    assert f2.node[0].attribute[0].ref_attr_name == "alpha"
    assert f2.opset_import[0].version == 17


def test_call_site_attr_and_default_resolution():
    x = np.array([1.0, 2.0, 3.0], dtype=np.float32)
    call = P.make_node("Affine", ["x"], ["y"], alpha=2.0, beta=10.0)
    call.domain = "custom"
    (y,) = _run(_model([call], [("x", (3,))], ["y"], [_affine_fn()]), [x])
    np.testing.assert_allclose(y, x * 2.0 + 10.0)
    # beta omitted at the call site → the function's declared default (1.0)
    call2 = P.make_node("Affine", ["x"], ["y"], alpha=3.0)
    call2.domain = "custom"
    (y2,) = _run(_model([call2], [("x", (3,))], ["y"], [_affine_fn()]), [x])
    np.testing.assert_allclose(y2, x * 3.0 + 1.0)


def test_two_calls_do_not_collide():
    x = np.array([1.0, -4.0], dtype=np.float32)
    c1 = P.make_node("Affine", ["x"], ["h"], alpha=2.0, beta=0.0)
    c2 = P.make_node("Affine", ["h"], ["y"], alpha=5.0, beta=1.0)
    c1.domain = c2.domain = "custom"
    (y,) = _run(_model([c1, c2], [("x", (2,))], ["y"], [_affine_fn()]), [x])
    np.testing.assert_allclose(y, (x * 2.0) * 5.0 + 1.0)


def test_nested_function_calls():
    inner = _affine_fn()
    outer_call = P.make_node("Affine", ["x"], ["t"], alpha=3.0)
    outer_call.domain = "custom"
    outer = P.FunctionProto(
        name="AffineRelu",
        domain="custom",
        input=["x"],
        output=["y"],
        node=[outer_call, P.make_node("Relu", ["t"], ["y"])],
    )
    x = np.array([-1.0, 2.0], dtype=np.float32)
    call = P.make_node("AffineRelu", ["x"], ["y"])
    call.domain = "custom"
    (y,) = _run(
        _model([call], [("x", (2,))], ["y"], [inner, outer]), [x]
    )
    np.testing.assert_allclose(y, np.maximum(x * 3.0 + 1.0, 0.0))


def test_function_call_inside_if_subgraph():
    x = np.array([2.0, 3.0], dtype=np.float32)
    inner_call = P.make_node("Affine", ["x"], ["yt"], alpha=10.0, beta=0.0)
    inner_call.domain = "custom"
    then_g = P.GraphProto(
        name="then", node=[inner_call],
        output=[P.make_value_info("yt", P.DataType.FLOAT, [])],
    )
    else_g = P.GraphProto(
        name="else", node=[P.make_node("Neg", ["x"], ["ye"])],
        output=[P.make_value_info("ye", P.DataType.FLOAT, [])],
    )
    nodes = [
        P.make_node("Constant", [], ["c"], value=P.TensorProto.from_numpy(
            np.array(True), name="c")),
        P.make_node("If", ["c"], ["y"], then_branch=then_g, else_branch=else_g),
    ]
    (y,) = _run(_model(nodes, [("x", (2,))], ["y"], [_affine_fn()]), [x])
    np.testing.assert_allclose(y, x * 10.0)


def test_recursive_function_rejected():
    self_call = P.make_node("Rec", ["x"], ["y"])
    self_call.domain = "custom"
    rec = P.FunctionProto(
        name="Rec", domain="custom", input=["x"], output=["y"],
        node=[self_call],
    )
    call = P.make_node("Rec", ["x"], ["y"])
    call.domain = "custom"
    m = _model([call], [("x", (2,))], ["y"], [rec])
    with pytest.raises(ModelLoadError, match="converge|recursive"):
        import_onnx(P.encode_model(m))


def test_default_domain_function_never_shadows_builtin():
    # A model-local "Relu" in the default domain must NOT replace the
    # builtin lowering (ORT precedence: standard op wins).
    bad = P.FunctionProto(
        name="Relu", domain="", input=["x"], output=["y"],
        node=[P.make_node("Neg", ["x"], ["y"])],
    )
    x = np.array([-1.0, 5.0], dtype=np.float32)
    (y,) = _run(
        _model([P.make_node("Relu", ["x"], ["y"])], [("x", (2,))], ["y"], [bad]),
        [x],
    )
    np.testing.assert_allclose(y, np.maximum(x, 0.0))


def test_default_domain_function_with_unknown_name_expands():
    fn = P.FunctionProto(
        name="DoubleIt", domain="", input=["x"], output=["y"],
        node=[P.make_node("Add", ["x", "x"], ["y"])],
    )
    x = np.array([1.5, -2.0], dtype=np.float32)
    (y,) = _run(
        _model([P.make_node("DoubleIt", ["x"], ["y"])], [("x", (2,))], ["y"], [fn]),
        [x],
    )
    np.testing.assert_allclose(y, x * 2.0)


def test_subgraph_inside_function_body_renames_captures():
    # The function body holds an If whose branches capture the function's
    # internal value "t" — the rename map must reach inside the subgraphs.
    then_g = P.GraphProto(
        name="then", node=[P.make_node("Identity", ["t"], ["o"])],
        output=[P.make_value_info("o", P.DataType.FLOAT, [])],
    )
    else_g = P.GraphProto(
        name="else", node=[P.make_node("Neg", ["t"], ["o2"])],
        output=[P.make_value_info("o2", P.DataType.FLOAT, [])],
    )
    fn = P.FunctionProto(
        name="CondScale", domain="custom", input=["x", "flag"], output=["y"],
        node=[
            P.make_node("Mul", ["x", "x"], ["t"]),
            P.make_node("If", ["flag"], ["y"],
                        then_branch=then_g, else_branch=else_g),
        ],
    )
    x = np.array([2.0, -3.0], dtype=np.float32)
    call = P.make_node("CondScale", ["x", "flag"], ["y"])
    call.domain = "custom"
    graph = P.GraphProto(
        name="g",
        node=[
            P.make_node("Constant", [], ["flag"], value=P.TensorProto.from_numpy(
                np.array(True), name="flag")),
            call,
        ],
        input=[P.make_value_info("x", P.DataType.FLOAT, [2])],
        output=[P.make_value_info("y", P.DataType.FLOAT, [])],
    )
    m = P.make_model(graph, opset_version=17)
    m.functions.append(fn)
    imported = import_onnx(P.encode_model(m))
    (y,) = make_forward(imported)(imported.params, x)
    np.testing.assert_allclose(np.asarray(y), x * x)
