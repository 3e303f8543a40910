"""Data-dependent control flow: If via lax.cond, Loop via lax.while_loop.

These paths only activate when the condition/trip count is a traced value,
so every test runs the imported forward under ``jax.jit``.
"""

import jax
import numpy as np
import pytest

from birdnet_tpu.compiler.importer import import_onnx, make_forward
from birdnet_tpu.onnx import proto as P


def _jit_run(nodes, inputs, initializers=None, outputs=("y",), opset=17):
    init = [
        P.TensorProto.from_numpy(v, name=k)
        for k, v in (initializers or {}).items()
    ]
    in_vis = [
        P.make_value_info(
            k,
            P._NUMPY_TO_DTYPE[np.asarray(v).dtype],
            list(np.asarray(v).shape),
        )
        for k, v in inputs.items()
    ]
    out_vis = [P.make_value_info(n, P.DataType.FLOAT, []) for n in outputs]
    graph = P.GraphProto(
        name="t", node=nodes, initializer=init, input=in_vis, output=out_vis
    )
    model = import_onnx(P.make_model(graph, opset_version=opset), optimize=False)
    fwd = jax.jit(make_forward(model))
    outs = fwd(model.params, *[np.asarray(v) for v in inputs.values()])
    return [np.asarray(o) for o in outs]


def _loop_body(cond_expr_nodes, cond_inits=None):
    """Body: v_out = v * 2; cond_out from the given nodes."""
    return P.GraphProto(
        name="body",
        node=cond_expr_nodes + [P.make_node("Mul", ["v", "two"], ["v_out"])],
        initializer=[
            P.TensorProto.from_numpy(
                np.float32(2.0) * np.ones(1, np.float32), name="two"
            )
        ]
        + [
            P.TensorProto.from_numpy(v, name=k)
            for k, v in (cond_inits or {}).items()
        ],
        input=[
            P.make_value_info("iter", P.DataType.INT64, []),
            P.make_value_info("cond_in", P.DataType.BOOL, []),
            P.make_value_info("v", P.DataType.FLOAT, [1]),
        ],
        output=[
            P.make_value_info("cond_out", P.DataType.BOOL, []),
            P.make_value_info("v_out", P.DataType.FLOAT, [1]),
        ],
    )


def test_if_dynamic_condition():
    then_g = P.GraphProto(
        name="t",
        node=[P.make_node("Mul", ["x", "x"], ["o"])],
        input=[],
        output=[P.make_value_info("o", P.DataType.FLOAT, [3])],
    )
    else_g = P.GraphProto(
        name="e",
        node=[P.make_node("Neg", ["x"], ["o"])],
        input=[],
        output=[P.make_value_info("o", P.DataType.FLOAT, [3])],
    )
    x = np.array([1.0, 2.0, 3.0], np.float32)
    for cond, expected in [(True, x * x), (False, -x)]:
        (y,) = _jit_run(
            [
                P.make_node(
                    "If", ["c"], ["y"], then_branch=then_g, else_branch=else_g
                )
            ],
            {"c": np.array(cond), "x": x},
            outputs=["y"],
        )
        np.testing.assert_allclose(y, expected)


def test_loop_dynamic_trip_count():
    body = _loop_body([P.make_node("Identity", ["cond_in"], ["cond_out"])])
    for m, expected in [(0, 1.0), (3, 8.0), (5, 32.0)]:
        (final,) = _jit_run(
            [P.make_node("Loop", ["M", "cond", "x"], ["final"], body=body)],
            {"M": np.array(m, np.int64), "x": np.ones(1, np.float32)},
            {"cond": np.array(True)},
            outputs=["final"],
        )
        np.testing.assert_allclose(final, [expected])


def test_loop_dynamic_initial_condition():
    body = _loop_body([P.make_node("Identity", ["cond_in"], ["cond_out"])])
    for c, expected in [(True, 16.0), (False, 1.0)]:
        (final,) = _jit_run(
            [P.make_node("Loop", ["M", "cond", "x"], ["final"], body=body)],
            {"cond": np.array(c), "x": np.ones(1, np.float32)},
            {"M": np.array(4, np.int64)},
            outputs=["final"],
        )
        np.testing.assert_allclose(final, [expected])


def test_loop_hybrid_data_dependent_termination():
    """Static trip count, but cond_out depends on the carried value: the
    unroll discovers a traced cond_out and hands off to lax.while_loop.
    Per ONNX, the iteration that drops cond_out still commits its outputs."""
    body = P.GraphProto(
        name="body",
        node=[
            P.make_node("Mul", ["v", "two"], ["v_out"]),
            P.make_node("ReduceMax", ["v_out"], ["vmax"], keepdims=0),
            P.make_node("Less", ["vmax", "limit"], ["cond_out"]),
        ],
        initializer=[
            P.TensorProto.from_numpy(
                np.float32(2.0) * np.ones(1, np.float32), name="two"
            ),
            P.TensorProto.from_numpy(np.float32(10.0), name="limit"),
        ],
        input=[
            P.make_value_info("iter", P.DataType.INT64, []),
            P.make_value_info("cond_in", P.DataType.BOOL, []),
            P.make_value_info("v", P.DataType.FLOAT, [1]),
        ],
        output=[
            P.make_value_info("cond_out", P.DataType.BOOL, []),
            P.make_value_info("v_out", P.DataType.FLOAT, [1]),
        ],
    )
    # v: 1→2(T)→4(T)→8(T)→16(F: stop after committing) = 16, under cap M=10
    (final,) = _jit_run(
        [P.make_node("Loop", ["M", "cond", "x"], ["final"], body=body)],
        {"x": np.ones(1, np.float32)},
        {"M": np.array(10, np.int64), "cond": np.array(True)},
        outputs=["final"],
    )
    np.testing.assert_allclose(final, [16.0])
    # cap binds first when M is small
    (final,) = _jit_run(
        [P.make_node("Loop", ["M", "cond", "x"], ["final"], body=body)],
        {"x": np.ones(1, np.float32)},
        {"M": np.array(2, np.int64), "cond": np.array(True)},
        outputs=["final"],
    )
    np.testing.assert_allclose(final, [4.0])


def test_loop_dynamic_with_scan_outputs_rejected():
    body = P.GraphProto(
        name="body",
        node=[
            P.make_node("Identity", ["cond_in"], ["cond_out"]),
            P.make_node("Mul", ["v", "two"], ["v_out"]),
            P.make_node("Identity", ["v_out"], ["scan0"]),
        ],
        initializer=[
            P.TensorProto.from_numpy(
                np.float32(2.0) * np.ones(1, np.float32), name="two"
            )
        ],
        input=[
            P.make_value_info("iter", P.DataType.INT64, []),
            P.make_value_info("cond_in", P.DataType.BOOL, []),
            P.make_value_info("v", P.DataType.FLOAT, [1]),
        ],
        output=[
            P.make_value_info("cond_out", P.DataType.BOOL, []),
            P.make_value_info("v_out", P.DataType.FLOAT, [1]),
            P.make_value_info("scan0", P.DataType.FLOAT, [1]),
        ],
    )
    with pytest.raises(NotImplementedError, match="scan outputs"):
        _jit_run(
            [
                P.make_node(
                    "Loop", ["M", "cond", "x"], ["final", "scans"], body=body
                )
            ],
            {"M": np.array(4, np.int64), "x": np.ones(1, np.float32)},
            {"cond": np.array(True)},
            outputs=["final", "scans"],
        )


def test_loop_long_for_loop_via_scan():
    """A plain for-loop with trip count 1000 (cond passthrough) lowers to
    lax.scan instead of hitting the 256-iteration unroll cap — with scan
    outputs stacked."""
    body = P.GraphProto(
        name="body",
        node=[
            P.make_node("Identity", ["cond_in"], ["cond_out"]),
            P.make_node("Add", ["v", "one"], ["v_out"]),
            P.make_node("Identity", ["v_out"], ["scan0"]),
        ],
        initializer=[
            P.TensorProto.from_numpy(np.ones(1, np.float32), name="one")
        ],
        input=[
            P.make_value_info("iter", P.DataType.INT64, []),
            P.make_value_info("cond_in", P.DataType.BOOL, []),
            P.make_value_info("v", P.DataType.FLOAT, [1]),
        ],
        output=[
            P.make_value_info("cond_out", P.DataType.BOOL, []),
            P.make_value_info("v_out", P.DataType.FLOAT, [1]),
            P.make_value_info("scan0", P.DataType.FLOAT, [1]),
        ],
    )
    final, scans = _jit_run(
        [P.make_node("Loop", ["M", "cond", "x"], ["final", "scans"], body=body)],
        {"x": np.zeros(1, np.float32)},
        {"M": np.array(1000, np.int64), "cond": np.array(True)},
        outputs=["final", "scans"],
    )
    np.testing.assert_allclose(final, [1000.0])
    assert scans.shape == (1000, 1)
    np.testing.assert_allclose(scans[:, 0], np.arange(1, 1001, dtype=np.float32))


def test_loop_long_with_real_termination_still_rejected():
    """A >256 loop whose cond_out is actually computed (could break early)
    must not silently become a fixed-length scan."""
    body = P.GraphProto(
        name="body",
        node=[
            P.make_node("Less", ["iter", "big"], ["cond_out"]),
            P.make_node("Add", ["v", "one"], ["v_out"]),
        ],
        initializer=[
            P.TensorProto.from_numpy(np.array(10_000, np.int64), name="big"),
            P.TensorProto.from_numpy(np.ones(1, np.float32), name="one"),
        ],
        input=[
            P.make_value_info("iter", P.DataType.INT64, []),
            P.make_value_info("cond_in", P.DataType.BOOL, []),
            P.make_value_info("v", P.DataType.FLOAT, [1]),
        ],
        output=[
            P.make_value_info("cond_out", P.DataType.BOOL, []),
            P.make_value_info("v_out", P.DataType.FLOAT, [1]),
        ],
    )
    with pytest.raises(NotImplementedError, match="too large to unroll"):
        _jit_run(
            [P.make_node("Loop", ["M", "cond", "x"], ["final"], body=body)],
            {"x": np.zeros(1, np.float32)},
            {"M": np.array(1000, np.int64), "cond": np.array(True)},
            outputs=["final"],
        )


def test_loop_for_form_int64_max_rejected_cleanly():
    """A for-form body (cond passthrough) with an INT64_MAX trip count can
    never terminate — reject at import/trace time instead of materializing
    arange(2**63) in lax.scan."""
    body = P.GraphProto(
        name="body",
        node=[
            P.make_node("Identity", ["cond_in"], ["cond_out"]),
            P.make_node("Add", ["v", "one"], ["v_out"]),
        ],
        initializer=[
            P.TensorProto.from_numpy(np.ones(1, np.float32), name="one")
        ],
        input=[
            P.make_value_info("iter", P.DataType.INT64, []),
            P.make_value_info("cond_in", P.DataType.BOOL, []),
            P.make_value_info("v", P.DataType.FLOAT, [1]),
        ],
        output=[
            P.make_value_info("cond_out", P.DataType.BOOL, []),
            P.make_value_info("v_out", P.DataType.FLOAT, [1]),
        ],
    )
    with pytest.raises(NotImplementedError, match="effectively infinite"):
        _jit_run(
            [P.make_node("Loop", ["M", "cond", "x"], ["final"], body=body)],
            {"x": np.zeros(1, np.float32)},
            {"M": np.array(2**63 - 1, np.int64), "cond": np.array(True)},
            outputs=["final"],
        )


def test_loop_traced_trip_count_int64_max_saturates():
    """A *runtime* trip count >= 2^31 wraps negative in the int32 cast
    (x64 is disabled); a negative bound can only be a wrapped unbounded
    sentinel, so it saturates to INT32_MAX instead of silently running
    zero iterations. Termination comes from the live condition."""
    body = _loop_body(
        [
            P.make_node("ReduceMax", ["v"], ["vmax"], keepdims=0),
            P.make_node("Less", ["vmax", "limit"], ["cond_out"]),
        ],
        cond_inits={"limit": np.float32(10.0)},
    )
    (final,) = _jit_run(
        [P.make_node("Loop", ["M", "cond", "x"], ["final"], body=body)],
        # M is a graph INPUT (traced), carrying the unbounded sentinel.
        {"M": np.array(2**63 - 1, np.int64), "cond": np.array(True),
         "x": np.ones(1, np.float32)},
        outputs=["final"],
    )
    # cond checks the pre-doubling v, and the iteration that drops
    # cond_out still commits (ONNX): 1,2,4,8,16 all pass the check and
    # double; the v=16 iteration sets cond_out=False after producing 32.
    # The regression would yield [1.0] (zero iterations).
    np.testing.assert_allclose(final, [32.0])
