"""import_onnx(freeze_inputs=...) — static specialization of flag inputs.

The motivating file shape is optimum's *merged* generation decoder
(``decoder_model_merged.onnx``): one ``If`` gated on a runtime
``use_cache_branch`` input whose branches return DIFFERENT cache shapes.
``lax.cond`` requires shape-equal branches, so the file is untraceable as
data-dependent control flow — but frozen to a constant the ``If`` folds
at trace time and each value yields its own specialized program, exactly
the split decoder / decoder_with_past pair the merged file replaces.
(Reference consumes the merged file via ORT's dynamic engine:
/root/reference/src/classifier.rs:348-350.)
"""

from __future__ import annotations

import numpy as np
import pytest

from birdnet_tpu.compiler.importer import import_onnx, make_forward
from birdnet_tpu.onnx import proto as P

from test_contrib_ops import _model, _vi  # noqa: F401


def _merged_decoder_like():
    """If(use_cache): concat(past, x) along seq — else: x alone.

    The two branches produce different output shapes, like optimum's
    merged decoder cache branches.
    """
    then_g = P.GraphProto(
        name="with_cache",
        node=[P.make_node("Concat", ["past", "x"], ["out"], axis=1)],
        output=[P.make_value_info("out", P.DataType.FLOAT, [2, 7])],
    )
    else_g = P.GraphProto(
        name="no_cache",
        node=[P.make_node("Identity", ["x"], ["out"])],
        output=[P.make_value_info("out", P.DataType.FLOAT, [2, 3])],
    )
    node = P.make_node("If", ["use_cache_branch"], ["y"],
                       then_branch=then_g, else_branch=else_g)
    return _model(
        [node],
        [_vi("x", (2, 3)), _vi("use_cache_branch", (1,), P.DataType.BOOL),
         _vi("past", (2, 4))],
        [P.make_value_info("y", P.DataType.FLOAT, [])],  # dynamic shape
        [],
    )


def test_freeze_folds_shape_divergent_if():
    import jax

    m = _merged_decoder_like()
    x = np.arange(6, dtype=np.float32).reshape(2, 3)
    past = np.arange(8, dtype=np.float32).reshape(2, 4)

    cached = import_onnx(m, freeze_inputs={"use_cache_branch": True})
    assert cached.input_names == ["x", "past"]
    fwd = jax.jit(make_forward(cached, precision="fp32"))
    (y,) = fwd(cached.params, x, past)
    np.testing.assert_allclose(y, np.concatenate([past, x], axis=1))

    fresh = import_onnx(m, freeze_inputs={"use_cache_branch": False})
    fwd = jax.jit(make_forward(fresh, precision="fp32"))
    # The no-cache program still takes the (ignored) past input.
    (y,) = fwd(fresh.params, x, past)
    np.testing.assert_allclose(y, x)


def test_freeze_scalar_python_value_for_flag_shaped_input():
    m = _merged_decoder_like()
    frozen = import_onnx(m, freeze_inputs={"use_cache_branch": 1})
    assert "use_cache_branch" not in frozen.input_names
    assert frozen.consts["use_cache_branch"].shape == (1,)
    assert frozen.consts["use_cache_branch"].dtype == np.bool_


def test_freeze_unknown_and_initializer_names_reject():
    m = _merged_decoder_like()
    with pytest.raises(ValueError, match="not a graph input"):
        import_onnx(m, freeze_inputs={"nope": True})

    from test_contrib_ops import _tensor

    m2 = _model(
        [P.make_node("Add", ["x", "w"], ["y"])],
        [_vi("x", (2,))], [_vi("y", (2,))],
        [_tensor("w", np.ones(2, np.float32))],
    )
    with pytest.raises(ValueError, match="initializer"):
        import_onnx(m2, freeze_inputs={"w": np.zeros(2, np.float32)})


def test_freeze_shape_mismatch_rejects():
    m = _merged_decoder_like()
    with pytest.raises(ValueError, match="declares shape"):
        import_onnx(m, freeze_inputs={"past": np.zeros((3, 4), np.float32)})


# ---------------------------------------------------------------------------
# Auto-specialization: the merged file loads with ZERO user flags.
# import_onnx detects scalar flag inputs whose only effect is gating If
# conditions (dispatch_inputs) and make_forward dispatches at call time on
# the concrete flag value to per-value specialized programs — the
# engine-level behavior ORT gives decoder_model_merged.onnx
# (reference: src/classifier.rs:348-350). The GPT-2 merged-vs-split-pair
# per-step parity test lives in test_kv_cache_decode.py (torch-gated).
# ---------------------------------------------------------------------------


def test_auto_specialize_detects_flag_and_dispatches_both_values():
    m = _merged_decoder_like()
    im = import_onnx(m)
    assert im.dispatch_inputs == ["use_cache_branch"]
    # the flag STAYS a runtime input — the caller passes it like ORT
    assert im.input_names == ["x", "use_cache_branch", "past"]

    fwd = make_forward(im, precision="fp32")
    x = np.arange(6, dtype=np.float32).reshape(2, 3)
    past = np.arange(8, dtype=np.float32).reshape(2, 4)
    (y,) = fwd(im.params, x, np.array([True]), past)
    np.testing.assert_allclose(np.asarray(y), np.concatenate([past, x], axis=1))
    (y,) = fwd(im.params, x, np.array([False]), past)
    np.testing.assert_allclose(np.asarray(y), x)
    # python scalars / ints dispatch too
    (y,) = fwd(im.params, x, 1, past)
    assert np.asarray(y).shape == (2, 7)


def test_auto_specialize_flag_through_cast_not_chain():
    """An int32 flag reaching the If through Cast→Not still qualifies
    (truthiness-preserving/flipping unary chain)."""
    import jax

    then_g = P.GraphProto(
        name="t", node=[P.make_node("Identity", ["x"], ["o"])],
        output=[P.make_value_info("o", P.DataType.FLOAT, [2])],
    )
    else_g = P.GraphProto(
        name="e",
        node=[P.make_node("Neg", ["x"], ["o"])],
        output=[P.make_value_info("o", P.DataType.FLOAT, [2])],
    )
    nodes = [
        P.make_node("Cast", ["flag"], ["fb"], to=P.DataType.BOOL),
        P.make_node("Not", ["fb"], ["nf"]),
        P.make_node("If", ["nf"], ["y"], then_branch=then_g, else_branch=else_g),
    ]
    m = _model(
        nodes,
        [_vi("x", (2,)), _vi("flag", (), P.DataType.INT32)],
        [P.make_value_info("y", P.DataType.FLOAT, [2])], [],
    )
    im = import_onnx(m)
    assert im.dispatch_inputs == ["flag"]
    fwd = make_forward(im, precision="fp32")
    x = np.array([1.0, -2.0], np.float32)
    (y,) = fwd(im.params, x, np.int32(0))  # Not(False) → then → identity
    np.testing.assert_allclose(np.asarray(y), x)
    (y,) = fwd(im.params, x, np.int32(7))  # Not(True) → else → neg
    np.testing.assert_allclose(np.asarray(y), -x)
    # a traced flag falls back to the single-program lax.cond path
    jfwd = jax.jit(make_forward(im, precision="fp32"))
    (y,) = jfwd(im.params, x, np.int32(0))
    np.testing.assert_allclose(np.asarray(y), x)


def test_auto_specialize_rejects_flags_with_data_uses():
    """A bool input that ALSO feeds a non-If op (Where) must not be
    specialized — its value participates in real data flow."""
    then_g = P.GraphProto(
        name="t", node=[P.make_node("Identity", ["x"], ["o"])],
        output=[P.make_value_info("o", P.DataType.FLOAT, [1])],
    )
    else_g = P.GraphProto(
        name="e", node=[P.make_node("Neg", ["x"], ["o"])],
        output=[P.make_value_info("o", P.DataType.FLOAT, [1])],
    )
    nodes = [
        P.make_node("If", ["flag"], ["a"], then_branch=then_g,
                    else_branch=else_g),
        P.make_node("Where", ["flag", "a", "x"], ["y"]),
    ]
    m = _model(
        nodes, [_vi("x", (1,)), _vi("flag", (1,), P.DataType.BOOL)],
        [P.make_value_info("y", P.DataType.FLOAT, [1])], [],
    )
    assert import_onnx(m).dispatch_inputs == []


def test_auto_specialize_rejects_flag_exposed_as_output():
    m = _merged_decoder_like()
    m.graph.output.append(
        P.make_value_info("use_cache_branch", P.DataType.BOOL, [1])
    )
    assert import_onnx(m).dispatch_inputs == []


def test_auto_specialize_opt_out_and_freeze_interplay():
    m = _merged_decoder_like()
    assert import_onnx(m, auto_specialize=False).dispatch_inputs == []
    # freezing the flag removes it from inputs; nothing left to dispatch on
    frozen = import_onnx(m, freeze_inputs={"use_cache_branch": True})
    assert frozen.dispatch_inputs == []


def test_freeze_casts_to_declared_dtype_and_folds_shape_math():
    """Freezing an int input lets downstream shape math fold (a Reshape
    whose target arrives through the frozen input)."""
    import jax

    shape_in = _vi("shp", (2,), P.DataType.INT64)
    node = P.make_node("Reshape", ["x", "shp"], ["y"])
    m = _model([node], [_vi("x", (2, 6)), shape_in],
               [P.make_value_info("y", P.DataType.FLOAT, [])], [])
    frozen = import_onnx(m, freeze_inputs={"shp": [3, 4]})
    assert frozen.consts["shp"].dtype == np.int64
    fwd = jax.jit(make_forward(frozen, precision="fp32"))
    x = np.arange(12, dtype=np.float32).reshape(2, 6)
    (y,) = fwd(frozen.params, x)
    assert y.shape == (3, 4)
    np.testing.assert_allclose(y, x.reshape(3, 4))


def test_auto_specialize_survives_checkpoint_roundtrip(tmp_path):
    """dispatch_inputs is re-detected on .btck load (not persisted), so
    checkpointed merged decoders keep call-time dispatch."""
    from birdnet_tpu.checkpoint import load_checkpoint, save_checkpoint

    m = _merged_decoder_like()
    im = import_onnx(m)
    assert im.dispatch_inputs == ["use_cache_branch"]
    p = tmp_path / "merged.btck"
    save_checkpoint(im, p)
    back = load_checkpoint(p)
    assert back.dispatch_inputs == ["use_cache_branch"]

    fwd = make_forward(back, precision="fp32")
    x = np.arange(6, dtype=np.float32).reshape(2, 3)
    past = np.arange(8, dtype=np.float32).reshape(2, 4)
    (y,) = fwd(back.params, x, np.array([True]), past)
    np.testing.assert_allclose(np.asarray(y), np.concatenate([past, x], 1))
    (y,) = fwd(back.params, x, np.array([False]), past)
    np.testing.assert_allclose(np.asarray(y), x)


def test_auto_specialize_two_independent_flags():
    """Two flag inputs gating two Ifs: dispatch keys on the combination
    (specializations compile lazily per observed pair)."""
    def branch(op, shape):
        return P.GraphProto(
            name=f"b_{op}", node=[P.make_node(op, ["x"], ["o"])],
            output=[P.make_value_info("o", P.DataType.FLOAT, list(shape))],
        )

    nodes = [
        P.make_node("If", ["f1"], ["a"], then_branch=branch("Identity", [2]),
                    else_branch=branch("Neg", [2])),
        P.make_node("If", ["f2"], ["y"],
                    then_branch=P.GraphProto(
                        name="t2",
                        node=[P.make_node("Mul", ["a", "a"], ["o"])],
                        output=[P.make_value_info("o", P.DataType.FLOAT, [2])],
                    ),
                    else_branch=P.GraphProto(
                        name="e2",
                        node=[P.make_node("Identity", ["a"], ["o"])],
                        output=[P.make_value_info("o", P.DataType.FLOAT, [2])],
                    )),
    ]
    m = _model(
        nodes,
        [_vi("x", (2,)), _vi("f1", (1,), P.DataType.BOOL),
         _vi("f2", (1,), P.DataType.BOOL)],
        [P.make_value_info("y", P.DataType.FLOAT, [2])], [],
    )
    im = import_onnx(m)
    assert im.dispatch_inputs == ["f1", "f2"]
    fwd = make_forward(im, precision="fp32")
    x = np.array([2.0, -3.0], np.float32)
    t, f = np.array([True]), np.array([False])
    np.testing.assert_allclose(np.asarray(fwd(im.params, x, t, t)[0]), x * x)
    np.testing.assert_allclose(np.asarray(fwd(im.params, x, t, f)[0]), x)
    np.testing.assert_allclose(np.asarray(fwd(im.params, x, f, t)[0]), x * x)
    np.testing.assert_allclose(np.asarray(fwd(im.params, x, f, f)[0]), -x)


@pytest.mark.parametrize("seed", range(20))
def test_auto_specialize_fuzz_matches_freeze(seed):
    """Random flag graphs (optional Cast/Not chain into an If whose
    branches are randomly shape-divergent): for both flag values the
    auto-specialized dispatch must equal the explicitly-frozen import."""
    rng = np.random.default_rng(3000 + seed)
    n = int(rng.integers(2, 5))
    x = rng.normal(size=(2, n)).astype(np.float32)
    past = rng.normal(size=(2, int(rng.integers(1, 4)))).astype(np.float32)

    then_g = P.GraphProto(
        name="t",
        node=[P.make_node("Concat", ["past", "x"], ["o"], axis=1)],
        output=[P.make_value_info("o", P.DataType.FLOAT, [])],
    )
    else_ops = [("Identity", None), ("Neg", None), ("Relu", None)]
    op_name, _ = else_ops[int(rng.integers(0, len(else_ops)))]
    else_g = P.GraphProto(
        name="e",
        node=[P.make_node(op_name, ["x"], ["o"])],
        output=[P.make_value_info("o", P.DataType.FLOAT, [])],
    )

    flag_dt = [P.DataType.BOOL, P.DataType.INT32, P.DataType.INT64][
        int(rng.integers(0, 3))
    ]
    chain = int(rng.integers(0, 3))  # 0: direct, 1: Cast, 2: Cast+Not
    nodes, cond = [], "flag"
    if chain >= 1:
        nodes.append(P.make_node("Cast", ["flag"], ["fb"],
                                 to=P.DataType.BOOL))
        cond = "fb"
    if chain == 2:
        nodes.append(P.make_node("Not", ["fb"], ["nf"]))
        cond = "nf"
    nodes.append(P.make_node("If", [cond], ["y"], then_branch=then_g,
                             else_branch=else_g))
    m = _model(
        nodes,
        [_vi("x", (2, n)), _vi("flag", (1,), flag_dt),
         _vi("past", past.shape)],
        [P.make_value_info("y", P.DataType.FLOAT, [])], [],
    )

    im = import_onnx(m)
    assert im.dispatch_inputs == ["flag"]
    fwd = make_forward(im, precision="fp32")
    for v in (True, False):
        (got,) = fwd(im.params, x, np.array([v]), past)
        frozen = import_onnx(m, freeze_inputs={"flag": v})
        import jax

        ffwd = jax.jit(make_forward(frozen, precision="fp32"))
        (want,) = ffwd(frozen.params, x, past)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-7,
            err_msg=f"seed={seed} flag={v}",
        )


def test_auto_specialize_rejects_narrowing_cast_chain():
    """Cast to a narrower int is NOT truthiness-preserving (int32 256 →
    uint8 0), so a flag reaching the If through one must not dispatch on
    truthiness (review round 4)."""
    then_g = P.GraphProto(
        name="t", node=[P.make_node("Identity", ["x"], ["o"])],
        output=[P.make_value_info("o", P.DataType.FLOAT, [2])],
    )
    else_g = P.GraphProto(
        name="e", node=[P.make_node("Neg", ["x"], ["o"])],
        output=[P.make_value_info("o", P.DataType.FLOAT, [2])],
    )
    nodes = [
        P.make_node("Cast", ["flag"], ["f8"], to=P.DataType.UINT8),
        P.make_node("Cast", ["f8"], ["fb"], to=P.DataType.BOOL),
        P.make_node("If", ["fb"], ["y"], then_branch=then_g,
                    else_branch=else_g),
    ]
    m = _model(
        nodes, [_vi("x", (2,)), _vi("flag", (1,), P.DataType.INT32)],
        [P.make_value_info("y", P.DataType.FLOAT, [2])], [],
    )
    im = import_onnx(m)
    assert im.dispatch_inputs == []
    # and the single-program path evaluates 256 → uint8 0 → False
    import jax

    fwd = jax.jit(make_forward(im, precision="fp32"))
    x = np.array([1.0, -2.0], np.float32)
    (y,) = fwd(im.params, x, np.array([256], np.int32))
    np.testing.assert_allclose(np.asarray(y), -x)


def test_auto_specialize_opt_out_survives_checkpoint(tmp_path):
    from birdnet_tpu.checkpoint import load_checkpoint, save_checkpoint

    m = _merged_decoder_like()
    im = import_onnx(m, auto_specialize=False)
    assert im.dispatch_inputs == []
    p = tmp_path / "optout.btck"
    save_checkpoint(im, p)
    assert load_checkpoint(p).dispatch_inputs == []
