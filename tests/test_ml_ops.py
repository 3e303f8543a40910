"""ai.onnx.ml domain — classical-ML ops (sklearn-export parity).

Oracles are hand-computed from the ONNX-ML spec / ORT kernel semantics.
The reference reaches these through ONNX Runtime's kernel library
(reference: src/classifier.rs:637-639); sklearn-exported pipelines are
the main real-world producer.
"""

import jax
import numpy as np
import pytest

from birdnet_tpu.compiler import import_onnx, make_forward
from birdnet_tpu.onnx import proto as P

ML = "ai.onnx.ml"


def _dtype_of(v):
    arr = np.asarray(v)
    if arr.dtype.kind in ("U", "S", "O"):
        return P.DataType.STRING
    return P._NUMPY_TO_DTYPE[arr.dtype]


def _run(nodes, inputs, initializers=None, outputs=("y",), jit=False):
    init = [
        P.TensorProto.from_numpy(np.asarray(v), name=k)
        for k, v in (initializers or {}).items()
    ]
    in_vis = [
        P.make_value_info(k, _dtype_of(v), list(np.asarray(v).shape))
        for k, v in inputs.items()
    ]
    out_vis = [P.make_value_info(n, P.DataType.FLOAT, []) for n in outputs]
    graph = P.GraphProto(
        name="t", node=nodes, initializer=init, input=in_vis, output=out_vis
    )
    model = P.ModelProto(
        ir_version=8, producer_name="t", producer_version="0",
        graph=graph,
        opset_import=[P.OperatorSetId(domain="", version=17),
                      P.OperatorSetId(domain=ML, version=3)],
    )
    imported = import_onnx(model, optimize=False)
    fwd = make_forward(imported)
    if jit:
        fwd = jax.jit(fwd)
    outs = fwd(imported.params, *[np.asarray(v) for v in inputs.values()])
    return list(outs)


# ---------------------------------------------------------------------------
# feature plumbing
# ---------------------------------------------------------------------------

def test_array_feature_extractor():
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    (y,) = _run(
        [P.make_node("ArrayFeatureExtractor", ["x", "i"], ["y"], domain=ML)],
        {"x": x}, {"i": np.asarray([3, 1], np.int64)}, jit=True,
    )
    np.testing.assert_array_equal(np.asarray(y), x[:, [3, 1]])


def test_array_feature_extractor_strings():
    x = np.asarray([["a", "b", "c"]], dtype=object)
    (y,) = _run(
        [P.make_node("ArrayFeatureExtractor", ["x", "i"], ["y"], domain=ML)],
        {"x": x}, {"i": np.asarray([2, 0], np.int64)},
    )
    assert np.asarray(y).tolist() == [["c", "a"]]


def test_binarizer():
    x = np.asarray([[-1.0, 0.5, 2.0]], np.float32)
    (y,) = _run([P.make_node("Binarizer", ["x"], ["y"], domain=ML,
                             threshold=0.5)], {"x": x}, jit=True)
    np.testing.assert_array_equal(np.asarray(y), [[0.0, 0.0, 1.0]])


def test_scaler():
    x = np.asarray([[1.0, 10.0], [3.0, 20.0]], np.float32)
    (y,) = _run([P.make_node("Scaler", ["x"], ["y"], domain=ML,
                             offset=[1.0, 10.0], scale=[2.0, 0.1])],
                {"x": x}, jit=True)
    np.testing.assert_allclose(np.asarray(y), [[0.0, 0.0], [4.0, 1.0]])


def test_normalizer_modes():
    x = np.asarray([[3.0, -4.0], [0.0, 0.0]], np.float32)
    for norm, expect in [
        ("MAX", [[0.75, -1.0], [0.0, 0.0]]),
        ("L1", [[3 / 7, -4 / 7], [0.0, 0.0]]),
        ("L2", [[0.6, -0.8], [0.0, 0.0]]),
    ]:
        (y,) = _run([P.make_node("Normalizer", ["x"], ["y"], domain=ML,
                                 norm=norm)], {"x": x}, jit=True)
        np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-6)


def test_imputer_nan_and_per_feature():
    x = np.asarray([[np.nan, 2.0], [3.0, np.nan]], np.float32)
    (y,) = _run([P.make_node("Imputer", ["x"], ["y"], domain=ML,
                             imputed_value_floats=[9.0, 7.0],
                             replaced_value_float=float("nan"))],
                {"x": x}, jit=True)
    np.testing.assert_allclose(np.asarray(y), [[9.0, 2.0], [3.0, 7.0]])
    xi = np.asarray([[0, 5]], np.int64)
    (y,) = _run([P.make_node("Imputer", ["x"], ["y"], domain=ML,
                             imputed_value_int64s=[42],
                             replaced_value_int64=0)], {"x": xi}, jit=True)
    np.testing.assert_array_equal(np.asarray(y), [[42, 5]])


def test_feature_vectorizer_slices_and_pads():
    a = np.asarray([[1.0, 2.0, 3.0]], np.float32)
    b = np.asarray([[4.0]], np.float32)
    (y,) = _run([P.make_node("FeatureVectorizer", ["a", "b"], ["y"],
                             domain=ML, inputdimensions=[2, 2])],
                {"a": a, "b": b}, jit=True)
    np.testing.assert_allclose(np.asarray(y), [[1.0, 2.0, 4.0, 0.0]])


# ---------------------------------------------------------------------------
# encoders
# ---------------------------------------------------------------------------

def test_one_hot_encoder_int_traced():
    x = np.asarray([[1, 7], [7, 9]], np.int64)
    (y,) = _run([P.make_node("OneHotEncoder", ["x"], ["y"], domain=ML,
                             cats_int64s=[1, 7])], {"x": x}, jit=True)
    np.testing.assert_array_equal(
        np.asarray(y),
        [[[1, 0], [0, 1]], [[0, 1], [0, 0]]],
    )


def test_one_hot_encoder_strings():
    x = np.asarray(["cat", "dog", "bird"], dtype=object)
    (y,) = _run([P.make_node("OneHotEncoder", ["x"], ["y"], domain=ML,
                             cats_strings=["dog", "cat"])], {"x": x})
    np.testing.assert_array_equal(
        np.asarray(y), [[0, 1], [1, 0], [0, 0]]
    )


def test_one_hot_encoder_zeros0_rejects():
    x = np.asarray(["emu"], dtype=object)
    with pytest.raises(ValueError, match="not in cats"):
        _run([P.make_node("OneHotEncoder", ["x"], ["y"], domain=ML,
                          cats_strings=["dog"], zeros=0)], {"x": x})


def test_label_encoder_int_to_string():
    x = np.asarray([0, 2, 5], np.int64)
    (y,) = _run([P.make_node("LabelEncoder", ["x"], ["y"], domain=ML,
                             keys_int64s=[0, 2], values_strings=["a", "b"],
                             default_string="?")], {"x": x})
    assert np.asarray(y).tolist() == ["a", "b", "?"]


def test_label_encoder_string_to_int():
    x = np.asarray(["b", "a", "zz"], dtype=object)
    (y,) = _run([P.make_node("LabelEncoder", ["x"], ["y"], domain=ML,
                             keys_strings=["a", "b"], values_int64s=[10, 20],
                             default_int64=-5)], {"x": x})
    assert np.asarray(y).tolist() == [20, 10, -5]


def test_label_encoder_numeric_traced_with_nan_key():
    x = np.asarray([1.0, np.nan, 3.0], np.float32)
    (y,) = _run([P.make_node("LabelEncoder", ["x"], ["y"], domain=ML,
                             keys_floats=[1.0, float("nan")],
                             values_floats=[10.0, 99.0],
                             default_float=-1.0)], {"x": x}, jit=True)
    np.testing.assert_allclose(np.asarray(y), [10.0, 99.0, -1.0])


def test_category_mapper_both_directions():
    node = lambda: P.make_node("CategoryMapper", ["x"], ["y"], domain=ML,
                               cats_int64s=[1, 2], cats_strings=["one", "two"],
                               default_int64=-1, default_string="none")
    (y,) = _run([node()], {"x": np.asarray(["two", "xx"], dtype=object)})
    assert np.asarray(y).tolist() == [2, -1]
    (y,) = _run([node()], {"x": np.asarray([1, 9], np.int64)})
    assert np.asarray(y).tolist() == ["one", "none"]


# ---------------------------------------------------------------------------
# map ops
# ---------------------------------------------------------------------------

def test_zipmap_after_scores():
    scores = np.asarray([[0.2, 0.8], [0.9, 0.1]], np.float32)
    (y,) = _run([P.make_node("ZipMap", ["x"], ["y"], domain=ML,
                             classlabels_strings=["no", "yes"])],
                {"x": scores})
    assert y == [{"no": np.float32(0.2), "yes": np.float32(0.8)},
                 {"no": np.float32(0.9), "yes": np.float32(0.1)}]


def test_dict_vectorizer_roundtrip_with_zipmap():
    # ZipMap -> (host seq of maps); DictVectorizer over one map comes from
    # a direct host value, so drive the op function via a tiny graph chain.
    scores = np.asarray([[1.0, 2.0]], np.float32)
    nodes = [
        P.make_node("ZipMap", ["x"], ["m"], domain=ML,
                    classlabels_strings=["a", "b"]),
    ]
    (m,) = _run(nodes, {"x": scores}, outputs=("m",))
    assert m[0] == {"a": 1.0, "b": 2.0}


def test_dict_vectorizer():
    from birdnet_tpu.compiler.ops import get_lowering, OpContext

    fn = get_lowering("DictVectorizer", ML)
    ctx = OpContext("DictVectorizer",
                    {"string_vocabulary": ["a", "b", "c"]})
    (y,) = fn(ctx, [{"b": 2.0}, {"a": 1.0, "c": 3.0}])
    np.testing.assert_allclose(y, [[0, 2, 0], [1, 0, 3]])


def test_cast_map_dense_and_sparse():
    from birdnet_tpu.compiler.ops import get_lowering, OpContext

    fn = get_lowering("CastMap", ML)
    (y,) = fn(OpContext("CastMap", {"cast_to": "TO_FLOAT"}),
              {2: 5.0, 0: 1.0})
    np.testing.assert_allclose(y, [1.0, 5.0])
    (y,) = fn(OpContext("CastMap", {"cast_to": "TO_INT64",
                                    "map_form": "SPARSE", "max_map": 4}),
              {2: 5, 0: 1})
    assert y.tolist() == [1, 0, 5, 0] and y.dtype == np.int64


# ---------------------------------------------------------------------------
# linear models
# ---------------------------------------------------------------------------

def test_linear_regressor():
    x = np.asarray([[1.0, 2.0], [3.0, 4.0]], np.float32)
    (y,) = _run([P.make_node("LinearRegressor", ["x"], ["y"], domain=ML,
                             coefficients=[0.5, -1.0], intercepts=[0.25],
                             targets=1)], {"x": x}, jit=True)
    np.testing.assert_allclose(np.asarray(y), [[0.5 - 2 + 0.25],
                                               [1.5 - 4 + 0.25]])


def test_linear_classifier_multiclass_softmax():
    x = np.asarray([[1.0, 0.0]], np.float32)
    # 3 classes x 2 features
    coef = [1.0, 0.0, 0.0, 1.0, -1.0, -1.0]
    lab, scores = _run(
        [P.make_node("LinearClassifier", ["x"], ["lab", "s"], domain=ML,
                     coefficients=coef, intercepts=[0.0, 0.0, 0.0],
                     classlabels_int64s=[10, 20, 30],
                     post_transform="SOFTMAX")],
        {"x": x}, outputs=("lab", "s"), jit=True,
    )
    raw = np.asarray([1.0, 0.0, -1.0])
    expect = np.exp(raw) / np.exp(raw).sum()
    np.testing.assert_allclose(np.asarray(scores)[0], expect, rtol=1e-6)
    assert np.asarray(lab).tolist() == [10]


def test_linear_classifier_binary_single_row_logistic():
    x = np.asarray([[2.0]], np.float32)
    lab, scores = _run(
        [P.make_node("LinearClassifier", ["x"], ["lab", "s"], domain=ML,
                     coefficients=[1.0], intercepts=[0.0],
                     classlabels_int64s=[0, 1],
                     post_transform="LOGISTIC")],
        {"x": x}, outputs=("lab", "s"), jit=True,
    )
    p = 1 / (1 + np.exp(-2.0))
    np.testing.assert_allclose(np.asarray(scores), [[1 - p, p]], rtol=1e-6)
    assert np.asarray(lab).tolist() == [1]


def test_linear_classifier_binary_none_negates():
    x = np.asarray([[-1.0]], np.float32)
    lab, scores = _run(
        [P.make_node("LinearClassifier", ["x"], ["lab", "s"], domain=ML,
                     coefficients=[3.0], classlabels_int64s=[7, 8])],
        {"x": x}, outputs=("lab", "s"), jit=True,
    )
    np.testing.assert_allclose(np.asarray(scores), [[3.0, -3.0]])
    assert np.asarray(lab).tolist() == [7]


def test_linear_classifier_string_labels_eager():
    x = np.asarray([[1.0, 0.0]], np.float32)
    lab, _ = _run(
        [P.make_node("LinearClassifier", ["x"], ["lab", "s"], domain=ML,
                     coefficients=[1.0, 0.0, 0.0, 1.0],
                     classlabels_strings=["neg", "pos"])],
        {"x": x}, outputs=("lab", "s"),
    )
    assert np.asarray(lab).tolist() == ["neg"]


# ---------------------------------------------------------------------------
# tree ensembles
# ---------------------------------------------------------------------------

def _forest_attrs():
    """Two trees over 2 features.

    tree0 (stump):    n0: f0 <= 0.5 ? n1(leaf) : n2(leaf)
    tree1 (depth 2):  n0: f1 > 1.0 ? n1(leaf) : n2[f0 <= -1 ? n3 : n4]
    """
    return dict(
        nodes_treeids=[0, 0, 0, 1, 1, 1, 1, 1],
        nodes_nodeids=[0, 1, 2, 0, 1, 2, 3, 4],
        nodes_featureids=[0, 0, 0, 1, 0, 0, 0, 0],
        nodes_values=[0.5, 0.0, 0.0, 1.0, 0.0, -1.0, 0.0, 0.0],
        nodes_modes=["BRANCH_LEQ", "LEAF", "LEAF", "BRANCH_GT", "LEAF",
                     "BRANCH_LEQ", "LEAF", "LEAF"],
        nodes_truenodeids=[1, 0, 0, 1, 0, 3, 0, 0],
        nodes_falsenodeids=[2, 0, 0, 2, 0, 4, 0, 0],
    )


def test_tree_regressor_sum_and_average():
    attrs = _forest_attrs()
    node = P.make_node(
        "TreeEnsembleRegressor", ["x"], ["y"], domain=ML, n_targets=1,
        target_treeids=[0, 0, 1, 1, 1], target_nodeids=[1, 2, 1, 3, 4],
        target_ids=[0, 0, 0, 0, 0], target_weights=[1.0, 2.0, 10.0, 20.0, 30.0],
        **attrs,
    )
    x = np.asarray([[0.0, 2.0], [1.0, 0.0], [-2.0, 0.0]], np.float32)
    (y,) = _run([node], {"x": x}, jit=True)
    np.testing.assert_allclose(np.asarray(y), [[11.0], [32.0], [21.0]])

    node_avg = P.make_node(
        "TreeEnsembleRegressor", ["x"], ["y"], domain=ML, n_targets=1,
        aggregate_function="AVERAGE",
        target_treeids=[0, 0, 1, 1, 1], target_nodeids=[1, 2, 1, 3, 4],
        target_ids=[0, 0, 0, 0, 0], target_weights=[1.0, 2.0, 10.0, 20.0, 30.0],
        **attrs,
    )
    (y,) = _run([node_avg], {"x": x}, jit=True)
    np.testing.assert_allclose(np.asarray(y), [[5.5], [16.0], [10.5]])


def test_tree_regressor_missing_value_tracks_true():
    attrs = _forest_attrs()
    attrs["nodes_missing_value_tracks_true"] = [1, 0, 0, 0, 0, 0, 0, 0]
    node = P.make_node(
        "TreeEnsembleRegressor", ["x"], ["y"], domain=ML, n_targets=1,
        target_treeids=[0, 0, 1, 1, 1], target_nodeids=[1, 2, 1, 3, 4],
        target_ids=[0, 0, 0, 0, 0], target_weights=[1.0, 2.0, 10.0, 20.0, 30.0],
        **attrs,
    )
    x = np.asarray([[np.nan, 2.0]], np.float32)
    (y,) = _run([node], {"x": x}, jit=True)
    # NaN at tree0's root tracks true -> leaf1 (1.0); tree1: f1=2>1 -> 10.
    np.testing.assert_allclose(np.asarray(y), [[11.0]])
    # without the flag, NaN goes false -> leaf2 (2.0)
    node2 = P.make_node(
        "TreeEnsembleRegressor", ["x"], ["y"], domain=ML, n_targets=1,
        target_treeids=[0, 0, 1, 1, 1], target_nodeids=[1, 2, 1, 3, 4],
        target_ids=[0, 0, 0, 0, 0], target_weights=[1.0, 2.0, 10.0, 20.0, 30.0],
        **_forest_attrs(),
    )
    (y,) = _run([node2], {"x": x}, jit=True)
    np.testing.assert_allclose(np.asarray(y), [[12.0]])


def test_tree_regressor_base_values_min_max():
    attrs = _forest_attrs()
    common = dict(
        target_treeids=[0, 0, 1, 1, 1], target_nodeids=[1, 2, 1, 3, 4],
        target_ids=[0, 0, 0, 0, 0],
        target_weights=[1.0, 2.0, 10.0, 20.0, 30.0],
    )
    node = P.make_node("TreeEnsembleRegressor", ["x"], ["y"], domain=ML,
                       n_targets=1, base_values=[100.0], **common, **attrs)
    x = np.asarray([[0.0, 2.0]], np.float32)
    (y,) = _run([node], {"x": x}, jit=True)
    np.testing.assert_allclose(np.asarray(y), [[111.0]])
    for agg, expect in [("MIN", 1.0), ("MAX", 10.0)]:
        node = P.make_node("TreeEnsembleRegressor", ["x"], ["y"], domain=ML,
                           n_targets=1, aggregate_function=agg,
                           **common, **attrs)
        (y,) = _run([node], {"x": x}, jit=True)
        np.testing.assert_allclose(np.asarray(y), [[expect]])


def test_tree_classifier_votes():
    attrs = _forest_attrs()
    node = P.make_node(
        "TreeEnsembleClassifier", ["x"], ["lab", "s"], domain=ML,
        classlabels_int64s=[100, 200],
        class_treeids=[0, 0, 1, 1, 1], class_nodeids=[1, 2, 1, 3, 4],
        class_ids=[0, 1, 0, 0, 1], class_weights=[1.0, 1.0, 1.0, 1.0, 1.0],
        **attrs,
    )
    x = np.asarray([[0.0, 2.0], [1.0, 0.0]], np.float32)
    lab, s = _run([node], {"x": x}, outputs=("lab", "s"), jit=True)
    np.testing.assert_allclose(np.asarray(s), [[2.0, 0.0], [0.0, 2.0]])
    assert np.asarray(lab).tolist() == [100, 200]


def test_tree_classifier_binary_single_score_positive_votes():
    # single-column binary, all-positive weights, NONE -> pair (1-s, s)
    node = P.make_node(
        "TreeEnsembleClassifier", ["x"], ["lab", "s"], domain=ML,
        classlabels_int64s=[0, 1],
        nodes_treeids=[0, 0, 0], nodes_nodeids=[0, 1, 2],
        nodes_featureids=[0, 0, 0], nodes_values=[0.5, 0.0, 0.0],
        nodes_modes=["BRANCH_LEQ", "LEAF", "LEAF"],
        nodes_truenodeids=[1, 0, 0], nodes_falsenodeids=[2, 0, 0],
        class_treeids=[0, 0], class_nodeids=[1, 2], class_ids=[0, 0],
        class_weights=[0.2, 0.9],
    )
    x = np.asarray([[0.0], [1.0]], np.float32)
    lab, s = _run([node], {"x": x}, outputs=("lab", "s"), jit=True)
    np.testing.assert_allclose(np.asarray(s), [[0.8, 0.2], [0.1, 0.9]],
                               rtol=1e-6)
    assert np.asarray(lab).tolist() == [0, 1]


def test_tree_classifier_binary_margin_logistic():
    node = P.make_node(
        "TreeEnsembleClassifier", ["x"], ["lab", "s"], domain=ML,
        classlabels_int64s=[0, 1], post_transform="LOGISTIC",
        nodes_treeids=[0, 0, 0], nodes_nodeids=[0, 1, 2],
        nodes_featureids=[0, 0, 0], nodes_values=[0.5, 0.0, 0.0],
        nodes_modes=["BRANCH_LEQ", "LEAF", "LEAF"],
        nodes_truenodeids=[1, 0, 0], nodes_falsenodeids=[2, 0, 0],
        class_treeids=[0, 0], class_nodeids=[1, 2], class_ids=[0, 0],
        class_weights=[-1.5, 2.0],
    )
    x = np.asarray([[0.0]], np.float32)
    lab, s = _run([node], {"x": x}, outputs=("lab", "s"), jit=True)
    p = 1 / (1 + np.exp(-1.5))
    np.testing.assert_allclose(np.asarray(s), [[p, 1 - p]], rtol=1e-6)
    assert np.asarray(lab).tolist() == [0]


def test_tree_classifier_string_labels_eager():
    attrs = _forest_attrs()
    node = P.make_node(
        "TreeEnsembleClassifier", ["x"], ["lab", "s"], domain=ML,
        classlabels_strings=["low", "high"],
        class_treeids=[0, 0, 1, 1, 1], class_nodeids=[1, 2, 1, 3, 4],
        class_ids=[0, 1, 0, 0, 1], class_weights=[1.0, 1.0, 1.0, 1.0, 1.0],
        **attrs,
    )
    x = np.asarray([[1.0, 0.0]], np.float32)
    lab, _ = _run([node], {"x": x}, outputs=("lab", "s"))
    assert np.asarray(lab).tolist() == ["high"]


def test_tree_ensemble_rejects_broken_topology():
    attrs = _forest_attrs()
    attrs["nodes_truenodeids"] = [9, 0, 0, 1, 0, 3, 0, 0]  # missing child
    node = P.make_node(
        "TreeEnsembleRegressor", ["x"], ["y"], domain=ML, n_targets=1,
        target_treeids=[0], target_nodeids=[1], target_ids=[0],
        target_weights=[1.0], **attrs,
    )
    with pytest.raises(Exception, match="child that does not exist"):
        _run([node], {"x": np.zeros((1, 2), np.float32)})


def test_tree_classifier_string_labels_jittable_when_label_dropped():
    # Output 0 named "" (unused): the string-label gather is skipped, so
    # the scores-only graph compiles under jit.
    attrs = _forest_attrs()
    node = P.make_node(
        "TreeEnsembleClassifier", ["x"], ["", "s"], domain=ML,
        classlabels_strings=["low", "high"],
        class_treeids=[0, 0, 1, 1, 1], class_nodeids=[1, 2, 1, 3, 4],
        class_ids=[0, 1, 0, 0, 1], class_weights=[1.0, 1.0, 1.0, 1.0, 1.0],
        **attrs,
    )
    x = np.asarray([[1.0, 0.0]], np.float32)
    (s,) = _run([node], {"x": x}, outputs=("s",), jit=True)
    np.testing.assert_allclose(np.asarray(s), [[0.0, 2.0]])


# ---------------------------------------------------------------------------
# SVMs
# ---------------------------------------------------------------------------

def test_svm_regressor_rbf():
    node = P.make_node(
        "SVMRegressor", ["x"], ["y"], domain=ML, n_supports=2,
        support_vectors=[0.0, 2.0], coefficients=[1.0, -0.5], rho=[0.25],
        kernel_type="RBF", kernel_params=[0.5, 0.0, 0.0],
    )
    x = np.asarray([[1.0]], np.float32)
    (y,) = _run([node], {"x": x}, jit=True)
    k = np.exp(-0.5)  # both SVs are distance 1 from x
    np.testing.assert_allclose(np.asarray(y), [[1.0 * k - 0.5 * k + 0.25]],
                               rtol=1e-6)


def test_svm_regressor_linear_and_one_class():
    node = P.make_node("SVMRegressor", ["x"], ["y"], domain=ML,
                       coefficients=[2.0], rho=[1.0])
    (y,) = _run([node], {"x": np.asarray([[3.0]], np.float32)}, jit=True)
    np.testing.assert_allclose(np.asarray(y), [[7.0]])
    node = P.make_node("SVMRegressor", ["x"], ["y"], domain=ML,
                       coefficients=[2.0], rho=[1.0], one_class=1)
    (y,) = _run([node], {"x": np.asarray([[3.0], [-3.0]], np.float32)},
                jit=True)
    np.testing.assert_allclose(np.asarray(y), [[1.0], [-1.0]])


def test_svm_classifier_one_vs_one_votes_and_decisions():
    # 3 classes, 1 linear-kernel SV each. Pairwise decisions hand-computed:
    # d01 = 1*2 + (-1)*1 + 0.1 = 1.1; d02 = 2*2 + 0.5*(-2) - 0.2 = 2.8;
    # d12 = (-2)*1 + 0.25*(-2) + 0.3 = -2.2 → votes 2/0/1 → class 0.
    node = P.make_node(
        "SVMClassifier", ["x"], ["lab", "s"], domain=ML,
        classlabels_int64s=[5, 6, 7], vectors_per_class=[1, 1, 1],
        support_vectors=[1.0, 0.0, 0.0, 1.0, -1.0, 0.0],
        coefficients=[1.0, -1.0, 0.5, 2.0, -2.0, 0.25],
        rho=[0.1, -0.2, 0.3],
    )
    x = np.asarray([[2.0, 1.0]], np.float32)
    lab, s = _run([node], {"x": x}, outputs=("lab", "s"), jit=True)
    np.testing.assert_allclose(np.asarray(s), [[1.1, 2.8, -2.2]], rtol=1e-6)
    assert np.asarray(lab).tolist() == [5]


def test_svm_classifier_binary_expands():
    node = P.make_node(
        "SVMClassifier", ["x"], ["lab", "s"], domain=ML,
        classlabels_int64s=[0, 1], vectors_per_class=[1, 1],
        support_vectors=[1.0, -1.0], coefficients=[0.5, -0.5], rho=[0.2],
    )
    x = np.asarray([[2.0]], np.float32)
    lab, s = _run([node], {"x": x}, outputs=("lab", "s"), jit=True)
    np.testing.assert_allclose(np.asarray(s), [[-2.2, 2.2]], rtol=1e-6)
    # d > 0 votes for the FIRST class (libsvm convention)
    assert np.asarray(lab).tolist() == [0]


def test_svm_classifier_linear_mode():
    node = P.make_node(
        "SVMClassifier", ["x"], ["lab", "s"], domain=ML,
        classlabels_int64s=[10, 20, 30],
        coefficients=[1.0, 0.0, 0.0, 1.0, -1.0, -1.0], rho=[0.5],
    )
    x = np.asarray([[1.0, 2.0]], np.float32)
    lab, s = _run([node], {"x": x}, outputs=("lab", "s"), jit=True)
    np.testing.assert_allclose(np.asarray(s), [[1.5, 2.5, -2.5]])
    assert np.asarray(lab).tolist() == [20]


def test_svm_classifier_platt_tables_produce_probabilities():
    """prob_a/prob_b (sklearn SVC(probability=True)) switch the scores to
    Wu-Lin-Weng coupled class probabilities; deep coverage lives in
    tests/test_svm_platt_fuzz.py."""
    node = P.make_node(
        "SVMClassifier", ["x"], ["lab", "s"], domain=ML,
        classlabels_int64s=[0, 1], vectors_per_class=[1, 1],
        support_vectors=[1.0, -1.0], coefficients=[0.5, -0.5], rho=[0.2],
        prob_a=[-1.0], prob_b=[0.1],
    )
    lab, s = _run([node], {"x": np.asarray([[2.0], [-4.0]], np.float32)},
                  outputs=("lab", "s"), jit=True)
    s = np.asarray(s)
    assert s.shape == (2, 2)
    assert np.all(s > 0) and np.all(s < 1)
    np.testing.assert_allclose(s.sum(axis=1), [1.0, 1.0], atol=1e-4)
    assert np.asarray(lab).tolist() == [0, 1]


# ---------------------------------------------------------------------------
# unified TreeEnsemble (ai.onnx.ml opset 5)
# ---------------------------------------------------------------------------

def _v5_forest():
    """Same forest as _forest_attrs() in the v5 encoding: inner nodes
    [t0-root(f0<=0.5), t1-root(f1>1.0), t1-inner(f0<=-1)], leaves
    [1, 2, 10, 20, 30] all on target 0."""
    return dict(
        nodes_featureids=[0, 1, 0],
        nodes_splits=np.asarray([0.5, 1.0, -1.0], np.float32),
        nodes_modes=np.asarray([0, 3, 0], np.uint8),  # LEQ, GT, LEQ
        nodes_truenodeids=[0, 2, 3], nodes_trueleafs=[1, 1, 1],
        nodes_falsenodeids=[1, 2, 4], nodes_falseleafs=[1, 0, 1],
        leaf_targetids=[0, 0, 0, 0, 0],
        leaf_weights=np.asarray([1.0, 2.0, 10.0, 20.0, 30.0], np.float32),
        tree_roots=[0, 1],
        n_targets=1,
    )


def test_tree_ensemble_v5_matches_v1_semantics():
    node = P.make_node("TreeEnsemble", ["x"], ["y"], domain=ML, **_v5_forest())
    x = np.asarray([[0.0, 2.0], [1.0, 0.0], [-2.0, 0.0]], np.float32)
    (y,) = _run([node], {"x": x}, jit=True)
    np.testing.assert_allclose(np.asarray(y), [[11.0], [32.0], [21.0]])


def test_tree_ensemble_v5_average_and_logistic_codes():
    attrs = _v5_forest()
    attrs["aggregate_function"] = 0  # AVERAGE
    node = P.make_node("TreeEnsemble", ["x"], ["y"], domain=ML, **attrs)
    x = np.asarray([[0.0, 2.0]], np.float32)
    (y,) = _run([node], {"x": x}, jit=True)
    np.testing.assert_allclose(np.asarray(y), [[5.5]])
    attrs = _v5_forest()
    attrs["post_transform"] = 2  # LOGISTIC
    node = P.make_node("TreeEnsemble", ["x"], ["y"], domain=ML, **attrs)
    (y,) = _run([node], {"x": x}, jit=True)
    np.testing.assert_allclose(np.asarray(y), [[1 / (1 + np.exp(-11.0))]],
                               rtol=1e-6)


def test_tree_ensemble_v5_membership():
    # single BRANCH_MEMBER node: x0 in {1, 3} ? 5 : 7
    node = P.make_node(
        "TreeEnsemble", ["x"], ["y"], domain=ML,
        nodes_featureids=[0],
        nodes_splits=np.asarray([0.0], np.float32),
        nodes_modes=np.asarray([6], np.uint8),
        nodes_truenodeids=[0], nodes_trueleafs=[1],
        nodes_falsenodeids=[1], nodes_falseleafs=[1],
        leaf_targetids=[0, 0],
        leaf_weights=np.asarray([5.0, 7.0], np.float32),
        membership_values=np.asarray([1.0, 3.0], np.float32),
        tree_roots=[0], n_targets=1,
    )
    x = np.asarray([[1.0], [2.0], [3.0]], np.float32)
    (y,) = _run([node], {"x": x}, jit=True)
    np.testing.assert_allclose(np.asarray(y), [[5.0], [7.0], [5.0]])


def test_tree_ensemble_v5_missing_tracks_true():
    attrs = _v5_forest()
    attrs["nodes_missing_value_tracks_true"] = [1, 0, 0]
    node = P.make_node("TreeEnsemble", ["x"], ["y"], domain=ML, **attrs)
    x = np.asarray([[np.nan, 2.0]], np.float32)
    (y,) = _run([node], {"x": x}, jit=True)
    np.testing.assert_allclose(np.asarray(y), [[11.0]])


def test_tree_ensemble_v5_rejects_bad_topology():
    attrs = _v5_forest()
    attrs["nodes_truenodeids"] = [9, 2, 3]  # leaf index out of range
    node = P.make_node("TreeEnsemble", ["x"], ["y"], domain=ML, **attrs)
    with pytest.raises(Exception, match="child that does not exist"):
        _run([node], {"x": np.zeros((1, 2), np.float32)})


# ---------------------------------------------------------------------------
# review-fix regressions (binary pairing order, pruned classes, shared leaves)
# ---------------------------------------------------------------------------

def test_linear_classifier_binary_softmax_depends_on_input():
    # SOFTMAX over a single column is identically 1.0; the pair must be
    # built first so the transform sees both columns.
    outs = []
    for v in (-5.0, 0.5, 5.0):
        _, s = _run(
            [P.make_node("LinearClassifier", ["x"], ["lab", "s"], domain=ML,
                         coefficients=[1.0], classlabels_int64s=[0, 1],
                         post_transform="SOFTMAX")],
            {"x": np.asarray([[v]], np.float32)}, outputs=("lab", "s"),
            jit=True,
        )
        outs.append(np.asarray(s)[0])
        e = np.exp([-v, v])
        np.testing.assert_allclose(np.asarray(s)[0], e / e.sum(), rtol=1e-6)
    assert not np.allclose(outs[0], outs[2])


def test_tree_classifier_binary_positive_votes_logistic_keeps_label0():
    # vote fraction 0.2 with LOGISTIC: pair (1-s, s) FIRST, then sigmoid —
    # (sigmoid(0.8), sigmoid(0.2)) keeps label 0; transforming the margin
    # pair (-s, s) would flip it to label 1.
    node = P.make_node(
        "TreeEnsembleClassifier", ["x"], ["lab", "s"], domain=ML,
        classlabels_int64s=[0, 1], post_transform="LOGISTIC",
        nodes_treeids=[0, 0, 0], nodes_nodeids=[0, 1, 2],
        nodes_featureids=[0, 0, 0], nodes_values=[0.5, 0.0, 0.0],
        nodes_modes=["BRANCH_LEQ", "LEAF", "LEAF"],
        nodes_truenodeids=[1, 0, 0], nodes_falsenodeids=[2, 0, 0],
        class_treeids=[0, 0], class_nodeids=[1, 2], class_ids=[0, 0],
        class_weights=[0.2, 0.9],
    )
    x = np.asarray([[0.0]], np.float32)
    lab, s = _run([node], {"x": x}, outputs=("lab", "s"), jit=True)
    sig = lambda v: 1 / (1 + np.exp(-v))
    np.testing.assert_allclose(np.asarray(s), [[sig(0.8), sig(0.2)]],
                               rtol=1e-6)
    assert np.asarray(lab).tolist() == [0]


def test_tree_classifier_pruned_class_keeps_zero_column():
    # class 2 appears in no leaf entry but still owns a score column, and
    # can win when the scored classes go negative.
    attrs = _forest_attrs()
    node = P.make_node(
        "TreeEnsembleClassifier", ["x"], ["lab", "s"], domain=ML,
        classlabels_int64s=[10, 20, 30],
        class_treeids=[0, 0, 1, 1, 1], class_nodeids=[1, 2, 1, 3, 4],
        class_ids=[0, 1, 0, 0, 1],
        class_weights=[-1.0, -1.0, -1.0, -1.0, -1.0],
        **attrs,
    )
    x = np.asarray([[0.0, 2.0]], np.float32)
    lab, s = _run([node], {"x": x}, outputs=("lab", "s"), jit=True)
    assert np.asarray(s).shape == (1, 3)
    np.testing.assert_allclose(np.asarray(s), [[-2.0, 0.0, 0.0]])
    # tie between the zero columns -> first max -> class 20
    assert np.asarray(lab).tolist() == [20]


def test_tree_ensemble_v5_shared_leaf_both_branches():
    # Both children of the root point at the same leaf (a constant tree) —
    # legal in v5's separate-leaf-pool encoding; payout counts it once.
    node = P.make_node(
        "TreeEnsemble", ["x"], ["y"], domain=ML,
        nodes_featureids=[0],
        nodes_splits=np.asarray([0.0], np.float32),
        nodes_modes=np.asarray([0], np.uint8),
        nodes_truenodeids=[0], nodes_trueleafs=[1],
        nodes_falsenodeids=[0], nodes_falseleafs=[1],
        leaf_targetids=[0], leaf_weights=np.asarray([4.5], np.float32),
        tree_roots=[0], n_targets=1,
    )
    x = np.asarray([[-1.0], [1.0]], np.float32)
    (y,) = _run([node], {"x": x}, jit=True)
    np.testing.assert_allclose(np.asarray(y), [[4.5], [4.5]])


# ---------------------------------------------------------------------------
# malformed-model validation (advisor round-2 findings)
# ---------------------------------------------------------------------------

def test_tree_regressor_target_ids_out_of_range():
    """target_ids >= n_targets must raise, not silently drop the scatter
    column (JAX .at[].add drops out-of-range indices)."""
    attrs = _forest_attrs()
    node = P.make_node(
        "TreeEnsembleRegressor", ["x"], ["y"], domain=ML, n_targets=1,
        target_treeids=[0, 0, 1, 1, 1], target_nodeids=[1, 2, 1, 3, 4],
        target_ids=[0, 0, 0, 0, 1],  # 1 >= n_targets=1
        target_weights=[1.0, 2.0, 10.0, 20.0, 30.0],
        **attrs,
    )
    x = np.asarray([[0.0, 2.0]], np.float32)
    with pytest.raises(Exception, match="target_ids.*outside"):
        _run([node], {"x": x})


def test_tree_regressor_negative_target_id_rejected():
    attrs = _forest_attrs()
    node = P.make_node(
        "TreeEnsembleRegressor", ["x"], ["y"], domain=ML, n_targets=1,
        target_treeids=[0, 0, 1, 1, 1], target_nodeids=[1, 2, 1, 3, 4],
        target_ids=[0, 0, 0, 0, -1],
        target_weights=[1.0, 2.0, 10.0, 20.0, 30.0],
        **attrs,
    )
    x = np.asarray([[0.0, 2.0]], np.float32)
    with pytest.raises(Exception, match="target_ids.*outside"):
        _run([node], {"x": x})


def test_tree_feature_id_out_of_range_rejected():
    """A branch node referencing feature 5 of a 2-feature input must raise
    (the on-device gather clamps, silently reading the last column)."""
    attrs = _forest_attrs()
    attrs["nodes_featureids"] = [5, 0, 0, 1, 0, 0, 0, 0]  # root tests f5
    node = P.make_node(
        "TreeEnsembleRegressor", ["x"], ["y"], domain=ML, n_targets=1,
        target_treeids=[0, 0, 1, 1, 1], target_nodeids=[1, 2, 1, 3, 4],
        target_ids=[0, 0, 0, 0, 0], target_weights=[1.0, 2.0, 10.0, 20.0, 30.0],
        **attrs,
    )
    x = np.asarray([[0.0, 2.0]], np.float32)
    with pytest.raises(Exception, match="feature 5.*only 2 features"):
        _run([node], {"x": x})


def test_tree_leaf_feature_id_ignored():
    """Leaf nodes may carry arbitrary featureids (exporters often leave
    garbage there); only branch nodes are validated."""
    attrs = _forest_attrs()
    ids = list(attrs["nodes_featureids"])
    ids[1] = 99  # a LEAF node
    attrs["nodes_featureids"] = ids
    node = P.make_node(
        "TreeEnsembleRegressor", ["x"], ["y"], domain=ML, n_targets=1,
        target_treeids=[0, 0, 1, 1, 1], target_nodeids=[1, 2, 1, 3, 4],
        target_ids=[0, 0, 0, 0, 0], target_weights=[1.0, 2.0, 10.0, 20.0, 30.0],
        **attrs,
    )
    x = np.asarray([[0.0, 2.0]], np.float32)
    (y,) = _run([node], {"x": x}, jit=True)
    np.testing.assert_allclose(np.asarray(y), [[11.0]])


def test_svm_classifier_truncated_rho_rejected():
    # 3 classes -> 3 pairs; only 1 rho entry.
    node = P.make_node(
        "SVMClassifier", ["x"], ["lab", "s"], domain=ML,
        classlabels_int64s=[5, 6, 7], vectors_per_class=[1, 1, 1],
        support_vectors=[1.0, 0.0, 0.0, 1.0, -1.0, 0.0],
        coefficients=[1.0, -1.0, 0.5, 2.0, -2.0, 0.25],
        rho=[0.1],
    )
    x = np.asarray([[2.0, 1.0]], np.float32)
    with pytest.raises(Exception, match="rho.*one-vs-one pairs"):
        _run([node], {"x": x}, outputs=("lab", "s"))


def test_svm_classifier_wrong_coefficient_count_rejected():
    node = P.make_node(
        "SVMClassifier", ["x"], ["lab", "s"], domain=ML,
        classlabels_int64s=[5, 6, 7], vectors_per_class=[1, 1, 1],
        support_vectors=[1.0, 0.0, 0.0, 1.0, -1.0, 0.0],
        coefficients=[1.0, -1.0, 0.5, 2.0],  # needs (3-1)*3 = 6
        rho=[0.1, -0.2, 0.3],
    )
    x = np.asarray([[2.0, 1.0]], np.float32)
    with pytest.raises(Exception, match="coefficients, expected"):
        _run([node], {"x": x}, outputs=("lab", "s"))


def test_label_encoder_tensor_form_numeric():
    """LabelEncoder-4 tensor-form tables (keys_tensor/values_tensor/
    default_tensor)."""
    node = P.make_node(
        "LabelEncoder", ["x"], ["y"], domain=ML,
        keys_tensor=np.asarray([1, 2, 3], np.int64),
        values_tensor=np.asarray([10.0, 20.0, 30.0], np.float32),
        default_tensor=np.asarray([-5.0], np.float32),
    )
    x = np.asarray([2, 9, 1], np.int64)
    (y,) = _run([node], {"x": x}, jit=True)
    np.testing.assert_allclose(np.asarray(y), [20.0, -5.0, 10.0])


def test_label_encoder_tensor_form_strings():
    node = P.make_node(
        "LabelEncoder", ["x"], ["y"], domain=ML,
        keys_tensor=np.asarray(["a", "b"], object),
        values_tensor=np.asarray([7, 8], np.int64),
        default_tensor=np.asarray([-1], np.int64),
    )
    x = np.asarray(["b", "zz", "a"], object)
    (y,) = _run([node], {"x": x})
    assert np.asarray(y).tolist() == [8, -1, 7]
