"""Property-based tree-ensemble fuzz.

Random forests (unbalanced topologies, every branch mode, NaN inputs,
missing-value-tracks-true, multi-target, random aggregates) evaluated two
ways: a deliberately simple per-row recursive Python descent (the oracle)
vs the compiler's vectorized fixed-depth jitted descent. The two
implementations share no code — the oracle walks ONE tree for ONE row at
a time, the compiler walks [batch, trees] cursors — so a structural bug
in the vectorized path (child indexing, leaf payout scatter, mode
dispatch, NaN routing) diverges immediately.
"""

import jax
import numpy as np
import pytest

from birdnet_tpu.compiler import import_onnx, make_forward
from birdnet_tpu.onnx import proto as P

ML = "ai.onnx.ml"
MODES = ["BRANCH_LEQ", "BRANCH_LT", "BRANCH_GTE", "BRANCH_GT",
         "BRANCH_EQ", "BRANCH_NEQ"]


def _random_forest(rng, n_trees, n_feat, n_targets, max_depth):
    """Returns (v1_attrs, trees) where trees is a list of dict-form nodes
    for the oracle: {id, feat, thr, mode, true, false, miss, leaf_weightings}."""
    nodes_treeids, nodes_nodeids, nodes_featureids = [], [], []
    nodes_values, nodes_modes = [], []
    nodes_true, nodes_false, nodes_miss = [], [], []
    t_tree, t_node, t_id, t_w = [], [], [], []
    trees = []

    for t in range(n_trees):
        nodes = {}
        next_id = [0]

        def build(depth):
            nid = next_id[0]
            next_id[0] += 1
            if depth >= max_depth or (depth > 0 and rng.random() < 0.3):
                # leaf: 1-2 target contributions
                payouts = []
                for _ in range(rng.integers(1, 3)):
                    payouts.append((int(rng.integers(0, n_targets)),
                                    float(rng.normal())))
                nodes[nid] = dict(mode="LEAF", payouts=payouts)
                return nid
            mode = MODES[rng.integers(0, len(MODES))]
            thr = float(np.round(rng.normal(), 2))
            node = dict(
                mode=mode, feat=int(rng.integers(0, n_feat)), thr=thr,
                miss=int(rng.random() < 0.3),
            )
            nodes[nid] = node
            node["true"] = build(depth + 1)
            node["false"] = build(depth + 1)
            return nid

        build(0)
        trees.append(nodes)
        for nid, node in nodes.items():
            nodes_treeids.append(t)
            nodes_nodeids.append(nid)
            if node["mode"] == "LEAF":
                nodes_featureids.append(0)
                nodes_values.append(0.0)
                nodes_modes.append("LEAF")
                nodes_true.append(0)
                nodes_false.append(0)
                nodes_miss.append(0)
                for cid, w in node["payouts"]:
                    t_tree.append(t)
                    t_node.append(nid)
                    t_id.append(cid)
                    t_w.append(w)
            else:
                nodes_featureids.append(node["feat"])
                nodes_values.append(node["thr"])
                nodes_modes.append(node["mode"])
                nodes_true.append(node["true"])
                nodes_false.append(node["false"])
                nodes_miss.append(node["miss"])

    attrs = dict(
        nodes_treeids=nodes_treeids, nodes_nodeids=nodes_nodeids,
        nodes_featureids=nodes_featureids, nodes_values=nodes_values,
        nodes_modes=nodes_modes, nodes_truenodeids=nodes_true,
        nodes_falsenodeids=nodes_false,
        nodes_missing_value_tracks_true=nodes_miss,
        target_treeids=t_tree, target_nodeids=t_node, target_ids=t_id,
        target_weights=t_w, n_targets=n_targets,
    )
    return attrs, trees


def _oracle_row(trees, row, n_targets, agg):
    """Per-row recursive descent, one tree at a time."""
    per_tree = np.zeros((len(trees), n_targets), np.float64)
    for t, nodes in enumerate(trees):
        nid = 0
        while nodes[nid]["mode"] != "LEAF":
            node = nodes[nid]
            v = np.float32(row[node["feat"]])
            if np.isnan(v):
                cond = bool(node["miss"])
            else:
                # ONNX stores thresholds as float32; compare in float32
                # like the model does (a float64 oracle diverges exactly
                # on quantized boundary values).
                thr = np.float32(node["thr"])
                cond = {
                    "BRANCH_LEQ": v <= thr, "BRANCH_LT": v < thr,
                    "BRANCH_GTE": v >= thr, "BRANCH_GT": v > thr,
                    "BRANCH_EQ": v == thr, "BRANCH_NEQ": v != thr,
                }[node["mode"]]
            nid = node["true"] if cond else node["false"]
        for cid, w in nodes[nid]["payouts"]:
            per_tree[t, cid] += w
    if agg == "SUM":
        return per_tree.sum(axis=0)
    if agg == "AVERAGE":
        return per_tree.sum(axis=0) / len(trees)
    if agg == "MIN":
        return per_tree.min(axis=0)
    return per_tree.max(axis=0)


def _run_model(attrs, x, agg):
    node = P.make_node("TreeEnsembleRegressor", ["x"], ["y"], domain=ML,
                       aggregate_function=agg, **attrs)
    graph = P.GraphProto(
        name="f", node=[node],
        input=[P.make_value_info("x", P.DataType.FLOAT, list(x.shape))],
        output=[P.make_value_info("y", P.DataType.FLOAT, [])],
    )
    model = P.ModelProto(
        ir_version=8, producer_name="t", producer_version="0", graph=graph,
        opset_import=[P.OperatorSetId(domain="", version=17),
                      P.OperatorSetId(domain=ML, version=3)],
    )
    imported = import_onnx(model, optimize=False)
    (y,) = jax.jit(make_forward(imported))(imported.params, x)
    return np.asarray(y)


@pytest.mark.parametrize("seed", range(12))
def test_random_forest_matches_recursive_oracle(seed):
    rng = np.random.default_rng(1000 + seed)
    n_trees = int(rng.integers(1, 6))
    n_feat = int(rng.integers(1, 5))
    n_targets = int(rng.integers(1, 4))
    max_depth = int(rng.integers(1, 6))
    agg = ["SUM", "AVERAGE", "MIN", "MAX"][seed % 4]
    attrs, trees = _random_forest(rng, n_trees, n_feat, n_targets, max_depth)

    x = rng.normal(size=(16, n_feat)).astype(np.float32)
    # quantize some values onto the 2-decimal threshold grid so EQ/LEQ
    # boundaries hit, and sprinkle NaNs to exercise missing-value routing.
    quant = rng.random(x.shape) < 0.25
    x[quant] = np.round(x[quant], 2)
    x[rng.random(x.shape) < 0.1] = np.nan

    got = _run_model(attrs, x, agg)
    want = np.stack([
        _oracle_row(trees, row, n_targets, agg) for row in x.astype(np.float64)
    ])
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-5,
                               atol=1e-6)
