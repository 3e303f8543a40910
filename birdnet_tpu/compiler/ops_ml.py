"""``ai.onnx.ml`` domain — the classical-ML operator set.

ONNX Runtime ships these kernels (sklearn-exported pipelines use them:
scalers, encoders, linear/SVM/tree models), so the reference engine accepts
such files transparently (reference: src/classifier.rs:348-350, :637-639).
Lowering strategy mirrors the text ops:

- **Numeric compute is traced JAX** (Scaler, Normalizer, Binarizer,
  Imputer, LinearClassifier/Regressor, OneHotEncoder over numbers,
  numeric LabelEncoder, tree/SVM ensembles): gathers/compares/matmuls XLA
  maps onto the VPU/MXU, so these jit and run on device.
- **String/map-typed values are host objects** (dicts and string arrays
  flowing through the interpreter env, like Sequence/Optional): ZipMap,
  DictVectorizer, CastMap, CategoryMapper and string label/category paths
  run host-side and require compile-time-concrete inputs — they work in
  eager ``make_forward`` calls, and raise a clear error under ``jit``.

Post-transform semantics follow the ORT kernels: NONE, SOFTMAX, LOGISTIC,
SOFTMAX_ZERO (softmax over the nonzero entries only), PROBIT (inverse
normal CDF).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .ops import _is_static, contrib_op

_ML = "ai.onnx.ml"


def _ml_op(*names):
    return contrib_op(_ML, *names)


def _require_static(x, op_name, what="input"):
    if not _is_static(x):
        raise NotImplementedError(
            f"{_ML}.{op_name} needs a compile-time-concrete {what} (strings "
            f"and maps are host values; run the forward uncompiled)"
        )
    return x


# ---------------------------------------------------------------------------
# post-transforms (shared by the classifier/regressor family)
# ---------------------------------------------------------------------------


def _post_transform(scores, kind):
    if kind in (None, "NONE"):
        return scores
    if kind == "SOFTMAX":
        return jax.nn.softmax(scores, axis=-1)
    if kind == "LOGISTIC":
        return jax.nn.sigmoid(scores)
    if kind == "SOFTMAX_ZERO":
        # softmax over nonzero entries; exact zeros get probability 0.
        nz = scores != 0
        masked = jnp.where(nz, scores, -jnp.inf)
        sm = jax.nn.softmax(masked, axis=-1)
        return jnp.where(nz, sm, 0.0)
    if kind == "PROBIT":
        from jax.scipy.special import ndtri

        return ndtri(scores)
    raise ValueError(f"invalid post_transform {kind!r}")


def _class_labels(ctx):
    """(labels_array, is_string) from classlabels_* attributes."""
    ints = ctx.attr("classlabels_int64s")
    if ints is not None:
        return np.asarray([int(v) for v in ints], dtype=np.int64), False
    strs = ctx.attr("classlabels_strings")
    if strs is not None:
        return np.asarray([str(s) for s in strs], dtype=object), True
    raise ValueError("classifier node has no classlabels_* attribute")


def _pick_labels(ctx, scores, labels, is_string, op_name):
    """argmax over the score columns, mapped through the label vocabulary.
    Skipped (returns None) when the graph never binds the label output —
    that keeps string-labeled classifiers jittable for scores-only use."""
    if not ctx.wants_output(0):
        return None
    idx = jnp.argmax(scores, axis=-1)
    if not is_string:
        return jnp.take(jnp.asarray(labels), idx)
    _require_static(idx, op_name, what="input (string class labels)")
    return labels[np.asarray(idx)]


# ---------------------------------------------------------------------------
# feature plumbing
# ---------------------------------------------------------------------------


@_ml_op("ArrayFeatureExtractor")
def _array_feature_extractor(ctx, x, y):
    """Gather columns of the last axis by index (ORT semantics: indices
    apply to the last dimension)."""
    if _is_static(x) and np.asarray(x).dtype.kind in ("U", "S", "O"):
        idx = np.asarray(_require_static(y, "ArrayFeatureExtractor")).reshape(-1)
        return [np.take(np.asarray(x), idx, axis=-1)]
    idx = jnp.asarray(y).reshape(-1)
    return [jnp.take(x, idx, axis=-1)]


@_ml_op("Binarizer")
def _binarizer(ctx, x):
    threshold = float(ctx.attr("threshold", 0.0))
    x = jnp.asarray(x)
    return [(x > threshold).astype(x.dtype)]


@_ml_op("Scaler")
def _scaler(ctx, x):
    offset = np.asarray(list(ctx.attr("offset")), dtype=np.float32)
    scale = np.asarray(list(ctx.attr("scale")), dtype=np.float32)
    return [(jnp.asarray(x).astype(jnp.float32) - offset) * scale]


@_ml_op("Normalizer")
def _normalizer(ctx, x):
    norm = str(ctx.attr("norm", "MAX"))
    x = jnp.asarray(x).astype(jnp.float32)
    if norm == "MAX":
        d = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    elif norm == "L1":
        d = jnp.sum(jnp.abs(x), axis=-1, keepdims=True)
    elif norm == "L2":
        d = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    else:
        raise ValueError(f"invalid Normalizer norm {norm!r}")
    return [x / jnp.where(d == 0, 1.0, d)]


@_ml_op("Imputer")
def _imputer(ctx, x):
    x = jnp.asarray(x)
    imputed_f = ctx.attr("imputed_value_floats")
    if imputed_f is not None:
        imputed = np.asarray(list(imputed_f), dtype=np.float32)
        replaced = float(ctx.attr("replaced_value_float", 0.0))
        mask = jnp.isnan(x) if np.isnan(replaced) else (x == replaced)
    else:
        imputed = np.asarray(
            [int(v) for v in ctx.attr("imputed_value_int64s")], dtype=np.int64
        ).astype(x.dtype)
        replaced = int(ctx.attr("replaced_value_int64", 0))
        mask = x == replaced
    if imputed.size == 1:
        fill = imputed.reshape(())
    else:
        if x.shape[-1] != imputed.size:
            raise ValueError(
                f"Imputer has {imputed.size} imputed values but the input's "
                f"last dimension is {x.shape[-1]}"
            )
        fill = imputed
    return [jnp.where(mask, jnp.asarray(fill, dtype=x.dtype), x)]


@_ml_op("FeatureVectorizer")
def _feature_vectorizer(ctx, *xs):
    """Concatenate inputs along axis 1 after flattening each to [N, -1];
    each input is sliced/zero-padded to its declared ``inputdimensions``
    width (lenient padding, ORT errors on short inputs)."""
    dims = ctx.attr("inputdimensions")
    if dims is None:
        dims = [None] * len(xs)
    cols = []
    for x, d in zip(xs, dims):
        x = jnp.asarray(x).astype(jnp.float32)
        x2 = x.reshape((x.shape[0], -1)) if x.ndim > 1 else x.reshape((1, -1))
        if d is not None:
            d = int(d)
            if x2.shape[1] >= d:
                x2 = x2[:, :d]
            else:
                x2 = jnp.pad(x2, ((0, 0), (0, d - x2.shape[1])))
        cols.append(x2)
    return [jnp.concatenate(cols, axis=1)]


# ---------------------------------------------------------------------------
# encoders / mappers
# ---------------------------------------------------------------------------


@_ml_op("OneHotEncoder")
def _one_hot_encoder(ctx, x):
    cats_i = ctx.attr("cats_int64s")
    cats_s = ctx.attr("cats_strings")
    zeros = int(ctx.attr("zeros", 1))
    if cats_s is not None:
        xv = np.asarray(_require_static(x, "OneHotEncoder",
                                        what="input (string categories)"))
        cats = [str(s) for s in cats_s]
        pos = {c: i for i, c in enumerate(cats)}
        flat = [pos.get(str(s), -1) for s in xv.reshape(-1)]
        if not zeros and -1 in flat:
            raise ValueError("OneHotEncoder (zeros=0): input value not in cats")
        out = np.zeros((len(flat), len(cats)), np.float32)
        for r, c in enumerate(flat):
            if c >= 0:
                out[r, c] = 1.0
        return [out.reshape(xv.shape + (len(cats),))]
    cats = np.asarray([int(v) for v in cats_i], dtype=np.int64)
    xj = jnp.asarray(x)
    eq = xj[..., None] == jnp.asarray(cats).astype(xj.dtype)
    if not zeros:
        if not _is_static(x):
            raise NotImplementedError(
                "OneHotEncoder zeros=0 must fail on unmatched values, which "
                "cannot be checked on traced data; run uncompiled or use "
                "zeros=1"
            )
        if bool(np.any(~np.any(np.asarray(eq), axis=-1))):
            raise ValueError("OneHotEncoder (zeros=0): input value not in cats")
    return [eq.astype(jnp.float32)]


def _encoder_tables(ctx):
    """(keys, values) arrays for LabelEncoder across its opset revisions."""
    keys = None
    for name in ("keys_int64s", "keys_floats", "keys_strings"):
        v = ctx.attr(name)
        if v is not None:
            keys = (
                np.asarray([str(s) for s in v], dtype=object)
                if name == "keys_strings"
                else np.asarray(list(v))
            )
            break
    values = None
    for name in ("values_int64s", "values_floats", "values_strings"):
        v = ctx.attr(name)
        if v is not None:
            values = (
                np.asarray([str(s) for s in v], dtype=object)
                if name == "values_strings"
                else np.asarray(list(v))
            )
            break
    if keys is not None and values is not None:
        return keys, values
    # LabelEncoder-4: tensor-form tables (keys_tensor/values_tensor) carry
    # the maps as TensorProto attributes; string tensors decode to object
    # arrays of str, numerics stay numeric.
    kt, vt = ctx.attr("keys_tensor"), ctx.attr("values_tensor")
    if kt is not None and vt is not None:
        return kt.to_numpy().reshape(-1), vt.to_numpy().reshape(-1)
    # LabelEncoder-1: classes_strings maps string->int64 (index) and back.
    classes = ctx.attr("classes_strings")
    if classes is not None:
        strs = np.asarray([str(s) for s in classes], dtype=object)
        idx = np.arange(len(strs), dtype=np.int64)
        return strs, idx
    raise ValueError("LabelEncoder has no keys_*/values_* tables")


def _lookup_default(ctx, values):
    dt = ctx.attr("default_tensor")
    if dt is not None:
        dv = dt.to_numpy().reshape(-1)
        if dv.size != 1:
            raise ValueError(
                f"LabelEncoder default_tensor must hold one element, "
                f"got {dv.size}"
            )
        v = dv[0]
        if values.dtype.kind == "O":
            return str(v)
        return float(v) if values.dtype.kind == "f" else int(v)
    if values.dtype.kind == "O":
        return str(ctx.attr("default_string", "_Unused"))
    if values.dtype.kind == "f":
        return float(ctx.attr("default_float", -0.0))
    return int(ctx.attr("default_int64", -1))


@_ml_op("LabelEncoder")
def _label_encoder(ctx, x):
    keys, values = _encoder_tables(ctx)
    default = _lookup_default(ctx, values)
    str_in = keys.dtype.kind == "O"
    str_out = values.dtype.kind == "O"
    if ctx.attr("classes_strings") is not None:
        # v1 auto-directs on input type: string->index or index->string.
        xv = np.asarray(x) if _is_static(x) else None
        if xv is not None and xv.dtype.kind in ("U", "S", "O"):
            str_in, str_out = True, False
            default = int(ctx.attr("default_int64", -1))
        else:
            str_in, str_out = False, True
            keys, values = values, keys
            default = str(ctx.attr("default_string", "_Unused"))
    if str_in or str_out:
        xv = np.asarray(_require_static(x, "LabelEncoder",
                                        what="input (string table)"))
        table = {k: v for k, v in zip(keys.tolist(), values.tolist())}
        if str_in:
            out = [table.get(str(s), default) for s in xv.reshape(-1)]
        else:
            out = [
                table.get(int(s) if keys.dtype.kind == "i" else float(s), default)
                for s in xv.reshape(-1)
            ]
        dtype = object if str_out else (
            np.float32 if isinstance(default, float) else np.int64
        )
        return [np.asarray(out, dtype=dtype).reshape(xv.shape)]
    # numeric -> numeric: traced-friendly compare-all lookup.
    xj = jnp.asarray(x)
    k = jnp.asarray(keys.astype(np.float32 if keys.dtype.kind == "f"
                                else np.int64))
    xe = xj[..., None].astype(k.dtype)
    eq = xe == k
    if k.dtype.kind == "f":
        eq = eq | (jnp.isnan(xe) & jnp.isnan(k))  # NaN keys match NaN input
    vals = jnp.asarray(values.astype(np.float32 if values.dtype.kind == "f"
                                     else np.int64))
    hit = jnp.any(eq, axis=-1)
    first = jnp.argmax(eq, axis=-1)
    out = jnp.where(hit, jnp.take(vals, first), jnp.asarray(default, vals.dtype))
    return [out]


@_ml_op("CategoryMapper")
def _category_mapper(ctx, x):
    cats_i = np.asarray([int(v) for v in ctx.attr("cats_int64s")], np.int64)
    cats_s = [str(s) for s in ctx.attr("cats_strings")]
    if len(cats_i) != len(cats_s):
        raise ValueError("CategoryMapper cats tables differ in length")
    xv = np.asarray(_require_static(x, "CategoryMapper"))
    if xv.dtype.kind in ("U", "S", "O"):
        table = {s: i for s, i in zip(cats_s, cats_i.tolist())}
        default = int(ctx.attr("default_int64", -1))
        out = np.asarray(
            [table.get(str(s), default) for s in xv.reshape(-1)], np.int64
        )
    else:
        table = {i: s for i, s in zip(cats_i.tolist(), cats_s)}
        default = str(ctx.attr("default_string", "_Unused"))
        out = np.asarray(
            [table.get(int(v), default) for v in xv.reshape(-1)], dtype=object
        )
    return [out.reshape(xv.shape)]


# ---------------------------------------------------------------------------
# map-typed ops (host dicts in the interpreter env)
# ---------------------------------------------------------------------------


@_ml_op("ZipMap")
def _zip_map(ctx, scores):
    """[N, C] scores → list of {label: score} dicts (the standard tail of a
    sklearn classifier export). Host-only: maps are Python objects."""
    labels_i = ctx.attr("classlabels_int64s")
    labels = (
        [int(v) for v in labels_i]
        if labels_i is not None
        else [str(s) for s in ctx.attr("classlabels_strings")]
    )
    sv = np.asarray(_require_static(scores, "ZipMap", what="scores"))
    if sv.ndim == 1:
        sv = sv[None]
    if sv.shape[-1] != len(labels):
        raise ValueError(
            f"ZipMap got {sv.shape[-1]} score columns for {len(labels)} labels"
        )
    return [[dict(zip(labels, row.astype(np.float32).tolist())) for row in sv]]


@_ml_op("DictVectorizer")
def _dict_vectorizer(ctx, m):
    vocab_s = ctx.attr("string_vocabulary")
    vocab = (
        [str(s) for s in vocab_s]
        if vocab_s is not None
        else [int(v) for v in ctx.attr("int64_vocabulary")]
    )
    _require_static(m, "DictVectorizer", what="map input")
    maps = m if isinstance(m, list) else [m]
    if not all(isinstance(d, dict) for d in maps):
        raise ValueError("DictVectorizer input must be a map or seq of maps")
    out = np.asarray(
        [[float(d.get(k, 0.0)) for k in vocab] for d in maps], np.float32
    )
    return [out if isinstance(m, list) else out[0]]


@_ml_op("CastMap")
def _cast_map(ctx, m):
    cast_to = str(ctx.attr("cast_to", "TO_FLOAT"))
    map_form = str(ctx.attr("map_form", "DENSE"))
    max_map = int(ctx.attr("max_map", 1))
    _require_static(m, "CastMap", what="map input")
    maps = m if isinstance(m, list) else [m]
    rows = []
    for d in maps:
        if not isinstance(d, dict):
            raise ValueError("CastMap input must be a map or seq of maps")
        if map_form == "DENSE":
            vals = [d[k] for k in sorted(d)]
        else:
            vals = [0] * max_map
            for k, v in d.items():
                if 0 <= int(k) < max_map:
                    vals[int(k)] = v
        rows.append(vals)
    width = max((len(r) for r in rows), default=0)
    rows = [r + [0] * (width - len(r)) for r in rows]
    if cast_to == "TO_STRING":
        out = np.asarray([[str(v) for v in r] for r in rows], dtype=object)
    elif cast_to == "TO_INT64":
        out = np.asarray(rows, dtype=np.int64)
    else:
        out = np.asarray(rows, dtype=np.float32)
    return [out if isinstance(m, list) else out[0]]


# ---------------------------------------------------------------------------
# linear models
# ---------------------------------------------------------------------------


@_ml_op("LinearRegressor")
def _linear_regressor(ctx, x):
    targets = int(ctx.attr("targets", 1))
    coef = np.asarray(list(ctx.attr("coefficients")), np.float32)
    x = jnp.asarray(x).astype(jnp.float32)
    if x.ndim == 1:
        x = x[None]
    f = x.shape[-1]
    w = coef.reshape(targets, f)
    y = x @ w.T
    intercepts = ctx.attr("intercepts")
    if intercepts is not None:
        y = y + np.asarray(list(intercepts), np.float32)
    return [_post_transform(y, str(ctx.attr("post_transform", "NONE")))]


@_ml_op("LinearClassifier")
def _linear_classifier(ctx, x):
    labels, is_string = _class_labels(ctx)
    coef = np.asarray(list(ctx.attr("coefficients")), np.float32)
    post = str(ctx.attr("post_transform", "NONE"))
    x = jnp.asarray(x).astype(jnp.float32)
    if x.ndim == 1:
        x = x[None]
    f = x.shape[-1]
    if coef.size % f:
        raise ValueError(
            f"LinearClassifier has {coef.size} coefficients, not a multiple "
            f"of the feature count {f}"
        )
    w = coef.reshape(-1, f)
    scores = x @ w.T
    intercepts = ctx.attr("intercepts")
    if intercepts is not None:
        scores = scores + np.asarray(list(intercepts), np.float32)
    if w.shape[0] == 1 and len(labels) == 2:
        # Binary single-score convention (ORT): pair the margin as (-s, s)
        # FIRST, then apply the post-transform to the pair — LOGISTIC on
        # (-s, s) is exactly (1-p, p), and SOFTMAX stays a real 2-way
        # softmax instead of degenerating to 1.0 over a single column.
        scores = jnp.concatenate([-scores, scores], axis=-1)
    scores = _post_transform(scores, post)
    return [_pick_labels(ctx, scores, labels, is_string,
                      "LinearClassifier"), scores]


# ---------------------------------------------------------------------------
# tree ensembles
# ---------------------------------------------------------------------------
#
# TPU-native lowering: the forest is flattened host-side into dense node
# tables (feature id / threshold / branch mode / child indices per global
# node), and evaluation is a fixed-depth loop of vectorized gathers over a
# [batch, trees] cursor — every step is one gather + compare on the VPU,
# no data-dependent control flow, so the whole ensemble jits. Leaf
# payouts are a [batch, entries] equality mask scatter-added into the
# class/target columns (same pattern as TfIdfVectorizer).

_TREE_MODES = {
    "LEAF": 0, "BRANCH_LEQ": 1, "BRANCH_LT": 2, "BRANCH_GTE": 3,
    "BRANCH_GT": 4, "BRANCH_EQ": 5, "BRANCH_NEQ": 6,
}


def _build_tree_tables(ctx, op_name):
    tree_ids = [int(v) for v in ctx.attr("nodes_treeids")]
    node_ids = [int(v) for v in ctx.attr("nodes_nodeids")]
    feats = np.asarray([int(v) for v in ctx.attr("nodes_featureids")], np.int32)
    values = np.asarray([float(v) for v in ctx.attr("nodes_values")], np.float32)
    modes = [str(m) for m in ctx.attr("nodes_modes")]
    true_ids = [int(v) for v in ctx.attr("nodes_truenodeids")]
    false_ids = [int(v) for v in ctx.attr("nodes_falsenodeids")]
    miss = ctx.attr("nodes_missing_value_tracks_true")
    miss = (
        np.asarray([int(v) for v in miss], np.int32)
        if miss is not None
        else np.zeros(len(tree_ids), np.int32)
    )
    n = len(tree_ids)
    if not (len(node_ids) == len(feats) == len(values) == len(modes)
            == len(true_ids) == len(false_ids) == miss.size == n):
        raise ValueError(f"{op_name}: nodes_* attribute lengths disagree")
    try:
        mode_codes = np.asarray([_TREE_MODES[m] for m in modes], np.int32)
    except KeyError as e:
        raise ValueError(f"{op_name}: unknown node mode {e.args[0]!r}") from None

    index = {}
    for g, (t, nid) in enumerate(zip(tree_ids, node_ids)):
        if (t, nid) in index:
            raise ValueError(f"{op_name}: duplicate node ({t}, {nid})")
        index[(t, nid)] = g
    trees = sorted(set(tree_ids))
    tree_pos = {t: i for i, t in enumerate(trees)}

    is_leaf = mode_codes == 0
    true_g = np.zeros(n, np.int32)
    false_g = np.zeros(n, np.int32)
    children = set()
    for g, (t, mode) in enumerate(zip(tree_ids, mode_codes)):
        if mode == 0:
            true_g[g] = false_g[g] = g  # leaves self-loop
            continue
        try:
            true_g[g] = index[(t, true_ids[g])]
            false_g[g] = index[(t, false_ids[g])]
        except KeyError:
            raise ValueError(
                f"{op_name}: node ({t}, {node_ids[g]}) references a child "
                f"that does not exist in tree {t}"
            ) from None
        children.add(true_g[g])
        children.add(false_g[g])

    # One pass over nodes (not trees x nodes — a 500-tree GBM would pay
    # O(T*N) per eager call otherwise): the root of each tree is its one
    # node never referenced as a child.
    cands_per_tree = {t: [] for t in trees}
    for g, t in enumerate(tree_ids):
        if g not in children:
            cands_per_tree[t].append(g)
    roots = np.zeros(len(trees), np.int32)
    for t in trees:
        cands = cands_per_tree[t]
        if len(cands) != 1:
            # fall back to the conventional nodeid-0 root
            if (t, 0) not in index:
                raise ValueError(f"{op_name}: tree {t} has no identifiable root")
            cands = [index[(t, 0)]]
        roots[tree_pos[t]] = cands[0]

    # depth by BFS (cycle-checked): number of traversal steps needed.
    depth = 0
    seen_global = set()
    frontier = [(int(r), 0) for r in roots]
    while frontier:
        g, d = frontier.pop()
        if g in seen_global:
            raise ValueError(f"{op_name}: node cycle detected at global {g}")
        seen_global.add(g)
        depth = max(depth, d)
        if not is_leaf[g]:
            frontier.append((int(true_g[g]), d + 1))
            frontier.append((int(false_g[g]), d + 1))

    return dict(
        feats=feats, values=values, modes=mode_codes, true_g=true_g,
        false_g=false_g, miss=miss, roots=roots, depth=depth,
        tree_pos=tree_pos, is_leaf=is_leaf, index=index,
    )


def _tree_descend(x2, tables):
    """Run every tree on every row: returns the final leaf cursor [N, T]."""
    # Branch-node feature ids must address a real input column: the gather
    # below clamps out-of-range indices on device, so a tree referencing
    # feature 12 of a 10-feature input would silently read the last column
    # where ORT errors. The feature count is static — check it host-side.
    feats_np = np.asarray(tables["feats"])
    branch = np.asarray(tables["modes"]) != 0
    if branch.any():
        bf = feats_np[branch]
        if bf.min() < 0 or bf.max() >= x2.shape[-1]:
            bad = int(bf.min()) if bf.min() < 0 else int(bf.max())
            raise ValueError(
                f"tree ensemble references feature {bad} but the input "
                f"has only {x2.shape[-1]} features"
            )
    feats = jnp.asarray(tables["feats"])
    thresh = jnp.asarray(tables["values"])
    modes = jnp.asarray(tables["modes"])
    true_g = jnp.asarray(tables["true_g"])
    false_g = jnp.asarray(tables["false_g"])
    miss = jnp.asarray(tables["miss"])
    n = x2.shape[0]
    cur = jnp.broadcast_to(jnp.asarray(tables["roots"]), (n, len(tables["roots"])))
    rows = jnp.arange(n)[:, None]
    for _ in range(tables["depth"]):
        f = jnp.take(feats, cur)
        v = x2[rows, f]
        th = jnp.take(thresh, cur)
        m = jnp.take(modes, cur)
        cond = jnp.select(
            [m == 1, m == 2, m == 3, m == 4, m == 5, m == 6],
            [v <= th, v < th, v >= th, v > th, v == th, v != th],
            default=True,
        )
        members = tables.get("members")
        if members is not None:  # mode 7: BRANCH_MEMBER (TreeEnsemble v5)
            mem_rows = jnp.asarray(members)[cur]  # [N, T, set_width]
            in_set = jnp.any(v[..., None] == mem_rows, axis=-1)
            cond = jnp.where(m == 7, in_set, cond)
        cond = jnp.where(jnp.isnan(v), jnp.take(miss, cur) > 0, cond)
        nxt = jnp.where(cond, jnp.take(true_g, cur), jnp.take(false_g, cur))
        cur = jnp.where(m == 0, cur, nxt)
    return cur


def _leaf_payout(ctx, cur, tables, prefix, op_name, n_cols):
    """Scatter leaf weights into [N, n_cols] per-tree columns flattened as
    [N, T * n_cols] (callers reduce over trees or sum directly)."""
    e_tree = [int(v) for v in ctx.attr(f"{prefix}_treeids")]
    e_node = [int(v) for v in ctx.attr(f"{prefix}_nodeids")]
    e_col = np.asarray([int(v) for v in ctx.attr(f"{prefix}_ids")], np.int64)
    e_w = np.asarray([float(v) for v in ctx.attr(f"{prefix}_weights")],
                     np.float32)
    tree_pos = tables["tree_pos"]
    node_index = tables["index"]  # (tree, node) -> global, built once
    try:
        e_glob = np.asarray(
            [node_index[(t, nid)] for t, nid in zip(e_tree, e_node)], np.int32
        )
        e_tpos = np.asarray([tree_pos[t] for t in e_tree], np.int64)
    except KeyError as e:
        raise ValueError(
            f"{op_name}: {prefix} entry references unknown node {e.args[0]}"
        ) from None
    if e_col.size and (e_col.min() < 0 or e_col.max() >= n_cols):
        bad = int(e_col.min()) if e_col.min() < 0 else int(e_col.max())
        raise ValueError(
            f"{op_name}: {prefix}_ids entry {bad} outside [0, {n_cols}) — "
            f"JAX scatter would silently drop or wrap it"
        )
    # [N, E]: did row n's walk of entry e's tree end at entry e's leaf?
    hits = jnp.take(cur, jnp.asarray(e_tpos), axis=1) == jnp.asarray(e_glob)
    contrib = hits.astype(jnp.float32) * jnp.asarray(e_w)
    flat_cols = np.asarray(e_tpos * n_cols + e_col, np.int64)
    out = jnp.zeros((cur.shape[0], len(tree_pos) * n_cols), jnp.float32)
    return out.at[:, flat_cols].add(contrib), e_w


def _as_2d_f32(x):
    x = jnp.asarray(x).astype(jnp.float32)
    return x[None] if x.ndim == 1 else x


@_ml_op("TreeEnsembleRegressor")
def _tree_ensemble_regressor(ctx, x):
    tables = _build_tree_tables(ctx, "TreeEnsembleRegressor")
    n_targets = int(ctx.attr("n_targets", 1))
    agg = str(ctx.attr("aggregate_function", "SUM"))
    x2 = _as_2d_f32(x)
    cur = _tree_descend(x2, tables)
    per_tree, _ = _leaf_payout(ctx, cur, tables, "target",
                               "TreeEnsembleRegressor", n_targets)
    t = len(tables["tree_pos"])
    per_tree = per_tree.reshape(x2.shape[0], t, n_targets)
    if agg == "SUM":
        y = per_tree.sum(axis=1)
    elif agg == "AVERAGE":
        y = per_tree.sum(axis=1) / t
    elif agg == "MIN":
        y = per_tree.min(axis=1)
    elif agg == "MAX":
        y = per_tree.max(axis=1)
    else:
        raise ValueError(f"invalid aggregate_function {agg!r}")
    base = ctx.attr("base_values")
    if base is not None:
        y = y + np.asarray(list(base), np.float32)
    return [_post_transform(y, str(ctx.attr("post_transform", "NONE")))]


@_ml_op("TreeEnsembleClassifier")
def _tree_ensemble_classifier(ctx, x):
    labels, is_string = _class_labels(ctx)
    tables = _build_tree_tables(ctx, "TreeEnsembleClassifier")
    post = str(ctx.attr("post_transform", "NONE"))
    class_ids = [int(v) for v in ctx.attr("class_ids")]
    # A class pruned from every tree still owns a (zero) score column —
    # except in the binary single-score convention, where one column fans
    # out to two below (ORT sizes by class count the same way).
    n_cols = max(class_ids) + 1
    if len(labels) > 2:
        n_cols = max(n_cols, len(labels))
    x2 = _as_2d_f32(x)
    cur = _tree_descend(x2, tables)
    per_tree, e_w = _leaf_payout(ctx, cur, tables, "class",
                                 "TreeEnsembleClassifier", n_cols)
    t = len(tables["tree_pos"])
    scores = per_tree.reshape(x2.shape[0], t, n_cols).sum(axis=1)
    base = ctx.attr("base_values")
    if base is not None:
        scores = scores + np.asarray(list(base), np.float32)
    if n_cols == 1 and len(labels) == 2:
        # Single-score binary convention (ORT write_scores): all-positive
        # leaf weights mean the score is a probability-like vote → pair
        # (1-s, s); mixed-sign means a margin → pair (-s, s). Either way
        # the pair is built FIRST and the post-transform applies to the
        # pair — a vote fraction in (0, 0.5) must keep label 0 under
        # LOGISTIC (sigmoid is monotonic, so the (1-s, s) order survives).
        if bool(np.all(e_w >= 0)):
            scores = jnp.concatenate([1.0 - scores, scores], axis=-1)
        else:
            scores = jnp.concatenate([-scores, scores], axis=-1)
    scores = _post_transform(scores, post)
    return [
        _pick_labels(ctx, scores, labels, is_string,
                     "TreeEnsembleClassifier"),
        scores,
    ]


# ---------------------------------------------------------------------------
# support-vector machines
# ---------------------------------------------------------------------------


def _svm_kernel(ctx, x2, sv):
    """K(x, sv): [N, SV] kernel matrix. kernel_params = [gamma, coef0,
    degree] (libsvm layout, same defaults as ORT)."""
    kind = str(ctx.attr("kernel_type", "LINEAR"))
    params = ctx.attr("kernel_params")
    gamma, coef0, degree = (
        [float(v) for v in params] + [0.0, 0.0, 0.0]
    )[:3] if params else (0.0, 0.0, 0.0)
    dots = x2 @ sv.T
    if kind == "LINEAR":
        return dots
    if kind == "POLY":
        return jnp.power(gamma * dots + coef0, degree)
    if kind == "SIGMOID":
        return jnp.tanh(gamma * dots + coef0)
    if kind == "RBF":
        sq = (
            jnp.sum(jnp.square(x2), axis=1, keepdims=True)
            - 2.0 * dots
            + np.sum(np.square(sv), axis=1)[None, :]
        )
        return jnp.exp(-gamma * sq)
    raise ValueError(f"invalid kernel_type {kind!r}")


@_ml_op("SVMRegressor")
def _svm_regressor(ctx, x):
    coef = np.asarray(list(ctx.attr("coefficients")), np.float32)
    rho = np.asarray(list(ctx.attr("rho", [0.0])), np.float32)
    n_sv = int(ctx.attr("n_supports", 0))
    x2 = _as_2d_f32(x)
    f = x2.shape[-1]
    if n_sv > 0:
        sv = np.asarray(
            list(ctx.attr("support_vectors")), np.float32
        ).reshape(n_sv, f)
        k = _svm_kernel(ctx, x2, sv)
        y = k @ coef[:n_sv, None] + rho[0]
    else:
        y = x2 @ coef.reshape(1, f).T + rho[0]
    if int(ctx.attr("one_class", 0)):
        y = jnp.where(y > 0, 1.0, -1.0)
    return [_post_transform(y, str(ctx.attr("post_transform", "NONE")))]


def _platt_pairwise_probs(dec, prob_a, prob_b):
    """Per-pair Platt probability of the pair's FIRST class.

    libsvm's ``sigmoid_predict`` / ORT's ``sigmoid_probability``:
    ``r = 1 / (1 + exp(A*d + B)) = sigmoid(-(A*d + B))``, clamped to
    [1e-7, 1 - 1e-7] exactly as both implementations do.
    """
    r = jax.nn.sigmoid(-(dec * prob_a + prob_b))
    return jnp.clip(r, 1e-7, 1.0 - 1e-7)


def _wu_lin_weng_couple(r_flat, pairs, c):
    """Couple one-vs-one pairwise probabilities into class probabilities.

    Wu, Lin & Weng (JMLR 2004) method 2, as implemented by libsvm's
    ``multiclass_probability`` (the routine ORT's SVMClassifier kernel
    transcribes): build Q from the pairwise matrix, then iterate the
    normalized fixed-point update until ``max_t |Qp_t - pQp| < 0.005/k``
    or ``max(100, k)`` iterations. Batched over rows with a
    ``lax.while_loop``; converged rows freeze (diff masked to 0) so each
    row sees exactly libsvm's per-sample early exit.
    """
    n = r_flat.shape[0]
    big_r = jnp.zeros((n, c, c), jnp.float32)
    # One scatter per triangle (not a Python loop staging 2 ops per pair —
    # c=100 would trace ~9,900 scatters otherwise).
    i_idx = np.array([i for i, _ in pairs])
    j_idx = np.array([j for _, j in pairs])
    big_r = big_r.at[:, i_idx, j_idx].set(r_flat)
    big_r = big_r.at[:, j_idx, i_idx].set(1.0 - r_flat)
    # Q[t,j] = -r[j,t] * r[t,j] off-diagonal; Q[t,t] = sum_j r[j,t]^2
    q = -(big_r.transpose(0, 2, 1) * big_r)
    q_diag = jnp.sum(jnp.square(big_r), axis=1)  # over j of r[j,t]^2
    ti = jnp.arange(c)
    q = q.at[:, ti, ti].set(q_diag)
    eps = 0.005 / c
    max_iter = max(100, c)

    def cond(state):
        it, _, done = state
        return (it < max_iter) & ~jnp.all(done)

    def body(state):
        it, p, done = state
        qp = jnp.einsum("ntj,nj->nt", q, p)
        pqp = jnp.sum(p * qp, axis=1)
        done = done | (jnp.max(jnp.abs(qp - pqp[:, None]), axis=1) < eps)
        for t in range(c):  # sequential in-place sweep, k is static
            diff = jnp.where(done, 0.0, (pqp - qp[:, t]) / q_diag[:, t])
            p = p.at[:, t].add(diff)
            pqp = (pqp + diff * (diff * q_diag[:, t] + 2.0 * qp[:, t])) \
                / jnp.square(1.0 + diff)
            qp = (qp + diff[:, None] * q[:, t, :]) / (1.0 + diff)[:, None]
            p = p / (1.0 + diff)[:, None]
        return it + 1, p, done

    p0 = jnp.full((n, c), 1.0 / c, jnp.float32)
    _, probs, _ = lax.while_loop(
        cond, body, (jnp.asarray(0), p0, jnp.zeros(n, bool))
    )
    return probs


@_ml_op("SVMClassifier")
def _svm_classifier(ctx, x):
    """libsvm one-vs-one SVC (decision values + votes) and the linear mode.

    Pairwise decision for classes i<j over class-grouped support vectors:
    ``d = sum_{v in SV_i} coef[j-1, v] K(x, v) + sum_{v in SV_j}
    coef[i, v] K(x, v) + rho[pair]`` (ONNX stores rho additively). Labels
    come from the vote count (d > 0 votes for i), scores are the raw
    decision values in pair order — the ORT kernel's behavior when no
    probability tables are present. With Platt tables (prob_a/prob_b,
    sklearn ``SVC(probability=True)``), scores are the Wu–Lin–Weng
    coupled class probabilities and the label is their argmax, matching
    libsvm's ``svm_predict_probability`` via ORT's kernel.

    These conventions are pinned against a REAL libsvm through
    scikit-learn fits in tests/test_sklearn_oracle.py (decision values,
    votes, coupled probabilities, all kernels, binary + multiclass).
    Empirical fact recorded there: sklearn stores the *binary* pair
    sign-flipped relative to libsvm's internal decision while probA_/
    probB_ stay keyed to the internal one, so exporters (skl2onnx)
    negate binary coefficients/rho back to the libsvm orientation these
    attributes carry — this kernel correctly assumes the file is in
    libsvm orientation.
    """
    labels, is_string = _class_labels(ctx)
    c = len(labels)
    coef = np.asarray(list(ctx.attr("coefficients")), np.float32)
    rho = np.asarray(list(ctx.attr("rho", [0.0])), np.float32)
    post = str(ctx.attr("post_transform", "NONE"))
    vpc = ctx.attr("vectors_per_class")
    sv_flat = ctx.attr("support_vectors")
    x2 = _as_2d_f32(x)
    f = x2.shape[-1]

    if not sv_flat:
        # linear mode: one coefficient row per class (a binary export may
        # carry a single row, expanded below like LinearClassifier).
        if coef.size % f:
            raise ValueError(
                f"SVMClassifier has {coef.size} coefficients, not a "
                f"multiple of the feature count {f}"
            )
        w = coef.reshape(-1, f)
        scores = x2 @ w.T + rho[0]
        if w.shape[0] == 1 and c == 2:
            scores = jnp.concatenate([-scores, scores], axis=-1)
        scores = _post_transform(scores, post)
        return [_pick_labels(ctx, scores, labels, is_string, "SVMClassifier"),
                scores]

    counts = [int(v) for v in vpc]
    if len(counts) != c:
        raise ValueError(
            f"SVMClassifier has {len(counts)} vectors_per_class entries "
            f"for {c} classes"
        )
    total_sv = sum(counts)
    n_pairs = c * (c - 1) // 2
    if len(rho) < n_pairs:
        raise ValueError(
            f"SVMClassifier has {len(rho)} rho entries; {c} classes form "
            f"{n_pairs} one-vs-one pairs"
        )
    if coef.size != (c - 1) * total_sv:
        raise ValueError(
            f"SVMClassifier has {coef.size} coefficients, expected "
            f"(n_classes-1)*total_sv = {(c - 1) * total_sv}"
        )
    sv = np.asarray(list(sv_flat), np.float32).reshape(total_sv, f)
    dual = coef.reshape(c - 1, total_sv)
    starts = np.concatenate([[0], np.cumsum(counts)]).astype(int)
    k = _svm_kernel(ctx, x2, sv)

    decisions = []
    pairs = []
    p = 0
    for i in range(c):
        for j in range(i + 1, c):
            si, ei = starts[i], starts[i + 1]
            sj, ej = starts[j], starts[j + 1]
            d = (
                k[:, si:ei] @ dual[j - 1, si:ei]
                + k[:, sj:ej] @ dual[i, sj:ej]
                + rho[p]
            )
            decisions.append(d)
            pairs.append((i, j))
            p += 1
    dec = jnp.stack(decisions, axis=1)  # [N, pairs]

    prob_a, prob_b = ctx.attr("prob_a"), ctx.attr("prob_b")
    if (prob_a is None) != (prob_b is None):
        raise ValueError(
            "SVMClassifier carries only one of prob_a/prob_b; Platt "
            "coupling needs both tables"
        )
    if prob_a is not None:
        pa = np.asarray(list(prob_a), np.float32)
        pb = np.asarray(list(prob_b), np.float32)
        if len(pa) < len(pairs) or len(pb) < len(pairs):
            raise ValueError(
                f"SVMClassifier prob_a/prob_b hold {len(pa)}/{len(pb)} "
                f"entries; {c} classes form {len(pairs)} one-vs-one pairs"
            )
        r = _platt_pairwise_probs(
            dec, jnp.asarray(pa[: len(pairs)]), jnp.asarray(pb[: len(pairs)])
        )
        probs = _wu_lin_weng_couple(r, pairs, c)
        # libsvm svm_predict_probability: the label is the argmax of the
        # coupled probabilities (first max on ties), NOT the vote count.
        label_idx = jnp.argmax(probs, axis=-1)
        scores = _post_transform(probs, post)
        if not ctx.wants_output(0):
            return [None, scores]
        if not is_string:
            return [jnp.take(jnp.asarray(labels), label_idx), scores]
        _require_static(label_idx, "SVMClassifier",
                        what="input (string class labels)")
        return [labels[np.asarray(label_idx)], scores]

    votes = jnp.zeros((x2.shape[0], c), jnp.float32)
    for p, (i, j) in enumerate(pairs):
        win_i = (dec[:, p] > 0).astype(jnp.float32)
        votes = votes.at[:, i].add(win_i)
        votes = votes.at[:, j].add(1.0 - win_i)
    label_idx = jnp.argmax(votes, axis=-1)

    scores = dec
    if c == 2:
        scores = jnp.concatenate([-dec, dec], axis=-1)
    scores = _post_transform(scores, post)

    if not ctx.wants_output(0):
        return [None, scores]
    if not is_string:
        return [jnp.take(jnp.asarray(labels), label_idx), scores]
    _require_static(label_idx, "SVMClassifier",
                    what="input (string class labels)")
    return [labels[np.asarray(label_idx)], scores]


_V5_POST = {0: "NONE", 1: "SOFTMAX", 2: "LOGISTIC", 3: "SOFTMAX_ZERO",
            4: "PROBIT"}
_V5_AGG = {0: "AVERAGE", 1: "SUM", 2: "MIN", 3: "MAX"}


@_ml_op("TreeEnsemble")
def _tree_ensemble_v5(ctx, x):
    """Unified TreeEnsemble (ai.onnx.ml opset 5): leaves live in separate
    leaf_* arrays (nodes_*leafs flags say whether a child index points at a
    leaf or an inner node), modes/splits/weights are tensor attributes with
    integer codes, and BRANCH_MEMBER tests set membership against the
    NaN-delimited ``membership_values`` pool. Converted to the same dense
    tables the v1/v3 ensembles use (leaves appended after the inner nodes)
    and evaluated by the same fixed-depth vectorized descent."""
    feats = np.asarray([int(v) for v in ctx.attr("nodes_featureids")], np.int32)
    splits = ctx.attr("nodes_splits").to_numpy().astype(np.float32).reshape(-1)
    v5_modes = ctx.attr("nodes_modes").to_numpy().astype(np.int64).reshape(-1)
    true_ids = [int(v) for v in ctx.attr("nodes_truenodeids")]
    false_ids = [int(v) for v in ctx.attr("nodes_falsenodeids")]
    true_leafs = [int(v) for v in ctx.attr("nodes_trueleafs")]
    false_leafs = [int(v) for v in ctx.attr("nodes_falseleafs")]
    leaf_tids = np.asarray([int(v) for v in ctx.attr("leaf_targetids")],
                           np.int64)
    leaf_w = ctx.attr("leaf_weights").to_numpy().astype(np.float32).reshape(-1)
    roots = [int(v) for v in ctx.attr("tree_roots")]
    n_targets = int(ctx.attr("n_targets", 1))
    agg = _V5_AGG.get(int(ctx.attr("aggregate_function", 1)))
    post = _V5_POST.get(int(ctx.attr("post_transform", 0)))
    if agg is None or post is None:
        raise ValueError("TreeEnsemble: invalid aggregate_function/"
                         "post_transform code")
    n_int, n_leaf = len(feats), len(leaf_w)
    if not (len(splits) == len(v5_modes) == len(true_ids) == len(false_ids)
            == len(true_leafs) == len(false_leafs) == n_int):
        raise ValueError("TreeEnsemble: nodes_* attribute lengths disagree")
    if len(leaf_tids) != n_leaf:
        raise ValueError("TreeEnsemble: leaf_* attribute lengths disagree")
    if n_leaf and (leaf_tids.min() < 0 or leaf_tids.max() >= n_targets):
        raise ValueError(
            f"TreeEnsemble: leaf_targetids outside [0, {n_targets})"
        )
    if np.any(v5_modes < 0) or np.any(v5_modes > 6):
        raise ValueError("TreeEnsemble: unknown node mode code")

    total = n_int + n_leaf
    modes = np.zeros(total, np.int32)  # appended leaves keep code 0 (LEAF)
    modes[:n_int] = np.where(v5_modes == 6, 7, v5_modes + 1)
    feat_all = np.concatenate([feats, np.zeros(n_leaf, np.int32)])
    thresh_all = np.concatenate([splits, np.zeros(n_leaf, np.float32)])
    true_g = np.arange(total, dtype=np.int32)
    false_g = true_g.copy()
    for g in range(n_int):
        t_child = n_int + true_ids[g] if true_leafs[g] else true_ids[g]
        f_child = n_int + false_ids[g] if false_leafs[g] else false_ids[g]
        if not (0 <= t_child < total and 0 <= f_child < total) or (
            not true_leafs[g] and true_ids[g] >= n_int
        ) or (not false_leafs[g] and false_ids[g] >= n_int):
            raise ValueError(
                f"TreeEnsemble: node {g} references a child that does not "
                f"exist"
            )
        true_g[g], false_g[g] = t_child, f_child
    miss = np.zeros(total, np.int32)
    miss_attr = ctx.attr("nodes_missing_value_tracks_true")
    if miss_attr is not None:
        miss[:n_int] = [int(v) for v in miss_attr]

    members = None
    member_nodes = [g for g in range(n_int) if modes[g] == 7]
    if member_nodes:
        mv = ctx.attr("membership_values")
        if mv is None:
            raise ValueError(
                "TreeEnsemble has BRANCH_MEMBER nodes but no "
                "membership_values"
            )
        vals = mv.to_numpy().astype(np.float32).reshape(-1)
        sets, curset = [], []
        for v in vals:
            if np.isnan(v):
                sets.append(curset)
                curset = []
            else:
                curset.append(float(v))
        if curset:
            sets.append(curset)
        if len(sets) != len(member_nodes):
            raise ValueError(
                f"TreeEnsemble: {len(member_nodes)} BRANCH_MEMBER nodes but "
                f"{len(sets)} NaN-delimited membership sets"
            )
        width = max(len(s) for s in sets)
        members = np.full((total, width), np.nan, np.float32)
        for g, s in zip(member_nodes, sets):
            members[g, :len(s)] = s

    # Payout entries ((tree, leaf) pairs) + max depth, cycle-checked. The
    # separate leaf pool exists so leaves CAN be shared — by both branches
    # of one node (a constant subtree), by several nodes, even across
    # trees — so only a revisited INNER node within one tree's walk is a
    # cycle; a revisited leaf just dedupes to one payout entry (the
    # cursor-equality hit already counts it once).
    depth = 0
    entries = []  # (tree_pos, global_leaf)
    for t, r in enumerate(roots):
        if not 0 <= r < n_int:
            raise ValueError(f"TreeEnsemble: tree root {r} is not an inner node")
        seen_inner = set()
        seen_leaves = set()
        stack = [(r, 0)]
        while stack:
            g, d = stack.pop()
            depth = max(depth, d)
            if modes[g] == 0:
                seen_leaves.add(g)
                continue
            if g in seen_inner:
                raise ValueError(
                    f"TreeEnsemble: inner node {g} is reached twice in tree "
                    f"{t} (cycle)"
                )
            seen_inner.add(g)
            stack.append((int(true_g[g]), d + 1))
            stack.append((int(false_g[g]), d + 1))
        entries.extend((t, g) for g in sorted(seen_leaves))

    tables = dict(
        feats=feat_all, values=thresh_all, modes=modes, true_g=true_g,
        false_g=false_g, miss=miss, roots=np.asarray(roots, np.int32),
        depth=depth, members=members,
    )
    x2 = _as_2d_f32(x)
    cur = _tree_descend(x2, tables)

    n_trees = len(roots)
    e_tpos = np.asarray([t for t, _ in entries], np.int64)
    e_glob = np.asarray([g for _, g in entries], np.int32)
    e_leaf = e_glob - n_int  # index into the leaf arrays
    hits = jnp.take(cur, jnp.asarray(e_tpos), axis=1) == jnp.asarray(e_glob)
    contrib = hits.astype(jnp.float32) * jnp.asarray(leaf_w[e_leaf])
    flat_cols = e_tpos * n_targets + leaf_tids[e_leaf]
    per_tree = jnp.zeros((x2.shape[0], n_trees * n_targets), jnp.float32)
    per_tree = per_tree.at[:, flat_cols].add(contrib)
    per_tree = per_tree.reshape(x2.shape[0], n_trees, n_targets)
    if agg == "SUM":
        y = per_tree.sum(axis=1)
    elif agg == "AVERAGE":
        y = per_tree.sum(axis=1) / n_trees
    elif agg == "MIN":
        y = per_tree.min(axis=1)
    else:
        y = per_tree.max(axis=1)
    return [_post_transform(y, post)]
