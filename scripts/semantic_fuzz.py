"""Semantic fuzz: random structural mutations of valid ONNX graphs.

The codec fuzz corrupts bytes; tests/test_semantic_invalid.py pins eight
hand-picked defect classes. This script closes the gap between them:
take real torch-exported graphs, apply random *semantic* mutations
(rewire names, flip attributes, resize initializers, retype values), and
assert the validation pipeline (import + eval_shape, exactly what
``Classifier.build`` runs) either succeeds or raises a typed
``BirdnetError`` — never a raw KeyError/IndexError/TypeError traceback.

Usage: python scripts/semantic_fuzz.py [--count 200] [--start 0]
"""

from __future__ import annotations

import argparse
import copy
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests")
)

import jax  # noqa: E402

if __name__ == "__main__":
    # Standalone runs pin CPU; when imported by the test suite the
    # conftest owns platform selection (pinning here would poison a
    # TPU-tier process).
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import torch  # noqa: E402

from _torch_export import export_onnx_bytes  # noqa: E402

import test_random_torch_graphs as G  # noqa: E402

from birdnet_tpu.compiler.importer import import_onnx, make_forward  # noqa: E402
from birdnet_tpu.errors import BirdnetError  # noqa: E402
from birdnet_tpu.onnx import proto as P  # noqa: E402

BASE_KINDS = {
    "cnn": G._random_conv_net,
    "mlp": G._random_mlp,
    "xfmr": G._transformer_net,
    "idx": G._random_index_net,
    "ctrl": G._control_flow_net,  # Loop/If bodies: subgraph mutations
}


def _all_names(model):
    names = set()
    for n in model.graph.node:
        names.update(i for i in n.input if i)
        names.update(o for o in n.output if o)
    return sorted(names)


def mutate(model, rng):
    """Apply one random semantic mutation in place; returns a label."""
    m = model
    nodes = m.graph.node
    pick = int(rng.integers(0, 12))
    if pick == 0 and nodes:
        n = nodes[int(rng.integers(0, len(nodes)))]
        if n.input:
            i = int(rng.integers(0, len(n.input)))
            n.input[i] = "fuzz_dangling"
            return f"dangling-input:{n.op_type}"
    if pick == 1 and nodes:
        n = nodes[int(rng.integers(0, len(nodes)))]
        if n.output:
            n.output[0] = "fuzz_renamed"
            return f"renamed-output:{n.op_type}"
    if pick == 2 and m.graph.initializer:
        t = m.graph.initializer[int(rng.integers(0, len(m.graph.initializer)))]
        if t.dims:
            d = int(rng.integers(0, len(t.dims)))
            t.dims[d] = int(t.dims[d]) + int(rng.integers(1, 4))
            return "initializer-dims"
    if pick == 3 and nodes:
        n = nodes[int(rng.integers(0, len(nodes)))]
        for a in n.attribute:
            if a.type == 2:  # INT
                a.i = int(rng.integers(-3, 100))
                return f"int-attr:{n.op_type}.{a.name}"
            if a.type == 7 and a.ints:  # INTS
                j = int(rng.integers(0, len(a.ints)))
                a.ints[j] = int(rng.integers(-2, 3))
                return f"ints-attr:{n.op_type}.{a.name}"
    if pick == 4 and nodes:
        n = nodes[int(rng.integers(0, len(nodes)))]
        n.input.append("fuzz_extra")
        return f"extra-input:{n.op_type}"
    if pick == 5 and m.graph.output:
        m.graph.output[0].name = "fuzz_not_produced"
        return "unproduced-output"
    if pick == 6 and nodes:
        n = nodes[int(rng.integers(0, len(nodes)))]
        if len(n.input) > 1:
            n.input.pop()
            return f"dropped-input:{n.op_type}"
    if pick == 7 and nodes:
        a, b = rng.integers(0, len(nodes), size=2)
        if a != b and nodes[int(a)].output and nodes[int(b)].output:
            nodes[int(a)].output[0], nodes[int(b)].output[0] = (
                nodes[int(b)].output[0],
                nodes[int(a)].output[0],
            )
            return "swapped-outputs"
    if pick == 8 and m.graph.initializer:
        t = m.graph.initializer[int(rng.integers(0, len(m.graph.initializer)))]
        t.data_type = int(rng.choice([P.DataType.INT64, P.DataType.BOOL,
                                      P.DataType.FLOAT16]))
        return "retyped-initializer"
    if pick == 9 and m.graph.initializer:
        i = int(rng.integers(0, len(m.graph.initializer)))
        name = m.graph.initializer[i].name
        del m.graph.initializer[i]
        return f"removed-initializer:{name[:20]}"
    if pick == 10 and m.graph.initializer:
        t = m.graph.initializer[int(rng.integers(0, len(m.graph.initializer)))]
        if t.raw_data:
            t.raw_data = t.raw_data[: len(t.raw_data) // 2]
            return "truncated-raw-data"
    if pick == 11:
        subs = []
        for n in nodes:
            for a in n.attribute:
                if a.name in ("body", "then_branch", "else_branch") and a.g:
                    subs.append((n.op_type, a.g))
        if subs:
            op, g = subs[int(rng.integers(0, len(subs)))]
            if g.node:
                bn = g.node[int(rng.integers(0, len(g.node)))]
                if bn.input and rng.random() < 0.5:
                    bn.input[int(rng.integers(0, len(bn.input)))] = "fuzz_sub"
                    return f"subgraph-dangling:{op}"
                if bn.output:
                    bn.output[0] = "fuzz_sub_out"
                    return f"subgraph-renamed:{op}"
    return "noop"


def validate_like_build(data_or_model, example_args):
    """What Classifier.build runs: import + abstract validation trace.
    Returns the imported model + forward for the execution phase."""
    imp = import_onnx(data_or_model, optimize=True)
    fwd = make_forward(imp, precision="fp32")
    jax.eval_shape(
        fwd, imp.params,
        *[jax.ShapeDtypeStruct(a.shape, a.dtype) for a in example_args]
    )
    return imp, fwd


def run_one(kind, seed):
    rng = np.random.default_rng(seed)
    torch.manual_seed(seed)
    module, args = BASE_KINDS[kind](rng)
    module.eval()
    try:
        with torch.no_grad():
            module(*args)
    except Exception:
        return "invalid"
    try:
        data = export_onnx_bytes(module, args)
    except Exception:
        return "export-refused"
    base = P.decode_model(data)
    np_args = [a.numpy() for a in args]
    mutated = copy.deepcopy(base)
    label = mutate(mutated, rng)
    # Phase 1: validation (what build() wraps into ModelLoadError). A raw
    # error here is acceptable-by-construction (build wraps it), but we
    # still distinguish typed rejections for the tally.
    try:
        imp, fwd = validate_like_build(P.encode_model(mutated), np_args)
    except BirdnetError:
        return f"typed({label})"
    except Exception:
        return f"wrapped({label})"  # build() converts this to ModelLoadError
    # Phase 2: validation sufficiency — a model that PASSED validation must
    # actually execute. A raw error here means eval_shape let a broken
    # model through to first-predict time.
    try:
        outs = jax.jit(fwd)(imp.params, *np_args)
        [np.asarray(o) for o in outs]
        return f"ok({label})"
    except Exception as e:
        print(f"\nVALIDATION GAP kind={kind} seed={seed} mutation={label}: "
              f"{type(e).__name__}: {str(e)[:120]}")
        traceback.print_exc()
        return f"RAW:{type(e).__name__}({label})"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--count", type=int, default=200)
    args = ap.parse_args()
    tally = {"ok": 0, "typed": 0, "raw": 0, "skipped": 0}
    raws = []
    for seed in range(args.start, args.start + args.count):
        for kind in BASE_KINDS:
            res = run_one(kind, 50_000 + seed)
            if res.startswith("ok"):
                tally["ok"] += 1
            elif res.startswith("typed"):
                tally["typed"] += 1
            elif res.startswith("wrapped"):
                tally["wrapped"] = tally.get("wrapped", 0) + 1
            elif res.startswith("RAW"):
                tally["raw"] += 1
                raws.append((kind, 50_000 + seed, res))
            else:
                tally["skipped"] += 1
            print(".", end="", flush=True)
    print(f"\ntally: {tally}")
    for r in raws:
        print("RAW:", r)
    return 1 if tally["raw"] else 0


if __name__ == "__main__":
    sys.exit(main())
