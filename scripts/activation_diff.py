"""Per-node activation diffing between precision policies.

The reference's parity mitigation is per-layer activation diffing against
onnxruntime-CPU (SURVEY §7 "hard parts"). Without ORT in the loop, the
equivalent here compares the SAME imported graph under two precision
policies (e.g. fp32 vs fast/bf16) node by node, reporting where numerics
diverge — the tool to run before enabling a faster policy on real weights.

Usage:
  python scripts/activation_diff.py --model m.onnx [--policy fast]
      [--batch 4] [--top 15]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture_activations(imported, precision: str, x: np.ndarray):
    """Run the graph and return {value_name: np.ndarray} for every node
    output (float tensors only)."""
    import jax

    from birdnet_tpu.compiler.importer import interpret_graph

    graph = imported.graph
    names = [o for n in graph.node for o in n.output if o]

    def fwd(params, inp):
        env = dict(imported.consts)
        env.update(params)
        env[imported.input_names[0]] = inp
        interpret_graph(graph, imported.opset, precision, env, imported.output_names)
        return tuple(env[n] for n in names)

    outs = jax.jit(fwd)(imported.params, x)
    result = {}
    for name, val in zip(names, outs):
        arr = np.asarray(val)
        if np.issubdtype(arr.dtype, np.floating) or arr.dtype == np.dtype("bfloat16"):
            result[name] = arr.astype(np.float32)
    return result


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--policy", default="fast", choices=["mixed", "fast", "bf16"])
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--top", type=int, default=15, help="worst nodes to print")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    # Honor JAX_PLATFORMS even when an accelerator plugin overrides it.
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from birdnet_tpu.checkpoint import import_any
    from birdnet_tpu.detection import detect_model_type

    imported = import_any(args.model)
    config = detect_model_type(*imported.detection_shapes())
    rng = np.random.default_rng(args.seed)
    x = rng.normal(size=(args.batch, config.sample_count)).astype(np.float32) * 0.2

    print(f"# comparing fp32 vs {args.policy} on {args.model}", file=sys.stderr)
    ref = capture_activations(imported, "fp32", x)
    test = capture_activations(imported, args.policy, x)

    node_of = {}
    for n in imported.graph.node:
        for o in n.output:
            node_of[o] = n.op_type

    rows = []
    for name, a in ref.items():
        b = test.get(name)
        if b is None or b.shape != a.shape:
            continue
        denom = np.maximum(np.abs(a), 1e-6)
        rel = float(np.max(np.abs(a - b) / denom))
        absd = float(np.max(np.abs(a - b)))
        rows.append((rel, absd, name, node_of.get(name, "?")))

    rows.sort(reverse=True)
    print(f"{'max_rel':>10} {'max_abs':>10}  {'op':<22} value")
    for rel, absd, name, op in rows[: args.top]:
        print(f"{rel:>10.2e} {absd:>10.2e}  {op:<22} {name}")

    logits_name = imported.output_names[-1]
    if logits_name in ref and logits_name in test:
        a, b = ref[logits_name], test[logits_name]
        top_a = np.argsort(a, axis=-1)[:, ::-1][:, :5]
        top_b = np.argsort(b, axis=-1)[:, ::-1][:, :5]
        agree1 = float((top_a[:, 0] == top_b[:, 0]).mean())
        print(f"\ntop-1 agreement on {logits_name!r}: {agree1 * 100:.1f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
