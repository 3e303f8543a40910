"""Generic ONNX model throughput bench — any importable file, any inputs.

The bird families get bench.py / bench_models.py; this tool measures the
engine as a general ONNX runtime: point it at any model file the importer
accepts (the reference's analog is timing an arbitrary ort session), and
it synthesizes random inputs from the graph's declared shapes, jits at the
chosen precision policy, and reports honest inferences/s (host-readback
timing, stall-filtered median) across a batch sweep.

Usage:
  python scripts/bench_onnx.py --model m.onnx [--batches 1,8,32,128]
      [--precision fast] [--runs 5] [--json]

Symbolic leading dims are treated as the batch axis and swept; all other
symbolic dims must be static in the file (re-export with fixed shapes).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _stall_filter  # noqa: E402  (single copy of the threshold)


def _input_specs(model):
    """[(name, elem_type, dims)] for graph inputs that are not initializers."""
    inits = {t.name for t in model.graph.initializer}
    specs = []
    for vi in model.graph.input:
        if vi.name in inits:
            continue
        tt = vi.type.tensor_type if vi.type else None
        if tt is None:
            raise SystemExit(f"input {vi.name!r} has no tensor type")
        dims = []
        for i, d in enumerate(tt.shape.dim if tt.shape else []):
            if d.dim_value is not None and d.dim_value > 0:
                dims.append(int(d.dim_value))
            elif i == 0:
                dims.append(None)  # batch axis, swept
            else:
                raise SystemExit(
                    f"input {vi.name!r} has a symbolic non-leading dim; "
                    "re-export with static shapes"
                )
        specs.append((vi.name, tt.elem_type, dims))
    if not specs:
        raise SystemExit("model has no runtime inputs (all are initializers)")
    return specs


def _synth(rng, elem_type, shape):
    from birdnet_tpu.onnx.proto import _DTYPE_TO_NUMPY

    dt = np.dtype(_DTYPE_TO_NUMPY[elem_type])
    if dt.kind == "f":
        return (rng.standard_normal(shape) * 0.5).astype(dt)
    if dt.kind in "iu":
        return rng.integers(0, 8, size=shape).astype(dt)
    if dt.kind == "b":
        return rng.integers(0, 2, size=shape).astype(bool)
    raise SystemExit(f"cannot synthesize dtype {dt}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--batches", default="1,8,32,128")
    ap.add_argument("--precision", default="fast",
                    choices=["fp32", "mixed", "fast", "bf16"])
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--batch-size", type=int, default=None,
                    help="fixed-shape models only: inferences per dispatch "
                         "for the inf/s math (a static leading dim is NOT "
                         "assumed to be a batch axis; without this flag, "
                         "fixed-shape models report dispatches/s)")
    ap.add_argument("--json", action="store_true",
                    help="one JSON line per batch point")
    args = ap.parse_args()

    import jax

    from birdnet_tpu.compiler.importer import import_onnx, make_forward
    from birdnet_tpu.runtime import default_device, init_runtime

    init_runtime()
    device = default_device()
    model = import_onnx(args.model)
    specs = _input_specs(model)
    fwd = jax.jit(make_forward(model, precision=args.precision))
    params = jax.device_put(model.params, device)
    rng = np.random.default_rng(0)

    # Rank-0 (scalar) inputs have no batch axis and count as fixed.
    fixed_batch = all(not dims or dims[0] is not None for _, _, dims in specs)
    if fixed_batch:
        # A static leading dim is not necessarily a batch axis (e.g. a
        # [3,224,224] single image): one dispatch point, and the rate is
        # dispatches/s unless the caller states the batch via --batch-size.
        batches = [None]
    else:
        batches = [int(b) for b in args.batches.split(",")]
    if not args.json:
        print(f"model: {args.model} ({len(model.graph.node)} nodes, "
              f"{model.param_bytes() / 1e6:.1f} MB params) on {device}, "
              f"precision={args.precision}")

    for b in batches:
        inputs = [
            jax.device_put(
                _synth(rng, et, [b if d is None else d for d in dims]),
                device)
            for _, et, dims in specs
        ]
        t0 = time.monotonic()
        out = fwd(params, *inputs)
        np.asarray(out[0])
        compile_s = time.monotonic() - t0
        dts = []
        for _ in range(args.runs):
            t0 = time.monotonic()
            out = fwd(params, *inputs)
            for o in out:
                np.asarray(o)  # force readback: block_until_ready lies
            dts.append(time.monotonic() - t0)
        kept = _stall_filter(dts)
        med = statistics.median(kept)
        units = b if b is not None else args.batch_size
        rec = {"batch": b if b is not None else (args.batch_size or "fixed"),
               "ms_per_batch": round(med * 1e3, 3),
               "compile_s": round(compile_s, 2),
               "runs_kept": f"{len(kept)}/{len(dts)}"}
        if units is not None:
            rec["inf_s"] = round(units / med, 1)
            rate = f"{rec['inf_s']:>10} inf/s"
        else:
            rec["dispatch_s"] = round(1.0 / med, 2)
            rate = f"{rec['dispatch_s']:>10} dispatches/s"
        print(json.dumps(rec) if args.json else
              f"  batch {rec['batch']:>5}: {rate}  "
              f"({rec['ms_per_batch']} ms/dispatch, compile {compile_s:.1f}s, "
              f"kept {rec['runs_kept']})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
