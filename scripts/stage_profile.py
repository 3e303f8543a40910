"""Per-stage device-time profile of the bench BirdNET v2.4 model.

For each milestone tensor (frontend out, stem out, each MBConv block's
project-conv out, head, logits), compile a program that runs the graph
PREFIX up to that tensor R times inside a fori_loop (serialized through a
scalar carry that perturbs the frontend conv weight, so XLA cannot hoist
or pipeline the prefix) and returns one scalar. XLA dead-code-eliminates
everything past the milestone. The delta between consecutive milestones is
that stage's device time.

This sidesteps both tunnel dispatch overhead (~25-30 ms/call, amortized
over R reps) and the axon `block_until_ready` lie (scalar readback).

Usage: python scripts/stage_profile.py [--reps 64] [--tile 128]
"""

import argparse
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def milestones_of(graph):
    """Pick milestone tensors: conv outputs that delimit architecture stages.

    After import-time Conv+BN folding the benchmark v2.4 graph's Conv nodes
    are: [frontend, stem, (expand, dw, se1, se2, project) x 12, head].
    Works for the QDQ-fused int8 graph too (QLinearConv nodes).
    """
    convs = [n for n in graph.node if n.op_type in ("Conv", "QLinearConv")]
    out = [("frontend", convs[0].output[0]), ("stem", convs[1].output[0])]
    n_blocks = (len(convs) - 3) // 5
    for b in range(n_blocks):
        proj = convs[2 + 5 * b + 4]
        out.append((f"block{b:02d}", proj.output[0]))
    out.append(("head", convs[-1].output[0]))
    gemms = [n for n in graph.node if n.op_type == "Gemm"]
    if gemms:
        out.append(("logits", gemms[-1].output[0]))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=64)
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--precision", default="fast")
    ap.add_argument("--int8", action="store_true",
                    help="profile the PTQ-quantized graph instead")
    ap.add_argument("--model", default="v24", choices=["v24", "v30", "perch"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from birdnet_tpu.compiler.importer import import_onnx, interpret_graph
    from birdnet_tpu.models import birdnet_v24, birdnet_v30, perch_v2
    from birdnet_tpu.runtime import default_device, init_runtime

    init_runtime()
    device = default_device()
    print(f"# device: {device.platform} {getattr(device, 'device_kind', '?')}")

    builder = {"v24": birdnet_v24, "v30": birdnet_v30,
               "perch": perch_v2}[args.model]
    sample_count = builder.SAMPLE_COUNT
    imported = import_onnx(builder.build_model())
    # Profile the raw node chains: expand _FusedMBConv groups so milestones
    # see the per-block project convs (the XLA program is identical; the
    # fallback lowering re-interprets these same nodes).
    from birdnet_tpu.compiler.fuse_frontend import unfuse_frontend
    from birdnet_tpu.compiler.fuse_mbconv import unfuse_mbconv
    from birdnet_tpu.compiler.fuse_stage_prefix import unfuse_stage_prefix

    unfuse_frontend(imported.graph)
    unfuse_stage_prefix(imported.graph)
    unfuse_mbconv(imported.graph)
    if args.int8:
        from birdnet_tpu.compiler.quantize import (
            quantize_model,
            synthetic_calibration_segments,
        )

        imported = quantize_model(
            imported, synthetic_calibration_segments(sample_count, batches=2)
        )
    graph, opset, consts = imported.graph, imported.opset, imported.consts
    marks = milestones_of(graph)
    print(f"# {len(marks)} milestones, reps={args.reps}, tile={args.tile}, "
          f"precision={args.precision}")

    # The frontend filterbank weight: perturbing it serializes loop iters.
    fb_name = next(n for n in graph.node if n.op_type == "Conv").input[1]

    params = jax.device_put(imported.params, device)
    rng = np.random.default_rng(0)
    x = jax.device_put(
        (rng.normal(size=(args.tile, sample_count)) * 0.1).astype(np.float32), device
    )

    def make_prog(tensor_name):
        def prefix(params, x, c):
            env = dict(consts)
            env.update(params)
            env[fb_name] = env[fb_name] * (1.0 + c)
            env["input"] = x
            (y,) = interpret_graph(graph, opset, args.precision, env,
                                   [tensor_name])
            return jnp.asarray(y)[(0,) * jnp.ndim(y)].astype(jnp.float32)

        def prog(params, x):
            def body(i, c):
                return prefix(params, x, c) * 1e-30
            return jax.lax.fori_loop(0, args.reps, body, jnp.float32(0.0))

        return jax.jit(prog)

    results = []
    for name, tensor in marks:
        fn = make_prog(tensor)
        t0 = time.monotonic()
        float(fn(params, x))  # compile + first run
        compile_s = time.monotonic() - t0
        dts = []
        for _ in range(args.runs):
            t0 = time.monotonic()
            float(fn(params, x))
            dts.append(time.monotonic() - t0)
        dt = statistics.median(dts)
        per_tile_us = dt / args.reps * 1e6
        results.append((name, per_tile_us))
        print(f"# {name:10s} cum {per_tile_us:9.1f} us/tile "
              f"({per_tile_us / args.tile:7.2f} us/seg)  [compile {compile_s:.0f}s]",
              flush=True)

    print()
    print(f"{'stage':12s} {'us/tile':>9s} {'us/seg':>8s} {'% of total':>10s}")
    prev = 0.0
    total = results[-1][1]
    for name, cum in results:
        d = cum - prev
        print(f"{name:12s} {d:9.1f} {d / args.tile:8.2f} {100 * d / total:9.1f}%")
        prev = cum
    print(f"{'TOTAL':12s} {total:9.1f} {total / args.tile:8.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
