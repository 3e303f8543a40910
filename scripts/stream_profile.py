"""Profile the streaming tile body piecewise on device.

Milestones: (A) framing+i16 scale only, (B) + model forward to logits,
(C) + top_k + sigmoid (the full body). Same fori_loop trick as
stage_profile.py: iterations serialize through a carry that feeds the
dynamic_slice offset, one scalar returns to host.

Usage: python scripts/stream_profile.py [--reps 64] [--tile 128]
"""

import argparse
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=64)
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--precision", default="fast")
    ap.add_argument("--topk", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from birdnet_tpu.compiler.importer import import_onnx, make_forward
    from birdnet_tpu.compiler.stream import frame_tile, prepare_frames
    from birdnet_tpu.models import birdnet_v24
    from birdnet_tpu.runtime import default_device, init_runtime

    init_runtime()
    device = default_device()
    print(f"# device: {device.platform} {getattr(device, 'device_kind', '?')}")

    imported = import_onnx(birdnet_v24.build_model())
    forward = make_forward(imported, precision=args.precision)
    params = jax.device_put(imported.params, device)

    S = 144_000
    tile = args.tile
    rng = np.random.default_rng(0)
    audio = jax.device_put(
        (rng.normal(size=(tile * 4, S)) * 3000).astype(np.int16), device
    )

    def body_upto(stage, off):
        frames = prepare_frames(
            frame_tile(audio, off, tile, S, S), args.precision
        )
        if stage == "frames":
            return frames[0, 0].astype(jnp.float32)
        logits = forward(params, frames)[0]
        if stage == "logits":
            return logits[0, 0]
        vals, idx = lax.top_k(logits, args.topk)
        conf = jax.nn.sigmoid(vals)
        if stage == "topk":
            return conf[0, 0] + idx[0, 0].astype(jnp.float32)
        raise ValueError(stage)

    def make_prog(stage):
        def prog(audio_unused):
            def body(i, c):
                v = body_upto(stage, c)
                return (v > 1e30).astype(jnp.int32)
            return lax.fori_loop(0, args.reps, body, jnp.int32(0))
        return jax.jit(prog)

    results = []
    for stage in ("frames", "logits", "topk"):
        fn = make_prog(stage)
        t0 = time.monotonic()
        int(fn(audio))
        compile_s = time.monotonic() - t0
        dts = []
        for _ in range(args.runs):
            t0 = time.monotonic()
            int(fn(audio))
            dts.append(time.monotonic() - t0)
        dt = statistics.median(dts)
        us_tile = dt / args.reps * 1e6
        results.append((stage, us_tile))
        print(f"# {stage:8s} cum {us_tile:9.1f} us/tile "
              f"({us_tile / tile:7.2f} us/seg) [compile {compile_s:.0f}s]",
              flush=True)

    prev = 0.0
    print()
    for stage, cum in results:
        print(f"{stage:8s} +{(cum - prev) / tile:7.2f} us/seg")
        prev = cum
    print(f"TOTAL     {results[-1][1] / tile:7.2f} us/seg")
    return 0


if __name__ == "__main__":
    sys.exit(main())
