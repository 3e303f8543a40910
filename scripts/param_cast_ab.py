"""A/B: fp32 params (in-graph bf16 casts) vs host-pre-cast bf16 params.

Under the ``fast`` policy every conv/matmul casts its weight operand to
bf16 inside the traced graph. Inside the 96-tile scan those casts are
loop-invariant; this measures whether XLA's while-loop LICM actually
hoists them (if not, the scan re-reads 50 MB fp32 + writes 25 MB bf16 of
weight traffic per tile). The candidate fix is trivial: cast the params
pytree to bf16 once on host before upload.

Usage: python scripts/param_cast_ab.py [--nseg 4096] [--runs 6]
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
    ap.add_argument("--nseg", type=int, default=4096)
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--runs", type=int, default=6)
    args = ap.parse_args()

    import jax

    from birdnet_tpu.compiler.importer import import_onnx
    from birdnet_tpu.compiler.stream import (
        StreamingEngine,
        chunk_to_device_layout,
    )
    from birdnet_tpu.detection import detect_model_type
    from birdnet_tpu.models import birdnet_v24
    from birdnet_tpu.onnx import proto as P
    from birdnet_tpu.runtime import default_device, init_runtime

    init_runtime()
    device = default_device()
    imported = import_onnx(P.encode_model(birdnet_v24.build_model()))
    config = detect_model_type(*imported.detection_shapes())

    n_samples = args.nseg * config.sample_count
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=n_samples) * 3000).astype(np.int16)
    step = config.sample_count
    n_tiles = args.nseg // args.tile
    audio_len = (n_tiles * args.tile - 1) * step + config.sample_count
    padded = np.zeros(audio_len, np.int16)
    padded[:n_samples] = audio
    layout = chunk_to_device_layout(padded, step, config.sample_count)

    import ml_dtypes

    def bf16_params(params):
        return {
            k: (np.asarray(v).astype(ml_dtypes.bfloat16)
                if np.issubdtype(np.asarray(v).dtype, np.floating) else v)
            for k, v in params.items()
        }

    audio_d = None
    variants = {"fp32-params": None,
                "bf16-params": jax.device_put(
                    bf16_params(imported.params), device)}
    results, outs = {}, {}
    for name, params in variants.items():
        engine = StreamingEngine(
            imported, config, device=device, top_k=10, tile=args.tile,
            precision="fast", params=params,
        )
        fn = engine._compile(n_tiles, step, np.int16)
        if audio_d is None:
            audio_d = jax.device_put(layout, device)
        params = engine.params
        t0 = time.monotonic()
        out = fn(params, audio_d)
        conf = np.asarray(out[0]); idx = np.asarray(out[1])
        outs[name] = (conf, idx)
        print(f"# {name}: compile+warm {time.monotonic()-t0:.0f}s",
              file=sys.stderr, flush=True)
        dts = []
        for _ in range(args.runs):
            t0 = time.monotonic()
            out = fn(params, audio_d)
            np.asarray(out[0]); np.asarray(out[1])
            dts.append(time.monotonic() - t0)
        keep = [d for d in dts if d <= 1.5 * min(dts)] or dts
        dt = statistics.median(keep)
        results[name] = args.nseg / dt
        print(f"{name}: {dt*1000:.0f}ms -> {results[name]:.0f} seg/s "
              f"({len(dts)-len(keep)} stall-dropped)", flush=True)

    c0, i0 = outs["fp32-params"]
    c1, i1 = outs["bf16-params"]
    agree = float((i0[:, 0] == i1[:, 0]).mean())
    dconf = float(np.abs(c0 - c1).max())
    print(f"# parity: top-1 agreement {agree:.4f}, "
          f"max top-K confidence delta {dconf:.4f}", flush=True)
    print(f"bf16/fp32 params: "
          f"{results['bf16-params']/results['fp32-params']:.3f}x", flush=True)


if __name__ == "__main__":
    main()
