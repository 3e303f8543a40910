"""Tile/batch-size sweep: find the throughput-optimal configuration.

The analog of the reference's debug_batching.ps1 (reference:
scripts/README.md:20-46), which swept CLI batch sizes while sampling
nvidia-smi. This sweeps streaming tile sizes on the current accelerator,
reports honest (readback-forced) throughput and HBM usage per point, and
prints a recommendation.

Usage: python scripts/batch_sweep.py [--model PATH] [--tiles 32,64,128,256]
       [--segments 768]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None, help="ONNX model (default: generated v2.4)")
    ap.add_argument("--tiles", default="16,32,64,128,256")
    ap.add_argument("--segments", type=int, default=768)
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()

    import jax

    from birdnet_tpu.compiler.importer import import_onnx
    from birdnet_tpu.compiler.stream import StreamingEngine
    from birdnet_tpu.detection import detect_model_type
    from birdnet_tpu.runtime import default_device, init_runtime
    from birdnet_tpu.utils.profiling import device_memory_stats

    init_runtime()
    device = default_device()
    print(f"device: {device.platform}:{device.id} ({getattr(device, 'device_kind', '?')})")

    if args.model:
        model_path = args.model
    else:
        cache = os.path.expanduser("~/.cache/birdnet_tpu/bench")
        os.makedirs(cache, exist_ok=True)
        model_path = os.path.join(cache, "birdnet_v24_bench.onnx")
        if not os.path.exists(model_path):
            from birdnet_tpu.models import birdnet_v24

            birdnet_v24.save(model_path)

    imported = import_onnx(model_path)
    config = detect_model_type(*imported.detection_shapes())
    S = config.sample_count
    n_seg = args.segments
    audio = np.random.default_rng(0).normal(size=n_seg * S).astype(np.float32)
    from birdnet_tpu.compiler.stream import chunk_to_device_layout
    audio_d = jax.device_put(chunk_to_device_layout(audio, S, S), device)

    print(f"{'tile':>6}{'compile_s':>11}{'ms/run':>9}{'seg/s':>9}{'us/seg':>8}{'hbm_mb':>9}")
    best = (0.0, None)
    for tile in (int(t) for t in args.tiles.split(",")):
        if n_seg % tile:
            print(f"{tile:>6}  skipped: --segments {n_seg} not divisible")
            continue
        engine = StreamingEngine(
            imported, config, device=device, top_k=10, tile=tile
        )
        n_tiles = n_seg // tile
        t0 = time.monotonic()
        fn = engine._compile(n_tiles, S, np.float32)
        compile_s = time.monotonic() - t0
        out = fn(engine.params, audio_d)
        np.asarray(out[0])
        t0 = time.monotonic()
        for _ in range(args.runs):
            out = fn(engine.params, audio_d)
            np.asarray(out[0])
        dt = (time.monotonic() - t0) / args.runs
        seg_s = n_seg / dt
        mem = device_memory_stats(device) or {}
        hbm = mem.get("bytes_in_use", 0) / 1e6
        print(f"{tile:>6}{compile_s:>11.1f}{dt * 1000:>9.0f}{seg_s:>9.0f}"
              f"{dt / n_seg * 1e6:>8.0f}{hbm:>9.0f}")
        if seg_s > best[0]:
            best = (seg_s, tile)

    print(f"\nrecommended tile: {best[1]} ({best[0]:.0f} seg/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
