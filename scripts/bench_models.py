"""Streaming throughput of all three model families on one chip.

Same device-resident protocol as bench.py, smaller dispatch (2048 segs)
to bound compile time. Records the per-model numbers for docs.

Usage: python scripts/bench_models.py [--nseg 2048]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nseg", type=int, default=2048)
    ap.add_argument("--tile", type=int, default=128)
    args = ap.parse_args()

    import jax

    from birdnet_tpu.compiler.importer import import_onnx
    from birdnet_tpu.compiler.stream import StreamingEngine
    from birdnet_tpu.detection import detect_model_type
    from birdnet_tpu.models import birdnet_v24, birdnet_v30, perch_v2
    from birdnet_tpu.runtime import default_device, init_runtime

    init_runtime()
    device = default_device()

    for name, builder in (
        ("birdnet_v24", birdnet_v24.build_model),
        ("birdnet_v30", birdnet_v30.build_model),
        ("perch_v2", perch_v2.build_model),
    ):
        imported = import_onnx(builder())
        config = detect_model_type(*imported.detection_shapes())
        n_fused = sum(
            1 for n in imported.graph.node if n.op_type == "_FusedMBConv"
        ) + sum(
            len(n.attrs.get("strides", []))
            for n in imported.graph.node if n.op_type == "_FusedStagePrefix"
        )
        eng = StreamingEngine(imported, config, device=device, top_k=10,
                              tile=args.tile, precision="fast")
        S = config.sample_count
        n_tiles = args.nseg // args.tile
        t0 = time.monotonic()
        fn = eng._compile(n_tiles, S, np.int16)
        compile_s = time.monotonic() - t0
        rng = np.random.default_rng(0)
        audio = jax.device_put(
            (rng.standard_normal((n_tiles * args.tile, S), dtype=np.float32)
             * 3000).astype(np.int16), device)
        out = fn(eng.params, audio)
        np.asarray(out[0])
        dts = []
        for _ in range(5):
            t0 = time.monotonic()
            out = fn(eng.params, audio)
            np.asarray(out[0])
            np.asarray(out[1])
            dts.append(time.monotonic() - t0)
        # Same stall-rejecting median + provenance line as the headline
        # bench (tunnel stalls would otherwise dominate a plain median).
        from bench import _robust_median

        med = _robust_median(dts, label=f"{name} runs")
        n_run = n_tiles * args.tile  # actually dispatched segments
        seg_s = n_run / med
        xrt = seg_s * config.segment_duration
        print(f"{name}: {med*1000:.0f}ms -> {seg_s:.0f} seg/s "
              f"(xRT {xrt:.0f}, {config.segment_duration}s segments, "
              f"{config.num_species} classes, {n_fused} fused blocks, "
              f"params {imported.param_bytes()/1e6:.0f} MB, "
              f"compile {compile_s:.0f}s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
