"""Experiment: int8 (PTQ) vs bf16-mixed sustained throughput on one chip.

Same measurement protocol as bench.py's device-resident sustained number
(audio pre-staged on device, forced host readback for honest timing per
the axon tunnel rules in docs/performance.md), run on the full-size
generated BirdNET v2.4 model for both precisions.
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import statistics
import sys
import time

import numpy as np

TILE = 128
N_SEGMENTS = 2048
RUNS = 3


def _measure(engine, config, device, label):
    import jax

    step = config.sample_count
    n_tiles = N_SEGMENTS // TILE
    fn = engine._compile(n_tiles, step, np.int16)
    audio_len = (n_tiles * TILE - 1) * step + config.sample_count
    rng = np.random.default_rng(0)
    padded = np.zeros(audio_len, np.int16)
    n_samples = N_SEGMENTS * config.sample_count
    padded[:n_samples] = (rng.normal(size=n_samples) * 3000).astype(np.int16)
    from birdnet_tpu.compiler.stream import chunk_to_device_layout
    audio_d = jax.device_put(chunk_to_device_layout(padded, step, config.sample_count), device)
    t0 = time.monotonic()
    out = fn(engine.params, audio_d)
    np.asarray(out[0])
    print(f"# {label}: first call (compile) {time.monotonic()-t0:.1f}s",
          file=sys.stderr, flush=True)
    dts = []
    for _ in range(RUNS):
        t0 = time.monotonic()
        out = fn(engine.params, audio_d)
        np.asarray(out[0])
        np.asarray(out[1])
        dts.append(time.monotonic() - t0)
    dt = statistics.median(dts)
    seg_s = N_SEGMENTS / dt
    print(f"# {label}: {dt*1000:.0f}ms -> {seg_s:.0f} seg/s (runs: "
          f"{['%.0f' % (N_SEGMENTS/d) for d in dts]})", file=sys.stderr, flush=True)
    return seg_s, out


def main():
    from bench import _bench_model_path

    from birdnet_tpu.compiler.importer import import_onnx
    from birdnet_tpu.compiler.quantize import (
        quantize_model,
        synthetic_calibration_segments,
    )
    from birdnet_tpu.compiler.stream import StreamingEngine
    from birdnet_tpu.detection import detect_model_type
    from birdnet_tpu.runtime import default_device, init_runtime

    init_runtime()
    device = default_device()
    print(f"# device: {device.platform}:{device.id}", file=sys.stderr, flush=True)

    imported = import_onnx(_bench_model_path())
    config = detect_model_type(*imported.detection_shapes())

    t0 = time.monotonic()
    qmodel = quantize_model(
        imported, synthetic_calibration_segments(config.sample_count, batches=2)
    )
    print(f"# calibration+rewrite: {time.monotonic()-t0:.0f}s",
          file=sys.stderr, flush=True)
    n_q = sum(
        1 for n in qmodel.graph.node
        if n.op_type.startswith(("QLinear", "_QLinear"))
    )
    n_f = sum(
        1 for n in qmodel.graph.node if n.op_type in ("Conv", "MatMul", "Gemm")
    )
    print(f"# quantized compute nodes: {n_q}, float left: {n_f}",
          file=sys.stderr, flush=True)

    eng_fp = StreamingEngine(imported, config, device=device, top_k=10,
                             tile=TILE, precision="fast")
    fp_seg_s, fp_out = _measure(eng_fp, config, device, "bf16-fast")

    eng_q = StreamingEngine(qmodel, config, device=device, top_k=10, tile=TILE)
    q_seg_s, q_out = _measure(eng_q, config, device, "int8")

    # top-1 agreement on the same noise audio
    fp_idx = np.asarray(fp_out[1])[:, 0]
    q_idx = np.asarray(q_out[1])[:, 0]
    agree = float((fp_idx == q_idx).mean())
    print(f"# top-1 agreement: {agree:.3f}", file=sys.stderr, flush=True)
    print(f"RESULT int8={q_seg_s:.0f} seg/s, bf16-fast={fp_seg_s:.0f} seg/s, "
          f"speedup={q_seg_s/fp_seg_s:.2f}x, top1_agree={agree:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
