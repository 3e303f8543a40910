"""A/B the fused STFT-frontend Pallas kernel in the real streaming pipeline.

Builds a full-size STFT-form model (ONNX STFT + MelWeightMatrix, the
TF-export style; --model birdnet_v24/birdnet_v30/perch_v2) and runs the
StreamingEngine with
BIRDNET_PALLAS_STFT=0 (XLA chain: polyphase framing + DFT-as-matmul +
mel matmul) then =1 (fused kernel), reporting sustained seg/s for each.
Usage: python scripts/stft_frontend_sweep.py [--nseg 4096]
"""

import argparse
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stft_model_path(model: str) -> str:
    cache = os.path.expanduser("~/.cache/birdnet_tpu/bench")
    os.makedirs(cache, exist_ok=True)
    path = os.path.join(cache, f"{model}_stft_bench.onnx")
    if not os.path.exists(path):
        from birdnet_tpu import models

        getattr(models, model).save(path, frontend="stft")
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nseg", type=int, default=4096)
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--runs", type=int, default=6)
    ap.add_argument("--model", default="birdnet_v24",
                    choices=["birdnet_v24", "birdnet_v30", "perch_v2"])
    args = ap.parse_args()

    import jax

    from birdnet_tpu.compiler.importer import import_onnx
    from birdnet_tpu.compiler.stream import (
        StreamingEngine,
        chunk_to_device_layout,
    )
    from birdnet_tpu.detection import detect_model_type
    from birdnet_tpu.runtime import default_device, init_runtime

    init_runtime()
    device = default_device()
    imported = import_onnx(_stft_model_path(args.model))
    config = detect_model_type(*imported.detection_shapes())
    fused = sum(
        1 for n in imported.graph.node if n.op_type == "_FusedStftFrontend"
    )
    print(f"# _FusedStftFrontend nodes: {fused}", file=sys.stderr, flush=True)

    n_samples = args.nseg * config.sample_count
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=n_samples) * 3000).astype(np.int16)
    step = config.sample_count
    n_tiles = args.nseg // args.tile
    audio_len = (n_tiles * args.tile - 1) * step + config.sample_count
    padded = np.zeros(audio_len, np.int16)
    padded[:n_samples] = audio
    layout = chunk_to_device_layout(padded, step, config.sample_count)

    results = {}
    outs_by_mode = {}
    for mode in ("0", "1"):
        os.environ["BIRDNET_PALLAS_STFT"] = mode
        engine = StreamingEngine(
            imported, config, device=device, top_k=10, tile=args.tile,
            precision="fast",
        )
        t0 = time.monotonic()
        fn = engine._compile(n_tiles, step, np.int16)
        audio_d = jax.device_put(layout, device)
        out = fn(engine.params, audio_d)
        conf = np.asarray(out[0]); idx = np.asarray(out[1])
        outs_by_mode[mode] = (conf, idx)
        print(f"# stft={mode}: compile+warm {time.monotonic()-t0:.0f}s",
              file=sys.stderr, flush=True)
        dts = []
        for _ in range(args.runs):
            t0 = time.monotonic()
            out = fn(engine.params, audio_d)
            np.asarray(out[0]); np.asarray(out[1])
            dts.append(time.monotonic() - t0)
        keep = [d for d in dts if d <= 1.5 * min(dts)] or dts
        dt = statistics.median(keep)
        seg_s = args.nseg / dt
        results[mode] = seg_s
        label = "xla" if mode == "0" else "pallas"
        print(f"stft-frontend={label}: {dt*1000:.0f}ms -> {seg_s:.0f} seg/s "
              f"({len(dts)-len(keep)} stall-dropped)", flush=True)
    os.environ.pop("BIRDNET_PALLAS_STFT", None)

    c0, i0 = outs_by_mode["0"]
    c1, i1 = outs_by_mode["1"]
    agree = float((i0[:, 0] == i1[:, 0]).mean())
    dconf = float(np.abs(c0 - c1).max())
    print(f"# parity: top-1 agreement {agree:.4f}, "
          f"max top-K confidence delta {dconf:.4f}", flush=True)
    print(f"pallas/xla: {results['1']/results['0']:.3f}x", flush=True)


if __name__ == "__main__":
    main()
