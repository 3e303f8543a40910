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
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


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

    from _sweep_common import make_layout, print_parity, timed_seg_s
    from birdnet_tpu.compiler.importer import import_onnx
    from birdnet_tpu.compiler.stream import StreamingEngine
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
    layout, step, n_tiles = make_layout(config, args.nseg, args.tile)

    results = {}
    outs_by_mode = {}
    for mode in ("0", "1"):
        os.environ["BIRDNET_PALLAS_STFT"] = mode
        engine = StreamingEngine(
            imported, config, device=device, top_k=10, tile=args.tile,
            precision="fast",
        )
        fn = engine._compile(n_tiles, step, np.int16)
        audio_d = jax.device_put(layout, device)
        label = "stft-frontend=" + ("xla" if mode == "0" else "pallas")
        results[mode], outs_by_mode[mode] = timed_seg_s(
            fn, engine.params, audio_d, args.nseg, args.runs, label
        )
    os.environ.pop("BIRDNET_PALLAS_STFT", None)

    print_parity(outs_by_mode["0"], outs_by_mode["1"])
    print(f"pallas/xla: {results['1']/results['0']:.3f}x", flush=True)


if __name__ == "__main__":
    main()
