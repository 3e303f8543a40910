"""Record an output oracle for a real ONNX model with ONNX Runtime.

Run this ONCE on any machine where ``onnxruntime`` is installed (it is not
in the TPU environment) to produce the ``.npz`` consumed by the
``*_ORACLE`` tests in tests/test_real_models.py:

  python scripts/record_oracle.py --model birdnet_v24.onnx \
      --out v24_oracle.npz [--n 4] [--seed 0]

Then on the TPU side:

  BIRDNET_V24_MODEL=... BIRDNET_V24_LABELS=... BIRDNET_V24_ORACLE=v24_oracle.npz \
      python -m pytest tests/test_real_models.py -q

The oracle stores deterministic random inputs plus the ORT-CPU logits
(last output), so the TPU importer is checked bit-for-bit (≤1e-4) against
the engine the reference wraps (reference: src/classifier.rs:348-350,
tests/integration_test.rs:75-199).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=4, help="batch of random inputs")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    try:
        import onnxruntime as ort
    except ImportError:
        print(
            "onnxruntime is required to RECORD an oracle (run this on a "
            "machine that has it; the TPU tests only READ the .npz)",
            file=sys.stderr,
        )
        return 1

    # Rehearsal shim detection (tests/_fake_ort): a session backed by this
    # repo's own engine proves the record → gate → compare plumbing but is
    # NOT an independent oracle — brand the file so the parity tier can
    # say so loudly.
    source = getattr(
        ort, "ORACLE_SOURCE",
        f"onnxruntime-{getattr(ort, '__version__', 'unknown')}",
    )
    if source == "birdnet_tpu-fake-ort":
        print(
            "WARNING: recording through the REHEARSAL shim "
            "(tests/_fake_ort) — this oracle is the engine checked "
            "against itself, not ONNX Runtime. Harness validation only.",
            file=sys.stderr,
        )

    sess = ort.InferenceSession(args.model, providers=["CPUExecutionProvider"])
    inp = sess.get_inputs()[0]
    sample_count = int(inp.shape[-1])
    rng = np.random.default_rng(args.seed)
    inputs = rng.normal(size=(args.n, sample_count)).astype(np.float32) * 0.2

    feed_shape = [d if isinstance(d, int) else 1 for d in inp.shape]
    outs = []
    for row in inputs:
        x = row.reshape([1] + feed_shape[1:])
        result = sess.run(None, {inp.name: x})
        outs.append(np.asarray(result[-1]).reshape(-1))  # logits = last output
    logits = np.stack(outs)

    np.savez_compressed(
        args.out, inputs=inputs, logits=logits, seed=args.seed,
        oracle_source=np.asarray(source),
    )
    print(
        f"recorded {args.n} inputs -> {args.out} (logits {logits.shape}, "
        f"source {source})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
