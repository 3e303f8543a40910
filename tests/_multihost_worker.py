"""Worker process for the multi-host (DCN) tier test.

Usage: python -m tests._multihost_worker <coordinator> <nprocs> <rank>
       <model> <labels> <out_json> <wav...>

Each rank initializes jax.distributed on the CPU backend, analyzes its
file shard, gathers everyone's results, and writes the merged map to
out_json.<rank>.
"""

import json
import sys


def main() -> int:
    coordinator, nprocs, rank = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    model, labels_path, out_json = sys.argv[4], sys.argv[5], sys.argv[6]
    wavs = sys.argv[7:]

    import jax

    jax.config.update("jax_platforms", "cpu")
    from birdnet_tpu import Classifier
    from birdnet_tpu.parallel import analyze_files_distributed, distributed_init

    idx = distributed_init(coordinator, nprocs, rank)
    assert idx == rank, (idx, rank)
    assert jax.process_count() == nprocs

    labels = [ln for ln in open(labels_path, encoding="utf-8").read().splitlines() if ln]
    clf = (
        Classifier.builder()
        .model_path(model)
        .labels(labels)
        .top_k(3)
        .min_confidence(0.0)
        .build()
    )
    merged = analyze_files_distributed(clf, wavs)
    with open(f"{out_json}.{rank}", "w", encoding="utf-8") as f:
        json.dump(merged, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
