"""Multi-host (DCN) serving tier: shard recordings across host processes.

The reference is strictly single-process (SURVEY §2: no distributed
runtime). For fleet-scale serving the natural TPU topology is a two-level
hierarchy:

- **within a host**: the existing ICI mesh path (``parallel.sharding``) —
  batches DP-sharded across chips, classifier head TP-sharded;
- **across hosts**: recordings are embarrassingly parallel, so the DCN
  tier needs **no collectives on the hot path** — each process analyzes
  its deterministic shard of the input files with its own compiled
  pipeline, and only tiny top-K result payloads are (optionally) gathered
  at the end via ``process_allgather`` (one DCN round, B×K floats).

This module is backend-agnostic: it runs identically under
``jax.distributed`` with TPU pods or with multi-process CPU (which is how
the tests exercise it — two coordinated local processes).
"""

from __future__ import annotations

import json
from typing import Callable, Dict, List, Optional, Sequence

from ..errors import RuntimeInitError


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize the multi-process runtime (idempotent-safe wrapper around
    ``jax.distributed.initialize``); returns this process's index.

    With no arguments, JAX's environment auto-detection applies (TPU pods
    set everything via metadata; on plain hosts pass the coordinator
    explicitly)."""
    import jax

    if coordinator_address is None:
        # TPU-pod style auto-detection (or single process): probing the
        # process index is safe and does not preclude a later initialize.
        return jax.process_index()
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        # Idempotency: a second call (service already running) is fine;
        # anything else — including a backend initialized before this
        # call — is a real setup error.
        if "already" not in str(e) and "once" not in str(e):
            raise RuntimeInitError(f"distributed init failed: {e}") from e
    except Exception as e:  # noqa: BLE001 - surface as typed error
        raise RuntimeInitError(f"distributed init failed: {e}") from e
    return jax.process_index()


def shard_files(
    files: Sequence[str],
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> List[str]:
    """This process's deterministic shard of the input files (round-robin,
    stable across processes so every file is analyzed exactly once)."""
    import jax

    idx = jax.process_index() if process_index is None else process_index
    count = jax.process_count() if process_count is None else process_count
    return [f for i, f in enumerate(files) if i % count == idx]


def analyze_files_distributed(
    classifier,
    files: Sequence[str],
    overlap_seconds: float = 0.0,
    resample: bool = False,
    gather: bool = True,
    on_result: Optional[Callable[[str, list], None]] = None,
) -> Optional[Dict[str, list]]:
    """Analyze ``files`` across all processes; each host streams its shard
    through its local device pipeline (``Classifier.analyze_wav``).

    ``on_result(path, detections)`` fires locally per finished file.
    With ``gather=True`` every process returns the full result map
    ``{path: [[start_s, [[species, confidence], ...]], ...]}`` after one
    DCN all-gather of the (tiny) JSON-encoded shard results; with
    ``gather=False`` only the local shard is returned. Entries are plain
    lists in BOTH modes (the gathered map round-trips through JSON, so
    tuples would silently become lists only on the gather path).
    """
    local: Dict[str, list] = {}
    for path in shard_files(files):
        results = classifier.analyze_wav(
            path, overlap_seconds=overlap_seconds, resample=resample
        )
        slim = [
            [float(t), [[p.species, float(p.confidence)] for p in preds]]
            for t, preds in results
        ]
        local[str(path)] = slim
        if on_result is not None:
            on_result(str(path), slim)
    if not gather:
        return local
    return _allgather_results(local)


def _allgather_results(
    local: Dict[str, list], timeout_s: int = 3600
) -> Dict[str, list]:
    """One DCN round: exchange JSON-encoded shard results between
    processes. Payloads are top-K detections only (a few KB per hour of
    audio), so this rides easily on DCN bandwidth."""
    import jax

    if jax.process_count() == 1:
        return dict(local)

    import numpy as np
    from jax.experimental import multihost_utils

    # Shards are uneven, so ranks can reach this point minutes apart —
    # far past the CPU/Gloo context-init KV timeout (~30 s). Level the
    # skew first with a coordination-service barrier, whose timeout we
    # control; the collectives below then start aligned.
    try:
        from jax._src import distributed as _dist

        client = _dist.global_state.client
        if client is not None:
            client.wait_at_barrier("birdnet_tpu_gather", timeout_s * 1000)
    except Exception:  # noqa: BLE001 - barrier is an optimization; the
        pass           # gather below still errors loudly if peers are lost

    payload = json.dumps(local).encode("utf-8")
    # Fixed-width exchange: all-gather the sizes, then the padded bytes.
    sizes = multihost_utils.process_allgather(
        np.array([len(payload)], np.int32)
    ).reshape(-1)
    width = int(sizes.max())
    buf = np.zeros(width, np.uint8)
    buf[: len(payload)] = np.frombuffer(payload, np.uint8)
    gathered = multihost_utils.process_allgather(buf)
    merged: Dict[str, list] = {}
    for row, size in zip(np.asarray(gathered).reshape(len(sizes), width), sizes):
        merged.update(json.loads(bytes(row[:int(size)]).decode("utf-8")))
    return merged
