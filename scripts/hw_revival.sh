#!/bin/sh
# Hardware-revival checklist: run the full measurement batch the moment the
# axon tunnel comes back. Each step logs to $LOG and survives individual
# failures (the tunnel may die again mid-batch) — ordered most- to
# least-important so an early death still captures the headline.
#
# Usage: sh scripts/hw_revival.sh [logfile]
set -x
LOG="${1:-/tmp/hw_revival.log}"
cd "$(dirname "$0")/.."
{
  echo "=== hw_revival $(date -u +%FT%TZ) ==="

  echo "--- 1. headline bench (records regression/no-regression vs 25.8k) ---"
  timeout 3600 python bench.py

  echo "--- 2. TPU test tier (sharded/stream/species oracles on hardware) ---"
  BIRDNET_TEST_TPU=1 timeout 3600 python -m pytest tests/ -q -x \
    -k "tpu or stream or sharded or species" 2>&1 | tail -5

  echo "--- 3. three model families ---"
  timeout 3600 python scripts/bench_models.py

  echo "--- 4. serving operating curve (docs/serving.md table) ---"
  timeout 3600 python scripts/serve_bench.py --seconds 5 \
    --clients 4,16,64 --batches 8,32 --waits 0,5 --workers 1,2

  echo "=== done $(date -u +%FT%TZ) ==="
} >> "$LOG" 2>&1
