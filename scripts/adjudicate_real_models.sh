#!/usr/bin/env bash
# Real-weights day-one runbook.
#
# The official BirdNET v2.4 / v3.0 / Perch v2 / meta-model weight files have
# never been runnable in the build environment (this checkout strips them,
# /root/reference/.MISSING_LARGE_BLOBS; no network). The moment they are
# obtainable, ONE command adjudicates everything:
#
#   BIRDNET_V24_MODEL=/path/birdnet_v24.onnx BIRDNET_V24_LABELS=/path/labels.txt \
#   BIRDNET_V30_MODEL=... BIRDNET_V30_LABELS=... \
#   PERCH_V2_MODEL=...    PERCH_V2_LABELS=... \
#   BIRDNET_META_MODEL=... \
#       scripts/adjudicate_real_models.sh
#
# Optional: BIRDNET_V24_ORACLE/BIRDNET_V30_ORACLE/PERCH_V2_ORACLE point at
# .npz files recorded ONCE on any machine with onnxruntime
# (scripts/record_oracle.py) and add bit-level ORT parity gates
# (logits max|delta| <= 1e-4, exact top-5).
#
# Steps (any family whose env vars are unset skips, like the reference's
# env-gated tier, tests/integration_test.rs:18-49):
#   1. import -> shape detection -> predict/batch/stream invariants,
#      per-layer fp32-vs-fast activation gates, top-5 agreement, and (if
#      recorded) ORT oracle parity  (tests/test_real_models.py)
#   2. CLI end-to-end on a synthetic WAV (v2.4)
#   3. throughput bench on the real weights (bench.py, TPU only)
#
# Rehearsal mode — proves this harness itself without the real files:
#   scripts/adjudicate_real_models.sh --rehearse
# generates full-class-count TF-dialect (STFT/MelWeightMatrix frontend)
# random-weight stand-ins (v2.4: 6,522 species with the real label file
# from the reference checkout when present; Perch: 14,795; v3.0:
# 1024-dim embeddings), exports the same env vars, and runs the same
# steps. CI covers it via tests/test_runbook_rehearsal.py.

set -euo pipefail
cd "$(dirname "$0")/.."

REHEARSE=0
NO_BENCH=0
for arg in "$@"; do
    case "$arg" in
        --rehearse) REHEARSE=1 ;;
        --no-bench) NO_BENCH=1 ;;
        *) echo "usage: $0 [--rehearse] [--no-bench]" >&2; exit 2 ;;
    esac
done

if [ "$REHEARSE" = 1 ]; then
    echo "== rehearsal: generating TF-dialect stand-ins =="
    STAND=$(mktemp -d /tmp/birdnet_rehearse.XXXXXX)
    python - "$STAND" <<'PYEOF'
import sys

standdir = sys.argv[1]
from birdnet_tpu.models import birdnet_v24, birdnet_v30, meta, perch_v2
from birdnet_tpu.onnx import proto as P


def save(model, path):
    with open(path, "wb") as f:
        f.write(P.encode_model(model))


# Real class counts, tiny widths, TF-export dialect frontends.
save(birdnet_v24.build_model(width=0.1, depth=1, num_species=6522,
                             frontend="stft"), f"{standdir}/v24.onnx")
save(birdnet_v30.build_model(width=0.1, depth=1, num_species=50,
                             embedding_dim=1024, frontend="stft"),
     f"{standdir}/v30.onnx")
save(perch_v2.build_model(width=0.1, depth=1, num_species=14795,
                          embedding_dim=1536, frontend="stft"),
     f"{standdir}/perch.onnx")
meta.save_tiny(f"{standdir}/meta.onnx", num_species=6522)

import os

ref_labels = ("/root/reference/data/labels/birdnet_v2.4/"
              "BirdNET_GLOBAL_6K_V2.4_Labels_en_uk.txt")
if os.path.exists(ref_labels):
    import shutil

    shutil.copy(ref_labels, f"{standdir}/v24_labels.txt")
else:
    with open(f"{standdir}/v24_labels.txt", "w") as f:
        f.write("\n".join(f"Genus_{i} species_{i}" for i in range(6522)))
with open(f"{standdir}/v30_labels.csv", "w") as f:
    f.write("\n".join(f"sp_{i},extra" for i in range(50)))
ref_perch = "/root/reference/data/labels/perch_v2/labels.csv"
if os.path.exists(ref_perch):
    import shutil

    shutil.copy(ref_perch, f"{standdir}/perch_labels.csv")
else:
    with open(f"{standdir}/perch_labels.csv", "w") as f:
        f.write("label\n" + "\n".join(f"sp_{i}" for i in range(14795)))
print(standdir)
PYEOF
    export BIRDNET_V24_MODEL="$STAND/v24.onnx"
    export BIRDNET_V24_LABELS="$STAND/v24_labels.txt"
    export BIRDNET_V30_MODEL="$STAND/v30.onnx"
    export BIRDNET_V30_LABELS="$STAND/v30_labels.csv"
    export PERCH_V2_MODEL="$STAND/perch.onnx"
    export PERCH_V2_LABELS="$STAND/perch_labels.csv"
    export BIRDNET_META_MODEL="$STAND/meta.onnx"

    # Oracle-leg rehearsal: record .npz oracles through the fake-ORT shim
    # (tests/_fake_ort — the engine plays the oracle; files are branded
    # non-independent) so step 1's oracle-parity gates RUN instead of
    # skipping. Proves record → gate → compare end to end; on day one,
    # record on a machine with real onnxruntime instead.
    echo "== rehearsal: recording shim oracles (record_oracle.py) =="
    REC_PP="$PWD/tests/_fake_ort:$PWD${PYTHONPATH:+:$PYTHONPATH}"
    PYTHONPATH="$REC_PP" python scripts/record_oracle.py \
        --model "$BIRDNET_V24_MODEL" --out "$STAND/v24_oracle.npz" --n 2
    PYTHONPATH="$REC_PP" python scripts/record_oracle.py \
        --model "$BIRDNET_V30_MODEL" --out "$STAND/v30_oracle.npz" --n 2
    PYTHONPATH="$REC_PP" python scripts/record_oracle.py \
        --model "$PERCH_V2_MODEL" --out "$STAND/perch_oracle.npz" --n 2
    export BIRDNET_V24_ORACLE="$STAND/v24_oracle.npz"
    export BIRDNET_V30_ORACLE="$STAND/v30_oracle.npz"
    export PERCH_V2_ORACLE="$STAND/perch_oracle.npz"
fi

have_any=0
for v in BIRDNET_V24_MODEL BIRDNET_V30_MODEL PERCH_V2_MODEL BIRDNET_META_MODEL; do
    if [ -n "${!v:-}" ]; then have_any=1; fi
done
if [ "$have_any" = 0 ]; then
    echo "error: no *_MODEL env vars set." >&2
    echo "  set BIRDNET_V24_MODEL/BIRDNET_V24_LABELS (+ v30/Perch/meta) — see header" >&2
    echo "  or run: scripts/adjudicate_real_models.sh --rehearse" >&2
    exit 2
fi

echo "== step 1/3: import -> detect -> gates (tests/test_real_models.py) =="
python -m pytest tests/test_real_models.py -v -rs

if [ -n "${BIRDNET_V24_MODEL:-}" ]; then
    echo "== step 2/3: CLI end-to-end (v2.4) =="
    WAV=$(mktemp /tmp/adjudicate_XXXXXX.wav)
    python - "$WAV" <<'PYEOF'
import sys

import numpy as np

from birdnet_tpu.utils.audio_io import write_wav

t = np.linspace(0, 7, 7 * 48_000, endpoint=False)
sig = (0.4 * np.sin(2 * np.pi * 3000 * t)).astype(np.float32)
write_wav(sys.argv[1], sig, 48_000)
PYEOF
    python -m birdnet_tpu.cli "$WAV" \
        -m "$BIRDNET_V24_MODEL" -l "$BIRDNET_V24_LABELS" --top-k 3
    rm -f "$WAV"
else
    echo "== step 2/3 skipped: BIRDNET_V24_MODEL unset =="
fi

if [ "$NO_BENCH" = 1 ]; then
    echo "== step 3/3 skipped: --no-bench =="
elif [ -n "${BIRDNET_V24_MODEL:-}" ]; then
    PLATFORM=$(python -c "
from birdnet_tpu.runtime import default_device, init_runtime
init_runtime(); print(default_device().platform)" 2>/dev/null || echo unknown)
    if [ "$PLATFORM" = "tpu" ] || [ "$PLATFORM" = "axon" ]; then
        echo "== step 3/3: real-weights bench (bench.py on $PLATFORM) =="
        BIRDNET_BENCH_MODEL="$BIRDNET_V24_MODEL" python bench.py
    else
        echo "== step 3/3 skipped: no TPU live (platform=$PLATFORM); run on" \
             "hardware: BIRDNET_BENCH_MODEL=\$BIRDNET_V24_MODEL python bench.py =="
    fi
else
    echo "== step 3/3 skipped: BIRDNET_V24_MODEL unset =="
fi

echo "== adjudication complete =="
