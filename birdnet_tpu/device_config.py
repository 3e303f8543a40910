"""Device/compiler tuning configs — the TPU analogs of the reference's
CUDA and TensorRT option structs (reference: src/cuda_config.rs:76-124,
src/tensorrt_config.rs:78-160).

``TPUConfig`` maps the reference's knobs onto their XLA equivalents:

| reference knob                    | TPU equivalent                        |
|-----------------------------------|---------------------------------------|
| CUDA memory_limit / arena strategy| memory_fraction (XLA client prealloc) |
| device_id                         | device_id (chip ordinal)              |
| TensorRT fp16 (default on)        | precision="mixed" (bf16 MXU, f32 acc) |
| TensorRT engine/timing cache      | compilation_cache_dir (persistent)    |
| cuda_graph / builder_opt_level    | donate_buffers / xla autotuning       |
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional


@dataclass
class TPUConfig:
    """TPU execution tuning (analog of ``CUDAConfig`` + ``TensorRTConfig``)."""

    # Chip ordinal to run on (reference: cuda_config.rs:179-182).
    device_id: int = 0
    # MXU precision policy: "mixed" = bf16 operands + f32 accumulation (the
    # TensorRT-fp16 analog, default ON like the reference's fp16, reference:
    # tensorrt_config.rs:100-112); "fp32" = full precision; "bf16" = bf16
    # accumulation too.
    precision: str = "mixed"
    # Persistent XLA compilation cache dir (engine/timing cache analog,
    # reference: tensorrt_config.rs:221-267). None = default, "" = disabled.
    compilation_cache_dir: Optional[str] = None
    # Donate input buffers to XLA so repeated-batch inference reuses HBM
    # (the IoBinding analog; reference: batch_context.rs:231-270).
    donate_buffers: bool = True
    # Fraction of HBM the XLA client may preallocate (arena-strategy analog,
    # reference: cuda_config.rs:108-124). None = JAX default.
    memory_fraction: Optional[float] = None

    def apply(self) -> None:
        """Apply process-level settings (memory fraction must be set before
        backend init)."""
        import os

        if self.memory_fraction is not None:
            os.environ["XLA_PYTHON_CLIENT_MEM_FRACTION"] = str(self.memory_fraction)


@dataclass
class CPUConfig:
    """Host execution tuning (parity stub for the reference's CPU EP)."""

    precision: str = "fp32"
    donate_buffers: bool = True
    compilation_cache_dir: Optional[str] = None
    device_id: int = 0

    def apply(self) -> None:
        """Nothing process-level to set for host execution (kept for
        interface symmetry with :class:`TPUConfig`)."""
