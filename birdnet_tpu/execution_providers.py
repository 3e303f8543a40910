"""Hardware backend availability reporting.

The reference queries which of 11 ONNX Runtime execution providers are
usable (reference: src/execution_providers.rs:35-58). The TPU-native analog
reports the JAX devices visible to this process, accelerators first.
"""

from __future__ import annotations

from typing import List

from .runtime import available_devices
from .types import DeviceBackend, DeviceInfo


def available_execution_providers() -> List[DeviceInfo]:
    """Devices usable for inference (accelerators first, CPU always last)."""
    return available_devices()


def is_device_available(platform: str) -> bool:
    """Whether a device of the given kind (``tpu``/``cpu``/``gpu``) exists."""
    p = platform.lower()
    wanted = {
        "tpu": (DeviceBackend.TPU, DeviceBackend.AXON),
        "axon": (DeviceBackend.AXON,),
        "cpu": (DeviceBackend.CPU,),
        "gpu": (DeviceBackend.GPU,),
        # GPU spellings — the selection path (runtime._PLATFORM_ALIASES)
        # accepts these, so the availability probe must agree.
        "cuda": (DeviceBackend.GPU,),
        "rocm": (DeviceBackend.GPU,),
    }.get(p)
    if wanted is None:
        return False
    return any(i.backend in wanted for i in available_devices())
