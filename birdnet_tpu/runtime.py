"""Runtime initialization and device discovery.

The reference's L1 runtime discovers and loads the ONNX Runtime dylib
(reference: src/runtime.rs:12-151). The TPU-native analog initializes JAX,
selects the default accelerator, and configures the persistent XLA
compilation cache — the equivalent of the reference's TensorRT engine/timing
caches (reference: src/tensorrt_config.rs:221-267, 384 s → 9 s session
creation with cache).

``init_runtime`` is idempotent (reference: runtime.rs:138-151).
"""

from __future__ import annotations

import os
import threading
from typing import List, Optional

from .errors import RuntimeInitError
from .types import DeviceBackend, DeviceInfo

_init_lock = threading.Lock()
_initialized = False

# Default persistent compilation cache location; override with
# BIRDNET_COMPILATION_CACHE ("" disables).
_DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/birdnet_tpu/xla")

_ACCEL_PLATFORMS = ("tpu", "axon", "gpu", "cuda", "rocm")

# Requested name → acceptable JAX platform names, in preference order.
_PLATFORM_ALIASES = {
    "tpu": ("tpu", "axon"),
    "axon": ("axon", "tpu"),
    "gpu": ("gpu", "cuda", "rocm"),
    "cuda": ("cuda", "gpu"),
    "rocm": ("rocm", "gpu"),
}


def _cache_scope() -> str:
    """Per-backend cache subdirectory, so one shared cache directory can
    never serve an executable built for a different target.

    Accelerator (TPU/axon/GPU) executables are host-CPU independent; the
    backend name alone scopes them. XLA:CPU results are AOT-compiled for
    the build machine's ISA feature set, and the persistent-cache key does
    NOT include those features — a cache dir shared across hosts (or fed
    by a remote-compile service) loads mismatched AOT results with a
    "could lead to SIGILL" warning (observed 2026-08-20). Fingerprint the
    host's CPU flags into the scope for the cpu backend.
    """
    import jax

    backend = jax.default_backend()
    if backend != "cpu":
        return backend
    try:
        flags = ""
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = line
                    break
    except OSError:
        flags = ""
    if not flags:
        import platform as _platform

        flags = _platform.machine() + _platform.processor()
    import hashlib

    return "cpu-" + hashlib.sha1(flags.encode()).hexdigest()[:10]


def _set_cache_dir(base_dir: str) -> None:
    import jax

    scoped = os.path.join(base_dir, _cache_scope())
    os.makedirs(scoped, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", scoped)


def init_runtime(compilation_cache_dir: Optional[str] = None) -> None:
    """Initialize JAX + the persistent compilation cache. Idempotent.

    The cache directory gets a per-target subdirectory (backend name;
    ``cpu-<isa-fingerprint>`` for the CPU backend) — see _cache_scope.
    """
    global _initialized
    with _init_lock:
        if _initialized:
            if compilation_cache_dir:
                # An explicitly requested cache dir must not be silently
                # discarded just because something touched the runtime
                # earlier; the cache dir is updatable post-init.
                _set_cache_dir(compilation_cache_dir)
            return
        try:
            import jax

            cache_dir = compilation_cache_dir
            if cache_dir is None:
                cache_dir = os.environ.get(
                    "BIRDNET_COMPILATION_CACHE", _DEFAULT_CACHE_DIR
                )
            try:
                jax.devices()  # force backend init; raises if nothing usable
            except RuntimeError as e:
                # A tunnel/plugin (e.g. axon) may pin jax_platforms to a
                # backend name it then fails to register — recoverable when
                # another backend (tpu/cpu) did come up: let JAX re-probe.
                if "not in the list of known backends" not in str(e):
                    raise
                jax.config.update("jax_platforms", None)
                jax.devices()
            if cache_dir:
                # After backend init so the scope can read the default
                # backend; the cache dir is a config value, so setting it
                # post-init still applies to every subsequent compile.
                _set_cache_dir(cache_dir)
                # Persist every compile over 0.1 s — model shapes recur;
                # sub-0.1 s compiles aren't worth the cache-entry churn.
                jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        except Exception as e:  # noqa: BLE001 - surface as typed error
            raise RuntimeInitError(str(e)) from e
        _initialized = True


def set_platform(platform: str) -> None:
    """Force the JAX platform (e.g. ``cpu``) before backend initialization.

    Needed because accelerator plugins may override the ``JAX_PLATFORMS``
    environment variable at import time; this must run before the first
    device use.
    """
    import jax

    jax.config.update("jax_platforms", platform)


def _backend_for_platform(platform: str) -> DeviceBackend:
    p = platform.lower()
    if p == "axon":
        return DeviceBackend.AXON
    if p == "tpu":
        return DeviceBackend.TPU
    if p in ("gpu", "cuda", "rocm"):
        return DeviceBackend.GPU
    return DeviceBackend.CPU


def available_devices() -> List[DeviceInfo]:
    """All devices visible to the runtime, accelerators first, CPU always
    present (the analog of ``available_execution_providers``, reference:
    src/execution_providers.rs:35-58)."""
    import jax

    init_runtime()
    infos: List[DeviceInfo] = []
    try:
        # Local devices only: under jax.distributed the global list shows
        # other hosts' chips, which this process cannot execute on —
        # default_device restricts to local for the same reason.
        devs = jax.local_devices()
    except RuntimeError:
        devs = []
    for d in devs:
        infos.append(
            DeviceInfo(
                backend=_backend_for_platform(d.platform),
                device_id=d.id,
                description=getattr(d, "device_kind", "") or str(d),
            )
        )
    if not any(i.backend is DeviceBackend.CPU for i in infos):
        # CPU host is always available as a fallback executor.
        infos.append(DeviceInfo(backend=DeviceBackend.CPU, device_id=0, description="host"))
    # Accelerators first (reference lists CPU first; we report it last so
    # "first non-CPU" selection logic mirrors requested-provider precedence).
    infos.sort(key=lambda i: i.backend is DeviceBackend.CPU)
    return infos


def default_device(prefer: Optional[str] = None, device_id: int = 0):
    """Pick the default jax.Device: requested platform, else accelerator,
    else CPU. Only process-local devices qualify — under ``jax.distributed``
    the global device list includes other hosts' chips, which this process
    cannot execute on directly (the multi-host tier shards *files*, not
    arrays; see parallel/multihost.py).

    ``device_id`` selects the chip ordinal among the matching local devices
    (reference: cuda_config.rs:179-182); with no ``prefer`` it indexes the
    local accelerators (or CPU devices when none exist).
    """
    import jax

    init_runtime()
    local = jax.local_devices()

    def _pick(matches, what):
        if device_id >= len(matches) or device_id < 0:
            raise RuntimeInitError(
                f"device_id {device_id} out of range: "
                f"{len(matches)} local {what} device(s)"
            )
        return matches[device_id]

    if prefer:
        # Platform aliases: 'tpu' must find the axon-tunneled chip, and
        # cuda/rocm are GPU spellings (mirrors execution_providers.py).
        aliases = _PLATFORM_ALIASES.get(prefer.lower(), (prefer.lower(),))
        matches = [d for d in local if d.platform.lower() in aliases]
        if matches:
            return _pick(matches, prefer)
        last_err = None
        for name in aliases:
            try:
                matches = [
                    d
                    for d in jax.devices(name)
                    if d.process_index == jax.process_index()
                ]
                if matches:
                    return _pick(matches, prefer)
            except RuntimeError as e:
                last_err = e
        if last_err is not None:
            raise RuntimeInitError(
                f"no {prefer!r} devices available: {last_err}"
            ) from last_err
        raise RuntimeInitError(f"no process-local {prefer!r} devices available")
    accels = [d for d in local if d.platform.lower() in _ACCEL_PLATFORMS]
    if accels:
        # Honor device_id on auto-selection too (TPUConfig.device_id with
        # no explicit platform request must not silently run on chip 0).
        return _pick(accels, "accelerator")
    return _pick(local, "local")
