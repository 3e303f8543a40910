"""Production serving: dynamic request batching + HTTP front end.

The reference is an embeddable library; serving it means writing your own
daemon around the mutex-serialized ``Classifier`` (reference:
src/classifier.rs:434-449). This package is the TPU-native serving tier:
:class:`DynamicBatcher` coalesces concurrent requests into fixed-shape
device batches (one compiled executable, donated buffers), and
``birdnet-serve`` (:mod:`birdnet_tpu.serve.server`) exposes it over HTTP.
"""

from .batcher import BatcherMetrics, DynamicBatcher
from .client import ServeClient, ServeError
from .server import ServerState, make_server

__all__ = [
    "BatcherMetrics",
    "DynamicBatcher",
    "ServeClient",
    "ServeError",
    "ServerState",
    "make_server",
]
