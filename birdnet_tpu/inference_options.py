"""Inference options: timeout + cancellation.

Mirrors reference src/inference_options.rs: ``CancellationToken`` is a
clone-shared atomic flag (inference_options.rs:24-47); ``InferenceOptions``
carries an optional timeout and optional token (inference_options.rs:72-114).

TPU semantics note: XLA cannot terminate a launched device program the way
``ort::RunOptions::terminate()`` aborts an ONNX Runtime run. Here the timeout
and cancellation bound the *host wait* on the asynchronous device result —
the call raises :class:`~birdnet_tpu.errors.InferenceTimeoutError` /
:class:`~birdnet_tpu.errors.InferenceCancelledError` at the same points a
reference user would observe them, and the abandoned device work completes in
the background without blocking anything.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass
from typing import Optional


class CancellationToken:
    """Shared cancellation flag (reference: inference_options.rs:24-47).

    Instances are cheaply shareable across threads; ``cancel()`` on any
    reference is observed by all holders, like the reference's
    ``Arc<AtomicBool>`` clone semantics.
    """

    __slots__ = ("_event",)

    def __init__(self) -> None:
        self._event = threading.Event()

    def cancel(self) -> None:
        """Signal cancellation (inference_options.rs:37-39)."""
        self._event.set()

    def is_cancelled(self) -> bool:
        """Check whether cancellation was requested (inference_options.rs:42-44)."""
        return self._event.is_set()

    def wait(self, timeout: Optional[float] = None) -> bool:
        """Block until cancelled (or timeout); returns cancelled state."""
        return self._event.wait(timeout)


@dataclass
class InferenceOptions:
    """Per-call inference options (reference: inference_options.rs:72-114).

    ``timeout`` is in seconds (the reference uses ``std::time::Duration``);
    ``None`` (or 0) means no timeout.
    """

    timeout: Optional[float] = None
    cancellation_token: Optional[CancellationToken] = None

    def needs_monitor(self) -> bool:
        """Whether a monitor is required for this call
        (reference: inference_options.rs:111-113).

        A non-positive timeout means the deadline has ALREADY passed (e.g.
        a computed remaining-budget gone negative): it must monitor and
        time out immediately, not silently disable the deadline — the
        reference's Duration type makes negative timeouts unrepresentable.
        """
        return self.timeout is not None or self.cancellation_token is not None

    @staticmethod
    def with_timeout(seconds: float) -> "InferenceOptions":
        """Options with a timeout (reference: ``InferenceOptions::timeout``)."""
        return InferenceOptions(timeout=seconds)

    @staticmethod
    def with_cancellation(token: CancellationToken) -> "InferenceOptions":
        return InferenceOptions(cancellation_token=token)

    def with_cancellation_token(self, token: CancellationToken) -> "InferenceOptions":
        """Chainable token attach (reference:
        ``InferenceOptions::timeout(d).with_cancellation_token(tok)``)."""
        import dataclasses

        return dataclasses.replace(self, cancellation_token=token)
