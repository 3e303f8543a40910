"""Device-side ops: fused postprocess, audio framing, Pallas kernels."""

from .topk import fused_sigmoid_topk  # noqa: F401
