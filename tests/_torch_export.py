"""Helper: export torch modules to real ONNX protobuf bytes.

This exists to break the self-referential codec loop flagged in round 1:
every graph the decoder had parsed was produced by our own encoder. Here the
bytes come from torch's legacy (TorchScript) ONNX exporter, whose protobuf
serialization happens in libtorch C++ — a genuinely third-party producer
(reference analog: ``commit_from_file`` consuming arbitrary exporter output,
src/classifier.rs:348-350).

The only reason the legacy exporter normally requires the ``onnx`` python
package (absent in this environment) is ``_add_onnxscript_fn``, a post-pass
that scans the finished proto for onnxscript custom functions. Plain
``aten``-only models never contain those, so we bypass that single hook; the
model bytes themselves are produced entirely by torch.
"""

from __future__ import annotations

import contextlib
import io
import warnings

import torch


@contextlib.contextmanager
def tracable_hf_masks():
    """Swap transformers' vmap-based mask construction for a broadcast
    equivalent while exporting.

    transformers >= 4.53 builds attention masks through ``torch.vmap``
    (masking_utils._vmap_for_bhqkv); TorchScript tracing cannot go through
    functorch's custom_function_call and dies with an opaque
    ``RuntimeError: unordered_map::at``. Every shipped mask_function
    (causal, sliding-window, padding via advanced indexing, and_masks/
    or_masks combinations) is elementwise over (batch, head, q, kv)
    indices, so evaluating it once on broadcast-shaped index tensors is
    numerically identical to the nested vmap — and traceable. All callers
    (sdpa_mask_recent_torch, sdpa_mask_older_torch, eager_mask) resolve
    ``_vmap_for_bhqkv`` through the module global at call time, so one
    patch covers every attention implementation.
    """
    try:
        import transformers.masking_utils as mu
    except ImportError:
        yield
        return
    orig = getattr(mu, "_vmap_for_bhqkv", None)
    if orig is None:
        yield
        return
    # TransformGetItemToIndex is a __torch_function__ mode that rewrites
    # `tensor[scalar_tensor]` into a functorch higher-order op so vmap can
    # handle it; under TorchScript tracing that op dies the same way. With
    # broadcast-shaped index tensors plain advanced indexing is correct, so
    # the mode becomes unnecessary — replace it with a no-op context.
    orig_getitem = getattr(mu, "TransformGetItemToIndex", None)
    # find_packed_sequence_indices uses torch.diff, which the TorchScript
    # exporter has no symbolic for. diff(x, prepend=p, dim=-1) is exactly
    # x - concat([p, x[:, :-1]]); substitute that equivalent form.
    orig_packed = getattr(mu, "find_packed_sequence_indices", None)

    def packed_indices_no_diff(position_ids):
        prev = torch.cat(
            [position_ids[:, :1] - 1, position_ids[:, :-1]], dim=-1
        )
        return ((position_ids - prev) != 1).cumsum(-1)

    def broadcast_for_bhqkv(mask_function, bh_indices: bool = True):
        def fn(batch_idx, head_idx, q_idx, kv_idx):
            if bh_indices:
                out = mask_function(
                    batch_idx.view(-1, 1, 1, 1),
                    head_idx.view(1, -1, 1, 1),
                    q_idx.view(1, 1, -1, 1),
                    kv_idx.view(1, 1, 1, -1),
                )
                return out.expand(
                    batch_idx.shape[0], head_idx.shape[0],
                    q_idx.shape[0], kv_idx.shape[0],
                )
            # older-torch form: batch/head passed as None, output [q, kv]
            out = mask_function(
                batch_idx, head_idx, q_idx.view(-1, 1), kv_idx.view(1, -1)
            )
            return out.expand(q_idx.shape[0], kv_idx.shape[0])

        return fn

    mu._vmap_for_bhqkv = broadcast_for_bhqkv
    if orig_getitem is not None:
        mu.TransformGetItemToIndex = contextlib.nullcontext
    if orig_packed is not None:
        mu.find_packed_sequence_indices = packed_indices_no_diff
    try:
        yield
    finally:
        mu._vmap_for_bhqkv = orig
        if orig_getitem is not None:
            mu.TransformGetItemToIndex = orig_getitem
        if orig_packed is not None:
            mu.find_packed_sequence_indices = orig_packed


def export_onnx_bytes(module, args, opset_version: int = 17, **kwargs) -> bytes:
    """Export ``module(*args)`` via torch's legacy ONNX exporter, returning
    the serialized ModelProto bytes (produced by libtorch, not by us)."""
    import torch.onnx._internal.torchscript_exporter.onnx_proto_utils as _opu

    module.eval()
    buf = io.BytesIO()
    orig = _opu._add_onnxscript_fn
    _opu._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes
    try:
        with warnings.catch_warnings(), tracable_hf_masks():
            warnings.simplefilter("ignore")
            torch.onnx.export(
                module,
                args,
                buf,
                dynamo=False,
                opset_version=opset_version,
                **kwargs,
            )
    finally:
        _opu._add_onnxscript_fn = orig
    data = buf.getvalue()
    assert len(data) > 0, "exporter produced no bytes"
    return data


def torch_outputs(module, args):
    """Run the module in eval mode and return a list of numpy outputs."""
    module.eval()
    with torch.no_grad():
        out = module(*args)
    if isinstance(out, torch.Tensor):
        out = (out,)
    flat = []
    for o in out:
        if isinstance(o, (tuple, list)):
            flat.extend(o)
        else:
            flat.append(o)
    return [o.detach().cpu().numpy() for o in flat]
