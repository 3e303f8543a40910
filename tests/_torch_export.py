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

import io
import warnings

import torch


def export_onnx_bytes(module, args, opset_version: int = 17, **kwargs) -> bytes:
    """Export ``module(*args)`` via torch's legacy ONNX exporter, returning
    the serialized ModelProto bytes (produced by libtorch, not by us)."""
    import torch.onnx._internal.torchscript_exporter.onnx_proto_utils as _opu

    module.eval()
    buf = io.BytesIO()
    orig = _opu._add_onnxscript_fn
    _opu._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes
    try:
        with warnings.catch_warnings():
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
