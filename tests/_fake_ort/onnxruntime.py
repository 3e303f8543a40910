"""Stand-in ``onnxruntime`` module for ORACLE-LEG REHEARSAL ONLY.

``scripts/record_oracle.py`` needs a real ONNX Runtime wheel to record a
genuine oracle — which this environment has never had (no network; the
reference consumes ORT via the ``ort`` crate, Cargo.toml:20). That left
the record → gate → compare path of the real-weights runbook as the one
leg never executed anywhere (round-4 verdict item 5). This shim closes
the rehearsal gap: prepend this directory to PYTHONPATH and
``import onnxruntime`` resolves here, where ``InferenceSession`` wraps
*this repo's own engine* at fp32.

What this proves: the recorder's session/shape/feed handling, the .npz
format, the env-var gates, and the comparison tier in
tests/test_real_models.py all work end-to-end — so on day one with real
weights, recording on an ORT machine is a parameter change.

What this does NOT prove: independent numerics. An oracle recorded
through this shim is the engine checked against itself; the rehearsal is
harness validation, not an ORT parity result. Never ship an .npz
recorded with this module as a real oracle — ``record_oracle.py`` brands
shim-recorded files with ``oracle_source="birdnet_tpu-fake-ort"`` and the
parity tier prints a loud warning when it sees one.
"""

from __future__ import annotations

import numpy as np

ORACLE_SOURCE = "birdnet_tpu-fake-ort"
__version__ = "0.0.0-rehearsal"


class _IOInfo:
    def __init__(self, name, shape):
        self.name = name
        # ORT reports symbolic dims as strings; mirror that so the
        # recorder's `isinstance(d, int)` handling is exercised.
        self.shape = [
            d if isinstance(d, int) and d > 0 else "batch" for d in shape
        ]


class InferenceSession:
    def __init__(self, path_or_bytes, providers=None, **_kw):
        import jax

        from birdnet_tpu.compiler.importer import import_onnx, make_forward

        self._imp = import_onnx(
            path_or_bytes
            if isinstance(path_or_bytes, (bytes, bytearray))
            else str(path_or_bytes)
        )
        self._fwd = jax.jit(make_forward(self._imp, precision="fp32"))

    def get_inputs(self):
        return [
            _IOInfo(n, s)
            for n, s in zip(self._imp.input_names, self._imp.input_shapes)
        ]

    def get_outputs(self):
        return [
            _IOInfo(n, s)
            for n, s in zip(self._imp.output_names, self._imp.output_shapes)
        ]

    def run(self, output_names, feed):
        args = [np.asarray(feed[n]) for n in self._imp.input_names]
        outs = [np.asarray(o) for o in self._fwd(self._imp.params, *args)]
        if output_names:
            by_name = dict(zip(self._imp.output_names, outs))
            return [by_name[n] for n in output_names]
        return outs


def get_available_providers():
    return ["CPUExecutionProvider"]
