"""Decoder robustness on corrupt/hostile ONNX bytes.

The reference delegates malformed-file handling to ONNX Runtime's C++
parser and surfaces `Error::ModelLoad` (reference: src/classifier.rs:
348-350, src/error.rs ModelLoad variant). The hand-rolled codec here must
uphold the same contract: any byte-level corruption → a clean
``ModelLoadError`` from the import path — never a hang, crash, or a leaked
implementation exception.

Mutations are deterministic (seeded) so failures reproduce.
"""

import numpy as np
import pytest

from birdnet_tpu.errors import ModelLoadError


@pytest.fixture(scope="module")
def base_bytes(tmp_path_factory):
    from birdnet_tpu.models import birdnet_v24

    p = tmp_path_factory.mktemp("fuzz") / "base.onnx"
    birdnet_v24.save_tiny(p, num_species=10)
    return p.read_bytes()


def _mutations(data: bytes, n: int):
    rng = np.random.default_rng(1234)
    for trial in range(n):
        b = bytearray(data)
        kind = trial % 4
        if kind == 0:  # truncate anywhere
            yield bytes(b[: rng.integers(0, len(b))])
        elif kind == 1:  # flip a handful of bytes
            for _ in range(int(rng.integers(1, 8))):
                i = int(rng.integers(0, len(b)))
                b[i] ^= int(rng.integers(1, 256))
            yield bytes(b)
        elif kind == 2:  # pure garbage
            yield bytes(
                rng.integers(0, 256, int(rng.integers(1, 2000)), dtype=np.uint8)
            )
        else:  # insert junk mid-stream (shifts every following offset)
            pos = int(rng.integers(0, len(b)))
            junk = bytes(
                rng.integers(0, 256, int(rng.integers(1, 50)), dtype=np.uint8)
            )
            yield bytes(b[:pos]) + junk + bytes(b[pos:])


def test_import_model_never_leaks_on_corrupt_bytes(base_bytes, tmp_path):
    """import_model on 160 deterministic corruptions: either the mutation
    happened to keep the file loadable, or ModelLoadError — nothing else."""
    from birdnet_tpu.compiler.importer import import_onnx as import_model

    outcomes = {"ok": 0, "model_load_error": 0}
    p = tmp_path / "mut.onnx"
    for mutated in _mutations(base_bytes, 160):
        p.write_bytes(mutated)
        try:
            import_model(str(p))
            outcomes["ok"] += 1
        except ModelLoadError:
            outcomes["model_load_error"] += 1
        # anything else propagates and fails the test
    # byte-flips can survive decode (e.g. inside weight data), but the
    # majority of corruptions must be *detected*
    assert outcomes["model_load_error"] >= 100, outcomes


def test_decode_empty_and_tiny_inputs(tmp_path):
    from birdnet_tpu.compiler.importer import import_onnx as import_model

    for payload in (b"", b"\x00", b"\xff" * 16, b"ONNX"):
        p = tmp_path / "junk.onnx"
        p.write_bytes(payload)
        with pytest.raises(ModelLoadError):
            import_model(str(p))


def test_missing_file_is_model_load_error():
    from birdnet_tpu.compiler.importer import import_onnx as import_model

    with pytest.raises(ModelLoadError):
        import_model("/nonexistent/path/model.onnx")


@pytest.fixture(scope="module")
def modern_dtype_bytes():
    """A model carrying int4-packed + fp8 + bf16 initializers, so the
    mutation sweep reaches the new decode branches (nibble unpack,
    ml_dtypes views, bit-pattern int32_data storage)."""
    import ml_dtypes

    from birdnet_tpu.onnx import proto as P

    def pack(vals):
        nib = [v & 0xF for v in vals]
        if len(nib) % 2:
            nib.append(0)
        return bytes(nib[i] | (nib[i + 1] << 4) for i in range(0, len(nib), 2))

    w4 = P.TensorProto(name="w4", data_type=P.DataType.INT4, dims=[4, 4],
                       raw_data=pack(list(range(-8, 8))))
    s = P.TensorProto.from_numpy(np.float32(0.1), "s")
    f8 = P.TensorProto.from_numpy(
        np.array([0.5, -1.0, 2.0, 4.0] * 5, dtype=ml_dtypes.float8_e4m3fn), "f8"
    )
    b16 = P.TensorProto.from_numpy(
        np.ones((4, 4), dtype=ml_dtypes.bfloat16), "b16"
    )
    nodes = [
        P.make_node("DequantizeLinear", ["w4", "s"], ["w"]),
        P.make_node("MatMul", ["x", "w"], ["m"]),
        P.make_node("Cast", ["b16"], ["bf"], to=P.DataType.FLOAT),
        P.make_node("Add", ["m", "bf"], ["y"]),
    ]
    graph = P.GraphProto(
        name="g", node=nodes,
        input=[P.make_value_info("x", P.DataType.FLOAT, [2, 4])],
        output=[P.make_value_info("y", P.DataType.FLOAT, [2, 4])],
        initializer=[w4, s, f8, b16],
    )
    m = P.ModelProto(ir_version=10, producer_name="fuzz", graph=graph,
                     opset_import=[P.OperatorSetId(domain="", version=21)])
    return P.encode_model(m)


def test_modern_dtype_decode_never_leaks_on_corrupt_bytes(modern_dtype_bytes):
    from birdnet_tpu.compiler.importer import import_onnx as import_model

    outcomes = {"ok": 0, "model_load_error": 0}
    for mutated in _mutations(modern_dtype_bytes, 120):
        try:
            import_model(bytes(mutated))
            outcomes["ok"] += 1
        except ModelLoadError:
            outcomes["model_load_error"] += 1
    assert sum(outcomes.values()) == 120
    assert outcomes["model_load_error"] > 0
