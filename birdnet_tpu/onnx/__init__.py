"""Self-contained ONNX format support: protobuf codec + graph utilities.

This package replaces the reference's dependency on the ONNX Runtime C++
engine (reference: Cargo.toml:20, src/runtime.rs) for *loading* models; the
compute path is the JAX/XLA compiler in :mod:`birdnet_tpu.compiler`.
"""

from .proto import (  # noqa: F401
    AttributeProto,
    AttrType,
    DataType,
    GraphProto,
    ModelProto,
    NodeProto,
    TensorProto,
    ValueInfoProto,
    decode_model,
    encode_model,
    load_model,
    make_attr,
    make_model,
    make_node,
    make_value_info,
    save_model,
)
