"""Frozen transcription of the onnx.proto wire schema (field numbers).

Provenance: hand-transcribed from the ONNX project's ``onnx/onnx.proto``
at IR version 11 (ONNX 1.19, 2025), written down 2026-08 from the
builder's knowledge of the spec — no onnx wheel or network exists in this
environment to generate it mechanically (same constraint and same
discipline as the operator table in tests/_onnx_spec_table.py). It is
test data, frozen here so the codec's WIRE_POLICY
(birdnet_tpu/onnx/proto.py) is falsifiable against something other than
the codec itself: every spec field must be pinned decoded / skipped /
rejected, and the audit fails on any field present in one table but not
the other.

Scope notes:
- Field numbers marked reserved in the spec (removed pre-IR-4 fields:
  GraphProto 3,4,6,7,8,9; FunctionProto 2,3; AttributeProto 12) are NOT
  listed — the wire format can never carry them under their old meaning.
- Sub-messages whose *parent field* is pinned "skipped" wholesale
  (TrainingInfoProto under ModelProto.training_info, TensorAnnotation
  under GraphProto.quantization_annotation, DeviceConfigurationProto and
  friends under the IR v11 multi-device fields, TypeProto.Opaque under
  TypeProto.opaque_type, TensorProto.Segment under the *rejected*
  TensorProto.segment) are not transcribed field-by-field: the decoder
  never descends into them, so their inner fields cannot be silently
  dropped *individually* — the whole message is skipped or rejected with
  a pinned rationale.
- Inline nested types that the codec decodes through helper loops rather
  than named top-level messages (TypeProto.Tensor elem_type=1/shape=2,
  TypeProto.Sequence elem_type=1, TypeProto.Map key_type=1/value_type=2,
  TypeProto.SparseTensor elem_type=1/shape=2, TypeProto.Optional
  elem_type=1) are transcribed under their qualified names below.

If a future ONNX IR release adds a field, re-transcribe it here; the
audit in test_wire_schema_audit.py then fails until WIRE_POLICY pins it.
"""

# {message: {field_number: field_name}}
SPEC_FIELDS = {
    "ModelProto": {
        1: "ir_version",
        2: "producer_name",
        3: "producer_version",
        4: "domain",
        5: "model_version",
        6: "doc_string",
        7: "graph",
        8: "opset_import",
        14: "metadata_props",
        20: "training_info",
        25: "functions",
        26: "configuration",
    },
    "GraphProto": {
        1: "node",
        2: "name",
        5: "initializer",
        10: "doc_string",
        11: "input",
        12: "output",
        13: "value_info",
        14: "quantization_annotation",
        15: "sparse_initializer",
        16: "metadata_props",
    },
    "NodeProto": {
        1: "input",
        2: "output",
        3: "name",
        4: "op_type",
        5: "attribute",
        6: "doc_string",
        7: "domain",
        8: "overload",
        9: "metadata_props",
        10: "device_configurations",
    },
    "AttributeProto": {
        1: "name",
        2: "f",
        3: "i",
        4: "s",
        5: "t",
        6: "g",
        7: "floats",
        8: "ints",
        9: "strings",
        10: "tensors",
        11: "graphs",
        13: "doc_string",
        14: "tp",
        15: "type_protos",
        20: "type",
        21: "ref_attr_name",
        22: "sparse_tensor",
        23: "sparse_tensors",
    },
    "TensorProto": {
        1: "dims",
        2: "data_type",
        3: "segment",
        4: "float_data",
        5: "int32_data",
        6: "string_data",
        7: "int64_data",
        8: "name",
        9: "raw_data",
        10: "double_data",
        11: "uint64_data",
        12: "doc_string",
        13: "external_data",
        14: "data_location",
        16: "metadata_props",
    },
    "SparseTensorProto": {
        1: "values",
        2: "indices",
        3: "dims",
    },
    "TypeProto": {
        1: "tensor_type",
        4: "sequence_type",
        5: "map_type",
        6: "denotation",
        7: "opaque_type",
        8: "sparse_tensor_type",
        9: "optional_type",
    },
    "TensorShapeProto": {
        1: "dim",
    },
    "TensorShapeProto.Dimension": {
        1: "dim_value",
        2: "dim_param",
        3: "denotation",
    },
    "ValueInfoProto": {
        1: "name",
        2: "type",
        3: "doc_string",
        4: "metadata_props",
    },
    "OperatorSetIdProto": {
        1: "domain",
        2: "version",
    },
    "StringStringEntryProto": {
        1: "key",
        2: "value",
    },
    "FunctionProto": {
        1: "name",
        4: "input",
        5: "output",
        6: "attribute",
        7: "node",
        8: "doc_string",
        9: "opset_import",
        10: "domain",
        11: "attribute_proto",
        12: "value_info",
        13: "overload",
        14: "metadata_props",
    },
}

# Nested message types the codec decodes through inline helper loops; the
# audit checks these too (they are part of the wire surface even though
# proto.py has no dataclass named for them).
NESTED_SPEC_FIELDS = {
    "TypeProto.Tensor": {1: "elem_type", 2: "shape"},
    "TypeProto.Sequence": {1: "elem_type"},
    "TypeProto.Map": {1: "key_type", 2: "value_type"},
    "TypeProto.SparseTensor": {1: "elem_type", 2: "shape"},
    "TypeProto.Optional": {1: "elem_type"},
}
