"""StringNormalizer + TfIdfVectorizer — the last two ai.onnx core ops.

Oracles are hand-computed from the ONNX operator spec (counting rule:
unigrams counted once; n>=2 grams counted at every stride 1..skip+1), on
the spec's own example pool (4 unigrams [2,3,5,4], 3 bigrams
[(5,6),(7,8),(6,7)]). The reference reaches these ops through ONNX
Runtime's CPU kernel library (reference: src/classifier.rs:637-639).
"""

import jax
import numpy as np
import pytest

from birdnet_tpu.compiler import import_onnx, make_forward
from birdnet_tpu.onnx import proto as P


def _dtype_of(v):
    arr = np.asarray(v)
    if arr.dtype.kind in ("U", "S", "O"):
        return P.DataType.STRING
    return P._NUMPY_TO_DTYPE[arr.dtype]


def _run(nodes, inputs, initializers=None, outputs=("y",)):
    init = [
        P.TensorProto.from_numpy(np.asarray(v), name=k)
        for k, v in (initializers or {}).items()
    ]
    in_vis = [
        P.make_value_info(k, _dtype_of(v), list(np.asarray(v).shape))
        for k, v in inputs.items()
    ]
    out_vis = [P.make_value_info(n, P.DataType.FLOAT, []) for n in outputs]
    graph = P.GraphProto(
        name="t", node=nodes, initializer=init, input=in_vis, output=out_vis
    )
    model = import_onnx(P.make_model(graph, opset_version=17), optimize=False)
    fwd = make_forward(model)
    outs = fwd(model.params, *[np.asarray(v) for v in inputs.values()])
    return [np.asarray(o) for o in outs]


# ---------------------------------------------------------------------------
# TfIdfVectorizer
# ---------------------------------------------------------------------------

_POOL = [2, 3, 5, 4, 5, 6, 7, 8, 6, 7]  # unigrams 2,3,5,4; bigrams (5,6)(7,8)(6,7)
_X1 = np.array([1, 1, 3, 3, 3, 7, 8, 6, 7, 5, 6, 8], dtype=np.int32)
_X2 = np.array([[1, 1, 3, 3, 3, 7], [8, 6, 7, 5, 6, 8]], dtype=np.int32)


def _tfidf_node(min_n, max_n, skip, mode="TF", pool=None, counts=(0, 4),
                indexes=tuple(range(7)), weights=None, inp="x"):
    attrs = dict(
        min_gram_length=min_n,
        max_gram_length=max_n,
        max_skip_count=skip,
        mode=mode,
        ngram_counts=list(counts),
        ngram_indexes=list(indexes),
        pool_int64s=list(_POOL if pool is None else pool),
    )
    if weights is not None:
        attrs["weights"] = list(weights)
    return P.make_node("TfIdfVectorizer", [inp], ["y"], **attrs)


def test_tfidf_bigrams_skip0_1d():
    (y,) = _run([_tfidf_node(2, 2, 0)], {"x": _X1})
    np.testing.assert_array_equal(y, [0, 0, 0, 0, 1, 1, 1])
    assert y.dtype == np.float32 and y.shape == (7,)


def test_tfidf_bigrams_skip5_1d():
    # stride d in 1..6: (5,6) only at (9,10) d=1; (7,8) at (5,6) d=1,
    # (8,11) d=3, (5,11) d=6; (6,7) only at (7,8) d=1.
    (y,) = _run([_tfidf_node(2, 2, 5)], {"x": _X1})
    np.testing.assert_array_equal(y, [0, 0, 0, 0, 1, 3, 1])


def test_tfidf_uni_and_bigrams_skip5_1d():
    # unigrams counted once: value 3 occurs 3x, value 5 occurs 1x.
    (y,) = _run([_tfidf_node(1, 2, 5)], {"x": _X1})
    np.testing.assert_array_equal(y, [0, 3, 1, 0, 1, 3, 1])


def test_tfidf_batch_bigrams_skip0():
    (y,) = _run([_tfidf_node(2, 2, 0)], {"x": _X2})
    np.testing.assert_array_equal(
        y, [[0, 0, 0, 0, 0, 0, 0], [0, 0, 0, 0, 1, 0, 1]]
    )


def test_tfidf_batch_bigrams_skip5():
    (y,) = _run([_tfidf_node(2, 2, 5)], {"x": _X2})
    np.testing.assert_array_equal(
        y, [[0, 0, 0, 0, 0, 0, 0], [0, 0, 0, 0, 1, 1, 1]]
    )


def test_tfidf_batch_uni_and_bigrams_skip5():
    (y,) = _run([_tfidf_node(1, 2, 5)], {"x": _X2})
    np.testing.assert_array_equal(
        y, [[0, 3, 0, 0, 0, 0, 0], [0, 0, 1, 0, 1, 1, 1]]
    )


def test_tfidf_empty_unigram_level():
    # ngram_counts=[0,0]: the unigram level is empty, pool holds only the
    # three bigrams; output has 3 columns.
    (y,) = _run(
        [_tfidf_node(2, 2, 0, pool=_POOL[4:], counts=(0, 0), indexes=(0, 1, 2))],
        {"x": _X1},
    )
    np.testing.assert_array_equal(y, [1, 1, 1])


def test_tfidf_tfidf_and_idf_weights():
    w = [0.5, 1.0, 2.0, 3.0, 10.0, 20.0, 30.0]
    (y,) = _run([_tfidf_node(2, 2, 5, mode="TFIDF", weights=w)], {"x": _X1})
    np.testing.assert_allclose(y, [0, 0, 0, 0, 10.0, 60.0, 30.0])
    (y,) = _run([_tfidf_node(1, 2, 5, mode="IDF", weights=w)], {"x": _X1})
    # IDF: weight where count > 0 (value 3 and 5 unigrams hit, all bigrams hit)
    np.testing.assert_allclose(y, [0, 1.0, 2.0, 0, 10.0, 20.0, 30.0])


def test_tfidf_traced_under_jit():
    model = import_onnx(
        P.make_model(
            P.GraphProto(
                name="t",
                node=[_tfidf_node(1, 2, 5)],
                input=[P.make_value_info("x", P.DataType.INT32, [12])],
                output=[P.make_value_info("y", P.DataType.FLOAT, [7])],
            ),
            opset_version=17,
        ),
        optimize=False,
    )
    fwd = jax.jit(make_forward(model))
    (y,) = fwd(model.params, _X1)
    np.testing.assert_array_equal(np.asarray(y), [0, 3, 1, 0, 1, 3, 1])


def test_tfidf_string_pool_matches_int_pool():
    names = {1: "one", 2: "two", 3: "three", 4: "four", 5: "five",
             6: "six", 7: "seven", 8: "eight"}
    xs = np.asarray([names[v] for v in _X1.tolist()], dtype=object)
    node = P.make_node(
        "TfIdfVectorizer", ["x"], ["y"],
        min_gram_length=1, max_gram_length=2, max_skip_count=5, mode="TF",
        ngram_counts=[0, 4], ngram_indexes=list(range(7)),
        pool_strings=[names[v] for v in _POOL],
    )
    (y,) = _run([node], {"x": xs})
    np.testing.assert_array_equal(y, [0, 3, 1, 0, 1, 3, 1])


def test_tfidf_invalid_mode_rejected():
    with pytest.raises(ValueError, match="mode"):
        _run([_tfidf_node(2, 2, 0, mode="DF")], {"x": _X1})


# ---------------------------------------------------------------------------
# StringNormalizer
# ---------------------------------------------------------------------------

_DAYS = np.asarray(["monday", "tuesday", "wednesday", "thursday"], dtype=object)


def _norm(x, **attrs):
    node = P.make_node("StringNormalizer", ["x"], ["y"], **attrs)
    (y,) = _run([node], {"x": x})
    return y


def test_stringnormalizer_stopword_insensitive():
    y = _norm(_DAYS, stopwords=["monday"])
    assert y.tolist() == ["tuesday", "wednesday", "thursday"]


def test_stringnormalizer_stopword_case_insensitive_mixed():
    x = np.asarray(["Monday", "tuesday", "wednesday", "thursday"], dtype=object)
    y = _norm(x, stopwords=["monday"], is_case_sensitive=0,
              case_change_action="LOWER")
    assert y.tolist() == ["tuesday", "wednesday", "thursday"]


def test_stringnormalizer_case_sensitive_keeps_mismatched_case():
    x = np.asarray(["Monday", "tuesday"], dtype=object)
    y = _norm(x, stopwords=["monday"], is_case_sensitive=1,
              case_change_action="UPPER")
    assert y.tolist() == ["MONDAY", "TUESDAY"]


def test_stringnormalizer_all_dropped_emits_empty_string():
    y = _norm(np.asarray(["monday", "monday"], dtype=object),
              stopwords=["monday"])
    assert y.shape == (1,) and y.tolist() == [""]


def test_stringnormalizer_2d_shape_preserved():
    x = _DAYS.reshape(1, -1)
    y = _norm(x, stopwords=["monday"], case_change_action="UPPER")
    assert y.shape == (1, 3)
    assert y.tolist() == [["TUESDAY", "WEDNESDAY", "THURSDAY"]]
    y = _norm(np.asarray([["monday"]], dtype=object), stopwords=["monday"])
    assert y.shape == (1, 1) and y.tolist() == [[""]]


def test_stringnormalizer_no_attrs_is_identity():
    y = _norm(_DAYS)
    assert y.tolist() == _DAYS.tolist()


# ---------------------------------------------------------------------------
# codec: string tensors
# ---------------------------------------------------------------------------

def test_string_tensor_roundtrip():
    arr = np.asarray([["a", "κόσμε"], ["", "bird song"]], dtype=object)
    t = P.TensorProto.from_numpy(arr, name="s")
    dec = P.decode_tensor(memoryview(P.encode_tensor(t)), 0,
                          len(P.encode_tensor(t)))
    out = dec.to_numpy()
    assert out.shape == (2, 2) and out.tolist() == arr.tolist()
    assert dec.name == "s" and dec.data_type == P.DataType.STRING


def test_string_tensor_payload_length_validated():
    t = P.TensorProto(name="s", data_type=P.DataType.STRING, dims=[3],
                      string_data=[b"a", b"b"])
    with pytest.raises(ValueError, match="string payload"):
        t.to_numpy()


def test_string_initializer_flows_as_const():
    # A string initializer feeds StringNormalizer; the graph has a dummy
    # numeric input so the engine sees a normal signature.
    node = P.make_node("StringNormalizer", ["words"], ["y"],
                       case_change_action="UPPER")
    (y,) = _run(
        [node, P.make_node("Identity", ["x"], ["z"])],
        {"x": np.zeros(1, np.float32)},
        initializers={"words": _DAYS},
        outputs=("y", "z"),
    )[:1]
    assert y.tolist() == ["MONDAY", "TUESDAY", "WEDNESDAY", "THURSDAY"]


# ---------------------------------------------------------------------------
# opset-20 string ops
# ---------------------------------------------------------------------------

def test_string_concat_broadcast():
    a = np.asarray([["ab", "cd"]], dtype=object)
    b = np.asarray([["X"], ["Y"]], dtype=object)
    (y,) = _run([P.make_node("StringConcat", ["a", "b"], ["y"])],
                {"a": a, "b": b})
    assert y.tolist() == [["abX", "cdX"], ["abY", "cdY"]]


def test_string_split_delimiter_and_counts():
    x = np.asarray(["a,b,c", "d", "", "e,f"], dtype=object)
    node = P.make_node("StringSplit", ["x"], ["parts", "counts"],
                       delimiter=",")
    parts, counts = _run([node], {"x": x}, outputs=("parts", "counts"))
    assert parts.shape == (4, 3)
    assert parts.tolist() == [
        ["a", "b", "c"], ["d", "", ""], ["", "", ""], ["e", "f", ""]
    ]
    # "" splits to one empty substring when a delimiter is given (str.split
    # semantics per spec); counts reflect real substrings.
    assert counts.tolist() == [3, 1, 1, 2]
    assert counts.dtype == np.int64


def test_string_split_whitespace_default():
    x = np.asarray(["  hello   world ", "one", "   "], dtype=object)
    node = P.make_node("StringSplit", ["x"], ["parts", "counts"])
    parts, counts = _run([node], {"x": x}, outputs=("parts", "counts"))
    assert parts.tolist() == [["hello", "world"], ["one", ""], ["", ""]]
    assert counts.tolist() == [2, 1, 0]


def test_string_split_maxsplit():
    x = np.asarray(["a,b,c,d"], dtype=object)
    node = P.make_node("StringSplit", ["x"], ["parts", "counts"],
                       delimiter=",", maxsplit=1)
    parts, counts = _run([node], {"x": x}, outputs=("parts", "counts"))
    assert parts.tolist() == [["a", "b,c,d"]]
    assert counts.tolist() == [2]


def test_regex_full_match():
    x = np.asarray([["www.google.com", "www.facebook.com"],
                    ["www.bbc.co.uk", "strings!"]], dtype=object)
    node = P.make_node("RegexFullMatch", ["x"], ["y"],
                       pattern=r"www\.[\w.-]+\.\bcom\b")
    (y,) = _run([node], {"x": x})
    assert y.dtype == np.bool_
    assert y.tolist() == [[True, True], [False, False]]
