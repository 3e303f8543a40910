"""ImageDecoder (ai.onnx opset 20) — host-side image codec op.

Correctness strategy: lossless formats (PNG/BMP/PPM) must round-trip
EXACTLY back to the source pixel array — the oracle is the original
array, not any decoder, so a conformant decode is provable without an
independent codec. JPEG (lossy) is checked against the source within a
quality-95 tolerance plus exact shape/dtype, and a DC-only sanity bound.
"""

import io

import numpy as np
import pytest

from PIL import Image

from birdnet_tpu.compiler import import_onnx, make_forward
from birdnet_tpu.onnx import proto as P


def _encode(arr, fmt, **save_kwargs):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format=fmt, **save_kwargs)
    return np.frombuffer(buf.getvalue(), dtype=np.uint8)


def _run_decoder(stream, pixel_format=None):
    attrs = {} if pixel_format is None else {"pixel_format": pixel_format}
    node = P.make_node("ImageDecoder", ["x"], ["y"], **attrs)
    graph = P.GraphProto(
        name="g", node=[node],
        input=[P.make_value_info("x", P.DataType.UINT8, [len(stream)])],
        output=[P.make_value_info("y", P.DataType.UINT8, [])],
    )
    model = P.ModelProto(
        ir_version=9, producer_name="t", producer_version="0", graph=graph,
        opset_import=[P.OperatorSetId(domain="", version=20)],
    )
    imported = import_onnx(model, optimize=False)
    (out,) = make_forward(imported)(imported.params, stream)
    return np.asarray(out)


def _test_image(h=24, w=32, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("fmt", ["PNG", "BMP", "PPM"])
def test_lossless_roundtrip_exact(fmt):
    src = _test_image()
    out = _run_decoder(_encode(src, fmt))
    assert out.dtype == np.uint8 and out.shape == src.shape
    np.testing.assert_array_equal(out, src)


def test_png_palette_and_grayscale_sources():
    src = _test_image(16, 16, seed=1)
    pal = Image.fromarray(src).quantize(colors=16)  # palette PNG
    buf = io.BytesIO()
    pal.save(buf, format="PNG")
    stream = np.frombuffer(buf.getvalue(), np.uint8)
    out = _run_decoder(stream)
    np.testing.assert_array_equal(out, np.asarray(pal.convert("RGB")))

    gray = np.asarray(_test_image(16, 16, seed=2)[..., 0])
    out = _run_decoder(_encode(gray, "PNG"))
    # RGB requested from a grayscale source: channels replicate
    assert out.shape == (16, 16, 3)
    for c in range(3):
        np.testing.assert_array_equal(out[..., c], gray)


def test_jpeg_decode_close_to_source():
    # smooth gradient compresses near-losslessly at quality 95
    y, x = np.mgrid[0:32, 0:48]
    src = np.stack([(y * 4) % 256, (x * 3) % 256,
                    ((y + x) * 2) % 256], axis=-1).astype(np.uint8)
    out = _run_decoder(_encode(src, "JPEG", quality=95))
    assert out.shape == src.shape and out.dtype == np.uint8
    assert np.mean(np.abs(out.astype(int) - src.astype(int))) < 6.0


def test_jpeg_solid_color_dc_only():
    """A solid-color JPEG is DC-only: every conformant decoder recovers
    the color within quantization error."""
    src = np.full((16, 16, 3), (200, 64, 32), dtype=np.uint8)
    out = _run_decoder(_encode(src, "JPEG", quality=95))
    assert np.max(np.abs(out.astype(int) - src.astype(int))) <= 4


def test_bgr_pixel_format():
    src = _test_image(8, 8, seed=3)
    out = _run_decoder(_encode(src, "PNG"), pixel_format="BGR")
    np.testing.assert_array_equal(out, src[..., ::-1])


def test_grayscale_pixel_format_itu601():
    src = _test_image(8, 8, seed=4)
    out = _run_decoder(_encode(src, "PNG"), pixel_format="Grayscale")
    assert out.shape == (8, 8, 1)
    luma = (299 * src[..., 0].astype(np.int64)
            + 587 * src[..., 1].astype(np.int64)
            + 114 * src[..., 2].astype(np.int64)) / 1000.0
    assert np.max(np.abs(out[..., 0].astype(float) - luma)) <= 1.0


def test_undecodable_stream_typed_error():
    junk = np.arange(64, dtype=np.uint8)
    with pytest.raises(Exception, match="undecodable image stream"):
        _run_decoder(junk)


def test_invalid_pixel_format_rejected():
    src = _test_image(8, 8)
    with pytest.raises(Exception, match="pixel_format"):
        _run_decoder(_encode(src, "PNG"), pixel_format="CMYK")


def test_traced_stream_rejected():
    """The stream is host-only: a graph feeding it from a runtime input
    through a traced op must raise the documented typed error."""
    import jax

    src = _test_image(8, 8)
    stream = _encode(src, "PNG")
    node = P.make_node("ImageDecoder", ["x"], ["y"])
    graph = P.GraphProto(
        name="g", node=[node],
        input=[P.make_value_info("x", P.DataType.UINT8, [len(stream)])],
        output=[P.make_value_info("y", P.DataType.UINT8, [])],
    )
    model = P.ModelProto(
        ir_version=9, producer_name="t", producer_version="0", graph=graph,
        opset_import=[P.OperatorSetId(domain="", version=20)],
    )
    imported = import_onnx(model, optimize=False)
    with pytest.raises(Exception, match="compile-time-constant"):
        jax.jit(make_forward(imported))(imported.params, stream)
