"""Full-architecture TF-dialect fixtures adjudicated by REAL TensorFlow.

tests/test_external_full_models.py proved the *bytes* are external (the
independent wire-writer) and tests/test_tf_signal_oracle.py proved the
per-op signal conventions match ``tf.signal``. This file closes the loop
at the whole-model level: the same TF-export-dialect model files emitted
by ``tests/_tf_wire.py`` are re-evaluated end-to-end by genuine
TensorFlow kernels (``tf.signal.stft`` → power →
``linear_to_mel_weight_matrix`` → ``tf.nn.conv2d(padding='SAME')`` →
``tf.nn.batch_normalization`` → ``tf.nn.max_pool2d`` → swish → dense),
and the engine must match TF — not our own numpy/torch transcription.
This is the strongest achievable stand-in for running the official
TF-exported weight files (absent from this environment; reference strips
them too, /root/reference/.MISSING_LARGE_BLOBS:1). Reference analog:
ort consuming the real graphs at src/classifier.rs:348-350.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402

from _tf_dialect_models import FLEN, build_tf_dialect_model  # noqa: E402
from birdnet_tpu.compiler.importer import import_onnx, make_forward  # noqa: E402


def _tf_forward(weights, meta, x):
    """Evaluate the TF-dialect architecture with genuine TF kernels.

    Mirrors the graph emitted by build_tf_dialect_model node-for-node,
    but every op is TensorFlow's own (the producer semantics the real
    exported files encode).
    """
    m = meta
    x = tf.constant(x, tf.float32)

    spec = tf.signal.stft(
        x, frame_length=FLEN, frame_step=m["hop"], fft_length=FLEN,
        window_fn=tf.signal.hann_window, pad_end=False)
    power = tf.math.real(spec * tf.math.conj(spec))
    mel = tf.signal.linear_to_mel_weight_matrix(
        num_mel_bins=m["n_mels"], num_spectrogram_bins=FLEN // 2 + 1,
        sample_rate=m["sr"], lower_edge_hertz=m["fmin"],
        upper_edge_hertz=m["fmax"])
    logmel = tf.math.log(tf.matmul(power, mel) + 1e-6)

    img = logmel[..., None]                       # NHWC [N, T, M, 1]
    # ONNX [cout, cin, kh, kw] -> TF [kh, kw, cin, cout]
    k1 = tf.constant(np.transpose(weights["W1"], (2, 3, 1, 0)))
    k2 = tf.constant(np.transpose(weights["W2"], (2, 3, 1, 0)))
    h = tf.nn.conv2d(img, k1, strides=2, padding="SAME") + weights["B1"]
    h = tf.nn.relu(h)
    h = tf.nn.conv2d(h, k2, strides=2, padding="SAME")
    h = tf.nn.batch_normalization(
        h, mean=weights["bn_mean"], variance=weights["bn_var"],
        offset=weights["bn_bias"], scale=weights["bn_scale"],
        variance_epsilon=1e-3)
    h = tf.nn.max_pool2d(h, ksize=2, strides=2, padding="SAME")
    act = h * tf.sigmoid(h)                       # swish, NHWC
    pooled = tf.reduce_mean(act, axis=(1, 2))
    flat = tf.reshape(act, [tf.shape(act)[0], -1])
    logits = tf.matmul(flat, weights["Wl"]) + weights["bl"]

    if m["family"] == "v24":
        return [logits.numpy()]
    emb = (tf.matmul(pooled, weights["We"]) + weights["be"]).numpy()
    if m["family"] == "v30":
        return [emb, logits.numpy()]
    spatial = tf.matmul(act, weights["Wse"]).numpy()
    return [emb, spatial, logmel.numpy(), logits.numpy()]


@pytest.mark.parametrize("family,n_out", [("v24", 1), ("v30", 2),
                                          ("perch", 4)])
def test_engine_matches_real_tf(family, n_out, rng):
    model_bytes, oracle = build_tf_dialect_model(family, num_species=12,
                                                 seed=11)
    model = import_onnx(model_bytes)
    fwd = jax.jit(make_forward(model, precision="fp32"))

    x = (rng.standard_normal((2, oracle.meta["sample_count"]))
         * 0.25).astype(np.float32)
    got = fwd(model.params, x)
    ref = _tf_forward(oracle.w, oracle.meta, x)

    assert len(got) == len(ref) == n_out
    for g, r in zip(got, ref):
        g = np.asarray(g)
        assert g.shape == r.shape
        # frontend is an fp32 DFT over 1024 samples + log; backbone fp32.
        np.testing.assert_allclose(g, r, atol=2e-3, rtol=1e-3)

    # Cross-check: the repo's numpy/torch transcription oracle must also
    # agree with real TF (validates the oracle the other fixture tests
    # lean on).
    for o, r in zip(oracle.forward(x), ref):
        np.testing.assert_allclose(o, r, atol=2e-3, rtol=1e-3)
