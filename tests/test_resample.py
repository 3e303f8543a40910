"""Device polyphase resampler tests (vs scipy.signal.resample_poly)."""

from fractions import Fraction

import numpy as np
import pytest

from birdnet_tpu.ops.resample import resample_poly

scipy_signal = pytest.importorskip("scipy.signal")


@pytest.mark.parametrize(
    "orig,tgt,n",
    [
        (32_000, 48_000, 32_000),
        (48_000, 32_000, 48_000),
        (44_100, 48_000, 44_100),
        (22_050, 48_000, 10_000),
        (48_000, 16_000, 48_017),  # non-divisible length
    ],
)
def test_matches_scipy(rng, orig, tgt, n):
    x = rng.normal(size=n).astype(np.float32)
    ours = np.asarray(resample_poly(x, orig, tgt))
    f = Fraction(tgt, orig)
    ref = scipy_signal.resample_poly(
        x.astype(np.float64), f.numerator, f.denominator
    ).astype(np.float32)
    assert len(ours) == len(ref)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_identity_rate(rng):
    x = rng.normal(size=1000).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(resample_poly(x, 48_000, 48_000)), x)


def test_preserves_tone_frequency(rng):
    """A 1 kHz tone at 32 kHz stays a 1 kHz tone at 48 kHz."""
    t32 = np.arange(32_000) / 32_000
    x = np.sin(2 * np.pi * 1000 * t32).astype(np.float32)
    y = np.asarray(resample_poly(x, 32_000, 48_000))
    t48 = np.arange(len(y)) / 48_000
    expected = np.sin(2 * np.pi * 1000 * t48).astype(np.float32)
    # ignore filter edges; 2e-3 = inherent Kaiser filter ripple (scipy's
    # own output differs from the ideal tone by the same amount)
    core = slice(2000, -2000)
    np.testing.assert_allclose(y[core], expected[core], atol=2e-3)


def test_cli_resample_flag(tmp_path, capsys):
    """A 32 kHz WAV into a 48 kHz model works with --resample."""
    from birdnet_tpu.cli import main
    from birdnet_tpu.models import birdnet_v24
    from birdnet_tpu.utils.audio_io import write_wav

    model = tmp_path / "v24.onnx"
    birdnet_v24.save_tiny(model, num_species=10)
    labels = tmp_path / "labels.txt"
    labels.write_text("\n".join(f"s{i}" for i in range(10)), encoding="utf-8")
    wav = tmp_path / "32k.wav"
    rng_l = np.random.default_rng(0)
    write_wav(wav, (0.1 * rng_l.normal(size=32_000 * 6)).astype(np.float32), 32_000)

    # without the flag: rejected
    rc = main([str(wav), "-m", str(model), "-l", str(labels), "--provider", "cpu"])
    assert rc == 1
    assert "pass --resample" in capsys.readouterr().err

    rc = main([str(wav), "-m", str(model), "-l", str(labels), "--provider", "cpu",
               "--resample", "--min-confidence", "0.0", "-t", "0"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "2 segments of 6s audio" in out  # 6 s at 48 kHz → 2 segments
