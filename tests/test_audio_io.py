"""WAV I/O + chunker tests (reference: birdnet-analyze.rs:653-743 semantics)."""

import struct

import numpy as np
import pytest

import birdnet_tpu.errors as E
from birdnet_tpu.utils.audio_io import (
    chunk_audio,
    native_available,
    read_wav,
    write_wav,
)


@pytest.fixture
def sine_wav(tmp_path):
    sig = (0.5 * np.sin(2 * np.pi * 440 * np.arange(48_000) / 48_000)).astype(np.float32)
    p = tmp_path / "sine.wav"
    write_wav(p, sig, 48_000)
    return p, sig


def test_roundtrip(sine_wav):
    p, sig = sine_wav
    samples, rate, dur = read_wav(p)
    assert rate == 48_000
    assert dur == pytest.approx(1.0)
    assert samples.dtype == np.float32
    np.testing.assert_allclose(samples, sig, atol=1.0 / 32768)


def test_native_and_python_agree(sine_wav, monkeypatch):
    p, _ = sine_wav
    if not native_available():
        pytest.skip("native wavio not built")
    native_samples, rate, _ = read_wav(p)
    import birdnet_tpu.utils.audio_io as aio

    monkeypatch.setattr(aio, "_native", None)
    py_samples, py_rate, _ = read_wav(p)
    assert rate == py_rate
    np.testing.assert_array_equal(native_samples, py_samples)


def test_missing_file():
    with pytest.raises(E.AudioReadError):
        read_wav("/nonexistent/audio.wav")


def test_not_a_wav(tmp_path):
    p = tmp_path / "junk.wav"
    p.write_bytes(b"this is not audio")
    with pytest.raises(E.AudioReadError):
        read_wav(p)


def _write_raw_wav(path, fmt, channels, bits, rate=48_000, frames=100):
    bytes_per = channels * bits // 8
    data = b"\x00" * (frames * bytes_per)
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, fmt, channels, rate,
                                      rate * bytes_per, bytes_per, bits))
        f.write(b"data" + struct.pack("<I", len(data)) + data)


def test_stereo_rejected(tmp_path):
    p = tmp_path / "stereo.wav"
    _write_raw_wav(p, fmt=1, channels=2, bits=16)
    with pytest.raises(E.AudioFormatError) as ei:
        read_wav(p)
    assert "mono" in str(ei.value)


def test_float_format_rejected(tmp_path):
    p = tmp_path / "float.wav"
    _write_raw_wav(p, fmt=3, channels=1, bits=32)
    with pytest.raises(E.AudioFormatError) as ei:
        read_wav(p)
    assert "PCM" in str(ei.value)


def test_8bit_rejected(tmp_path):
    p = tmp_path / "8bit.wav"
    _write_raw_wav(p, fmt=1, channels=1, bits=8)
    with pytest.raises(E.AudioFormatError):
        read_wav(p)


def test_truncated_data_chunk(tmp_path):
    """A data chunk declaring more bytes than the file holds is corrupt
    (native wavio WAV_ERR_TRUNCATED); both decoders raise AudioReadError,
    never a raw numpy ValueError."""
    from birdnet_tpu.utils.audio_io import _read_wav_python

    p = tmp_path / "trunc.wav"
    _write_raw_wav(p, fmt=1, channels=1, bits=16, frames=100)
    whole = p.read_bytes()
    p.write_bytes(whole[:-31])  # drop 31 payload bytes (odd remainder too)
    with pytest.raises(E.AudioReadError) as ei:
        read_wav(p)
    assert "shorter than declared" in str(ei.value)
    with pytest.raises(E.AudioReadError):
        _read_wav_python(str(p))


def test_odd_data_size_floors_to_whole_samples(tmp_path):
    """An odd-but-complete data size floors to whole samples (native:
    n_samples = size / frame_bytes) in both decoders."""
    from birdnet_tpu.utils.audio_io import _read_wav_python

    p = tmp_path / "odd.wav"
    frames = 100
    data = b"\x00" * (frames * 2 + 1)  # odd payload, fully present
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 48_000,
                                      48_000 * 2, 2, 16))
        f.write(b"data" + struct.pack("<I", len(data)) + data)
    samples, rate, _ = read_wav(p)
    assert samples.shape[0] == frames
    py_samples, _ = _read_wav_python(str(p))
    assert py_samples.shape[0] == frames


# --- chunker (matches reference loop semantics exactly) ----------------------


def _reference_chunk(samples, seg, overlap, rate):
    ov = int(overlap * rate)
    step = seg - ov
    out = []
    pos = 0
    while pos < len(samples):
        end = min(pos + seg, len(samples))
        s = np.zeros(seg, np.float32)
        s[: end - pos] = samples[pos:end]
        out.append((pos / rate, s))
        pos += step
    return out


@pytest.mark.parametrize(
    "n,overlap",
    [
        (192_000, 0.0),
        (192_000, 1.5),
        (144_000, 0.0),
        (144_001, 0.0),
        (100, 0.0),
        (300_000, 2.0),
        (300_000, 2.9),
    ],
)
def test_chunker_matches_reference(rng, n, overlap):
    x = rng.normal(size=n).astype(np.float32)
    segs, times = chunk_audio(x, 144_000, overlap, 48_000)
    ref = _reference_chunk(x, 144_000, overlap, 48_000)
    assert segs.shape[0] == len(ref)
    for i, (t, s) in enumerate(ref):
        assert times[i] == pytest.approx(t)
        np.testing.assert_array_equal(segs[i], s)


def test_chunker_empty():
    segs, times = chunk_audio(np.zeros(0, np.float32), 144_000, 0.0, 48_000)
    assert segs.shape == (0, 144_000)


def test_chunker_overlap_too_large():
    with pytest.raises(E.AudioFormatError):
        chunk_audio(np.zeros(100, np.float32), 144_000, 3.0, 48_000)


def test_chunker_negative_overlap_rejected():
    # step > sample_count would make the padded buffer shorter than the
    # input and crash with a raw numpy broadcast error.
    with pytest.raises(E.AudioFormatError, match="negative"):
        chunk_audio(np.zeros(28_800_000, np.float32), 144_000, -5.0, 48_000)


def test_native_rejects_overstated_data_size(tmp_path):
    # A header declaring ~4 GB of data in a tiny file must fail cleanly
    # BEFORE the caller allocates n_samples (memory-exhaustion guard).
    p = tmp_path / "huge_decl.wav"
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + 8) + b"WAVE")
        f.write(b"fmt " + struct.pack("<I", 16))
        f.write(struct.pack("<HHIIHH", 1, 1, 48_000, 96_000, 2, 16))
        f.write(b"data" + struct.pack("<I", 0xFFFFFFF0))
        f.write(b"\0" * 8)  # only 8 real bytes
    import birdnet_tpu.utils.audio_io as aio

    if aio._native is not None:  # native path
        with pytest.raises(E.AudioReadError):
            read_wav(p)
    with pytest.raises(E.AudioReadError):  # python fallback agrees
        import unittest.mock as mock

        with mock.patch.object(aio, "_native", None):
            read_wav(p)


def test_fallback_truncated_fmt_chunk_clean_error(tmp_path, monkeypatch):
    # Valid RIFF/WAVE header, fmt chunk declares 16 bytes but the file is
    # cut before the body: must raise AudioReadError, not struct.error.
    p = tmp_path / "trunc.wav"
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36) + b"WAVE")
        f.write(b"fmt " + struct.pack("<I", 16) + b"\x01\x00")  # 2 of 16 bytes
    import birdnet_tpu.utils.audio_io as aio

    monkeypatch.setattr(aio, "_native", None)
    with pytest.raises(E.AudioReadError):
        read_wav(p)


def _write_extensible_wav(path, samples_i16, rate):
    """WAVE_FORMAT_EXTENSIBLE container with a PCM SubFormat GUID."""
    data = samples_i16.astype("<i2").tobytes()
    # fmt body: standard 16 + cbSize(2)+validBits(2)+channelMask(4)+GUID(16)
    guid = struct.pack("<H", 1) + b"\x00\x00" + bytes.fromhex(
        "000010008000"  # remainder of KSDATAFORMAT_SUBTYPE_PCM
    ) + bytes.fromhex("00aa00389b71")
    fmt_body = struct.pack("<HHIIHH", 0xFFFE, 1, rate, rate * 2, 2, 16)
    fmt_body += struct.pack("<HHI", 22, 16, 0x4) + guid
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt_body) + 8 + len(data)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body)
        f.write(b"data" + struct.pack("<I", len(data)) + data)


def test_wave_format_extensible_pcm(tmp_path, monkeypatch):
    sig = (np.sin(2 * np.pi * 440 * np.arange(4800) / 48_000) * 10000).astype(np.int16)
    p = tmp_path / "ext.wav"
    _write_extensible_wav(p, sig, 48_000)
    # native path
    samples, rate, _ = read_wav(p, dtype="int16")
    assert rate == 48_000
    np.testing.assert_array_equal(samples, sig)
    # python fallback path
    import birdnet_tpu.utils.audio_io as aio

    monkeypatch.setattr(aio, "_native", None)
    samples2, rate2, _ = read_wav(p)
    assert rate2 == 48_000
    np.testing.assert_allclose(samples2, sig.astype(np.float32) / 32768.0)


def test_downmix_mono_keeps_int16_fast_path(sine_wav):
    """--downmix on an already-mono file takes the raw int16 path."""
    p, sig = sine_wav
    samples, rate, _ = read_wav(p, dtype="int16", downmix=True)
    assert samples.dtype == np.int16
    np.testing.assert_allclose(
        samples.astype(np.float32) / 32768.0, sig, atol=1.0 / 32768
    )


def test_downmix_stereo_averages(tmp_path):
    n = 1000
    left = (np.ones(n) * 10000).astype(np.int16)
    right = (np.ones(n) * -10000).astype(np.int16)
    inter = np.empty(n * 2, dtype=np.int16)
    inter[0::2] = left
    inter[1::2] = right
    p = tmp_path / "st.wav"
    with open(p, "wb") as f:
        data = inter.astype("<i2").tobytes()
        f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 48_000, 192_000, 4, 16))
        f.write(b"data" + struct.pack("<I", len(data)) + data)
    samples, rate, _ = read_wav(p, downmix=True)
    assert samples.dtype == np.float32
    np.testing.assert_allclose(samples, np.zeros(n), atol=1e-6)  # L+R cancel
