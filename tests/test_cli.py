"""CLI tests (reference CLI behavior: src/bin/birdnet-analyze.rs)."""

import re

import numpy as np
import pytest

from birdnet_tpu.cli import (
    build_parser,
    format_duration,
    format_time,
    main,
    parse_model_type,
)
from birdnet_tpu.errors import ModelDetectionError
from birdnet_tpu.types import ModelType
from birdnet_tpu.utils.audio_io import write_wav


def test_format_time():
    assert format_time(0.0) == "00:00.0"
    assert format_time(3.0) == "00:03.0"
    assert format_time(63.5) == "01:03.5"
    assert format_time(600.0) == "10:00.0"


def test_format_duration():
    assert format_duration(45.0) == "45s"
    assert format_duration(203.0) == "3m 23s"
    assert format_duration(4530.0) == "1h 15m 30s"


def test_parse_model_type():
    assert parse_model_type(None) is None
    assert parse_model_type("v24") is ModelType.BIRDNET_V24
    assert parse_model_type("v30") is ModelType.BIRDNET_V30
    assert parse_model_type("perch") is ModelType.PERCH_V2
    with pytest.raises(ModelDetectionError):
        parse_model_type("bogus")


def test_parser_defaults():
    args = build_parser().parse_args(["in.wav", "-m", "m.onnx", "-l", "l.txt"])
    assert args.overlap == 0.0
    assert args.top_k == 3
    assert args.min_confidence == 0.1
    assert args.timeout == 1.0
    assert args.provider == "auto"
    assert args.batch_size is None


@pytest.fixture(scope="module")
def cli_fixtures(tmp_path_factory):
    from birdnet_tpu.models import birdnet_v24

    d = tmp_path_factory.mktemp("cli")
    model = d / "v24_tiny.onnx"
    birdnet_v24.save_tiny(model, num_species=10)
    labels = d / "labels.txt"
    labels.write_text("\n".join(f"species_{i}" for i in range(10)), encoding="utf-8")
    wav = d / "audio.wav"
    rng = np.random.default_rng(0)
    sig = 0.3 * np.sin(2 * np.pi * 1000 * np.arange(48_000 * 7) / 48_000)
    sig = (sig + 0.05 * rng.normal(size=sig.shape)).astype(np.float32)
    write_wav(wav, sig, 48_000)
    return str(wav), str(model), str(labels)


def test_cli_end_to_end(cli_fixtures, capsys):
    wav, model, labels = cli_fixtures
    rc = main([wav, "-m", model, "-l", labels, "--provider", "cpu",
               "--min-confidence", "0.0", "-t", "0"])
    out = capsys.readouterr().out
    assert rc == 0
    # CPU default is 8; under BIRDNET_TEST_TPU the accelerator default (32)
    # applies because the platform can't be re-pinned after backend init.
    assert re.search(r"Batch size: (8|32)", out)
    assert "Model: BirdNET v2.4 (3.0s segments, 0.0s overlap)" in out
    # 7s → 3 segments (last zero-padded)
    assert re.search(r"3 segments of 7s audio analyzed in [\d.]+s "
                     r"\([\d.]+ segments/s, [\d.]+x realtime\)", out)
    # per-segment detection lines in MM:SS.s format
    assert re.search(r"^00:00\.0  species_\d+ \(\d+\.\d%\)", out, re.M)
    assert "00:06.0" in out


def test_cli_overlap(cli_fixtures, capsys):
    wav, model, labels = cli_fixtures
    rc = main([wav, "-m", model, "-l", labels, "--provider", "cpu",
               "--min-confidence", "0.0", "-t", "0", "-o", "1.5"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "1.5s overlap" in out
    assert "5 segments" in out  # ceil(7*48000 / (1.5*48000))


def test_cli_overlap_too_large(cli_fixtures, capsys):
    wav, model, labels = cli_fixtures
    rc = main([wav, "-m", model, "-l", labels, "--provider", "cpu", "-o", "3.0"])
    err = capsys.readouterr().err
    assert rc == 1
    assert "overlap (3.0s) must be less than segment duration (3.0s)" in err


def test_cli_negative_overlap_clean_error(cli_fixtures, capsys):
    wav, model, labels = cli_fixtures
    rc = main([wav, "-m", model, "-l", labels, "--provider", "cpu", "-o", "-5.0"])
    err = capsys.readouterr().err
    assert rc == 1
    assert "must not be negative" in err


def test_cli_malformed_date_clean_error(cli_fixtures, tmp_path, capsys):
    wav, model, labels = cli_fixtures
    from birdnet_tpu.models import meta

    mm = tmp_path / "meta.onnx"
    meta.save_tiny(mm, num_species=10)
    rc = main([
        wav, "-m", model, "-l", labels, "--provider", "cpu",
        "--meta-model", str(mm), "--lat", "50", "--lon", "8",
        "--date", "2026-08-17",
    ])
    err = capsys.readouterr().err
    assert rc == 1
    assert "MM-DD" in err  # clean CLI error, not a traceback


def test_cli_wrong_sample_rate(cli_fixtures, tmp_path, capsys):
    _, model, labels = cli_fixtures
    wav = tmp_path / "32k.wav"
    write_wav(wav, np.zeros(32_000, np.float32), 32_000)
    rc = main([str(wav), "-m", model, "-l", labels, "--provider", "cpu"])
    err = capsys.readouterr().err
    assert rc == 1
    assert "model expects 48000 Hz audio, WAV is 32000 Hz" in err


def test_cli_min_confidence_filters_all(cli_fixtures, capsys):
    wav, model, labels = cli_fixtures
    rc = main([wav, "-m", model, "-l", labels, "--provider", "cpu",
               "--min-confidence", "0.999", "-t", "0"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "00:00.0" not in out  # all detections filtered
    assert "3 segments" in out


def test_cli_list_providers(capsys):
    rc = main(["--list-providers"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Available devices:" in out
    assert "CPU" in out


def test_cli_missing_args(capsys):
    rc = main([])
    assert rc == 2
    assert "required" in capsys.readouterr().err


def test_cli_unknown_provider(cli_fixtures, capsys):
    wav, model, labels = cli_fixtures
    rc = main([wav, "-m", model, "-l", labels, "--provider", "quantum"])
    assert rc == 1
    assert "unknown provider" in capsys.readouterr().err


def test_cli_model_type_override_mismatch(cli_fixtures, capsys):
    wav, model, labels = cli_fixtures
    rc = main([wav, "-m", model, "-l", labels, "--provider", "cpu",
               "--model-type", "v30"])
    assert rc == 1
    assert "expects 160000 samples" in capsys.readouterr().err


def test_cli_range_filter(cli_fixtures, tmp_path, capsys):
    from birdnet_tpu.models import meta

    wav, model, labels = cli_fixtures
    meta_path = tmp_path / "meta.onnx"
    meta.save_tiny(meta_path, num_species=10)
    rc = main([wav, "-m", model, "-l", labels, "--provider", "cpu",
               "--min-confidence", "0.0", "-t", "0",
               "--meta-model", str(meta_path), "--lat", "42.5", "--lon", "-76.4",
               "--date", "06-15", "--rerank"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "3 segments" in out


def test_cli_mesh_flag(cli_fixtures, capsys):
    """--mesh runs the whole pipeline over the virtual device mesh."""
    wav, model, labels = cli_fixtures
    rc = main([wav, "-m", model, "-l", labels, "--provider", "cpu",
               "--mesh", "--min-confidence", "0.0", "-t", "0"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "3 segments of 7s audio" in out


def test_cli_csv_output(cli_fixtures, tmp_path, capsys):
    wav, model, labels = cli_fixtures
    csv_path = tmp_path / "detections.csv"
    rc = main([wav, "-m", model, "-l", labels, "--provider", "cpu",
               "--min-confidence", "0.0", "-t", "0", "--csv", str(csv_path)])
    assert rc == 0
    lines = csv_path.read_text().strip().splitlines()
    assert lines[0] == "start_s,end_s,species,confidence"
    assert len(lines) == 1 + 3 * 3  # 3 segments × top 3
    first = lines[1].split(",")
    assert first[0] == "0.0" and first[1] == "3.0"
    assert first[2].startswith("species_")
    assert 0.0 <= float(first[3]) <= 1.0


def test_cli_raven_export(cli_fixtures, tmp_path, capsys):
    wav, model, labels = cli_fixtures
    out_path = tmp_path / "sel.txt"
    rc = main([wav, "-m", model, "-l", labels, "--provider", "cpu",
               "--min-confidence", "0.0", "-t", "0", "-k", "2",
               "--raven", str(out_path)])
    assert rc == 0
    lines = out_path.read_text().splitlines()
    from birdnet_tpu.utils.export import RAVEN_HEADER

    assert lines[0] == RAVEN_HEADER
    assert len(lines) == 1 + 3 * 2  # 3 segments × top-2
    first = lines[1].split("\t")
    assert first[0] == "1"  # selection number
    assert float(first[3]) == 0.0  # begin time
    assert float(first[4]) == 3.0  # end time
    assert first[10] == wav  # begin path
    assert 0.0 <= float(first[9]) <= 1.0  # confidence
    # final segment end time clamps to the 7 s recording
    assert float(lines[-1].split("\t")[4]) == 7.0


def test_raven_multifile_cumulative_times(tmp_path):
    """Combined Raven tables use CUMULATIVE Begin/End Times across files;
    File Offset stays within-file."""
    from birdnet_tpu.types import Prediction
    from birdnet_tpu.utils.export import RavenWriter

    w = RavenWriter(tmp_path / "sel.txt", 48_000, 3.0)
    pred = [Prediction(species="Sci_Com", confidence=0.9, index=0)]
    w.add("a.wav", 0.0, pred, 9.0)
    w.add("a.wav", 3.0, pred, 9.0)
    w.add("b.wav", 0.0, pred, 6.0)  # second file: stream position 9.0
    w.add("b.wav", 3.0, pred, 6.0)
    w.write()
    rows = [l.split("\t") for l in (tmp_path / "sel.txt").read_text().splitlines()[1:]]
    begins = [float(r[3]) for r in rows]
    offsets = [float(r[11]) for r in rows]
    assert begins == [0.0, 3.0, 9.0, 12.0]
    assert offsets == [0.0, 3.0, 0.0, 3.0]
    assert [r[10] for r in rows] == ["a.wav", "a.wav", "b.wav", "b.wav"]


def test_cli_audacity_export(cli_fixtures, tmp_path, capsys):
    wav, model, labels = cli_fixtures
    out_path = tmp_path / "labels.txt"
    rc = main([wav, "-m", model, "-l", labels, "--provider", "cpu",
               "--min-confidence", "0.0", "-t", "0", "-k", "1",
               "--audacity", str(out_path)])
    assert rc == 0
    lines = out_path.read_text().splitlines()
    assert len(lines) == 3
    start, end, label = lines[0].split("\t")
    assert float(start) == 0.0 and float(end) == 3.0
    # BirdNET label convention Scientific_Common → common half + confidence
    # (fixture labels "species_N" split to common name "N")
    common, conf = label.rsplit(" ", 1)
    assert common in {str(i) for i in range(10)}
    assert 0.0 <= float(conf) <= 1.0


def test_cli_audacity_multi_file_rejected(cli_fixtures, tmp_path, capsys):
    wav, model, labels = cli_fixtures
    wav2 = tmp_path / "c.wav"
    write_wav(wav2, np.zeros(48_000 * 3, np.float32), 48_000)
    rc = main([wav, str(wav2), "-m", model, "-l", labels, "--provider",
               "cpu", "--audacity", str(tmp_path / "x.txt")])
    assert rc == 2
    assert "single input" in capsys.readouterr().err


def test_cli_species_list_filters_output(cli_fixtures, tmp_path, capsys):
    wav, model, labels = cli_fixtures
    slist = tmp_path / "slist.txt"
    slist.write_text("species_2\nspecies_5\n", encoding="utf-8")
    rc = main([wav, "-m", model, "-l", labels, "--provider", "cpu",
               "--min-confidence", "0.0", "-t", "0", "-k", "10",
               "--species-list", str(slist)])
    out = capsys.readouterr().out
    assert rc == 0
    emitted = {
        tok.split(" (")[0]
        for ln in out.splitlines()
        if ln.startswith("00:")
        for tok in ln.split("  ", 1)[1].split(", ")
    }
    assert emitted == {"species_2", "species_5"}


def test_cli_species_list_no_match_errors(cli_fixtures, tmp_path, capsys):
    wav, model, labels = cli_fixtures
    slist = tmp_path / "bad.txt"
    slist.write_text("Nonexistent bird\n", encoding="utf-8")
    rc = main([wav, "-m", model, "-l", labels, "--provider", "cpu",
               "--species-list", str(slist)])
    assert rc == 2
    assert "no species" in capsys.readouterr().err


def test_export_split_label():
    from birdnet_tpu.utils.export import split_label

    assert split_label("Turdus merula_Common Blackbird") == (
        "Turdus merula", "Common Blackbird",
    )
    assert split_label("nolabel") == ("nolabel", "nolabel")


def test_cli_downmix(cli_fixtures, tmp_path, capsys):
    import struct

    _, model, labels = cli_fixtures
    # stereo WAV: left = sine, right = silence
    n = 48_000 * 4
    left = (np.sin(2 * np.pi * 800 * np.arange(n) / 48_000) * 12000).astype(np.int16)
    inter = np.zeros(n * 2, dtype=np.int16)
    inter[0::2] = left
    data = inter.astype("<i2").tobytes()
    wav = tmp_path / "stereo.wav"
    with open(wav, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 48_000, 192_000, 4, 16))
        f.write(b"data" + struct.pack("<I", len(data)) + data)

    # rejected without the flag
    rc = main([str(wav), "-m", model, "-l", labels, "--provider", "cpu"])
    assert rc == 1
    assert "mono" in capsys.readouterr().err

    rc = main([str(wav), "-m", model, "-l", labels, "--provider", "cpu",
               "--downmix", "--min-confidence", "0.0", "-t", "0"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "2 segments of 4s audio" in out


def test_cli_multiple_files(cli_fixtures, tmp_path, capsys):
    """Several WAVs share one compiled model; CSV gains a file column."""
    wav, model, labels = cli_fixtures
    wav2 = tmp_path / "b.wav"
    write_wav(wav2, np.zeros(48_000 * 3, np.float32), 48_000)
    csv_path = tmp_path / "multi.csv"
    rc = main([wav, str(wav2), "-m", model, "-l", labels, "--provider", "cpu",
               "--min-confidence", "0.0", "-t", "0", "--csv", str(csv_path)])
    out = capsys.readouterr().out
    assert rc == 0
    assert out.count("Analyzing:") == 2
    assert "3 segments of 7s audio" in out
    assert "1 segments of 3s audio" in out
    lines = csv_path.read_text().strip().splitlines()
    assert lines[0] == "file,start_s,end_s,species,confidence"
    assert any(str(wav2) in ln for ln in lines[1:])


def test_cli_multi_file_prefetch_thread(cli_fixtures, tmp_path, capsys,
                                        monkeypatch):
    """Files after the first decode on the wav-prefetch background thread
    (I/O overlaps inference); output order stays sequential."""
    import threading

    import birdnet_tpu.utils.audio_io as audio_io

    wav, model, labels = cli_fixtures
    wav2 = tmp_path / "pf.wav"
    write_wav(wav2, np.zeros(48_000 * 3, np.float32), 48_000)
    threads_seen = {}
    real_read = audio_io.read_wav

    def spy(path, *a, **kw):
        threads_seen[str(path)] = threading.current_thread().name
        return real_read(path, *a, **kw)

    # cli.py imports read_wav inside run_with_args, so patching the source
    # module is picked up by each invocation.
    monkeypatch.setattr(audio_io, "read_wav", spy)
    rc = main([wav, str(wav2), "-m", model, "-l", labels, "--provider",
               "cpu", "--min-confidence", "0.0", "-t", "0"])
    out = capsys.readouterr().out
    assert rc == 0
    assert threads_seen[str(wav2)].startswith("wav-prefetch")
    # ordering: file 1's summary precedes file 2's header
    assert out.index("3 segments of 7s audio") < out.index(str(wav2))


class _FakeStdin:
    def __init__(self, data: bytes):
        import io

        self.buffer = io.BytesIO(data)


def test_cli_stdin_live_analysis(cli_fixtures, capsys, monkeypatch):
    """'-' reads raw i16 PCM from stdin; tail is zero-padded like the file
    chunker; summary reports live-audio totals."""
    import sys as _sys

    wav, model, labels = cli_fixtures
    rng = np.random.default_rng(3)
    # 2.5 segments → 3 segments with zero-padded tail
    pcm = (rng.standard_normal(int(48_000 * 7.5)) * 3000).astype("<i2")
    monkeypatch.setattr(_sys, "stdin", _FakeStdin(pcm.tobytes()))
    rc = main(["-", "-m", model, "-l", labels, "--provider", "cpu",
               "--min-confidence", "0.0", "-t", "0"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Analyzing: <stdin> (live, 48000 Hz)" in out
    assert "3 segments of live audio" in out
    # three timestamped detection lines at 3 s steps
    assert "00:00.0" in out and "00:03.0" in out and "00:06.0" in out


def test_cli_stdin_overlap_matches_chunker(cli_fixtures, capsys,
                                           monkeypatch):
    import sys as _sys

    from birdnet_tpu.utils.audio_io import chunk_audio

    wav, model, labels = cli_fixtures
    n = 48_000 * 6
    pcm = (np.random.default_rng(4).standard_normal(n) * 3000).astype("<i2")
    segs, _ = chunk_audio(
        pcm.astype(np.float32) / 32768.0, 144_000, 1.5, 48_000
    )
    monkeypatch.setattr(_sys, "stdin", _FakeStdin(pcm.tobytes()))
    rc = main(["-", "-m", model, "-l", labels, "--provider", "cpu",
               "--min-confidence", "0.0", "-t", "0", "-o", "1.5"])
    out = capsys.readouterr().out
    assert rc == 0
    assert f"{segs.shape[0]} segments of live audio" in out


def test_cli_stdin_combination_errors(cli_fixtures, capsys):
    wav, model, labels = cli_fixtures
    rc = main(["-", wav, "-m", model, "-l", labels])
    assert rc == 2
    assert "cannot be combined" in capsys.readouterr().err
    rc = main(["-", "-m", model, "-l", labels, "--resample"])
    assert rc == 2
    assert "--resample" in capsys.readouterr().err


def test_cli_multi_file_error_continues(cli_fixtures, tmp_path, capsys):
    wav, model, labels = cli_fixtures
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"not audio")
    rc = main([str(bad), wav, "-m", model, "-l", labels, "--provider", "cpu",
               "--min-confidence", "0.0", "-t", "0"])
    captured = capsys.readouterr()
    assert rc == 1  # a failure occurred…
    assert "Error analyzing" in captured.err
    assert "3 segments of 7s audio" in captured.out  # …but the good file ran


def test_cli_int8(cli_fixtures, capsys):
    """--int8 quantizes with calibration from the input recording."""
    wav, model, labels = cli_fixtures
    rc = main([wav, "-m", model, "-l", labels, "--provider", "cpu",
               "--min-confidence", "0.0", "-t", "0", "--int8"])
    out = capsys.readouterr().out
    assert rc == 0
    assert re.search(r"3 segments of 7s audio analyzed", out)
    assert re.search(r"^00:00\.0  species_\d+ \(\d+\.\d%\)", out, re.M)


def test_cli_embeddings_export(tmp_path, capsys):
    """--embeddings writes an npz with [N,E] embeddings + start times."""
    from birdnet_tpu.models import birdnet_v30

    model = tmp_path / "v30_tiny.onnx"
    birdnet_v30.save_tiny(model, num_species=10, embedding_dim=32)
    labels = tmp_path / "labels.csv"
    labels.write_text(
        "\n".join(f"sp_{i},Common {i}" for i in range(10)), encoding="utf-8"
    )
    wav = tmp_path / "a32k.wav"
    sig = (0.2 * np.sin(2 * np.pi * 800 * np.arange(32_000 * 10) / 32_000))
    write_wav(wav, sig.astype(np.float32), 32_000)
    out = tmp_path / "emb.npz"
    rc = main([str(wav), "-m", str(model), "-l", str(labels), "--provider",
               "cpu", "--min-confidence", "0.0", "-t", "0",
               "--embeddings", str(out)])
    assert rc == 0
    data = np.load(out)
    emb = data[f"{wav}/embeddings"]
    times = data[f"{wav}/times"]
    assert emb.shape == (2, 32)  # 10 s at 5 s segments
    assert times.shape == (2,)
    assert np.isfinite(emb).all()
    np.testing.assert_allclose(times, [0.0, 5.0])


def test_cli_embeddings_rejected_for_v24(cli_fixtures, capsys):
    wav, model, labels = cli_fixtures
    rc = main([wav, "-m", model, "-l", labels, "--provider", "cpu",
               "--embeddings", "/tmp/never.npz"])
    err = capsys.readouterr().err
    assert rc == 1
    assert "--embeddings requires a model with embedding outputs" in err


def test_cli_inspect(cli_fixtures, capsys):
    _, model, _ = cli_fixtures
    rc = main(["--inspect", "-m", model])
    out = capsys.readouterr().out
    assert rc == 0
    assert "detected: BirdNET v2.4 (10 species, 48000 Hz, 3.0s segments)" in out
    assert "input   input: [batch, 144000]" in out
    assert "params:" in out and "graph:" in out


def test_cli_save_checkpoint_roundtrip(cli_fixtures, tmp_path, capsys):
    wav, model, labels = cli_fixtures
    ck = tmp_path / "m.btck"
    # checkpoint-only run: no audio required
    rc = main(["-m", model, "-l", labels, "--provider", "cpu",
               "--save-checkpoint", str(ck)])
    assert rc == 0
    assert ck.exists()
    capsys.readouterr()
    # the checkpoint loads and analyzes identically
    rc = main([wav, "-m", str(ck), "-l", labels, "--provider", "cpu",
               "--min-confidence", "0.0", "-t", "0"])
    out = capsys.readouterr().out
    assert rc == 0
    assert re.search(r"3 segments of 7s audio analyzed", out)
