"""birdnet-analyze CLI: analyze WAV files for bird species.

Mirrors the reference CLI (reference: src/bin/birdnet-analyze.rs): same
flags, defaults (overlap 0.0, top_k 3, min_confidence 0.1, timeout 1 s,
batch 8 CPU / 32 accelerator), WAV validation, overlap validation, batch
loop with Ctrl-C cancellation, detection lines ``MM:SS.s  Species (pp.p%),
…`` and the final ``N segments of D audio analyzed in T s (X segments/s,
Y x realtime)`` summary.

Deviation: ``--provider`` defaults to ``auto`` (best accelerator, else CPU)
instead of the reference's ``cpu`` — on a TPU-native framework the
accelerator is the default path. Pass ``--provider cpu`` for host execution.
"""

from __future__ import annotations

import argparse
import signal
import sys
import time
from datetime import datetime, timezone
from typing import Optional

from .errors import (
    AudioFormatError,
    BirdnetError,
    InvalidDateError,
    ModelDetectionError,
    SpeciesListError,
)
from .types import ModelType

DEFAULT_CPU_BATCH_SIZE = 8
DEFAULT_ACCEL_BATCH_SIZE = 32

_PROVIDERS = ("auto", "tpu", "axon", "cpu", "gpu")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="birdnet-analyze",
        description="Analyze WAV files for bird species",
    )
    p.add_argument(
        "audio_file",
        nargs="*",
        help="Input WAV file(s) (16-bit mono, matching model sample rate); "
        "multiple files share one compiled model. '-' reads raw 16-bit "
        "mono PCM at the model rate from stdin and analyzes it live "
        "(e.g. arecord -f S16_LE -r 48000 -c 1 | birdnet-analyze - ...)",
    )
    p.add_argument("-m", "--model", help="Path to ONNX model file")
    p.add_argument("-l", "--labels", help="Path to labels file")
    p.add_argument("-o", "--overlap", type=float, default=0.0, help="Overlap between segments in seconds")
    p.add_argument("-k", "--top-k", type=int, default=3, help="Number of top predictions per segment")
    p.add_argument("--min-confidence", type=float, default=0.1, help="Minimum confidence threshold")
    p.add_argument("--model-type", help="Override model type detection (v24, v30, perch)")
    p.add_argument("--list-providers", action="store_true", help="List available devices and exit")
    p.add_argument(
        "--provider",
        default="auto",
        help="Device to use (auto, tpu, axon, cpu, gpu)",
    )
    p.add_argument("-b", "--batch-size", type=int, default=None, help="Batch size (defaults: 8 CPU, 32 TPU)")
    p.add_argument("-t", "--timeout", type=float, default=1.0, help="Timeout per batch in seconds (0 = no timeout; in streaming mode the budget scales to the superchunk size at the same per-segment allowance)")
    p.add_argument("--lat", type=float, default=None, help="Latitude for range filtering (requires --meta-model)")
    p.add_argument("--lon", type=float, default=None, help="Longitude for range filtering")
    p.add_argument("--date", default=None, help="Date MM-DD for range filtering (default: today)")
    p.add_argument("--meta-model", default=None, help="Path to BirdNET meta model for range filtering")
    p.add_argument("--rerank", action="store_true", help="Rerank filtered predictions by location score")
    p.add_argument(
        "--no-stream",
        action="store_true",
        help="Disable the streaming on-device pipeline (use per-batch host chunking)",
    )
    p.add_argument(
        "--precision",
        choices=["fp32", "mixed", "fast", "bf16"],
        default=None,
        help="MXU precision policy (defaults: streaming pipeline 'fast' on "
        "TPU — top-1 identical to mixed; per-batch paths 'mixed' on TPU; "
        "fp32 on CPU)",
    )
    p.add_argument(
        "--int8",
        action="store_true",
        help="Quantize the model to int8 (post-training, MXU int8 path), "
        "calibrating activation scales on the first input recording",
    )
    p.add_argument(
        "--resample",
        action="store_true",
        help="Resample the WAV to the model rate on-device (polyphase sinc) "
        "instead of rejecting rate mismatches",
    )
    p.add_argument(
        "--mesh",
        action="store_true",
        help="Run multi-chip: shard batches over all visible devices "
        "(data axis) and the classifier head (model axis)",
    )
    p.add_argument(
        "--coordinator",
        metavar="HOST:PORT",
        default=None,
        help="Multi-host mode: jax.distributed coordinator address. Each "
        "process analyzes its deterministic shard of the input files "
        "(requires --num-processes and --process-id; on TPU pods with "
        "auto-detection, omit all three)",
    )
    p.add_argument("--num-processes", type=int, default=None,
                   help="Multi-host: total number of processes")
    p.add_argument("--process-id", type=int, default=None,
                   help="Multi-host: this process's rank")
    p.add_argument(
        "--downmix",
        action="store_true",
        help="Average multichannel WAVs to mono instead of rejecting them",
    )
    p.add_argument(
        "--csv",
        metavar="FILE",
        default=None,
        help="Also write detections as CSV (start_s,end_s,species,confidence; "
        "a leading 'file' column is added when analyzing multiple files)",
    )
    p.add_argument(
        "--species-list",
        metavar="FILE",
        default=None,
        help="Restrict predictions to species listed in FILE (one per line; "
        "full 'Scientific_Common' labels or either half match). The "
        "restriction applies before top-K selection (device-side logit "
        "mask), so top-K slots go to listed species",
    )
    p.add_argument(
        "--raven",
        metavar="FILE",
        default=None,
        help="Also write detections as a Raven Pro selection table "
        "(tab-separated; multi-file runs share one table via the "
        "'Begin Path' column)",
    )
    p.add_argument(
        "--audacity",
        metavar="FILE",
        default=None,
        help="Also write detections as an Audacity label track "
        "(single input only)",
    )
    p.add_argument(
        "--embeddings",
        metavar="FILE",
        default=None,
        help="Also export per-segment embeddings to an .npz file "
        "(keys: '<path>/embeddings' [N,E] and '<path>/times' [N]; "
        "v3.0/Perch models only). Embeddings follow the engine precision: "
        "the TPU streaming default is bf16-activation 'fast' — pass "
        "--precision mixed for full-precision vectors",
    )
    p.add_argument(
        "--inspect",
        action="store_true",
        help="Load the model, print detection/shape/op/param info, and exit "
        "(no audio needed)",
    )
    p.add_argument(
        "--save-checkpoint",
        metavar="FILE.btck",
        default=None,
        help="After building (incl. import-time optimization and --int8),"
        " save the weights as a fast-loading .btck checkpoint; pass it to"
        " -m later to skip ONNX decode + optimization",
    )
    p.add_argument("-v", "--verbose", action="store_true", help="Enable verbose logging")
    p.add_argument(
        "--profile",
        metavar="DIR",
        default=None,
        help="Capture a jax.profiler trace of the analysis into DIR",
    )
    return p


def _timestamp() -> str:
    return datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%S.%fZ")


def _debug(verbose: bool, msg: str) -> None:
    if verbose:
        print(f"{_timestamp()} [DEBUG] {msg}", file=sys.stderr)


def format_time(secs: float) -> str:
    """``MM:SS.s`` (reference: birdnet-analyze.rs:751-763)."""
    total = int(secs)
    mins = total // 60
    secs_part = secs - mins * 60
    return f"{mins:02d}:{secs_part:04.1f}"


def format_duration(secs: float) -> str:
    """``45s`` / ``3m 23s`` / ``1h 15m 30s`` (reference: :765-773)."""
    total = int(secs)
    hours, mins, s = total // 3600, (total % 3600) // 60, total % 60
    if hours > 0:
        return f"{hours}h {mins}m {s}s"
    if mins > 0:
        return f"{mins}m {s}s"
    return f"{s}s"


def parse_model_type(arg: Optional[str]) -> Optional[ModelType]:
    """(reference: birdnet-analyze.rs:99-109)"""
    if arg is None:
        return None
    mapping = {
        "v24": ModelType.BIRDNET_V24,
        "v30": ModelType.BIRDNET_V30,
        "perch": ModelType.PERCH_V2,
    }
    mt = mapping.get(arg)
    if mt is None:
        raise ModelDetectionError(
            f"unknown model type '{arg}', expected: v24, v30, perch"
        )
    return mt


def list_providers_and_exit() -> int:
    """List device backends with availability, like the reference's provider
    matrix (reference: birdnet-analyze.rs:157-245)."""
    import jax

    from .runtime import available_devices

    print(f"XLA runtime: jax {jax.__version__}")
    print()
    devices = available_devices()
    present = {i.backend.as_str for i in devices}
    print("Available devices:")
    for info in devices:
        print(f"  ✓ {info} - {info.description or info.backend.category}")
    # Known backends that are not present in this process
    descriptions = {
        "TPU": "Google TPU acceleration",
        "GPU": "GPU acceleration (CUDA/ROCm via jax plugin)",
        "CPU": "Always available",
    }
    for name, desc in descriptions.items():
        if name not in present and not any(name in p for p in present):
            print(f"  ✗ {name} - {desc} (not available)")
            print(
                "    Reason: no such jax platform in this process "
                "(plugin not installed or no hardware)"
            )
    return 0


def inspect_model_and_exit(model_path: str) -> int:
    """Print model facts (detection, shapes, ops, params) and exit."""
    from collections import Counter

    from .checkpoint import import_any
    from .detection import detect_model_type

    imported = import_any(model_path)

    def fmt(shape):
        return "[" + ", ".join(
            str(d) if d is not None else "batch" for d in shape
        ) + "]"

    print(f"Model: {model_path}")
    for name, shape in zip(imported.input_names, imported.input_shapes):
        print(f"  input   {name}: {fmt(shape)}")
    for name, shape in zip(imported.output_names, imported.output_shapes):
        print(f"  output  {name}: {fmt(shape)}")
    try:
        config = detect_model_type(*imported.detection_shapes())
        print(
            f"  detected: {config.model_type.display_name} "
            f"({config.num_species} species, {config.sample_rate} Hz, "
            f"{config.segment_duration:.1f}s segments)"
        )
    except BirdnetError as e:
        print(f"  detected: none ({e})")
    print(
        f"  params: {imported.param_bytes() / (1024 * 1024):.1f} MB "
        f"({len(imported.params)} tensors), consts: {len(imported.consts)}"
    )
    if getattr(imported, "dispatch_inputs", None):
        print(
            f"  dispatch: {', '.join(imported.dispatch_inputs)} "
            f"(merged-decoder flag input(s); one specialized program "
            f"compiles per concrete value)"
        )
    hist = Counter(
        f"{n.domain}.{n.op_type}" if n.domain else n.op_type
        for n in imported.graph.node
    )
    ops = ", ".join(f"{op}×{c}" for op, c in hist.most_common())
    print(f"  graph: {len(imported.graph.node)} nodes ({ops})")
    return 0


def run_with_args(args: argparse.Namespace) -> int:
    if args.list_providers:
        return list_providers_and_exit()
    if args.inspect:
        if not args.model:
            print("error: model is required", file=sys.stderr)
            return 2
        return inspect_model_and_exit(args.model)

    required = ["model", "labels"]
    if not args.save_checkpoint:
        required.insert(0, "audio_file")  # checkpoint-only runs need no audio
    for name in required:
        if not getattr(args, name):
            print(f"error: {name.replace('_', ' ')} is required", file=sys.stderr)
            return 2
    audio_files = list(args.audio_file)
    stdin_mode = "-" in audio_files
    if stdin_mode:
        if len(audio_files) > 1:
            print(
                "error: stdin input ('-') cannot be combined with file "
                "inputs",
                file=sys.stderr,
            )
            return 2
        if args.embeddings:
            print(
                "error: --embeddings is not supported with stdin input "
                "(embeddings need a bounded recording)",
                file=sys.stderr,
            )
            return 2
        if args.resample:
            print(
                "error: --resample is not supported with stdin input; "
                "pipe PCM at the model sample rate",
                file=sys.stderr,
            )
            return 2

    from . import (
        CancellationToken,
        Classifier,
        InferenceOptions,
        init_runtime,
    )
    from .runtime import default_device, set_platform
    from .utils.audio_io import chunk_audio, read_wav

    provider = args.provider.lower()
    if provider not in _PROVIDERS:
        raise ModelDetectionError(
            f"unknown provider '{args.provider}'. Valid providers: "
            + ", ".join(_PROVIDERS)
        )

    _debug(args.verbose, "Initializing XLA runtime...")
    t0 = time.monotonic()
    if provider == "cpu":
        set_platform("cpu")
    total_files = len(audio_files)
    if args.coordinator is not None:
        # Multi-host: join the process group BEFORE any backend init, then
        # keep only this process's shard of the input files.
        from .parallel import distributed_init, shard_files

        rank = distributed_init(
            args.coordinator, args.num_processes, args.process_id
        )
        audio_files = shard_files(audio_files)
        print(
            f"Distributed: process {rank}, analyzing {len(audio_files)} "
            f"file(s) of this shard",
            file=sys.stderr,
        )
        # Every file-writing export gets a per-process shard suffix —
        # otherwise the N processes would all open the same path with 'w'
        # and the last writer would silently clobber the others.
        if args.csv:
            args.csv = f"{args.csv}.{rank}"
        if args.embeddings:
            args.embeddings = f"{args.embeddings}.{rank}"
        if args.raven:
            args.raven = f"{args.raven}.{rank}"
        if args.audacity:
            args.audacity = f"{args.audacity}.{rank}"
        if not audio_files:
            print("No files in this process's shard", file=sys.stderr)
            return 0
    init_runtime()
    _debug(args.verbose, f"Runtime initialized in {time.monotonic() - t0:.3f}s")

    device = default_device(None if provider in ("auto", "cpu") else provider)
    is_cpu = device.platform == "cpu"
    batch_size = args.batch_size or (
        DEFAULT_CPU_BATCH_SIZE if is_cpu else DEFAULT_ACCEL_BATCH_SIZE
    )

    model_type_override = parse_model_type(args.model_type)

    _debug(args.verbose, f"Building classifier on {device.platform}...")
    t0 = time.monotonic()
    builder = (
        Classifier.builder()
        .model_path(args.model)
        .labels_path(args.labels)
        .top_k(args.top_k)
        .min_confidence(args.min_confidence)
    )
    if model_type_override is not None:
        builder = builder.model_type(model_type_override)
    if args.precision:
        builder = builder.precision(args.precision)
    wav_cache = {}  # (path, dtype) → read_wav result, reused by analysis
    if args.int8 and (not audio_files or stdin_mode):
        builder = builder.int8()  # no recording up front: synthetic calibration
    elif args.int8:
        # Calibrate on the first recording itself (amplitude statistics are
        # what matter; rate mismatches handled later by --resample don't
        # change them materially). The decoded audio is cached so the
        # analysis pass doesn't re-read the file.
        _debug(args.verbose, f"Reading {audio_files[0]} for int8 calibration...")
        first = read_wav(audio_files[0], dtype="int16", downmix=args.downmix)
        wav_cache[(audio_files[0], "int16")] = first
        builder = builder.int8(calibration_segments=first[0])
    if args.mesh:
        builder = builder.with_mesh()
    elif not is_cpu:
        builder = builder.with_device(device.platform)
    species_wanted = None
    if args.species_list:
        with open(args.species_list, "r", encoding="utf-8") as f:
            species_wanted = [ln.strip() for ln in f if ln.strip()]
        # Device-side candidate restriction: the builder masks disallowed
        # logits to -inf before the fused top-K, so the top-K slots go to
        # the listed species (BirdNET-Analyzer species-list semantics)
        # instead of being filtered out of the printed output afterwards.
        builder = builder.species_list(species_wanted)
    try:
        classifier = builder.build()
    except SpeciesListError:
        print(
            f"error: no species in {args.species_list} match the "
            f"model's labels",
            file=sys.stderr,
        )
        return 2
    config = classifier.config
    _debug(args.verbose, f"Classifier built in {time.monotonic() - t0:.3f}s")

    if args.save_checkpoint:
        classifier.save_checkpoint(args.save_checkpoint)
        print(f"Checkpoint written to {args.save_checkpoint}", file=sys.stderr)
        if not audio_files:
            return 0

    if args.embeddings and not config.model_type.has_embeddings:
        raise ModelDetectionError(
            f"--embeddings requires a model with embedding outputs "
            f"(BirdNET v3.0 / Perch v2); {config.model_type.display_name} "
            f"has none"
        )
    embeddings_out = {}

    use_stream = not args.no_stream
    if args.overlap >= config.segment_duration:
        raise ModelDetectionError(
            f"overlap ({args.overlap:.1f}s) must be less than segment duration "
            f"({config.segment_duration:.1f}s)"
        )
    if args.overlap < 0:
        raise ModelDetectionError(
            f"overlap ({args.overlap:.1f}s) must not be negative"
        )

    # Batch context for accelerators, fallback like the reference
    # (birdnet-analyze.rs:469-499). Not needed on the streaming path.
    batch_context = None
    if not is_cpu and not use_stream:
        try:
            batch_context = classifier.create_batch_context(batch_size)
            _debug(
                args.verbose,
                f"Created donated-buffer batch context (max_batch_size={batch_size}, "
                f"input_buffer={batch_context.input_buffer_bytes() / (1024 * 1024):.1f}MB pre-allocated)",
            )
        except BirdnetError as e:
            _debug(args.verbose, f"Batch context not available: {e}, using standard batch inference")

    model_name = config.model_type.display_name
    print(f"Using device: {device.platform}:{device.id}")
    if use_stream:
        print(f"Batch size: {batch_size} (streaming on-device pipeline)")
    elif batch_context is not None:
        print(f"Batch size: {batch_size} (buffer donation enabled)")
    else:
        print(f"Batch size: {batch_size}")
    print(
        f"Model: {model_name} ({config.segment_duration:.1f}s segments, "
        f"{args.overlap:.1f}s overlap)"
    )

    # Optional range filter (library feature surfaced in the CLI).
    location_scores = None
    range_filter = None
    if args.meta_model is not None and args.lat is not None and args.lon is not None:
        from .rangefilter import RangeFilter

        if args.date:
            try:
                month_s, day_s = args.date.split("-")
                month, day = int(month_s), int(day_s)
            except ValueError:
                raise InvalidDateError(
                    0, 0, f"--date must be MM-DD, got {args.date!r}"
                ) from None
        else:
            now = datetime.now()
            month, day = now.month, now.day
        range_filter = (
            RangeFilter.builder()
            .model_path(args.meta_model)
            .from_classifier_labels(classifier.labels)
            .build()
        )
        location_scores = range_filter.predict(args.lat, args.lon, month, day)
        _debug(
            args.verbose,
            f"Range filter: {len(location_scores)} species above threshold",
        )

    # Ctrl-C → cancel; second Ctrl-C → force exit (birdnet-analyze.rs:547-556).
    cancel_token = CancellationToken()
    state = {"cancelled": False}

    def _on_sigint(signum, frame):
        if state["cancelled"]:
            print("\nForce exiting...", file=sys.stderr)
            sys.exit(1)
        state["cancelled"] = True
        print("\nCancelling... (press Ctrl+C again to force exit)", file=sys.stderr)
        cancel_token.cancel()

    try:
        signal.signal(signal.SIGINT, _on_sigint)
    except ValueError:
        pass  # non-main thread

    csv_writer = None
    csv_file = None
    # The file column follows the PRE-shard count so distributed process
    # shards emit a uniform CSV schema.
    multi_file = total_files > 1
    if args.csv:
        import csv as _csv

        csv_file = open(args.csv, "w", newline="", encoding="utf-8")
        csv_writer = _csv.writer(csv_file)
        header = ["start_s", "end_s", "species", "confidence"]
        if multi_file:
            header = ["file"] + header
        csv_writer.writerow(header)

    species_allow = None
    if species_wanted is not None:
        # The candidate restriction already happened on device (builder
        # mask); this set only backs the host-side straggler guard in
        # _emit and the debug count.
        species_allow = set(classifier.allowed_species())
        _debug(
            args.verbose,
            f"Species list: {len(species_allow)} of "
            f"{len(classifier.labels)} labels retained",
        )

    raven_writer = None
    audacity_writer = None
    if args.raven or args.audacity:
        from .utils.export import AudacityWriter, RavenWriter

        if args.raven:
            raven_writer = RavenWriter(
                args.raven, config.sample_rate, config.segment_duration
            )
        if args.audacity:
            if multi_file:
                print(
                    "error: --audacity supports a single input (label "
                    "tracks are per-recording); use --raven for "
                    "multi-file runs",
                    file=sys.stderr,
                )
                return 2
            audacity_writer = AudacityWriter(
                args.audacity, config.segment_duration
            )

    def _emit(audio_path: str, offset: float, predictions,
              duration_secs: float) -> None:
        if range_filter is not None and location_scores is not None:
            predictions = range_filter.filter_predictions(
                predictions, location_scores, rerank=args.rerank
            )
        if species_allow is not None:
            predictions = [
                p for p in predictions if p.species in species_allow
            ]
        if not predictions:
            return
        if csv_writer is not None:
            end = min(offset + config.segment_duration, duration_secs)
            for p in predictions:
                row = [f"{offset:.1f}", f"{end:.1f}", p.species, f"{p.confidence:.4f}"]
                if multi_file:
                    row = [audio_path] + row
                csv_writer.writerow(row)
        if raven_writer is not None:
            raven_writer.add(audio_path, offset, predictions, duration_secs)
        if audacity_writer is not None:
            audacity_writer.add(audio_path, offset, predictions, duration_secs)
        preds = ", ".join(
            f"{p.species} ({p.confidence * 100.0:.1f}%)" for p in predictions
        )
        print(f"{format_time(float(offset))}  {preds}")

    profile_ctx = None
    if args.profile:
        from .utils.profiling import trace

        profile_ctx = trace(args.profile)
        profile_ctx.__enter__()
        _debug(args.verbose, f"Profiling to {args.profile}")

    def _export_embeddings(audio_path: str, samples, options) -> None:
        """Second device pass collecting [N, E] embeddings (detections and
        embeddings use different fused programs; the audio is re-streamed).
        Honors the same timeout/Ctrl-C options as the detection pass."""
        _debug(args.verbose, "Extracting embeddings...")
        t0 = time.monotonic()
        emb, times = classifier.embed_samples(samples, args.overlap, options)
        embeddings_out[f"{audio_path}/embeddings"] = emb
        embeddings_out[f"{audio_path}/times"] = times
        _debug(
            args.verbose,
            f"Embeddings {emb.shape} extracted in {time.monotonic() - t0:.3f}s",
        )

    def _read_audio(audio_path: str):
        """Decode one WAV (host-side). Runs either inline or on the
        prefetch thread — it touches no mutable state beyond the one-shot
        wav_cache pop (int8 calibration reuse, populated before the loop
        starts)."""
        # Streaming ships raw int16 PCM to the device (half the transfer
        # bytes; the /32768 scale runs on-device); per-batch wants float32.
        dtype = "int16" if use_stream else "float32"
        cached = wav_cache.pop((audio_path, dtype), None)
        if cached is not None:
            return cached
        return read_wav(audio_path, dtype=dtype, downmix=args.downmix)

    def _process_file(audio_path: str, decoded=None) -> None:
        _debug(args.verbose, f"Reading WAV file: {audio_path}")
        t0 = time.monotonic()
        samples, sample_rate, duration_secs = (
            decoded if decoded is not None else _read_audio(audio_path)
        )
        _debug(args.verbose, f"WAV file read in {time.monotonic() - t0:.3f}s")

        if sample_rate != config.sample_rate:
            if not args.resample:
                raise AudioFormatError(
                    f"model expects {config.sample_rate} Hz audio, WAV is "
                    f"{sample_rate} Hz (pass --resample to convert)"
                )
            import numpy as np

            from .ops.resample import resample_audio

            _debug(
                args.verbose,
                f"Resampling {sample_rate} Hz → {config.sample_rate} Hz on device...",
            )
            t0 = time.monotonic()
            samples = resample_audio(
                samples,
                sample_rate,
                config.sample_rate,
                out_dtype=np.int16 if use_stream else np.float32,
            )
            sample_rate = config.sample_rate
            _debug(args.verbose, f"Resampled in {time.monotonic() - t0:.3f}s")

        print(
            f"Analyzing: {audio_path} ({format_duration(duration_secs)}, "
            f"{sample_rate} Hz)"
        )
        print()

        timeout = args.timeout if args.timeout > 0 else None
        options = InferenceOptions(
            timeout=timeout,
            cancellation_token=cancel_token,
        )

        def make_stream_options() -> InferenceOptions:
            # --timeout is "per batch" (reference: birdnet-analyze.rs
            # timeout bounds one predict_batch of `batch_size` segments).
            # The streaming paths (detection pipeline AND --embeddings
            # export) wait on whole superchunks, so their budget scales to
            # the same per-segment allowance — computed lazily, only on
            # the paths that stream, and capped at the tiles this
            # recording actually dispatches.
            if timeout is None:
                return options
            step = config.sample_count - int(args.overlap * sample_rate)
            n_seg = -(-len(samples) // step) if len(samples) and step > 0 else 0
            return InferenceOptions(
                timeout=timeout
                * classifier.streaming_timeout_scale(batch_size, n_seg),
                cancellation_token=cancel_token,
            )

        start_time = time.monotonic()

        if use_stream:
            step = config.sample_count - int(args.overlap * sample_rate)
            segment_count = -(-len(samples) // step) if len(samples) else 0
            _debug(
                args.verbose,
                f"Streaming {segment_count} segments through device pipeline...",
            )
            from .errors import InferenceCancelledError

            stream_options = make_stream_options()
            processed = 0
            try:
                for offset, predictions in classifier.analyze_samples_iter(
                    samples, args.overlap, stream_options
                ):
                    _emit(audio_path, offset, predictions, duration_secs)
                    processed += 1
            except InferenceCancelledError:
                # Graceful Ctrl-C between superchunks: already-computed
                # results were emitted; the summary reports what ran.
                print("Processing cancelled by user", file=sys.stderr)
            elapsed = time.monotonic() - start_time
            segments_per_sec = processed / elapsed if elapsed > 0 else 0.0
            processed_secs = (
                duration_secs * (processed / segment_count) if segment_count else 0.0
            )
            x_realtime = processed_secs / elapsed if elapsed > 0 else 0.0
            print()
            print(
                f"{processed} segments of {format_duration(duration_secs)} audio "
                f"analyzed in {elapsed:.1f}s ({segments_per_sec:.1f} segments/s, "
                f"{x_realtime:.1f}x realtime)"
            )
            if args.embeddings and not state["cancelled"]:
                _export_embeddings(audio_path, samples, stream_options)
            return

        _debug(args.verbose, "Chunking audio into segments...")
        segments, start_times = chunk_audio(
            samples, config.sample_count, args.overlap, sample_rate
        )
        segment_count = segments.shape[0]
        total_batches = -(-segment_count // batch_size) if segment_count else 0
        processed = 0
        for batch_num in range(total_batches):
            if state["cancelled"]:
                print("Processing cancelled by user", file=sys.stderr)
                break
            lo = batch_num * batch_size
            hi = min(lo + batch_size, segment_count)
            batch = segments[lo:hi]
            _debug(
                args.verbose,
                f"Processing batch {batch_num + 1}/{total_batches} "
                f"({hi - lo} segments)...",
            )
            t_batch = time.monotonic()
            if batch_context is not None:
                results = classifier.predict_batch_with_context(
                    batch_context, batch, options
                )
            else:
                results = classifier.predict_batch(batch, options)
            _debug(
                args.verbose,
                f"Batch {batch_num + 1} completed in "
                f"{time.monotonic() - t_batch:.3f}s",
            )
            for offset, result in zip(start_times[lo:hi], results):
                _emit(audio_path, float(offset), result.predictions, duration_secs)
            processed += hi - lo

        # Like the streaming path, the summary reports what actually ran —
        # a Ctrl-C after batch 1 must not claim the full file was analyzed.
        elapsed = time.monotonic() - start_time
        segments_per_sec = processed / elapsed if elapsed > 0 else 0.0
        processed_secs = (
            duration_secs * (processed / segment_count) if segment_count else 0.0
        )
        x_realtime = processed_secs / elapsed if elapsed > 0 else 0.0
        print()
        print(
            f"{processed} segments of {format_duration(duration_secs)} audio "
            f"analyzed in {elapsed:.1f}s ({segments_per_sec:.1f} segments/s, "
            f"{x_realtime:.1f}x realtime)"
        )
        if args.embeddings and not state["cancelled"]:
            _export_embeddings(audio_path, samples, make_stream_options())

    def _process_stdin() -> None:
        """Live analysis of raw 16-bit mono PCM on stdin (at the model's
        sample rate). Segments are classified as soon as their samples
        arrive; when the pipe runs ahead of the device (e.g. piping a
        file), ready segments batch together up to --batch-size. The
        overlap/zero-pad-tail semantics match the file chunker
        (birdnet-analyze.rs:707-743)."""
        import math
        import select

        import numpy as np

        sample_rate = config.sample_rate
        seg_bytes = config.sample_count * 2
        step = config.sample_count - int(args.overlap * sample_rate)
        step_bytes = step * 2
        timeout = args.timeout if args.timeout > 0 else None
        options = InferenceOptions(
            timeout=timeout, cancellation_token=cancel_token
        )
        stream = sys.stdin.buffer
        print(f"Analyzing: <stdin> (live, {sample_rate} Hz)")
        print()

        def _more_ready() -> bool:
            """True if another read would return data without blocking.
            Non-selectable streams (tests, some platforms) report ready so
            fast pipes still batch; EOF also reads without blocking."""
            try:
                return bool(select.select([stream], [], [], 0)[0])
            except (OSError, ValueError, TypeError):
                return True

        def _read_interruptible(n: int):
            """Read up to ``n`` bytes; b"" at EOF, None if cancelled while
            waiting. A blocking ``read(n)`` would swallow the first Ctrl-C
            on a stalled pipe (PEP 475 retries the syscall after the
            handler returns), so selectable streams wait in short select
            slices that re-check the cancel flag; ``read1`` after
            select-ready cannot block (one raw read of available data)."""
            try:
                stream.fileno()
            except Exception:
                return stream.read(n)  # tests / non-file streams
            while not state["cancelled"]:
                try:
                    ready = select.select([stream], [], [], 0.25)[0]
                except (OSError, ValueError):
                    return stream.read(n)
                if ready:
                    read1 = getattr(stream, "read1", None)
                    return read1(n) if read1 is not None else stream.read(n)
            return None

        buf = b""
        pending: list = []  # (segment_index, samples)
        seg_idx = 0
        done = 0
        eof = False
        t_start = time.monotonic()

        def _flush() -> None:
            nonlocal done
            if not pending:
                return
            batch = [s for _, s in pending]
            results = classifier.predict_batch(batch, options)
            for (idx, _), result in zip(pending, results):
                _emit(
                    "-",
                    idx * step / sample_rate,
                    result.predictions,
                    math.inf,
                )
            done += len(pending)
            pending.clear()

        while not state["cancelled"]:
            if len(buf) >= seg_bytes:
                seg = (
                    np.frombuffer(buf[:seg_bytes], dtype="<i2").astype(
                        np.float32
                    )
                    / 32768.0
                )
                buf = buf[step_bytes:]
                pending.append((seg_idx, seg))
                seg_idx += 1
                if len(pending) >= batch_size:
                    _flush()
                continue
            if eof:
                break
            if pending and not _more_ready():
                # live source: don't hold finished segments while blocking
                _flush()
            chunk = _read_interruptible(seg_bytes - len(buf))
            if chunk is None:
                break  # cancelled while waiting for input
            if not chunk:
                eof = True
                # zero-padded tail, matching the file chunker
                # (birdnet-analyze.rs:733): buf starts exactly at the next
                # segment's start position, so any remaining sample means
                # the chunker would emit one more (padded) segment
                if len(buf) >= 2:
                    pcm = np.frombuffer(
                        buf[: len(buf) - (len(buf) % 2)], dtype="<i2"
                    )
                    seg = np.zeros(config.sample_count, np.float32)
                    seg[: pcm.shape[0]] = pcm.astype(np.float32) / 32768.0
                    pending.append((seg_idx, seg))
                continue
            buf += chunk
        if state["cancelled"]:
            print("Processing cancelled by user", file=sys.stderr)
        else:
            _flush()
        elapsed = time.monotonic() - t_start
        processed_secs = done * step / sample_rate
        rate_str = (
            f"{done / elapsed:.1f} segments/s, "
            f"{processed_secs / elapsed:.1f}x realtime"
            if elapsed > 0
            else "n/a"
        )
        print()
        print(
            f"{done} segments of live audio analyzed in {elapsed:.1f}s "
            f"({rate_str})"
        )

    failures = 0
    # Multi-file runs prefetch the next file's host-side WAV decode on a
    # background thread while the current file is on the device, so disk
    # I/O overlaps inference instead of serializing with it (the reference
    # CLI is strictly sequential; decode is pure host work the accelerator
    # never needs to wait for).
    from concurrent.futures import ThreadPoolExecutor

    def _write_exports() -> None:
        if raven_writer is not None:
            n = raven_writer.write()
            print(
                f"Raven selection table written to {args.raven} "
                f"({n} selections)",
                file=sys.stderr,
            )
        if audacity_writer is not None:
            n = audacity_writer.write()
            print(
                f"Audacity labels written to {args.audacity} ({n} labels)",
                file=sys.stderr,
            )

    if stdin_mode:
        try:
            _process_stdin()
        finally:
            if profile_ctx is not None:
                profile_ctx.__exit__(None, None, None)
            if csv_file is not None:
                csv_file.close()
            _write_exports()
        return 0

    try:
        with ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="wav-prefetch"
        ) as prefetch_pool:
            next_fut = None
            for i, audio_path in enumerate(audio_files):
                if state["cancelled"]:
                    break
                cur_fut, next_fut = next_fut, None
                if i + 1 < len(audio_files):
                    next_fut = prefetch_pool.submit(
                        _read_audio, audio_files[i + 1]
                    )
                try:
                    decoded = cur_fut.result() if cur_fut is not None else None
                    _process_file(audio_path, decoded)
                except BirdnetError as e:
                    if not multi_file:
                        raise
                    failures += 1
                    print(
                        f"Error analyzing {audio_path}: {e}", file=sys.stderr
                    )
    finally:
        if profile_ctx is not None:
            profile_ctx.__exit__(None, None, None)
        if csv_file is not None:
            csv_file.close()
        _write_exports()
        if args.embeddings and embeddings_out:
            import numpy as np

            np.savez(args.embeddings, **embeddings_out)
            print(
                f"Embeddings written to {args.embeddings} "
                f"({len(embeddings_out) // 2} file(s))",
                file=sys.stderr,
            )
    return 1 if failures else 0


def main(argv=None) -> int:
    from .utils.logfilter import filter_native_stderr, silence_cosmetic_python_logs

    args = build_parser().parse_args(argv)
    # Drop the known-cosmetic native noise (XLA cpu_aot_loader
    # pseudo-feature "SIGILL" lines; libtpu/axon discovery probes on
    # TPU-less hosts) and the Python-side experimental-platform warning,
    # so the first screen stays clean like the reference CLI's
    # (reference: src/bin/birdnet-analyze.rs:621-647). --verbose keeps
    # everything.
    if not getattr(args, "verbose", False):
        silence_cosmetic_python_logs()
    with filter_native_stderr():
        try:
            return run_with_args(args)
        except BirdnetError as e:
            print(f"Error: {e}", file=sys.stderr)
            return 1


if __name__ == "__main__":
    sys.exit(main())
