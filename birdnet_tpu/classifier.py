"""Thread-safe Classifier with builder API.

Mirrors the reference's public surface (reference: src/classifier.rs):
``Classifier.builder()`` → required model_path + labels, defaults top_k=10 /
min_confidence=None (classifier.rs:65-75), device-selection methods with
"first non-CPU device wins" precedence (classifier.rs:25-31), ``build()``
performing load → shape extraction → detection → label validation
(classifier.rs:334-382), then ``predict`` / ``predict_batch`` /
``predict_batch_with_context`` with identical validation errors.

TPU-native differences (by design, not omission):
- The ONNX Runtime session becomes an XLA executable; postprocess (top-K +
  sigmoid) is fused on-device (see compiler/engine.py).
- No session mutex: JAX dispatch is thread-safe, so concurrent predicts
  overlap instead of serializing (reference: classifier.rs:434-449 notes its
  Mutex serializes inference).
- Timeout/cancellation bound the host wait on the async device result
  (reference terminates the ORT run; XLA programs cannot be killed —
  observable behavior is the same: Timeout/Cancelled errors at the same
  points).
"""

from __future__ import annotations

import threading
from typing import List, Optional, Sequence, Union

import numpy as np

from .batch_context import BatchInferenceContext
from .compiler.engine import InferenceEngine
from .detection import detect_model_type
from .device_config import CPUConfig, TPUConfig
from .errors import (
    BatchInputSizeError,
    InputSizeError,
    LabelCountError,
    LabelsRequiredError,
    ModelPathRequiredError,
)
from .inference_options import InferenceOptions
from .labels import load_labels_from_file
from .postprocess import top_k_from_device
from .types import ModelConfig, ModelType, PredictionResult


class ClassifierBuilder:
    """Builder for :class:`Classifier` (reference: classifier.rs:46-383)."""

    def __init__(self) -> None:
        self._model_path: Optional[str] = None
        self._labels_path: Optional[str] = None
        self._labels: Optional[List[str]] = None
        self._top_k: int = 10
        self._min_confidence: Optional[float] = None
        self._model_type: Optional[ModelType] = None
        self._requested_device: Optional[str] = None  # first non-CPU wins
        self._device_config: Optional[Union[TPUConfig, CPUConfig]] = None
        self._precision: Optional[str] = None
        self._warmup_batches: Sequence[int] = ()
        self._mesh = None
        self._use_mesh = False
        self._int8 = False
        self._int8_calibration = None
        self._species_list: Optional[List[str]] = None

    # -- required inputs --------------------------------------------------

    def model_path(self, path) -> "ClassifierBuilder":
        self._model_path = str(path)
        return self

    def labels_path(self, path) -> "ClassifierBuilder":
        self._labels_path = str(path)
        return self

    def labels(self, labels: Sequence[str]) -> "ClassifierBuilder":
        """Provide labels directly (in-memory), like the reference's
        ``labels(Vec<String>)``."""
        self._labels = list(labels)
        return self

    # -- options -----------------------------------------------------------

    def top_k(self, k: int) -> "ClassifierBuilder":
        self._top_k = int(k)
        return self

    def min_confidence(self, c: float) -> "ClassifierBuilder":
        self._min_confidence = float(c)
        return self

    def model_type(self, mt: ModelType) -> "ClassifierBuilder":
        """Override auto-detection (validated against actual shapes)."""
        self._model_type = mt
        return self

    def precision(self, p: str) -> "ClassifierBuilder":
        """MXU precision policy: fp32 | mixed | fast | bf16."""
        if p not in ("fp32", "mixed", "fast", "bf16"):
            # An unknown policy would otherwise silently behave as fp32
            # (the op-level policy checks are membership tests).
            raise ValueError(
                f"unknown precision policy {p!r}; expected one of "
                f"'fp32', 'mixed', 'fast', 'bf16'"
            )
        self._precision = p
        return self

    def warmup(self, batch_sizes: Sequence[int]) -> "ClassifierBuilder":
        """Pre-compile executables for these batch sizes at build time (the
        TensorRT engine-build analog; cached persistently)."""
        self._warmup_batches = tuple(batch_sizes)
        return self

    def species_list(self, species) -> "ClassifierBuilder":
        """Restrict predictions to a subset of species (no reference
        counterpart; the BirdNET-Analyzer custom-species-list semantic).

        ``species``: iterable of names — full ``Scientific_Common`` labels
        or either half. Disallowed logits are masked to -inf *on device,
        before the fused top-K*, so the top-K candidates come from the
        allowed set (restricting the candidate pool), not filtered out of
        the printed output afterwards. ``build()`` raises
        :class:`~birdnet_tpu.errors.InferenceError` if nothing matches the
        model's labels.
        """
        self._species_list = [str(s) for s in species]
        return self

    def int8(self, calibration_segments=None) -> "ClassifierBuilder":
        """Post-training int8 quantization onto the int8 MXU (2x bf16 peak
        on v5e) — the analog of the reference's TensorRT int8 flag
        (reference: src/tensorrt_config.rs:100-160, which relies on TRT
        calibration tables).

        ``calibration_segments``: real audio for activation calibration —
        an iterable of [B, sample_count] float32 batches, or a raw 1-D
        recording (float32 or int16 PCM) that gets chunked into
        evenly-spaced segments. ``None`` falls back to synthetic
        noise/sweep audio, which keeps scales sane but calibrates less
        accurately than real recordings.
        """
        self._int8 = True
        self._int8_calibration = calibration_segments
        return self

    # -- device selection (EP-method analogs, classifier.rs:159-322) ------

    def with_tpu(self, config: Optional[TPUConfig] = None) -> "ClassifierBuilder":
        # "First non-CPU device wins" (classifier.rs:25-31): an accelerator
        # request overrides an earlier CPU request, never another accelerator.
        if self._requested_device is None or self._requested_device == "cpu":
            self._requested_device = "tpu"
        self._device_config = config or TPUConfig()
        return self

    def with_tpu_config(self, config: TPUConfig) -> "ClassifierBuilder":
        return self.with_tpu(config)

    def with_cpu(self, config: Optional[CPUConfig] = None) -> "ClassifierBuilder":
        # CPU never overrides a previously requested accelerator (parity with
        # "first non-CPU provider wins", classifier.rs:25-31); its config is
        # honored only when CPU actually is the selected device.
        if self._requested_device is None:
            self._requested_device = "cpu"
        if self._requested_device == "cpu" and config is not None:
            self._device_config = config
        return self

    def with_device(self, platform: str) -> "ClassifierBuilder":
        """Request a device by JAX platform name (tpu/axon/cpu/gpu)."""
        if self._requested_device is None or self._requested_device == "cpu":
            self._requested_device = platform
        return self

    def with_mesh(self, mesh=None) -> "ClassifierBuilder":
        """Run multi-chip: shard batches over the mesh's ``data`` axis and
        the classifier head over ``model`` (no reference counterpart — the
        reference is single-device). ``mesh=None`` builds a default mesh
        over all visible devices."""
        self._use_mesh = True
        self._mesh = mesh
        return self

    # -- build -------------------------------------------------------------

    def build(self) -> "Classifier":
        if self._model_path is None:
            raise ModelPathRequiredError()
        if self._labels_path is None and self._labels is None:
            raise LabelsRequiredError()

        if self._device_config is not None:
            self._device_config.apply()

        from .runtime import default_device, init_runtime

        init_runtime(
            self._device_config.compilation_cache_dir
            if self._device_config is not None
            else None
        )

        from .checkpoint import import_any

        imported = import_any(self._model_path)
        input_shape, output_shapes = imported.detection_shapes()
        config = detect_model_type(input_shape, output_shapes, self._model_type)

        if self._int8:
            from .compiler.quantize import (
                calibration_from_samples,
                quantize_model,
                synthetic_calibration_segments,
            )

            calibration = self._int8_calibration
            if calibration is None:
                calibration = synthetic_calibration_segments(config.sample_count)
            elif isinstance(calibration, np.ndarray):
                if calibration.ndim == 1:
                    # Raw recording: chunk into evenly-spaced segments.
                    calibration = calibration_from_samples(
                        calibration, config.sample_count
                    )
                elif calibration.ndim == 2:
                    # [N, sample_count] segment stack: split into batches
                    # (a bare 2-D array would otherwise iterate into 1-D
                    # rows, each misread as a whole model input).
                    calibration = [
                        calibration[i:i + 4]
                        for i in range(0, calibration.shape[0], 4)
                    ]
            imported = quantize_model(imported, calibration)

        # Validation trace (reference analog: ORT validates the graph at
        # session creation — commit_from_file, classifier.rs:348-350).
        # jax.eval_shape is abstract (no compile, no device touch), so
        # structural defects in arbitrary model files (bad conv groups,
        # invalid window geometry, shape inconsistencies) surface HERE as
        # ModelLoadError instead of raw tracer errors at first predict.
        import jax

        from .compiler.importer import make_forward
        from .errors import BirdnetError, ModelLoadError

        try:
            # detection_shapes() already maps dynamic dims to 1 and
            # returns plain positive ints.
            in_shape = tuple(input_shape)
            jax.eval_shape(
                make_forward(imported, precision="fp32"),
                imported.params,
                jax.ShapeDtypeStruct(in_shape, np.float32),
            )
        except BirdnetError:
            raise
        except Exception as e:  # noqa: BLE001 - untrusted model structure
            raise ModelLoadError(f"model failed validation trace: {e}") from e

        if self._labels is not None:
            labels = list(self._labels)
        else:
            labels = load_labels_from_file(self._labels_path, config.model_type)
        if len(labels) != config.num_species:
            raise LabelCountError(expected=config.num_species, got=len(labels))

        species_mask = None
        if self._species_list is not None:
            from .errors import SpeciesListError
            from .labels import species_mask_from_names

            species_mask = species_mask_from_names(labels, self._species_list)
            if not species_mask.any():
                raise SpeciesListError(
                    "species list matches none of the model's labels"
                )

        requested = self._requested_device
        did = (
            self._device_config.device_id
            if self._device_config is not None
            else 0
        )
        device = None
        if requested:
            # Platform aliasing ("tpu" resolves to the axon platform when
            # tunneled, cuda/rocm to gpu) lives in default_device.
            device = default_device(requested, device_id=did)

        precision = self._precision
        if precision is None and self._device_config is not None:
            precision = self._device_config.precision
        if self._use_mesh:
            from .parallel.engine import ShardedEngine
            from .parallel.sharding import make_mesh

            mesh = self._mesh if self._mesh is not None else make_mesh()
            engine = ShardedEngine(
                imported,
                config,
                mesh=mesh,
                precision=precision,
                top_k=self._top_k,
                species_mask=species_mask,
            )
        else:
            engine = InferenceEngine(
                imported,
                config,
                device=device,
                precision=precision,
                top_k=self._top_k,
                species_mask=species_mask,
            )
        if self._warmup_batches:
            engine.warmup(self._warmup_batches)

        return Classifier(
            engine=engine,
            config=config,
            labels=labels,
            top_k=self._top_k,
            min_confidence=self._min_confidence,
            requested_device=requested,
            imported=imported,
            species_mask=species_mask,
        )


class Classifier:
    """Thread-safe classifier (reference: classifier.rs:422-1058). Cheap to
    share across threads; all state is immutable after build."""

    def __init__(
        self,
        engine: InferenceEngine,
        config: ModelConfig,
        labels: List[str],
        top_k: int,
        min_confidence: Optional[float],
        requested_device: Optional[str],
        imported=None,
        species_mask=None,
    ):
        self._engine = engine
        self._config = config
        self._labels = labels
        self._top_k = top_k
        self._min_confidence = min_confidence
        self._requested_device = requested_device
        self._imported = imported
        self._species_mask = species_mask
        self._stream = None
        self._stream_lock = threading.Lock()

    @staticmethod
    def builder() -> ClassifierBuilder:
        return ClassifierBuilder()

    # -- introspection ------------------------------------------------------

    @property
    def config(self) -> ModelConfig:
        return self._config

    @property
    def model_type(self) -> ModelType:
        return self._config.model_type

    @property
    def labels(self) -> List[str]:
        return self._labels

    @property
    def num_species(self) -> int:
        return self._config.num_species

    @property
    def top_k_value(self) -> int:
        return self._top_k

    @property
    def min_confidence_value(self) -> Optional[float]:
        return self._min_confidence

    @property
    def device(self):
        return self._engine.device

    @property
    def species_mask(self):
        """Boolean [num_species] candidate mask from
        :meth:`ClassifierBuilder.species_list`, or None when unrestricted."""
        return self._species_mask

    def allowed_species(self) -> Optional[List[str]]:
        """Labels retained by the build-time species list (label order),
        or None when unrestricted."""
        if self._species_mask is None:
            return None
        return [
            label
            for label, keep in zip(self._labels, self._species_mask)
            if keep
        ]

    # -- prediction ---------------------------------------------------------

    def predict(
        self,
        segment,
        options: Optional[InferenceOptions] = None,
        species_mask: Optional[np.ndarray] = None,
    ) -> PredictionResult:
        """Classify a single audio segment (reference: classifier.rs:610-643).

        ``segment`` must have exactly ``config.sample_count`` float samples.
        ``species_mask``: optional bool [num_species] per-call candidate
        mask (see :meth:`predict_batch`).
        """
        seg = np.asarray(segment, dtype=np.float32).reshape(-1)
        if seg.shape[0] != self._config.sample_count:
            raise InputSizeError(
                expected=self._config.sample_count, got=seg.shape[0]
            )
        rows = (
            None if species_mask is None
            else self._validate_species_masks(
                np.asarray(species_mask, dtype=bool).reshape(1, -1), 1
            )
        )
        conf, idx, logits, emb = self._engine.run_batch(
            seg[None, :], options=options, row_masks=rows
        )
        return self._result(
            conf[0], idx[0], logits[0],
            emb[0] if emb is not None else None,
            row_mask=rows[0] if rows is not None else None,
        )

    def predict_batch(
        self,
        segments,
        options: Optional[InferenceOptions] = None,
        species_masks: Optional[np.ndarray] = None,
    ) -> List[PredictionResult]:
        """Classify a batch of segments (reference: classifier.rs:676-727).

        ``species_masks``: optional per-segment bool [B, num_species]
        candidate masks — each row's top-K selects only its allowed
        species (per-request species lists; composes with the build-time
        :meth:`ClassifierBuilder.species_list` mask).
        """
        segs = [np.asarray(s, dtype=np.float32).reshape(-1) for s in segments]
        if not segs:
            return []
        for i, s in enumerate(segs):
            if s.shape[0] != self._config.sample_count:
                raise BatchInputSizeError(
                    index=i, expected=self._config.sample_count, got=s.shape[0]
                )
        batch = np.stack(segs, axis=0)
        rows = self._validate_species_masks(species_masks, len(segs))
        conf, idx, logits, emb = self._engine.run_batch(
            batch, options=options, row_masks=rows
        )
        return [
            self._result(
                conf[i], idx[i], logits[i],
                emb[i] if emb is not None else None,
                row_mask=rows[i] if rows is not None else None,
            )
            for i in range(len(segs))
        ]

    def _validate_species_masks(self, species_masks, b: int):
        if species_masks is None:
            return None
        from .errors import InferenceError

        rows = np.asarray(species_masks, dtype=bool)
        if rows.ndim != 2:
            # A single [N] mask is predict()'s shape — batch calls need one
            # row per segment; say so instead of a self-contradictory
            # "expected N, got N" size error.
            raise InferenceError(
                "species_masks must be a 2-D [batch, num_species] bool "
                f"array, got {rows.ndim}-D; broadcast a shared mask with "
                "np.tile(mask, (batch, 1)) if all segments use one list"
            )
        if rows.shape[1] != self._config.num_species:
            # the species dimension is wrong — a size error on the mask
            raise InputSizeError(
                expected=self._config.num_species,
                got=int(rows.shape[1]),
            )
        if rows.shape[0] != b:
            raise InferenceError(
                f"species_masks has {rows.shape[0]} rows for a batch of {b}"
            )
        return rows

    # -- batch context path -------------------------------------------------

    def create_batch_context(
        self, max_batch_size: int, precompile_row_mask: bool = False
    ) -> BatchInferenceContext:
        """Create a buffer-reusing batch context (reference:
        classifier.rs:757-784 → batch_context.rs:69-122).

        ``precompile_row_mask``: also pre-compile the per-request
        species-mask executable (serving sets this so the first masked
        request doesn't compile inside the batch worker)."""
        return BatchInferenceContext(
            engine=self._engine,
            config=self._config,
            max_batch_size=max_batch_size,
            precompile_row_mask=precompile_row_mask,
        )

    def predict_batch_with_context(
        self,
        context: BatchInferenceContext,
        segments,
        options: Optional[InferenceOptions] = None,
        species_masks: Optional[np.ndarray] = None,
    ) -> List[PredictionResult]:
        """Batched inference reusing pre-allocated buffers (reference:
        classifier.rs:826-866). ``species_masks`` as in
        :meth:`predict_batch`."""
        batch, b = context.prepare_input(segments)
        rows = self._validate_species_masks(species_masks, b)
        conf, idx, logits, emb = self._engine.run_batch(
            batch,
            options=options,
            with_embeddings=self._config.model_type is not ModelType.BIRDNET_V24,
            bucket=context.max_batch_size,
            donate=context.donate,
            row_masks=rows,
            n_valid=b,
        )
        return [
            self._result(
                conf[i], idx[i], logits[i],
                emb[i] if emb is not None else None,
                row_mask=rows[i] if rows is not None else None,
            )
            for i in range(b)
        ]

    def save_checkpoint(self, path) -> None:
        """Persist the imported (optimized) weights as a fast-loading
        ``.btck`` checkpoint; pass its path to ``model_path`` later (the
        ONNX → pytree serialize-once conversion, SURVEY §5.4)."""
        from .checkpoint import save_checkpoint

        save_checkpoint(self._imported, path)

    # -- streaming whole-recording path --------------------------------------

    def streaming_timeout_scale(
        self, batch_size: int, n_segments: Optional[int] = None
    ) -> int:
        """Factor converting a per-batch timeout budget into a
        per-superchunk one: the streaming paths wait on whole superchunks
        (up to MAX_TILES × tile segments plus their upload), so a timeout
        meant to bound one ``predict_batch(batch_size)`` call must scale
        to the same per-segment allowance.

        ``n_segments``, when known, caps the scale at the tiles the
        recording actually dispatches (a 2-tile recording must not get a
        full-superchunk timeout budget, which would let a genuine hang
        linger for minutes). A run with a timeout is by definition
        monitored, so the superchunk bound is MONITORED_MAX_TILES. The
        needed tile count rounds UP to the dispatch bucket the engine
        will actually compile (stream._bucket_tiles) — budgeting the raw
        tile count would under-budget e.g. a 5-tile recording that
        dispatches a 6-tile superchunk and time out a healthy run."""
        from .compiler.stream import MONITORED_MAX_TILES, _bucket_tiles

        tile = getattr(self._streaming_engine(), "tile", batch_size)
        tiles = MONITORED_MAX_TILES
        if n_segments is not None and n_segments > 0:
            tiles = min(tiles, _bucket_tiles(-(-int(n_segments) // tile)))
        return max(1, -(-tiles * tile // max(1, batch_size)))

    def _streaming_engine(self):
        if getattr(self._engine, "streams_natively", False):
            return self._engine  # ShardedEngine streams through itself
        if self._stream is None:
            with self._stream_lock:
                if self._stream is None:
                    from .compiler.stream import StreamingEngine

                    self._stream = StreamingEngine(
                        self._imported,
                        self._config,
                        device=self._engine.device,
                        precision=self._engine.precision,
                        top_k=self._top_k,
                        params=self._engine.params,
                        species_mask=self._species_mask,
                    )
        return self._stream

    def analyze_samples(
        self,
        samples,
        overlap_seconds: float = 0.0,
        options: Optional[InferenceOptions] = None,
        species_mask: Optional[np.ndarray] = None,
    ):
        """Classify every (overlapping) segment of a full recording in one
        streaming pass — the TPU-native replacement for the reference CLI's
        host-side chunk → predict_batch loop (birdnet-analyze.rs:707-743,
        :562-635): audio uploads once per superchunk, segmentation +
        inference + top-K run fused on device, and only top-K results come
        back.

        ``samples``: 1-D float32 in [-1, 1) or raw int16 PCM (scaled
        on-device). Returns ``list[(start_time_seconds, list[Prediction])]``.
        Embeddings/raw scores are not materialized on this path — use
        ``predict_batch`` when those are needed. ``species_mask``:
        optional per-call bool [num_species] candidate mask (one species
        list for the whole recording; composes with the build-time
        :meth:`ClassifierBuilder.species_list` mask).
        """
        mask = self._validate_call_mask(species_mask)
        eng = self._streaming_engine()
        conf, idx, times = eng.analyze(
            samples, overlap_seconds, options, species_mask=mask
        )
        out = []
        for i in range(conf.shape[0]):
            preds = self._mask_preds(top_k_from_device(
                conf[i], idx[i], self._labels, self._min_confidence
            ), mask)
            out.append((float(times[i]), preds))
        return out

    def _validate_call_mask(self, species_mask):
        if species_mask is None:
            return None
        mask = np.asarray(species_mask, dtype=bool).reshape(-1)
        if mask.shape[0] != self._config.num_species:
            raise InputSizeError(
                expected=self._config.num_species, got=mask.shape[0]
            )
        return mask

    def analyze_samples_iter(
        self,
        samples,
        overlap_seconds: float = 0.0,
        options: Optional[InferenceOptions] = None,
        chunk_segments: Optional[int] = None,
        species_mask: Optional[np.ndarray] = None,
    ):
        """Generator variant of :meth:`analyze_samples`: yields
        ``(start_time, predictions)`` chunk by chunk, so callers see partial
        results before the whole recording finishes and cancellation between
        chunks loses at most one chunk of output (the CLI uses this)."""
        from .compiler.stream import MAX_TILES

        mask = self._validate_call_mask(species_mask)
        eng = self._streaming_engine()
        samples = np.asarray(samples)
        S = self._config.sample_count
        step = S - int(overlap_seconds * self._config.sample_rate)
        if step <= 0:
            from .errors import InferenceError

            raise InferenceError("overlap must be smaller than the segment duration")
        n_total = samples.shape[0]
        n_segments = -(-n_total // step) if n_total else 0
        if chunk_segments is None:
            chunk_segments = MAX_TILES * eng.tile
        for seg0 in range(0, n_segments, chunk_segments):
            seg1 = min(seg0 + chunk_segments, n_segments)
            lo = seg0 * step
            hi = (seg1 - 1) * step + S
            conf, idx, times = eng.analyze(
                samples[lo:hi], overlap_seconds, options,
                n_segments=seg1 - seg0, species_mask=mask,
            )
            t0 = lo / self._config.sample_rate
            for i in range(conf.shape[0]):
                preds = self._mask_preds(top_k_from_device(
                    conf[i], idx[i], self._labels, self._min_confidence
                ), mask)
                yield (t0 + float(times[i]), preds)

    def analyze_wav(
        self,
        path,
        overlap_seconds: float = 0.0,
        options: Optional[InferenceOptions] = None,
        resample: bool = False,
        species_mask: Optional[np.ndarray] = None,
    ):
        """One-call WAV analysis: read (raw int16), validate the sample rate
        (optionally resampling on device), and stream the whole recording.
        Returns ``list[(start_time_seconds, list[Prediction])]`` — the
        library form of the reference CLI's end-to-end flow
        (birdnet-analyze.rs:275-650)."""
        from .errors import AudioFormatError
        from .utils.audio_io import read_wav

        samples, rate, _ = read_wav(path, dtype="int16")
        if rate != self._config.sample_rate:
            if not resample:
                raise AudioFormatError(
                    f"model expects {self._config.sample_rate} Hz audio, WAV is "
                    f"{rate} Hz (pass resample=True to convert)"
                )
            from .ops.resample import resample_audio

            samples = resample_audio(
                samples, rate, self._config.sample_rate, out_dtype=np.int16
            )
        return self.analyze_samples(
            samples, overlap_seconds, options, species_mask=species_mask
        )

    def embed_samples(
        self,
        samples,
        overlap_seconds: float = 0.0,
        options: Optional[InferenceOptions] = None,
    ):
        """Bulk embedding extraction over a full recording (v3.0/Perch):
        streams audio through the device pipeline and returns
        ``(embeddings [N, E], start_times [N])`` — the scale-out version of
        the per-segment ``PredictionResult.embeddings``."""
        eng = self._streaming_engine()
        _, _, times, emb = eng.analyze(
            samples, overlap_seconds, options, with_embeddings=True
        )
        return emb, times

    # -- helpers -------------------------------------------------------------

    def _mask_preds(self, predictions, row_mask=None):
        """Drop species-mask stragglers: when top-K exceeds the allowed-set
        size, masked (-inf logit) entries surface with confidence 0 — the
        device mask guarantees allowed species fill the top-K first.
        ``row_mask`` additionally applies a per-request candidate mask."""
        if self._species_mask is None and row_mask is None:
            return predictions

        def allowed(i: int) -> bool:
            if self._species_mask is not None and not (
                i < len(self._species_mask) and self._species_mask[i]
            ):
                return False
            if row_mask is not None and not (
                i < len(row_mask) and row_mask[i]
            ):
                return False
            return True

        return [p for p in predictions if allowed(p.index)]

    def _result(self, conf, idx, logits, emb, row_mask=None) -> PredictionResult:
        predictions = self._mask_preds(top_k_from_device(
            conf, idx, self._labels, self._min_confidence
        ), row_mask)
        embeddings = None
        if emb is not None and self._config.model_type.has_embeddings:
            embeddings = np.asarray(emb)
        return PredictionResult(
            model_type=self._config.model_type,
            predictions=predictions,
            embeddings=embeddings,
            raw_scores=np.asarray(logits),
        )
