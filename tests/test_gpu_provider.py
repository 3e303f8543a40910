"""GPU provider status: accepted at the surface, fails *cleanly* when absent.

The framework is TPU-first; GPU gets no tuned kernels (README "GPU status").
These tests pin the contract that requesting a GPU without hardware produces
a typed, actionable error — never silent CPU fallback or a raw traceback
(reference: src/execution_providers.rs:35-58 reports per-provider
availability; src/classifier.rs device selection errors on unavailable EPs).

CI tier: runs on the cpu platform (conftest pins JAX_PLATFORMS=cpu), where no
GPU exists by construction.
"""

import numpy as np
import pytest

from birdnet_tpu.errors import BirdnetError, RuntimeInitError
from birdnet_tpu.execution_providers import is_device_available
from birdnet_tpu.runtime import default_device


def _gpu_present() -> bool:
    return is_device_available("gpu")


@pytest.fixture(scope="module")
def gpu_fixtures(tmp_path_factory):
    from birdnet_tpu.models import birdnet_v24
    from birdnet_tpu.utils.audio_io import write_wav

    d = tmp_path_factory.mktemp("gpu_smoke")
    model = d / "v24_tiny.onnx"
    birdnet_v24.save_tiny(model, num_species=10)
    labels_file = d / "labels.txt"
    labels = [f"species_{i}" for i in range(10)]
    labels_file.write_text("\n".join(labels), encoding="utf-8")
    wav = d / "audio.wav"
    sig = 0.2 * np.sin(
        2 * np.pi * 800 * np.arange(48_000 * 3) / 48_000
    ).astype(np.float32)
    write_wav(wav, sig, 48_000)
    return str(model), labels, str(labels_file), str(wav)


def test_is_device_available_gpu_false_on_cpu_ci():
    if _gpu_present():  # pragma: no cover - only on GPU machines
        pytest.skip("a real GPU is attached")
    assert is_device_available("gpu") is False


def test_default_device_gpu_raises_typed_error():
    if _gpu_present():  # pragma: no cover
        pytest.skip("a real GPU is attached")
    with pytest.raises(RuntimeInitError) as ei:
        default_device("gpu")
    msg = str(ei.value).lower()
    assert "gpu" in msg
    # RuntimeInitError must stay inside the taxonomy so callers can catch
    # one base class (reference: src/error.rs single error enum).
    assert isinstance(ei.value, BirdnetError)


def test_builder_with_device_gpu_raises_not_falls_back(gpu_fixtures):
    if _gpu_present():  # pragma: no cover
        pytest.skip("a real GPU is attached")
    from birdnet_tpu import Classifier

    model, labels, _labels_file, _wav = gpu_fixtures
    with pytest.raises(BirdnetError):
        (
            Classifier.builder()
            .model_path(model)
            .labels(labels)
            .with_device("gpu")
            .build()
        )


def test_cli_provider_gpu_exits_nonzero_with_message(gpu_fixtures, capsys):
    if _gpu_present():  # pragma: no cover
        pytest.skip("a real GPU is attached")
    from birdnet_tpu.cli import main

    model, _labels, labels_file, wav = gpu_fixtures
    rc = main(["-m", model, "-l", labels_file, "--provider", "gpu", wav])
    assert rc == 1
    err = capsys.readouterr().err.lower()
    assert "gpu" in err


def test_list_providers_marks_gpu_unavailable(capsys):
    if _gpu_present():  # pragma: no cover
        pytest.skip("a real GPU is attached")
    from birdnet_tpu.cli import main

    rc = main(["--list-providers"])
    assert rc == 0
    out = capsys.readouterr().out
    # The matrix must mention the GPU row and not mark it available.
    gpu_lines = [l for l in out.splitlines() if "gpu" in l.lower()]
    assert gpu_lines, f"no GPU row in provider listing:\n{out}"
    assert not any("✓" in l for l in gpu_lines)
