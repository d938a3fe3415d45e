"""Test configuration: run everything on CPU with 8 fake devices so
mesh/sharding logic is exercised without TPU hardware (SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("BARCODER_TPU_BACKEND", "jax")

# keep on-disk scan/site artifacts out of the user cache; per-session tmp
import tempfile  # noqa: E402

_ART_DIR = tempfile.mkdtemp(prefix="barcoder_tpu_test_artifacts_")
os.environ["BARCODER_TPU_ARTIFACTS"] = _ART_DIR

# the axon TPU plugin ignores JAX_PLATFORMS; force the platform via config
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
