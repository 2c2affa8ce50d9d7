"""Test config: force CPU JAX with a virtual 8-device mesh for sharding tests.

Must run before any jax import (pytest imports conftest first).
"""

import os

# NB: in this environment the axon TPU plugin ignores JAX_PLATFORMS; the
# config.update below is what actually forces CPU.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# torch's oneDNN ops are nondeterministic run-to-run (their own startup
# warning says so); HF-parity reference logits must be reproducible or
# tight-tolerance tests (jamba's mamba recurrence amplifies the noise)
# become flaky. Must be set before torch is first imported.
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
os.environ.setdefault("ONEDNN_MAX_CPU_ISA", "DEFAULT")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE_DIR = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_models_dir():
    d = REFERENCE_DIR / "models"
    if not d.is_dir():
        pytest.skip("reference models dir not available")
    return d
