"""Test harness config: force CPU JAX with 8 virtual devices so sharding
tests run without a TPU pod (the driver's dryrun uses the same trick)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config knob
# is authoritative.
jax.config.update("jax_platforms", "cpu")
# NOTE: persistent compilation cache intentionally DISABLED — it served
# stale executables after integrator changes ("supplied 28 buffers but
# compiled program expected 31") and hangs reloaded Pallas kernels on
# the axon TPU plugin. The in-memory executable-dedup cache is disabled
# too: it pairs one variant's argument-pruning metadata with another
# variant's executable when graphs differ only in hoisted constants
# (buffer-count crashes).


import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_MODELS = "/root/reference/models"


@pytest.fixture(scope="session")
def cornell_scene():
    from dustraytracer_tpu.scene import load_scene

    return load_scene(os.path.join(REFERENCE_MODELS, "cornell_box.glb"))


@pytest.fixture(scope="session")
def tri_scene():
    """Tiny two-triangle scene built directly from arrays (no file IO)."""
    from tests.util_scenes import make_tri_scene

    return make_tri_scene()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
