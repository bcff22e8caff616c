"""Test configuration: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding paths are validated on virtual CPU devices (the driver
separately dry-runs the multichip path); kernels are written for TPU but are
platform-portable under jit.
"""

import os

# The environment's sitecustomize force-registers the tunneled 'axon' TPU
# backend via JAX_PLATFORMS=axon; override BOTH the env var and the config
# (the sitecustomize prepends axon to the config) so tests run on local CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

from merfish3d_tpu.utils.jaxcache import enable_persistent_cache

# hundreds of jitted programs recompile identically on every pytest run;
# the persistent cache turns rerun compile time into disk loads
enable_persistent_cache()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def pytest_addoption(parser):
    parser.addoption(
        "--run-f1-exhaustive",
        action="store_true",
        default=False,
        help="run the exhaustive F1 matrix (decon at coarse axial spacings)",
    )
    parser.addoption(
        "--run-f1-production",
        action="store_true",
        default=False,
        help=(
            "run the full production-geometry case (2x(16,1024,1024) "
            "tiles, deformable + chromatic; ~1h on a single CPU core)"
        ),
    )
