"""Test harness: force an 8-device virtual CPU mesh and x64.

Multi-device sharding is exercised on host-simulated devices
(xla_force_host_platform_device_count), the TPU-native analogue of
multi-node testing the reference never had (SURVEY.md section 4.6). The
jax.config platform update is required because this image's axon
sitecustomize force-selects the TPU backend over the JAX_PLATFORMS env var.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from vmc_pde_tpu.parallel.mesh import ParallelCtx  # noqa: E402
from vmc_pde_tpu.utils.dtypes import Precision  # noqa: E402


@pytest.fixture(scope="session")
def ctx1():
    """Single-device context."""
    return ParallelCtx.single_device()


@pytest.fixture(scope="session")
def ctx8():
    """Full 8-device dp mesh."""
    return ParallelCtx.create(dp=8)


@pytest.fixture(scope="session")
def ctx42():
    """2D mesh: 4-way sample parallel x 2-way parameter parallel."""
    return ParallelCtx.create(dp=4, tp=2)


@pytest.fixture(scope="session")
def prec64():
    return Precision.f64_everywhere()


@pytest.fixture(scope="session")
def prec32():
    return Precision(compute=np.float32, solve=np.float64, master=np.float64)
