"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the JAX equivalent of the reference's "launch dataset.py under mpirun
to test multi-rank behavior" (reference SURFGAN_3D/dataset.py:357-395): we
simulate an 8-chip TPU slice with host-platform devices so sharding and
collectives are exercised without hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Match the reference's fp32 numerics in tests; production TPU runs use the
# default (bf16-on-MXU) precision via bf16 activations.
jax.config.update("jax_default_matmul_precision", "highest")

# The image's sitecustomize pins jax_platforms to "axon,cpu" (the tunneled
# TPU); tests must run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")


@pytest.fixture
def rng():
    import jax

    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
