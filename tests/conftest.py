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

# Persistent compile cache from the FIRST test: previously the cache only
# switched on mid-suite when a CLI test happened to call
# enable_compile_cache (process-wide, ~/.cache/saragan_jax_cache), which
# is how warm full-suite runs reached ~14 min vs the 49-92 min cold
# figure.  Enabling it here makes that deterministic — the heavy early
# modules (test_2d_end_to_end, trainer end-to-ends) reuse their compiled
# executables across runs.  SARAGAN_COMPILE_CACHE=0 opts out.
from saragan_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()


# --- smoke tier (VERDICT r3 item 8) -------------------------------------
# `python -m pytest tests/ -m smoke -q` runs the ops/losses/step/trainer
# essentials: ~4-6 min on the 1-core dev host (measured 386 s for the
# module part under load), vs 44-92 min for the full suite.  Keep the set
# small and load-bearing; the full suite remains the merge gate.
_SMOKE_MODULES = {
    "test_ops",              # op library vs numpy oracles + 2nd-order grads
    "test_losses_and_step",  # WGAN-GP algebra, fused_grads/batched_passes equalities
    "test_schedules",        # LR schedule math
    "test_models_pgan",      # flagship model param parity
}
_SMOKE_TESTS = {
    # trainer essentials without the long end-to-end files
    "test_alpha_fades_linearly_then_zero",
    "test_periodic_checkpoint_cadence",
    "test_interrupt_writes_resume_checkpoint_and_resumes",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "smoke: <5-min essential subset (ops/losses/step/trainer) — "
        "run with -m smoke; full suite stays the merge gate",
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1] if item.module else ""
        if mod in _SMOKE_MODULES or item.name.split("[")[0] in _SMOKE_TESTS:
            item.add_marker(pytest.mark.smoke)


@pytest.fixture
def rng():
    import jax

    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
