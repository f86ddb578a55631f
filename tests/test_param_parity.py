"""Parameter-count goldens at the reference's LIDC-IDRI run configuration.

NB the reference's out.txt printed G=2.69M at phase 5, but that log predates
the kernel_spec/filter_spec refactor (its filter policy is the commented-out
`num_filters` at networks/ops.py:195-198 and no longer exists in the
snapshot); the CURRENT reference code sized by the num_filters tables +
adaptive get_kernel is what these goldens pin.  tests/test_models_pgan.py
additionally verifies the count formula by hand for a tiny spec.
"""

import jax
import pytest

from saragan_tpu.config import Config
from saragan_tpu.core import param_count
from saragan_tpu.models import get_architecture


@pytest.fixture(scope="module")
def lidc_cfg():
    return Config(
        architecture="pgan",
        start_shape="(1, 1, 4, 4)",
        final_shape="(1, 128, 512, 512)",
        latent_dim=512,
        network_size="xs",
        noise_stddev=0.0,
        g_lr=1e-3,
        d_lr=1e-3,
    ).finalize()


def test_adaptive_kernel_spec(lidc_cfg):
    """Derived kernels shrink to fit small spatial dims (reference
    ops.py:31-58): D=1 at phase 1 -> [1,3,3]; full [3,3,3] from phase 3."""
    ks = lidc_cfg.resolved_kernel_spec()
    assert ks[0] == [[], [1, 3, 3]]
    assert ks[1] == [[1, 3, 3], [1, 3, 3]]
    assert ks[2] == [[3, 3, 3], [3, 3, 3]]
    fs = lidc_cfg.resolved_filter_spec()
    assert fs[0] == [256, 256] and fs[4] == [32, 32]


def test_param_count_goldens(lidc_cfg):
    arch = get_architecture("pgan")
    golden = {
        5: (4728994, 4726241),
        6: (4749714, 4746929),
    }
    for phase, (g_gold, d_gold) in golden.items():
        params = arch.init(jax.random.PRNGKey(0), phase=phase, cfg=lidc_cfg)
        assert param_count(params, "generator") == g_gold, phase
        assert param_count(params, "discriminator") == d_gold, phase
