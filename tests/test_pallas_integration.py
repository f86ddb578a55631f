"""Fused-kernel integration: pgan with use_pallas_fusion must match the
unfused model exactly (same params, same outputs, trains one step)."""

import jax
import numpy as np

from saragan_tpu.config import Config
from saragan_tpu.models import get_architecture
from saragan_tpu.train import init_train_state, make_train_step


def cfgs():
    base = dict(
        architecture="pgan",
        start_shape="(1, 4, 4, 4)",
        final_shape="(1, 16, 16, 16)",
        latent_dim=16,
        base_batch_size=4,
        kernel_spec=[[[], [3, 3, 3]], [[3, 3, 3], [3, 3, 3]]],
        filter_spec=[[8, 8], [8, 8]],
        loss_fn="wgan",
        noise_stddev=0.0,
        g_lr=1e-3,
        d_lr=1e-3,
    )
    return (
        Config(**base, use_pallas_fusion=False).finalize(),
        Config(**base, use_pallas_fusion=True).finalize(),
    )


def test_fused_pgan_matches_unfused():
    cfg, cfg_f = cfgs()
    arch = get_architecture("pgan")
    params = arch.init(jax.random.PRNGKey(0), phase=2, cfg=cfg)
    params_f = arch.init(jax.random.PRNGKey(0), phase=2, cfg=cfg_f)
    assert set(params) == set(params_f)  # same parameter tree
    z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.latent_dim))
    a = arch.generator(params, z, 0.5, phase=2, cfg=cfg)
    b = arch.generator(params, z, 0.5, phase=2, cfg=cfg_f)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_fused_pgan_trains():
    _, cfg_f = cfgs()
    arch = get_architecture("pgan")
    state, (g_opt, d_opt) = init_train_state(arch, jax.random.PRNGKey(0), phase=2, cfg=cfg_f)
    step = jax.jit(make_train_step(arch, cfg_f, 2, g_opt, d_opt))
    real = jax.random.normal(jax.random.PRNGKey(4), (4, 1, 8, 8, 8))
    new_state, metrics = step(state, real, jax.random.PRNGKey(5), 0.5, 1e-3, 1e-3)
    assert np.isfinite(float(metrics.gen_loss))
    assert np.isfinite(float(metrics.disc_loss))
