"""Data-parallel training over the virtual 8-device CPU mesh — the JAX
equivalent of the reference's mpirun-based distributed smoke test
(SURVEY §4): sharded batch, replicated params, XLA-inserted gradient
all-reduce, and DP == single-device equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from saragan_tpu.config import Config
from saragan_tpu.models import get_architecture
from saragan_tpu.parallel import (
    batch_sharding,
    jit_train_step,
    make_mesh,
    replicated_sharding,
    shard_global_batch,
)
from saragan_tpu.train import init_train_state, make_train_step


def tiny_cfg(**kw):
    defaults = dict(
        architecture="pgan",
        start_shape="(1, 4, 4, 4)",
        final_shape="(1, 16, 16, 16)",
        latent_dim=16,
        base_batch_size=8,
        kernel_spec=[[[], [3, 3, 3]], [[3, 3, 3], [3, 3, 3]]],
        filter_spec=[[8, 8], [8, 8]],
        loss_fn="wgan",
        noise_stddev=0.0,
        g_lr=1e-3,
        d_lr=1e-3,
    )
    defaults.update(kw)
    return Config(**defaults).finalize()


def test_mesh_construction():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["space"] == 1
    mesh2 = make_mesh(num_data=4, num_space=2)
    assert mesh2.shape["data"] == 4 and mesh2.shape["space"] == 2


def test_sharded_train_step_runs():
    cfg = tiny_cfg()
    arch = get_architecture("pgan")
    mesh = make_mesh()
    state, (g_opt, d_opt) = init_train_state(arch, jax.random.PRNGKey(0), phase=1, cfg=cfg)
    state = jax.device_put(state, replicated_sharding(mesh))
    step = jit_train_step(
        make_train_step(arch, cfg, 1, g_opt, d_opt), mesh, batch_ndim=5, donate=True
    )
    batch = np.random.default_rng(0).normal(size=(8, 1, 4, 4, 4)).astype(np.float32)
    sharded = shard_global_batch(mesh, batch)
    assert sharded.sharding.spec[0] == "data"
    new_state, metrics = step(state, sharded, jax.random.PRNGKey(1), 0.0, 1e-3, 1e-3)
    assert np.isfinite(float(metrics.gen_loss))
    # outputs replicated across the mesh
    assert new_state.g_params["generator/generator_in/dense/weight"].sharding.is_fully_replicated


def test_dp_matches_single_device():
    """The same global batch must produce the same updated params whether the
    step runs on 1 device or sharded over 8 — the all-reduce is exact."""
    cfg = tiny_cfg()
    arch = get_architecture("pgan")
    rng = jax.random.PRNGKey(0)
    batch = np.random.default_rng(0).normal(size=(8, 1, 4, 4, 4)).astype(np.float32)
    step_rng = jax.random.PRNGKey(42)

    # single device
    state1, (g_opt, d_opt) = init_train_state(arch, rng, phase=1, cfg=cfg)
    step1 = jit_train_step(make_train_step(arch, cfg, 1, g_opt, d_opt), None, 5, donate=False)
    out1, m1 = step1(state1, jnp.asarray(batch), step_rng, 0.0, 1e-3, 1e-3)

    # 8-way data parallel
    mesh = make_mesh()
    state8, _ = init_train_state(arch, rng, phase=1, cfg=cfg)
    state8 = jax.device_put(state8, replicated_sharding(mesh))
    step8 = jit_train_step(make_train_step(arch, cfg, 1, g_opt, d_opt), mesh, 5, donate=False)
    out8, m8 = step8(state8, shard_global_batch(mesh, batch), step_rng, 0.0, 1e-3, 1e-3)

    np.testing.assert_allclose(float(m1.disc_loss), float(m8.disc_loss), rtol=1e-5)
    for k in out1.g_params:
        np.testing.assert_allclose(
            np.asarray(out1.g_params[k]), np.asarray(out8.g_params[k]), rtol=1e-4, atol=1e-6
        )


def test_trainer_with_mesh(tmp_path):
    """Full trainer run under an 8-way data mesh (configs[3] smoke analog)."""
    from tests.test_trainer import make_pyramid, tiny_cfg as trainer_cfg

    make_pyramid(tmp_path / "data", n=16)
    cfg = trainer_cfg(tmp_path, base_batch_size=8, mixing_nimg=16, stabilizing_nimg=16)
    from saragan_tpu.train.trainer import Trainer

    mesh = make_mesh()
    tr = Trainer(cfg, mesh=mesh, verbose=False)
    tr.run()
    import os

    assert os.path.isfile(os.path.join(cfg.logdir, "model_2.npz"))


def test_aot_with_options_matches_plain_jit_and_caches():
    """aot_with_options routes through lower().compile(compiler_options) —
    the only flag surface that reaches a relayed remote compiler
    (BASELINE.md 'Phase-8 on one chip' wall #9).  Identity when options
    are None; with options, per-signature executable caching: same-shape
    calls reuse one executable, float values don't recompile (they're
    traced), ints key by value (they may be jit-static)."""
    from saragan_tpu.parallel import aot_with_options

    calls = []

    def f(x, scale, n):
        return x * scale + n

    jitted = jax.jit(f, static_argnums=2)

    class CountingLower:
        def __init__(self, inner):
            self._inner = inner

        def lower(self, *args):
            calls.append(tuple(np.shape(a) for a in args if hasattr(a, "shape")))
            return self._inner.lower(*args)

    assert aot_with_options(jitted, None) is jitted

    wrapped = aot_with_options(CountingLower(jitted), {}, static_argnums=(2,))
    x = jnp.arange(4.0)
    out1 = wrapped(x, 2.0, 1)
    out2 = wrapped(x, 3.0, 1)  # new float VALUE: no recompile
    assert len(calls) == 1
    np.testing.assert_allclose(np.asarray(out2), np.asarray(x) * 3.0 + 1)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(jitted(x, 2.0, 1)))
    wrapped(x, 2.0, 5)  # new int value (static arg): separate executable
    assert len(calls) == 2
    wrapped(jnp.arange(8.0), 2.0, 1)  # new shape: separate executable
    assert len(calls) == 3
    wrapped(jnp.arange(8.0), 7.0, 1)  # cached again
    assert len(calls) == 3

    # a static FLOAT is baked into the executable at lower time — it must
    # key by VALUE, not by type (review fix: a type-keyed cache would
    # silently reuse n=0.5's executable for n=0.25)
    jitted_f = jax.jit(f, static_argnums=2)
    wrapped_f = aot_with_options(CountingLower(jitted_f), {}, static_argnums=(2,))
    base = len(calls)
    r1 = wrapped_f(x, 2.0, 0.5)
    r2 = wrapped_f(x, 2.0, 0.25)
    assert len(calls) == base + 2
    np.testing.assert_allclose(np.asarray(r1), np.asarray(x) * 2.0 + 0.5)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(x) * 2.0 + 0.25)


def test_single_chip_big_volume_preset(monkeypatch):
    """--single_chip_big_volume composes the measured phase-8 recipe
    (BASELINE.md wall-by-wall table): offload remat + unstacked critic
    passes + raised scoped VMEM in the config, layout-safe op gates in
    ops.core — with explicit SARAGAN_* env vars keeping precedence."""
    from saragan_tpu.ops import core as ops_core

    cfg = tiny_cfg(single_chip_big_volume=True)
    assert cfg.remat_offload and not cfg.batched_passes
    # fused transitions' lhs-dilated conv draws a 16x-padded full-res
    # intermediate at phase-8 scale (measured 17.4 GB) — preset turns it off
    assert not cfg.fused_transitions
    assert cfg.scoped_vmem_kib == 65536

    saved = (ops_core.POOL_WINDOW, ops_core.STATS_ACCUM_F32, ops_core.CONV3D_ALGORITHM)
    try:
        monkeypatch.delenv("SARAGAN_POOL", raising=False)
        monkeypatch.delenv("SARAGAN_STATS_DTYPE", raising=False)
        monkeypatch.setenv("SARAGAN_CONV3D", "direct")  # explicit env wins
        ops_core.POOL_WINDOW = False
        ops_core.STATS_ACCUM_F32 = True
        ops_core.CONV3D_ALGORITHM = "direct"
        cfg.apply_runtime_opts()
        assert ops_core.POOL_WINDOW is True
        assert ops_core.STATS_ACCUM_F32 is False
        assert ops_core.CONV3D_ALGORITHM == "direct"  # env precedence held
        # non-preset configs RESTORE the env-derived defaults, so
        # sequential Trainers in one process (HPO trials, phase-chaining
        # drivers) don't inherit a previous preset's op formulations
        ops_core.POOL_WINDOW = True
        ops_core.STATS_ACCUM_F32 = False
        tiny_cfg().apply_runtime_opts()
        assert ops_core.POOL_WINDOW is False
        assert ops_core.STATS_ACCUM_F32 is True
        assert ops_core.CONV3D_ALGORITHM == "direct"  # env precedence held
    finally:
        ops_core.POOL_WINDOW, ops_core.STATS_ACCUM_F32, ops_core.CONV3D_ALGORITHM = saved


def test_resolve_compiler_options_semantics(capsys):
    """-1 = auto, 0 = backend default, >0 = explicit KiB — and the option is
    TPU-only, so on this CPU backend EVERY value resolves to None (explicit
    values warn instead of shipping a doomed compile; the one gate serves
    trainer, bench, and the serving sampler alike)."""
    from saragan_tpu.parallel.mesh import resolve_compiler_options

    assert resolve_compiler_options(0) is None
    assert resolve_compiler_options(-1) is None  # CPU backend under tests
    assert resolve_compiler_options(12345) is None
    assert "dropping scoped_vmem_kib=12345" in capsys.readouterr().out


def test_aot_with_options_on_fail_raise():
    """on_fail='raise' propagates the with-options compile failure — A/B
    sweeps must drop a rejected row, not time the backend default under the
    rejected option's name (scripts/ab_compiler_opts.py)."""
    import jax
    import jax.numpy as jnp
    import pytest

    from saragan_tpu.parallel.mesh import aot_with_options

    fn = aot_with_options(
        jax.jit(lambda x: x * 2.0),
        {"definitely_not_an_xla_option": "1"},
        on_fail="raise",
    )
    with pytest.raises(Exception):
        fn(jnp.ones((4,)))


def test_aot_with_options_falls_back_on_rejected_option(capsys):
    """A compile that rejects its options retries with backend defaults
    instead of failing the run (e.g. the >=64 MB scoped-VMEM settings that
    SIGKILL the relay's compile helper, BASELINE.md round-3 cont.)."""
    import jax
    import jax.numpy as jnp

    from saragan_tpu.parallel.mesh import aot_with_options

    fn = aot_with_options(
        jax.jit(lambda x: x * 2.0),
        {"definitely_not_an_xla_option": "1"},
    )
    out = fn(jnp.ones((4,)))
    assert float(out.sum()) == 8.0
    assert "retrying with backend defaults" in capsys.readouterr().out
