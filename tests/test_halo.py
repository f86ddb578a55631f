"""Spatial (halo) sharding tests: explicit shard_map halo conv matches a
plain conv, and a fully spatially-sharded train step matches the unsharded
one — XLA's GSPMD halo exchange validated end to end through the WGAN-GP
double-backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from saragan_tpu.config import Config
from saragan_tpu.models import get_architecture
from saragan_tpu.parallel import jit_train_step, make_mesh, replicated_sharding
from saragan_tpu.parallel.halo import halo_conv3d, volume_sharding, with_spatial_sharding
from saragan_tpu.train import init_train_state, make_train_step


def test_halo_conv_matches_plain():
    mesh = make_mesh(num_data=1, num_space=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8, 8))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 3, 5)) * 0.1
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NCDHW", "DHWIO", "NCDHW"))
    expected = jax.lax.conv_general_dilated(x, w, (1, 1, 1), "SAME", dimension_numbers=dn)
    with jax.sharding.set_mesh(mesh):
        got = halo_conv3d(x, w, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=2e-4, atol=1e-5)


def test_halo_conv_1x1():
    mesh = make_mesh(num_data=1, num_space=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 4, 4, 4))
    w = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 1, 2, 2))
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NCDHW", "DHWIO", "NCDHW"))
    expected = jax.lax.conv_general_dilated(x, w, (1, 1, 1), "SAME", dimension_numbers=dn)
    with jax.sharding.set_mesh(mesh):
        got = halo_conv3d(x, w, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=2e-4, atol=1e-5)


def tiny_cfg():
    return Config(
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
    ).finalize()


def test_spatially_sharded_train_step_matches_single_device():
    """data=2 x space=4 mesh: batch sharded on N, volume depth sharded on D.
    The updated parameters must match the single-device step bit-for-bit
    (up to fp accumulation order)."""
    cfg = tiny_cfg()
    arch = get_architecture("pgan")
    batch = np.random.default_rng(0).normal(size=(4, 1, 8, 8, 8)).astype(np.float32)
    step_rng = jax.random.PRNGKey(42)

    state1, (g_opt, d_opt) = init_train_state(arch, jax.random.PRNGKey(0), phase=2, cfg=cfg)
    step1 = jit_train_step(make_train_step(arch, cfg, 2, g_opt, d_opt), None, 5, donate=False)
    out1, m1 = step1(state1, jnp.asarray(batch), step_rng, 0.5, 1e-3, 1e-3)

    mesh = make_mesh(num_data=2, num_space=4)
    stateN, _ = init_train_state(arch, jax.random.PRNGKey(0), phase=2, cfg=cfg)
    stateN = jax.device_put(stateN, replicated_sharding(mesh))
    stepN = jit_train_step(
        make_train_step(arch, cfg, 2, g_opt, d_opt), mesh, 5, donate=False, space_axis=2
    )
    sharded = jax.device_put(batch, volume_sharding(mesh))
    outN, mN = stepN(stateN, sharded, step_rng, 0.5, 1e-3, 1e-3)

    np.testing.assert_allclose(float(m1.disc_loss), float(mN.disc_loss), rtol=1e-4)
    for k in out1.g_params:
        np.testing.assert_allclose(
            np.asarray(out1.g_params[k]), np.asarray(outN.g_params[k]), rtol=1e-3, atol=1e-5
        )


def test_2d_spatial_decomposition_matches_single_device():
    """data=2 x space=2 x space2=2 mesh (the pod-scale 2D halo layout:
    depth on 'space', height on 'space2'): the full WGAN-GP train step must
    match the single-device step — GSPMD inserts halo exchanges on BOTH
    sharded spatial axes, through the double-backward."""
    cfg = tiny_cfg()
    arch = get_architecture("pgan")
    batch = np.random.default_rng(0).normal(size=(4, 1, 8, 8, 8)).astype(np.float32)
    step_rng = jax.random.PRNGKey(42)

    state1, (g_opt, d_opt) = init_train_state(arch, jax.random.PRNGKey(0), phase=2, cfg=cfg)
    step1 = jit_train_step(make_train_step(arch, cfg, 2, g_opt, d_opt), None, 5, donate=False)
    out1, m1 = step1(state1, jnp.asarray(batch), step_rng, 0.5, 1e-3, 1e-3)

    mesh = make_mesh(num_data=2, num_space=2, num_space2=2)
    assert mesh.axis_names == ("data", "space", "space2")
    stateN, _ = init_train_state(arch, jax.random.PRNGKey(0), phase=2, cfg=cfg)
    stateN = jax.device_put(stateN, replicated_sharding(mesh))
    stepN = jit_train_step(
        make_train_step(arch, cfg, 2, g_opt, d_opt), mesh, 5, donate=False, space_axis=2
    )
    sharded = jax.device_put(batch, volume_sharding(mesh))
    # the input really is sharded on D and H
    spec = sharded.sharding.spec
    assert spec[2] == "space" and spec[3] == "space2", spec
    outN, mN = stepN(stateN, sharded, step_rng, 0.5, 1e-3, 1e-3)

    np.testing.assert_allclose(float(m1.disc_loss), float(mN.disc_loss), rtol=1e-4)
    for k in out1.g_params:
        np.testing.assert_allclose(
            np.asarray(out1.g_params[k]), np.asarray(outN.g_params[k]), rtol=1e-3, atol=1e-5
        )
    # D params carry Adam's sign-boundary amplification: the first update is
    # exactly lr*sign(g), so a bitwise reassociation difference in a
    # near-zero gradient becomes a 2*lr (=2e-3) jump (same float chaos
    # documented for batched_passes in __graft_entry__).  The bound below is
    # loose enough for that, tight enough to catch a real halo error (which
    # would corrupt whole gradient slabs, not isolated sign boundaries).
    for k in out1.d_params:
        np.testing.assert_allclose(
            np.asarray(out1.d_params[k]), np.asarray(outN.d_params[k]), rtol=1e-2, atol=2.5e-3
        )


def test_with_spatial_sharding_noop_without_space():
    mesh = make_mesh(num_data=8, num_space=1)
    x = jnp.zeros((2, 1, 4, 4, 4))
    assert with_spatial_sharding(None, x) is x
    assert with_spatial_sharding(mesh, x) is x


@pytest.fixture
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def test_halo_conv_f64_exactness_sp4(x64):
    """Boundary-bug discriminator (VERDICT r3 item 4): in float64,
    reassociation error collapses ~1e9x (eps 2.2e-16 vs 1.2e-7) while a
    genuine halo bug (wrong neighbor slice, edge padding) injects
    precision-INDEPENDENT O(1) value errors.  sp=4 over depth 8 — each
    shard holds 2 slices and the radius-1 halo imports half its input,
    the exact regime of the dp2xsp4 dryrun — must match the unsharded
    conv to ~1e-12."""
    mesh = make_mesh(num_data=1, num_space=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8, 8), dtype=jnp.float64)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 3, 5), dtype=jnp.float64) * 0.1
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NCDHW", "DHWIO", "NCDHW"))
    expected = jax.lax.conv_general_dilated(x, w, (1, 1, 1), "SAME", dimension_numbers=dn)
    with jax.sharding.set_mesh(mesh):
        got = halo_conv3d(x, w, mesh)
    assert got.dtype == jnp.float64
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-12)


@pytest.mark.parametrize(
    "k,sp,depth",
    [
        (5, 2, 8),  # radius 2, 4-slice shards
        (5, 4, 8),  # radius 2 == shard depth 2 (halo imports whole shards)
        (7, 2, 8),  # radius 3, 4-slice shards
        (7, 4, 16),  # radius 3, 4-slice shards on a wider mesh
    ],
)
def test_halo_conv_f64_exactness_radius2plus(x64, k, sp, depth):
    """VERDICT r4 item 4: NAS can pick kernels 5-7 (reference
    optuna_suggestions.py:235-276) but every halo oracle used radius 1.
    f64 exactness of the explicit shard_map halo conv for radius >= 2 —
    wider slabs, including the radius == shard-depth edge where the halo
    imports a full neighbor shard."""
    mesh = make_mesh(num_data=1, num_space=sp)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, depth, 8, 8), dtype=jnp.float64)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, 3, 3, 3, 5), dtype=jnp.float64) * 0.1
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NCDHW", "DHWIO", "NCDHW"))
    expected = jax.lax.conv_general_dilated(x, w, (1, 1, 1), "SAME", dimension_numbers=dn)
    with jax.sharding.set_mesh(mesh):
        got = halo_conv3d(x, w, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-12)


def test_halo_radius_exceeding_shard_depth_raises():
    """The guard at parallel/halo.py: radius > local shard depth would need
    second-neighbor exchanges; it must raise, not silently clamp."""
    mesh = make_mesh(num_data=1, num_space=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 8, 8, 8))  # shards of 2
    w = jax.random.normal(jax.random.PRNGKey(1), (7, 3, 3, 2, 2)) * 0.1  # radius 3
    with jax.sharding.set_mesh(mesh):
        with pytest.raises(ValueError, match="halo radius"):
            halo_conv3d(x, w, mesh)


@pytest.mark.parametrize("k,sp", [(5, 2), (5, 4), (7, 2), (7, 4)])
def test_gspmd_depth_sharded_conv_grads_f64_radius2plus(x64, k, sp):
    """The production path for NAS kernels 5-7: depth-sharded batch through
    jit/GSPMD — XLA's partitioner must assemble multi-slab halos (for
    sp=4 over depth 16, a k=7 halo spans most of a neighbor shard) in the
    forward AND the transpose.  f64, vs single device, 1e-11."""
    from saragan_tpu.parallel.mesh import batch_sharding

    mesh = make_mesh(num_data=2, num_space=sp)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 3, 16, 8, 8), dtype=jnp.float64)
    w1 = jax.random.normal(jax.random.PRNGKey(1), (k, 3, 3, 3, 5), dtype=jnp.float64) * 0.1
    w2 = jax.random.normal(jax.random.PRNGKey(2), (k, 3, 3, 5, 4), dtype=jnp.float64) * 0.1

    def loss(x, w1, w2):
        dn1 = jax.lax.conv_dimension_numbers(x.shape, w1.shape, ("NCDHW", "DHWIO", "NCDHW"))
        y = jax.lax.conv_general_dilated(x, w1, (1, 1, 1), "SAME", dimension_numbers=dn1)
        y = jnp.where(y > 0, y, 0.2 * y)
        dn2 = jax.lax.conv_dimension_numbers(y.shape, w2.shape, ("NCDHW", "DHWIO", "NCDHW"))
        z = jax.lax.conv_general_dilated(y, w2, (1, 1, 1), "SAME", dimension_numbers=dn2)
        return jnp.sum(z * z), z

    grad_fn = jax.jit(jax.grad(lambda *a: loss(*a)[0], argnums=(0, 1, 2)))
    fwd_fn = jax.jit(lambda *a: loss(*a)[1])

    ref_grads = grad_fn(x, w1, w2)
    ref_fwd = fwd_fn(x, w1, w2)

    xs = jax.device_put(x, batch_sharding(mesh, 5, space_axis=2))
    ws = [jax.device_put(v, replicated_sharding(mesh)) for v in (w1, w2)]
    got_grads = grad_fn(xs, *ws)
    got_fwd = fwd_fn(xs, *ws)

    np.testing.assert_allclose(np.asarray(got_fwd), np.asarray(ref_fwd), atol=1e-11)
    for g, r in zip(got_grads, ref_grads):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-11)


def test_nas_kernel5_spec_through_sharded_train_step():
    """A NAS-style kernel_spec with a 5-kernel layer (the space reference
    optuna_suggestions.py:235-276 searches) through the FULL sharded
    WGAN-GP train step on a dp2 x sp2 mesh: first-step losses must match
    the single-device run at reassociation-ulp scale (the dryrun's
    boundary-bug guard), params to float tolerance."""
    cfg = Config(
        architecture="pgan",
        start_shape="(1, 4, 4, 4)",
        final_shape="(1, 16, 16, 16)",
        latent_dim=16,
        base_batch_size=4,
        kernel_spec=[[[], [3, 3, 3]], [[5, 5, 5], [3, 3, 3]]],
        filter_spec=[[8, 8], [8, 8]],
        loss_fn="wgan",
        noise_stddev=0.0,
        g_lr=1e-3,
        d_lr=1e-3,
    ).finalize()
    arch = get_architecture("pgan")
    batch = np.random.default_rng(0).normal(size=(4, 1, 8, 8, 8)).astype(np.float32)
    step_rng = jax.random.PRNGKey(42)

    state1, (g_opt, d_opt) = init_train_state(arch, jax.random.PRNGKey(0), phase=2, cfg=cfg)
    step1 = jit_train_step(make_train_step(arch, cfg, 2, g_opt, d_opt), None, 5, donate=False)
    out1, m1 = step1(state1, jnp.asarray(batch), step_rng, 0.5, 1e-3, 1e-3)

    mesh = make_mesh(num_data=2, num_space=2)
    stateN, _ = init_train_state(arch, jax.random.PRNGKey(0), phase=2, cfg=cfg)
    stateN = jax.device_put(stateN, replicated_sharding(mesh))
    stepN = jit_train_step(
        make_train_step(arch, cfg, 2, g_opt, d_opt), mesh, 5, donate=False, space_axis=2
    )
    sharded = jax.device_put(batch, volume_sharding(mesh))
    outN, mN = stepN(stateN, sharded, step_rng, 0.5, 1e-3, 1e-3)

    np.testing.assert_allclose(float(m1.disc_loss), float(mN.disc_loss), rtol=1e-4)
    np.testing.assert_allclose(float(m1.gen_loss), float(mN.gen_loss), rtol=1e-4)
    for k in out1.g_params:
        np.testing.assert_allclose(
            np.asarray(out1.g_params[k]), np.asarray(outN.g_params[k]), rtol=1e-3, atol=1e-5
        )


def test_gspmd_depth_sharded_conv_grads_f64_sp4(x64):
    """The dryrun's actual sharding path — depth-sharded batch through
    jit/GSPMD (XLA inserts the halo exchanges) — forward AND gradients
    (the halo transpose) at float64, dp2 x sp4, vs single device.  A halo
    boundary bug in either direction would blow the 1e-11 tolerance by
    ~9 orders of magnitude; reassociation cannot."""
    from saragan_tpu.parallel.mesh import batch_sharding

    mesh = make_mesh(num_data=2, num_space=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 3, 8, 8, 8), dtype=jnp.float64)
    w1 = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 3, 5), dtype=jnp.float64) * 0.1
    w2 = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 3, 5, 4), dtype=jnp.float64) * 0.1

    def loss(x, w1, w2):
        dn1 = jax.lax.conv_dimension_numbers(x.shape, w1.shape, ("NCDHW", "DHWIO", "NCDHW"))
        y = jax.lax.conv_general_dilated(x, w1, (1, 1, 1), "SAME", dimension_numbers=dn1)
        y = jnp.where(y > 0, y, 0.2 * y)  # leaky relu between the convs
        dn2 = jax.lax.conv_dimension_numbers(y.shape, w2.shape, ("NCDHW", "DHWIO", "NCDHW"))
        z = jax.lax.conv_general_dilated(y, w2, (1, 1, 1), "SAME", dimension_numbers=dn2)
        return jnp.sum(z * z), z

    grad_fn = jax.jit(jax.grad(lambda *a: loss(*a)[0], argnums=(0, 1, 2)))
    fwd_fn = jax.jit(lambda *a: loss(*a)[1])

    ref_grads = grad_fn(x, w1, w2)
    ref_fwd = fwd_fn(x, w1, w2)

    xs = jax.device_put(x, batch_sharding(mesh, 5, space_axis=2))
    ws = [jax.device_put(v, replicated_sharding(mesh)) for v in (w1, w2)]
    got_grads = grad_fn(xs, *ws)
    got_fwd = fwd_fn(xs, *ws)

    np.testing.assert_allclose(np.asarray(got_fwd), np.asarray(ref_fwd), atol=1e-11)
    for g, r in zip(got_grads, ref_grads):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-11)
