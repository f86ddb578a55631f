"""GAN losses: WGAN-GP and non-saturating logistic, with instance noise.

Re-design of /root/reference/SURFGAN_3D/networks/loss.py.  The gradient
penalty differentiates the discriminator w.r.t. its *input* inside the loss;
the optimizer then differentiates the loss w.r.t. the discriminator's
*parameters* — grad-of-grad, which JAX composes natively (jax.grad of a
function containing jax.grad).  On TPU the double-backward of the conv stack
is just more MXU work in the same XLA program; nothing special is needed.

Per-sample GP gradients are obtained as ``jax.grad(sum(D(x)))``.  For
batchwise-independent discriminators (pgan's minibatch-stddev head is
disabled, reference discriminator.py:50) this IS the per-sample gradient;
for architectures that do use minibatch_stddev (surfgan), the slopes pick up
cross-sample terms through the group-stddev channel — exactly as the
reference's ``tf.gradients(D(interp), interp)`` does (loss.py:136-140), so
numerics agree; it is just not a strictly per-sample Lipschitz penalty
there.

Reference quirk preserved: `forward_simultaneous` reduces the GP norm over
axes (1, 2, 3) (reference loss.py:140 — for 3D volumes this *drops the last
spatial axis*, yielding a per-(sample, W-slice) penalty that broadcasts
against the (N, 1) critic scores), while `forward_discriminator` reduces over
all non-batch axes (loss.py:79).  ``gp_full_reduction=True`` opts into the
standard full reduction everywhere.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


def _softplus(x):
    return jax.nn.softplus(x)


def _instance_noise(rng, x, noise_stddev):
    if noise_stddev:
        return x + jax.random.normal(rng, x.shape, x.dtype) * jnp.asarray(noise_stddev, x.dtype)
    return x


def _slopes_from_grads(grads: jax.Array, axes) -> jax.Array:
    """||g|| reduced over `axes` in f32 — the single definition of the GP
    slope norm, shared by every gradient-penalty formulation below."""
    return jnp.sqrt(jnp.sum(jnp.square(grads.astype(jnp.float32)), axis=axes))


def _gp_slopes(disc_fn, d_params, interp, axes) -> jax.Array:
    """||d D(x)/d x|| per sample over `axes` (second-order differentiable)."""
    grads = jax.grad(lambda xi: jnp.sum(disc_fn(d_params, xi)).astype(jnp.float32))(interp)
    return _slopes_from_grads(grads, axes)


def _simultaneous_axes(ndim: int, full: bool) -> Tuple[int, ...]:
    if full:
        return tuple(range(1, ndim))
    # reference loss.py:140: literal (1, 2, 3)
    return tuple(a for a in (1, 2, 3) if a < ndim)


class LossOutput(NamedTuple):
    gen_loss: jax.Array
    disc_loss: jax.Array
    gp_loss: jax.Array
    gen_sample: jax.Array


def forward_simultaneous(
    gen_fn: Callable,
    disc_fn: Callable,
    g_params,
    d_params,
    real_image_input: jax.Array,
    rng: jax.Array,
    *,
    latent_dim: int,
    loss_fn: str = "wgan",
    gp_weight: float = 1.0,
    noise_stddev: float = 0.0,
    gp_full_reduction: bool = False,
    compute_gp: bool = True,
    gp_disc_fn: Optional[Callable] = None,
) -> LossOutput:
    """Joint G+D forward (reference loss.py:101-165).

    gp_disc_fn, when given, replaces disc_fn INSIDE the gradient-penalty
    term only (same function, different remat wrapping — exact).  Used by
    cfg.remat_offload: XLA's host-offload pass cannot place offloaded
    residuals inside the GP's double-backward ("moved to host ... returned
    from the entry computation" compile error, bisected on hardware —
    scripts/offload_bisect.py), so the GP pass runs under plain recompute
    remat while the first-order passes keep host offload.

    gen_fn(params, z, rng) -> images; disc_fn(params, x) -> (N, 1) scores
    (alpha and phase already bound by the caller; rng feeds per-layer noise /
    style mixing in the style-family generators and is ignored by pgan).
    Returns losses such that grad w.r.t. g_params gives the reference's
    generator gradients and grad w.r.t. d_params the discriminator's:
    disc_fake_d / interp use stop_gradient on the generator sample, and the
    generator's critic pass uses stop_gradient on d_params, so
    ``gen_loss + disc_loss`` backpropagates exactly like the reference's two
    separate minimizations.
    """
    k_z, k_g, k_nr, k_nf, k_gamma = jax.random.split(rng, 5)
    n = real_image_input.shape[0]
    dtype = real_image_input.dtype

    z = jax.random.normal(k_z, (n, latent_dim), dtype)
    gen_sample = gen_fn(g_params, z, k_g)

    real = _instance_noise(k_nr, real_image_input, noise_stddev)
    fake = _instance_noise(k_nf, gen_sample, noise_stddev)
    fake_sg = jax.lax.stop_gradient(fake)

    disc_fake_d = disc_fn(d_params, fake_sg)
    disc_real = disc_fn(d_params, real)

    if compute_gp:
        gamma = jax.random.uniform(k_gamma, (n,) + (1,) * (real.ndim - 1), dtype)
        interpolates = gamma * real + (1 - gamma) * fake_sg
        axes = _simultaneous_axes(real.ndim, gp_full_reduction)
        slopes = _gp_slopes(gp_disc_fn or disc_fn, d_params, interpolates, axes)

    # Generator pass through a gradient-blocked critic: same values, but the
    # combined scalar's d_params-gradient stays the reference's disc-only one.
    d_params_sg = jax.tree_util.tree_map(jax.lax.stop_gradient, d_params)
    disc_fake_g = disc_fn(d_params_sg, fake)

    disc_fake_d = disc_fake_d.astype(jnp.float32)
    disc_real = disc_real.astype(jnp.float32)
    disc_fake_g = disc_fake_g.astype(jnp.float32)

    if loss_fn == "wgan":
        if compute_gp:
            gradient_penalty = (slopes - 1.0) ** 2
            gp_loss = gp_weight * gradient_penalty
            if gp_loss.ndim == 1:
                # full reduction leaves per-sample (N,) slopes; pair them with
                # the (N, 1) scores instead of broadcasting to (N, N) (the
                # mean would coincidentally agree, but N^2 terms materialize
                # and any non-mean reduction would be wrong)
                gp_loss = gp_loss[:, None]
        else:
            gp_loss = jnp.zeros((), jnp.float32)
        drift_loss = 1e-3 * disc_real**2
        disc_loss = jnp.mean(disc_fake_d - disc_real + gp_loss + drift_loss)
        gen_loss = -jnp.mean(disc_fake_g)
    elif loss_fn == "logistic":
        if compute_gp:
            gradient_penalty = jnp.mean(slopes**2)
            gp_loss = gp_weight * gradient_penalty
        else:
            gp_loss = jnp.zeros((), jnp.float32)
        disc_loss = jnp.mean(_softplus(disc_fake_d)) + jnp.mean(_softplus(-disc_real)) + gp_loss
        gen_loss = jnp.mean(_softplus(-disc_fake_g))
    else:
        raise ValueError(f"Unknown loss function: {loss_fn}")

    return LossOutput(gen_loss, disc_loss, jnp.mean(gp_loss), gen_sample)


def grads_simultaneous(
    gen_fn: Callable,
    disc_fn: Callable,
    g_params,
    d_params,
    real_image_input: jax.Array,
    rng: jax.Array,
    *,
    latent_dim: int,
    gp_weight: float = 1.0,
    noise_stddev: float = 0.0,
    gp_full_reduction: bool = False,
    compute_gp: bool = True,
    gp_grad_mode: str = "revrev",
    batched_passes: bool = False,
    gp_disc_fn: Optional[Callable] = None,
) -> Tuple[Tuple[Any, Any], LossOutput]:
    """WGAN simultaneous gradients with the fake critic pass SHARED.

    Mathematically identical to ``jax.grad(gen_loss + disc_loss)`` over
    `forward_simultaneous` (WGAN branch), but assembled from per-term vjps so
    the discriminator runs over the fake batch ONCE instead of twice:

    * the reference evaluates D(fake) twice per step — once inside the
      generator loss and once inside the discriminator loss (reference
      loss.py:110-117; `forward_simultaneous` mirrors it with a
      stop_gradient pair).  XLA CSEs the duplicate *forward*, but the two
      *backwards* through D (cotangents -1/N for G's path, +1/N for D's
      path) are separate programs.  For the WGAN loss those cotangents are
      exactly proportional, so ONE joint grad of mean(D(fake(G(z)))) w.r.t.
      (g_params, d_params) yields both: g_grads = -that, d_fake_grads =
      +that.  This removes one full D backward from the hot step.
    * the real-scores term (critic + drift) and the gradient penalty are
      independent d-only grads, summed in.

    Only valid for loss_fn == 'wgan' (the logistic loss applies different
    nonlinearities to the two fake-score paths, so their cotangents are not
    proportional and sharing saves nothing).  Returns
    ``((g_grads, d_grads), LossOutput)`` with the same reported losses as
    `forward_simultaneous` (floating-point association differs).

    gp_grad_mode selects the ALGEBRA of the penalty's parameter gradient
    (both are exact; floating-point association differs):

    * ``'revrev'`` (default): reverse-over-reverse — jax.grad of a function
      whose body contains the inner jax.grad, the textbook grad-of-grad.
    * ``'revfwd'``: reverse-over-forward.  With g = dD/dx at the
      interpolates and P(g) the penalty, dP/dtheta = (dg/dtheta)^T P'(g);
      freezing c = P'(g) (stop_gradient: the true gradient has NO term
      through c — d/dtheta P(g(theta)) = P'(g)·dg/dtheta exactly), the
      identity <c, dD/dx> = jvp of D at x in direction c turns the penalty
      gradient into jax.grad of a *forward-mode* directional derivative:
      one fwd+bwd for g, then reverse through a jvp instead of reverse
      through the inner reverse.  Same math, different XLA program — which
      of the two schedules better on hardware is an empirical A/B
      (BASELINE.md).

    batched_passes stacks the fake and real critic passes on a leading
    axis of 2 and runs them through ONE ``jax.vmap``-ped discriminator, so
    XLA emits a single 2N-batched forward and a single 2N-batched backward
    instead of two separate N-batched subgraphs.  Exact for every family:
    vmap keeps minibatch-stddev statistics (and every other cross-sample
    op) WITHIN each pass — plain batch concatenation would not, because the
    reference's mbstd groups are strided across the batch (reference
    ops.py:313-325 reshapes [G, N/G, ...] and reduces axis 0).  The d-grads
    of the two terms come out pre-summed, which is exactly the combination
    the step applies anyway.

    gp_disc_fn, when given, replaces disc_fn INSIDE the penalty term only
    (same function, different remat wrapping — exact; see
    forward_simultaneous for the cfg.remat_offload rationale).
    """
    k_z, k_g, k_nr, k_nf, k_gamma = jax.random.split(rng, 5)
    n = real_image_input.shape[0]
    dtype = real_image_input.dtype

    z = jax.random.normal(k_z, (n, latent_dim), dtype)
    real = _instance_noise(k_nr, real_image_input, noise_stddev)

    if batched_passes:

        def f_joint(g_p, d_p):
            gen_sample = gen_fn(g_p, z, k_g)
            fake = _instance_noise(k_nf, gen_sample, noise_stddev)
            stacked = jnp.stack([fake, real.astype(fake.dtype)])
            scores = jax.vmap(disc_fn, in_axes=(None, 0))(d_p, stacked)
            scores = scores.astype(jnp.float32)
            f_score = jnp.mean(scores[0])
            rs = scores[1]
            # -critic(real) + drift (reference loss.py:133-134)
            r_term = jnp.mean(-rs + 1e-3 * jnp.square(rs))
            return f_score + r_term, (gen_sample, fake, f_score, r_term)

        (_, (gen_sample, fake, fake_score, real_term)), (gfake_g, gjoint_d) = (
            jax.value_and_grad(f_joint, argnums=(0, 1), has_aux=True)(
                g_params, d_params
            )
        )
        # gjoint_d == gfake_d + greal_d (the real term has no g_p path, so
        # gfake_g is untouched by the merge)
        gfake_d, greal_d = gjoint_d, None
    else:

        def f_fake(g_p, d_p):
            gen_sample = gen_fn(g_p, z, k_g)
            fake = _instance_noise(k_nf, gen_sample, noise_stddev)
            score = jnp.mean(disc_fn(d_p, fake).astype(jnp.float32))
            return score, (gen_sample, fake)

        (fake_score, (gen_sample, fake)), (gfake_g, gfake_d) = jax.value_and_grad(
            f_fake, argnums=(0, 1), has_aux=True
        )(g_params, d_params)

        def f_real(d_p):
            scores = disc_fn(d_p, real).astype(jnp.float32)
            # -critic(real) + drift (reference loss.py:133-134)
            return jnp.mean(-scores + 1e-3 * jnp.square(scores))

        real_term, greal_d = jax.value_and_grad(f_real)(d_params)

    if compute_gp:
        fake_sg = jax.lax.stop_gradient(fake)
        gamma = jax.random.uniform(k_gamma, (n,) + (1,) * (real.ndim - 1), dtype)
        interpolates = gamma * real + (1 - gamma) * fake_sg
        axes = _simultaneous_axes(real.ndim, gp_full_reduction)
        gp_dfn = gp_disc_fn or disc_fn

        if gp_grad_mode == "revfwd":
            d_params_c = jax.tree_util.tree_map(jax.lax.stop_gradient, d_params)
            g = jax.grad(
                lambda xi: jnp.sum(gp_dfn(d_params_c, xi).astype(jnp.float32))
            )(interpolates)

            def penalty_of(gg):
                slopes = _slopes_from_grads(gg, axes)
                return jnp.mean(gp_weight * (slopes - 1.0) ** 2)

            gp_mean, c = jax.value_and_grad(penalty_of)(g)
            c = jax.lax.stop_gradient(c).astype(interpolates.dtype)

            def directional(d_p):
                _, tangent = jax.jvp(
                    lambda xi: jnp.sum(gp_dfn(d_p, xi).astype(jnp.float32)),
                    (interpolates,),
                    (c,),
                )
                return tangent

            ggp_d = jax.grad(directional)(d_params)
        elif gp_grad_mode == "revrev":

            def f_gp(d_p):
                slopes = _gp_slopes(gp_dfn, d_p, interpolates, axes)
                return jnp.mean(gp_weight * (slopes - 1.0) ** 2)

            gp_mean, ggp_d = jax.value_and_grad(f_gp)(d_params)
        else:
            raise ValueError(f"Unknown gp_grad_mode: {gp_grad_mode}")
    else:
        gp_mean = jnp.zeros((), jnp.float32)
        ggp_d = None

    g_grads = jax.tree_util.tree_map(lambda g: -g, gfake_g)
    terms = [t for t in (gfake_d, greal_d, ggp_d) if t is not None]
    d_grads = jax.tree_util.tree_map(lambda *ts: sum(ts), *terms)

    gen_loss = -fake_score
    disc_loss = fake_score + real_term + gp_mean
    return (g_grads, d_grads), LossOutput(gen_loss, disc_loss, gp_mean, gen_sample)


def forward_generator(
    gen_fn: Callable,
    disc_fn: Callable,
    g_params,
    d_params,
    real_image_input: jax.Array,
    rng: jax.Array,
    *,
    latent_dim: int,
    loss_fn: str = "wgan",
    noise_stddev: float = 0.0,
) -> Tuple[jax.Array, jax.Array]:
    """Generator-only forward (reference loss.py:4-39). Returns (sample, loss)."""
    k_z, k_g, k_nf = jax.random.split(rng, 3)
    n = real_image_input.shape[0]
    dtype = real_image_input.dtype
    z = jax.random.normal(k_z, (n, latent_dim), dtype)
    gen_sample = gen_fn(g_params, z, k_g)
    fake = _instance_noise(k_nf, gen_sample, noise_stddev)
    d_params_sg = jax.tree_util.tree_map(jax.lax.stop_gradient, d_params)
    disc_fake_g = disc_fn(d_params_sg, fake).astype(jnp.float32)
    if loss_fn == "wgan":
        gen_loss = -jnp.mean(disc_fake_g)
    elif loss_fn == "logistic":
        gen_loss = jnp.mean(_softplus(-disc_fake_g))
    else:
        raise ValueError(f"Unknown loss function: {loss_fn}")
    return gen_sample, gen_loss


def forward_discriminator(
    gen_fn: Callable,
    disc_fn: Callable,
    g_params,
    d_params,
    real_image_input: jax.Array,
    rng: jax.Array,
    *,
    latent_dim: int,
    loss_fn: str = "wgan",
    gp_weight: float = 1.0,
    noise_stddev: float = 0.0,
    compute_gp: bool = True,
    gp_disc_fn: Optional[Callable] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Discriminator-only forward (reference loss.py:42-98).

    GP norm reduces over ALL non-batch axes here (reference loss.py:79).
    `compute_gp=False` skips the grad-of-grad entirely (lazy-GP off-steps).
    gp_disc_fn swaps the GP term's remat wrapping (see forward_simultaneous).
    Returns (disc_loss, gp_loss).
    """
    k_z, k_g, k_nr, k_nf, k_gamma = jax.random.split(rng, 5)
    n = real_image_input.shape[0]
    dtype = real_image_input.dtype
    z = jax.random.normal(k_z, (n, latent_dim), dtype)
    gen_sample = jax.lax.stop_gradient(gen_fn(g_params, z, k_g))

    real = _instance_noise(k_nr, real_image_input, noise_stddev)
    fake = jax.lax.stop_gradient(_instance_noise(k_nf, gen_sample, noise_stddev))

    disc_fake_d = disc_fn(d_params, fake).astype(jnp.float32)
    disc_real = disc_fn(d_params, real).astype(jnp.float32)

    if compute_gp:
        gamma = jax.random.uniform(k_gamma, (n,) + (1,) * (real.ndim - 1), dtype)
        interpolates = gamma * real + (1 - gamma) * fake
        axes = tuple(range(1, real.ndim))
        slopes = _gp_slopes(gp_disc_fn or disc_fn, d_params, interpolates, axes)

    if loss_fn == "wgan":
        if compute_gp:
            gp_loss = gp_weight * (slopes - 1.0) ** 2
            gp_term = gp_loss[:, None]
            gp_out = jnp.mean(gp_loss)
        else:
            gp_term = jnp.zeros((), jnp.float32)
            gp_out = jnp.zeros((), jnp.float32)
        drift_loss = 1e-3 * disc_real**2
        disc_loss = jnp.mean(disc_fake_d - disc_real + gp_term + drift_loss)
    elif loss_fn == "logistic":
        if compute_gp:
            gp_out = gp_weight * jnp.mean(slopes**2)
        else:
            gp_out = jnp.zeros((), jnp.float32)
        disc_loss = jnp.mean(_softplus(disc_fake_d)) + jnp.mean(_softplus(-disc_real)) + gp_out
    else:
        raise ValueError(f"Unknown loss function: {loss_fn}")
    return disc_loss, gp_out
