"""The jitted training step.

TPU-native equivalent of the reference's single hot `Session.run` that fuses
G forward, 3 D forwards, the GP double-backward, both optimizers and the
Horovod allreduce (reference optuna_objective.py:454-465, optimization.py:77-
224).  Here the *entire* step — including the EMA update — is one XLA
program; under a sharded jit the gradient allreduce is an ICI psum XLA
inserts from the sharding annotations (SURVEY §5.8).

Reference semantics preserved:

* `simultaneous`: one joint forward; G-grads of gen_loss, D-grads of
  disc_loss (optimization.py:128-162).  A single fused backward computes
  both (gen_loss blocks gradients into D's params, disc_loss is independent
  of G's params by stop_gradient on the sample).
* `alternate`: D step applied first, G step then runs against the *updated*
  discriminator (the reference's control_dependencies ordering,
  optimization.py:166-216).
* optional global-norm-1.0 clipping per network, applied to raw grads before
  the optimizer, with max-per-variable-norm telemetry computed on the
  clipped grads (optimization.py:47-75).
* freeze variants: frozen (previous-phase) parameters receive neither
  updates nor optimizer-slot changes (optimization.py:149-162).
* EMA over G+D parameters updated once per step (optuna_objective.py:467).

Mixed precision: when cfg.compute_dtype == 'bfloat16' the input batch and
latents are bf16 and every conv/matmul runs bf16 on the MXU; parameters,
gradients and optimizer state stay fp32 (SURVEY §5.9).
"""

from __future__ import annotations

from typing import Any, FrozenSet, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from saragan_tpu import losses
from saragan_tpu.core import Params, filter_params
from saragan_tpu.optim.accumulate import grad_accumulate
from saragan_tpu.optim.ema import ema_init, ema_update
from saragan_tpu.optim.factory import Optimizer, make_optimizers_from_config
from saragan_tpu.optim.freeze import freeze_select


class TrainState(NamedTuple):
    g_params: Params
    d_params: Params
    g_opt: Any
    d_opt: Any
    ema: Params  # EMA over G+D (reference ExtendedEMA over var_list=gen+disc)


class StepMetrics(NamedTuple):
    gen_loss: jax.Array
    disc_loss: jax.Array
    gp_loss: jax.Array
    max_g_norm: jax.Array
    max_d_norm: jax.Array
    # per-variable post-clip gradient norms (the scalar analog of the
    # reference's per-var gradient histograms, summary.py / SURVEY C20)
    g_norms: Any = None
    d_norms: Any = None
    # per-variable 64-bin gradient histograms, reduced ON DEVICE so only
    # ~129 floats per variable cross the host boundary (reference
    # summary.py:83-87 ships full grad tensors to the summary writer)
    g_hists: Any = None
    d_hists: Any = None
    # Image_properties scalars (reference summary.py:46-52).  Under
    # gradient accumulation these are micro-batch averages.
    fake_min: Any = None
    fake_max: Any = None
    real_min: Any = None
    real_max: Any = None


def split_params(params: Params) -> Tuple[Params, Params]:
    return filter_params(params, "generator"), filter_params(params, "discriminator")


def init_train_state(arch, rng: jax.Array, *, phase: int, cfg) -> Tuple[TrainState, Tuple[Optimizer, Optimizer]]:
    params = arch.init(rng, phase=phase, cfg=cfg)
    g_params, d_params = split_params(params)
    g_optimizer, d_optimizer = make_optimizers_from_config(cfg)
    state = TrainState(
        g_params=g_params,
        d_params=d_params,
        g_opt=g_optimizer.init(g_params),
        d_opt=d_optimizer.init(d_params),
        ema=ema_init({**g_params, **d_params}),
    )
    return state, (g_optimizer, d_optimizer)


def _clip_and_norms(grads: Params, clipping: bool, hist_bins: int = 0,
                    frozen: FrozenSet[str] = frozenset()):
    """Optional global-norm clip + per-variable norms (reference
    optimization.py:64-71: norms are computed on the possibly-clipped grads).
    The clip norm and all telemetry cover only NON-frozen variables — the
    reference's freeze path clips over the limited var list
    (minimize_with_clipping(gen_vars_limited), optimization.py:150-152), so
    frozen previous-phase grads must not inflate the global norm.
    With hist_bins > 0 also returns per-variable (counts, edges) gradient
    histograms (reference summary.py:83-87)."""
    live = {k: g for k, g in grads.items() if k not in frozen}
    if clipping:
        gnorm = optax.global_norm(live)
        scale = jnp.minimum(1.0, 1.0 / (gnorm + 1e-16))
        grads = {k: (g * scale if k in live else g) for k, g in grads.items()}
        live = {k: grads[k] for k in live}
    norms = {k: jnp.linalg.norm(g.reshape(-1)) for k, g in live.items()}
    hists = None
    if hist_bins:
        hists = {k: jnp.histogram(g.reshape(-1), bins=hist_bins) for k, g in live.items()}
    return grads, jnp.max(jnp.stack(list(norms.values()))), norms, hists


def make_train_step(
    arch,
    cfg,
    phase: int,
    g_optimizer: Optimizer,
    d_optimizer: Optimizer,
    frozen_names: FrozenSet[str] = frozenset(),
    freeze: bool = False,
    apply_gp: bool = True,
    grad_histograms: bool = False,
    static_alpha: float = None,
):
    """Build the (un-jitted) train step for one phase.

    The caller jits it (optionally with shardings); `alpha`, `g_lr`, `d_lr`
    are traced scalars so schedule/fade never recompile.

    static_alpha: bind alpha as a compile-time Python constant instead of a
    traced scalar.  With ``static_alpha=0.0`` the models skip the
    phase-transition branches entirely (to_rgb_{phase-1} + upscale + blend in
    G; input downscale + from_rgb_{phase-1} + blend in D) — EXACT for the
    stabilizing half of every phase, where alpha is identically 0: the
    pruned branches contribute 0 to the output and exactly-zero gradients,
    and jax.grad materializes the same zero grads for the untouched params,
    so the optimizer/EMA see identical updates (including residual Adam
    momentum on the transition layers).  The traced `alpha` argument is then
    ignored.  The reference keeps these branches in its static TF graph for
    the whole phase (optuna_objective.py:446-453).
    """
    compute_dtype = {
        "bfloat16": jnp.bfloat16,
        # float64 is a DIAGNOSTIC mode (requires jax_enable_x64): the f64
        # cross-shard trajectory probes in dryrun_multichip and
        # scripts/diag_sp4_drift.py use it to collapse reassociation chaos
        # ~1e9x so only genuine sharding bugs remain visible
        "float64": jnp.float64,
    }.get(cfg.compute_dtype, jnp.float32)
    frozen = frozen_names if freeze else frozenset()
    # StyleGAN2-style lazy regularization: GP applied every k-th step with
    # k-scaled weight (cfg.lazy_gp; 1 = the reference's every-step GP)
    lazy_k = max(1, int(getattr(cfg, "lazy_gp", 1)))
    gp_weight_eff = cfg.gp_weight * lazy_k if apply_gp else 0.0

    # Per-variable histograms are ~100 extra unfused reduction kernels and
    # MORE THAN DOUBLED the measured hot step (887 vs 408 ms at the bench
    # config) — so they live in a dedicated step VARIANT the trainer invokes
    # only on summary steps, matching the reference where summary ops only
    # run when fetched (summary.py + optuna_objective.py sess.run lists).
    hist_bins = 64 if grad_histograms else 0

    def apply_updates(optimizer, params, opt_state, grads, lr, clipping):
        grads, max_norm, norms, hists = _clip_and_norms(grads, clipping, hist_bins,
                                                        frozen=frozen)
        new_params, new_opt = optimizer.update(grads, opt_state, params, lr)
        new_params = freeze_select(params, new_params, frozen)
        new_opt = freeze_select(opt_state, new_opt, frozen)
        return new_params, new_opt, max_norm, norms, hists

    def train_step(state: TrainState, real: jax.Array, rng: jax.Array, alpha, g_lr, d_lr):
        real = real.astype(compute_dtype)
        a = alpha if static_alpha is None else static_alpha

        # Bind alpha into the model closures for this trace.
        def gen_a(p, z, k=None):
            return arch.generator(p, z, a, phase=phase, cfg=cfg, rng=k)

        def disc_a(p, x):
            return arch.discriminator(p, x, a, phase=phase, cfg=cfg)

        gp_disc = None
        if getattr(cfg, "remat_offload", False):
            # remat, but block-boundary activations (models tag them with
            # checkpoint_name via block_tap) are OFFLOADED to pinned host
            # memory during the forward and DMA'd back per-block in the
            # backward — everything else is rematerialized.  Peak HBM drops
            # to roughly one resolution block's working set, which is what
            # makes phase-8 (128x512x512) volumes reachable on one chip.
            #
            # The gradient-penalty term gets its own PLAIN-remat closure:
            # XLA's host-offload pass cannot place offloaded residuals
            # inside the GP double-backward (compile error "Tensor which is
            # moved to host ... returned from the entry computation",
            # bisected to the GP term on hardware — scripts/
            # offload_bisect.py), and recompute bounds the GP pass's memory
            # the same way.  Exactness is unaffected (same function, same
            # math; equality pinned in test_remat_variants_match_plain_step).
            from saragan_tpu.models.common import offload_block_names

            policy = jax.checkpoint_policies.save_and_offload_only_these_names(
                names_which_can_be_saved=[],
                names_which_can_be_offloaded=offload_block_names(phase),
                offload_src="device",
                offload_dst="pinned_host",
            )
            gp_disc = jax.checkpoint(disc_a)
            gen_a = jax.checkpoint(gen_a, policy=policy)
            disc_a = jax.checkpoint(disc_a, policy=policy)
        elif getattr(cfg, "remat", False):
            # rematerialize forwards in the backward pass: trades recompute
            # FLOPs for activation HBM -> larger per-chip batches at the
            # big-volume phases (SURVEY §7: donated buffers + remat)
            gen_a = jax.checkpoint(gen_a, static_argnums=())
            disc_a = jax.checkpoint(disc_a)

        # micro-batch gradient accumulation (cfg.gradient_accumulation > 1,
        # the reference 2D path's accumulate-then-apply, optim.py:95-160)
        accum = max(1, int(getattr(cfg, "gradient_accumulation", 1)))

        if cfg.optim_strategy == "simultaneous" and cfg.loss_fn == "wgan" and getattr(
            cfg, "fused_grads", True
        ):
            # shared-fake-pass gradient assembly: one D backward over the
            # fake batch instead of two (losses.grads_simultaneous) — exact
            # for WGAN, measured on-chip (BASELINE.md round 3)
            def micro_grads(mb, k):
                (gg, dg), out = losses.grads_simultaneous(
                    gen_a,
                    disc_a,
                    state.g_params,
                    state.d_params,
                    mb,
                    k,
                    latent_dim=cfg.latent_dim,
                    gp_weight=gp_weight_eff,
                    noise_stddev=cfg.noise_stddev,
                    gp_full_reduction=getattr(cfg, "gp_full_reduction", False),
                    compute_gp=apply_gp,
                    gp_grad_mode=getattr(cfg, "gp_grad_mode", "revrev"),
                    batched_passes=getattr(cfg, "batched_passes", False),
                    gp_disc_fn=gp_disc,
                )
                return (gg, dg), (
                    out.gen_loss, out.disc_loss, out.gp_loss,
                    jnp.min(out.gen_sample), jnp.max(out.gen_sample),
                )

            ((g_grads, d_grads), (gen_loss, disc_loss, gp_loss, fake_min, fake_max)) = (
                grad_accumulate(micro_grads, real, rng, accum)
            )

            g_params, g_opt, max_g_norm, g_norms, g_hists = apply_updates(
                g_optimizer, state.g_params, state.g_opt, g_grads, g_lr, cfg.g_clipping
            )
            d_params, d_opt, max_d_norm, d_norms, d_hists = apply_updates(
                d_optimizer, state.d_params, state.d_opt, d_grads, d_lr, cfg.d_clipping
            )

        elif cfg.optim_strategy == "simultaneous":

            def total_loss(g_params, d_params, real_mb, rng_mb):
                out = losses.forward_simultaneous(
                    gen_a,
                    disc_a,
                    g_params,
                    d_params,
                    real_mb,
                    rng_mb,
                    latent_dim=cfg.latent_dim,
                    loss_fn=cfg.loss_fn,
                    gp_weight=gp_weight_eff,
                    noise_stddev=cfg.noise_stddev,
                    gp_full_reduction=getattr(cfg, "gp_full_reduction", False),
                    compute_gp=apply_gp,
                    gp_disc_fn=gp_disc,
                )
                return out.gen_loss + out.disc_loss, out

            grad_fn = jax.grad(total_loss, argnums=(0, 1), has_aux=True)

            def micro_grads(mb, k):
                (gg, dg), out = grad_fn(state.g_params, state.d_params, mb, k)
                return (gg, dg), (
                    out.gen_loss, out.disc_loss, out.gp_loss,
                    jnp.min(out.gen_sample), jnp.max(out.gen_sample),
                )

            ((g_grads, d_grads), (gen_loss, disc_loss, gp_loss, fake_min, fake_max)) = (
                grad_accumulate(micro_grads, real, rng, accum)
            )

            g_params, g_opt, max_g_norm, g_norms, g_hists = apply_updates(
                g_optimizer, state.g_params, state.g_opt, g_grads, g_lr, cfg.g_clipping
            )
            d_params, d_opt, max_d_norm, d_norms, d_hists = apply_updates(
                d_optimizer, state.d_params, state.d_opt, d_grads, d_lr, cfg.d_clipping
            )

        elif cfg.optim_strategy == "alternate":
            rng_d, rng_g = jax.random.split(rng)

            def d_loss_fn(d_params, real_mb, rng_mb):
                return losses.forward_discriminator(
                    gen_a,
                    disc_a,
                    state.g_params,
                    d_params,
                    real_mb,
                    rng_mb,
                    latent_dim=cfg.latent_dim,
                    loss_fn=cfg.loss_fn,
                    gp_weight=gp_weight_eff,
                    noise_stddev=cfg.noise_stddev,
                    compute_gp=apply_gp,
                    gp_disc_fn=gp_disc,
                )

            d_vg = jax.value_and_grad(d_loss_fn, has_aux=True)

            def d_micro(mb, k):
                (disc_loss, gp_loss), dg = d_vg(state.d_params, mb, k)
                return dg, (disc_loss, gp_loss)

            d_grads, (disc_loss, gp_loss) = grad_accumulate(d_micro, real, rng_d, accum)
            d_params, d_opt, max_d_norm, d_norms, d_hists = apply_updates(
                d_optimizer, state.d_params, state.d_opt, d_grads, d_lr, cfg.d_clipping
            )

            # G trains against the *updated* discriminator (reference
            # optimization.py:193 control_dependencies).
            def g_loss_fn(g_params, real_mb, rng_mb):
                sample, gen_loss = losses.forward_generator(
                    gen_a,
                    disc_a,
                    g_params,
                    d_params,
                    real_mb,
                    rng_mb,
                    latent_dim=cfg.latent_dim,
                    loss_fn=cfg.loss_fn,
                    noise_stddev=cfg.noise_stddev,
                )
                return gen_loss, (jnp.min(sample), jnp.max(sample))

            g_vg = jax.value_and_grad(g_loss_fn, has_aux=True)

            def g_micro(mb, k):
                (gen_loss, fminmax), gg = g_vg(state.g_params, mb, k)
                return gg, (gen_loss, fminmax)

            g_grads, (gen_loss, (fake_min, fake_max)) = grad_accumulate(
                g_micro, real, rng_g, accum
            )
            g_params, g_opt, max_g_norm, g_norms, g_hists = apply_updates(
                g_optimizer, state.g_params, state.g_opt, g_grads, g_lr, cfg.g_clipping
            )
        else:
            raise ValueError(f"Unknown optim strategy {cfg.optim_strategy}")

        if getattr(arch, "refresh_state", None) is not None:
            # non-gradient state tracking (style-family w-average; the
            # reference's in-graph tf.assign, stylegan/generator.py:29-37)
            g_params = arch.refresh_state(
                g_params, jax.random.fold_in(rng, 7), phase=phase, cfg=cfg
            )
        if getattr(cfg, "use_spectral_norm", False):
            # per-step power-iteration refresh of the persisted u vectors —
            # the reference's non-trainable u assignment (ops.py:96-104)
            from saragan_tpu.ops.core import refresh_spectral_u

            d_params = refresh_spectral_u(
                d_params, iterations=int(getattr(cfg, "spectral_iterations", 1))
            )
        ema = ema_update(state.ema, {**g_params, **d_params}, cfg.ema_beta)
        new_state = TrainState(g_params, d_params, g_opt, d_opt, ema)
        metrics = StepMetrics(
            gen_loss=gen_loss,
            disc_loss=disc_loss,
            gp_loss=gp_loss,
            max_g_norm=max_g_norm,
            max_d_norm=max_d_norm,
            g_norms=g_norms,
            d_norms=d_norms,
            g_hists=g_hists,
            d_hists=d_hists,
            fake_min=fake_min,
            fake_max=fake_max,
            # reference Image_properties uses only the FIRST real sample
            # (summary.py:51-52 real_image_input[0]); fake uses the batch
            real_min=jnp.min(real[0]),
            real_max=jnp.max(real[0]),
        )
        return new_state, metrics

    return train_step
