"""Command-line interface — surface-compatible with reference main.py:234-354.

Same positional args, same flag names, same None-able types (None means
"let the HPO harness pick it", main.py:212-223), same JSON spec files
(kernel_spec/filter_spec keys, main.py:225-232).  TPU-native additions are
grouped at the end (--compute_dtype, --num_data_shards, --num_space_shards,
--profile_dir).

Usage:
    python -m saragan_tpu <architecture> <dataset_path> --start_shape ... --flags
"""

from __future__ import annotations

import argparse
import dataclasses
import json

from saragan_tpu.config import Config


def none_or_str(value):
    return None if value == "None" else str(value)


def none_or_float(value):
    return None if value == "None" else float(value)


def none_or_int(value):
    return None if value == "None" else int(value)


def kernel_spec(value):
    with open(value) as f:
        return json.load(f)["kernel_spec"]


def filter_spec(value):
    with open(value) as f:
        return json.load(f)["filter_spec"]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="saragan_tpu")
    p.add_argument("architecture", type=str)
    p.add_argument("dataset_path", type=str)
    p.add_argument("--dataset", type=none_or_str, default=None,
                   help="Dataset kind — the 2D sibling's positional "
                        "(SURFGAN_2D/main.py:669): 'imagenet' selects the "
                        "class-folder JPEG pipeline; default auto-detects")
    p.add_argument("--start_shape", type=str, required=True,
                   help="Shape of the data at phase 0, '(c, z, y, x)', e.g. '(1, 5, 16, 16)'")
    p.add_argument("--final_shape", type=str, required=True)
    p.add_argument("--starting_phase", type=int, required=True)
    p.add_argument("--ending_phase", type=int, required=True)
    p.add_argument("--scratch_path", type=str, default=None)
    p.add_argument("--base_batch_size", type=none_or_int, default=None)
    p.add_argument("--max_global_batch_size", type=none_or_int, default=None)
    p.add_argument("--mixing_nimg", type=int, default=2**19)
    p.add_argument("--stabilizing_nimg", type=int, default=2**19)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--horovod", default=False, action="store_true",
                   help="Data-parallel training over the device mesh (flag name kept for parity)")
    p.add_argument("--checkpoint_every_nsteps", default=20000, type=int)
    p.add_argument("--logdir", default=None, type=str)
    p.add_argument("--continue_path", default=None, type=str)
    p.add_argument("--starting_alpha", default=1, type=float)
    p.add_argument("--gpu", default=False, action="store_true")  # parity no-op
    p.add_argument("--num_inter_ops", default=4, type=int)  # parity no-op
    p.add_argument("--num_labels", default=None, type=none_or_int)
    p.add_argument("--validation_fraction", default=0.1, type=float)
    p.add_argument("--test_fraction", default=0.1, type=float)
    # architecture
    p.add_argument("--latent_dim", type=int, required=True)
    p.add_argument("--first_conv_nfilters", type=none_or_int, default=None)
    p.add_argument("--network_size", default=None,
                   choices=["xxs", "xs", "s", "m", "l", "xl", "xxl"])
    p.add_argument("--activation", type=str, default="leaky_relu")
    p.add_argument("--leakiness", type=float, default=0.2)
    p.add_argument("--conv_kernel_size", type=none_or_int, nargs="+", default=[3, 3, 3])
    p.add_argument("--kernel_spec", type=kernel_spec, default=None)
    p.add_argument("--filter_spec", type=filter_spec, default=None)
    # learning rate
    p.add_argument("--g_lr", type=none_or_float, default=None)
    p.add_argument("--d_lr", type=none_or_float, default=None)
    for net in ("g", "d"):
        p.add_argument(f"--{net}_lr_increase", type=none_or_str,
                       choices=[None, "linear", "exponential"], default=None)
        p.add_argument(f"--{net}_lr_decrease", type=none_or_str,
                       choices=[None, "linear", "exponential"], default=None)
        p.add_argument(f"--{net}_lr_rise_niter", type=none_or_int, default=None)
        p.add_argument(f"--{net}_lr_decay_niter", type=none_or_int, default=None)
    p.add_argument("--d_scaling", default="none", choices=["linear", "sqrt", "none"])
    p.add_argument("--g_scaling", default="none", choices=["linear", "sqrt", "none"])
    # loss & optimization
    p.add_argument("--loss_fn", default="logistic", choices=["logistic", "wgan"])
    p.add_argument("--gp_weight", type=float, default=1)
    p.add_argument("--g_clipping", default=False, type=bool)
    p.add_argument("--d_clipping", default=False, type=bool)
    p.add_argument("--optim_strategy", default="simultaneous",
                   choices=["simultaneous", "alternate"])
    p.add_argument("--use_adasum", default=False, action="store_true")  # parity no-op
    p.add_argument("--ema_beta", type=float, default=0.99)
    p.add_argument("--noise_stddev", default=None, type=float, required=True)
    # LAMB/RAdam/AdamW are the reference 2D path's hand-written TF1
    # optimizers (SURFGAN_2D/optim.py, lamb.py, rectified_adam.py)
    _optim_choices = [None, "Adam", "SGD", "Momentum", "Adadelta", "LAMB", "RAdam", "AdamW",
                      "LARS"]
    p.add_argument("--optimizer", type=none_or_str, choices=_optim_choices, default="Adam")
    p.add_argument("--d_use_different_optimizer", default=False, action="store_true")
    p.add_argument("--d_optimizer", type=none_or_str, choices=_optim_choices, default="Adam")
    p.add_argument("--weight_decay", type=float, default=0.01,
                   help="Decoupled weight decay for LAMB/AdamW (SURFGAN_2D/optim.py:191-426)")
    p.add_argument("--d_use_different_weight_decay", default=False, action="store_true")
    p.add_argument("--d_weight_decay", type=float, default=0.01)
    p.add_argument("--gradient_accumulation", type=int, default=1,
                   help="Micro-batches averaged per optimizer step (SURFGAN_2D/optim.py:95-160)")
    p.add_argument("--use_spectral_norm", default=False, action="store_true",
                   help="Spectral-normalize discriminator weights (networks/ops.py:111-127)")
    p.add_argument("--fused_transitions", dest="fused_transitions", default=True,
                   action="store_true",
                   help="Exact upscale+conv transition fusion (default on; +5.6%% train, "
                        "+25%% inference measured on v5e)")
    p.add_argument("--no_fused_transitions", dest="fused_transitions", action="store_false")
    p.add_argument("--fused_grads", dest="fused_grads", default=True, action="store_true",
                   help="Shared-fake-pass WGAN gradient assembly: one D backward over "
                        "the fake batch instead of two (exact; default on)")
    p.add_argument("--no_fused_grads", dest="fused_grads", action="store_false")
    p.add_argument("--batched_passes", dest="batched_passes", default=True,
                   action="store_true",
                   help="Run the fake and real critic passes as ONE vmap-stacked "
                        "2N-batched D forward/backward (exact; fused-grads WGAN "
                        "path only; default on — measured +6.4%% on v5e)")
    p.add_argument("--no_batched_passes", dest="batched_passes", action="store_false")
    p.add_argument("--no_graceful_shutdown", dest="graceful_shutdown",
                   default=True, action="store_false",
                   help="disable the SIGTERM/SIGINT checkpoint-and-exit(75) handler")
    p.add_argument("--abort_on_nonfinite", default=False, action="store_true",
                   help="fail fast (with a rewind hint) when summary losses go NaN/inf")
    p.add_argument("--keep_checkpoints", type=int, default=0,
                   help="keep only the newest N cadence checkpoints per phase "
                        "(0 = keep all); phase-final/preemption/rewind-hint "
                        "checkpoints are never pruned")
    p.add_argument("--auto_resume", default=False, action="store_true",
                   help="scan --logdir for the newest resume point (preemption "
                        "or periodic full-state .pkl, else the last completed "
                        "phase's checkpoint) and continue from it — lets a "
                        "scheduler requeue the SAME command line after exit 75")
    p.add_argument("--gp_full_reduction", default=False, action="store_true",
                   help="Reduce the GP norm over ALL non-batch axes in the simultaneous "
                        "loss instead of the reference's literal (1,2,3) axes quirk "
                        "(reference loss.py:140)")
    p.add_argument("--gp_grad_mode", default="revrev", choices=["revrev", "revfwd"],
                   help="Gradient-penalty parameter-gradient algebra in the fused-grads "
                        "step: reverse-over-reverse (default; measured faster on v5e, "
                        "BASELINE.md) or reverse-over-forward (exact either way)")
    p.add_argument("--lazy_gp", default=1, type=int,
                   help="Apply the gradient penalty every k-th step with k-scaled weight "
                        "(StyleGAN2 lazy regularization; 1 = reference-exact every-step "
                        "GP; 4 measured +28%% step throughput, BASELINE.md — NOT "
                        "numerically equivalent to the reference recipe)")
    p.add_argument("--remat", default=False, action="store_true",
                   help="Rematerialize G/D forwards in the backward (HBM for FLOPs)")
    p.add_argument("--remat_offload", default=False, action="store_true",
                   help="Remat with block activations offloaded to pinned host memory "
                        "instead of recomputed — single-chip path for 512^3-scale phases")
    p.add_argument("--single_chip_big_volume", default=False, action="store_true",
                   help="One-flag preset for volumes whose activations exceed one "
                        "chip's HBM (e.g. 128x512x512 on 16 GB): host-offload remat + "
                        "layout-safe op formulations + Pallas flat conv + raised "
                        "scoped-VMEM limit; critic passes unstacked and transition "
                        "fusion off — both draw 16-128x-padded layouts at this scale "
                        "(BASELINE.md 'Phase-8 on one chip')")
    p.add_argument("--scoped_vmem_kib", default=-1, type=int,
                   help="Per-compile xla_tpu_scoped_vmem_limit_kib (proto-backed, so "
                        "it reaches a relayed remote compiler); -1 = auto (32768 on "
                        "TPU, measured ~+6.5%% full-step), 0 = backend default")
    p.add_argument("--native_prefetch", dest="native_prefetch", default=True,
                   action="store_true",
                   help="C++ prefetch executor for the input pipeline (default on; "
                        "falls back to the Python thread when runtime/ isn't built)")
    p.add_argument("--no_native_prefetch", dest="native_prefetch", action="store_false")
    p.add_argument("--use_pallas_fusion", default=False, action="store_true",
                   help="Pallas fused bias+lrelu+pixelnorm kernels (inference-only win; "
                        "see BASELINE.md)")
    p.add_argument("--spectral_iterations", type=int, default=3)
    # --beta1/--beta2 are the 2D sibling's spellings of the same knobs
    # (reference SURFGAN_2D/main.py:695-696)
    p.add_argument("--adam_beta1", "--beta1", dest="adam_beta1",
                   type=none_or_float, default=0)
    p.add_argument("--d_use_different_beta1", default=False, action="store_true")
    p.add_argument("--d_adam_beta1", type=none_or_float, default=0)
    p.add_argument("--adam_beta2", "--beta2", dest="adam_beta2",
                   type=none_or_float, default=0.9)
    p.add_argument("--d_use_different_beta2", default=False, action="store_true")
    p.add_argument("--d_adam_beta2", type=none_or_float, default=0.9)
    p.add_argument("--rho", type=none_or_float, default=0.95)
    p.add_argument("--d_use_different_rho", default=False, action="store_true")
    p.add_argument("--d_rho", type=none_or_float, default=0.95)
    p.add_argument("--momentum", type=none_or_float, default=0.9)
    p.add_argument("--d_use_different_momentum", default=False, action="store_true")
    p.add_argument("--d_momentum", type=none_or_float, default=0.9)
    p.add_argument("--g_annealing", default=1, type=float)
    p.add_argument("--d_annealing", default=1, type=float)
    # metrics
    p.add_argument("--calc_metrics", default=False, action="store_true")
    p.add_argument("--compute_metrics_train", default=False, action="store_true")
    p.add_argument("--disable_compute_metrics_validation", dest="compute_metrics_validation",
                   default=True, action="store_false")
    p.add_argument("--disable_compute_metrics_test", dest="compute_metrics_test",
                   default=True, action="store_false")
    p.add_argument("--disable_grad_histograms", dest="grad_histograms",
                   default=True, action="store_false")
    p.add_argument("--summary_small_every_nsteps", default=32, type=int)
    p.add_argument("--summary_large_every_nsteps", default=64, type=int)
    p.add_argument("--num_metric_samples", type=none_or_int, default=None)
    p.add_argument("--metrics_every_nsteps", default=128, type=int)
    p.add_argument("--metrics_batch_size", default=16, type=int)
    for m in ("FID", "swds", "ssims", "psnrs", "mses", "nrmses"):
        p.add_argument(f"--compute_{m}", default=False, action="store_true")
    p.add_argument("--inception_weights", default=None, type=none_or_str,
                   help="Converted pt_inception-2015-12-05 npz for calibrated FID")
    p.add_argument("--allow_uncalibrated_fid", default=False, action="store_true",
                   help="Allow random-feature FID when no Inception weights are "
                        "available (run-internal values only; never sent to the pruner)")
    # HPO
    p.add_argument("--optuna_distributed", default=False, action="store_true")
    p.add_argument("--optuna_ntrials", default=None, type=none_or_int)
    p.add_argument("--hpo_seeds", default=1, type=int,
                   help="Seeds per trial; >1 reports the median objective over "
                        "reseeded runs (single-seed rankings are draw noise at "
                        "short budgets — see BASELINE.md seed-band tables)")
    p.add_argument("--optuna_walltime", default=None, type=none_or_float,
                   help="With --optuna_ntrials None, keep starting trials until this "
                        "many seconds have elapsed (reference main.py:199-205 walltime loop)")
    p.add_argument("--optuna_use_best_trial", default=False, action="store_true")
    p.add_argument("--optuna_storage", default=None, type=str)
    p.add_argument("--optuna_study_name", default=None, type=str)
    p.add_argument("--optuna_pruner", default="median", choices=["median", "SHA", "nopruner"])
    p.add_argument("--optuna_sampler", default="TPE",
                   choices=["random", "TPE", "CMA", "NSGAII", "MOTPE"])
    p.add_argument("--optuna_warmup_steps", default=20000, type=int)
    p.add_argument("--optuna_TPE_multivariate", default=False, action="store_true")
    p.add_argument("--optuna_CMA_consider_pruned_trials", default=False, action="store_true")
    p.add_argument("--optuna_CMA_restart_strategy", default=None, type=none_or_str,
                   choices=[None, "ipop"])
    p.add_argument("--optuna_CMA_inc_popsize", default=2, type=int)
    p.add_argument("--optuna_square_kernels", default=False, action="store_true")
    # input normalization
    p.add_argument("--data_mean", default=None, type=none_or_float)
    p.add_argument("--data_stddev", default=None, type=none_or_float)
    # TPU-native additions
    p.add_argument("--compute_dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--transfer_dtype", default="auto",
                   choices=["auto", "float32", "float16", "bfloat16"],
                   help="host->device input batch dtype; the step casts to "
                        "compute_dtype on device. auto = bfloat16 under bfloat16 "
                        "compute (bit-exact: same RNE cast either side, half the "
                        "bytes) else float32; float16 also halves the transfer "
                        "but double-rounds")
    p.add_argument("--num_data_shards", default=None, type=none_or_int)
    p.add_argument("--num_space_shards", default=1, type=int,
                   help="shard the volume depth (D) axis over the 'space' mesh axis")
    p.add_argument("--num_space2_shards", default=1, type=int,
                   help="additionally shard the height (H) axis over a 'space2' "
                        "mesh axis (pod-scale 2D halo decomposition)")
    p.add_argument("--profile_dir", default=None, type=str)
    return p


def config_from_args(args: argparse.Namespace) -> Config:
    fields = {f.name for f in dataclasses.fields(Config)}
    values = {k: v for k, v in vars(args).items() if k in fields}
    return Config(**values)


def main(argv=None):
    import os

    if os.environ.get("SARAGAN_MULTIHOST"):
        # TPU pod: one process per host; topology auto-detected
        import jax

        jax.distributed.initialize()

    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)
    from saragan_tpu.hpo import harness
    from saragan_tpu.train.trainer import TrainingInterrupted
    from saragan_tpu.utils import enable_compile_cache

    # persistent compile cache: repeat runs / auto_resume requeues / HPO
    # trials of an already-seen architecture skip the relay's multi-minute
    # cold compiles (SARAGAN_COMPILE_CACHE=0 opts out)
    enable_compile_cache()

    try:
        return harness.run(cfg)
    except TrainingInterrupted as e:
        # graceful preemption (SIGTERM/SIGINT): the exact-resume checkpoint
        # is on disk; exit 75 (EX_TEMPFAIL) so wrappers can requeue.
        print(f"INTERRUPTED: {e}", flush=True)
        raise SystemExit(75)


if __name__ == "__main__":
    main()
