"""Run configuration.

One dataclass with the same field names as the reference CLI
(/root/reference/SURFGAN_3D/main.py:234-354), including the
``None``-means-"let the HPO harness pick it" convention
(reference optuna_suggestions.py:18-277) and the JSON kernel_spec /
filter_spec files (reference main.py:225-232).
"""

from __future__ import annotations

import ast
import dataclasses
import json
import math
from dataclasses import dataclass
from typing import Optional, Sequence, Tuple


def parse_tuple(value) -> Tuple[int, ...]:
    """Parse "(c, z, y, x)" strings (reference utils.py:339-341)."""
    if isinstance(value, (tuple, list)):
        return tuple(int(v) for v in value)
    return tuple(ast.literal_eval(str(value)))


def load_spec(path: str, key: str) -> list:
    """Load kernel_spec/filter_spec from a JSON file (reference main.py:225-232)."""
    with open(path) as f:
        data = json.load(f)
    return data[key]


def num_phases_from_shapes(start_shape, final_shape) -> int:
    """log2 resolution ratio (reference utils.py:211-217)."""
    start = parse_tuple(start_shape)
    final = parse_tuple(final_shape)
    return int(math.log2(final[-1] / start[-1]))


def default_filter_spec(num_phases: int, base_shape, size: str = "xs", ndim: int = 3) -> list:
    """Filter spec derived from the legacy num_filters tables
    (reference networks/ops.py:201-236 / SURFGAN_2D ops.py:139-158)."""
    from saragan_tpu.ops import num_filters, num_filters_2d

    spec = []
    for phase in range(1, num_phases + 1):
        if ndim == 3:
            f = num_filters(phase, num_phases, base_shape, size=size)
        else:
            f = num_filters_2d(phase, num_phases, size=size)
        spec.append([int(f), int(f)])
    return spec


@dataclass
class Config:
    # --- positional ---
    architecture: str = "pgan"
    dataset_path: str = ""
    # dataset KIND — the 2D sibling's `dataset` positional (reference
    # SURFGAN_2D/main.py:669): 'imagenet' selects the class-folder JPEG
    # pipeline; None = npy pyramid (auto-detects ImageNet layout for 2D
    # configs whose dataset_path holds a train/ folder of class dirs)
    dataset: Optional[str] = None
    # --- shapes / phases (reference main.py:236-244) ---
    start_shape: str = "(1, 4, 4, 4)"
    final_shape: str = "(1, 32, 32, 32)"
    starting_phase: int = 1
    # None means "train to num_phases" (resolved in finalize); the CLI
    # requires an explicit value, matching the reference's required
    # --ending_phase (main.py:240)
    ending_phase: Optional[int] = None
    scratch_path: Optional[str] = None
    base_batch_size: Optional[int] = None
    max_global_batch_size: Optional[int] = None
    mixing_nimg: int = 2**19
    stabilizing_nimg: int = 2**19
    seed: int = 42
    horovod: bool = False  # kept for CLI parity; means "data-parallel over the mesh"
    checkpoint_every_nsteps: int = 20000
    logdir: Optional[str] = None
    continue_path: Optional[str] = None
    starting_alpha: float = 1.0
    num_labels: Optional[int] = None
    validation_fraction: float = 0.1
    test_fraction: float = 0.1
    # --- architecture (reference main.py:259-266) ---
    latent_dim: int = 256
    first_conv_nfilters: Optional[int] = None
    network_size: Optional[str] = "xs"
    activation: str = "leaky_relu"
    leakiness: float = 0.2
    conv_kernel_size: Sequence[int] = (3, 3, 3)
    kernel_spec: Optional[list] = None
    filter_spec: Optional[list] = None
    # --- learning rate (reference main.py:268-287) ---
    g_lr: Optional[float] = 1e-3
    d_lr: Optional[float] = 1e-3
    g_lr_increase: Optional[str] = None
    g_lr_decrease: Optional[str] = None
    d_lr_increase: Optional[str] = None
    d_lr_decrease: Optional[str] = None
    g_lr_rise_niter: Optional[int] = None
    g_lr_decay_niter: Optional[int] = None
    d_lr_rise_niter: Optional[int] = None
    d_lr_decay_niter: Optional[int] = None
    d_scaling: str = "none"
    g_scaling: str = "none"
    # --- loss & optimization (reference main.py:289-319) ---
    loss_fn: str = "logistic"
    gp_weight: float = 1.0
    use_spectral_norm: bool = False  # spectral-normalize discriminator weights (reference ops.py:111-127)
    spectral_iterations: int = 3  # power iterations per forward (reference amortizes 1/step via an assigned u)
    g_clipping: bool = False
    d_clipping: bool = False
    optim_strategy: str = "simultaneous"
    use_adasum: bool = False
    ema_beta: float = 0.99
    noise_stddev: float = 0.0
    optimizer: Optional[str] = "Adam"
    d_use_different_optimizer: bool = False
    d_optimizer: Optional[str] = "Adam"
    adam_beta1: Optional[float] = 0.0
    d_use_different_beta1: bool = False
    d_adam_beta1: Optional[float] = 0.0
    adam_beta2: Optional[float] = 0.9
    d_use_different_beta2: bool = False
    d_adam_beta2: Optional[float] = 0.9
    rho: Optional[float] = 0.95
    d_use_different_rho: bool = False
    d_rho: Optional[float] = 0.95
    momentum: Optional[float] = 0.9
    d_use_different_momentum: bool = False
    d_momentum: Optional[float] = 0.9
    # 2D-path extras (reference SURFGAN_2D/main.py:206-212, optim.py:95-160):
    # LAMB/RAdam/AdamW weight decay and micro-batch gradient accumulation.
    weight_decay: float = 0.01
    d_use_different_weight_decay: bool = False
    d_weight_decay: float = 0.01
    gradient_accumulation: int = 1  # micro-batches per optimizer step (1 = off)
    g_annealing: float = 1.0
    d_annealing: float = 1.0
    # --- metrics (reference main.py:325-341) ---
    calc_metrics: bool = False
    compute_metrics_train: bool = False
    compute_metrics_validation: bool = True
    compute_metrics_test: bool = True
    grad_histograms: bool = True  # per-var grad histograms on SUMMARY steps only (dedicated step variant; in the hot step they measured 887 vs 408 ms)
    summary_small_every_nsteps: int = 32
    summary_large_every_nsteps: int = 64
    num_metric_samples: Optional[int] = None
    metrics_every_nsteps: int = 128
    metrics_batch_size: int = 16
    compute_FID: bool = False
    inception_weights: Optional[str] = None  # converted pt_inception npz (or SARAGAN_INCEPTION_NPZ)
    allow_uncalibrated_fid: bool = False  # explicit opt-in to random-feature FID (run-internal only)
    compute_swds: bool = False
    compute_ssims: bool = False
    compute_psnrs: bool = False
    compute_mses: bool = False
    compute_nrmses: bool = False
    # native prefetch executor (runtime/; auto-fallback to the Python
    # thread when the library is absent)
    native_prefetch: bool = True
    # --- HPO (reference main.py:343-354) ---
    optuna_distributed: bool = False
    optuna_ntrials: Optional[int] = None
    # Variance-aware objectives (round-5): train each trial's config under
    # k seeds and report the MEDIAN objective.  The round-4 NAS head-to-head
    # measured per-arch seed variance at ~7x the architecture effect size
    # (docs/evidence/nas_headtohead_r4.json), so single-seed sweep rankings
    # are mostly draw noise; k>=2 makes the value the sampler optimizes a
    # seed-robust statistic.  Pruning rides the FIRST seed's trajectory;
    # per-seed values land in trial.user_attrs["seed_values"].
    hpo_seeds: int = 1
    # ntrials=None runs trials until walltime (reference main.py:199-205 reads
    # the remaining SLURM budget; here it's an explicit bound in seconds)
    optuna_walltime: Optional[float] = None
    optuna_use_best_trial: bool = False
    optuna_storage: Optional[str] = None
    optuna_study_name: Optional[str] = None
    optuna_pruner: str = "median"
    optuna_sampler: str = "TPE"
    optuna_warmup_steps: int = 20000
    optuna_TPE_multivariate: bool = False
    optuna_CMA_consider_pruned_trials: bool = False
    optuna_CMA_restart_strategy: Optional[str] = None
    optuna_CMA_inc_popsize: int = 2
    optuna_square_kernels: bool = False
    # --- input normalization (reference main.py:356-357) ---
    data_mean: Optional[float] = None
    data_stddev: Optional[float] = None
    # --- TPU-native additions (no reference equivalent) ---
    compute_dtype: str = "float32"  # "bfloat16" for mixed precision (SURVEY §5.9)
    # host->device input dtype. "auto" (default) resolves in finalize():
    # bfloat16 when compute_dtype is bfloat16 — BIT-EXACT, because the step's
    # first op casts the batch to compute dtype anyway (train/step.py) and
    # host-side f32->bf16 is the same round-to-nearest-even — else float32.
    # "float16" also halves the transfer but double-rounds (~1e-3 relative,
    # below bf16 compute noise). Measured: the f32 host path cost 44% of
    # production throughput through the relay (BASELINE.md input-transfer A/B).
    transfer_dtype: str = "auto"
    num_data_shards: Optional[int] = None  # mesh 'data' axis; None = all devices
    num_space_shards: int = 1  # spatial halo sharding for huge phases (SURVEY §5.7)
    # second spatial axis (H) shards for pod-scale meshes (>8 chips or depth
    # too shallow to shard further): 'space' shards D, 'space2' shards H —
    # both are GSPMD annotations, XLA inserts the 2D halo exchanges
    num_space2_shards: int = 1
    profile_dir: Optional[str] = None
    use_pallas_fusion: bool = False  # fused bias+lrelu+pixelnorm Pallas kernels
    remat: bool = False  # jax.checkpoint G/D forwards: recompute activations in backward (HBM for FLOPs)
    # remat with per-resolution-block activations OFFLOADED to pinned host
    # memory instead of recomputed — the single-chip path for volumes whose
    # activation footprint exceeds HBM (phase 8 = 128x512x512 is infeasible
    # even at batch 1 with plain remat, BASELINE.md dress rehearsal; the
    # reference used big-RAM CPU nodes, scripts/run_haswell.jb).  Trades
    # PCIe/DMA bandwidth for HBM.
    remat_offload: bool = False
    lazy_gp: int = 1  # apply the gradient penalty every k-th step with k-scaled weight (StyleGAN2 lazy regularization; 1 = reference-exact)
    # reduce the GP norm over ALL non-batch axes in the simultaneous loss
    # instead of the reference's literal axes (1, 2, 3) quirk (reference
    # loss.py:140 drops the last spatial axis for 3D volumes)
    gp_full_reduction: bool = False
    full_state_checkpoints: bool = False  # periodic checkpoints also save the full TrainState (optimizer slots) for exact mid-phase resume
    # graceful preemption: on SIGTERM/SIGINT finish the in-flight step, write
    # an exact-resume full-state checkpoint (<logdir>/model_<p>_step_<n>_interrupt.pkl),
    # and exit with code 75 (EX_TEMPFAIL) + a --continue_path resume hint —
    # the TPU-native analog of surviving the reference's SLURM preemption
    # signals (scripts/*.jb jobs are requeueable).  Opt out with
    # --no_graceful_shutdown.
    graceful_shutdown: bool = True
    # requeue-friendly resume: at startup scan the logdir for the newest
    # resume point (preemption/periodic full-state .pkl, else the last
    # completed phase's model_<P>.npz) and continue from it — so a scheduler
    # can resubmit the SAME command line after the exit-75 preemption path
    # with no flag edits.  Ignored when --continue_path is given explicitly.
    auto_resume: bool = False
    # bound disk growth on long runs: keep only the newest N cadence
    # checkpoints (model_<p>_ckpt_<s>.npz/_full.pkl) per phase.  0 (default)
    # keeps everything — the reference's effective behavior (it builds a
    # fresh tf.train.Saver per cadence save, so max_to_keep never prunes).
    # Phase-final checkpoints, preemption resume points, and the divergence
    # rewind hint's finite-confirmed checkpoint are never pruned.
    keep_checkpoints: int = 0
    # fail fast when a summary-step loss fetch is non-finite (raise
    # TrainingDiverged naming the last checkpoint) instead of the
    # reference's behavior of training on through NaN — opt-in because the
    # parity default must match the reference
    abort_on_nonfinite: bool = False
    # compute conv-after-upscale as one transposed conv — exact (oracle +
    # gradient tested), +5.6% train / +25% inference measured on v5e; default
    # on, opt out with --no_fused_transitions
    fused_transitions: bool = True
    # assemble WGAN simultaneous gradients from per-term vjps so the fake
    # batch takes ONE discriminator backward instead of two — exact
    # (losses.grads_simultaneous; grad-equality pinned in tests); default
    # on, opt out with --no_fused_grads
    fused_grads: bool = True
    # algebra of the gradient-penalty parameter gradient in the fused-grads
    # step: 'revrev' (reverse-over-reverse, the textbook grad-of-grad) or
    # 'revfwd' (reverse-over-forward: grad of a jvp in the frozen-cotangent
    # direction).  Both exact (equality pinned in tests); revrev measured
    # ~1.3% faster on v5e at phase 6, so it is the default (BASELINE.md).
    gp_grad_mode: str = "revrev"
    # stack the fake and real critic passes through one vmap'ped D so XLA
    # emits a single 2N-batched forward/backward pair instead of two
    # N-batched subgraphs — exact for every family (vmap keeps
    # minibatch-stddev statistics within each pass; equality pinned in
    # tests).  Only reachable on the fused-grads WGAN path.  Measured on
    # v5e phase 6 batch 8: 380.2 -> 358.0 ms traced-alpha, 343.6 -> 321.7
    # ms static0 (+6.4% throughput) — default on, opt out with
    # --no_batched_passes.
    batched_passes: bool = True
    # ONE-FLAG preset for training volumes whose activation footprint
    # exceeds a single chip's HBM (phase 8 = 128x512x512 measured on a
    # 16 GB v5e, BASELINE.md "Phase-8 on one chip"): turns on host-offload
    # remat + the layout-safe op formulations (window pooling,
    # compute-dtype statistics, Pallas flat conv — XLA:TPU's
    # channels-on-lanes layouts pad C=8 full-res tensors 16-256x in the
    # default forms), turns OFF the vmap-stacked critic pass (its 2N stack
    # drew a 128x-padded layout at this scale), and raises the scoped-VMEM
    # compile limit for the Pallas halo windows at 512^2 planes.  The
    # reference could only run this scale on big-RAM CPU nodes
    # (scripts/run_haswell.jb).  Explicit SARAGAN_* env vars still win.
    single_chip_big_volume: bool = False
    # per-compile scoped-VMEM limit (KiB) forwarded as the proto-backed
    # xla_tpu_scoped_vmem_limit_kib option — the only form that reaches a
    # relayed remote compiler.  -1 (default) = auto: 32768 on TPU backends
    # (interleaved A/B: 322->303 ms at phase 6, 564->530 ms at phase 7 —
    # ~+6.5% exact, with 40960/49152 measurably worse, scripts/
    # ab_compiler_opts.py), nothing elsewhere; 0 = backend default (16 MB);
    # >0 = explicit.  Compiles that reject the option fall back to the
    # backend default (parallel/mesh.py::aot_with_options).
    scoped_vmem_kib: int = -1

    # ------------------------------------------------------------------
    # Derived properties
    # ------------------------------------------------------------------

    @property
    def start_shape_t(self) -> Tuple[int, ...]:
        return parse_tuple(self.start_shape)

    @property
    def final_shape_t(self) -> Tuple[int, ...]:
        return parse_tuple(self.final_shape)

    @property
    def base_shape(self) -> Tuple[int, ...]:
        """(channels, *spatial) at phase 1 (reference utils.py:219-224)."""
        return self.start_shape_t

    @property
    def image_channels(self) -> int:
        return self.start_shape_t[0]

    @property
    def ndim(self) -> int:
        """Spatial rank: 3 for volumes, 2 for images."""
        return len(self.start_shape_t) - 1

    @property
    def num_phases(self) -> int:
        return num_phases_from_shapes(self.start_shape, self.final_shape)

    def current_shape(self, phase: int, batch_size: int) -> Tuple[int, ...]:
        """Input shape at `phase` (reference utils.py:163-168)."""
        s = self.start_shape_t
        return (batch_size, s[0], *[d * 2 ** (phase - 1) for d in s[1:]])

    def resolved_kernel_spec(self) -> list:
        """Derive a kernel spec from --conv_kernel_size with the reference's
        adaptive shrinking: kernels never exceed the phase's spatial dims
        (largest odd size that fits — reference networks/ops.py:31-58
        `get_kernel`, applied per layer in the legacy num_filters models)."""
        if self.kernel_spec is not None:
            return self.kernel_spec
        from saragan_tpu.ops import get_kernel

        k = list(self.conv_kernel_size)[: self.ndim]
        if len(k) < self.ndim:
            k = k + [k[-1]] * (self.ndim - len(k))
        base = self.base_shape
        spec = []
        for phase in range(1, self.num_phases + 1):
            spatial = [d * 2 ** (phase - 1) for d in base[1:]]
            kk = get_kernel(spatial, k)
            spec.append([([] if phase == 1 else list(kk)), list(kk)])
        return spec

    def resolved_filter_spec(self) -> list:
        if self.filter_spec is not None:
            return self.filter_spec
        size = self.network_size or "xs"
        return default_filter_spec(self.num_phases, self.base_shape, size=size, ndim=self.ndim)

    def batch_size_for_phase(self, phase: int, global_size: int = 1) -> int:
        """Per-worker batch size: halves per phase; the global cap is
        CONSTANT across phases (reference optuna_objective.py:127-136 caps
        the local batch at max_global_batch_size / global_size in every
        phase — it does not shrink the cap as the phase grows)."""
        assert self.base_batch_size is not None
        batch_size = max(1, self.base_batch_size // (2 ** (phase - 1)))
        if self.max_global_batch_size is not None:
            max_local = max(1, self.max_global_batch_size // global_size)
            if max_local * global_size > self.max_global_batch_size:
                # the floor-at-1 keeps every worker busy, but the global
                # batch (= global_size) then exceeds the configured cap —
                # the reference instead asserts batch_size * global_size <=
                # max_global_batch_size (optuna_objective.py:133); surface it
                import warnings

                warnings.warn(
                    f"global batch {max_local * global_size} exceeds "
                    f"max_global_batch_size={self.max_global_batch_size}: "
                    f"{global_size} workers need at least 1 sample each",
                    stacklevel=2,
                )
            batch_size = min(batch_size, max_local)
        return batch_size

    def finalize(self) -> "Config":
        """Post-parse derived defaults (reference main.py:383-411): LR
        rise/decay iteration counts default from the phase length, and D-side
        optimizer hyperparameters mirror G unless d_use_different_*."""
        c = dataclasses.replace(self)
        if c.transfer_dtype == "auto":
            # bf16 transfer is bit-exact under bf16 compute (the step casts
            # the batch to compute dtype first; host-side RNE == device-side
            # RNE) and halves host->device bytes; under f32 compute a
            # down-cast would lose real precision, so keep f32.
            c.transfer_dtype = ("bfloat16" if c.compute_dtype == "bfloat16"
                                else "float32")
        if c.g_lr_rise_niter is None:
            c.g_lr_rise_niter = c.mixing_nimg // 2
        if c.g_lr_decay_niter is None:
            c.g_lr_decay_niter = c.stabilizing_nimg // 2
        if c.d_lr_rise_niter is None:
            c.d_lr_rise_niter = c.mixing_nimg // 2
        if c.d_lr_decay_niter is None:
            c.d_lr_decay_niter = c.stabilizing_nimg // 2
        if not c.d_use_different_optimizer:
            c.d_optimizer = c.optimizer
        if not c.d_use_different_beta1:
            c.d_adam_beta1 = c.adam_beta1
        if not c.d_use_different_beta2:
            c.d_adam_beta2 = c.adam_beta2
        if not c.d_use_different_rho:
            c.d_rho = c.rho
        if not c.d_use_different_momentum:
            c.d_momentum = c.momentum
        if not c.d_use_different_weight_decay:
            c.d_weight_decay = c.weight_decay
        if c.ending_phase is None:
            # programmatic construction: default to the full schedule; the
            # oversize fail-fast below then only fires on EXPLICIT values
            c.ending_phase = c.num_phases
        if c.architecture == "stylegan2":
            # reference main.py:413-414: stylegan2 has no progressive alpha
            assert c.starting_phase == c.ending_phase, (
                "stylegan2 does not support progressive growing; "
                "starting_phase must equal ending_phase"
            )
        if c.starting_phase > c.num_phases:
            # without this the phase loop `range(starting_phase, num_phases+1)`
            # is empty and a run exits 0 having trained nothing (observed:
            # --starting_phase 2 with final==2*start silently no-ops)
            raise ValueError(
                f"starting_phase={c.starting_phase} exceeds num_phases="
                f"{c.num_phases} (= log2(final/start) from start_shape="
                f"{c.start_shape}, final_shape={c.final_shape}); the run "
                f"would train nothing. Grow final_shape or lower "
                f"starting_phase."
            )
        if c.ending_phase and c.ending_phase > c.num_phases:
            # the phase loop tops out at num_phases regardless, so an
            # oversized ending_phase silently trains FEWER phases than
            # asked (observed: --ending_phase 3 with final==4*start ran
            # 2 phases and exited 0)
            raise ValueError(
                f"ending_phase={c.ending_phase} exceeds num_phases="
                f"{c.num_phases} (= log2(final/start) from start_shape="
                f"{c.start_shape}, final_shape={c.final_shape}); the run "
                f"would stop at phase {c.num_phases}. Grow final_shape or "
                f"lower ending_phase."
            )
        if c.single_chip_big_volume:
            c.remat_offload = True
            c.batched_passes = False
            # the exact upscale+conv fusion's lhs-dilated conv keeps an
            # 8-channel full-res intermediate in a channels-on-lanes layout
            # (16x pad -> 17.4 GB at phase 8, measured) that no conv-engine
            # option reaches — the preset recipe runs unfused transitions
            c.fused_transitions = False
            if c.scoped_vmem_kib <= 0:
                c.scoped_vmem_kib = 65536
        return c

    def apply_runtime_opts(self, spatial: bool = False,
                           inference: bool = False) -> None:
        """Apply the config's op-formulation choices to the process-wide op
        gates (saragan_tpu.ops.core module globals, read at trace time).

        The single-chip big-volume preset selects the layout-safe
        formulations measured necessary at phase 8 (BASELINE.md wall-by-wall
        table).  Explicit SARAGAN_* environment variables keep precedence —
        they are the documented low-level override surface.  Call before any
        model trace (the Trainer does this in __init__).

        Default conv engine on a TPU backend (round 5): **s2d** for
        TRAINING — space-to-depth channel packing for the skinny-channel
        convs, an exact rewrite measured +9% at the phase-6 bench shape
        and +73% at phase 7 vs XLA's direct conv (BASELINE.md round-5
        table; bit-identical losses, f64 oracles in tests/test_s2d.py).
        Not used when `spatial` (a depth/height-sharded mesh): the fold's
        D->(D/2,2) reshape would force cross-shard resharding per conv —
        pass the mesh's spatial-ness from the Trainer.  Not used for
        `inference` (the serving/generation samplers): the forward-only
        path has none of the backward layout walls the fold wins back, so
        its 8x folded-madd overhead is a measured NET LOSS there (serving
        b8 41.7 vs 36.7 ms/batch, round-5 bench) — samplers pass
        inference=True and keep direct.  CPU backends keep direct (tests
        pin oracle numerics there).

        The gates are set BOTH ways: a non-preset config restores the
        env-derived defaults, so sequential Trainers in one process (HPO
        trials, phase-chaining drivers) don't inherit a previous preset's
        op formulations.
        """
        import os

        from saragan_tpu.ops import core as ops_core

        preset = self.single_chip_big_volume
        pool = os.environ.get("SARAGAN_POOL")
        ops_core.POOL_WINDOW = (pool == "window") if pool is not None else preset
        stats = os.environ.get("SARAGAN_STATS_DTYPE")
        ops_core.STATS_ACCUM_F32 = (stats != "compute") if stats is not None else not preset
        conv = os.environ.get("SARAGAN_CONV3D")
        if conv is None:
            if preset:
                conv = "pallas"
            else:
                try:
                    import jax

                    on_tpu = jax.default_backend() not in ("cpu",)
                except Exception:
                    on_tpu = False
                conv = "s2d" if (on_tpu and not spatial and not inference) else "direct"
        ops_core.CONV3D_ALGORITHM = conv
