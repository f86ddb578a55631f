"""saragan_tpu — TPU-native progressive-growing GAN framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of sara-nl/saraGAN
(reference surveyed in /root/repo/SURVEY.md): progressive-growing GAN training
for 2D images and 3D medical CT volumes, with WGAN-GP / logistic losses,
equalized learning rate, EMA, phase-chained checkpoints, FID/SWD/SSIM metrics,
data-parallel + spatially-sharded training over a TPU mesh, and a built-in
hyperparameter-optimization harness.

Layer map (bottom-up):
    ops/        functional op library (+ Pallas fused kernels)
    models/     pgan, pgan2, pgandeep, stylegan, stylegan2, surfgan (2D & 3D)
    losses      WGAN-GP (grad-of-grad) and logistic losses
    optim/      optimizer factory, LR schedules, EMA, freeze masks
    data/       npy-pyramid dataset, exactly-once sharded batching, normalize
    parallel/   mesh construction, sharded train steps, halo-exchange convs
    train/      phase driver, counters, checkpointing, summaries
    metrics/    SWD, SSIM/PSNR/MSE/NRMSE, FID machinery
    hpo/        hyperparameter-optimization harness (Optuna-compatible API)
    tools/      generation / inference utilities
"""

__version__ = "0.1.0"
