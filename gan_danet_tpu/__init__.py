"""gan_danet_tpu — a TPU-native framework with the capabilities of GAN-DANet.

A from-scratch JAX/XLA/Pallas rebuild of the GRACE TWSA spatial-downscaling
research framework (reference: Aster32/GAN-DANet). The compute path is pure
JAX (pjit/shard_map over device meshes, Pallas kernels for the hot attention
ops); the data path is a cache-compatible NumPy/host pipeline.

Layering (mirrors SURVEY.md §1, redesigned TPU-first):
  core/       config, meshes, precision, logging, checkpointing
  ops/        numeric kernels: torch-parity resize, PAM/CAM attention
              (Pallas + XLA fallback), SSIM, TV, gaussian filters, STL,
              histogram matching
  models/     generator (DANet dense-attention SR net), discriminators,
              losses (perceptual/TV/SSIM), baselines (AE, HAT, diffusion)
  data/       readers (NetCDF), preprocessing, cache, synthetic data,
              batching & augmentation
  train/      GAN trainer, schedules, ensembles
  infer/      0.25 deg and 0.05 deg downscaling pipelines + exporters
  evaluation/ metrics, Taylor diagram, plots, basin analysis
  parallel/   mesh & sharding helpers (DP + ensemble parallelism)
"""

__version__ = "0.1.0"

from gan_danet_tpu.core.config import (  # noqa: F401
    DataConfig,
    GeneratorConfig,
    DiscriminatorConfig,
    LossConfig,
    TrainConfig,
    MeshConfig,
    ExperimentConfig,
)
