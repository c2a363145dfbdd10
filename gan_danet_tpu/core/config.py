"""Configuration layer.

The reference scatters configuration across env vars read at import time
(`datasets.py:16-54`) and hard-coded notebook constants
(`GAN_DANet_train.ipynb` cells 0-1). Here everything is a frozen dataclass
with an explicit env-var overlay (`DataConfig.from_env`) that honours the
same variable names (PROJECT_DIR, DATA_DIR, ERA5_SUBDIR, CACHE_DIR,
REBUILD_CACHE, QZ_RLWE_05, ...), so existing reference deployments can point
this framework at their data without edits.
"""
from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional, Tuple


# Geographic layout of the Tibetan-Plateau study region
# (reference datasets.py:352-369): lat 24.5-45.5N, lon 65.5-109.5E.
GRID_05 = (44, 90)      # 0.5 deg  (lat, lon)
GRID_025 = (88, 180)    # 0.25 deg
GRID_005 = (440, 900)   # 0.05 deg
N_AUX_CHANNELS = 45     # GLDAS 36 + t2m/et/p/ro/sde/tp + lat/lon/DEM
N_TIME = 181            # monthly samples from 2002-08


def _env(name: str, default: str) -> str:
    return os.getenv(name, default)


@dataclass(frozen=True)
class DataConfig:
    """Paths + preprocessing knobs (reference datasets.py env contract)."""

    project_dir: str = "."
    data_dir: str = "/mnt/sdc/xy/data_op"
    era5_subdir: str = "ERA5/11"
    cache_dir: str = "./cache"
    rebuild_cache: bool = False

    # Input .npy names (relative to project_dir), reference datasets.py:27-42
    qz_rlwe_05: str = "qz_rlwe-05.npy"
    qz_rlwe_25: str = "qz_rlwe-25.npy"
    gldas25: str = "gldas25.npy"
    dem_npy: str = "dem.npy"
    mask_low: str = "tpb_l.npy"     # (44, 90) plateau mask
    mask_high: str = "tpb_h.npy"    # (88, 180)

    # Grid layout: arrays are (T, lat, lon)
    n_time: int = N_TIME
    grid_05: Tuple[int, int] = GRID_05
    grid_025: Tuple[int, int] = GRID_025
    grid_005: Tuple[int, int] = GRID_005
    n_aux: int = N_AUX_CHANNELS
    lat_range: Tuple[float, float] = (24.5, 45.5)
    lon_range: Tuple[float, float] = (65.5, 109.5)

    # Preprocessing (reference datasets.py:350-501)
    gldas_smooth_sigma: float = 3.0
    stl_period: int = 12
    stl_seasonal: int = 13
    augmentation_factor: int = 2       # FFT augmentation copies
    augmentation_seasonal_freq: int = 12
    augmentation_noise: float = 0.1
    # Run the numeric preprocessing stages (standardise -> gaussian smooth
    # -> STL detrend -> FFT augment) as jit-compiled device programs
    # (BASELINE.json north-star clause); ingest, placeholder fills and
    # cache IO stay on host. Host/device pipelines agree to f32 tolerance
    # (tests/test_data.py).
    device_preprocess: bool = False

    # Synthetic fallback (the TEST_MODE the reference README promised but
    # never implemented — SURVEY.md §4.7)
    synthetic: bool = False
    synthetic_seed: int = 0

    @classmethod
    def from_env(cls, **overrides) -> "DataConfig":
        kw = dict(
            project_dir=_env("PROJECT_DIR", "."),
            data_dir=_env("DATA_DIR", "/mnt/sdc/xy/data_op"),
            era5_subdir=_env("ERA5_SUBDIR", "ERA5/11"),
            cache_dir=_env("CACHE_DIR", "./cache"),
            rebuild_cache=_env("REBUILD_CACHE", "0").lower() in ("1", "true", "yes"),
            qz_rlwe_05=_env("QZ_RLWE_05", "qz_rlwe-05.npy"),
            qz_rlwe_25=_env("QZ_RLWE_25", "qz_rlwe-25.npy"),
            gldas25=_env("GLDAS25", "gldas25.npy"),
            dem_npy=_env("DEM_NPY", "dem.npy"),
        )
        kw.update(overrides)
        return cls(**kw)

    @property
    def cache_path(self) -> Path:
        return Path(self.cache_dir).resolve()


@dataclass(frozen=True)
class GeneratorConfig:
    """FlexibleUpsamplingModule hyper-parameters (reference
    models/generator.py:175-247)."""

    input_channels: int = 46           # 45 aux + 1 GRACE
    base_channels: int = 64
    growth_rate: int = 24
    num_blocks: int = 3
    num_layers_per_block: int = 4
    attention_type: str = "danet"      # 'danet' | 'senet' | 'cbam' | 'none'
                                       # ('senet'/'cbam' alias to danet with a
                                       # warning, faithful to the reference)
    upsample_factor: int = 4           # two bicubic x2 stages
    pam_reduction: int = 8
    se_reduction: int = 16
    norm: str = "batch"                # 'batch' | 'group'
    # True -> the auto impl policy on TPU (materialised (B,N,N) under the
    # batch*tokens^2 HBM budget — N=2048 at the reference batch 12 —
    # Pallas flash kernel above; ops/attention.resolve_pam_impl);
    # False forces the XLA blocked scan everywhere
    use_pallas_attention: bool = True
    dtype: str = "float32"             # compute dtype ('float32'|'bfloat16');
                                       # params/BN stats always stay float32


@dataclass(frozen=True)
class DiscriminatorConfig:
    """Discriminator1 (reference models/discriminator.py:57-77). The torch
    LazyLinear is replaced by a static flatten size derived from
    `input_hw` — TPU compilation requires static shapes."""

    input_channels: int = 1
    input_hw: Tuple[int, int] = (88, 180)
    widths: Tuple[int, ...] = (64, 128, 256, 512)
    hidden: int = 1024
    leaky_slope: float = 0.2
    dtype: str = "float32"


@dataclass(frozen=True)
class LossConfig:
    """G-loss composition (reference GAN_DANet_train.ipynb cell 0):
    loss_G = (1-w)*MSE + w*adv + TV + perceptual, with w = epoch/epochs.
    SSIM is computed but excluded from the total in the reference — kept
    behind `use_ssim` (default False = faithful)."""

    tv_weight: float = 1e-5
    use_ssim: bool = False
    ssim_window: int = 11
    use_perceptual: bool = True
    perceptual_layers: Tuple[int, ...] = (1, 6, 11, 20)
    vgg_weights_path: Optional[str] = None   # torch .pth; random init if None


@dataclass(frozen=True)
class TrainConfig:
    """ModelTrainer hyper-parameters (reference GAN_DANet_train.ipynb)."""

    epochs: int = 150
    batch_size: int = 12
    lr_g: float = 2e-4
    lr_d: float = 4e-4
    adam_b1: float = 0.5
    adam_b2: float = 0.999
    weight_decay: float = 1e-4
    cosine_t0: int = 10              # CosineAnnealingWarmRestarts(T_0=10, T_mult=2)
    cosine_t_mult: int = 2
    eta_min: float = 1e-6
    early_stop_patience: int = 20
    early_stop_min_delta: float = 0.0
    test_fraction: float = 0.2
    seed: int = 42
    shuffle: bool = False            # faithful: the main notebook's DataLoader
                                     # does NOT shuffle; deep_ensemble's does
    ensemble_shuffle: bool = True    # faithful per-path default: the
                                     # deep-ensemble ModelTrainer copy uses
                                     # DataLoader(train, shuffle=True)
                                     # (deep_ensemble.ipynb cell 0);
                                     # EnsembleTrainer overrides `shuffle`
                                     # with this value
    augment: bool = False            # per-batch flip/rot/noise augmentation
    dtype: str = "bfloat16"          # compute dtype; params/BN stats stay f32
    checkpoint_dir: str = "./checkpoints"
    log_every: int = 1


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout. Axes:
      'data'     — batch (data parallel, gradient allreduce over ICI)
      'ensemble' — deep-ensemble members (embarrassingly parallel)
    """

    data: int = -1       # -1: all remaining devices
    ensemble: int = 1

    def axis_sizes(self, n_devices: int) -> Tuple[int, int]:
        ens = max(1, self.ensemble)
        data = self.data if self.data > 0 else max(1, n_devices // ens)
        return (ens, data)


@dataclass(frozen=True)
class ExperimentConfig:
    data: DataConfig = field(default_factory=DataConfig)
    generator: GeneratorConfig = field(default_factory=GeneratorConfig)
    discriminator: DiscriminatorConfig = field(default_factory=DiscriminatorConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, s: str) -> "ExperimentConfig":
        d = json.loads(s)

        def build(tp, key):
            sub = d.get(key, {})
            fields = {f.name for f in dataclasses.fields(tp)}
            kw = {k: v for k, v in sub.items() if k in fields}
            for f in dataclasses.fields(tp):
                if f.name in kw and isinstance(f.default, tuple):
                    kw[f.name] = tuple(kw[f.name])
            return tp(**kw)

        return cls(
            data=build(DataConfig, "data"),
            generator=build(GeneratorConfig, "generator"),
            discriminator=build(DiscriminatorConfig, "discriminator"),
            loss=build(LossConfig, "loss"),
            train=build(TrainConfig, "train"),
            mesh=build(MeshConfig, "mesh"),
        )
