"""Data layer: synthetic generation, preprocessing pipeline, cache
round-trip, batcher semantics."""
import numpy as np

import jax
import jax.numpy as jnp

from gan_danet_tpu.data.cache import cache_exists, load_cache, save_cache
from gan_danet_tpu.data.dataset import (
    ArrayDataset,
    Batcher,
    apply_augmentation,
    train_test_split_indices,
)
from gan_danet_tpu.data.pipeline import (
    load_data,
    load_data_with_augmentation,
    load_or_build_cache,
)
from gan_danet_tpu.data.preprocess import (
    fill_placeholder_with_nearest,
    frequency_domain_augmentation,
)
from gan_danet_tpu.data.scalers import StandardScaler, as_scaler_stats
from gan_danet_tpu.data.synthetic import make_synthetic_raw, tiny_config


def test_synthetic_shapes():
    cfg = tiny_config(24)
    raw = make_synthetic_raw(cfg, seed=1)
    assert raw.grace_05.shape == (24, 8, 10)
    assert raw.grace_025.shape == (24, 16, 20)
    assert raw.gldas.shape == (24, 16, 20, 36)
    assert raw.era5.shape == (24, 16, 20, 6)
    assert raw.dem.shape == (16, 20)
    assert set(np.unique(raw.mask_high)) <= {0.0, 1.0}


def test_synthetic_block_consistency():
    """0.5deg field must be the coarse view of the 0.25deg field."""
    raw = make_synthetic_raw(tiny_config(24), seed=2)
    block = raw.grace_025.reshape(24, 8, 2, 10, 2).mean(axis=(2, 4))
    corr = np.corrcoef(block.ravel(), raw.grace_05.ravel())[0, 1]
    assert corr > 0.99


def test_load_data_contract():
    cfg = tiny_config(36)
    ([d05, t05], [d25, t25], aux, s05, s025, s_aux) = load_data(cfg)
    assert d05.shape == (36, 8, 10) and t05.shape == d05.shape
    assert d25.shape == (36, 16, 20) and t25.shape == d25.shape
    assert aux.shape == (36, 16, 20, 45)
    assert len(s_aux) == 45
    # standardized + detrended: near zero mean
    assert abs((d05 + t05).mean()) < 0.2
    # reconstruction exactness (reference invariant)
    stats = as_scaler_stats(s05)
    assert stats.scale > 0


def test_augmented_load_triples_time():
    cfg = tiny_config(24)
    ([d05, t05], [d25, t25], aux, *_s) = load_data_with_augmentation(cfg)
    assert d05.shape[0] == 72  # (1 + 2 augmentations) * 24
    assert t05.shape[0] == 72
    assert aux.shape[0] == 72


def test_cache_roundtrip(tmp_path):
    cfg = tiny_config(24)
    data = load_data(cfg)
    ([d05, t05], [d25, t25], aux, s05, s025, s_aux) = data
    save_cache(tmp_path, d05, t05, d25, t25, aux, s05, s025, s_aux)
    assert cache_exists(tmp_path)
    ([l05, lt05], [l25, lt25], laux, ls05, ls025, ls_aux) = load_cache(tmp_path)
    np.testing.assert_array_equal(l05, d05.astype(np.float32))
    np.testing.assert_allclose(ls05.mean_, s05.mean_)
    assert len(ls_aux) == 45


def test_load_or_build_cache_uses_cache(tmp_path):
    import dataclasses

    cfg = dataclasses.replace(tiny_config(24), cache_dir=str(tmp_path))
    first = load_or_build_cache(cfg)
    assert cache_exists(tmp_path)
    second = load_or_build_cache(cfg)
    np.testing.assert_array_equal(first[0][0], second[0][0])


def test_fft_augmentation_preserves_shape_and_energy(rng):
    x = rng.standard_normal((48, 6, 8)).astype(np.float32)
    y = frequency_domain_augmentation(x, seasonal_freq=12, noise_level=0.1,
                                      rng=np.random.default_rng(0))
    assert y.shape == x.shape
    assert 0.5 < y.std() / x.std() < 2.0
    assert not np.allclose(y, x)


def test_placeholder_inpainting(rng):
    x = rng.standard_normal((4, 20, 24)).astype(np.float32) + 5.0
    x[:, 5:8, 5:9] = -99999.0
    filled = fill_placeholder_with_nearest(x, placeholder=-9999)
    assert filled.min() > -50  # inpainted
    assert np.allclose(filled[:, 0, 0], x[:, 0, 0])  # untouched elsewhere


def test_placeholder_inpainting_matches_reference_algorithm(rng):
    """Bit-level parity with the reference's normalized-convolution
    inpainting (datasets.py:222-250): scipy gaussian_filter over the FULL
    (T,H,W) cube — time axis smoothed too — on the zero-filled field and
    the validity mask, divided, substituted at placeholder sites."""
    import scipy.ndimage

    x = rng.standard_normal((12, 20, 24)).astype(np.float64) + 5.0
    x[3:6, 5:8, 5:9] = -99999.0
    got = fill_placeholder_with_nearest(x, placeholder=-9999, sigma=3.0)

    mask = x <= -9999
    filled = np.where(mask, 0.0, x)
    sm = scipy.ndimage.gaussian_filter(filled, sigma=3.0, mode="reflect")
    msm = scipy.ndimage.gaussian_filter((~mask).astype(float), sigma=3.0,
                                        mode="reflect")
    msm[msm == 0] = 1.0
    want = np.where(mask, sm / msm, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_placeholder_inpainting_handles_nan(rng):
    """Reader-masked NaNs must be inpainted, not passed through (ADVICE r1:
    NaN <= placeholder is False, so they used to survive into the scaler)."""
    x = rng.standard_normal((4, 20, 24)).astype(np.float32) + 5.0
    x[:, 5:8, 5:9] = np.nan
    x[:, 10:12, 2:4] = -99999.0
    filled = fill_placeholder_with_nearest(x, placeholder=-9999)
    assert np.isfinite(filled).all()
    assert filled.min() > -50
    assert np.allclose(filled[:, 0, 0], x[:, 0, 0])


def test_t2m_kelvin_placeholder_quirk():
    """The reference inpaints t2m with placeholder=100 (datasets.py:390) —
    values <= 100 K are fill sites. Inject cold placeholders + NaNs into
    the synthetic Kelvin t2m channel and check the pipeline cleans them."""
    cfg = tiny_config(24)
    raw = make_synthetic_raw(cfg, seed=3)
    assert raw.era5[..., 0].min() > 100.0  # synthetic t2m is in Kelvin
    raw.era5[:, 3:5, 3:5, 0] = -32767.0    # classic fill value, <= 100 K
    raw.era5[:, 8:9, 8:9, 0] = np.nan      # reader-masked invalid
    raw.era5[:, 2:3, 2:3, 3] = np.nan      # NaN in a non-t2m ERA5 channel
    ([d05, _], [d25, _], aux, *_s) = load_data(cfg, raw)
    assert np.isfinite(aux).all()
    assert np.isfinite(d05).all() and np.isfinite(d25).all()
    # standardized t2m channel (index 36) should look standard, not blown up
    t2m_std = aux[..., 36]
    assert abs(t2m_std.mean()) < 0.1 and 0.5 < t2m_std.std() < 2.0


def test_scaler_roundtrip(rng):
    x = 3.0 * rng.standard_normal((10, 5)) + 7.0
    s = StandardScaler()
    z = s.fit_transform(x)
    assert abs(z.mean()) < 1e-9
    np.testing.assert_allclose(s.inverse_transform(z), x, rtol=1e-9)


def test_split_is_deterministic():
    a1, b1 = train_test_split_indices(100, 0.2, 42)
    a2, b2 = train_test_split_indices(100, 0.2, 42)
    np.testing.assert_array_equal(a1, a2)
    assert len(b1) == 20
    a3, _ = train_test_split_indices(100, 0.2, 26)
    assert not np.array_equal(a1, a3)


def test_batcher_fixed_size_wraparound():
    ds = ArrayDataset(np.arange(10).reshape(10, 1, 1).astype(np.float32) *
                      np.ones((10, 4, 6), np.float32),
                      np.zeros((10, 8, 12), np.float32),
                      np.zeros((10, 8, 12, 3), np.float32))
    batches = list(Batcher(ds, batch_size=4))
    assert len(batches) == 3
    for b in batches:
        assert b["lr05"].shape == (4, 4, 6, 1)
    # wrap-around: final batch reuses leading samples
    np.testing.assert_array_equal(batches[2]["lr05"][2], batches[0]["lr05"][0])


def test_batcher_drop_last():
    ds = ArrayDataset(np.zeros((10, 4, 6), np.float32),
                      np.zeros((10, 8, 12), np.float32),
                      np.zeros((10, 8, 12, 3), np.float32))
    assert len(list(Batcher(ds, 4, drop_last=True))) == 2


def test_augmentation_jittable(rng):
    batch = {
        "lr05": jnp.asarray(rng.standard_normal((2, 4, 6, 1)).astype(np.float32)),
        "lr025": jnp.asarray(rng.standard_normal((2, 8, 12, 1)).astype(np.float32)),
        "aux": jnp.asarray(rng.standard_normal((2, 8, 12, 3)).astype(np.float32)),
    }
    out = jax.jit(apply_augmentation)(batch, jax.random.PRNGKey(0))
    assert out["lr05"].shape == batch["lr05"].shape
    assert out["aux"].shape == batch["aux"].shape


def test_fft_augmentation_matches_explicit_fft_oracle(rng):
    """The cosine-kernel fast path must equal the explicit
    fft -> perturb bins -> real(ifft) construction."""
    from gan_danet_tpu.data.preprocess import frequency_domain_augmentation

    data = rng.standard_normal((48, 6, 7)).astype(np.float32)
    seasonal_freq, noise_level, n = 12, 0.1, data.shape[0]

    got = frequency_domain_augmentation(
        data, seasonal_freq, noise_level, 0, np.random.default_rng(7))

    # oracle: same draw sequence, explicit FFT route with the reference's
    # `0 <= idx` guard (negative/tail bins are NOT perturbed)
    oracle_rng = np.random.default_rng(7)
    freq = np.fft.fft(data, axis=0)
    for idx in range(-seasonal_freq, seasonal_freq + 1):
        if 0 <= idx < n:
            freq[idx] += oracle_rng.normal(
                scale=noise_level, size=freq[idx].size).reshape(freq[idx].shape)
    want = np.real(np.fft.ifft(freq, axis=0)).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_device_preprocess_matches_host():
    """DataConfig.device_preprocess=True runs standardise -> gaussian
    smooth -> STL detrend -> FFT augment as jit-compiled device programs
    (BASELINE.json north-star clause); results must match the host numpy
    pipeline to f32 tolerance — same raw arrays, same rng consumption."""
    import dataclasses

    dc = tiny_config(24)
    raw = make_synthetic_raw(dc, seed=0)
    host = load_data_with_augmentation(dc, raw=raw)
    dev = load_data_with_augmentation(
        dataclasses.replace(dc, device_preprocess=True), raw=raw)

    ([d05_h, t05_h], [d25_h, t25_h], aux_h, s05_h, s025_h, sa_h) = host
    ([d05_d, t05_d], [d25_d, t25_d], aux_d, s05_d, s025_d, sa_d) = dev

    # standardized-detrended cubes are O(1); f32 vs f64 scaler stats and
    # f32 matmul accumulation bound the difference well under 1e-3
    for h, d, name in [(d05_h, d05_d, "d05"), (t05_h, t05_d, "t05"),
                       (d25_h, d25_d, "d25"), (t25_h, t25_d, "t25"),
                       (aux_h, aux_d, "aux")]:
        assert h.shape == d.shape, name
        np.testing.assert_allclose(d, h, rtol=1e-3, atol=1e-3, err_msg=name)

    # scaler stats agree tightly (simple reductions)
    for sh, sd in [(s05_h, s05_d), (s025_h, s025_d)] + list(zip(sa_h, sa_d)):
        np.testing.assert_allclose(sd.mean_, sh.mean_, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(sd.scale_, sh.scale_, rtol=1e-4)

    # the reconstruction invariant holds on the device path too
    np.testing.assert_allclose(d25_d[:24] + t25_d[:24],
                               (d25_h + t25_h)[:24], rtol=1e-3, atol=1e-3)


def test_infer_original_length():
    """The chronological-original length is derived from the DATA (the
    augmented stack tiles the trend cube verbatim), not config.n_time —
    real-data ingest takes T from the files, so a config mismatch must
    not mix augmented samples into 'original' slices (round-4 review
    finding)."""
    from gan_danet_tpu.data.pipeline import infer_original_length

    rng = np.random.default_rng(3)
    trend = rng.standard_normal((50, 4, 5)).astype(np.float32)
    # augmented: tiled x(1+2)
    tiled = np.tile(trend, (3, 1, 1))
    assert infer_original_length(tiled, 2) == 50
    # unaugmented series whose length HAPPENS to divide (1+k): trends are
    # not tiles of each other -> full length
    assert infer_original_length(trend[:48], 2) == 48
    # no augmentation configured
    assert infer_original_length(tiled, 0) == 150
    # a T != config-n_time real-data-style series: detection is purely
    # structural
    t2 = np.tile(rng.standard_normal((150, 2, 2)).astype(np.float32),
                 (3, 1, 1))
    assert infer_original_length(t2, 2) == 150


def test_trainer_n_original_data_derived():
    """ModelTrainer.n_original comes from the tiled-trend detection, so a
    dataset whose true length differs from config.n_time still slices the
    chronological originals correctly."""
    import dataclasses

    from gan_danet_tpu.train.trainer import ModelTrainer
    from gan_danet_tpu.core.config import (
        DiscriminatorConfig,
        ExperimentConfig,
        GeneratorConfig,
        LossConfig,
        TrainConfig,
    )

    dc = tiny_config(24)
    raw = make_synthetic_raw(dc, seed=0)
    data = load_data_with_augmentation(dc, raw=raw)
    # config CLAIMS n_time=181 (the reference default) but the data is 24
    dc_wrong = dataclasses.replace(dc, n_time=181)
    cfg = ExperimentConfig(
        data=dc_wrong,
        generator=GeneratorConfig(input_channels=46, num_blocks=2,
                                  num_layers_per_block=2, growth_rate=8,
                                  use_pallas_attention=False),
        discriminator=DiscriminatorConfig(input_hw=dc.grid_025),
        loss=LossConfig(use_perceptual=False),
        train=TrainConfig(epochs=1, batch_size=4, dtype="float32"),
    )
    trainer = ModelTrainer(cfg, data=data)
    assert trainer.n_original == 24
    assert len(trainer.original_dataset()) == 24


def test_device_preprocess_to_host_false_trains():
    """to_host=False hands device-resident jax arrays straight to
    ModelTrainer (zero preprocess->train round trip); training losses
    match the host-array path bit-for-bit (same underlying values)."""
    import dataclasses

    import jax.numpy as jnp

    from gan_danet_tpu.core.config import (
        DiscriminatorConfig,
        ExperimentConfig,
        GeneratorConfig,
        LossConfig,
        TrainConfig,
    )
    from gan_danet_tpu.train.trainer import ModelTrainer

    dc = dataclasses.replace(tiny_config(24), device_preprocess=True)
    raw = make_synthetic_raw(dc, seed=0)
    data_dev = load_data_with_augmentation(dc, raw=raw, to_host=False)
    assert isinstance(data_dev[0][0], jnp.ndarray)
    data_host = load_data_with_augmentation(dc, raw=raw)
    assert isinstance(data_host[0][0], np.ndarray)

    cfg = ExperimentConfig(
        data=dc,
        generator=GeneratorConfig(input_channels=46, num_blocks=2,
                                  num_layers_per_block=2, growth_rate=8,
                                  use_pallas_attention=False),
        discriminator=DiscriminatorConfig(input_hw=dc.grid_025),
        loss=LossConfig(use_perceptual=False),
        train=TrainConfig(epochs=1, batch_size=4, dtype="float32"),
    )
    t_dev = ModelTrainer(cfg, data=data_dev)
    t_host = ModelTrainer(cfg, data=data_host)
    lg_d, _ = t_dev.train()
    lg_h, _ = t_host.train()
    np.testing.assert_array_equal(lg_d, lg_h)

    # host path without device_preprocess rejects the device handoff
    dc_host = dataclasses.replace(dc, device_preprocess=False)
    with np.testing.assert_raises(ValueError):
        load_data_with_augmentation(dc_host, raw=raw, to_host=False)
