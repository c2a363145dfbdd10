"""Latent-diffusion stack: scheduler math, component shapes, end-to-end
train + CFG generate on tiny GRACE-like rasters."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gan_danet_tpu.models.diffusion import (
    DDPMScheduler,
    DiffusionConfig,
    LatentDiffusion,
    TextEncoder,
    UNet,
    VAE,
)


def test_scheduler_add_noise_limits(rng):
    s = DDPMScheduler(1000)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    n = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    # t=0: almost no noise
    x0 = s.add_noise(x, n, jnp.array([0, 0]))
    assert float(jnp.mean(jnp.abs(x0 - x))) < 0.05
    # t=999: almost pure noise
    x999 = s.add_noise(x, n, jnp.array([999, 999]))
    assert float(jnp.mean(jnp.abs(x999 - n))) < 0.35


def test_scheduler_schedule_pinned_literals():
    """Independent oracle for the scaled-linear schedule (round-3 verdict
    item #7): the literals below were derived with plain-Python scalar
    math, NOT the module's vectorised numpy path —
      beta_i = (sqrt(b0) + i*(sqrt(b1)-sqrt(b0))/(N-1))**2
    (the diffusers DDPMScheduler 'scaled_linear' definition the reference
    relies on, 4.train.ipynb cells 4-5: linspace in sqrt-beta space,
    squared) and abar_t = prod_{i<=t}(1-beta_i) accumulated as a scalar
    product. Any regression in linspace endpoints, the squaring, or the
    cumprod breaks these pins."""
    s = DDPMScheduler(1000, beta_start=0.00085, beta_end=0.012)
    beta_pins = {0: 8.49999999999999953e-04,
                 1: 8.54698655405686193e-04,
                 500: 4.81495414171187984e-03,
                 980: 1.16673649347646558e-02,
                 999: 1.20000000000000002e-02}
    for i, v in beta_pins.items():
        np.testing.assert_allclose(s.betas[i], v, rtol=1e-12)
    abar_pins = {0: 9.99149999999999983e-01,
                 1: 9.98296027838451394e-01,
                 499: 2.77669650456467632e-01,
                 500: 2.76332683822974601e-01,
                 960: 7.36524463386972056e-03,
                 980: 5.84378331868328806e-03,
                 999: 4.66009851307723402e-03}
    for i, v in abar_pins.items():
        np.testing.assert_allclose(s.alphas_cumprod[i], v, rtol=1e-10)
    # monotone decreasing, within (0, 1)
    assert (np.diff(s.alphas_cumprod) < 0).all()
    assert 0 < s.alphas_cumprod[-1] < s.alphas_cumprod[0] < 1


def test_scheduler_set_timesteps_stride():
    """set_timesteps uses the diffusers leading-stride: step = N // n_inf,
    timesteps = [ (n_inf-1)*step, ..., step, 0 ] — so 50 steps over 1000
    training steps visit 980, 960, ..., 20, 0."""
    s = DDPMScheduler(1000)
    ts = s.set_timesteps(50)
    assert ts[0] == 980 and ts[-1] == 0 and len(ts) == 50
    assert (np.diff(ts) == -20).all()
    ts10 = s.set_timesteps(10)
    np.testing.assert_array_equal(ts10, np.arange(900, -1, -100))


def test_scheduler_add_noise_golden():
    """Hand-computed add_noise golden at a pinned timestep:
    x_t = sqrt(abar)*x0 + sqrt(1-abar)*eps with abar[500] pinned above."""
    s = DDPMScheduler(1000)
    x0 = jnp.asarray([[1.0, -2.0]], jnp.float32)
    eps = jnp.asarray([[0.5, 1.0]], jnp.float32)
    got = np.asarray(s.add_noise(x0, eps, jnp.array([500])))
    import math

    abar = 2.76332683822974601e-01
    want = np.array([[math.sqrt(abar) * 1.0 + math.sqrt(1 - abar) * 0.5,
                      math.sqrt(abar) * -2.0 + math.sqrt(1 - abar) * 1.0]])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_scheduler_step_golden_hand_computed():
    """One ancestral step at t=980 with 50 inference steps, hand-computed
    from Ho et al. (2020) eq. 6-7 with scalar math:
      beta_t   = 1 - abar_t/abar_prev          (effective beta over the
                                                20-step stride)
      x0_hat   = (x_t - sqrt(1-abar_t) eps) / sqrt(abar_t)
      mean     = sqrt(abar_prev) beta_t/(1-abar_t) x0_hat
               + sqrt(1-beta_t) (1-abar_prev)/(1-abar_t) x_t
      var      = beta_t (1-abar_prev)/(1-abar_t)
    using the pinned abar[980], abar[960] literals. Also checks the
    stochastic branch reproduces mean + sqrt(var)*normal(key) and that the
    terminal step (prev_t < 0) adds NO noise and uses abar_prev = 1."""
    import math

    s = DDPMScheduler(1000)
    s.set_timesteps(50)
    abar_t = 5.84378331868328806e-03     # abar[980], pinned
    abar_prev = 7.36524463386972056e-03  # abar[960], pinned

    xt = jnp.asarray([[0.8, -1.2]], jnp.float32)
    eps = jnp.asarray([[0.3, -0.4]], jnp.float32)

    beta_t = 1.0 - abar_t / abar_prev
    x0_hat = (np.asarray(xt) - math.sqrt(1 - abar_t) * np.asarray(eps)) \
        / math.sqrt(abar_t)
    c0 = math.sqrt(abar_prev) * beta_t / (1 - abar_t)
    ct = math.sqrt(1 - beta_t) * (1 - abar_prev) / (1 - abar_t)
    want_mean = c0 * x0_hat + ct * np.asarray(xt)

    got = np.asarray(s.step(eps, 980, xt, key=None))
    np.testing.assert_allclose(got, want_mean, rtol=1e-6)

    # stochastic branch: mean + sqrt(var) * normal(key)
    key = jax.random.PRNGKey(7)
    var = beta_t * (1 - abar_prev) / (1 - abar_t)
    draw = np.asarray(jax.random.normal(key, xt.shape, xt.dtype))
    got_noisy = np.asarray(s.step(eps, 980, xt, key=key))
    np.testing.assert_allclose(got_noisy,
                               want_mean + math.sqrt(var) * draw, rtol=1e-6)

    # terminal step: t=0 -> prev_t=-20 < 0 -> abar_prev=1, no noise even
    # with a key (the reference sampler's last step is deterministic)
    abar_0 = 9.99149999999999983e-01     # abar[0], pinned
    beta_0 = 1.0 - abar_0 / 1.0
    x0_hat0 = (np.asarray(xt) - math.sqrt(1 - abar_0) * np.asarray(eps)) \
        / math.sqrt(abar_0)
    mean0 = (math.sqrt(1.0) * beta_0 / (1 - abar_0)) * x0_hat0 \
        + (math.sqrt(1 - beta_0) * (1 - 1.0) / (1 - abar_0)) * np.asarray(xt)
    got0 = np.asarray(s.step(eps, 0, xt, key=jax.random.PRNGKey(3)))
    np.testing.assert_allclose(got0, mean0, rtol=1e-5, atol=1e-7)
    # with abar_prev = 1 the mean collapses to x0_hat exactly
    np.testing.assert_allclose(got0, x0_hat0, rtol=1e-5, atol=1e-7)


def test_scheduler_step_denoises_perfect_eps(rng):
    """With the true noise as model output, iterated steps recover x0."""
    s = DDPMScheduler(1000)
    x0 = jnp.asarray(0.5 * rng.standard_normal((1, 4, 4, 2)).astype(np.float32))
    n = jnp.asarray(rng.standard_normal((1, 4, 4, 2)).astype(np.float32))
    s.set_timesteps(10)
    z = s.add_noise(x0, n, jnp.array([s.timesteps[0]]))
    for t in s.timesteps:
        abar = s.alphas_cumprod[t]
        eps = (z - np.sqrt(abar) * x0) / np.sqrt(1 - abar)  # exact eps for z
        z = s.step(eps, int(t), z, key=None)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x0), atol=1e-3)


def test_latent_diffusion_rejects_indivisible_size():
    """Library callers with a non-ladder-divisible image size get an
    explicit error with the divisor formula (round-3 advisor finding)
    instead of an opaque concatenate shape error inside UNet init."""
    from gan_danet_tpu.models.diffusion import DiffusionConfig, LatentDiffusion

    with pytest.raises(ValueError, match="divisible by 8"):
        LatentDiffusion(DiffusionConfig(), sample_image_hw=(30, 32))


def test_text_encoder_shape():
    enc = TextEncoder(vocab_size=100, max_length=16, width=32, heads=4,
                      layers=2)
    ids = jnp.zeros((2, 16), jnp.int32)
    v = enc.init(jax.random.PRNGKey(0), ids)
    assert enc.apply(v, ids).shape == (2, 16, 32)


def test_text_encoder_causality():
    """Changing a later token must not affect earlier positions."""
    enc = TextEncoder(vocab_size=100, max_length=8, width=16, heads=2,
                      layers=1)
    a = jnp.array([[1, 2, 3, 4, 5, 6, 7, 8]])
    b = a.at[0, 6].set(99)
    v = enc.init(jax.random.PRNGKey(0), a)
    ya, yb = enc.apply(v, a), enc.apply(v, b)
    np.testing.assert_allclose(np.asarray(ya[0, :6]), np.asarray(yb[0, :6]),
                               atol=1e-5)
    assert not np.allclose(np.asarray(ya[0, 7]), np.asarray(yb[0, 7]))


def test_vae_roundtrip_shapes(rng):
    vae = VAE(channels=(8, 16), latent_channels=4, out_channels=1)
    x = jnp.asarray(rng.standard_normal((2, 16, 20, 1)).astype(np.float32))
    k = jax.random.PRNGKey(0)
    v = vae.init({"params": k}, x, k)
    recon, mean, logvar = vae.apply(v, x, k)
    assert recon.shape == x.shape
    assert mean.shape == (2, 8, 10, 4)   # factor 2 for 2-level VAE
    assert logvar.shape == mean.shape


def test_unet_shape(rng):
    unet = UNet(4, 4, channels=(8, 16), context_dim=12, heads=2)
    z = jnp.zeros((2, 8, 8, 4))
    ctx = jnp.zeros((2, 5, 12))
    t = jnp.zeros((2,), jnp.int32)
    v = unet.init(jax.random.PRNGKey(0), z, ctx, t)
    assert unet.apply(v, z, ctx, t).shape == z.shape


def test_scheduler_step_tables_match_host_oracle(rng):
    """step_scan over the precomputed tables == the host float64 `step`
    oracle, row by row, including the stochastic branch (same normal
    draw) and the deterministic terminal row (sigma[last] == 0)."""
    s = DDPMScheduler(1000)
    tables = s.step_tables(10)
    np.testing.assert_array_equal(np.asarray(tables["t"]),
                                  np.arange(900, -1, -100))
    assert float(tables["sigma"][-1]) == 0.0
    assert (np.asarray(tables["sigma"][:-1]) > 0).all()
    xt = jnp.asarray(rng.standard_normal((1, 4, 4, 2)).astype(np.float32))
    eps = jnp.asarray(rng.standard_normal((1, 4, 4, 2)).astype(np.float32))
    s.set_timesteps(10)
    for i, t in enumerate(np.asarray(tables["t"])):
        key = jax.random.PRNGKey(i)
        noise = jax.random.normal(key, xt.shape, xt.dtype)
        got = np.asarray(s.step_scan(eps, i, xt, tables, noise))
        # the oracle draws its own normal from the SAME key
        want = np.asarray(s.step(eps, int(t), xt, key=key))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


@pytest.fixture(scope="module")
def tiny_ld():
    def make(grad_accum=1, seed=0):
        cfg = DiffusionConfig(
            vae_channels=(8, 16), unet_channels=(8, 16), context_dim=16,
            heads=2, cond_channels=3, grad_accum=grad_accum,
            num_inference_steps=4)
        return LatentDiffusion(cfg, sample_image_hw=(16, 16),
                               sample_cond_shape=(1, 16, 16, 3), seed=seed)

    return make


def test_generate_scan_matches_python_loop(tiny_ld, rng):
    """The jitted lax.scan sampler must reproduce the per-step Python
    oracle: identical key schedule, f32-table rounding only (VERDICT r4
    task 1a)."""
    ld = tiny_ld()
    cond = jnp.asarray(rng.standard_normal((2, 16, 16, 3)).astype(np.float32))
    key = jax.random.PRNGKey(11)
    fast = np.asarray(ld.generate(cond, image_hw=(16, 16),
                                  num_inference_steps=4, key=key, jit=True))
    slow = np.asarray(ld.generate(cond, image_hw=(16, 16),
                                  num_inference_steps=4, key=key, jit=False))
    assert fast.shape == slow.shape == (2, 16, 16, 1)
    np.testing.assert_allclose(fast, slow, rtol=1e-3, atol=1e-4)


def test_train_epochs_scan_matches_batch_loop(tiny_ld, rng):
    """One scanned epoch == the same batches through the per-batch oracle
    loop (same key schedule, same order): losses and post-step params
    agree to f32 fusion noise (VERDICT r4 task 1b)."""
    img = rng.standard_normal((8, 16, 16, 1)).astype(np.float32)
    cond = rng.standard_normal((8, 16, 16, 3)).astype(np.float32)

    ld_a = tiny_ld(grad_accum=2)
    ld_b = tiny_ld(grad_accum=2)
    # identical init by construction (same seed)
    order = np.random.default_rng(5).permutation(8)
    losses_scan = ld_a.train_epochs(img, cond, epochs=1, batch_size=2,
                                    shuffle=True, shuffle_seed=5)
    losses_loop = []
    for i in range(0, 8, 2):
        ids = order[i : i + 2]
        losses_loop.append(ld_b.train_batch(jnp.asarray(img[ids]),
                                            jnp.asarray(cond[ids])))
    np.testing.assert_allclose(losses_scan, losses_loop, rtol=1e-5,
                               atol=1e-6)
    # param tolerance is the ADAM-STEP scale, not f32 noise: for leaves
    # whose gradient is noise-dominated (zero-init biases), Adam
    # normalises the update to O(lr)=1e-5 regardless of gradient
    # magnitude, so a ~1e-7 fusion difference between the two compiled
    # programs can flip an entire 1e-5 update. Two applied optimizer
    # steps (4 micro-batches / accum 2) bound the divergence at ~2e-5.
    pa = jax.tree.leaves(ld_a.unet_params)
    pb = jax.tree.leaves(ld_b.unet_params)
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=3e-5)
    assert ld_a.step == ld_b.step == 4


def test_grad_accum_applies_every_kth_batch(tiny_ld, rng):
    """MultiSteps x4 (the reference's accumulation window): params must
    stay FROZEN for the first 3 micro-batches and move on the 4th."""
    ld = tiny_ld(grad_accum=4)
    img = jnp.asarray(rng.standard_normal((2, 16, 16, 1)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((2, 16, 16, 3)).astype(np.float32))
    p0 = jax.tree.map(np.asarray, ld.unet_params)
    for i in range(3):
        ld.train_batch(img, cond)
        same = all(np.array_equal(a, np.asarray(b)) for a, b in zip(
            jax.tree.leaves(p0), jax.tree.leaves(ld.unet_params)))
        assert same, f"params moved during accumulation micro-batch {i}"
    ld.train_batch(img, cond)
    moved = any(not np.array_equal(a, np.asarray(b)) for a, b in zip(
        jax.tree.leaves(p0), jax.tree.leaves(ld.unet_params)))
    assert moved, "params did not move on the k-th micro-batch"


def test_diffusion_bfloat16_compute_path(rng):
    """DiffusionConfig(dtype='bfloat16') runs the whole train+generate
    path with bf16 compute / f32 params (the GAN path's mixed-precision
    policy): losses finite and close to the f32 run at bf16 resolution,
    params stay f32, generate produces finite f32 output."""
    img = rng.standard_normal((4, 16, 16, 1)).astype(np.float32)
    cond = rng.standard_normal((4, 16, 16, 3)).astype(np.float32)

    def make(dtype):
        cfg = DiffusionConfig(
            vae_channels=(8, 16), unet_channels=(8, 16), context_dim=16,
            heads=2, cond_channels=3, grad_accum=1, num_inference_steps=2,
            dtype=dtype)
        return LatentDiffusion(cfg, sample_image_hw=(16, 16),
                               sample_cond_shape=(1, 16, 16, 3), seed=0)

    f32 = make("float32")
    bf16 = make("bfloat16")
    # identical inits (params always f32)
    for a, b in zip(jax.tree.leaves(f32.unet_params),
                    jax.tree.leaves(bf16.unet_params)):
        assert a.dtype == b.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    lf = f32.train_epochs(img, cond, epochs=1, batch_size=4, shuffle=False)
    lb = bf16.train_epochs(img, cond, epochs=1, batch_size=4, shuffle=False)
    np.testing.assert_allclose(lb, lf, rtol=0.05, atol=0.05)  # bf16 rounding
    out = bf16.generate(jnp.asarray(cond[:1]), image_hw=(16, 16),
                        num_inference_steps=2)
    assert out.dtype == jnp.float32          # f32 reconstruction head
    assert np.isfinite(np.asarray(out)).all()


def test_diffusion_train_mesh_matches_single_device(rng):
    """Data-parallel diffusion training over the virtual mesh equals the
    single-device run (MSE mean over the global batch is identical under
    sharding; gradient allreduce inserted by GSPMD). Param tolerance is
    the Adam-step scale — see test_train_epochs_scan_matches_batch_loop."""
    from gan_danet_tpu.core.meshes import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs the virtual multi-device mesh")
    img = rng.standard_normal((8, 16, 16, 1)).astype(np.float32)
    cond = rng.standard_normal((8, 16, 16, 3)).astype(np.float32)
    cfg = DiffusionConfig(
        vae_channels=(8, 16), unet_channels=(8, 16), context_dim=16,
        heads=2, cond_channels=3, grad_accum=2, num_inference_steps=4)

    def make(mesh=None):
        return LatentDiffusion(cfg, sample_image_hw=(16, 16),
                               sample_cond_shape=(1, 16, 16, 3), seed=0,
                               mesh=mesh)

    base = make()
    dp = make(mesh=make_mesh(n_ensemble=1, n_data=4))
    lb = base.train_epochs(img, cond, epochs=2, batch_size=4, shuffle=False)
    ld_ = dp.train_epochs(img, cond, epochs=2, batch_size=4, shuffle=False)
    np.testing.assert_allclose(ld_, lb, rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(dp.unet_params),
                    jax.tree.leaves(base.unet_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=3e-5)


def test_diffusion_checkpoint_resume_equals_uninterrupted(tiny_ld, rng,
                                                          tmp_path):
    """Train 2 epochs straight vs train 1 -> checkpoint -> restore into a
    FRESH pipeline -> train 1 more: identical params (the
    tests/test_train.py resume pattern; VERDICT r4 task 1b
    checkpointing)."""
    img = rng.standard_normal((4, 16, 16, 1)).astype(np.float32)
    cond = rng.standard_normal((4, 16, 16, 3)).astype(np.float32)

    straight = tiny_ld(grad_accum=2)
    straight.train_epochs(img, cond, epochs=2, batch_size=2, shuffle=False)

    first = tiny_ld(grad_accum=2)
    first.train_epochs(img, cond, epochs=1, batch_size=2, shuffle=False)
    path = first.save_checkpoint(tmp_path / "ckpt")

    resumed = tiny_ld(grad_accum=2)
    resumed.restore_checkpoint(path)
    assert resumed.step == first.step
    resumed.train_epochs(img, cond, epochs=1, batch_size=2, shuffle=False)

    for a, b in zip(jax.tree.leaves(straight.unet_params),
                    jax.tree.leaves(resumed.unet_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-7)


@pytest.mark.slow
def test_latent_diffusion_end_to_end(rng):
    cfg = DiffusionConfig(
        vae_channels=(8, 16), unet_channels=(8, 16), context_dim=16,
        heads=2, cond_channels=3, grad_accum=1, num_inference_steps=4)
    ld = LatentDiffusion(cfg, sample_image_hw=(16, 16),
                         sample_cond_shape=(1, 16, 16, 3))
    img = jnp.asarray(rng.standard_normal((2, 16, 16, 1)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((2, 16, 16, 3)).astype(np.float32))
    losses = [ld.train_batch(img, cond) for _ in range(3)]
    assert all(np.isfinite(losses))
    out = ld.generate(cond, image_hw=(16, 16), num_inference_steps=4)
    assert out.shape == (2, 16, 16, 1)
    assert np.isfinite(np.asarray(out)).all()
