"""PAM/CAM op parity: XLA-blocked flash vs naive, and vs a torch oracle
reproducing the reference module math (models/generator.py:104-139)."""
import numpy as np
import torch

import jax.numpy as jnp

from gan_danet_tpu.ops.attention import (
    _pam_naive,
    _pam_xla_blocked,
    cam_attention,
    pam_attention,
)


def _torch_pam(q, k, v):
    # reference PAM: energy = bmm(q^T, k); attn = softmax(dim=-1);
    # out = bmm(v, attn^T)  — with q,k (B,d,N), v (B,C,N)
    energy = torch.bmm(q.permute(0, 2, 1), k)
    attn = torch.softmax(energy, dim=-1)
    out = torch.bmm(v, attn.permute(0, 2, 1))
    return out


def test_pam_naive_matches_torch(rng):
    b, n, d, c = 2, 57, 8, 12
    q = rng.standard_normal((b, n, d)).astype(np.float32)
    k = rng.standard_normal((b, n, d)).astype(np.float32)
    v = rng.standard_normal((b, n, c)).astype(np.float32)
    got = np.asarray(_pam_naive(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    want = (
        _torch_pam(
            torch.from_numpy(q).permute(0, 2, 1),
            torch.from_numpy(k).permute(0, 2, 1),
            torch.from_numpy(v).permute(0, 2, 1),
        )
        .permute(0, 2, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pam_blocked_matches_naive(rng):
    b, n, d, c = 2, 990, 20, 160  # train-resolution token count
    q = rng.standard_normal((b, n, d)).astype(np.float32)
    k = rng.standard_normal((b, n, d)).astype(np.float32)
    v = rng.standard_normal((b, n, c)).astype(np.float32)
    naive = np.asarray(_pam_naive(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    blocked = np.asarray(
        _pam_xla_blocked(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), block_q=128)
    )
    np.testing.assert_allclose(blocked, naive, rtol=1e-4, atol=1e-5)


def test_pam_dispatcher_cpu(rng):
    q = jnp.asarray(rng.standard_normal((1, 64, 4)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 64, 4)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 64, 8)).astype(np.float32))
    out = pam_attention(q, k, v, impl="auto")
    assert out.shape == (1, 64, 8)


def test_pam_auto_impl_policy():
    """'auto' picks the materialised form below the TPU memory budget
    (train spec N=990, B=12 — measured faster than the flash kernel on the
    full step), the flash kernel above it (0.05deg spec N=15,840 — (N,N)
    would be 1 GiB/sample), and the XLA-blocked scan off-TPU. The budget
    is batch-aware (round-3 advisor finding): batch * tokens^2 is what
    occupies HBM, so a large batch flips to the flash kernel at a smaller
    N than the reference batch of 12 does."""
    from gan_danet_tpu.ops.attention import (
        PAM_MATERIALISE_MAX_TOKENS,
        resolve_pam_impl,
    )

    wall = PAM_MATERIALISE_MAX_TOKENS
    assert resolve_pam_impl("tpu", 990, batch=12) == "naive"
    assert resolve_pam_impl("tpu", wall, batch=12) == "naive"
    assert resolve_pam_impl("tpu", wall + 1, batch=12) == "pallas"
    assert resolve_pam_impl("tpu", 88 * 180, batch=1) == "pallas"
    # batch-awareness: 96x the HBM at the old token wall -> flash kernel;
    # a single sample can afford more tokens than the B=12 crossover
    assert resolve_pam_impl("tpu", wall, batch=96) == "pallas"
    assert resolve_pam_impl("tpu", 2 * wall, batch=1) == "naive"
    assert resolve_pam_impl("tpu", 4 * wall, batch=1) == "pallas"
    assert resolve_pam_impl("cpu", 990) == "xla"
    assert resolve_pam_impl("cpu", 10**6) == "xla"


def test_pam_gradients_flow(rng):
    import jax

    q = jnp.asarray(rng.standard_normal((1, 33, 4)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 33, 4)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 33, 8)).astype(np.float32))

    g_blocked = jax.grad(lambda a: jnp.sum(_pam_xla_blocked(a, k, v) ** 2))(q)
    g_naive = jax.grad(lambda a: jnp.sum(_pam_naive(a, k, v) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g_blocked), np.asarray(g_naive),
                               rtol=1e-4, atol=1e-5)


def _torch_cam(x):
    # x: (B, C, N) — reference CAM with the max-trick
    energy = torch.bmm(x, x.permute(0, 2, 1))
    energy_new = energy.max(dim=-1, keepdim=True)[0].expand_as(energy) - energy
    attn = torch.softmax(energy_new, dim=-1)
    return torch.bmm(attn, x)


def test_cam_matches_torch(rng):
    b, n, c = 2, 45, 16
    x = rng.standard_normal((b, n, c)).astype(np.float32)
    got = np.asarray(cam_attention(jnp.asarray(x)))
    want = _torch_cam(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pam_pallas_kernel_interpret_matches_naive(rng):
    """Pallas kernel correctness in interpret mode, including the N=320
    regression (token counts that are NOT multiples of block_q previously
    left trailing query blocks unwritten)."""
    from gan_danet_tpu.ops.pallas.pam_kernel import pam_flash_forward

    for n in (320, 57, 512, 700):
        q = jnp.asarray(rng.standard_normal((1, n, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((1, n, 8)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((1, n, 16)), jnp.float32)
        got = np.asarray(pam_flash_forward(q, k, v, interpret=True))
        want = np.asarray(_pam_naive(q, k, v))
        assert np.isfinite(got).all(), f"n={n}: non-finite output"
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3,
                                   err_msg=f"n={n}")


def test_pam_pallas_multiblock_grid_interpret(rng):
    """The multi-block grid path (online softmax across kv blocks, LCM
    padding, trailing-block masking) with small block sizes so CI actually
    executes it — round 1 only ever hit the single-block branch; the grid
    logic previously ran nowhere but the real chip."""
    from gan_danet_tpu.ops.pallas.pam_kernel import pam_flash_forward

    for n in (320, 1000, 2048):
        q = jnp.asarray(rng.standard_normal((2, n, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((2, n, 8)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((2, n, 16)), jnp.float32)
        got = np.asarray(pam_flash_forward(q, k, v, block_q=64, block_k=128,
                                           interpret=True))
        want = np.asarray(_pam_naive(q, k, v))
        assert np.isfinite(got).all(), f"n={n}: non-finite output"
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3,
                                   err_msg=f"n={n}")


def test_pam_pallas_backward_interpret_matches_naive(rng):
    """Fused flash backward (pam_flash_backward) vs the naive VJP — single
    AND multi-block grids, including non-multiple token counts."""
    import jax

    from gan_danet_tpu.ops.pallas.pam_kernel import (
        pam_flash_backward,
        pam_flash_forward,
    )

    for n, (bq, bk) in [(96, (512, 1024)), (320, (64, 128)),
                        (1000, (64, 128))]:
        q = jnp.asarray(rng.standard_normal((2, n, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((2, n, 8)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((2, n, 16)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((2, n, 16)), jnp.float32)

        out, lse = pam_flash_forward(q, k, v, block_q=bq, block_k=bk,
                                     interpret=True, return_lse=True)
        dq, dk, dv = pam_flash_backward(q, k, v, out, lse, g, block_q=bq,
                                        block_k=bk, interpret=True)

        _, vjp = jax.vjp(_pam_naive, q, k, v)
        dq_w, dk_w, dv_w = vjp(g)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_w),
                                   rtol=2e-3, atol=2e-3, err_msg=f"dq n={n}")
        np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_w),
                                   rtol=2e-3, atol=2e-3, err_msg=f"dk n={n}")
        np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_w),
                                   rtol=2e-3, atol=2e-3, err_msg=f"dv n={n}")


def test_pam_pallas_multiblock_bf16_interpret(rng):
    """bf16 inputs through the multi-block grid (the kernel's dots run in
    input dtype with f32 accumulation)."""
    from gan_danet_tpu.ops.pallas.pam_kernel import pam_flash_forward

    n = 1000
    q = jnp.asarray(rng.standard_normal((1, n, 8)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, n, 8)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, n, 16)), jnp.bfloat16)
    got = np.asarray(pam_flash_forward(q, k, v, block_q=64, block_k=128,
                                       interpret=True), dtype=np.float32)
    want = np.asarray(_pam_naive(q.astype(jnp.float32), k.astype(jnp.float32),
                                 v.astype(jnp.float32)))
    assert got.dtype == np.float32 and np.isfinite(got).all()
    np.testing.assert_allclose(got, want, rtol=0.1, atol=0.1)
