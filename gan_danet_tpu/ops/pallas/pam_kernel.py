"""Flash-style Pallas TPU kernel for PAM position attention.

PAM (reference models/generator.py:113-122) is unscaled softmax(QK^T)V over
N = H*W spatial tokens. At the 0.05deg pipeline's native input (88x180) the
(N,N) energy matrix is 15,840^2 = 2.5e8 floats per sample — far beyond VMEM
and a 1 GiB HBM round-trip per image if materialised. This kernel streams
K/V blocks through VMEM with an online softmax (flash attention), so memory
is O(block) and the energies never touch HBM.

Grid layout: (batch, q_blocks, kv_blocks), kv innermost; running max / sum /
accumulator live in VMEM scratch that persists across the kv dimension.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pam_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref,
                *, n_valid, block_k):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # dots run in the INPUT dtype (bf16 inputs ride the MXU at ~4x the f32
    # rate on v5e) with f32 accumulation; softmax state stays f32
    q = q_ref[0]                               # (bq, d)
    k = k_ref[0]                               # (bk, d)
    v = v_ref[0]                               # (bk, c)

    # energies for this block; PAM uses NO 1/sqrt(d) scaling (faithful)
    e = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                          # (bq, bk) f32

    # mask padded key positions
    k_idx = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, e.shape, 1)
    e = jnp.where(k_idx < n_valid, e, NEG_INF)

    m_prev = m_ref[:]                          # (bq, 1)
    l_prev = l_ref[:]
    m_cur = jnp.max(e, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(e - m_new)                     # (bq, bk)

    l_ref[:] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:] = m_new
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ik == nk - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)
        # log-sum-exp per query row, consumed by the backward kernels
        lse_ref[0] = m_ref[:] + jnp.log(l_ref[:])      # (bq, 1)


def _block_plan(n: int, block_q: int, block_k: int):
    """(bq, bk, n_pad): n_pad must be a common multiple of BOTH block
    sizes, or trailing q-blocks are silently never visited (garbage rows
    past n_pad//bq*bq)."""
    if n <= max(block_q, block_k):
        bq = bk = _round_up(n, 8)          # single block each way
        return bq, bk, bq
    return block_q, block_k, _round_up(n, math.lcm(block_q, block_k))


@functools.partial(jax.jit,
                   static_argnames=("block_q", "block_k", "interpret",
                                    "return_lse"))
def pam_flash_forward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
    return_lse: bool = False,
):
    """q,k: (B,N,d); v: (B,N,C) -> (B,N,C) [, lse (B,N) f32].

    Measured on v5e at N=15840 (the 0.05deg-path token count), f32:
    forward wall time is run-to-run noise-level parity with the best
    XLA-blocked scan (3.4-3.9 ms both impls across rounds 2-3;
    BENCH_DETAILS.json carries the latest single run). Both sit near the
    same MXU/VMEM balance point — the (N,N) energy stream costs ~2.8 ms
    of f32 MXU alone with d,c padded to the 128 lane width, so there is
    no order-of-magnitude forward win available; the kernel's decisive
    advantages over the XLA fallback are O(block) memory (the blocked
    scan still materialises (block_q, N) rows) and the fused BACKWARD
    (pam_flash_backward) that reuses the saved log-sum-exp instead of
    recomputing the whole forward (7.3 vs 10.0 ms full grad, ~1.4x)."""
    b, n, d = q.shape
    c = v.shape[-1]
    if k.shape[1] != n or v.shape[1] != n:
        raise ValueError(
            f"pam_flash_forward is self-attention: q/k/v token counts must "
            f"match, got {n}/{k.shape[1]}/{v.shape[1]}"
        )

    bq, bk, n_pad = _block_plan(n, block_q, block_k)
    d_pad = _round_up(d, 128)
    c_pad = _round_up(c, 128)

    qp = jnp.pad(q, ((0, 0), (0, n_pad - n), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, n_pad - n), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, n_pad - n), (0, c_pad - c)))

    grid = (b, n_pad // bq, n_pad // bk)

    out, lse = pl.pallas_call(
        functools.partial(_pam_kernel, n_valid=n, block_k=bk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d_pad), lambda ib, iq, ik: (ib, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d_pad), lambda ib, iq, ik: (ib, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, c_pad), lambda ib, iq, ik: (ib, ik, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, c_pad), lambda ib, iq, ik: (ib, iq, 0),
                         memory_space=pltpu.VMEM),
            # (B, N, 1) layout: a 2-D (1, bq) block violates the (8, 128)
            # tile rule whenever B > 1; trailing dim 1 is always legal
            pl.BlockSpec((1, bq, 1), lambda ib, iq, ik: (ib, iq, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, c_pad), v.dtype),
            jax.ShapeDtypeStruct((b, n_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, c_pad), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_pad * n_pad * (d_pad + c_pad),
            bytes_accessed=4 * b * n_pad * (2 * d_pad + 2 * c_pad),
            transcendentals=b * n_pad * n_pad,
        ),
        interpret=interpret,
    )(qp, kp, vp)

    if return_lse:
        return out[:, :n, :c], lse[:, :n, 0]
    return out[:, :n, :c]


# ---------------------------------------------------------------------------
# Fused backward (FlashAttention-style): recompute energies blockwise from
# the saved log-sum-exp; never materialise (N,N).
# ---------------------------------------------------------------------------

def _pam_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref, dq_ref,
                       acc_ref, *, n_valid, block_k):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                                   # (bq, d)
    k = k_ref[0]                                   # (bk, d)
    v = v_ref[0]                                   # (bk, c)
    do = do_ref[0].astype(jnp.float32)             # (bq, c)
    lse = lse_ref[0]                               # (bq, 1)
    dd = dd_ref[0]                                 # (bq, 1) rowsum(dO*O)

    e = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    k_idx = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, e.shape, 1)
    e = jnp.where(k_idx < n_valid, e, NEG_INF)
    p = jnp.exp(e - lse)                           # (bq, bk)

    dp = jax.lax.dot_general(                      # dO @ V^T -> (bq, bk)
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    de = p * (dp - dd)
    acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
        de.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ik == nk - 1)
    def _finalize():
        dq_ref[0] = acc_ref[:].astype(dq_ref.dtype)


def _pam_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref,
                        dk_ref, dv_ref, dk_acc, dv_acc, *, n_valid, block_k):
    iq = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(iq == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]                                   # (bq, d)
    k = k_ref[0]                                   # (bk, d)
    v = v_ref[0]                                   # (bk, c)
    do = do_ref[0].astype(jnp.float32)             # (bq, c)
    lse = lse_ref[0].reshape(1, -1)                # (bq,1) -> (1, bq)
    dd = dd_ref[0].reshape(1, -1)                  # (1, bq)

    # e^T block: (bk, bq); padded KEY rows produce garbage dk/dv rows that
    # the caller trims; padded QUERY columns vanish because dO and dd are
    # zero there (zero-padded inputs).
    et = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    k_idx = (pl.program_id(1) * block_k
             + jax.lax.broadcasted_iota(jnp.int32, et.shape, 0))
    et = jnp.where(k_idx < n_valid, et, NEG_INF)
    pt = jnp.exp(et - lse)                         # (bk, bq)

    dv_acc[:] = dv_acc[:] + jax.lax.dot_general(   # P^T @ dO -> (bk, c)
        pt.astype(do.dtype), do, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dpt = jax.lax.dot_general(                     # V @ dO^T -> (bk, bq)
        v.astype(jnp.float32), do, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    det = pt * (dpt - dd)
    dk_acc[:] = dk_acc[:] + jax.lax.dot_general(   # dE^T @ Q -> (bk, d)
        det.astype(q.dtype), q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(iq == nq - 1)
    def _finalize():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("block_q", "block_k", "interpret"))
def pam_flash_backward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    out: jnp.ndarray,
    lse: jnp.ndarray,
    do: jnp.ndarray,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
):
    """Fused flash backward: (dq, dk, dv) without materialising (N,N) and
    without re-running the full forward (the energies are recomputed
    blockwise from the saved per-row log-sum-exp)."""
    b, n, d = q.shape
    c = v.shape[-1]
    bq, bk, n_pad = _block_plan(n, block_q, block_k)
    d_pad = _round_up(d, 128)
    c_pad = _round_up(c, 128)

    qp = jnp.pad(q, ((0, 0), (0, n_pad - n), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, n_pad - n), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, n_pad - n), (0, c_pad - c)))
    dop = jnp.pad(do.astype(jnp.float32),
                  ((0, 0), (0, n_pad - n), (0, c_pad - c)))
    # (B, N, 1) layout for per-row stats (2-D blocks break the tile rule
    # for B > 1, see the forward lse spec)
    lsep = jnp.pad(lse.astype(jnp.float32), ((0, 0), (0, n_pad - n)))[..., None]
    # D_i = sum_c dO_ic * O_ic (cheap elementwise; fused by XLA)
    dd = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    ddp = jnp.pad(dd, ((0, 0), (0, n_pad - n)))[..., None]

    q_spec = pl.BlockSpec((1, bq, d_pad), lambda ib, i, j: (ib, i, 0),
                          memory_space=pltpu.VMEM)
    row_specs = [
        pl.BlockSpec((1, bq, c_pad), lambda ib, i, j: (ib, i, 0),
                     memory_space=pltpu.VMEM),             # dO
        pl.BlockSpec((1, bq, 1), lambda ib, i, j: (ib, i, 0),
                     memory_space=pltpu.VMEM),             # lse
        pl.BlockSpec((1, bq, 1), lambda ib, i, j: (ib, i, 0),
                     memory_space=pltpu.VMEM),             # D
    ]
    kv_specs = [
        pl.BlockSpec((1, bk, d_pad), lambda ib, i, j: (ib, j, 0),
                     memory_space=pltpu.VMEM),             # K
        pl.BlockSpec((1, bk, c_pad), lambda ib, i, j: (ib, j, 0),
                     memory_space=pltpu.VMEM),             # V
    ]

    dq = pl.pallas_call(
        functools.partial(_pam_bwd_dq_kernel, n_valid=n, block_k=bk),
        grid=(b, n_pad // bq, n_pad // bk),
        in_specs=[q_spec, kv_specs[0], kv_specs[1], *row_specs],
        out_specs=pl.BlockSpec((1, bq, d_pad), lambda ib, i, j: (ib, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d_pad), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d_pad), jnp.float32)],
        interpret=interpret,
    )(qp, kp, vp, dop, lsep, ddp)

    # swap roles: grid iterates kv blocks in dim 1, q blocks in dim 2
    q_spec2 = pl.BlockSpec((1, bq, d_pad), lambda ib, i, j: (ib, j, 0),
                           memory_space=pltpu.VMEM)
    row_specs2 = [
        pl.BlockSpec((1, bq, c_pad), lambda ib, i, j: (ib, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bq, 1), lambda ib, i, j: (ib, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bq, 1), lambda ib, i, j: (ib, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    kv_specs2 = [
        pl.BlockSpec((1, bk, d_pad), lambda ib, i, j: (ib, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, c_pad), lambda ib, i, j: (ib, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    dk, dv = pl.pallas_call(
        functools.partial(_pam_bwd_dkv_kernel, n_valid=n, block_k=bk),
        grid=(b, n_pad // bk, n_pad // bq),
        in_specs=[q_spec2, kv_specs2[0], kv_specs2[1], *row_specs2],
        out_specs=[
            pl.BlockSpec((1, bk, d_pad), lambda ib, i, j: (ib, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, c_pad), lambda ib, i, j: (ib, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, d_pad), k.dtype),
            jax.ShapeDtypeStruct((b, n_pad, c_pad), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, d_pad), jnp.float32),
            pltpu.VMEM((bk, c_pad), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, dop, lsep, ddp)

    return dq[:, :n, :d], dk[:, :n, :d], dv[:, :n, :c]
