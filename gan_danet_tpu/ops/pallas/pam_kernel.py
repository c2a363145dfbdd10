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


def _pam_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *, n_valid, block_k):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0].astype(jnp.float32)          # (bq, d)
    k = k_ref[0].astype(jnp.float32)          # (bk, d)
    v = v_ref[0].astype(jnp.float32)          # (bk, c)

    # energies for this block; PAM uses NO 1/sqrt(d) scaling (faithful)
    e = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                          # (bq, bk)

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
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ik == nk - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("block_q", "block_k", "interpret"))
def pam_flash_forward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """q,k: (B,N,d); v: (B,N,C) -> (B,N,C). Forward only (VJP routed through
    the XLA-blocked implementation in ops/attention.py). Block defaults
    tuned on v5e at N=15840, the 0.05deg-path token count: (512,1024)
    -> 3.34 ms vs best XLA-blocked 3.77 ms."""
    b, n, d = q.shape
    c = v.shape[-1]
    if k.shape[1] != n or v.shape[1] != n:
        raise ValueError(
            f"pam_flash_forward is self-attention: q/k/v token counts must "
            f"match, got {n}/{k.shape[1]}/{v.shape[1]}"
        )

    # n_pad must be a common multiple of BOTH block sizes, or trailing
    # q-blocks are silently never visited (garbage rows past n_pad//bq*bq).
    if n <= max(block_q, block_k):
        bq = bk = _round_up(n, 8)          # single block each way
        n_pad = bq
    else:
        bq, bk = block_q, block_k
        n_pad = _round_up(n, math.lcm(bq, bk))
    d_pad = _round_up(d, 128)
    c_pad = _round_up(c, 128)

    qp = jnp.pad(q, ((0, 0), (0, n_pad - n), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, n_pad - n), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, n_pad - n), (0, c_pad - c)))

    grid = (b, n_pad // bq, n_pad // bk)

    out = pl.pallas_call(
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
        out_specs=pl.BlockSpec((1, bq, c_pad), lambda ib, iq, ik: (ib, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c_pad), v.dtype),
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

    return out[:, :n, :c]
