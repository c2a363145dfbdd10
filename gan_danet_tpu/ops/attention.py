"""Position (PAM) and channel (CAM) attention primitives.

Reference semantics (models/generator.py:104-139):

  PAM:  energy[i,j] = q_i . k_j  (NO 1/sqrt(d) scaling);
        attn = softmax over j;  out_i = sum_j attn[i,j] * v_j.
        At the 0.05deg inference resolution the token count is
        N = 88*180 = 15,840, so the (N,N) energy matrix is 251M entries —
        the memory wall of the reference model (SURVEY.md §5 long-context).

  CAM:  gram = X @ X^T over channels (C,C);
        energy_new = rowmax(gram) - gram  ("max-trick" INVERTED similarity,
        models/generator.py:135);  attn = softmax over last axis;
        out = attn @ X.

TPU-first implementations:
  * `pam_attention(..., impl='xla')`  — q-block-chunked lax.scan: O(bq*N)
    memory, pure JAX, differentiable, runs anywhere (CPU tests).
  * `pam_attention(..., impl='pallas')` — fused flash-style Pallas kernel
    with online softmax (gan_danet_tpu/ops/pallas/pam_kernel.py); the
    BACKWARD is a fused flash kernel too (blockwise energy recompute from
    the saved log-sum-exp — measured ~1.4-1.5x the XLA recompute-VJP for
    a full grad at N=15,840 on v5e).
  * `impl='naive'` — materialises (N,N). The PRODUCTION choice on TPU
    below PAM_MATERIALISE_MAX_TOKENS (XLA fuses softmax into the two MXU
    matmuls and beats the flash kernel at the train spec's N=990 —
    round-3 measurement); also the CPU test oracle.
  * `impl='auto'` — resolve_pam_impl: naive under the memory wall on TPU,
    pallas above it, xla elsewhere.
  * CAM is a (C,C) gram (C <= 184 here): two MXU matmuls, fused by XLA.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# PAM
# ---------------------------------------------------------------------------

def _pam_naive(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(B,N,d),(B,N,d),(B,N,C) -> (B,N,C). Materialises (B,N,N).

    Softmax runs in f32; the A@V matmul takes the attention weights back
    in the INPUT dtype (bf16 rides the MXU at ~4x the f32 rate and halves
    the (N,N) bytes) with f32 accumulation. For f32 inputs this is
    exactly the all-f32 computation."""
    energy = jnp.einsum("bid,bjd->bij", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(energy, axis=-1)
    return jnp.einsum("bij,bjc->bic", attn.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def _pam_xla_blocked(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, block_q: int = 512
) -> jnp.ndarray:
    """Chunked over query blocks with lax.scan: never holds more than
    (block_q, N) energies. Differentiable; the CPU/non-TPU fallback."""
    b, n, d = q.shape
    c = v.shape[-1]
    bq = min(block_q, n)
    n_pad = (-n) % bq
    qp = jnp.pad(q, ((0, 0), (0, n_pad), (0, 0)))
    nq = qp.shape[1] // bq
    qp = qp.reshape(b, nq, bq, d)

    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    def step(_, q_blk):
        e = jnp.einsum("bqd,bnd->bqn", q_blk.astype(jnp.float32), kf,
                       preferred_element_type=jnp.float32)
        a = jax.nn.softmax(e, axis=-1)
        return None, jnp.einsum("bqn,bnc->bqc", a, vf)

    _, out = jax.lax.scan(step, None, jnp.moveaxis(qp, 1, 0))
    out = jnp.moveaxis(out, 0, 1).reshape(b, nq * bq, c)[:, :n]
    return out.astype(v.dtype)


@jax.custom_vjp
def _pam_flash(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    from gan_danet_tpu.ops.pallas.pam_kernel import pam_flash_forward

    return pam_flash_forward(q, k, v)


def _pam_flash_fwd(q, k, v):
    from gan_danet_tpu.ops.pallas.pam_kernel import pam_flash_forward

    out, lse = pam_flash_forward(q, k, v, return_lse=True)
    return out, (q, k, v, out, lse)


def _pam_flash_bwd(res, g):
    # fused flash backward: blockwise energy recompute from the saved
    # log-sum-exp; O(block) memory, no full forward re-run
    from gan_danet_tpu.ops.pallas.pam_kernel import pam_flash_backward

    q, k, v, out, lse = res
    return pam_flash_backward(q, k, v, out, lse, g)


_pam_flash.defvjp(_pam_flash_fwd, _pam_flash_bwd)


# Below this budget the fully-materialised (B,N,N) form is preferred on
# TPU: XLA fuses the softmax into the two MXU matmuls and beats the flash
# kernel inside the full train step (N=990, B=12: 805 -> 838 samples/s,
# round-3 interleaved measurement). Above it, B*(N,N) grows past
# HBM-bandwidth comfort ((2048, 2048) f32 = 16 MiB per sample, doubled
# under grad residuals; the 0.05deg spec's N=15,840 would be 1 GiB/sample)
# and the O(block)-memory flash kernel wins. The budget is expressed as
# batch * tokens^2 so a large-B or vmapped caller just under a pure
# token-count wall cannot OOM (round-3 advisor finding): with the
# reference batch 12 the crossover stays at N=2048.
PAM_MATERIALISE_MAX_TOKENS = 2048
_PAM_REFERENCE_BATCH = 12
PAM_MATERIALISE_BUDGET = _PAM_REFERENCE_BATCH * PAM_MATERIALISE_MAX_TOKENS**2


def resolve_pam_impl(backend: str, n_tokens: int, batch: int = 1) -> str:
    """impl='auto' policy: materialised below the memory budget on TPU,
    flash kernel above, XLA-blocked scan everywhere else. The budget
    counts batch * tokens^2 energy entries (what actually occupies HBM),
    not tokens alone."""
    if backend == "tpu":
        return ("naive"
                if max(1, batch) * n_tokens**2 <= PAM_MATERIALISE_BUDGET
                else "pallas")
    return "xla"


def pam_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    impl: str = "auto",
) -> jnp.ndarray:
    """Unscaled softmax(QK^T)V attention over flattened spatial tokens.

    q, k: (B, N, d); v: (B, N, C). Returns (B, N, C).
    impl: 'auto' | 'pallas' | 'xla' | 'naive'.
    """
    if impl == "auto":
        impl = resolve_pam_impl(jax.default_backend(), q.shape[1],
                                q.shape[0])
    if impl == "pallas":
        return _pam_flash(q, k, v)
    if impl == "xla":
        return _pam_xla_blocked(q, k, v)
    if impl == "naive":
        return _pam_naive(q, k, v)
    raise ValueError(f"unknown pam impl: {impl}")


# ---------------------------------------------------------------------------
# CAM
# ---------------------------------------------------------------------------

def cam_attention(x_tokens: jnp.ndarray) -> jnp.ndarray:
    """Channel attention on (B, N, C) tokens -> (B, N, C).

    gram[c1,c2] = sum_n x[n,c1] x[n,c2]; energy = rowmax(gram) - gram;
    out[:, c1] = sum_c2 softmax_c2(energy)[c1,c2] * x[:, c2].
    Faithful to CAMModule (models/generator.py:125-139) including the
    inverted-similarity max trick.
    """
    # keep the input dtype on the MXU (bf16 rides at ~4x f32 rate) with
    # f32 accumulation; softmax state is f32 either way
    gram = jnp.einsum("bnc,bnd->bcd", x_tokens, x_tokens,
                      preferred_element_type=jnp.float32)
    energy = jnp.max(gram, axis=-1, keepdims=True) - gram
    attn = jax.nn.softmax(energy, axis=-1)
    out = jnp.einsum("bcd,bnd->bnc", attn.astype(x_tokens.dtype), x_tokens,
                     preferred_element_type=jnp.float32)
    return out.astype(x_tokens.dtype)
