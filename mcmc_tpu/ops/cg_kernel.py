"""Fused batched conjugate-gradient solve (Pallas TPU kernel).

Motivation: the SGS chain's packed conditioning solve is a fixed-iteration
CG on per-chain (K, K) SPD systems (ops/kriging.masked_cg_solve under
vmap).  In XLA each of the ~64 iterations is a separate chain of small
batched ops — the (C, K, K) matrix is re-read from HBM every iteration and
each tiny op pays fixed launch overhead, making the solve LATENCY-bound
(measured ~47% of the whole SGS step-batch at K=48, C=256 on the axon
v5e-1, 2026-08-16).  Here the ENTIRE iteration loop runs inside one Pallas
program with the matrices VMEM-resident: ~64 x a few VPU passes over data
that never leaves VMEM.

The matrices are SYMMETRIC (masked covariance + diagonal), which lets the
matvec run as a sublane reduction without any per-iteration relayout:
with vectors stored as (C, K, 1) columns,

    (A v)[c, i] = sum_j A[c, j, i] * v[c, j]          (A = A^T)

is an elementwise broadcast multiply (C, K, 1) * (C, K, K) followed by a
reduce over axis=1 — the result lands as a (C, 1, K) row, turned back into
a column by a second broadcast-reduce against the identity (a diagonal
"transpose" that needs no relayout or matmul).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _cg_kernel(n_iters: int, a_ref, b_ref, out_ref):
    A = a_ref[...]                   # (C, K, K) symmetric SPD
    b = b_ref[...]                   # (C, K, 1) column vectors
    K = A.shape[-1]
    # one-hot identity for the row->column diagonal reduce
    eye = jnp.eye(K, dtype=jnp.float32)

    def matvec(v):                   # v: (C, K, 1) -> (C, K, 1)
        row = jnp.sum(A * v, axis=1, keepdims=True)      # (C, 1, K)
        # row -> column: place the row on the diagonal, reduce over lanes
        return jnp.sum(eye * row, axis=2, keepdims=True)  # (C, K, 1)

    x = jnp.zeros_like(b)
    r = b
    p = r
    rs = jnp.sum(r * r, axis=(1, 2), keepdims=True)      # (C, 1, 1)

    def body(i, carry):
        x, r, p, rs = carry
        Ap = matvec(p)
        pAp = jnp.sum(p * Ap, axis=(1, 2), keepdims=True)
        alpha = rs / jnp.maximum(pAp, 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.sum(r * r, axis=(1, 2), keepdims=True)
        p = r + (rs_new / jnp.maximum(rs, 1e-30)) * p
        return (x, r, p, rs_new)

    x, _, _, _ = jax.lax.fori_loop(0, n_iters, body, (x, r, p, rs))
    out_ref[...] = x


@functools.partial(jax.jit, static_argnames=("n_iters", "interpret"))
def batched_masked_cg(Sigma, mask, rhs, eps, n_iters: int = 64,
                      interpret: bool = False):
    """Solve (M Sigma M + (I-M) + eps I) w = M rhs for a BATCH of systems
    in one fused Pallas program (matrices stay VMEM-resident across all
    iterations).

    Sigma: (C, K, K); mask/rhs: (C, K).  Returns w (C, K) with masked
    slots zeroed.  Semantics identical to vmapped
    ``kriging.masked_cg_solve``.
    """
    from jax.experimental import pallas as pl

    C, K = mask.shape
    m = mask
    Sm = (Sigma * m[:, :, None] * m[:, None, :]
          + jnp.eye(K, dtype=Sigma.dtype)
          * (eps + (1.0 - m))[:, None, :])
    b = (m * rhs)[..., None]                              # (C, K, 1)

    out = pl.pallas_call(
        functools.partial(_cg_kernel, n_iters),
        out_shape=jax.ShapeDtypeStruct((C, K, 1), jnp.float32),
        interpret=interpret,
    )(Sm.astype(jnp.float32), b.astype(jnp.float32))
    return out[..., 0] * m
