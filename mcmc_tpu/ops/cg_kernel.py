"""Fused batched conjugate-gradient solve (Pallas TPU kernel).

Motivation: the SGS chain's packed conditioning solve is a fixed-iteration
CG on per-chain (K, K) SPD systems (ops/kriging.masked_cg_solve under
vmap).  In XLA each of the ~64 iterations is a separate chain of small
batched ops; running the whole loop inside one Pallas program with the
matrices VMEM-resident should remove that per-iteration overhead.

STATUS (2026-08-17, axon v5e-1): correct but NOT the production default —
opt-in via ``MCMC_TPU_SGS_SURGERY=fusedcg`` (models/chain_sgs.
make_sgs_step_batched).  The winning single-program whole-batch shape
cannot compile: Mosaic SIGABRTs on rank-3 elementwise/reduce patterns
with a leading batch dim > 1 (probed: C=1 compiles, C=8 crashes; both the
identity-diagonal reduce and a swapaxes relayout variant crash).  The
grid-per-chain shape below DOES compile and is exact, but 256 sequential
programs each paying the 64-iteration loop latency measure 13.6 vs the
XLA CG's 7.5 ms/step-batch inside the SGS scan.  Re-evaluate the
whole-batch form on newer toolchains; the XLA CG meanwhile costs only
~0.9 ms of the step (the pre-mixture ~47% figure is obsolete).

The matrices are SYMMETRIC (masked covariance + diagonal), which lets the
matvec run as a sublane reduction without any per-iteration relayout:
with vectors stored as (C, K, 1) columns,

    (A v)[c, i] = sum_j A[c, j, i] * v[c, j]          (A = A^T)

is an elementwise broadcast multiply (C, K, 1) * (C, K, K) followed by a
reduce over axis=1 — the (C, 1, K) row result is swapped back to a column.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _cg_lanes_kernel(n_iters: int, K: int, a_ref, b_ref, out_ref):
    """Whole-batch CG with the BATCH in the 128-lane dimension.

    The rank-3 whole-batch form crashes Mosaic (module docstring); this is
    the same fusion in 2D tiles only — the NOTES_ROUND4 §7 lesson (lane
    padding applies to the minor dim, so put the big axis there) applied to
    VMEM layouts: a_ref is the masked system matrix TRANSPOSED to
    (K*K, B) with batch in lanes, b_ref/out_ref are (K, B).  The matvec
    q[i] = sum_j A[i,j] p[j] runs as K static contiguous sublane blocks —
    A is SYMMETRIC, so the j-major block A[j*K:(j+1)*K] is column j of
    every row — each a (K, B) tile FMA'd against the broadcast sublane row
    p[j].  Everything is straight-line VPU code over (K, B) tiles; no
    relayouts, no rank-3, one program for the whole batch.
    """
    A = a_ref[...]                    # (K*K, B), j-major blocks (symmetry)
    b = b_ref[...]                    # (K, B)

    def matvec(v):                    # (K, B) -> (K, B)
        q = A[0:K, :] * v[0:1, :]
        for j in range(1, K):
            q = q + A[j * K:(j + 1) * K, :] * v[j:j + 1, :]
        return q

    x = jnp.zeros_like(b)
    r = b
    p = r
    rs = jnp.sum(r * r, axis=0, keepdims=True)            # (1, B)

    def body(i, carry):
        x, r, p, rs = carry
        Ap = matvec(p)
        pAp = jnp.sum(p * Ap, axis=0, keepdims=True)
        alpha = rs / jnp.maximum(pAp, 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.sum(r * r, axis=0, keepdims=True)
        p = r + (rs_new / jnp.maximum(rs, 1e-30)) * p
        return (x, r, p, rs_new)

    x, _, _, _ = jax.lax.fori_loop(0, n_iters, body, (x, r, p, rs))
    out_ref[...] = x


def _masked_system(Sigma, mask, eps):
    """(M Sigma M + (I-M) + eps I) — the matrix masked_cg_solve applies."""
    C, K = mask.shape
    m = mask
    eps = jnp.asarray(eps)
    if eps.ndim:                      # per-chain (C,) -> broadcast over K
        eps = eps[..., None]
    return (Sigma * m[:, :, None] * m[:, None, :]
            + jnp.eye(K, dtype=Sigma.dtype)
            * (eps + (1.0 - m))[:, None, :])


LANES = 128  # TPU lane width: the batch dim is padded to a multiple


@functools.partial(jax.jit, static_argnames=("n_iters", "interpret"))
def lanes_masked_cg(Sigma, mask, rhs, eps, n_iters: int = 64,
                    interpret: bool = False):
    """Whole-batch fused CG, batch-in-lanes layout (see _cg_lanes_kernel).

    Sigma: (C, K, K); mask/rhs: (C, K).  Returns w (C, K) with masked slots
    zeroed.  Same system as vmapped ``kriging.masked_cg_solve``; the
    iteration arithmetic is identical but reduction ORDER differs (sublane
    tree sums vs XLA's batched dots), so agreement is to f32 roundoff, not
    bitwise — tolerance documented in tests/test_cg_kernel.py.

    Batch padding: C is padded to a LANES multiple with all-zero systems
    (zero matrix + zero rhs keeps every iterate exactly zero — alpha/beta
    hit their 1e-30 guards).  VMEM for one program is (K²+4K)·B_pad·4 B
    (4.9 MB at K=48, B=512); above ``max_lanes_per_program`` the batch is
    gridded into lane blocks.
    """
    from jax.experimental import pallas as pl

    C, K = mask.shape
    Sm = _masked_system(Sigma, mask, eps).astype(jnp.float32)
    b = (mask * rhs).astype(jnp.float32)

    Cp = -(-C // LANES) * LANES
    # lane-block size: whole batch when it fits one program's VMEM budget
    max_lanes = max(LANES, min(Cp, (64 << 20) // ((K * K + 4 * K) * 4)
                               // LANES * LANES))
    if Cp % max_lanes:
        max_lanes = LANES
    St = jnp.zeros((K * K, Cp), jnp.float32).at[:, :C].set(
        Sm.reshape(C, K * K).T)
    bt = jnp.zeros((K, Cp), jnp.float32).at[:, :C].set(b.T)

    out = pl.pallas_call(
        functools.partial(_cg_lanes_kernel, n_iters, K),
        grid=(Cp // max_lanes,),
        in_specs=[
            pl.BlockSpec((K * K, max_lanes), lambda i: (0, i)),
            pl.BlockSpec((K, max_lanes), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((K, max_lanes), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((K, Cp), jnp.float32),
        interpret=interpret,
    )(St, bt)
    return out[:, :C].T * mask


def lanes_cg_available() -> bool:
    """The lanes CG kernel targets TPU backends (incl. the tunneled axon
    one); elsewhere the vmapped XLA CG is used (CI covers the kernel in
    interpret mode)."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _cg_kernel(n_iters: int, a_ref, b_ref, out_ref):
    A = a_ref[...]                   # (C, K, K) symmetric SPD
    b = b_ref[...]                   # (C, K, 1) column vectors

    def matvec(v):                   # v: (C, K, 1) -> (C, K, 1)
        row = jnp.sum(A * v, axis=1, keepdims=True)      # (C, 1, K)
        return jnp.swapaxes(row, 1, 2)                   # (C, K, 1)

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
    eps = jnp.asarray(eps)
    if eps.ndim:                      # per-chain (C,) -> broadcast over K
        eps = eps[..., None]
    Sm = (Sigma * m[:, :, None] * m[:, None, :]
          + jnp.eye(K, dtype=Sigma.dtype)
          * (eps + (1.0 - m))[:, None, :])
    b = (m * rhs)[..., None]                              # (C, K, 1)

    # one grid program per chain, (1, K, K) blocks: Mosaic SIGABRTs on
    # rank-3 elementwise/reduce patterns with a leading batch > 1 (probed
    # 2026-08-17: C=1 compiles, C=8 crashes the compiler), so the batch
    # runs as a pipelined grid instead of one big program
    out = pl.pallas_call(
        functools.partial(_cg_kernel, n_iters),
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, K, K), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, K, 1), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, K, 1), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((C, K, 1), jnp.float32),
        interpret=interpret,
    )(Sm.astype(jnp.float32), b.astype(jnp.float32))
    return out[..., 0] * m
