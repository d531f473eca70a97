"""Fused batched conjugate-gradient solve (Pallas TPU kernel).

Motivation: the SGS chain's packed conditioning solve is a fixed-iteration
CG on per-chain (K, K) SPD systems (ops/kriging.masked_cg_solve under
vmap).  In XLA each of the ~64 iterations is a separate chain of small
batched ops; running the whole loop inside one Pallas program with the
matrices VMEM-resident should remove that per-iteration overhead.

STATUS (2026-08-20, axon v5e-1): ``lanes_masked_cg`` is the PRODUCTION
DEFAULT batch solve on TPU backends (models/chain_sgs.
make_sgs_step_batched; gate ``nolanescg`` restores the vmapped XLA CG).
Measured inside the real scan at 512 chains on the 512² bench problem
(NOTES_ROUND5 §1): 4.883 -> 3.708 ms/step-batch (+31.7% it/s) at
cg_iters=64 (Matérn) and 3.993 -> 3.391 ms (+17.8%) at cg_iters=32
(exponential) — one program for the whole batch, matrices VMEM-resident
across all iterations, no per-iteration dispatch.

History: the naive rank-3 whole-batch form (one program, (C, K, K)
blocks) SIGABRTs Mosaic on rank-3 elementwise/reduce patterns with a
leading batch dim > 1 (probed 2026-08-17: C=1 compiles, C=8 crashes),
and the grid-per-chain shape that did compile measured 13.6 vs the XLA
CG's 7.5 ms/step-batch — 256 sequential programs each paying the
64-iteration loop latency.  That ``batched_masked_cg`` path was deleted
2026-08-20 (NOTES_ROUND5 §4) once the batch-in-lanes 2D layout below —
the NOTES_ROUND4 §7 SMEM/lane-padding lesson — delivered the same fusion
without rank-3 operands.

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
    bitwise — tolerance pinned by
    tests/test_kriging.py::test_lanes_cg_matches_numpy_and_xla.

    Batch padding: C is padded to a LANES multiple with all-zero systems
    (zero matrix + zero rhs keeps every iterate exactly zero — alpha/beta
    hit their 1e-30 guards).  Live VMEM for one program is ~(K²+6K)·B·4 B
    (A plus the b/out refs and the x/r/p/Ap iterates; 5.3 MB at K=48,
    B=512); batches past a 32 MB budget are gridded into the LARGEST
    lane-multiple block that divides the padded batch — never straight to
    a 128-lane block, which would multiply sequential grid programs each
    paying the full loop latency.
    """
    from jax.experimental import pallas as pl

    C, K = mask.shape
    Sm = _masked_system(Sigma, mask, eps).astype(jnp.float32)
    b = (mask * rhs).astype(jnp.float32)

    Cp = -(-C // LANES) * LANES
    # lane-block size: whole batch when it fits one program's VMEM budget,
    # else the largest LANES-multiple divisor of Cp under the budget
    fit = max(LANES, (32 << 20) // ((K * K + 6 * K) * 4) // LANES * LANES)
    max_lanes = LANES
    for nblk in range(Cp // LANES, 0, -1):
        blk = nblk * LANES
        if blk <= fit and Cp % blk == 0:
            max_lanes = blk
            break
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


