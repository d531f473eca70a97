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


def _cg_core(A, b, n_iters: int, K: int):
    """Shared fixed-iteration CG over (K, B) tiles; A is (K*K, B) j-major
    blocks of a symmetric system (block j = column j of every row)."""

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
    return x


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
    out_ref[...] = _cg_core(A, b, n_iters, K)


def _cg_lanes_mix_kernel(n_iters: int, K: int, mix, ia_ref, ja_ref, m_ref,
                         b_ref, e_ref, out_ref, a_ref):
    """Lanes CG with the masked MIXTURE system built IN-KERNEL.

    The analytic S_CC mixture (models/chain_sgs prepare, reference analog
    MCMC.py:158-161 via _krige.py) is pure elementwise math on the packed
    window coordinates, but evaluated in XLA it streams ~16 (C, K, K)
    arrays through HBM (8 exp terms, each read+write 4.7 MB at the bench
    shape) and measured 0.733 ms/step-batch of the post-lanes SGS step —
    20% — with the separate transpose/pad of S_cc on top (NOTES_ROUND5
    §2).  Built here instead, the program's inputs shrink from the
    (K², B) matrix to five (K, B) tiles (~100x less traffic) and the
    blocks are written once to VMEM scratch, then the CG runs as in
    ``_cg_lanes_kernel``.

    mix = ((ag...), (bg...), (ae...), (be...), (q0, q1, q2)) — STATIC
    Python floats (SGSStatic.mix, f32-rounded at build): the coefficients
    constant-fold into the unrolled block loop.
    System built per block j (identical formula to the XLA path):
      h2     = q0·dj² + q1·dj·di + q2·di²
      S      = Σ ag·exp(-bg·h2) + Σ ae·exp(-be·√h2)
      A[:,j] = S·m·m_j, then A[j,j] += eps + 1 - m_j  (= _masked_system)
    Zero-padded lanes (ia=ja=m=b=0) build the identity system and stay
    exactly zero through the solve.
    """
    from .covariance import eval_mixture_static

    q0, q1, q2 = mix[4]
    ia = ia_ref[...]                  # (K, B) f32 exact small ints
    ja = ja_ref[...]
    m = m_ref[...]                    # (K, B) 0/1
    eps_row = e_ref[...]              # (1, B)
    for j in range(K):
        dif = ia - ia[j:j + 1, :]
        djf = ja - ja[j:j + 1, :]
        h2 = (jnp.float32(q0) * djf * djf + jnp.float32(q1) * djf * dif
              + jnp.float32(q2) * dif * dif)
        # one exp per mixture family via the dyadic squaring chain (same
        # helper as the XLA prepare stage — pure elementwise jnp)
        S = eval_mixture_static(mix, h2)
        blk = S * m * m[j:j + 1, :]
        # diagonal entry (i == j) gets + eps + 1 - m_j, folded into the
        # block via a sublane-iota compare (a second (1, B) row store per
        # block would serialize 48 tiny writes)
        is_diag = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 0) == j
        blk = blk + jnp.where(is_diag, eps_row + (1.0 - m[j:j + 1, :]), 0.0)
        a_ref[j * K:(j + 1) * K, :] = blk
    A = a_ref[...]
    b = m * b_ref[...]
    out_ref[...] = _cg_core(A, b, n_iters, K)


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


def _lane_block(Cp: int, K: int) -> int:
    """Lane-block size: the whole padded batch when it fits one program's
    VMEM budget, else the LARGEST LANES-multiple divisor of Cp under it —
    never straight to a 128-lane block, which would multiply sequential
    grid programs each paying the full loop latency.

    Live VMEM per program is ~(K²+12K)·B·4 B (the A matrix/scratch, the
    five (K, B) in/out tiles, the x/r/p/Ap iterates, and elementwise
    temporaries of the in-kernel system build).  The budget is 14 MB:
    the TPU compiler enforces a 16 MB SCOPED-VMEM stack limit per
    kernel, and a 2048-lane block at K=48 (19.4 MB) was observed to
    fail compilation against exactly that limit (2026-08-21) — 1024
    lanes (11.8 MB) compiles and runs."""
    fit = max(LANES, (14 << 20) // ((K * K + 12 * K) * 4) // LANES * LANES)
    for nblk in range(Cp // LANES, 0, -1):
        blk = nblk * LANES
        if blk <= fit and Cp % blk == 0:
            return blk
    return LANES


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
    max_lanes = _lane_block(Cp, K)
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


@functools.partial(jax.jit,
                   static_argnames=("mix", "n_iters", "interpret"))
def lanes_mix_masked_cg(iaf, jaf, mask, rhs, eps, mix, n_iters: int = 64,
                        interpret: bool = False):
    """Whole-batch fused CG with the masked analytic-mixture system built
    in-kernel from the packed window coordinates (_cg_lanes_mix_kernel).

    iaf/jaf: (C, K) f32 packed row/col window coordinates (exact small
    ints); mask/rhs: (C, K); eps scalar or (C,); mix: SGSStatic.mix.
    Returns w (C, K) with masked slots zeroed.  Same system as
    ``lanes_masked_cg(S_cc, ...)`` with S_cc the XLA mixture — identical
    formula, so agreement is to f32 roundoff (exp/sqrt evaluation and
    reduction order differ between Mosaic and XLA); tolerance pinned by
    tests/test_kriging.py::test_lanes_mix_cg_matches_xla_system.

    Zero-padded batch columns build the identity system and stay exactly
    zero (see the kernel docstring).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, K = mask.shape

    Cp = -(-C // LANES) * LANES
    max_lanes = _lane_block(Cp, K)

    def t(x):
        return jnp.zeros((K, Cp), jnp.float32).at[:, :C].set(
            x.T.astype(jnp.float32))

    iat, jat, mt, bt = t(iaf), t(jaf), t(mask), t(rhs)
    eps = jnp.broadcast_to(jnp.asarray(eps, jnp.float32), (C,))
    ept = jnp.zeros((1, Cp), jnp.float32).at[:, :C].set(eps[None, :])

    row = pl.BlockSpec((K, max_lanes), lambda i: (0, i))
    out = pl.pallas_call(
        functools.partial(_cg_lanes_mix_kernel, n_iters, K, mix),
        grid=(Cp // max_lanes,),
        in_specs=[row, row, row, row,
                  pl.BlockSpec((1, max_lanes), lambda i: (0, i))],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((K, Cp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((K * K, max_lanes), jnp.float32)],
        interpret=interpret,
    )(iat, jat, mt, bt, ept)
    return out[:, :C].T * mask


def lanes_cg_available() -> bool:
    """The lanes CG kernel targets TPU backends (incl. the tunneled axon
    one); elsewhere the vmapped XLA CG is used (CI covers the kernel in
    interpret mode)."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


