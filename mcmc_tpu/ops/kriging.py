"""Batched kriging solves.

TPU-native port of the per-cell kriging solvers
(reference: gstatsim_custom/_krige.py:5-81).  The reference solves one
(n+1)x(n+1) lstsq per grid cell inside a Python loop; here the systems are
built and solved as a batch (vmap -> batched MXU solves), with fixed-size
neighbor sets and validity masks instead of ragged arrays.

Masked-neighbor convention: invalid neighbor slots (mask=0) are given
covariance rows/cols of the identity and zero cross-covariance, so they get
zero kriging weight and do not perturb the solution of the valid subsystem.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .covariance import CovarianceSpec, covariance_norm


def _masked_system(spec: CovarianceSpec, coords, mask, target_xy,
                   rotation_matrix, sill, nugget):
    """Sigma (k,k), rho (k,) with invalid slots neutralized."""
    t = coords @ rotation_matrix
    d2 = jnp.sum(jnp.square(t[:, None, :] - t[None, :, :]), axis=-1)
    sigma = covariance_norm(spec, jnp.sqrt(d2), sill, nugget)
    tt = jnp.asarray(target_xy) @ rotation_matrix
    rho = covariance_norm(
        spec, jnp.sqrt(jnp.sum(jnp.square(t - tt[None, :]), axis=-1)),
        sill, nugget)

    m = mask.astype(sigma.dtype)
    mm = m[:, None] * m[None, :]
    sigma = sigma * mm + jnp.diag(1.0 - m)
    rho = rho * m
    return sigma, rho


def sk_solve_masked(spec: CovarianceSpec, target_xy, coords, values, mask,
                    rotation_matrix, sill, nugget, global_mean, jitter=1e-6):
    """Simple kriging with masked fixed-size neighbors.

    Returns (est, var).  Matches _krige.sk_solve on the valid subset.
    """
    sigma, rho = _masked_system(spec, coords, mask, target_xy,
                                rotation_matrix, sill, nugget)
    k = coords.shape[0]
    sigma = sigma + jitter * jnp.eye(k, dtype=sigma.dtype)
    w = jnp.linalg.solve(sigma, rho)
    var = sill - jnp.sum(w * rho)
    est = global_mean + jnp.sum(w * mask * (values - global_mean))
    return est, var


def ok_solve_masked(spec: CovarianceSpec, target_xy, coords, values, mask,
                    rotation_matrix, sill, nugget, jitter=1e-6):
    """Ordinary kriging with masked fixed-size neighbors.

    The Lagrange constraint row carries 1 only for valid slots.  Matches
    _krige.ok_solve (local-mean form) on the valid subset.
    """
    k = coords.shape[0]
    sigma, rho = _masked_system(spec, coords, mask, target_xy,
                                rotation_matrix, sill, nugget)
    m = mask.astype(sigma.dtype)
    A = jnp.zeros((k + 1, k + 1), dtype=sigma.dtype)
    A = A.at[:k, :k].set(sigma + jitter * jnp.eye(k, dtype=sigma.dtype))
    A = A.at[k, :k].set(m)
    A = A.at[:k, k].set(m)
    # keep the bordered system nonsingular when no valid neighbors exist
    n_valid = jnp.sum(m)
    A = A.at[k, k].set(jnp.where(n_valid > 0, 0.0, 1.0))
    b = jnp.concatenate([rho, jnp.where(n_valid > 0, 1.0, 0.0)[None]])
    w = jnp.linalg.solve(A, b)
    var = sill - jnp.sum(w[:k] * rho)
    local_mean = jnp.sum(values * m) / jnp.maximum(n_valid, 1.0)
    est = local_mean + jnp.sum(w[:k] * m * (values - local_mean))
    return est, var


# batched forms: leading axis over cells
sk_solve_batch = jax.vmap(sk_solve_masked,
                          in_axes=(None, 0, 0, 0, 0, None, None, None, None))
ok_solve_batch = jax.vmap(ok_solve_masked,
                          in_axes=(None, 0, 0, 0, 0, None, None, None))


def conditional_gaussian_block(spec: CovarianceSpec, block_xy, cond_xy,
                               cond_values, cond_mask, rotation_matrix,
                               sill, nugget, global_mean, noise,
                               jitter=1e-4):
    """Exact joint conditional Gaussian draw for a block of cells.

    The README's planned replacement for sequential SGS
    (reference README.md:21-23: "use LU decomposition to generate random
    fields ... store LU decomposition in matrices"):

        x_B | x_C  ~  N( mu + S_BC S_CC^{-1} (x_C - mu),
                         S_BB - S_BC S_CC^{-1} S_CB )

    drawn via Cholesky of the conditional covariance.  Proposing from this
    conditional prior makes the reference's likelihood-only MH acceptance
    rule exact (prior terms cancel), whereas octant-limited sequential SGS
    only approximates it.

    block_xy: (nb, 2) cell coordinates (all slots used; mask outside).
    cond_xy/(values)/(mask): (nc, 2)/(nc,)/(nc,) fixed-size conditioning set.
    noise: (nb,) standard normals.
    Returns (draw (nb,), mean (nb,), chol-diag variance proxy (nb,)).
    """
    tb = block_xy @ rotation_matrix
    tc = cond_xy @ rotation_matrix

    def cov(a, b):
        d2 = jnp.sum(jnp.square(a[:, None, :] - b[None, :, :]), axis=-1)
        return covariance_norm(spec, jnp.sqrt(d2), sill, nugget)

    m = cond_mask.astype(tb.dtype)
    # jitter scales with the sill: smooth covariances (gaussian / high-s
    # matern) make S_cc numerically singular in f32 for dense conditioning
    # sets; an absolute jitter is meaningless when sill >> 1
    jitter = jitter * jnp.maximum(sill, 1.0)
    S_cc = cov(tc, tc) * (m[:, None] * m[None, :]) + jnp.diag(1.0 - m)
    S_cc = S_cc + jitter * jnp.eye(tc.shape[0], dtype=tb.dtype)
    S_bc = cov(tb, tc) * m[None, :]
    # the reference kriging variance is `sill - w.rho` (_krige.py:38,75): the
    # target's prior variance is the full sill, i.e. covariance diag
    # (sill - nugget) plus the nugget micro-variance
    S_bb = cov(tb, tb) + (nugget + jitter) * jnp.eye(tb.shape[0], dtype=tb.dtype)

    L_cc = jnp.linalg.cholesky(S_cc)
    # A = S_CC^{-1} S_CB  via two triangular solves
    A = jax.scipy.linalg.cho_solve((L_cc, True), S_bc.T)      # (nc, nb)
    mean = global_mean + S_bc @ jax.scipy.linalg.cho_solve(
        (L_cc, True), m * (cond_values - global_mean))
    S_cond = S_bb - S_bc @ A
    # symmetrize + floor for numerical safety before Cholesky
    S_cond = 0.5 * (S_cond + S_cond.T) + jitter * jnp.eye(
        tb.shape[0], dtype=tb.dtype)
    L = jnp.linalg.cholesky(S_cond)
    draw = mean + L @ noise
    return draw, mean, jnp.diagonal(S_cond)


def sk_weights_masked(spec: CovarianceSpec, target_xy, coords, mask,
                      rotation_matrix, sill, nugget, jitter=1e-6):
    """Simple-kriging weights for reuse (the reference's ``precompute=True``
    mode, _krige.py:77-78, backing parallel.get_weights at parallel.py:79-179).
    Returns (weights (k,), var)."""
    sigma, rho = _masked_system(spec, coords, mask, target_xy,
                                rotation_matrix, sill, nugget)
    k = coords.shape[0]
    sigma = sigma + jitter * jnp.eye(k, dtype=sigma.dtype)
    w = jnp.linalg.solve(sigma, rho)
    return w, sill - jnp.sum(w * rho)


def ok_weights_masked(spec: CovarianceSpec, target_xy, coords, mask,
                      rotation_matrix, sill, nugget, jitter=1e-6):
    """Ordinary-kriging weights for reuse (reference _krige.py:40-41).
    Returns (weights (k,) incl. masked slots, var); the Lagrange multiplier
    is dropped like the reference."""
    k = coords.shape[0]
    sigma, rho = _masked_system(spec, coords, mask, target_xy,
                                rotation_matrix, sill, nugget)
    m = mask.astype(sigma.dtype)
    A = jnp.zeros((k + 1, k + 1), dtype=sigma.dtype)
    A = A.at[:k, :k].set(sigma + jitter * jnp.eye(k, dtype=sigma.dtype))
    A = A.at[k, :k].set(m)
    A = A.at[:k, k].set(m)
    n_valid = jnp.sum(m)
    A = A.at[k, k].set(jnp.where(n_valid > 0, 0.0, 1.0))
    b = jnp.concatenate([rho, jnp.where(n_valid > 0, 1.0, 0.0)[None]])
    w = jnp.linalg.solve(A, b)
    return w[:k], sill - jnp.sum(w[:k] * rho)


def masked_spd_solve(Sigma, mask, rhs, eps):
    """Direct Cholesky solve of the same masked SPD system as
    ``masked_cg_solve``:

        (M Sigma M + (I - M) + eps I) w = M rhs,   M = diag(mask).

    One batched (n, n) factorization instead of ~n sequential CG
    iterations: on TPU the CG's fixed-iteration loop is LATENCY-bound (64
    tiny dependent matvec rounds), measured at ~47% of the whole SGS
    step-batch at n=48, K=256 chains — a single batched Cholesky +
    triangular solves is the faster shape for small dense systems.

    Sigma: (..., n, n); mask/rhs: (..., n).  Returns w (..., n) with
    masked slots zeroed.
    """
    m = mask
    n = Sigma.shape[-1]
    Sm = Sigma * m[..., :, None] * m[..., None, :]
    diag = eps + (1.0 - m)
    Sm = Sm + jnp.eye(n, dtype=Sigma.dtype) * diag[..., None, :]
    L = jnp.linalg.cholesky(Sm)
    w = jax.scipy.linalg.cho_solve((L, True), (m * rhs)[..., None])[..., 0]
    return w * m


def masked_cg_solve(Sigma, mask, rhs, eps, n_iters: int = 48):
    """Fixed-iteration conjugate-gradient solve of the masked SPD system

        (M Sigma M + (I - M) + eps I) w = M rhs

    where M = diag(mask).  Everything is batched matvecs against a SHARED
    ``Sigma`` (the stationary window covariance), so it runs as MXU matmuls
    with no sequential panel factorization — the TPU-friendly replacement
    for a per-chain Cholesky of the conditioning system.

    Sigma: (n, n) shared; mask/rhs: (..., n) batched. Returns w (..., n).
    """
    m = mask
    b = m * rhs
    # full-f32 accumulation: TPU's default matmul precision is bf16-class,
    # which under vmap silently downgrades these matvecs and destroys CG
    # convergence (an unbatched matvec takes the f32 VPU path instead —
    # the bug only appeared in batched runs)
    hi = jax.lax.Precision.HIGHEST

    def A(v):
        return m * jnp.matmul(m * v, Sigma, precision=hi) + (1.0 - m) * v + eps * v

    x = jnp.zeros_like(b)
    r = b
    p = r
    rs = jnp.sum(r * r, axis=-1, keepdims=True)

    def body(i, carry):
        x, r, p, rs = carry
        Ap = A(p)
        alpha = rs / jnp.maximum(jnp.sum(p * Ap, axis=-1, keepdims=True), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.sum(r * r, axis=-1, keepdims=True)
        p = r + (rs_new / jnp.maximum(rs, 1e-30)) * p
        return (x, r, p, rs_new)

    x, r, p, rs = jax.lax.fori_loop(0, n_iters, body, (x, r, p, rs))
    return x
