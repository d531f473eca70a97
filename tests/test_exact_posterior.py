"""Exact-posterior correctness of the CRF Metropolis-Hastings sampler.

The strongest end-to-end validation available for this framework: on the
mass-conservation loss the residual is LINEAR in the bed (reference
Topography.py:592-600 — np.gradient of velx*(surf-bed) etc.), so
``loss = sum(r^2)/(2*sigma^2)`` is an exact quadratic form and the target
density ``pi(b) ~ exp(-loss)`` restricted to the update-region cells is an
exact multivariate GAUSSIAN whose mean and covariance we can compute in
closed form (mean = least-squares bed, covariance = sigma^2 (A^T A)^-1 with
A the residual Jacobian).

The CRF proposal is a symmetric random-walk increment: the spectral field
is an odd function of its Gaussian noise (every op is linear except the
standardization (f - mean)/std, which is odd; MCMC.py:176-254), and the
block size / center / edge-mask draws are state-independent, so
``q(x'|x) = q(x|x')`` and the reference's ``min(1, exp(loss - loss'))``
rule (MCMC.py:1331-1337) targets exactly pi.  Any bug in the MH ratio, a
proposal asymmetry, or drift in the incremental residual patch therefore
shows up as a measurable deviation of the sampled moments from the closed
form — independent of the NumPy twin (which shares the algorithm and could
share a bug).

Statistics: per-chain posterior means are i.i.d. across chains, so the
across-chain scatter gives an assumption-free standard error for the grand
mean (no ESS estimate needed); variances are checked against the exact
diagonal with a band covering their own sampling noise.
"""

import numpy as np
import pytest

from mcmc_tpu.models import ChainCRF
from mcmc_tpu.parallel.sampler import MultiChainSampler
from mcmc_tpu.utils.config import (BlockMenuConfig, RandFieldConfig,
                                   WeightConfig)
from tests import reference_impl as ref

H = W = 32
RES = 500.0
SIGMA = 5.0
# 6x6 free cells: small enough for an exact dense solve, large enough that
# the block proposals (4-8 cells) exercise clipping and partial overlap
R0, R1 = 13, 19


def _problem():
    x = np.arange(W) * RES
    y = np.arange(H) * RES
    xx, yy = np.meshgrid(x, y)
    bed_true = (150 * np.sin(2 * np.pi * xx / (W * RES))
                * np.cos(2 * np.pi * yy / (H * RES)) - 300)
    # surface far above any reachable bed: the thickness guard never binds,
    # so the target is the pure (untruncated) Gaussian
    surf = bed_true + 3000.0
    velx = 120 + 60 * np.sin(2 * np.pi * yy / (H * RES))
    vely = 40 * np.cos(2 * np.pi * xx / (W * RES))
    dhdt = np.zeros_like(xx)
    # smb chosen so r(bed_true) == 0: the posterior mode is bed_true and
    # chains start at the mode (shortest possible burn-in)
    smb = np.asarray(ref.mass_conservation_residual(
        bed_true, surf, velx, vely, dhdt, np.zeros_like(xx), RES))
    region = np.zeros((H, W), np.float32)
    region[R0:R1, R0:R1] = 1
    # radar picks at every free cell: the quadratic data-misfit term keeps
    # the target exactly Gaussian while bounding the condition number of the
    # posterior precision — the pure mass-conservation quadratic has
    # near-null (divergence-free) soft modes whose autocorrelation time
    # would dwarf any test-budget run (measured: variance ratio 0.2-0.5 at
    # 4000 iters without it)
    data_mask = region.astype(bool)
    cond_bed = np.where(data_mask, bed_true, np.nan)
    return dict(xx=xx, yy=yy, surf=surf, velx=velx, vely=vely, dhdt=dhdt,
                smb=smb, region=region, data_mask=data_mask,
                cond_bed=cond_bed, grounded=np.ones((H, W), bool),
                initial_bed=bed_true.copy(), resolution=RES)


SIGMA_DATA = 25.0


def _exact_posterior(p):
    """(region_ij, mu, Sigma) of
    pi(b_region) ~ exp(-sum(r^2)/(2 sigma^2) - sum((b - cond)^2)/(2 sd^2)),
    from the float64 host twin of the residual (linear => finite differences
    with a unit step are exact up to float64 rounding).  Every region cell
    carries a radar pick at cond = b0, so the posterior precision is
    K = A^T A / sigma^2 + I / sigma_data^2 and (with r(b0) = 0 by problem
    construction) the mean is b0 up to the tiny r0 rounding correction."""
    region_ij = np.argwhere(p["region"] == 1)
    b0 = p["initial_bed"].astype(np.float64)

    def res(b):
        return np.asarray(ref.mass_conservation_residual(
            b, p["surf"], p["velx"], p["vely"], p["dhdt"], p["smb"],
            RES), np.float64).ravel()

    r0 = res(b0)
    cols = []
    for (i, j) in region_ij:
        bp = b0.copy()
        bp[i, j] += 1.0
        cols.append(res(bp) - r0)
    A = np.stack(cols, axis=1)  # (H*W, 36)
    n = len(region_ij)
    K = A.T @ A / SIGMA ** 2 + np.eye(n) / SIGMA_DATA ** 2
    # data term is centered at b0 (cond_bed == bed_true == b0 on the region)
    mu = b0[region_ij[:, 0], region_ij[:, 1]] - np.linalg.solve(
        K, A.T @ r0 / SIGMA ** 2)
    Sigma = np.linalg.inv(K)
    return region_ij, mu, Sigma


def _build_chain(p):
    chain = ChainCRF(p["xx"], p["yy"], p["initial_bed"], p["surf"], p["velx"],
                     p["vely"], p["dhdt"], p["smb"], p["cond_bed"],
                     p["data_mask"], p["grounded"], p["resolution"])
    chain.set_update_region(True, p["region"])
    # mc loss over the FULL grid + Gaussian radar misfit on the region picks
    chain.set_loss_type(sigma_mc=SIGMA, massConvInRegion=False,
                        diff_func="sumsquare", sigma_data=SIGMA_DATA)
    # white-noise-dominated proposal (nugget sd ~ sqrt(U(0,150)) ~ 8.7 m,
    # smooth component effectively (2..6)/3 m): the data-dominated target has
    # nearly independent cells (sd ~ 17-21 m), so rough proposals near the
    # 2.38*sd/sqrt(d) random-walk optimum mix orders of magnitude faster
    # than production-style smooth fields (which move only a few spatial
    # modes per step — measured variance-ratio bias 0.6-0.8 at 12k iters)
    chain.configure_randfield(
        RandFieldConfig(2e3, 6e3, 2e3, 6e3, scale_min=2, scale_max=6,
                        nugget_max=150.0, model_name="Gaussian",
                        isotropic=True),
        BlockMenuConfig(4, 8, 4, 8, steps=2),
        WeightConfig(L=2, x0=0, k=6, offset=1, max_dist=3e3, resolution=RES))
    chain.set_update_type("RF")  # plain symmetric blocks, no data weighting
    return chain


def test_crf_samples_exact_gaussian_posterior():
    p = _problem()
    region_ij, mu, Sigma = _exact_posterior(p)
    sd = np.sqrt(np.diag(Sigma))

    chain = _build_chain(p)
    # probe every free cell (the reference's sample_loc trace machinery)
    chain.set_sample_points_locations(
        np.stack([p["xx"][region_ij[:, 0], region_ij[:, 1]],
                  p["yy"][region_ij[:, 0], region_ij[:, 1]]], axis=1))

    C, N, BURN = 48, 12000, 2000
    sampler = MultiChainSampler(chain, n_chains=C)
    states = sampler.init(seeds=7)
    _, traces = sampler.run(states, n_iter=N, segment_size=N, progress=False)
    S = np.asarray(traces["samples"], np.float64)[:, BURN:, :]  # (C, T, 36)

    acc = traces["step"][:, 1:].mean()
    assert 0.05 < acc < 0.95, f"degenerate acceptance {acc:.3f}"

    # --- mean: grand mean vs exact, SE from i.i.d. across-chain scatter ---
    per_chain_mean = S.mean(axis=1)                       # (C, 36)
    grand = per_chain_mean.mean(axis=0)
    se = per_chain_mean.std(axis=0, ddof=1) / np.sqrt(C)
    z = (grand - mu) / se
    # 36 cells, Bonferroni-ish bound on max |z|; rms(z) ~ 1 if calibrated
    assert np.max(np.abs(z)) < 5.0, (
        f"posterior mean off: max|z|={np.max(np.abs(z)):.2f}, "
        f"worst cell err {(grand - mu)[np.argmax(np.abs(z))]:.3f} m")
    assert np.sqrt(np.mean(z ** 2)) < 2.0, f"mean z rms {np.sqrt(np.mean(z**2)):.2f}"
    # and in absolute terms the error is tiny vs the posterior spread
    assert np.max(np.abs(grand - mu) / sd) < 0.2

    # --- marginal variances vs the exact diagonal -------------------------
    per_chain_var = S.var(axis=1, ddof=1)                 # (C, 36)
    vhat = per_chain_var.mean(axis=0)
    vse = per_chain_var.std(axis=0, ddof=1) / np.sqrt(C)
    vz = (vhat - np.diag(Sigma)) / vse
    ratio = vhat / np.diag(Sigma)
    # autocorrelation biases a finite-window variance slightly low (O(tau/T));
    # the band covers that plus sampling noise
    assert np.all(ratio > 0.7) and np.all(ratio < 1.3), (
        f"variance ratio range [{ratio.min():.2f}, {ratio.max():.2f}]")
    assert np.mean(np.abs(vz)) < 6.0

    # --- correlation structure: nearest-neighbor pair ----------------------
    # exact correlation between two adjacent center cells
    k1 = int(np.flatnonzero((region_ij == [R0 + 2, R0 + 2]).all(1))[0])
    k2 = int(np.flatnonzero((region_ij == [R0 + 2, R0 + 3]).all(1))[0])
    rho_exact = Sigma[k1, k2] / np.sqrt(Sigma[k1, k1] * Sigma[k2, k2])
    x1 = S[:, :, k1] - S[:, :, k1].mean(axis=1, keepdims=True)
    x2 = S[:, :, k2] - S[:, :, k2].mean(axis=1, keepdims=True)
    rho_chain = ((x1 * x2).mean(axis=1)
                 / np.sqrt((x1 ** 2).mean(axis=1) * (x2 ** 2).mean(axis=1)))
    rho_se = rho_chain.std(ddof=1) / np.sqrt(C)
    assert abs(rho_chain.mean() - rho_exact) < max(5 * rho_se, 0.1), (
        f"corr {rho_chain.mean():.3f} vs exact {rho_exact:.3f}")
