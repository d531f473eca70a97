"""Exact-posterior correctness of the CRF and SGS Metropolis-Hastings samplers.

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

The SGS chain admits the same kind of closed form through a DIFFERENT
identity: re-simulating a block from the exact conditional of the
variogram GP prior with the reference's likelihood-only acceptance rule
``min(1, exp(loss - loss'))`` (MCMC.py:1797-1805) targets exactly
``pi(b) ~ p_GP(b) exp(-loss(b))`` — the prior's conditional densities
cancel in the Metropolis-Hastings ratio (the chain_sgs module docstring's
argument, made quantitative here).  With a quadratic loss that posterior
is again an exact Gaussian: precision ``K = (Sigma^-1)_FF + A^T A /
sigma^2`` over the block-reachable free set F, conditioned on the frozen
exterior.  A short-range covariance makes the window/top-k conditioning
truncations exponentially small (cov at the margin ~ 6e-6 sill), so any
bug in the conditional draw (circulant-embedding spectrum, packed CG
solve, kriging-adjustment convolution) or in the MH bookkeeping shows up
as a measurable moment deviation.
"""

import numpy as np
import pytest

from mcmc_tpu.models import ChainCRF
from mcmc_tpu.models.chain_sgs import ChainSGS
from mcmc_tpu.ops.covariance import (CovarianceSpec, covariance_norm,
                                     make_rotation_matrix)
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


def test_crf_weighted_update_samples_exact_gaussian_posterior():
    """The production update type (CRF_weight): the deterministic logistic
    weight keeps the proposal symmetric (w * block is odd in the block's
    noise), so the weighted chain must target the same exp(-loss) — but its
    min-shifted weight is EXACTLY zero at data cells
    (RandField.get_crf_weight_from_dist, MCMC.py:716-740), so data cells
    are structurally pinned and the free set is the region's non-data
    cells.  Checkerboard radar picks make the weight spatially varying
    (0 at picks, ~0.29 one cell away) and condition the remaining pure-mc
    quadratic (cond(K) ~ 18 measured); the nugget is scaled up so the
    0.29x weight still yields efficient random-walk steps."""
    p = _problem()
    region_ij = np.argwhere(p["region"] == 1)
    cb = (region_ij[:, 0] + region_ij[:, 1]) % 2 == 0
    dm = np.zeros((H, W), bool)
    dm[region_ij[cb, 0], region_ij[cb, 1]] = True
    p["data_mask"] = dm
    p["cond_bed"] = np.where(dm, p["initial_bed"], np.nan)

    fij = region_ij[~cb]          # free: non-pinned region cells
    pin_ij = region_ij[cb][:3]    # a few pinned probes
    b0 = p["initial_bed"].astype(np.float64)

    def res(b):
        return np.asarray(ref.mass_conservation_residual(
            b, p["surf"], p["velx"], p["vely"], p["dhdt"], p["smb"],
            RES), np.float64).ravel()

    r0 = res(b0)
    cols = []
    for (i, j) in fij:
        bp = b0.copy()
        bp[i, j] += 1.0
        cols.append(res(bp) - r0)
    A = np.stack(cols, axis=1)
    K = A.T @ A / SIGMA ** 2  # pure-mc; the pinned checkerboard kills the
    #                           divergence-free soft modes (cond ~ 18)
    mu = b0[fij[:, 0], fij[:, 1]] - np.linalg.solve(K, A.T @ r0 / SIGMA ** 2)
    Sigma = np.linalg.inv(K)
    sd = np.sqrt(np.diag(Sigma))

    chain = ChainCRF(p["xx"], p["yy"], p["initial_bed"], p["surf"],
                     p["velx"], p["vely"], p["dhdt"], p["smb"],
                     p["cond_bed"], p["data_mask"], p["grounded"],
                     p["resolution"])
    chain.set_update_region(True, p["region"])
    chain.set_loss_type(sigma_mc=SIGMA, massConvInRegion=False)
    chain.configure_randfield(
        RandFieldConfig(2e3, 6e3, 2e3, 6e3, scale_min=2, scale_max=6,
                        nugget_max=60000.0, model_name="Gaussian",
                        isotropic=True),
        BlockMenuConfig(4, 8, 4, 8, steps=2),
        WeightConfig(L=2, x0=0, k=6, offset=1, max_dist=5e3,
                     resolution=RES))
    chain.set_update_type("CRF_weight")
    probes = np.concatenate([fij, pin_ij])
    chain.set_sample_points_locations(
        np.stack([p["xx"][probes[:, 0], probes[:, 1]],
                  p["yy"][probes[:, 0], probes[:, 1]]], axis=1))

    C, N, BURN = 48, 16000, 4000
    sampler = MultiChainSampler(chain, n_chains=C)
    states = sampler.init(seeds=7)
    _, traces = sampler.run(states, n_iter=N, segment_size=N, progress=False)
    Sall = np.asarray(traces["samples"], np.float64)
    S = Sall[:, BURN:, : len(fij)]

    acc = traces["step"][:, 1:].mean()
    assert 0.05 < acc < 0.95, f"degenerate acceptance {acc:.3f}"

    # pinned data cells never move (the min-shifted weight is exactly 0)
    pinned = Sall[:, :, len(fij):]
    want = b0[pin_ij[:, 0], pin_ij[:, 1]].astype(np.float32)
    assert np.array_equal(
        pinned, np.broadcast_to(want, pinned.shape).astype(np.float64))

    per_chain_mean = S.mean(axis=1)
    grand = per_chain_mean.mean(axis=0)
    se = per_chain_mean.std(axis=0, ddof=1) / np.sqrt(C)
    z = (grand - mu) / se
    assert np.max(np.abs(z)) < 5.0, (
        f"posterior mean off: max|z|={np.max(np.abs(z)):.2f}")
    assert np.sqrt(np.mean(z ** 2)) < 2.0
    assert np.max(np.abs(grand - mu) / sd) < 0.2

    ratio = S.var(axis=1, ddof=1).mean(axis=0) / np.diag(Sigma)
    assert np.all(ratio > 0.8) and np.all(ratio < 1.2), (
        f"variance ratio range [{ratio.min():.2f}, {ratio.max():.2f}]")


# ---------------------------------------------------------------------------
# SGS chain: prior x likelihood posterior in closed form
# ---------------------------------------------------------------------------

SGS_H = SGS_W = 24
SGS_SILL = 64.0          # prior sd 8 m in detrended space
SGS_VRANGE = 500.0       # 1 cell: cov(d) = sill exp(-3d) -> 6e-6 sill at the
#                          4-cell window margin (screening is exponential)
SGS_R0, SGS_R1 = 10, 14  # 4x4 menu of block centers
SGS_BMIN, SGS_BMAX = 3, 5


def _sgs_problem():
    x = np.arange(SGS_W) * RES
    y = np.arange(SGS_H) * RES
    xx, yy = np.meshgrid(x, y)
    bed_true = (150 * np.sin(2 * np.pi * xx / (SGS_W * RES))
                * np.cos(2 * np.pi * yy / (SGS_H * RES)) - 300)
    surf = bed_true + 3000.0  # thickness guard never binds
    velx = 120 + 60 * np.sin(2 * np.pi * yy / (SGS_H * RES))
    vely = 40 * np.cos(2 * np.pi * xx / (SGS_W * RES))
    dhdt = np.zeros_like(xx)
    # r(bed_true) == 0, and trend == bed_true: the detrended state starts
    # at the prior mean (0) and the posterior mean equals the trend
    smb = np.asarray(ref.mass_conservation_residual(
        bed_true, surf, velx, vely, dhdt, np.zeros_like(xx), RES))
    region = np.zeros((SGS_H, SGS_W), np.float32)
    region[SGS_R0:SGS_R1, SGS_R0:SGS_R1] = 1
    return dict(xx=xx, yy=yy, bed_true=bed_true, surf=surf, velx=velx,
                vely=vely, dhdt=dhdt, smb=smb, region=region,
                # no radar picks anywhere: proposals are pure conditional-
                # prior draws (data cells inside a block would be pinned)
                data_mask=np.zeros((SGS_H, SGS_W), bool),
                cond_bed=np.full((SGS_H, SGS_W), np.nan),
                grounded=np.ones((SGS_H, SGS_W), bool))


def _sgs_free_set():
    """Cells reachable by any block — the chain's true free variables.
    Blocks are NOT clipped to the update region (reference semantics:
    only the CENTER is region-constrained, MCMC.py:1749-1773), so the
    free set is the region dilated by the block-extent arithmetic."""
    F = np.zeros((SGS_H, SGS_W), bool)
    for cx in range(SGS_R0, SGS_R1):
        for cy in range(SGS_R0, SGS_R1):
            for bsx in range(SGS_BMIN, SGS_BMAX):
                for bsy in range(SGS_BMIN, SGS_BMAX):
                    F[max(0, (2 * cx - bsx) // 2):
                      min(SGS_H, (2 * cx + bsx) // 2),
                      max(0, (2 * cy - bsy) // 2):
                      min(SGS_W, (2 * cy + bsy) // 2)] = True
    return np.argwhere(F)


def _sgs_exact_posterior(p, fij):
    """mu/Sigma of pi(z_F) ~ p_GP(z_F | z_ext = 0) exp(-|A z|^2/(2 s^2))
    in detrended space: prior precision = the (F, F) block of the full-grid
    GP precision (exterior cells sit frozen at the prior mean), likelihood
    from the exact residual Jacobian.  Returned mean is in BED space
    (trend re-added) to match the probe traces."""
    spec = CovarianceSpec("exponential", s=None)
    rot = np.asarray(make_rotation_matrix(0.0, SGS_VRANGE, SGS_VRANGE),
                     np.float64)
    pts = np.stack([p["xx"].ravel(), p["yy"].ravel()], -1)
    d = np.linalg.norm((pts[:, None, :] - pts[None, :, :]) @ rot.T, axis=-1)
    Sig = np.asarray(covariance_norm(spec, d, SGS_SILL, 0.0), np.float64)
    P_full = np.linalg.inv(Sig)
    fidx = fij[:, 0] * SGS_W + fij[:, 1]
    K_prior = P_full[np.ix_(fidx, fidx)]

    b0 = p["bed_true"].astype(np.float64)

    def res(b):
        return np.asarray(ref.mass_conservation_residual(
            b, p["surf"], p["velx"], p["vely"], p["dhdt"], p["smb"],
            RES), np.float64).ravel()

    r0 = res(b0)
    cols = []
    for (i, j) in fij:
        bp = b0.copy()
        bp[i, j] += 1.0
        cols.append(res(bp) - r0)
    A = np.stack(cols, axis=1)
    K = K_prior + A.T @ A / SIGMA ** 2
    Sigma = np.linalg.inv(K)
    mu = Sigma @ (-A.T @ r0 / SIGMA ** 2) + b0[fij[:, 0], fij[:, 1]]
    return mu, Sigma


def test_sgs_transformed_detrended_samples_exact_posterior():
    """The PRODUCTION small-scale configuration — detrend + normal-score
    transform (reference smallScaleChain_multiprocessing.py:486-497) — has
    the same closed form when the fitted transform is (near-)affine.

    With ``do_transform=True`` the chain state is z = nst(bed - trend), the
    proposal re-simulates z-blocks from the exact conditional of the
    z-space GP prior, and the likelihood is evaluated on
    ``bed = trend + nst^{-1}(z)`` (MCMC.py:1766-1784 semantics).  The prior
    conditional densities still cancel in the MH ratio, so the chain
    targets ``pi(z) ~ p_GP(z) exp(-loss(trend + nst^{-1}(z)))`` exactly.
    Building the quantile table as an affine image of a z-uniform grid
    makes ``nst^{-1}(z) = lam * z`` to within the quantile-table
    interpolation error (checked < 0.2% of lam below), so the target is
    again an exact Gaussian: precision ``K = K_prior,z + lam^2 A^T A /
    sigma^2`` over the block-reachable free set, conditioned on the frozen
    exterior (z_ext = 0).  A constant mass-conservation bias inside the
    region tilts the posterior mean away from the trend, so the test
    checks a genuinely asymmetric target — any bug in the z-plane cache,
    the device LUT transform/inverse, the detrended bookkeeping, or the MH
    ratio under the transform shows up as a moment deviation.

    Closes VERDICT r3 next-#8: RF, CRF_weight, and raw-SGS had exact-
    posterior coverage; the transformed/detrended path (what production
    runs) did not.
    """
    from scipy.stats import norm

    from mcmc_tpu.ops.transforms import NormalScoreTransform

    p = _sgs_problem()
    # constant mass-conservation bias on the region: r(bed_true) = DELTA
    # there, so the posterior mean is tilted off the trend
    DELTA = 5.0
    p = dict(p, smb=p["smb"] - DELTA * (p["region"] == 1))

    # --- affine normal-score transform ------------------------------------
    # ``fit`` places table nodes uniformly in PROBABILITY, so the far tail
    # (sparse in z) interpolates linearly-in-p and deviates from affine by
    # ~0.08*LAM at |z|=3.5 (measured).  Build the table directly on a
    # z-uniform grid instead: quantiles = LAM * z over cdf(z) references —
    # the identical interp/LUT machinery, but affine to O(dz^2) everywhere
    # the chain can reach.
    LAM = 8.0
    zgrid = np.linspace(-6.0, 6.0, 2401)
    nst = NormalScoreTransform(quantiles=LAM * zgrid,
                               references=norm.cdf(zgrid))
    zg = np.linspace(-3.5, 3.5, 401)
    xg = np.asarray(nst.inverse_np(zg))
    lam_eff = float(np.dot(zg, xg) / np.dot(zg, zg))
    aff_err = np.max(np.abs(xg - lam_eff * zg))
    assert aff_err < 2e-3 * LAM, f"transform not affine: {aff_err:.4f}"
    assert abs(float(np.asarray(nst.transform_np(0.0)))) < 1e-9

    fij = _sgs_free_set()

    # --- exact posterior in z-space ----------------------------------------
    spec = CovarianceSpec("exponential", s=None)
    rot = np.asarray(make_rotation_matrix(0.0, SGS_VRANGE, SGS_VRANGE),
                     np.float64)
    pts = np.stack([p["xx"].ravel(), p["yy"].ravel()], -1)
    d = np.linalg.norm((pts[:, None, :] - pts[None, :, :]) @ rot.T, axis=-1)
    Sig_z = np.asarray(covariance_norm(spec, d, 1.0, 0.0), np.float64)
    fidx = fij[:, 0] * SGS_W + fij[:, 1]
    K_prior = np.linalg.inv(Sig_z)[np.ix_(fidx, fidx)]

    b0 = p["bed_true"].astype(np.float64)

    def res(b):
        return np.asarray(ref.mass_conservation_residual(
            b, p["surf"], p["velx"], p["vely"], p["dhdt"], p["smb"],
            RES), np.float64).ravel()

    r0 = res(b0)
    cols = []
    for (i, j) in fij:
        bp = b0.copy()
        bp[i, j] += 1.0
        cols.append(res(bp) - r0)
    A = np.stack(cols, axis=1)
    K = K_prior + lam_eff ** 2 * (A.T @ A) / SIGMA ** 2
    Sigma_z = np.linalg.inv(K)
    mu_z = Sigma_z @ (-lam_eff * A.T @ r0 / SIGMA ** 2)
    # the tilt must be non-trivial (or the test degenerates to symmetric)
    # yet keep z well inside the transform's affine range
    assert 0.25 < np.max(np.abs(mu_z)) < 2.5, f"tilt {np.max(np.abs(mu_z))}"
    mu_bed = b0[fij[:, 0], fij[:, 1]] + lam_eff * mu_z
    sd_bed = lam_eff * np.sqrt(np.diag(Sigma_z))

    # --- chain: production-style detrend + transform ------------------------
    chain = ChainSGS(p["xx"], p["yy"], p["bed_true"].copy(), p["surf"],
                     p["velx"], p["vely"], p["dhdt"], p["smb"],
                     p["cond_bed"], p["data_mask"], p["grounded"], RES)
    chain.set_update_region(True, p["region"])
    chain.set_loss_type(sigma_mc=SIGMA, massConvInRegion=False)
    chain.set_trend(p["bed_true"].astype(np.float32), detrend_map=True)
    chain.set_normal_transformation(nst, do_transform=True)
    chain.set_variogram("Exponential", SGS_VRANGE, 1.0, 0.0)  # z-space sill
    chain.set_sgs_param(96, 1500.0)
    chain.cg_iters = 32
    chain.set_block_sizes(SGS_BMIN, SGS_BMAX, SGS_BMIN, SGS_BMAX)
    chain.set_sample_points_locations(
        np.stack([p["xx"][fij[:, 0], fij[:, 1]],
                  p["yy"][fij[:, 0], fij[:, 1]]], axis=1))

    C, N, BURN = 48, 4000, 1000
    sampler = MultiChainSampler(chain, n_chains=C)
    states = sampler.init(seeds=7)
    _, traces = sampler.run(states, n_iter=N, segment_size=N, progress=False)
    S = np.asarray(traces["samples"], np.float64)[:, BURN:, :]

    acc = np.asarray(traces["step"])[:, 1:].mean()
    assert 0.05 < acc < 0.95, f"degenerate acceptance {acc:.3f}"

    # --- mean (bed space) vs trend + exact tilt ----------------------------
    per_chain_mean = S.mean(axis=1)
    grand = per_chain_mean.mean(axis=0)
    se = per_chain_mean.std(axis=0, ddof=1) / np.sqrt(C)
    z = (grand - mu_bed) / se
    assert np.max(np.abs(z)) < 5.0, (
        f"posterior mean off: max|z|={np.max(np.abs(z)):.2f}, "
        f"worst cell err {(grand - mu_bed)[np.argmax(np.abs(z))]:.3f} m")
    assert np.sqrt(np.mean(z ** 2)) < 2.0, (
        f"mean z rms {np.sqrt(np.mean(z**2)):.2f}")
    assert np.max(np.abs(grand - mu_bed) / sd_bed) < 0.2

    # --- marginal variances --------------------------------------------------
    ratio = S.var(axis=1, ddof=1).mean(axis=0) / sd_bed ** 2
    assert np.all(ratio > 0.8) and np.all(ratio < 1.2), (
        f"variance ratio range [{ratio.min():.2f}, {ratio.max():.2f}]")


def test_sgs_samples_exact_prior_times_likelihood_posterior():
    p = _sgs_problem()
    fij = _sgs_free_set()
    mu, Sigma = _sgs_exact_posterior(p, fij)
    sd = np.sqrt(np.diag(Sigma))

    chain = ChainSGS(p["xx"], p["yy"], p["bed_true"].copy(), p["surf"],
                     p["velx"], p["vely"], p["dhdt"], p["smb"],
                     p["cond_bed"], p["data_mask"], p["grounded"], RES)
    chain.set_update_region(True, p["region"])
    chain.set_loss_type(sigma_mc=SIGMA, massConvInRegion=False)
    # trend = true bed: the chain samples the zero-mean detrended prior
    chain.set_trend(p["bed_true"].astype(np.float32), detrend_map=True)
    chain.set_normal_transformation(None, do_transform=False)
    chain.set_variogram("Exponential", SGS_VRANGE, SGS_SILL, 0.0)
    # condition on EVERY cell within 3 cells of the block (~91 candidates
    # < K): the top-k truncation keeps only cells with cov <= 1.2e-4 sill
    chain.set_sgs_param(96, 1500.0)
    chain.cg_iters = 32  # kappa(S_CC + eps) ~ 2 at this range: converged
    chain.set_block_sizes(SGS_BMIN, SGS_BMAX, SGS_BMIN, SGS_BMAX)
    chain.set_sample_points_locations(
        np.stack([p["xx"][fij[:, 0], fij[:, 1]],
                  p["yy"][fij[:, 0], fij[:, 1]]], axis=1))

    C, N, BURN = 48, 4000, 1000
    sampler = MultiChainSampler(chain, n_chains=C)
    states = sampler.init(seeds=7)
    _, traces = sampler.run(states, n_iter=N, segment_size=N, progress=False)
    S = np.asarray(traces["samples"], np.float64)[:, BURN:, :]

    acc = np.asarray(traces["step"])[:, 1:].mean()
    assert 0.05 < acc < 0.95, f"degenerate acceptance {acc:.3f}"

    # --- mean (bed space): grand mean vs trend + exact tilt ---------------
    per_chain_mean = S.mean(axis=1)
    grand = per_chain_mean.mean(axis=0)
    se = per_chain_mean.std(axis=0, ddof=1) / np.sqrt(C)
    z = (grand - mu) / se
    assert np.max(np.abs(z)) < 5.0, (
        f"posterior mean off: max|z|={np.max(np.abs(z)):.2f}, "
        f"worst cell err {(grand - mu)[np.argmax(np.abs(z))]:.3f} m")
    assert np.sqrt(np.mean(z ** 2)) < 2.0, (
        f"mean z rms {np.sqrt(np.mean(z**2)):.2f}")
    assert np.max(np.abs(grand - mu) / sd) < 0.2

    # --- marginal variances vs the exact diagonal -------------------------
    per_chain_var = S.var(axis=1, ddof=1)
    ratio = per_chain_var.mean(axis=0) / np.diag(Sigma)
    assert np.all(ratio > 0.8) and np.all(ratio < 1.2), (
        f"variance ratio range [{ratio.min():.2f}, {ratio.max():.2f}]")

    # --- nearest-neighbor correlation (prior-dominated: small but exact) --
    k1 = int(np.flatnonzero((fij == [SGS_R0 + 1, SGS_R0 + 1]).all(1))[0])
    k2 = int(np.flatnonzero((fij == [SGS_R0 + 1, SGS_R0 + 2]).all(1))[0])
    rho_exact = Sigma[k1, k2] / np.sqrt(Sigma[k1, k1] * Sigma[k2, k2])
    x1 = S[:, :, k1] - S[:, :, k1].mean(axis=1, keepdims=True)
    x2 = S[:, :, k2] - S[:, :, k2].mean(axis=1, keepdims=True)
    rho_chain = ((x1 * x2).mean(axis=1)
                 / np.sqrt((x1 ** 2).mean(axis=1) * (x2 ** 2).mean(axis=1)))
    rho_se = rho_chain.std(ddof=1) / np.sqrt(C)
    assert abs(rho_chain.mean() - rho_exact) < max(5 * rho_se, 0.05), (
        f"corr {rho_chain.mean():.3f} vs exact {rho_exact:.3f}")
