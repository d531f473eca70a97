"""SGS parity vs the sequential NumPy twin (BASELINE.json configs 1-2).

The TPU chain proposes joint conditional Gaussian draws while the reference
simulates sequentially per cell, so parity is statistical (same conditional
law / posterior), not draw-for-draw (SURVEY.md §7.3):

  (a) per-cell kriging mean/variance EXACTNESS: ops/kriging masked solves on
      the twin's octant neighbor sets == the twin's ok/sk_solve
      (reference _krige.py:5-81);
  (b) acceptance-rate band + loss-decay parity of ChainSGS vs the twin
      chain_sgs MH loop (reference MCMC.py:1599-1911), the pattern of
      tests/test_statistical_parity.py;
  (c) posterior variogram reproduction: with a flat likelihood both chains
      sample the conditional prior, so their simulated fields must carry the
      configured variogram.
"""

import numpy as np
import pytest

from mcmc_tpu.models.chain_sgs import ChainSGS
from mcmc_tpu.ops.covariance import CovarianceSpec, make_rotation_matrix
from mcmc_tpu.ops.kriging import ok_solve_masked, sk_solve_masked
from tests import reference_impl as ref
from tests.conftest import make_synthetic_problem

VARIO = {"azimuth": 0.0, "nugget": 0.0, "major_range": 4e3,
         "minor_range": 4e3, "sill": 1.0, "vtype": "Exponential"}


def _small_problem(H=48, W=48, seed=5):
    return make_synthetic_problem(H=H, W=W, seed=seed)


def _neighbor_sets(p, rng, n_targets=12, radius=4e3, num_points=24):
    """Octant neighbor sets from the twin on a sparse conditioning field."""
    grid = np.where(p["data_mask"], p["cond_bed"], np.nan).astype(float)
    cond = ~np.isnan(grid)
    targets = np.argwhere(~cond & (p["region"] == 1))
    rng.shuffle(targets)
    out = []
    for (i, j) in targets[:n_targets]:
        nb = ref.octant_neighbors(i, j, p["xx"], p["yy"], grid, cond,
                                  radius, num_points)
        if nb.shape[0] >= 3:
            out.append(((i, j), nb))
    assert len(out) >= 5
    return out


class TestKrigingExactness:
    """(a) — BASELINE config 1's 'match kriging mean/variance per cell
    exactly' (SURVEY.md §7.3)."""

    @pytest.mark.parametrize("ktype", ["ok", "sk"])
    def test_masked_solves_match_twin_per_cell(self, ktype):
        p = _small_problem()
        rng = np.random.default_rng(0)
        sets = _neighbor_sets(p, rng)
        spec = CovarianceSpec("exponential")
        rot = np.asarray(make_rotation_matrix(
            VARIO["azimuth"], VARIO["major_range"], VARIO["minor_range"]))
        gm = float(np.nanmean(p["cond_bed"]))
        K = 24  # fixed slot count; twin sets are smaller -> masked
        for (i, j), nb in sets:
            target = (p["xx"][i, j], p["yy"][i, j])
            if ktype == "ok":
                est_t, var_t = ref.ok_solve(target, nb, VARIO)
            else:
                est_t, var_t = ref.sk_solve(target, nb, VARIO, gm)
            n = nb.shape[0]
            coords = np.zeros((K, 2))
            values = np.zeros(K)
            mask = np.zeros(K)
            coords[:n] = nb[:, :2]
            values[:n] = nb[:, 2]
            mask[:n] = 1.0
            if ktype == "ok":
                est, var = ok_solve_masked(
                    spec, np.asarray(target), coords, values, mask, rot,
                    VARIO["sill"], VARIO["nugget"], jitter=0.0)
            else:
                est, var = sk_solve_masked(
                    spec, np.asarray(target), coords, values, mask, rot,
                    VARIO["sill"], VARIO["nugget"], gm, jitter=0.0)
            assert float(est) == pytest.approx(est_t, rel=2e-4, abs=2e-3), (i, j)
            assert float(var) == pytest.approx(var_t, rel=2e-3, abs=2e-4), (i, j)


def _build_pair(p, sigma_mc=5.0, radius=3e3, neighbors=24, blocks=(6, 10),
                n_quantiles=500):
    """Matching (ChainSGS, ReferenceSGSChain) configurations."""
    from scipy.ndimage import gaussian_filter
    from sklearn.preprocessing import QuantileTransformer

    trend = gaussian_filter(p["initial_bed"], sigma=10).astype(np.float32)
    resid = (p["initial_bed"] - trend).reshape(-1, 1)
    nst = QuantileTransformer(n_quantiles=n_quantiles,
                              output_distribution="normal").fit(resid)

    chain = ChainSGS(p["xx"], p["yy"], p["initial_bed"], p["surf"],
                     p["velx"], p["vely"], p["dhdt"], p["smb"],
                     p["cond_bed"], p["data_mask"], p["grounded"],
                     p["resolution"])
    chain.set_update_region(True, p["region"])
    chain.set_loss_type(sigma_mc=sigma_mc, massConvInRegion=True)
    chain.set_trend(trend, detrend_map=True)
    chain.set_normal_transformation(nst, do_transform=True)
    chain.set_variogram(VARIO["vtype"], VARIO["major_range"], VARIO["sill"],
                        VARIO["nugget"], vario_smoothness=VARIO.get("s"))
    chain.set_sgs_param(neighbors, radius)
    chain.set_block_sizes(blocks[0], blocks[1], blocks[0], blocks[1])

    consts = dict(surf=p["surf"], velx=p["velx"], vely=p["vely"],
                  dhdt=p["dhdt"], smb=p["smb"],
                  region_mask=p["region"].astype(float),
                  mc_mask=p["region"].astype(float),
                  grounded=p["grounded"].astype(float),
                  cond_bed=p["cond_bed"], sigma_mc=sigma_mc,
                  resolution=p["resolution"])
    twin = ref.ReferenceSGSChain(consts, VARIO,
                                 (blocks[0], blocks[1], blocks[0], blocks[1]),
                                 neighbors, radius, nst=nst, trend=trend,
                                 seed=0)
    return chain, twin


class TestChainStatisticalParity:
    """(b) — acceptance band + loss decay vs the sequential twin."""

    def test_acceptance_and_decay_match_twin(self):
        p = _small_problem()
        n_iter = 300
        chain, twin = _build_pair(p)
        out = chain.run(n_iter=n_iter, seed=0)
        _, twin_losses, twin_steps = twin.run(p["initial_bed"], n_iter,
                                              p["xx"], p["yy"])

        acc_ours = out["steps"][1:].mean()
        acc_twin = twin_steps[1:].mean()
        # binomial 3-sigma band + allowance for the different proposal
        # mechanism (joint conditional draw vs sequential per-cell)
        band = 3 * np.sqrt(max(acc_twin * (1 - acc_twin), 0.01) / n_iter) + 0.10
        assert abs(acc_ours - acc_twin) < band, (acc_ours, acc_twin)

        dec_ours = 1 - out["loss"][-1] / out["loss"][0]
        dec_twin = 1 - twin_losses[-1] / twin_losses[0]
        assert dec_ours == pytest.approx(dec_twin, abs=0.05, rel=0.5), (
            dec_ours, dec_twin)


def _variogram_1d(field, region, max_lag):
    """Mean experimental semivariogram along both axes inside `region`."""
    gam = np.zeros(max_lag)
    for h in range(1, max_lag + 1):
        pairs = []
        m = region > 0
        a, b = field[:, :-h], field[:, h:]
        ok = m[:, :-h] & m[:, h:]
        pairs.append(((a - b)[ok]) ** 2)
        a, b = field[:-h, :], field[h:, :]
        ok = m[:-h, :] & m[h:, :]
        pairs.append(((a - b)[ok]) ** 2)
        gam[h - 1] = 0.5 * np.mean(np.concatenate(pairs))
    return gam


class TestPosteriorVariogram:
    """(c) — with a flat likelihood both samplers draw from the conditional
    prior: simulated fields must reproduce the configured variogram."""

    def test_variogram_reproduction_flat_likelihood(self):
        p = _small_problem()
        n_iter = 250
        # sigma_mc so large the likelihood is flat -> pure prior sampling
        chain, twin = _build_pair(p, sigma_mc=1e8)
        out = chain.run(n_iter=n_iter, seed=1)
        twin_bed, _, twin_steps = twin.run(p["initial_bed"], n_iter,
                                           p["xx"], p["yy"])
        assert out["steps"][1:].mean() > 0.9   # flat likelihood accepts ~all
        assert twin_steps[1:].mean() > 0.9

        # compare variograms of the TRANSFORMED residual fields (z-space,
        # where the variogram model is specified)
        nst, trend = twin.nst, twin.trend
        z_ours = nst.transform(
            (out["bed"] - trend).reshape(-1, 1)).reshape(p["xx"].shape)
        z_twin = nst.transform(
            (twin_bed - trend).reshape(-1, 1)).reshape(p["xx"].shape)
        max_lag = 6
        g_ours = _variogram_1d(z_ours, p["region"], max_lag)
        g_twin = _variogram_1d(z_twin, p["region"], max_lag)

        # model curve: gamma(h) = sill - cov(h)
        lags_m = np.arange(1, max_lag + 1) * p["resolution"]
        g_model = VARIO["sill"] - ref.cov_norm(
            "exponential", lags_m / VARIO["major_range"], VARIO["sill"],
            VARIO["nugget"])

        # twin and ours agree with each other within 35% at every lag
        assert np.all(np.abs(g_ours - g_twin) < 0.35 * np.maximum(g_twin, 0.1)), (
            g_ours, g_twin)
        # and both track the model curve within 50% (single-realization noise)
        assert np.all(np.abs(g_ours - g_model) < 0.5 * np.maximum(g_model, 0.1)), (
            g_ours, g_model)
        assert np.all(np.abs(g_twin - g_model) < 0.5 * np.maximum(g_model, 0.1)), (
            g_twin, g_model)


class TestGaussianVariogramRegimes:
    """Gaussian covariance splits into two regimes (found by randomized
    fuzz, NOTES_ROUND3.md).

    The reference's covariance convention puts ``sill - nugget`` on the
    kriging diagonal too (``covariance.py:8-10``: ``c = (sill-nugget)*
    exp(-3 h^2)`` with no h==0 nugget jump), so the nugget NEVER
    regularizes the system. For the infinitely-smooth Gaussian model at
    range >> grid spacing the OK matrix becomes numerically singular and
    the reference's lstsq weights explode: kriging ESTIMATES of a ~N(0,1)
    normal-score field reach |est| > 50, every proposal is absurd, and the
    chain freezes (acceptance -> 0). mcmc_tpu's packed conditioning solves
    ``(S_CC + eps I)`` (chain_sgs.py ~:435) and keeps sampling.

    Pinned here so the divergence is never "fixed" into matching the
    blowup: parity is asserted where the reference is well-conditioned,
    and in the ill-conditioned regime the twin's degeneration is asserted
    to be the estimate blowup (the reference's own pathology), while our
    chain must keep mixing.
    """

    def test_parity_holds_when_well_conditioned(self, monkeypatch):
        import tests.test_sgs_parity as mod
        monkeypatch.setattr(mod, "VARIO", {
            "azimuth": 0.0, "nugget": 0.1, "major_range": 1200.0,
            "minor_range": 1200.0, "sill": 1.0, "vtype": "Gaussian"})
        p = make_synthetic_problem(H=45, W=36, seed=5)
        n_iter = 200
        chain, twin = _build_pair(p, sigma_mc=5.6, radius=3834.0,
                                  neighbors=21, blocks=(6, 11))
        # the per-run loss-decay statistic has a wide seed spread (measured
        # 0.08-0.18 across 8 seeds on both RNG-stream variants of the draw),
        # so average the chain over 4 run seeds instead of trusting one
        # stream's luck — tightens the comparison rather than widening bands
        accs, decs = [], []
        for run_seed in (5, 6, 7, 8):
            out = chain.run(n_iter=n_iter, seed=run_seed)
            accs.append(out["steps"][1:].mean())
            decs.append(1 - out["loss"][-1] / out["loss"][0])
        _, twin_losses, twin_steps = twin.run(p["initial_bed"], n_iter,
                                              p["xx"], p["yy"])
        acc_ours = float(np.mean(accs))
        acc_twin = twin_steps[1:].mean()
        band = 3 * np.sqrt(max(acc_twin * (1 - acc_twin), 0.01) / n_iter) + 0.10
        assert abs(acc_ours - acc_twin) < band, (acc_ours, acc_twin)
        dec_ours = float(np.mean(decs))
        dec_twin = 1 - twin_losses[-1] / twin_losses[0]
        assert dec_ours == pytest.approx(dec_twin, abs=0.05, rel=0.5), (
            dec_ours, dec_twin)

    def test_reference_degenerates_ill_conditioned_we_keep_mixing(
            self, monkeypatch):
        import tests.test_sgs_parity as mod
        monkeypatch.setattr(mod, "VARIO", {
            "azimuth": 0.0, "nugget": 0.05, "major_range": 4060.0,
            "minor_range": 4060.0, "sill": 1.0, "vtype": "Gaussian"})
        p = make_synthetic_problem(H=45, W=36, seed=5)
        n_iter = 60
        chain, twin = _build_pair(p, sigma_mc=5.6, radius=3834.0,
                                  neighbors=21, blocks=(6, 11))

        # spy on the twin's OK solves to prove the mechanism: wild
        # kriging estimates of a ~N(0,1) normal-score field
        orig_ok = ref.ok_solve
        max_abs_est = [0.0]

        def spy_ok(*a, **k):
            est, var = orig_ok(*a, **k)
            max_abs_est[0] = max(max_abs_est[0], abs(float(est)))
            return est, var

        monkeypatch.setattr(ref, "ok_solve", spy_ok)
        _, twin_losses, twin_steps = twin.run(p["initial_bed"], n_iter,
                                              p["xx"], p["yy"])
        monkeypatch.setattr(ref, "ok_solve", orig_ok)

        # the reference's pathology: estimate blowup -> frozen chain
        assert max_abs_est[0] > 5.0, max_abs_est
        assert twin_steps[1:].mean() < 0.10, twin_steps[1:].mean()

        # ours: regularized conditioning keeps sampling productively
        out = chain.run(n_iter=n_iter, seed=5)
        acc = out["steps"][1:].mean()
        assert 0.10 < acc < 0.95, acc
        assert np.isfinite(out["bed"]).all()
        assert out["loss"][-1] < 0.7 * out["loss"][0], (
            out["loss"][0], out["loss"][-1])
