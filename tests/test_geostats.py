"""Geostats layer: SGS simulation, kriging maps, variogram fitting, RandField."""

import numpy as np
import pytest

from mcmc_tpu.geostats import (
    dists_to_cond,
    experimental_variogram,
    fit_model,
    fit_variogram,
    gaussian_transformation,
    krige,
    sgs,
    variograms,
)
from mcmc_tpu.models import RandField

VARIO = dict(azimuth=0.0, nugget=0.0, major_range=4e3, minor_range=4e3,
             sill=1.0, vtype="Exponential")


def sparse_grid(H=40, W=40, res=500.0, frac=0.08, seed=0):
    rng = np.random.default_rng(seed)
    xx, yy = np.meshgrid(np.arange(W) * res, np.arange(H) * res)
    field = 100 * np.sin(2 * np.pi * xx / (W * res)) + rng.normal(0, 5, (H, W))
    mask = rng.random((H, W)) < frac
    grid = np.where(mask, field, np.nan)
    return xx, yy, grid, field


class TestSGSandKrige:
    def test_sgs_interpolates_and_honors_data(self):
        xx, yy, grid, field = sparse_grid()
        sim = sgs(xx, yy, grid, VARIO, radius=10e3, num_points=16, seed=1,
                  chunk=64, half_window=12)
        assert np.isfinite(sim).all()
        m = ~np.isnan(grid)
        # conditioning data preserved (up to transform clamp)
        np.testing.assert_allclose(sim[m], grid[m], atol=1.0)
        # simulated cells fall in a sane range
        assert sim.std() < 3 * field.std()

    def test_sgs_bounds_respected(self):
        xx, yy, grid, field = sparse_grid()
        upper = np.full(grid.shape, 60.0)
        lower = np.full(grid.shape, -160.0)
        sim = sgs(xx, yy, grid, VARIO, radius=10e3, num_points=16, seed=2,
                  chunk=64, half_window=12, bounds=(lower, upper))
        sim_cells = np.isnan(grid)
        assert (sim[sim_cells] <= 60.0 + 1e-3).all()
        assert (sim[sim_cells] >= -160.0 - 1e-3).all()

    def test_krige_maps(self):
        xx, yy, grid, field = sparse_grid()
        mean, std = krige(xx, yy, grid, VARIO, radius=10e3, num_points=16,
                          chunk=128, half_window=12)
        assert np.isfinite(mean).all()
        m = ~np.isnan(grid)
        np.testing.assert_allclose(mean[m], grid[m], atol=1.0)
        # kriging mean is smoother than an SGS draw
        sim = sgs(xx, yy, grid, VARIO, radius=10e3, num_points=16, seed=3,
                  chunk=64, half_window=12)
        dmean = np.abs(np.diff(mean, axis=1)).mean()
        dsim = np.abs(np.diff(sim, axis=1)).mean()
        assert dmean < dsim

    def test_vario_validation(self):
        xx, yy, grid, _ = sparse_grid()
        with pytest.raises(ValueError):
            sgs(xx, yy, grid, {"vtype": "Exponential"})  # missing keys
        bad = dict(VARIO, vtype="cubic")
        with pytest.raises(ValueError):
            sgs(xx, yy, grid, bad)


class TestVariogramFitting:
    def test_fit_recovers_range(self, rng):
        # synthesize data with a known exponential variogram via our own
        # spectral generator, then fit
        import jax
        from mcmc_tpu.ops.spectral import spectral_field, standardize_masked
        import jax.numpy as jnp

        f = spectral_field(jax.random.key(0), (96, 96), 500.0, "Exponential",
                           8e3, 8e3, None)
        f = np.asarray(standardize_masked(f, jnp.ones((96, 96), bool)))
        xx, yy = np.meshgrid(np.arange(96) * 500.0, np.arange(96) * 500.0)
        sel = rng.random((96, 96)) < 0.2
        bins, gamma, _ = experimental_variogram(
            np.column_stack([xx[sel], yy[sel]]), f[sel], maxlag=15e3,
            n_lags=30, max_points=1500)
        r, sill, nug = fit_model(bins, gamma, "exponential")
        assert 0.3 < sill < 3.0
        assert 2e3 < r < 40e3  # right order of magnitude

    def test_variograms_and_transformation(self):
        xx, yy, grid, _ = sparse_grid()
        out, gamma, bins = variograms(xx, yy, grid, maxlag=10e3, n_lags=20)
        assert set(out) == {"gaussian", "spherical", "exponential", "matern"}
        gn, nst = gaussian_transformation(grid)
        m = ~np.isnan(grid)
        assert abs(np.nanmean(gn[m])) < 0.1
        d = dists_to_cond(xx, yy, grid)
        assert (d[m] == 0).all() and d.max() > 0


class TestRandFieldWrapper:
    def test_full_surface(self):
        rf = RandField(3e3, 8e3, 3e3, 8e3, 20, 60, 0.0, "Gaussian", True,
                       rng_seed=5)
        rf.set_block_sizes(8, 12, 8, 12, steps=2)
        rf.set_weight_param(2, 0, 6, 1, 5e3, 500.0)
        assert rf.get_block_sizes().shape == (2, 4)
        masks = rf.get_edge_masks()
        assert len(masks) == 4 and masks[0].min() >= -1e-6
        blk = rf.get_rfblock()
        assert np.isfinite(blk).all()
        fields = rf.get_random_field(np.arange(16) * 500.0,
                                     np.arange(16) * 500.0, n=2)
        assert fields.shape == (2, 16, 16)
        # both generation methods supported (SRF path: tests/test_srf.py)
        rf.set_generation_method(False)
        assert rf.config.spectral is False
        rf.set_generation_method(True)
        assert rf.config.spectral is True


def test_sgs_small_grid_default_window():
    """Grids smaller than the default half_window's 81x81 window must
    work (round-3 review: dynamic_slice raised on WN > grid dim); the
    window is clamped to the grid."""
    from mcmc_tpu.geostats.sgs import krige, sgs

    rng = np.random.default_rng(3)
    H = W = 40
    res = 500.0
    xx, yy = np.meshgrid(np.arange(W) * res, np.arange(H) * res)
    grid = np.full((H, W), np.nan)
    ij = rng.integers(0, H, (60, 2))
    grid[ij[:, 0], ij[:, 1]] = rng.normal(0, 50, 60)
    vario = dict(major_range=5e3, minor_range=5e3, azimuth=0.0, sill=1.0,
                 nugget=0.0, vtype="Exponential")
    out = sgs(xx, yy, grid, vario, radius=20e3, num_points=8, seed=1)
    assert out.shape == (H, W) and np.isfinite(out).all()
    m, s = krige(xx, yy, grid, vario, radius=20e3, num_points=8)
    assert np.isfinite(m).all() and np.isfinite(s).all()


class TestGenerateInitialBeds:
    """generate_initial_beds — the T2 per-seed initial-bed workflow
    (reference T2 cells 20-22, largeScaleChain_multiprocessing.py:602-606)."""

    def test_bounded_distinct_reproducible(self):
        from mcmc_tpu.geostats.sgs import generate_initial_beds

        xx, yy, grid, field = sparse_grid(H=28, W=28)
        surf = np.full(grid.shape, 40.0)
        beds = generate_initial_beds(xx, yy, grid, VARIO, surf=surf,
                                     n_beds=2, radius=10e3, num_points=16,
                                     seed=7, chunk=64, half_window=12)
        assert len(beds) == 2
        m = ~np.isnan(grid)
        for bed in beds:
            assert np.isfinite(bed).all()
            # bounded below the ice surface like the T2 workflow
            assert (bed[~m] <= 40.0 - 1.0 + 1e-3).all()
            np.testing.assert_allclose(bed[m], grid[m], atol=1.0)
        # per-seed beds differ; same seed reproduces bitwise
        assert not np.array_equal(beds[0], beds[1])
        again = generate_initial_beds(xx, yy, grid, VARIO, surf=surf,
                                      n_beds=1, radius=10e3, num_points=16,
                                      seed=7, chunk=64, half_window=12)
        np.testing.assert_array_equal(again[0], beds[0])
