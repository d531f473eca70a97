"""Unit tests for mcmc_tpu.ops against SciPy / the NumPy reference twin."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mcmc_tpu.ops import (
    CovarianceSpec,
    covariance_norm,
    make_rotation_matrix,
    make_rho,
    make_sigma,
    mass_conservation_residual,
    masked_gaussian_loss,
    min_dist_from_mask,
    NormalScoreTransform,
)
from mcmc_tpu.ops.logistic import make_edge_mask, crf_weight_from_dist
from mcmc_tpu.ops.spectral import spectral_density, spectral_field, standardize_masked

from tests import reference_impl as ref


class TestCovariance:
    @pytest.mark.parametrize("vtype", ["exponential", "gaussian", "spherical"])
    def test_closed_forms_match_reference(self, vtype):
        h = np.linspace(0, 2.5, 101)
        got = np.asarray(covariance_norm(CovarianceSpec(vtype), h, 1.3, 0.1))
        want = ref.cov_norm(vtype, h, 1.3, 0.1)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("s", [0.5, 1.0, 1.7, 2.5])
    def test_matern_table_matches_scipy(self, s):
        h = np.linspace(0, 6.0, 400)
        got = np.asarray(covariance_norm(CovarianceSpec("matern", s=s), h, 2.0, 0.2))
        want = ref.matern_cov_norm(h, 2.0, 0.2, s)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    @pytest.mark.parametrize("vtype,s", [("matern", 1.3), ("gaussian", None),
                                         ("exponential", None)])
    def test_mixture_fit_and_dyadic_eval(self, vtype, s):
        """fit_cov_mixture fits <= 1e-3 on the dyadic dictionary, and
        eval_mixture_static's squaring-chain evaluation equals the direct
        per-term exp to f32 roundoff (the repeated squaring of the
        smallest-rate exp amplifies ulps ~2x per doubling — bounded by the
        dyadic span, 2^12)."""
        from mcmc_tpu.ops.covariance import eval_mixture_static, fit_cov_mixture

        spec = CovarianceSpec(vtype, s=s) if s else CovarianceSpec(vtype)
        ag, bg, ae, be, err = fit_cov_mixture(spec, 1.0, 0.0, 3.43,
                                              target_err=1e-3)
        assert err <= 1e-3
        mix = (tuple(float(v) for v in ag), tuple(float(v) for v in bg),
               tuple(float(v) for v in ae), tuple(float(v) for v in be),
               (1.0, 0.0, 1.0))
        h2 = np.linspace(0.0, 3.43 ** 2, 257).astype(np.float32)
        got = np.asarray(eval_mixture_static(mix, jnp.asarray(h2)))
        want = sum(a * np.exp(-b * h2) for a, b in zip(mix[0], mix[1]))
        want = want + sum(a * np.exp(-b * np.sqrt(h2))
                          for a, b in zip(mix[2], mix[3]))
        np.testing.assert_allclose(got, np.asarray(want, np.float32),
                                   rtol=2e-4, atol=2e-6)
        # the fit itself tracks the true covariance curve
        h = np.sqrt(h2)
        c = np.asarray(covariance_norm(spec, h, 1.0, 0.0))
        assert float(np.abs(got - c).max()) <= 1.5e-3

    def test_mixture_nondyadic_fallback(self):
        """Hand-built non-dyadic rates use the direct per-term path."""
        from mcmc_tpu.ops.covariance import eval_mixture_static

        mix = ((0.5, 0.3), (0.01, 0.0021), (0.4,), (0.05,), (1.0, 0.0, 1.0))
        h2 = np.linspace(0.0, 9.0, 65).astype(np.float32)
        got = np.asarray(eval_mixture_static(mix, jnp.asarray(h2)))
        want = (0.5 * np.exp(-0.01 * h2) + 0.3 * np.exp(-0.0021 * h2)
                + 0.4 * np.exp(-0.05 * np.sqrt(h2)))
        np.testing.assert_allclose(got, np.asarray(want, np.float32),
                                   rtol=1e-5, atol=1e-7)

    def test_matern_zero_distance_limit(self):
        got = float(covariance_norm(CovarianceSpec("matern", s=1.5), 0.0, 2.0, 0.5))
        assert got == pytest.approx(1.5, rel=1e-3)

    def test_sigma_and_rho_match_reference(self, rng):
        coords = rng.uniform(0, 10_000, size=(12, 2))
        target = np.array([5000.0, 4000.0])
        vario = dict(azimuth=30.0, major_range=8000.0, minor_range=4000.0,
                     sill=1.2, nugget=0.1, vtype="gaussian")
        rot_j = np.asarray(make_rotation_matrix(vario["azimuth"],
                                                vario["major_range"],
                                                vario["minor_range"]))
        rot_n = ref.rotation_matrix(vario["azimuth"], vario["major_range"],
                                    vario["minor_range"])
        np.testing.assert_allclose(rot_j, rot_n, rtol=1e-3, atol=1e-9)  # f32 vs f64

        spec = CovarianceSpec("gaussian")
        sig = np.asarray(make_sigma(spec, coords, rot_j, vario["sill"], vario["nugget"]))
        sig_n = ref.sigma_matrix("gaussian", coords, rot_n, vario["sill"], vario["nugget"])
        np.testing.assert_allclose(sig, sig_n, rtol=1e-4, atol=1e-5)

        rho = np.asarray(make_rho(spec, coords, target, rot_j, vario["sill"], vario["nugget"]))
        rho_n = ref.rho_vector("gaussian", coords, target, rot_n, vario["sill"], vario["nugget"])
        np.testing.assert_allclose(rho, rho_n, rtol=1e-4, atol=1e-5)


class TestPhysics:
    def test_residual_matches_numpy_gradient(self, rng):
        H, W, res = 20, 24, 500.0
        a = {k: rng.normal(size=(H, W)) for k in "bed surf velx vely dhdt smb".split()}
        got = np.asarray(mass_conservation_residual(
            a["bed"], a["surf"], a["velx"], a["vely"], a["dhdt"], a["smb"], res))
        want = ref.mass_conservation_residual(
            a["bed"], a["surf"], a["velx"], a["vely"], a["dhdt"], a["smb"], res)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_loss_nan_semantics(self):
        res = np.array([[1.0, np.nan], [2.0, 3.0]])
        mask = np.array([[True, True], [True, False]])
        got = float(masked_gaussian_loss(res, mask, 2.0))
        assert got == pytest.approx((1 + 4) / 8.0)


class TestDistanceAndLogistic:
    def test_edt_vs_bruteforce(self, rng):
        H, W, res = 20, 30, 500.0
        xx, yy = np.meshgrid(np.arange(W) * res, np.arange(H) * res)
        mask = rng.random((H, W)) < 0.05
        mask[3, 7] = True
        got = min_dist_from_mask(xx, yy, mask)
        mx, my = xx[mask], yy[mask]
        want = np.sqrt((xx[..., None] - mx) ** 2 + (yy[..., None] - my) ** 2).min(-1)
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-6)

    def test_edge_mask_matches_brute_force(self):
        h, w, res = 12, 16, 500.0
        L, x0, k, offset, max_dist = 2.0, 0.0, 6.0, 1.0, 3000.0
        got = make_edge_mask(h, w, res, L, x0, k, offset, max_dist)
        # brute force distance to boundary-ring cells
        xxb, yyb = np.meshgrid(np.arange(w) * res, np.arange(h) * res)
        edge = np.zeros((h, w), bool)
        edge[0, :] = edge[-1, :] = edge[:, 0] = edge[:, -1] = True
        d = np.sqrt((xxb[..., None] - xxb[edge]) ** 2 +
                    (yyb[..., None] - yyb[edge]) ** 2).min(-1)
        dr = np.where(d > max_dist, 1.0, d / max_dist)
        want = L / (1 + np.exp(-k * (dr - x0))) - offset
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_crf_weight_zero_at_data(self):
        dist = np.array([[0.0, 1000.0], [5000.0, 10000.0]])
        w, _, _ = crf_weight_from_dist(dist, 2.0, 0.0, 6.0, 1.0, 5000.0)
        w = np.asarray(w)
        assert w[0, 0] == pytest.approx(0.0, abs=1e-6)
        assert np.all(np.diff(w.ravel()) >= -1e-6)  # monotone in distance


class TestSpectral:
    def test_density_matches_reference(self):
        k = np.abs(np.fft.fftfreq(64, d=500.0)) * 2 * np.pi + 1e-10
        for model, sm in [("Gaussian", None), ("Exponential", None), ("Matern", 1.3)]:
            got = np.asarray(spectral_density(model, jnp.asarray(k), 20e3, 30e3, sm))
            want = ref.spectral_density(model, k, 20e3, 30e3, sm)
            # f32 underflows the far spectral tail to 0; compare with an
            # absolute floor at f32 tiny
            np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-30)

    def test_standardize_masked(self, rng):
        f = jnp.asarray(rng.normal(2.0, 5.0, size=(32, 32)), jnp.float32)
        mask = np.zeros((32, 32), bool)
        mask[:20, :24] = True
        out = np.asarray(standardize_masked(f, jnp.asarray(mask)))
        sel = out[mask]
        assert abs(sel.mean()) < 1e-4
        assert sel.std() == pytest.approx(1.0, abs=1e-3)
        assert np.all(out[~mask] == 0)

    def test_field_statistics(self):
        # Realized variance after standardize+scale is deterministic scale^2
        key = jax.random.key(0)
        fields = jax.vmap(lambda k: spectral_field(k, (64, 64), 500.0, "Gaussian",
                                                   10e3, 10e3, None))(
            jax.random.split(key, 16))
        f = np.asarray(fields)
        assert f.shape == (16, 64, 64)
        assert np.all(np.isfinite(f))
        # fields are spatially correlated: neighbor correlation well above 0
        corr = np.mean([np.corrcoef(fi[:-1].ravel(), fi[1:].ravel())[0, 1]
                        for fi in f])
        assert corr > 0.5


class TestNormalScore:
    def test_round_trip_and_sklearn_parity(self, rng):
        data = np.concatenate([rng.normal(-200, 50, 2000),
                               rng.gamma(2.0, 100.0, 3000)])
        t = NormalScoreTransform.fit(data, n_quantiles=500)
        z = np.asarray(t.transform(data))
        back = np.asarray(t.inverse(z))
        np.testing.assert_allclose(back, np.clip(data, t.quantiles[0], t.quantiles[-1]),
                                   rtol=1e-4, atol=1e-3)

        sklearn = pytest.importorskip("sklearn.preprocessing")
        qt = sklearn.QuantileTransformer(n_quantiles=500,
                                         output_distribution="normal",
                                         subsample=None).fit(data.reshape(-1, 1))
        want = qt.transform(data.reshape(-1, 1)).ravel()
        np.testing.assert_allclose(z, want, rtol=1e-3, atol=2e-3)

        winv = qt.inverse_transform(z.reshape(-1, 1)).ravel()
        np.testing.assert_allclose(back, winv, rtol=1e-4, atol=1e-2)

    def test_nan_passthrough(self):
        t = NormalScoreTransform.fit(np.arange(100.0))
        out = np.asarray(t.transform(np.array([np.nan, 50.0])))
        assert np.isnan(out[0]) and np.isfinite(out[1])


class TestNormalScoreLUT:
    def test_lut_matches_exact_transform(self, rng):
        """The hot-path LUT approximates the exact transform to well below
        proposal noise across and beyond the fitted range."""
        from mcmc_tpu.ops.transforms import NormalScoreLUT, NormalScoreTransform

        data = rng.normal(50.0, 120.0, 20000) ** 1  # asymmetricize:
        data = np.where(data > 50, 50 + (data - 50) * 1.7, data)
        nst = NormalScoreTransform.fit(data, n_quantiles=1000)
        lut = NormalScoreLUT.from_transform(nst)

        # interior of the fitted range: tight (proposals live here)
        lo, hi = np.quantile(data, [0.005, 0.995])
        x = rng.uniform(lo, hi, 4000)
        z_exact = nst.transform_np(x)
        z_lut = np.asarray(lut.transform(x.astype(np.float32)))
        assert np.nanmax(np.abs(z_lut - z_exact)) < 5e-3
        # extreme tails: the exact transform is near-vertical between the
        # outermost quantiles (ndtri jump to the +-5.2 clip), so the uniform
        # LUT only bounds the error there — still monotone and saturating
        xt = rng.uniform(data.min() - 50, data.max() + 50, 4000)
        zt = np.asarray(lut.transform(xt.astype(np.float32)))
        assert np.nanmax(np.abs(zt - nst.transform_np(xt))) < 0.5
        order = np.argsort(xt)
        assert np.all(np.diff(zt[order]) > -1e-4)

        z = rng.uniform(-6.0, 6.0, 4000)
        x_exact = nst.inverse_np(z)
        x_lut = np.asarray(lut.inverse(z.astype(np.float32)))
        span = data.max() - data.min()
        assert np.nanmax(np.abs(x_lut - x_exact)) < 2e-3 * span

    def test_lut_nan_propagation_and_clipping(self, rng):
        from mcmc_tpu.ops.transforms import NormalScoreLUT, NormalScoreTransform

        nst = NormalScoreTransform.fit(rng.normal(size=5000), n_quantiles=500)
        lut = NormalScoreLUT.from_transform(nst)
        out = np.asarray(lut.transform(np.array([np.nan, -1e9, 1e9],
                                                np.float32)))
        assert np.isnan(out[0])
        # saturates like sklearn's clip at the fitted range
        assert out[1] == pytest.approx(float(nst.transform_np(-1e9)), abs=1e-2)
        assert out[2] == pytest.approx(float(nst.transform_np(1e9)), abs=1e-2)


class TestStencilsAndOctants:
    """Stencil builders + octant window search vs the reference conventions
    (gstatsim_custom/neighbors.py:4-116)."""

    def test_circle_stencil_geometry(self):
        from mcmc_tpu.ops.neighbors import make_circle_stencil

        x = np.arange(0, 10_000, 500.0)
        rad = 2200.0
        mask, xx, yy = make_circle_stencil(x, rad)
        ncells = int(np.ceil(rad / 500.0))        # reference neighbors.py:73
        assert mask.shape == (2 * ncells + 1, 2 * ncells + 1)
        # strict-< disc on the stencil's own coordinates (neighbors.py:80)
        np.testing.assert_array_equal(mask,
                                      np.hypot(xx, yy) < rad)
        assert mask[ncells, ncells]               # center inside
        assert not mask[0, 0]                     # corner outside
        np.testing.assert_array_equal(mask, mask[::-1, ::-1])  # symmetric

    def test_ellipse_stencil_axes_and_rotation(self):
        from mcmc_tpu.ops.neighbors import make_ellipse_stencil

        x = np.arange(0, 10_000, 500.0)
        maj, mnr = 3000.0, 1500.0
        m0, xx, yy = make_ellipse_stencil(x, maj, mnr, 0.0)
        c = m0.shape[0] // 2
        # axis-aligned at angle 0: full major axis along x, minor along y
        assert m0[c, 0] == 1 and m0[c, -1] == 1   # (±maj, 0) on the rim
        assert m0[0, c] == 0 and m0[-1, c] == 0   # (0, ±maj) outside
        # inclusive <= boundary (neighbors.py:116 convention)
        ell = (xx / maj) ** 2 + (yy / mnr) ** 2
        np.testing.assert_array_equal(m0, (ell <= 1).astype(int))
        # rotating 90 degrees swaps the axes
        m90, _, _ = make_ellipse_stencil(x, maj, mnr, 90.0)
        np.testing.assert_array_equal(m90, m0.T)

    def test_octant_window_matches_twin(self):
        from mcmc_tpu.ops.neighbors import octant_neighbors_window

        rng = np.random.default_rng(3)
        H = W = 20
        res = 500.0
        xs = np.arange(W) * res
        ys = np.arange(H) * res
        xx, yy = np.meshgrid(xs, ys)
        cond = rng.random((H, W)) < 0.4
        i, j = 10, 9
        cond[i, j] = False
        grid = np.where(cond, rng.normal(0, 1, (H, W)), np.nan)

        radius, num_points = 2200.0, 24   # 3 per octant, no lattice ties
        nb = ref.octant_neighbors(i, j, xx, yy, grid, cond, radius,
                                  num_points)

        win_xy = np.stack([xx, yy], axis=-1).astype(np.float32)
        coords, vals, mask = octant_neighbors_window(
            jnp.asarray([xx[i, j], yy[i, j]], jnp.float32),
            jnp.asarray(win_xy), jnp.asarray(np.nan_to_num(grid),
                                             jnp.float32),
            jnp.asarray(cond), jnp.float32(radius), num_points)
        coords = np.asarray(coords)[np.asarray(mask)]
        vals = np.asarray(vals)[np.asarray(mask)]

        got = sorted((round(float(cx)), round(float(cy)), round(float(v), 4))
                     for (cx, cy), v in zip(coords, vals))
        want = sorted((round(float(r[0])), round(float(r[1])),
                       round(float(r[2]), 4)) for r in nb)
        assert got == want
        assert len(got) >= 8  # dense enough that most octants contributed
