"""SRF (randomization-method) generation path: statistical parity with the
covariance models the reference requests from gstools (MCMC.py:657-687)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcmc_tpu.ops.covariance import CovarianceSpec, covariance_norm
from mcmc_tpu.ops.srf import srf_field


def _ensemble_corr(model, rng_range, smoothness, n_fields=48, N=48, res=500.0):
    """Ensemble mean/variance and correlations at axis lags 1..L."""
    keys = jax.random.split(jax.random.key(7), n_fields)
    f = jax.vmap(lambda k: srf_field(k, (N, N), res, model, rng_range,
                                     rng_range, smoothness))(keys)
    f = np.asarray(f, np.float64)
    var = f.var()
    L = 8
    corr = np.zeros(L)
    for h in range(1, L + 1):
        num = np.mean(f[:, :, :-h] * f[:, :, h:]) + np.mean(
            f[:, :-h, :] * f[:, h:, :])
        corr[h - 1] = num / (2 * var)
    return var, corr


class TestSRFStatistics:
    @pytest.mark.parametrize("model,smoothness", [
        ("Gaussian", None), ("Exponential", None), ("Matern", 1.3)])
    def test_variance_and_correlogram_match_model(self, model, smoothness):
        R = 6e3
        var, corr = _ensemble_corr(model, R, smoothness)
        # unit-variance model; ensemble variance within ~10%
        assert var == pytest.approx(1.0, rel=0.12), var
        lags = np.arange(1, 9) * 500.0
        spec = CovarianceSpec(model.lower(), s=smoothness)
        want = np.asarray(covariance_norm(spec, jnp.asarray(lags / R), 1.0, 0.0))
        # correlation curve within 0.06 absolute at every lag
        assert np.all(np.abs(corr - want) < 0.06), (model, corr, want)

    def test_not_standardized_unlike_spectral(self):
        """Per-realization variance is random (gstools behavior), in contrast
        to the spectral path's exact scale^2 (SURVEY.md §8.11)."""
        keys = jax.random.split(jax.random.key(3), 24)
        f = np.asarray(jax.vmap(lambda k: srf_field(
            k, (32, 32), 500.0, "Gaussian", 8e3, 8e3, None))(keys))
        per_field_var = f.reshape(24, -1).var(axis=1)
        assert per_field_var.std() > 0.05  # genuinely random realization var

    def test_anisotropy_rotates_correlation(self):
        keys = jax.random.split(jax.random.key(5), 32)
        f = np.asarray(jax.vmap(lambda k: srf_field(
            k, (48, 48), 500.0, "Exponential", 12e3, 2e3, None, 0.0))(keys),
            np.float64)
        var = f.var()
        cx = np.mean(f[:, :, :-4] * f[:, :, 4:]) / var  # x-lag (major range)
        cy = np.mean(f[:, :-4, :] * f[:, 4:, :]) / var  # y-lag (minor range)
        assert cx > cy + 0.15, (cx, cy)


class TestSRFChainPath:
    def test_chain_runs_with_srf_proposals(self):
        from tests.conftest import make_synthetic_problem
        from tests.test_chain_crf import build_small_chain

        p = make_synthetic_problem(H=64, W=64)
        chain = build_small_chain(p, blocks=(8, 12))
        chain._rf_cfg = chain._rf_cfg.__class__(
            **{**chain._rf_cfg.__dict__, "spectral": False})
        out = chain.run(n_iter=200, seed=0)
        assert np.all(np.isfinite(out["loss"]))
        assert 0.01 < out["steps"][1:].mean() < 0.99
        # same seed, spectral=True differs (different generation method)
        chain2 = build_small_chain(p, blocks=(8, 12))
        out2 = chain2.run(n_iter=200, seed=0)
        assert not np.allclose(out["loss"], out2["loss"])

    def test_randfield_api_toggle(self):
        from mcmc_tpu.models.randfield import RandField

        rf = RandField(3e3, 8e3, 3e3, 8e3, 20, 60, 0.0, "Gaussian", True,
                       rng_seed=0)
        rf.set_generation_method(False)
        X = np.arange(32) * 500.0
        f = rf.get_random_field(X, X)
        assert f.shape == (32, 32) and np.isfinite(f).all()
        rf.set_generation_method(True)
        f2 = rf.get_random_field(X, X)
        assert f2.shape == (32, 32) and np.isfinite(f2).all()


def test_get_random_field_rejects_unequal_spacing():
    """Silently stretching Y correlation by using the X spacing on both
    axes would diverge from the reference's coordinate-true gstools path;
    unequal spacing must fail loudly."""
    import pytest

    from mcmc_tpu.models.randfield import RandField

    rf = RandField(3e3, 8e3, 3e3, 8e3, 20, 60, 0.0, "Gaussian", True,
                   rng_seed=0)
    X = np.arange(32) * 500.0
    Y = np.arange(32) * 1000.0
    with pytest.raises(ValueError, match="square cells"):
        rf.get_random_field(X, Y)
    # equal spacing still works
    f = rf.get_random_field(X, np.arange(24) * 500.0)
    assert f.shape == (24, 32) and np.isfinite(f).all()
