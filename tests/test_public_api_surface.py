"""Direct unit coverage for small public utilities otherwise exercised only
indirectly (or not at all) through the chain/farm paths: covariance
cross_sigma, the logistic weight map, full-grid physics guards, RNG helpers,
RunConfig, and the closed-form variogram models (skgstat conventions,
reference MCMC.py:314-339)."""

import jax
import jax.numpy as jnp
import numpy as np

from mcmc_tpu.geostats.variogram import (
    exponential_model,
    gaussian_model,
    matern_model,
    spherical_model,
)
from mcmc_tpu.ops.covariance import (
    CovarianceSpec,
    cross_sigma,
    make_rho,
    make_rotation_matrix,
    make_sigma,
)
from mcmc_tpu.ops.logistic import crf_weight_from_dist, logistic_weight
from mcmc_tpu.ops.physics import masked_sq_sum, thickness_violations
from mcmc_tpu.utils.config import RunConfig
from mcmc_tpu.utils.rng import as_key, keys_from_seed_list, split_for_chains


def test_cross_sigma_matches_sigma_and_rho():
    spec = CovarianceSpec("exponential")
    rot = make_rotation_matrix(np.deg2rad(30.0), 2000.0, 700.0)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(-5e3, 5e3, (7, 2)))
    sill, nugget = 40.0, 2.0

    # (A, A) cross-covariance IS the data covariance matrix
    full = cross_sigma(spec, a, a, rot, sill, nugget)
    np.testing.assert_allclose(np.asarray(full),
                               np.asarray(make_sigma(spec, a, rot, sill,
                                                     nugget)), rtol=1e-6)
    # a single-point B reduces to the data->target covariance vector
    target = jnp.asarray([123.0, -456.0])
    col = cross_sigma(spec, a, target[None, :], rot, sill, nugget)[:, 0]
    np.testing.assert_allclose(np.asarray(col),
                               np.asarray(make_rho(spec, a, target, rot,
                                                   sill, nugget)), rtol=1e-6)


def test_logistic_weight_clamp_and_crf_shift():
    L, x0, k, offset, max_dist = 2.0, 0.0, 6.0, 1.0, 5e3
    dist = jnp.asarray([0.0, 1e3, 2.5e3, 5e3, 9e3])
    w = np.asarray(logistic_weight(dist, L, x0, k, offset, max_dist))
    # closed form on the rescaled (clamped) distance
    resc = np.minimum(np.asarray(dist) / max_dist, 1.0)
    np.testing.assert_allclose(w, L / (1 + np.exp(-k * (resc - x0))) - offset,
                               rtol=1e-6)
    # beyond max_dist clamps to the max_dist value
    assert w[-1] == w[-2]
    # the CRF weight is the same map shifted to zero minimum
    cw, _, logi = crf_weight_from_dist(dist, L, x0, k, offset, max_dist)
    np.testing.assert_allclose(np.asarray(cw), w - w.min(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(logi), w, rtol=1e-6)
    assert float(jnp.min(cw)) == 0.0


def test_thickness_violations_counts_masked_cells():
    surf = jnp.asarray([[10.0, 10.0, 10.0], [10.0, 10.0, 10.0]])
    bed = jnp.asarray([[0.0, 10.0, 11.0], [9.0, 12.0, 10.0]])
    mask = jnp.asarray([[True, True, True], [True, False, True]])
    # violations (thickness <= 0) inside mask: (0,1), (0,2), (1,2);
    # (1,1) violates but is masked out
    assert int(thickness_violations(bed, surf, mask)) == 3
    assert int(thickness_violations(bed, surf, jnp.zeros_like(mask))) == 0


def test_masked_sq_sum_ignores_nan_and_mask():
    res = jnp.asarray([[1.0, jnp.nan], [2.0, 3.0]])
    mask = jnp.asarray([[True, True], [True, False]])
    # 1^2 + (nan->0) + 2^2, the masked 3^2 excluded
    assert float(masked_sq_sum(res, mask)) == 5.0


def test_rng_helpers_deterministic_and_distinct():
    keys = split_for_chains(7, 5)
    keys2 = split_for_chains(7, 5)
    assert keys.shape[0] == 5
    data = np.asarray(jax.random.key_data(keys))
    np.testing.assert_array_equal(data, np.asarray(jax.random.key_data(keys2)))
    assert len({tuple(row) for row in data.reshape(5, -1)}) == 5

    seeds = [11, 42, 11]
    stacked = keys_from_seed_list(seeds)
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(stacked)),
        np.asarray(jax.random.key_data(jnp.stack([as_key(s) for s in seeds]))))


def test_run_config_production_defaults():
    cfg = RunConfig(n_iter=1000)
    # the production-driver settings chain.run() defaults to
    # (reference largeScaleChain_multiprocessing.py:188-195)
    assert cfg.only_save_last_bed is True
    assert cfg.info_per_iter == 1000
    assert cfg.bed_thinning == 0
    assert cfg.segment_size == 1000


def test_variogram_models_closed_form():
    r, sill, nug = 8e3, 3.0, 0.25
    h = np.asarray([0.0, r / 2, r, 2 * r])
    # h=0 -> nugget for all models
    for m in (gaussian_model, exponential_model, spherical_model):
        assert m(np.asarray([0.0]), r, sill, nug)[0] == nug
    # gaussian: a = r/2, gamma(a) = nugget + sill*(1 - e^-1)
    np.testing.assert_allclose(gaussian_model(np.asarray([r / 2]), r, sill,
                                              nug)[0],
                               nug + sill * (1 - np.exp(-1)), rtol=1e-12)
    # exponential: a = r/3
    np.testing.assert_allclose(exponential_model(np.asarray([r / 3]), r, sill,
                                                 nug)[0],
                               nug + sill * (1 - np.exp(-1)), rtol=1e-12)
    # spherical saturates at h >= r
    np.testing.assert_allclose(spherical_model(h[2:], r, sill, nug),
                               nug + sill, rtol=1e-12)
    # matern with s=1/2 reduces to an exponential with a = r/2
    hh = np.asarray([1e2, 5e2, 4e3, 1e4])
    np.testing.assert_allclose(
        matern_model(hh, r, sill, 0.5, nug),
        nug + sill * (1 - np.exp(-hh / (r / 2))), rtol=1e-9)
