"""gstools-SRF-equivalent random fields via the randomization method.

The reference's non-spectral generation path builds a gstools covariance
model and draws ``SRF(model).structured([X, Y])`` (reference
gstatsMCMC/MCMC.py:657-687).  gstools' backend is the *randomization
method* (Kraichnan): sample N wavevectors from the model's normalized
spectral measure and superpose random-phase harmonics,

    f(x) = sqrt(var / N) * sum_j  z1_j cos(k_j . x) + z2_j sin(k_j . x),

which is exact in distribution as N -> infinity.  This module implements
that method natively in JAX, with the 2-D spectral measures derived in
closed form for the three model families the reference uses — so sampling
is pure inverse-CDF transforms of uniforms (no rejection, no tables):

  Gaussian     rho(r) = exp(-3 r^2 / R^2)      k ~ Normal(0, 6/R^2 I)
  Exponential  rho(r) = exp(-3 r / R)          |k| = sqrt((1-u)^-2 - 1) * 3/R
  Matern(nu)   standard Matern with effective length l = R / (sqrt(2) c(nu))
               |k| = sqrt(2 nu ((1-u)^{-1/nu} - 1)) / l

The length-scale conventions match the reference's model construction
(MCMC.py:658-674: Gaussian range/sqrt(3), Exponential range/3, Matern
range/2 — all folded into the correlations above) and the Matern form
absorbs the reference's fitted-scale quirk c(nu) = 0.4525 exp(-0.7045 nu)
+ 1.7864 (gstatsim_custom/covariance.py:19-22): its covariance
2/Gamma(nu) (c h sqrt(nu))^nu K_nu(2 c h sqrt(nu)) is the standard Matern
with t = sqrt(2 nu) r / l at l = R / (sqrt(2) c).  The field therefore
reproduces ops/covariance.covariance_norm for the same range — tested in
tests/test_srf.py against the model correlograms.

Unlike the spectral-synthesis path, realizations are NOT standardized:
their variance is random around var (gstools behavior; the reference's
spectral path standardizes, its SRF path does not — SURVEY.md §8.11).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .covariance import matern_scale_fit


def sample_wavevectors(key, n_modes: int, model_name: str, range_x, range_y,
                       smoothness=None, angle=0.0):
    """Sample ``n_modes`` wavevectors from the model's 2-D spectral measure.

    range_x / range_y are the reference's variogram ranges (meters); for
    anisotropic models the unit-range isotropic sample is scaled per axis
    and rotated by ``angle`` (radians), matching gstools' ``angles=``.
    Returns (2, n_modes) float32.
    """
    k_r, k_a = jax.random.split(key)
    u = jax.random.uniform(k_r, (n_modes,), minval=0.0, maxval=1.0)
    theta = jax.random.uniform(k_a, (n_modes,), minval=0.0,
                               maxval=2.0 * jnp.pi)

    if model_name == "Gaussian":
        # rho(r) = exp(-3 r^2) at unit range -> k ~ N(0, 6 I):
        # E exp(i k.r) = exp(-sigma^2 r^2 / 2) with sigma^2 = 6
        kappa = jnp.sqrt(6.0) * jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u, 1e-12)))
        # Box-Muller radius of a 2-D standard normal is sqrt(-2 ln u); the
        # uniform angle below completes the isotropic Gaussian sample
    elif model_name == "Exponential":
        # rho(r) = exp(-r/l), l = 1/3: S(k) ~ (1 + (l k)^2)^{-3/2}
        # radial CDF F = 1 - (1 + (l k)^2)^{-1/2}
        lam = 1.0 / 3.0
        kappa = jnp.sqrt(jnp.maximum((1.0 - u) ** -2 - 1.0, 0.0)) / lam
    elif model_name == "Matern":
        nu = float(smoothness if smoothness is not None else 1.0)
        c = float(matern_scale_fit(nu))
        lam = 1.0 / (np.sqrt(2.0) * c)
        # S(k) ~ (1 + l^2 k^2 / (2 nu))^{-(nu+1)}; F = 1 - (1+.)^{-nu}
        kappa = jnp.sqrt(2.0 * nu * jnp.maximum(
            (1.0 - u) ** (-1.0 / nu) - 1.0, 0.0)) / lam
    else:
        raise ValueError(f"unknown model {model_name!r}")

    k_unit = jnp.stack([kappa * jnp.cos(theta), kappa * jnp.sin(theta)])
    # per-axis range scaling then rotation (gstools angles convention)
    scaled = jnp.stack([k_unit[0] / range_x, k_unit[1] / range_y])
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    rot = jnp.asarray([[ca, -sa], [sa, ca]], scaled.dtype)
    return (rot @ scaled).astype(jnp.float32)


def srf_field(key, shape, resolution, model_name: str, range_x, range_y,
              smoothness=None, angle=0.0, n_modes: int = 1000):
    """One unit-variance random field on a (ny, nx) grid.

    Same construction as the reference's gstools ``SRF(model).structured``
    draw with var=1 (MCMC.py:679-682; randomization method, gstools'
    default mode_no is 1000), but with the spectral measures derived from
    the REFERENCE'S OWN covariance conventions (covariance.py:4-22:
    exp(-3h), exp(-3h^2), matérn scale fit) so generated fields match the
    covariances the kriging solvers use (tests/test_srf.py validates
    variance/correlogram/anisotropy against ops.covariance).  gstools'
    models carry their own rescale constants (e.g. Gaussian uses the
    integral scale, rescale sqrt(pi)/2), so for the Gaussian model the
    reference's gstools draw has a correlation length ~2/sqrt(pi) = 1.13x
    this one at the same nominal range — an inconsistency *within the
    reference* (its SRF fields vs its kriging covariance) that this port
    resolves in favor of the covariance module.
    NOT standardized; multiply by the sampled scale like the reference.
    """
    ny, nx = shape
    k_vec, k_z1, k_z2 = jax.random.split(key, 3)
    kv = sample_wavevectors(k_vec, n_modes, model_name, range_x, range_y,
                            smoothness, angle)
    z1 = jax.random.normal(k_z1, (n_modes,))
    z2 = jax.random.normal(k_z2, (n_modes,))

    x = jnp.arange(nx, dtype=jnp.float32) * resolution
    y = jnp.arange(ny, dtype=jnp.float32) * resolution
    # phases (ny, nx, n_modes) built from separable outer products to keep
    # the big intermediate a single fused expression
    phase = (y[:, None, None] * kv[1][None, None, :]
             + x[None, :, None] * kv[0][None, None, :])
    hi = jax.lax.Precision.HIGHEST
    f = (jnp.tensordot(jnp.cos(phase), z1, axes=1, precision=hi)
         + jnp.tensordot(jnp.sin(phase), z2, axes=1, precision=hi))
    return f * jnp.sqrt(1.0 / n_modes)
