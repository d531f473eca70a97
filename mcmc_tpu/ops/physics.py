"""Ice-sheet physics kernels: mass-conservation residual and loss.

TPU-native equivalents of the reference operators
(reference: gstatsMCMC/Topography.py:592-612 and MCMC.py:1021-1044).

The residual is
    res = d/dx(velx * (surf - bed)) + d/dy(vely * (surf - bed)) + dhdt - smb
with numpy-gradient finite differences (central in the interior, one-sided at
array edges), axis=1 being x.

``window_residual`` evaluates the same operator on a statically-sized window;
the chain steps rely on the invariant that every cell whose value is consumed
is either interior to the window (central difference, identical to the global
operator) or lies on a true domain edge that coincides with the window edge
(one-sided difference, also identical).
"""

from __future__ import annotations

import jax.numpy as jnp


def mass_conservation_residual(bed, surf, velx, vely, dhdt, smb, resolution):
    """Full-grid mass-conservation residual (reference Topography.py:592-600)."""
    thick = surf - bed
    fx = velx * thick
    fy = vely * thick
    dx = jnp.gradient(fx, resolution, axis=1)
    dy = jnp.gradient(fy, resolution, axis=0)
    return dx + dy + dhdt - smb


# the windowed form is the same operator; alias kept for call-site clarity
window_residual = mass_conservation_residual


def masked_gaussian_loss(res, mask, sigma):
    """Gaussian negative log-likelihood of residuals inside a mask.

    Matches chain.loss (reference MCMC.py:1021-1044):
        loss_mc = nansum(res[mask]**2) / (2*sigma**2)
    NaN residuals (from NaN observations) contribute zero, like np.nansum.
    """
    sq = jnp.square(res)
    sq = jnp.where(jnp.isnan(sq), 0.0, sq)
    return jnp.sum(jnp.where(mask, sq, 0.0)) / (2.0 * sigma**2)


def masked_sq_sum(res, mask):
    """nansum of squared residuals inside mask (no sigma scaling)."""
    sq = jnp.square(res)
    sq = jnp.where(jnp.isnan(sq), 0.0, sq)
    return jnp.sum(jnp.where(mask, sq, 0.0))


def thickness_violations(bed, surf, mask):
    """Count cells where ice thickness <= 0 inside mask.

    Used for the hard constraint bed < surface (reference MCMC.py:1320-1329).
    """
    viol = (surf - bed) <= 0.0
    return jnp.sum(jnp.where(mask, viol, False))
