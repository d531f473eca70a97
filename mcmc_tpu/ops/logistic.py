"""Logistic distance-decay weighting for conditional random fields.

Port of the reference's conditioning-weight machinery
(reference: gstatsMCMC/MCMC.py:583-623 (edge masks), :689-740 (CRF weights)).

The logistic map is  f(x) = L / (1 + exp(-k*(x - x0))) - offset  applied to
distances rescaled so that ``max_dist`` maps to 1.  ``_rescaled_logistic``
is the single definition of that formula — every weight/mask path below
goes through it (with either the NumPy or jnp namespace), so a change to
the clamp or map semantics cannot leave the paths diverged.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _rescaled_logistic(dist, L, x0, k, offset, max_dist, xp):
    """dist -> (logistic(dist/max_dist clamped to 1), the rescaled dist)."""
    d = xp.asarray(dist)
    dist_rescale = xp.where(d > max_dist, 1.0, d / max_dist)
    return L / (1.0 + xp.exp(-k * (dist_rescale - x0))) - offset, dist_rescale


def logistic_weight(dist, L, x0, k, offset, max_dist):
    """Rescale distance by max_dist (clamped to 1) and apply the logistic map."""
    out, _ = _rescaled_logistic(dist, L, x0, k, offset, max_dist, jnp)
    return out


def crf_weight_from_dist(dist, L, x0, k, offset, max_dist):
    """CRF conditioning weight from a distance-to-data map.

    Matches RandField.get_crf_weight_from_dist (MCMC.py:716-740): the
    logistic output is shifted so its minimum is zero (weight 0 at data).
    Returns (weight, dist_rescale, dist_logi).
    """
    dist_logi, dist_rescale = _rescaled_logistic(dist, L, x0, k, offset,
                                                 max_dist, jnp)
    weight = dist_logi - jnp.min(dist_logi)
    return weight, dist_rescale, dist_logi


def make_edge_mask(height: int, width: int, resolution: float,
                   L: float, x0: float, k: float, offset: float,
                   max_dist: float) -> np.ndarray:
    """Logistic edge-decay mask for one block size (host-side precompute).

    Equivalent to RandField.get_edge_masks (MCMC.py:583-623) for a single
    (height, width) block: distance of each cell to the nearest boundary-ring
    cell, rescaled and mapped through the logistic function.  For a full
    rectangular boundary ring the nearest edge cell lies straight toward the
    nearest side, so the KD-tree query of the reference reduces to the exact
    closed form  dist = min(i, h-1-i, j, w-1-j) * resolution.
    """
    ii = np.arange(height)[:, None]
    jj = np.arange(width)[None, :]
    dist = np.minimum(
        np.minimum(ii, height - 1 - ii), np.minimum(jj, width - 1 - jj)
    ).astype(np.float64) * resolution
    mask, _ = _rescaled_logistic(dist, L, x0, k, offset, max_dist, np)
    return mask.astype(np.float32)
