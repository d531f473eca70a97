"""Octant nearest-neighbor search with static shapes.

TPU-native port of the reference octant search
(reference: gstatsim_custom/neighbors.py:4-64): candidate conditioning
points within a radius are binned into 8 angular sectors and the
``num_points // 8`` nearest per sector are kept.

The reference trims a stencil window, builds ragged per-octant lists, and
sorts with NumPy.  Here the search operates on a statically-shaped square
window centered (clamped at edges) on the target cell, bins sectors with the
reference's half-open interval convention ``b/4*pi < angle <= (b+1)/4*pi``,
and selects per-octant neighbors with ``lax.top_k`` — fixed output shape
(num_points, ) with a validity mask instead of ragged concatenation.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def make_circle_stencil(x, rad):
    """Boolean circle mask on the grid spacing of ``x``
    (reference neighbors.py:66-83). Host-side setup helper."""
    x = np.asarray(x)
    dx = abs(float(x[1] - x[0]))
    ncells = math.ceil(rad / dx)
    xs = np.linspace(-rad, rad, 2 * ncells + 1)
    xx, yy = np.meshgrid(xs, xs)
    return np.sqrt(xx**2 + yy**2) < rad, xx, yy


def make_ellipse_stencil(x, major_axis, minor_axis, angle_degrees):
    """Rotated ellipse mask (reference neighbors.py:85-116)."""
    x = np.asarray(x)
    angle_rad = (180.0 - angle_degrees) * np.pi / 180.0
    dx = abs(float(x[1] - x[0]))
    ncells = math.ceil(major_axis / dx)
    xs = np.linspace(-major_axis, major_axis, 2 * ncells + 1)
    xx, yy = np.meshgrid(xs, xs)
    xr = xx * np.cos(angle_rad) + yy * np.sin(angle_rad)
    yr = -xx * np.sin(angle_rad) + yy * np.cos(angle_rad)
    ell = (xr / major_axis) ** 2 + (yr / minor_axis) ** 2
    return np.where(ell <= 1, 1, 0), xx, yy


def octant_neighbors_window(target_xy, win_xy, win_values, win_valid,
                            radius, num_points: int):
    """Octant search over a statically-shaped window.

    target_xy: (2,) coordinates of the cell being estimated.
    win_xy: (S, S, 2) window coordinates; win_values: (S, S);
    win_valid: (S, S) bool (conditioning data present, inside stencil, not
    the target itself).
    Returns (coords (K, 2), values (K,), mask (K,) bool) with
    K = 8 * max(num_points // 8, 1) — the ``num_points // 8``-per-octant
    nearest, reference conventions (neighbors.py:4-64: 20 requested
    points yield 16 rows there too).  Deliberate deviation for
    num_points < 8: the reference keeps 0 neighbors per octant (every
    draw collapses to the unconditional prior); here 1 per octant is
    kept so tiny num_points still condition.
    """
    k_per = max(num_points // 8, 1)
    dx = target_xy[0] - win_xy[..., 0]
    dy = target_xy[1] - win_xy[..., 1]
    dist = jnp.sqrt(dx * dx + dy * dy)
    ang = jnp.arctan2(dy, dx)
    # sector b satisfies b/4*pi < ang <= (b+1)/4*pi  ->  b = ceil(4a/pi) - 1
    sector = jnp.clip(jnp.ceil(ang / (jnp.pi / 4.0)) - 1, -4, 3)

    valid = win_valid & (dist < radius)
    flat_dist = dist.ravel()
    flat_sector = sector.ravel()
    flat_valid = valid.ravel()
    flat_vals = win_values.ravel()
    flat_xy = win_xy.reshape(-1, 2)

    coords_out, vals_out, mask_out = [], [], []
    for b in range(-4, 4):
        in_oct = flat_valid & (flat_sector == b)
        key = jnp.where(in_oct, -flat_dist, -jnp.inf)
        top, idx = jax.lax.top_k(key, k_per)
        ok = jnp.isfinite(top)
        coords_out.append(jnp.where(ok[:, None], flat_xy[idx], 0.0))
        vals_out.append(jnp.where(ok, flat_vals[idx], 0.0))
        mask_out.append(ok)
    return (jnp.concatenate(coords_out, axis=0),
            jnp.concatenate(vals_out, axis=0),
            jnp.concatenate(mask_out, axis=0))
