"""Sequential Gaussian Simulation and kriging maps (batched, chunked).

TPU-native replacement for the reference's per-cell Python SGS loop
(reference: gstatsim_custom/interpolate.py:92-191 ``sgs``, :13-89 ``krige``,
and the two-phase multiprocessing variant parallel.py:14-179).

Design: the shuffled simulation path is processed in CHUNKS.  Each chunk's
cells get neighbors from a fixed local window via the octant search
(ops/neighbors.py), one masked kriging solve per cell — batched with vmap
(the reference solves one lstsq per cell serially; parallel.py's
pseudo-conditioning trick is subsumed) — and a Gaussian (or bounded
truncated-normal) draw.  Cells within one chunk are drawn conditionally on
everything before the chunk but independently of each other; with a shuffled
path, same-chunk cells are almost surely far apart relative to the variogram
range, so this matches the sequential scheme statistically (validated by
variogram-reproduction tests) while exposing chunk-level batch parallelism
the sequential algorithm cannot.

Neighbor search uses a fixed (2*w+1)^2 window instead of the reference's
radius-growth retry loop (interpolate.py:150-156); a cell with no in-window
conditioning falls back to an unconditional draw N(global_mean, sill) —
only possible for the earliest path cells on very sparse data.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ..ops.covariance import CovarianceSpec, make_rotation_matrix
from ..ops.kriging import ok_solve_masked, sk_solve_masked
from ..ops.neighbors import octant_neighbors_window
from ..ops.transforms import NormalScoreTransform
from ..utils.rng import as_key


def _vario_to_spec(variogram: dict) -> CovarianceSpec:
    vt = variogram["vtype"].lower()
    return CovarianceSpec(vt, s=variogram.get("s"))


def _check_vario(variogram):
    missing = [k for k in ("major_range", "minor_range", "azimuth", "sill",
                           "nugget", "vtype") if k not in variogram]
    if missing:
        raise ValueError(f"Variogram missing {', '.join(missing)}")
    if variogram["vtype"].lower() not in ("exponential", "gaussian",
                                          "spherical", "matern"):
        raise ValueError("vtype must be exponential, gaussian, spherical, or matern")
    if variogram["vtype"].lower() == "matern" and "s" not in variogram:
        raise ValueError("Matern covariance requires the s parameter in the variogram")


def _make_cell_kernel(spec, ktype, num_points, half_window):
    """Per-cell: gather window -> octant neighbors -> kriging -> (est, var)."""
    WN = 2 * half_window + 1

    def cell(grid, cond_msk, i, j, res, rot, sill, nugget, radius,
             global_mean):
        si = jnp.clip(i - half_window, 0, grid.shape[0] - WN)
        sj = jnp.clip(j - half_window, 0, grid.shape[1] - WN)
        gw = jax.lax.dynamic_slice(grid, (si, sj), (WN, WN))
        cw = jax.lax.dynamic_slice(cond_msk.astype(jnp.float32), (si, sj),
                                   (WN, WN)) > 0
        rows = (si + jnp.arange(WN)).astype(jnp.float32) * res
        cols = (sj + jnp.arange(WN)).astype(jnp.float32) * res
        win_xy = jnp.stack(
            [jnp.broadcast_to(cols[None, :], (WN, WN)),
             jnp.broadcast_to(rows[:, None], (WN, WN))], axis=-1)
        target = jnp.stack([j.astype(jnp.float32) * res,
                            i.astype(jnp.float32) * res])
        # exclude the target cell itself
        ti = jax.lax.broadcasted_iota(jnp.int32, (WN, WN), 0) + si
        tj = jax.lax.broadcasted_iota(jnp.int32, (WN, WN), 1) + sj
        valid = cw & ~((ti == i) & (tj == j))
        coords, vals, mask = octant_neighbors_window(
            target, win_xy, gw, valid, radius, num_points)
        mask_f = mask.astype(jnp.float32)
        n_valid = jnp.sum(mask_f)
        if ktype == "ok":
            est, var = ok_solve_masked(spec, target, coords, vals, mask_f,
                                       rot, sill, nugget)
        else:
            est, var = sk_solve_masked(spec, target, coords, vals, mask_f,
                                       rot, sill, nugget, global_mean)
        # no-neighbor fallback: unconditional draw from the prior
        est = jnp.where(n_valid > 0, est, global_mean)
        var = jnp.where(n_valid > 0, var, sill)
        return est, var

    return cell


def _prepare(xx, grid, variogram, sim_mask, num_points, ktype, half_window):
    """Shared sgs()/krige() preprocessing: normal-score setup, target-cell
    list, and the jitted per-chunk solve/scatter programs.

    The window is clamped to the grid (WN <= min(H, W)) so small grids
    work with the default half_window.  All per-chunk device work is
    jitted — eager jnp ops cost seconds each on the tunneled TPU backend
    (CLAUDE.md), and the chunk loop would otherwise issue thousands of
    them; the normal-score transforms run host-side (transform_np).
    """
    _check_vario(variogram)
    grid = np.asarray(grid, float)
    H, W = grid.shape
    res = float(abs(np.asarray(xx)[0, 1] - np.asarray(xx)[0, 0]))

    cond_msk = ~np.isnan(grid)
    data = grid[cond_msk]
    nst = NormalScoreTransform.fit(data, n_quantiles=min(500, data.size))
    z0 = np.where(cond_msk, np.nan_to_num(grid), 0.0)
    z0 = np.asarray(nst.transform_np(z0))
    z0 = np.where(cond_msk, z0, 0.0)
    global_mean = float(z0[cond_msk].mean())

    if sim_mask is None:
        sim_mask = np.ones((H, W), bool)
    cells = np.argwhere(np.asarray(sim_mask, bool) & ~cond_msk)

    hw = min(int(half_window), (min(H, W) - 1) // 2)
    spec = _vario_to_spec(variogram)
    rot = jnp.asarray(make_rotation_matrix(
        variogram["azimuth"], variogram["major_range"],
        variogram["minor_range"]), jnp.float32)
    cell = _make_cell_kernel(spec, ktype, int(num_points), hw)
    batch_cell = jax.jit(jax.vmap(cell, in_axes=(None, None, 0, 0, None,
                                                 None, None, None, None,
                                                 None)))

    @jax.jit
    def scatter(zg, cm, ii, jj, draws):
        return zg.at[ii, jj].set(draws), cm.at[ii, jj].set(True)

    return dict(grid=grid, H=H, W=W, res=res, cond_msk=cond_msk, nst=nst,
                z0=z0, global_mean=global_mean, cells=cells, rot=rot,
                batch_cell=batch_cell, scatter=scatter)


def sgs(xx, yy, grid, variogram, radius=100e3, num_points=20, ktype="ok",
        sim_mask=None, quiet=True, stencil=None, rcond=None, bounds=None,
        seed=None, chunk=64, half_window=40):
    """Full sequential Gaussian simulation (reference interpolate.py:92-191).

    grid: NaN except at conditioning data.  Applies the normal-score
    transform internally and inverse-transforms the result, including the
    bounded (truncated-normal) draw path used for initial-bed generation
    below the ice surface (interpolate.py:176-187).
    Returns the simulated 2D array in data units.
    """
    p = _prepare(xx, grid, variogram, sim_mask, num_points, ktype,
                 half_window)
    H, W, nst = p["H"], p["W"], p["nst"]

    key = as_key(seed)
    rng = np.random.default_rng(np.asarray(jax.random.key_data(key))[-1])
    order = rng.permutation(p["cells"].shape[0])
    path = p["cells"][order]

    # transformed bounds (lower, upper) grids, if any
    if bounds is not None:
        if len(bounds) != 2:
            raise ValueError("bounds must be an iterable of length 2 with "
                             "lower and upper bounds")
        tb = []
        for b in bounds:
            b = np.full((H, W), float(b)) if np.isscalar(b) else np.asarray(b, float)
            if b.shape != p["grid"].shape:
                raise ValueError("bounds must have same shape as grid")
            tb.append(np.asarray(nst.transform_np(b)))
        lo_b, hi_b = tb
    else:
        lo_b = hi_b = None

    batch_cell, scatter, rot = p["batch_cell"], p["scatter"], p["rot"]
    zg = jnp.asarray(p["z0"], jnp.float32)
    cm = jnp.asarray(p["cond_msk"])
    sill = jnp.float32(variogram["sill"])
    nug = jnp.float32(variogram["nugget"])
    radius_j = jnp.float32(radius)
    gm = jnp.float32(p["global_mean"])
    res_j = jnp.float32(p["res"])

    n = path.shape[0]
    for start in range(0, n, chunk):
        cells = path[start: start + chunk]
        ii = jnp.asarray(cells[:, 0], jnp.int32)
        jj = jnp.asarray(cells[:, 1], jnp.int32)
        est, var = batch_cell(zg, cm, ii, jj, res_j, rot, sill,
                              nug, radius_j, gm)
        est = np.asarray(est, float)
        sd = np.sqrt(np.abs(np.asarray(var, float)))
        if bounds is None:
            draws = rng.normal(est, np.maximum(sd, 1e-12))
        else:
            from scipy.stats import truncnorm

            lo = lo_b[cells[:, 0], cells[:, 1]]
            hi = hi_b[cells[:, 0], cells[:, 1]]
            eq = lo == hi
            sd_s = np.maximum(sd, 1e-12)
            # mask degenerate bounds BEFORE calling rvs: scipy raises on
            # a == b instead of returning the point mass
            a = np.where(eq, -1.0, (lo - est) / sd_s)
            b = np.where(eq, 1.0, (hi - est) / sd_s)
            draws = np.where(eq, lo, truncnorm.rvs(
                a, b, loc=est, scale=sd_s, random_state=rng))
        zg, cm = scatter(zg, cm, ii, jj, jnp.asarray(draws, jnp.float32))

    out = np.asarray(nst.inverse_np(np.asarray(zg)))
    return out.reshape(H, W)


def krige(xx, yy, grid, variogram, radius=100e3, num_points=20, ktype="ok",
          sim_mask=None, quiet=True, stencil=None, chunk=256,
          half_window=40):
    """Kriging mean/std maps (reference interpolate.py:13-89).

    Note the reference's own ``krige`` is broken (stale _preprocess call,
    SURVEY.md §8.3); this is the working equivalent.
    Returns (mean_map, std_map) in data units.
    """
    p = _prepare(xx, grid, variogram, sim_mask, num_points, ktype,
                 half_window)
    H, W, nst, cells = p["H"], p["W"], p["nst"], p["cells"]
    batch_cell, rot = p["batch_cell"], p["rot"]
    zg = jnp.asarray(p["z0"], jnp.float32)
    cm = jnp.asarray(p["cond_msk"])

    est_map = p["z0"].copy()
    var_map = np.zeros((H, W))
    for start in range(0, cells.shape[0], chunk):
        cc = cells[start: start + chunk]
        est, var = batch_cell(zg, cm, jnp.asarray(cc[:, 0], jnp.int32),
                              jnp.asarray(cc[:, 1], jnp.int32),
                              jnp.float32(p["res"]), rot,
                              jnp.float32(variogram["sill"]),
                              jnp.float32(variogram["nugget"]),
                              jnp.float32(radius),
                              jnp.float32(p["global_mean"]))
        est_map[cc[:, 0], cc[:, 1]] = np.asarray(est)
        var_map[cc[:, 0], cc[:, 1]] = np.asarray(var)

    var_map = np.where(var_map < 0, 0.0, var_map)
    mean_out = np.asarray(nst.inverse_np(est_map))
    std_out = np.asarray(nst.inverse_np(np.sqrt(var_map)))
    return mean_out.reshape(H, W), std_out.reshape(H, W)


def generate_initial_beds(xx, yy, cond_bed, variogram, surf=None, n_beds=1,
                          radius=50e3, num_points=32, seed=0, **kw):
    """Generate per-chain SGS initial beds, bounded below the ice surface
    (the T2 workflow: reference T2_StatisticalAnalysis.ipynb cells 20-22,
    consumed by largeScaleChain_multiprocessing.py:602-606)."""
    beds = []
    bounds = None
    if surf is not None:
        lo = np.full(np.shape(cond_bed), float(np.nanmin(cond_bed) - 2000.0))
        bounds = (lo, np.asarray(surf, float) - 1.0)
    for i in range(n_beds):
        beds.append(sgs(xx, yy, np.asarray(cond_bed, float), variogram,
                        radius=radius, num_points=num_points, bounds=bounds,
                        seed=seed + i, **kw))
    return beds
