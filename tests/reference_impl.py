"""NumPy re-derivation of the reference algorithms (validation twin).

This module re-implements, from the algorithm descriptions in SURVEY.md and
first principles, the numerical behavior of the reference gstatsMCMC code:
covariance models, kriging solves, spectral synthesis, the mass-conservation
residual, and the chain_crf Metropolis-Hastings update (including the
incremental residual-patch semantics).  It is used to

  1. validate the TPU kernels value-for-value on injected inputs, and
  2. measure the CPU single-chain baseline that bench.py compares against
     (the reference publishes no numbers — BASELINE.md).

It deliberately mirrors reference quirks (spherical tail = sill-1, matérn
scale fit, residual patch that leaves the one-cell ring stale, exact
zero-mean/unit-variance field standardization).
"""

from __future__ import annotations

import math

import numpy as np
from scipy.special import gamma as _gamma, kv as _kv

# --- covariance models (reference gstatsim_custom/covariance.py) -------------


def exponential_cov_norm(h, sill, nugget):
    return (sill - nugget) * np.exp(-3.0 * np.asarray(h, float))


def gaussian_cov_norm(h, sill, nugget):
    return (sill - nugget) * np.exp(-3.0 * np.square(np.asarray(h, float)))


def spherical_cov_norm(h, sill, nugget):
    h = np.asarray(h, float)
    c = sill - nugget - 1.5 * h + 0.5 * h**3
    return np.where(h > 1.0, sill - 1.0, c)


def matern_cov_norm(h, sill, nugget, s):
    h = np.array(h, float, copy=True)
    scale = 0.45246434 * np.exp(-0.70449189 * s) + 1.7863836
    h[h == 0.0] = 1e-8
    with np.errstate(invalid="ignore", over="ignore"):
        c = (sill - nugget) * 2.0 / _gamma(s) * np.power(scale * h * np.sqrt(s), s) \
            * _kv(s, 2.0 * scale * h * np.sqrt(s))
    return np.where(np.isnan(c), sill - nugget, c)


def cov_norm(vtype, h, sill, nugget, s=None):
    vtype = vtype.lower()
    if vtype == "exponential":
        return exponential_cov_norm(h, sill, nugget)
    if vtype == "gaussian":
        return gaussian_cov_norm(h, sill, nugget)
    if vtype == "spherical":
        return spherical_cov_norm(h, sill, nugget)
    return matern_cov_norm(h, sill, nugget, s)


# --- kriging (reference gstatsim_custom/_krige.py) ----------------------------


def rotation_matrix(azimuth, major_range, minor_range):
    theta = azimuth / 180.0 * np.pi
    rot = np.array([[np.cos(theta), -np.sin(theta)],
                    [np.sin(theta), np.cos(theta)]])
    return rot @ np.array([[1.0 / major_range, 0.0], [0.0, 1.0 / minor_range]])


def sigma_matrix(vtype, coords, rot, sill, nugget, s=None):
    t = coords @ rot
    d = np.sqrt(((t[:, None, :] - t[None, :, :]) ** 2).sum(-1))
    return cov_norm(vtype, d, sill, nugget, s)


def rho_vector(vtype, coords, target, rot, sill, nugget, s=None):
    t = coords @ rot
    tt = np.asarray(target, float) @ rot
    d = np.sqrt(((t - tt[None, :]) ** 2).sum(-1))
    return cov_norm(vtype, d, sill, nugget, s)


def ok_solve(target_xy, nearest, vario):
    """Ordinary kriging on (n,3) neighbor rows [x, y, value]."""
    rot = rotation_matrix(vario["azimuth"], vario["major_range"], vario["minor_range"])
    xy = nearest[:, :2]
    vals = nearest[:, 2]
    n = xy.shape[0]
    A = np.zeros((n + 1, n + 1))
    A[:n, :n] = sigma_matrix(vario["vtype"], xy, rot, vario["sill"], vario["nugget"],
                             vario.get("s"))
    A[n, :n] = 1.0
    A[:n, n] = 1.0
    b = np.zeros(n + 1)
    b[:n] = rho_vector(vario["vtype"], xy, target_xy, rot, vario["sill"],
                       vario["nugget"], vario.get("s"))
    b[n] = 1.0
    w = np.linalg.lstsq(A, b, rcond=None)[0]
    var = vario["sill"] - np.sum(w[:n] * b[:n])
    mu = vals.mean()
    est = mu + np.sum(w[:n] * (vals - mu))
    return est, var


def sk_solve(target_xy, nearest, vario, global_mean):
    rot = rotation_matrix(vario["azimuth"], vario["major_range"], vario["minor_range"])
    xy = nearest[:, :2]
    vals = nearest[:, 2]
    A = sigma_matrix(vario["vtype"], xy, rot, vario["sill"], vario["nugget"],
                     vario.get("s"))
    b = rho_vector(vario["vtype"], xy, target_xy, rot, vario["sill"],
                   vario["nugget"], vario.get("s"))
    w = np.linalg.lstsq(A, b, rcond=None)[0]
    var = vario["sill"] - np.sum(w * b)
    est = global_mean + np.sum(w * (vals - global_mean))
    return est, var


# --- physics ------------------------------------------------------------------


def mass_conservation_residual(bed, surf, velx, vely, dhdt, smb, resolution):
    thick = surf - bed
    dx = np.gradient(velx * thick, resolution, axis=1)
    dy = np.gradient(vely * thick, resolution, axis=0)
    return dx + dy + dhdt - smb


def masked_gaussian_loss(res, mask, sigma):
    return np.nansum(np.square(res)[mask == 1]) / (2.0 * sigma**2)


# --- spectral synthesis (reference MCMC.py:176-254) ---------------------------


def spectral_density(model_name, k, range_x, range_y, smoothness):
    if model_name == "Gaussian":
        a = math.sqrt((range_x / math.sqrt(3)) * (range_y / math.sqrt(3)))
        return np.exp(-0.5 * np.square(a * k))
    if model_name == "Exponential":
        a = math.sqrt((range_x / 3.0) * (range_y / 3.0))
        return 1.0 / (1.0 + np.square(a * k)) ** 1.5
    nu = smoothness or 1.0
    a = math.sqrt((range_x / 2.0) * (range_y / 2.0))
    const = (4 * math.pi * math.gamma(nu + 1) * (2 * nu) ** nu) / (
        math.gamma(nu) * a ** (2 * nu))
    kappa = 2 * nu / a**2
    return const * (kappa + 4 * math.pi * np.square(k)) ** (-nu - 1)


def spectral_field(rng, shape, res, model_name, range_x, range_y, smoothness,
                   scale, nugget):
    ny, nx = shape
    kx = np.fft.fftfreq(nx, d=res) * 2 * np.pi
    ky = np.fft.fftfreq(ny, d=res) * 2 * np.pi
    kyv, kxv = np.meshgrid(ky, kx, indexing="ij")
    k = np.sqrt(kxv**2 + kyv**2) + 1e-10
    S = spectral_density(model_name, k, range_x, range_y, smoothness)
    noise = rng.normal(size=shape) + 1j * rng.normal(size=shape)
    field = np.fft.ifft2(noise * np.sqrt(S)).real
    field = (field - field.mean()) / (field.std() + 1e-12)
    return field * scale + rng.normal(0.0, np.sqrt(nugget), size=shape)


# --- chain_crf MH update (reference MCMC.py:1247-1366) ------------------------


def crf_mh_update(state, consts, f, h, w, cx, cy, u):
    """One MH update given an injected proposal.

    state: dict(bed, mc_res, loss_mc) — mutated copy returned.
    consts: dict(surf, velx, vely, dhdt, smb, update_mask, mc_mask,
                 crf_weight, sigma_mc, resolution).
    f: (B, B) canvas with the (h, w) block at top-left (already edge-masked).
    Returns (new_state, info dict).
    """
    bed = state["bed"]
    H, W = bed.shape
    bxmin = max(0, (2 * cx - h) // 2)
    bxmax = min(H, (2 * cx + h) // 2)
    bymin = max(0, (2 * cy - w) // 2)
    bymax = min(W, (2 * cy + w) // 2)
    off_x = (2 * cx - h) // 2
    off_y = (2 * cy - w) // 2

    bed_next = bed.copy()
    blk = f[bxmin - off_x:bxmax - off_x, bymin - off_y:bymax - off_y]
    pert = blk * consts["crf_weight"][bxmin:bxmax, bymin:bymax]
    bed_next[bxmin:bxmax, bymin:bymax] += pert
    bed_next = np.where(consts["update_mask"] > 0, bed_next, bed)

    # incremental local residual on pad-1 window, patch block cells only
    pad = 1
    c_xmin, c_xmax = max(0, bxmin - pad), min(H, bxmax + pad)
    c_ymin, c_ymax = max(0, bymin - pad), min(W, bymax + pad)
    local = mass_conservation_residual(
        bed_next[c_xmin:c_xmax, c_ymin:c_ymax],
        consts["surf"][c_xmin:c_xmax, c_ymin:c_ymax],
        consts["velx"][c_xmin:c_xmax, c_ymin:c_ymax],
        consts["vely"][c_xmin:c_xmax, c_ymin:c_ymax],
        consts["dhdt"][c_xmin:c_xmax, c_ymin:c_ymax],
        consts["smb"][c_xmin:c_xmax, c_ymin:c_ymax],
        consts["resolution"],
    )
    res_cand = state["mc_res"].copy()
    res_cand[bxmin:bxmax, bymin:bymax] = local[
        bxmin - c_xmin:bxmax - c_xmin, bymin - c_ymin:bymax - c_ymin]

    loss_next = masked_gaussian_loss(res_cand, consts["mc_mask"], consts["sigma_mc"])

    thick = consts["surf"][bxmin:bxmax, bymin:bymax] - bed_next[bxmin:bxmax, bymin:bymax]
    region_blk = consts["update_mask"][bxmin:bxmax, bymin:bymax]
    if np.sum((thick <= 0)[region_blk == 1]) > 0:
        loss_next = np.inf

    rate = 1.0 if state["loss_mc"] > loss_next else min(1.0, np.exp(state["loss_mc"] - loss_next))
    accept = u <= rate
    new = dict(state)
    if accept:
        new["bed"] = bed_next
        new["mc_res"] = res_cand
        new["loss_mc"] = loss_next
    return new, {"accept": accept, "loss_next": loss_next,
                 "block": (bxmin, bxmax, bymin, bymax)}


class ReferenceCRFChain:
    """Self-contained single-chain CPU baseline (full reference semantics).

    Used by bench.py to measure the CPU iterations/sec the TPU build is
    compared against, and by tests for statistical parity.
    """

    def __init__(self, consts, pairs, edge_masks, rf_params, seed=0):
        self.consts = consts
        self.pairs = pairs          # (2, n_sizes) int
        self.edge_masks = edge_masks  # list of (h, w) arrays
        self.rf = rf_params         # dict(model_name, isotropic, smoothness,
        #                                  scale_min/max, nugget_max, range bounds,
        #                                  resolution)
        self.rng = np.random.default_rng(seed)

    def draw_block(self):
        rng, rf = self.rng, self.rf
        i = rng.integers(0, self.pairs.shape[1])
        w, h = int(self.pairs[0, i]), int(self.pairs[1, i])
        scale = rng.uniform(rf["scale_min"], rf["scale_max"]) / 3.0
        nug = rng.uniform(0.0, rf["nugget_max"])
        rx = rng.uniform(rf["range_min_x"], rf["range_max_x"])
        ry = rx if rf["isotropic"] else rng.uniform(rf["range_min_y"], rf["range_max_y"])
        f = spectral_field(rng, (h, w), rf["resolution"], rf["model_name"],
                           rx, ry, rf.get("smoothness"), scale, nug)
        return f * self.edge_masks[i], h, w

    def run(self, initial_bed, n_iter, region_cells):
        c = self.consts
        state = {
            "bed": np.asarray(initial_bed, float).copy(),
            "mc_res": mass_conservation_residual(
                initial_bed, c["surf"], c["velx"], c["vely"], c["dhdt"], c["smb"],
                c["resolution"]),
        }
        state["loss_mc"] = masked_gaussian_loss(state["mc_res"], c["mc_mask"],
                                                c["sigma_mc"])
        losses = np.zeros(n_iter)
        steps = np.zeros(n_iter, bool)
        losses[0] = state["loss_mc"]
        B = int(self.pairs.max())
        for i in range(1, n_iter):
            fb, h, w = self.draw_block()
            canvas = np.zeros((B, B))
            canvas[:h, :w] = fb
            cidx = self.rng.integers(0, region_cells.shape[0])
            cx, cy = int(region_cells[cidx, 0]), int(region_cells[cidx, 1])
            u = self.rng.random()
            state, info = crf_mh_update(state, c, canvas, h, w, cx, cy, u)
            losses[i] = state["loss_mc"]
            steps[i] = info["accept"]
        return state, losses, steps


# --- sequential SGS (reference MCMC.py:42-173 + gstatsim_custom) --------------


def octant_neighbors(i, j, xx, yy, grid, cond_msk, radius, num_points):
    """Octant nearest-neighbor search (reference gstatsim_custom/neighbors.py:4-64).

    Candidates within `radius` of cell (i, j) are binned into 8 half-open
    angular sectors (b/4*pi, (b+1)/4*pi]; the num_points//8 nearest per
    sector are kept.  Returns (n, 5) rows [x, y, value, i, j].  The stencil
    crop of the reference is reproduced as a square window of
    ceil(radius/dx) cells — purely a search-window bound, identical result.
    """
    ni, nj = grid.shape
    dx = abs(xx[0, 1] - xx[0, 0])
    hw = math.ceil(radius / dx)
    ilow, ihigh = max(0, i - hw), min(ni, i + hw + 1)
    jlow, jhigh = max(0, j - hw), min(nj, j + hw + 1)
    g = grid[ilow:ihigh, jlow:jhigh]
    x = xx[ilow:ihigh, jlow:jhigh]
    y = yy[ilow:ihigh, jlow:jhigh]
    cm = cond_msk[ilow:ihigh, jlow:jhigh]
    # window-local index grids (the reference builds the full-grid ii/jj
    # ONCE per sgs() call and slices per cell, MCMC.py:128; allocating
    # full-grid arrays per cell here would make this twin artificially
    # slow — it is the bench's CPU-baseline denominator)
    iw, jw = np.meshgrid(np.arange(ilow, ihigh), np.arange(jlow, jhigh),
                         indexing="ij")
    li, lj = i - ilow, j - jlow

    distances = np.sqrt((x[li, lj] - x) ** 2 + (y[li, lj] - y) ** 2)
    angles = np.arctan2(y[li, lj] - y, x[li, lj] - x)

    points = []
    for b in range(-4, 4, 1):
        msk = ((distances < radius) & (angles > b / 4 * np.pi)
               & (angles <= (b + 1) / 4 * np.pi) & cm)
        order = np.argsort(distances[msk])
        p = np.array([x[msk], y[msk], g[msk], iw[msk], jw[msk]]).T
        p = p[order, :][: num_points // 8, :]
        points.append(p)
    points = np.concatenate(points)
    return points[~np.isnan(points[:, 2]), :]


def sequential_sgs(xx, yy, grid, vario, radius=100e3, num_points=20,
                   ktype="ok", sim_mask=None, rng=None):
    """Sequential Gaussian Simulation, per-cell loop (reference MCMC.py:91-173).

    grid: NaN everywhere except conditioning data (within sim_mask); outside
    sim_mask finite values also condition.  Simulates masked NaN cells along
    a shuffled path: octant neighbor search (radius grows +100 km when
    empty), ok/sk kriging solve, draw N(est, sqrt(|var|)), then the cell
    conditions subsequent cells.  Returns the completed grid.
    """
    if rng is None:
        rng = np.random.default_rng()
    cond_msk = ~np.isnan(grid)
    out = grid.copy()
    if sim_mask is None:
        sim_mask = np.full(xx.shape, True)
    ii, jj = np.meshgrid(np.arange(xx.shape[0]), np.arange(xx.shape[1]),
                         indexing="ij")
    inds = np.array([ii[sim_mask].ravel(), jj[sim_mask].ravel()]).T
    global_mean = np.mean(out[cond_msk])
    rng.shuffle(inds)

    for k in range(inds.shape[0]):
        i, j = inds[k]
        if cond_msk[i, j]:
            continue
        rad = radius
        nearest = np.array([])
        while nearest.shape[0] == 0:
            nearest = octant_neighbors(i, j, xx, yy, out, cond_msk, rad,
                                       num_points)
            if nearest.shape[0] == 0:
                rad += 100e3
        if ktype == "ok":
            est, var = ok_solve((xx[i, j], yy[i, j]), nearest, vario)
        else:
            est, var = sk_solve((xx[i, j], yy[i, j]), nearest, vario,
                                global_mean)
        out[i, j] = rng.normal(est, np.sqrt(np.abs(var)), 1)[0]
        cond_msk[i, j] = True
    return out


class ReferenceSGSChain:
    """Single-chain CPU twin of the reference chain_sgs MH loop
    (reference MCMC.py:1599-1911): optional detrend + normal-score
    transform, block re-simulation via sequential_sgs seeded with the chain
    RNG, full-grid residual recompute, thickness guard over the grounded
    mask, likelihood-only MH accept.

    consts: dict(surf, velx, vely, dhdt, smb, region_mask, mc_mask,
                 grounded, cond_bed, sigma_mc, resolution).
    nst: object with transform/inverse_transform on (-1, 1) arrays (sklearn
    QuantileTransformer or equivalent), or None.
    trend: 2D array or None.
    """

    def __init__(self, consts, vario, block_bounds, num_neighbors, radius,
                 nst=None, trend=None, seed=0):
        self.c = consts
        self.vario = vario
        self.block_bounds = block_bounds  # (min_x, max_x, min_y, max_y)
        self.num_neighbors = num_neighbors
        self.radius = radius
        self.nst = nst
        self.trend = trend
        self.rng = np.random.default_rng(seed)

    def _transform(self, a):
        if self.nst is None:
            return a.copy()
        return self.nst.transform(a.reshape(-1, 1)).reshape(a.shape)

    def _inverse(self, a):
        if self.nst is None:
            return a.copy()
        return self.nst.inverse_transform(a.reshape(-1, 1)).reshape(a.shape)

    def run(self, initial_bed, n_iter, xx, yy):
        c, rng = self.c, self.rng
        trend = self.trend if self.trend is not None else 0.0
        bed_c = np.asarray(initial_bed, float) - trend
        cond_bed_c = np.asarray(c["cond_bed"], float) - trend
        z_cond_bed = self._transform(cond_bed_c)

        mc_res = mass_conservation_residual(bed_c + trend, c["surf"],
                                            c["velx"], c["vely"], c["dhdt"],
                                            c["smb"], c["resolution"])
        loss_prev = masked_gaussian_loss(mc_res, c["mc_mask"], c["sigma_mc"])
        H, W = bed_c.shape
        bmnx, bmxx, bmny, bmxy = self.block_bounds
        losses = np.zeros(n_iter)
        steps = np.zeros(n_iter, bool)
        losses[0] = loss_prev
        for it in range(1, n_iter):
            while True:
                ix = rng.integers(0, H, 1)[0]
                iy = rng.integers(0, W, 1)[0]
                if c["region_mask"][ix, iy] == 1:
                    break
            bsx = rng.integers(bmnx, bmxx, 1)[0]
            bsy = rng.integers(bmny, bmxy, 1)[0]
            bxmin = max(0, int(ix - bsx / 2))
            bxmax = min(H, int(ix + bsx / 2))
            bymin = max(0, int(iy - bsy / 2))
            bymax = min(W, int(iy + bsy / 2))

            bed_tosim = self._transform(bed_c)
            bed_tosim[bxmin:bxmax, bymin:bymax] = \
                z_cond_bed[bxmin:bxmax, bymin:bymax].copy()
            sim_mask = np.full((H, W), False)
            sim_mask[bxmin:bxmax, bymin:bymax] = True
            newsim = sequential_sgs(xx, yy, bed_tosim, self.vario,
                                    self.radius, self.num_neighbors,
                                    sim_mask=sim_mask, rng=rng)
            bed_next = self._inverse(newsim)

            mc_res = mass_conservation_residual(
                bed_next + trend, c["surf"], c["velx"], c["vely"], c["dhdt"],
                c["smb"], c["resolution"])
            loss_next = masked_gaussian_loss(mc_res, c["mc_mask"],
                                             c["sigma_mc"])
            thickness = c["surf"] - (bed_next + trend)
            if np.sum((thickness <= 0)[c["grounded"] == 1]) > 0:
                loss_next = np.inf

            rate = 1.0 if loss_prev > loss_next else min(
                1.0, np.exp(loss_prev - loss_next))
            if rng.random() <= rate:
                bed_c = bed_next
                loss_prev = loss_next
                steps[it] = True
            losses[it] = loss_prev
        return bed_c + trend, losses, steps
