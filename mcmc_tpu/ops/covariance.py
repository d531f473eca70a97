"""Covariance models for kriging and conditional simulation.

TPU-native port of the normalized-distance covariance family used by the
reference kriging kernels (reference: gstatsMCMC/gstatsim_custom/covariance.py:4-29).
The exponential / gaussian / spherical models are closed-form and evaluated
directly on device.  The matérn model needs the modified Bessel function
``K_s`` which XLA does not provide, so it is tabulated once on the host with
SciPy and evaluated on device with ``jnp.interp`` — exact to interpolation
error on a 4096-point grid, and batched/vmappable.

Behavioral notes carried over from the reference (verified by tests against a
NumPy re-derivation):

- ``spherical``: for normalized distance > 1 the reference returns
  ``sill - 1`` (not ``sill - nugget``); we reproduce this exactly.
- ``matern``: the reference applies a fitted scale factor
  ``0.45246434*exp(-0.70449189*s) + 1.7863836``, clamps zero distances to
  1e-8, and maps NaNs (the h→0 limit) to ``sill - nugget``.  The table bakes
  all of this in.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax.numpy as jnp
import numpy as np

_MATERN_TABLE_POINTS = 4096
_MATERN_TABLE_HMAX = 8.0


def matern_scale_fit(s):
    """The reference's fitted matérn scale factor
    (gstatsim_custom/covariance.py:19-22)."""
    return 0.45246434 * np.exp(-0.70449189 * s) + 1.7863836


def make_matern_table(
    s: float,
    n_points: int = _MATERN_TABLE_POINTS,
    h_max: float = _MATERN_TABLE_HMAX,
) -> np.ndarray:
    """Tabulate the normalized matérn covariance c(h) for unit (sill-nugget).

    Matches the reference formula (covariance.py:17-22):
        scale = 0.45246434*exp(-0.70449189*s) + 1.7863836
        c(h)  = 2/Γ(s) * (scale*h*√s)^s * K_s(2*scale*h*√s),  c(0) = 1

    Returns a float32 array of shape (n_points,) sampled on
    ``h = linspace(0, h_max, n_points)``.
    """
    from scipy.special import gamma, kv

    h = np.linspace(0.0, h_max, n_points)
    hc = np.where(h == 0.0, 1e-8, h)
    scale = matern_scale_fit(s)
    with np.errstate(invalid="ignore", over="ignore"):
        c = 2.0 / gamma(s) * np.power(scale * hc * np.sqrt(s), s) * kv(s, 2.0 * scale * hc * np.sqrt(s))
    c = np.where(np.isnan(c), 1.0, c)  # h→0 limit is (sill-nugget)·1
    return c.astype(np.float32)


@dataclasses.dataclass(frozen=True)
class CovarianceSpec:
    """Static description of a covariance model.

    ``vtype`` is one of 'exponential', 'gaussian', 'spherical', 'matern'
    (case-insensitive; mirrors the `covmodels` registry of the reference).
    For matérn, ``matern_table`` holds the host-precomputed normalized table.
    """

    vtype: str
    s: float | None = None
    matern_table: np.ndarray | None = dataclasses.field(default=None, compare=False)

    def __post_init__(self):
        vt = self.vtype.lower()
        if vt not in ("exponential", "gaussian", "spherical", "matern"):
            raise ValueError(f"unknown covariance model {self.vtype!r}")
        object.__setattr__(self, "vtype", vt)
        if vt == "matern":
            if self.s is None:
                raise ValueError("matern covariance requires the smoothness parameter s")
            if self.matern_table is None:
                object.__setattr__(self, "matern_table", make_matern_table(self.s))


def covariance_norm(spec: CovarianceSpec, norm_range, sill, nugget):
    """Covariance at normalized distance(s). ``spec`` is static under jit."""
    h = jnp.asarray(norm_range)
    amp = sill - nugget
    if spec.vtype == "exponential":
        return amp * jnp.exp(-3.0 * h)
    if spec.vtype == "gaussian":
        return amp * jnp.exp(-3.0 * jnp.square(h))
    if spec.vtype == "spherical":
        c = amp - 1.5 * h + 0.5 * h**3
        # reference quirk: beyond the range the value is sill - 1, not sill - nugget
        return jnp.where(h > 1.0, sill - 1.0, c)
    # matern via table lookup
    table = jnp.asarray(spec.matern_table)
    xs = jnp.clip(h / _MATERN_TABLE_HMAX, 0.0, 1.0) * (table.shape[0] - 1)
    lo = jnp.floor(xs).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, table.shape[0] - 1)
    frac = xs - lo
    c01 = table[lo] * (1.0 - frac) + table[hi] * frac
    c01 = jnp.where(h >= _MATERN_TABLE_HMAX, 0.0, c01)
    return amp * c01


def make_rotation_matrix(azimuth, major_range, minor_range):
    """2x2 anisotropy matrix: rotate by azimuth then scale axes by 1/range.

    Port of _krige.make_rotation_matrix (reference _krige.py:83-103).
    """
    theta = (azimuth / 180.0) * jnp.pi
    rot = jnp.array(
        [[jnp.cos(theta), -jnp.sin(theta)], [jnp.sin(theta), jnp.cos(theta)]]
    )
    scale = jnp.array([[1.0 / major_range, 0.0], [0.0, 1.0 / minor_range]])
    return rot @ scale


def make_sigma(spec: CovarianceSpec, coords, rotation_matrix, sill, nugget):
    """Covariance matrix between data points (reference _krige.py:105-122).

    coords: (n, 2). Returns (n, n).
    """
    t = coords @ rotation_matrix
    d2 = jnp.sum(jnp.square(t[:, None, :] - t[None, :, :]), axis=-1)
    norm_range = jnp.sqrt(d2)
    return covariance_norm(spec, norm_range, sill, nugget)


def make_rho(spec: CovarianceSpec, coords, target_xy, rotation_matrix, sill, nugget):
    """Covariance vector between data points and a target cell
    (reference _krige.py:124-144). coords: (n, 2), target_xy: (2,). Returns (n,).
    """
    t1 = coords @ rotation_matrix
    t2 = jnp.asarray(target_xy) @ rotation_matrix
    norm_range = jnp.sqrt(jnp.sum(jnp.square(t1 - t2[None, :]), axis=-1))
    return covariance_norm(spec, norm_range, sill, nugget)


def cross_sigma(spec: CovarianceSpec, coords_a, coords_b, rotation_matrix, sill, nugget):
    """Cross-covariance matrix between two point sets: (na, nb)."""
    ta = coords_a @ rotation_matrix
    tb = coords_b @ rotation_matrix
    d2 = jnp.sum(jnp.square(ta[:, None, :] - tb[None, :, :]), axis=-1)
    return covariance_norm(spec, jnp.sqrt(d2), sill, nugget)


def fit_cov_mixture(spec: CovarianceSpec, sill, nugget, h_max: float,
                    n_grid: int = 2000, target_err: float = None):
    """Nonnegative gaussian+exponential mixture fit of the covariance curve.

    Approximates ``covariance_norm(spec, h, sill, nugget)`` on
    ``h in [0, h_max]`` by

        c(h) ~= sum_g a_g exp(-b_g h^2) + sum_e a_e exp(-b_e h)

    with all weights >= 0 (scipy NNLS over a fixed log-spaced decay-rate
    dictionary that includes the exact gaussian/exponential model rate 3.0).
    Both dictionary families are valid covariance functions in R^2, so any
    nonnegative combination is positive semi-definite — the fit can be used
    to evaluate covariance MATRICES analytically (pure exp/VPU math) in
    place of pairwise table gathers, which are pathologically slow on TPU
    (measured 2026-08-16: a vmapped (256, 48, 48) gather from a small stamp
    costs ~6.5 ms/step; the same values as ~25 fused exp ops cost ~0.2 ms).

    Returns ``(a_g, b_g, a_e, b_e, max_abs_err)`` with zero-weight terms
    pruned.  Callers should fall back to exact evaluation when
    ``max_abs_err`` is too large (the spherical model's range kink fits
    poorly; matern/gaussian/exponential fit to <= ~1e-3 * (sill-nugget)).

    ``target_err``: when given, the support is further pruned by greedy
    backward elimination — repeatedly refit without the one atom whose
    removal hurts least, while the max abs error stays <= target_err.
    Every retained term costs ~0.09 ms/step-batch of device exp time at
    the 512-chain bench shape (NOTES_ROUND5 §2c), so the fewest-term fit
    inside the caller's accept tolerance is the fastest correct one.
    """
    from scipy.optimize import nnls

    h = np.linspace(0.0, float(h_max), n_grid)
    c = np.asarray(
        covariance_norm(spec, h, float(sill), float(nugget)), np.float64)
    # DYADIC decay-rate dictionaries (b = 3·2^k): the same log-density as
    # the former logspace grids (ratio 2 vs 2.04) with the exact
    # gaussian/exponential model rate 3.0 at k=0, fitting every model to
    # the same error (probed 2026-08-21: matérn s=1.3 3.6e-4 vs 4.7e-4) —
    # and the whole family then evaluates from ONE exp via repeated
    # squaring (eval_mixture_static) instead of one exp per term, ~4x
    # less VPU transcendental work per S_CC evaluation
    bg = 3.0 * 2.0 ** np.arange(-6, 7)
    be = 3.0 * 2.0 ** np.arange(-5, 6)
    A = np.concatenate([np.exp(-np.outer(h ** 2, bg)),
                        np.exp(-np.outer(h, be))], axis=1)
    a, _ = nnls(A, c, maxiter=50 * A.shape[1])
    err = float(np.abs(A @ a - c).max())
    support = np.flatnonzero(a > 0)
    if target_err is not None and err <= target_err:
        while support.size > 1:
            best = None
            for drop in range(support.size):
                sub = np.delete(support, drop)
                a_sub, _ = nnls(A[:, sub], c, maxiter=50 * A.shape[1])
                e_sub = float(np.abs(A[:, sub] @ a_sub - c).max())
                if e_sub <= target_err and (best is None or e_sub < best[0]):
                    best = (e_sub, sub, a_sub)
            if best is None:
                break
            err, support, a_sub = best
            a = np.zeros_like(a)
            a[support] = a_sub
    a_g, a_e = a[: bg.size], a[bg.size:]
    gm, em = a_g > 0, a_e > 0
    return (a_g[gm].astype(np.float32), bg[gm].astype(np.float32),
            a_e[em].astype(np.float32), be[em].astype(np.float32), err)


def eval_mixture_static(mix, h2):
    """Evaluate the fitted mixture at squared distances ``h2`` with STATIC
    (Python float) coefficients:

        S = Σ ag·exp(-bg·h2) + Σ ae·exp(-be·√h2)

    ``mix`` is SGSStatic.mix: ((ag...), (bg...), (ae...), (be...), qcoef).
    When a family's rates form a dyadic chain b0·2^k (guaranteed by
    fit_cov_mixture's dictionary), the family costs ONE exp plus repeated
    squaring (E, E², E⁴, ...) instead of one exp per term — measured on
    the v5e-1 bench device the 7-term XLA exp chain was ~0.7 ms/step-batch
    of the SGS step (NOTES_ROUND5 §2b/§2c).  Non-dyadic rates (e.g.
    hand-built test mixtures) fall back to the direct per-term exp.

    Pure elementwise jnp — usable both in the XLA prepare stage and inside
    the Pallas lanes kernel (ops/cg_kernel._cg_lanes_mix_kernel).
    """
    import math

    ag, bg, ae, be = mix[0], mix[1], mix[2], mix[3]
    out = None
    for amps, rates, in_h in ((ag, bg, False), (ae, be, True)):
        if not amps:
            continue
        x = jnp.sqrt(h2) if in_h else h2
        b0 = min(rates)
        ks = [math.log2(b / b0) for b in rates]
        if all(abs(k - round(k)) < 1e-9 for k in ks):
            pairs = sorted(zip((int(round(k)) for k in ks), amps))
            E = jnp.exp(jnp.float32(-b0) * x)
            s = None
            k_cur = 0
            for k, a in pairs:
                while k_cur < k:
                    E = E * E
                    k_cur += 1
                term = jnp.float32(a) * E
                s = term if s is None else s + term
        else:
            s = None
            for a, b in zip(amps, rates):
                term = jnp.float32(a) * jnp.exp(jnp.float32(-b) * x)
                s = term if s is None else s + term
        out = s if out is None else out + s
    return out


# convenient partials mirroring the reference's `covmodels` registry
covmodels = {
    name: partial(covariance_norm, CovarianceSpec(name))
    for name in ("exponential", "gaussian", "spherical")
}
