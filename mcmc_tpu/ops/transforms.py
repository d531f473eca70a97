"""Normal-score (Gaussian quantile) transform.

The reference leans on sklearn's QuantileTransformer for normal-score
transforms (reference: gstatsim_custom/utilities.py:7-26, MCMC.py:1651-1659)
and re-transforms the FULL grid every chain iteration (MCMC.py:1766-1769).

This implementation fits quantile tables on the host (exactly sklearn's
fitting rule: quantiles at linspace(0,1,n_quantiles) percentiles) and applies
the transform on device with ``jnp.interp`` — jit/vmap-friendly so it can run
inside ``lax.scan`` and be applied to just the simulation window instead of
the full grid (the transform is elementwise).

Forward/inverse numerics mirror sklearn (two-sided interpolation, boundary
snapping, ppf clipping at 1e-7 tails); parity is tested directly against
sklearn in tests/test_transforms.py.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
from jax.scipy.special import ndtr, ndtri

_BOUNDS_THRESHOLD = 1e-7


@dataclasses.dataclass
class NormalScoreTransform:
    """Fitted Gaussian quantile transform (pytree-compatible arrays)."""

    quantiles: np.ndarray  # (n_q,), ascending
    references: np.ndarray  # (n_q,), linspace(0, 1, n_q)

    @classmethod
    def fit(cls, data, n_quantiles: int = 500, subsample=None, random_state=None):
        """Fit on 1D data (NaNs ignored), matching sklearn's fitting rule."""
        x = np.asarray(data, dtype=np.float64).ravel()
        x = x[~np.isnan(x)]
        if subsample is not None and x.size > subsample:
            rng = np.random.default_rng(random_state)
            idx = rng.choice(x.size, size=int(subsample), replace=False)
            x = x[idx]
        n_q = int(min(n_quantiles, x.size))
        references = np.linspace(0.0, 1.0, n_q, endpoint=True)
        quantiles = np.nanpercentile(x, references * 100.0)
        quantiles = np.maximum.accumulate(quantiles)  # enforce monotonicity
        return cls(quantiles=quantiles.astype(np.float64), references=references)

    # --- device-side application -------------------------------------------------

    def transform(self, x):
        """Data values -> standard-normal scores (elementwise, jit-safe)."""
        q = jnp.asarray(self.quantiles)
        r = jnp.asarray(self.references)
        xj = jnp.asarray(x)
        fwd = jnp.interp(xj, q, r)
        bwd = -jnp.interp(-xj, -q[::-1], -r[::-1])
        p = 0.5 * (fwd + bwd)
        p = jnp.where(xj == q[-1], 1.0, p)
        p = jnp.where(xj == q[0], 0.0, p)
        out = ndtri(p)
        clip_min = ndtri(_BOUNDS_THRESHOLD - np.spacing(1))
        clip_max = ndtri(1.0 - (_BOUNDS_THRESHOLD - np.spacing(1)))
        out = jnp.clip(out, clip_min, clip_max)
        return jnp.where(jnp.isnan(xj), jnp.nan, out)

    def inverse(self, z):
        """Standard-normal scores -> data values (elementwise, jit-safe)."""
        q = jnp.asarray(self.quantiles)
        r = jnp.asarray(self.references)
        zj = jnp.asarray(z)
        p = ndtr(zj)
        out = jnp.interp(p, r, q)
        out = jnp.where(p == 0.0, q[0], out)
        out = jnp.where(p == 1.0, q[-1], out)
        return jnp.where(jnp.isnan(zj), jnp.nan, out)

    # --- host-side (NumPy) twins: same numerics, no device dispatch ---------
    # (build-time uses these; eager jnp ops on a remote TPU backend cost
    # seconds each, and LUT construction needs thousands of evaluations)

    def transform_np(self, x):
        """Exact host (NumPy/SciPy) twin of ``transform``."""
        from scipy.special import ndtri as _ndtri

        q = np.asarray(self.quantiles, np.float64)
        r = np.asarray(self.references, np.float64)
        xj = np.asarray(x, np.float64)
        fwd = np.interp(xj, q, r)
        bwd = -np.interp(-xj, -q[::-1], -r[::-1])
        p = 0.5 * (fwd + bwd)
        p = np.where(xj == q[-1], 1.0, p)
        p = np.where(xj == q[0], 0.0, p)
        with np.errstate(invalid="ignore"):
            out = _ndtri(p)
        clip_min = _ndtri(_BOUNDS_THRESHOLD - np.spacing(1))
        clip_max = _ndtri(1.0 - (_BOUNDS_THRESHOLD - np.spacing(1)))
        out = np.clip(out, clip_min, clip_max)
        return np.where(np.isnan(xj), np.nan, out)

    def inverse_np(self, z):
        """Exact host (NumPy/SciPy) twin of ``inverse``."""
        from scipy.special import ndtr as _ndtr

        q = np.asarray(self.quantiles, np.float64)
        r = np.asarray(self.references, np.float64)
        zj = np.asarray(z, np.float64)
        p = _ndtr(zj)
        out = np.interp(p, r, q)
        out = np.where(p == 0.0, q[0], out)
        out = np.where(p == 1.0, q[-1], out)
        return np.where(np.isnan(zj), np.nan, out)

    # pytree flattening so the transform can live inside jitted closures
    def tree_flatten(self):
        return (self.quantiles, self.references), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@dataclasses.dataclass
class NormalScoreLUT:
    """Uniform-grid lookup tables of a fitted normal-score transform — the
    device HOT-PATH form.

    ``jnp.interp`` over the non-uniform quantile table lowers to a binary
    search: ~10 sequential gathers per call, measured at ~20 ms of a 24 ms
    SGS step-batch (2026-08-16, 64 chains).  Resampling the (piecewise-
    linear) transform onto a uniform grid makes each lookup pure index
    arithmetic plus ONE pair-gather.  The exact transform stays the host
    API (NormalScoreTransform); the LUT is an interpolation of it with
    resolution ``n`` (default 4096: grid spacing ~0.02% of the data range,
    far below proposal noise).
    """

    fwd_lo: jnp.ndarray      # scalar: first x knot
    fwd_scale: jnp.ndarray   # scalar: 1 / dx
    fwd_table: jnp.ndarray   # (n, 2) rows (z_i, z_{i+1})
    inv_lo: jnp.ndarray
    inv_scale: jnp.ndarray
    inv_table: jnp.ndarray   # (n, 2) rows (x_i, x_{i+1})

    @classmethod
    def from_transform(cls, nst: NormalScoreTransform, n: int = 4096):
        """Build uniform-grid LUTs (n knots) from a fitted transform."""
        q = np.asarray(nst.quantiles, np.float64)
        xg = np.linspace(q[0], q[-1], n)
        zg = nst.transform_np(xg)
        # inverse domain: the transform clips z to ~±5.2 (ppf at 1e-7 tails)
        # but conditional draws can exceed it; past the knots the inverse
        # saturates at the data range like sklearn's
        z_lo, z_hi = -6.5, 6.5
        zgi = np.linspace(z_lo, z_hi, n)
        xgi = nst.inverse_np(zgi)

        def pairs(t):
            t2 = np.stack([t, np.concatenate([t[1:], t[-1:]])], axis=1)
            return jnp.asarray(t2, jnp.float32)

        return cls(
            fwd_lo=jnp.float32(xg[0]),
            fwd_scale=jnp.float32((n - 1) / (xg[-1] - xg[0])),
            fwd_table=pairs(zg),
            inv_lo=jnp.float32(z_lo),
            inv_scale=jnp.float32((n - 1) / (z_hi - z_lo)),
            inv_table=pairs(xgi),
        )

    @staticmethod
    def _lookup(x, lo, scale, table):
        n = table.shape[0]
        t = jnp.clip((jnp.asarray(x) - lo) * scale, 0.0, n - 1.000001)
        i = jnp.floor(t).astype(jnp.int32)
        f = (t - i.astype(t.dtype))[..., None]
        pair = table[i]                       # one gather of (.., 2)
        y = pair[..., 0] * (1.0 - f[..., 0]) + pair[..., 1] * f[..., 0]
        return jnp.where(jnp.isnan(jnp.asarray(x)), jnp.nan, y)

    def transform(self, x):
        """Data values -> scores via the uniform-grid LUT (one pair-gather)."""
        return self._lookup(x, self.fwd_lo, self.fwd_scale, self.fwd_table)

    def inverse(self, z):
        """Scores -> data values via the uniform-grid LUT."""
        return self._lookup(z, self.inv_lo, self.inv_scale, self.inv_table)

    def tree_flatten(self):
        return (self.fwd_lo, self.fwd_scale, self.fwd_table,
                self.inv_lo, self.inv_scale, self.inv_table), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


import jax.tree_util as _tu  # noqa: E402

_tu.register_pytree_node(
    NormalScoreTransform,
    NormalScoreTransform.tree_flatten,
    NormalScoreTransform.tree_unflatten,
)
_tu.register_pytree_node(
    NormalScoreLUT,
    NormalScoreLUT.tree_flatten,
    NormalScoreLUT.tree_unflatten,
)
