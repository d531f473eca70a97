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

    # pytree flattening so the transform can live inside jitted closures
    def tree_flatten(self):
        return (self.quantiles, self.references), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


import jax.tree_util as _tu  # noqa: E402

_tu.register_pytree_node(
    NormalScoreTransform,
    NormalScoreTransform.tree_flatten,
    NormalScoreTransform.tree_unflatten,
)
