"""On-device convergence diagnostics: split R-hat and effective sample size.

The reference has no convergence diagnostics — chains are compared by eye in
visualization.ipynb.  Two families here, both running on device so pod-scale
chain farms can monitor convergence without materializing traces on the host
(cross-device reductions ride XLA collectives when the chain axis is
sharded):

- classic split-R-hat / multi-chain ESS (Gelman et al., BDA3) —
  ``split_rhat`` / ``ess``;
- the rank-normalized variants of Vehtari et al. 2021 ("Rank-normalization,
  folding, and localization") — ``rank_normalized_rhat`` (max of the bulk
  and folded statistics), ``ess_bulk``, ``ess_tail`` — robust to heavy
  tails and nonstationary variance, and the recommended default.  Rank
  normalization uses tie-aware AVERAGE ranks (MH traces repeat values on
  every rejection, so ordinal ranks would be badly biased), computed
  branch-free with two searchsorted passes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def split_rhat(traces):
    """Split-R-hat over (n_chains, n_samples) or (n_chains, n_samples, P).

    Each chain is split in half, doubling the chain count; R-hat =
    sqrt((W*(n-1)/n + B/n) / W).
    """
    x = jnp.asarray(traces)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]
    n_chains, n_samples, P = x.shape
    half = n_samples // 2
    x = jnp.concatenate([x[:, :half], x[:, half: 2 * half]], axis=0)  # (2m, half, P)
    m, n = x.shape[0], x.shape[1]
    chain_means = jnp.mean(x, axis=1)                  # (2m, P)
    chain_vars = jnp.var(x, axis=1, ddof=1)            # (2m, P)
    grand_mean = jnp.mean(chain_means, axis=0)         # (P,)
    B = n * jnp.var(chain_means, axis=0, ddof=1)
    W = jnp.mean(chain_vars, axis=0)
    var_plus = (n - 1) / n * W + B / n
    out = jnp.sqrt(var_plus / W)
    return out[0] if squeeze else out


def _autocov_fft(x):
    """Autocovariance along the last axis via FFT (biased, like Stan)."""
    n = x.shape[-1]
    xc = x - jnp.mean(x, axis=-1, keepdims=True)
    nfft = 2 * n
    f = jnp.fft.rfft(xc, n=nfft, axis=-1)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=nfft, axis=-1)[..., :n].real
    return acov / n


def ess(traces):
    """Effective sample size over (n_chains, n_samples) or (..., P).

    Multi-chain ESS with Geyer initial monotone sequence approximated by
    truncating at the first negative paired autocorrelation sum (implemented
    branch-free with masks so it stays jittable).
    """
    x = jnp.asarray(traces)
    if x.ndim == 2:
        x = x[..., None]
    x = jnp.moveaxis(x, -1, 0)  # (P, n_chains, n)
    P, m, n = x.shape
    if m == 1:
        # single chain: split it in half (same trick as split_rhat) so
        # the between-chain variance term is defined — ddof=1 over one
        # chain mean would otherwise make every ESS NaN
        half = n // 2
        x = jnp.concatenate([x[:, :, :half], x[:, :, half:2 * half]],
                            axis=1)
        P, m, n = x.shape

    acov = _autocov_fft(x)                       # (P, m, n)
    chain_var = acov[..., 0] * n / (n - 1.0)     # (P, m)
    mean_var = jnp.mean(chain_var, axis=-1)      # (P,)
    var_plus = mean_var * (n - 1.0) / n + jnp.var(
        jnp.mean(x, axis=-1), axis=-1, ddof=1)

    rho = 1.0 - (mean_var[:, None] - jnp.mean(acov, axis=1)) / var_plus[:, None]
    # paired sums rho[2t] + rho[2t+1]
    even = rho[:, 0:n - 1:2]
    odd = rho[:, 1:n:2]
    k = min(even.shape[1], odd.shape[1])
    paired = even[:, :k] + odd[:, :k]
    # truncate at first negative paired sum (branch-free prefix mask)
    pos = paired > 0.0
    keep = jnp.cumprod(pos.astype(jnp.float32), axis=1)
    tau = -1.0 + 2.0 * jnp.sum(paired * keep, axis=1)
    tau = jnp.maximum(tau, 1.0 / jnp.log10(jnp.float32(n + 9.0)))
    out = m * n / tau
    return out.squeeze()


def acceptance_rate(steps):
    """Mean acceptance over the trailing axis of a (chains, n_iter) step trace."""
    return jnp.mean(jnp.asarray(steps, jnp.float32), axis=-1)


# ---------------------------------------------------------------------------
# Rank-normalized diagnostics (Vehtari et al. 2021)
# ---------------------------------------------------------------------------


def _rank_normalize(x):
    """Tie-aware rank-normal (z-scale) transform over ALL chains pooled.

    x: (..., m, n).  Average fractional ranks via two searchsorted passes
    (rank of v = midpoint of its equal-value run in the pooled sort), then
    the Blom-offset normal quantile  z = ndtri((r - 3/8) / (S + 1/4)).
    """
    from jax.scipy.special import ndtri

    shape = x.shape
    flat = x.reshape(shape[:-2] + (-1,))           # (..., m*n)
    S = flat.shape[-1]
    srt = jnp.sort(flat, axis=-1)
    left = jax.vmap(jnp.searchsorted, in_axes=(0, 0))(
        srt.reshape(-1, S), flat.reshape(-1, S)).reshape(flat.shape)
    right = jax.vmap(lambda a, v: jnp.searchsorted(a, v, side="right"),
                     in_axes=(0, 0))(
        srt.reshape(-1, S), flat.reshape(-1, S)).reshape(flat.shape)
    rank = 0.5 * (left + right + 1)                # average rank, 1-based
    u = (rank - 0.375) / (S + 0.25)
    # f32 guard: for S >~ 1e7 pooled samples the TOP rank's u rounds to
    # exactly 1.0 (1 - 0.625/S is within half an ulp of 1), ndtri returns
    # +inf and every downstream R-hat goes NaN (observed at 1536 chains x
    # 8000 samples, 2026-08-21) — clamp inside the open interval
    u = jnp.clip(u, jnp.float32(1e-10),
                 jnp.float32(1.0) - jnp.float32(1.2e-7))
    z = ndtri(u)
    return z.reshape(shape)


def _as_pmn(traces):
    """(m, n) or (m, n, P) traces -> (P, m, n)."""
    x = jnp.asarray(traces, jnp.float32)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]
    return jnp.moveaxis(x, -1, 0), squeeze


def rank_normalized_rhat(traces):
    """Rank-normalized split-R-hat: max of the BULK statistic (split-R-hat
    of the rank-normal transform) and the FOLDED statistic (same on
    |x - median|, which detects variance/tail mismatches that mean-based
    R-hat misses).  Vehtari et al. 2021 recommend flagging > 1.01.

    traces: (n_chains, n_samples) or (n_chains, n_samples, P).
    """
    x, squeeze = _as_pmn(traces)                   # (P, m, n)
    z_bulk = _rank_normalize(x)
    med = jnp.median(x.reshape(x.shape[0], -1), axis=-1)
    z_fold = _rank_normalize(jnp.abs(x - med[:, None, None]))

    def _rhat(z):                                  # (P, m, n) -> (P,)
        return split_rhat(jnp.moveaxis(z, 0, -1))

    out = jnp.maximum(jnp.atleast_1d(_rhat(z_bulk)),
                      jnp.atleast_1d(_rhat(z_fold)))
    return out[0] if squeeze else out


def ess_bulk(traces):
    """Bulk ESS: multi-chain ESS of the rank-normal transform — how well
    the center of the distribution is resolved (Vehtari et al. 2021)."""
    x, squeeze = _as_pmn(traces)
    z = jnp.moveaxis(_rank_normalize(x), 0, -1)    # (m, n, P)
    out = jnp.atleast_1d(ess(z))
    return out[0] if squeeze else out


def ess_tail(traces, prob: float = 0.05):
    """Tail ESS: min of the ESS of the ``prob`` / ``1 - prob`` quantile
    exceedance indicators — how well the tails are resolved.  Low tail-ESS
    with healthy bulk-ESS means credible-interval endpoints are noisy."""
    x, squeeze = _as_pmn(traces)                   # (P, m, n)
    flat = x.reshape(x.shape[0], -1)
    qlo = jnp.quantile(flat, prob, axis=-1)
    qhi = jnp.quantile(flat, 1.0 - prob, axis=-1)
    ind_lo = (x <= qlo[:, None, None]).astype(jnp.float32)
    ind_hi = (x >= qhi[:, None, None]).astype(jnp.float32)
    e_lo = jnp.atleast_1d(ess(jnp.moveaxis(ind_lo, 0, -1)))
    e_hi = jnp.atleast_1d(ess(jnp.moveaxis(ind_hi, 0, -1)))
    out = jnp.minimum(e_lo, e_hi)
    return out[0] if squeeze else out
