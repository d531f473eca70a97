"""On-device convergence diagnostics: split R-hat and effective sample size.

The reference has no convergence diagnostics — chains are compared by eye in
visualization.ipynb.  These are standard formulations (Gelman et al., BDA3 /
Vehtari et al. 2021 rank-normalized variants omitted for simplicity), run on
device so pod-scale chain farms can monitor convergence without materializing
traces on the host.  Cross-device reductions ride XLA collectives when the
chain axis is sharded.
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
