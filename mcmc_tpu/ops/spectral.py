"""FFT spectral synthesis of 2D Gaussian random fields.

TPU-native equivalent of the reference's spectral-synthesis proposal
generator (reference: gstatsMCMC/MCMC.py:176-254, MCMC_gpu.py:12-109).

Differences from the reference, by design (statistical — not bitwise — parity,
validated in tests):

- RNG is ``jax.random`` (threefry keys), not a NumPy Generator stream.
- The field is always synthesized on a fixed (B, B) grid (B = padded max
  block size) so one statically-shaped FFT serves the whole block-size menu.
  The actual (h, w) block is the top-left window; standardization (exactly
  zero mean / unit variance before scaling, a reference invariant —
  MCMC.py:248) is applied over that window's mask.  A window of a
  larger-domain synthesis follows the same spectral density with *less*
  periodic wrap-around artifact than a size-matched FFT.

Reference quirks reproduced exactly:
- anisotropic ranges collapse to the isotropic geometric mean
  ``a = sqrt(len_x * len_y)`` in the spectral density (MCMC.py:228-239);
- length-scale conventions per model: range/sqrt(3) (Gaussian), /3
  (Exponential), /2 (Matern) (MCMC.py:210-215);
- the matérn density uses ``(kappa + 4*pi*k^2)^(-nu-1)`` with ``k`` already
  carrying a 2*pi factor (MCMC.py:233-239);
- fields are standardized to exactly zero mean / unit variance, so the
  realized field variance is deterministically ``scale**2`` (+ nugget).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def sample_field_params(key, scale_min, scale_max, nugget_max,
                        range_min_x, range_max_x, range_min_y, range_max_y,
                        isotropic: bool):
    """Sample per-draw variogram parameters (reference MCMC.py:199-207).

    Returns (scale, nugget, range_x, range_y); scale is already divided by 3.
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    scale = jax.random.uniform(k1, (), minval=scale_min, maxval=scale_max) / 3.0
    nug = jax.random.uniform(k2, (), minval=0.0, maxval=nugget_max)
    range_x = jax.random.uniform(k3, (), minval=range_min_x, maxval=range_max_x)
    if isotropic:
        range_y = range_x
    else:
        range_y = jax.random.uniform(k4, (), minval=range_min_y, maxval=range_max_y)
    return scale, nug, range_x, range_y


def spectral_density(model_name: str, k, range_x, range_y, smoothness):
    """Spectral power density S(k) for the given model (static name).

    ``k`` is the angular wavenumber magnitude grid (already includes 2*pi).
    """
    if model_name == "Gaussian":
        len_x, len_y = range_x / jnp.sqrt(3.0), range_y / jnp.sqrt(3.0)
        a = jnp.sqrt(len_x * len_y)
        return jnp.exp(-0.5 * jnp.square(a * k))
    if model_name == "Exponential":
        len_x, len_y = range_x / 3.0, range_y / 3.0
        a = jnp.sqrt(len_x * len_y)
        return 1.0 / (1.0 + jnp.square(a * k)) ** 1.5
    # Matern
    nu = float(smoothness) if smoothness else 1.0
    len_x, len_y = range_x / 2.0, range_y / 2.0
    a = jnp.sqrt(len_x * len_y)
    constant = (4.0 * math.pi * math.gamma(nu + 1.0) * (2.0 * nu) ** nu) / math.gamma(nu)
    constant = constant / a ** (2.0 * nu)
    kappa = 2.0 * nu / jnp.square(a)
    return constant * (kappa + 4.0 * math.pi * jnp.square(k)) ** (-nu - 1.0)


@functools.lru_cache(maxsize=32)
def _rfreq_grid_np(shape, res):
    """Wavenumber magnitude on the half (rfft) grid (host-cached)."""
    ny, nx = shape
    kx = np.fft.rfftfreq(nx, d=res) * 2.0 * np.pi
    ky = np.fft.fftfreq(ny, d=res) * 2.0 * np.pi
    kxv, kyv = np.meshgrid(kx, ky, indexing="xy")
    return (np.sqrt(np.square(kxv) + np.square(kyv)) + 1e-10).astype(np.float32)


def spectral_field_from_noise(noise, shape, res, model_name: str, range_x,
                              range_y, smoothness):
    """Half-spectrum synthesis from caller-provided complex white noise of
    shape ``(ny, nx//2+1)`` (see ``spectral_field``)."""
    kh = jnp.asarray(_rfreq_grid_np(tuple(shape), float(res)))
    s_dens = spectral_density(model_name, kh, range_x, range_y, smoothness)
    spec = noise * jnp.sqrt(s_dens).astype(jnp.complex64)
    field = jnp.fft.irfft2(spec, s=tuple(shape))
    return field.astype(jnp.float32)


def spectral_field(key, shape, res, model_name: str, range_x, range_y,
                   smoothness):
    """One raw (unit-ish) field realization of static ``shape`` = (ny, nx).

    Uses the half-spectrum form ``irfft2(noise_half * sqrt(S_half))`` —
    the hermitian completion of complex white noise — which is
    distributionally identical to the reference's full
    ``ifft2(noise * sqrt(S)).real`` (MCMC.py:242-247) at half the RNG and
    FFT cost (the exact normalization difference is irrelevant because the
    caller standardizes the field to unit variance, MCMC.py:248).

    NOT standardized or scaled; callers standardize over the active block
    mask and apply scale/nugget (see models.randfield.draw_block).
    """
    nh = (shape[0], shape[1] // 2 + 1)
    kr, ki = jax.random.split(key)
    noise = (jax.random.normal(kr, nh) + 1j * jax.random.normal(ki, nh))
    return spectral_field_from_noise(noise, shape, res, model_name,
                                     range_x, range_y, smoothness)


def standardize_masked(field, mask):
    """Zero-mean / unit-variance over mask cells (reference MCMC.py:248).

    Uses the population std (ddof=0) + 1e-12 exactly like the reference.
    Cells outside the mask are zeroed.
    """
    m = mask.astype(field.dtype)
    n = jnp.maximum(jnp.sum(m), 1.0)
    mean = jnp.sum(field * m) / n
    var = jnp.sum(jnp.square(field - mean) * m) / n
    out = (field - mean) / (jnp.sqrt(var) + 1e-12)
    return out * m
