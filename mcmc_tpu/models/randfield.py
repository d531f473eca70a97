"""Random-field proposal engine.

TPU-native redesign of the reference ``RandField`` class
(reference: gstatsMCMC/MCMC.py:433-778).  Host-side setup precomputes the
discrete block-size menu and the stacked logistic edge masks; the device-side
``draw_block`` produces one edge-masked, standardized, scaled field per call
on a fixed (B, B) canvas using a single statically-shaped FFT.

The gstools-SRF generation path of the reference (MCMC.py:657-687) is a
third-party randomization method; all production drivers use
``spectral=True`` (largeScaleChain_multiprocessing.py:588), and spectral
synthesis is the TPU path here.  ``spectral=False`` raises with a pointer to
the host fallback in tests/reference_impl.py.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.logistic import make_edge_mask
from ..ops.spectral import sample_field_params, spectral_field, standardize_masked
from ..utils.config import BlockMenuConfig, RandFieldConfig, WeightConfig


def make_block_menu(cfg: BlockMenuConfig) -> np.ndarray:
    """(2, steps**2) array of (width, height) pairs, even-ified w//2*2
    (reference RandField.get_block_sizes, MCMC.py:568-581)."""
    width = np.linspace(cfg.min_block_x, cfg.max_block_x, cfg.steps, dtype=int)
    height = np.linspace(cfg.min_block_y, cfg.max_block_y, cfg.steps, dtype=int)
    w, h = np.meshgrid(width, height)
    return np.array([(w // 2 * 2).flatten(), (h // 2 * 2).flatten()], dtype=np.int32)


@dataclasses.dataclass(frozen=True)
class RandFieldStatic:
    """Static (hashable, closure-captured) part of the proposal engine."""

    model_name: str
    isotropic: bool
    smoothness: float | None
    n_sizes: int
    B: int  # padded canvas size >= max block dim
    resolution: float


@dataclasses.dataclass
class RandFieldArrays:
    """Array part (lives in the consts pytree shipped to device)."""

    pairs: jnp.ndarray        # (2, n_sizes) int32: (w, h)
    edge_masks: jnp.ndarray   # (n_sizes, B, B) float32, block at top-left
    scale_min: jnp.ndarray
    scale_max: jnp.ndarray
    nugget_max: jnp.ndarray
    range_min_x: jnp.ndarray
    range_max_x: jnp.ndarray
    range_min_y: jnp.ndarray
    range_max_y: jnp.ndarray


import jax.tree_util as _tu

_tu.register_pytree_node(
    RandFieldArrays,
    lambda c: ((c.pairs, c.edge_masks, c.scale_min, c.scale_max, c.nugget_max,
                c.range_min_x, c.range_max_x, c.range_min_y, c.range_max_y), None),
    lambda aux, ch: RandFieldArrays(*ch),
)


def build_randfield(rf_cfg: RandFieldConfig, blocks: BlockMenuConfig,
                    weights: WeightConfig) -> Tuple[RandFieldStatic, RandFieldArrays]:
    """Host-side setup: block menu + stacked edge masks + padded canvas size."""
    if not rf_cfg.spectral:
        raise NotImplementedError(
            "gstools-SRF generation (spectral=False) is a host-only method in the "
            "reference; the TPU path is spectral synthesis. A NumPy cross-check "
            "implementation lives in tests/reference_impl.py."
        )
    pairs = make_block_menu(blocks)
    n_sizes = pairs.shape[1]
    B = int(max(pairs.max(), 2))
    edge = np.zeros((n_sizes, B, B), dtype=np.float32)
    for i in range(n_sizes):
        w, h = int(pairs[0, i]), int(pairs[1, i])
        edge[i, :h, :w] = make_edge_mask(
            h, w, weights.resolution, weights.L, weights.x0, weights.k,
            weights.offset, weights.max_dist,
        )
    static = RandFieldStatic(
        model_name=rf_cfg.model_name,
        isotropic=rf_cfg.isotropic,
        smoothness=rf_cfg.smoothness,
        n_sizes=n_sizes,
        B=B,
        resolution=weights.resolution,
    )
    arrays = RandFieldArrays(
        pairs=jnp.asarray(pairs, jnp.int32),
        edge_masks=jnp.asarray(edge),
        scale_min=jnp.float32(rf_cfg.scale_min),
        scale_max=jnp.float32(rf_cfg.scale_max),
        nugget_max=jnp.float32(rf_cfg.nugget_max),
        range_min_x=jnp.float32(rf_cfg.range_min_x),
        range_max_x=jnp.float32(rf_cfg.range_max_x),
        range_min_y=jnp.float32(rf_cfg.range_min_y),
        range_max_y=jnp.float32(rf_cfg.range_max_y),
    )
    return static, arrays


def draw_block(key, static: RandFieldStatic, arrays: RandFieldArrays):
    """One proposal block on the (B, B) canvas.

    Mirrors RandField.get_rfblock (reference MCMC.py:742-778): random size
    from the menu, spectral field, standardize to exact zero-mean/unit-var
    over the block, scale + nugget noise, multiply the logistic edge mask.

    Returns (field (B,B) float32, size_idx, w, h); cells outside the (h, w)
    block are zero.
    """
    B = static.B
    k_size, k_params, k_field, k_nug = jax.random.split(key, 4)
    size_idx = jax.random.randint(k_size, (), 0, static.n_sizes)
    w = arrays.pairs[0, size_idx]
    h = arrays.pairs[1, size_idx]

    scale, nug, range_x, range_y = sample_field_params(
        k_params, arrays.scale_min, arrays.scale_max, arrays.nugget_max,
        arrays.range_min_x, arrays.range_max_x,
        arrays.range_min_y, arrays.range_max_y, static.isotropic,
    )

    raw = spectral_field(k_field, (B, B), static.resolution, static.model_name,
                         range_x, range_y, static.smoothness)

    bi = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    bj = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    block_mask = (bi < h) & (bj < w)

    f = standardize_masked(raw, block_mask)
    nugget_noise = jax.random.normal(k_nug, (B, B)) * jnp.sqrt(nug)
    f = (f * scale + nugget_noise) * block_mask.astype(jnp.float32)
    f = f * arrays.edge_masks[size_idx]
    return f, size_idx, w, h
