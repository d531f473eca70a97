"""Random-field proposal engine.

TPU-native redesign of the reference ``RandField`` class
(reference: gstatsMCMC/MCMC.py:433-778).  Host-side setup precomputes the
discrete block-size menu and the stacked logistic edge masks; the device-side
``draw_block`` produces one edge-masked, standardized, scaled field per call
on a fixed (B, B) canvas using a single statically-shaped FFT.

Both of the reference's generation methods are supported:
``spectral=True`` (FFT spectral synthesis, the fast TPU path all production
drivers use — largeScaleChain_multiprocessing.py:588) and
``spectral=False``, the gstools-SRF path (MCMC.py:657-687), implemented
natively as the randomization method in ops/srf.py (1000 sampled
wavevectors per draw; statistically equivalent, considerably more FLOPs —
mirroring the reference's own "spectral synthesis is significantly faster"
note).  SRF realizations are NOT standardized, matching gstools
(SURVEY.md §8.11 contrast).
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
    has_nugget: bool = True
    spectral: bool = True  # False -> gstools-SRF randomization method


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
        has_nugget=rf_cfg.nugget_max > 0,
        spectral=rf_cfg.spectral,
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

    bi = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    bj = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    block_mask = (bi < h) & (bj < w)

    if static.spectral:
        raw = spectral_field(k_field, (B, B), static.resolution,
                             static.model_name, range_x, range_y,
                             static.smoothness)
        f = standardize_masked(raw, block_mask)
        if static.has_nugget:
            nugget_noise = jax.random.normal(k_nug, (B, B)) * jnp.sqrt(nug)
            f = (f * scale + nugget_noise) * block_mask.astype(jnp.float32)
        else:
            f = f * scale * block_mask.astype(jnp.float32)
    else:
        # gstools-SRF path (reference MCMC.py:742-778 + 657-687): the
        # randomization-method field is NOT standardized, the nugget is part
        # of the model (white noise before scaling), and anisotropic models
        # sample an azimuth uniform in [0, 180) degrees (MCMC.py:652)
        from ..ops.srf import srf_field

        k_field, k_ang = jax.random.split(k_field)
        angle = (0.0 if static.isotropic else
                 jax.random.uniform(k_ang, (), minval=0.0,
                                    maxval=jnp.pi))
        raw = srf_field(k_field, (B, B), static.resolution,
                        static.model_name, range_x, range_y,
                        static.smoothness, angle)
        if static.has_nugget:
            raw = raw + jax.random.normal(k_nug, (B, B)) * jnp.sqrt(nug)
        f = raw * scale * block_mask.astype(jnp.float32)
    f = f * arrays.edge_masks[size_idx]
    return f, size_idx, w, h


class RandField:
    """Reference-API wrapper over the functional proposal engine.

    Mirrors the reference ``RandField`` class surface (MCMC.py:433-778):
    constructor + set_generation_method / set_block_sizes / set_weight_param
    setters, CRF-weight helpers, and host-callable field/block draws.  The
    chain hot path uses the compiled ``draw_block`` directly; this class is
    for interactive/setup use and for porting reference scripts verbatim.
    """

    def __init__(self, range_min_x, range_max_x, range_min_y, range_max_y,
                 scale_min, scale_max, nugget_max, model_name, isotropic,
                 smoothness=None, rng_seed=None):
        from ..utils.config import RandFieldConfig
        from ..utils.rng import as_key

        self.config = RandFieldConfig(
            range_min_x=range_min_x, range_max_x=range_max_x,
            range_min_y=range_min_y, range_max_y=range_max_y,
            scale_min=scale_min, scale_max=scale_max, nugget_max=nugget_max,
            model_name=model_name, isotropic=isotropic, smoothness=smoothness)
        self._key = as_key(rng_seed)
        self._blocks = None
        self._weights = None
        self._built = None

    def set_generation_method(self, spectral):
        """True -> FFT spectral synthesis, False -> the gstools-SRF
        randomization method (reference MCMC.py:514-522; ops/srf.py)."""
        import dataclasses as _dc

        self.config = _dc.replace(self.config, spectral=bool(spectral))
        self._built = None

    def set_block_sizes(self, min_block_x, max_block_x, min_block_y,
                        max_block_y, steps=5):
        """Discrete block-size menu, steps^2 even-ified (w//2*2) pairs
        (reference RandField.set_block_sizes, MCMC.py:524-581)."""
        from ..utils.config import BlockMenuConfig

        self._blocks = BlockMenuConfig(min_block_x, max_block_x, min_block_y,
                                       max_block_y, steps)
        self._built = None

    def set_weight_param(self, logis_func_L, logis_func_x0, logis_func_k,
                         logis_func_offset, max_dist, resolution):
        """Logistic edge/conditioning-weight parameters; precomputes the
        per-size edge masks (reference set_weight_param, MCMC.py:544-565)."""
        from ..utils.config import WeightConfig

        if self._blocks is None:
            raise Exception(
                "It seems like the set_block_sizes has not been called yet "
                "before calling set_weight_param")
        self._weights = WeightConfig(logis_func_L, logis_func_x0,
                                     logis_func_k, logis_func_offset,
                                     max_dist, resolution)
        self._built = None

    # -- derived artifacts ---------------------------------------------------

    def _ensure_built(self):
        if self._built is None:
            if self._blocks is None or self._weights is None:
                raise Exception(
                    "call set_block_sizes and set_weight_param first")
            self._built = build_randfield(self.config, self._blocks,
                                          self._weights)
        return self._built

    @property
    def pairs(self):
        return np.asarray(self._ensure_built()[1].pairs)

    def get_block_sizes(self):
        """(2, steps^2) (width, height) menu (reference MCMC.py:568-581)."""
        return make_block_menu(self._blocks)

    def get_edge_masks(self):
        """Per-block-size logistic edge-decay masks, trimmed to each
        (height, width) like the reference list (MCMC.py:583-623)."""
        static, arrays = self._ensure_built()
        masks = np.asarray(arrays.edge_masks)
        pairs = np.asarray(arrays.pairs)
        return [masks[i, :pairs[1, i], :pairs[0, i]]
                for i in range(pairs.shape[1])]

    def get_crf_weight(self, xx, yy, cond_data_mask):
        """Conditioning weight from a data mask: exact EDT distance +
        min-shifted logistic (reference MCMC.py:689-714). Returns
        (weight, dist, dist_rescale, dist_logi)."""
        from ..ops.distance import min_dist_from_mask
        from ..ops.logistic import crf_weight_from_dist

        wc = self._weights
        dist = min_dist_from_mask(np.asarray(xx), np.asarray(yy),
                                  np.asarray(cond_data_mask) == 1)
        w, dr, dl = crf_weight_from_dist(dist, wc.L, wc.x0, wc.k, wc.offset,
                                         wc.max_dist)
        return np.asarray(w), dist, np.asarray(dr), np.asarray(dl)

    def get_crf_weight_from_dist(self, xx, yy, dist):
        """Conditioning weight from a precomputed distance map (reference
        MCMC.py:716-740). Returns (weight, dist, dist_rescale, dist_logi)."""
        from ..ops.logistic import crf_weight_from_dist

        wc = self._weights
        w, dr, dl = crf_weight_from_dist(np.asarray(dist), wc.L, wc.x0, wc.k,
                                         wc.offset, wc.max_dist)
        return np.asarray(w), np.asarray(dist), np.asarray(dr), np.asarray(dl)

    def get_random_field(self, X, Y, n=1):
        """Field realizations on an (len(Y), len(X)) grid, by the configured
        generation method (set_generation_method / config.spectral).

        Note: the reference allocates n fields but returns only the first
        (quirk, MCMC.py:678-687); here n fields are returned when n > 1.
        """
        from ..ops.spectral import (sample_field_params, spectral_field,
                                    standardize_masked)

        X, Y = np.asarray(X), np.asarray(Y)
        res = float(abs(X[1] - X[0])) if len(X) > 1 else 1.0
        if len(Y) > 1:
            res_y = float(abs(Y[1] - Y[0]))
            if abs(res_y - res) > 1e-6 * max(res, res_y):
                # the synthesis grids assume square cells; silently using
                # the X spacing on both axes would stretch correlation
                # lengths along Y (the reference's gstools path uses the
                # true coordinates and would not)
                raise ValueError(
                    f"get_random_field needs square cells: X spacing {res} "
                    f"!= Y spacing {res_y}. Resample the grid or generate "
                    "on the finer spacing and subsample.")
        shape = (len(Y), len(X))
        cfg = self.config

        # one compiled program per (shape, config); eager jnp would pay
        # seconds-per-op dispatch on the tunneled device and, for the SRF
        # path, materialize the (ny, nx, n_modes) phase tensor unfused
        if getattr(self, "_field_jit_meta", None) != (shape, res, cfg):
            from ..ops.srf import srf_field

            def _draw(k1, k2, k3, k4):
                scale, nug, rx, ry = sample_field_params(
                    k1, cfg.scale_min, cfg.scale_max, cfg.nugget_max,
                    cfg.range_min_x, cfg.range_max_x, cfg.range_min_y,
                    cfg.range_max_y, cfg.isotropic)
                if cfg.spectral:
                    raw = spectral_field(k2, shape, res, cfg.model_name,
                                         rx, ry, cfg.smoothness)
                    f = standardize_masked(raw, jnp.ones(shape, bool))
                    return f * scale + (jax.random.normal(k3, shape)
                                        * jnp.sqrt(nug))
                angle = (0.0 if cfg.isotropic
                         else jax.random.uniform(k4, (), maxval=jnp.pi))
                raw = srf_field(k2, shape, res, cfg.model_name, rx, ry,
                                cfg.smoothness, angle)
                raw = raw + jax.random.normal(k3, shape) * jnp.sqrt(nug)
                return raw * scale

            self._field_jit = jax.jit(_draw)
            self._field_jit_meta = (shape, res, cfg)

        out = []
        for _ in range(int(n)):
            self._key, k1, k2, k3, k4 = jax.random.split(self._key, 5)
            out.append(np.asarray(self._field_jit(k1, k2, k3, k4)))
        return out[0] if n == 1 else np.stack(out)

    def get_rfblock(self):
        """One edge-masked proposal block (host convenience; the chain uses
        the compiled path)."""
        static, arrays = self._ensure_built()
        # cache the compiled draw: a fresh jit wrapper per call would
        # retrace + recompile every draw (20s-9min each on the tunneled
        # device) — same pattern as _field_jit above
        if getattr(self, "_block_jit_static", None) is not static:
            self._block_jit = jax.jit(
                lambda kk, arrs: draw_block(kk, static, arrs))
            self._block_jit_static = static
        self._key, k = jax.random.split(self._key)
        f, size_idx, w, h = self._block_jit(k, arrays)
        return np.asarray(f)[: int(h), : int(w)]
