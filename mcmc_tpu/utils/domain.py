"""Domain padding for fused-kernel alignment.

The fused Pallas window kernel (ops/window_kernel.py) needs DMA-alignable
window geometry: row starts quantized to 8 and column starts to 128, which
requires ``H % 8 == 0`` and ``W % 128 == 0`` (or full-dimension windows).
Grids that violate this — e.g. the reference tutorial's 900x900 T1 domain
(T1_LoadData.ipynb cells 9-11) — silently fall back to the vmapped XLA
step, which is gather-latency-bound on TPU (measured 2026-08-17: 52-63k
chain-it/s at 900x900 vs ~350k for the fused path at 512x512).

``pad_domain`` extends the physical domain by <=7 rows and <=127 columns so
the fused path applies: consts planes are edge-replicated (the pad behaves
like a frozen continuation of the boundary), coordinates continue their
linear ramps, and the update region / conditioning masks are zero in the
pad, so no proposal center is ever sampled there and (with
``massConvInRegion=True``, the production setting) no pad cell contributes
to the loss.  Semantically this is simply running a slightly larger domain:
blocks proposed near the true east/south boundary spill into inert pad
cells instead of being clipped, which only matters if the update region
touches the boundary (the reference's own crops keep a +-20-cell margin,
Topography.py crop logic).
"""

from __future__ import annotations

import numpy as np

# pad rules by plane name — both the chain-constructor names used by
# ``pad_domain`` and the configured-chain attribute names used by
# ``pad_chain``
_COORD_X = ("xx",)
_COORD_Y = ("yy",)
_ZERO = ("region", "update_region", "data_mask", "dhdt", "smb",
         "region_mask", "mc_region_mask", "data_region_mask",
         "crf_data_weight")
_NAN = ("cond_bed",)
# everything else (surf, velx, vely, initial_bed, grounded, trend, ...)
# edge-replicates


def _pad_plane(name, a, ph: int, pw: int, res: float):
    a = np.asarray(a)
    if a.ndim != 2:
        return a  # scalars / non-grid entries pass through
    if name in _COORD_X:
        # x increases along columns; continue the ramp east, copy rows
        cols = a[:, -1:] + res * np.arange(1, pw + 1)[None, :]
        a = np.concatenate([a, cols.astype(a.dtype)], axis=1)
        return np.pad(a, ((0, ph), (0, 0)), mode="edge")
    if name in _COORD_Y:
        rows = a[-1:, :] + res * np.arange(1, ph + 1)[:, None]
        a = np.concatenate([a, rows.astype(a.dtype)], axis=0)
        return np.pad(a, ((0, 0), (0, pw)), mode="edge")
    if name in _ZERO:
        return np.pad(a, ((0, ph), (0, pw)), constant_values=0)
    if name in _NAN:
        return np.pad(a.astype(float), ((0, ph), (0, pw)),
                      constant_values=np.nan).astype(a.dtype)
    return np.pad(a, ((0, ph), (0, pw)), mode="edge")


def aligned_shape(H: int, W: int) -> tuple[int, int]:
    """Smallest (Hp, Wp) >= (H, W) with Hp % 8 == 0 and Wp % 128 == 0."""
    return (-(-H // 8) * 8, -(-W // 128) * 128)


def pad_domain(planes: dict, resolution: float):
    """Pad all 2D planes in ``planes`` to the fused-kernel-aligned shape.

    planes: name -> (H, W) array; names matching the chain constructor
    arguments get type-appropriate pad values (see module docstring).
    Returns ``(padded, unpad)`` where ``padded`` maps the same names to
    (Hp, Wp) arrays and ``unpad(a)`` slices any (..., Hp, Wp) array back to
    (..., H, W).  If the shape is already aligned, returns the inputs
    unchanged with an identity unpad.
    """
    shapes = {a.shape for a in planes.values() if np.ndim(a) == 2}
    if len(shapes) != 1:
        raise ValueError(f"planes must share one 2D shape, got {shapes}")
    (H, W), = shapes
    Hp, Wp = aligned_shape(H, W)
    if (Hp, Wp) == (H, W):
        return dict(planes), lambda a: a
    ph, pw = Hp - H, Wp - W
    res = float(resolution)

    padded = {k: _pad_plane(k, v, ph, pw, res) for k, v in planes.items()}

    def unpad(a):
        return np.asarray(a)[..., :H, :W]

    return padded, unpad


def pad_chain(chain):
    """Pad a CONFIGURED ``ChainCRF``'s grid planes to the aligned shape.

    Returns ``(padded_chain, (H, W))``: a rebuilt chain whose planes are
    (Hp, Wp) with inert pad values (attribute-name rules above), plus the
    true domain shape for slicing results back.  On the true domain the
    padded chain samples the trajectory of the unpadded one
    (tests/test_domain_padding.py; bitwise on CPU — on TPU the padded
    shape retiles the loss reduction, so rare last-ulp loss differences
    can flip borderline MH accepts, ~0.03% of decisions in the verify
    drive) PROVIDED the update region and the
    mc-loss region stay off the east/south boundary — padding there would
    turn boundary cells' one-sided gradient stencils into central ones
    inside the loss — so this raises ValueError when either mask touches
    the last row/column (callers fall back to the XLA path).  SGS chains
    have no fused path and are also rejected.

    Aligned grids return ``(chain, (H, W))`` unchanged.
    """
    if type(chain).__name__ == "ChainSGS":
        raise ValueError("pad_chain applies to ChainCRF only (the SGS "
                         "family has no fused-kernel path to align for)")
    H, W = np.asarray(chain.xx).shape
    Hp, Wp = aligned_shape(H, W)
    if (Hp, Wp) == (H, W):
        return chain, (H, W)
    ph, pw = Hp - H, Wp - W
    # only the dimensions actually being padded matter: a mask on the
    # last row is harmless when ph == 0 (no rows added, row stencils
    # unchanged), and symmetrically for columns
    for name in ("region_mask", "mc_region_mask"):
        m = np.asarray(getattr(chain, name))
        if (ph and m[-1, :].any()) or (pw and m[:, -1].any()):
            raise ValueError(
                f"{name} touches the east/south boundary: alignment "
                "padding would change the boundary gradient stencils "
                "inside the loss, so the padded chain would not reproduce "
                "the unpadded trajectory")
    from ..drivers import chain_from_snapshot, chain_snapshot

    snap = chain_snapshot(chain)
    res = float(chain.resolution)
    for k, v in snap.items():
        if isinstance(v, np.ndarray) and v.ndim == 2 and v.shape == (H, W):
            snap[k] = _pad_plane(k, v, ph, pw, res)
    if snap.get("sample_loc") is not None:
        # probe coordinates beyond the true extent would otherwise
        # nearest-map into inert pad cells (constant traces); clamp them
        # onto the true domain — pad coords are strictly beyond, so the
        # clamped lookup lands on the same cell as in the unpadded chain
        xx, yy = np.asarray(chain.xx), np.asarray(chain.yy)
        loc = np.array(snap["sample_loc"], float, copy=True)
        loc[:, 0] = np.clip(loc[:, 0], xx.min(), xx.max())
        loc[:, 1] = np.clip(loc[:, 1], yy.min(), yy.max())
        snap["sample_loc"] = loc
    padded = chain_from_snapshot(snap)
    padded._key = getattr(chain, "_key", None)
    return padded, (H, W)
