"""Pallas TPU kernel for uniform-grid LUT interpolation (normal-score
transforms on the hot path).

Motivation (measured on the v5e-1 bench device, 2026-08-19): the SGS step's
ONE inverse-LUT application — index arithmetic plus a single pair-gather
from the 4096-node table (ops/transforms.NormalScoreLUT) — costs ~1.8 ms of
the ~11 ms 512-chain step-batch, purely XLA per-gather op overhead.  The
same lookup as a Pallas kernel with the table VMEM-resident measures
0.276 ms vs 2.647 ms standalone (~10x): the gather becomes R=n/128
lane-shuffles (``jnp.take_along_axis`` on the 128-lane axis, the one
dynamic-gather form Mosaic lowers on this toolchain) with row selects.

The kernel computes EXACTLY the arithmetic of ``NormalScoreLUT._lookup``
(same clip, same index split, same lerp expression), so values match the
XLA path bitwise; NaN passthrough is applied in the XLA wrapper.

Reference analog: sklearn QuantileTransformer.inverse_transform inside the
reference's per-iteration re-transform (MCMC.py:1766); this kernel is the
TPU-native form of that lookup at farm scale.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BLK = 256  # rows per grid step: (256, 128) element block; loop temps stay
# in vregs (a single whole-array block spills ~160 MB of vregs — measured)


def lut_kernel_available(n_tab: int) -> bool:
    """The kernel needs a TPU backend and a 128-divisible table."""
    try:
        return (jax.devices()[0].platform == "tpu"
                and n_tab % LANES == 0)
    except Exception:
        return False


def _kernel(R):
    def kern(t0_ref, t1_ref, t_ref, o_ref):
        t = t_ref[:]
        i = t.astype(jnp.int32)
        f = t - i.astype(jnp.float32)
        lane = jax.lax.rem(i, LANES)
        row = i // LANES
        g0 = jnp.zeros(t.shape, jnp.float32)
        g1 = jnp.zeros(t.shape, jnp.float32)
        for r in range(R):
            r0 = jnp.broadcast_to(t0_ref[r:r + 1, :], t.shape)
            r1 = jnp.broadcast_to(t1_ref[r:r + 1, :], t.shape)
            m = row == r
            g0 = jnp.where(m, jnp.take_along_axis(r0, lane, axis=-1), g0)
            g1 = jnp.where(m, jnp.take_along_axis(r1, lane, axis=-1), g1)
        o_ref[:] = g0 * (1.0 - f) + g1 * f

    return kern


@partial(jax.jit, static_argnames=("n_tab", "interpret"))
def _lookup_positions(t_flat, t0, t1, n_tab: int, interpret: bool = False):
    """Interpolate at (already clipped) fractional table positions.

    t_flat: (M,) f32 in [0, n_tab-1); t0/t1: (n_tab/128, 128) node values
    (left/right of each cell).  Returns (M,) f32.
    """
    R = n_tab // LANES
    M = t_flat.shape[0]
    pad = (-M) % (BLK * LANES)
    tp = jnp.pad(t_flat, (0, pad))
    rows = tp.shape[0] // LANES
    fn = pl.pallas_call(
        _kernel(R),
        grid=(rows // BLK,),
        in_specs=[
            pl.BlockSpec((R, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        interpret=interpret,
    )
    out = fn(t0, t1, tp.reshape(rows, LANES))
    return out.ravel()[:M]


def lut_interp(x, lo, scale, table, interpret: bool = False):
    """Batched uniform-grid LUT lookup, Pallas-backed.

    Drop-in for ``NormalScoreLUT._lookup(x, lo, scale, table)`` (same clip /
    index / lerp arithmetic, same NaN passthrough) for any input shape; the
    whole batch is flattened into one kernel launch.  ``table`` is the
    (n, 2) pair table; its two columns are reshaped to the (n/128, 128)
    VMEM layout (hoisted out of scans — the table is a loop constant).
    """
    n = table.shape[0]
    x = jnp.asarray(x)
    t = jnp.clip((x - lo) * scale, 0.0, n - 1.000001).astype(jnp.float32)
    t0 = table[:, 0].reshape(-1, LANES)
    t1 = table[:, 1].reshape(-1, LANES)
    y = _lookup_positions(t.ravel(), t0, t1, n_tab=n,
                          interpret=interpret).reshape(x.shape)
    return jnp.where(jnp.isnan(x), jnp.nan, y)
