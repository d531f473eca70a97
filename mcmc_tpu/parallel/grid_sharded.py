"""Grid-domain sharding with halo exchange (the SP/CP analog).

For grids too large for one device, the 2D field is sharded row-wise over a
``grid`` mesh axis and the pad-1 gradient stencil of the mass-conservation
operator (reference Topography.py:592-600; stencil analysis in SURVEY.md
§5.7) is satisfied by exchanging one-row halos between neighbor shards with
``lax.ppermute`` inside ``shard_map`` — collectives ride ICI, exactly the
"pick a mesh, annotate shardings, let XLA insert collectives" recipe.

numpy-gradient edge semantics are preserved: interior shards use central
differences across shard boundaries (thanks to the halos); the first/last
global rows keep their one-sided differences.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def _exchange_halo_rows(x, axis_name):
    """Append neighbor boundary rows: returns (top_halo, bottom_halo).

    top_halo = last row of the previous shard, bottom_halo = first row of
    the next shard (garbage at the global edges; callers mask with index
    arithmetic).
    """
    n = jax.lax.psum(1, axis_name)
    # send my last row to the next shard (it becomes their top halo)
    top = jax.lax.ppermute(x[-1:], axis_name,
                           [(i, (i + 1) % n) for i in range(n)])
    # send my first row to the previous shard (their bottom halo)
    bot = jax.lax.ppermute(x[:1], axis_name,
                           [(i, (i - 1) % n) for i in range(n)])
    return top, bot


def _gradient_axis0_sharded(f, resolution, axis_name):
    """d/dy with numpy-gradient semantics across row shards."""
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.psum(1, axis_name)
    top, bot = _exchange_halo_rows(f, axis_name)

    fp = jnp.concatenate([top, f, bot], axis=0)         # (rows+2, cols)
    central = (fp[2:] - fp[:-2]) / (2.0 * resolution)   # (rows, cols)

    # one-sided at the global domain edges
    first = (f[1] - f[0]) / resolution
    last = (f[-1] - f[-2]) / resolution
    rows = f.shape[0]
    out = central
    is_first_shard = idx == 0
    is_last_shard = idx == n - 1
    out = out.at[0].set(jnp.where(is_first_shard, first, out[0]))
    out = out.at[rows - 1].set(jnp.where(is_last_shard, last, out[rows - 1]))
    return out


def _gradient_axis1_local(f, resolution):
    """d/dx within a shard (columns are unsharded)."""
    central = (f[:, 2:] - f[:, :-2]) / (2.0 * resolution)
    first = (f[:, 1:2] - f[:, 0:1]) / resolution
    last = (f[:, -1:] - f[:, -2:-1]) / resolution
    return jnp.concatenate([first, central, last], axis=1)


def make_sharded_residual(mesh: Mesh, grid_axis: str = "grid"):
    """Build a jitted row-sharded mass-conservation residual.

    Inputs/outputs are (H, W) arrays sharded P(grid_axis, None); H must be
    divisible by the grid axis size.
    """
    spec = P(grid_axis, None)

    def local(bed, surf, velx, vely, dhdt, smb, resolution):
        thick = surf - bed
        fx = velx * thick
        fy = vely * thick
        dx = _gradient_axis1_local(fx, resolution)
        dy = _gradient_axis0_sharded(fy, resolution, grid_axis)
        return dx + dy + dhdt - smb

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec, spec, P()),
        out_specs=spec,
    )
    return jax.jit(fn)


def make_sharded_loss(mesh: Mesh, grid_axis: str = "grid"):
    """Row-sharded masked Gaussian loss: psum over the grid axis."""
    spec = P(grid_axis, None)

    def local(res, mask, sigma):
        sq = jnp.square(res)
        sq = jnp.where(jnp.isnan(sq), 0.0, sq)
        partial_sum = jnp.sum(jnp.where(mask, sq, 0.0))
        total = jax.lax.psum(partial_sum, grid_axis)
        return total / (2.0 * sigma**2)

    fn = shard_map(local, mesh=mesh, in_specs=(spec, spec, P()),
                   out_specs=P())
    return jax.jit(fn)


def shard_grid_arrays(mesh: Mesh, tree, grid_axis: str = "grid"):
    """Place (H, W) arrays row-sharded over the grid axis."""
    sharding = NamedSharding(mesh, P(grid_axis, None))
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), sharding), tree)
