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


def make_sharded_crf_chain(mesh: Mesh, static, grid_axis: str = "grid"):
    """Single-chain CRF sampler with the 2D domain row-sharded over devices.

    The pod-scale single-realization mode (SURVEY.md §5.7): for grids too
    large for one device's HBM, the bed/residual state lives sharded
    P(grid_axis, None); every device draws the SAME proposal (replicated
    keys), applies its local rows, and the accept decision uses a psum'd
    full-grid loss with ppermute halo exchange for the gradient stencil.

    Semantics: full-grid residual recompute per iteration (the chain_sgs /
    cross-check mode — not chain_crf's stale-ring incremental patch), loss
    over the mc mask, thickness guard over the update mask.

    Returns run(bed_sharded, consts_local (dict of sharded (H,W) planes +
    replicated scalars), key, n_iter) -> (bed', losses (n_iter,), steps).
    """
    from ..models.randfield import draw_block

    H, W, B = static.H, static.W, static.rf.B
    n_shards = mesh.shape[grid_axis]
    rows_local = H // n_shards
    spec = P(grid_axis, None)

    def local_run(bed, surf, velx, vely, dhdt, smb, upd, mcf, crfw,
                  rf_arrays, region_cells, sigma, resolution, key, n_iter):
        shard = jax.lax.axis_index(grid_axis)
        row0 = shard * rows_local

        def residual(b):
            thick = surf - b
            dx = _gradient_axis1_local(velx * thick, resolution)
            dy = _gradient_axis0_sharded(vely * thick, resolution, grid_axis)
            return dx + dy + dhdt - smb

        def loss_of(res):
            sq = jnp.square(res)
            sq = jnp.where(jnp.isnan(sq), 0.0, sq)
            s = jnp.sum(jnp.where(mcf > 0, sq, 0.0))
            return jax.lax.psum(s, grid_axis) / (2.0 * sigma**2)

        loss0 = loss_of(residual(bed))

        def step(carry, _):
            bed, loss_prev, key = carry
            key, k_blk, k_c, k_u = jax.random.split(key, 4)
            f, size_idx, w, h = draw_block(k_blk, static.rf, rf_arrays)
            cidx = jax.random.randint(k_c, (), 0, region_cells.shape[0])
            cx = region_cells[cidx, 0]
            cy = region_cells[cidx, 1]
            off_x = (2 * cx - h) // 2
            off_y = (2 * cy - w) // 2
            bxmin = jnp.maximum(0, off_x)
            bxmax = jnp.minimum(H, (2 * cx + h) // 2)
            bymin = jnp.maximum(0, off_y)
            bymax = jnp.minimum(W, (2 * cy + w) // 2)

            # local slice of the global proposal canvas: rows
            # [row0, row0+rows_local) map to field rows (row - off_x)
            FPR = rows_local + 2 * B
            fpad = jnp.zeros((FPR, W + 2 * B), f.dtype)
            fpad = jax.lax.dynamic_update_slice(
                fpad, f, (jnp.clip(B + off_x - row0, 0, FPR - B),
                          B + off_y))
            pert = jax.lax.dynamic_slice(fpad, (B, B), (rows_local, W))

            rows_g = row0 + jax.lax.broadcasted_iota(jnp.int32,
                                                     (rows_local, W), 0)
            cols_g = jax.lax.broadcasted_iota(jnp.int32, (rows_local, W), 1)
            in_block = ((rows_g >= bxmin) & (rows_g < bxmax)
                        & (cols_g >= bymin) & (cols_g < bymax))
            pert = jnp.where(in_block & (upd > 0), pert * crfw, 0.0)
            bed_new = bed + pert

            loss_next = loss_of(residual(bed_new))
            viol_local = jnp.any(((surf - bed_new) <= 0.0) & in_block
                                 & (upd > 0))
            viol = jax.lax.psum(viol_local.astype(jnp.int32), grid_axis) > 0
            loss_next = jnp.where(viol, jnp.inf, loss_next)

            u = jax.random.uniform(k_u, ())
            accept = u <= jnp.minimum(1.0, jnp.exp(loss_prev - loss_next))
            write = accept & ~viol
            bed = jnp.where(write, bed_new, bed)
            loss = jnp.where(write, loss_next, loss_prev)
            return (bed, loss, key), (loss, accept)

        (bed, loss, _), (losses, steps) = jax.lax.scan(
            step, (bed, loss0, key), None, length=n_iter)
        return bed, losses, steps

    def run(bed, consts, key, n_iter: int):
        fn = shard_map(
            partial(local_run, n_iter=int(n_iter)), mesh=mesh,
            in_specs=(spec, spec, spec, spec, spec, spec, spec, spec, spec,
                      P(), P(), P(), P(), P()),
            out_specs=(spec, P(), P()),
            check_vma=False,
        )
        return jax.jit(fn)(
            bed, consts["surf"], consts["velx"], consts["vely"],
            consts["dhdt"], consts["smb"], consts["update_mask"],
            consts["mc_mask"], consts["crf_weight"], consts["rf"],
            consts["region_cells"], consts["sigma_mc"],
            consts["resolution"], key)

    return run
