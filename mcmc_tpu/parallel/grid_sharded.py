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

Two sampler entry points:
- ``make_sharded_crf_chain``: single chain, domain row-sharded;
- ``make_sharded_crf_chains``: the combined chains x grid layout — batched
  chains (data-parallel) whose per-chain grid is row-sharded, one program
  over a two-axis mesh.
Both use the INCREMENTAL windowed residual patch (chain_crf's stale-ring
scheme, O(B^2)/step) with one (1, CW) halo flux row exchanged each way per
step for blocks that touch shard boundaries — not a full-grid recompute.

Why there is NO grid-sharded SGS variant (deliberate, quantitative):

1. **Communication asymmetry.** The CRF step's only cross-shard data need
   is the pad-1 gradient stencil: one flux row each way per step.  The SGS
   step (models/chain_sgs.py) additionally conditions each block on
   neighbor data gathered from a ``search_radius`` disc — 30 km = 60 cells
   at production resolution (smallScaleChain_multiprocessing.py:555) —
   around a window that lands anywhere in the region.  Row-sharding a
   512-row grid 8 ways gives 64-row shards: the conditioning disc
   (121-row diameter) spans ~2-3 shards for EVERY step, so each step would
   all-gather a multi-shard neighborhood of the bed/z planes (plus the
   octant top-k over it), not exchange one halo row.  That is a
   collective-per-step design with no ICI-friendly locality — the mechanism
   that makes sharded CRF cheap does not transfer.
2. **No memory case.** Grid sharding exists for grids too large for one
   device.  All per-chain SGS state is 4 planes of (H, W) f32 — 4 MB at
   512², 13 MB at the 900² production domain (T1), so a single v5e chip
   holds hundreds of chains; the regime where sharding becomes necessary
   (≳16k²) is ~300x beyond any dataset the reference targets.
3. **Algorithmic mismatch at scale.** The SGS family is the *small-scale
   refinement* chain: 5-20-cell blocks (reference MCMC.py:1749-1756) on a
   bed already equilibrated by the large-scale CRF chain.  Random-scan MH
   mixing time scales like (grid_area / block_area); at a hypothetical
   16k² sharded grid an SB≈36 block update needs ~2e5 steps to touch each
   cell once — the production instrument at that scale is the CRF chain
   (which IS sharded here), with SGS applied per-tile afterwards.
Conclusion: grid-sharded SGS would add a per-step multi-shard gather to
serve a regime the algorithm is not used in; chains-axis parallelism (the
production axis, make_sgs_step_batched over a ``chains``-sharded batch) is
implemented and tested instead.  Mirrored in PARITY.md.
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
    """Place (H, W) arrays row-sharded over the grid axis.

    Multi-process aware via mesh._put: on a multi-host mesh the sharding
    is not fully addressable and ``jax.device_put`` refuses host data, so
    only this process's shards are materialized instead.
    """
    from .mesh import _put

    sharding = NamedSharding(mesh, P(grid_axis, None))
    # pass host data straight through: _put normalizes per branch, and a
    # jnp.asarray here would eagerly upload the FULL array to the default
    # device (seconds per op on the tunneled backend) only for the
    # multi-host branch to pull it back to host before re-uploading shards
    return jax.tree.map(lambda x: _put(x, sharding), tree)


def _make_local_crf_step(static, rows_local: int, grid_axis: str):
    """Per-shard incremental CRF MH step (runs inside shard_map).

    Mirrors chain_crf's windowed incremental scheme (models/chain_crf.py
    mh_update; reference MCMC.py:1292-1315 incl. the deliberate stale
    one-cell ring): a (RW, CW) window around the block-shard intersection is
    sliced, the windowed residual is recomputed with numpy-gradient
    semantics, and ONLY block cells are patched.  The one cross-shard
    subtlety: when the block touches a shard's row boundary, the central
    row-difference at a patched boundary row needs the neighbor's updated
    flux row, so each step exchanges ONE (1, CW) flux row in each direction
    with ``lax.ppermute`` — O(B^2) work + O(B) communication per step
    instead of the previous full-grid recompute.

    step(cons, state, rf_arrays, region_cells, sigma, resolution, row0,
         loss_prev, comp_prev, key) -> (state', loss', comp', key', accept)
    (loss carried with Kahan compensation ``comp``, like the main path)
    cons: (8, rows_local, W) local planes [surf, velx, vely, dhdt, smb,
    upd, mcf, crfw]; state: (2, rows_local, W) [bed, mc_res].
    """
    from ..models.randfield import draw_block

    H, W, B = static.H, static.W, static.rf.B
    n_shards = H // rows_local
    RW = min(rows_local, B + 4)
    CW = min(W, B + 4)
    SM = max(RW, CW)
    FP = 2 * SM + B  # canvas pad (chain_crf's trick)

    def step(cons, state, rf_arrays, region_cells, sigma, resolution, row0,
             loss_prev, comp_prev, key):
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

        # window placement: covers (block ∩ shard) plus a >=2-cell margin
        # wherever the block is interior to the shard / domain
        ls = jnp.clip(bxmin - 2 - row0, 0, rows_local - RW)
        cs = jnp.clip(bymin - 2, 0, W - CW)

        cw = jax.lax.dynamic_slice(cons, (0, ls, cs), (8, RW, CW))
        surf_w, velx_w, vely_w, dhdt_w, smb_w, upd_w, mcf_w, crfw_w = cw
        sw = jax.lax.dynamic_slice(state, (0, ls, cs), (2, RW, CW))
        bed_w, res_w = sw

        gr = row0 + ls + jax.lax.broadcasted_iota(jnp.int32, (RW, CW), 0)
        gc = cs + jax.lax.broadcasted_iota(jnp.int32, (RW, CW), 1)
        in_block = ((gr >= bxmin) & (gr < bxmax)
                    & (gc >= bymin) & (gc < bymax))

        # proposal canvas lookup; the slice start is clipped (shards whose
        # window does not intersect the block would index out of range) and
        # any misalignment is masked out by in_block
        fpad = jax.lax.dynamic_update_slice(
            jnp.zeros((FP, FP), f.dtype), f, (SM, SM))
        pert = jax.lax.dynamic_slice(
            fpad,
            (jnp.clip(SM + row0 + ls - off_x, 0, FP - RW),
             jnp.clip(SM + cs - off_y, 0, FP - CW)),
            (RW, CW)) * crfw_w
        pert = jnp.where(in_block & (upd_w > 0), pert, 0.0)
        bed_new_w = bed_w + pert

        # --- windowed residual with cross-shard halo flux rows --------------
        fx_w = velx_w * (surf_w - bed_new_w)
        fy_w = vely_w * (surf_w - bed_new_w)

        # flux rows to exchange: my boundary rows, updated iff the window
        # (and hence possibly the block) touches them; otherwise computed
        # from the unchanged state
        def old_flux_row(r_loc):
            c = jax.lax.dynamic_slice(cons, (0, r_loc, cs), (3, 1, CW))
            b = jax.lax.dynamic_slice(state, (0, r_loc, cs), (1, 1, CW))
            return (c[2, 0] * (c[0, 0] - b[0, 0]))  # vely*(surf-bed)

        fy_first = jnp.where(ls == 0, fy_w[0], old_flux_row(0))
        fy_last = jnp.where(ls + RW == rows_local, fy_w[-1],
                            old_flux_row(rows_local - 1))
        perm_fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        perm_bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]
        halo_top = jax.lax.ppermute(fy_last[None], grid_axis, perm_fwd)
        halo_bot = jax.lax.ppermute(fy_first[None], grid_axis, perm_bwd)

        # row above/below the window: in-shard unchanged rows when the
        # window is interior (the stale >=2-cell margin guarantees they are
        # unperturbed), neighbor halo rows at shard boundaries
        top_row = jnp.where(ls > 0,
                            old_flux_row(jnp.maximum(ls - 1, 0)),
                            halo_top[0])
        bot_row = jnp.where(ls + RW < rows_local,
                            old_flux_row(jnp.minimum(ls + RW,
                                                     rows_local - 1)),
                            halo_bot[0])

        fp_rows = jnp.concatenate([top_row[None], fy_w, bot_row[None]])
        dy = (fp_rows[2:] - fp_rows[:-2]) / (2.0 * resolution)
        g0 = row0 + ls
        dy = dy.at[0].set(jnp.where(g0 == 0,
                                    (fy_w[1] - fy_w[0]) / resolution, dy[0]))
        dy = dy.at[RW - 1].set(jnp.where(
            g0 + RW == H, (fy_w[-1] - fy_w[-2]) / resolution, dy[-1]))

        # columns are unsharded: central differences valid on interior
        # window cols (block cols are >=2 interior except at true domain
        # edges, where one-sided applies — the chain_crf invariant)
        dx = jnp.zeros_like(fx_w)
        dx = dx.at[:, 1:-1].set((fx_w[:, 2:] - fx_w[:, :-2])
                                / (2.0 * resolution))
        dx = dx.at[:, 0].set(jnp.where(
            cs == 0, (fx_w[:, 1] - fx_w[:, 0]) / resolution, dx[:, 0]))
        dx = dx.at[:, -1].set(jnp.where(
            cs + CW == W, (fx_w[:, -1] - fx_w[:, -2]) / resolution,
            dx[:, -1]))
        res_new_w = dx + dy + dhdt_w - smb_w

        # patch block cells only (stale ring, chain_crf semantics)
        patch = in_block & (mcf_w > 0)

        def nansq(x):
            s = x * x
            return jnp.where(jnp.isnan(s), 0.0, s)

        denom = 2.0 * jnp.square(sigma)
        d_local = (jnp.sum(jnp.where(patch, nansq(res_new_w), 0.0))
                   - jnp.sum(jnp.where(patch, nansq(res_w), 0.0)))
        delta = jax.lax.psum(d_local, grid_axis) / denom
        loss_next = loss_prev + delta

        viol_local = jnp.any(((surf_w - bed_new_w) <= 0.0) & in_block
                             & (upd_w > 0))
        viol = jax.lax.psum(viol_local.astype(jnp.int32), grid_axis) > 0
        loss_next = jnp.where(viol, jnp.inf, loss_next)

        u = jax.random.uniform(k_u, ())
        accept = u <= jnp.minimum(1.0, jnp.exp(loss_prev - loss_next))
        write = accept & ~viol

        res_patched_w = jnp.where(in_block, res_new_w, res_w)
        new_w = jnp.stack([
            jnp.where(write, bed_new_w, bed_w),
            jnp.where(write, res_patched_w, res_w),
        ])
        state = jax.lax.dynamic_update_slice(state, new_w, (0, ls, cs))
        # Kahan-compensated accumulation of accepted deltas (same as the
        # main chain path, chain_crf.py — at |loss| ~ 1e7 the f32 ulp is
        # ~1, so bare `loss + delta` loses O(1) deltas over long runs)
        y = jnp.where(write, delta, 0.0) - comp_prev
        t = loss_prev + y
        comp = (t - loss_prev) - y
        return state, t, comp, key, accept

    return step


def make_sharded_crf_chain(mesh: Mesh, static, grid_axis: str = "grid"):
    """Single-chain CRF sampler with the 2D domain row-sharded over devices.

    The pod-scale single-realization mode (SURVEY.md §5.7): for grids too
    large for one device's HBM, the bed/residual state lives sharded
    P(grid_axis, None); every device draws the SAME proposal (replicated
    keys), patches its local window (incremental stale-ring residual, the
    chain_crf scheme — O(B^2) per step, one halo flux row each way), and
    the accept decision uses psum'd loss deltas.

    Returns run(bed_sharded, consts_local (dict of sharded (H,W) planes +
    replicated scalars), key, n_iter) -> (bed', losses (n_iter,), steps).
    """
    H = static.H
    n_shards = mesh.shape[grid_axis]
    if H % n_shards:
        raise ValueError(f"grid rows {H} not divisible by {n_shards} shards")
    rows_local = H // n_shards
    spec = P(grid_axis, None)
    local_step = _make_local_crf_step(static, rows_local, grid_axis)

    def local_run(cons, state, rf_arrays, region_cells, sigma, resolution,
                  key, n_iter):
        row0 = jax.lax.axis_index(grid_axis) * rows_local
        surf, velx, vely, dhdt, smb, mcf = (cons[0], cons[1], cons[2],
                                            cons[3], cons[4], cons[6])
        res0 = _residual_local(state[0], surf, velx, vely, dhdt, smb,
                               resolution, grid_axis)
        state = jnp.stack([state[0], res0])
        sq = jnp.where(jnp.isnan(jnp.square(res0)), 0.0, jnp.square(res0))
        loss0 = jax.lax.psum(jnp.sum(jnp.where(mcf > 0, sq, 0.0)),
                             grid_axis) / (2.0 * jnp.square(sigma))

        def body(carry, _):
            state, loss, comp, key = carry
            state, loss, comp, key, accept = local_step(
                cons, state, rf_arrays, region_cells, sigma, resolution,
                row0, loss, comp, key)
            return (state, loss, comp, key), (loss, accept)

        (state, loss, _, _), (losses, steps) = jax.lax.scan(
            body, (state, loss0, jnp.float32(0.0), key), None, length=n_iter)
        return state[0], losses, steps

    def run(bed, consts, key, n_iter: int):
        def wrapped(bed, surf, velx, vely, dhdt, smb, upd, mcf, crfw,
                    rf_arrays, region_cells, sigma, resolution, key):
            cons = jnp.stack([surf, velx, vely, dhdt, smb, upd, mcf, crfw])
            state = jnp.stack([bed, jnp.zeros_like(bed)])
            return local_run(cons, state, rf_arrays, region_cells, sigma,
                             resolution, key, int(n_iter))

        fn = shard_map(
            wrapped, mesh=mesh,
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


def _residual_local(bed, surf, velx, vely, dhdt, smb, resolution, grid_axis):
    """Full local-shard residual (initialization / cross-checks)."""
    thick = surf - bed
    dx = _gradient_axis1_local(velx * thick, resolution)
    dy = _gradient_axis0_sharded(vely * thick, resolution, grid_axis)
    return dx + dy + dhdt - smb


def make_sharded_crf_chains(mesh: Mesh, static, chain_axis: str = "chains",
                            grid_axis: str = "grid"):
    """Combined chains x grid CRF sampler: ONE program using both mesh axes.

    Batched chains (data-parallel over ``chain_axis``) whose per-chain 2D
    grid is row-sharded over ``grid_axis`` — the full two-axis layout of
    SURVEY.md §2.3/§5.8.  Per-chain proposals are drawn from per-chain keys
    (replicated across the grid axis so every shard of a chain sees the
    same block); halo exchange and loss psums ride the grid axis only, and
    chains never communicate (reference share-nothing semantics).

    run(beds (C, H, W) sharded P(chains, grid, None), consts (dict of
    sharded (H, W) planes + replicated scalars), keys (C,), n_iter)
    -> (beds', losses (C, n_iter), steps (C, n_iter)).
    """
    H = static.H
    n_shards = mesh.shape[grid_axis]
    if H % n_shards:
        raise ValueError(f"grid rows {H} not divisible by {n_shards} shards")
    rows_local = H // n_shards
    local_step = _make_local_crf_step(static, rows_local, grid_axis)
    bspec = P(chain_axis, grid_axis, None)
    pspec = P(grid_axis, None)

    def local_run(beds, surf, velx, vely, dhdt, smb, upd, mcf, crfw,
                  rf_arrays, region_cells, sigma, resolution, keys, n_iter):
        cons = jnp.stack([surf, velx, vely, dhdt, smb, upd, mcf, crfw])
        row0 = jax.lax.axis_index(grid_axis) * rows_local

        def one_chain(bed, key):
            res0 = _residual_local(bed, surf, velx, vely, dhdt, smb,
                                   resolution, grid_axis)
            state = jnp.stack([bed, res0])
            sq = jnp.where(jnp.isnan(jnp.square(res0)), 0.0,
                           jnp.square(res0))
            loss0 = jax.lax.psum(jnp.sum(jnp.where(mcf > 0, sq, 0.0)),
                                 grid_axis) / (2.0 * jnp.square(sigma))

            def body(carry, _):
                state, loss, comp, key = carry
                state, loss, comp, key, accept = local_step(
                    cons, state, rf_arrays, region_cells, sigma, resolution,
                    row0, loss, comp, key)
                return (state, loss, comp, key), (loss, accept)

            (state, _, _, _), (losses, steps) = jax.lax.scan(
                body, (state, loss0, jnp.float32(0.0), key), None,
                length=n_iter)
            return state[0], losses, steps

        return jax.vmap(one_chain)(beds, keys)

    def run(beds, consts, keys, n_iter: int):
        fn = shard_map(
            partial(local_run, n_iter=int(n_iter)), mesh=mesh,
            in_specs=(bspec, pspec, pspec, pspec, pspec, pspec, pspec,
                      pspec, pspec, P(), P(), P(), P(), P(chain_axis)),
            out_specs=(bspec, P(chain_axis, None), P(chain_axis, None)),
            check_vma=False,
        )
        return jax.jit(fn)(
            beds, consts["surf"], consts["velx"], consts["vely"],
            consts["dhdt"], consts["smb"], consts["update_mask"],
            consts["mc_mask"], consts["crf_weight"], consts["rf"],
            consts["region_cells"], consts["sigma_mc"],
            consts["resolution"], keys)

    return run
