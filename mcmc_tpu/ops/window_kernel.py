"""Fused Pallas TPU kernel for the CRF chain's window phase.

Motivation (measured on v5e, 2026-08-16): XLA lowers vmapped
dynamic-slice / dynamic-update-slice with per-chain offsets to gather /
scatter, each costing ~1.3 ms per op regardless of slice size.  Even after
stacking planes to minimize op count, the MH step spends ~5 ms/step-batch in
4 such ops.  This kernel fuses the entire window phase — gather problem +
state windows, build the perturbation, windowed mass-conservation residual,
loss delta, thickness guard, MH accept, and the conditional in-place window
writeback — into ONE pallas_call with a grid over chains, using async DMA
(native on the DMA engines) instead of gather/scatter.

TPU DMA slices must be tile-aligned (sublane multiples of 8, lane multiples
of 128, or the full dimension), so the fused path uses an ALIGNED window:
size (SX, SY) = (roundup8(B+16), roundup128(B+132)) and start offsets
quantized to (8, 128) multiples chosen so the block plus its one-cell
gradient pad stays interior (or on a true domain edge).  The proposal
canvas is placed by a dynamic circular roll; wrap-around rows/cols always
land outside the block mask (see the geometry derivation in
models/chain_crf.make_batched_step_fused).

Numerics match models/chain_crf.make_kernel (asserted by
tests/test_window_kernel.py in interpreter mode and by the on-TPU drive
script); the XLA path remains the portable fallback.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def fused_window_sizes(H: int, W: int, B: int):
    """Aligned window sizes (SX, SY) for the fused path."""
    SX = min(H, _round_up(B + 16, 8))
    SY = min(W, _round_up(B + 132, 128))
    return SX, SY


def fused_path_supported(H: int, W: int, B: int) -> bool:
    """Aligned-window geometry needs divisible grid dims (or full-dim
    windows) so quantized starts stay aligned after clamping.  The window
    margins themselves always suffice: fused_window_sizes rounds up from
    B+16 / B+132, which covers the block plus the pad-1 stencil ring for
    any quantized start."""
    SX, SY = fused_window_sizes(H, W, B)
    return (((SX == H) or H % 8 == 0)
            and ((SY == W) or W % 128 == 0))


VMEM_RESIDENT_LIMIT = 8 * 1024 * 1024  # consts bytes; ~half of v5e VMEM


def make_fused_window_update(H: int, W: int, B: int, interpret: bool = False,
                             use_data_loss: bool = False,
                             prefinished: bool = False,
                             consts_resident: bool | None = None):
    """Build the fused window-update op.

    Returns fn(consts_stacked (8,H,W), fields (N,3,H,W), fraw (N,B,B),
               edge_masks (n_sizes,B,B), geom (N,11) int32, fvals (N,6) f32)
               -> (fields' (N,3,H,W), accept (N,), delta (N,), delta_data (N,))

    ``fraw`` is the RAW spectral field (irfft2 output): the kernel finishes
    the proposal itself — standardize to exact zero-mean/unit-variance over
    the (h, w) block (reference MCMC.py:248), multiply by the sampled scale,
    apply the logistic edge mask (DMA'd by size index — a vmapped XLA gather
    for the same lookup costs ~1ms) — then places it with pad + circular
    roll.  Nugget noise, when enabled, must be pre-added by the caller.

    geom rows: [sx, sy, shift_x, shift_y, bxmin, bxmax, bymin, bymax,
    h, w, size_idx] with (sx, sy) ALIGNED window starts.  fvals rows:
    [u, loss_prev(total), sigma_mc, resolution, sigma_data, scale].
    Internally geom/fvals/outputs are held TRANSPOSED — (11, N), (6, N),
    (1, N) — because the toolchain pads the MINOR dim of every SMEM array
    to 128 lanes: (N, k) layouts cost N*128*4 B each, which blows the 1 MiB
    SMEM budget at N>=448 (the round-3 'Mosaic crash' was this OOM —
    tools/mosaic_repro.py stages 3 vs 5, compiler error in NOTES_ROUND4).
    Transposed, SMEM cost is ~(k/128)x smaller and N=2048 compiles.
    fields planes: bed, mc_res, resampled; consts planes (packed, see
    CRFConsts.stacked): surf, velx, vely, forcing (dhdt-smb), maskpack
    (update + 2*mc), crf_weight [, cond_bed, data_loss_mask].  Only the
    first NP planes are DMA'd (6, or 8 with the data loss term) — the
    kernel is window-DMA bandwidth-bound, so plane count is the cost.
    """
    if not fused_path_supported(H, W, B):
        raise ValueError(
            f"fused window kernel unsupported for grid {H}x{W}, block {B}: "
            "clamped window starts would violate the pl.multiple_of "
            "alignment contract (need H%8==0 or full-height window, and "
            "W%128==0 or full-width window). Use impl='auto' or 'xla'.")
    SX, SY = fused_window_sizes(H, W, B)
    NP = 8 if use_data_loss else 6
    # consts_resident auto-decision is made per call in fn() (it needs the
    # edge-mask count); a forced True/False here is honored as-is

    def standardize_block(raw, bh, bw, scale):
        """Standardize the raw spectral field over the (bh, bw) block to
        exact zero mean / unit variance (population std + 1e-12, reference
        MCMC.py:248) and scale.  Kept separate from the edge-mask multiply
        so the HBM kernel can run this math WHILE the edge-mask DMA is in
        flight (compute/DMA overlap)."""
        bi = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
        bj = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
        bmask = ((bi < bh) & (bj < bw)).astype(jnp.float32)
        nblk = jnp.maximum(jnp.sum(bmask), 1.0)
        mean = jnp.sum(raw * bmask) / nblk
        var = jnp.sum(jnp.square(raw - mean) * bmask) / nblk
        return (raw - mean) / (jnp.sqrt(var) + 1e-12) * bmask * scale

    def finish_proposal(raw, bh, bw, scale, edge_bb):
        return standardize_block(raw, bh, bw, scale) * edge_bb

    def window_residual(surf_w, bed_new_w, velx_w, vely_w, forcing_w,
                        resolution):
        """Windowed mass-conservation residual, numpy-gradient semantics."""
        thick = surf_w - bed_new_w
        fx = velx_w * thick
        fy = vely_w * thick
        two_r = 2.0 * resolution
        dx = jnp.concatenate([
            (fx[:, 1:2] - fx[:, 0:1]) / resolution,
            (fx[:, 2:] - fx[:, :-2]) / two_r,
            (fx[:, -1:] - fx[:, -2:-1]) / resolution,
        ], axis=1)
        dy = jnp.concatenate([
            (fy[1:2, :] - fy[0:1, :]) / resolution,
            (fy[2:, :] - fy[:-2, :]) / two_r,
            (fy[-1:, :] - fy[-2:-1, :]) / resolution,
        ], axis=0)
        return dx + dy + forcing_w

    def place_canvas(f, shift_x, shift_y):
        """Static zero-pad to (SX, SY) + dynamic circular roll."""
        canvas = jnp.pad(f, ((0, SX - B), (0, SY - B)))
        if interpret:
            canvas = jnp.roll(canvas, shift_x, axis=0)
            canvas = jnp.roll(canvas, shift_y, axis=1)
        else:
            canvas = pltpu.roll(canvas, shift_x, 0)
            canvas = pltpu.roll(canvas, shift_y, 1)
        return canvas

    def nansq(x):
        s = x * x
        return jnp.where(jnp.isnan(s), 0.0, s)

    def kernel(geom_ref, fvals_ref, cons_hbm, fields_in, fraw_ref, edge_hbm,
               fields_out, acc_ref, delta_ref, ddata_ref,
               cons_vmem, st_vmem, new_vmem, edge_vmem, sems):
        del fields_in  # aliased with fields_out; all access goes through out
        i = pl.program_id(0)
        n_prog = pl.num_programs(0)
        # DOUBLE BUFFERING over the chain grid: with 256 chains x 3 DMAs the
        # per-DMA issue latency dominates the kernel (measured 2026-08-16:
        # plane-count cuts barely moved it), so program i prefetches chain
        # i+1's windows into the other scratch slot while computing chain i
        # (the geometry is scalar-prefetched, so i+1's slices are known).
        # Per-chain state regions are disjoint, so prefetching i+1's state
        # before i's conditional writeback completes is safe.
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        def window_dmas(j, s):
            sx_j = pl.multiple_of(geom_ref[0, j], 8) if SX != H else 0
            sy_j = pl.multiple_of(geom_ref[1, j], 128) if SY != W else 0
            cdma = pltpu.make_async_copy(
                cons_hbm.at[pl.ds(0, NP), pl.ds(sx_j, SX), pl.ds(sy_j, SY)],
                cons_vmem.at[s], sems.at[s, 0])
            sdma = pltpu.make_async_copy(
                fields_out.at[j, :, pl.ds(sx_j, SX), pl.ds(sy_j, SY)],
                st_vmem.at[s], sems.at[s, 1])
            # edge_hbm lanes are padded to 128 (DMA slice tiling); kernel
            # uses the leading (B, B) part
            edma = pltpu.make_async_copy(edge_hbm.at[geom_ref[10, j]],
                                         edge_vmem.at[s], sems.at[s, 2])
            return cdma, sdma, edma

        @pl.when(i == 0)
        def _():
            for d in window_dmas(0, 0):
                d.start()

        @pl.when(i + 1 < n_prog)
        def _():
            for d in window_dmas(i + 1, nxt):
                d.start()

        # alignment facts the host-side geometry guarantees (multiple_of
        # lets Mosaic prove the DMA slice starts are tile-aligned; full-dim
        # windows always start at literal 0)
        sx = pl.multiple_of(geom_ref[0, i], 8) if SX != H else 0
        sy = pl.multiple_of(geom_ref[1, i], 128) if SY != W else 0
        shift_x = geom_ref[2, i]
        shift_y = geom_ref[3, i]
        bh = geom_ref[8, i]
        bw = geom_ref[9, i]
        scale = fvals_ref[5, i]
        # (the block-bound and MH scalars are read by `tail` itself)

        cdma, sdma, edma = window_dmas(i, slot)

        if prefinished:
            # caller already standardized/scaled/edge-masked (nugget path)
            edma.wait()
            f = fraw_ref[0]
        else:
            # standardize while the edge-mask DMA is in flight; wait only
            # for the final multiply
            f = standardize_block(fraw_ref[0], bh, bw, scale)
            edma.wait()
            f = f * edge_vmem[slot][:, :B]

        canvas = place_canvas(f, shift_x, shift_y)

        cdma.wait()
        sdma.wait()

        tail(i, sx, sy, geom_ref, fvals_ref, canvas,
             lambda k: cons_vmem[slot][k], st_vmem[slot],
             fields_out, acc_ref, delta_ref, ddata_ref, new_vmem,
             sems.at[slot, 3])

    def tail(i, sx, sy, geom_ref, fvals_ref, canvas, cplane, sv,
             fields_out, acc_ref, delta_ref, ddata_ref, new_vmem, wsem):
        """Shared MH tail: perturbation, residual, loss delta, accept,
        conditional window writeback.  ``cplane(k)`` returns the k-th consts
        plane window (from DMA'd scratch or VMEM-resident consts)."""
        bxmin = geom_ref[4, i]
        bxmax = geom_ref[5, i]
        bymin = geom_ref[6, i]
        bymax = geom_ref[7, i]
        u = fvals_ref[0, i]
        loss_prev = fvals_ref[1, i]
        sigma = fvals_ref[2, i]
        resolution = fvals_ref[3, i]
        sigma_data = fvals_ref[4, i]

        surf_w = cplane(0)
        velx_w = cplane(1)
        vely_w = cplane(2)
        forcing_w = cplane(3)
        mp_w = cplane(4)
        crfw_w = cplane(5)
        upd_w = mp_w - 2.0 * jnp.floor(mp_w * 0.5)  # maskpack % 2
        bed_w = sv[0]
        res_old_w = sv[1]
        resampled_w = sv[2]

        rows = sx + jax.lax.broadcasted_iota(jnp.int32, (SX, SY), 0)
        cols = sy + jax.lax.broadcasted_iota(jnp.int32, (SX, SY), 1)
        in_block = ((rows >= bxmin) & (rows < bxmax)
                    & (cols >= bymin) & (cols < bymax))

        pert = canvas * crfw_w
        pert = jnp.where(in_block & (upd_w > 0), pert, 0.0)
        bed_new_w = bed_w + pert

        res_new_w = window_residual(surf_w, bed_new_w, velx_w, vely_w,
                                    forcing_w, resolution)

        patch = in_block & (mp_w >= 2.0)

        denom = 2.0 * sigma * sigma
        delta = (jnp.sum(jnp.where(patch, nansq(res_new_w), 0.0))
                 - jnp.sum(jnp.where(patch, nansq(res_old_w), 0.0))) / denom
        if use_data_loss:
            cond_w = cplane(6)
            dmask_w = cplane(7)
            dpatch = in_block & (dmask_w > 0)
            ddenom = 2.0 * sigma_data * sigma_data
            delta_data = (jnp.sum(jnp.where(dpatch, nansq(bed_new_w - cond_w), 0.0))
                          - jnp.sum(jnp.where(dpatch, nansq(bed_w - cond_w), 0.0))
                          ) / ddenom
        else:
            delta_data = jnp.float32(0.0)
        loss_next = loss_prev + delta + delta_data

        viol = jnp.any(((surf_w - bed_new_w) <= 0.0) & in_block & (upd_w > 0))
        loss_next = jnp.where(viol, jnp.inf, loss_next)

        rate = jnp.minimum(1.0, jnp.exp(loss_prev - loss_next))
        accept = u <= rate

        acc_ref[0, i] = (accept & ~viol).astype(jnp.float32)
        delta_ref[0, i] = jnp.where(accept & ~viol, delta, 0.0)
        ddata_ref[0, i] = jnp.where(accept & ~viol, delta_data, 0.0)

        @pl.when(accept & ~viol)
        def _():
            new_vmem[0] = bed_new_w
            new_vmem[1] = jnp.where(in_block, res_new_w, res_old_w)
            new_vmem[2] = resampled_w + jnp.where(in_block, upd_w, 0.0)
            wdma = pltpu.make_async_copy(
                new_vmem, fields_out.at[i, :, pl.ds(sx, SX), pl.ds(sy, SY)],
                wsem)
            wdma.start()
            wdma.wait()

    def kernel_res(geom_ref, fvals_ref, cons_vm, fields_in, fraw_ref, edge_vm,
                   fields_out, acc_ref, delta_ref, ddata_ref,
                   st_vmem, new_vmem, sems):
        """VMEM-resident variant: consts + edge masks live whole in VMEM
        (constant index maps — copied in once, reused across the chain
        grid), so the only per-chain DMAs are the state-window read and the
        conditional writeback.  The per-chain DMA *issue* latency — not
        bandwidth — dominates the HBM variant (measured 2026-08-16), so
        halving the issue count is the lever; it also removes the consts
        window HBM re-reads entirely."""
        del fields_in
        i = pl.program_id(0)
        n_prog = pl.num_programs(0)
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        def state_dma(j, s):
            sx_j = pl.multiple_of(geom_ref[0, j], 8) if SX != H else 0
            sy_j = pl.multiple_of(geom_ref[1, j], 128) if SY != W else 0
            return pltpu.make_async_copy(
                fields_out.at[j, :, pl.ds(sx_j, SX), pl.ds(sy_j, SY)],
                st_vmem.at[s], sems.at[s, 0])

        @pl.when(i == 0)
        def _():
            state_dma(0, 0).start()

        @pl.when(i + 1 < n_prog)
        def _():
            state_dma(i + 1, nxt).start()

        sx = pl.multiple_of(geom_ref[0, i], 8) if SX != H else 0
        sy = pl.multiple_of(geom_ref[1, i], 128) if SY != W else 0
        shift_x = geom_ref[2, i]
        shift_y = geom_ref[3, i]
        bh = geom_ref[8, i]
        bw = geom_ref[9, i]
        scale = fvals_ref[5, i]

        if prefinished:
            f = fraw_ref[0]
        else:
            f = finish_proposal(fraw_ref[0], bh, bw, scale,
                                edge_vm[geom_ref[10, i]][:, :B])
        canvas = place_canvas(f, shift_x, shift_y)

        state_dma(i, slot).wait()

        def cplane(k):
            return cons_vm[k, pl.ds(sx, SX), pl.ds(sy, SY)]

        tail(i, sx, sy, geom_ref, fvals_ref, canvas, cplane, st_vmem[slot],
             fields_out, acc_ref, delta_ref, ddata_ref, new_vmem,
             sems.at[slot, 1])

    def fn(consts_stacked, fields, fraw, edge_masks, geom, fvals):
        N = fields.shape[0]
        # pad edge-mask lanes to the 128 tile so the by-index DMA slice /
        # VMEM layout is tiling-aligned
        EBL = _round_up(B, 128)
        n_sizes = edge_masks.shape[0]
        if edge_masks.shape[-1] != EBL:
            edge_masks = jnp.pad(edge_masks,
                                 ((0, 0), (0, 0), (0, EBL - B)))
        if consts_resident is None:
            # v5e VMEM is ~16 MB/core; budget EVERYTHING the resident
            # variant keeps there at once — consts planes, the full
            # edge-mask stack, the fraw block, and the state/new scratch —
            # against roughly half of it, else per-chain DMAs
            resident_bytes = 4 * (NP * H * W              # consts planes
                                  + n_sizes * B * EBL     # edge masks
                                  + B * B                 # fraw block
                                  + (2 * 3 + 3) * SX * SY)  # state scratch
            resident = resident_bytes <= VMEM_RESIDENT_LIMIT
        else:
            resident = consts_resident
        if resident:
            in_specs = [
                # consts + edge masks whole in VMEM, constant index map ->
                # copied once, reused for every chain of the grid
                pl.BlockSpec((NP, H, W), lambda i, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),     # fields (aliased)
                pl.BlockSpec((1, B, B), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),    # fraw
                pl.BlockSpec((n_sizes, B, EBL), lambda i, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ]
            scratch_shapes = [
                pltpu.VMEM((2, 3, SX, SY), jnp.float32),  # double-buffered
                pltpu.VMEM((3, SX, SY), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ]
            kern = kernel_res
            consts_in = consts_stacked[:NP]
        else:
            in_specs = [
                pl.BlockSpec(memory_space=pltpu.HBM),     # consts (8,H,W)
                pl.BlockSpec(memory_space=pltpu.HBM),     # fields (aliased)
                pl.BlockSpec((1, B, B), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),    # fraw
                pl.BlockSpec(memory_space=pltpu.HBM),     # edge_masks
            ]
            scratch_shapes = [
                pltpu.VMEM((2, NP, SX, SY), jnp.float32),   # double-buffered
                pltpu.VMEM((2, 3, SX, SY), jnp.float32),
                pltpu.VMEM((3, SX, SY), jnp.float32),
                pltpu.VMEM((2, B, EBL), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 4)),
            ]
            kern = kernel
            consts_in = consts_stacked
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(N,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),     # fields (aliased)
                pl.BlockSpec(memory_space=pltpu.SMEM),    # accept (1,N)
                pl.BlockSpec(memory_space=pltpu.SMEM),    # delta (1,N)
                pl.BlockSpec(memory_space=pltpu.SMEM),    # delta_data (1,N)
            ],
            scratch_shapes=scratch_shapes,
        )
        fields_out, acc, delta, ddata = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct(fields.shape, fields.dtype),
                jax.ShapeDtypeStruct((1, N), jnp.float32),
                jax.ShapeDtypeStruct((1, N), jnp.float32),
                jax.ShapeDtypeStruct((1, N), jnp.float32),
            ],
            input_output_aliases={3: 0},  # fields (4th operand incl. the 2
            # scalar-prefetch args) aliases the first output
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(geom.T, fvals.T, consts_in, fields, fraw, edge_masks)
        return fields_out, acc[0], delta[0], ddata[0]

    return fn
