"""Pallas TPU kernels for the SGS chain's window extract / writeback.

Motivation (measured on the v5e-1 bench device, 2026-08-19): the SGS
step's three per-chain dynamic window ops — slice the 10 shared const
planes, slice the 4 state planes, update-slice the state back — cost
5.96 ms/step-batch at 512 chains in isolation (64% of the 9.35 ms step;
/tmp/ds_probe.py), because XLA lowers vmapped dynamic slices with
per-chain offsets to gathers with ~ms-class per-op overhead.  These
kernels move the window phase onto the DMA engines, the same cure as the
CRF chain's ops/window_kernel.

Geometry: TPU DMA/VMEM slice starts must be tile-aligned (sublanes %8,
lanes %128), so both kernels work on an ALIGNED slab — (SXA, SYA) =
(roundup8(SB+8), roundup128(SB+128)), starts quantized down — and shift
the tight (SB, SB) window in/out of it with dynamic rolls (pltpu.roll).
The const planes (10·H·W·4 B ≈ 10 MB at 512²) are VMEM-RESIDENT with a
constant index map (copied in once per launch; v5e VMEM is 128 MiB); the
per-chain state windows are DMA'd, double-buffered over the chain grid.

Both kernels are pure data movement — extracted windows and written-back
planes are BITWISE identical to the XLA dynamic-slice path (asserted in
tests/test_sgs_window_kernel.py in interpret mode, and by the on-TPU
batched-vs-XLA trajectory A/B).

Reference analog: the window copies of the sequential SGS inner loop
(MCMC.py:1766-1776), here at farm scale.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def aligned_slab(H: int, W: int, SB: int):
    """Aligned slab sizes covering an (SB, SB) window at any clamped
    start: sublane offset after quantization is < 8 (or < SXA-SB at the
    clamp edge, which equals 8), lane offset < 128 (or SYA-SB)."""
    SXA = min(H, _round_up(SB + 8, 8))
    SYA = min(W, _round_up(SB + 128, 128))
    return SXA, SYA


def sgs_window_kernel_available() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def slab_geometry(sx, sy, H: int, W: int, SB: int):
    """Quantized slab starts + in-slab offsets for (possibly batched)
    window starts.  Returns (sx0, dx, sy0, dy), all int32."""
    SXA, SYA = aligned_slab(H, W, SB)
    sx0 = jnp.minimum((sx // 8) * 8, H - SXA)
    sy0 = jnp.minimum((sy // 128) * 128, W - SYA)
    return (sx0.astype(jnp.int32), (sx - sx0).astype(jnp.int32),
            sy0.astype(jnp.int32), (sy - sy0).astype(jnp.int32))


def make_window_extract(H: int, W: int, SB: int, NP: int, NS: int,
                        interpret: bool = False):
    """Build the window-extract op.

    Returns fn(cons (NP,H,W), fields (N,NS,H,W), sx (N,), sy (N,))
              -> windows (N, NP+NS, SB, SB)
    with windows[i, :NP] == cons[:, sx:sx+SB, sy:sy+SB] and
    windows[i, NP:] == fields[i, :, sx:sx+SB, sy:sy+SB], bitwise.
    """
    SXA, SYA = aligned_slab(H, W, SB)

    def roll_tight(p, dx, dy):
        if interpret:
            r = jnp.roll(p, -dx, axis=0)
            r = jnp.roll(r, -dy, axis=1)
        else:
            r = pltpu.roll(p, SXA - dx, 0)
            r = pltpu.roll(r, SYA - dy, 1)
        return r[:SB, :SB]

    def kern(geom, cons_vm, fields_hbm, out_ref, svm, sems):
        i = pl.program_id(0)
        n_prog = pl.num_programs(0)
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        def sdma(j, s):
            sx0j = pl.multiple_of(geom[0, j], 8) if SXA != H else 0
            sy0j = pl.multiple_of(geom[2, j], 128) if SYA != W else 0
            return pltpu.make_async_copy(
                fields_hbm.at[j, :, pl.ds(sx0j, SXA), pl.ds(sy0j, SYA)],
                svm.at[s], sems.at[s])

        @pl.when(i == 0)
        def _():
            sdma(0, 0).start()

        @pl.when(i + 1 < n_prog)
        def _():
            sdma(i + 1, nxt).start()

        sx0 = pl.multiple_of(geom[0, i], 8) if SXA != H else 0
        dx = geom[1, i]
        sy0 = pl.multiple_of(geom[2, i], 128) if SYA != W else 0
        dy = geom[3, i]

        for k in range(NP):
            cw = cons_vm[k, pl.ds(sx0, SXA), pl.ds(sy0, SYA)]
            out_ref[0, k] = roll_tight(cw, dx, dy)
        sdma(i, slot).wait()
        for k in range(NS):
            out_ref[0, NP + k] = roll_tight(svm[slot][k], dx, dy)

    def fn(cons, fields, sx, sy):
        N = fields.shape[0]
        sx0, dx, sy0, dy = slab_geometry(sx, sy, H, W, SB)
        geom = jnp.stack([sx0, dx, sy0, dy])  # (4, N): SMEM lane layout
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N,),
            in_specs=[
                pl.BlockSpec((NP, H, W), lambda i, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # consts resident
                pl.BlockSpec(memory_space=pl.ANY),   # fields (HBM)
            ],
            out_specs=pl.BlockSpec((1, NP + NS, SB, SB),
                                   lambda i, *_: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, NS, SXA, SYA), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((N, NP + NS, SB, SB),
                                           jnp.float32),
            interpret=interpret,
        )(geom, cons, fields)

    return fn


def make_window_writeback(H: int, W: int, SB: int, NS: int,
                          interpret: bool = False):
    """Build the conditional window-writeback op.

    Returns fn(fields (N,NS,H,W), new_w (N,NS,SB,SB), sx (N,), sy (N,),
               write (N,) bool) -> fields'
    with fields'[i] == dynamic_update_slice(fields[i], new_w[i], (0,sx,sy))
    where write[i], else fields[i] — bitwise (untouched slab cells are
    rewritten with the exact values just read).
    """
    SXA, SYA = aligned_slab(H, W, SB)

    def kern(geom, wr, fields_in, new_ref, fields_out, vm, sem):
        del fields_in  # aliased: all access through fields_out
        i = pl.program_id(0)
        sx0 = pl.multiple_of(geom[0, i], 8) if SXA != H else 0
        dx = geom[1, i]
        sy0 = pl.multiple_of(geom[2, i], 128) if SYA != W else 0
        dy = geom[3, i]

        @pl.when(wr[0, i] > 0)
        def _():
            rdma = pltpu.make_async_copy(
                fields_out.at[i, :, pl.ds(sx0, SXA), pl.ds(sy0, SYA)],
                vm, sem)
            rdma.start()
            rdma.wait()
            rows = jax.lax.broadcasted_iota(jnp.int32, (SXA, SYA), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (SXA, SYA), 1)
            mask = ((rows >= dx) & (rows < dx + SB)
                    & (cols >= dy) & (cols < dy + SB))
            for k in range(NS):
                canvas = jnp.pad(new_ref[0, k],
                                 ((0, SXA - SB), (0, SYA - SB)))
                if interpret:
                    canvas = jnp.roll(canvas, dx, axis=0)
                    canvas = jnp.roll(canvas, dy, axis=1)
                else:
                    canvas = pltpu.roll(canvas, dx, 0)
                    canvas = pltpu.roll(canvas, dy, 1)
                vm[k] = jnp.where(mask, canvas, vm[k])
            wdma = pltpu.make_async_copy(
                vm, fields_out.at[i, :, pl.ds(sx0, SXA), pl.ds(sy0, SYA)],
                sem)
            wdma.start()
            wdma.wait()

    def fn(fields, new_w, sx, sy, write):
        N = fields.shape[0]
        sx0, dx, sy0, dy = slab_geometry(sx, sy, H, W, SB)
        geom = jnp.stack([sx0, dx, sy0, dy])          # (4, N)
        wr = write.astype(jnp.float32)[None, :]        # (1, N)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(N,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # fields (aliased)
                pl.BlockSpec((1, NS, SB, SB), lambda i, *_: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((NS, SXA, SYA), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(fields.shape, fields.dtype),
            input_output_aliases={2: 0},  # fields (after the 2 prefetch args)
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(geom, wr, fields, new_w)

    return fn
