"""Minimized repro for the fused window kernel's >=448-chain compile crash.

Context (NOTES_ROUND3.md sweep B, NOTES_ROUND4.md): the production kernel
(mcmc_tpu/ops/window_kernel.py — grid=(N,) over chains, scalar prefetch,
HBM-aliased fields, SMEM (N, 1) outputs) compiles at N=384 and reproducibly
crashes the remote tpu_compile_helper at N>=448 on the axon v5e toolchain.

This script strips the kernel to successive minimal candidates and compiles
each at a given N, to isolate WHICH feature trips the compiler:

  stage 0: trivial kernel, grid=(N,), one VMEM (1,128) block output
  stage 1: + one SMEM (N, 1) whole-array output        <- suspect: SMEM
           scales with the grid and 3*448*4 B may exceed the SMEM budget
  stage 2: + three SMEM (N, 1) outputs (production count)
  stage 3: + scalar prefetch (2 int32 (N, 11)/(N, 6) operands)
  stage 4: + HBM input/output aliasing + a DMA copy (production skeleton)

Usage:  python tools/mosaic_repro.py <stage> <N>
Prints COMPILED or dies in the toolchain (the crash is a compiler-process
abort, not a Python exception — run each probe as its own process).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def stage0(N):
    def kern(o_ref):
        o_ref[...] = jnp.full((1, 128), 1.0, jnp.float32)

    f = pl.pallas_call(
        kern,
        grid=(N,),
        out_specs=pl.BlockSpec((1, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
    )
    return jax.jit(f).lower().compile()


def _smem_probe(N, n_outs):
    def kern(*refs):
        i = pl.program_id(0)
        for r in refs:
            r[i, 0] = jnp.float32(i)

    f = pl.pallas_call(
        kern,
        grid=(N,),
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * n_outs,
        out_shape=[jax.ShapeDtypeStruct((N, 1), jnp.float32)] * n_outs,
    )
    return jax.jit(f).lower().compile()


def stage1(N):
    return _smem_probe(N, 1)


def stage2(N):
    return _smem_probe(N, 3)


def stage3(N):
    def kern(geom, fvals, o1, o2, o3):
        i = pl.program_id(0)
        o1[i, 0] = jnp.float32(geom[i, 0])
        o2[i, 0] = fvals[i, 0]
        o3[i, 0] = jnp.float32(i)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N,),
        in_specs=[],
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3,
    )
    f = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((N, 1), jnp.float32)] * 3,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    geom = jnp.zeros((N, 11), jnp.int32)
    fvals = jnp.zeros((N, 6), jnp.float32)
    return jax.jit(lambda: f(geom, fvals)).lower().compile()


def stage4(N):
    H = W = 256
    SX, SY = 40, 256

    def kern(geom, fvals, fields_in, fields_out, o1, o2, o3,
             win, sem):
        i = pl.program_id(0)
        sx = geom[i, 0]
        cp = pltpu.make_async_copy(
            fields_in.at[pl.ds(i, 1), pl.ds(sx, SX), :],
            win.at[pl.ds(0, 1)],
            sem,
        )
        cp.start()
        cp.wait()
        o1[i, 0] = jnp.sum(win[0]) + fvals[i, 0]
        o2[i, 0] = jnp.float32(i)
        o3[i, 0] = jnp.float32(i)
        cp2 = pltpu.make_async_copy(
            win.at[pl.ds(0, 1)],
            fields_out.at[pl.ds(i, 1), pl.ds(sx, SX), :],
            sem,
        )
        cp2.start()
        cp2.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 3,
        scratch_shapes=[pltpu.VMEM((1, SX, SY), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    f = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((N, H, W), jnp.float32)]
        + [jax.ShapeDtypeStruct((N, 1), jnp.float32)] * 3,
        # alias indexing EXCLUDES the scalar-prefetch operands: inputs here
        # are (geom, fvals, fields) -> fields is index 2
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    geom = jnp.zeros((N, 11), jnp.int32)
    fvals = jnp.zeros((N, 6), jnp.float32)
    fields = jnp.zeros((N, H, W), jnp.float32)
    return jax.jit(lambda: f(geom, fvals, fields)).lower().compile()


def stage5(N):
    """Stage 3 with TRANSPOSED SMEM layouts — the fix for the stage-3 OOM.

    Root cause (measured 2026-08-19, full compiler error in NOTES_ROUND4):
    the toolchain pads the MINOR dim of every SMEM array to 128 lanes, so a
    (N, 11) i32 prefetch operand allocates N*128*4 B; at N=448 the five
    (N, *) arrays of stage 3 need 1.09 MiB of the 1.00 MiB SMEM budget
    (384 -> 0.94 MiB, which is why 384 compiled).  Storing them transposed
    — (11, N) operands, (1, N) outputs — the padding applies to N itself
    (multiple of 128) and SMEM usage drops ~10-100x.
    """
    def kern(geom, fvals, o1, o2, o3):
        i = pl.program_id(0)
        o1[0, i] = jnp.float32(geom[0, i])
        o2[0, i] = fvals[0, i]
        o3[0, i] = jnp.float32(i)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N,),
        in_specs=[],
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3,
    )
    f = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((1, N), jnp.float32)] * 3,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    geom = jnp.zeros((11, N), jnp.int32)
    fvals = jnp.zeros((6, N), jnp.float32)
    return jax.jit(lambda: f(geom, fvals)).lower().compile()


STAGES = [stage0, stage1, stage2, stage3, stage4, stage5]


def main():
    stage, N = int(sys.argv[1]), int(sys.argv[2])
    print(f"[repro] jax {jax.__version__} devices={jax.devices()} "
          f"stage={stage} N={N}", flush=True)
    STAGES[stage](N)
    print(f"COMPILED stage={stage} N={N}", flush=True)


if __name__ == "__main__":
    main()
