"""Batched Gaussian noise generation with the TPU hardware PRNG (Pallas).

The CRF proposal draw needs 2 * B * (B//2+1) standard normals per chain per
iteration (the half-spectrum complex white noise of ops/spectral).  XLA's
threefry ``jax.random.normal`` shows up as ~0.11 ms of the 0.76 ms
step-batch at 256 chains (surgery-measured 2026-08-17); the TPU's hardware
PRNG (``pltpu.prng_random_bits``) generates the bits nearly for free.

STATUS: validated but OPT-IN only (``MCMC_TPU_CRF_SURGERY=hwrng``).  On
the tunneled axon v5e-1 the end-to-end step is a measured net LOSS
(0.815 vs 0.770 ms/step-batch): the kernel's HBM output write plus the
complex re-assembly pass cost more than the threefry it saves — most of
the apparent "RNG cost" in the surgery gate was really the noise
MATERIALIZATION, which any generator pays.  Re-evaluate on non-tunneled
hardware.  (A per-chain seed+generate loop variant was worse still:
+0.15 ms — 256 sequential ``prng_seed`` calls.)

The stream differs from ``jax.random.normal`` (different PRNG), which is
fine: CRF parity with the reference is statistical, never draw-for-draw
(see models/chain_crf.py docstring).  Statistical quality (moments,
normality, chain independence) was validated on the real TPU:
mean -8e-4, std 0.9996, KS p=0.38, max cross-chain |corr| 0.056 at
256x160x41 — consistent with N(0,1) i.i.d.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hw_rng_available() -> bool:
    """True when the default backend can run the hardware-PRNG kernel
    (TPU, incl. the tunneled axon backend); the Pallas TPU primitives have
    no CPU interpret implementation in this JAX version."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _noise_kernel(R: int, L: int, seed_ref, out_ref):
    """One program per chain TILE: seed the hw PRNG from the folded batch
    seed + program id, then emit the tile's (TN, R, L) normals from one
    sin/cos Box-Muller pass (each uniform pair yields TWO normals, halving
    the generated bits and the VMEM peak).

    A per-chain seed+generate loop costs MORE than XLA threefry (measured
    +0.15 ms at 256 chains, 2026-08-17: 256 sequential prng_seed calls +
    lane-masked small generates); bulk tile generation is the only shape
    that beats it."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    TN = out_ref.shape[0]
    half = R // 2
    # distinct deterministic seed per tile (int32 wraparound is fine)
    pltpu.prng_seed(seed_ref[0] ^ (i * jnp.int32(-1640531527)), seed_ref[1])
    # random bits arrive as SIGNED int32 and Mosaic can't cast
    # uint32->f32: mask to the low 24 bits (always non-negative in
    # int32) before the float conversion — a sign-carrying shift would
    # make u<0 and log(u) would poison everything with NaNs
    bits1 = pltpu.prng_random_bits((TN, half, L)) & jnp.int32(0xFFFFFF)
    bits2 = pltpu.prng_random_bits((TN, half, L)) & jnp.int32(0xFFFFFF)
    # 24-bit uniforms in (0, 1): u = bits * 2^-24 (+ 2^-25 off zero)
    u1 = bits1.astype(jnp.float32) * jnp.float32(2.0 ** -24) \
        + jnp.float32(2.0 ** -25)
    u2 = bits2.astype(jnp.float32) * jnp.float32(2.0 ** -24)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    t = jnp.float32(2.0 * np.pi) * u2
    out_ref[:, :half] = r * jnp.cos(t)
    out_ref[:, half:] = r * jnp.sin(t)


@functools.partial(jax.jit, static_argnames=("rows", "cols", "interpret"))
def batched_normal(keys, rows: int, cols: int, interpret: bool = False):
    """(N,) threefry keys -> (N, rows, cols) f32 standard normals.

    Deterministic in the BATCH of keys: the per-chain key words are folded
    (XOR-rotate) into one 64-bit seed, so the whole batch's noise is a pure
    function of the batch keys (checkpoint/resume stays bitwise — keys are
    state) but individual chains' streams are not functions of their own
    key alone, unlike ``vmap(jax.random.normal)``.  Fine for MCMC: the
    proposal noise need only be independent of the state and
    well-distributed (tests/test_noise_kernel statistics).

    Tail note: the Box-Muller uniforms use 24-bit mantissas with
    ``u1 >= 2^-25``, so ``r = sqrt(-2 ln u1)`` is capped at ~5.89 —
    the normal tail is truncated at |z| <= ~5.9 sigma (an exact N(0,1)
    would exceed that about once per 5e8 draws).  Harmless for MCMC
    proposal noise, but this is NOT a full-tail N(0,1) generator."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    data = jax.random.key_data(keys).astype(jnp.int32)  # (N, 2) threefry2x32
    data = data.reshape(data.shape[0], -1)
    # rotate-by-index XOR fold: order-sensitive, collision-resistant enough
    # for seeding (distinct batches of keys -> distinct seeds w.h.p.)
    idx = jnp.arange(data.shape[0], dtype=jnp.int32) % 31 + 1
    folded = jnp.bitwise_xor(
        jax.lax.shift_left(data, idx[:, None]),
        jax.lax.shift_right_logical(data, 32 - idx[:, None]))
    seed2 = jnp.bitwise_xor(
        jax.lax.reduce(folded, jnp.int32(0), jax.lax.bitwise_xor, (0,)),
        data[0])  # (2,)
    N = data.shape[0]
    if rows % 2:
        raise ValueError("rows must be even (sin/cos Box-Muller pairs)")
    # tile the chain axis so one tile's VMEM footprint stays small: the
    # (TN, rows, cols) f32 output block + two (TN, rows/2, cols) int32 bit
    # arrays + Box-Muller intermediates — budget ~4x the output block
    # against a 4 MB target (v5e VMEM is ~16 MB/core)
    tile_bytes = rows * cols * 4 * 4
    TN = 1
    for cand in (64, 32, 16, 8, 4, 2, 1):
        if N % cand == 0 and cand <= N and cand * tile_bytes <= 4 * 2 ** 20:
            TN = cand
            break
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,       # seeds land in SMEM
        grid=(N // TN,),
        in_specs=[],
        out_specs=pl.BlockSpec((TN, rows, cols), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_noise_kernel, rows, cols),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, rows, cols), jnp.float32),
        interpret=interpret,
    )(seed2)
    return out
