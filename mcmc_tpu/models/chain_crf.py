"""Large-scale MCMC chain with random-field block proposals (TPU hot path).

TPU-native redesign of the reference ``chain_crf``
(reference: gstatsMCMC/MCMC.py:1083-1443, and the torch port MCMC_gpu.py:233-582).

Design (vs. the reference's per-iteration Python loop):

- The whole Metropolis-Hastings loop is a single ``lax.scan`` over a pure
  ``step(consts, state)`` function — no host round-trip per iteration (the
  torch port syncs host<->device twice per iteration, MCMC_gpu.py:369,449).
- Block proposals come from one statically-shaped (B, B) FFT
  (models/randfield.py); the discrete size menu is handled by masks.
- The block center is drawn uniformly over precomputed region cells
  (categorical), the same distribution as the reference's rejection loop
  (MCMC.py:1253-1258) without data-dependent control flow.
- Residual + loss updates are **block-local**: a fixed (S, S) window
  (S = B + 4) is gathered with ``dynamic_slice``, the residual is evaluated
  with numpy-gradient semantics on the window, and only block cells are
  patched into the global residual — exactly the reference's incremental
  scheme (MCMC.py:1292-1315), including its deliberate choice to leave the
  one-cell ring outside the block stale.  Per-iteration cost is O(B^2)
  instead of the reference's O(H*W) full-grid masking + loss reduction.
- The window placement invariant (every patched cell is interior to the
  window or lies on a true domain edge coinciding with the window edge)
  makes the windowed gradient bitwise-equal to the global one; it requires
  S >= max_block + 4 and is asserted at build time.
- The loss is accumulated by Kahan-compensated summation of block deltas;
  the MH decision uses the freshly computed delta, so accept/reject is
  unaffected by accumulation drift, and segment boundaries re-baseline the
  reported loss.

Multi-chain execution = ``vmap`` over the state (see parallel/sampler.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.distance import min_dist_from_mask
from ..ops.logistic import crf_weight_from_dist
from ..ops.physics import (
    mass_conservation_residual,
    masked_gaussian_loss,
    masked_sq_sum,
)
from ..utils.config import BlockMenuConfig, LossConfig, RandFieldConfig, WeightConfig
from ..utils.rng import as_key
from .randfield import RandFieldArrays, RandFieldStatic, build_randfield, draw_block


@dataclasses.dataclass(frozen=True)
class CRFStatic:
    """Hashable static configuration baked into the compiled step."""

    H: int
    W: int
    S: int          # local window size (<= min(H, W), >= max block + 4 if possible)
    n_region: int   # number of candidate block-center cells
    P: int          # number of probe points
    rf: RandFieldStatic
    use_data_loss: bool = False  # Gaussian data-misfit term (the reference's
    # designed-but-disabled diff_func machinery, MCMC.py:931-1018)


@dataclasses.dataclass
class CRFConsts:
    """Per-problem array constants (one copy, shared across chains)."""

    # The problem planes live STACKED in one (8, H, W) array: the hot loop
    # gathers its local window with ONE batched dynamic_slice.  On TPU each
    # vmapped dynamic-slice/scatter op costs ~1ms regardless of size (XLA
    # lowers per-chain offsets to gather), so op COUNT is what matters —
    # and the fused kernel is window-DMA bandwidth-bound, so plane COUNT
    # matters too (measured 2026-08-16: kernel ~0.81 of a 0.97 ms
    # step-batch at 256 chains).  Hence the packing:
    #   3: forcing  = dhdt - smb  (the residual only ever uses the
    #      difference, Topography.py:592-600)
    #   4: maskpack = update_mask + 2*mc_mask  (floats {0, 1, 2, 3})
    # and the two data-loss planes sit LAST so the kernel DMAs only the
    # first 6 planes when use_data_loss is off (the production configs).
    # Plane order: surf, velx, vely, forcing, maskpack, crf_weight,
    # cond_bed (NaN->0), data_loss_mask.
    stacked: jnp.ndarray       # (8, H, W) float32
    region_cells: jnp.ndarray  # (n_region, 2) int32 candidate centers
    sample_ij: jnp.ndarray     # (P, 2) int32 probe cells
    sigma_mc: jnp.ndarray      # scalar
    sigma_data: jnp.ndarray    # scalar (unused unless static.use_data_loss)
    resolution: jnp.ndarray    # scalar
    rf: RandFieldArrays

    # named plane views (setup/diagnostic paths; the hot loop uses `stacked`)
    @property
    def surf(self):
        return self.stacked[0]

    @property
    def velx(self):
        return self.stacked[1]

    @property
    def vely(self):
        return self.stacked[2]

    @property
    def forcing(self):
        """dhdt - smb (the residual uses only the difference)."""
        return self.stacked[3]

    @property
    def update_mask(self):
        return jnp.mod(self.stacked[4], 2.0)

    @property
    def mc_mask(self):
        return self.stacked[4] >= 2.0

    @property
    def crf_weight(self):
        return self.stacked[5]

    @property
    def cond_bed_filled(self):
        return self.stacked[6]

    @property
    def data_loss_mask(self):
        return self.stacked[7] > 0


@dataclasses.dataclass
class ChainState:
    """Per-chain mutable state (the scan carry; batched by vmap).

    The three mutable planes (bed, patched residual, resample counter) are
    stacked in one (3, H, W) array for the same one-slice/one-scatter reason
    as CRFConsts.stacked.
    """

    fields: jnp.ndarray     # (3, H, W): bed, mc_res, resampled
    loss_mc: jnp.ndarray    # scalar
    loss_comp: jnp.ndarray  # Kahan compensation
    loss_data: jnp.ndarray  # scalar (0 unless use_data_loss)
    loss_data_comp: jnp.ndarray
    key: jnp.ndarray
    accepted: jnp.ndarray   # int32

    @property
    def bed(self):
        return self.fields[..., 0, :, :]

    @property
    def mc_res(self):
        return self.fields[..., 1, :, :]

    @property
    def resampled(self):
        return self.fields[..., 2, :, :]


import jax.tree_util as _tu

for _cls in (CRFConsts, ChainState):
    _fields = [f.name for f in dataclasses.fields(_cls)]
    _tu.register_pytree_node(
        _cls,
        (lambda fields: (lambda c: (tuple(getattr(c, f) for f in fields), None)))(_fields),
        (lambda cls2, fields: (lambda aux, ch: cls2(**dict(zip(fields, ch)))))(_cls, _fields),
    )


@jax.jit
def init_state(bed, key, consts: CRFConsts) -> ChainState:
    """Fresh chain state: full-grid residual + loss (reference MCMC.py:1184-1195)."""
    bed = jnp.asarray(bed, jnp.float32)
    mc_res = mass_conservation_residual(
        bed, consts.surf, consts.velx, consts.vely, consts.forcing,
        jnp.float32(0.0), consts.resolution,
    )
    loss_mc = masked_gaussian_loss(mc_res, consts.mc_mask, consts.sigma_mc)
    data_diff = bed - consts.cond_bed_filled
    loss_data = masked_gaussian_loss(data_diff, consts.data_loss_mask,
                                     jnp.maximum(consts.sigma_data, 1e-9))
    fields = jnp.stack([bed, mc_res, jnp.zeros(bed.shape, jnp.float32)])
    return ChainState(
        fields=fields,
        loss_mc=jnp.float32(loss_mc),
        loss_comp=jnp.float32(0.0),
        loss_data=jnp.float32(loss_data),
        loss_data_comp=jnp.float32(0.0),
        key=key,
        accepted=jnp.int32(0),
    )


def make_kernel(static: CRFStatic):
    """Build the MH update core: (consts, state, f, h, w, cx, cy, u, key) ->
    (state, trace).  Separated from the random draws so tests can inject a
    proposal and compare bitwise against a NumPy re-derivation of the
    reference update (tests/reference_impl.py)."""
    H, W, S, B = static.H, static.W, static.S, static.rf.B

    def mh_update(consts: CRFConsts, state: ChainState, f, h, w, cx, cy, u, key):
        # --- block placement (reference MCMC.py:1253-1276) -------------------
        bxmin = jnp.maximum(0, (2 * cx - h) // 2)
        bxmax = jnp.minimum(H, (2 * cx + h) // 2)
        bymin = jnp.maximum(0, (2 * cy - w) // 2)
        bymax = jnp.minimum(W, (2 * cy + w) // 2)
        off_x = (2 * cx - h) // 2  # global row g maps to field row g - off_x
        off_y = (2 * cy - w) // 2

        # --- fixed-size local window ----------------------------------------
        sx = jnp.clip(bxmin - 1, 0, H - S)
        sy = jnp.clip(bymin - 1, 0, W - S)
        rows = sx + jnp.arange(S)
        cols = sy + jnp.arange(S)
        in_rows = (rows >= bxmin) & (rows < bxmax)
        in_cols = (cols >= bymin) & (cols < bymax)
        in_block = in_rows[:, None] & in_cols[None, :]

        # ONE batched slice each for the 8 problem planes and 3 state planes
        # (each vmapped dynamic-slice op costs ~1ms on TPU regardless of
        # size, so everything windowed travels stacked)
        NP = 8 if static.use_data_loss else 6
        cw = jax.lax.dynamic_slice(consts.stacked[:NP], (0, sx, sy),
                                   (NP, S, S))
        surf_w, velx_w, vely_w, forcing_w, mp_w, crfw_w = cw[:6]
        if static.use_data_loss:
            cond_w, dmask_w = cw[6], cw[7]
        upd_w = jnp.mod(mp_w, 2.0)
        sw = jax.lax.dynamic_slice(state.fields, (0, sx, sy), (3, S, S))
        bed_w, res_old_w, resampled_w = sw
        mc_w = mp_w >= 2.0

        # --- perturbation (reference MCMC.py:1279-1290) ----------------------
        # Align the (B, B) field canvas with the window by zero-padding and
        # taking one batched dynamic_slice: pert[r, c] = f[(sx+r)-off_x, ...].
        # A generic 2D gather here is ~10x the cost of the whole rest of the
        # step on TPU (see tests/test_chain_crf.py kernel parity for
        # correctness; bench ablation 2026-08-16 for the numbers).
        FP = 2 * S + B  # shift ranges over (-(S-1), B//2]; S-padding covers it
        fpad = jax.lax.dynamic_update_slice(
            jnp.zeros((FP, FP), f.dtype), f, (S, S))
        pert = jax.lax.dynamic_slice(
            fpad, (S + sx - off_x, S + sy - off_y), (S, S)) * crfw_w
        pert = jnp.where(in_block & (upd_w > 0), pert, 0.0)
        bed_new_w = bed_w + pert

        # --- local residual with numpy-gradient semantics --------------------
        res_new_w = mass_conservation_residual(
            bed_new_w, surf_w, velx_w, vely_w, forcing_w, 0.0,
            consts.resolution,
        )

        # --- loss delta over patched (block) cells only ----------------------
        patch = in_block & mc_w
        denom = 2.0 * jnp.square(consts.sigma_mc)
        delta = (masked_sq_sum(res_new_w, patch) - masked_sq_sum(res_old_w, patch)) / denom
        if static.use_data_loss:
            dpatch = in_block & (dmask_w > 0)
            ddenom = 2.0 * jnp.square(consts.sigma_data)
            delta_data = (masked_sq_sum(bed_new_w - cond_w, dpatch)
                          - masked_sq_sum(bed_w - cond_w, dpatch)) / ddenom
        else:
            delta_data = jnp.float32(0.0)
        loss_next = state.loss_mc + state.loss_data + delta + delta_data

        # --- thickness guard (reference MCMC.py:1320-1329) -------------------
        viol = jnp.any(((surf_w - bed_new_w) <= 0.0) & in_block & (upd_w > 0))
        loss_next = jnp.where(viol, jnp.inf, loss_next)

        # --- MH accept (reference MCMC.py:1331-1337) -------------------------
        log_ratio = (state.loss_mc + state.loss_data) - loss_next
        rate = jnp.minimum(1.0, jnp.exp(log_ratio))
        accept = u <= rate

        # --- state update: ONE window scatter, accept folded into content ----
        # (write gated on accept & ~viol so a measure-zero u==0 accept of a
        # thickness-violating proposal cannot desync bed and loss — the same
        # safety deviation from the reference edge case as chain_sgs)
        write = accept & ~viol
        res_patched_w = jnp.where(in_block, res_new_w, res_old_w)
        resampled_new_w = resampled_w + jnp.where(in_block, upd_w, 0.0)
        new_w = jnp.stack([
            jnp.where(write, bed_new_w, bed_w),
            jnp.where(write, res_patched_w, res_old_w),
            jnp.where(write, resampled_new_w, resampled_w),
        ])
        fields_out = jax.lax.dynamic_update_slice(state.fields, new_w,
                                                  (0, sx, sy))

        # Kahan-compensated loss accumulation (delta only applied on accept)
        ok = accept & ~viol
        y = jnp.where(ok, delta, 0.0) - state.loss_comp
        t = state.loss_mc + y
        comp = (t - state.loss_mc) - y
        yd = jnp.where(ok, delta_data, 0.0) - state.loss_data_comp
        td = state.loss_data + yd
        comp_d = (td - state.loss_data) - yd

        new_state = ChainState(
            fields=fields_out,
            loss_mc=t,
            loss_comp=comp,
            loss_data=td,
            loss_data_comp=comp_d,
            key=key,
            # count `accept & ~viol`, matching the gated state write, so
            # acceptance diagnostics agree with the actual chain move
            accepted=state.accepted + ok.astype(jnp.int32),
        )

        samples = fields_out[0, consts.sample_ij[:, 0], consts.sample_ij[:, 1]]
        trace = {
            "loss_mc": t,
            "loss_data": td,
            "loss": t + td,
            "step": ok,
            "block": jnp.stack([cx, cy, h, w]).astype(jnp.float32),
            "samples": samples,
        }
        return new_state, trace

    return mh_update


def make_step(static: CRFStatic):
    """Build the full MH step (random draws + update): (consts, state) ->
    (state, trace)."""
    mh_update = make_kernel(static)

    def step(consts: CRFConsts, state: ChainState):
        key, k_block, k_center, k_u = jax.random.split(state.key, 4)
        f, size_idx, w, h = draw_block(k_block, static.rf, consts.rf)
        cidx = jax.random.randint(k_center, (), 0, static.n_region)
        cx = consts.region_cells[cidx, 0]
        cy = consts.region_cells[cidx, 1]
        u = jax.random.uniform(k_u, ())
        return mh_update(consts, state, f, h, w, cx, cy, u, key)

    return step


def make_batched_step_fused(static: CRFStatic, interpret: bool = False,
                            max_chains: int = None):
    """Chain-batched MH step backed by the fused Pallas window kernel.

    Numerically equivalent to ``vmap(make_step(static))`` (asserted in
    tests/test_window_kernel.py) but the window gather/compute/scatter phase
    runs as one pallas_call with per-chain DMAs instead of XLA
    gather/scatter — the dominant cost of the vmapped path on TPU.
    Batches larger than ``max_chains`` (default FUSED_SINGLE_LAUNCH_MAX,
    the transposed-SMEM-layout launch bound) raise at trace time: chunking
    must happen OUTSIDE the scan carry (parallel.sampler.scan_chunked) —
    slicing/stacking the full multi-GB state every step costs ~15 ms at
    512 chains (measured; NOTES_ROUND3.md).

    Signature: (consts, states_batched) -> (states_batched, traces) where
    every state leaf and trace entry has a leading chain axis.
    """
    from ..ops.spectral import sample_field_params, spectral_field
    from ..ops.window_kernel import fused_window_sizes, make_fused_window_update

    # perf-surgery gates (profiling only; unset => no effect), comma list in
    # MCMC_TPU_CRF_SURGERY: nodraw (white noise instead of the spectral FFT),
    # nokernel (skip the fused window update)
    import os as _os
    _cut = set(filter(None, _os.environ.get(
        "MCMC_TPU_CRF_SURGERY", "").split(",")))

    H, W, B = static.H, static.W, static.rf.B
    SX, SY = fused_window_sizes(H, W, B)
    # without a nugget (the production configs), the kernel finishes the
    # proposal itself (standardize/scale/edge) from the raw spectral field;
    # the nugget path pre-assembles the canvas in XLA like draw_block
    # prefinished also covers the gstools-SRF method: its blocks must NOT be
    # standardized in-kernel, so they are fully assembled by draw_block
    prefinished = static.rf.has_nugget or not static.rf.spectral
    fused = make_fused_window_update(H, W, B, interpret=interpret,
                                     use_data_loss=static.use_data_loss,
                                     prefinished=prefinished,
                                     consts_resident=(
                                         False if "nores" in _cut else None))

    # hardware-PRNG noise for the spectral draw (ops/noise_kernel) — OPT-IN
    # via MCMC_TPU_CRF_SURGERY=hwrng.  On the tunneled axon v5e-1 it is a
    # measured NET LOSS (0.815 vs 0.770 ms/step-batch at 256 chains,
    # 2026-08-17): the kernel's HBM write + complex re-assembly outweigh
    # the ~0.11 ms threefry saving.  Kept reachable because the balance
    # may differ on non-tunneled hardware.
    from ..ops.noise_kernel import batched_normal, hw_rng_available
    use_hw_rng = (static.rf.spectral and not prefinished and not interpret
                  and "hwrng" in _cut and hw_rng_available())

    def step(consts: CRFConsts, states: ChainState):
        if use_hw_rng:
            from ..ops.spectral import spectral_field_from_noise

            def draws_pre(key):
                key, k_block, k_center, k_u = jax.random.split(key, 4)
                k_size, k_params, k_field, _ = jax.random.split(k_block, 4)
                size_idx = jax.random.randint(k_size, (), 0,
                                              static.rf.n_sizes)
                w = consts.rf.pairs[0, size_idx]
                h = consts.rf.pairs[1, size_idx]
                scale, _nug, range_x, range_y = sample_field_params(
                    k_params, consts.rf.scale_min, consts.rf.scale_max,
                    consts.rf.nugget_max, consts.rf.range_min_x,
                    consts.rf.range_max_x, consts.rf.range_min_y,
                    consts.rf.range_max_y, static.rf.isotropic)
                cidx = jax.random.randint(k_center, (), 0, static.n_region)
                u = jax.random.uniform(k_u, ())
                return (key, k_field, size_idx, scale, range_x, range_y,
                        w, h, cidx, u)

            (key, k_field, size_idx, scale, range_x, range_y, w, h, cidx,
             u) = jax.vmap(draws_pre)(states.key)
            Bh = B // 2 + 1
            zn = batched_normal(k_field, 2 * B, Bh)
            noise = zn[:, :B] + 1j * zn[:, B:]
            f = jax.vmap(
                lambda nz, rx, ry: spectral_field_from_noise(
                    nz, (B, B), static.rf.resolution, static.rf.model_name,
                    rx, ry, static.rf.smoothness))(noise, range_x, range_y)
            return _tail(consts, states, key, f, size_idx, scale, w, h,
                         cidx, u)

        def draws(key):
            key, k_block, k_center, k_u = jax.random.split(key, 4)
            if prefinished:
                f, size_idx, w, h = draw_block(k_block, static.rf, consts.rf)
                scale = jnp.float32(0.0)  # already applied
            else:
                # raw draw only; the fused kernel finishes it
                k_size, k_params, k_field, _ = jax.random.split(k_block, 4)
                size_idx = jax.random.randint(k_size, (), 0,
                                              static.rf.n_sizes)
                w = consts.rf.pairs[0, size_idx]
                h = consts.rf.pairs[1, size_idx]
                scale, _nug, range_x, range_y = sample_field_params(
                    k_params, consts.rf.scale_min, consts.rf.scale_max,
                    consts.rf.nugget_max, consts.rf.range_min_x,
                    consts.rf.range_max_x, consts.rf.range_min_y,
                    consts.rf.range_max_y, static.rf.isotropic)
                if "nodraw" in _cut:  # surgery: skip the spectral FFT
                    f = jax.random.normal(k_field, (B, B))
                elif "fixednoise" in _cut:  # surgery: keep density+FFT,
                    # skip the normal draws (isolates RNG vs FFT cost)
                    from ..ops.spectral import spectral_field_from_noise
                    nh = (B, B // 2 + 1)
                    f = spectral_field_from_noise(
                        jnp.full(nh, 0.7, jnp.complex64), (B, B),
                        static.rf.resolution, static.rf.model_name,
                        range_x, range_y, static.rf.smoothness)
                else:
                    f = spectral_field(k_field, (B, B), static.rf.resolution,
                                       static.rf.model_name, range_x, range_y,
                                       static.rf.smoothness)
            cidx = jax.random.randint(k_center, (), 0, static.n_region)
            u = jax.random.uniform(k_u, ())
            return key, f, size_idx, scale, w, h, cidx, u

        key, f, size_idx, scale, w, h, cidx, u = jax.vmap(draws)(states.key)
        return _tail(consts, states, key, f, size_idx, scale, w, h, cidx, u)

    def _tail(consts, states, key, f, size_idx, scale, w, h, cidx, u):
        cx = consts.region_cells[cidx, 0]
        cy = consts.region_cells[cidx, 1]

        bxmin = jnp.maximum(0, (2 * cx - h) // 2)
        bxmax = jnp.minimum(H, (2 * cx + h) // 2)
        bymin = jnp.maximum(0, (2 * cy - w) // 2)
        bymax = jnp.minimum(W, (2 * cy + w) // 2)
        off_x = (2 * cx - h) // 2
        off_y = (2 * cy - w) // 2
        # aligned window starts (TPU DMA tiling: rows % 8, cols % 128); the
        # quantized start still keeps the block's pad-1 ring interior or on a
        # true domain edge.  Canvas placement is a circular roll: because
        # SX >= B and SY >= B, wrapped rows/cols can never land on in-block
        # cells (c - off ∈ [0, B) and wrap shifts by ±SX/SY put content at
        # c - off ∈ [-S, B - S) — disjoint).
        if SX == H:
            sx = jnp.zeros_like(bxmin)
        else:
            sx = jnp.clip(8 * ((bxmin - 1) // 8), 0, H - SX)
        if SY == W:
            sy = jnp.zeros_like(bymin)
        else:
            sy = jnp.clip(128 * ((bymin - 1) // 128), 0, W - SY)
        shift_x = jnp.mod(off_x - sx, SX)
        shift_y = jnp.mod(off_y - sy, SY)
        geom = jnp.stack([sx, sy, shift_x, shift_y, bxmin, bxmax, bymin,
                          bymax, h, w, size_idx], axis=1).astype(jnp.int32)
        n = states.fields.shape[0]
        fvals = jnp.stack([
            u, states.loss_mc + states.loss_data,
            jnp.broadcast_to(consts.sigma_mc, (n,)),
            jnp.broadcast_to(consts.resolution, (n,)),
            jnp.broadcast_to(consts.sigma_data, (n,)),
            scale,
        ], axis=1).astype(jnp.float32)

        if "nokernel" in _cut:  # surgery: skip the fused window update
            fields_out = states.fields + jnp.float32(1e-20) * f.mean()
            acc_f = jnp.zeros((n,), jnp.float32)
            delta = jnp.zeros((n,), jnp.float32)
            delta_data = jnp.zeros((n,), jnp.float32)
        else:
            fields_out, acc_f, delta, delta_data = fused(
                consts.stacked, states.fields, f, consts.rf.edge_masks, geom,
                fvals)
        accept = acc_f > 0

        # Kahan-compensated loss accumulation (deltas pre-zeroed by the
        # kernel unless accept & ~viol)
        y = delta - states.loss_comp
        t = states.loss_mc + y
        comp = (t - states.loss_mc) - y
        yd = delta_data - states.loss_data_comp
        td = states.loss_data + yd
        comp_d = (td - states.loss_data) - yd

        new_states = ChainState(
            fields=fields_out,
            loss_mc=t,
            loss_comp=comp,
            loss_data=td,
            loss_data_comp=comp_d,
            key=key,
            accepted=states.accepted + accept.astype(jnp.int32),
        )
        if static.P > 0:
            samples = fields_out[:, 0][
                :, consts.sample_ij[:, 0], consts.sample_ij[:, 1]]
        else:
            samples = jnp.zeros((n, 0), jnp.float32)
        trace = {
            "loss_mc": t,
            "loss_data": td,
            "loss": t + td,
            "step": accept,
            "block": jnp.stack([cx, cy, h, w], axis=1).astype(jnp.float32),
            "samples": samples,
        }
        return new_states, trace

    max_chains = (FUSED_SINGLE_LAUNCH_MAX if max_chains is None
                  else int(max_chains))

    def checked_step(consts: CRFConsts, states: ChainState):
        C = states.fields.shape[0]
        if C > max_chains:
            raise ValueError(
                f"{C} chains exceeds the fused kernel's single-launch "
                f"bound ({max_chains}); run through "
                f"parallel.sampler.run_chains, which keeps the batch "
                f"chunked across the scan (scan_chunked)")
        return step(consts, states)

    return checked_step


# PREFERRED per-launch chain batch: measured dispatch sweet spot, NOT a
# compile ceiling.  History: launches >=448 chains crashed the toolchain
# through round 3; the root cause (found 2026-08-19, tools/mosaic_repro.py)
# was an SMEM out-of-memory — the toolchain pads the MINOR dim of every
# SMEM array to 128 lanes, so the five (N, k) prefetch/output arrays cost
# 5*N*512 B and blow the 1 MiB budget exactly between N=384 (0.94 MiB) and
# N=448 (1.09 MiB).  With the transposed (k, N) layouts the kernel compiles
# and runs at >=1536 chains single-launch — but chunked 2x384 still measures
# ~2% faster than single-launch at 768 (A/B 2026-08-19: 362.8k vs 355.1k
# chain-it/s), so 384 remains the preferred chunk granularity.
FUSED_MAX_CHAINS = 384

# hard single-launch bound from the transposed layout's own SMEM footprint:
# 20 scalar rows x N lanes x 4 B <= ~1 MiB at N~13k; tested to 1536 on
# hardware, capped conservatively below the arithmetic limit
FUSED_SINGLE_LAUNCH_MAX = 8192


def fused_chunk_count(n_chains: int, max_chains: int = None) -> int:
    """Number of equal kernel launches used to cover ``n_chains``.

    1 = single launch; k in 2..16 = the smallest equal split with chunks
    within the preferred per-launch size (measured faster than one big
    launch); 0 = not coverable (only above FUSED_SINGLE_LAUNCH_MAX with no
    equal split — the caller must use the XLA path).  Counts with no equal
    split that still fit a single launch (e.g. primes like 389) run as ONE
    launch since the transposed-SMEM fix removed the old >=448 compile
    crash."""
    limit = FUSED_MAX_CHAINS if max_chains is None else int(max_chains)
    if n_chains <= limit:
        return 1
    # prefer <=16 equal launches at the sweet-spot size: beyond 16 the
    # per-launch dispatch overhead dominates
    for k in range(2, 17):
        if n_chains % k == 0 and n_chains // k <= limit:
            return k
    return 1 if n_chains <= FUSED_SINGLE_LAUNCH_MAX else 0


def chain_loss_mc(massConvResidual, mc_region_mask, sigma_mc) -> float:
    """The reference chain-base mass-conservation loss (MCMC.py:1021-1044):
    nansum of squared residuals over the mc region / (2 sigma^2).  Shared
    by ChainCRF.loss and ChainSGS.loss (the reference defines it once on
    the base class)."""
    res = np.asarray(massConvResidual, np.float64)
    return float(np.nansum(np.square(res[np.asarray(mc_region_mask) == 1]))
                 / (2.0 * float(sigma_mc) ** 2))


def _run_segmented(run_fn, state, n_iter: int, info_per_iter: int,
                   progress_bar: bool, plot: bool):
    """Run ``run_fn(state, n_rows) -> (state, time-major traces)`` either in
    one scan (no observers) or in ``info_per_iter``-row segments with the
    reference's progress line / live figure (MCMC.py:1368-1432).  Segment
    row 0 duplicates the carried state and is dropped on continuation
    segments, so the stitched traces equal the single-scan ones exactly."""
    if n_iter < 1:
        # row 0 records the initial state, so the smallest run is 1; a 0
        # would reach lax.scan with length=-1 and die with a confusing
        # trace-time error deep in jit
        raise ValueError("n_iter must be >= 1 (trace row 0 records the "
                         "initial state, reference loop semantics)")
    if not (progress_bar or plot):
        return run_fn(state, n_iter)
    import time as _time

    live = None
    if plot:
        from ..utils.plotting import LiveChainPlot

        live = LiveChainPlot()
    total_steps = int(n_iter) - 1
    # observers always get at least one update, even for short runs
    # (the reference prints/plots regardless of info_per_iter,
    # MCMC.py:1379,1415)
    seg = max(1, min(int(info_per_iter), max(total_steps, 1)))
    steps_left = total_steps
    chunks = []
    first = True
    t0 = _time.time()
    done_steps = 0
    acc0 = int(np.asarray(state.accepted))
    while steps_left > 0 or first:
        s = min(seg, steps_left)
        # run_fn(n_rows) performs n_rows - 1 steps; row 0 is the carried
        # state, kept only for the first segment
        state, tr = run_fn(state, s + 1)
        keep = tr if first else jax.tree.map(lambda a: a[1:], tr)
        chunks.append(keep)
        steps_left -= s
        done_steps += s
        loss_now = float(np.asarray(state.loss_mc
                                    + getattr(state, "loss_data", 0.0)))
        # CUMULATIVE acceptance like the reference (sum(step)/(i+1),
        # MCMC.py:1406), from the state's accepted counter
        acc = ((int(np.asarray(state.accepted)) - acc0)
               / max(done_steps, 1))
        if progress_bar:
            rate = done_steps / max(_time.time() - t0, 1e-9)
            print(f"iter {done_steps}/{total_steps} | loss {loss_now:.6e} | "
                  f"acc {acc:.3f} | {rate:,.0f} it/s", flush=True)
        if live is not None:
            live(done_steps, state,
                 jax.tree.map(lambda a: np.asarray(a)[:, None], keep))
        first = False
    traces = jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *chunks)
    return state, traces


@partial(jax.jit, static_argnums=(0, 3, 4))
def run_chain(static: CRFStatic, consts: CRFConsts, state: ChainState,
              n_iter: int, save_beds: bool = False):
    """Scan ``n_iter - 1`` MH steps (iteration 0 records the initial state,
    as in the reference loop ``for i in range(1, n_iter)``, MCMC.py:1247).

    Returns (final_state, traces) where each trace array has leading dim
    ``n_iter`` and index 0 holds the initial values.
    """
    step = make_step(static)

    def body(st, _):
        st, tr = step(consts, st)
        if save_beds:
            tr = dict(tr, bed=st.bed)
        return st, tr

    final, traces = jax.lax.scan(body, state, None, length=n_iter - 1)

    init_row = {
        "loss_mc": state.loss_mc,
        "loss_data": state.loss_data,
        "loss": state.loss_mc + state.loss_data,
        "step": jnp.asarray(False),
        "block": jnp.full((4,), jnp.nan, jnp.float32),
        "samples": state.bed[consts.sample_ij[:, 0], consts.sample_ij[:, 1]],
    }
    if save_beds:
        init_row["bed"] = state.bed
    traces = jax.tree.map(
        lambda head, tail: jnp.concatenate([head[None], tail], axis=0),
        init_row, traces,
    )
    return final, traces


class ChainCRF:
    """Host-side builder with the reference's imperative API surface.

    Mirrors ``chain_crf`` setters (set_update_region / set_loss_type /
    set_update_type / set_crf_data_weight / set_random_generator /
    set_sample_points_locations) so reference users find the same workflow,
    then compiles to the functional core via ``build()`` / ``run()``.
    """

    def __init__(self, xx, yy, initial_bed, surf, velx, vely, dhdt, smb,
                 cond_bed, data_mask, grounded_ice_mask, resolution):
        shapes = {np.shape(a) for a in
                  (initial_bed, surf, velx, vely, dhdt, smb, cond_bed, data_mask)}
        if len(shapes) != 1:
            raise ValueError(
                "the shape of bed, surf, velx, vely, dhdt, smb, radar_bed, "
                "data_mask need to be same")
        self.xx = np.asarray(xx)
        self.yy = np.asarray(yy)
        self.initial_bed = np.asarray(initial_bed, np.float32)
        self.surf = np.asarray(surf, np.float32)
        self.velx = np.asarray(velx, np.float32)
        self.vely = np.asarray(vely, np.float32)
        self.dhdt = np.asarray(dhdt, np.float32)
        self.smb = np.asarray(smb, np.float32)
        self.cond_bed = np.asarray(cond_bed, np.float32)
        self.data_mask = np.asarray(data_mask)
        self.grounded_ice_mask = np.asarray(grounded_ice_mask)
        self.resolution = float(resolution)
        self.update_in_region = False
        self.region_mask = np.ones(self.xx.shape, np.float32)
        self.mc_region_mask = np.ones(self.xx.shape, np.float32)
        self.block_type = "RF"
        self.crf_data_weight = None
        self.sample_loc = None
        self.sigma_mc = None
        self.sigma_data = 1.0
        self.use_data_loss = False
        self.data_region_mask = np.ones(self.xx.shape, np.float32)
        self._key = None
        self._rf_cfg = None
        self._block_cfg = None
        self._weight_cfg = None

    # --- reference-parity setters ------------------------------------------

    def set_update_region(self, update_in_region, region_mask=None):
        """Restrict proposals/updates to ``region_mask`` cells (reference
        chain.set_update_region, MCMC.py:849-872)."""
        self.update_in_region = bool(update_in_region)
        if not update_in_region:
            self.region_mask = np.ones(self.xx.shape, np.float32)
        else:
            region_mask = np.asarray(region_mask)
            if region_mask.shape != self.xx.shape:
                raise ValueError(
                    "the region_mask input is invalid. It has to be a 2D numpy "
                    "array with the shape of the map")
            self.region_mask = region_mask.astype(np.float32)

    def set_loss_type(self, sigma_mc=-1, massConvInRegion=True,
                      diff_func=None, sigma_data=-1,
                      dataDiffInRegion=False):
        """Configure the loss.

        The reference hardwires the Gaussian sum-square mass-conservation
        loss and ships the generalized map_func/diff_func machinery
        commented out (MCMC.py:929-1018).  Here the data-misfit term is
        functional: ``diff_func='sumsquare'`` adds a Gaussian radar-misfit
        likelihood sum((bed - cond_bed)^2)/(2*sigma_data^2) over data cells
        (optionally restricted to the region).
        """
        cfg = LossConfig(sigma_mc=sigma_mc, mass_conv_in_region=massConvInRegion,
                         sigma_data=sigma_data)
        self.sigma_mc = cfg.sigma_mc
        self.mc_region_mask = (self.region_mask if massConvInRegion
                               else np.ones(self.xx.shape, np.float32))
        if diff_func is None:
            self.use_data_loss = False
            self.sigma_data = 1.0
        elif diff_func == "sumsquare":
            if sigma_data <= 0:
                raise ValueError(
                    "please make sure sigma is correctly set for sigma_data")
            self.use_data_loss = True
            self.sigma_data = float(sigma_data)
            self.data_region_mask = (self.region_mask if dataDiffInRegion
                                     else np.ones(self.xx.shape, np.float32))
        else:
            raise ValueError(
                "diff_func must be None or 'sumsquare' (the reference's other "
                "aggregators are dead code, MCMC.py:986-1012)")

    def set_update_type(self, block_type):
        """Proposal family: 'RF' (plain blocks) or 'CRF_weight'
        (logistic-data-weighted blocks); 'CRF_rbf' raises like the
        reference (chain_crf.set_update_type, MCMC.py:1098-1122)."""
        if block_type not in ("CRF_weight", "RF", "CRF_rbf"):
            raise ValueError(
                "The block_type argument should be one of the following: "
                "CRF_weight, CRF_rbf, RF")
        if block_type == "CRF_rbf":
            raise NotImplementedError(
                "CRF_rbf is unimplemented in the reference as well (MCMC.py:1111)")
        self.block_type = block_type

    def set_crf_data_weight(self, weight=None, weight_cfg: Optional[WeightConfig] = None):
        """Compute (or set) the logistic conditioning weight.

        With no precomputed ``weight``, computes it from the data mask via an
        exact Euclidean distance transform (replacing the reference's KDTree,
        MCMC.py:689-714).
        """
        if weight is not None:
            self.crf_data_weight = np.asarray(weight, np.float32)
            return
        wc = weight_cfg or self._weight_cfg
        if wc is None:
            raise ValueError("call configure_randfield first or pass weight_cfg")
        if not np.any(self.data_mask == 1):
            # distance-to-data is inf everywhere -> the logistic weight
            # collapses to all-zero and the chain would accept every
            # (zero) proposal while never moving; the reference fails
            # loudly here too (KDTree on an empty point set raises)
            raise ValueError(
                "data_mask has no conditioning cells: the CRF data weight "
                "would be zero everywhere (a frozen chain). Use "
                "block_type='RF' for unconditional proposals, or pass an "
                "explicit weight array.")
        dist = min_dist_from_mask(self.xx, self.yy, self.data_mask == 1)
        # host-side numpy (setup path): keep eager device dispatch off the
        # build; same formula as ops.logistic.crf_weight_from_dist
        dr = np.where(dist > wc.max_dist, 1.0, dist / wc.max_dist)
        dl = wc.L / (1.0 + np.exp(-wc.k * (dr - wc.x0))) - wc.offset
        self.crf_data_weight = (dl - dl.min()).astype(np.float32)

    def loss(self, massConvResidual, dataDiff=0):
        """Loss of a candidate topography (reference MCMC.py:1021-1044 —
        the tutorials call this directly for the BedMachine baseline line,
        T3 cells 32-35).

        Returns (total_loss, loss_mc, loss_data).  ``loss_data`` is 0
        unless the functional data-misfit term is configured via
        ``set_loss_type(diff_func='sumsquare', sigma_data=...)`` (the
        reference hardwires 0)."""
        if self.sigma_mc is None:
            raise ValueError("call set_loss_type before loss()")
        loss_mc = chain_loss_mc(massConvResidual, self.mc_region_mask,
                                self.sigma_mc)
        loss_data = 0.0
        if getattr(self, "use_data_loss", False) and np.ndim(dataDiff):
            dd = np.asarray(dataDiff, np.float64)
            m = (np.asarray(self.data_mask) == 1) & (self.data_region_mask == 1)
            loss_data = float(np.nansum(np.square(dd[m]))
                              / (2.0 * self.sigma_data ** 2))
        return loss_mc + loss_data, loss_mc, loss_data

    def set_random_generator(self, rng_seed=None):
        """Seed the chain's PRNG key (replaces the reference's NumPy
        Generator plumbing, MCMC.py:1046-1066; the key IS the RNG state)."""
        self._key = as_key(rng_seed)

    def set_sample_points_locations(self, loc):
        """(n, 2) (x, y) posterior probe points traced every iteration
        (reference MCMC.py:1068-1081; nearest-cell lookup, quirk #7)."""
        self.sample_loc = None if loc is None else np.asarray(loc)

    def configure_randfield(self, rf_cfg: RandFieldConfig, block_cfg: BlockMenuConfig,
                            weight_cfg: WeightConfig):
        """Attach the proposal engine's typed configs (the reference's
        RandField + set_block_sizes + set_weight_param trio)."""
        self._rf_cfg = rf_cfg
        self._block_cfg = block_cfg
        self._weight_cfg = weight_cfg

    # --- compilation --------------------------------------------------------

    def _sample_ij(self):
        if self.sample_loc is None:
            return np.zeros((0, 2), np.int32)
        ij = np.zeros((self.sample_loc.shape[0], 2), np.int32)
        for k in range(self.sample_loc.shape[0]):
            # nearest-cell lookup (the reference requires exact float equality
            # and int16 indices, MCMC.py:1177-1180 — fixed here)
            ij[k, 0] = int(np.argmin(np.abs(self.yy[:, 0] - self.sample_loc[k, 1])))
            ij[k, 1] = int(np.argmin(np.abs(self.xx[0, :] - self.sample_loc[k, 0])))
        return ij

    def build(self):
        """Compile the configured chain to its functional form:
        (CRFStatic, CRFConsts) consumed by make_step/run_chain and the
        multi-chain sampler."""
        if self.sigma_mc is None:
            raise ValueError("call set_loss_type before building the chain")
        if self._rf_cfg is None:
            raise ValueError("call configure_randfield before building the chain")
        rf_static, rf_arrays = build_randfield(self._rf_cfg, self._block_cfg,
                                               self._weight_cfg)
        H, W = self.xx.shape
        S = int(min(H, W, rf_static.B + 4))
        # Guard must trip whenever the window is clipped below B+4 on a grid
        # whose OTHER dim still exceeds the window (e.g. H=36, W=33, B=32):
        # a max-size block near the far edge would then put in-block cells on
        # the window's one-sided-gradient boundary row, breaking the bitwise
        # incremental-residual invariant (same form as ChainSGS.build).
        if S < rf_static.B + 4 and (H > S or W > S):
            raise ValueError("grid too small for the configured block sizes")

        update_mask = (self.region_mask if self.update_in_region
                       else self.grounded_ice_mask.astype(np.float32))
        region = np.argwhere(self.region_mask == 1) if self.update_in_region else \
            np.argwhere(np.ones(self.xx.shape, bool))
        if region.shape[0] == 0:
            raise ValueError("region_mask selects no cells")

        if self.block_type == "CRF_weight":
            if self.crf_data_weight is None:
                self.set_crf_data_weight()
            crf_weight = self.crf_data_weight
        else:
            crf_weight = np.ones(self.xx.shape, np.float32)

        sample_ij = self._sample_ij()
        static = CRFStatic(H=H, W=W, S=S, n_region=int(region.shape[0]),
                           P=int(sample_ij.shape[0]), rf=rf_static,
                           use_data_loss=bool(self.use_data_loss))
        cond_filled = np.nan_to_num(self.cond_bed, nan=0.0)
        if self.use_data_loss:
            data_loss_mask = (np.asarray(self.data_mask, bool)
                              & np.isfinite(self.cond_bed)
                              & (self.data_region_mask > 0))
        else:
            # all-zero mask => loss_data identically 0 everywhere (init and
            # deltas), matching the reference's loss_data = 0 (MCMC.py:1042)
            data_loss_mask = np.zeros(self.xx.shape, bool)
        # packed planes (see CRFConsts.stacked): forcing = dhdt - smb,
        # maskpack = update_mask + 2*mc_mask
        stacked = np.stack([
            self.surf, self.velx, self.vely,
            np.asarray(self.dhdt, np.float64) - np.asarray(self.smb, np.float64),
            ((np.asarray(update_mask) > 0).astype(np.float32)
             + 2.0 * np.asarray(self.mc_region_mask == 1, np.float32)),
            np.asarray(crf_weight, np.float32),
            np.asarray(cond_filled, np.float32),
            np.asarray(data_loss_mask, np.float32),
        ]).astype(np.float32)
        consts = CRFConsts(
            stacked=jnp.asarray(stacked),
            region_cells=jnp.asarray(region, jnp.int32),
            sample_ij=jnp.asarray(sample_ij, jnp.int32),
            sigma_mc=jnp.float32(self.sigma_mc),
            sigma_data=jnp.float32(self.sigma_data),
            resolution=jnp.float32(self.resolution),
            rf=rf_arrays,
        )
        return static, consts

    def run(self, n_iter, RF=None, only_save_last_bed=True,
            info_per_iter=1000, plot=False, progress_bar=False, *,
            save_beds=None, seed=None):
        """Single-chain convenience run (the multi-chain farm lives in
        parallel/sampler.py). Returns a dict mirroring the reference's
        return tuple names (MCMC.py:1147-1155).

        Signature-parity with the reference ``chain_crf.run(n_iter, RF,
        only_save_last_bed, info_per_iter, plot, progress_bar)``
        (MCMC.py:1137) — POSITIONAL order matches exactly, with the extra
        ``save_beds``/``seed`` keyword-only so reference-style positional
        calls cannot misbind.  DEFAULTS intentionally diverge from the
        reference (MCMC.py:1137: only_save_last_bed=False, plot=True,
        progress_bar=True, info_per_iter=1000): here the defaults are the
        reference's *production-driver* settings
        (largeScaleChain_multiprocessing.py:188-195) — callers porting
        notebook-style scripts that rely on per-iteration bed history or
        live output must pass only_save_last_bed=False / plot=True /
        progress_bar=True explicitly (see MIGRATION.md).  ``RF`` may be a ``models.RandField``
        wrapper whose configuration is adopted; ``progress_bar`` prints
        cumulative acceptance + it/s every ``info_per_iter`` iterations;
        ``plot=True`` drives a live loss/acceptance figure
        (utils.plotting.LiveChainPlot).  Observer knobs segment the scan —
        results are bitwise identical either way (a non-dividing
        info_per_iter adds one extra XLA compile for the tail segment)."""
        if RF is not None:
            from .randfield import RandField as _RFWrapper

            if not isinstance(RF, _RFWrapper):
                # reference error text, MCMC.py:1160
                raise TypeError('The arugment "RF" has to be an object of '
                                'the class RandField')
            if RF._blocks is None:
                raise ValueError("RF needs set_block_sizes before run")
            if RF._weights is None and self._weight_cfg is None:
                raise ValueError("RF needs set_weight_param before run "
                                 "(no weight config on the chain either)")
            self.configure_randfield(RF.config, RF._blocks,
                                     RF._weights or self._weight_cfg)
        static, consts = self.build()
        key = (as_key(seed) if seed is not None
               else self._key if self._key is not None else as_key(None))
        state = init_state(self.initial_bed, key, consts)
        if save_beds is None:
            save_beds = not only_save_last_bed
        final, traces = _run_segmented(
            lambda st, n: run_chain(static, consts, st, n, bool(save_beds)),
            state, int(n_iter), int(info_per_iter), bool(progress_bar),
            bool(plot))
        # continue the random stream across run() calls (the reference's
        # set_random_generator semantics: one Generator advances through
        # successive runs, largeScaleChain_multiprocessing.py:177-204)
        self._key = final.key
        out = {
            "bed": np.asarray(traces["bed"]) if save_beds else np.asarray(final.bed),
            "loss_mc": np.asarray(traces["loss_mc"]),
            "loss_data": np.asarray(traces["loss_data"]),
            "loss": np.asarray(traces["loss"]),
            "steps": np.asarray(traces["step"]),
            "resampled_times": np.asarray(final.resampled),
            "blocks": np.asarray(traces["block"]),
            "final_state": final,
        }
        if static.P:
            out["sample_values"] = np.asarray(traces["samples"]).T  # (P, n_iter)
        return out
