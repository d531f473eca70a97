"""Non-square-grid coverage: H != W catches row/column transposes that the
square 64x64 grids used elsewhere cannot (the reference's real domains are
rectangular crops, e.g. T1's study area before squaring — Topography crops
to the data bbox, not to a square).

Covers the three numerically-distinct paths:
- the CRF MH kernel vs the NumPy twin (injected proposals, corner centers
  that are only valid under the correct row/col interpretation),
- the fused Pallas window kernel vs the vmapped XLA step,
- the SGS chain's patched residual vs a full-grid recompute.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mcmc_tpu.models import init_state
from mcmc_tpu.models.chain_crf import (make_batched_step_fused, make_kernel,
                                       make_step)
from mcmc_tpu.parallel.sampler import init_states
from tests import reference_impl as ref
from tests.conftest import make_synthetic_problem
from tests.test_chain_crf import build_small_chain, np_consts_from
from tests.test_chain_sgs import build_sgs_chain

H, W = 48, 80  # deliberately W > H; centers below are invalid if transposed


class TestCRFNonSquare:
    # cx is the ROW index (clamped vs H=48), cy the COLUMN (vs W=80);
    # cy=70/79 would be out of range if the kernel read them transposed
    @pytest.mark.parametrize("center", [(0, 0), (47, 79), (10, 70), (40, 5)])
    @pytest.mark.parametrize("u", [0.0, 0.999])
    def test_injected_proposal_matches_reference(self, center, u):
        p = make_synthetic_problem(H=H, W=W)
        chain = build_small_chain(p)
        static, consts = chain.build()
        state = init_state(p["initial_bed"], jax.random.key(0), consts)
        kernel = jax.jit(make_kernel(static))

        B = static.rf.B
        rng = np.random.default_rng(11)
        w, h = 8, 12
        canvas = np.zeros((B, B), np.float32)
        canvas[:h, :w] = rng.normal(0, 30, (h, w)).astype(np.float32)
        cx, cy = center

        new_state, trace = kernel(
            consts, state, jnp.asarray(canvas), jnp.int32(h), jnp.int32(w),
            jnp.int32(cx), jnp.int32(cy), jnp.float32(u), jax.random.key(1))

        np_state = {
            "bed": np.asarray(state.bed, np.float64),
            "mc_res": np.asarray(state.mc_res, np.float64),
            "loss_mc": float(state.loss_mc),
        }
        np_new, info = ref.crf_mh_update(
            np_state, np_consts_from(chain, consts),
            canvas.astype(np.float64), h, w, cx, cy, u)

        assert bool(trace["step"]) == bool(info["accept"])
        np.testing.assert_allclose(np.asarray(new_state.bed), np_new["bed"],
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(new_state.mc_res),
                                   np_new["mc_res"], rtol=1e-3, atol=1e-2)
        np.testing.assert_allclose(float(new_state.loss_mc),
                                   np_new["loss_mc"], rtol=2e-3)

    def test_fused_kernel_matches_xla_nonsquare(self):
        p = make_synthetic_problem(H=H, W=W)
        chain = build_small_chain(p)
        static, consts = chain.build()
        keys = jax.random.split(jax.random.key(42), 4)
        beds = jnp.broadcast_to(jnp.asarray(p["initial_bed"], jnp.float32),
                                (4, H, W))
        states = init_states(beds, keys, consts)

        xla_step = jax.jit(
            lambda c, s: jax.vmap(make_step(static), in_axes=(None, 0))(c, s))
        fused_step = jax.jit(make_batched_step_fused(static, interpret=True))

        s_x, s_f = states, states
        for it in range(4):
            s_x, tr_x = xla_step(consts, s_x)
            s_f, tr_f = fused_step(consts, s_f)
            np.testing.assert_array_equal(np.asarray(tr_x["step"]),
                                          np.asarray(tr_f["step"]),
                                          err_msg=f"iter {it}")
            np.testing.assert_allclose(np.asarray(s_x.fields),
                                       np.asarray(s_f.fields),
                                       rtol=5e-5, atol=1e-3,
                                       err_msg=f"iter {it}")

    def test_run_smoke_nonsquare(self):
        p = make_synthetic_problem(H=H, W=W)
        chain = build_small_chain(p)
        out = chain.run(n_iter=60, seed=3)
        assert np.isfinite(out["loss"]).all()
        assert out["loss"].shape == (60,)
        # same seed reproduces bitwise
        out2 = build_small_chain(p).run(n_iter=60, seed=3)
        np.testing.assert_array_equal(out["loss"], out2["loss"])


class TestSGSNonSquare:
    def test_patched_residual_exact_nonsquare(self):
        p = make_synthetic_problem(H=40, W=64)
        chain = build_sgs_chain(p)
        out = chain.run(n_iter=80, seed=1)
        assert np.isfinite(out["loss"]).all()
        final = out["final_state"]
        trend = chain.trend if chain.detrend_map else 0.0
        full_res = ref.mass_conservation_residual(
            np.asarray(final.bed, np.float64) + trend, p["surf"], p["velx"],
            p["vely"], p["dhdt"], p["smb"], p["resolution"])
        np.testing.assert_allclose(np.asarray(final.mc_res), full_res,
                                   rtol=2e-3, atol=2e-2)
        recomputed = ref.masked_gaussian_loss(
            np.asarray(final.mc_res), np.asarray(chain.mc_region_mask), 5.0)
        np.testing.assert_allclose(float(final.loss_mc), recomputed,
                                   rtol=1e-3)
