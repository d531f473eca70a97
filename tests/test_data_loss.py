"""Tests for the Gaussian data-misfit loss term (diff_func='sumsquare').

The reference designed this machinery but ships it commented out
(MCMC.py:929-1018, loss_data hardwired to 0 at :1042); here it works.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mcmc_tpu.models import ChainCRF, init_state
from mcmc_tpu.models.chain_crf import make_batched_step_fused, make_step
from mcmc_tpu.parallel.sampler import init_states
from tests.conftest import make_synthetic_problem
from tests.test_chain_crf import build_small_chain


def build_data_loss_chain(p, sigma_data=20.0):
    c = build_small_chain(p)
    c.set_loss_type(sigma_mc=5.0, massConvInRegion=True,
                    diff_func="sumsquare", sigma_data=sigma_data)
    return c


class TestDataLoss:
    def test_init_loss_data_matches_manual(self):
        p = make_synthetic_problem(H=64, W=64)
        chain = build_data_loss_chain(p)
        static, consts = chain.build()
        assert static.use_data_loss
        state = init_state(p["initial_bed"], jax.random.key(0), consts)
        m = p["data_mask"] & np.isfinite(p["cond_bed"])
        want = np.nansum(
            (p["initial_bed"].astype(np.float32)[m] - p["cond_bed"][m]) ** 2
        ) / (2 * 20.0**2)
        assert float(state.loss_data) == pytest.approx(want, rel=1e-4)

    def test_validation(self):
        p = make_synthetic_problem(H=64, W=64)
        c = build_small_chain(p)
        with pytest.raises(ValueError):
            c.set_loss_type(sigma_mc=5.0, diff_func="sumsquare")  # no sigma
        with pytest.raises(ValueError):
            c.set_loss_type(sigma_mc=5.0, diff_func="meanabs", sigma_data=1)

    def test_chain_pulled_toward_data(self):
        """With a strong data term the sampler reduces radar misfit."""
        p = make_synthetic_problem(H=64, W=64)
        chain = build_data_loss_chain(p, sigma_data=10.0)
        out = chain.run(n_iter=600, seed=1)
        m = p["data_mask"] & np.isfinite(p["cond_bed"]) & (p["region"] > 0)
        mis0 = np.mean((p["initial_bed"][m] - p["cond_bed"][m]) ** 2)
        mis1 = np.mean((out["bed"][m] - p["cond_bed"][m]) ** 2)
        assert mis1 < mis0
        # loss_data trace is populated and consistent
        assert out["loss_data"][-1] > 0
        np.testing.assert_allclose(out["loss"],
                                   out["loss_mc"] + out["loss_data"],
                                   rtol=1e-5)
        # bookkeeping: final loss_data equals recomputed misfit
        final = out["final_state"]
        want = np.nansum((np.asarray(final.bed)[m] - p["cond_bed"][m]) ** 2
                         ) / (2 * 10.0**2)
        mfull = p["data_mask"] & np.isfinite(p["cond_bed"])
        want_full = np.nansum(
            (np.asarray(final.bed)[mfull] - p["cond_bed"][mfull]) ** 2
        ) / (2 * 10.0**2)
        assert float(final.loss_data) == pytest.approx(want_full, rel=1e-3)

    def test_fused_matches_xla_with_data_loss(self):
        p = make_synthetic_problem(H=64, W=64)
        chain = build_data_loss_chain(p)
        static, consts = chain.build()
        keys = jax.random.split(jax.random.key(9), 4)
        beds = jnp.broadcast_to(jnp.asarray(p["initial_bed"], jnp.float32),
                                (4, 64, 64))
        states = init_states(beds, keys, consts)
        xla_step = jax.jit(
            lambda c, s: jax.vmap(make_step(static), in_axes=(None, 0))(c, s))
        fused_step = jax.jit(make_batched_step_fused(static, interpret=True))
        s_x, s_f = states, states
        for it in range(4):
            s_x, tr_x = xla_step(consts, s_x)
            s_f, tr_f = fused_step(consts, s_f)
            np.testing.assert_array_equal(np.asarray(tr_x["step"]),
                                          np.asarray(tr_f["step"]))
            np.testing.assert_allclose(np.asarray(s_x.loss_data),
                                       np.asarray(s_f.loss_data), rtol=1e-5,
                                       atol=1e-4)
            np.testing.assert_allclose(np.asarray(s_x.loss_mc),
                                       np.asarray(s_f.loss_mc), rtol=1e-5)
