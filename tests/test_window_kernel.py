"""Fused Pallas window kernel vs the vmapped XLA step: must be identical.

Runs the Pallas kernel in interpreter mode on the CPU backend; the real-TPU
equivalence is exercised by the verify drive script and bench.
"""

import numpy as np
import pytest

import jax

from mcmc_tpu.models.chain_crf import make_batched_step_fused, make_step
from mcmc_tpu.parallel.sampler import init_states
from tests.conftest import make_synthetic_problem
from tests.test_chain_crf import build_small_chain


@pytest.fixture(scope="module")
def setup():
    p = make_synthetic_problem(H=64, W=64)
    chain = build_small_chain(p)
    static, consts = chain.build()
    import jax.numpy as jnp

    keys = jax.random.split(jax.random.key(42), 4)
    beds = jnp.broadcast_to(jnp.asarray(p["initial_bed"], jnp.float32),
                            (4, 64, 64))
    states = init_states(beds, keys, consts)
    return static, consts, states


class TestFusedKernel:
    @pytest.mark.parametrize("mode", ["resident", "hbm"])
    def test_matches_vmapped_xla_path(self, setup, monkeypatch, mode):
        # small grids auto-select the VMEM-resident consts variant; "hbm"
        # forces the per-chain-DMA variant so both kernels stay covered
        if mode == "hbm":
            monkeypatch.setenv("MCMC_TPU_CRF_SURGERY", "nores")
        static, consts, states = setup
        xla_step = jax.jit(
            lambda c, s: jax.vmap(make_step(static), in_axes=(None, 0))(c, s))
        fused_step = jax.jit(make_batched_step_fused(static, interpret=True))

        s_x, s_f = states, states
        for it in range(5):
            s_x, tr_x = xla_step(consts, s_x)
            s_f, tr_f = fused_step(consts, s_f)
            np.testing.assert_array_equal(np.asarray(tr_x["step"]),
                                          np.asarray(tr_f["step"]),
                                          err_msg=f"iter {it}")
            np.testing.assert_allclose(np.asarray(s_x.loss_mc),
                                       np.asarray(s_f.loss_mc),
                                       rtol=1e-6, err_msg=f"iter {it}")
            # f32 last-ulp differences from different fusion orders of the
            # same gradient arithmetic; ~1e-5 relative on O(20) residuals
            np.testing.assert_allclose(np.asarray(s_x.fields),
                                       np.asarray(s_f.fields),
                                       rtol=5e-5, atol=1e-3,
                                       err_msg=f"iter {it}")
            np.testing.assert_allclose(np.asarray(tr_x["block"]),
                                       np.asarray(tr_f["block"]),
                                       err_msg=f"iter {it}")

    def test_scan_runs(self, setup):
        """The fused step works under lax.scan (the production shape)."""
        import jax.numpy as jnp
        from functools import partial

        static, consts, states = setup
        fused_step = make_batched_step_fused(static, interpret=True)

        @jax.jit
        def run(states):
            def body(s, _):
                s, tr = fused_step(consts, s)
                return s, tr["loss"]
            return jax.lax.scan(body, states, None, length=10)

        final, losses = run(states)
        assert losses.shape == (10, 4)
        assert np.isfinite(np.asarray(losses)).all()
