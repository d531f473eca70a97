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

    def test_chunked_scan_bitwise_equal(self, setup):
        """Batches above the kernel's compile ceiling scan with the batch
        split into chunk-carries (sampler.scan_chunked) — must be bitwise
        identical to the single-launch scan (chains are independent)."""
        from functools import partial

        from mcmc_tpu.parallel.sampler import scan_chunked

        static, consts, states = setup
        batched = make_batched_step_fused(static, interpret=True)

        @jax.jit
        def run_one(states):
            return jax.lax.scan(lambda s, _: batched(consts, s), states,
                                None, length=4)

        run_chunked = jax.jit(partial(scan_chunked, batched, consts,
                                      k=2, n_steps=4))
        s_a, tr_a = run_one(states)
        s_b, tr_b = run_chunked(states)
        np.testing.assert_array_equal(np.asarray(s_a.fields),
                                      np.asarray(s_b.fields))
        np.testing.assert_array_equal(np.asarray(s_a.loss_mc),
                                      np.asarray(s_b.loss_mc))
        np.testing.assert_array_equal(np.asarray(tr_a["step"]),
                                      np.asarray(tr_b["step"]))
        np.testing.assert_array_equal(
            np.asarray(jax.random.key_data(s_a.key)),
            np.asarray(jax.random.key_data(s_b.key)))

    def test_fused_step_raises_above_ceiling(self, setup):
        static, consts, states = setup
        import jax.numpy as jnp
        import pytest as _pytest

        step = make_batched_step_fused(static, interpret=True, max_chains=2)
        with _pytest.raises(ValueError, match="single-launch bound"):
            step(consts, states)  # 4 chains > 2

    def test_chunk_count_selection(self):
        from mcmc_tpu.models.chain_crf import fused_chunk_count

        assert fused_chunk_count(256) == 1
        assert fused_chunk_count(384) == 1
        assert fused_chunk_count(512) == 2
        assert fused_chunk_count(1024) == 4  # 512 halves again: 4 x 256
        assert fused_chunk_count(768) == 2
        # prime above the preferred size: now a single launch (the old
        # >=448 'compile crash' was an SMEM layout OOM, fixed by the
        # transposed (k, N) SMEM layouts — tools/mosaic_repro.py stage 5)
        assert fused_chunk_count(389) == 1
        assert fused_chunk_count(1536) == 4
        # no equal split above the single-launch bound -> XLA fallback
        assert fused_chunk_count(8209) == 0  # prime > 8192

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
