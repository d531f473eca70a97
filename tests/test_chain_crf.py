"""Tests for the large-scale (CRF) chain: MH-kernel parity with the NumPy
reference twin on injected proposals, plus end-to-end chain behavior."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mcmc_tpu.models import ChainCRF, init_state
from mcmc_tpu.models.chain_crf import make_kernel
from mcmc_tpu.utils.config import BlockMenuConfig, RandFieldConfig, WeightConfig

from tests import reference_impl as ref
from tests.conftest import make_synthetic_problem


def build_small_chain(p, blocks=(8, 12), sigma=5.0, block_type="RF"):
    c = ChainCRF(p["xx"], p["yy"], p["initial_bed"], p["surf"], p["velx"],
                 p["vely"], p["dhdt"], p["smb"], p["cond_bed"], p["data_mask"],
                 p["grounded"], p["resolution"])
    c.set_update_region(True, p["region"])
    c.set_loss_type(sigma_mc=sigma, massConvInRegion=True)
    c.configure_randfield(
        RandFieldConfig(range_min_x=3e3, range_max_x=8e3, range_min_y=3e3,
                        range_max_y=8e3, scale_min=20.0, scale_max=60.0,
                        nugget_max=0.0, model_name="Gaussian", isotropic=True),
        BlockMenuConfig(blocks[0], blocks[1], blocks[0], blocks[1], steps=2),
        WeightConfig(L=2.0, x0=0.0, k=6.0, offset=1.0, max_dist=5e3,
                     resolution=p["resolution"]),
    )
    c.set_update_type(block_type)
    return c


def np_consts_from(chain, consts):
    return dict(
        surf=np.asarray(consts.surf, np.float64),
        velx=np.asarray(consts.velx, np.float64),
        vely=np.asarray(consts.vely, np.float64),
        dhdt=np.asarray(consts.forcing, np.float64),  # forcing = dhdt - smb
        smb=np.zeros(np.asarray(consts.forcing).shape, np.float64),
        update_mask=np.asarray(consts.update_mask, np.float64),
        mc_mask=np.asarray(consts.mc_mask),
        crf_weight=np.asarray(consts.crf_weight, np.float64),
        sigma_mc=float(consts.sigma_mc),
        resolution=float(consts.resolution),
    )


class TestKernelParity:
    @pytest.mark.parametrize("center", [(32, 32), (0, 0), (63, 63), (2, 40),
                                        (63, 5)])
    @pytest.mark.parametrize("u", [0.0, 0.999])
    # (12, 8): the production (even-ified) case.  (11, 7): odd sizes never
    # come out of the reference's block menu (w//2*2, MCMC.py:579), but the
    # kernel's floor-division bounds must still match the reference's
    # int-truncation bounds at clipped corners (they do — the clamp absorbs
    # the floor-vs-truncate difference at negative offsets).
    @pytest.mark.parametrize("hw", [(12, 8), (11, 7)])
    def test_injected_proposal_matches_reference(self, center, u, hw):
        p = make_synthetic_problem(H=64, W=64)
        chain = build_small_chain(p)
        static, consts = chain.build()
        state = init_state(p["initial_bed"], jax.random.key(0), consts)
        kernel = jax.jit(make_kernel(static))

        B = static.rf.B
        rng = np.random.default_rng(7)
        h, w = hw
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
        np_new, info = ref.crf_mh_update(np_state, np_consts_from(chain, consts),
                                         canvas.astype(np.float64), h, w, cx, cy, u)

        assert bool(trace["step"]) == bool(info["accept"])
        np.testing.assert_allclose(np.asarray(new_state.bed), np_new["bed"],
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(new_state.mc_res), np_new["mc_res"],
                                   rtol=1e-3, atol=1e-2)
        np.testing.assert_allclose(float(new_state.loss_mc), np_new["loss_mc"],
                                   rtol=2e-3)

    def test_thickness_guard_rejects(self):
        p = make_synthetic_problem(H=64, W=64)
        chain = build_small_chain(p)
        static, consts = chain.build()
        state = init_state(p["initial_bed"], jax.random.key(0), consts)
        kernel = jax.jit(make_kernel(static))
        B = static.rf.B
        # a proposal that pushes the bed far above the surface must be rejected
        canvas = np.zeros((B, B), np.float32)
        canvas[:12, :8] = 1e6
        new_state, trace = kernel(
            consts, state, jnp.asarray(canvas), jnp.int32(12), jnp.int32(8),
            jnp.int32(32), jnp.int32(32), jnp.float32(0.5), jax.random.key(1))
        assert not bool(trace["step"])
        np.testing.assert_array_equal(np.asarray(new_state.bed),
                                      np.asarray(state.bed))


class TestChainRun:
    def test_loss_decays_and_bookkeeping_consistent(self):
        p = make_synthetic_problem(H=64, W=64)
        chain = build_small_chain(p, sigma=5.0)
        out = chain.run(n_iter=400, seed=0)

        loss = out["loss"]
        assert loss.shape == (400,)
        assert np.all(np.isfinite(loss))
        # MH on a misfit-dominated start: loss must trend downward (small
        # blocks cover the region slowly, so require a clear trend, not a
        # large total drop)
        assert loss[-50:].mean() < loss[:50].mean()
        assert loss[-1] < loss[0]
        acc = out["steps"].mean()
        assert 0.02 < acc < 0.98
        assert not out["steps"][0]
        assert np.isnan(out["blocks"][0]).all()
        # loss accumulated by deltas must equal loss recomputed from the
        # patched residual field
        final = out["final_state"]
        recomputed = ref.masked_gaussian_loss(
            np.asarray(final.mc_res), np.asarray(chain.mc_region_mask),
            chain.sigma_mc)
        np.testing.assert_allclose(float(final.loss_mc), recomputed, rtol=5e-4)
        # updates only inside the region
        touched = np.asarray(final.bed) != p["initial_bed"].astype(np.float32)
        assert not np.any(touched & (p["region"] == 0))

    def test_reproducible_same_seed(self):
        p = make_synthetic_problem(H=64, W=64)
        out1 = build_small_chain(p).run(n_iter=50, seed=42)
        out2 = build_small_chain(p).run(n_iter=50, seed=42)
        np.testing.assert_array_equal(out1["loss"], out2["loss"])
        np.testing.assert_array_equal(out1["bed"], out2["bed"])

    def test_save_all_beds_and_samples(self):
        p = make_synthetic_problem(H=64, W=64)
        chain = build_small_chain(p)
        chain.set_sample_points_locations(
            np.array([[p["xx"][10, 10], p["yy"][10, 10]],
                      [p["xx"][40, 30], p["yy"][40, 30]]]))
        out = chain.run(n_iter=30, only_save_last_bed=False, seed=1)
        assert out["bed"].shape == (30, 64, 64)
        assert out["sample_values"].shape == (2, 30)
        np.testing.assert_allclose(out["sample_values"][0, 0],
                                   p["initial_bed"][10, 10].astype(np.float32))

    def test_crf_weight_suppresses_updates_at_data(self):
        p = make_synthetic_problem(H=64, W=64)
        chain = build_small_chain(p, block_type="CRF_weight")
        static, consts = chain.build()
        w = np.asarray(consts.crf_weight)
        assert w[p["data_mask"]].max() < 1e-5  # zero weight at data cells
        assert w.max() > 0.5


class TestReferenceRunSignature:
    """Reference-parity run() extras (MCMC.py:1137): positional RF
    wrapper, info_per_iter/progress_bar segmentation — results must be
    BITWISE identical to the plain single-scan run."""

    def test_progress_segmented_run_is_bitwise_identical(self, capsys):
        p = make_synthetic_problem(H=48, W=48)
        c = build_small_chain(p)
        out_plain = c.run(n_iter=37, seed=5)
        out_seg = c.run(n_iter=37, seed=5, info_per_iter=10,
                        progress_bar=True)
        np.testing.assert_array_equal(out_plain["bed"], out_seg["bed"])
        np.testing.assert_array_equal(out_plain["loss"], out_seg["loss"])
        np.testing.assert_array_equal(out_plain["steps"], out_seg["steps"])
        assert "it/s" in capsys.readouterr().out

    def test_positional_randfield_wrapper(self):
        from mcmc_tpu.models import RandField

        p = make_synthetic_problem(H=48, W=48)
        c = build_small_chain(p)
        rf = RandField(3e3, 8e3, 3e3, 8e3, 20, 60, 0.0, "Gaussian", True)
        rf.set_generation_method(True)
        rf.set_block_sizes(8, 12, 8, 12, steps=2)
        rf.set_weight_param(2.0, 0.0, 6.0, 1.0, 5e3, p["resolution"])
        out = c.run(30, rf, seed=2)
        assert np.isfinite(out["loss"]).all()
        # reference error text for a non-RandField positional arg
        import pytest

        with pytest.raises(TypeError, match="RandField"):
            c.run(30, object())

    def test_reference_positional_binding(self, capsys):
        """The reference calls run(n_iter, RF, only_save_last_bed,
        info_per_iter, plot, progress_bar) POSITIONALLY — all six must
        bind to the right parameters (save_beds/seed are keyword-only)."""
        from mcmc_tpu.models import RandField

        p = make_synthetic_problem(H=48, W=48)
        c = build_small_chain(p)
        rf = RandField(3e3, 8e3, 3e3, 8e3, 20, 60, 0.0, "Gaussian", True)
        rf.set_block_sizes(8, 12, 8, 12, steps=2)
        rf.set_weight_param(2.0, 0.0, 6.0, 1.0, 5e3, p["resolution"])
        out = c.run(25, rf, True, 10, False, True, seed=4)
        assert out["bed"].ndim == 2  # only_save_last_bed=True bound right
        assert "it/s" in capsys.readouterr().out  # progress_bar=True bound
        import pytest

        with pytest.raises(TypeError):
            c.run(25, rf, True, 10, False, True, 4)  # seed is keyword-only


class TestChainLossMethod:
    """chain.loss(mc_res, dataDiff) — the tutorials' baseline-line call
    (reference MCMC.py:1021-1044, T3 cells 32-35)."""

    def test_matches_reference_formula(self):
        p = make_synthetic_problem(H=48, W=48)
        c = build_small_chain(p, sigma=5.0)
        rng = np.random.default_rng(0)
        res = rng.normal(size=p["xx"].shape)
        total, loss_mc, loss_data = c.loss(res, 0)
        expect = np.nansum(res[p["region"] == 1] ** 2) / (2 * 5.0 ** 2)
        assert total == pytest.approx(expect, rel=1e-12)
        assert loss_data == 0.0
        # matches what run() reports for the initial state
        out = c.run(n_iter=2, seed=0)
        static, consts = c.build()
        from mcmc_tpu.data import get_mass_conservation_residual

        res0 = get_mass_conservation_residual(
            p["initial_bed"], p["surf"], p["velx"], p["vely"], p["dhdt"],
            p["smb"], p["resolution"])
        assert c.loss(res0, 0)[0] == pytest.approx(float(out["loss"][0]),
                                                   rel=1e-5)


class TestRunRNGStream:
    """set_random_generator + run() semantics (code-review findings,
    round 3): the setter path must work at all (the old
    `self._key or as_key(None)` raised TypeError on typed PRNG keys), and
    successive run() calls must continue the stream, not replay it —
    mirroring the reference's single advancing Generator."""

    def test_set_random_generator_then_run(self):
        p = make_synthetic_problem(H=32, W=32)
        c = build_small_chain(p)
        c.set_random_generator(42)
        out1 = c.run(20, progress_bar=False)
        assert np.isfinite(out1["loss"]).all()
        # second run continues the stream: different trajectory
        out2 = c.run(20, progress_bar=False)
        assert not np.array_equal(out1["steps"], out2["steps"]) or \
            not np.allclose(out1["loss"], out2["loss"])
        # re-seeding restarts the stream reproducibly
        c2 = build_small_chain(p)
        c2.set_random_generator(42)
        out1b = c2.run(20, progress_bar=False)
        np.testing.assert_array_equal(out1["steps"], out1b["steps"])
        np.testing.assert_array_equal(out1["loss"], out1b["loss"])

    def test_explicit_seed_reproducible(self):
        p = make_synthetic_problem(H=32, W=32)
        c = build_small_chain(p)
        a = c.run(15, progress_bar=False, seed=7)
        b = c.run(15, progress_bar=False, seed=7)
        np.testing.assert_array_equal(a["loss"], b["loss"])


def test_run_rejects_n_iter_zero():
    p = make_synthetic_problem(H=32, W=32)
    c = build_small_chain(p)
    with pytest.raises(ValueError, match="n_iter"):
        c.run(0, seed=1)


def test_crf_weight_empty_data_mask_raises():
    p = make_synthetic_problem(H=32, W=32)
    p["data_mask"] = np.zeros((32, 32), bool)
    p["cond_bed"] = np.full((32, 32), np.nan)
    c = build_small_chain(p, block_type="CRF_weight")
    with pytest.raises(ValueError, match="no conditioning cells"):
        c.set_crf_data_weight()
