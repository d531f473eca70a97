"""SGS chain tests: bookkeeping exactness, behavioral and statistical checks."""

import numpy as np
import pytest

from mcmc_tpu.models.chain_sgs import ChainSGS
from mcmc_tpu.ops.transforms import NormalScoreTransform
from tests import reference_impl as ref
from tests.conftest import make_synthetic_problem


def build_sgs_chain(p, do_transform=True, detrend=True, blocks=(5, 12)):
    c = ChainSGS(p["xx"], p["yy"], p["initial_bed"], p["surf"], p["velx"],
                 p["vely"], p["dhdt"], p["smb"], p["cond_bed"], p["data_mask"],
                 p["grounded"], p["resolution"])
    c.set_update_region(True, p["region"])
    c.set_loss_type(sigma_mc=5.0, massConvInRegion=True)
    if detrend:
        from scipy.ndimage import gaussian_filter

        trend = gaussian_filter(p["initial_bed"], sigma=10).astype(np.float32)
        c.set_trend(trend, detrend_map=True)
    else:
        c.set_trend(None, detrend_map=False)
    if do_transform:
        resid = (p["initial_bed"] - (c.trend if detrend else 0)).ravel()
        nst = NormalScoreTransform.fit(resid, n_quantiles=500)
        c.set_normal_transformation(nst, do_transform=True)
    else:
        c.set_normal_transformation(None, do_transform=False)
    c.set_variogram("Exponential", 5e3, 1.0, 0.0)
    c.set_sgs_param(48, 30e3)
    c.set_block_sizes(blocks[0], blocks[1], blocks[0], blocks[1])
    return c


class TestSGSChain:
    def test_run_behavior_and_residual_exactness(self):
        p = make_synthetic_problem(H=64, W=64)
        chain = build_sgs_chain(p)
        out = chain.run(n_iter=120, seed=0)

        loss = out["loss"]
        assert loss.shape == (120,)
        assert np.all(np.isfinite(loss))
        acc = out["steps"].mean()
        assert 0.01 < acc < 0.99
        # SGS patching must equal a full-grid recompute exactly (no stale ring)
        final = out["final_state"]
        trend = chain.trend if chain.detrend_map else 0.0
        full_res = ref.mass_conservation_residual(
            np.asarray(final.bed, np.float64) + trend, p["surf"], p["velx"],
            p["vely"], p["dhdt"], p["smb"], p["resolution"])
        np.testing.assert_allclose(np.asarray(final.mc_res), full_res,
                                   rtol=2e-3, atol=2e-2)
        # loss bookkeeping consistent with the patched residual
        recomputed = ref.masked_gaussian_loss(
            np.asarray(final.mc_res), np.asarray(chain.mc_region_mask), 5.0)
        np.testing.assert_allclose(float(final.loss_mc), recomputed, rtol=1e-3)
        # updates stay inside the region (+1 halo cell of residual change
        # but bed untouched outside the block/region)
        touched = (np.asarray(final.bed) + (chain.trend if chain.detrend_map
                                            else 0.0)
                   ).astype(np.float32) != p["initial_bed"].astype(np.float32)

    def test_smooth_matern_no_nan_leak(self):
        """Smooth Matern covariance + large blocks: the Cholesky is at the
        edge of f32 stability; draws must never leak NaN into the state and
        the loss must stay consistent with the patched residual (regression
        test for the NaN-acceptance bug found in examples/04)."""
        p = make_synthetic_problem(H=64, W=64)
        chain = build_sgs_chain(p, blocks=(5, 20))
        chain.set_variogram("Matern", 10e3, 1.0, 0.0, vario_smoothness=1.2)
        chain.set_sgs_param(48, 30e3)
        out = chain.run(n_iter=100, seed=4)
        final = out["final_state"]
        assert np.isfinite(np.asarray(final.bed)).all()
        assert np.isfinite(out["loss"]).all()
        assert float(final.loss_mc) >= 0.0
        recomputed = ref.masked_gaussian_loss(
            np.asarray(final.mc_res), np.asarray(chain.mc_region_mask), 5.0)
        np.testing.assert_allclose(float(final.loss_mc), recomputed,
                                   rtol=2e-3, atol=1e-2)
        assert 0.005 < out["steps"][1:].mean() <= 1.0

    def test_no_transform_no_detrend(self):
        p = make_synthetic_problem(H=64, W=64)
        chain = build_sgs_chain(p, do_transform=False, detrend=False)
        out = chain.run(n_iter=60, seed=1)
        assert np.isfinite(out["loss"]).all()
        assert out["steps"][1:].mean() > 0.0

    def test_reproducible(self):
        p = make_synthetic_problem(H=64, W=64)
        out1 = build_sgs_chain(p).run(n_iter=40, seed=3)
        out2 = build_sgs_chain(p).run(n_iter=40, seed=3)
        np.testing.assert_array_equal(out1["loss"], out2["loss"])

    def test_data_cells_pinned_to_radar(self):
        """In-block radar cells are reset to conditioning data, not resampled
        (reference MCMC.py:1771-1773)."""
        p = make_synthetic_problem(H=64, W=64)
        chain = build_sgs_chain(p)
        out = chain.run(n_iter=150, seed=5)
        final_bed = np.asarray(out["bed"])
        dm = p["data_mask"] & (np.asarray(out["final_state"].resampled) > 0)
        if dm.sum() > 0:
            # resampled data cells carry (transform-roundtripped) radar values
            want = p["cond_bed"][dm]
            got = final_bed[dm]
            assert np.nanmax(np.abs(got - want)) < 60.0  # quantile clamp tol

    def test_sample_points_and_all_beds(self):
        p = make_synthetic_problem(H=64, W=64)
        chain = build_sgs_chain(p)
        chain.set_sample_points_locations(
            np.array([[p["xx"][20, 20], p["yy"][20, 20]]]))
        out = chain.run(n_iter=25, only_save_last_bed=False, seed=2)
        assert out["bed"].shape == (25, 64, 64)
        assert out["sample_values"].shape == (1, 25)
        np.testing.assert_allclose(
            out["sample_values"][0, 0], p["initial_bed"][20, 20], atol=30.0)

    def test_variogram_validation(self):
        p = make_synthetic_problem(H=64, W=64)
        c = ChainSGS(p["xx"], p["yy"], p["initial_bed"], p["surf"], p["velx"],
                     p["vely"], p["dhdt"], p["smb"], p["cond_bed"],
                     p["data_mask"], p["grounded"], p["resolution"])
        with pytest.raises(ValueError):
            c.set_variogram("Cubic", 5e3, 1.0, 0.0)
        with pytest.raises(ValueError):
            c.set_variogram("Matern", 5e3, 1.0, 0.0)  # missing smoothness
        with pytest.raises(ValueError):
            c.set_variogram("Gaussian", [1e3], 1.0, 0.0, isotropic=False)

    def test_set_sgs_param_shapes_the_proposal(self):
        """num_neighbors / search_radius must change the drawn proposals
        (the reference stores and applies them per cell, MCMC.py:1545-1561;
        round-1 silently ignored both — VERDICT.md weak #2)."""
        p = make_synthetic_problem(H=64, W=64)

        def run_with(nn, rad):
            c = build_sgs_chain(p)
            c.set_sgs_param(nn, rad)
            static, _ = c.build()
            out = c.run(n_iter=60, seed=11)
            return static, out

        st_a, out_a = run_with(48, 30e3)
        st_b, out_b = run_with(8, 30e3)    # fewer conditioning neighbors
        st_c, out_c = run_with(48, 1e3)    # radius of ~2 cells

        assert st_a.K == 48 and st_b.K == 8
        assert st_a.M == 8 and st_c.M == 2  # radius sizes the window margin
        # identical seed => identical block/accept stream; the conditional
        # draws must nevertheless differ because the conditioning set differs
        assert not np.allclose(out_a["bed"], out_b["bed"])
        assert not np.allclose(out_a["bed"], out_c["bed"])

    def test_small_radius_limits_conditioning_reach(self):
        """With a tiny search radius the conditional draw conditions on at
        most the near ring: acceptance should still be sane and runs finite."""
        p = make_synthetic_problem(H=64, W=64)
        c = build_sgs_chain(p)
        c.set_sgs_param(16, 600.0)  # ~1 cell radius at 500 m resolution
        out = c.run(n_iter=80, seed=3)
        assert np.all(np.isfinite(out["loss"]))
        assert 0.005 < out["steps"].mean() < 0.995


class TestMixtureSCC:
    """Analytic mixture S_CC equals the periodized-stamp gather."""

    @pytest.mark.parametrize("vario", [("Matern", 1.3), ("Gaussian", None),
                                       ("Exponential", None)])
    def test_mixture_matches_stamp(self, vario):
        import jax.numpy as jnp

        vtype, s = vario
        p = make_synthetic_problem(H=48, W=48)
        c = build_sgs_chain(p)
        c.set_variogram(vtype, 5e3, 1.3, 0.0, vario_smoothness=s)
        static, consts = c.build()
        assert static.Mg + static.Me > 0, "mixture fit should be accepted"
        SB, NE = static.SB, static.NE
        rng = np.random.default_rng(0)
        idx = rng.permutation(SB * SB)[: static.K]
        ia, ja = idx // SB, idx % SB
        # stamp gather (ground truth, periodized)
        di = np.mod(ia[:, None] - ia[None, :], NE)
        dj = np.mod(ja[:, None] - ja[None, :], NE)
        S_ref = np.asarray(consts.cov_stamp)[di, dj]
        # mixture evaluation (as in the kernel)
        q = np.asarray(consts.qcoef, np.float64)
        dif = (ia[:, None] - ia[None, :]).astype(np.float64)
        djf = (ja[:, None] - ja[None, :]).astype(np.float64)
        h2 = q[0] * djf ** 2 + q[1] * djf * dif + q[2] * dif ** 2
        hn = np.sqrt(h2)
        S_mix = np.zeros_like(h2)
        for a, b in zip(np.asarray(consts.mix_ag), np.asarray(consts.mix_bg)):
            S_mix += a * np.exp(-b * h2)
        for a, b in zip(np.asarray(consts.mix_ae), np.asarray(consts.mix_be)):
            S_mix += a * np.exp(-b * hn)
        # tolerance: fit error (<= 1e-3 * amp) + periodization tail
        np.testing.assert_allclose(S_mix, S_ref, atol=2.5e-3 * 1.3)

    def test_spherical_falls_back_to_stamp(self):
        p = make_synthetic_problem(H=48, W=48)
        c = build_sgs_chain(p)
        c.set_variogram("Spherical", 5e3, 1.0, 0.0)
        static, _ = c.build()
        assert static.Mg + static.Me == 0, \
            "spherical range kink should reject the mixture fit"

    def test_mixture_matches_stamp_anisotropic(self):
        """The qcoef quadratic form must carry the rotated/anisotropic
        metric: mixture S_CC == stamp gather under azimuth + 2:1 ranges."""
        p = make_synthetic_problem(H=48, W=48)
        c = build_sgs_chain(p)
        c.set_variogram("Gaussian", [8e3, 4e3], 1.0, 0.0, isotropic=False,
                        vario_azimuth=30.0)
        static, consts = c.build()
        assert static.Mg + static.Me > 0
        SB, NE = static.SB, static.NE
        rng = np.random.default_rng(1)
        idx = rng.permutation(SB * SB)[: static.K]
        ia, ja = idx // SB, idx % SB
        di = np.mod(ia[:, None] - ia[None, :], NE)
        dj = np.mod(ja[:, None] - ja[None, :], NE)
        S_ref = np.asarray(consts.cov_stamp)[di, dj]
        q = np.asarray(consts.qcoef, np.float64)
        dif = (ia[:, None] - ia[None, :]).astype(np.float64)
        djf = (ja[:, None] - ja[None, :]).astype(np.float64)
        h2 = q[0] * djf ** 2 + q[1] * djf * dif + q[2] * dif ** 2
        S_mix = np.zeros_like(h2)
        for a, b in zip(np.asarray(consts.mix_ag), np.asarray(consts.mix_bg)):
            S_mix += a * np.exp(-b * h2)
        for a, b in zip(np.asarray(consts.mix_ae), np.asarray(consts.mix_be)):
            S_mix += a * np.exp(-b * np.sqrt(h2))
        np.testing.assert_allclose(S_mix, S_ref, atol=2.5e-3)


class TestZPlaneCache:
    def test_cache_equals_transform_of_bed_after_run(self):
        """The state's z-plane must stay equal to transform(bed plane)
        throughout a run (within LUT interpolation tolerance) — including
        the tail clamp for out-of-range draws (review fix 2026-08-17)."""
        p = make_synthetic_problem(H=64, W=64)
        c = build_sgs_chain(p)
        out = c.run(n_iter=150, seed=4)
        st = out["final_state"]
        bed_plane = np.asarray(st.z_bed)  # cached z
        nst = c._host_nst
        z_exact = np.asarray(nst.transform_np(np.asarray(st.bed)))
        # LUT resolution tolerance; the forward clip bound caps both sides
        np.testing.assert_allclose(bed_plane, z_exact, atol=5e-3)
        # cache never exceeds the forward table's range
        lo = float(np.asarray(c.build()[1].nst.fwd_table)[0, 0])
        hi = float(np.asarray(c.build()[1].nst.fwd_table)[-1, 1])
        assert bed_plane.min() >= lo - 1e-6
        assert bed_plane.max() <= hi + 1e-6


class TestBatchedStep:
    def test_batched_equals_vmapped_per_chain(self):
        """make_sgs_step_batched (stage-split around the batch solve) must
        be bitwise-equal to vmap(make_sgs_step) on the XLA solver path."""
        import jax
        import jax.numpy as jnp

        from mcmc_tpu.models.chain_sgs import (make_sgs_step,
                                               make_sgs_step_batched,
                                               sgs_init_state)

        p = make_synthetic_problem(H=64, W=64)
        c = build_sgs_chain(p)
        static, consts = c.build()
        keys = jax.random.split(jax.random.key(3), 4)
        states = jax.vmap(lambda k: sgs_init_state(
            c._initial_detrended, k, consts, z0=c._initial_z,
            use_transform=static.use_transform))(keys)

        ref_step = jax.jit(jax.vmap(make_sgs_step(static), in_axes=(None, 0)))
        new_step = jax.jit(make_sgs_step_batched(static))
        s_ref, s_new = states, states
        for _ in range(5):
            s_ref, tr_ref = ref_step(consts, s_ref)
            s_new, tr_new = new_step(consts, s_new)
        np.testing.assert_array_equal(np.asarray(s_ref.fields),
                                      np.asarray(s_new.fields))
        np.testing.assert_array_equal(np.asarray(s_ref.loss_mc),
                                      np.asarray(s_new.loss_mc))
        np.testing.assert_array_equal(np.asarray(tr_ref["step"]),
                                      np.asarray(tr_new["step"]))


class TestSegmentedRun:
    def test_progress_segmented_run_is_bitwise_identical(self, capsys):
        """info_per_iter/progress_bar segmentation must not change
        results (shares _run_segmented with ChainCRF)."""
        p = make_synthetic_problem(H=64, W=64)
        c = build_sgs_chain(p)
        out_plain = c.run(n_iter=41, seed=9)
        out_seg = c.run(n_iter=41, seed=9, info_per_iter=12,
                        progress_bar=True)
        np.testing.assert_array_equal(out_plain["bed"], out_seg["bed"])
        np.testing.assert_array_equal(out_plain["loss"], out_seg["loss"])
        np.testing.assert_array_equal(out_plain["blocks"], out_seg["blocks"])
        assert "it/s" in capsys.readouterr().out


class TestDropoutBatched:
    def test_batched_step_with_dropout_matches_vmapped(self):
        """The dropout branch threads drop_u through both step builders
        identically."""
        import jax

        from mcmc_tpu.models.chain_sgs import (make_sgs_step,
                                               make_sgs_step_batched,
                                               sgs_init_state)

        p = make_synthetic_problem(H=64, W=64)
        c = build_sgs_chain(p)
        c.set_sgs_param(48, 30e3, sgs_rand_dropout_on=True, dropout_rate=0.3)
        static, consts = c.build()
        assert static.dropout
        keys = jax.random.split(jax.random.key(11), 3)
        states = jax.vmap(lambda k: sgs_init_state(
            c._initial_detrended, k, consts, z0=c._initial_z,
            use_transform=static.use_transform))(keys)
        s_ref, _ = jax.jit(jax.vmap(make_sgs_step(static),
                                    in_axes=(None, 0)))(consts, states)
        s_new, _ = jax.jit(make_sgs_step_batched(static))(consts, states)
        np.testing.assert_array_equal(np.asarray(s_ref.fields),
                                      np.asarray(s_new.fields))


class TestNuggetPath:
    def test_nugget_chain_runs_and_adds_noise(self):
        """has_nugget branch: the draw adds sqrt(nugget) white noise; the
        chain stays finite and the proposal variance grows accordingly."""
        p = make_synthetic_problem(H=48, W=48)
        c = build_sgs_chain(p)
        c.set_variogram("Exponential", 5e3, 1.0, 0.3)
        static, _ = c.build()
        assert static.has_nugget
        out = c.run(n_iter=60, seed=5)
        assert np.all(np.isfinite(out["loss"]))
        assert np.all(np.isfinite(out["bed"]))


def test_sgs_set_random_generator_stream():
    """Setter-seeded runs work and advance the stream across calls
    (round-3 review: `self._key or ...` crashed on typed PRNG keys)."""
    p = make_synthetic_problem(H=48, W=48)
    c = build_sgs_chain(p)
    c.set_random_generator(11)
    o1 = c.run(10, progress_bar=False)
    o2 = c.run(10, progress_bar=False)
    assert np.isfinite(o1["loss"]).all() and np.isfinite(o2["loss"]).all()
    assert not (np.array_equal(o1["steps"], o2["steps"])
                and np.allclose(o1["loss"], o2["loss"]))


class TestCGBudget:
    """The CG iteration budget follows the covariance smoothness: measured
    f32 stagnation floors on captured production systems (NOTES_ROUND4 §6
    lever b) — exponential converges by 32 iters, spherical by 48, smooth
    models need the full 64."""

    @pytest.mark.parametrize("vario,kw,want", [
        (("Exponential", 5e3, 1.0, 0.0), {}, 32),
        (("Spherical", 8e3, 1.0, 0.0), {}, 48),
        (("Gaussian", 8e3, 1.0, 0.0), {}, 64),
        (("Matern", 10e3, 1.0, 0.0), {"vario_smoothness": 1.2}, 64),
        (("Matern", 10e3, 1.0, 0.0), {"vario_smoothness": 0.5}, 32),
    ])
    def test_default_budget(self, vario, kw, want):
        p = make_synthetic_problem(H=48, W=48)
        c = build_sgs_chain(p)
        c.set_variogram(*vario, **kw)
        static, _ = c.build()
        assert static.cg_iters == want

    def test_user_override_wins(self):
        p = make_synthetic_problem(H=48, W=48)
        c = build_sgs_chain(p)
        c.cg_iters = 20
        static, _ = c.build()
        assert static.cg_iters == 20

    def test_budget_capped_by_K(self):
        p = make_synthetic_problem(H=48, W=48)
        c = build_sgs_chain(p)
        c.set_sgs_param(12, 30e3)  # K=12 -> K+16 < 32
        static, _ = c.build()
        assert static.cg_iters == 28


class TestKNearestPacked:
    """The sort-free K-nearest selection must pick the SAME SET as the
    sort-based lax.top_k over -euclid it replaced (NOTES_ROUND4 §6:
    vmapped top_k was 17% of the SGS step-batch)."""

    @staticmethod
    def _topk_reference(candidate, rd, cd, K):
        import jax
        import jax.numpy as jnp
        euclid = jnp.sqrt(jnp.square(rd[:, None].astype(jnp.float32))
                          + jnp.square(cd[None, :].astype(jnp.float32)))
        score = jnp.where(candidate, -euclid, -jnp.inf).ravel()
        top_val, top_idx = jax.lax.top_k(score, K)
        sel = jnp.isfinite(top_val)
        return np.asarray(top_idx), np.asarray(sel)

    def test_matches_topk_set_randomized(self):
        import jax.numpy as jnp

        from mcmc_tpu.models.chain_sgs import k_nearest_packed

        rng = np.random.default_rng(0)
        SB, K = 24, 16
        for trial in range(40):
            # block geometry like prepare(): distances to a random
            # sub-rectangle, clamped at 0 inside it
            a0, a1 = np.sort(rng.integers(0, SB, 2))
            b0, b1 = np.sort(rng.integers(0, SB, 2))
            r = np.arange(SB)
            rd = np.maximum(np.maximum(a0 - r, r - max(a1, a0)), 0)
            cd = np.maximum(np.maximum(b0 - r, r - max(b1, b0)), 0)
            # random candidate mask incl. sparse (< K) and empty cases
            p = [0.5, 0.05, 0.0][trial % 3]
            candidate = rng.random((SB, SB)) < p
            idx, sel = k_nearest_packed(
                jnp.asarray(candidate), jnp.asarray(rd, jnp.int32),
                jnp.asarray(cd, jnp.int32), K)
            idx, sel = np.asarray(idx), np.asarray(sel)
            ref_idx, ref_sel = self._topk_reference(
                jnp.asarray(candidate), jnp.asarray(rd, jnp.int32),
                jnp.asarray(cd, jnp.int32), K)
            assert sel.sum() == ref_sel.sum(), trial
            assert set(idx[sel]) == set(ref_idx[ref_sel]), trial
            # packed slots are index-sorted and unique
            assert np.all(np.diff(idx[sel]) > 0), trial

    def test_onehot_matches_packed_indices(self):
        """k_nearest_onehot's packing matrix row j must be the indicator of
        k_nearest_packed's idx[j] (and all-zero past the valid count)."""
        import jax.numpy as jnp

        from mcmc_tpu.models.chain_sgs import (k_nearest_onehot,
                                               k_nearest_packed)

        rng = np.random.default_rng(7)
        SB, K = 24, 16
        r = np.arange(SB)
        for trial in range(12):
            a0 = rng.integers(0, SB)
            rd = np.maximum(np.abs(r - a0) - 2, 0)
            cd = np.maximum(np.abs(r - (SB - 1 - a0)) - 3, 0)
            candidate = rng.random((SB, SB)) < [0.5, 0.04, 0.0][trial % 3]
            args = (jnp.asarray(candidate), jnp.asarray(rd, jnp.int32),
                    jnp.asarray(cd, jnp.int32), K)
            idx, sel = map(np.asarray, k_nearest_packed(*args))
            P, sel2 = map(np.asarray, k_nearest_onehot(*args))
            np.testing.assert_array_equal(sel, sel2)
            for j in range(K):
                want = np.zeros(SB * SB, np.float32)
                if sel[j]:
                    want[idx[j]] = 1.0
                np.testing.assert_array_equal(P[j], want, err_msg=f"{trial}/{j}")

    def test_gate_matmulpack_bitwise_on_cpu(self, monkeypatch):
        """On CPU (true-f32 matmuls) the one-hot packing matmuls are EXACT —
        each row has one nonzero — so the whole chain trajectory must be
        bitwise identical to the gather/scatter path."""
        p = make_synthetic_problem(H=48, W=48)

        def run_with(gate):
            monkeypatch.setenv("MCMC_TPU_SGS_SURGERY", gate)
            try:
                return build_sgs_chain(p).run(60, seed=3, progress_bar=False)
            finally:
                monkeypatch.delenv("MCMC_TPU_SGS_SURGERY")

        o_def = run_with("")  # default: one-hot packing matmuls
        o_mm = run_with("gatherpack")
        np.testing.assert_array_equal(o_def["loss"], o_mm["loss"])
        np.testing.assert_array_equal(o_def["steps"], o_mm["steps"])
        np.testing.assert_array_equal(o_def["bed"], o_mm["bed"])

    def test_gate_pwininterp_bitwise_on_cpu(self, monkeypatch):
        """The full batched pipeline with the Pallas window extract +
        writeback kernels (interpret mode) must be BITWISE identical to
        the XLA dynamic-slice path — the kernels are pure data movement."""
        p = make_synthetic_problem(H=48, W=48)

        def run_with(gate):
            monkeypatch.setenv("MCMC_TPU_SGS_SURGERY", gate)
            try:
                from mcmc_tpu.parallel import MultiChainSampler

                c = build_sgs_chain(p)
                sampler = MultiChainSampler(c, n_chains=3)
                states = sampler.init(seeds=0)
                states, tr = sampler.run_segment(states, 40)
                return np.asarray(states.fields), np.asarray(tr["loss"])
            finally:
                monkeypatch.delenv("MCMC_TPU_SGS_SURGERY")

        f_def, l_def = run_with("")
        f_pw, l_pw = run_with("pwininterp")
        np.testing.assert_array_equal(l_def, l_pw)
        np.testing.assert_array_equal(f_def, f_pw)

    def test_gate_plutinterp_same_statistics_on_cpu(self, monkeypatch):
        """Batched pipeline with the interpret-mode Pallas LUT: differs
        from XLA only by the lerp's FMA contraction (1 ulp), so short-run
        trajectories match to float tolerance."""
        p = make_synthetic_problem(H=48, W=48)

        def run_with(gate):
            monkeypatch.setenv("MCMC_TPU_SGS_SURGERY", gate)
            try:
                from mcmc_tpu.parallel import MultiChainSampler

                c = build_sgs_chain(p)
                sampler = MultiChainSampler(c, n_chains=3)
                states = sampler.init(seeds=0)
                _, tr = sampler.run_segment(states, 40)
                return np.asarray(tr["loss"])
            finally:
                monkeypatch.delenv("MCMC_TPU_SGS_SURGERY")

        l_def = run_with("")
        l_pl = run_with("plutinterp")
        np.testing.assert_allclose(l_def, l_pl, rtol=2e-4, atol=2e-2)

    def test_gate_lanesinterp_same_statistics_on_cpu(self, monkeypatch):
        """Batched pipeline with the interpret-mode lanes CG kernel
        (ops/cg_kernel.lanes_masked_cg): identical iteration arithmetic to
        the vmapped XLA CG, different reduction order -> short-run
        trajectories match to float tolerance."""
        p = make_synthetic_problem(H=48, W=48)

        def run_with(gate):
            monkeypatch.setenv("MCMC_TPU_SGS_SURGERY", gate)
            try:
                from mcmc_tpu.parallel import MultiChainSampler

                c = build_sgs_chain(p)
                sampler = MultiChainSampler(c, n_chains=3)
                states = sampler.init(seeds=0)
                _, tr = sampler.run_segment(states, 40)
                return np.asarray(tr["loss"])
            finally:
                monkeypatch.delenv("MCMC_TPU_SGS_SURGERY")

        l_def = run_with("")
        # lanesinterp alone exercises the PRODUCTION TPU composition (the
        # fused build+solve mix kernel when the mixture fit is available);
        # +nomixcg pins the S_cc-input lanes kernel
        l_mix = run_with("lanesinterp")
        l_lanes = run_with("lanesinterp,nomixcg")
        np.testing.assert_allclose(l_def, l_mix, rtol=2e-4, atol=2e-2)
        np.testing.assert_allclose(l_def, l_lanes, rtol=2e-4, atol=2e-2)

    def test_halfspec_noise_is_white(self):
        """irfft2 of halfspec_noise must be an iid standard-normal field —
        that is the exact statement that the analytic forward transform
        matches rfft2 of white noise (any bin mis-scaled, e.g. the naive
        non-Hermitian edge columns losing half their variance, shows up
        as cell variance != 1)."""
        import jax
        import jax.numpy as jnp

        from mcmc_tpu.models.chain_sgs import halfspec_noise

        NE, NS = 16, 30000
        keys = jax.random.split(jax.random.PRNGKey(0), NS)

        @jax.jit
        @jax.vmap
        def draw(k):
            v = jax.random.normal(k, (NE * NE,))
            return jnp.fft.irfft2(halfspec_noise(v, NE), s=(NE, NE))

        z = np.asarray(draw(keys))                    # (NS, NE, NE)
        var = z.var(axis=0)
        assert abs(z.mean()) < 0.01
        np.testing.assert_allclose(var, np.ones((NE, NE)), atol=0.05)
        # a few spatial cross-covariances vanish
        flat = z.reshape(NS, -1)
        for a, b in ((0, 1), (0, NE), (3, 200), (17, 91)):
            c = np.mean(flat[:, a] * flat[:, b])
            assert abs(c) < 0.05, (a, b, c)

    def test_gate_fwdfft_same_statistics(self, monkeypatch):
        """The half-spectrum draw and the pre-r5 forward-FFT draw are the
        same DISTRIBUTION (different realizations per key): acceptance and
        post-run loss statistics must agree across a short run."""
        p = make_synthetic_problem(H=48, W=48)

        def run_with(gate):
            monkeypatch.setenv("MCMC_TPU_SGS_SURGERY", gate)
            try:
                from mcmc_tpu.parallel import MultiChainSampler

                c = build_sgs_chain(p)
                sampler = MultiChainSampler(c, n_chains=16)
                states = sampler.init(seeds=0)
                _, tr = sampler.run_segment(states, 60)
                return (float(np.asarray(tr["step"], np.float32).mean()),
                        float(np.asarray(tr["loss"])[-10:].mean()))
            finally:
                monkeypatch.delenv("MCMC_TPU_SGS_SURGERY")

        acc_new, loss_new = run_with("")
        acc_old, loss_old = run_with("fwdfft")
        assert abs(acc_new - acc_old) < 0.15, (acc_new, acc_old)
        assert abs(loss_new - loss_old) < 0.35 * abs(loss_old), (
            loss_new, loss_old)

    def test_gate_nomix_runs_finite(self, monkeypatch):
        """The ``nomix`` surgery gate (constant S_cc, isolates the mixture
        evaluation's transcendental cost) must produce a runnable step with
        finite trajectories — it is a measurement lie, not a sampler, so
        only well-formedness is asserted."""
        p = make_synthetic_problem(H=48, W=48)
        monkeypatch.setenv("MCMC_TPU_SGS_SURGERY", "nomix")
        from mcmc_tpu.parallel import MultiChainSampler

        c = build_sgs_chain(p)
        sampler = MultiChainSampler(c, n_chains=3)
        states = sampler.init(seeds=0)
        states, tr = sampler.run_segment(states, 20)
        assert np.all(np.isfinite(np.asarray(tr["loss"])))
        assert np.all(np.isfinite(np.asarray(states.fields)))

    def test_gate_sorttopk_same_chain_statistics(self, monkeypatch):
        """The production chain run must be statistically indistinguishable
        under either selection path (same set => same proposal law; only
        CG float reassociation differs)."""
        p = make_synthetic_problem(H=48, W=48)

        def run_with(gate):
            monkeypatch.setenv("MCMC_TPU_SGS_SURGERY", gate)
            try:
                c = build_sgs_chain(p)
                return c.run(60, seed=3, progress_bar=False)
            finally:
                monkeypatch.delenv("MCMC_TPU_SGS_SURGERY")

        o_new = run_with("")  # default: k_nearest_packed
        o_old = run_with("sorttopk")
        # same selected set -> same proposals up to solver reassociation:
        # trajectories match to float tolerance over a short run
        np.testing.assert_allclose(o_new["loss"], o_old["loss"],
                                   rtol=2e-4, atol=2e-2)
