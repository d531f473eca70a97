"""Batched kriging + conditional Gaussian block draws vs the NumPy twin."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mcmc_tpu.ops.covariance import CovarianceSpec, make_rotation_matrix
from mcmc_tpu.ops.kriging import (
    conditional_gaussian_block,
    ok_solve_masked,
    sk_solve_masked,
)
from tests import reference_impl as ref

VARIO = dict(azimuth=20.0, major_range=8000.0, minor_range=5000.0,
             sill=1.4, nugget=0.05, vtype="gaussian")


def random_neighbors(rng, n):
    xy = rng.uniform(0, 10_000, size=(n, 2))
    vals = rng.normal(0, 1, size=n)
    return np.column_stack([xy, vals])


class TestMaskedKriging:
    @pytest.mark.parametrize("n_valid", [4, 9, 16])
    def test_sk_matches_reference(self, rng, n_valid):
        K = 16  # fixed slot count
        nearest = random_neighbors(rng, n_valid)
        est_ref, var_ref = ref.sk_solve((5000.0, 4000.0), nearest, VARIO, 0.3)

        coords = np.zeros((K, 2))
        values = np.zeros(K)
        mask = np.zeros(K)
        coords[:n_valid] = nearest[:, :2]
        values[:n_valid] = nearest[:, 2]
        mask[:n_valid] = 1.0
        # garbage in invalid slots must not affect the result
        coords[n_valid:] = rng.uniform(0, 10_000, size=(K - n_valid, 2))
        values[n_valid:] = 99.0

        rot = make_rotation_matrix(VARIO["azimuth"], VARIO["major_range"],
                                   VARIO["minor_range"])
        est, var = sk_solve_masked(
            CovarianceSpec("gaussian"), jnp.asarray([5000.0, 4000.0]),
            jnp.asarray(coords, jnp.float32), jnp.asarray(values, jnp.float32),
            jnp.asarray(mask, jnp.float32), rot,
            jnp.float32(VARIO["sill"]), jnp.float32(VARIO["nugget"]),
            jnp.float32(0.3))
        assert float(est) == pytest.approx(est_ref, rel=2e-3, abs=2e-3)
        assert float(var) == pytest.approx(var_ref, rel=2e-2, abs=2e-3)

    @pytest.mark.parametrize("n_valid", [4, 12])
    def test_ok_matches_reference(self, rng, n_valid):
        K = 16
        nearest = random_neighbors(rng, n_valid)
        est_ref, var_ref = ref.ok_solve((5000.0, 4000.0), nearest, VARIO)

        coords = np.zeros((K, 2))
        values = np.zeros(K)
        mask = np.zeros(K)
        coords[:n_valid] = nearest[:, :2]
        values[:n_valid] = nearest[:, 2]
        mask[:n_valid] = 1.0
        rot = make_rotation_matrix(VARIO["azimuth"], VARIO["major_range"],
                                   VARIO["minor_range"])
        est, var = ok_solve_masked(
            CovarianceSpec("gaussian"), jnp.asarray([5000.0, 4000.0]),
            jnp.asarray(coords, jnp.float32), jnp.asarray(values, jnp.float32),
            jnp.asarray(mask, jnp.float32), rot,
            jnp.float32(VARIO["sill"]), jnp.float32(VARIO["nugget"]))
        assert float(est) == pytest.approx(est_ref, rel=5e-3, abs=5e-3)
        assert float(var) == pytest.approx(var_ref, rel=3e-2, abs=5e-3)


class TestConditionalGaussian:
    def test_single_cell_equals_simple_kriging(self, rng):
        """A 1-cell block conditional draw has mean == SK estimate and
        variance == SK variance (the screening-exact case)."""
        n = 10
        nearest = random_neighbors(rng, n)
        gm = 0.0
        est_ref, var_ref = ref.sk_solve((5000.0, 4000.0), nearest, VARIO, gm)

        rot = make_rotation_matrix(VARIO["azimuth"], VARIO["major_range"],
                                   VARIO["minor_range"])
        draw, mean, var = conditional_gaussian_block(
            CovarianceSpec("gaussian"),
            jnp.asarray([[5000.0, 4000.0]], jnp.float32),
            jnp.asarray(nearest[:, :2], jnp.float32),
            jnp.asarray(nearest[:, 2], jnp.float32),
            jnp.ones(n, jnp.float32), rot,
            jnp.float32(VARIO["sill"]), jnp.float32(VARIO["nugget"]),
            jnp.float32(gm), jnp.zeros(1, jnp.float32), jitter=1e-6)
        assert float(mean[0]) == pytest.approx(est_ref, rel=5e-3, abs=5e-3)
        assert float(var[0]) == pytest.approx(var_ref, rel=5e-2, abs=5e-3)
        # zero noise -> draw == mean
        assert float(draw[0]) == pytest.approx(float(mean[0]), abs=1e-5)

    def test_block_draw_statistics(self, rng):
        """Empirical mean/cov of repeated draws matches the analytic
        conditional distribution."""
        spec = CovarianceSpec("exponential")
        rot = make_rotation_matrix(0.0, 4000.0, 4000.0)
        block_xy = jnp.asarray(
            [[0.0, 0.0], [500.0, 0.0], [0.0, 500.0], [500.0, 500.0]],
            jnp.float32)
        cond_xy = jnp.asarray([[1500.0, 0.0], [0.0, 1500.0], [-1000.0, -1000.0]],
                              jnp.float32)
        cond_vals = jnp.asarray([1.0, -0.5, 0.2], jnp.float32)
        mask = jnp.ones(3, jnp.float32)

        n_draws = 4000
        noise = jax.random.normal(jax.random.key(0), (n_draws, 4))
        f = jax.vmap(lambda z: conditional_gaussian_block(
            spec, block_xy, cond_xy, cond_vals, mask, rot,
            jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0), z,
            jitter=1e-6)[0])
        draws = np.asarray(f(noise))

        _, mean, var = conditional_gaussian_block(
            spec, block_xy, cond_xy, cond_vals, mask, rot,
            jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0),
            jnp.zeros(4), jitter=1e-6)
        np.testing.assert_allclose(draws.mean(0), np.asarray(mean),
                                   atol=4 * np.sqrt(np.asarray(var) / n_draws).max())
        np.testing.assert_allclose(draws.var(0), np.asarray(var),
                                   rtol=0.15, atol=0.02)

    def test_invalid_cond_slots_ignored(self, rng):
        spec = CovarianceSpec("gaussian")
        rot = make_rotation_matrix(0.0, 4000.0, 4000.0)
        block_xy = jnp.asarray([[0.0, 0.0]], jnp.float32)
        cond_xy = jnp.asarray([[1000.0, 0.0], [50.0, 50.0]], jnp.float32)
        vals = jnp.asarray([1.0, 77.0], jnp.float32)
        # second (nearby, crazy value) point masked out
        _, m1, _ = conditional_gaussian_block(
            spec, block_xy, cond_xy, vals, jnp.asarray([1.0, 0.0]), rot,
            jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0),
            jnp.zeros(1))
        _, m2, _ = conditional_gaussian_block(
            spec, block_xy, cond_xy[:1], vals[:1], jnp.asarray([1.0]), rot,
            jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0),
            jnp.zeros(1))
        assert float(m1[0]) == pytest.approx(float(m2[0]), abs=1e-4)


class TestMaskedSolvers:
    """masked_spd_solve (direct Cholesky) == masked_cg_solve == NumPy
    subsystem solve on the same masked SPD system."""

    @pytest.mark.parametrize("n_valid", [1, 20, 48])
    def test_spd_solve_matches_cg_and_numpy(self, rng, n_valid):
        from mcmc_tpu.ops.kriging import masked_cg_solve, masked_spd_solve

        K, eps = 48, 1e-3
        A = rng.normal(size=(K, K))
        Sigma = (A @ A.T / K + np.eye(K)).astype(np.float32)  # SPD
        mask = np.zeros(K, np.float32)
        mask[rng.permutation(K)[:n_valid]] = 1.0
        rhs = rng.normal(size=K).astype(np.float32)

        w_direct = np.asarray(masked_spd_solve(
            jnp.asarray(Sigma), jnp.asarray(mask), jnp.asarray(rhs),
            jnp.float32(eps)))
        w_cg = np.asarray(masked_cg_solve(
            jnp.asarray(Sigma), jnp.asarray(mask), jnp.asarray(rhs),
            jnp.float32(eps), 96))
        idx = np.where(mask > 0)[0]
        sub = Sigma[np.ix_(idx, idx)] + eps * np.eye(n_valid)
        w_np = np.zeros(K, np.float32)
        w_np[idx] = np.linalg.solve(sub, rhs[idx])

        np.testing.assert_allclose(w_direct, w_np, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(w_cg, w_np, rtol=1e-3, atol=1e-3)
        assert np.all(w_direct[mask == 0] == 0.0)

    def test_lanes_cg_matches_numpy_and_xla(self, rng):
        """ops/cg_kernel.lanes_masked_cg (whole-batch CG, batch-in-lanes 2D
        layout, interpret mode here) == NumPy subsystem solve, and ==
        vmapped masked_cg_solve to f32-reassociation tolerance (identical
        iteration arithmetic, different reduction order).  C=5 also
        exercises the zero-system lane padding (5 -> 128)."""
        from mcmc_tpu.ops.cg_kernel import lanes_masked_cg
        from mcmc_tpu.ops.kriging import masked_cg_solve

        C, K, eps = 5, 48, 1e-3
        A = rng.normal(size=(C, K, K))
        Sigma = (A @ np.swapaxes(A, -1, -2) / K
                 + np.eye(K)).astype(np.float32)
        mask = (rng.random((C, K)) < 0.8).astype(np.float32)
        mask[:, 0] = 1.0
        rhs = rng.normal(size=(C, K)).astype(np.float32)
        w = np.asarray(lanes_masked_cg(
            jnp.asarray(Sigma), jnp.asarray(mask), jnp.asarray(rhs),
            jnp.float32(eps), 64, interpret=True))
        for c in range(C):
            idx = np.where(mask[c] > 0)[0]
            sub = Sigma[c][np.ix_(idx, idx)] + eps * np.eye(len(idx))
            np.testing.assert_allclose(
                w[c, idx], np.linalg.solve(sub, rhs[c, idx]),
                rtol=1e-3, atol=1e-3)
        assert np.all(w[mask == 0] == 0.0)
        w_xla = np.asarray(jax.vmap(
            lambda S, m, b: masked_cg_solve(S, m, b, jnp.float32(eps), 64))(
            jnp.asarray(Sigma), jnp.asarray(mask), jnp.asarray(rhs)))
        np.testing.assert_allclose(w, w_xla, rtol=2e-4, atol=2e-4)

    def test_lanes_mix_cg_matches_xla_system(self, rng):
        """ops/cg_kernel.lanes_mix_masked_cg (masked mixture system built
        IN-KERNEL from packed coordinates) == lanes_masked_cg fed the
        XLA-evaluated S_cc (identical CG iterations, f32-roundoff S_cc
        evaluation differences) == NumPy subsystem solve on distinct
        coordinates (PD system).  Per-chain eps vector exercises the
        (1, B) eps row; C=5 exercises zero-system lane padding."""
        from mcmc_tpu.ops.cg_kernel import (lanes_masked_cg,
                                            lanes_mix_masked_cg)

        C, K, SB = 5, 48, 40
        mix = ((0.5, 0.3), (0.01, 0.002), (0.4,), (0.05,),
               (1.0, 0.1, 1.2))
        idx = np.stack([rng.permutation(SB * SB)[:K] for _ in range(C)])
        ia = (idx // SB).astype(np.float32)
        ja = (idx % SB).astype(np.float32)

        def s_cc(iaf, jaf):
            dif = iaf[:, None] - iaf[None, :]
            djf = jaf[:, None] - jaf[None, :]
            h2 = (mix[4][0] * djf * djf + mix[4][1] * djf * dif
                  + mix[4][2] * dif * dif)
            S = sum(a * np.exp(-b * h2) for a, b in zip(mix[0], mix[1]))
            S = S + sum(a * np.exp(-b * np.sqrt(h2))
                        for a, b in zip(mix[2], mix[3]))
            return np.asarray(S, np.float32)

        Sigma = np.stack([s_cc(ia[c], ja[c]) for c in range(C)])
        mask = (rng.random((C, K)) < 0.8).astype(np.float32)
        mask[:, 0] = 1.0
        rhs = rng.normal(size=(C, K)).astype(np.float32)
        epsv = np.linspace(1e-3, 3e-3, C).astype(np.float32)
        w_mix = np.asarray(lanes_mix_masked_cg(
            jnp.asarray(ia), jnp.asarray(ja), jnp.asarray(mask),
            jnp.asarray(rhs), jnp.asarray(epsv), mix, 96, interpret=True))
        w_ref = np.asarray(lanes_masked_cg(
            jnp.asarray(Sigma), jnp.asarray(mask), jnp.asarray(rhs),
            jnp.asarray(epsv), 96, interpret=True))
        np.testing.assert_allclose(w_mix, w_ref, rtol=2e-4, atol=2e-4)
        assert np.all(w_mix[mask == 0] == 0.0)
        for c in range(C):
            sel = np.where(mask[c] > 0)[0]
            sub = Sigma[c][np.ix_(sel, sel)] + epsv[c] * np.eye(len(sel))
            np.testing.assert_allclose(
                w_mix[c, sel], np.linalg.solve(sub, rhs[c, sel]),
                rtol=2e-3, atol=2e-3)

    def test_lane_block_respects_scoped_vmem(self):
        """Regression (2026-08-21): a 2048-lane block at K=48 needs
        19.4 MB of scoped VMEM and the TPU compiler rejects it against
        its 16 MB stack limit — the block chooser must grid into 1024s,
        and must still hand small batches a single whole-batch block."""
        from mcmc_tpu.ops.cg_kernel import _lane_block

        assert _lane_block(512, 48) == 512
        assert _lane_block(1024, 48) == 1024
        assert _lane_block(2048, 48) == 1024
        assert _lane_block(4096, 48) == 1024
        # non-power-of-two padded batches still get a dividing block
        assert 2176 % _lane_block(2176, 48) == 0

    def test_lanes_cg_per_chain_eps_vector(self, rng):
        """The batched step passes eps as a per-chain (C,) vector."""
        from mcmc_tpu.ops.cg_kernel import lanes_masked_cg

        C, K = 3, 16
        A = rng.normal(size=(C, K, K))
        Sigma = (A @ np.swapaxes(A, -1, -2) / K
                 + np.eye(K)).astype(np.float32)
        mask = np.ones((C, K), np.float32)
        rhs = rng.normal(size=(C, K)).astype(np.float32)
        epsv = np.asarray([1e-3, 2e-3, 5e-3], np.float32)
        w = np.asarray(lanes_masked_cg(
            jnp.asarray(Sigma), jnp.asarray(mask), jnp.asarray(rhs),
            jnp.asarray(epsv), 96, interpret=True))
        for c in range(C):
            sub = Sigma[c] + epsv[c] * np.eye(K)
            np.testing.assert_allclose(w[c], np.linalg.solve(sub, rhs[c]),
                                       rtol=1e-3, atol=1e-3)

    def test_spd_solve_batched(self, rng):
        from mcmc_tpu.ops.kriging import masked_spd_solve

        K, B = 16, 5
        A = rng.normal(size=(B, K, K))
        Sigma = (A @ np.swapaxes(A, -1, -2) / K
                 + np.eye(K)).astype(np.float32)
        mask = (rng.random((B, K)) < 0.7).astype(np.float32)
        mask[:, 0] = 1.0
        rhs = rng.normal(size=(B, K)).astype(np.float32)
        w = np.asarray(masked_spd_solve(
            jnp.asarray(Sigma), jnp.asarray(mask), jnp.asarray(rhs),
            jnp.float32(1e-3)))
        for b in range(B):
            idx = np.where(mask[b] > 0)[0]
            sub = Sigma[b][np.ix_(idx, idx)] + 1e-3 * np.eye(len(idx))
            np.testing.assert_allclose(w[b, idx],
                                       np.linalg.solve(sub, rhs[b, idx]),
                                       rtol=2e-4, atol=2e-4)


class TestWeightPrecompute:
    """ok/sk_weights_masked (the reference's ``precompute=True`` mode,
    _krige.py:40-41,77-78): the returned weights, applied to any value
    vector, reproduce the corresponding full solve — values enter only at
    apply time, which is the point of precomputing them."""

    def _slots(self, rng, n_valid, K=16):
        nearest = random_neighbors(rng, n_valid)
        coords = np.zeros((K, 2), np.float32)
        values = np.zeros(K, np.float32)
        mask = np.zeros(K, np.float32)
        coords[:n_valid] = nearest[:, :2]
        values[:n_valid] = nearest[:, 2]
        mask[:n_valid] = 1.0
        coords[n_valid:] = rng.uniform(0, 10_000, size=(K - n_valid, 2))
        values[n_valid:] = 99.0  # garbage in invalid slots
        return nearest, coords, values, mask

    @pytest.mark.parametrize("n_valid", [4, 12])
    def test_sk_weights_reproduce_solve(self, rng, n_valid):
        from mcmc_tpu.ops.kriging import sk_weights_masked

        nearest, coords, values, mask = self._slots(rng, n_valid)
        rot = make_rotation_matrix(VARIO["azimuth"], VARIO["major_range"],
                                   VARIO["minor_range"])
        args = (CovarianceSpec("gaussian"),
                jnp.asarray([5000.0, 4000.0]), jnp.asarray(coords),
                jnp.asarray(mask), rot, jnp.float32(VARIO["sill"]),
                jnp.float32(VARIO["nugget"]))
        w, var_w = sk_weights_masked(args[0], args[1], args[2], args[3],
                                     args[4], args[5], args[6])
        # invalid slots carry zero weight
        assert np.all(np.asarray(w)[mask == 0] == 0.0)
        gm = 0.3

        def apply(vals):
            return gm + float(jnp.sum(w * jnp.asarray(mask)
                                      * (jnp.asarray(vals) - gm)))

        for vals in (values, values + rng.normal(0, 2, values.shape)
                     .astype(np.float32)):
            est, var = sk_solve_masked(
                args[0], args[1], args[2], jnp.asarray(vals), args[3],
                args[4], args[5], args[6], jnp.float32(gm))
            assert apply(vals) == pytest.approx(float(est), rel=1e-5,
                                                abs=1e-5)
            assert float(var_w) == pytest.approx(float(var), rel=1e-5,
                                                 abs=1e-5)
        # and the twin agrees end-to-end (on the original values)
        est_ref, var_ref = ref.sk_solve((5000.0, 4000.0), nearest, VARIO, gm)
        assert apply(values) == pytest.approx(est_ref, rel=5e-3, abs=5e-3)
        assert float(var_w) == pytest.approx(var_ref, rel=3e-2, abs=5e-3)

    @pytest.mark.parametrize("n_valid", [4, 12])
    def test_ok_weights_reproduce_solve(self, rng, n_valid):
        from mcmc_tpu.ops.kriging import ok_weights_masked

        nearest, coords, values, mask = self._slots(rng, n_valid)
        rot = make_rotation_matrix(VARIO["azimuth"], VARIO["major_range"],
                                   VARIO["minor_range"])
        spec = CovarianceSpec("gaussian")
        target = jnp.asarray([5000.0, 4000.0])
        w, var_w = ok_weights_masked(spec, target, jnp.asarray(coords),
                                     jnp.asarray(mask), rot,
                                     jnp.float32(VARIO["sill"]),
                                     jnp.float32(VARIO["nugget"]))
        assert np.all(np.asarray(w)[mask == 0] == 0.0)
        m = jnp.asarray(mask)
        local_mean = float(jnp.sum(jnp.asarray(values) * m) / jnp.sum(m))
        est_w = local_mean + float(jnp.sum(
            w * m * (jnp.asarray(values) - local_mean)))
        est, var = ok_solve_masked(spec, target, jnp.asarray(coords),
                                   jnp.asarray(values), m, rot,
                                   jnp.float32(VARIO["sill"]),
                                   jnp.float32(VARIO["nugget"]))
        assert est_w == pytest.approx(float(est), rel=1e-5, abs=1e-5)
        assert float(var_w) == pytest.approx(float(var), rel=1e-5, abs=1e-5)
        est_ref, var_ref = ref.ok_solve((5000.0, 4000.0), nearest, VARIO)
        assert est_w == pytest.approx(est_ref, rel=5e-3, abs=5e-3)
        assert float(var_w) == pytest.approx(var_ref, rel=3e-2, abs=5e-3)
