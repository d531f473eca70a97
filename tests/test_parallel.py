"""Multi-chain sampler, sharding, and diagnostics tests (8 virtual CPU devices)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from mcmc_tpu.parallel import (
    MultiChainSampler,
    chains_mesh,
    ess,
    make_sharded_loss,
    make_sharded_residual,
    shard_grid_arrays,
    split_rhat,
)
from tests import reference_impl as ref
from tests.conftest import make_synthetic_problem
from tests.test_chain_crf import build_small_chain


class TestMultiChain:
    def test_vmapped_chains_match_single(self):
        """Chain 0 of a batched run equals a single-chain run with same key."""
        p = make_synthetic_problem(H=64, W=64)
        chain = build_small_chain(p)
        sampler = MultiChainSampler(chain, n_chains=4, use_mesh=False)
        states = sampler.init(seeds=[11, 22, 33, 44])
        states2, traces = sampler.run(states, n_iter=60, segment_size=30,
                                      progress=False)
        assert traces["loss"].shape == (4, 60)
        # single-chain with the same seed
        out = chain.run(n_iter=60, seed=11)
        np.testing.assert_allclose(traces["loss"][0], out["loss"], rtol=1e-6)
        # chains with different seeds explore differently
        assert not np.allclose(traces["loss"][0], traces["loss"][1])

    def test_sharded_over_devices(self):
        assert len(jax.devices()) == 8
        p = make_synthetic_problem(H=64, W=64)
        chain = build_small_chain(p)
        sampler = MultiChainSampler(chain, n_chains=8)
        assert sampler.mesh is not None
        states = sampler.init(seeds=7)
        # chain states actually live sharded over devices
        assert len(states.bed.sharding.device_set) == 8
        states, traces = sampler.run(states, n_iter=40, segment_size=40,
                                     progress=False)
        assert traces["loss"].shape == (8, 40)
        assert np.isfinite(traces["loss"]).all()
        accs = traces["step"].mean(axis=1)
        assert (accs > 0.01).all()

    def test_sgs_sharded_over_devices(self):
        """SGS chains on a ``chains`` mesh axis: the whole-batch CG under a
        sharded batch must place correctly AND match the unsharded batch
        numerically (reference analog: the SSC production farm,
        smallScaleChain_multiprocessing.py:403-585)."""
        from tests.test_chain_sgs import build_sgs_chain

        assert len(jax.devices()) == 8
        p = make_synthetic_problem(H=64, W=64)
        chain = build_sgs_chain(p)
        sampler = MultiChainSampler(chain, n_chains=8)
        assert sampler.mesh is not None
        states = sampler.init(seeds=7)
        assert len(states.fields.sharding.device_set) == 8
        states, traces = sampler.run(states, n_iter=20, segment_size=20,
                                     progress=False)
        assert traces["loss"].shape == (8, 20)
        assert np.isfinite(traces["loss"]).all()
        accs = traces["step"].mean(axis=1)
        assert (accs > 0.01).all()
        # sharded == unsharded numerics (same seeds, no mesh)
        s2 = MultiChainSampler(chain, n_chains=8, use_mesh=False)
        st2 = s2.init(seeds=7)
        _, tr2 = s2.run(st2, n_iter=20, segment_size=20, progress=False)
        np.testing.assert_allclose(traces["loss"], tr2["loss"],
                                   rtol=1e-6, atol=1e-4)

    def test_segmentation_invariant(self):
        """Same results regardless of segment partitioning."""
        p = make_synthetic_problem(H=64, W=64)
        chain = build_small_chain(p)
        s = MultiChainSampler(chain, n_chains=2, use_mesh=False)
        st1 = s.init(seeds=5)
        _, tr1 = s.run(st1, n_iter=50, segment_size=49, progress=False)
        st2 = s.init(seeds=5)
        _, tr2 = s.run(st2, n_iter=50, segment_size=10, progress=False)
        np.testing.assert_array_equal(tr1["loss"], tr2["loss"])


class TestDiagnostics:
    def test_rhat_converged_vs_not(self, rng):
        # identical-distribution chains -> rhat ~ 1
        good = rng.normal(size=(8, 500))
        r = float(np.asarray(split_rhat(jnp.asarray(good))))
        assert r == pytest.approx(1.0, abs=0.05)
        # offset chains -> rhat >> 1
        bad = good + np.arange(8)[:, None] * 5.0
        r2 = float(np.asarray(split_rhat(jnp.asarray(bad))))
        assert r2 > 1.5

    def test_ess_iid_vs_correlated(self, rng):
        iid = rng.normal(size=(4, 1000))
        e_iid = float(np.asarray(ess(jnp.asarray(iid))))
        assert e_iid > 2000  # ~ m*n for iid
        # AR(1) with strong correlation -> much smaller ESS
        x = np.zeros((4, 1000))
        eps = rng.normal(size=(4, 1000))
        for t in range(1, 1000):
            x[:, t] = 0.95 * x[:, t - 1] + eps[:, t]
        e_ar = float(np.asarray(ess(jnp.asarray(x))))
        assert e_ar < 0.25 * e_iid


class TestRankNormalizedDiagnostics:
    """Vehtari et al. 2021 variants (rank_normalized_rhat, ess_bulk,
    ess_tail)."""

    def test_rank_normalize_matches_scipy_with_ties(self, rng):
        from scipy.special import ndtri as ndtri_np
        from scipy.stats import rankdata

        from mcmc_tpu.parallel.diagnostics import _rank_normalize

        # quantized values -> heavy ties, like an MH trace with rejections
        x = np.round(rng.normal(size=(4, 100)) * 2) / 2
        z = np.asarray(_rank_normalize(jnp.asarray(x, jnp.float32)))
        S = x.size
        want = ndtri_np((rankdata(x.ravel(), method="average") - 0.375)
                        / (S + 0.25)).reshape(x.shape)
        np.testing.assert_allclose(z, want, atol=1e-5)

    def test_iid_calibration(self, rng):
        from mcmc_tpu.parallel import ess_bulk, ess_tail, rank_normalized_rhat

        x = jnp.asarray(rng.normal(size=(8, 1000)))
        assert float(rank_normalized_rhat(x)) == pytest.approx(1.0, abs=0.02)
        eb = float(ess_bulk(x))
        assert 0.5 * 8000 < eb < 1.6 * 8000
        assert float(ess_tail(x)) > 0.25 * 8000

    def test_mean_shift_detected(self, rng):
        from mcmc_tpu.parallel import rank_normalized_rhat

        x = rng.normal(size=(8, 500))
        bad = x + np.arange(8)[:, None] * 3.0
        assert float(rank_normalized_rhat(jnp.asarray(bad))) > 1.3

    def test_variance_mismatch_caught_by_folding_missed_by_classic(self, rng):
        """The canonical failure of mean-based R-hat: one chain with the
        right mean but 5x the spread INFLATES W, dragging classic split
        R-hat BELOW 1 — the folded rank-normalized statistic flags it."""
        from mcmc_tpu.parallel import rank_normalized_rhat

        x = rng.normal(size=(8, 500))
        x[0] *= 5.0
        classic = float(np.asarray(split_rhat(jnp.asarray(x))))
        ranked = float(rank_normalized_rhat(jnp.asarray(x)))
        assert classic < 1.01  # silently "converged"
        assert ranked > 1.05

    def test_multiparam_shapes(self, rng):
        from mcmc_tpu.parallel import ess_bulk, ess_tail, rank_normalized_rhat

        x = jnp.asarray(rng.normal(size=(4, 300, 3)))
        assert rank_normalized_rhat(x).shape == (3,)
        assert ess_bulk(x).shape == (3,)
        assert ess_tail(x).shape == (3,)

    def test_large_pooled_sample_stays_finite(self, rng):
        """Regression (2026-08-21): with >~1e7 pooled samples the top
        rank's Blom fraction rounds to 1.0 in f32, ndtri(1.0) = +inf and
        R-hat came back NaN (observed live at 1536 chains x 8000
        samples).  The clamp keeps the statistic finite and accurate."""
        from mcmc_tpu.parallel import rank_normalized_rhat

        x = jnp.asarray(rng.normal(size=(2000, 6000)).astype(np.float32))
        r = float(rank_normalized_rhat(x))
        assert np.isfinite(r)
        assert r == pytest.approx(1.0, abs=0.02)

    def test_real_chain_traces_finite(self):
        """Smoke on a genuine MH loss trace (constant runs from rejections
        = the tie-heavy case the average-rank transform must handle)."""
        from mcmc_tpu.parallel import ess_bulk, ess_tail, rank_normalized_rhat

        p = make_synthetic_problem(H=64, W=64)
        s = MultiChainSampler(build_small_chain(p), n_chains=4,
                              use_mesh=False)
        _, tr = s.run(s.init(seeds=3), n_iter=200, segment_size=200,
                      progress=False)
        loss = jnp.asarray(np.asarray(tr["loss"]))  # run() is chain-major
        assert np.isfinite(float(rank_normalized_rhat(loss)))
        assert float(ess_bulk(loss)) > 1.0
        assert float(ess_tail(loss)) > 1.0
        # the sampler's summary carries the rank-normalized fields too
        d = s.diagnostics(tr, elapsed_seconds=1.0)
        assert np.isfinite(d["rhat_rank_loss"])
        assert d["rhat_rank_loss"] >= 1.0 - 1e-3


class TestGridSharding:
    def test_sharded_residual_matches_dense(self, rng):
        from mcmc_tpu.parallel.mesh import chains_grid_mesh
        mesh = chains_grid_mesh(1, 8)
        H, W, res = 64, 32, 500.0
        a = {k: rng.normal(size=(H, W)).astype(np.float32)
             for k in "bed surf velx vely dhdt smb".split()}
        sharded = shard_grid_arrays(mesh, a)
        f = make_sharded_residual(mesh)
        got = np.asarray(f(sharded["bed"], sharded["surf"], sharded["velx"],
                           sharded["vely"], sharded["dhdt"], sharded["smb"],
                           jnp.float32(res)))
        want = ref.mass_conservation_residual(
            a["bed"].astype(np.float64), a["surf"].astype(np.float64),
            a["velx"].astype(np.float64), a["vely"].astype(np.float64),
            a["dhdt"].astype(np.float64), a["smb"].astype(np.float64), res)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_sharded_loss_matches_dense(self, rng):
        from mcmc_tpu.parallel.mesh import chains_grid_mesh
        mesh = chains_grid_mesh(1, 8)
        H, W = 64, 16
        res = rng.normal(size=(H, W)).astype(np.float32)
        mask = (rng.random((H, W)) < 0.5)
        sharded = shard_grid_arrays(mesh, {"res": res, "mask": mask})
        f = make_sharded_loss(mesh)
        got = float(f(sharded["res"], sharded["mask"], jnp.float32(5.0)))
        want = ref.masked_gaussian_loss(res.astype(np.float64), mask, 5.0)
        assert got == pytest.approx(want, rel=1e-4)


class TestGridShardedChain:
    def test_sharded_chain_matches_single_shard(self):
        """4-way row-sharded single-chain CRF == 1-shard run (same keys):
        validates halo exchange, psum loss, and replicated proposals."""
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        from mcmc_tpu.parallel.grid_sharded import (make_sharded_crf_chain,
                                                    shard_grid_arrays)
        from tests.test_chain_crf import build_small_chain

        p = make_synthetic_problem(H=64, W=64)
        chain = build_small_chain(p)
        static, consts = chain.build()

        def run_with(n_shards):
            import numpy as _np

            mesh = Mesh(_np.asarray(jax.devices()[:n_shards]), ("grid",))
            planes = dict(
                surf=np.asarray(consts.surf), velx=np.asarray(consts.velx),
                vely=np.asarray(consts.vely),
                dhdt=np.asarray(consts.forcing),  # forcing = dhdt - smb
                smb=np.zeros_like(np.asarray(consts.forcing)),
                update_mask=np.asarray(consts.update_mask),
                mc_mask=np.asarray(consts.mc_mask, np.float32),
                crf_weight=np.asarray(consts.crf_weight))
            sharded = shard_grid_arrays(mesh, planes)
            sharded["rf"] = consts.rf
            sharded["region_cells"] = consts.region_cells
            sharded["sigma_mc"] = consts.sigma_mc
            sharded["resolution"] = consts.resolution
            bed = jax.device_put(
                jnp.asarray(p["initial_bed"], jnp.float32),
                NamedSharding(mesh, P("grid", None)))
            run = make_sharded_crf_chain(mesh, static)
            bed_f, losses, steps = run(bed, sharded, jax.random.key(7), 40)
            return (np.asarray(bed_f), np.asarray(losses), np.asarray(steps))

        bed4, loss4, steps4 = run_with(4)
        bed1, loss1, steps1 = run_with(1)
        np.testing.assert_array_equal(steps4, steps1)
        np.testing.assert_allclose(loss4, loss1, rtol=1e-5)
        np.testing.assert_allclose(bed4, bed1, rtol=1e-5, atol=1e-3)
        # the chain actually moved
        assert steps4.sum() > 0
        assert not np.array_equal(bed4, p["initial_bed"].astype(np.float32))


class TestSamplerExtras:
    def test_collect_beds_thinning(self):
        p = make_synthetic_problem(H=64, W=64)
        chain = build_small_chain(p)
        s = MultiChainSampler(chain, n_chains=2, use_mesh=False)
        st = s.init(seeds=1)
        _, tr = s.run(st, n_iter=41, segment_size=10, progress=False,
                      collect_beds=True)
        # 4 full segments + remainder -> one snapshot per segment
        assert tr["bed_thin"].shape[0] == 2
        assert tr["bed_thin"].shape[2:] == (64, 64)
        assert tr["bed_thin"].shape[1] >= 4
        assert np.isfinite(tr["bed_thin"]).all()

    def test_profile_dir_captures_trace(self, tmp_path):
        """sampler.run(profile_dir=...) writes a jax.profiler trace of the
        second segment (SURVEY §5.1 tracing evidence)."""
        import os

        p = make_synthetic_problem(H=64, W=64)
        chain = build_small_chain(p)
        s = MultiChainSampler(chain, n_chains=2, use_mesh=False)
        st = s.init(seeds=1)
        s.run(st, n_iter=30, segment_size=10, progress=False,
              profile_dir=str(tmp_path))
        files = [f for _, _, fs in os.walk(tmp_path) for f in fs]
        assert any(f.endswith(".xplane.pb") for f in files), files

    def test_fancy_progress_renders(self, capsys):
        p = make_synthetic_problem(H=64, W=64)
        chain = build_small_chain(p)
        s = MultiChainSampler(chain, n_chains=2, use_mesh=False)
        st = s.init(seeds=1)
        s.run(st, n_iter=21, segment_size=10, progress=True,
              fancy_progress=True)
        outp = capsys.readouterr().out
        assert "Chain 0" in outp and "acc:" in outp


class TestCombinedChainsGrid:
    """One program using BOTH mesh axes (VERDICT round-1 item 6): batched
    chains, each chain's grid row-sharded, incremental windowed patch."""

    def _run(self, p, chain_ax, grid_ax, n_chains=2, n_iter=60,
             region=None):
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        from mcmc_tpu.parallel.grid_sharded import (make_sharded_crf_chains,
                                                    shard_grid_arrays)
        from tests.test_chain_crf import build_small_chain

        chain = build_small_chain(p)
        if region is not None:
            chain.set_update_region(True, region)
        static, consts = chain.build()
        devs = np.asarray(jax.devices()[: chain_ax * grid_ax]).reshape(
            chain_ax, grid_ax)
        mesh = Mesh(devs, ("chains", "grid"))
        planes = dict(
            surf=np.asarray(consts.surf), velx=np.asarray(consts.velx),
            vely=np.asarray(consts.vely),
            dhdt=np.asarray(consts.forcing),  # forcing = dhdt - smb
            smb=np.zeros_like(np.asarray(consts.forcing)),
            update_mask=np.asarray(consts.update_mask),
            mc_mask=np.asarray(consts.mc_mask, np.float32),
            crf_weight=np.asarray(consts.crf_weight))
        sharded = shard_grid_arrays(mesh, planes)
        sharded["rf"] = consts.rf
        sharded["region_cells"] = consts.region_cells
        sharded["sigma_mc"] = consts.sigma_mc
        sharded["resolution"] = consts.resolution
        beds = jnp.broadcast_to(jnp.asarray(p["initial_bed"], jnp.float32),
                                (n_chains, *p["initial_bed"].shape))
        beds = jax.device_put(beds, NamedSharding(
            mesh, P("chains", "grid", None)))
        keys = jax.device_put(
            jax.random.split(jax.random.key(3), n_chains),
            NamedSharding(mesh, P("chains")))
        run = make_sharded_crf_chains(mesh, static)
        beds_f, losses, steps = run(beds, sharded, keys, n_iter)
        return (np.asarray(beds_f), np.asarray(losses), np.asarray(steps))

    def test_2x4_matches_2x1(self):
        p = make_synthetic_problem(H=64, W=64)
        beds4, loss4, steps4 = self._run(p, 2, 4)
        beds1, loss1, steps1 = self._run(p, 2, 1)
        np.testing.assert_array_equal(steps4, steps1)
        np.testing.assert_allclose(loss4, loss1, rtol=1e-5)
        np.testing.assert_allclose(beds4, beds1, rtol=1e-5, atol=1e-3)
        assert steps4.sum() > 0
        # chains are independent: different keys -> different trajectories
        assert not np.allclose(loss4[0], loss4[1])

    def test_blocks_crossing_shard_boundaries(self):
        """Region confined to rows around the 4-shard boundaries so most
        blocks straddle two shards — exercises the halo flux exchange."""
        p = make_synthetic_problem(H=64, W=64)
        region = np.zeros((64, 64), np.float32)
        for b in (16, 32, 48):           # shard boundaries at 4 shards
            region[b - 2: b + 2, 8:-8] = 1
        beds4, loss4, steps4 = self._run(p, 1, 4, n_chains=1, n_iter=80,
                                         region=region)
        beds1, loss1, steps1 = self._run(p, 1, 1, n_chains=1, n_iter=80,
                                         region=region)
        np.testing.assert_array_equal(steps4, steps1)
        np.testing.assert_allclose(loss4, loss1, rtol=1e-5)
        np.testing.assert_allclose(beds4, beds1, rtol=1e-5, atol=1e-3)
        assert steps4.sum() > 0

    def test_blocks_spanning_three_shards(self):
        """8 shards of 8 rows with 10-12-row blocks: a block can cover an
        ENTIRE middle shard (rows_local < B+4), so both of that shard's
        halo rows carry updated flux."""
        p = make_synthetic_problem(H=64, W=64)
        beds8, loss8, steps8 = self._run(p, 1, 8, n_chains=1, n_iter=80)
        beds1, loss1, steps1 = self._run(p, 1, 1, n_chains=1, n_iter=80)
        np.testing.assert_array_equal(steps8, steps1)
        np.testing.assert_allclose(loss8, loss1, rtol=1e-5)
        np.testing.assert_allclose(beds8, beds1, rtol=1e-5, atol=1e-3)
        assert steps8.sum() > 0


def test_sampler_rejects_bad_impl_and_zero_iters():
    from tests.conftest import make_synthetic_problem
    from tests.test_chain_crf import build_small_chain

    p = make_synthetic_problem(H=32, W=32)
    with pytest.raises(ValueError, match="impl"):
        MultiChainSampler(build_small_chain(p), n_chains=2, use_mesh=False,
                          impl="Fused")
    s = MultiChainSampler(build_small_chain(p), n_chains=2, use_mesh=False)
    st = s.init(seeds=1)
    with pytest.raises(ValueError, match="n_iter"):
        s.run(st, 0, progress=False)


class TestProgressRendering:
    """utils/progress — the reference's fixed-line ANSI renderer
    (MCMC.py:31-39, 1379-1408), driven per segment by the sampler."""

    def test_format_chain_line_fields(self):
        from mcmc_tpu.utils.progress import format_chain_line

        line = format_chain_line(3, 123456789, 0.5, 250.0, 1000,
                                 1.234e4, 0.3456)
        assert "Chain 3 (123456)" in line       # 6-digit seed like the ref
        assert " 50%|" in line and "acc: 0.3456" in line
        assert "ETA: 00:00:02" in line           # (1-0.5)*1000/250 = 2 s
        # zero-rate guard
        assert "--:--:--" in format_chain_line(0, 1, 0.0, 0.0, 10, 1.0, 0.0)

    def test_multichain_progress_renders_in_place(self):
        import io

        from mcmc_tpu.utils.progress import MultiChainProgress

        buf = io.StringIO()
        r = MultiChainProgress(20, 100, seeds=list(range(20)), max_lines=4,
                               stream=buf)
        r.update(10, np.full(20, 5.0), np.full(20, 0.25))
        r.update(20, np.full(20, 4.0), np.full(20, 0.30))
        out = buf.getvalue()
        assert "Running 20 chains" in out
        assert "... and 16 more chains" in out   # max_lines cap
        assert "\033[6F" in out                  # in-place redraw (4+2 lines)
        assert out.count("iter 10/100") == 1 and out.count("iter 20/100") == 1

    def test_acceptance_rate(self):
        from mcmc_tpu.parallel.diagnostics import acceptance_rate

        steps = np.array([[1, 0, 1, 1], [0, 0, 0, 1]], np.int32)
        np.testing.assert_allclose(np.asarray(acceptance_rate(steps)),
                                   [0.75, 0.25])


class TestPodLayoutGuards:
    """The multi-process layout guards added after the pod review: the
    auto-mesh heuristic and _host_np must never build (or silently
    service) a mesh that excludes whole processes — on a real pod that is
    a cross-process deadlock, not an error message.  Simulated here by
    monkeypatching the process topology (a real N-host cluster cannot be
    spun per-test; the REAL 2-process paths are in test_distributed.py)."""

    def test_auto_mesh_rejects_indivisible_chains_on_pods(self, monkeypatch):
        p = make_synthetic_problem(H=32, W=32)
        chain = build_small_chain(p)
        from mcmc_tpu.parallel import sampler as sampler_mod

        monkeypatch.setattr(sampler_mod.jax, "process_count", lambda: 2)
        # 3 chains over 8 global devices: the max-divisor heuristic would
        # pick a 1- or 3-device mesh that can exclude a whole process
        with pytest.raises(ValueError, match="not divisible"):
            MultiChainSampler(chain, n_chains=3)
        # divisible counts are still refused when the device list itself
        # does not span every claimed process (all virtual devices here
        # report process_index 0)
        with pytest.raises(ValueError, match="spanning every process"):
            MultiChainSampler(chain, n_chains=8)

    def test_host_np_refuses_other_process_confined_array(self, monkeypatch):
        from mcmc_tpu.parallel.sampler import _host_np

        x = jnp.arange(4.0)  # committed to local (process-0) devices
        from mcmc_tpu.parallel import sampler as sampler_mod

        monkeypatch.setattr(sampler_mod.jax, "process_count", lambda: 2)
        monkeypatch.setattr(sampler_mod.jax, "process_index", lambda: 1)
        # the owner (process 0) sees a fully-addressable array and takes
        # the plain fetch; a gather here would therefore deadlock — the
        # non-owner must fail loudly instead
        with pytest.raises(RuntimeError, match="confined to process"):
            _host_np(x)
        # the owner itself still takes the plain zero-copy fetch
        monkeypatch.setattr(sampler_mod.jax, "process_index", lambda: 0)
        np.testing.assert_array_equal(_host_np(x), [0.0, 1.0, 2.0, 3.0])
