"""Driver-contract smoke tests: bench.py pieces and __graft_entry__."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


class TestBenchPieces:
    def test_problem_and_chain_build(self):
        import bench

        p = bench.build_problem(H=128, W=128)
        chain = bench.make_chain(p)
        chain.set_crf_data_weight()
        static, consts = chain.build()
        assert static.rf.B == 80
        assert np.asarray(consts.stacked).shape == (8, 128, 128)

    def test_cpu_baseline_twin_runs(self):
        import bench

        p = bench.build_problem(H=128, W=128)
        chain = bench.make_chain(p)
        chain.set_crf_data_weight()
        farm_rate, single = bench.measure_cpu_baseline(p, chain, n_iter=15)
        assert single > 0 and farm_rate >= single


class TestPinnedBaseline:
    """vs_baseline must be computed against the pinned twin rates
    (BASELINE.json), with the fresh twin acting only as a drift check
    (VERDICT r3 next-#2)."""

    def test_pin_loads(self):
        import bench

        crf, sgs = bench._pinned_baseline()
        assert crf == 337.5 and sgs == 0.125

    def test_drift_detector(self):
        import bench

        assert not bench._twin_drift(337.0, 337.5, "CRF")   # in band
        assert not bench._twin_drift(180.0, 337.5, "CRF")   # 0.53x: in band
        assert bench._twin_drift(90.9, 337.5, "CRF")        # the r03 case
        assert bench._twin_drift(800.0, 337.5, "CRF")       # too fast = odd

    def test_main_uses_pin_for_vs_baseline(self):
        """Structural: the headline ratio divides by the pin, not the
        fresh twin."""
        import inspect

        import bench

        src = inspect.getsource(bench.main)
        assert 'crf["rate"] / (pin_crf * cores)' in src
        assert 'sgs["rate"] / (pin_sgs * cores)' in src


class TestLossDiagnostics:
    """bench._loss_diagnostics: regression-grade ESS figures (split-half
    spread + rank-normalized R-hat) on synthetic traces with known
    behavior (VERDICT r4 next-#5/#6)."""

    def test_well_mixed_ar1(self):
        import bench

        rng = np.random.default_rng(0)
        m, n, phi = 16, 4000, 0.5
        eps = rng.normal(size=(m, n)).astype(np.float32)
        x = np.zeros((m, n), np.float32)
        for t in range(1, n):
            x[:, t] = phi * x[:, t - 1] + eps[:, t]
        d = bench._loss_diagnostics(x, dt=2.0)
        assert 0.99 < d["rhat"] < 1.02
        assert d["ess"] > 0
        assert abs(d["ess_rate"] - d["ess"] / 2.0) < 1e-6
        assert d["ess_spread"] < 0.25
        assert d["dispersion"] < 10.0  # zero-mean AR(1): ratio is noisy
        # but finite and well-defined

    def test_unconverged_chains_flagged_by_rhat(self):
        import bench

        rng = np.random.default_rng(1)
        x = rng.normal(size=(8, 2000)).astype(np.float32) + 20.0
        x[:4] += 5.0                      # two chain populations
        d = bench._loss_diagnostics(x, dt=1.0)
        assert d["rhat"] > 1.2
        # between-chain dispersion sees the two populations: std of chain
        # means ~2.5 over mean ~22.5
        assert 0.08 < d["dispersion"] < 0.15

    def test_sweep_constant_contains_headline(self):
        import bench

        assert bench.N_CHAINS_SGS in bench.SGS_SWEEP_CHAINS


class TestFusedParityCheck:
    def test_returns_bool_never_raises(self):
        """On this CPU test platform the fused sampler path is unavailable;
        the check must come back False (logged), not raise — a parity
        problem has to surface in the bench JSON, not kill the run."""
        import bench

        p = bench.build_problem(H=128, W=128)
        chain = bench.make_chain(p)
        chain.set_crf_data_weight()
        ok, flip_rate = bench.check_fused_parity(chain, n_chains=8, n_steps=2)
        assert isinstance(ok, bool)
        assert isinstance(flip_rate, float)


class TestDeviceWatchdog:
    """bench aborts fast (rc 2) when backend init hangs, passes when healthy
    (the tunneled axon backend blocks indefinitely when the tunnel is down —
    the watchdog is what keeps the driver's bench step bounded)."""

    def test_healthy_backend_passes(self):
        import os

        import bench

        env = dict(os.environ, JAX_PLATFORMS="cpu")
        # drop the axon sitecustomize: its register() re-pins the remote
        # backend at interpreter start, ignoring JAX_PLATFORMS
        env["PYTHONPATH"] = os.pathsep.join(
            p for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if "axon" not in p)
        bench._device_watchdog(timeout_s=120, attempts=1, env=env)

    def test_hung_backend_exits_2(self):
        import pytest

        import bench

        # 1 ms: interpreter start alone exceeds it -> TimeoutExpired path
        with pytest.raises(SystemExit) as e:
            bench._device_watchdog(timeout_s=0.001, attempts=2)
        assert e.value.code == 2

    def test_broken_probe_exits_2(self):
        import os

        import bench
        import pytest

        env = dict(os.environ, PYTHONPATH="", PYTHONHOME="/nonexistent")
        with pytest.raises(SystemExit) as e:
            bench._device_watchdog(timeout_s=30, attempts=1, env=env)
        assert e.value.code == 2


class TestGraftEntry:
    def test_entry_compiles(self):
        import jax

        import __graft_entry__ as g

        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        assert np.isfinite(float(np.asarray(out[0])))

    def test_dryrun_multichip(self):
        import __graft_entry__ as g

        g.dryrun_multichip(8)

    def test_sgs_chain_and_cpu_baseline(self):
        import bench

        p = bench.build_problem(H=128, W=128)
        chain = bench.make_sgs_chain(p)
        static, _ = chain.build()
        assert static.K == 48 and static.M == 8
        farm_rate, single = bench.measure_cpu_sgs_baseline(p, chain, n_iter=3)
        assert single > 0 and farm_rate >= single
