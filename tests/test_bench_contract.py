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
