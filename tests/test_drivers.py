"""Driver-layer tests: CRF + SGS chain farms with checkpoint/resume."""

import numpy as np

from mcmc_tpu.drivers import (
    iteration_batches,
    large_scale_chain_farm,
    small_scale_chain_farm,
)
from tests.conftest import make_synthetic_problem
from tests.test_chain_crf import build_small_chain
from tests.test_chain_sgs import build_sgs_chain


class TestFarms:
    def test_large_scale_farm(self, tmp_path):
        p = make_synthetic_problem(H=64, W=64)
        chain = build_small_chain(p)
        results = large_scale_chain_farm(
            chain, n_chains=3, rng_seeds=[1, 2, 3], n_iter=40,
            output_path=tmp_path, segment_size=20, progress=False, quiet=True)
        assert len(results) == 3
        bed, loss_mc, loss_data, loss, steps, resampled, blocks = results[0]
        assert bed.shape == (64, 64)
        assert loss.shape == (40,)
        assert blocks.shape == (40, 4)
        assert np.isfinite(loss).all()
        # different seeds explore differently
        assert not np.array_equal(results[0][3], results[1][3])

    def test_large_scale_farm_resume(self, tmp_path):
        p = make_synthetic_problem(H=64, W=64)
        r1 = large_scale_chain_farm(build_small_chain(p), n_chains=2,
                                    rng_seeds=7, n_iter=30,
                                    output_path=tmp_path, segment_size=15,
                                    progress=False, quiet=True)
        r2 = large_scale_chain_farm(build_small_chain(p), n_chains=2,
                                    rng_seeds=7, n_iter=60,
                                    output_path=tmp_path, segment_size=15,
                                    progress=False, quiet=True)
        assert r2[0][3].shape == (60,)
        np.testing.assert_array_equal(r2[0][3][:30], r1[0][3])

    def test_small_scale_farm_with_per_chain_beds(self, tmp_path):
        p = make_synthetic_problem(H=64, W=64)
        chain = build_sgs_chain(p)
        rng = np.random.default_rng(0)
        beds = np.stack([
            np.minimum(p["initial_bed"] + rng.normal(0, 10, (64, 64)),
                       p["surf"] - 5.0)
            for _ in range(2)]).astype(np.float32)
        results = small_scale_chain_farm(
            chain, n_chains=2, initial_beds=beds, ssc_rng_seeds=[5, 6],
            lsc_rng_seed=123456789, n_iter=30, output_path=tmp_path,
            segment_size=15, progress=False, quiet=True)
        assert len(results) == 2
        bed, _, _, loss, steps, _, _ = results[0]
        assert np.isfinite(loss).all()
        assert bed.shape == (64, 64)
        # nested run directory like the reference layout — keyed by the
        # FULL parent seed (the reference truncates to 6 digits, but here
        # the dir carries resume state, so truncation collisions would
        # silently continue a different parent's chains)
        assert (tmp_path / "LargeScaleChain" / "123456789" /
                "SmallScaleChain").exists()


def test_farm_async_checkpoints_matches_sync(tmp_path):
    """async_checkpoints passes through the farm driver and changes
    nothing about the results."""
    p = make_synthetic_problem(H=64, W=64)
    r_sync = large_scale_chain_farm(
        build_small_chain(p), n_chains=2, rng_seeds=7, n_iter=30,
        output_path=tmp_path / "sync", segment_size=15, progress=False,
        quiet=True)
    r_async = large_scale_chain_farm(
        build_small_chain(p), n_chains=2, rng_seeds=7, n_iter=30,
        output_path=tmp_path / "async", segment_size=15, progress=False,
        quiet=True, async_checkpoints=True)
    np.testing.assert_array_equal(r_async[0][3], r_sync[0][3])
    np.testing.assert_array_equal(r_async[0][0], r_sync[0][0])
    # and the async run's checkpoint is durable + resumable
    r2 = large_scale_chain_farm(
        build_small_chain(p), n_chains=2, rng_seeds=7, n_iter=60,
        output_path=tmp_path / "async", segment_size=15, progress=False,
        quiet=True, async_checkpoints=True)
    np.testing.assert_array_equal(r2[0][3][:30], r_sync[0][3])


def test_iteration_batches():
    assert iteration_batches(5000) == [5000]
    assert iteration_batches(150_000) == [60_000] + [10_000] * 9
    assert sum(iteration_batches(123_456)) == 123_456


class TestSnapshotRoundtrip:
    """chain_snapshot / chain_from_snapshot (the reference's __dict__
    pickling for pool workers + init_*_chain_by_instance rebuilds,
    MCMC.py:359-430): a rebuilt chain is run-for-run identical to the
    original, through a pickle boundary like the reference's mp.Pool."""

    def test_crf_snapshot_pickles_and_reproduces(self):
        import pickle

        from mcmc_tpu.drivers import chain_from_snapshot, chain_snapshot

        p = make_synthetic_problem(H=48, W=48)
        chain = build_small_chain(p)
        snap = pickle.loads(pickle.dumps(chain_snapshot(chain)))
        rebuilt = chain_from_snapshot(snap)
        r1 = chain.run(25, progress_bar=False, seed=11)
        r2 = rebuilt.run(25, progress_bar=False, seed=11)
        np.testing.assert_array_equal(r2["loss"], r1["loss"])
        np.testing.assert_array_equal(r2["bed"], r1["bed"])

    def test_sgs_snapshot_pickles_and_reproduces(self):
        import pickle

        from mcmc_tpu.drivers import chain_from_snapshot, chain_snapshot

        p = make_synthetic_problem(H=48, W=48)
        chain = build_sgs_chain(p)
        snap = pickle.loads(pickle.dumps(chain_snapshot(chain)))
        rebuilt = chain_from_snapshot(snap)
        r1 = chain.run(15, progress_bar=False, seed=4)
        r2 = rebuilt.run(15, progress_bar=False, seed=4)
        np.testing.assert_array_equal(r2["loss"], r1["loss"])
        np.testing.assert_array_equal(r2["bed"], r1["bed"])
