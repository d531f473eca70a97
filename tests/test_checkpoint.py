"""Checkpoint/resume: an interrupted+resumed run must equal an uninterrupted
one (the reference's RNG-state round-trip guarantee, here via PRNG keys)."""

import numpy as np

from mcmc_tpu.io import CheckpointManager, run_with_checkpointing
from mcmc_tpu.parallel import MultiChainSampler
from tests.conftest import make_synthetic_problem
from tests.test_chain_crf import build_small_chain


def make_sampler():
    p = make_synthetic_problem(H=64, W=64)
    chain = build_small_chain(p)
    return MultiChainSampler(chain, n_chains=2, use_mesh=False)


class TestCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        s = make_sampler()
        states = s.init(seeds=3)
        mgr = CheckpointManager(tmp_path)
        mgr.save(17, states, {"loss": np.zeros((2, 17))}, meta={"tag": "x"})
        assert mgr.latest_iter() == 17
        it, loaded, hist, meta = mgr.load()
        assert it == 17 and meta == {"tag": "x"}
        np.testing.assert_array_equal(np.asarray(loaded.bed),
                                      np.asarray(states.bed))
        import jax
        np.testing.assert_array_equal(np.asarray(jax.random.key_data(loaded.key)),
                                      np.asarray(jax.random.key_data(states.key)))
        assert hist["loss"].shape == (2, 17)

    def test_load_merges_incremental_histories(self, tmp_path):
        """Histories written via append_history (the run_with_checkpointing
        protocol) must surface from a plain load() — regression: direct
        consumers like examples/05 saw empty histories."""
        s = make_sampler()
        states = s.init(seeds=3)
        mgr = CheckpointManager(tmp_path)
        mgr.append_history(0, 10, {"loss": np.arange(20).reshape(2, 10)})
        mgr.append_history(10, 18, {"loss": np.arange(16).reshape(2, 8)})
        mgr.save(15, states)  # state behind the history tail (crash window)
        it, _, hist, _ = mgr.load()
        assert it == 15
        assert hist["loss"].shape == (2, 15)  # truncated to the state iter
        np.testing.assert_array_equal(hist["loss"][:, :10],
                                      np.arange(20).reshape(2, 10))

    def test_old_checkpoints_deleted_after_new(self, tmp_path):
        s = make_sampler()
        states = s.init(seeds=3)
        mgr = CheckpointManager(tmp_path)
        mgr.save(10, states)
        mgr.save(20, states)
        assert [it for it, _ in mgr._checkpoints()] == [20]

    def test_resume_equals_uninterrupted(self, tmp_path):
        # uninterrupted
        s1 = make_sampler()
        st = s1.init(seeds=9)
        _, full = s1.run(st, n_iter=60, segment_size=20, progress=False)

        # interrupted at 30 rows, then resumed to 60
        s2 = make_sampler()
        d = tmp_path / "ck"
        _, h1, c1 = run_with_checkpointing(s2, 30, d, seeds=9,
                                           segment_size=20)
        assert c1 == 30 and h1["loss"].shape == (2, 30)
        s3 = make_sampler()
        _, h2, c2 = run_with_checkpointing(s3, 60, d, seeds=9,
                                           segment_size=20)
        assert c2 == 60
        assert h2["loss"].shape == (2, 60)
        np.testing.assert_array_equal(h2["loss"], full["loss"])
        np.testing.assert_array_equal(h2["step"], full["step"])

    def test_resume_noop_when_complete(self, tmp_path):
        s = make_sampler()
        d = tmp_path / "ck"
        _, h1, _ = run_with_checkpointing(s, 30, d, seeds=9, segment_size=10)
        s2 = make_sampler()
        _, h2, c = run_with_checkpointing(s2, 30, d, seeds=9, segment_size=10)
        assert c == 30
        np.testing.assert_array_equal(h1["loss"], h2["loss"])
