"""Checkpoint/resume: an interrupted+resumed run must equal an uninterrupted
one (the reference's RNG-state round-trip guarantee, here via PRNG keys)."""

import numpy as np
import pytest

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
        assert [it for it, _, _ in mgr._checkpoints()] == [20]

    def test_keep_retains_n_newest(self, tmp_path):
        """keep=N retains the N newest checkpoints (the reference keeps
        only the latest; keep>1 is the safety margin for production runs
        where the newest file may be suspect after a crash)."""
        s = make_sampler()
        states = s.init(seeds=3)
        mgr = CheckpointManager(tmp_path, keep=2)
        for it in (10, 20, 30, 40):
            mgr.save(it, states)
        assert [it for it, _, _ in mgr._checkpoints()] == [30, 40]
        # both retained checkpoints load
        it, loaded, _, _ = mgr.load(30)
        assert it == 30
        np.testing.assert_array_equal(np.asarray(loaded.bed),
                                      np.asarray(states.bed))

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

    def test_sharded_save_roundtrip(self, tmp_path):
        """Forced-sharded save on a mesh-sharded state (single process):
        writes shard files + marker, reassembles bitwise on load.  The 2D
        (chains, grid) mesh makes every leaf REPLICATED over grid, so the
        replica-dedup path is exercised too."""
        import dataclasses

        import jax
        from mcmc_tpu.parallel.mesh import chains_grid_mesh, shard_chains

        p = make_synthetic_problem(H=64, W=64)
        chain = build_small_chain(p)
        mesh = chains_grid_mesh(4, 2)
        s = MultiChainSampler(chain, n_chains=4, mesh=mesh)
        states = s.init(seeds=5)
        states, _ = s.run_segment(states, 5)
        mgr = CheckpointManager(tmp_path)
        mgr.save(5, states, meta={"tag": "sharded"}, sharded=True)
        names = sorted(x.name for x in tmp_path.iterdir())
        assert "checkpoint_5.ok" in names
        assert "checkpoint_5.proc0of1.npz" in names
        assert mgr.latest_iter() == 5
        man = mgr.manifest()
        assert [(c["iter"], c["layout"]) for c in man["checkpoints"]] == [
            (5, "sharded")]
        assert man["checkpoints"][0]["files"] == [
            "checkpoint_5.proc0of1.npz"]
        it, loaded, _, meta = mgr.load()
        assert it == 5 and meta == {"tag": "sharded"}
        for f in dataclasses.fields(type(states)):
            if f.name == "key":
                continue
            want = np.asarray(getattr(states, f.name))
            got = np.asarray(getattr(loaded, f.name))
            np.testing.assert_array_equal(want, got, err_msg=f.name)
        np.testing.assert_array_equal(
            np.asarray(jax.random.key_data(loaded.key)),
            np.asarray(jax.random.key_data(states.key)))
        # resume from the sharded checkpoint: re-shard and continue; must
        # equal continuing the live states bitwise
        st2 = shard_chains(loaded, mesh)
        _, tr_live = s.run_segment(states, 5)
        _, tr_resumed = s.run_segment(st2, 5)
        np.testing.assert_array_equal(np.asarray(tr_live["loss"]),
                                      np.asarray(tr_resumed["loss"]))

    def test_sharded_supersedes_single(self, tmp_path):
        """keep=1 cleanup works across layouts: a sharded save deletes an
        older single-file checkpoint and vice versa."""
        s = make_sampler()
        states = s.init(seeds=3)
        mgr = CheckpointManager(tmp_path)
        mgr.save(10, states)
        mgr.save(20, states, sharded=True)
        assert [it for it, _, _ in mgr._checkpoints()] == [20]
        assert not (tmp_path / "checkpoint_10.npz").exists()
        mgr.save(30, states)
        assert [it for it, _, _ in mgr._checkpoints()] == [30]
        assert not (tmp_path / "checkpoint_20.ok").exists()
        assert not (tmp_path / "checkpoint_20.proc0of1.npz").exists()

    def test_resume_restores_mesh_placement(self, tmp_path):
        """A resumed run on a meshed sampler must re-shard the loaded host
        state over the chains axis (not run replicated) and still be
        bitwise identical to the uninterrupted run."""
        import jax
        from mcmc_tpu.parallel.mesh import chains_mesh

        p = make_synthetic_problem(H=64, W=64)
        chain = build_small_chain(p)
        mesh = chains_mesh(8)

        s1 = MultiChainSampler(chain, n_chains=8, mesh=mesh)
        st = s1.init(seeds=4)
        _, full = s1.run(st, n_iter=40, segment_size=20, progress=False)

        d = tmp_path / "ck"
        s2 = MultiChainSampler(chain, n_chains=8, mesh=mesh)
        run_with_checkpointing(s2, 20, d, seeds=4, segment_size=20)
        s3 = MultiChainSampler(chain, n_chains=8, mesh=mesh)
        states3, h2, c2 = run_with_checkpointing(s3, 40, d, seeds=4,
                                                 segment_size=20)
        assert c2 == 40
        np.testing.assert_array_equal(h2["loss"], full["loss"])
        # final state is actually sharded over all 8 devices
        assert len(states3.bed.sharding.device_set) == 8

    def test_incomplete_sharded_set_invisible(self, tmp_path):
        """A sharded set without its .ok marker (crash mid-save) must not
        be discovered; with the marker but a missing shard file, load must
        not silently return a partial state."""
        s = make_sampler()
        states = s.init(seeds=3)
        mgr = CheckpointManager(tmp_path)
        mgr.save(10, states)
        mgr.save(20, states, sharded=True)
        # simulate crash: marker removed -> set invisible, 10 still gone
        (tmp_path / "checkpoint_20.ok").unlink()
        assert mgr.latest_iter() is None
        # marker present but a shard file missing -> set invisible too
        (tmp_path / "checkpoint_20.ok").touch()
        shard = tmp_path / "checkpoint_20.proc0of1.npz"
        shard.rename(tmp_path / "checkpoint_20.proc0of2.npz")
        assert mgr.latest_iter() is None

    def test_resave_retracts_stale_same_iter_sets(self, tmp_path):
        """A re-save at an existing iteration (post-crash restart, possibly
        with a different process count) must retract the old set so a
        stale-but-complete layout can never shadow the new state."""
        import shutil

        s = make_sampler()
        st_a = s.init(seeds=3)
        st_b = s.init(seeds=99)
        mgr = CheckpointManager(tmp_path)

        # stale sharded layout (pretend 2-process) at iter 20 + marker,
        # then a sharded re-save with the current (1-process) layout
        mgr.save(20, st_a, sharded=True)
        src = tmp_path / "checkpoint_20.proc0of1.npz"
        shutil.copy(src, tmp_path / "checkpoint_20.proc0of2.npz")
        shutil.copy(src, tmp_path / "checkpoint_20.proc1of2.npz")
        mgr.save(20, st_b, sharded=True)
        names = {x.name for x in tmp_path.iterdir()}
        assert "checkpoint_20.proc0of2.npz" not in names
        assert "checkpoint_20.proc1of2.npz" not in names
        _, loaded, _, _ = mgr.load()
        np.testing.assert_array_equal(np.asarray(loaded.bed),
                                      np.asarray(st_b.bed))

        # single-file re-save over an existing sharded set at the same iter
        # (sharded beats single in discovery, so leftovers would shadow it)
        mgr.save(20, st_a)
        names = {x.name for x in tmp_path.iterdir()}
        assert "checkpoint_20.ok" not in names
        assert not any(".proc" in n for n in names)
        _, loaded, _, _ = mgr.load()
        np.testing.assert_array_equal(np.asarray(loaded.bed),
                                      np.asarray(st_a.bed))

    def test_resume_noop_when_complete(self, tmp_path):
        s = make_sampler()
        d = tmp_path / "ck"
        _, h1, _ = run_with_checkpointing(s, 30, d, seeds=9, segment_size=10)
        s2 = make_sampler()
        _, h2, c = run_with_checkpointing(s2, 30, d, seeds=9, segment_size=10)
        assert c == 30
        np.testing.assert_array_equal(h1["loss"], h2["loss"])


class TestRound3ReviewFixes:
    def test_stale_history_segment_pruned_on_resume(self, tmp_path):
        """A crash between a history append and its state save leaves a
        segment AHEAD of the checkpoint; resume must prune it or a later
        load_history() concatenates overlapping segments (duplicated
        rows, truncated tail)."""
        s1 = make_sampler()
        st = s1.init(seeds=9)
        _, full = s1.run(st, n_iter=40, segment_size=10, progress=False)

        d = tmp_path / "ck"
        run_with_checkpointing(make_sampler(), 20, d, seeds=9,
                               segment_size=10)
        mgr = CheckpointManager(d)
        # fake the crash window: history rows [20, 30) on disk, state at 20
        mgr.append_history(20, 30, {"loss": np.full((2, 10), np.nan),
                                    "step": np.zeros((2, 10), bool)})
        _, h2, c2 = run_with_checkpointing(make_sampler(), 40, d, seeds=9,
                                           segment_size=10)
        assert c2 == 40 and h2["loss"].shape == (2, 40)
        np.testing.assert_array_equal(h2["loss"], full["loss"])
        # and a fresh directory read agrees (no overlapping segments left)
        h3 = CheckpointManager(d).load_history(upto=40)
        np.testing.assert_array_equal(h3["loss"], full["loss"])

    def test_family_mismatch_resume_raises(self, tmp_path):
        from tests.test_chain_sgs import build_sgs_chain

        d = tmp_path / "ck"
        run_with_checkpointing(make_sampler(), 10, d, seeds=1,
                               segment_size=10)
        p = make_synthetic_problem(H=64, W=64)
        sgs_sampler = MultiChainSampler(build_sgs_chain(p), n_chains=2,
                                        use_mesh=False)
        with pytest.raises(ValueError, match="chain family"):
            run_with_checkpointing(sgs_sampler, 20, d, seeds=1,
                                   segment_size=10)


class TestAsyncCheckpoint:
    """async_write=True: background write/publish/cleanup must be
    indistinguishable on disk from the synchronous path."""

    def test_async_save_equals_sync(self, tmp_path):
        s = make_sampler()
        states = s.init(seeds=3)
        hist = {"loss": np.arange(34, dtype=np.float32).reshape(2, 17)}
        sync = CheckpointManager(tmp_path / "sync")
        sync.save(17, states, hist, meta={"tag": "x"})
        amgr = CheckpointManager(tmp_path / "async", async_write=True)
        amgr.save(17, states, hist, meta={"tag": "x"})
        amgr.flush()
        i1, st1, h1, m1 = sync.load()
        i2, st2, h2, m2 = amgr.load()
        assert i1 == i2 and m1 == m2
        np.testing.assert_array_equal(np.asarray(st1.bed), np.asarray(st2.bed))
        np.testing.assert_array_equal(h1["loss"], h2["loss"])

    def test_async_ordering_and_cleanup(self, tmp_path):
        """Queued saves publish in order; keep-cleanup leaves only the
        newest; readers flush the queue first (no explicit flush call)."""
        s = make_sampler()
        states = s.init(seeds=3)
        mgr = CheckpointManager(tmp_path, async_write=True)
        for it in (10, 20, 30):
            mgr.save(it, states)
        assert mgr.latest_iter() == 30  # flushes internally
        assert [it for it, _, _ in mgr._checkpoints()] == [30]

    def test_async_write_failure_raises(self, tmp_path, monkeypatch):
        s = make_sampler()
        states = s.init(seeds=3)
        mgr = CheckpointManager(tmp_path, async_write=True)

        import numpy as _np
        real = _np.savez_compressed

        def boom(*a, **k):
            raise OSError("disk gone")

        monkeypatch.setattr(_np, "savez_compressed", boom)
        mgr.save(10, states)
        with pytest.raises(OSError, match="disk gone"):
            mgr.flush()
        monkeypatch.setattr(_np, "savez_compressed", real)
        # the queue is drained after the raise; the manager stays usable
        mgr.save(20, states)
        assert mgr.latest_iter() == 20

    def test_failed_history_write_poisons_queued_state_save(self, tmp_path,
                                                            monkeypatch):
        """A failed async history write must prevent the already-queued
        state save from publishing — otherwise the checkpoint lands
        without its preceding trace rows (a silent permanent hole that
        prune_history cannot detect on resume)."""
        mgr = CheckpointManager(tmp_path, async_write=True)
        s = make_sampler()
        states = s.init(seeds=3)

        import numpy as _np
        real = _np.savez_compressed
        calls = {"n": 0}

        def first_fails(*a, **k):
            calls["n"] += 1
            if calls["n"] == 1:
                raise OSError("disk gone")
            return real(*a, **k)

        monkeypatch.setattr(_np, "savez_compressed", first_fails)
        mgr.append_history(0, 10, {"loss": np.zeros((2, 10))})
        # the hist failure may surface at the save() submit (fail-fast)
        # or at flush() — either way it must surface, and the state file
        # must never publish
        with pytest.raises(OSError, match="disk gone"):
            mgr.save(10, states)
            mgr.flush()
        assert not list(tmp_path.glob("checkpoint_*"))
        assert mgr.latest_iter() is None

    def test_async_queue_backpressure(self, tmp_path, monkeypatch):
        """At most one write in flight + one queued: a third save blocks
        until the oldest completes (each queued write pins a full host
        state snapshot — an unbounded queue would OOM a long run on a
        slow disk)."""
        import threading
        import time as _time

        mgr = CheckpointManager(tmp_path, async_write=True)
        s = make_sampler()
        states = s.init(seeds=3)

        import numpy as _np
        real = _np.savez_compressed
        gate = threading.Event()
        first = {"v": True}

        def slow_first(*a, **k):
            if first["v"]:
                first["v"] = False
                gate.wait(timeout=30)
            return real(*a, **k)

        monkeypatch.setattr(_np, "savez_compressed", slow_first)
        mgr.save(10, states)   # starts, blocks on the gate
        mgr.save(20, states)   # queued
        assert len(mgr._pending) == 2
        threading.Timer(0.3, gate.set).start()
        t0 = _time.time()
        mgr.save(30, states)   # must block until the first write finishes
        assert _time.time() - t0 >= 0.2
        assert len(mgr._pending) <= 2
        mgr.flush()
        assert mgr.latest_iter() == 30

    def test_run_with_async_checkpoints_resume_bitwise(self, tmp_path):
        """Interrupted async-checkpointed run + resume == uninterrupted
        (the invariant the synchronous path already guarantees)."""
        s1 = make_sampler()
        st = s1.init(seeds=9)
        _, full = s1.run(st, n_iter=60, segment_size=20, progress=False)

        d = tmp_path / "ck"
        _, h1, c1 = run_with_checkpointing(make_sampler(), 30, d, seeds=9,
                                           segment_size=20,
                                           async_checkpoints=True)
        assert c1 == 30 and h1["loss"].shape == (2, 30)
        _, h2, c2 = run_with_checkpointing(make_sampler(), 60, d, seeds=9,
                                           segment_size=20,
                                           async_checkpoints=True)
        assert c2 == 60
        np.testing.assert_array_equal(h2["loss"], full["loss"])
        np.testing.assert_array_equal(h2["step"], full["step"])


def test_ess_single_chain_finite():
    """ess() on a single chain must split-in-half, not return NaN."""
    from mcmc_tpu.parallel.diagnostics import ess

    rng = np.random.default_rng(0)
    # an AR(1) trace with known positive autocorrelation
    x = np.zeros(400)
    for i in range(1, 400):
        x[i] = 0.7 * x[i - 1] + rng.normal()
    out = np.asarray(ess(x[None, :]))
    assert np.isfinite(out).all()
    assert 5 < float(out) < 400


def test_progress_cursor_helpers(capsys):
    """Reference-parity ANSI helpers write cursor escapes to stdout
    (MCMC.py:31-39 behavior: side-effect print, no return value)."""
    from mcmc_tpu.utils.progress import clear_line, move_cursor_to_line

    move_cursor_to_line(3)
    clear_line()
    out = capsys.readouterr().out
    assert "\033[3;0H" in out and "\033[2K" in out
