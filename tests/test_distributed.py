"""Multi-host wiring smoke tests (SURVEY.md §5.8 DCN path).

A real pod slice is unavailable here, so the jax.distributed path is
exercised with a 1-process coordinator in a SUBPROCESS (initialize mutates
global runtime state), and the mesh-layout helpers are tested against the
8 virtual CPU devices.
"""

import os
import pathlib
import socket
import subprocess
import sys

import jax
import numpy as np

from mcmc_tpu.parallel.distributed import (global_chains_grid_mesh,
                                           global_chains_mesh,
                                           initialize_distributed)

_ROOT = str(pathlib.Path(__file__).resolve().parents[1])


def _free_port() -> int:
    with socket.socket() as s:
        s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_two_process(tmp_path, worker_src: str, marker: str,
                     extra_env: dict | None = None, timeout: int = 280):
    """Run one worker script as a REAL 2-process jax.distributed cluster
    (Gloo over localhost) and return ``(out0, out1)`` after asserting both
    processes printed ``marker``.

    The worker reads its process id from ``sys.argv[1]`` and must use
    ``localhost:{PORT}`` as the coordinator address — ``{PORT}`` is
    substituted here.  This helper centralizes the launch boilerplate the
    two-process tests previously each carried a copy of:

    - scrubbed environment (the image's sitecustomize pre-imports jax, so
      PYTHONPATH / JAX_PLATFORMS / XLA_FLAGS must be reset for the child);
    - free-port discovery with ONE retry on a fresh port — the probe
      socket closes before the coordinator binds, so the port can be
      stolen in that window (TOCTOU) under parallel runs;
    - workers wrapped in coreutils ``timeout -s KILL`` so a harness-level
      SIGKILL of pytest itself cannot orphan a wedged Gloo worker on this
      single-core host (the in-process finally never runs in that case);
    - the communicate/kill teardown with saved handles (never by pattern).
    """
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = _ROOT
    env["JAX_PLATFORMS"] = "cpu"
    if extra_env:
        env.update(extra_env)
    worker = tmp_path / "worker.py"
    out0 = out1 = ""
    for attempt in (0, 1):
        port = _free_port()
        worker.write_text(worker_src.replace("{PORT}", str(port)))
        procs = [subprocess.Popen(
            ["timeout", "-s", "KILL", str(timeout + 120),
             sys.executable, str(worker), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=_ROOT) for i in (0, 1)]
        try:
            # a hung worker must not error the test before the retry
            # check below runs (a stolen coordinator port leaves the
            # OTHER worker retrying the connect for ~5 min, far past
            # these budgets) — drain with kill-on-timeout instead
            out1 = _drain(procs[1], timeout)
            out0 = _drain(procs[0], 60)
        finally:
            for p in procs:
                if p.poll() is None:
                    _killpg(p)
        both = out0 + out1
        if (attempt == 0 and marker not in out0
                and "address already in use" in both.lower()):
            continue  # coordinator lost the port race; retry fresh
        break
    assert marker in out0, out0
    assert marker in out1, out1
    return out0, out1


def _killpg(p):
    """Kill a launched worker AND its coreutils `timeout` wrapper.

    The wrapper makes itself the process-group leader (so its expiry can
    kill the group); `p.kill()` alone would kill only the wrapper and
    orphan the python worker — with the wrapper dead, its own hard-kill
    could never fire either, blocking this single-core host indefinitely.
    """
    import signal

    try:
        os.killpg(p.pid, signal.SIGKILL)
    except (ProcessLookupError, PermissionError):
        p.kill()


def _drain(p, budget: int) -> str:
    """communicate() with a budget; on expiry kill the process group and
    collect whatever output was produced (never raises TimeoutExpired)."""
    try:
        return p.communicate(timeout=budget)[0]
    except subprocess.TimeoutExpired:
        _killpg(p)
        return p.communicate()[0]


class TestMeshLayout:
    def test_global_chains_mesh_spans_all_devices(self):
        mesh = global_chains_mesh()
        assert mesh.shape["chains"] == len(jax.devices())

    def test_grid_shards_contiguous(self):
        mesh = global_chains_grid_mesh(2)
        assert dict(mesh.shape) == {"chains": 4, "grid": 2}
        # each chain row's grid devices are consecutive (same-host proxy)
        dev = np.asarray(mesh.devices)
        for row in dev:
            ids = [d.id for d in row]
            assert ids == sorted(ids) and ids[1] == ids[0] + 1

    def test_indivisible_grid_raises(self):
        import pytest

        with pytest.raises(ValueError):
            global_chains_grid_mesh(3)


class TestInitialize:
    def test_noop_without_cluster_env(self, monkeypatch):
        for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                    "JAX_PROCESS_ID"):
            monkeypatch.delenv(var, raising=False)
        assert initialize_distributed() is False

    def test_one_process_coordinator_subprocess(self):
        """Full jax.distributed.initialize + a jitted chain step under the
        multi-process runtime (1-process cluster), in a subprocess."""
        code = r"""
import sys
sys.path.insert(0, %r)
from mcmc_tpu.parallel.distributed import (initialize_distributed,
                                           global_chains_mesh)
ok = initialize_distributed(coordinator_address="localhost:43219",
                            num_processes=1, process_id=0)
import jax
assert jax.process_count() == 1
mesh = global_chains_mesh()
assert mesh.shape["chains"] == 4, mesh.shape

from tests.conftest import make_synthetic_problem
from tests.test_chain_crf import build_small_chain
from mcmc_tpu.parallel import MultiChainSampler
import numpy as np

p = make_synthetic_problem(H=64, W=64)
chain = build_small_chain(p)
s = MultiChainSampler(chain, n_chains=4, mesh=mesh)
st = s.init(seeds=0)
st, tr = s.run_segment(st, 10)
assert np.isfinite(np.asarray(tr["loss"])).all()
jax.distributed.shutdown()
print("DISTRIBUTED_OK")
"""
        import os
        import pathlib

        root = str(pathlib.Path(__file__).resolve().parents[1])
        # clean env: jax.distributed.initialize must run before ANY backend
        # init, so the image's pre-importing sitecustomize must not load
        env = {k: v for k, v in os.environ.items()
               if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
        env["PYTHONPATH"] = root
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        out = subprocess.run([sys.executable, "-c", code % root],
                             capture_output=True, text=True, timeout=300,
                             cwd=root, env=env)
        assert "DISTRIBUTED_OK" in out.stdout, (out.stdout, out.stderr)

    def test_two_process_cluster_collective(self, tmp_path):
        """A REAL 2-process jax.distributed cluster (Gloo over localhost):
        both processes join the coordinator, build the global chains mesh,
        run a host-level allgather AND a jitted cross-process all-reduce
        over a global sharded array."""
        worker_src = r"""
import sys
pid = int(sys.argv[1])
import jax
jax.config.update("jax_platforms", "cpu")
from mcmc_tpu.parallel.distributed import (initialize_distributed,
                                           global_chains_mesh)
ok = initialize_distributed(coordinator_address="localhost:{PORT}",
                            num_processes=2, process_id=pid)
assert ok and jax.process_count() == 2, (ok, jax.process_count())
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils
mesh = global_chains_mesh()
assert len(jax.devices()) == 2
x = jnp.ones((1,)) * (pid + 1)
g = multihost_utils.process_allgather(x)
assert g.shape == (2, 1) and float(g.sum()) == 3.0, g
sharding = NamedSharding(mesh, P("chains"))
local = np.full((1,), float(pid + 1), np.float32)
garr = jax.make_array_from_single_device_arrays(
    (2,), sharding, [jax.device_put(local, jax.local_devices()[0])])
total = jax.jit(lambda a: jnp.sum(a),
                out_shardings=NamedSharding(mesh, P()))(garr)
assert float(np.asarray(total)) == 3.0, total
jax.distributed.shutdown()
print("TWO_PROC_OK", flush=True)
"""
        _run_two_process(tmp_path, worker_src, "TWO_PROC_OK")

    def test_two_process_sharded_checkpoint(self, tmp_path):
        """Pod-style checkpointing on a REAL 2-process cluster: each
        process writes only its addressable shards (no host gather),
        process 0 publishes the completion marker, load() reassembles the
        full state bitwise, and a resume from the sharded checkpoint
        continues identically to the live chains (SURVEY.md §5.4's
        sharded-checkpoint design)."""
        ckdir = tmp_path / "ck"
        ckdir.mkdir()
        worker_src = r"""
import dataclasses
import os
import sys
pid = int(sys.argv[1])
ckdir = %r
import jax
jax.config.update("jax_platforms", "cpu")
from mcmc_tpu.parallel.distributed import (initialize_distributed,
                                           global_chains_mesh)
ok = initialize_distributed(coordinator_address="localhost:{PORT}",
                            num_processes=2, process_id=pid)
assert ok and jax.process_count() == 2
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from tests.conftest import make_synthetic_problem
from tests.test_chain_crf import build_small_chain
from mcmc_tpu.parallel import MultiChainSampler
from mcmc_tpu.parallel.mesh import shard_chains
from mcmc_tpu.io.checkpoint import CheckpointManager

mesh = global_chains_mesh()
p = make_synthetic_problem(H=64, W=64)
chain = build_small_chain(p)
s = MultiChainSampler(chain, n_chains=4, mesh=mesh)
st = s.init(seeds=0)
st, _ = s.run_segment(st, 10)
mgr = CheckpointManager(ckdir)
mgr.save(10, st)  # auto-sharded: process_count == 2
names = sorted(os.listdir(ckdir))
assert "checkpoint_10.ok" in names, names
assert "checkpoint_10.proc0of2.npz" in names, names
assert "checkpoint_10.proc1of2.npz" in names, names
cum, loaded, _, _ = mgr.load()
assert cum == 10
rep = jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))
for f in dataclasses.fields(type(st)):
    if f.name == "key":
        continue
    want = np.asarray(rep(getattr(st, f.name)))
    got = np.asarray(getattr(loaded, f.name))
    assert want.dtype == got.dtype and np.array_equal(want, got), f.name
want_kd = np.asarray(rep(jax.random.key_data(st.key)))
got_kd = np.asarray(jax.random.key_data(loaded.key))
assert np.array_equal(want_kd, got_kd)
# resume: re-shard the reassembled state; continuation must be bitwise ==
st2 = shard_chains(loaded, mesh)
_, tr_live = s.run_segment(st, 5)
_, tr_res = s.run_segment(st2, 5)
la = np.asarray(rep(tr_live["loss"]))
lb = np.asarray(rep(tr_res["loss"]))
assert np.array_equal(la, lb)
jax.distributed.shutdown()
print("SHARDED_CKPT_OK", flush=True)
""" % (str(ckdir),)
        _run_two_process(tmp_path, worker_src, "SHARDED_CKPT_OK")

    def test_two_process_sgs_chain(self, tmp_path):
        """The SGS family on a REAL 2-process cluster: the batched packed-CG
        step runs under a cross-process `chains` sharding (the virtual-mesh
        test in test_parallel.py proves sharded == unsharded; this proves
        the same program executes across process boundaries) and both
        processes observe the identical global loss trace."""
        worker_src = r"""
import sys
pid = int(sys.argv[1])
import jax
jax.config.update("jax_platforms", "cpu")
from mcmc_tpu.parallel.distributed import (initialize_distributed,
                                           global_chains_mesh)
ok = initialize_distributed(coordinator_address="localhost:{PORT}",
                            num_processes=2, process_id=pid)
assert ok and jax.process_count() == 2
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from tests.conftest import make_synthetic_problem
from tests.test_chain_sgs import build_sgs_chain
from mcmc_tpu.parallel import MultiChainSampler

mesh = global_chains_mesh()
p = make_synthetic_problem(H=64, W=64)
chain = build_sgs_chain(p)
s = MultiChainSampler(chain, n_chains=4, mesh=mesh)
st = s.init(seeds=0)
st, tr = s.run_segment(st, 20)
rep = jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))
loss = np.asarray(rep(tr["loss"]))
assert loss.shape == (20, 4) and np.isfinite(loss).all(), loss
acc = np.asarray(rep(tr["step"])).mean()
assert 0.0 < acc <= 1.0, acc
digest = loss.astype(np.float64).tobytes().hex()[:64]
jax.distributed.shutdown()
print("SGS_2PROC_OK", digest, flush=True)
"""
        out0, out1 = _run_two_process(tmp_path, worker_src, "SGS_2PROC_OK")
        # both processes observed the identical global trace
        d0 = out0.split("SGS_2PROC_OK")[1].split()[0]
        d1 = out1.split("SGS_2PROC_OK")[1].split()[0]
        assert d0 == d1

    def test_two_process_cli_experiment(self, tmp_path):
        """The declarative CLI on a REAL 2-process cluster: every host
        invokes the SAME `mcmc-tpu config.json` command (the pod recipe —
        main() joins the cluster from the JAX_* env vars before any
        backend init), the farm runs on the global mesh, the checkpoint
        lands in the pod-sharded layout, and only process 0 writes the
        output arrays."""
        import json

        import numpy as np

        from tests.test_cli import _crf_config, _write_dataset

        _write_dataset(tmp_path)
        cfg_path = tmp_path / "exp.json"
        cfg_path.write_text(json.dumps(_crf_config(n_iter=20)))

        worker_src = r"""
import sys
pid = int(sys.argv[1])
import os
os.environ["JAX_COORDINATOR_ADDRESS"] = "localhost:{PORT}"
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = str(pid)
import jax
jax.config.update("jax_platforms", "cpu")
from mcmc_tpu import cli
rc = cli.main([%r])   # NOT --quiet: console gating is under test below
assert rc == 0 and jax.process_count() == 2
jax.distributed.shutdown()
print("CLI_2PROC_OK", flush=True)
""" % (str(cfg_path),)
        out0, out1 = _run_two_process(tmp_path, worker_src, "CLI_2PROC_OK")

        # console one-writer boundary: the banner/summary print once (from
        # process 0), never from process 1 — P duplicate streams otherwise
        assert "chain farm complete" in out0, out0
        assert "[mcmc-tpu] loss:" in out0, out0
        assert "chain farm complete" not in out1, out1
        assert "[mcmc-tpu]" not in out1, out1

        beds = np.load(tmp_path / "beds.npy")
        assert beds.shape == (2, 48, 48) and np.isfinite(beds).all()
        names = sorted(f.name for f in
                       (tmp_path / "run" / "LargeScaleChain").iterdir())
        assert "checkpoint_20.ok" in names, names
        assert "checkpoint_20.proc0of2.npz" in names, names
        assert "checkpoint_20.proc1of2.npz" in names, names

    def test_two_process_cli_sgs(self, tmp_path):
        """The SGS chain family through the pod-wide CLI path (the drivers'
        SGS result-unpacking adds the replicated trend to non-addressable
        beds — the family-specific leaf layout must gather too)."""
        import json

        import numpy as np

        from tests.test_cli import _sgs_config, _write_dataset

        _write_dataset(tmp_path)
        cfg_path = tmp_path / "exp.json"
        cfg_path.write_text(json.dumps(_sgs_config(n_iter=16)))

        worker_src = r"""
import sys
pid = int(sys.argv[1])
import os
os.environ["JAX_COORDINATOR_ADDRESS"] = "localhost:{PORT}"
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = str(pid)
import jax
jax.config.update("jax_platforms", "cpu")
from mcmc_tpu import cli
rc = cli.main([%r, "--quiet"])
assert rc == 0 and jax.process_count() == 2
jax.distributed.shutdown()
print("CLI_SGS_2PROC_OK", flush=True)
""" % (str(cfg_path),)
        _run_two_process(tmp_path, worker_src, "CLI_SGS_2PROC_OK")
        beds = np.load(tmp_path / "beds.npy")
        assert beds.shape == (2, 48, 48) and np.isfinite(beds).all()

    def test_two_process_resume_matches_uninterrupted(self, tmp_path):
        """run_with_checkpointing on a REAL 2-process cluster: a run
        stopped at 20 iterations and re-invoked to 40 must produce the
        bitwise-identical final state and loss history as one
        uninterrupted 40-iteration run (the reference's lsc_run_wrapper
        resume protocol, executed through the pod-sharded checkpoint
        layout + cross-process re-sharding on load)."""
        ck_resume = tmp_path / "ck_resume"
        ck_full = tmp_path / "ck_full"
        worker_src = r"""
import sys
pid = int(sys.argv[1])
import jax
jax.config.update("jax_platforms", "cpu")
from mcmc_tpu.parallel.distributed import (initialize_distributed,
                                           global_chains_mesh)
ok = initialize_distributed(coordinator_address="localhost:{PORT}",
                            num_processes=2, process_id=pid)
assert ok and jax.process_count() == 2
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from tests.conftest import make_synthetic_problem
from tests.test_chain_crf import build_small_chain
from mcmc_tpu.parallel import MultiChainSampler
from mcmc_tpu.io.checkpoint import run_with_checkpointing

mesh = global_chains_mesh()
p = make_synthetic_problem(H=64, W=64)
chain = build_small_chain(p)
s = MultiChainSampler(chain, n_chains=4, mesh=mesh)
rep = jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))

# interrupted: stop at 20, re-invoke to 40 (resume from the sharded set)
st1, h1, done1 = run_with_checkpointing(s, 20, %r, seeds=5,
                                        segment_size=10, progress=False)
assert done1 == 20
st1, h1, done1 = run_with_checkpointing(s, 40, %r, seeds=5,
                                        segment_size=10, progress=False)
# uninterrupted
st2, h2, done2 = run_with_checkpointing(s, 40, %r, seeds=5,
                                        segment_size=10, progress=False)
assert done1 == done2 == 40
la = np.asarray(h1["loss"]); lb = np.asarray(h2["loss"])
assert la.shape == lb.shape == (4, 40), (la.shape, lb.shape)
assert np.array_equal(la, lb)
ba = np.asarray(rep(st1.bed)); bb = np.asarray(rep(st2.bed))
assert np.array_equal(ba, bb)
ka = np.asarray(rep(jax.random.key_data(st1.key)))
kb = np.asarray(rep(jax.random.key_data(st2.key)))
assert np.array_equal(ka, kb)
jax.distributed.shutdown()
print("RESUME_2PROC_OK", la.astype(np.float64).tobytes().hex()[:64],
      flush=True)
""" % (str(ck_resume), str(ck_resume), str(ck_full))
        out0, out1 = _run_two_process(tmp_path, worker_src,
                                      "RESUME_2PROC_OK")
        d0 = out0.split("RESUME_2PROC_OK")[1].split()[0]
        d1 = out1.split("RESUME_2PROC_OK")[1].split()[0]
        assert d0 == d1

    def test_two_process_combined_chains_grid(self, tmp_path):
        """The full two-axis layout on a REAL 2-process cluster: each
        process contributes 2 devices, `global_chains_grid_mesh(2)` lays
        out chains=2 ACROSS the processes (DCN, no per-step traffic) with
        each chain's 2 grid shards WITHIN one process (halo ppermute +
        loss psum never cross DCN).  Both processes must observe the
        identical global result, and it must match the single-process
        UNSHARDED run of the same chains (accept decisions exactly, loss
        to reduction-order tolerance)."""
        worker_src = r"""
import sys
pid = int(sys.argv[1])
import jax
jax.config.update("jax_platforms", "cpu")
from mcmc_tpu.parallel.distributed import (initialize_distributed,
                                           global_chains_grid_mesh)
ok = initialize_distributed(coordinator_address="localhost:{PORT}",
                            num_processes=2, process_id=pid)
assert ok and jax.process_count() == 2
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from tests.conftest import make_synthetic_problem
from tests.test_chain_crf import build_small_chain
from mcmc_tpu.parallel.grid_sharded import (make_sharded_crf_chains,
                                            shard_grid_arrays)

assert len(jax.local_devices()) == 2 and len(jax.devices()) == 4
mesh = global_chains_grid_mesh(2)
assert dict(mesh.shape) == {"chains": 2, "grid": 2}, mesh.shape
for row in np.asarray(mesh.devices):       # halos must never straddle DCN
    assert row[0].process_index == row[1].process_index, mesh.devices

p = make_synthetic_problem(H=64, W=64)
chain = build_small_chain(p)
static, consts = chain.build()
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
from mcmc_tpu.parallel.mesh import _put
beds = jnp.broadcast_to(jnp.asarray(p["initial_bed"], jnp.float32),
                        (2, *p["initial_bed"].shape))
beds = _put(beds, NamedSharding(mesh, P("chains", "grid", None)))
keys = _put(jax.random.split(jax.random.key(3), 2),
            NamedSharding(mesh, P("chains")))
run = make_sharded_crf_chains(mesh, static)
beds_f, losses, steps = run(beds, sharded, keys, 60)
rep = jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))
loss = np.asarray(rep(losses), np.float32)
stp = np.asarray(rep(steps))
assert np.isfinite(loss).all() and stp.sum() > 0
print("COMBINED_2PROC_OK",
      stp.astype(np.int64).tobytes().hex(),
      loss.tobytes().hex(), flush=True)
jax.distributed.shutdown()
"""
        out0, out1 = _run_two_process(
            tmp_path, worker_src, "COMBINED_2PROC_OK",
            extra_env={"XLA_FLAGS":
                       "--xla_force_host_platform_device_count=2"})
        tok0 = out0.split("COMBINED_2PROC_OK")[1].split()[:2]
        tok1 = out1.split("COMBINED_2PROC_OK")[1].split()[:2]
        assert tok0 == tok1  # identical global result on both processes

        # parity vs the single-process UNSHARDED run of the same chains
        from tests.conftest import make_synthetic_problem
        from tests.test_parallel import TestCombinedChainsGrid

        p = make_synthetic_problem(H=64, W=64)
        _, loss1, steps1 = TestCombinedChainsGrid()._run(p, 2, 1)
        steps2 = np.frombuffer(bytes.fromhex(tok0[0]),
                               np.int64).reshape(steps1.shape)
        loss2 = np.frombuffer(bytes.fromhex(tok0[1]),
                              np.float32).reshape(loss1.shape)
        np.testing.assert_array_equal(steps2, steps1.astype(np.int64))
        np.testing.assert_allclose(loss2, loss1, rtol=1e-5)
