"""Multi-host (pod-slice) deployment — one program, many processes.

The reference scales by forking a `multiprocessing.Pool` on one machine
(largeScaleChain_multiprocessing.py:75-79). The TPU-native equivalent is
ONE JAX program launched once per host: every process joins a
`jax.distributed` cluster, builds the SAME global `chains` mesh over all
devices, and runs the identical sampler code — XLA partitions the chain
batch across the pod, chains never communicate during sampling, and each
process checkpoints only its own shard of the state (no host gather).

On a real pod slice the recipe per host is just:

    from mcmc_tpu.parallel.distributed import (initialize_distributed,
                                               global_chains_mesh)
    initialize_distributed()          # reads JAX_COORDINATOR_ADDRESS /
                                      # JAX_NUM_PROCESSES / JAX_PROCESS_ID
                                      # (or pass them explicitly)
    mesh = global_chains_mesh()       # all chips on the slice
    sampler = MultiChainSampler(chain, n_chains=256, mesh=mesh)
    run_with_checkpointing(sampler, n_iter, "runs/denman", seeds=0)

and every process executes this same script. Checkpoints are written as
per-process shard files `checkpoint_{N}.proc{k}of{P}.npz` plus a
completion marker published by process 0 after a cluster barrier
(io/checkpoint.py); re-invoking the script resumes from them with the
sharded placement restored.

No pod is attached here, so this example DEMONSTRATES the full path by
launching a real 2-process `jax.distributed` cluster (Gloo over
localhost, CPU devices) running exactly the recipe above, then verifies
from the parent that (a) both processes observed the identical global
loss trace, (b) the checkpoint directory holds one shard file per
process plus the marker, and (c) a plain single-process
`CheckpointManager.load()` reassembles the full chain batch.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from examples.synthetic_glacier import (  # noqa: E402
    example_out,
    make_dataset,
    quick_mode,
)

OUT = example_out(Path(__file__).with_name("data_out"))
ROOT = Path(__file__).resolve().parents[1]

WORKER = '''
import sys
sys.path.insert(0, {root!r})
pid = int(sys.argv[1])
import jax
jax.config.update("jax_platforms", "cpu")

# 1. join the cluster BEFORE any other jax call initializes a backend
from mcmc_tpu.parallel.distributed import (initialize_distributed,
                                           global_chains_mesh)
ok = initialize_distributed(coordinator_address="localhost:{port}",
                            num_processes=2, process_id=pid)
assert ok and jax.process_count() == 2

import numpy as np
from mcmc_tpu.models import ChainCRF
from mcmc_tpu.parallel import MultiChainSampler
from mcmc_tpu.io.checkpoint import run_with_checkpointing
from mcmc_tpu.utils.config import (BlockMenuConfig, RandFieldConfig,
                                   WeightConfig)

# 2. identical chain setup in every process (the reference broadcasts
#    __dict__ snapshots to pool workers; here the config IS the code)
ds = dict(np.load({dataset!r}))
chain = ChainCRF(ds["xx"], ds["yy"], ds["initial_bed"], ds["surf"],
                 ds["velx"], ds["vely"], ds["dhdt"], ds["smb"],
                 ds["cond_bed"], ds["data_mask"], ds["grounded"],
                 float(ds["resolution"]))
chain.set_update_region(True, ds["highvel_mask"])
chain.set_loss_type(sigma_mc=5.0, massConvInRegion=True)
chain.configure_randfield(
    RandFieldConfig(range_min_x=5e3, range_max_x=20e3, range_min_y=5e3,
                    range_max_y=20e3, scale_min=20.0, scale_max=60.0,
                    nugget_max=0.0, model_name="Gaussian", isotropic=True),
    BlockMenuConfig(8, 16, 8, 16, steps=2),
    WeightConfig(L=2, x0=0, k=6, offset=1, max_dist=5e3,
                 resolution=float(ds["resolution"])))
chain.set_update_type("RF")

# 3. global mesh over every device on the cluster; chains shard across it
mesh = global_chains_mesh()
sampler = MultiChainSampler(chain, n_chains={n_chains}, mesh=mesh)
states, hist, done = run_with_checkpointing(
    sampler, {n_iter}, {ckdir!r}, seeds=2026,
    segment_size={segment}, progress=False)

# every process sees the same GLOBAL trace (chains are sharded, traces
# are replicated diagnostics)
loss = np.asarray(hist["loss"])
assert loss.shape == ({n_chains}, {n_iter}), loss.shape
assert np.isfinite(loss).all()
print(f"PROC{{pid}} done={{done}} loss0={{loss[:, 0].mean():.6e}} "
      f"lossN={{loss[:, -1].mean():.6e}}", flush=True)
jax.distributed.shutdown()
'''


def main():
    quick = quick_mode()
    hw = 48 if quick else 96
    n_iter = 60 if quick else 400
    ds = make_dataset(H=hw, W=hw)
    dataset = OUT / "pod_dataset.npz"
    np.savez(dataset, **{k: v for k, v in ds.items()})

    # fresh demo run: a leftover checkpoint from a different problem size
    # would otherwise be picked up by resume-on-reinvoke and rejected
    ckdir = OUT / "pod_run"
    if ckdir.exists():
        import shutil

        shutil.rmtree(ckdir)
    ckdir.mkdir()

    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = str(ROOT)
    env["JAX_PLATFORMS"] = "cpu"

    def launch():
        # ephemeral coordinator port, discovered right before the spawn;
        # the window where another process can steal it (the probe socket
        # must close before the Gloo coordinator binds) is retried below
        with socket.socket() as s:
            s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        worker = OUT / "pod_worker.py"
        worker.write_text(WORKER.format(root=str(ROOT), port=port,
                                        dataset=str(dataset),
                                        ckdir=str(ckdir), n_chains=4,
                                        n_iter=n_iter,
                                        segment=max(n_iter // 4, 10)))
        print(f"launching 2-process cluster (coordinator localhost:{port}),"
              f" 4 chains x {n_iter} iters sharded across both processes")
        # coreutils timeout hard-kills a wedged worker even if THIS parent
        # is SIGKILLed (e.g. a CI harness timeout) — the finally below
        # never runs in that case and an orphaned Gloo worker would block
        # on this single-core host forever
        procs = [subprocess.Popen(
            ["timeout", "-s", "KILL", "480",
             sys.executable, str(worker), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=str(ROOT)) for pid in (0, 1)]

        def drain(p, budget):
            # never raise on a hung worker: the port-race retry below must
            # still run (a stolen coordinator port leaves the other worker
            # retrying the connect far past these budgets); kill the whole
            # process GROUP — p.kill() would hit only the timeout wrapper
            # and orphan the python worker with no remaining kill path
            import signal

            try:
                return p.communicate(timeout=budget)[0]
            except subprocess.TimeoutExpired:
                try:
                    os.killpg(p.pid, signal.SIGKILL)
                except (ProcessLookupError, PermissionError):
                    p.kill()
                return p.communicate()[0]

        # both workers run concurrently; the second budget only covers
        # its remaining tail (total stays under CI's example timeout)
        outs = [drain(procs[0], 420), drain(procs[1], 90)]
        return procs, outs

    procs, outs = launch()
    if (any(p.returncode != 0 for p in procs)
            and "address already in use" in "".join(outs).lower()):
        procs, outs = launch()  # coordinator lost the port race
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            raise RuntimeError(f"proc{pid} failed:\n{out[-3000:]}")

    # (a) identical global trace on both processes
    lines = [next(ln for ln in out.splitlines() if ln.startswith("PROC"))
             for out in outs]
    print("\n".join(lines))
    assert lines[0].split(" ", 1)[1] == lines[1].split(" ", 1)[1], lines

    # (b) per-process shard files + the completion marker
    names = sorted(f.name for f in ckdir.iterdir())
    shards = [n for n in names if ".proc" in n]
    print("checkpoint dir:", ", ".join(names))
    assert any(n.endswith(".ok") for n in names), names
    assert any("proc0of2" in n for n in shards), names
    assert any("proc1of2" in n for n in shards), names

    # (c) a plain single-process load reassembles the full chain batch
    # (pin the parent to CPU too — this demo must not touch a TPU backend)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from mcmc_tpu.io.checkpoint import CheckpointManager

    done, states, hist, _ = CheckpointManager(ckdir).load()
    beds = np.asarray(states.bed)
    assert done == n_iter and beds.shape == (4, hw, hw)
    assert np.isfinite(beds).all()
    print(f"reassembled from shards: iter={done}, beds {beds.shape} — "
          "the sharded run round-trips through a single-host reader")


if __name__ == "__main__":
    main()
