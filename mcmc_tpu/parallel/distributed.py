"""Multi-host (pod-slice) initialization — the DCN path of SURVEY.md §5.8.

The reference has no distributed backend at all: its "communication" is
process-fork pickling at start and the filesystem at the end
(largeScaleChain_multiprocessing.py:75-79,195-238).  The TPU-native
equivalent is ONE JAX program per host process joined through
``jax.distributed.initialize``: after initialization, ``jax.devices()``
returns the GLOBAL device list, a mesh built from it spans the pod slice,
and XLA routes collectives over ICI within a slice and DCN across hosts.

Layout guidance (matches how the samplers use the axes):
- ``chains`` axis: place it OUTERMOST / across hosts.  Chains are
  share-nothing during sampling (reference semantics), so the chain farm
  needs DCN only for init broadcast and final gather — cross-host traffic
  is almost zero.
- ``grid`` axis: keep each chain's grid shards WITHIN one host/slice so
  the per-step halo ``ppermute`` rides ICI, never DCN.
``global_chains_mesh`` / ``global_chains_grid_mesh`` encode that order.

Checkpointing: io/checkpoint.py auto-shards in multi-process runs — every
process calls ``CheckpointManager.save`` with the GLOBAL state and writes
only its addressable shards (``checkpoint_{N}.proc{k}of{P}.npz``, no host
gather, no DCN traffic); process 0 publishes the ``.ok`` completion marker
after a global barrier.  Requires a shared filesystem, as on TPU pods.
Exercised end-to-end on a real 2-process cluster in
tests/test_distributed.py::test_two_process_sharded_checkpoint.

Smoke-tested in-process with a 1-process coordinator
(tests/test_distributed.py) since this image has a single host; on a real
pod slice the same entry point is driven by the TPU runtime environment
variables (no arguments needed).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None,
                           local_device_ids=None) -> bool:
    """Join (or start) a multi-host JAX runtime.  Returns True if a
    multi-process runtime was initialized, False for the single-process
    fast path.

    With no arguments: on TPU pods the cluster-autodetect path of
    ``jax.distributed.initialize`` reads the runtime-provided environment;
    elsewhere the JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID variables are honored, and if none are present this is
    a no-op (single process).
    """
    # must not touch jax.process_count()/devices() here — any backend query
    # initializes XLA, after which jax.distributed.initialize refuses to run
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    env_addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    env_n = os.environ.get("JAX_NUM_PROCESSES")
    env_id = os.environ.get("JAX_PROCESS_ID")
    coordinator_address = coordinator_address or env_addr
    if num_processes is None and env_n is not None:
        num_processes = int(env_n)
    if process_id is None and env_id is not None:
        process_id = int(env_id)
    if coordinator_address is None and num_processes is None:
        # single-host run with no cluster env: nothing to do
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return jax.process_count() > 1


def global_chains_mesh(devices=None) -> Mesh:
    """1D ``chains`` mesh over ALL global devices (multi-host aware).

    Devices are ordered process-major so consecutive chains land on the
    same host — the chain farm's zero-communication sampling then never
    touches DCN.
    """
    devices = devices if devices is not None else jax.devices()
    ordered = sorted(devices, key=lambda d: (d.process_index, d.id))
    return Mesh(np.asarray(ordered), axis_names=("chains",))


def global_chains_grid_mesh(n_grid: int, devices=None) -> Mesh:
    """2D (chains, grid) mesh with grid shards contiguous per host.

    ``n_grid`` consecutive same-host devices form each chain row, so the
    per-step halo exchange of grid_sharded.py rides ICI; the chains axis
    spans hosts over DCN (no per-step traffic).
    """
    devices = devices if devices is not None else jax.devices()
    ordered = sorted(devices, key=lambda d: (d.process_index, d.id))
    if len(ordered) % n_grid != 0:
        raise ValueError(
            f"{len(ordered)} devices not divisible by grid axis {n_grid}")
    per_host = {}
    for d in ordered:
        per_host.setdefault(d.process_index, []).append(d)
    for p, devs in per_host.items():
        if len(devs) % n_grid != 0:
            raise ValueError(
                f"host {p} has {len(devs)} devices, not divisible by "
                f"n_grid={n_grid}: grid shards would straddle DCN")
    dev = np.asarray(ordered).reshape(len(ordered) // n_grid, n_grid)
    return Mesh(dev, axis_names=("chains", "grid"))
