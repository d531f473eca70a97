"""Device-mesh helpers.

The reference's only production parallelism is a share-nothing
``multiprocessing.Pool`` chain farm (largeScaleChain_multiprocessing.py:75-79).
The TPU-native equivalent is a ``jax.sharding.Mesh`` with a ``chains`` axis
(data-parallel analog: zero communication during sampling) and an optional
``grid`` axis (domain sharding with halo exchange — the SP/CP analog, see
grid_sharded.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def chains_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1D mesh over a ``chains`` axis."""
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("chains",))


def chains_grid_mesh(n_chains_axis: int, n_grid_axis: int, devices=None) -> Mesh:
    """2D mesh (chains, grid) for chain-parallel + domain-sharded runs."""
    devices = devices if devices is not None else jax.devices()
    need = n_chains_axis * n_grid_axis
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    dev = np.asarray(devices[:need]).reshape(n_chains_axis, n_grid_axis)
    return Mesh(dev, axis_names=("chains", "grid"))


def _put(x, sharding: NamedSharding):
    """Place one array under ``sharding``, multi-process aware.

    On a multi-host mesh the sharding is not fully addressable, where
    ``jax.device_put`` refuses host data; ``make_array_from_callback``
    materializes only this process's shards instead (the input must be the
    same full (global) host array on every process — true for problem
    constants, split keys, and checkpoint-reassembled states).
    """
    if sharding.is_fully_addressable:
        return jax.device_put(jax.numpy.asarray(x), sharding)
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        # already a global array: reshard inside XLA (host np round-trips
        # are impossible — the data is not process-local)
        return jax.jit(lambda a: a, out_shardings=sharding)(x)
    if jax.numpy.issubdtype(getattr(x, "dtype", None), jax.dtypes.prng_key):
        # typed PRNG keys have no numpy form: place the raw key words (the
        # trailing key-data dim replicated) and re-wrap
        data = _put(jax.random.key_data(x),
                    NamedSharding(sharding.mesh, P(*sharding.spec, None)))
        # re-wrap with the ORIGINAL key's impl (a bare wrap would silently
        # re-type e.g. rbg keys as the default threefry)
        return jax.random.wrap_key_data(data, impl=jax.random.key_impl(x))
    xnp = np.asarray(x)
    return jax.make_array_from_callback(xnp.shape, sharding,
                                        lambda idx: xnp[idx])


def shard_chains(tree, mesh: Mesh):
    """Place a chain-batched pytree with the leading axis split over ``chains``.

    Scalars / keys with no leading batch axis are replicated.
    """
    n = mesh.shape["chains"]

    def put(x):
        x = jax.numpy.asarray(x)
        if x.ndim >= 1 and x.shape[0] % n == 0 and x.shape[0] > 0:
            spec = P("chains", *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return _put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (the shared problem constants) across the mesh."""
    return jax.tree.map(
        lambda x: _put(x, NamedSharding(mesh, P())), tree)
