"""RNG helpers.

The reference carries explicit NumPy Generators and serializes
``bit_generator.state`` to disk for resume
(largeScaleChain_multiprocessing.py:177-204).  Here the chain key IS the RNG
state: it lives in the chain-state pytree, is split functionally per
iteration, and checkpointing the state checkpoints the stream.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def prng_impl():
    """The configured PRNG implementation name, or None for jax's default.

    ``MCMC_TPU_PRNG_IMPL=rbg`` selects the counter-based XLA
    RngBitGenerator — the Philox-class generator the torch reference
    effectively uses on GPU (cuRAND) — measured +8.8% CRF / +5.3% SGS
    aggregate step throughput on the v5e-1 bench device, where threefry
    keying alone is ~24% of the CRF step (NOTES_ROUND5 §3/§3b);
    acceptance statistics are unchanged.  The impl rides with the TYPED
    keys ``as_key`` creates, so no global jax config is touched.
    Checkpoints store raw key data; resuming a run made under a
    different impl fails loudly on the key-data shape (threefry (2,) vs
    rbg (4,)) — keep the env stable across a resumed run.
    """
    return os.environ.get("MCMC_TPU_PRNG_IMPL") or None


def as_key(seed):
    """Coerce an int seed / key / None into a jax PRNG key."""
    if seed is None:
        seed = int(np.random.SeedSequence().generate_state(1)[0])
    if isinstance(seed, (int, np.integer)):
        impl = prng_impl()
        return (jax.random.key(int(seed), impl=impl) if impl
                else jax.random.key(int(seed)))
    arr = jnp.asarray(seed)
    if jnp.issubdtype(arr.dtype, jax.dtypes.prng_key):
        return arr
    raise ValueError("Seed should be an integer, a jax PRNG key, or None")


def wrap_key_data(data):
    """Typed key from raw key data, honoring MCMC_TPU_PRNG_IMPL (the
    checkpoint-restore twin of ``as_key``)."""
    impl = prng_impl()
    data = jnp.asarray(data)
    return (jax.random.wrap_key_data(data, impl=impl) if impl
            else jax.random.wrap_key_data(data))


def split_for_chains(seed, n_chains: int):
    """One independent key per chain (replaces the reference's 200_seeds.txt list)."""
    return jax.random.split(as_key(seed), n_chains)


def keys_from_seed_list(seeds):
    """Exact analog of the reference's per-chain integer seed list."""
    return jnp.stack([as_key(int(s)) for s in seeds])
