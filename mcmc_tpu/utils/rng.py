"""RNG helpers.

The reference carries explicit NumPy Generators and serializes
``bit_generator.state`` to disk for resume
(largeScaleChain_multiprocessing.py:177-204).  Here the chain key IS the RNG
state: it lives in the chain-state pytree, is split functionally per
iteration, and checkpointing the state checkpoints the stream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def as_key(seed):
    """Coerce an int seed / key / None into a jax PRNG key."""
    if seed is None:
        seed = int(np.random.SeedSequence().generate_state(1)[0])
    if isinstance(seed, (int, np.integer)):
        return jax.random.key(int(seed))
    arr = jnp.asarray(seed)
    if jnp.issubdtype(arr.dtype, jax.dtypes.prng_key):
        return arr
    raise ValueError("Seed should be an integer, a jax PRNG key, or None")


def split_for_chains(seed, n_chains: int):
    """One independent key per chain (replaces the reference's 200_seeds.txt list)."""
    return jax.random.split(as_key(seed), n_chains)


def keys_from_seed_list(seeds):
    """Exact analog of the reference's per-chain integer seed list."""
    return jnp.stack([as_key(int(s)) for s in seeds])
