"""Chain-farm drivers: the reference's orchestration layer, TPU-native.

Workflow parity with the reference driver scripts
(reference: largeScaleChain_multiprocessing.py:19-240 ``largeScaleChain_mp``
+ ``lsc_run_wrapper``; :243-449 / smallScaleChain_multiprocessing.py
``smallScaleChain_mp`` + ``msc_run_wrapper``): multiple chains with
per-chain seeds and initial beds, per-run checkpoint/resume, segment
batching, and per-chain result tuples — but as one JAX program on a chain
batch axis instead of a multiprocessing pool, and one atomic checkpoint
instead of the per-seed file zoo (bed_{N}k.npy / results_{N}k.npz /
current_iter.txt / RNG-state JSONs).

The nested output layout of the reference
(``LargeScaleChain/<lsc_seed>/SmallScaleChain/<ssc_seed>/``) maps to
``<output_path>/LargeScaleChain`` and
``<output_path>/LargeScaleChain/<tag>/SmallScaleChain`` run directories.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from .io.checkpoint import run_with_checkpointing
from .parallel.sampler import MultiChainSampler

def _pod_one_writer(quiet: bool, progress: bool):
    """Silence the completion banner on every process but 0 (pod runs).

    All processes compute identical results, so an ungated banner would
    print P duplicate streams into a combined pod log — console output
    belongs at the same one-writer boundary as the file outputs (cli.run /
    checkpoint history segments).  ``progress`` is deliberately NOT forced
    off here: sampler.run's per-segment progress fetches are collectives
    on a multi-process mesh and must execute on EVERY process (a
    process-divergent `progress` flag would deadlock); run() itself emits
    the progress text only from process 0.
    """
    import jax

    if jax.process_index() != 0:
        return True, progress
    return quiet, progress


_DONE_ART = r"""
           _
      o   (_)   TPU chain farm complete
   ~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~
"""


def _unpack_per_chain(states, hist, sampler):
    """Per-chain result tuples in the reference's ordering
    (beds, loss_mc, loss_data, loss, steps, resampled_times, blocks_used).

    State fetches go through _host_np: on a multi-process (pod) run the
    chain batch spans devices this process cannot address, so it is
    allgathered — every process returns the identical global results."""
    from .parallel.sampler import _host_np

    if sampler.is_sgs:
        trend = _host_np(sampler.consts.trend)
        beds = _host_np(states.bed) + trend
    else:
        beds = sampler.unpad(_host_np(states.bed))
    # the resampled-count plane is a grid array too — slice it back to
    # the true domain alongside the beds (identity when not auto-padded)
    resampled = sampler.unpad(_host_np(states.resampled))
    out = []
    for i in range(sampler.n_chains):
        out.append((beds[i], hist["loss_mc"][i], hist["loss_data"][i],
                    hist["loss"][i], hist["step"][i], resampled[i],
                    hist["block"][i]))
    return out


def large_scale_chain_farm(chain, n_chains: int, initial_beds=None,
                           rng_seeds: Optional[Sequence[int]] = None,
                           n_iter: int = 5000,
                           output_path="./Data/output",
                           segment_size: int = 2000,
                           checkpoint_every: Optional[int] = None,
                           progress: bool = True, quiet: bool = False,
                           async_checkpoints: bool = False):
    """Run (or resume) a farm of large-scale chains.

    chain: a configured ChainCRF prototype (the reference ships prototype
    ``__dict__`` snapshots to workers; here its compiled config is shared).
    initial_beds: one bed per chain / one to broadcast / None.
    rng_seeds: per-chain seed list (the reference's 200_seeds.txt) or an int
    master seed / None.
    Returns a list of per-chain result tuples (reference return layout).
    """
    tic = time.time()
    quiet, progress = _pod_one_writer(quiet, progress)
    sampler = MultiChainSampler(chain, n_chains=n_chains)
    ckpt_dir = Path(output_path) / "LargeScaleChain"
    states, hist, cum = run_with_checkpointing(
        sampler, n_iter, ckpt_dir, seeds=rng_seeds, initial_beds=initial_beds,
        segment_size=segment_size, progress=progress,
        checkpoint_every=checkpoint_every,
        async_checkpoints=async_checkpoints)
    if not quiet:
        print(_DONE_ART)
        print(f"Completed {cum} iterations x {n_chains} chains "
              f"in {time.time() - tic:.2f} seconds")
    return _unpack_per_chain(states, hist, sampler)


def small_scale_chain_farm(chain, n_chains: int, initial_beds=None,
                           ssc_rng_seeds: Optional[Sequence[int]] = None,
                           lsc_rng_seed: Optional[int] = None,
                           n_iter: int = 1000,
                           output_path="./Data/output",
                           segment_size: int = 500,
                           checkpoint_every: Optional[int] = None,
                           progress: bool = True, quiet: bool = False,
                           async_checkpoints: bool = False):
    """Run (or resume) a farm of small-scale (SGS) chains.

    Mirrors smallScaleChain_mp: ``initial_beds`` typically come from
    large-scale chain checkpoints (the reference reads beds at 5k/10k/...
    iterations, smallScaleChain_multiprocessing.py:576-581); the run
    directory is nested under the parent large-scale chain's tag.
    """
    tic = time.time()
    quiet, progress = _pod_one_writer(quiet, progress)
    sampler = MultiChainSampler(chain, n_chains=n_chains)
    # the FULL parent seed names the run dir.  The reference truncates to
    # the first 6 digits (largeScaleChain_multiprocessing.py:131) but only
    # stores per-seed files there; here the directory carries resume state
    # (run_with_checkpointing ignores seeds/initial_beds when a checkpoint
    # exists), so colliding truncations would silently continue a
    # DIFFERENT parent's chains.
    tag = str(lsc_rng_seed) if lsc_rng_seed is not None else "root"
    ckpt_dir = Path(output_path) / "LargeScaleChain" / tag / "SmallScaleChain"
    states, hist, cum = run_with_checkpointing(
        sampler, n_iter, ckpt_dir, seeds=ssc_rng_seeds,
        initial_beds=initial_beds, segment_size=segment_size,
        progress=progress, checkpoint_every=checkpoint_every,
        async_checkpoints=async_checkpoints)
    if not quiet:
        print(_DONE_ART)
        print(f"Completed {cum} iterations x {n_chains} chains "
              f"in {time.time() - tic:.2f} seconds")
    return _unpack_per_chain(states, hist, sampler)


def iteration_batches(n_iter: int, batch: int = 10_000, tail_batches: int = 9):
    """The reference's segment pattern ``[n - 90k] + [10k]*9`` for n >= 100k
    (largeScaleChain_multiprocessing.py:637-641)."""
    if n_iter < 10 * batch:
        return [n_iter]
    return [n_iter - tail_batches * batch] + [batch] * tail_batches


# reference-name aliases
largeScaleChain_mp = large_scale_chain_farm
smallScaleChain_mp = small_scale_chain_farm


def chain_snapshot(chain) -> dict:
    """Parameter snapshot of a configured chain builder.

    Role of the reference's ``__dict__`` pickling for pool workers
    (largeScaleChain_multiprocessing.py:44-70) and the rebuild helpers
    ``init_lsc_chain_by_instance`` / ``init_msc_chain_by_instance``
    (MCMC.py:359-430).  Everything in the snapshot is plain numpy /
    python, so it pickles/serializes cleanly.
    """
    import copy

    out = {"__class__": type(chain).__name__}
    for k, v in vars(chain).items():
        if k.startswith("_key"):
            continue
        out[k] = copy.deepcopy(v)
    return out


def chain_from_snapshot(snap: dict):
    """Rebuild a chain builder from ``chain_snapshot`` output."""
    from .models.chain_crf import ChainCRF
    from .models.chain_sgs import ChainSGS

    cls = {"ChainCRF": ChainCRF, "ChainSGS": ChainSGS}[snap["__class__"]]
    obj = cls.__new__(cls)
    for k, v in snap.items():
        if k == "__class__":
            continue
        setattr(obj, k, v)
    obj._key = None
    return obj
