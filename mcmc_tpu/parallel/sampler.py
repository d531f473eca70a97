"""Multi-chain sampler: the TPU-native chain farm.

Replaces the reference's ``multiprocessing.Pool`` orchestration
(reference: largeScaleChain_multiprocessing.py:19-98) with a single JAX
program: chains are a ``vmap`` batch axis, devices a ``chains`` mesh axis,
and per-chain NumPy seed lists become split PRNG keys.  Matching the
reference's share-nothing semantics, chains exchange nothing during
sampling; collectives appear only in diagnostics.

Segmented execution mirrors the reference drivers' iteration batches
(``[n-90k] + [10k]*9``, largeScaleChain_multiprocessing.py:637-641):
``run`` loops host-side over compiled fixed-length segments, reporting
progress and invoking an optional checkpoint callback between segments.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.chain_crf import (
    ChainCRF,
    ChainState,
    CRFConsts,
    CRFStatic,
    init_state,
    make_step,
)
from ..utils.rng import keys_from_seed_list, split_for_chains
from .mesh import chains_mesh, replicate, shard_chains


@partial(jax.jit, static_argnums=(0, 3, 4, 5))
def run_chains(static, consts, states, n_steps: int, save_beds: bool = False,
               impl: str = "xla"):
    """Advance a batch of chains ``n_steps`` MH steps under one scan.

    Works for both chain families: ``static`` is a CRFStatic or SGSStatic
    (the matching step factory is selected by type).
    states: batched chain state with a leading chain axis on every leaf.
    impl: "xla" (vmapped portable path) or "fused" (Pallas window kernel,
    CRF on TPU only; numerically identical — tests/test_window_kernel.py).
    Returns (final_states, traces) with traces time-major:
    each trace leaf has shape (n_steps, n_chains, ...).
    """
    from ..models.chain_sgs import SGSStatic, make_sgs_step_batched

    if isinstance(static, SGSStatic):
        # batched step: one fused Pallas CG over the whole chain batch on
        # TPU (vmapped XLA CG elsewhere) — semantics == vmap(make_sgs_step)
        batched = make_sgs_step_batched(static)
    elif impl == "fused":
        from ..models.chain_crf import (FUSED_MAX_CHAINS,
                                        FUSED_SINGLE_LAUNCH_MAX,
                                        fused_chunk_count,
                                        make_batched_step_fused)

        n_chains = jax.tree.leaves(states)[0].shape[0]
        k = fused_chunk_count(n_chains)
        if k == 0:
            raise ValueError(
                f"{n_chains} chains exceeds the fused kernel's "
                f"single-launch bound ({FUSED_SINGLE_LAUNCH_MAX}) with no "
                f"equal split into <=16 launches of <={FUSED_MAX_CHAINS} "
                f"chains; use a chain count divisible into such chunks "
                f"(e.g. a multiple of {FUSED_MAX_CHAINS}) or impl='xla'")
        batched = make_batched_step_fused(static)
        if k > 1:
            return scan_chunked(batched, consts, states, k, n_steps,
                                save_beds=save_beds, is_sgs=False)
    else:
        step = make_step(static)
        batched = jax.vmap(step, in_axes=(None, 0))

    is_sgs = isinstance(static, SGSStatic)

    def body(sts, _):
        sts, tr = batched(consts, sts)
        if save_beds:
            bed = sts.bed + consts.trend if is_sgs else sts.bed
            tr = dict(tr, bed=bed)
        return sts, tr

    return jax.lax.scan(body, states, None, length=n_steps)


def _host_np(x):
    """``np.asarray`` that also works for multi-process global arrays.

    Under a multi-host mesh the chain batch (and hence every trace leaf)
    spans devices this process cannot address; fetching it directly raises.
    Gather it through the cluster instead — every process then holds the
    identical GLOBAL trace, matching the single-process semantics.  On a
    fully-addressable array (the normal single-process path) this is a
    plain zero-copy ``np.asarray``.

    The gather-vs-fetch decision is made from the array's SHARDING (global
    metadata, identical on every process), never from per-process
    addressability: ``is_fully_addressable`` differs across processes when
    a mesh is confined to a subset of hosts, and a per-process branch
    would send the owner down the plain-fetch path while the others enter
    the ``process_allgather`` collective — a cross-process deadlock.
    """
    if isinstance(x, jax.Array) and jax.process_count() > 1:
        owners = {d.process_index for d in x.sharding.device_set}
        if len(owners) > 1:
            # spans processes: EVERY process takes this same collective
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        if owners != {jax.process_index()}:
            # confined to one other process: its owner sees a fully
            # addressable array and will never join a collective, so a
            # gather here would deadlock.  This layout is a construction
            # bug (MultiChainSampler refuses to build such meshes) — fail
            # loudly instead of hanging.
            raise RuntimeError(
                f"array is confined to process(es) {sorted(owners)} but "
                f"this is process {jax.process_index()}; a mesh used in a "
                "multi-process run must span every process (pass an "
                "explicit global mesh, e.g. "
                "parallel.distributed.global_chains_mesh())")
    return np.asarray(x)


def scan_chunked(batched, consts, states, k: int, n_steps: int,
                 save_beds: bool = False, is_sgs: bool = False):
    """Scan a batched step over ``n_steps`` with the chain batch split into
    ``k`` equal chunks that stay SEPARATE scan-carry leaves.

    Purpose: batches above the fused kernel's single-launch compile
    ceiling (chain_crf.FUSED_MAX_CHAINS) run as k sequential launches per
    step.  Keeping the carry chunked is essential — a reshape/lax.map over
    one concatenated state slices + restacks the full multi-GB state every
    step (measured 16 ms/step at 512 chains on v5e-1 vs ~1.5 ms chunked;
    NOTES_ROUND3.md).  Traces (per-chain scalars) are concatenated per
    step — cheap.  Numerics are bitwise identical to a single launch
    (chains are independent; tests/test_window_kernel.py)."""
    C = jax.tree.leaves(states)[0].shape[0]
    if C % k:
        raise ValueError(f"{C} chains not divisible into {k} chunks")
    c = C // k
    chunks = tuple(
        jax.tree.map(lambda x: x[i * c:(i + 1) * c], states)
        for i in range(k))

    def body(sts, _):
        outs = [batched(consts, s) for s in sts]
        new = tuple(o[0] for o in outs)
        tr = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0),
                          *(o[1] for o in outs))
        if save_beds:
            bed = jnp.concatenate([s.bed for s in new], axis=0)
            tr = dict(tr, bed=bed + consts.trend if is_sgs else bed)
        return new, tr

    final_chunks, traces = jax.lax.scan(body, chunks, None, length=n_steps)
    final = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0),
                         *final_chunks)
    return final, traces


@jax.jit
def init_states(initial_beds, keys, consts: CRFConsts) -> ChainState:
    """Vectorized chain initialization (full residual + loss per chain)."""
    return jax.vmap(lambda b, k: init_state(b, k, consts))(initial_beds, keys)


class MultiChainSampler:
    """Chain farm for both chain families (large-scale CRF and small-scale
    SGS chains).

    Equivalent role to ``largeScaleChain_mp`` / ``smallScaleChain_mp`` +
    their run wrappers (reference largeScaleChain_multiprocessing.py:19-449),
    minus the pickling: the prototype chain's configuration is compiled once
    and the batch axis carries per-chain state.
    """

    def __init__(self, chain, n_chains: int, mesh=None,
                 use_mesh: bool = True, impl: str = "auto",
                 auto_pad=True):
        from ..models.chain_sgs import ChainSGS

        if impl not in ("auto", "xla", "fused"):
            # a typo would otherwise silently select the ~6x slower XLA
            # path (only == "auto" is special-cased below)
            raise ValueError(
                f"impl must be 'auto', 'xla', or 'fused'; got {impl!r}")
        self.chain = chain
        self.is_sgs = isinstance(chain, ChainSGS)
        self.n_chains = int(n_chains)
        self._true_hw = tuple(np.asarray(chain.xx).shape)
        self.padded = False
        if mesh is None and use_mesh and len(jax.devices()) > 1:
            n_dev = len(jax.devices())
            usable = max(d for d in range(1, n_dev + 1) if self.n_chains % d == 0)
            if jax.process_count() > 1:
                # On a pod every process MUST appear in the mesh: a mesh
                # covering only some hosts strands the others (no shards
                # to compute) and makes trace fetches divergent-path
                # collectives (see _host_np).  The max-divisor heuristic
                # can silently build such a mesh, so on multi-process runs
                # only the all-devices layout is auto-selected.
                if usable != n_dev:
                    raise ValueError(
                        f"n_chains={self.n_chains} is not divisible by the "
                        f"{n_dev} global devices of this "
                        f"{jax.process_count()}-process run; an auto-mesh "
                        "over a device subset could exclude whole "
                        "processes. Use a chain count divisible by the "
                        "global device count, or pass an explicit mesh "
                        "spanning every process (e.g. "
                        "parallel.distributed.global_chains_mesh()).")
                owners = {d.process_index for d in jax.devices()}
                if owners != set(range(jax.process_count())):
                    raise ValueError(
                        f"jax.devices() covers processes {sorted(owners)} "
                        f"but the cluster has {jax.process_count()}; pass "
                        "an explicit mesh spanning every process")
            mesh = chains_mesh(usable)
        self.mesh = mesh
        self.static, consts = self.chain.build()
        # transparent alignment padding for the fused path (CRF, single
        # device, unaligned grid — e.g. the reference's 900x900 T1 domain):
        # the padded chain samples an equivalent trajectory on the true
        # domain (utils.domain.pad_chain — bitwise on CPU; on TPU the
        # padded shape retiles the loss reduction, so rare borderline MH
        # accepts can flip: ~0.03% of decisions in the verify drive);
        # traces/results are returned unpadded, state arrays stay padded
        # (use ``self.unpad``).
        # auto_pad: True pads when the fused path would otherwise be lost
        # (TPU + impl='auto'); "force" pads whenever the fused geometry
        # check fails (any platform — the test hook); False never pads.
        # Gate on the REAL dispatch predicates, not mere alignment: grids
        # already served by full-dimension windows must not be enlarged,
        # and chain counts the fused path can't chunk anyway gain nothing
        # from padding (they'd run the XLA fallback on a bigger grid).
        pad_fail_reason = None
        if auto_pad and not self.is_sgs and mesh is None:
            from ..models.chain_crf import fused_chunk_count
            from ..ops.window_kernel import fused_path_supported
            from ..utils.domain import pad_chain

            H, W = self._true_hw
            wants = (auto_pad == "force"
                     or (impl == "auto"
                         and jax.devices()[0].platform == "tpu"))
            if (wants
                    and not fused_path_supported(H, W, self.static.rf.B)
                    and fused_chunk_count(self.n_chains) > 0):
                try:
                    self.chain, self._true_hw = pad_chain(chain)
                    self.padded = True
                    self.static, consts = self.chain.build()
                    import warnings

                    Hp, Wp = self.static.H, self.static.W
                    warnings.warn(
                        f"grid {H}x{W} auto-padded to {Hp}x{Wp} for the "
                        "fused kernel (inert pad cells; equivalent "
                        "trajectories on the true domain). Trace beds are "
                        "returned unpadded; raw state arrays are padded — "
                        "slice with sampler.unpad(...).", stacklevel=2)
                except ValueError as e:
                    pad_fail_reason = str(e)
        self.consts = replicate(consts, mesh) if mesh is not None else consts
        if impl == "auto":
            # the fused Pallas path needs a real TPU, a single device (the
            # sharded path partitions the vmapped XLA step instead), and
            # DMA-alignable window geometry
            from ..models.chain_crf import fused_chunk_count
            from ..ops.window_kernel import fused_path_supported

            eligible = (not self.is_sgs
                        and jax.devices()[0].platform == "tpu"
                        and mesh is None)
            geom_ok = eligible and fused_path_supported(
                self.static.H, self.static.W, self.static.rf.B)
            # batches above the preferred launch size run chunked (or as
            # one big launch when no equal split exists); only counts above
            # the single-launch bound with no equal split can't run fused
            chunk_ok = fused_chunk_count(self.n_chains) > 0
            impl = "fused" if eligible and geom_ok and chunk_ok else "xla"
            if eligible and not chunk_ok:
                import warnings

                from ..models.chain_crf import FUSED_MAX_CHAINS

                warnings.warn(
                    f"{self.n_chains} chains exceeds the fused kernel's "
                    "single-launch bound with no equal split into <=16 "
                    f"launches of <={FUSED_MAX_CHAINS} chains; falling "
                    "back to the ~6x slower vmapped XLA step. Use a chain "
                    f"count divisible into <={FUSED_MAX_CHAINS}-chain "
                    "chunks.", stacklevel=2)
            elif eligible and not geom_ok:
                import warnings

                why = (f" (auto-padding not applicable: {pad_fail_reason})"
                       if pad_fail_reason else
                       " Pad the domain with mcmc_tpu.utils.pad_domain to "
                       "enable the fused kernel.")
                warnings.warn(
                    f"grid {self.static.H}x{self.static.W} does not fit "
                    "the fused kernel's aligned-window geometry; falling "
                    "back to the ~6x slower vmapped XLA step."
                    + why, stacklevel=2)
        self.impl = "xla" if self.is_sgs else impl

    # -- state management ---------------------------------------------------

    def unpad(self, a):
        """Slice ``(..., Hp, Wp)`` grid arrays back to the true ``(H, W)``
        domain (identity when no auto-padding occurred, or when ``a`` is
        already true-domain).  Raises on arrays whose trailing dims are
        neither — non-grid traces must not be silently truncated."""
        H, W = self._true_hw
        a = np.asarray(a)
        if a.ndim >= 2 and a.shape[-2:] == (H, W):
            return a
        if (self.padded and a.ndim >= 2
                and a.shape[-2:] == (self.static.H, self.static.W)):
            return a[..., :H, :W]
        raise ValueError(
            f"unpad expects trailing grid dims {(H, W)}"
            + (f" or padded {(self.static.H, self.static.W)}"
               if self.padded else "")
            + f"; got shape {a.shape} — only (..., H, W) grid arrays "
            "(beds, masks, residuals) can be unpadded")

    def init(self, initial_beds=None, seeds=None) -> ChainState:
        """Batched initial states.

        initial_beds: (n_chains, H, W), a single (H, W) bed to broadcast, or
        None for the builder chain's initial bed (reference drivers pass one
        SGS bed per chain, largeScaleChain_multiprocessing.py:602-606).
        seeds: int master seed, list of per-chain ints, or None.
        """
        z0_shared = None  # 2D z-plane to broadcast (SGS transform path)
        if initial_beds is None:
            initial_beds = (self.chain._initial_detrended if self.is_sgs
                            else self.chain.initial_bed)
            if self.is_sgs:
                z0_shared = getattr(self.chain, "_initial_z", None)
        elif self.is_sgs:
            # SGS state lives in detrended (and clamp-roundtripped) space;
            # per-chain full-space beds are preprocessed like the builder's
            initial_beds = self._preprocess_sgs_beds(initial_beds)
        initial_beds = np.asarray(initial_beds, np.float32)
        if self.padded and initial_beds.shape[-2:] == self._true_hw:
            # caller passed true-domain beds; continue them into the pad
            ph = self.static.H - self._true_hw[0]
            pw = self.static.W - self._true_hw[1]
            nd = initial_beds.ndim
            initial_beds = np.pad(
                initial_beds, [(0, 0)] * (nd - 2) + [(0, ph), (0, pw)],
                mode="edge")
        shared_2d = initial_beds.ndim == 2
        if not shared_2d and initial_beds.shape[0] != self.n_chains:
            raise ValueError("initial_beds leading dim must equal n_chains")

        if seeds is None or isinstance(seeds, (int, np.integer)):
            keys = split_for_chains(seeds, self.n_chains)
        else:
            if len(seeds) < self.n_chains:
                raise ValueError("need at least n_chains seeds")
            keys = keys_from_seed_list(seeds[: self.n_chains])
        if self.mesh is not None:
            keys = shard_chains(keys, self.mesh)

        from ..models.chain_sgs import sgs_init_state

        ut = self.is_sgs and bool(self.static.use_transform)
        if shared_2d:
            # every chain shares one bed: ship the 2D planes ONCE and let
            # vmap broadcast on device (a host np.broadcast_to + transfer
            # materializes n_chains identical copies — 268 MB at 256
            # chains on a 512 grid over a tunneled link)
            bed2d = jnp.asarray(initial_beds)
            if self.is_sgs:
                if ut and z0_shared is None:
                    z0_shared = self.chain.host_transform(initial_beds)
                z2d = (jnp.asarray(np.asarray(z0_shared, np.float32))
                       if ut else None)
                states = jax.jit(jax.vmap(
                    lambda k: sgs_init_state(
                        bed2d, k, self.consts, z0=z2d,
                        use_transform=ut)))(keys)
            else:
                states = jax.jit(jax.vmap(
                    lambda k: init_state(bed2d, k, self.consts)))(keys)
        else:
            beds = jnp.asarray(initial_beds)
            if self.mesh is not None:
                beds = shard_chains(beds, self.mesh)
            if self.is_sgs:
                if ut:
                    # z-plane precomputed host-side (exact transform); the
                    # device LUT gather on a full farm grid is memory-hostile
                    z0 = jnp.asarray(self.chain.host_transform(initial_beds))
                    if self.mesh is not None:
                        z0 = shard_chains(z0, self.mesh)
                    states = jax.jit(jax.vmap(
                        lambda b, k, z: sgs_init_state(
                            b, k, self.consts, z0=z, use_transform=True)))(
                                beds, keys, z0)
                else:
                    states = jax.jit(jax.vmap(
                        lambda b, k: sgs_init_state(
                            b, k, self.consts, use_transform=False)))(
                                beds, keys)
            else:
                states = init_states(beds, keys, self.consts)
        if self.mesh is not None:
            states = shard_chains(states, self.mesh)
        return states

    def _preprocess_sgs_beds(self, initial_beds):
        """Per-chain full-space beds through ChainSGS.preprocess_beds —
        the SAME helper build() uses, so farm beds can never drift from
        the builder's initial-bed preprocessing."""
        return self.chain.preprocess_beds(initial_beds)

    # -- execution ----------------------------------------------------------

    def run_segment(self, states: ChainState, n_steps: int, save_beds=False):
        """One compiled segment of ``n_steps`` MH steps; returns
        (states, traces) with traces on the true (unpadded) domain."""
        states, traces = run_chains(self.static, self.consts, states,
                                    int(n_steps), bool(save_beds), self.impl)
        if self.padded and "bed" in traces:
            # trace beds come back on the true domain (device-side slice);
            # state arrays stay padded
            H, W = self._true_hw
            traces = dict(traces, bed=traces["bed"][..., :H, :W])
        return states, traces

    def run(self, states: ChainState, n_iter: int, segment_size: int = 2000,
            progress: bool = True,
            segment_callback: Optional[Callable] = None,
            collect_beds: bool = False, fancy_progress: bool = False,
            profile_dir: Optional[str] = None):
        """Run ``n_iter`` iterations in compiled segments.

        Iteration 0 records the initial state (reference loop semantics);
        ``segment_callback(cumulative_iter, states, traces_np)`` fires after
        each segment (checkpointing hook).  Returns (states, traces) with
        chain-major numpy traces of length n_iter (index 0 = initial).

        collect_beds: additionally record each chain's bed at segment
        boundaries into traces['bed_thin'] (n_chains, n_segments, H, W) —
        the thinned-trace replacement for the reference's memory-prohibitive
        (n_iter, H, W) bed cache (only_save_last_bed, SURVEY.md §5.7).
        fancy_progress: per-chain in-place ANSI progress block (the
        reference's multi-chain renderer) instead of one status line.
        profile_dir: capture a jax.profiler trace of the second segment.
        """
        n_iter = int(n_iter)
        if n_iter < 1:
            raise ValueError("n_iter must be >= 1 (trace row 0 records "
                             "the initial state)")
        # one compiled program for the init row + the per-segment bed
        # materialization — eager jnp ops cost seconds each on the
        # tunneled device (CLAUDE.md), and collect_beds would otherwise
        # pay an eager full-grid add every segment
        if not hasattr(self, "_row_jit"):
            is_sgs = self.is_sgs
            n_chains = self.n_chains

            def _full_bed(consts_, states_):
                return states_.bed + consts_.trend if is_sgs else states_.bed

            def _init_row(consts_, states_):
                loss_data0 = (states_.loss_data
                              if hasattr(states_, "loss_data")
                              else jnp.zeros_like(states_.loss_mc))
                samples = jax.vmap(
                    lambda b: b[consts_.sample_ij[:, 0],
                                consts_.sample_ij[:, 1]]
                )(_full_bed(consts_, states_))
                return {
                    "loss_mc": states_.loss_mc,
                    "loss_data": loss_data0,
                    "loss": states_.loss_mc + loss_data0,
                    "step": jnp.zeros(n_chains, bool),
                    "block": jnp.full((n_chains, 4), jnp.nan, jnp.float32),
                    "samples": samples,
                }

            self._row_jit = jax.jit(_init_row)
            self._full_bed_jit = jax.jit(_full_bed)
        init_row = self._row_jit(self.consts, states)
        init_np = jax.tree.map(lambda x: _host_np(x)[None], init_row)

        collected = []
        bed_snaps = []
        # pod one-writer boundary for the progress TEXT only: the fetches
        # below are collectives on multi-process meshes, so `progress`
        # must be process-identical and every process must execute the
        # same _host_np calls — only the emission is process-0-gated
        emit = jax.process_index() == 0
        renderer = None
        if fancy_progress and progress and emit:
            from ..utils.progress import MultiChainProgress

            renderer = MultiChainProgress(self.n_chains, n_iter)
        remaining = n_iter - 1
        done = 1
        first = True
        seg_index = 0
        t0 = time.time()
        while remaining > 0 or first:
            n = min(segment_size, remaining)
            if n > 0:
                profiling = profile_dir is not None and seg_index == 1
                if profiling:
                    jax.profiler.start_trace(profile_dir)
                states, traces = self.run_segment(states, n)
                traces_np = jax.tree.map(_host_np, traces)
                if profiling:
                    jax.profiler.stop_trace()
            else:
                traces_np = jax.tree.map(lambda x: x[:0], init_np)
            if first:
                # the initial-state row travels with the first segment so
                # callbacks see every trace row exactly once
                traces_np = jax.tree.map(
                    lambda head, tail: np.concatenate([head, tail], axis=0),
                    init_np, traces_np)
                first = False
            collected.append(traces_np)
            if collect_beds:
                bed = self._full_bed_jit(self.consts, states)
                bed_snaps.append(self.unpad(_host_np(bed)))
            remaining -= n
            done += n
            seg_index += 1
            if progress:
                # every process takes these (possibly collective) fetches;
                # only process 0 renders/prints
                loss_np = _host_np(states.loss_mc)
                acc_np = _host_np(states.accepted) / max(done - 1, 1)
                if renderer is not None:
                    renderer.update(done, loss_np, acc_np)
                elif emit:
                    dt = time.time() - t0
                    rate = (done - 1) * self.n_chains / max(dt, 1e-9)
                    print(f"[sampler] iter {done}/{n_iter} | "
                          f"{rate:,.0f} chain-it/s | "
                          f"loss mean {loss_np.mean():.4e} | "
                          f"acc {acc_np.mean():.3f}",
                          flush=True)
            if segment_callback is not None:
                segment_callback(done, states, traces_np)

        traces = {}
        for k in collected[0]:
            cat = np.concatenate([c[k] for c in collected], axis=0)
            traces[k] = np.moveaxis(cat, 0, 1)  # chain-major
        if collect_beds and bed_snaps:
            traces["bed_thin"] = np.stack(bed_snaps, axis=1)
        return states, traces

    # -- diagnostics --------------------------------------------------------

    def diagnostics(self, traces, elapsed_seconds=None):
        """Convergence summary: acceptance, split R-hat, ESS (+ ESS/sec and
        chain-it/sec when ``elapsed_seconds`` is given — the §5.1 throughput
        metrics the reference only displays transiently)."""
        from . import diagnostics as diag

        out = {"acceptance_rate": np.asarray(traces["step"], np.float32).mean(axis=1)}
        if traces["samples"].shape[-1] > 0:
            samp = jnp.asarray(traces["samples"])
            out["rhat"] = np.asarray(diag.split_rhat(samp))
            out["ess"] = np.asarray(diag.ess(samp))
            out["rhat_rank"] = np.asarray(diag.rank_normalized_rhat(samp))
            out["ess_bulk"] = np.asarray(diag.ess_bulk(samp))
            out["ess_tail"] = np.asarray(diag.ess_tail(samp))
        loss_tr = jnp.asarray(traces["loss"])
        out["rhat_loss"] = float(diag.split_rhat(loss_tr))
        out["ess_loss"] = float(np.asarray(diag.ess(loss_tr)))
        out["rhat_rank_loss"] = float(
            np.asarray(diag.rank_normalized_rhat(loss_tr)))
        if elapsed_seconds:
            n_iter = traces["loss"].shape[1]
            out["chain_iters_per_sec"] = n_iter * self.n_chains / elapsed_seconds
            out["ess_per_sec"] = out["ess_loss"] / elapsed_seconds
            if "ess" in out:
                out["ess_per_sec_probes"] = np.asarray(out["ess"]) / elapsed_seconds
        return out
