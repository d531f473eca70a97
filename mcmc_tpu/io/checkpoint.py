"""Checkpoint / resume for chain farms.

TPU-native equivalent of the reference's most developed subsystem
(reference: largeScaleChain_multiprocessing.py:100-240): per-run artifacts
``bed_{N}k.npy`` + ``results_{N}k.npz`` + ``current_iter.txt`` + two
RNG-state JSON files become ONE atomic ``checkpoint_{N}.npz`` holding the
full batched chain state — beds, patched residuals, Kahan loss accumulators,
resample counters, and the PRNG keys (the key IS the RNG state, so resumed
chains continue the exact random stream, matching the reference's
``bit_generator.state`` round-trip at :177-204).

Write protocol mirrors the reference: new files are written (atomically via
tmp + rename) before superseded ones are deleted (:233-236).

Multi-host (pod) layout — SURVEY.md §5.4's "single sharded checkpoint
(orbax-style)": when ``jax.process_count() > 1`` (or ``sharded=True`` is
forced), ``save`` writes ONE FILE PER PROCESS,
``checkpoint_{N}.proc{k}of{P}.npz``, each holding only that process's
addressable shards of the global state (no host gather, no cross-DCN
traffic), plus an empty ``checkpoint_{N}.ok`` completion marker written by
process 0 after a global barrier — a sharded checkpoint is visible to
``load``/``latest_iter`` only once the marker exists, so a crash mid-save
can never yield a half-readable checkpoint.  A re-save at an existing
iteration (e.g. a post-crash restart with a different process count)
first retracts the old set — marker, then stale shard files — so a stale
layout can never shadow or mix with the new one.  ``load`` reassembles the full
arrays from all shard files (shared filesystem assumed, as on TPU pods);
replicated shards (e.g. over a ``grid`` mesh axis) are deduplicated by
their global index.

Async writes (``CheckpointManager(..., async_write=True)``): the state is
snapshotted to host synchronously, then compression + atomic write +
publish + superseded-file cleanup run on one background worker thread —
the sampler's next segment overlaps the checkpoint IO.  Ordering is
preserved (single worker, submission order); readers flush the queue
first; ``flush()`` re-raises the first write failure.  The sharded
multi-process path stays synchronous (its barriers must sit at the same
point of every process's program order).
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
import tempfile
from pathlib import Path
from typing import Optional

import numpy as np

import jax

from ..models.chain_crf import ChainState

def _atomic_npz(directory: Path, target: Path, payload: dict):
    """Write ``payload`` as a compressed npz at ``target`` atomically:
    tmp file in the same directory, fsync, rename (published name never
    holds partial data, even across a crash)."""
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as fh:
            np.savez_compressed(fh, **payload)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, target)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return target


_CKPT_RE = re.compile(r"checkpoint_(\d+)\.npz$")
_HIST_RE = re.compile(r"hist_(\d+)_(\d+)\.npz$")
_SHARD_RE = re.compile(r"checkpoint_(\d+)\.proc(\d+)of(\d+)\.npz$")
_MARKER_RE = re.compile(r"checkpoint_(\d+)\.ok$")


def _state_classes():
    from ..models.chain_sgs import SGSState

    return {"ChainState": ChainState, "SGSState": SGSState}


def _state_to_arrays(states) -> dict:
    d = {f.name: np.asarray(getattr(states, f.name))
         for f in dataclasses.fields(type(states)) if f.name != "key"}
    d["key_data"] = np.asarray(jax.random.key_data(states.key))
    return d


def _arrays_to_state(d: dict, cls_name: str = "ChainState"):
    import jax.numpy as jnp

    cls = _state_classes()[cls_name]
    if cls_name == "SGSState" and np.asarray(d["fields"]).shape[-3] == 3:
        raise ValueError(
            "this SGS checkpoint predates the 4-plane state (no cached "
            "normal-score z-plane) and cannot be resumed: the z-plane "
            "cannot be reconstructed without the fitted transform. Restart "
            "the run, or rebuild the state from the checkpointed bed plane "
            "via MultiChainSampler.init(initial_beds=bed + trend).")
    # impl-aware wrap (utils.rng): a checkpoint written under
    # MCMC_TPU_PRNG_IMPL=rbg has (..., 4) key data and must be restored
    # under the same env (shape mismatch fails loudly here)
    from ..utils.rng import wrap_key_data

    key = wrap_key_data(jnp.asarray(d["key_data"]))
    kwargs = {k: jnp.asarray(v) for k, v in d.items() if k != "key_data"}
    return cls(key=key, **kwargs)


def _unique_addressable_shards(x):
    """This process's addressable shards of a global array, deduplicated
    (a shard replicated over another mesh axis appears once).  Yields
    ``(bounds, data)`` with bounds an (ndim, 2) int64 array of [start, stop)
    per dim."""
    shape = x.shape
    seen = set()
    out = []
    for sh in x.addressable_shards:
        bounds = tuple(
            (0 if s.start is None else int(s.start),
             shape[d] if s.stop is None else int(s.stop))
            for d, s in enumerate(sh.index))
        if bounds in seen:
            continue
        seen.add(bounds)
        out.append((np.asarray(bounds, np.int64).reshape(len(shape), 2),
                    np.asarray(sh.data)))
    return out


class CheckpointManager:
    """Single-directory checkpoint store with resume.

    Histories (per-iteration traces accumulated across segments, the
    reference's results npz concatenation at :206-231) are stored alongside
    the state under ``hist_`` prefixes.

    Single-process saves write one ``checkpoint_{N}.npz``; multi-process
    saves (auto-detected, or forced with ``sharded=True``) write per-process
    shard files + a completion marker (module docstring).
    """

    def __init__(self, directory, keep: int = 1, async_write: bool = False):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.keep = int(keep)
        # async_write=True: single-file saves and history appends snapshot
        # the state to host synchronously (donation-safe) but compress,
        # write, publish, and clean up on ONE background worker thread, so
        # the sampler keeps stepping during checkpoint IO.  Writes publish
        # in submission order; readers (load/latest_iter/load_history)
        # flush the queue first.  Sharded multi-process saves stay
        # synchronous: their correctness rests on cross-process barriers
        # at fixed points of every process's program order.
        self.async_write = bool(async_write)
        self._executor = None
        self._pending = []
        # poison marker: once any queued write fails, LATER queued writes
        # are skipped (not executed) until flush() surfaces the failure.
        # Without it a failed history-segment write followed by a
        # succeeding state save would publish a checkpoint whose preceding
        # trace rows never landed — a silent permanent hole in resumed
        # histories (prune_history only removes segments AHEAD of the
        # state, never detects ones missing behind it).
        self._write_failed = None

    # -- async write machinery ----------------------------------------------

    def _submit(self, fn):
        from concurrent.futures import ThreadPoolExecutor

        if self._executor is None:
            self._executor = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="mcmc_tpu-ckpt")
        # fail fast: a write that already failed surfaces at the NEXT
        # submit (not only at the end-of-run flush), so a dead disk does
        # not silently discard every later checkpoint of a long run
        for f in self._pending:
            if f.done() and f.exception() is not None:
                self.flush()  # drains the queue and raises that failure
        # prune completed writes so the list (and the scan above) stays O(1)
        self._pending = [f for f in self._pending if not f.done()]

        def _guarded():
            if self._write_failed is not None:
                return  # queue poisoned: never write past a failure
            try:
                fn()
            except BaseException as e:
                self._write_failed = e
                raise

        # backpressure: at most one write in flight + one queued.  Each
        # queued task pins a full host state snapshot; a disk slower than
        # segment compute must block the sampler, not grow the queue (and
        # host RAM) without bound.
        while len(self._pending) >= 2:
            if self._pending[0].exception() is not None:  # blocks until done
                # route through flush(): drains the (poison-skipped) rest,
                # clears the poison so the manager stays usable, raises the
                # first failure
                self.flush()
            self._pending.pop(0)
        self._pending.append(self._executor.submit(_guarded))

    def flush(self):
        """Block until queued async writes are durable; re-raise the first
        write failure (so a failed checkpoint cannot pass silently).  The
        manager stays usable afterwards (the failure poison is cleared).
        No-op in synchronous mode."""
        pending, self._pending = self._pending, []
        err = None
        for f in pending:
            try:
                f.result()
            except Exception as e:  # surface the FIRST failure, drain all
                if err is None:
                    err = e
        self._write_failed = None
        if err is not None:
            raise err

    # -- discovery ----------------------------------------------------------

    def _checkpoints(self):
        """Sorted [(iter, kind, paths)] of COMPLETE checkpoints: single
        files, plus sharded sets whose ``.ok`` marker exists and whose
        shard files are all present (a sharded set beats a same-iter
        single file)."""
        singles = {}
        shards: dict = {}
        markers = set()
        for p in self.dir.iterdir():
            m = _CKPT_RE.search(p.name)
            if m:
                singles[int(m.group(1))] = p
                continue
            m = _SHARD_RE.search(p.name)
            if m:
                it, k, nproc = (int(g) for g in m.groups())
                shards.setdefault(it, {}).setdefault(nproc, {})[k] = p
                continue
            m = _MARKER_RE.search(p.name)
            if m:
                markers.add(int(m.group(1)))
        out = {it: ("single", [p]) for it, p in singles.items()}
        cur_nproc = jax.process_count()
        for it in markers:
            layouts = shards.get(it, {})
            # deterministic choice if stale sets coexist (shouldn't happen —
            # saves retract same-iter leftovers — but never pick arbitrarily):
            # prefer the current process count, then the largest set
            for nproc in sorted(layouts, key=lambda n: (n != cur_nproc, -n)):
                files = layouts[nproc]
                if len(files) == nproc:
                    out[it] = ("sharded", [files[k] for k in sorted(files)])
                    break
        return sorted((it, kind, paths) for it, (kind, paths) in out.items())

    def latest_iter(self) -> Optional[int]:
        """Cumulative iteration of the newest complete checkpoint, or None."""
        self.flush()
        cps = self._checkpoints()
        return cps[-1][0] if cps else None

    def manifest(self) -> dict:
        """Inspect the run directory without loading any state.

        The eyeball-readable counterpart of the reference's per-run file
        zoo (``current_iter.txt`` / ``bed_{N}k.npy`` /
        ``results_{N}k.npz``, largeScaleChain_multiprocessing.py:154-176)
        for this layout's opaque npz checkpoints.  Returns::

            {"checkpoints": [{"iter", "layout", "files", "bytes",
                              "mtime"}, ...],          # oldest -> newest
             "history_spans": [(start_row, end_row), ...]}  # trace files

        Only COMPLETE checkpoints are listed (same completeness rules as
        ``load``: sharded sets need their ``.ok`` marker and every shard).
        """
        self.flush()
        cps = [{
            "iter": it,
            "layout": kind,
            "files": [p.name for p in paths],
            "bytes": sum(p.stat().st_size for p in paths),
            "mtime": max(p.stat().st_mtime for p in paths),
        } for it, kind, paths in self._checkpoints()]
        spans = []
        for p in self.dir.iterdir():
            m = _HIST_RE.search(p.name)
            if m:
                spans.append((int(m.group(1)), int(m.group(2))))
        return {"checkpoints": cps, "history_spans": sorted(spans)}

    def _delete_iter_files(self, it: int):
        """Remove every artifact of checkpoint ``it`` this process is
        responsible for (marker first, so readers never see a complete-
        looking set go partial)."""
        marker = self.dir / f"checkpoint_{it}.ok"
        if marker.exists():
            marker.unlink()
        for p in list(self.dir.iterdir()):
            m = _CKPT_RE.search(p.name) or _SHARD_RE.search(p.name)
            if m and int(m.group(1)) == it:
                p.unlink(missing_ok=True)

    # -- save / load --------------------------------------------------------

    def save(self, cumulative_iter: int, states: ChainState,
             histories: Optional[dict] = None, meta: Optional[dict] = None,
             *, sharded: Optional[bool] = None):
        """Write a checkpoint.  ``sharded=None`` auto-selects: per-process
        shard files when ``jax.process_count() > 1`` (no host gather),
        single npz otherwise.

        Returns the target path.  In async mode the write is queued: the
        path is guaranteed to exist (or the failure to raise) only after
        ``flush()`` — until then it may be absent or still hold a
        superseded same-iteration file."""
        if sharded is None:
            sharded = jax.process_count() > 1
        if sharded:
            # ordering: any queued single-file writes must land before a
            # (synchronous, barrier-ordered) sharded save
            self.flush()
            return self._save_sharded(cumulative_iter, states, histories,
                                      meta)
        # host snapshot is synchronous even in async mode: it pins this
        # iteration's values regardless of later donation/deletion of the
        # device buffers
        arrays = _state_to_arrays(states)
        payload = {f"state_{k}": v for k, v in arrays.items()}
        if histories:
            for k, v in histories.items():
                payload[f"hist_{k}"] = np.asarray(v)
        payload["meta_json"] = np.frombuffer(
            json.dumps({"cumulative_iter": int(cumulative_iter),
                        "state_class": type(states).__name__,
                        **(meta or {})}).encode(), dtype=np.uint8)
        it = int(cumulative_iter)
        target = self.dir / f"checkpoint_{it}.npz"

        def _write():
            old = self._checkpoints()
            # retract any stale sharded set at this iteration BEFORE the new
            # single file becomes visible (sharded beats single in discovery,
            # so a crash or concurrent reader in a publish-then-retract window
            # would resolve to the stale sharded state and silently shadow the
            # fresh file; _save_sharded orders retract-before-write too).
            # Marker first, so the stale set never looks complete mid-delete.
            (self.dir / f"checkpoint_{it}.ok").unlink(missing_ok=True)
            for p in list(self.dir.iterdir()):
                m = _SHARD_RE.search(p.name)
                if m and int(m.group(1)) == it:
                    p.unlink(missing_ok=True)
            _atomic_npz(self.dir, target, payload)
            # delete superseded checkpoints only after the new one is durable
            for old_it, _kind, _paths in old[: max(0, len(old)
                                                   - (self.keep - 1))]:
                if old_it != it:
                    self._delete_iter_files(old_it)

        if self.async_write:
            self._submit(_write)
        else:
            _write()
        return target

    def _save_sharded(self, cumulative_iter: int, states,
                      histories: Optional[dict], meta: Optional[dict]):
        """Per-process shard save: each process writes only its addressable
        shards (no gather), then process 0 publishes the completion marker
        after a global barrier.  Requires a filesystem shared by all
        processes (TPU pods); histories/meta ride in process 0's file."""
        import jax.numpy as jnp
        from jax.experimental import multihost_utils

        it = int(cumulative_iter)
        pid, nproc = jax.process_index(), jax.process_count()
        arrays = {f.name: getattr(states, f.name)
                  for f in dataclasses.fields(type(states))
                  if f.name != "key"}
        arrays["key_data"] = jax.random.key_data(states.key)
        payload = {}
        for name, x in arrays.items():
            x = x if isinstance(x, jax.Array) else jnp.asarray(x)
            payload[f"shape__{name}"] = np.asarray(x.shape, np.int64)
            for j, (bounds, data) in enumerate(_unique_addressable_shards(x)):
                payload[f"shard__{name}__{j}"] = data
                payload[f"idx__{name}__{j}"] = bounds
        if pid == 0:
            if histories:
                for k, v in histories.items():
                    payload[f"hist_{k}"] = np.asarray(v)
            payload["meta_json"] = np.frombuffer(
                json.dumps({"cumulative_iter": it,
                            "state_class": type(states).__name__,
                            **(meta or {})}).encode(), dtype=np.uint8)

        old = self._checkpoints()
        # retract any pre-existing set at this iteration before writing: a
        # re-save (e.g. restart with a different process count after a
        # crash) must never leave a stale-but-complete-looking set under
        # the shared marker, and readers must not see a mix of old and new
        # shard files as one set.  Marker goes first.
        if pid == 0:
            (self.dir / f"checkpoint_{it}.ok").unlink(missing_ok=True)
            for p in list(self.dir.iterdir()):
                m = _SHARD_RE.search(p.name)
                if m and int(m.group(1)) == it and int(m.group(3)) != nproc:
                    p.unlink(missing_ok=True)
                    continue
                m = _CKPT_RE.search(p.name)
                if m and int(m.group(1)) == it:
                    p.unlink(missing_ok=True)
        multihost_utils.sync_global_devices(f"mcmc_tpu_ckpt_{it}_retracted")
        target = _atomic_npz(
            self.dir, self.dir / f"checkpoint_{it}.proc{pid}of{nproc}.npz",
            payload)
        # all shard files durable before the marker makes the set visible
        multihost_utils.sync_global_devices(f"mcmc_tpu_ckpt_{it}_written")
        if pid == 0:
            marker_tmp = self.dir / f".ok_{it}.tmp"
            marker_tmp.touch()
            os.replace(marker_tmp, self.dir / f"checkpoint_{it}.ok")
        multihost_utils.sync_global_devices(f"mcmc_tpu_ckpt_{it}_marked")
        if pid == 0:
            # superseded checkpoints deleted only once the new set is live
            for old_it, _kind, _paths in old[: max(0, len(old)
                                                   - (self.keep - 1))]:
                if old_it != it:
                    self._delete_iter_files(old_it)
        return target

    # -- incremental histories (each file holds only its segment's rows, so
    # -- a long run writes each row once instead of rewriting the full
    # -- history at every checkpoint) ---------------------------------------

    def append_history(self, start_row: int, end_row: int, rows: dict):
        """Write one incremental ``hist_{a}_{b}.npz`` trace segment (the
        reference's concat-with-previous results protocol,
        largeScaleChain_multiprocessing.py:206-231, without rewriting the
        full history each save).  In async mode the returned path is valid
        only after ``flush()`` (see ``save``)."""
        if end_row <= start_row:
            return None
        if jax.process_count() > 1 and jax.process_index() != 0:
            # traces are replicated diagnostics (every process holds the
            # identical global rows after the sampler's allgather): only
            # process 0 writes, so P processes don't race identical bytes
            # into the same shared-filesystem path
            return None
        rows_np = {k: np.asarray(v) for k, v in rows.items()}
        target = self.dir / f"hist_{int(start_row)}_{int(end_row)}.npz"

        def _write():
            _atomic_npz(self.dir, target, rows_np)

        if self.async_write:
            self._submit(_write)
        else:
            _write()
        return target

    def prune_history(self, from_row: int):
        """Delete history segments at/after ``from_row`` — called on
        resume: a crash between a history append and its state save
        leaves a stale segment AHEAD of the checkpoint; the resumed run
        re-records those rows into a new segment, and without pruning a
        later ``load_history()`` would concatenate both (duplicated rows,
        truncated tail).  Segments always start exactly at a state-save
        boundary (append_history runs inside the same flush), so
        ``start >= from_row`` identifies exactly the crash-window ones."""
        self.flush()
        for p in list(self.dir.iterdir()):
            m = _HIST_RE.search(p.name)
            if m and int(m.group(1)) >= int(from_row):
                p.unlink(missing_ok=True)

    def load_history(self, upto: Optional[int] = None):
        """Concatenate history segment files (chain-major axis=1), truncated
        to ``upto`` rows (a crash between a history append and the state
        save can leave a trailing partial segment)."""
        self.flush()
        segs = []
        for p in self.dir.iterdir():
            m = _HIST_RE.search(p.name)
            if m:
                segs.append((int(m.group(1)), int(m.group(2)), p))
        if not segs:
            return {}
        segs.sort()
        parts = []
        for start, end, p in segs:
            if upto is not None and start >= upto:
                continue
            with np.load(p) as z:
                parts.append({k: z[k] for k in z.files})
        if not parts:
            return {}
        out = {k: np.concatenate([s[k] for s in parts], axis=1)
               for k in parts[0]}
        if upto is not None:
            out = {k: v[:, :upto] for k, v in out.items()}
        return out

    @staticmethod
    def _read_sharded(paths):
        """Reassemble full state arrays from per-process shard files.
        Overlapping (replicated) shards are identical by construction, so
        later writes simply overwrite."""
        state_arrays: dict = {}
        histories: dict = {}
        meta = None
        filled: dict = {}
        for path in paths:
            with np.load(path) as z:
                if "meta_json" in z.files:
                    meta = json.loads(bytes(z["meta_json"]).decode())
                for k in z.files:
                    if k.startswith("hist_"):
                        histories[k[len("hist_"):]] = z[k]
                    elif k.startswith("shape__"):
                        name = k[len("shape__"):]
                        filled.setdefault(name, {})["shape"] = tuple(
                            int(v) for v in z[k])
                    elif k.startswith("shard__"):
                        name, j = k[len("shard__"):].rsplit("__", 1)
                        bounds = z[f"idx__{name}__{j}"]
                        filled.setdefault(name, {}).setdefault(
                            "shards", []).append((bounds, z[k]))
        if meta is None:
            raise FileNotFoundError(
                "sharded checkpoint has no meta_json (process-0 file "
                "missing?)")
        for name, info in filled.items():
            shards = info.get("shards", [])
            if not shards:
                raise ValueError(f"no shards found for state field {name}")
            full = np.empty(info["shape"], dtype=shards[0][1].dtype)
            covered = 0
            seen_bounds = set()
            for bounds, data in shards:
                key = tuple(map(tuple, np.asarray(bounds)))
                sl = tuple(slice(int(a), int(b)) for a, b in bounds)
                full[sl] = data
                if key not in seen_bounds:  # replicas recount nothing:
                    seen_bounds.add(key)    # unique GSPMD blocks are disjoint
                    covered += data.size
            if covered < full.size:
                raise ValueError(
                    f"state field {name}: shard files cover {covered} of "
                    f"{full.size} elements (missing process file?)")
            state_arrays[name] = full
        return state_arrays, histories, meta

    def load(self, cumulative_iter: Optional[int] = None):
        """Returns (cumulative_iter, states, histories, meta) or None."""
        self.flush()
        cps = self._checkpoints()
        if not cps:
            return None
        if cumulative_iter is None:
            cumulative_iter, kind, paths = cps[-1]
        else:
            match = [(k, p) for it, k, p in cps if it == cumulative_iter]
            if not match:
                raise FileNotFoundError(
                    f"no checkpoint at iter {cumulative_iter} in {self.dir}")
            kind, paths = match[0]
        if kind == "sharded":
            state_arrays, histories, meta = self._read_sharded(paths)
        else:
            with np.load(paths[0]) as z:
                meta = json.loads(bytes(z["meta_json"]).decode())
                state_arrays = {k[len("state_"):]: z[k] for k in z.files
                                if k.startswith("state_")}
                histories = {k[len("hist_"):]: z[k] for k in z.files
                             if k.startswith("hist_")}
        states = _arrays_to_state(state_arrays,
                                  meta.pop("state_class", "ChainState"))
        cum = meta.pop("cumulative_iter")
        if not histories:
            # histories normally live in incremental hist_{a}_{b}.npz
            # segment files, not inline in the state checkpoint — merge
            # them so direct load() consumers (e.g. visualization) see the
            # full traces, truncated to the state's iteration count (a
            # crash between a history append and the state write must not
            # surface phantom rows)
            histories = self.load_history(upto=cum)
        return cum, states, histories, meta


def run_with_checkpointing(sampler, n_iter: int, directory,
                           seeds=None, initial_beds=None,
                           segment_size: int = 2000, progress: bool = False,
                           checkpoint_every: Optional[int] = None,
                           async_checkpoints: bool = False):
    """Segment-batched run with resume (reference lsc_run_wrapper protocol).

    If a checkpoint exists in ``directory``, the run resumes from it and only
    the remaining iterations execute; histories concatenate across restarts
    exactly like the reference's results-npz merging (each restart contributes
    its full trace including its initial row,
    largeScaleChain_multiprocessing.py:206-231).
    Returns (states, histories, cumulative_iter).

    ``async_checkpoints=True`` overlaps checkpoint compression/IO with the
    next compiled segment (single-process runs; see CheckpointManager).
    All writes are flushed — and any write failure raised — before return.
    """
    mgr = CheckpointManager(directory, async_write=async_checkpoints)
    ck = mgr.load()
    if ck is not None:
        done, states, histories, _ = ck
        expected_cls = "SGSState" if sampler.is_sgs else "ChainState"
        if type(states).__name__ != expected_cls:
            raise ValueError(
                f"checkpoint holds a {type(states).__name__} but the "
                f"sampler's chain family needs a {expected_cls}: this "
                "directory belongs to a run of the other chain family "
                "(CRF vs SGS). Point the sampler at its own run directory.")
        # a crash between a history append and its state save leaves a
        # stale segment ahead of the checkpoint; remove it before this
        # run re-records those rows (duplicate-segment corruption)
        mgr.prune_history(done)
        exp = (int(sampler.static.H), int(sampler.static.W))
        got = tuple(np.asarray(states.bed).shape[-2:])
        if got != exp:
            raise ValueError(
                f"checkpoint state grid {got} != sampler grid {exp}: the "
                "checkpoint was saved under a different domain padding "
                "(e.g. an auto-padded TPU run resumed on a platform where "
                "auto-padding does not trigger, or vice versa). Rebuild "
                "the sampler with the same padding — "
                "MultiChainSampler(..., auto_pad='force') to re-pad, or "
                "auto_pad=False for an unpadded checkpoint — so resumed "
                "trajectories continue the saved ones exactly.")
        if getattr(sampler, "mesh", None) is not None:
            # loaded states are full host arrays; restore the chains-axis
            # placement so a resumed run keeps the sharded layout instead
            # of silently running replicated
            from ..parallel.mesh import shard_chains

            states = shard_chains(states, sampler.mesh)
        histories = {k: np.asarray(v) for k, v in histories.items()}
    else:
        done = 0
        states = sampler.init(initial_beds=initial_beds, seeds=seeds)
        histories = {}

    # ``done`` counts trace rows already recorded (row 0 = initial state,
    # reference n_iter semantics); a resumed run replays no steps and its
    # duplicated boundary row is dropped so an interrupted+resumed run yields
    # exactly the traces of an uninterrupted one.
    remaining = int(n_iter) - done
    if remaining <= 0:
        return states, histories, done

    checkpoint_every = checkpoint_every or segment_size
    resuming = ck is not None

    def _merge(prev, new):
        if not prev:
            return {k: np.asarray(v) for k, v in new.items()}
        return {k: np.concatenate([prev[k], new[k]], axis=1) for k in new}

    box = {"segments": [], "rows": done, "saved_rows": done, "first": True}

    def _flush(states_):
        """Write only the NEW rows as a history segment + a state-only
        checkpoint (each row hits disk once per run)."""
        if box["segments"]:
            seg_cat = {k: np.concatenate([s[k] for s in box["segments"]],
                                         axis=1)
                       for k in box["segments"][0]}
            mgr.append_history(box["saved_rows"], box["rows"], seg_cat)
            merged = _merge(histories, seg_cat)
            histories.clear()
            histories.update(merged)
            box["segments"] = []
        mgr.save(box["rows"], states_, meta={
            "grid_hw": [int(sampler.static.H), int(sampler.static.W)],
            "true_hw": list(getattr(sampler, "_true_hw",
                                    (sampler.static.H, sampler.static.W))),
            "padded": bool(getattr(sampler, "padded", False))})
        box["saved_rows"] = box["rows"]

    def cb(_local, states_, traces_np):
        seg = {k: np.moveaxis(v, 0, 1) for k, v in traces_np.items()}
        if box["first"]:
            if resuming:  # drop the duplicated boundary row
                seg = {k: v[:, 1:] for k, v in seg.items()}
            box["first"] = False
        box["segments"].append(seg)
        box["rows"] += seg["loss"].shape[1]
        if box["rows"] - box["saved_rows"] >= checkpoint_every:
            _flush(states_)

    run_len = remaining + (1 if resuming else 0)
    try:
        states, _ = sampler.run(states, run_len, segment_size=segment_size,
                                progress=progress, segment_callback=cb)
        _flush(states)
    except BaseException:
        # surfacing the primary error; still drain queued async writes so
        # already-recorded rows are durable — but never mask that error
        # with a secondary write failure
        try:
            mgr.flush()
        except Exception:
            pass
        raise
    mgr.flush()  # async mode: final save durable (or raised) before return
    cum = done + remaining
    return states, histories, cum
