#!/usr/bin/env python3
"""On-TPU trajectory A/B for the lanes CG default flip (NOTES_ROUND5 §1b).

The lanes Pallas CG (ops/cg_kernel.lanes_masked_cg) has identical
iteration arithmetic to the vmapped XLA CG but a different reduction
order, so single-chain trajectories diverge chaotically after ~tens of
MH steps.  The honest hardware check is therefore STATISTICAL: run the
bench SGS configuration under both solvers from the same seed and compare

  - acceptance rate (same proposal law => must match to MC noise),
  - the chain-averaged loss curve (self-averaging over 512 chains),
  - post-burn-in loss mean/std across chains,
  - finiteness everywhere,

plus a same-seed determinism re-run of the lanes path (the verify-skill
invariant).  Each solver runs in the SAME process — the gate is read at
trace time per sampler build, and MCMC_TPU_SGS_SURGERY is re-set between
builds.

    PYTHONPATH=/root/repo:/root/.axon_site \
        timeout 3000 python -u tools/sgs_traj_ab.py --chains 512
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(chain, gates, chains, segment, segments, seed):
    import jax

    from mcmc_tpu.parallel import MultiChainSampler

    # the sampler's jitted scan is cached on (static, n_steps) — without a
    # cache clear the second mode would silently reuse the first mode's
    # compiled executable and never re-read the gate env (observed
    # 2026-08-20: bitwise-identical "A/B")
    jax.clear_caches()
    os.environ["MCMC_TPU_SGS_SURGERY"] = gates
    sampler = MultiChainSampler(chain, n_chains=chains)
    states = sampler.init(seeds=seed)
    losses, accs = [], []
    t0 = time.time()
    for s in range(segments):
        states, tr = sampler.run_segment(states, segment)
        losses.append(np.asarray(tr["loss"]))            # (segment, chains)
        accs.append(float(np.asarray(tr["step"], np.float32).mean()))
        print(f"[ab] gates={gates!r} segment {s}: "
              f"{time.time() - t0:.1f}s cumulative", file=sys.stderr,
              flush=True)
    loss = np.concatenate(losses, axis=0)                # (iters, chains)
    return loss, float(np.mean(accs))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=512)
    ap.add_argument("--segment", type=int, default=400)
    ap.add_argument("--segments", type=int, default=4)
    ap.add_argument("--grid", type=int, default=512)
    args = ap.parse_args()

    import bench

    p = bench.build_problem(H=args.grid, W=args.grid)
    chain = bench.make_sgs_chain(p)

    loss_l, acc_l = run(chain, "", args.chains, args.segment,
                        args.segments, seed=7)
    loss_x, acc_x = run(chain, "nolanescg", args.chains, args.segment,
                        args.segments, seed=7)
    # same-seed determinism of the lanes path
    loss_l2, _ = run(chain, "", args.chains, args.segment, 1, seed=7)

    n_burn = loss_l.shape[0] // 2
    mean_l, mean_x = loss_l[n_burn:].mean(), loss_x[n_burn:].mean()
    std_l = loss_l[n_burn:].std()
    std_x = loss_x[n_burn:].std()
    curve_l = loss_l.mean(axis=1)
    curve_x = loss_x.mean(axis=1)
    curve_dev = float(np.max(np.abs(curve_l - curve_x))
                      / max(1e-9, np.abs(curve_l).max()))

    det_ok = bool(np.array_equal(loss_l[:args.segment], loss_l2))
    finite_ok = bool(np.isfinite(loss_l).all() and np.isfinite(loss_x).all())
    trend_ok = bool(curve_l[-1] < curve_l[0] and curve_x[-1] < curve_x[0])
    acc_ok = 0.02 < acc_l < 0.98 and abs(acc_l - acc_x) < 0.02
    mean_ok = abs(mean_l - mean_x) < 0.05 * max(std_l, std_x, 1e-9) * 10
    ok = det_ok and finite_ok and trend_ok and acc_ok and mean_ok

    print(f"[ab] lanes:  acc={acc_l:.4f} post-burn loss {mean_l:.4f} "
          f"+- {std_l:.4f}")
    print(f"[ab] xlacg:  acc={acc_x:.4f} post-burn loss {mean_x:.4f} "
          f"+- {std_x:.4f}")
    print(f"[ab] chain-avg curve max rel dev: {curve_dev:.4%}")
    print(f"[ab] determinism(lanes, same seed)={det_ok} finite={finite_ok} "
          f"trend_down={trend_ok} acc_match={acc_ok} mean_match={mean_ok}")
    print(f"[ab] VERDICT: {'OK' if ok else 'MISMATCH'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
