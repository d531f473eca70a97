#!/usr/bin/env python3
"""SGS per-phase surgery driver (NOTES_ROUND4 §6 methodology, committed).

Runs the bench SGS configuration on the live backend with a given
MCMC_TPU_SGS_SURGERY gate set and prints ms/step-batch + chain-it/s.
Each invocation is ONE fresh process (the gates are read at trace time),
so sweep gates from a shell loop:

    for g in "" nocg noplut nopwin notopk nolut nodraw noadj; do
      PYTHONPATH=/root/repo:/root/.axon_site MCMC_TPU_SGS_SURGERY=$g \
        timeout 900 python tools/sgs_surgery.py --chains 512 --segment 400
    done

Microbenchmarks LIE on this device (CLAUDE.md) — this measures the gated
phase inside the real scan, which is the only honest composition probe.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=512)
    ap.add_argument("--segment", type=int, default=400)
    ap.add_argument("--repeats", type=int, default=3,
                    help="timed segments (first is burn-in/compile, dropped)")
    ap.add_argument("--grid", type=int, default=512)
    args = ap.parse_args()

    import bench  # repo-root bench module: problem + chain builders

    p = bench.build_problem(H=args.grid, W=args.grid)
    chain = bench.make_sgs_chain(p)

    from mcmc_tpu.parallel import MultiChainSampler

    gates = os.environ.get("MCMC_TPU_SGS_SURGERY", "")
    sampler = MultiChainSampler(chain, n_chains=args.chains)
    states = sampler.init(seeds=7)

    t0 = time.time()
    states, tr = sampler.run_segment(states, args.segment)
    _ = float(np.asarray(tr["loss"])[-1, 0])  # real sync through the tunnel
    print(f"[surgery] gates={gates!r} compile+first segment: "
          f"{time.time() - t0:.1f}s", file=sys.stderr, flush=True)

    times = []
    for _ in range(args.repeats):
        t0 = time.time()
        states, tr = sampler.run_segment(states, args.segment)
        _ = float(np.asarray(tr["loss"])[-1, 0])
        times.append(time.time() - t0)
    best = min(times)
    ms = best / args.segment * 1e3
    rate = args.segment * args.chains / best
    print(f"[surgery] gates={gates!r} chains={args.chains} "
          f"segment={args.segment}: {ms:.3f} ms/step-batch = "
          f"{rate:,.0f} chain-it/s  (segments: "
          f"{', '.join(f'{t:.2f}s' for t in times)})", flush=True)


if __name__ == "__main__":
    main()
