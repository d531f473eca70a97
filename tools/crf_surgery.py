#!/usr/bin/env python3
"""CRF per-phase surgery driver (VERDICT r4 next-#3).

Runs the bench CRF configuration (768 chains, 512², Matérn s=1.3, B=80)
with a given MCMC_TPU_CRF_SURGERY gate set and prints ms/step-batch +
chain-it/s.  One fresh process per gate set (gates are read at trace
time):

    for g in "" nodraw fixednoise nokernel nores; do
      PYTHONPATH=/root/repo:/root/.axon_site MCMC_TPU_CRF_SURGERY=$g \
        timeout 1200 python tools/crf_surgery.py --chains 768
    done

``--hbm-probe`` instead measures the device's streaming HBM bandwidth
(jitted saxpy over a large f32 array, bytes = 2·size per pass) — the
denominator for the fused kernel's DMA-floor arithmetic: per chain per
step the kernel moves 3 state planes in (3·SX·SY·4 B), the proposal
canvas (SX·SY·4 B) and up to 3 planes back on accept, so

    floor_ms ≈ chains · (4 + 3·acc) · SX·SY · 4 / HBM_B_per_s

Microbenchmarks LIE on this device (CLAUDE.md) — phase costs are only
honest measured inside the real scan, which is what this does.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def hbm_probe(mib=1024, passes=6, inner=50):
    import jax
    import jax.numpy as jnp

    n = mib * (1 << 20) // 4

    @jax.jit
    def saxpy_chain(x):
        # `inner` dependent passes inside ONE dispatch: the tunneled
        # link's per-dispatch + sync overhead is tens of ms (a single
        # 2 GB saxpy measured 77 GB/s while the in-scan full-state copy
        # of the nokernel gate sustains ~600 GB/s), so bandwidth is only
        # honest when amortized over many passes per dispatch
        return jax.lax.fori_loop(
            0, inner,
            lambda i, v: v * jnp.float32(1.000001) + jnp.float32(1.0), x)

    first = jax.jit(lambda x: x[0])  # eager indexing through the tunnel
    # costs seconds per op — sync via a jitted scalar extract instead

    x = jnp.zeros((n,), jnp.float32)
    x = saxpy_chain(x)
    _ = float(first(x))  # sync through the tunnel
    rates = []
    for _ in range(passes):
        t0 = time.time()
        x = saxpy_chain(x)
        _ = float(first(x))
        dt = time.time() - t0
        rates.append(inner * 2 * n * 4 / dt)
    best = max(rates)
    print(f"[hbm] streaming saxpy over {mib} MiB: best "
          f"{best / 1e9:.1f} GB/s (passes: "
          f"{', '.join(f'{r / 1e9:.1f}' for r in rates)})", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=768)
    ap.add_argument("--segment", type=int, default=2000)
    ap.add_argument("--repeats", type=int, default=3,
                    help="timed segments (first is compile, dropped)")
    ap.add_argument("--grid", type=int, default=512)
    ap.add_argument("--hbm-probe", action="store_true")
    ap.add_argument("--hbm-mib", type=int, default=1024)
    args = ap.parse_args()

    if args.hbm_probe:
        return hbm_probe(args.hbm_mib)

    import bench

    p = bench.build_problem(H=args.grid, W=args.grid)
    chain = bench.make_chain(p)
    chain.set_crf_data_weight()

    from mcmc_tpu.parallel import MultiChainSampler

    gates = os.environ.get("MCMC_TPU_CRF_SURGERY", "")
    sampler = MultiChainSampler(chain, n_chains=args.chains)
    states = sampler.init(seeds=7)

    t0 = time.time()
    states, tr = sampler.run_segment(states, args.segment)
    _ = float(np.asarray(tr["loss"])[-1, 0])  # real sync through the tunnel
    acc = float(np.asarray(tr["step"], np.float32).mean())
    print(f"[surgery] gates={gates!r} compile+first segment: "
          f"{time.time() - t0:.1f}s acc={acc:.3f}", file=sys.stderr,
          flush=True)

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
