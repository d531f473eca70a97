#!/usr/bin/env python3
"""Benchmark: TPU multi-chain MCMC throughput vs measured CPU baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so the baseline is
measured here: the NumPy reference-twin chain (tests/reference_impl.py —
same algorithm, same incremental-residual optimization as the reference's
hot loop) timed single-chain on this host, scaled by the physical core
count (the reference farm runs cores-1 workers share-nothing; granting
perfect scaling over all cores is generous to the baseline).

TPU side: 256 vmapped chains on a 512x512 grid (production resolution/block
shapes from largeScaleChain_multiprocessing.py:461-585), one jit'd scan.
Metric: aggregate chain-iterations/sec.
"""

import json
import os
import sys
import time

import numpy as np

GRID = 512
N_CHAINS = 256
SIGMA_MC = 5.0
RES = 500.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_problem(H=GRID, W=GRID, res=RES, seed=0):
    rng = np.random.default_rng(seed)
    x = np.arange(W) * res
    y = np.arange(H) * res
    xx, yy = np.meshgrid(x, y)
    Lx, Ly = W * res, H * res
    bed_true = 300 * np.sin(2 * np.pi * xx / (Lx / 3)) * np.cos(
        2 * np.pi * yy / (Ly / 3)) - 400
    surf = 1800 + 0.3e-3 * xx + 150 * np.sin(2 * np.pi * yy / Ly)
    velx = 150 + 80 * np.sin(2 * np.pi * yy / Ly)
    vely = 30 * np.cos(2 * np.pi * xx / Lx)
    thick = surf - bed_true
    smb = (np.gradient(velx * thick, res, axis=1)
           + np.gradient(vely * thick, res, axis=0))
    dhdt = np.zeros_like(xx)
    grounded = np.ones((H, W), bool)
    region = np.zeros((H, W), np.float32)
    region[20:-20, 20:-20] = 1
    data_mask = rng.random((H, W)) < 0.005
    cond_bed = np.where(data_mask, bed_true, np.nan)
    initial_bed = np.minimum(bed_true + rng.normal(0, 100, (H, W)), surf - 5)
    return dict(xx=xx, yy=yy, surf=surf, velx=velx, vely=vely, dhdt=dhdt,
                smb=smb, grounded=grounded, region=region,
                data_mask=data_mask, cond_bed=cond_bed,
                initial_bed=initial_bed, resolution=res)


def make_chain(p):
    from mcmc_tpu.models import ChainCRF
    from mcmc_tpu.utils.config import (BlockMenuConfig, RandFieldConfig,
                                       WeightConfig)

    chain = ChainCRF(p["xx"], p["yy"], p["initial_bed"], p["surf"], p["velx"],
                     p["vely"], p["dhdt"], p["smb"], p["cond_bed"],
                     p["data_mask"], p["grounded"], p["resolution"])
    chain.set_update_region(True, p["region"])
    chain.set_loss_type(sigma_mc=SIGMA_MC, massConvInRegion=True)
    chain.configure_randfield(
        RandFieldConfig(10e3, 50e3, 10e3, 50e3, scale_min=50, scale_max=150,
                        nugget_max=0.0, model_name="Matern", isotropic=True,
                        smoothness=1.3),
        BlockMenuConfig(50, 80, 50, 80, steps=5),
        WeightConfig(L=2, x0=0, k=6, offset=1, max_dist=30e3, resolution=RES))
    chain.set_update_type("CRF_weight")
    return chain


def measure_cpu_baseline(p, chain, n_iter=150):
    """Reference-twin single-chain it/s x physical cores."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    import reference_impl as ref
    from mcmc_tpu.models.randfield import build_randfield

    static, _ = chain.build()
    rf_static, _ = build_randfield(chain._rf_cfg, chain._block_cfg,
                                   chain._weight_cfg)
    from mcmc_tpu.models.randfield import make_block_menu
    from mcmc_tpu.ops.logistic import make_edge_mask

    pairs = make_block_menu(chain._block_cfg)
    wc = chain._weight_cfg
    edge_masks = [make_edge_mask(int(pairs[1, i]), int(pairs[0, i]),
                                 wc.resolution, wc.L, wc.x0, wc.k, wc.offset,
                                 wc.max_dist).astype(np.float64)
                  for i in range(pairs.shape[1])]
    consts = dict(
        surf=p["surf"], velx=p["velx"], vely=p["vely"], dhdt=p["dhdt"],
        smb=p["smb"], update_mask=p["region"].astype(float),
        mc_mask=p["region"].astype(float),
        crf_weight=np.asarray(chain.crf_data_weight, float),
        sigma_mc=SIGMA_MC, resolution=RES)
    rf_params = dict(model_name="Matern", isotropic=True, smoothness=1.3,
                     scale_min=50.0, scale_max=150.0, nugget_max=0.0,
                     range_min_x=10e3, range_max_x=50e3,
                     range_min_y=10e3, range_max_y=50e3, resolution=RES)
    twin = ref.ReferenceCRFChain(consts, pairs, edge_masks, rf_params, seed=3)
    region_cells = np.argwhere(p["region"] == 1)
    t0 = time.time()
    twin.run(p["initial_bed"], n_iter, region_cells)
    dt = time.time() - t0
    per_chain = (n_iter - 1) / dt
    try:
        import multiprocessing
        cores = multiprocessing.cpu_count()
    except Exception:
        cores = 1
    log(f"[bench] CPU twin: {per_chain:.1f} it/s/chain x {cores} cores")
    return per_chain * cores, per_chain


def measure_tpu(chain, segment=100, min_seconds=8.0, max_iters=4000):
    import jax
    from mcmc_tpu.parallel import MultiChainSampler

    log(f"[bench] devices: {jax.devices()}")
    sampler = MultiChainSampler(chain, n_chains=N_CHAINS)
    states = sampler.init(seeds=0)
    # warmup/compile (segment-sized dispatches: very long single executions
    # can trip device-side execution limits on tunneled TPUs)
    t0 = time.time()
    states, _ = sampler.run_segment(states, segment)
    _ = float(np.asarray(states.loss_mc)[0])  # real sync (block_until_ready
    # does not wait for execution on the tunneled axon backend)
    log(f"[bench] warmup (compile): {time.time() - t0:.1f}s")
    # timed adaptive loop
    done = 0
    accs = []
    t0 = time.time()
    while (time.time() - t0 < min_seconds) and done < max_iters:
        states, traces = sampler.run_segment(states, segment)
        acc = np.asarray(traces["step"]).mean()  # transfer = real sync
        done += segment
        accs.append(acc)
    dt = time.time() - t0
    rate = done * N_CHAINS / dt
    loss = np.asarray(states.loss_mc)
    log(f"[bench] TPU: {done} iters x {N_CHAINS} chains in {dt:.2f}s "
        f"-> {rate:,.0f} chain-it/s | acc {np.mean(accs):.3f} | "
        f"loss finite: {np.isfinite(loss).all()}")
    if not np.isfinite(loss).all():
        raise RuntimeError("non-finite loss in benchmark run")
    return rate


def main():
    p = build_problem()
    chain = make_chain(p)
    chain.set_crf_data_weight()
    cpu_farm, cpu_single = measure_cpu_baseline(p, chain)
    tpu_rate = measure_tpu(chain)
    result = {
        "metric": f"chain_iters_per_sec_{N_CHAINS}chains_{GRID}x{GRID}",
        "value": round(tpu_rate, 1),
        "unit": "chain-iterations/sec",
        "vs_baseline": round(tpu_rate / cpu_farm, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
