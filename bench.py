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

# Production PRNG: the counter-based XLA RngBitGenerator ("rbg") — the
# Philox-class generator the torch reference effectively uses on GPU
# (cuRAND).  Threefry keying alone is ~24% of the CRF step on the bench
# device; rbg measured +8.8% CRF / +5.3% SGS aggregate throughput at
# identical acceptance (NOTES_ROUND5 §3b).  Opt out by pre-setting the
# env to "" (utils/rng.py honors the impl per typed key — no global jax
# config is touched, and tests/CI keep the threefry default).
os.environ.setdefault("MCMC_TPU_PRNG_IMPL", "rbg")

GRID = 512
# 768 chains = 2 chunked launches of 384 (the fused kernel's single-launch
# compile ceiling; sampler.scan_chunked keeps the batch chunked across the
# scan): measured aggregate-throughput optimum on v5e-1 — 384.9k it/s,
# ESS/s 180 (vs 337k/80 at 256). 1536 chains trades 3% it/s for 2.6x
# ESS/s (463/s); HBM exhausts at 2304. Scaling table in NOTES_ROUND3.md.
N_CHAINS = 768
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
    cores = _cores()
    log(f"[bench] CPU twin: {per_chain:.1f} it/s/chain x {cores} cores")
    return per_chain * cores, per_chain


# split-half ESS/s agreement required before an ESS figure is reported
# without a flag (VERDICT r4 next-#5: the r03->r04 headline ESS swung ±30%
# at identical config — un-error-barred ESS cannot detect regressions)
ESS_SPREAD_TARGET = 0.10


def _loss_diagnostics(loss_trace, dt):
    """ESS(loss)/sec with a split-half spread + rank-normalized R-hat.

    Computed on the HOST CPU backend via jax.default_device (VERDICT r4
    next-#5/#6): the estimators are ~40 small jnp ops each, and eager
    dispatch through the tunneled axon backend costs seconds PER OP; the
    cpu device leaves the TPU work untouched.

    Split-half spread: the timed window is halved in time and each half's
    ESS/s estimated over dt/2 (throughput through the window is uniform to
    measurement noise); spread = |r1 - r2| / mean(r1, r2).  R-hat is the
    rank-normalized Vehtari variant (parallel/diagnostics.py) — the
    convergence statistic BASELINE.md demands next to raw throughput
    (reference analog: the eyeball chain comparison in
    visualization.ipynb).

    READ rhat_loss WITH CARE: for this sampler class it does NOT tend to
    1.  Probed on the bench problem (2026-08-21, /tmp/r5_rhat_probe.log):
    rhat RISES with burn (1.84 at 8k iters -> 2.79 at 96k) while ESS
    falls — independently-seeded chains equilibrate into DISTINCT loss
    plateaus (the bed posterior is massively multimodal; block-MH never
    jumps basins), so within-chain variance shrinks while between-chain
    dispersion persists.  The reference behaves identically, which is
    why its convergence practice is loss decay + posterior summaries
    (SURVEY §5.5), not R-hat.  The meaningful cross-chain agreement
    number is therefore also emitted: ``loss_rel_dispersion`` =
    std(chain mean loss) / mean — measured 0.01% (CRF) / 2.7% (SGS) at
    the bench configs: chains agree on the loss scale to a fraction of a
    percent, and R-hat is high only because within-chain variance over
    the window is smaller still.  Distribution-level validation
    (baseline-gap closure, posterior RMSE, variogram band) is asserted
    every round by examples/06 (tests/test_convergence_smoke.py).
    """
    import jax
    from mcmc_tpu.parallel import diagnostics as diag

    loss_trace = np.ascontiguousarray(loss_trace, np.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        n = loss_trace.shape[1]
        h = n // 2
        ess = float(np.asarray(diag.ess(loss_trace)))
        e1 = float(np.asarray(diag.ess(loss_trace[:, :h])))
        e2 = float(np.asarray(diag.ess(loss_trace[:, h:2 * h])))
        rhat = float(np.asarray(diag.rank_normalized_rhat(loss_trace)))
    if not np.isfinite(rhat):
        rhat = -1.0  # sentinel: not computable (keeps the JSON line valid)
    r1, r2 = e1 / (dt / 2.0), e2 / (dt / 2.0)
    spread = abs(r1 - r2) / max((r1 + r2) / 2.0, 1e-9)
    cm = loss_trace.mean(axis=1)
    disp = float(cm.std() / max(abs(cm.mean()), 1e-9))
    return dict(ess=ess, ess_rate=ess / dt, ess_spread=spread, rhat=rhat,
                dispersion=disp)


def measure_tpu(chain, n_chains=N_CHAINS, segment=500, min_seconds=8.0,
                max_iters=6000, label="TPU", burn_iters=0, max_extend=2):
    # segment size amortizes the tunneled host<->device roundtrip between
    # segments (~tens of ms each on axon; measured 2026-08-16: segment=100
    # cost ~0.5 ms/iter of pure dispatch overhead at 256 chains)
    import jax
    from mcmc_tpu.parallel import MultiChainSampler

    log(f"[bench] devices: {jax.devices()}")
    sampler = MultiChainSampler(chain, n_chains=n_chains)
    states = sampler.init(seeds=0)
    # warmup/compile (segment-sized dispatches: very long single executions
    # can trip device-side execution limits on tunneled TPUs)
    t0 = time.time()
    states, _ = sampler.run_segment(states, segment)
    _ = float(np.asarray(states.loss_mc)[0])  # real sync (block_until_ready
    # does not wait for execution on the tunneled axon backend)
    log(f"[bench] {label} warmup (compile): {time.time() - t0:.1f}s")
    # burn-in: move the chains off the initial transient so the ESS of the
    # timed window reflects equilibrium sampling power rather than the
    # monotone early loss decay (which deflates ESS); throughput itself is
    # transient-indifferent
    if burn_iters:
        t0 = time.time()
        n_seg = -(-burn_iters // segment)  # ceil: never under-burn
        for _ in range(n_seg):
            states, _ = sampler.run_segment(states, segment)
        _ = float(np.asarray(states.loss_mc)[0])
        log(f"[bench] {label} burn-in: {n_seg * segment} iters in "
            f"{time.time() - t0:.1f}s")
    # timed adaptive loop
    done = 0
    accs = []
    losses = []
    t0 = time.time()
    while (time.time() - t0 < min_seconds) and done < max_iters:
        states, traces = sampler.run_segment(states, segment)
        step_np = np.asarray(traces["step"])     # transfer = real sync
        losses.append(np.asarray(traces["loss"]))
        done += segment
        accs.append(step_np.mean())
    dt = time.time() - t0
    # ESS/sec of the loss trace over the timed window (chains, time); the
    # window auto-extends (doubling, up to max_extend times) until the
    # split-half ESS/s spread is <= ESS_SPREAD_TARGET so the reported
    # figure is regression-grade; *_ess_spread_ok says whether it got there
    d = _loss_diagnostics(np.concatenate(losses, axis=0).T, dt)
    extensions = 0
    while d["ess_spread"] > ESS_SPREAD_TARGET and extensions < max_extend:
        extensions += 1
        target = 2 * done
        log(f"[bench] {label}: ESS spread {d['ess_spread']:.2f} > "
            f"{ESS_SPREAD_TARGET} — extending window to {target} iters")
        t1 = time.time()
        while done < target:
            states, traces = sampler.run_segment(states, segment)
            step_np = np.asarray(traces["step"])
            losses.append(np.asarray(traces["loss"]))
            done += segment
            accs.append(step_np.mean())
        dt += time.time() - t1
        d = _loss_diagnostics(np.concatenate(losses, axis=0).T, dt)
    rate = done * n_chains / dt
    spread_ok = d["ess_spread"] <= ESS_SPREAD_TARGET
    loss = np.asarray(states.loss_mc)
    log(f"[bench] {label}: {done} iters x {n_chains} chains in {dt:.2f}s "
        f"-> {rate:,.0f} chain-it/s | acc {np.mean(accs):.3f} | "
        f"ESS(loss) {d['ess']:.1f} -> {d['ess_rate']:.1f} ESS/s "
        f"(spread {d['ess_spread']:.2f}, ok={spread_ok}) | "
        f"rhat {d['rhat']:.4f} | loss finite: {np.isfinite(loss).all()}")
    if not np.isfinite(loss).all():
        raise RuntimeError("non-finite loss in benchmark run")
    return dict(rate=rate, ess_rate=d["ess_rate"], acc=float(np.mean(accs)),
                ess=d["ess"], ess_spread=d["ess_spread"],
                ess_spread_ok=spread_ok, rhat=d["rhat"],
                dispersion=d["dispersion"], n_iters=done)


def make_sgs_chain(p):
    """Small-scale chain at the production configuration
    (smallScaleChain_multiprocessing.py:403-585: blocks 5-20,
    set_sgs_param(48, 30e3), detrend + 1000-quantile transform)."""
    from scipy.ndimage import gaussian_filter

    from mcmc_tpu.models.chain_sgs import ChainSGS
    from mcmc_tpu.ops.transforms import NormalScoreTransform

    chain = ChainSGS(p["xx"], p["yy"], p["initial_bed"], p["surf"], p["velx"],
                     p["vely"], p["dhdt"], p["smb"], p["cond_bed"],
                     p["data_mask"], p["grounded"], p["resolution"])
    chain.set_update_region(True, p["region"])
    chain.set_loss_type(sigma_mc=SIGMA_MC, massConvInRegion=True)
    trend = gaussian_filter(p["initial_bed"], sigma=10).astype(np.float32)
    chain.set_trend(trend, detrend_map=True)
    nst = NormalScoreTransform.fit((p["initial_bed"] - trend).ravel(), 1000)
    chain.set_normal_transformation(nst, do_transform=True)
    chain.set_variogram("Matern", 10e3, 1.0, 0.0, vario_smoothness=1.3)
    chain.set_sgs_param(48, 30e3)
    chain.set_block_sizes(5, 20, 5, 20)
    return chain


def measure_cpu_sgs_baseline(p, chain, n_iter=4):
    """Sequential-SGS twin it/s (same config) x physical cores."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    import reference_impl as ref

    vario = {"azimuth": 0.0, "nugget": 0.0, "major_range": 10e3,
             "minor_range": 10e3, "sill": 1.0, "vtype": "Matern", "s": 1.3}
    consts = dict(surf=p["surf"], velx=p["velx"], vely=p["vely"],
                  dhdt=p["dhdt"], smb=p["smb"],
                  region_mask=p["region"].astype(float),
                  mc_mask=p["region"].astype(float),
                  grounded=p["grounded"].astype(float),
                  cond_bed=p["cond_bed"], sigma_mc=SIGMA_MC, resolution=RES)

    class _NST:
        def __init__(self, nst):
            self.nst = nst

        def transform(self, a):
            # np.array (copy) — jnp outputs are read-only as np views
            return np.array(self.nst.transform(a.reshape(-1))).reshape(a.shape)

        def inverse_transform(self, a):
            return np.array(self.nst.inverse(a.reshape(-1))).reshape(a.shape)

    twin = ref.ReferenceSGSChain(consts, vario, (5, 20, 5, 20), 48, 30e3,
                                 nst=_NST(chain.nst_trans), trend=chain.trend,
                                 seed=3)
    t0 = time.time()
    twin.run(p["initial_bed"], n_iter, p["xx"], p["yy"])
    dt = time.time() - t0
    per_chain = (n_iter - 1) / dt
    cores = _cores()
    log(f"[bench] CPU SGS twin: {per_chain:.2f} it/s/chain x {cores} cores")
    return per_chain * cores, per_chain


def _cores():
    try:
        import multiprocessing

        return multiprocessing.cpu_count()
    except Exception:
        return 1


def _pinned_baseline():
    """Pinned single-core CPU-twin rates (BASELINE.json measured_cpu_twin).

    vs_baseline is computed against the pin so the headline is comparable
    across rounds; the fresh twin measured each run is only a drift check
    (VERDICT r3 next-#2: r03's fresh twin was ~3.7x depressed by host
    contention, inflating that round's ratio)."""
    import json as _json

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE.json")
    with open(path) as f:
        m = _json.load(f)["measured_cpu_twin"]
    return (float(m["crf_it_per_sec_single_core"]),
            float(m["sgs_it_per_sec_single_core"]))


def _twin_drift(fresh, pinned, label):
    """Host-contention detector: flag a fresh twin >2x off the pin."""
    ratio = fresh / pinned if pinned > 0 else float("inf")
    contended = not (0.5 <= ratio <= 2.0)
    if contended:
        log(f"[bench] WARNING: fresh {label} twin {fresh:.3g} it/s is "
            f"{ratio:.2f}x the pinned {pinned:.3g} — host contention "
            f"suspected; vs_baseline uses the PIN (fresh kept as "
            f"*_fresh fields)")
    return contended


def check_fused_parity(chain, n_chains=384, n_steps=200):
    """On-hardware numerical-equivalence attestation: fused Pallas window
    kernel vs the vmapped XLA step (VERDICT r3 next-#6).

    Bitwise identity holds in Pallas interpret mode (CI,
    tests/test_window_kernel.py) but NOT on hardware: the kernel's VPU
    reduction order differs from XLA's tiled reductions, so the block
    standardization and the loss delta differ at the last-ulp level
    (measured 2026-08-19 on v5e-1, 384 chains: after ONE step from
    identical states the accept decisions are identical, bed max|diff|
    3.7e-4 m on ~700 m beds (~5e-7 relative), loss rel <= 1.1e-7), and
    over long runs those ulps occasionally flip a borderline MH accept
    (measured 8/76,800 decisions = 0.010% — the same class as the
    documented 0.028% auto-pad flips, NOTES_ROUND3.md), after which the
    two trajectories legitimately diverge.  The attestation therefore
    checks (a) single-step: accepts identical + ulp-scale numeric deltas,
    (b) long-run: flip rate < 0.1% and pre-flip loss agreement < 5e-6.

    Returns (ok, flip_rate); never raises — a parity break must surface in
    the JSON, not kill the benchmark."""
    from mcmc_tpu.parallel import MultiChainSampler

    try:
        # (a) single step from identical states: accepts must match exactly
        one = {}
        for impl in ("fused", "xla"):
            s = MultiChainSampler(chain, n_chains=n_chains, impl=impl)
            st, tr = s.run_segment(s.init(seeds=42), 1)
            one[impl] = (np.asarray(st.bed), np.asarray(tr["loss"]),
                         np.asarray(tr["step"]))
        bf, lf, sf = one["fused"]
        bx, lx, sx_ = one["xla"]
        bed_rel = float(np.max(np.abs(bf - bx)) / max(1.0, np.max(np.abs(bx))))
        loss_rel = float(np.max(np.abs(lf - lx) / np.abs(lx)))
        step_ok = bool(np.array_equal(sf, sx_))
        ok = step_ok and bed_rel < 1e-5 and loss_rel < 1e-6
        log(f"[bench] fused parity single-step: accepts equal={step_ok}, "
            f"bed rel diff {bed_rel:.2e}, loss rel diff {loss_rel:.2e}")

        # (b) long run: borderline-MH flip census from the traces
        tr2 = {}
        for impl in ("fused", "xla"):
            s = MultiChainSampler(chain, n_chains=n_chains, impl=impl)
            _, tr = s.run_segment(s.init(seeds=42), n_steps)
            tr2[impl] = (np.asarray(tr["loss"]), np.asarray(tr["step"]))
        Lf, Sf = tr2["fused"]
        Lx, Sx = tr2["xla"]
        diff = Sf != Sx                       # (n_steps, n_chains)
        any_flip = diff.any(axis=0)
        first = np.where(any_flip, diff.argmax(axis=0), n_steps)
        comparable = int(np.minimum(first + 1, n_steps).sum())
        flip_rate = float(any_flip.sum() / max(comparable, 1))
        pre_rel = 0.0
        for c in range(n_chains):
            t = int(first[c])
            if t:
                pre_rel = max(pre_rel, float(np.max(
                    np.abs(Lf[:t, c] - Lx[:t, c]) / np.abs(Lx[:t, c]))))
        ok = ok and flip_rate < 1e-3 and pre_rel < 5e-6
        log(f"[bench] fused parity {n_steps}-step census: "
            f"{int(any_flip.sum())}/{n_chains} chains flip a borderline "
            f"accept (rate {flip_rate:.2e}), pre-flip loss rel diff "
            f"{pre_rel:.2e} -> {'OK' if ok else 'FAILED'}")
        return ok, flip_rate
    except Exception as e:  # e.g. CPU-only env: fused path unavailable
        log(f"[bench] fused parity check errored: {e!r}")
        return False, -1.0  # -1 = not measured (NaN is not valid JSON)


def _device_watchdog(timeout_s=240, attempts=2, env=None):
    """Bound backend init: the tunneled axon backend HANGS indefinitely when
    the tunnel is down (observed 2026-08-17: jax.devices() still blocked
    after 5+ min). Probe it in a subprocess with a timeout so bench fails
    fast with a clear message instead of hanging the driver's bench step.
    No-op cost when the device is healthy (~init time, once).

    env: subprocess environment override (tests); None inherits, keeping
    the image's sitecustomize so the probe sees the REAL backend."""
    import subprocess

    code = ("import jax; ds = jax.devices(); "
            "print('WATCHDOG_OK', [d.platform for d in ds], flush=True)")
    for k in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True,
                               timeout=timeout_s, env=env)
        except subprocess.TimeoutExpired:
            log(f"[bench] device watchdog: backend init exceeded {timeout_s}s"
                f" (attempt {k + 1}/{attempts}) — tunnel down?")
            continue
        if r.returncode == 0 and "WATCHDOG_OK" in r.stdout:
            log("[bench] device watchdog: "
                + r.stdout.strip().splitlines()[-1])
            return
        log(f"[bench] device watchdog: probe rc={r.returncode}, stderr tail: "
            + r.stderr[-500:])
    log("[bench] FATAL: device backend unreachable — aborting before the "
        "timed sections (no JSON; rerun when the tunnel recovers)")
    sys.exit(2)


# 512 chains: the measured SGS ESS/sec optimum on v5e-1 (aggregate it/s is
# flat in chain count — the batched pipeline is throughput-bound — but
# independent-chain count buys ESS until it plateaus at 512; scaling table
# in NOTES_ROUND3.md)
N_CHAINS_SGS = 512
# swept each bench run for the SGS ESS/sec optimum (the r4 step speedup
# moved the chain-count/ESS tradeoff; VERDICT r4 next-#4) — 512 stays the
# round-comparable headline point
SGS_SWEEP_CHAINS = (256, 512, 1024)
# 1536 chains (4 chunked launches of 384): the ESS/sec-optimal CRF
# operating point — trades ~3% aggregate it/s vs 768 for ~2.6x ESS/s
# (NOTES_ROUND3.md chunked-dispatch table). BASELINE.md's north-star is
# ESS/sec, so both operating points land in the JSON (VERDICT r3 next-#3).
N_CHAINS_ESS = 1536
# The reference's T1 production domain is 900x900
# (largeScaleChain_multiprocessing.py:483); 900%8 != 0 so the sampler
# auto-pads to 904x1024 to keep the fused kernel. 384 chains is the
# measured optimum at this size (NOTES_ROUND3.md production-grid table).
GRID_PROD = 900
N_CHAINS_PROD = 384


def main():
    _device_watchdog()
    pin_crf, pin_sgs = _pinned_baseline()
    cores = _cores()
    p = build_problem()
    chain = make_chain(p)
    chain.set_crf_data_weight()
    cpu_farm_fresh, cpu_fresh = measure_cpu_baseline(p, chain)
    crf_contended = _twin_drift(cpu_fresh, pin_crf, "CRF")
    # segment=2000: per-segment trace transfers cost ~50 ms on the
    # tunneled link; 500-iter segments underreport by ~10% (a 200k-iter
    # soak at segment 2000 sustains 324k it/s, 2026-08-17)
    crf = measure_tpu(chain, label="TPU CRF", segment=2000,
                      min_seconds=8.0, max_iters=12000, burn_iters=8000)
    # second CRF operating point (4x384 chunked launches); the ess_optimal_*
    # fields report whichever measured point wins on ESS/s — at the r5
    # composition that is the 768-chain headline itself (768: 191.5,
    # 1536: 140, 384: 117.6 ESS/s — /tmp/r5_crf_ess384.log; the r3-era
    # "1536 is 2.6x better" pin did not survive regression-grade spreads)
    ess_1536 = measure_tpu(
        chain, n_chains=N_CHAINS_ESS, label="TPU CRF ess-opt", segment=2000,
        min_seconds=8.0, max_iters=12000, burn_iters=8000)
    crf_points = {N_CHAINS: crf, N_CHAINS_ESS: ess_1536}
    crf_opt_nc = max(crf_points, key=lambda nc: crf_points[nc]["ess_rate"])
    ess_opt = crf_points[crf_opt_nc]
    # on-device fused-vs-XLA numerical-equivalence attestation
    fused_parity, fused_flip_rate = check_fused_parity(chain)

    # unaligned production-shape grid (auto-padded 904x1024 fused path)
    p_prod = build_problem(H=GRID_PROD, W=GRID_PROD)
    chain_prod = make_chain(p_prod)
    chain_prod.set_crf_data_weight()
    prod = measure_tpu(
        chain_prod, n_chains=N_CHAINS_PROD, label="TPU CRF 900x900 autopad",
        segment=2000, min_seconds=8.0, max_iters=8000, burn_iters=4000)

    sgs_chain = make_sgs_chain(p)
    sgs_cpu_farm_fresh, sgs_cpu_fresh = measure_cpu_sgs_baseline(p, sgs_chain)
    sgs_contended = _twin_drift(sgs_cpu_fresh, pin_sgs, "SGS")
    # SGS chain-count sweep for the ESS-optimal operating point (VERDICT r4
    # next-#4: the r4 3.2x step speedup moved the chain-count/ESS tradeoff
    # and the old 512-chain pin was never re-swept); the 512 point is also
    # the round-comparable headline
    sgs_points = {}
    for nc in SGS_SWEEP_CHAINS:
        headline = nc == N_CHAINS_SGS
        sgs_points[nc] = measure_tpu(
            sgs_chain, n_chains=nc, segment=400,
            min_seconds=6.0 if headline else 4.0,
            max_iters=2400 if headline else 1600,
            label=f"TPU SGS {nc}ch", burn_iters=2000 if headline else 1200)
    sgs = sgs_points[N_CHAINS_SGS]
    sgs_opt_nc = max(sgs_points, key=lambda nc: sgs_points[nc]["ess_rate"])
    sgs_opt = sgs_points[sgs_opt_nc]

    result = {
        "metric": f"chain_iters_per_sec_{N_CHAINS}chains_{GRID}x{GRID}",
        "value": round(crf["rate"], 1),
        "unit": "chain-iterations/sec",
        "prng_impl": os.environ.get("MCMC_TPU_PRNG_IMPL") or "threefry",
        # headline ratio vs the PINNED single-core twin x physical cores —
        # round-comparable by construction (the fresh twin only drift-checks)
        "vs_baseline": round(crf["rate"] / (pin_crf * cores), 2),
        "cpu_cores": cores,
        "cpu_twin_pinned_it_per_sec_single_core": pin_crf,
        "cpu_twin_fresh_it_per_sec_single_core": round(cpu_fresh, 2),
        "vs_baseline_fresh_twin": round(crf["rate"] / cpu_farm_fresh, 2),
        "cpu_twin_contended": crf_contended,
        # every ESS/s figure carries its split-half spread + an ok flag
        # (<= ESS_SPREAD_TARGET after window auto-extension) and every
        # family a rank-normalized R-hat of the loss trace — speed AND
        # convergence artifacts in one JSON (VERDICT r4 next-#5/#6)
        "ess_loss_per_sec": round(crf["ess_rate"], 2),
        "ess_spread": round(crf["ess_spread"], 3),
        "ess_spread_ok": crf["ess_spread_ok"],
        "rhat_loss": round(crf["rhat"], 4),
        "loss_rel_dispersion": round(crf["dispersion"], 4),
        "acceptance": round(crf["acc"], 3),
        # ESS/sec-optimal CRF operating point (BASELINE.md north-star),
        # selected by measurement between the two CRF points
        "ess_optimal_n_chains": crf_opt_nc,
        "ess_optimal_chain_iters_per_sec": round(ess_opt["rate"], 1),
        "ess_optimal_ess_loss_per_sec": round(ess_opt["ess_rate"], 2),
        "ess_optimal_ess_spread": round(ess_opt["ess_spread"], 3),
        "ess_optimal_ess_spread_ok": ess_opt["ess_spread_ok"],
        "ess_optimal_acceptance": round(ess_opt["acc"], 3),
        "crf_sweep_chains": sorted(crf_points),
        "crf_sweep_ess_loss_per_sec": [
            round(crf_points[nc]["ess_rate"], 2)
            for nc in sorted(crf_points)],
        # fused Pallas kernel vs vmapped XLA step on hardware: single-step
        # accepts identical + ulp-scale numeric deltas + borderline-MH flip
        # rate < 0.1% over a long run (see check_fused_parity docstring)
        "fused_parity": fused_parity,
        "fused_mh_flip_rate": round(fused_flip_rate, 6),
        # reference production grid shape (900x900 -> auto-pad 904x1024)
        "unaligned_900x900_chain_iters_per_sec": round(prod["rate"], 1),
        "unaligned_900x900_n_chains": N_CHAINS_PROD,
        "unaligned_900x900_ess_loss_per_sec": round(prod["ess_rate"], 2),
        "unaligned_900x900_ess_spread": round(prod["ess_spread"], 3),
        "unaligned_900x900_ess_spread_ok": prod["ess_spread_ok"],
        "unaligned_900x900_acceptance": round(prod["acc"], 3),
        # small-scale (SGS) chain family, same keys
        "sgs_chain_iters_per_sec": round(sgs["rate"], 1),
        "sgs_vs_baseline": round(sgs["rate"] / (pin_sgs * cores), 2),
        "sgs_cpu_twin_pinned_it_per_sec_single_core": pin_sgs,
        "sgs_cpu_twin_fresh_it_per_sec_single_core": round(sgs_cpu_fresh, 3),
        "sgs_vs_baseline_fresh_twin": round(
            sgs["rate"] / max(sgs_cpu_farm_fresh, 1e-9), 2),
        "sgs_cpu_twin_contended": sgs_contended,
        "sgs_ess_loss_per_sec": round(sgs["ess_rate"], 2),
        "sgs_ess_spread": round(sgs["ess_spread"], 3),
        "sgs_ess_spread_ok": sgs["ess_spread_ok"],
        "sgs_rhat_loss": round(sgs["rhat"], 4),
        "sgs_loss_rel_dispersion": round(sgs["dispersion"], 4),
        "sgs_acceptance": round(sgs["acc"], 3),
        "sgs_n_chains": N_CHAINS_SGS,
        # SGS ESS-optimal operating point from the chain-count sweep
        # (VERDICT r4 next-#4; reference analog: farm sizing,
        # largeScaleChain_multiprocessing.py:461-464)
        "sgs_ess_optimal_n_chains": sgs_opt_nc,
        "sgs_ess_optimal_chain_iters_per_sec": round(sgs_opt["rate"], 1),
        "sgs_ess_optimal_ess_loss_per_sec": round(sgs_opt["ess_rate"], 2),
        "sgs_ess_optimal_ess_spread": round(sgs_opt["ess_spread"], 3),
        "sgs_ess_optimal_ess_spread_ok": sgs_opt["ess_spread_ok"],
        "sgs_ess_optimal_acceptance": round(sgs_opt["acc"], 3),
        "sgs_sweep_chains": list(SGS_SWEEP_CHAINS),
        "sgs_sweep_ess_loss_per_sec": [
            round(sgs_points[nc]["ess_rate"], 2) for nc in SGS_SWEEP_CHAINS],
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
