"""T3 equivalent — the large-scale (CRF) chain farm.

Reference workflow: T3_LargeScaleChain.ipynb + the production driver
largeScaleChain_multiprocessing.py __main__ (:451-646): conditional
random-field block proposals with logistic data weighting, Gaussian
mass-conservation likelihood in the high-velocity region, multi-chain farm
with checkpoint/resume, convergence diagnostics.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from examples.synthetic_glacier import (  # noqa: E402
    example_out,
    make_dataset,
    quick_mode,
)

from mcmc_tpu.data import get_mass_conservation_residual  # noqa: E402
from mcmc_tpu.drivers import iteration_batches, large_scale_chain_farm  # noqa: E402
from mcmc_tpu.models import ChainCRF  # noqa: E402
from mcmc_tpu.parallel import split_rhat  # noqa: E402
from mcmc_tpu.utils.config import (  # noqa: E402
    BlockMenuConfig,
    RandFieldConfig,
    WeightConfig,
)

OUT = example_out(Path(__file__).with_name("data_out"))


def main():
    quick = quick_mode()
    hw = 64 if quick else 256
    ds = make_dataset(H=hw, W=hw)
    res = ds["resolution"]

    chain = ChainCRF(ds["xx"], ds["yy"], ds["initial_bed"], ds["surf"],
                     ds["velx"], ds["vely"], ds["dhdt"], ds["smb"],
                     ds["cond_bed"], ds["data_mask"], ds["grounded"], res)
    chain.set_update_region(True, ds["highvel_mask"])
    chain.set_loss_type(sigma_mc=5.0, massConvInRegion=True)
    # quick mode shrinks the proposal geometry with the grid (the production
    # 50-80-cell block menu would span the whole 64-cell smoke domain)
    chain.configure_randfield(
        RandFieldConfig(range_min_x=5e3 if quick else 10e3, range_max_x=50e3,
                        range_min_y=5e3 if quick else 10e3, range_max_y=50e3,
                        scale_min=50.0, scale_max=150.0, nugget_max=0.0,
                        model_name="Matern", isotropic=True, smoothness=1.3),
        (BlockMenuConfig(12, 24, 12, 24, steps=3) if quick
         else BlockMenuConfig(50, 80, 50, 80, steps=5)),
        WeightConfig(L=2, x0=0, k=6, offset=1,
                     max_dist=10e3 if quick else 30e3, resolution=res))
    chain.set_update_type("CRF_weight")  # logistic conditioning to radar

    # quality baseline: the known true bed's mass-conservation loss
    # (the reference uses BedMachine for this line, T3 cells 32-35)
    res_true = get_mass_conservation_residual(
        ds["bed_true"], ds["surf"], ds["velx"], ds["vely"], ds["dhdt"],
        ds["smb"], res)
    baseline = np.sum(res_true[ds["highvel_mask"] == 1] ** 2) / 50.0
    print(f"reference-bed loss baseline: {baseline:.4e}")

    n_chains = 2 if quick else 8
    total_iter = 200 if quick else 4000
    results = None
    for batch in iteration_batches(total_iter):
        # the reference restarts the farm per batch; resume does that here
        results = large_scale_chain_farm(
            chain, n_chains=n_chains, rng_seeds=2026,
            n_iter=total_iter, output_path=OUT / "lsc_run",
            segment_size=100 if quick else 1000, quiet=True)
        break  # run_with_checkpointing already handles segmentation

    losses = np.stack([r[3] for r in results])
    steps = np.stack([r[4] for r in results])
    print(f"loss: {losses[:, 0].mean():.4e} -> {losses[:, -1].mean():.4e} "
          f"(baseline {baseline:.4e})")
    print(f"acceptance: {steps.mean(axis=1).round(3)}")
    print(f"split R-hat (loss): {float(split_rhat(losses[:, 1:])):.4f}")
    np.save(OUT / "lsc_final_beds.npy", np.stack([r[0] for r in results]))
    print("final beds saved to", OUT / "lsc_final_beds.npy")


if __name__ == "__main__":
    main()
