"""Declarative experiment workflow — the CLI the reference never had.

The reference configures production runs as ``__main__`` constant blocks
inside its driver scripts (largeScaleChain_multiprocessing.py:451-646);
re-running an experiment means editing source. Here the same experiment is
a JSON (or TOML) file run by ``python -m mcmc_tpu <config>``, and
re-invoking the config resumes from its checkpoints.

This example writes the dataset archive + config file and invokes the CLI
twice: once to sample, once more with a larger ``n_iter`` to demonstrate
resume (the first run's iterations are reused, not recomputed).
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from examples.synthetic_glacier import (  # noqa: E402
    example_out,
    make_dataset,
    quick_mode,
)

OUT = example_out(Path(__file__).with_name("data_out"))


def main():
    quick = quick_mode()
    hw = 64 if quick else 256
    ds = make_dataset(H=hw, W=hw)

    np.savez(OUT / "experiment_dataset.npz",
             xx=ds["xx"], yy=ds["yy"], initial_bed=ds["initial_bed"],
             surf=ds["surf"], velx=ds["velx"], vely=ds["vely"],
             dhdt=ds["dhdt"], smb=ds["smb"], cond_bed=ds["cond_bed"],
             data_mask=ds["data_mask"], grounded=ds["grounded"],
             highvel_mask=ds["highvel_mask"], resolution=ds["resolution"])

    n1, n2 = (100, 200) if quick else (2000, 4000)
    cfg = {
        "family": "crf",
        "dataset": "experiment_dataset.npz",
        "update_region": {"in_region": True, "mask": "highvel_mask"},
        "loss": {"sigma_mc": 5.0, "mass_conv_in_region": True},
        "crf": {
            "update_type": "CRF_weight",
            "randfield": {"range_min_x": 5e3, "range_max_x": 50e3,
                          "range_min_y": 5e3, "range_max_y": 50e3,
                          "scale_min": 50.0, "scale_max": 150.0,
                          "nugget_max": 0.0, "model_name": "Matern",
                          "isotropic": True, "smoothness": 1.3},
            "blocks": ({"min_block_x": 12, "max_block_x": 24,
                        "min_block_y": 12, "max_block_y": 24, "steps": 3}
                       if quick else
                       {"min_block_x": 50, "max_block_x": 80,
                        "min_block_y": 50, "max_block_y": 80, "steps": 5}),
            "weight": {"L": 2, "x0": 0, "k": 6, "offset": 1,
                       "max_dist": 10e3 if quick else 30e3},
        },
        "farm": {"n_chains": 2 if quick else 8, "n_iter": n1,
                 "rng_seeds": 2026, "output_path": "cli_run",
                 "segment_size": 50 if quick else 1000},
        "save": {"final_beds": "cli_final_beds.npy",
                 "histories": "cli_histories.npz"},
    }
    cfg_path = OUT / "experiment.json"
    cfg_path.write_text(json.dumps(cfg, indent=2))

    def invoke():
        out = subprocess.run(
            [sys.executable, "-m", "mcmc_tpu", str(cfg_path), "--quiet"],
            capture_output=True, text=True,
            cwd=str(Path(__file__).resolve().parents[1]))
        if out.returncode != 0:
            raise RuntimeError(out.stderr[-2000:])

    print(f"run 1: {cfg['farm']['n_chains']} chains x {n1} iters")
    invoke()
    with np.load(OUT / "cli_histories.npz") as h:
        loss1 = h["loss"].copy()
    print(f"  loss {loss1[:, 0].mean():.4e} -> {loss1[:, -1].mean():.4e}")

    cfg["farm"]["n_iter"] = n2
    cfg_path.write_text(json.dumps(cfg, indent=2))
    print(f"run 2 (same config, n_iter={n2}): resumes from run 1")
    invoke()
    with np.load(OUT / "cli_histories.npz") as h:
        loss2 = h["loss"]
    assert loss2.shape[1] == n2
    assert np.array_equal(loss2[:, : n1], loss1), "resume must reuse run 1"
    print(f"  loss -> {loss2[:, -1].mean():.4e} "
          f"(first {n1} iters bitwise reused)")
    print("final beds:", OUT / "cli_final_beds.npy")


if __name__ == "__main__":
    main()
