"""T2 equivalent — variogram analysis and SGS initial beds.

Reference workflow: T2_StatisticalAnalysis.ipynb — normal-score transform of
the conditioning bed, experimental variogram + model fits, and a set of
sequential-Gaussian-simulation initial beds bounded below the ice surface
(cells 13, 20-22; consumed per-chain by the large-scale drivers).
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from examples.synthetic_glacier import (  # noqa: E402
    example_out,
    make_dataset,
    quick_mode,
)

from mcmc_tpu.geostats import fit_variogram, generate_initial_beds  # noqa: E402

OUT = example_out(Path(__file__).with_name("data_out"))


def main():
    quick = quick_mode()
    hw = 64 if quick else 96
    ds = make_dataset(H=hw, W=hw)

    # --- variogram of the (transformed) conditioning bed -------------------
    m = ds["data_mask"]
    coords = np.column_stack([ds["xx"][m], ds["yy"][m]])
    nst, transformed, params, _ = fit_variogram(
        ds["cond_bed"][m], coords,
        maxlag=12e3 if quick else 40e3, n_lags=24 if quick else 40)
    names = ["gaussian", "exponential", "spherical", "matern"]
    for n, p in zip(names, params):
        print(f"{n:12s} range={p[0]:9.0f}  sill={p[1]:6.3f}  "
              + (f"s={p[2]:4.2f}" if n == "matern" else ""))

    # --- SGS initial beds, bounded below the surface ------------------------
    vario = dict(azimuth=0.0, nugget=0.0,
                 major_range=params[1][0], minor_range=params[1][0],
                 sill=params[1][1], vtype="Exponential")
    t0 = time.time()
    beds = generate_initial_beds(
        ds["xx"], ds["yy"], ds["cond_bed"], vario, surf=ds["surf"],
        n_beds=1 if quick else 2, radius=30e3, num_points=16, seed=11,
        chunk=128, half_window=16 if quick else 24)
    print(f"{len(beds)} SGS initial beds in {time.time() - t0:.1f}s")
    for i, b in enumerate(beds):
        viol = np.sum((ds["surf"] - b) <= 0)
        print(f"  bed {i}: std {b.std():7.1f} m, cells above surface: {viol}")
        np.save(OUT / f"sgs_initial_bed_{i}.npy", b)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
