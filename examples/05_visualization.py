"""Visualization equivalent — posterior summaries and diagnostics plots.

Reference workflow: visualization.ipynb — stitch per-seed results, plot
loss/acceptance traces, posterior mean/std maps, residual maps, and
variogram reproduction.  Renders to PNG (Agg backend).
"""

import sys
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from examples.synthetic_glacier import example_out, make_dataset  # noqa: E402

from mcmc_tpu.data import get_mass_conservation_residual  # noqa: E402
from mcmc_tpu.geostats import experimental_variogram  # noqa: E402
from mcmc_tpu.io import CheckpointManager  # noqa: E402

OUT = example_out(Path(__file__).with_name("data_out"))


def main():
    run_dir = OUT / "lsc_run" / "LargeScaleChain"
    ck = CheckpointManager(run_dir).load() if run_dir.exists() else None
    if ck is None:
        print("no checkpoint found — run examples/03_large_scale_chain.py first")
        return
    cum, states, hist, _ = ck
    ds = make_dataset(H=np.asarray(states.bed).shape[-2],
                      W=np.asarray(states.bed).shape[-1])
    beds = np.asarray(states.bed)

    fig, axes = plt.subplots(2, 3, figsize=(16, 9))
    ax = axes[0, 0]
    for i in range(min(beds.shape[0], 8)):
        ax.plot(hist["loss"][i], lw=0.8)
    ax.set_title(f"loss traces ({cum} iterations)")
    ax.set_yscale("log")

    ax = axes[0, 1]
    acc = np.cumsum(hist["step"], axis=1) / np.arange(1, hist["step"].shape[1] + 1)
    for i in range(min(beds.shape[0], 8)):
        ax.plot(acc[i], lw=0.8)
    ax.set_title("running acceptance rate")

    ax = axes[0, 2]
    im = ax.imshow(beds.mean(0), cmap="gist_earth")
    plt.colorbar(im, ax=ax)
    ax.set_title("posterior mean bed")

    ax = axes[1, 0]
    im = ax.imshow(beds.std(0), cmap="magma")
    plt.colorbar(im, ax=ax)
    ax.set_title("posterior std (chain spread)")

    ax = axes[1, 1]
    res = get_mass_conservation_residual(beds[0], ds["surf"], ds["velx"],
                                         ds["vely"], ds["dhdt"], ds["smb"],
                                         ds["resolution"])
    im = ax.imshow(res, cmap="RdBu", vmin=-20, vmax=20)
    plt.colorbar(im, ax=ax)
    ax.set_title("mass-conservation residual (chain 0)")

    ax = axes[1, 2]
    m = ds["data_mask"]
    coords = np.column_stack([ds["xx"][m], ds["yy"][m]])
    for vals, label in ((ds["cond_bed"][m], "radar data"),
                        (beds[0][m], "posterior sample")):
        bins, gamma, _ = experimental_variogram(coords, vals, maxlag=30e3,
                                                n_lags=25, max_points=1500)
        ax.plot(bins / 1e3, gamma, "o-", ms=3, label=label)
    ax.set_xlabel("lag [km]")
    ax.set_ylabel("semivariance")
    ax.set_title("variogram reproduction")
    ax.legend()

    fig.tight_layout()
    out_png = OUT / "summary.png"
    fig.savefig(out_png, dpi=110)
    print("wrote", out_png)

    # numeric convergence summary (needs >= 2 chains and a few samples)
    loss = np.asarray(hist["loss"])
    if loss.shape[0] >= 2 and loss.shape[1] >= 8:
        from mcmc_tpu.parallel import ess_bulk, ess_tail, rank_normalized_rhat

        post = loss[:, loss.shape[1] // 4:]  # drop the first quarter
        print(f"rank-normalized split R-hat (loss): "
              f"{float(rank_normalized_rhat(post)):.4f} (flag > 1.01)")
        print(f"ESS bulk / tail (loss): {float(ess_bulk(post)):.1f} / "
              f"{float(ess_tail(post)):.1f}")


if __name__ == "__main__":
    main()
