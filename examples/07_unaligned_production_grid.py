"""Unaligned production grids — transparent alignment auto-padding.

The reference's T1 production domain is 900x900 cells
(T1_LoadData.ipynb cells 9-11: -1600250..-1150250 x -650250..-200250 at
500 m), which does not fit the fused Pallas kernel's DMA-aligned window
geometry (needs H % 8 == 0 and W % 128 == 0, or full-dimension windows).
`MultiChainSampler` handles this transparently on TPU: the configured
chain's grid planes are padded to the aligned shape (904x1024) with
INERT cells — masks zero, conditioning data absent, coordinates ramped —
so the padded chain samples an equivalent trajectory on the true domain
while running the fused kernel (~5.8x the unpadded XLA fallback on the
900-grid; NOTES_ROUND3.md).

This example runs a scaled-down unaligned domain (CPU-friendly) with
auto_pad="force" so the same code path executes everywhere, and shows
the three things a user must know:

  1. traces (loss/step/samples, collected beds) come back on the TRUE
     domain — no user-visible padding;
  2. raw state arrays stay padded — slice with ``sampler.unpad(...)``;
  3. checkpoints remember the padding (resuming with a mismatched
     sampler raises a clear error instead of an opaque shape crash).

Run: PYTHONPATH=. python examples/07_unaligned_production_grid.py
"""

import sys
import tempfile
import warnings
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from examples.synthetic_glacier import make_dataset  # noqa: E402

from mcmc_tpu.io import run_with_checkpointing  # noqa: E402
from mcmc_tpu.models import ChainCRF  # noqa: E402
from mcmc_tpu.parallel import MultiChainSampler  # noqa: E402
from mcmc_tpu.utils.config import (  # noqa: E402
    BlockMenuConfig,
    RandFieldConfig,
    WeightConfig,
)

# 180x225: 180 % 8 = 4 and 225 % 128 = 97 — unaligned in both dims, like
# the reference's 900x900 production grid (a 1/5-linear-scale stand-in)
H, W = 180, 225
N_CHAINS = 4
N_ITER = 400


def build_chain(ds):
    res = ds["resolution"]
    chain = ChainCRF(ds["xx"], ds["yy"], ds["initial_bed"], ds["surf"],
                     ds["velx"], ds["vely"], ds["dhdt"], ds["smb"],
                     ds["cond_bed"], ds["data_mask"], ds["grounded"], res)
    chain.set_update_region(True, ds["highvel_mask"])
    chain.set_loss_type(sigma_mc=5.0, massConvInRegion=True)
    chain.configure_randfield(
        RandFieldConfig(10e3, 50e3, 10e3, 50e3, scale_min=50, scale_max=150,
                        nugget_max=0.0, model_name="Matern", isotropic=True,
                        smoothness=1.3),
        BlockMenuConfig(20, 32, 20, 32, steps=3),
        WeightConfig(L=2, x0=0, k=6, offset=1, max_dist=30e3,
                     resolution=res))
    chain.set_update_type("CRF_weight")
    chain.set_crf_data_weight()
    return chain


def main():
    ds = make_dataset(H=H, W=W)
    # keep the update region off the east/south boundary: padding there
    # would change the boundary loss stencils, so auto-pad refuses
    # boundary-touching regions (the production high-velocity region is
    # interior anyway)
    region = np.asarray(ds["highvel_mask"], np.float32).copy()
    region[-1, :] = 0.0
    region[:, -1] = 0.0
    ds["highvel_mask"] = region

    with warnings.catch_warnings(record=True) as ws:
        warnings.simplefilter("always")
        # auto_pad="force" pads on any platform; on a real TPU the default
        # auto_pad=True does this automatically whenever the fused path
        # would otherwise be lost
        sampler = MultiChainSampler(build_chain(ds), n_chains=N_CHAINS,
                                    use_mesh=False, auto_pad="force")
    pad_msgs = [str(w.message) for w in ws if "auto-padded" in str(w.message)]
    assert pad_msgs, "expected the auto-pad warning"
    print(f"[07] {pad_msgs[0].splitlines()[0]}")
    assert sampler.padded
    Hp, Wp = sampler.static.H, sampler.static.W
    print(f"[07] true domain {H}x{W}, padded compute domain {Hp}x{Wp}")

    with tempfile.TemporaryDirectory() as tmp:
        ckdir = Path(tmp) / "ck"
        states, hist, done = run_with_checkpointing(
            sampler, N_ITER, ckdir, seeds=42, segment_size=100)
        loss = hist["loss"]
        print(f"[07] {done} iters x {N_CHAINS} chains: loss "
              f"{loss[:, 0].mean():.4e} -> {loss[:, -1].mean():.4e}, "
              f"acc {hist['step'][:, 1:].mean():.3f}")
        assert loss[:, -1].mean() < loss[:, 0].mean(), "loss must decay"

        # 1. user-visible results are true-domain
        final_beds = sampler.unpad(states.bed)
        assert final_beds.shape == (N_CHAINS, H, W)
        # 2. raw state stays padded; pad cells never move
        raw = np.asarray(states.bed)
        assert raw.shape == (N_CHAINS, Hp, Wp)
        init_padded = np.asarray(sampler.chain.initial_bed)
        np.testing.assert_array_equal(raw[:, H:, :],
                                      np.broadcast_to(init_padded[H:, :],
                                                      (N_CHAINS, Hp - H, Wp)))
        print("[07] pad rows bitwise untouched after sampling; "
              "results returned on the true domain")

        # 3. resuming with mismatched padding fails loudly, not opaquely
        plain = MultiChainSampler(build_chain(ds), n_chains=N_CHAINS,
                                  use_mesh=False, auto_pad=False)
        try:
            run_with_checkpointing(plain, 2 * N_ITER, ckdir, seeds=42,
                                   segment_size=100)
        except ValueError as e:
            assert "padding" in str(e)
            print("[07] mismatched-padding resume correctly rejected:")
            print(f"     {str(e).splitlines()[0]}")
        else:
            raise AssertionError("mismatched resume should have raised")

        # machine-readable summary for tests/test_convergence_smoke.py
        import json
        print("[07] STATS " + json.dumps({
            "loss_initial": float(loss[:, 0].mean()),
            "loss_final": float(loss[:, -1].mean()),
            "acceptance": float(hist["step"][:, 1:].mean()),
        }))

    print("[07] PASS")


if __name__ == "__main__":
    main()
