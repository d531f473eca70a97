"""Test configuration: force an 8-device CPU platform so multi-chip sharding
paths are exercised without TPU hardware (see SURVEY.md §4)."""

import os

# NOTE: this image pre-imports jax and registers a remote TPU backend via
# sitecustomize with JAX_PLATFORMS=axon in the environment; running tests
# against it would pay a network round-trip per op.  Force the local CPU
# backend (with 8 virtual devices for sharding tests) via jax.config, which
# still works after pre-import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def make_synthetic_problem(H=64, W=64, resolution=500.0, seed=0):
    """Small synthetic ice-stream-like dataset for chain tests.

    Smooth bed + surface well above it, divergence-bearing velocity field,
    mild dhdt/smb, a central update region, sparse conditioning data.
    """
    rng = np.random.default_rng(seed)
    x = np.arange(W) * resolution
    y = np.arange(H) * resolution
    xx, yy = np.meshgrid(x, y)
    Lx, Ly = W * resolution, H * resolution
    bed_true = (200 * np.sin(2 * np.pi * xx / Lx) * np.cos(2 * np.pi * yy / Ly)
                - 300.0)
    surf = 1500.0 + 0.5e-3 * xx + 200 * np.exp(-((xx - Lx / 2) ** 2 +
                                                 (yy - Ly / 2) ** 2) / (Lx / 3) ** 2)
    velx = 100.0 + 50 * np.sin(2 * np.pi * yy / Ly)
    vely = 20.0 * np.cos(2 * np.pi * xx / Lx)
    dhdt = mass_balance = np.zeros_like(xx)
    # residual of the true bed defines a consistent dhdt so the target is reachable
    from tests.reference_impl import mass_conservation_residual

    res_true = mass_conservation_residual(bed_true, surf, velx, vely,
                                          np.zeros_like(xx), np.zeros_like(xx),
                                          resolution)
    smb = res_true  # so the true bed has ~zero residual
    dhdt = np.zeros_like(xx)

    grounded = np.ones((H, W), bool)
    region = np.zeros((H, W), np.float32)
    region[H // 8: 7 * H // 8, W // 8: 7 * W // 8] = 1.0

    data_mask = (rng.random((H, W)) < 0.02)
    cond_bed = np.where(data_mask, bed_true, np.nan)

    initial_bed = bed_true + rng.normal(0, 80, size=(H, W))
    initial_bed = np.minimum(initial_bed, surf - 5.0)

    return dict(xx=xx, yy=yy, bed_true=bed_true, surf=surf, velx=velx,
                vely=vely, dhdt=dhdt, smb=smb, grounded=grounded,
                region=region, data_mask=data_mask, cond_bed=cond_bed,
                initial_bed=initial_bed, resolution=resolution)


@pytest.fixture
def synthetic_problem():
    return make_synthetic_problem()
