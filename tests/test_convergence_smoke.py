"""Quantitative convergence gates every round (reference T3 cells 58-74).

Runs examples/06_convergence_validation.py at its CPU scale in a
subprocess: loss-decay toward the truth baseline, acceptance bands, >=90%
baseline-gap closure by the CRF+SGS pipeline, posterior-mean RMSE
improvement, and variogram reproduction — previously these ran only when
someone executed the example on TPU.
"""

import os
import pathlib
import subprocess
import sys


def test_convergence_smoke():
    root = pathlib.Path(__file__).resolve().parents[1]
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = str(root)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable,
         str(root / "examples" / "06_convergence_validation.py")],
        capture_output=True, text=True, timeout=600, cwd=str(root), env=env)
    assert out.returncode == 0, (out.stdout, out.stderr[-2000:])
    assert "ALL PASS" in out.stdout, out.stdout


def test_unaligned_grid_example_smoke():
    """examples/07 end to end in a subprocess: auto-pad keeps results
    true-domain, pad cells inert, mismatched-padding resume rejected."""
    root = pathlib.Path(__file__).resolve().parents[1]
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = str(root)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable,
         str(root / "examples" / "07_unaligned_production_grid.py")],
        capture_output=True, text=True, timeout=600, cwd=str(root), env=env)
    assert out.returncode == 0, (out.stdout, out.stderr[-2000:])
    assert "[07] PASS" in out.stdout, out.stdout
