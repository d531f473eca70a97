"""End-to-end smoke of the T1->T4 + visualization example workflow.

Runs examples 01 -> 05 in order, in subprocesses, at quick scale
(MCMC_TPU_EXAMPLE_QUICK=1) with outputs redirected to a temp dir — the
reference's tutorial-as-integration-test strategy (SURVEY.md §4), executed
every round instead of only when someone runs the notebooks by hand.
Examples 06/07 have their own gated smokes (test_convergence_smoke.py).

The stage handoffs are part of the check: 03 writes the LSC checkpoint and
final beds, 04 refines those beds through the SSC farm, 05 renders the
posterior summary from 03's checkpoint.
"""

import os
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]


def _run(name, out_dir):
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = str(ROOT)
    env["JAX_PLATFORMS"] = "cpu"
    env["MCMC_TPU_EXAMPLE_QUICK"] = "1"
    env["MCMC_TPU_EXAMPLE_OUT"] = str(out_dir)
    env["MPLBACKEND"] = "Agg"
    out = subprocess.run(
        [sys.executable, str(ROOT / "examples" / name)],
        capture_output=True, text=True, timeout=600, cwd=str(ROOT), env=env)
    assert out.returncode == 0, (name, out.stdout, out.stderr[-2000:])
    return out.stdout


def test_examples_01_to_05_pipeline(tmp_path):
    out = tmp_path / "data_out"

    stdout = _run("01_load_data.py", out)
    assert (out / "GlacierDataGridded.csv").exists(), stdout
    assert "bed>surface picks: 0" in stdout

    stdout = _run("02_statistical_analysis.py", out)
    assert (out / "sgs_initial_bed_0.npy").exists(), stdout

    stdout = _run("03_large_scale_chain.py", out)
    assert (out / "lsc_final_beds.npy").exists(), stdout
    assert "split R-hat" in stdout

    stdout = _run("04_small_scale_chain.py", out)
    assert (out / "ssc_final_beds.npy").exists(), stdout

    stdout = _run("05_visualization.py", out)
    assert "no checkpoint found" not in stdout
    assert (out / "summary.png").exists(), stdout


def test_example_08_cli_experiment(tmp_path):
    out = tmp_path / "data_out"
    stdout = _run("08_cli_experiment.py", out)
    assert "bitwise reused" in stdout
    assert (out / "cli_final_beds.npy").exists(), stdout


def test_example_09_distributed_pod(tmp_path):
    out = tmp_path / "data_out"
    stdout = _run("09_distributed_pod.py", out)
    assert "round-trips through a single-host reader" in stdout
    assert (out / "pod_run" / "checkpoint_60.ok").exists(), stdout
