"""CLI experiment runner: config -> chain farm, resume, dry-run, errors."""

import json

import numpy as np
import pytest

from mcmc_tpu import cli
from tests.conftest import make_synthetic_problem


def _write_dataset(tmp_path, H=48, W=48):
    p = make_synthetic_problem(H=H, W=W)
    path = tmp_path / "dataset.npz"
    np.savez(path, xx=p["xx"], yy=p["yy"], initial_bed=p["initial_bed"],
             surf=p["surf"], velx=p["velx"], vely=p["vely"], dhdt=p["dhdt"],
             smb=p["smb"], cond_bed=p["cond_bed"], data_mask=p["data_mask"],
             grounded=p["grounded"], region=p["region"],
             resolution=p["resolution"])
    return p, path


def _crf_config(n_iter=20, segment=10):
    return {
        "family": "crf",
        "dataset": "dataset.npz",
        "update_region": {"in_region": True, "mask": "region"},
        "loss": {"sigma_mc": 5.0, "mass_conv_in_region": True},
        "crf": {
            "update_type": "RF",
            "randfield": {"range_min_x": 3e3, "range_max_x": 8e3,
                          "range_min_y": 3e3, "range_max_y": 8e3,
                          "scale_min": 20.0, "scale_max": 60.0,
                          "nugget_max": 0.0, "model_name": "Gaussian",
                          "isotropic": True},
            "blocks": {"min_block_x": 8, "max_block_x": 12,
                       "min_block_y": 8, "max_block_y": 12, "steps": 2},
            "weight": {"L": 2, "x0": 0, "k": 6, "offset": 1,
                       "max_dist": 5e3},
        },
        "farm": {"n_chains": 2, "n_iter": n_iter, "rng_seeds": 7,
                 "output_path": "run", "segment_size": segment},
        "save": {"final_beds": "beds.npy", "histories": "hist.npz"},
    }


def _sgs_config(n_iter=16, segment=8):
    return {
        "family": "sgs",
        "dataset": "dataset.npz",
        "update_region": {"in_region": True, "mask": "region"},
        "loss": {"sigma_mc": 5.0},
        "sgs": {
            "variogram": {"vtype": "Exponential", "range": 5e3,
                          "sill": 1.0, "nugget": 0.0},
            "params": {"num_neighbors": 32, "search_radius": 20e3},
            "blocks": {"min_x": 5, "max_x": 10, "min_y": 5, "max_y": 10},
            "trend": {"gaussian_sigma": 10.0},
            "normal_transform": {"n_quantiles": 300},
        },
        "farm": {"n_chains": 2, "n_iter": n_iter, "rng_seeds": [5, 6],
                 "lsc_rng_seed": 2026, "output_path": "run",
                 "segment_size": segment},
        "save": {"final_beds": "beds.npy"},
    }


def _write_config(tmp_path, cfg, name="exp.json"):
    path = tmp_path / name
    path.write_text(json.dumps(cfg))
    return path


class TestCLI:
    def test_crf_end_to_end_and_resume(self, tmp_path):
        _write_dataset(tmp_path)
        cfg_path = _write_config(tmp_path, _crf_config(n_iter=20))
        assert cli.main([str(cfg_path), "--quiet"]) == 0

        beds = np.load(tmp_path / "beds.npy")
        assert beds.shape == (2, 48, 48) and np.isfinite(beds).all()
        with np.load(tmp_path / "hist.npz") as h:
            loss1 = h["loss"].copy()
            assert loss1.shape == (2, 20)
            assert h["blocks_used"].shape == (2, 20, 4)

        # re-invoking with a longer run resumes: first 20 iters identical
        _write_config(tmp_path, _crf_config(n_iter=40))
        assert cli.main([str(cfg_path), "--quiet"]) == 0
        with np.load(tmp_path / "hist.npz") as h:
            loss2 = h["loss"]
        assert loss2.shape == (2, 40)
        np.testing.assert_array_equal(loss2[:, :20], loss1)

    def test_crf_matches_driver_api(self, tmp_path):
        """The CLI is a thin declarative layer: same numbers as calling
        the farm driver directly with the equivalent chain."""
        p, _ = _write_dataset(tmp_path)
        cfg_path = _write_config(tmp_path, _crf_config(n_iter=12))
        results = cli.run(cli.load_config(cfg_path), config_dir=tmp_path,
                          quiet=True)

        from tests.test_chain_crf import build_small_chain

        from mcmc_tpu.drivers import large_scale_chain_farm

        direct = large_scale_chain_farm(
            build_small_chain(p, blocks=(8, 12), block_type="RF"),
            n_chains=2, rng_seeds=7, n_iter=12,
            output_path=tmp_path / "direct", segment_size=10,
            progress=False, quiet=True)
        np.testing.assert_array_equal(results[0][3], direct[0][3])
        np.testing.assert_array_equal(results[1][0], direct[1][0])

    def test_sgs_end_to_end(self, tmp_path):
        _write_dataset(tmp_path)
        cfg_path = _write_config(tmp_path, _sgs_config())
        assert cli.main([str(cfg_path), "--quiet"]) == 0
        beds = np.load(tmp_path / "beds.npy")
        assert beds.shape == (2, 48, 48) and np.isfinite(beds).all()
        # nested reference-style run layout keyed by the parent seed
        assert (tmp_path / "run" / "LargeScaleChain" / "2026" /
                "SmallScaleChain").exists()

    def test_dry_run_validates_without_sampling(self, tmp_path, capsys):
        _write_dataset(tmp_path)
        cfg_path = _write_config(tmp_path, _crf_config())
        assert cli.main([str(cfg_path), "--dry-run"]) == 0
        assert "config OK" in capsys.readouterr().out
        assert not (tmp_path / "run").exists()
        assert not (tmp_path / "beds.npy").exists()

    def test_toml_config(self, tmp_path):
        _write_dataset(tmp_path)
        toml = tmp_path / "exp.toml"
        toml.write_text(
            'family = "crf"\n'
            'dataset = "dataset.npz"\n'
            "[update_region]\nin_region = true\nmask = \"region\"\n"
            "[loss]\nsigma_mc = 5.0\n"
            '[crf]\nupdate_type = "RF"\n'
            "[crf.randfield]\n"
            "range_min_x = 3e3\nrange_max_x = 8e3\n"
            "range_min_y = 3e3\nrange_max_y = 8e3\n"
            "scale_min = 20.0\nscale_max = 60.0\nnugget_max = 0.0\n"
            'model_name = "Gaussian"\n'
            "[crf.blocks]\n"
            "min_block_x = 8\nmax_block_x = 12\n"
            "min_block_y = 8\nmax_block_y = 12\nsteps = 2\n"
            "[crf.weight]\nL = 2\nx0 = 0\nk = 6\noffset = 1\nmax_dist = 5e3\n"
            "[farm]\nn_chains = 1\nn_iter = 8\nrng_seeds = 3\n"
            'output_path = "run"\nsegment_size = 8\n')
        assert cli.main([str(toml), "--quiet"]) == 0
        assert (tmp_path / "run" / "LargeScaleChain").exists()

    def test_config_errors(self, tmp_path):
        _, ds_path = _write_dataset(tmp_path)
        ds = cli.load_dataset(ds_path)

        with pytest.raises(ValueError, match="family"):
            cli.build_chain({"family": "nope"}, ds)
        with pytest.raises(ValueError, match="sigma_mc"):
            cli.build_chain(
                {"family": "crf", "update_region": {}, "loss": {}}, ds)
        with pytest.raises(ValueError, match="crf.randfield"):
            cli.build_chain({"family": "crf", "loss": {"sigma_mc": 5.0},
                             "crf": {"blocks": {}, "weight": {}}}, ds)
        with pytest.raises(ValueError, match="not in dataset"):
            cli.build_chain(
                {"family": "crf", "loss": {"sigma_mc": 5.0},
                 "update_region": {"in_region": True, "mask": "missing"}},
                ds)

    def test_initial_beds_config_relative_and_key_trim(self, tmp_path):
        p, ds_path = _write_dataset(tmp_path)
        ds = cli.load_dataset(ds_path)

        # file path resolves against the CONFIG directory, not the CWD
        beds = np.stack([p["initial_bed"]] * 3).astype(np.float32)
        np.save(tmp_path / "mybeds.npy", beds)
        got = cli._load_initial_beds(
            {"initial_beds": "mybeds.npy", "n_chains": 2}, ds, tmp_path)
        assert got.shape == (2, 48, 48)

        # dataset-key beds get the same n_chains trim + count check
        ds["beds16"] = beds
        got = cli._load_initial_beds(
            {"initial_beds": "beds16", "n_chains": 2}, ds, tmp_path)
        assert got.shape == (2, 48, 48)
        with pytest.raises(ValueError, match="3 beds for n_chains=4"):
            cli._load_initial_beds(
                {"initial_beds": "beds16", "n_chains": 4}, ds, tmp_path)

    def test_dry_run_checks_initial_beds_path(self, tmp_path):
        _write_dataset(tmp_path)
        cfg = _crf_config()
        cfg["farm"]["initial_beds"] = "does_not_exist.npy"
        cfg_path = _write_config(tmp_path, cfg)
        with pytest.raises(FileNotFoundError):
            cli.main([str(cfg_path), "--dry-run", "--quiet"])

    def test_missing_leaf_keys_are_descriptive(self, tmp_path):
        _, ds_path = _write_dataset(tmp_path)
        ds = cli.load_dataset(ds_path)
        cfg = _sgs_config()
        del cfg["sgs"]["variogram"]["vtype"]
        with pytest.raises(ValueError, match="sgs.variogram is missing"):
            cli.build_chain(cfg, ds)
        cfg = _sgs_config()
        del cfg["sgs"]["params"]["search_radius"]
        with pytest.raises(ValueError, match="sgs.params is missing"):
            cli.build_chain(cfg, ds)
        cfg = _sgs_config()
        del cfg["sgs"]["blocks"]["max_y"]
        with pytest.raises(ValueError, match="sgs.blocks is missing"):
            cli.build_chain(cfg, ds)

    def test_summary_skips_rhat_on_tiny_histories(self, capsys):
        # 4-iteration histories leave 1-sample half-chains after the
        # burn-in slice; the R-hat line must be omitted, not NaN
        results = [(np.zeros((4, 4)), None, None,
                    np.linspace(1, 0, 4), np.ones(4), None, None)
                   for _ in range(2)]
        cli._print_summary(results)
        out = capsys.readouterr().out
        assert "R-hat" not in out and "nan" not in out

    def test_dataset_validation(self, tmp_path):
        bad = tmp_path / "bad.npz"
        np.savez(bad, xx=np.zeros((4, 4)))
        with pytest.raises(ValueError, match="missing required arrays"):
            cli.load_dataset(bad)

    def test_dataset_resolution_inferred(self, tmp_path):
        p = make_synthetic_problem(H=48, W=48)
        path = tmp_path / "nores.npz"
        np.savez(path, **{k: p[k] for k in
                          ("xx", "yy", "initial_bed", "surf", "velx", "vely",
                           "dhdt", "smb", "cond_bed", "data_mask",
                           "grounded")})
        ds = cli.load_dataset(path)
        assert ds["resolution"] == pytest.approx(p["resolution"])


class TestInfo:
    """`mcmc-tpu config --info`: resume status without building/sampling
    (the readable counterpart of the reference's current_iter.txt)."""

    def test_info_fresh_dir(self, tmp_path, capsys):
        _write_dataset(tmp_path)
        cfg_path = _write_config(tmp_path, _crf_config(n_iter=20))
        assert cli.main([str(cfg_path), "--info"]) == 0
        out = capsys.readouterr().out
        assert "no complete checkpoint" in out
        assert "family=crf" in out and "target n_iter=20" in out

    def test_info_after_run_and_manifest(self, tmp_path, capsys):
        _write_dataset(tmp_path)
        cfg_path = _write_config(tmp_path, _crf_config(n_iter=20))
        assert cli.main([str(cfg_path), "--quiet"]) == 0
        capsys.readouterr()
        assert cli.main([str(cfg_path), "--info"]) == 0
        out = capsys.readouterr().out
        assert "checkpoint @ iter 20: single" in out, out
        assert "resume: complete (20/20)" in out, out
        # per-segment files; the spans tile the full 0..20 row range
        # (segment 1 carries the initial-state row, hence 0..11)
        assert "trace history rows: 0..11, 11..20" in out, out

        # a longer target reports the remaining count
        _write_config(tmp_path, _crf_config(n_iter=50))
        assert cli.main([str(cfg_path), "--info"]) == 0
        out = capsys.readouterr().out
        assert "resume: 20/50 done, 30 remaining" in out, out

        # the public manifest agrees with what load() would resume from
        from mcmc_tpu.io.checkpoint import CheckpointManager

        mgr = CheckpointManager(tmp_path / "run" / "LargeScaleChain")
        man = mgr.manifest()
        assert [c["iter"] for c in man["checkpoints"]] == [20]
        assert man["checkpoints"][-1]["layout"] == "single"
        assert man["checkpoints"][-1]["bytes"] > 0
        assert man["history_spans"] == [(0, 11), (11, 20)]
        assert mgr.latest_iter() == 20
