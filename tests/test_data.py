"""Data-layer tests: gridding, masks, QC, interpolation, dep gating."""

import numpy as np
import pandas as pd
import pytest

from mcmc_tpu.data import (
    filter_data_by_std,
    get_highvel_boundary,
    get_mass_conservation_residual,
    grid_data,
    interpolate,
    load_smb_racmo,
)


class TestGridData:
    def test_cell_averaging(self):
        df = pd.DataFrame({
            "x": [0.0, 0.0, 500.0, 1000.0, 10_000.0],
            "y": [0.0, 0.0, 0.0, 500.0, 0.0],  # last point out of domain
            "bed": [10.0, 20.0, 5.0, 7.0, 99.0],
        })
        df_grid, mat, rows, cols = grid_data(df, "x", "y", "bed", 500.0,
                                             0.0, 1000.0, 0.0, 1000.0)
        assert (rows, cols) == (3, 3)
        unflipped = np.flipud(mat)
        assert unflipped[0, 0] == pytest.approx(15.0)  # mean of 10, 20
        assert unflipped[0, 1] == pytest.approx(5.0)
        assert unflipped[1, 2] == pytest.approx(7.0)
        assert np.isnan(unflipped[2, 2])
        assert df_grid.shape[0] == rows * cols

    def test_matches_loop_reference(self, rng):
        """Vectorized accumulation == naive per-point loop."""
        n = 500
        df = pd.DataFrame({"x": rng.uniform(0, 5000, n),
                           "y": rng.uniform(0, 5000, n),
                           "z": rng.normal(size=n)})
        _, mat, rows, cols = grid_data(df, "x", "y", "z", 500.0,
                                       0.0, 5000.0, 0.0, 5000.0)
        gsum = np.zeros((rows, cols))
        gcount = np.zeros((rows, cols))
        for xi, yi, zi in zip(df.x, df.y, df.z):
            i = int(np.rint((yi - 0.0) / 500.0))
            j = int(np.rint((xi - 0.0) / 500.0))
            if i >= rows or j >= cols:
                continue
            gsum[i, j] += zi
            gcount[i, j] += 1
        with np.errstate(invalid="ignore"):
            want = np.flipud(gsum / gcount)
        np.testing.assert_allclose(mat, want, equal_nan=True)


class TestHighVelBoundary:
    def test_threshold_smooth_expand(self):
        H = W = 60
        res = 500.0
        xx, yy = np.meshgrid(np.arange(W) * res, np.arange(H) * res)
        velx = np.zeros((H, W))
        velx[20:40, 20:40] = 100.0
        vely = np.zeros_like(velx)
        grounded = np.ones((H, W), bool)
        ocean = np.zeros((H, W), bool)
        mask = get_highvel_boundary(velx, vely, 50.0, grounded, ocean,
                                    distance_max=2 * res, xx=xx, yy=yy,
                                    smooth_mode=3)
        assert mask[30, 30]          # inside high-vel region
        assert mask[30, 40]          # within expansion distance (dist=res)
        assert not mask[5, 5]        # far away
        # expansion bounded by distance_max (strict <, as in the reference)
        assert not mask[30, 44]


class TestResidualAndQC:
    def test_residual_is_numpy_twin(self, rng):
        a = {k: rng.normal(size=(10, 12)) for k in
             "bed surf velx vely dhdt smb".split()}
        from tests import reference_impl as ref

        got = get_mass_conservation_residual(
            a["bed"], a["surf"], a["velx"], a["vely"], a["dhdt"], a["smb"], 500.0)
        want = ref.mass_conservation_residual(
            a["bed"], a["surf"], a["velx"], a["vely"], a["dhdt"], a["smb"], 500.0)
        np.testing.assert_allclose(got, want)

    def test_filter_data_by_std(self):
        H = W = 4
        xx, yy = np.meshgrid(np.arange(W), np.arange(H))
        rf_bed = np.zeros((H, W))
        bed = np.array([0.1, -0.2, 5.0, np.nan, 0.0, -5.0, 0.3, 0.1,
                        2.0, 0.0, 0.0, 0.0, 0.1, 0.2, -0.1, 0.05])
        df = pd.DataFrame({
            "bed": bed,
            "bedmachine_mask": [2] * 14 + [3, 0],  # last two: shelf/ocean
        })
        cond = bed.reshape(H, W)
        out, rate, std = filter_data_by_std(df, rf_bed, cond, 1.0, xx, yy,
                                            shallow=False)
        # shelf/ocean rows always kept
        assert out.loc[14, "bedQCrf"] == pytest.approx(-0.1)
        assert out.loc[15, "bedQCrf"] == pytest.approx(0.05)
        # large outliers excluded
        assert np.isnan(out.loc[2, "bedQCrf"])
        assert np.isnan(out.loc[5, "bedQCrf"])
        assert 0 < rate < 0.5


class TestInterpolate:
    def test_linear_and_knn(self, rng):
        x = rng.uniform(0, 10, 200)
        y = rng.uniform(0, 10, 200)
        z = 2 * x + 3 * y
        tx, ty = np.meshgrid(np.linspace(1, 9, 5), np.linspace(1, 9, 5))
        out = interpolate("linear", x, y, z, tx.ravel(), ty.ravel())
        np.testing.assert_allclose(out, 2 * tx.ravel() + 3 * ty.ravel(),
                                   rtol=1e-6)
        out_knn = interpolate("kneighbors", x, y, z, tx.ravel(), ty.ravel(), k=1)
        assert out_knn.shape == (25,)
        with pytest.raises(ValueError):
            interpolate("bogus", x, y, z, tx, ty)


class TestGatedLoaders:
    def test_xarray_gate_message(self, tmp_path):
        with pytest.raises((ImportError, FileNotFoundError)) as ei:
            load_smb_racmo(tmp_path / "nope.nc", np.zeros((2, 2)),
                           np.zeros((2, 2)), 500.0)
        if isinstance(ei.value, ImportError):
            assert "xarray" in str(ei.value)

    def test_time_validation(self):
        with pytest.raises(ValueError):
            load_smb_racmo("x.nc", np.zeros((2, 2)), np.zeros((2, 2)), 500.0,
                           time=1900)


class TestCropStudyArea:
    def test_crop_matches_notebook_semantics(self):
        """cropStudyArea.ipynb workflow: strict x/y-range filter of the
        gridded CSV, reshaped per column."""
        import pandas as pd

        from mcmc_tpu.data import crop_study_area

        res = 500.0
        x = np.arange(0, 20) * res
        y = np.arange(0, 15) * res
        xx, yy = np.meshgrid(x, y)
        df = pd.DataFrame({"x": xx.ravel(), "y": yy.ravel(),
                           "bed": (xx + 2 * yy).ravel()})
        dfc, cxx, cyy, (rows, cols) = crop_study_area(
            df, (1000, 8000), (500, 6000))
        assert (rows, cols) == (len(np.unique(cyy)), len(np.unique(cxx)))
        assert np.all(cxx > 1000) and np.all(cxx < 8000)
        assert np.all(cyy > 500) and np.all(cyy < 6000)
        bed = dfc["bed"].to_numpy().reshape(rows, cols)
        np.testing.assert_allclose(bed, cxx + 2 * cyy)

    def test_crop_rejects_non_raster(self):
        import pandas as pd
        import pytest

        from mcmc_tpu.data import crop_study_area

        df = pd.DataFrame({"x": [0.0, 500.0, 500.0],
                           "y": [0.0, 0.0, 500.0], "bed": [1, 2, 3.0]})
        with pytest.raises(ValueError, match="raster"):
            crop_study_area(df, (-1, 1000), (-1, 1000))


class TestReferenceQuirkParity:
    """Round-3 review: observed-behavior parity for two reference quirks
    (SURVEY.md §8 policy — reproduce or document, never silently fix)."""

    def test_filter_shallow_keeps_two_sided_band(self):
        """Reference Topography.py:663 gates the band with `and (~shallow)`;
        ~True == -2 is truthy, so under shallow=True the band STILL keeps
        picks: effective rule = band OR bed < bedrf + 1.5*std."""
        H = W = 2
        xx, yy = np.meshgrid(np.arange(W), np.arange(H))
        rf_bed = np.zeros((H, W))
        # diff field -> std = 1 (bed used as cond too)
        bed = np.array([2.0, -0.5, -2.0, 1.0])
        df = pd.DataFrame({"bed": bed, "bedmachine_mask": [2] * 4})
        cond = np.array([[1.0, -1.0], [1.0, -1.0]])
        out, rate, std = filter_data_by_std(df, rf_bed, cond, 3.0, xx, yy,
                                            shallow=True)
        # bed=2.0 is above bedrf + 1.5*std but inside the ±3*std band:
        # the reference KEEPS it under shallow=True (the ~shallow quirk)
        assert out.loc[0, "bedQCrf"] == pytest.approx(2.0)
        # everything below +1.5*std kept by the shallow rule
        assert out.loc[1, "bedQCrf"] == pytest.approx(-0.5)
        assert out.loc[2, "bedQCrf"] == pytest.approx(-2.0)

    def test_grid_data_nan_picks_poison_cell(self):
        """Reference grid_data adds NaN picks into the cell sum; a cell
        with [NaN, 500.0] averages to NaN (no conditioning), it is NOT
        reduced to the finite picks."""
        df = pd.DataFrame({
            "x": [0.0, 0.0, 500.0],
            "y": [0.0, 0.0, 0.0],
            "bed": [np.nan, 500.0, 7.0],
        })
        _, mat, rows, cols = grid_data(df, "x", "y", "bed", 500.0,
                                       0.0, 500.0, 0.0, 500.0)
        unflipped = np.flipud(mat)
        assert np.isnan(unflipped[0, 0])  # poisoned by the NaN pick
        assert unflipped[0, 1] == pytest.approx(7.0)

    def test_grid_data_negative_indices_excluded(self):
        """Deliberate fix vs the reference (which wraps them to the far
        side): picks left/below the origin are dropped."""
        df = pd.DataFrame({
            "x": [-1000.0, 0.0],
            "y": [0.0, -1000.0],
            "bed": [123.0, 456.0],
        })
        _, mat, _, _ = grid_data(df, "x", "y", "bed", 500.0,
                                 0.0, 500.0, 0.0, 500.0)
        assert np.isnan(mat).all()


class TestMakeGrid:
    def test_cell_centered_raster_order(self):
        from mcmc_tpu.data.topography import make_grid

        coords, cols, rows = make_grid(0.0, 1000.0, 0.0, 500.0, 500.0)
        assert (cols, rows) == (3, 2)
        assert coords.shape == (6, 2)
        # x varies fastest (meshgrid raveled row-major), inclusive endpoints
        np.testing.assert_array_equal(coords[:, 0], [0, 500, 1000] * 2)
        np.testing.assert_array_equal(coords[:, 1], [0, 0, 0, 500, 500, 500])


def test_filter_data_by_std_plot_panels():
    """plot=True returns the 3-panel QC diagnostic figure
    (reference Topography.py:629-668)."""
    import matplotlib

    matplotlib.use("Agg")
    H = W = 4
    xx, yy = np.meshgrid(np.arange(W), np.arange(H))
    bed = np.linspace(-1, 1, H * W)
    df = pd.DataFrame({"bed": bed, "bedmachine_mask": [2] * (H * W)})
    out = filter_data_by_std(df, np.zeros((H, W)), bed.reshape(H, W), 1.0,
                             xx, yy, shallow=False, plot=True)
    assert len(out) == 4
    fig = out[3]
    assert len(fig.get_axes()) >= 3
    import matplotlib.pyplot as plt

    plt.close(fig)
