"""Raw-archive loader round-trip tests (reference Topography.py:36-527).

xarray / pyproj are not in this image, so the REAL loader functions are
driven end-to-end against minimal in-memory stand-ins injected into
sys.modules: a fake xarray (open_dataset / sel / isel semantics the loaders
use) and a fake pyproj (deterministic affine "reprojection").  Synthetic
fields are chosen linear in the projected coordinates so linear regridding
must reproduce them exactly up to interpolation tolerance — validating
window selection, time indexing, unit conversion, categorical-vs-continuous
regridding, and column handling against the reference semantics.
"""

import sys
import types

import numpy as np
import pytest

from mcmc_tpu.data import topography as topo


# --- minimal xarray stand-in --------------------------------------------------


class FakeVar:
    def __init__(self, values):
        self.values = np.asarray(values)

    # the loaders build boolean indexers like (ds.x > a) & (ds.x < b)
    def __gt__(self, other):
        return FakeVar(self.values > other)

    def __lt__(self, other):
        return FakeVar(self.values < other)

    def __and__(self, other):
        return FakeVar(self.values & np.asarray(getattr(other, "values", other)))


class FakeDataset:
    """Supports the exact access patterns the loaders use:
    .rlon/.rlat/.x/.y coords, ds.sel(x=bool, y=bool), ds.sel(time=slice),
    ds.isel(time=int), ds[name].values."""

    def __init__(self, coords, data):
        self._coords = {k: np.asarray(v) for k, v in coords.items()}
        self._data = {k: np.asarray(v) for k, v in data.items()}

    def __getattr__(self, name):
        if name in self._coords:
            return FakeVar(self._coords[name])
        raise AttributeError(name)

    def __getitem__(self, name):
        return FakeVar(self._data[name])

    def _axis_of(self, dim):
        # data arrays are (time?, y, x); x is last, y second-to-last
        return {"x": -1, "y": -2, "time": 0}[dim]

    def sel(self, **kw):
        coords = dict(self._coords)
        data = dict(self._data)
        for dim, idx in kw.items():
            if isinstance(idx, slice):  # time slice by date string
                t = coords[dim]
                lo = np.datetime64(idx.start) if idx.start else t[0]
                hi = np.datetime64(idx.stop) if idx.stop else t[-1]
                keep = (t >= lo) & (t <= hi)
            else:
                keep = np.asarray(getattr(idx, "values", idx), bool)
            coords[dim] = coords[dim][keep]
            ax = self._axis_of(dim)
            for k, v in data.items():
                if v.ndim >= abs(ax) and (dim != "time" or v.ndim == 3):
                    data[k] = np.compress(keep, v, axis=ax)
        return FakeDataset(coords, data)

    def isel(self, time=None):
        coords = dict(self._coords)
        data = {k: (v[time] if v.ndim == 3 else v) for k, v in self._data.items()}
        coords["time"] = coords["time"][time]
        return FakeDataset(coords, data)


def _install_fakes(monkeypatch, dataset):
    fake_xr = types.ModuleType("xarray")
    fake_xr.open_dataset = lambda path: dataset

    fake_pyproj = types.ModuleType("pyproj")

    class _CRS(str):
        @classmethod
        def from_epsg(cls, code):
            return cls(f"epsg:{code}")

    class _Transformer:
        @classmethod
        def from_crs(cls, a, b):
            return cls()

        def transform(self, a, b):
            # deterministic affine stand-in for the reprojection
            return np.asarray(a, float) * 1000.0, np.asarray(b, float) * 1000.0

    fake_pyproj.CRS = _CRS
    fake_pyproj.Transformer = _Transformer
    monkeypatch.setitem(sys.modules, "xarray", fake_xr)
    monkeypatch.setitem(sys.modules, "pyproj", fake_pyproj)


def _target_grid(n=16, res=500.0):
    x = np.arange(n) * res + 1000.0
    y = np.arange(n) * res + 2000.0
    return np.meshgrid(x, y)


class TestRacmo:
    def test_unit_conversion_time_index_and_regrid(self, monkeypatch):
        xx, yy = _target_grid()
        # rotated coords whose fake projection (x1000) covers the grid
        rlon = np.linspace(-2, 12, 30)
        rlat = np.linspace(-1, 11, 28)
        nt = 38  # 1979..2016
        lon, lat = np.meshgrid(rlon, rlat)
        x2, y2 = lon * 1000.0, lat * 1000.0
        # per-year smb linear in projected coords + year offset, mm w.e.
        years = np.arange(nt)
        smb = np.stack([(2.0 * x2 + 0.5 * y2 + 100.0 * t) for t in years])
        ds = FakeDataset({"rlon": rlon, "rlat": rlat, "time": years},
                         {"smb": smb})
        _install_fakes(monkeypatch, ds)

        out = topo.load_smb_racmo("fake.nc", xx, yy, 500.0, time=2015)
        # time index: reference picks isel(time=time-2016-1) = -2 for 2015
        want = (2.0 * xx + 0.5 * yy + 100.0 * (nt - 2)) / 920.0
        np.testing.assert_allclose(out, want, rtol=1e-6)

    def test_year_range_validated(self, monkeypatch):
        xx, yy = _target_grid()
        with pytest.raises(ValueError):
            topo.load_smb_racmo("fake.nc", xx, yy, 500.0, time=1950)


class TestDhdt:
    def test_year_pair_differencing(self, monkeypatch):
        xx, yy = _target_grid()
        x = np.linspace(0.0, 12000.0, 40)
        y = np.linspace(0.0, 12000.0, 36)
        x2, y2 = np.meshgrid(x, y)
        times = np.asarray(["2014-05-15", "2015-05-15", "2016-05-15"],
                           dtype="datetime64[D]")
        # height change grows 3 m/yr + spatial ramp
        h = np.stack([x2 * 1e-4 + 3.0 * t for t in range(3)])
        ds = FakeDataset({"x": x, "y": y, "time": times},
                         {"height_change": h})
        _install_fakes(monkeypatch, ds)
        out = topo.load_dhdt("fake.nc", xx, yy, 500.0, begin_year=2014,
                             month=5, end_year=2016)
        np.testing.assert_allclose(out, np.full_like(xx, 3.0), atol=1e-6)

    def test_argument_validation(self, monkeypatch):
        xx, yy = _target_grid()
        _install_fakes(monkeypatch, FakeDataset({}, {}))
        with pytest.raises(ValueError):
            topo.load_dhdt("f", xx, yy, 500.0, month=12)
        with pytest.raises(ValueError):
            topo.load_dhdt("f", xx, yy, 500.0, begin_year=2014, end_year=2014)


class TestVelMeasures:
    def test_four_fields_regridded(self, monkeypatch):
        xx, yy = _target_grid()
        x = np.linspace(0.0, 12000.0, 40)
        y = np.linspace(0.0, 12000.0, 36)
        x2, y2 = np.meshgrid(x, y)
        ds = FakeDataset({"x": x, "y": y}, {
            "VX": 0.01 * x2, "VY": 0.02 * y2,
            "ERRX": np.full_like(x2, 1.5), "ERRY": np.full_like(x2, 2.5)})
        _install_fakes(monkeypatch, ds)
        vx, vy, ex, ey = topo.load_vel_measures("fake.nc", xx, yy, 500.0)
        np.testing.assert_allclose(vx, 0.01 * xx, rtol=1e-6)
        np.testing.assert_allclose(vy, 0.02 * yy, rtol=1e-6)
        np.testing.assert_allclose(ex, 1.5)
        np.testing.assert_allclose(ey, 2.5)


class TestBedmachineBedmap:
    def test_categorical_nearest_continuous_linear(self, monkeypatch):
        xx, yy = _target_grid()
        x = np.linspace(0.0, 12000.0, 40)
        y = np.linspace(0.0, 12000.0, 36)
        x2, y2 = np.meshgrid(x, y)
        mask = (x2 > 6000).astype(float) * 2 + 1  # classes {1, 3}
        ds = FakeDataset({"x": x, "y": y}, {
            "mask": mask, "source": mask * 2,
            "bed": -500.0 + 0.01 * x2, "surface": 1000.0 + 0.02 * y2,
            "errbed": np.full_like(x2, 30.0)})
        _install_fakes(monkeypatch, ds)
        m, src, bed, surf, err = topo.load_bedmachine("fake.nc", xx, yy, 500.0)
        assert set(np.unique(m)) <= {1.0, 3.0}       # nearest: classes intact
        assert set(np.unique(src)) <= {2.0, 6.0}
        np.testing.assert_allclose(bed, -500.0 + 0.01 * xx, rtol=1e-5)
        np.testing.assert_allclose(surf, 1000.0 + 0.02 * yy, rtol=1e-5)
        np.testing.assert_allclose(err, 30.0)

    def test_bedmap_layout(self, monkeypatch):
        xx, yy = _target_grid()
        x = np.linspace(0.0, 12000.0, 40)
        y = np.linspace(0.0, 12000.0, 36)
        x2, y2 = np.meshgrid(x, y)
        ds = FakeDataset({"x": x, "y": y}, {
            "mask": np.ones_like(x2),
            "surface_topography": 1200.0 + 0.01 * x2,
            "bed_topography": -300.0 + 0.005 * y2,
            "bed_uncertainty": np.full_like(x2, 50.0)})
        _install_fakes(monkeypatch, ds)
        m, surf, bed, unc = topo.load_bedmap("fake.nc", xx, yy, 500.0)
        np.testing.assert_allclose(surf, 1200.0 + 0.01 * xx, rtol=1e-5)
        np.testing.assert_allclose(bed, -300.0 + 0.005 * yy, rtol=1e-5)
        np.testing.assert_allclose(unc, 50.0)


RADAR_HEADER = "\n".join(f"# header line {i}" for i in range(18)) + "\n"
RADAR_COLS = ("trajectory_id,trace_number,longitude (degree_east),"
              "latitude (degree_north),date,time_UTC,"
              "two_way_travel_time (m),aircraft_altitude (m),"
              "along_track_distance (m),land_ice_thickness (m),"
              "bedrock_altitude (m)\n")


class TestRadar:
    def test_compilation_projection_and_exclusion(self, monkeypatch, tmp_path):
        _install_fakes(monkeypatch, FakeDataset({}, {}))
        for i, rows in enumerate([
            ["t1,1,10.0,-70.0,2010-01-01,12:00,1,100,0,900,-450",
             "t1,2,10.1,-70.1,2010-01-01,12:01,1,100,1,900,-9999"],
            ["t2,1,11.0,-71.0,2011-01-01,13:00,1,100,0,800,-500"],
        ]):
            (tmp_path / f"campaign{i}.csv").write_text(
                RADAR_HEADER + RADAR_COLS + "\n".join(rows) + "\n")
        out_csv = tmp_path / "compiled.csv"
        kept, excluded = topo.load_radar(str(tmp_path), str(out_csv))

        assert len(kept) == 2 and len(excluded) == 1
        assert excluded["bedrock_altitude (m)"].iloc[0] == -9999
        # fake projection: x = lat*1000, y = lon*1000 (reference arg order)
        np.testing.assert_allclose(sorted(kept["x"]), [-71000.0, -70000.0])
        assert "bed" in kept.columns
        # dropped measurement columns are gone
        assert "two_way_travel_time (m)" not in kept.columns
        # metadata sidecar holds the 18 archived header lines per campaign
        meta = (tmp_path / "radar_metadata.txt").read_text()
        assert meta.count("# header line 0") == 2
        assert out_csv.exists()


class TestGeoid:
    def test_geoid_interpolation(self, monkeypatch, tmp_path):
        _install_fakes(monkeypatch, FakeDataset({}, {}))
        xx, yy = _target_grid()
        header = "".join(f"! geoid header {i}\n" for i in range(36))
        lat = np.linspace(-1, 12, 25)
        lon = np.linspace(-1, 12, 25)
        rows = []
        for a in lat:
            for b in lon:
                # anomaly linear in projected coords (x=lat*1000, y=lon*1000)
                rows.append(f"{b:.4f} {a:.4f} {2e-3 * a * 1000 + 1e-3 * b * 1000:.6f}")
        f = tmp_path / "egm.txt"
        f.write_text(header + "\n".join(rows) + "\n")
        out = topo.convert_geoid(str(f), xx, yy, res=500.0)
        np.testing.assert_allclose(out, 2e-3 * xx + 1e-3 * yy, rtol=1e-4)


class TestDiagnosticFigures:
    def test_loader_quicklook_figures(self, monkeypatch):
        """plot=True appends the reference-style two-panel figure
        (Topography.py:74-88)."""
        import matplotlib

        matplotlib.use("Agg", force=True)
        xx, yy = _target_grid()
        rlon = np.linspace(-2, 12, 30)
        rlat = np.linspace(-1, 11, 28)
        lon, lat = np.meshgrid(rlon, rlat)
        smb = np.stack([(lon * 1000.0) * 2.0 + t for t in range(38)])
        ds = FakeDataset({"rlon": rlon, "rlat": rlat, "time": np.arange(38)},
                         {"smb": smb})
        _install_fakes(monkeypatch, ds)
        out, fig = topo.load_smb_racmo("fake.nc", xx, yy, 500.0, plot=True)
        assert out.shape == xx.shape
        assert len(fig.axes) >= 2

    def test_qc_figure(self, monkeypatch):
        import matplotlib

        matplotlib.use("Agg", force=True)
        import pandas as pd

        rng = np.random.default_rng(0)
        xx, yy = _target_grid(8)
        rf = rng.normal(0, 10, xx.shape)
        cond = rf + rng.normal(0, 5, xx.shape)
        df = pd.DataFrame({
            "bed": rf.ravel() + rng.normal(0, 5, rf.size),
            "bedmachine_mask": np.full(rf.size, 2.0),
        })
        df2, rate, std, fig = topo.filter_data_by_std(
            df, rf, cond, 2.0, xx, yy, shallow=False, plot=True)
        assert "bedQCrf" in df2.columns and 0.0 <= rate <= 1.0
        assert len(fig.axes) >= 3


class TestLiveChainPlot:
    def test_live_plot_as_segment_callback(self):
        import matplotlib

        matplotlib.use("Agg", force=True)
        from mcmc_tpu.parallel import MultiChainSampler
        from mcmc_tpu.utils.plotting import LiveChainPlot
        from tests.conftest import make_synthetic_problem
        from tests.test_chain_crf import build_small_chain

        p = make_synthetic_problem(H=64, W=64)
        chain = build_small_chain(p)
        s = MultiChainSampler(chain, n_chains=2, use_mesh=False)
        st = s.init(seeds=0)
        plot = LiveChainPlot(show=False)
        s.run(st, n_iter=40, segment_size=10, progress=False,
              segment_callback=plot)
        xs = plot.line_loss.get_xdata()
        assert len(xs) == 4 and xs[-1] == 40
        assert np.all(np.isfinite(plot.line_loss.get_ydata()))
        accs = plot.line_acc.get_ydata()
        assert np.all((0 <= np.asarray(accs)) & (np.asarray(accs) <= 100))
