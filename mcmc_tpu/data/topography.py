"""Physics & data layer: dataset loaders, gridding, masks, QC.

Host-side port of the reference data pipeline (reference:
gstatsMCMC/Topography.py).  Numerical processing is NumPy/SciPy/pandas;
heavyweight geo dependencies (xarray for NetCDF, pyproj for CRS transforms)
are imported lazily and gated with actionable errors — they are needed only
for raw-archive ingestion, never on the compute path.

Improvements over the reference (documented, tested):
- ``grid_data``: the per-point Python accumulation loop
  (Topography.py:475-483) is replaced by vectorized ``np.add.at``;
- ``get_highvel_boundary``: the O(N^2) brute-force distance loop
  (Topography.py:564-566) is replaced by an exact Euclidean distance
  transform, and PIL's ModeFilter by a scipy majority filter;
- ``convert_geoid``: the reference ignores its ``res`` argument and
  recomputes it from the grid (Topography.py:515); here the argument is
  honored (pass None to derive from the grid);
- diagnostic figures: the reference loaders ALWAYS build and return a
  two-panel matplotlib figure (e.g. Topography.py:74-88) and
  filter_data_by_std draws a 3-panel exclusion diagnostic (:629-668); here
  the same figures are produced on demand via ``plot=True`` (appended to
  the return tuple) so headless production runs pay nothing.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .interpolate import interpolate as _interp


def _require(module: str, purpose: str):
    try:
        return __import__(module)
    except ImportError as e:
        raise ImportError(
            f"{module} is required for {purpose}. It is not part of the "
            "compute path; install it in your data-prep environment "
            f"(conda/pip install {module})."
        ) from e


# --- raw-archive loaders (gated: xarray / pyproj) ----------------------------


def load_smb_racmo(dataset_path, xx, yy, res, time=2015,
                   interp_method="linear", k=1, plot=False):
    """RACMO yearly surface mass balance, reprojected to EPSG:3031 and
    regridded (reference Topography.py:36-89).  mm w.e./yr -> m ice eq./yr
    via the 920 kg/m^3 ice density the reference hard-codes.
    Returns the regridded smb array."""
    if not (1979 <= time <= 2016):
        raise ValueError("invalid value for time variable")
    xr = _require("xarray", "reading RACMO NetCDF")
    pyproj = _require("pyproj", "rotated-pole -> polar stereographic reprojection")

    ds = xr.open_dataset(dataset_path)
    crs_rotated = pyproj.CRS(
        "-m 57.295779506 +proj=ob_tran +o_proj=latlon +o_lat_p=-180.0 +lon_0=10.0")
    polar = pyproj.CRS.from_epsg(3031)
    tr = pyproj.Transformer.from_crs(crs_rotated, polar)
    lon, lat = np.meshgrid(ds.rlon.values, ds.rlat.values)
    x2, y2 = tr.transform(lon, lat)

    m = ((x2 > xx.min() - res * 200) & (x2 < xx.max() + res * 200)
         & (y2 > yy.min() - res * 200) & (y2 < yy.max() + res * 200))
    time_int = int(time - 2016 - 1)
    vals = ds.isel(time=time_int)["smb"].values.squeeze()[m] / 920.0
    out = _interp(interp_method, x2[m], y2[m], vals, xx.ravel(), yy.ravel(), k)
    out = out.reshape(np.shape(xx))
    if plot:
        from ..utils.plotting import quicklook

        return out, quicklook(xx, yy, out, x2[m], y2[m], vals,
                              f"{interp_method} interpolation", "m/yr")
    return out


def load_dhdt(dataset_path, xx, yy, res, interp_method="linear", k=1,
              begin_year=2014, month=5, end_year=2016, plot=False):
    """ITS_LIVE/NSIDC-0782 surface-height change rate between two year/month
    slices (reference Topography.py:107-152)."""
    xr = _require("xarray", "reading dhdt NetCDF")
    if not (1 <= month <= 11):
        raise ValueError("month must be in 1..11")
    if not (1950 <= begin_year <= 2020) or end_year < begin_year + 1:
        raise ValueError("invalid year range")
    ds = xr.open_dataset(dataset_path)
    ds = ds.sel(x=(ds.x > xx.min() - res * 20) & (ds.x < xx.max() + res * 20),
                y=(ds.y > yy.min() - res * 20) & (ds.y < yy.max() + res * 20))
    m0, m1 = str(month).zfill(2), str(month + 1).zfill(2)
    ref = ds.sel(time=slice(f"{begin_year}-{m0}-01", f"{begin_year}-{m1}-01"))
    later = ds.sel(time=slice(f"{end_year}-{m0}-01", f"{end_year}-{m1}-01"))
    dhdt = ((later["height_change"].values - ref["height_change"].values)
            / (int(end_year) - int(begin_year)))
    x2, y2 = np.meshgrid(ds.x.values, ds.y.values)
    out = _interp(interp_method, x2.ravel(), y2.ravel(), dhdt.ravel(),
                  xx.ravel(), yy.ravel(), k)
    out = out.reshape(np.shape(xx))
    if plot:
        from ..utils.plotting import quicklook

        return out, quicklook(xx, yy, out, x2, y2, dhdt,
                              f"{interp_method} interpolation", "m/yr")
    return out


def load_vel_measures(dataset_path, xx, yy, res, interp_method="linear", k=1,
                      plot=False):
    """MEaSUREs velocity + errors (reference Topography.py:169-202).
    Returns (velx, vely, velx_err, vely_err)."""
    xr = _require("xarray", "reading MEaSUREs NetCDF")
    ds = xr.open_dataset(dataset_path)
    ds = ds.sel(x=(ds.x > xx.min() - res * 20) & (ds.x < xx.max() + res * 20),
                y=(ds.y > yy.min() - res * 20) & (ds.y < yy.max() + res * 20))
    x2, y2 = np.meshgrid(ds.x.values, ds.y.values)

    def rg(name):
        return _interp(interp_method, x2.ravel(), y2.ravel(),
                       ds[name].values.ravel(), xx.ravel(), yy.ravel(),
                       k).reshape(np.shape(xx))

    vx, vy, ex, ey = rg("VX"), rg("VY"), rg("ERRX"), rg("ERRY")
    if plot:
        from ..utils.plotting import quicklook

        vmag = np.sqrt(np.square(vx) + np.square(vy))
        return vx, vy, ex, ey, quicklook(xx, yy, vmag, title="|v|",
                                         units="m/yr")
    return vx, vy, ex, ey


def load_bedmachine(dataset_path, xx, yy, res, interp_method="linear", k=1,
                    plot=False):
    """BedMachine mask/source/bed/surface/errbed; categorical layers use
    nearest-neighbor regridding (reference Topography.py:222-264)."""
    xr = _require("xarray", "reading BedMachine NetCDF")
    ds = xr.open_dataset(dataset_path)
    ds = ds.sel(x=(ds.x > xx.min() - res * 20) & (ds.x < xx.max() + res * 20),
                y=(ds.y > yy.min() - res * 20) & (ds.y < yy.max() + res * 20))
    x2, y2 = np.meshgrid(ds.x.values, ds.y.values)

    def rg(name, method):
        return _interp(method, x2.ravel(), y2.ravel(), ds[name].values.ravel(),
                       xx.ravel(), yy.ravel(), k).reshape(np.shape(xx))

    out = (rg("mask", "kneighbors"), rg("source", "kneighbors"),
           rg("bed", interp_method), rg("surface", interp_method),
           rg("errbed", interp_method))
    if plot:
        from ..utils.plotting import quicklook

        return (*out, quicklook(xx, yy, out[2], title="BedMachine bed",
                                units="m"))
    return out


def load_bedmap(dataset_path, xx, yy, res, interp_method="linear", k=1,
                plot=False):
    """Bedmap3 surface/bed/uncertainty/mask (reference Topography.py:285-323)."""
    xr = _require("xarray", "reading Bedmap NetCDF")
    ds = xr.open_dataset(dataset_path)
    ds = ds.sel(x=(ds.x > xx.min() - res * 20) & (ds.x < xx.max() + res * 20),
                y=(ds.y > yy.min() - res * 20) & (ds.y < yy.max() + res * 20))
    x2, y2 = np.meshgrid(ds.x.values, ds.y.values)

    def rg(name, method):
        return _interp(method, x2.ravel(), y2.ravel(), ds[name].values.ravel(),
                       xx.ravel(), yy.ravel(), k).reshape(np.shape(xx))

    out = (rg("mask", "kneighbors"), rg("surface_topography", interp_method),
           rg("bed_topography", interp_method),
           rg("bed_uncertainty", interp_method))
    if plot:
        from ..utils.plotting import quicklook

        return (*out, quicklook(xx, yy, out[2], title="Bedmap bed",
                                units="m"))
    return out


def load_radar(folder_path, output_csv, include_only_thickness_data=False):
    """Compile Bedmap2/3 radar CSV campaigns into one conditioning dataset
    (reference Topography.py:350-438): skip the 18-line campaign headers
    (archived to a metadata sidecar), reproject EPSG:4326 -> 3031, drop
    -9999 bed picks.  Returns (df_kept, df_excluded)."""
    pd = _require("pandas", "radar CSV compilation")
    pyproj = _require("pyproj", "lat/lon -> polar stereographic reprojection")
    if not os.path.isdir(folder_path):
        raise FileNotFoundError("the folder_path provided is not a directory")

    frames = []
    with open(os.path.join(folder_path, "radar_metadata.txt"), "a") as mf:
        for filename in sorted(os.listdir(folder_path)):
            if not filename.endswith(".csv"):
                continue
            path = os.path.join(folder_path, filename)
            with open(path) as fp:
                mf.write(filename + "\n")
                for _ in range(18):
                    mf.write(fp.readline())
                mf.write("\n")
            df = pd.read_csv(path, skiprows=18)
            df["file"] = filename
            frames.append(df)
    df = pd.concat(frames)

    tr = pyproj.Transformer.from_crs("epsg:4326", "epsg:3031")
    x, y = tr.transform(df["latitude (degree_north)"],
                        df["longitude (degree_east)"])
    df["x"], df["y"] = list(x), list(y)

    excluded = df[df["bedrock_altitude (m)"] == -9999].copy()
    kept = df[df["bedrock_altitude (m)"] != -9999].reset_index()
    kept = kept.rename(columns={"bedrock_altitude (m)": "bed"})
    drop = ["trajectory_id", "trace_number", "longitude (degree_east)",
            "latitude (degree_north)", "date", "time_UTC",
            "two_way_travel_time (m)", "aircraft_altitude (m)",
            "along_track_distance (m)", "land_ice_thickness (m)", "index"]
    kept = kept.drop(columns=[c for c in drop if c in kept.columns])
    kept.to_csv(output_csv, index=False, header=True)
    return kept, excluded


# --- gridding / geoid / masks (no gated deps) --------------------------------


def make_grid(xmin, xmax, ymin, ymax, res):
    """Cell-centered grid coordinates (cols-by-rows raster order)."""
    x = np.arange(xmin, xmax + res, res, dtype=float)
    y = np.arange(ymin, ymax + res, res, dtype=float)
    cols, rows = len(x), len(y)
    xx, yy = np.meshgrid(x, y)
    coords = np.column_stack([xx.ravel(), yy.ravel()])
    return coords, cols, rows


def crop_study_area(df, x_range, y_range, x_name="x", y_name="y"):
    """Crop a gridded per-glacier dataframe to a rectangular study area
    (the reference's cropStudyArea.ipynb workflow: boolean x/y-range
    filtering of the T1 compiled CSV, then reshape per column).

    Returns (df_cropped, xx, yy, (rows, cols)); any column can be
    rasterized with ``df_cropped[col].to_numpy().reshape(rows, cols)``.
    Bounds are half-open-agnostic: strictly-inside like the notebook
    (``x > x_range[0]`` etc.).
    """
    m = ((df[x_name] > x_range[0]) & (df[x_name] < x_range[1])
         & (df[y_name] > y_range[0]) & (df[y_name] < y_range[1]))
    dfc = df[m].copy()
    x_uniq = np.unique(dfc[x_name])
    y_uniq = np.unique(dfc[y_name])
    rows, cols = len(y_uniq), len(x_uniq)
    if rows * cols != len(dfc):
        raise ValueError(
            f"cropped frame is not a complete raster: {rows}x{cols} grid "
            f"vs {len(dfc)} rows — is the input the gridded T1 CSV?")
    xx, yy = np.meshgrid(x_uniq, y_uniq)
    # the reshape contract requires ascending y-major/x-minor row order
    # (what T1's grid_data writes); any other ordering — e.g. a north-up
    # y-descending export — would pass the size check but silently pair
    # values with the wrong coordinates, so verify instead of assuming
    if not (np.array_equal(dfc[x_name].to_numpy(float), xx.ravel())
            and np.array_equal(dfc[y_name].to_numpy(float), yy.ravel())):
        raise ValueError(
            "cropped frame rows are not in ascending y-major/x-minor "
            "raster order; sort with df.sort_values([y, x]) first (a "
            "north-up export is y-descending and must be re-sorted)")
    return dfc, xx, yy, (rows, cols)


def grid_data(df, x_name, y_name, z_name, res, xmin, xmax, ymin, ymax):
    """Average scattered measurements onto a square grid
    (reference Topography.py:457-498, itself adapted from GStatSim).

    Returns (df_grid, grid_matrix, rows, cols); grid_matrix is flipped
    up-down like the reference, NaN where a cell has no data.  NaN picks
    keep the reference's semantics: they poison their cell's sum (a cell
    containing any NaN pick — e.g. a QC-excluded bedQCrf row — averages
    to NaN, i.e. no conditioning there), they are NOT silently dropped.
    One deliberate fix vs the reference: picks left/below the origin get
    negative indices, which the reference lets WRAP to the far side of
    the grid (only ``>= rows/cols`` is checked, Topography.py:479-480);
    here they are excluded.
    """
    import pandas as pd

    d = df.rename(columns={x_name: "X", y_name: "Y", z_name: "Z"})[["X", "Y", "Z"]]
    coords, cols, rows = make_grid(xmin, xmax, ymin, ymax, res)

    xi = np.rint((d["Y"].to_numpy() - ymin) / res).astype(np.int64)
    yi = np.rint((d["X"].to_numpy() - xmin) / res).astype(np.int64)
    z = d["Z"].to_numpy(float)
    ok = (xi >= 0) & (xi < rows) & (yi >= 0) & (yi < cols)

    grid_sum = np.zeros((rows, cols))
    grid_count = np.zeros((rows, cols))
    np.add.at(grid_sum, (xi[ok], yi[ok]), z[ok])
    np.add.at(grid_count, (xi[ok], yi[ok]), 1.0)

    with np.errstate(invalid="ignore"):
        grid_matrix = grid_sum / grid_count

    df_grid = pd.DataFrame({
        "X": coords[:, 0], "Y": coords[:, 1],
        "Sum": grid_sum.ravel(), "Count": grid_count.ravel(),
        "Z": grid_matrix.ravel(),
    })
    return df_grid, np.flipud(grid_matrix), rows, cols


def convert_geoid(geoid_file_path, xx, yy, res=None):
    """EGM geoid height-anomaly interpolation onto the working grid
    (reference Topography.py:510-527)."""
    import pandas as pd

    pyproj = _require("pyproj", "geoid lat/lon reprojection")
    df = pd.read_csv(geoid_file_path, skiprows=36, header=None, sep=r"\s+",
                     names=["lon", "lat", "anomalyHeight"])
    if res is None:
        res = float(abs(xx[0, 0] - xx[1, 1]))
    tr = pyproj.Transformer.from_crs(pyproj.CRS.from_epsg(4326),
                                     pyproj.CRS.from_epsg(3031))
    x2, y2 = tr.transform(df.lat.values, df.lon.values)
    m = ((x2 < xx.max() + res * 20) & (x2 > xx.min() - res * 20)
         & (y2 < yy.max() + res * 20) & (y2 > yy.min() - res * 20))
    return _interp("linear", x2[m], y2[m], df.anomalyHeight.values[m],
                   xx.ravel(), yy.ravel(), 1).reshape(np.shape(xx))


def get_highvel_boundary(velx, vely, velmag_threshold, grounded_ice_mask,
                         ocean_mask, distance_max, xx, yy, smooth_mode=10):
    """High-velocity region mask: threshold |v| on grounded ice + ocean,
    majority-smooth the boundary, expand outward by ``distance_max``
    (reference Topography.py:546-571; the O(N^2) expansion loop replaced by
    an exact distance transform)."""
    from scipy.ndimage import distance_transform_edt, uniform_filter

    grounded = np.asarray(grounded_ice_mask) > 0
    mask = grounded & (np.sqrt(np.square(velx) + np.square(vely))
                       >= velmag_threshold)
    mask = mask | (np.asarray(ocean_mask) > 0)

    # binary majority filter == PIL ModeFilter on a 0/255 image
    frac = uniform_filter(mask.astype(float), size=smooth_mode)
    mask_sm = frac > 0.5

    inside = mask_sm & grounded
    if not inside.any():
        return np.zeros(np.shape(xx), bool)
    dy = float(abs(yy[1, 0] - yy[0, 0])) if yy.shape[0] > 1 else 1.0
    dx = float(abs(xx[0, 1] - xx[0, 0])) if xx.shape[1] > 1 else 1.0
    dist = distance_transform_edt(~inside, sampling=(dy, dx))
    return (dist < distance_max) & grounded


def get_mass_conservation_residual(bed, surf, velx, vely, dhdt, smb,
                                   resolution):
    """NumPy mass-conservation residual for data-prep / QC workflows
    (device version: mcmc_tpu.ops.physics; reference Topography.py:592-600)."""
    thick = np.asarray(surf) - np.asarray(bed)
    dx = np.gradient(velx * thick, resolution, axis=1)
    dy = np.gradient(vely * thick, resolution, axis=0)
    return dx + dy + dhdt - smb


def filter_data_by_std(df_in, rf_bed, cond_bed, num_of_std, xx, yy, shallow,
                       dfmaskname="bedmachine_mask", plot=False):
    """Radar QC: exclude picks deviating more than n std from a reference
    realization; ice-shelf/ocean rows always kept; ``shallow`` keeps only
    not-too-deep picks (reference Topography.py:615-672, vectorized).
    Adds a 'bedQCrf' column with the retained bed values."""
    df = df_in.copy()
    diff = np.asarray(rf_bed) - np.asarray(cond_bed)
    std = float(np.std(diff[~np.isnan(diff)]))

    df["bedQCrf"] = np.nan
    df["bedrf"] = np.asarray(rf_bed).ravel()
    mask_col = df[dfmaskname].to_numpy()
    bed = df["bed"].to_numpy(float)
    bedrf = df["bedrf"].to_numpy(float)

    shelf = (mask_col == 3) | (mask_col == 0)
    has_bed = ~np.isnan(bed)
    band = ((bed < bedrf + std * num_of_std)
            & (bed > bedrf - std * num_of_std))
    if shallow:
        # reference quirk reproduced (Topography.py:663-666): the
        # two-sided branch is gated by `and (~shallow)`, but on a Python
        # bool ~True == -2 is TRUTHY, so the band keeps firing under
        # shallow=True and the effective rule is band OR
        # bed < bedrf + 1.5*std (== everything below bedrf +
        # max(1.5, num_of_std)*std for the usual num_of_std >= 1.5)
        keep = band | (bed < bedrf + std * 1.5)
    else:
        keep = band
    take = shelf | (has_bed & keep)
    df.loc[take, "bedQCrf"] = df.loc[take, "bed"]
    n_excluded = int((has_bed & ~shelf & ~keep).sum())
    total = int(has_bed.sum())
    rate = n_excluded / total if total else 0.0
    if plot:
        from ..utils.plotting import qc_panels

        return df, rate, std, qc_panels(xx, yy, diff, std, num_of_std)
    return df, rate, std
