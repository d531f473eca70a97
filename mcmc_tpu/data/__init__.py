from .interpolate import interpolate
from .topography import (
    convert_geoid,
    crop_study_area,
    filter_data_by_std,
    get_highvel_boundary,
    get_mass_conservation_residual,
    grid_data,
    load_bedmachine,
    load_bedmap,
    load_dhdt,
    load_radar,
    load_smb_racmo,
    load_vel_measures,
    make_grid,
)

__all__ = [
    "interpolate", "convert_geoid", "crop_study_area", "filter_data_by_std",
    "get_highvel_boundary", "get_mass_conservation_residual", "grid_data",
    "load_bedmachine", "load_bedmap", "load_dhdt", "load_radar",
    "load_smb_racmo", "load_vel_measures", "make_grid",
]
