from .config import (
    RandFieldConfig,
    BlockMenuConfig,
    WeightConfig,
    LossConfig,
    VariogramConfig,
    SGSParams,
    RunConfig,
    DriverConfig,
)
from .rng import as_key, split_for_chains

__all__ = [
    "RandFieldConfig",
    "BlockMenuConfig",
    "WeightConfig",
    "LossConfig",
    "VariogramConfig",
    "SGSParams",
    "RunConfig",
    "DriverConfig",
    "as_key",
    "split_for_chains",
]
