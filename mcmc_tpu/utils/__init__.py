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
from .domain import aligned_shape, pad_domain
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
    "aligned_shape",
    "pad_domain",
]
