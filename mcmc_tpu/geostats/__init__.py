from .sgs import sgs, krige, generate_initial_beds
from .variogram import (
    experimental_variogram,
    fit_model,
    fit_variogram,
    variograms,
    MODELS,
)

__all__ = [
    "sgs",
    "krige",
    "generate_initial_beds",
    "experimental_variogram",
    "fit_model",
    "fit_variogram",
    "variograms",
    "MODELS",
]
