"""mcmc_tpu — TPU-native geostatistical MCMC framework.

A ground-up JAX/XLA re-design of the capabilities of gstatsMCMC
(tylerrleee/mcmc-gpu): Markov-chain Monte Carlo inversion of subglacial
topography with spatially-correlated random-field block proposals and a
mass-conservation Gaussian likelihood.

Layers
------
- ``mcmc_tpu.ops``       numeric kernels (covariance, kriging, neighbors,
                         spectral synthesis, physics, transforms)
- ``mcmc_tpu.models``    proposal engines + chain step functions (pure,
                         scan-able) for the large-scale (CRF) and
                         small-scale (SGS) chains
- ``mcmc_tpu.geostats``  field simulation: SGS initial beds, kriging maps,
                         variogram fitting
- ``mcmc_tpu.parallel``  multi-chain vmap/mesh sampler, convergence
                         diagnostics, grid-domain sharding (halo exchange)
- ``mcmc_tpu.data``      host-side data layer (loaders, gridding, masks)
- ``mcmc_tpu.io``        checkpoint / resume
- ``mcmc_tpu.utils``     typed configs, RNG helpers, progress reporting

Design stance: everything on the device hot path is functional and
statically shaped; ``lax.scan`` over iterations, ``vmap`` over chains,
``jax.sharding.Mesh`` over devices. See README.md.
"""

__version__ = "0.1.0"

from . import ops, models, geostats, parallel, io, utils  # noqa: F401

__all__ = ["ops", "models", "geostats", "parallel", "io", "utils", "__version__"]
