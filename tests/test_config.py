"""Typed config dataclasses (utils/config.py) — validation semantics and
the GPU driver's phantom ``config`` module made first-class
(reference largeScaleChain_multiprocessing_GPU.py:19,491,563,581-584)."""

import dataclasses

import pytest

from mcmc_tpu.utils.config import (
    DriverConfig,
    LossConfig,
    RandFieldConfig,
    SGSParams,
    VariogramConfig,
)


class TestValidation:
    def test_randfield_rejects_bad_model(self):
        with pytest.raises(ValueError, match="model_name"):
            RandFieldConfig(1e3, 2e3, 1e3, 2e3, 10.0, 20.0, 0.0,
                            model_name="Cubic")

    def test_randfield_matern_needs_smoothness(self):
        # the reference raises the same way (MCMC.py RandField.__init__)
        with pytest.raises(ValueError, match="smoothness"):
            RandFieldConfig(1e3, 2e3, 1e3, 2e3, 10.0, 20.0, 0.0,
                            model_name="Matern")

    def test_randfield_range_ordering(self):
        with pytest.raises(ValueError, match="range"):
            RandFieldConfig(5e3, 2e3, 1e3, 2e3, 10.0, 20.0, 0.0,
                            model_name="Gaussian")

    def test_loss_sigma_positive(self):
        with pytest.raises(ValueError, match="sigma_mc"):
            LossConfig(sigma_mc=0.0)

    def test_variogram_matern_needs_positive_smoothness(self):
        with pytest.raises(ValueError, match="smoothness"):
            VariogramConfig("Matern", 4e3, 4e3, 1.0, 0.0)
        with pytest.raises(ValueError, match="vtype"):
            VariogramConfig("Cauchy", 4e3, 4e3, 1.0, 0.0)

    def test_variogram_isotropic_helper(self):
        v = VariogramConfig.isotropic("Exponential", 4e3, 1.2, 0.1)
        assert v.major_range == v.minor_range == 4e3
        assert v.azimuth == 0.0

    def test_sgs_dropout_zeroed_when_off(self):
        # reference set_sgs_param stores the rate but dropout only acts
        # when rand_dropout_on (MCMC.py:1545-1561)
        p = SGSParams(num_neighbors=48, search_radius=30e3,
                      rand_dropout_on=False, dropout_rate=0.5)
        assert p.dropout_rate == 0.0
        p_on = SGSParams(48, 30e3, rand_dropout_on=True, dropout_rate=0.5)
        assert p_on.dropout_rate == 0.5


class TestPhantomDriverConfig:
    """Every field the GPU driver imports from its absent ``config`` module
    must exist here with the production defaults."""

    def test_phantom_fields_first_class(self):
        names = {f.name for f in dataclasses.fields(DriverConfig)}
        assert {"resolution", "sigma3", "T3_xmin_block", "T3_xmax_block",
                "T3_ymin_block", "T3_ymax_block"} <= names
        c = DriverConfig()
        assert c.resolution == 500.0       # T1 grid resolution
        assert c.sigma3 == 5.0             # sigma_mc=5 production value
        assert (c.T3_xmin_block, c.T3_xmax_block) == (50, 80)
