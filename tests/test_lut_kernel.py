"""Pallas LUT kernel vs NormalScoreLUT._lookup: identical arithmetic.

Runs the kernel in interpret mode on CPU; the real-TPU path is exercised by
the SGS drive and bench (ops/lut_kernel docstring has the measured 10x)."""

import numpy as np

import jax.numpy as jnp

from mcmc_tpu.ops.lut_kernel import lut_interp
from mcmc_tpu.ops.transforms import NormalScoreLUT, NormalScoreTransform


def _lut():
    rng = np.random.default_rng(0)
    nst = NormalScoreTransform.fit(rng.normal(120.0, 40.0, 5000), 500)
    return NormalScoreLUT.from_transform(nst)  # n = 4096


class TestLutInterp:
    def test_matches_xla_lookup_to_fma_ulp(self):
        """XLA contracts the lerp into an FMA, interpret-mode (and Mosaic)
        rounding may differ by the last ulp — same accepted class as the
        fused CRF kernel's reduction-order ulps (NOTES_ROUND4 §4)."""
        lut = _lut()
        rng = np.random.default_rng(1)
        # in-range, out-of-range (saturating), exact-node, NaN inputs
        x = np.concatenate([
            rng.uniform(-8.0, 8.0, 4000),
            np.asarray(lut.inv_lo) + np.arange(7) / np.asarray(lut.inv_scale),
            [np.nan, -1e9, 1e9, 0.0],
        ]).astype(np.float32)
        want = np.asarray(NormalScoreLUT._lookup(
            jnp.asarray(x), lut.inv_lo, lut.inv_scale, lut.inv_table))
        got = np.asarray(lut_interp(jnp.asarray(x), lut.inv_lo,
                                    lut.inv_scale, lut.inv_table,
                                    interpret=True))
        np.testing.assert_allclose(got, want, rtol=3e-7, atol=1e-4,
                                   equal_nan=True)

    def test_batch_shapes_and_padding(self):
        lut = _lut()
        rng = np.random.default_rng(2)
        for shape in [(3, 40, 40), (1,), (512, 7), (257, 129)]:
            x = jnp.asarray(rng.uniform(-7, 7, shape), jnp.float32)
            want = np.asarray(lut.inverse(x))
            got = np.asarray(lut_interp(x, lut.inv_lo, lut.inv_scale,
                                        lut.inv_table, interpret=True))
            assert got.shape == shape
            np.testing.assert_allclose(got, want, rtol=3e-7, atol=1e-4,
                                       equal_nan=True)
