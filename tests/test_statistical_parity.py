"""Statistical parity vs the NumPy reference twin.

Bitwise RNG parity is impossible across NumPy Generators and threefry keys
(SURVEY.md §7.3), so the vmapped/TPU chains are validated statistically:
same problem, same configuration -> acceptance rates and loss decay within
sampling bands of the twin running the reference algorithm.
"""

import numpy as np
import pytest

from mcmc_tpu.models import ChainCRF
from mcmc_tpu.models.randfield import make_block_menu
from mcmc_tpu.ops.logistic import make_edge_mask
from mcmc_tpu.ops.spectral import spectral_field, standardize_masked
from mcmc_tpu.utils.config import BlockMenuConfig, RandFieldConfig, WeightConfig
from tests import reference_impl as ref
from tests.conftest import make_synthetic_problem
from tests.test_chain_crf import build_small_chain


class TestChainStatistics:
    def test_acceptance_and_decay_match_twin(self):
        p = make_synthetic_problem(H=64, W=64)
        n_iter = 500

        # ours
        chain = build_small_chain(p, blocks=(8, 12))
        out = chain.run(n_iter=n_iter, seed=0)

        # twin with the same configuration
        blocks = BlockMenuConfig(8, 12, 8, 12, steps=2)
        pairs = make_block_menu(blocks)
        wc = WeightConfig(L=2.0, x0=0.0, k=6.0, offset=1.0, max_dist=5e3,
                          resolution=p["resolution"])
        edge_masks = [make_edge_mask(int(pairs[1, i]), int(pairs[0, i]),
                                     wc.resolution, wc.L, wc.x0, wc.k,
                                     wc.offset, wc.max_dist).astype(float)
                      for i in range(pairs.shape[1])]
        consts = dict(surf=p["surf"], velx=p["velx"], vely=p["vely"],
                      dhdt=p["dhdt"], smb=p["smb"],
                      update_mask=p["region"].astype(float),
                      mc_mask=p["region"].astype(float),
                      crf_weight=np.ones_like(p["surf"]),
                      sigma_mc=5.0, resolution=p["resolution"])
        rf_params = dict(model_name="Gaussian", isotropic=True,
                         smoothness=None, scale_min=20.0, scale_max=60.0,
                         nugget_max=0.0, range_min_x=3e3, range_max_x=8e3,
                         range_min_y=3e3, range_max_y=8e3,
                         resolution=p["resolution"])
        twin = ref.ReferenceCRFChain(consts, pairs, edge_masks, rf_params,
                                     seed=0)
        region_cells = np.argwhere(p["region"] == 1)
        _, twin_losses, twin_steps = twin.run(p["initial_bed"], n_iter,
                                              region_cells)

        acc_ours = out["steps"][1:].mean()
        acc_twin = twin_steps[1:].mean()
        # binomial 3-sigma band around the twin's rate
        band = 3 * np.sqrt(acc_twin * (1 - acc_twin) / n_iter) + 0.05
        assert abs(acc_ours - acc_twin) < band, (acc_ours, acc_twin)

        # comparable relative loss decay (within 3 percentage points or 30%)
        dec_ours = 1 - out["loss"][-1] / out["loss"][0]
        dec_twin = 1 - twin_losses[-1] / twin_losses[0]
        assert dec_ours == pytest.approx(dec_twin, abs=0.03, rel=0.5), (
            dec_ours, dec_twin)


class TestFieldStatistics:
    def test_spectral_field_variance_is_deterministic_scale(self):
        """Reference invariant: realized field variance == scale^2 exactly
        after standardization (SURVEY.md §8.11)."""
        import jax
        import jax.numpy as jnp

        key = jax.random.key(3)
        shape = (48, 48)
        raw = spectral_field(key, shape, 500.0, "Exponential", 6e3, 6e3, None)
        f = standardize_masked(raw, jnp.ones(shape, bool))
        f = np.asarray(f) * 42.0
        assert f.std() == pytest.approx(42.0, rel=1e-3)
        assert abs(f.mean()) < 1e-2

    def test_spectral_correlation_length_scales_with_range(self):
        """Longer variogram ranges -> slower autocorrelation decay."""
        import jax

        def corr_at_lag(range_m, lag):
            fs = jax.vmap(lambda k: spectral_field(
                k, (64, 64), 500.0, "Gaussian", range_m, range_m, None))(
                jax.random.split(jax.random.key(0), 24))
            fs = np.asarray(fs)
            a = fs[:, :, :-lag].ravel()
            b = fs[:, :, lag:].ravel()
            return np.corrcoef(a, b)[0, 1]

        short = corr_at_lag(3e3, 8)    # 4 km lag vs 3 km range
        long_ = corr_at_lag(20e3, 8)   # 4 km lag vs 20 km range
        assert long_ > short + 0.2
