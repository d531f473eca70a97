"""MCMC_TPU_PRNG_IMPL knob (utils/rng.py): typed rbg keys end-to-end.

bench.py runs production under the counter-based "rbg" impl (the
Philox-class generator the torch reference effectively uses via cuRAND;
measured +8.8% CRF / +5.3% SGS step throughput on v5e-1, NOTES_ROUND5
§3b).  These tests pin that the knob (a) produces typed keys of the
chosen impl, (b) drives a finite deterministic chain run, and (c)
round-trips through the checkpoint's raw key-data with the impl intact.
"""

import numpy as np
import pytest

import jax

from mcmc_tpu.io import CheckpointManager
from mcmc_tpu.parallel import MultiChainSampler
from tests.conftest import make_synthetic_problem
from tests.test_chain_crf import build_small_chain


@pytest.fixture
def rbg_env(monkeypatch):
    monkeypatch.setenv("MCMC_TPU_PRNG_IMPL", "rbg")


def test_as_key_impl(rbg_env):
    from mcmc_tpu.utils.rng import as_key, wrap_key_data

    k = as_key(7)
    assert "rbg" in str(jax.random.key_impl(k))
    data = jax.random.key_data(k)
    assert data.shape == (4,)  # rbg key words (threefry is (2,))
    k2 = wrap_key_data(data)
    assert str(jax.random.key_impl(k2)) == str(jax.random.key_impl(k))


def test_chain_runs_and_is_deterministic(rbg_env):
    p = make_synthetic_problem(H=64, W=64)
    s = MultiChainSampler(build_small_chain(p), n_chains=2, use_mesh=False)

    def run():
        states = s.init(seeds=3)
        states, tr = s.run_segment(states, 15)
        return np.asarray(tr["loss"])

    a, b = run(), run()
    assert np.isfinite(a).all()
    np.testing.assert_array_equal(a, b)


def test_checkpoint_roundtrip_preserves_impl(rbg_env, tmp_path):
    p = make_synthetic_problem(H=64, W=64)
    s = MultiChainSampler(build_small_chain(p), n_chains=2, use_mesh=False)
    states = s.init(seeds=3)
    mgr = CheckpointManager(tmp_path)
    mgr.save(5, states, {"loss": np.zeros((2, 5))})
    _, loaded, _, _ = mgr.load()
    assert "rbg" in str(jax.random.key_impl(loaded.key))
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(loaded.key)),
        np.asarray(jax.random.key_data(states.key)))
