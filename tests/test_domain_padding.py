"""pad_domain: alignment padding must not change the sampled dynamics.

The reference tutorial's production domain is 900x900 (T1 cells 9-11),
which is not DMA-alignable (900 % 8 != 0) — the fused Pallas path needs
H % 8 == 0 and W % 128 == 0.  pad_domain extends the domain with inert
cells; for an interior update region the padded chain must take exactly
the same trajectory as the unpadded one.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mcmc_tpu.models.chain_crf import make_batched_step_fused, make_step
from mcmc_tpu.parallel.sampler import init_states
from mcmc_tpu.utils.domain import aligned_shape, pad_domain
from tests.conftest import make_synthetic_problem
from tests.test_chain_crf import build_small_chain

H, W = 60, 150  # 60 % 8 = 4, 150 % 128 = 22: both dims unaligned


def test_aligned_shape():
    assert aligned_shape(60, 150) == (64, 256)
    assert aligned_shape(512, 512) == (512, 512)
    assert aligned_shape(900, 900) == (904, 1024)
    assert aligned_shape(1, 1) == (8, 128)


def test_pad_values_and_unpad():
    p = make_synthetic_problem(H=H, W=W)
    padded, unpad = pad_domain(p, p["resolution"])
    Hp, Wp = padded["surf"].shape
    assert (Hp, Wp) == (64, 256)
    res = p["resolution"]
    # coordinate ramps continue linearly into the pad
    np.testing.assert_allclose(np.diff(padded["xx"][0]), res)
    np.testing.assert_allclose(np.diff(padded["yy"][:, 0]), res)
    # masks are inert in the pad
    assert padded["region"][:, W:].sum() == 0
    assert padded["region"][H:, :].sum() == 0
    assert not padded["data_mask"][:, W:].any()
    assert np.isnan(padded["cond_bed"][:, W:]).all()
    # consts edge-replicate
    np.testing.assert_array_equal(padded["surf"][:H, W:],
                                  np.repeat(p["surf"][:, -1:], Wp - W, axis=1))
    # unpad round-trips
    np.testing.assert_array_equal(unpad(padded["surf"]), p["surf"])
    # region cell sets (and their row-major order) are identical
    np.testing.assert_array_equal(np.argwhere(padded["region"] == 1),
                                  np.argwhere(p["region"] == 1))


def test_pad_is_noop_when_aligned():
    p = make_synthetic_problem(H=64, W=128)
    padded, unpad = pad_domain(p, p["resolution"])
    assert padded["surf"].shape == (64, 128)
    np.testing.assert_array_equal(unpad(padded["surf"]), p["surf"])


class TestPaddedDynamicsEquivalence:
    def test_padded_fused_matches_unpadded_xla(self):
        """Same keys, interior region: the padded fused step and the
        unpadded XLA step must sample the same trajectory (loss/accept),
        and beds must agree on the true domain."""
        p = make_synthetic_problem(H=H, W=W)
        pp, unpad = pad_domain(p, p["resolution"])
        pp["resolution"] = p["resolution"]

        chain_u = build_small_chain(p)
        chain_p = build_small_chain(pp)
        static_u, consts_u = chain_u.build()
        static_p, consts_p = chain_p.build()
        assert int(static_u.n_region) == int(static_p.n_region)

        keys = jax.random.split(jax.random.key(9), 4)
        beds_u = jnp.broadcast_to(
            jnp.asarray(p["initial_bed"], jnp.float32), (4, H, W))
        beds_p = jnp.broadcast_to(
            jnp.asarray(pp["initial_bed"], jnp.float32), (4, 64, 256))
        s_u = init_states(beds_u, keys, consts_u)
        s_p = init_states(beds_p, keys, consts_p)

        xla_step = jax.jit(lambda c, s: jax.vmap(
            make_step(static_u), in_axes=(None, 0))(c, s))
        fused_step = jax.jit(
            make_batched_step_fused(static_p, interpret=True))

        for it in range(6):
            s_u, tr_u = xla_step(consts_u, s_u)
            s_p, tr_p = fused_step(consts_p, s_p)
            np.testing.assert_array_equal(
                np.asarray(tr_u["step"]), np.asarray(tr_p["step"]),
                err_msg=f"iter {it}")
            np.testing.assert_allclose(
                np.asarray(s_u.loss_mc), np.asarray(s_p.loss_mc),
                rtol=1e-5, err_msg=f"iter {it}")
            # same proposed block geometry (centers index the same region
            # cell list)
            np.testing.assert_allclose(np.asarray(tr_u["block"]),
                                       np.asarray(tr_p["block"]),
                                       err_msg=f"iter {it}")
        np.testing.assert_allclose(
            unpad(np.asarray(s_p.fields[:, 0])), np.asarray(s_u.fields[:, 0]),
            rtol=5e-5, atol=1e-3)


def test_sampler_warns_on_unalignable_grid(monkeypatch):
    """impl='auto' on an unalignable grid must warn and fall back (the
    warning path is platform-gated; fake the TPU platform check)."""
    from mcmc_tpu.parallel import sampler as sampler_mod

    p = make_synthetic_problem(H=H, W=W)
    chain = build_small_chain(p)

    class FakeDev:
        platform = "tpu"

    monkeypatch.setattr(sampler_mod.jax, "devices", lambda *a: [FakeDev()])
    with pytest.warns(UserWarning, match="pad_domain"):
        s = sampler_mod.MultiChainSampler(chain, n_chains=4, use_mesh=False)
    assert s.impl == "xla"
