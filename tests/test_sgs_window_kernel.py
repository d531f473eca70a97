"""SGS window extract/writeback Pallas kernels vs the XLA dynamic-slice
path: pure data movement, must be BITWISE identical (interpret mode)."""

import numpy as np

import jax
import jax.numpy as jnp

from mcmc_tpu.ops.sgs_window_kernel import (aligned_slab,
                                            make_window_extract,
                                            make_window_writeback)

H, W, SB, NP, NS, N = 64, 256, 20, 3, 4, 9


def _data(seed=0):
    rng = np.random.default_rng(seed)
    cons = jnp.asarray(rng.normal(size=(NP, H, W)), jnp.float32)
    fields = jnp.asarray(rng.normal(size=(N, NS, H, W)), jnp.float32)
    # window starts spanning corners, interiors, and clamp edges
    sx = jnp.asarray(rng.integers(0, H - SB + 1, N), jnp.int32)
    sy = jnp.asarray(rng.integers(0, W - SB + 1, N), jnp.int32)
    sx = sx.at[0].set(0).at[1].set(H - SB)
    sy = sy.at[0].set(0).at[1].set(W - SB)
    return cons, fields, sx, sy


class TestExtract:
    def test_bitwise_matches_xla_slices(self):
        cons, fields, sx, sy = _data()
        fn = make_window_extract(H, W, SB, NP, NS, interpret=True)
        got = np.asarray(jax.jit(fn)(cons, fields, sx, sy))

        def xla_one(f, sx, sy):
            cw = jax.lax.dynamic_slice(cons, (0, sx, sy), (NP, SB, SB))
            sw = jax.lax.dynamic_slice(f, (0, sx, sy), (NS, SB, SB))
            return jnp.concatenate([cw, sw], axis=0)

        want = np.asarray(jax.vmap(xla_one)(fields, sx, sy))
        np.testing.assert_array_equal(got, want)

    def test_full_dim_slab(self):
        """Small grids where the slab covers the whole dimension (static
        zero starts)."""
        Hs, Ws = 24, 128
        rng = np.random.default_rng(3)
        cons = jnp.asarray(rng.normal(size=(NP, Hs, Ws)), jnp.float32)
        fields = jnp.asarray(rng.normal(size=(N, NS, Hs, Ws)), jnp.float32)
        sx = jnp.asarray(rng.integers(0, Hs - SB + 1, N), jnp.int32)
        sy = jnp.asarray(rng.integers(0, Ws - SB + 1, N), jnp.int32)
        SXA, SYA = aligned_slab(Hs, Ws, SB)
        assert SXA == Hs and SYA == Ws
        fn = make_window_extract(Hs, Ws, SB, NP, NS, interpret=True)
        got = np.asarray(jax.jit(fn)(cons, fields, sx, sy))

        def xla_one(f, sx, sy):
            cw = jax.lax.dynamic_slice(cons, (0, sx, sy), (NP, SB, SB))
            sw = jax.lax.dynamic_slice(f, (0, sx, sy), (NS, SB, SB))
            return jnp.concatenate([cw, sw], axis=0)

        want = np.asarray(jax.vmap(xla_one)(fields, sx, sy))
        np.testing.assert_array_equal(got, want)


class TestWriteback:
    def test_bitwise_matches_xla_dus(self):
        _, fields, sx, sy = _data(1)
        rng = np.random.default_rng(2)
        new_w = jnp.asarray(rng.normal(size=(N, NS, SB, SB)), jnp.float32)
        write = jnp.asarray(rng.random(N) < 0.6)
        write = write.at[0].set(True).at[1].set(False)
        fn = make_window_writeback(H, W, SB, NS, interpret=True)
        got = np.asarray(jax.jit(fn)(fields, new_w, sx, sy, write))

        def xla_one(f, nw, sx, sy, wr):
            upd = jax.lax.dynamic_update_slice(f, nw, (0, sx, sy))
            return jnp.where(wr, upd, f)

        want = np.asarray(jax.vmap(xla_one)(fields, new_w, sx, sy, write))
        np.testing.assert_array_equal(got, want)
        # rejected chains' planes must be untouched (bitwise)
        np.testing.assert_array_equal(got[1], np.asarray(fields)[1])
