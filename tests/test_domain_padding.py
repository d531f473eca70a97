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


class FakeDev:
    platform = "tpu"


def test_sampler_auto_pads_unaligned_grid(monkeypatch):
    """impl='auto' on an unaligned grid now pads transparently and keeps
    the fused path (platform check faked)."""
    from mcmc_tpu.parallel import sampler as sampler_mod

    p = make_synthetic_problem(H=H, W=W)
    chain = build_small_chain(p)

    monkeypatch.setattr(sampler_mod.jax, "devices", lambda *a: [FakeDev()])
    with pytest.warns(UserWarning, match="auto-padded"):
        s = sampler_mod.MultiChainSampler(chain, n_chains=4, use_mesh=False)
    assert s.padded and s.impl == "fused"
    assert (s.static.H, s.static.W) == aligned_shape(H, W)
    assert s._true_hw == (H, W)


def test_sampler_warns_on_unalignable_grid(monkeypatch):
    """With auto_pad off (or not applicable) the unaligned grid must warn
    and fall back to the XLA path."""
    from mcmc_tpu.parallel import sampler as sampler_mod

    p = make_synthetic_problem(H=H, W=W)
    monkeypatch.setattr(sampler_mod.jax, "devices", lambda *a: [FakeDev()])

    with pytest.warns(UserWarning, match="pad_domain"):
        s = sampler_mod.MultiChainSampler(build_small_chain(p), n_chains=4,
                                          use_mesh=False, auto_pad=False)
    assert s.impl == "xla" and not s.padded

    # update region touching the boundary: auto-pad must refuse (padding
    # would change boundary gradient stencils) and say why
    chain = build_small_chain(p)
    chain.set_update_region(True, np.ones((H, W), np.float32))
    chain.set_loss_type(sigma_mc=5.0, massConvInRegion=True)
    with pytest.warns(UserWarning, match="auto-padding not applicable"):
        s = sampler_mod.MultiChainSampler(chain, n_chains=4, use_mesh=False)
    assert s.impl == "xla" and not s.padded


class TestPadChain:
    def test_rules_and_rejections(self):
        from mcmc_tpu.utils.domain import pad_chain

        p = make_synthetic_problem(H=H, W=W)
        chain = build_small_chain(p)
        padded, hw = pad_chain(chain)
        assert hw == (H, W)
        Hp, Wp = aligned_shape(H, W)
        assert padded.xx.shape == (Hp, Wp)
        # masks inert in the pad; conditioning data absent; coords ramp on
        assert padded.region_mask[:, W:].sum() == 0
        assert padded.region_mask[H:, :].sum() == 0
        assert padded.mc_region_mask[:, W:].sum() == 0
        assert not padded.data_mask[H:, :].any()
        assert np.isnan(padded.cond_bed[:, W:]).all()
        np.testing.assert_allclose(np.diff(padded.xx[0]), p["resolution"])
        np.testing.assert_allclose(np.diff(padded.yy[:, 0]), p["resolution"])
        np.testing.assert_array_equal(
            padded.surf[:H, W:], np.repeat(p["surf"][:, -1:].astype(np.float32),
                                           Wp - W, axis=1))

        # aligned grid: identity
        p2 = make_synthetic_problem(H=64, W=128)
        c2 = build_small_chain(p2)
        same, _ = pad_chain(c2)
        assert same is c2

        # boundary-touching region: rejected
        c3 = build_small_chain(p)
        c3.set_update_region(True, np.ones((H, W), np.float32))
        c3.set_loss_type(sigma_mc=5.0, massConvInRegion=True)
        with pytest.raises(ValueError, match="boundary"):
            pad_chain(c3)

        # SGS chains: rejected (no fused path)
        from tests.test_chain_sgs import build_sgs_chain

        p4 = make_synthetic_problem(H=64, W=64)
        with pytest.raises(ValueError, match="ChainCRF only"):
            pad_chain(build_sgs_chain(p4))

    def test_forced_auto_pad_matches_unpadded_sampler(self):
        """Sampler-level equivalence: an auto-padded ('force', CPU) run
        must reproduce the unpadded run's trajectory and return true-domain
        bed arrays everywhere a user sees beds."""
        from mcmc_tpu.parallel.sampler import MultiChainSampler

        p = make_synthetic_problem(H=H, W=W)
        beds = np.stack([p["initial_bed"]] * 4).astype(np.float32)

        s_ref = MultiChainSampler(build_small_chain(p), n_chains=4,
                                  use_mesh=False, auto_pad=False)
        with pytest.warns(UserWarning, match="auto-padded"):
            s_pad = MultiChainSampler(build_small_chain(p), n_chains=4,
                                      use_mesh=False, auto_pad="force")
        assert s_pad.padded and s_pad.impl == "xla"
        assert (s_pad.static.H, s_pad.static.W) == aligned_shape(H, W)

        st_r = s_ref.init(initial_beds=beds, seeds=3)
        st_p = s_pad.init(initial_beds=beds, seeds=3)
        assert st_p.bed.shape[-2:] == aligned_shape(H, W)
        st_r, tr_r = s_ref.run(st_r, 30, segment_size=15, progress=False,
                               collect_beds=True)
        st_p, tr_p = s_pad.run(st_p, 30, segment_size=15, progress=False,
                               collect_beds=True)
        np.testing.assert_array_equal(tr_r["step"], tr_p["step"])
        np.testing.assert_allclose(tr_r["loss"], tr_p["loss"], rtol=1e-5)
        # collected bed snapshots come back on the true domain
        assert tr_p["bed_thin"].shape[-2:] == (H, W)
        np.testing.assert_allclose(tr_p["bed_thin"], tr_r["bed_thin"],
                                   rtol=5e-5, atol=1e-3)
        np.testing.assert_allclose(s_pad.unpad(st_p.bed),
                                   np.asarray(st_r.bed),
                                   rtol=5e-5, atol=1e-3)


def test_autopad_checkpoint_resume_bitwise(tmp_path):
    """Checkpoint/resume with an auto-padded sampler: the resumed run must
    continue bitwise (saved state is padded-shape; a fresh sampler re-pads
    the same chain config to the same shape)."""
    from mcmc_tpu.io import run_with_checkpointing
    from mcmc_tpu.parallel.sampler import MultiChainSampler

    p = make_synthetic_problem(H=H, W=W)

    def make():
        with pytest.warns(UserWarning, match="auto-padded"):
            return MultiChainSampler(build_small_chain(p), n_chains=2,
                                     use_mesh=False, auto_pad="force")

    s1 = make()
    st = s1.init(seeds=9)
    _, full = s1.run(st, n_iter=40, segment_size=20, progress=False)

    d = tmp_path / "ck"
    _, h1, c1 = run_with_checkpointing(make(), 20, d, seeds=9,
                                       segment_size=20)
    assert c1 == 20
    _, h2, c2 = run_with_checkpointing(make(), 40, d, seeds=9,
                                       segment_size=20)
    assert c2 == 40
    np.testing.assert_array_equal(h2["loss"], full["loss"])
    np.testing.assert_array_equal(h2["step"], full["step"])


class TestAutoPadGating:
    """Auto-pad must key off the REAL fused-dispatch predicates, not mere
    (H%8, W%128) alignment (code-review findings, round 3)."""

    def test_full_dim_windows_not_padded(self, monkeypatch):
        """An unaligned grid already served by full-dimension fused windows
        (SX==H and SY==W) must NOT be enlarged."""
        from mcmc_tpu.ops.window_kernel import fused_path_supported
        from mcmc_tpu.parallel import sampler as sampler_mod

        p = make_synthetic_problem(H=100, W=100)
        chain = build_small_chain(p, blocks=(80, 84))
        monkeypatch.setattr(sampler_mod.jax, "devices",
                            lambda *a: [FakeDev()])
        s = sampler_mod.MultiChainSampler(chain, n_chains=4, use_mesh=False)
        assert fused_path_supported(100, 100, s.static.rf.B)  # precondition
        assert not s.padded
        assert (s.static.H, s.static.W) == (100, 100)
        assert s.impl == "fused"

    def test_unchunkable_chain_count_not_padded(self, monkeypatch):
        """A chain count the fused path can't cover — above the
        single-launch bound with no equal split — gains nothing from
        padding: the grid must stay unpadded and the XLA fallback warn
        about the chain count, not the geometry.  (Counts like 389 that
        merely lack an equal split now run as ONE fused launch since the
        transposed-SMEM fix removed the old >=448 compile crash.)"""
        from mcmc_tpu.models.chain_crf import FUSED_SINGLE_LAUNCH_MAX
        from mcmc_tpu.parallel import sampler as sampler_mod

        p = make_synthetic_problem(H=H, W=W)
        chain = build_small_chain(p)
        monkeypatch.setattr(sampler_mod.jax, "devices",
                            lambda *a: [FakeDev()])
        n_bad = FUSED_SINGLE_LAUNCH_MAX + 17  # 8209, prime
        with pytest.warns(UserWarning, match="no equal split"):
            s = sampler_mod.MultiChainSampler(chain, n_chains=n_bad,
                                              use_mesh=False)
        assert not s.padded and s.impl == "xla"
        assert (s.static.H, s.static.W) == (H, W)

    def test_unpad_rejects_non_grid_arrays(self):
        from mcmc_tpu.parallel.sampler import MultiChainSampler

        p = make_synthetic_problem(H=H, W=W)
        with pytest.warns(UserWarning, match="auto-padded"):
            s = MultiChainSampler(build_small_chain(p), n_chains=2,
                                  use_mesh=False, auto_pad="force")
        Hp, Wp = aligned_shape(H, W)
        assert s.unpad(np.zeros((2, Hp, Wp))).shape == (2, H, W)
        assert s.unpad(np.zeros((H, W))).shape == (H, W)  # identity
        with pytest.raises(ValueError, match="grid"):
            s.unpad(np.zeros((2, 30, 4)))  # chain-major non-grid trace
        with pytest.raises(ValueError):
            s.unpad(np.zeros(7))

    def test_run_segment_save_beds_true_domain(self):
        from mcmc_tpu.parallel.sampler import MultiChainSampler

        p = make_synthetic_problem(H=H, W=W)
        with pytest.warns(UserWarning, match="auto-padded"):
            s = MultiChainSampler(build_small_chain(p), n_chains=2,
                                  use_mesh=False, auto_pad="force")
        st = s.init(seeds=1)
        _, traces = s.run_segment(st, 3, save_beds=True)
        assert np.asarray(traces["bed"]).shape[-2:] == (H, W)

    def test_resume_padding_mismatch_raises(self, tmp_path):
        from mcmc_tpu.io import run_with_checkpointing
        from mcmc_tpu.parallel.sampler import MultiChainSampler

        p = make_synthetic_problem(H=H, W=W)
        with pytest.warns(UserWarning, match="auto-padded"):
            s_pad = MultiChainSampler(build_small_chain(p), n_chains=2,
                                      use_mesh=False, auto_pad="force")
        d = tmp_path / "ck"
        run_with_checkpointing(s_pad, 10, d, seeds=1, segment_size=10)
        s_plain = MultiChainSampler(build_small_chain(p), n_chains=2,
                                    use_mesh=False, auto_pad=False)
        with pytest.raises(ValueError, match="different domain padding"):
            run_with_checkpointing(s_plain, 20, d, seeds=1, segment_size=10)


def test_virtual_device_flag_keeps_larger_count():
    import __graft_entry__ as g

    env = {"XLA_FLAGS": "--xla_force_host_platform_device_count=8 --foo"}
    g._set_virtual_device_flag(env, 2)
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    assert "--foo" in env["XLA_FLAGS"]
    env2 = {}
    g._set_virtual_device_flag(env2, 4)
    assert env2["XLA_FLAGS"].strip() == \
        "--xla_force_host_platform_device_count=4"
    env3 = {"XLA_FLAGS": "--xla_force_host_platform_device_count=2"}
    g._set_virtual_device_flag(env3, 8)
    assert "--xla_force_host_platform_device_count=8" in env3["XLA_FLAGS"]


def test_padded_equivalence_with_data_loss():
    """Padding must stay inert when the Gaussian radar-misfit data term is
    active: data_mask zero-pads and cond_bed NaN-pads, so pad cells add
    nothing to loss_data and the padded trajectory matches unpadded."""
    from mcmc_tpu.parallel.sampler import MultiChainSampler

    p = make_synthetic_problem(H=H, W=W)

    def make(auto):
        chain = build_small_chain(p, block_type="CRF_weight")
        chain.set_loss_type(sigma_mc=5.0, massConvInRegion=True,
                            diff_func="sumsquare", sigma_data=30.0)
        chain.set_crf_data_weight()
        if auto:
            with pytest.warns(UserWarning, match="auto-padded"):
                return MultiChainSampler(chain, n_chains=3, use_mesh=False,
                                         auto_pad="force")
        return MultiChainSampler(chain, n_chains=3, use_mesh=False,
                                 auto_pad=False)

    s_ref, s_pad = make(False), make(True)
    assert s_pad.padded
    st_r = s_ref.init(seeds=5)
    st_p = s_pad.init(seeds=5)
    st_r, tr_r = s_ref.run(st_r, 25, segment_size=25, progress=False)
    st_p, tr_p = s_pad.run(st_p, 25, segment_size=25, progress=False)
    np.testing.assert_array_equal(tr_r["step"], tr_p["step"])
    np.testing.assert_allclose(tr_r["loss_data"], tr_p["loss_data"],
                               rtol=1e-5)
    np.testing.assert_allclose(tr_r["loss"], tr_p["loss"], rtol=1e-5)
    np.testing.assert_allclose(s_pad.unpad(st_p.bed), np.asarray(st_r.bed),
                               rtol=5e-5, atol=1e-3)


def test_unpack_per_chain_true_domain(tmp_path):
    """drivers farm results on an auto-padded run: EVERY grid plane in the
    per-chain tuples (bed AND resampled_times) comes back true-domain."""
    from mcmc_tpu.drivers import _unpack_per_chain
    from mcmc_tpu.parallel.sampler import MultiChainSampler

    p = make_synthetic_problem(H=H, W=W)
    with pytest.warns(UserWarning, match="auto-padded"):
        s = MultiChainSampler(build_small_chain(p), n_chains=2,
                              use_mesh=False, auto_pad="force")
    st = s.init(seeds=1)
    st, tr = s.run(st, 5, segment_size=5, progress=False)
    hist = {k: np.asarray(v) for k, v in tr.items()}
    out = _unpack_per_chain(st, hist, s)
    for bed_i, _, _, _, _, resampled_i, _ in out:
        assert bed_i.shape == (H, W)
        assert resampled_i.shape == (H, W)


def test_pad_chain_guard_only_padded_dims():
    """A mask on the last row is harmless when no rows are added (ph==0):
    the guard must only reject boundary masks along actually-padded dims."""
    from mcmc_tpu.utils.domain import pad_chain

    p = make_synthetic_problem(H=64, W=W)  # 64 % 8 == 0: only cols pad
    chain = build_small_chain(p)
    region = np.asarray(p["region"], np.float32).copy()
    region[-1, :] = 1.0  # touches the south boundary; rows are NOT padded
    region[:, -1] = 0.0
    chain.set_update_region(True, region)
    chain.set_loss_type(sigma_mc=5.0, massConvInRegion=True)
    padded, hw = pad_chain(chain)
    assert hw == (64, W) and padded.xx.shape == aligned_shape(64, W)

    # but a mask on the last COLUMN must still be rejected (cols pad)
    chain2 = build_small_chain(p)
    region2 = np.asarray(p["region"], np.float32).copy()
    region2[:, -1] = 1.0
    chain2.set_update_region(True, region2)
    chain2.set_loss_type(sigma_mc=5.0, massConvInRegion=True)
    with pytest.raises(ValueError, match="boundary"):
        pad_chain(chain2)


def test_pad_chain_clamps_out_of_extent_probes():
    """Probe coordinates beyond the true extent must not nearest-map into
    inert pad cells (constant traces); they are clamped onto the true
    domain."""
    from mcmc_tpu.utils.domain import pad_chain

    p = make_synthetic_problem(H=H, W=W)
    chain = build_small_chain(p)
    xmax, ymax = p["xx"].max(), p["yy"].max()
    chain.set_sample_points_locations(
        np.array([[xmax + 5 * p["resolution"], ymax + 5 * p["resolution"]],
                  [p["xx"][3, 4], p["yy"][3, 4]]]))
    padded, _ = pad_chain(chain)
    static, consts = padded.build()
    ij = np.asarray(consts.sample_ij)
    assert (ij[:, 0] < H).all() and (ij[:, 1] < W).all()
    np.testing.assert_array_equal(ij[0], [H - 1, W - 1])
    np.testing.assert_array_equal(ij[1], [3, 4])
