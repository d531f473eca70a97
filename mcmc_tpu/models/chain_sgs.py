"""Small-scale MCMC chain with SGS block re-simulation (TPU redesign).

TPU-native counterpart of the reference ``chain_sgs``
(reference: gstatsMCMC/MCMC.py:1445-1912).  The reference re-simulates a
rectangular block per iteration with sequential Gaussian simulation: a
shuffled path over block cells, octant neighbor search, one kriging lstsq
per cell (MCMC.py:91-173) — inherently serial and impossible to batch.

Here the block draw is a **joint conditional Gaussian** via
conditioning-by-kriging: the block's non-data cells are drawn jointly given
a PACKED conditioning set C — the ``num_neighbors`` nearest non-simulated
window cells within ``search_radius`` of the block (set_sgs_param's knobs,
reference MCMC.py:1545-1561, honored jointly instead of per-cell) —

    x | y_C = x_u + Sigma_{:,C} w,   (Sigma_CC + eps I) w = (y - x_u)_C

where x_u is an unconditional field drawn by circulant embedding of the
STATIONARY window covariance (one FFT pair; the direct-factorization
direction the upstream README itself plans, reference README.md:21-23),
the conditioning subset is selected with one ``lax.top_k`` over
distance-to-block, the K-dim solve is fixed-iteration batched CG
(ops/kriging.masked_cg_solve), and the kriging adjustment Sigma_{:,C} w is
a covariance-stamp convolution (a second FFT pair against the same
precomputed spectrum) — batched FFTs, gathers and matvecs only, no
per-step factorization, which is what the TPU wants (replacing the two
(SB^2)x(SB^2) matmuls with FFTs and packing the solve from SB^2~576 dims
down to K~48 are the main SGS throughput levers).  Proposing from the (near-)exact conditional prior makes
the reference's likelihood-only MH acceptance rule (nearly) exact — prior
terms cancel in the MH ratio, so the chain targets exactly
``p_GP(bed) * exp(-loss)`` — where octant-limited sequential SGS only
approximates it.  This is verified against the closed-form Gaussian
posterior in tests/test_exact_posterior.py (mean z-scores rms ~1,
variance ratios within 10%).  Parity with the reference is statistical (same
conditional law / posterior), not draw-for-draw; see
tests/test_chain_sgs.py and tests/test_sgs_parity.py (acceptance band /
loss decay / posterior variogram vs the sequential NumPy twin in
tests/reference_impl.py).

Other reference behaviors carried over:
- optional detrending (state kept in detrended space, trend re-added for
  the physics; MCMC.py:1644-1665);
- optional normal-score transform via precomputed quantile tables
  (window-only instead of the reference's full-grid re-transform per
  iteration, MCMC.py:1766-1769 — elementwise, so equivalent; the
  transform->inverse clamp the reference applies to the whole grid each
  iteration is applied once at init);
- block center uniform over the region, block w/h uniform in
  [block_min, block_max) (MCMC.py:1749-1756; note the reference maps
  block_size_x to rows — reproduced);
- full-grid-equivalent loss: the residual changes only on the block plus a
  one-cell ring, so patching exactly those cells keeps the state residual
  equal to a full recompute (unlike chain_crf's deliberately-stale ring);
- thickness guard over the grounded mask (block-local check, equivalent
  given a sane initial bed — checked at build).

Deviations (documented quirk fixes, SURVEY.md §8):
- iteration 0 records the initial state (the reference's SGS loop
  re-executes slot 0, MCMC.py:1747);
- conditioning-data dropout (set_sgs_param) actually works here — the
  reference stores the knobs but never applies them in run().
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.covariance import CovarianceSpec, make_rotation_matrix
from ..ops.kriging import masked_cg_solve, masked_spd_solve
from ..ops.physics import mass_conservation_residual, masked_gaussian_loss, masked_sq_sum
from ..ops.transforms import NormalScoreLUT, NormalScoreTransform
from ..utils.config import LossConfig, SGSParams, VariogramConfig
from ..utils.rng import as_key


@dataclasses.dataclass(frozen=True)
class SGSStatic:
    H: int
    W: int
    SB: int     # window size = BMX/BMY max + 2*margin
    BMX: int    # max block rows
    BMY: int    # max block cols
    M: int      # window margin (cells), derived from search_radius
    K: int      # packed conditioning size = num_neighbors (set_sgs_param)
    n_region: int
    P: int
    spec: CovarianceSpec
    use_transform: bool
    detrend: bool
    dropout: bool
    has_nugget: bool = False
    cg_iters: int = 64
    NE: int = 0  # circulant-embedding FFT size (>= 2*SB, nonneg embedding)
    NA: int = 0  # kriging-adjustment FFT size (>= 2*SB; definiteness-free)
    # analytic S_CC via nonneg gaussian+exponential mixture (see build);
    # Mg/Me = number of mixture terms, 0/0 => stamp-gather fallback
    Mg: int = 0
    Me: int = 0
    # the same mixture constants as STATIC f32-rounded Python floats
    # ((ag...), (bg...), (ae...), (be...), (q0, q1, q2)) so the fused
    # build+solve Pallas kernel (ops/cg_kernel.lanes_mix_masked_cg) can
    # closure-bake them; () when the mixture is unused.  Kept coherent
    # with SGSConsts.mix_* by construction (both from build()'s numpy fit).
    mix: tuple = ()


@dataclasses.dataclass
class SGSConsts:
    # hot-loop planes STACKED (one batched window slice instead of ~10):
    # surf, velx, vely, dhdt, smb, trend, grounded, mc_mask, z_cond, data_mask
    stacked: jnp.ndarray
    region_cells: jnp.ndarray
    sample_ij: jnp.ndarray
    nst: NormalScoreLUT  # uniform-grid LUT of the fitted transform (hot path)
    cov_stamp: jnp.ndarray    # (NE, NE) periodized covariance stamp C(offset)
    embed_spec: jnp.ndarray   # (NA, NA//2+1) exact half circulant spectrum
    #                           on the SMALLER adjustment grid (exact linear
    #                           conv only needs NA >= 2*SB, not definiteness)
    embed_sqrt: jnp.ndarray   # (NE, NE//2+1) half-spectrum sqrt of the
    #                           clamped spectrum (unconditional draw)
    rot: jnp.ndarray          # (2, 2) anisotropy matrix
    sill: jnp.ndarray
    nugget: jnp.ndarray
    sigma_mc: jnp.ndarray
    resolution: jnp.ndarray
    block_min_x: jnp.ndarray  # rows (reference convention)
    block_max_x: jnp.ndarray
    block_min_y: jnp.ndarray
    block_max_y: jnp.ndarray
    dropout_rate: jnp.ndarray
    search_radius: jnp.ndarray  # meters (set_sgs_param)
    mean_z: jnp.ndarray       # prior mean in (transformed) sim space
    # analytic-S_CC mixture (zero-size arrays when unused, static.Mg/Me=0):
    mix_ag: jnp.ndarray       # (Mg,) gaussian-term weights
    mix_bg: jnp.ndarray       # (Mg,) gaussian decay rates (in h^2)
    mix_ae: jnp.ndarray       # (Me,) exponential-term weights
    mix_be: jnp.ndarray       # (Me,) exponential decay rates (in h)
    qcoef: jnp.ndarray        # (3,) quadratic form of normalized dist^2:
    #                           h^2 = q0*dj^2 + q1*dj*di + q2*di^2

    # named plane views over `stacked` (setup/host paths)
    @property
    def surf(self):
        return self.stacked[0]

    @property
    def velx(self):
        return self.stacked[1]

    @property
    def vely(self):
        return self.stacked[2]

    @property
    def dhdt(self):
        return self.stacked[3]

    @property
    def smb(self):
        return self.stacked[4]

    @property
    def trend(self):
        return self.stacked[5]

    @property
    def grounded(self):
        return self.stacked[6]

    @property
    def mc_mask(self):
        return self.stacked[7] > 0

    @property
    def z_cond(self):
        return self.stacked[8]

    @property
    def data_mask(self):
        return self.stacked[9]


@dataclasses.dataclass
class SGSState:
    # (4, H, W): detrended bed, mc_res, resampled, z_bed.  The z-plane
    # caches the normal-score transform of the bed plane (kept in sync on
    # every accepted write) so the hot loop never runs the FORWARD
    # transform — the reference re-transforms the full grid every
    # iteration (MCMC.py:1766-1769); elementwise, so caching is equivalent.
    fields: jnp.ndarray
    loss_mc: jnp.ndarray
    loss_comp: jnp.ndarray
    key: jnp.ndarray
    accepted: jnp.ndarray

    @property
    def bed(self):
        return self.fields[..., 0, :, :]

    @property
    def mc_res(self):
        return self.fields[..., 1, :, :]

    @property
    def resampled(self):
        return self.fields[..., 2, :, :]

    @property
    def z_bed(self):
        return self.fields[..., 3, :, :]


import jax.tree_util as _tu

for _cls in (SGSConsts, SGSState):
    _fields = [f.name for f in dataclasses.fields(_cls)]
    _tu.register_pytree_node(
        _cls,
        (lambda fields: (lambda c: (tuple(getattr(c, f) for f in fields), None)))(_fields),
        (lambda cls2, fields: (lambda aux, ch: cls2(**dict(zip(fields, ch)))))(_cls, _fields),
    )


def _fft_sizes(lo, hi):
    """Even 2,3,5-smooth FFT sizes in [lo, hi] ascending (good XLA radices)."""
    out = []
    for n in range(lo + (lo & 1), hi + 1, 2):
        m = n
        for p in (2, 3, 5):
            while m % p == 0:
                m //= p
        if m == 1:
            out.append(n)
    return out or [hi]


def _periodized_stamp(spec, rot_np, sill, nugget, resolution, N):
    from ..ops.covariance import covariance_norm as _covn

    k = np.arange(N)
    off = np.where(k <= N // 2, k, k - N)
    di, dj = np.meshgrid(off, off, indexing="ij")
    pts = np.stack([dj.ravel() * resolution,
                    di.ravel() * resolution], -1) @ rot_np
    d = np.sqrt((pts ** 2).sum(-1)).reshape(N, N)
    return np.asarray(_covn(spec, d, sill, nugget), np.float64)


def _embedding_spectra(spec, rot_np, sill, nugget, SB, resolution):
    """Circulant-embedding spectra of the stationary window covariance.

    Two torus sizes, each the smallest that satisfies its OWN requirement
    (r4 surgery: both FFT pairs and the per-step RNG count scale with N²,
    and the legacy always-double search overshot 72 -> 144 where 80 is
    already nonnegative-definite for the bench Matérn):

    - NE: draw grid — smallest even 2,3,5-smooth N >= 2*SB whose embedding
      is (near-)nonnegative-definite, searched over the smooth ladder
      instead of doubling; capped at 8*SB with clamping (as before).
    - NA: adjustment grid — smallest even 2,3,5-smooth N >= 2*SB.  The
      kriging-adjustment convolution is sign-indifferent; it only needs
      exact linear convolution for window offsets, i.e. N >= 2*SB.

    Returns (periodized stamp f32 (NE, NE) — also the on-device S_CC lookup
    table; exact HALF spectrum f32 (NA, NA//2+1) for the adjustment conv;
    HALF sqrt of the clamped spectrum f32 (NE, NE//2+1) for the real-noise
    unconditional draw, rescaled so the marginal variance is exactly C(0);
    NE; NA).
    """
    sizes = _fft_sizes(2 * SB, 8 * SB)
    NA = sizes[0]
    stamp = E = None
    for N in sizes:
        stamp = _periodized_stamp(spec, rot_np, sill, nugget, resolution, N)
        E = np.fft.fft2(stamp).real
        if E.min() > -1e-6 * E.max():
            break
    NE = stamp.shape[0]
    Ec = np.maximum(E, 0.0)
    var = Ec.mean()  # realized marginal variance of the clamped draw
    sqrtE_half = np.sqrt(Ec * (stamp[0, 0] / max(var, 1e-300)))[:, : NE // 2 + 1]
    if NA == NE:
        E_a = E
    else:
        stamp_a = _periodized_stamp(spec, rot_np, sill, nugget, resolution, NA)
        E_a = np.fft.fft2(stamp_a).real
    E_half = E_a[:, : NA // 2 + 1]
    return (stamp.astype(np.float32), E_half.astype(np.float32),
            sqrtE_half.astype(np.float32), NE, NA)


@partial(jax.jit, static_argnames=("use_transform",))
def sgs_init_state(bed_detrended, key, consts: SGSConsts, z0=None,
                   use_transform: bool = True) -> SGSState:
    """``z0`` is the HOST-precomputed normal-score transform of the initial
    bed (exact ``NormalScoreTransform.transform_np``; the in-step LUT is an
    approximation of the same curve).  It must be precomputed because a
    device-side full-grid LUT gather at farm scale lowers to a
    memory-exploding XLA gather (observed: 32 GB allocation at 256 chains
    on a 512x512 grid).  Required when ``use_transform``; ignored
    otherwise (the z-plane then mirrors the bed plane)."""
    bed = jnp.asarray(bed_detrended, jnp.float32)
    mc_res = mass_conservation_residual(
        bed + consts.trend, consts.surf, consts.velx, consts.vely,
        consts.dhdt, consts.smb, consts.resolution)
    loss_mc = masked_gaussian_loss(mc_res, consts.mc_mask, consts.sigma_mc)
    if use_transform:
        if z0 is None:
            raise ValueError(
                "use_transform=True requires the host-precomputed z0 plane")
        z = jnp.asarray(z0, jnp.float32)
    else:
        z = bed
    fields = jnp.stack([bed, mc_res, jnp.zeros(bed.shape, jnp.float32), z])
    return SGSState(fields=fields, loss_mc=jnp.float32(loss_mc),
                    loss_comp=jnp.float32(0.0), key=key,
                    accepted=jnp.int32(0))


def halfspec_noise(noise, NE: int):
    """Complex (NE, NE//2+1) noise distributed EXACTLY as ``rfft2(e)`` for
    e iid standard normal (NE, NE), built from NE² normals — the draw's
    forward FFT done analytically.

    Distribution of rfft2 of iid N(0,1) (NE even):
      - interior columns 0 < kx < NE/2: Re, Im iid N(0, NE²/2);
      - edge columns kx ∈ {0, NE/2}: rows ky and NE-ky are CONJUGATE
        pairs, each with Re, Im ~ N(0, NE²/2);
      - self-conjugate bins (ky ∈ {0, NE/2} on edge columns): real,
        N(0, NE²).
    Parseval makes the normal count come out to exactly NE² — the same
    budget as the forward-FFT form.  irfft2 of this times a real
    symmetric half-spectrum reproduces the circulant-embedding draw's
    covariance exactly (validated empirically:
    tests/test_chain_sgs.py::test_halfspec_noise_is_white).
    """
    H = NE // 2
    sig = jnp.float32(NE * np.sqrt(0.5))
    n_int = NE * (H - 1) * 2
    vi = noise[:n_int].reshape(NE, H - 1, 2)
    interior = (vi[..., 0] + 1j * vi[..., 1]) * sig

    def edge_col(v):                    # (NE,) normals -> hermitian column
        up = (v[2::2] + 1j * v[3::2]) * sig          # rows 1 .. H-1
        return jnp.concatenate([
            (v[0] * NE)[None].astype(jnp.complex64),     # ky = 0 (real)
            up,
            (v[1] * NE)[None].astype(jnp.complex64),     # ky = H (real)
            jnp.conj(up)[::-1],                          # ky = NE-1 .. H+1
        ])

    col0 = edge_col(noise[n_int:n_int + NE])
    colH = edge_col(noise[n_int + NE:n_int + 2 * NE])
    return jnp.concatenate(
        [col0[:, None], interior, colH[:, None]], axis=1)


def k_nearest_packed(candidate, rd, cd, K):
    """Exact K-nearest conditioning selection WITHOUT a sort.

    Selects the same set as ``lax.top_k(where(candidate, -euclid, -inf), K)``
    — the K candidate cells nearest the block, ties broken by lowest linear
    index — but with VPU-only math: squared cell distances are INTEGERS
    d2 = rd² + cd² ≤ 2·SB², so the K-th smallest distance is found by a
    ~12-step integer threshold bisection (masked counts), and the selected
    cells are packed into K slots by cumulative-rank arithmetic.  A vmapped
    ``lax.top_k`` over the SB² scores measured 1.9 ms of the 11.3 ms
    512-chain step-batch (NOTES_ROUND4 §6); this path is reductions and
    elementwise compares only.

    Equivalence to the euclid ordering: sqrt is strictly monotone and
    adjacent representable integers below 2·SB² stay distinct through
    float32 sqrt (relative gaps ~1/(2·d2) >> eps), so d2 order == euclid
    order, including ties.  The packed ORDER differs from top_k's
    (linear-index vs distance order); downstream use — masked solve, rhs
    gather, scatter-add — is permutation-invariant.

    Args: candidate (SB,SB) bool; rd, cd (SB,) int32 row/col distances to
    the block; K static.  Returns (idx (K,) int32 into the raveled window,
    sel (K,) bool).  If fewer than K candidates exist, the tail of sel is
    False (idx there is clipped junk, masked downstream like top_k's -inf
    slots were).
    """
    valid, rank, n_total = _k_nearest_valid(candidate, rd, cd, K)
    SB = rd.shape[0]
    # index of the (j+1)-th valid cell = #{i : rank_i <= j} (rank increments
    # exactly at valid cells); for j >= n_total this counts the whole array
    js = jnp.arange(K, dtype=jnp.int32)
    pos = jnp.sum((rank[None, :] <= js[:, None]).astype(jnp.int32), axis=1)
    idx = jnp.minimum(pos, SB * SB - 1)
    sel = js < n_total
    return idx, sel


def _k_nearest_valid(candidate, rd, cd, K):
    """Shared core of the sort-free selection: the VALID mask over the
    raveled window (exactly the top_k set) plus its inclusive rank cumsum
    and the total count."""
    SB = rd.shape[0]
    big = jnp.int32(2 * SB * SB)  # > max real d2 = 2·(SB-1)²
    d2 = rd[:, None] * rd[:, None] + cd[None, :] * cd[None, :]
    d2r = jnp.where(candidate, d2, big).ravel()
    cand = candidate.ravel()
    # minimal T with count(d2r <= T) >= K; count(<= big) = SB² >= K always
    lo = jnp.int32(0)
    hi = big
    for _ in range(int(2 * SB * SB).bit_length()):
        mid = (lo + hi) // 2
        ge = jnp.sum((d2r <= mid).astype(jnp.int32)) >= K
        lo = jnp.where(ge, lo, mid + 1)
        hi = jnp.where(ge, mid, hi)
    T = hi
    strict = d2r < T                     # sentinels excluded: big < T never
    ties = cand & (d2r == T)             # cand-guard excludes T==big sentinels
    n_strict = jnp.sum(strict.astype(jnp.int32))
    take_tie = ties & (jnp.cumsum(ties.astype(jnp.int32)) <= K - n_strict)
    valid = strict | take_tie
    rank = jnp.cumsum(valid.astype(jnp.int32))   # inclusive
    return valid, rank, rank[-1]


def k_nearest_onehot(candidate, rd, cd, K):
    """The same selection as :func:`k_nearest_packed`, as a PACKING MATRIX.

    Returns (P (K, SB²) f32, sel (K,) bool) with P[j, i] = 1 iff window
    cell i is the (j+1)-th selected cell (index order).  Each row has at
    most one nonzero, so packing any per-cell vector is the exact matvec
    ``P @ v`` and the scatter-back of packed weights is ``P.T @ w`` — both
    MXU matmuls (use precision=HIGHEST so v's values are not rounded to
    bf16), replacing the vmapped dynamic gather ``v[top_idx]`` and the
    ``at[top_idx].add`` scatter whose per-op overhead dominates the phase
    on the measured backend (NOTES_ROUND4 §6 lever a).
    """
    valid, rank, n_total = _k_nearest_valid(candidate, rd, cd, K)
    js = jnp.arange(K, dtype=jnp.int32)
    P = ((rank[None, :] == js[:, None] + 1) & valid[None, :]
         ).astype(jnp.float32)
    sel = js < n_total
    return P, sel


def make_sgs_stages(static: SGSStatic):
    """The MH update split into two per-chain stages around the packed
    conditioning solve, so a BATCHED step can run the solve once over the
    whole chain batch (the fused Pallas CG of ops/cg_kernel):

      prepare(consts, state, cx, cy, bsx, bsy, noise, drop_u)
          -> (pre, (S_cc, m_sel, rhs_p, eps))
      solve_one(S_cc, m_sel, rhs_p, eps)   # per-chain XLA solve
      finalize(consts, state, pre, w_p, noise, u, key) -> (state', trace)

    ``pre`` is an opaque tuple threaded between the stages; within one jit
    XLA fuses across the stage boundary, so the split costs nothing.
    """
    H, W, SB, BMX, BMY, M, NE, NA = (
        static.H, static.W, static.SB, static.BMX, static.BMY, static.M,
        static.NE, static.NA)
    # perf-surgery gates (profiling only; unset in production => no effect):
    # comma-separated list in MCMC_TPU_SGS_SURGERY, e.g. "nocg,noadj"
    import os as _os
    _cut = set(filter(None, _os.environ.get(
        "MCMC_TPU_SGS_SURGERY", "").split(",")))

    def drop_u_nugget(noise):
        return noise[NE * NE:].reshape(SB, SB)

    def window_start(cx, cy, bsx, bsy):
        """Block extent + clamped window start (reference MCMC.py:1761-1764;
        x -> rows).  Exposed so the batched step can run the Pallas window
        extract BEFORE the vmapped prepare."""
        bxmin = jnp.maximum(0, (2 * cx - bsx) // 2)
        bxmax = jnp.minimum(H, (2 * cx + bsx) // 2)
        bymin = jnp.maximum(0, (2 * cy - bsy) // 2)
        bymax = jnp.minimum(W, (2 * cy + bsy) // 2)
        sx = jnp.clip(bxmin - M, 0, H - SB)
        sy = jnp.clip(bymin - M, 0, W - SB)
        return bxmin, bxmax, bymin, bymax, sx, sy

    def prepare(consts: SGSConsts, state: SGSState, cx, cy, bsx, bsy,
                noise, drop_u, windows=None):
        bxmin, bxmax, bymin, bymax, sx, sy = window_start(cx, cy, bsx, bsy)
        rows = sx + jnp.arange(SB)
        cols = sy + jnp.arange(SB)
        in_rows = (rows >= bxmin) & (rows < bxmax)
        in_cols = (cols >= bymin) & (cols < bymax)
        in_block = in_rows[:, None] & in_cols[None, :]

        if windows is not None:  # pre-extracted by the Pallas window kernel
            cw = windows[:10]
            sw = windows[10:]
        elif "nogather" in _cut:  # surgery: fixed-position window slices
            cw = consts.stacked[:, :SB, :SB]
            sw = state.fields[:, :SB, :SB]
        else:
            cw = jax.lax.dynamic_slice(consts.stacked, (0, sx, sy),
                                       (10, SB, SB))
            sw = jax.lax.dynamic_slice(state.fields, (0, sx, sy), (4, SB, SB))
        (surf_w, velx_w, vely_w, dhdt_w, smb_w, trend_w, grounded_f, mcf_w,
         zcond_w, dataf_w) = cw
        bed_w, res_old_w, resampled_w, zbed_w = sw
        data_w = dataf_w > 0

        # --- roles ----------------------------------------------------------
        sim_mask = in_block & ~data_w                       # cells to redraw
        # conditioning: every other window cell — the surrounding state and
        # in-block radar data (all window cells are real domain cells)
        rd = jnp.maximum(jnp.maximum(bxmin - rows, rows - (bxmax - 1)), 0)
        cd = jnp.maximum(jnp.maximum(bymin - cols, cols - (bymax - 1)), 0)
        ring_dist = jnp.maximum(rd[:, None], cd[None, :])
        cond_mask = ~sim_mask
        if static.dropout:
            cond_mask = cond_mask & (drop_u >= consts.dropout_rate)

        # --- transformed window values: read the z-plane CACHE (kept in
        # sync with the bed plane on every accepted write) instead of
        # re-running the forward LUT — a gather-based call measured at
        # ~0.6 ms/step-batch at 256 chains (2026-08-16)
        if static.use_transform and "nolut" not in _cut:
            z_w = zbed_w
        else:
            z_w = bed_w
        z_w = jnp.where(in_block & data_w, zcond_w, z_w)

        # --- conditional draw by conditioning-by-kriging ---------------------
        # x | y_C = x_u + Sigma_{:,C} w,  (Sigma_CC + eps) w = (y - x_u)_C
        # with x_u an unconditional field drawn by CIRCULANT EMBEDDING
        # (Dietrich & Newsam): the stationary covariance's stamp is
        # periodized on an (NE, NE) grid host-side, so the draw is one FFT
        # pair instead of a (SB^2, SB^2) Cholesky matvec — the dominant cost
        # of the step (measured 2026-08-16: the two SB^4 matmuls were ~70%
        # of the 23 ms step-batch).  The conditioning set C is PACKED: the
        # K = num_neighbors nearest conditioning cells within search_radius
        # of the block (set_sgs_param semantics, reference MCMC.py:1545-1561,
        # applied jointly) selected by one lax.top_k; the K-dim solve is
        # fixed-iteration batched CG — batched matvecs, no per-step
        # sequential Cholesky.  The kriging adjustment Sigma_{:,C} w is a
        # convolution with the SAME covariance stamp (stationarity), i.e.
        # the second FFT pair, exact because NE >= 2*SB.  CG tolerance and
        # spectrum clamping make the proposal approximately (not bitwise)
        # the conditional prior — the same approximation class as the
        # reference's octant-limited sequential SGS.
        # draw via the half-spectrum: halfspec_noise builds, from NE²
        # normals, complex noise distributed EXACTLY as rfft2 of an iid
        # (NE, NE) field (Hermitian edge columns, real self-conjugate
        # bins) — so z = irfft2(Z * sqrt(E)) has covariance exactly =
        # stamp while paying ONE FFT per draw.  The former forward-FFT
        # form irfft2(rfft2(e) * sqrt(E)) (gate "fwdfft") is the same
        # distribution at twice the FFT cost; the draw phase measured
        # 0.87 ms of the 3.54 ms step-batch at 512 chains (NOTES_ROUND5
        # §2c), the largest single phase after the r5 levers.
        if "nodraw" in _cut:  # surgery: white noise instead of the FFT draw
            z_u = noise[:SB * SB].reshape(SB, SB) + consts.mean_z
        elif "fwdfft" in _cut:  # surgery: the pre-r5 forward-FFT draw
            e = noise[:NE * NE].reshape(NE, NE)
            z_big = jnp.fft.irfft2(jnp.fft.rfft2(e) * consts.embed_sqrt,
                                   s=(NE, NE))
            z_u = z_big[:SB, :SB] + consts.mean_z
        else:
            Z = halfspec_noise(noise[:NE * NE], NE)
            z_big = jnp.fft.irfft2(Z * consts.embed_sqrt, s=(NE, NE))
            z_u = z_big[:SB, :SB] + consts.mean_z
        # distance (meters) from each window cell to the nearest block cell;
        # in-block data cells are at distance 0 and always selected first
        euclid = (jnp.sqrt(jnp.square(rd[:, None].astype(jnp.float32))
                           + jnp.square(cd[None, :].astype(jnp.float32)))
                  * consts.resolution)
        candidate = cond_mask & (euclid <= consts.search_radius)
        if "notopk" in _cut:  # surgery: fixed conditioning indices
            top_idx = jnp.arange(static.K)
            sel = jnp.ones((static.K,), bool)
        elif "approxtopk" in _cut:  # surgery: TPU approximate top-k
            score = jnp.where(candidate, -euclid, -jnp.inf).ravel()
            top_val, top_idx = jax.lax.approx_max_k(score, static.K)
            sel = jnp.isfinite(top_val)
        elif "sorttopk" in _cut:  # surgery: the pre-r4 sort-based top_k
            score = jnp.where(candidate, -euclid, -jnp.inf).ravel()
            top_val, top_idx = jax.lax.top_k(score, static.K)
            sel = jnp.isfinite(top_val)
        elif "gatherpack" in _cut:  # surgery: packed-index gather/scatter
            top_idx, sel = k_nearest_packed(candidate, rd, cd, static.K)
        else:  # DEFAULT: pack via one-hot matmuls — the rhs gather, the
            # ia/ja derivation, and finalize's scatter-back all become MXU
            # matmuls against the K x SB² packing matrix (zero dynamic-
            # index ops in this phase; bitwise == the gather path on CPU,
            # measured 10.897 vs 11.087 ms/step-batch at 512 chains on
            # v5e-1 — NOTES_ROUND4 §6 lever d)
            top_idx = None
            pack_P, sel = k_nearest_onehot(candidate, rd, cd, static.K)
        m_sel = sel.astype(jnp.float32)
        dz = jnp.where(cond_mask, z_w - z_u, 0.0).ravel()
        if top_idx is None:
            # one matmul packs rhs + both packed coordinates (small exact
            # ints in f32); HIGHEST keeps dz values un-rounded
            rowsf = jnp.broadcast_to(
                jnp.arange(SB, dtype=jnp.float32)[:, None], (SB, SB)).ravel()
            colsf = jnp.broadcast_to(
                jnp.arange(SB, dtype=jnp.float32)[None, :], (SB, SB)).ravel()
            packed3 = jnp.matmul(pack_P, jnp.stack([dz, rowsf, colsf], -1),
                                 precision=jax.lax.Precision.HIGHEST)
            rhs_p = jnp.where(sel, packed3[:, 0], 0.0)
            iaf, jaf = packed3[:, 1], packed3[:, 2]
        else:
            pack_P = None
            rhs_p = jnp.where(sel, dz[top_idx], 0.0)
        # S_cc: covariance between the packed conditioning cells.  Two
        # evaluation paths, same values (tests/test_chain_sgs.py):
        #   - ANALYTIC MIXTURE (default when the covariance curve admits a
        #     nonneg gaussian+exponential fit, ops/covariance.fit_cov_mixture):
        #     ~12 fused exp ops on the pairwise distance — pure VPU math.
        #     A vmapped (K, K) table gather costs ~6.5 ms/step-batch at 256
        #     chains on TPU (XLA scalar-loop gather, measured 2026-08-16) —
        #     by far the dominant cost of the old step — while the mixture
        #     evaluation is ~0.2 ms-class.
        #   - STAMP GATHER (fallback, e.g. the spherical model's range kink;
        #     surgery gate "stampgather" forces it): gather BY OFFSET from
        #     the periodized (NE, NE) covariance stamp.
        if top_idx is None:
            ia = iaf.astype(jnp.int32)   # exact small ints (stamp fallback)
            ja = jaf.astype(jnp.int32)
        else:
            ia = top_idx // SB
            ja = top_idx - SB * ia
            iaf = ia.astype(jnp.float32)
            jaf = ja.astype(jnp.float32)
        if "nomix" in _cut:  # surgery: constant S_cc (isolates the mixture
            # evaluation's transcendental cost from selection/packing; the
            # CG still runs its full iteration count on a well-posed system)
            S_cc = (consts.sill * jnp.eye(static.K, dtype=jnp.float32)
                    + jnp.zeros((static.K, static.K), jnp.float32))
        elif static.Mg + static.Me > 0 and "stampgather" not in _cut:
            dif = iaf[:, None] - iaf[None, :]
            djf = jaf[:, None] - jaf[None, :]
            h2 = (consts.qcoef[0] * djf * djf + consts.qcoef[1] * djf * dif
                  + consts.qcoef[2] * dif * dif)
            # static coefficients + dyadic-chain evaluation: one exp per
            # mixture family instead of one per term (ops/covariance.
            # eval_mixture_static; same values as the former per-term
            # consts.mix_* loop to f32 roundoff)
            from ..ops.covariance import eval_mixture_static
            S_cc = eval_mixture_static(static.mix, h2)
        else:
            di = jnp.mod(ia[:, None] - ia[None, :], NE)
            dj = jnp.mod(ja[:, None] - ja[None, :], NE)
            S_cc = consts.cov_stamp[di, dj]
        eps = 1e-3 * jnp.maximum(consts.sill, 1.0)
        pack = pack_P if top_idx is None else top_idx
        pre = (sx, sy, in_block, sim_mask, data_w, ring_dist, z_w, z_u,
               pack, sel, bed_w, res_old_w, resampled_w, zbed_w,
               surf_w, velx_w, vely_w, dhdt_w, smb_w, trend_w, grounded_f,
               mcf_w, cx, cy, bsx, bsy)
        # iaf/jaf ride along for the fused build+solve kernel (which
        # rebuilds S_cc in-kernel); when a solver consumes S_cc instead,
        # XLA dead-code-eliminates the unused pair — and vice versa, the
        # whole XLA mixture evaluation vanishes under the fused kernel
        return pre, (S_cc, m_sel, rhs_p, eps, iaf, jaf)

    def solve_one(S_cc, m_sel, rhs_p, eps):
        """Per-chain packed conditioning solve (XLA path)."""
        if "nocg" in _cut:  # surgery: identity solve
            return rhs_p
        if "cholsolve" in _cut:  # surgery: direct Cholesky (slower on the
            # measured backend: batched 48x48 cholesky+trsm ~ +1.1 ms)
            return masked_spd_solve(S_cc, m_sel, rhs_p, eps)
        return masked_cg_solve(S_cc, m_sel, rhs_p, eps, static.cg_iters)

    def draw_z(consts: SGSConsts, state: SGSState, pre, w_p, noise):
        """Stage B1: scatter-back + kriging adjustment + conditional draw.
        Returns (z_new_w, z_cache_w) so the batched step can apply the
        inverse LUT over the WHOLE chain batch at once (the Pallas kernel
        of ops/lut_kernel needs the 128-lane batch layout)."""
        (sx, sy, in_block, sim_mask, data_w, ring_dist, z_w, z_u,
         pack, sel, bed_w, res_old_w, resampled_w, zbed_w,
         surf_w, velx_w, vely_w, dhdt_w, smb_w, trend_w, grounded_f,
         mcf_w, cx, cy, bsx, bsy) = pre
        # scatter packed weights back to the window; Sigma_{:,C} w is a
        # covariance-stamp convolution (stationarity) -> FFT with the exact
        # spectrum (no wraparound: NE >= 2*SB covers all window offsets)
        if pack.ndim == 2:  # one-hot packing matrix (default)
            w_full = jnp.matmul(jnp.where(sel, w_p, 0.0), pack,
                                precision=jax.lax.Precision.HIGHEST)
        else:  # (K,) packed index vector (gather-path gates)
            w_full = jnp.zeros((SB * SB,), jnp.float32).at[pack].add(
                jnp.where(sel, w_p, 0.0))
        w_pad = jnp.zeros((NA, NA), jnp.float32).at[:SB, :SB].set(
            w_full.reshape(SB, SB))
        # real input + real symmetric spectrum -> half-spectrum FFT pair on
        # the SMALLER adjustment grid (NA >= 2*SB suffices for exactness)
        if "noadj" in _cut:  # surgery: skip the adjustment convolution
            adj = jnp.float32(0.0) * w_pad[:SB, :SB]
        else:
            adj = jnp.fft.irfft2(jnp.fft.rfft2(w_pad) * consts.embed_spec,
                                 s=(NA, NA))[:SB, :SB]
        z_draw = z_u + adj
        if static.has_nugget:
            z_draw = z_draw + jnp.sqrt(consts.nugget) * drop_u_nugget(noise)
        z_new_w = jnp.where(sim_mask, z_draw, z_w)
        # z-plane CACHE value: must equal transform(bed-plane).  For
        # in-range z that is z itself (up to LUT tolerance), but an
        # out-of-range draw saturates the inverse at the data extremes, and
        # the reference's per-iteration re-transform (MCMC.py:1766) would
        # then yield the transform's tail clip — so clamp to the forward
        # table's range instead of caching the raw draw
        if static.use_transform:
            z_cache_w = jnp.clip(z_new_w, consts.nst.fwd_table[0, 0],
                                 consts.nst.fwd_table[-1, 1])
        else:
            z_cache_w = z_new_w
        return z_new_w, z_cache_w

    def commit_core(consts: SGSConsts, state: SGSState, pre, z_new_w,
                    z_cache_w, inv_draw, u, key):
        """Stage B2: data-space window + residual patch + MH accept —
        everything EXCEPT the field-plane writeback.  Returns
        (new_w (4,SB,SB) with the accept folded into the content, scalars
        dict) so the batched step can write all chains back in one Pallas
        launch (ops/sgs_window_kernel).  ``inv_draw`` is
        inverse_LUT(z_new_w) (None when no transform)."""
        (sx, sy, in_block, sim_mask, data_w, ring_dist, z_w, z_u,
         pack, sel, bed_w, res_old_w, resampled_w, zbed_w,
         surf_w, velx_w, vely_w, dhdt_w, smb_w, trend_w, grounded_f,
         mcf_w, cx, cy, bsx, bsy) = pre
        # --- back to data space (ONE inverse LUT call; data cells re-snap
        # to inverse(transform(cond)) exactly like the reference) -----------
        if inv_draw is not None:
            bed_new_w = jnp.where(sim_mask | (in_block & data_w),
                                  inv_draw, bed_w)
        else:
            bed_new_w = jnp.where(in_block, z_new_w, bed_w)

        # --- residual patch: block + 1 ring changes ------------------------
        chg = ring_dist <= 1
        full_old = bed_w + trend_w
        full_new = bed_new_w + trend_w
        res_new_w = mass_conservation_residual(
            full_new, surf_w, velx_w, vely_w, dhdt_w, smb_w,
            consts.resolution)
        patch = chg & (mcf_w > 0)
        denom = 2.0 * jnp.square(consts.sigma_mc)
        delta = (masked_sq_sum(res_new_w, patch)
                 - masked_sq_sum(res_old_w, patch)) / denom
        loss_next = state.loss_mc + delta

        # --- thickness guard (reference MCMC.py:1789-1795) ------------------
        grounded_w = grounded_f > 0
        viol = jnp.any(((surf_w - full_new) <= 0.0)
                       & in_block & grounded_w)
        # reject non-finite draws outright: a failed Cholesky (ill-
        # conditioned covariance) must not leak NaNs into the state, where
        # the nansum loss would silently drop those cells
        viol = viol | jnp.any(~jnp.isfinite(
            jnp.where(sim_mask, bed_new_w, 0.0)))
        loss_next = jnp.where(viol, jnp.inf, loss_next)

        # --- MH accept ------------------------------------------------------
        rate = jnp.minimum(1.0, jnp.exp(state.loss_mc - loss_next))
        accept = u <= rate

        res_patched_w = jnp.where(chg, res_new_w, res_old_w)

        # never write a violating (possibly non-finite) proposal into the
        # state, even on the measure-zero u==0 accept (safety deviation
        # from the reference edge case); accept folded into the window
        # content so ONE scatter updates all three planes
        write = accept & ~viol
        new_w = jnp.stack([
            jnp.where(write, bed_new_w, bed_w),
            jnp.where(write, res_patched_w, res_old_w),
            jnp.where(write, resampled_w + in_block.astype(jnp.float32),
                      resampled_w),
            # z-plane cache stays in sync with the bed plane (z_cache_w
            # contains zcond at in-block data cells, matching the bed
            # plane's inverse re-snap, and is tail-clamped to the forward
            # transform's range)
            jnp.where(write, z_cache_w, zbed_w),
        ])
        y = jnp.where(accept & ~viol, delta, 0.0) - state.loss_comp
        t = state.loss_mc + y
        comp = (t - state.loss_mc) - y
        scalars = dict(t=t, comp=comp, accept=accept, write=write,
                       sx=sx, sy=sy, key=key,
                       block=jnp.stack([cx, cy, bsx, bsy]
                                       ).astype(jnp.float32))
        return new_w, scalars

    def assemble(consts: SGSConsts, state: SGSState, fields_out, sc):
        """Stage B3: state + trace from the written-back field planes."""
        t = sc["t"]
        new_state = SGSState(fields=fields_out, loss_mc=t,
                             loss_comp=sc["comp"], key=sc["key"],
                             accepted=state.accepted
                             + sc["accept"].astype(jnp.int32))
        # sample probes report the full (trend-restored) bed like the
        # reference's bed_cache (MCMC.py:1822-1829)
        full_bed_probe = (fields_out[0, consts.sample_ij[:, 0],
                                     consts.sample_ij[:, 1]]
                          + consts.trend[consts.sample_ij[:, 0],
                                         consts.sample_ij[:, 1]])
        trace = {
            "loss_mc": t,
            "loss_data": jnp.float32(0.0),
            "loss": t,
            "step": sc["accept"],
            "block": sc["block"],
            "samples": full_bed_probe,
        }
        return new_state, trace

    def commit(consts: SGSConsts, state: SGSState, pre, z_new_w, z_cache_w,
               inv_draw, u, key):
        """Per-chain composition: core + folded unconditional writeback.
        (The accept decision is folded into the window CONTENT — rejected
        chains rewrite their old values bitwise — so one dus serves all
        three outcomes; the batched step's Pallas writeback instead skips
        rejected chains' DMAs, same result bitwise.)"""
        new_w, sc = commit_core(consts, state, pre, z_new_w, z_cache_w,
                                inv_draw, u, key)
        if "noscatter" in _cut:  # surgery: drop the state write-back
            fields_out = state.fields + jnp.float32(1e-20) * new_w.mean()
        else:
            fields_out = jax.lax.dynamic_update_slice(
                state.fields, new_w, (0, sc["sx"], sc["sy"]))
        return assemble(consts, state, fields_out, sc)

    def finalize(consts: SGSConsts, state: SGSState, pre, w_p, noise, u,
                 key):
        """Stage B = B1 + per-chain XLA inverse LUT + B2 (the portable
        composition; the batched step swaps the LUT for the Pallas batch
        kernel between the vmapped halves)."""
        z_new_w, z_cache_w = draw_z(consts, state, pre, w_p, noise)
        if static.use_transform and "nolut" not in _cut:
            inv_draw = consts.nst.inverse(z_new_w)
        else:
            inv_draw = None
        return commit(consts, state, pre, z_new_w, z_cache_w, inv_draw,
                      u, key)

    # exposed for make_sgs_step_batched's batch-level Pallas stages
    finalize.draw_z = draw_z
    finalize.commit = commit
    finalize.commit_core = commit_core
    finalize.assemble = assemble
    finalize.window_start = window_start
    return prepare, solve_one, finalize


def make_sgs_kernel(static: SGSStatic):
    """MH update core with injectable randomness:
    (consts, state, cx, cy, bsx, bsy,
    noise (NE*NE [+SB*SB if nugget],) — the real white-noise field of the
    circulant-embedding draw, then optional nugget draws —
    drop_u (SB,SB), u, key).  Composition of the two stages around the
    per-chain XLA solve (make_sgs_stages)."""
    prepare, solve_one, finalize = make_sgs_stages(static)

    def mh_update(consts: SGSConsts, state: SGSState, cx, cy, bsx, bsy,
                  noise, drop_u, u, key):
        pre, (S_cc, m_sel, rhs_p, eps, _, _) = prepare(
            consts, state, cx, cy, bsx, bsy, noise, drop_u)
        w_p = solve_one(S_cc, m_sel, rhs_p, eps)
        return finalize(consts, state, pre, w_p, noise, u, key)

    return mh_update


def _sample_proposal(static: SGSStatic, consts: SGSConsts, key):
    """Draw one iteration's randomness (shared by both step builders)."""
    NE2 = static.NE * static.NE  # real white-noise field of the draw
    n_noise = NE2 + static.SB * static.SB if static.has_nugget else NE2
    key, k_c, k_bx, k_by, k_noise, k_drop, k_u = jax.random.split(key, 7)
    cidx = jax.random.randint(k_c, (), 0, static.n_region)
    cx = consts.region_cells[cidx, 0]
    cy = consts.region_cells[cidx, 1]
    bsx = jax.random.randint(k_bx, (), consts.block_min_x, consts.block_max_x)
    bsy = jax.random.randint(k_by, (), consts.block_min_y, consts.block_max_y)
    noise = jax.random.normal(k_noise, (n_noise,))
    drop_u = (jax.random.uniform(k_drop, (static.SB, static.SB))
              if static.dropout else jnp.ones((static.SB, static.SB)))
    u = jax.random.uniform(k_u, ())
    return key, cx, cy, bsx, bsy, noise, drop_u, u


def make_sgs_step(static: SGSStatic):
    mh_update = make_sgs_kernel(static)

    def step(consts: SGSConsts, state: SGSState):
        key, cx, cy, bsx, bsy, noise, drop_u, u = _sample_proposal(
            static, consts, state.key)
        return mh_update(consts, state, cx, cy, bsx, bsy, noise, drop_u, u, key)

    return step


def make_sgs_step_batched(static: SGSStatic):
    """Batched (chains-leading) SGS step: vmapped stage A, the packed
    conditioning solve over the whole chain batch, vmapped stage B.
    Semantically identical to ``vmap(make_sgs_step(static))`` — same
    solve, same tolerance class (tests/test_chain_sgs.py::TestBatchedStep).

    The batch solve defaults to the lanes-layout Pallas CG on TPU backends
    (ops/cg_kernel.lanes_masked_cg: whole-batch fused CG in 2D
    batch-in-lanes tiles, the NOTES_ROUND4 §7 SMEM/lane-padding lesson
    applied to the rank-3 Mosaic crash).  Measured inside the real scan at
    512 chains: 4.883 -> 3.708 ms/step-batch (+31.7%) at cg_iters=64 and
    +17.8% at cg_iters=32 (NOTES_ROUND5 §1).  Gate ``nolanescg`` restores
    the vmapped XLA CG; ``lanesinterp`` is the CI interpret-mode hook."""
    import os as _os

    _cut = set(filter(None, _os.environ.get(
        "MCMC_TPU_SGS_SURGERY", "").split(",")))
    prepare, solve_one, finalize = make_sgs_stages(static)
    from ..ops.cg_kernel import (lanes_cg_available, lanes_masked_cg,
                                 lanes_mix_masked_cg)
    lanes_interp = "lanesinterp" in _cut
    use_lanes = ((lanes_interp
                  or ("nolanescg" not in _cut and lanes_cg_available()))
                 and not ({"nocg", "cholsolve"} & _cut))
    # fused build+solve: S_cc evaluated in-kernel from the packed window
    # coordinates — removes the XLA mixture phase (0.733 ms = 20% of the
    # post-lanes step at 512 chains, NOTES_ROUND5 §2) and shrinks the
    # solve's HBM inputs ~100x.  Gate "nomixcg" restores the S_cc-input
    # lanes kernel; the surgery gates that alter S_cc ("nomix",
    # "stampgather") force the S_cc path so they keep measuring what they
    # claim to.
    use_mixlanes = (use_lanes and len(static.mix) == 5
                    and not ({"nomixcg", "nomix", "stampgather"} & _cut))
    from ..ops.lut_kernel import LANES, lut_interp, lut_kernel_available
    from ..ops.sgs_window_kernel import (make_window_extract,
                                         make_window_writeback,
                                         sgs_window_kernel_available)

    plut_wanted = (static.use_transform and "nolut" not in _cut
                   and "noplut" not in _cut)
    # Pallas window extract/writeback (ops/sgs_window_kernel): the three
    # per-chain dynamic window ops cost 5.96 ms/step-batch at 512 chains
    # in isolation vs 1.29 ms for the kernel pair (NOTES_ROUND4 §6 lever f)
    pwin_interp = "pwininterp" in _cut  # CI hook: interpret-mode kernels
    use_pwin = (pwin_interp
                or ("nopwin" not in _cut
                    and not ({"nogather", "noscatter"} & _cut)
                    and sgs_window_kernel_available()))
    if use_pwin:
        extract_fn = make_window_extract(static.H, static.W, static.SB,
                                         NP=10, NS=4, interpret=pwin_interp)
        writeback_fn = make_window_writeback(static.H, static.W, static.SB,
                                             NS=4, interpret=pwin_interp)

    def step(consts: SGSConsts, states: SGSState):
        key, cx, cy, bsx, bsy, noise, drop_u, u = jax.vmap(
            lambda k: _sample_proposal(static, consts, k))(states.key)
        if use_pwin:
            *_, sxv, syv = jax.vmap(finalize.window_start)(cx, cy, bsx, bsy)
            windows = extract_fn(consts.stacked, states.fields, sxv, syv)
            pre, (S_cc, m_sel, rhs_p, eps, iaf, jaf) = jax.vmap(
                prepare, in_axes=(None, 0, 0, 0, 0, 0, 0, 0, 0))(
                    consts, states, cx, cy, bsx, bsy, noise, drop_u, windows)
        else:
            pre, (S_cc, m_sel, rhs_p, eps, iaf, jaf) = jax.vmap(
                prepare, in_axes=(None, 0, 0, 0, 0, 0, 0, 0))(
                    consts, states, cx, cy, bsx, bsy, noise, drop_u)
        if use_mixlanes:
            w_p = lanes_mix_masked_cg(iaf, jaf, m_sel, rhs_p, eps,
                                      static.mix, static.cg_iters,
                                      interpret=lanes_interp)
        elif use_lanes:
            w_p = lanes_masked_cg(S_cc, m_sel, rhs_p, eps,
                                  static.cg_iters, interpret=lanes_interp)
        else:
            w_p = jax.vmap(solve_one)(S_cc, m_sel, rhs_p, eps)
        plut_interp = "plutinterp" in _cut  # CI hook
        use_plut = (plut_wanted
                    and consts.nst.inv_table.shape[0] % LANES == 0
                    and (plut_interp or lut_kernel_available(
                        consts.nst.inv_table.shape[0])))
        if not (use_plut or use_pwin):
            return jax.vmap(finalize, in_axes=(None, 0, 0, 0, 0, 0, 0))(
                consts, states, pre, w_p, noise, u, key)
        # batch-level Pallas stage B: vmapped draw, ONE LUT launch over all
        # chains' windows (0.28 ms vs the vmapped XLA pair-gather's ~1.8 ms
        # — ops/lut_kernel), vmapped core, ONE writeback launch.  Identical
        # arithmetic to vmap(finalize) (LUT bitwise on hardware, writeback
        # bitwise by construction).
        z_new_w, z_cache_w = jax.vmap(
            finalize.draw_z, in_axes=(None, 0, 0, 0, 0))(
                consts, states, pre, w_p, noise)
        if not static.use_transform or "nolut" in _cut:
            inv_draw = None
        elif use_plut:
            inv_draw = lut_interp(z_new_w, consts.nst.inv_lo,
                                  consts.nst.inv_scale, consts.nst.inv_table,
                                  interpret=plut_interp)
        else:
            inv_draw = consts.nst.inverse(z_new_w)
        new_w, sc = jax.vmap(finalize.commit_core,
                             in_axes=(None, 0, 0, 0, 0,
                                      None if inv_draw is None else 0, 0, 0))(
            consts, states, pre, z_new_w, z_cache_w, inv_draw, u, key)
        if use_pwin:
            fields_out = writeback_fn(states.fields, new_w, sc["sx"],
                                      sc["sy"], sc["write"])
        else:
            fields_out = jax.vmap(
                lambda f, nw, sx, sy: jax.lax.dynamic_update_slice(
                    f, nw, (0, sx, sy)))(states.fields, new_w,
                                         sc["sx"], sc["sy"])
        return jax.vmap(finalize.assemble, in_axes=(None, 0, 0, 0))(
            consts, states, fields_out, sc)

    return step


@partial(jax.jit, static_argnums=(0, 3, 4))
def run_sgs_chain(static: SGSStatic, consts: SGSConsts, state: SGSState,
                  n_iter: int, save_beds: bool = False):
    """Scan runner; row 0 = initial state (fixes reference quirk #1)."""
    step = make_sgs_step(static)

    def body(st, _):
        st, tr = step(consts, st)
        if save_beds:
            tr = dict(tr, bed=st.bed + consts.trend)
        return st, tr

    final, traces = jax.lax.scan(body, state, None, length=n_iter - 1)
    init_probe = (state.bed[consts.sample_ij[:, 0], consts.sample_ij[:, 1]]
                  + consts.trend[consts.sample_ij[:, 0], consts.sample_ij[:, 1]])
    init_row = {
        "loss_mc": state.loss_mc,
        "loss_data": jnp.float32(0.0),
        "loss": state.loss_mc,
        "step": jnp.asarray(False),
        "block": jnp.full((4,), jnp.nan, jnp.float32),
        "samples": init_probe,
    }
    if save_beds:
        init_row["bed"] = state.bed + consts.trend
    traces = jax.tree.map(
        lambda head, tail: jnp.concatenate([head[None], tail], axis=0),
        init_row, traces)
    return final, traces


class ChainSGS:
    """Host-side builder mirroring the reference ``chain_sgs`` setter API
    (set_normal_transformation / set_trend / set_variogram / set_sgs_param /
    set_block_sizes / set_update_region / set_loss_type /
    set_random_generator / set_sample_points_locations)."""

    def __init__(self, xx, yy, initial_bed, surf, velx, vely, dhdt, smb,
                 cond_bed, data_mask, grounded_ice_mask, resolution):
        shapes = {np.shape(a) for a in (initial_bed, surf, velx, vely, dhdt,
                                        smb, cond_bed, data_mask)}
        if len(shapes) != 1:
            raise ValueError(
                "the shape of bed, surf, velx, vely, dhdt, smb, radar_bed, "
                "data_mask need to be same")
        self.xx = np.asarray(xx)
        self.yy = np.asarray(yy)
        self.initial_bed = np.asarray(initial_bed, np.float32)
        self.surf = np.asarray(surf, np.float32)
        self.velx = np.asarray(velx, np.float32)
        self.vely = np.asarray(vely, np.float32)
        self.dhdt = np.asarray(dhdt, np.float32)
        self.smb = np.asarray(smb, np.float32)
        self.cond_bed = np.asarray(cond_bed, np.float32)
        self.data_mask = np.asarray(data_mask)
        self.grounded_ice_mask = np.asarray(grounded_ice_mask)
        self.resolution = float(resolution)
        self.update_in_region = False
        self.region_mask = np.ones(self.xx.shape, np.float32)
        self.mc_region_mask = np.ones(self.xx.shape, np.float32)
        self.sigma_mc = None
        self.do_transform = False
        self.nst_trans: Optional[NormalScoreTransform] = None
        self.trend = None
        self.detrend_map = False
        self.vario: Optional[VariogramConfig] = None
        self.sgs_params: Optional[SGSParams] = None
        self.block_min_x = self.block_max_x = None
        self.block_min_y = self.block_max_y = None
        self.sample_loc = None
        self._key = None

    # --- setters (reference parity) ----------------------------------------

    def set_update_region(self, update_in_region, region_mask=None):
        """Restrict proposal centers to ``region_mask`` cells (reference
        chain.set_update_region, MCMC.py:849-872)."""
        self.update_in_region = bool(update_in_region)
        if not update_in_region:
            self.region_mask = np.ones(self.xx.shape, np.float32)
        else:
            region_mask = np.asarray(region_mask)
            if region_mask.shape != self.xx.shape:
                raise ValueError(
                    "the region_mask input is invalid. It has to be a 2D "
                    "numpy array with the shape of the map")
            self.region_mask = region_mask.astype(np.float32)

    def set_loss_type(self, sigma_mc=-1, massConvInRegion=True):
        """Gaussian mass-conservation loss config (reference
        chain.set_loss_type, MCMC.py:950-1018)."""
        cfg = LossConfig(sigma_mc=sigma_mc, mass_conv_in_region=massConvInRegion)
        self.sigma_mc = cfg.sigma_mc
        self.mc_region_mask = (self.region_mask if massConvInRegion
                               else np.ones(self.xx.shape, np.float32))

    def set_normal_transformation(self, nst_trans, do_transform=True):
        """Attach the normal-score transform applied to the (detrended)
        state (reference chain_sgs.set_normal_transformation,
        MCMC.py:1465-1480; accepts ops.transforms.NormalScoreTransform)."""
        self.do_transform = bool(do_transform)
        self.nst_trans = nst_trans if do_transform else None

    def set_trend(self, trend=None, detrend_map=True):
        """Smooth trend surface subtracted before transform/simulation and
        re-added for physics (reference chain_sgs.set_trend,
        MCMC.py:1482-1503)."""
        if detrend_map:
            trend = np.asarray(trend) if trend is not None else None
            if trend is None or trend.shape != self.xx.shape:
                raise ValueError(
                    "if detrend_map is set to True, then the trend of the "
                    "topography, which is a 2D numpy array, must be provided")
            self.trend = trend.astype(np.float32)
        else:
            self.trend = None
        self.detrend_map = bool(detrend_map)

    def set_variogram(self, vario_type, vario_range, vario_sill, vario_nugget,
                      isotropic=True, vario_smoothness=None, vario_azimuth=None):
        """Variogram model of the transformed residual field (reference
        chain_sgs.set_variogram, MCMC.py:1505-1543)."""
        if isotropic:
            self.vario = VariogramConfig.isotropic(
                vario_type, vario_range, vario_sill, vario_nugget,
                smoothness=vario_smoothness)
        else:
            if not (hasattr(vario_range, "__len__") and len(vario_range) == 2):
                raise ValueError(
                    "vario_range need to be a list with two floats to "
                    "specifying for major range and minor range of the "
                    "variogram when isotropic is set to False")
            self.vario = VariogramConfig(
                vtype=vario_type, major_range=vario_range[0],
                minor_range=vario_range[1], sill=vario_sill,
                nugget=vario_nugget, azimuth=vario_azimuth or 0.0,
                smoothness=vario_smoothness)

    def set_sgs_param(self, sgs_num_nearest_neighbors, sgs_searching_radius,
                      sgs_rand_dropout_on=False, dropout_rate=0.0):
        """SGS conditioning knobs (reference chain_sgs.set_sgs_param,
        MCMC.py:1545-1561)."""
        # Both knobs shape the proposal (reference MCMC.py:1545-1561 applies
        # them per simulated cell; here they bound the JOINT conditioning
        # set): the draw conditions on the num_neighbors nearest
        # non-simulated window cells within search_radius of the block.
        # The radius also sizes the window margin (capped at 8 cells — the
        # near ring screens the exterior for the covariances in use).
        self.sgs_params = SGSParams(
            num_neighbors=sgs_num_nearest_neighbors,
            search_radius=sgs_searching_radius,
            rand_dropout_on=sgs_rand_dropout_on,
            dropout_rate=dropout_rate)

    def set_block_sizes(self, block_min_x, block_max_x, block_min_y,
                        block_max_y):
        """Half-open per-axis bounds of the uniformly drawn re-simulation
        block sizes (reference chain_sgs.set_block_sizes,
        MCMC.py:1563-1597)."""
        self.block_min_x, self.block_max_x = int(block_min_x), int(block_max_x)
        self.block_min_y, self.block_max_y = int(block_min_y), int(block_max_y)

    def loss(self, massConvResidual, dataDiff=0):
        """Loss of a candidate topography (reference MCMC.py:1021-1044,
        via the shared ``chain_crf.chain_loss_mc`` formula).  Returns
        (total, loss_mc, loss_data=0)."""
        from .chain_crf import chain_loss_mc

        if self.sigma_mc is None:
            raise ValueError("call set_loss_type before loss()")
        loss_mc = chain_loss_mc(massConvResidual, self.mc_region_mask,
                                self.sigma_mc)
        return loss_mc, loss_mc, 0.0

    def set_random_generator(self, rng_seed=None):
        """Seed the chain's PRNG key (replaces the reference's NumPy
        Generator plumbing, MCMC.py:1046-1066)."""
        self._key = as_key(rng_seed)

    def set_sample_points_locations(self, loc):
        """(n, 2) (x, y) posterior probe points traced every iteration
        (reference MCMC.py:1068-1081; nearest-cell lookup, quirk #7)."""
        self.sample_loc = None if loc is None else np.asarray(loc)

    # --- compilation --------------------------------------------------------

    def _sample_ij(self):
        if self.sample_loc is None:
            return np.zeros((0, 2), np.int32)
        ij = np.zeros((self.sample_loc.shape[0], 2), np.int32)
        for k in range(self.sample_loc.shape[0]):
            ij[k, 0] = int(np.argmin(np.abs(self.yy[:, 0] - self.sample_loc[k, 1])))
            ij[k, 1] = int(np.argmin(np.abs(self.xx[0, :] - self.sample_loc[k, 0])))
        return ij

    def _coerce_nst(self):
        """The configured normal-score transform as a NormalScoreTransform
        (accepts a fitted sklearn QuantileTransformer for parity)."""
        nst = self.nst_trans
        if nst is None:
            raise ValueError("set_normal_transformation(nst, True) "
                             "requires a fitted transform")
        if not isinstance(nst, NormalScoreTransform):
            nst = NormalScoreTransform(
                quantiles=np.asarray(nst.quantiles_).ravel(),
                references=np.asarray(nst.references_).ravel())
        return nst

    def preprocess_beds(self, beds):
        """Detrend (+ the reference's whole-grid transform->inverse clamp,
        MCMC.py:1644-1659) full-space beds exactly like ``build()``
        preprocesses the initial bed.  Accepts (H, W) or (n, H, W); used
        by the multi-chain sampler for per-chain initial beds (host NumPy
        twins: same numerics, no eager device dispatch)."""
        beds = np.asarray(beds, np.float32)
        trend = (self.trend if self.detrend_map
                 else np.zeros(self.xx.shape, np.float32))
        out = beds - trend
        if self.do_transform:
            nst = self._coerce_nst()
            out = np.asarray(nst.inverse_np(nst.transform_np(out)),
                             np.float32)
        return out

    def build(self):
        """Compile the configured chain to its functional form:
        (SGSStatic, SGSConsts) consumed by make_sgs_step/run_sgs_chain and
        the multi-chain sampler."""
        if self.sigma_mc is None:
            raise ValueError("call set_loss_type before building the chain")
        if self.vario is None:
            raise ValueError("call set_variogram before building the chain")
        if self.block_max_x is None:
            raise ValueError("call set_block_sizes before building the chain")
        if self.sgs_params is None:
            self.sgs_params = SGSParams(num_neighbors=32,
                                        search_radius=30e3)
        H, W = self.xx.shape
        # Window margin from the search radius (set_sgs_param): conditioning
        # candidates live in the window, so the margin bounds how far the
        # radius can reach.  >= 2 for the residual ring patch; capped at 8
        # cells — beyond that the near ring screens the exterior for the
        # covariances in use, and window-covariance memory grows as SB^4.
        rad_cells = int(np.ceil(self.sgs_params.search_radius / self.resolution))
        M = int(np.clip(rad_cells, 2, 8))
        BMX, BMY = self.block_max_x, self.block_max_y
        SB = int(min(H, W, max(BMX, BMY) + 2 * M))
        if SB < max(BMX, BMY) + 4 and (H > SB or W > SB):
            raise ValueError("grid too small for the configured block sizes")
        # if the grid clipped SB, shrink the kernel margin so a max-size
        # block starting at (bxmin - M) always fits inside the window
        M = max(2, (SB - max(BMX, BMY)) // 2) if SB < max(BMX, BMY) + 2 * M else M
        # packed conditioning size = num_neighbors, clamped to the window
        K = int(np.clip(self.sgs_params.num_neighbors, 1, SB * SB - 1))

        trend = (self.trend if self.detrend_map
                 else np.zeros(self.xx.shape, np.float32))
        # detrend + the reference's whole-grid transform->inverse clamp —
        # shared with the sampler's per-chain bed path (preprocess_beds)
        # so farm beds and the builder's initial bed can never diverge
        bed0 = self.preprocess_beds(self.initial_bed)
        cond0 = self.cond_bed - trend
        # Conditioning keys off data_mask AND finite cond_bed: the reference
        # keys off ~isnan(cond_bed) (MCMC.py:1766-1773) and would re-simulate
        # NaN cells, so a data_mask=1/NaN-cond cell must not be conditioned
        # on transform(0 - trend) garbage (same guard as ChainCRF.build).
        dmask = np.asarray(self.data_mask, bool) & np.isfinite(np.asarray(cond0))

        if self.do_transform:
            nst = self._coerce_nst()
            z_cond = np.asarray(nst.transform_np(
                np.where(np.isnan(cond0), 0.0, cond0)), np.float32)
            z_cond = np.where(dmask, z_cond, 0.0)
            mean_z = 0.0
            lut = NormalScoreLUT.from_transform(nst)
            self._host_nst = nst
            initial_z = np.asarray(nst.transform_np(bed0), np.float32)
        else:
            nst = NormalScoreTransform(quantiles=np.array([0.0, 1.0]),
                                       references=np.array([0.0, 1.0]))
            z_cond = np.where(dmask, np.nan_to_num(cond0), 0.0)
            cvals = np.asarray(cond0)[np.isfinite(np.asarray(cond0))]
            mean_z = float(cvals.mean()) if cvals.size else 0.0
            # placeholder identity LUT: use_transform=False never calls it
            eye = jnp.asarray(np.array([[0.0, 1.0], [1.0, 1.0]], np.float32))
            lut = NormalScoreLUT(fwd_lo=jnp.float32(0), fwd_scale=jnp.float32(1),
                                 fwd_table=eye, inv_lo=jnp.float32(0),
                                 inv_scale=jnp.float32(1), inv_table=eye)
            self._host_nst = None
            initial_z = None

        # initial-bed sanity (block-local guard equivalence, see docstring)
        viol0 = np.sum(((self.surf - self.initial_bed) <= 0)
                       & (np.asarray(self.grounded_ice_mask) > 0))
        if viol0 > 0:
            import warnings

            warnings.warn(
                f"initial bed violates thickness>0 at {viol0} grounded cells; "
                "the reference chain would reject every proposal "
                "(MCMC.py:1789-1795). Sanitize the initial bed as the "
                "reference drivers do (largeScaleChain_multiprocessing.py:542).")

        region = (np.argwhere(self.region_mask == 1) if self.update_in_region
                  else np.argwhere(np.ones(self.xx.shape, bool)))
        spec = CovarianceSpec(self.vario.vtype.lower(),
                              s=self.vario.smoothness)

        # stationary window covariance: the (SB, SB) window grid's offsets
        # never change, so ONE host-side circulant-embedding spectrum serves
        # every step's draw + kriging-adjustment convolution (S_CC entries
        # are evaluated analytically on device from the packed coordinates)
        rot_np = np.asarray(make_rotation_matrix(
            self.vario.azimuth, self.vario.major_range,
            self.vario.minor_range), np.float64)
        cov_stamp, embed_spec, embed_sqrt, NE, NA = _embedding_spectra(
            spec, rot_np, self.vario.sill, self.vario.nugget, SB,
            self.resolution)
        # analytic S_CC mixture (ops/covariance.fit_cov_mixture): fit the
        # covariance curve over the window's distance range; accept when the
        # max abs error is below the CG solve's own diagonal jitter
        # (1e-3 * sill-scale), else fall back to the stamp gather (e.g. the
        # spherical model's range kink fits poorly)
        from ..ops.covariance import fit_cov_mixture

        Q = rot_np @ rot_np.T
        qcoef = np.array([Q[0, 0], 2.0 * Q[0, 1], Q[1, 1]],
                         np.float64) * self.resolution ** 2
        S1 = float(SB - 1)
        h_max = max(
            float(np.sqrt(qcoef[0] * dj * dj + qcoef[1] * dj * di
                          + qcoef[2] * di * di))
            for dj, di in ((S1, S1), (S1, -S1)))
        # prune the fit to the fewest mixture terms inside the accept
        # tolerance: device exp time is ~0.09 ms/step-batch PER TERM at
        # the 512-chain bench shape (NOTES_ROUND5 §2c)
        amp = self.vario.sill - self.vario.nugget
        mix_tol = 1e-3 * max(abs(amp), 1e-6)
        mix_ag, mix_bg, mix_ae, mix_be, mix_err = fit_cov_mixture(
            spec, self.vario.sill, self.vario.nugget, h_max * 1.02,
            target_err=mix_tol)
        if mix_err > mix_tol:
            mix_ag = mix_bg = mix_ae = mix_be = np.zeros((0,), np.float32)
        sample_ij = self._sample_ij()
        dropout = bool(self.sgs_params.rand_dropout_on
                       and self.sgs_params.dropout_rate > 0)
        # Covariance-aware CG budget (override with chain.cg_iters).  The
        # effective spectrum of (M S_cc M + (I-M) + eps I) depends on the
        # covariance smoothness; measured f32 stagnation floors on captured
        # production systems (K=48, with/without anisotropy, NOTES_ROUND4
        # §6 lever b): exponential reaches its floor (~2e-6 rel-err) by 32
        # iters, spherical by 48, while smooth models (gaussian / matern
        # s>0.5) are still converging at 64 — all floors sit ~1000x below
        # the eps=1e-3*sill diagonal jitter's own effect on the weights.
        rough = (spec.vtype == "exponential"
                 or (spec.vtype == "matern" and (spec.s or 0.5) <= 0.5))
        budget = 32 if rough else (48 if spec.vtype == "spherical" else 64)
        cg_iters = int(getattr(self, "cg_iters", 0)) or min(budget, K + 16)
        mix_static = ()
        if mix_ag.shape[0] + mix_ae.shape[0] > 0:
            mix_static = (
                tuple(float(v) for v in np.asarray(mix_ag, np.float32)),
                tuple(float(v) for v in np.asarray(mix_bg, np.float32)),
                tuple(float(v) for v in np.asarray(mix_ae, np.float32)),
                tuple(float(v) for v in np.asarray(mix_be, np.float32)),
                tuple(float(v) for v in np.asarray(qcoef, np.float32)))
        static = SGSStatic(
            H=H, W=W, SB=SB, BMX=BMX, BMY=BMY, M=M, K=K,
            n_region=int(region.shape[0]), P=int(sample_ij.shape[0]),
            spec=spec, use_transform=self.do_transform,
            detrend=self.detrend_map, dropout=dropout,
            has_nugget=self.vario.nugget > 0,
            cg_iters=cg_iters, NE=NE, NA=NA,
            Mg=int(mix_ag.shape[0]), Me=int(mix_ae.shape[0]),
            mix=mix_static)
        stacked = np.stack([
            self.surf, self.velx, self.vely, self.dhdt, self.smb,
            np.asarray(trend, np.float32),
            np.asarray(self.grounded_ice_mask, np.float32),
            np.asarray(self.mc_region_mask == 1, np.float32),
            np.asarray(z_cond, np.float32),
            np.asarray(dmask, np.float32),
        ]).astype(np.float32)
        consts = SGSConsts(
            stacked=jnp.asarray(stacked),
            region_cells=jnp.asarray(region, jnp.int32),
            sample_ij=jnp.asarray(sample_ij, jnp.int32),
            nst=lut,
            cov_stamp=jnp.asarray(cov_stamp),
            embed_spec=jnp.asarray(embed_spec),
            embed_sqrt=jnp.asarray(embed_sqrt),
            rot=jnp.asarray(make_rotation_matrix(
                self.vario.azimuth, self.vario.major_range,
                self.vario.minor_range), jnp.float32),
            sill=jnp.float32(self.vario.sill),
            nugget=jnp.float32(self.vario.nugget),
            sigma_mc=jnp.float32(self.sigma_mc),
            resolution=jnp.float32(self.resolution),
            block_min_x=jnp.int32(self.block_min_x),
            block_max_x=jnp.int32(self.block_max_x),
            block_min_y=jnp.int32(self.block_min_y),
            block_max_y=jnp.int32(self.block_max_y),
            dropout_rate=jnp.float32(self.sgs_params.dropout_rate),
            search_radius=jnp.float32(self.sgs_params.search_radius),
            mean_z=jnp.float32(mean_z),
            mix_ag=jnp.asarray(mix_ag),
            mix_bg=jnp.asarray(mix_bg),
            mix_ae=jnp.asarray(mix_ae),
            mix_be=jnp.asarray(mix_be),
            qcoef=jnp.asarray(qcoef, jnp.float32),
        )
        self._initial_detrended = bed0
        self._initial_z = initial_z
        return static, consts

    def host_transform(self, bed_detrended):
        """Exact normal-score transform of a (batched) detrended bed, on
        the host (used to precompute the z-plane for farm init; see
        ``sgs_init_state``).  Returns None when no transform is set."""
        if not self.do_transform:
            return None
        nst = getattr(self, "_host_nst", None)
        if nst is None:
            raise ValueError("call build() before host_transform()")
        return np.asarray(nst.transform_np(np.asarray(bed_detrended)),
                          np.float32)

    def run(self, n_iter, only_save_last_bed=True, info_per_iter=100,
            plot=False, progress_bar=False, *, save_beds=None, seed=None):
        """Signature-parity with the reference ``chain_sgs.run(n_iter,
        only_save_last_bed, info_per_iter, plot, progress_bar)``
        (MCMC.py:1599) — positional order matches; the extra
        ``save_beds``/``seed`` are keyword-only so reference-style
        positional calls cannot misbind.  Observer knobs segment the scan
        with the reference's progress line / live figure — results
        bitwise identical."""
        from .chain_crf import _run_segmented

        static, consts = self.build()
        key = (as_key(seed) if seed is not None
               else self._key if self._key is not None else as_key(None))
        state = sgs_init_state(self._initial_detrended, key, consts,
                               z0=self._initial_z,
                               use_transform=static.use_transform)
        if save_beds is None:
            save_beds = not only_save_last_bed
        final, traces = _run_segmented(
            lambda st, n: run_sgs_chain(static, consts, st, n,
                                        bool(save_beds)),
            state, int(n_iter), int(info_per_iter), bool(progress_bar),
            bool(plot))
        # continue the random stream across run() calls (the reference's
        # set_random_generator semantics: one Generator advances through
        # successive runs)
        self._key = final.key
        trend = np.asarray(consts.trend)
        out = {
            "bed": (np.asarray(traces["bed"]) if save_beds
                    else np.asarray(final.bed) + trend),
            "loss_mc": np.asarray(traces["loss_mc"]),
            "loss_data": np.asarray(traces["loss_data"]),
            "loss": np.asarray(traces["loss"]),
            "steps": np.asarray(traces["step"]),
            "resampled_times": np.asarray(final.resampled),
            "blocks": np.asarray(traces["block"]),
            "final_state": final,
        }
        if static.P:
            out["sample_values"] = np.asarray(traces["samples"]).T
        return out
